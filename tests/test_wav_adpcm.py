"""IMA ADPCM (WAV format 17) and 8-bit PCM: the blockwise-vectorized
decoder verified bit-exact against an INDEPENDENT per-sample reference
decoder (straight from the IMA 1992 / RFC 3551 DVI4 tables), roundtrip
SNR, tail padding, and the honest gates for still-unsupported formats."""

import struct

import numpy as np
import pytest

# independent per-sample reference (no shared code with the codec)
STEPS = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
         37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
         157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
         544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
         1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
         4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
         12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
         29794, 32767]
ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def naive_decode(body, ch, ba):
    out = []
    for boff in range(0, len(body) // ba * ba, ba):
        blk = body[boff:boff + ba]
        preds, idxs = [], []
        chans = [[] for _ in range(ch)]
        for c in range(ch):
            preds.append(int.from_bytes(blk[c * 4:c * 4 + 2], "little",
                                        signed=True))
            idxs.append(blk[c * 4 + 2])
            chans[c].append(preds[c])
        data = blk[4 * ch:]
        for w in range(len(data) // 4):
            c = w % ch
            for b in data[w * 4:w * 4 + 4]:
                for nib in (b & 0xF, b >> 4):
                    step = STEPS[idxs[c]]
                    diff = step >> 3
                    if nib & 4:
                        diff += step
                    if nib & 2:
                        diff += step >> 1
                    if nib & 1:
                        diff += step >> 2
                    p = preds[c] - diff if nib & 8 else preds[c] + diff
                    p = max(-32768, min(32767, p))
                    idxs[c] = max(0, min(88, idxs[c] + ADJ[nib & 7]))
                    preds[c] = p
                    chans[c].append(p)
        n = min(len(x) for x in chans)
        for t in range(n):
            out.append([chans[c][t] for c in range(ch)])
    return np.array(out, dtype=np.int16)


def _data_chunk(enc):
    pos = 12
    body = ba = None
    while pos + 8 <= len(enc):
        cid = enc[pos:pos + 4]
        size = struct.unpack("<I", enc[pos + 4:pos + 8])[0]
        if cid == b"fmt ":
            ba = struct.unpack("<H", enc[pos + 8 + 12:pos + 8 + 14])[0]
        if cid == b"data":
            body = enc[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    return body, ba


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    s = 8000 * np.sin(2 * np.pi * 440 * t / 16000) + rng.normal(0, 300, n)
    return np.clip(s, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("ch", [1, 2])
def test_adpcm_decoder_matches_reference(ch):
    from oar_ocr_ray.wav_codec import decode_wav, encode_wav_adpcm

    s = _sig(505 * 3)
    x = s if ch == 1 else np.stack([s, np.roll(s, 7)], axis=1)
    enc = encode_wav_adpcm(x, 16000)
    dec, rate = decode_wav(enc)
    assert rate == 16000
    body, ba = _data_chunk(enc)
    assert np.array_equal(dec, naive_decode(body, ch, ba))
    x2 = x if x.ndim == 2 else x[:, None]
    err = dec.astype(np.float64) - x2.astype(np.float64)
    snr = 10 * np.log10((x2.astype(np.float64) ** 2).mean()
                        / (err ** 2).mean())
    assert snr > 28, snr
    assert len(enc) < x2.size * 2 * 0.3  # ~4:1 vs 16-bit PCM


def test_adpcm_tail_padding():
    """A non-multiple-of-block length pads by repeating the last sample;
    the decoded prefix still tracks the input."""
    from oar_ocr_ray.wav_codec import decode_wav, encode_wav_adpcm

    s = _sig(700)  # 505 + 195
    dec, _ = decode_wav(encode_wav_adpcm(s, 8000))
    assert dec.shape == (505 * 2, 1)
    err = dec[:700, 0].astype(np.float64) - s.astype(np.float64)
    assert 10 * np.log10((s.astype(np.float64) ** 2).mean()
                         / (err ** 2).mean()) > 28


def test_8bit_pcm_decodes():
    from oar_ocr_ray.wav_codec import decode_wav

    raw = np.array([0, 128, 255, 64], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 4) + raw.tobytes())
    dec, rate = decode_wav(wav)
    assert rate == 8000
    assert dec[:, 0].tolist() == [-32768, 0, 32512, -16384]


def test_unsupported_formats_still_gate():
    from oar_ocr_ray.wav_codec import decode_wav

    for tag, bits in ((2, 4), (3, 32)):  # MS-ADPCM, float
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 2, bits)
        wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", 0))
        with pytest.raises(NotImplementedError):
            decode_wav(wav)


def test_block_align_validation():
    from oar_ocr_ray.wav_codec import encode_wav_adpcm

    with pytest.raises(ValueError, match="multiple of 8"):
        encode_wav_adpcm(np.zeros(10, np.int16), samples_per_block=10)
