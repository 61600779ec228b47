"""WebP lossless (VP8L) codec tests — roundtrips + hand-built streams.

No libwebp exists in this container, so spec conformance is evidenced by:
(a) encode->decode roundtrips across every transform/entropy option the
encoder can emit, (b) hand-assembled bitstreams for decoder paths the
encoder does not produce (all 14 predictors, meta-prefix groups, simple
2-symbol code ordering), and (c) the RFC 9649 close-neighborhood distance
table prefix pinned literally.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oar_ocr_ray.webp_codec import (
    _DIST_MAP,
    _BitReader,
    _BitWriter,
    _PrefixCode,
    _lz77_decode_value,
    _lz77_encode_value,
    _read_prefix_code,
    _riff_wrap,
    _tokenize,
    _write_entropy_image,
    _write_prefix_code,
    decode_webp,
    encode_webp,
)

rng = np.random.default_rng(1234)


def _noise(h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# roundtrips


@pytest.mark.parametrize(
    "label,img,kw",
    [
        ("noise", _noise(37, 53), dict(palette=False)),
        ("noise_cache", _noise(37, 53), dict(palette=False, cache_bits=6)),
        ("solid_palette", np.full((40, 60, 3), 17, np.uint8), {}),
        ("solid_nopal", np.full((40, 60, 3), 17, np.uint8), dict(palette=False)),
        ("grad_pred", None, dict(palette=False, predictor=True)),
        (
            "grad_pred_ct",
            None,
            dict(palette=False, predictor=True, color_transform=(10, -7, 3)),
        ),
        ("grad_ct", None, dict(palette=False, color_transform=(-33, 100, -128))),
        ("one_px", _noise(1, 1), dict(palette=False)),
        ("one_row", _noise(1, 80), dict(palette=False)),
        ("one_col", _noise(80, 1), dict(palette=False)),
        ("gray_2d", None, dict(palette=False)),
    ],
)
def test_roundtrip(label, img, kw):
    if img is None:
        if label == "gray_2d":
            img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        else:
            img = (
                np.arange(64)[:, None, None]
                + np.arange(48)[None, :, None]
                + np.arange(3)[None, None, :]
            ).astype(np.uint8)
    out = decode_webp(encode_webp(img, **kw))
    want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    assert out.shape == want.shape
    assert (out == want).all()


@pytest.mark.parametrize("ncolors,expect_bundle", [(2, 3), (4, 2), (13, 1), (200, 0)])
def test_roundtrip_palette_bundling(ncolors, expect_bundle):
    lut = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, (23, 57))
    img = lut[idx]
    data = encode_webp(img)
    out = decode_webp(data)
    assert (out == img).all()
    # palette should compress far below raw literals for few colors
    if ncolors <= 16:
        assert len(data) < 23 * 57 * 3


def test_roundtrip_lz77_row_repeats():
    row = rng.integers(0, 256, (1, 64, 3), dtype=np.uint8)
    img = np.tile(row, (40, 1, 1))
    data = encode_webp(img, palette=False)
    assert (decode_webp(data) == img).all()
    assert len(data) < 64 * 3 + 300  # one row of literals + headers


def test_color_cache_hits_emitted_and_decoded():
    # scattered repeats with LZ77 off force genuine cache symbols
    lut = np.array([[250, 1, 3], [9, 200, 7], [66, 66, 66]], np.uint8)
    idx = rng.integers(0, 3, (16, 16))
    img = lut[idx]
    a = (
        np.uint32(0xFF000000)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    toks = _tokenize(a, 16, cache_bits=4, use_lz77=False)
    assert any(t[0] == "cache" for t in toks)
    data = encode_webp(img, palette=False, cache_bits=4, use_lz77=False)
    assert (decode_webp(data) == img).all()


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31),
    mode=st.sampled_from(["auto", "pred", "ct", "cache", "plain"]),
)
def test_roundtrip_property(h, w, seed, mode):
    r = np.random.default_rng(seed)
    img = r.integers(0, 256, (h, w, 3), dtype=np.uint8)
    kw = {
        "auto": {},
        "pred": dict(palette=False, predictor=True),
        "ct": dict(palette=False, color_transform=(7, -9, 31)),
        "cache": dict(palette=False, cache_bits=3),
        "plain": dict(palette=False, use_lz77=False),
    }[mode]
    assert (decode_webp(encode_webp(img, **kw)) == img).all()


# ---------------------------------------------------------------------------
# LZ77 value coding + the RFC distance map


@settings(max_examples=200, deadline=None)
@given(v=st.integers(1, 4096))
def test_lz77_value_roundtrip(v):
    code, ebits, ev = _lz77_encode_value(v)
    assert 0 <= code < 24
    bw = _BitWriter()
    bw.write(ev, ebits)
    assert _lz77_decode_value(_BitReader(bw.bytes()), code) == v


def test_distance_map_matches_rfc_prefix():
    # first 40 entries as printed in RFC 9649 §4.2.2.3
    rfc = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    assert list(_DIST_MAP[:40]) == rfc
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


# ---------------------------------------------------------------------------
# hand-built streams for decoder-only paths


def _sub_px(o, p):
    out = 0
    for sh in (0, 8, 16, 24):
        out |= ((((o >> sh) & 0xFF) - ((p >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _slow_predict(flat, w, i, mode):
    from oar_ocr_ray.webp_codec import (
        _PRED_BLACK,
        _avg2,
        _clamp_add_full,
        _clamp_add_half,
        _select,
    )

    y, x = divmod(i, w)
    if x == 0 and y == 0:
        return int(_PRED_BLACK)
    if y == 0:
        return int(flat[i - 1])
    if x == 0:
        return int(flat[i - w])
    l, t = int(flat[i - 1]), int(flat[i - w])
    tl, tr = int(flat[i - w - 1]), int(flat[i - w + 1])
    return [
        int(_PRED_BLACK), l, t, tr, tl,
        _avg2(_avg2(l, tr), t), _avg2(l, tl), _avg2(l, t), _avg2(tl, t),
        _avg2(t, tr), _avg2(_avg2(l, tl), _avg2(t, tr)),
        _select(l, t, tl), _clamp_add_full(l, t, tl),
        _clamp_add_half(_avg2(l, t), tl),
    ][mode]


def test_all_14_predictor_modes_decode():
    # 16x16 image, 4px blocks -> 4x4 tiles; one tile per predictor mode
    h = w = 16
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    flat = (
        np.uint32(0xFF000000)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    modes = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 7, 11], np.uint32)
    res = np.zeros_like(flat)
    for i in range(h * w):
        y, x = divmod(i, w)
        mode = int(modes[(y >> 2) * 4 + (x >> 2)])
        res[i] = _sub_px(int(flat[i]), _slow_predict(flat, w, i, mode))
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(2 - 2, 3)  # 4px blocks
    _write_entropy_image(
        bw, (np.uint32(0xFF000000) | (modes << 8)).astype(np.uint32), 4, 4,
        is_main=False,
    )
    bw.write(0, 1)  # end of transforms
    _write_entropy_image(bw, res, w, h, is_main=True)
    out = decode_webp(_riff_wrap(bw.bytes()))
    assert (out == img).all()


def test_meta_prefix_two_groups_decode():
    from oar_ocr_ray.webp_codec import _canonical_codes, _huff_lengths

    h = w = 8
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    flat = (
        np.uint32(0xFF000000)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    meta_bits = 2  # 4px meta tiles -> 2x2 meta image
    group_of_tile = [0, 1, 1, 0]
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(meta_bits - 2, 3)
    meta_img = (np.uint32(0xFF000000) | (np.array(group_of_tile, np.uint32) << 8))
    _write_entropy_image(bw, meta_img, 2, 2, is_main=False)
    # per-pixel group, literal-only freqs per group
    groups = [
        (((i // w) >> meta_bits) * 2 + ((i % w) >> meta_bits))
        for i in range(h * w)
    ]
    pix_group = [group_of_tile[g] for g in groups]
    all_codes = []
    for gid in (0, 1):
        gf, rf, bf, af = [0] * 280, [0] * 256, [0] * 256, [0] * 256
        for i, v in enumerate(flat):
            if pix_group[i] != gid:
                continue
            v = int(v)
            gf[(v >> 8) & 0xFF] += 1
            rf[(v >> 16) & 0xFF] += 1
            bf[v & 0xFF] += 1
            af[(v >> 24) & 0xFF] += 1
        lens = [
            _huff_lengths(gf, 15), _huff_lengths(rf, 15),
            _huff_lengths(bf, 15), _huff_lengths(af, 15),
            [0] * 40,
        ]
        for l in lens:
            _write_prefix_code(bw, l)
        all_codes.append([_canonical_codes(l) if any(l) else None for l in lens])
    for i, v in enumerate(flat):
        v = int(v)
        gc, rc, bc, ac, _ = all_codes[pix_group[i]]
        for codes, sym in (
            (gc, (v >> 8) & 0xFF), (rc, (v >> 16) & 0xFF),
            (bc, v & 0xFF), (ac, (v >> 24) & 0xFF),
        ):
            c, cl = codes[sym]
            bw.write_code(c, cl)
    out = decode_webp(_riff_wrap(bw.bytes()))
    assert (out == img).all()


def test_simple_two_symbol_code_order_not_sorted():
    # spec: first-written symbol takes code 0 even when numerically larger
    bw = _BitWriter()
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(7, 8)
    bw.write(2, 8)
    code = _read_prefix_code(_BitReader(bw.bytes()), 256)
    r = _BitReader(bytes([0b10]))  # bit0=0 -> first symbol, bit1=1 -> second
    assert code.read(r) == 7
    assert code.read(r) == 2


def test_single_symbol_code_reads_zero_bits():
    bw = _BitWriter()
    _write_prefix_code(bw, [0] * 200 + [5] + [0] * 55)
    code = _read_prefix_code(_BitReader(bw.bytes()), 256)
    br = _BitReader(b"")
    assert code.read(br) == 200
    assert br.pos == 0


def test_incomplete_prefix_code_rejected():
    with pytest.raises(ValueError):
        _PrefixCode(lengths=[2, 2, 2])  # kraft sum 3/4


# ---------------------------------------------------------------------------
# container handling


def test_vp8x_style_container_scanned():
    img = _noise(5, 9)
    data = encode_webp(img, palette=False)
    vp8l = data[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l)) + b"WEBP" + vp8x + vp8l
    assert (decode_webp(wrapped) == img).all()


def test_container_errors():
    with pytest.raises(ValueError):
        decode_webp(b"nope")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVEdata")
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    good = encode_webp(_noise(4, 4), palette=False)
    with pytest.raises(ValueError):
        decode_webp(good[:20])  # truncated mid-stream


def test_odd_payload_padded():
    # RIFF chunks are 2-byte aligned; find a payload with odd size
    for seed in range(30):
        r = np.random.default_rng(seed)
        img = r.integers(0, 256, (3, 5, 3), dtype=np.uint8)
        data = encode_webp(img, palette=False)
        (size,) = struct.unpack("<I", data[16:20])
        if size & 1:
            assert len(data) % 2 == 0
            assert (decode_webp(data) == img).all()
            return
    pytest.skip("no odd payload produced in 30 seeds")


# ---------------------------------------------------------------------------
# multimodal wiring


def test_multimodal_decodes_webp(ray_session):
    import ray

    from oar_ocr_ray.stages.multimodal import ImageDecodeResize

    imgs = [rng.integers(0, 256, (40, 64, 3), dtype=np.uint8) for _ in range(6)]
    rows = [
        {"payload": encode_webp(im, palette=False), "fmt": "webp"} for im in imgs
    ]
    ds = ray.data.from_items(rows).map_batches(
        ImageDecodeResize, concurrency=1, batch_size=4, batch_format="pyarrow"
    )
    out = ds.take_all()
    assert len(out) == 6
    assert all(r["height"] == 40 and r["width"] == 64 for r in out)
