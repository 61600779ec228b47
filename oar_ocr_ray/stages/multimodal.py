"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with metadata columns; each
transform is an actor-pool `map_batches` stage whose Ray-side plumbing
(schema, batch size, actor signature, output layout) is real and tested.
REAL decoders in this environment — all own pure-python/numpy code: PNG
(png_codec), baseline+progressive JPEG (jpeg_codec), WebP lossless
(webp_codec), WAV PCM/IMA-ADPCM/MS-ADPCM/G.711 (wav_codec), FLAC
(flac_codec), MJPEG-AVI video (avi_codec), and image-based PDF
(pdf_codec). Only lossy codecs (VP8/H.264/MP3/AAC) and text-PDF
rasterization genuinely need external libs and raise a clearly marked
NotImplementedError.

Reference analogues: load_image_from_memory (/root/reference/src/utils/image.rs:65),
resize processors (/root/reference/src/processors/resize_detection.rs:30-240),
PDF page rasterizer fan-out (/root/reference/src/bin/server/pdf.rs:24-130).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..png_codec import decode_png, encode_png


def _decode_any(payload: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(payload)
    if fmt in ("jpeg", "jpg"):
        # own baseline grayscale decoder (jpeg_codec.py); color/progressive
        # files raise NotImplementedError from the codec itself
        from ..jpeg_codec import decode_jpeg

        return decode_jpeg(payload)
    if fmt == "webp":
        # own pure-python VP8L decoder (webp_codec.py); lossy VP8 files
        # raise NotImplementedError from the codec itself
        from ..webp_codec import decode_webp

        return decode_webp(payload)
    raise NotImplementedError(f"unsupported image format: {fmt}")


class ImageDecodeResize:
    """Actor: (payload binary, fmt string) -> resized raster stats.

    Emits (h, w, thumb binary PNG) with the image resized so its long side
    is `max_side` (nearest-neighbor, numpy) — the DetResizeForTest
    limit-side policy (Type0, resize_detection.rs) without the /32 snapping.
    """

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fmts = batch["fmt"].to_pylist() if "fmt" in batch.column_names else ["png"] * len(payloads)
        hs, ws, thumbs = [], [], []
        for p, f in zip(payloads, fmts):
            img = _decode_any(p, f)
            h, w = img.shape[:2]
            scale = self.max_side / max(h, w)
            if scale < 1.0:
                nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
                yi = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
                xi = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
                img = img[yi][:, xi]
            hs.append(h)
            ws.append(w)
            thumbs.append(encode_png(img))
        out = batch.drop_columns(["payload"])
        return (
            out.append_column("height", pa.array(hs, pa.int32()))
            .append_column("width", pa.array(ws, pa.int32()))
            .append_column("thumb", pa.array(thumbs, pa.binary()))
        )


class ImageFeatures:
    """Actor: PNG payload -> fixed-size feature vector (grayscale 4x4 mean
    pooling + global stats). A deterministic stand-in for an embedding
    model forward pass; same actor signature as a real one."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        fmts = (batch["fmt"].to_pylist() if "fmt" in batch.column_names
                else ["png"] * batch.num_rows)
        for p, f in zip(batch["payload"].to_pylist(), fmts):
            img = _decode_any(p, f)
            if img.ndim == 2:  # grayscale JPEG decodes as (H, W)
                img = img[:, :, None]
            g = img[:, :, 0].astype(np.float32) / 255.0
            h, w = g.shape
            gy = np.linspace(0, h, self.grid + 1).astype(int)
            gx = np.linspace(0, w, self.grid + 1).astype(int)
            cells = [
                g[gy[i]:max(gy[i + 1], gy[i] + 1), gx[j]:max(gx[j + 1], gx[j] + 1)].mean()
                for i in range(self.grid)
                for j in range(self.grid)
            ]
            cells.extend([g.mean(), g.std()])
            feats.append(np.asarray(cells, dtype=np.float32))
        return batch.drop_columns(["payload"]).append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class FrameSampler:
    """Actor: 'video' payload -> one row per sampled frame (fan-out).

    REAL container path: MJPEG AVI (own RIFF parser, `avi_codec`), each
    sampled frame emitted as its baseline-JPEG payload (`frame_fmt` column
    says which codec decodes the frame bytes downstream). The FAKEVID1
    concatenated-PNG contract remains for layout fixtures. Compressed
    codecs (non-MJPG AVI, other containers) raise NotImplementedError
    from avi_codec. Demonstrates the one-row -> N-rows flat_map layout of
    the PDF rasterizer (pdf.rs:70)."""

    MAGIC = b"FAKEVID1"

    def __init__(self, every: int = 2):
        self.every = every

    @classmethod
    def pack(cls, frames: list[bytes]) -> bytes:
        import struct

        out = [cls.MAGIC, struct.pack("<I", len(frames))]
        for f in frames:
            out.append(struct.pack("<I", len(f)))
            out.append(f)
        return b"".join(out)

    @staticmethod
    def _unpack_fakevid(p: bytes) -> list[bytes]:
        import struct

        (n,) = struct.unpack_from("<I", p, len(FrameSampler.MAGIC))
        pos = len(FrameSampler.MAGIC) + 4
        frames = []
        for _ in range(n):
            (ln,) = struct.unpack_from("<I", p, pos)
            pos += 4
            frames.append(p[pos:pos + ln])
            pos += ln
        return frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..avi_codec import decode_avi_frames

        vids, frame_idx, frame_bytes, frame_fmt = [], [], [], []
        ids = batch["video_id"].to_pylist()
        for vid, p in zip(ids, batch["payload"].to_pylist()):
            if p.startswith(self.MAGIC):
                frames, fmt = self._unpack_fakevid(p), "png"
            elif p.startswith(b"RIFF"):
                frames, fmt = decode_avi_frames(p), "jpeg"
            else:
                raise NotImplementedError(
                    "unknown video payload (MJPEG AVI and the FAKEVID1 "
                    "fixture contract are the decodable formats here)"
                )
            for i in range(0, len(frames), self.every):
                vids.append(vid)
                frame_idx.append(i)
                frame_bytes.append(frames[i])
                frame_fmt.append(fmt)
        return pa.table(
            {
                "video_id": pa.array(vids, batch["video_id"].type),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame": pa.array(frame_bytes, pa.binary()),
                "frame_fmt": pa.array(frame_fmt, pa.string()),
            }
        )


class PdfRasterize:
    """Actor: PDF payload -> one row per rendered page (fan-out), mirroring
    the reference's pdfium rasterizer (/root/reference/src/bin/server/pdf.rs:24-130,
    200 DPI, max dim 4000). REAL for image-based (scanned) PDFs via the own
    `pdf_codec` parser (FlateDecode/DCTDecode image XObjects scaled to the
    MediaBox at `dpi`, long side capped at `max_dim`); text/vector pages
    genuinely need pdfium and raise NotImplementedError from the codec.
    The FAKEVID1 contract remains for layout fixtures."""

    def __init__(self, dpi: int = 200, max_dim: int = 4000):
        self.dpi = dpi
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdf_codec import rasterize_pdf_pages

        ids, page_idx, page_png = [], [], []
        for did, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            if p.startswith(b"%PDF"):
                for i, raster in enumerate(rasterize_pdf_pages(p, self.dpi, self.max_dim)):
                    ids.append(did)
                    page_idx.append(i)
                    page_png.append(encode_png(raster))
            elif p.startswith(FrameSampler.MAGIC):
                for i, frame in enumerate(FrameSampler._unpack_fakevid(p)):
                    ids.append(did)
                    page_idx.append(i)
                    page_png.append(frame)
            else:
                raise NotImplementedError("unknown document payload format")
        return pa.table(
            {
                "doc_id": pa.array(ids, batch["doc_id"].type),
                "page_idx": pa.array(page_idx, pa.int32()),
                "page": pa.array(page_png, pa.binary()),
            }
        )


class AudioFeatures:
    """Actor: WAV payload rows -> per-clip acoustic features.

    The audio modality's decode+featurize stage — REAL decode (PCM and
    IMA-ADPCM WAV via `wav_codec.decode_wav`, no external lib), with
    vectorized numpy features: duration, RMS level, zero-crossing rate,
    peak — the deterministic stand-in for an audio-embedding forward pass
    with the same actor signature. FLAC payloads decode via the own
    flac_codec (lossless, MD5-verified); lossy codecs raise
    NotImplementedError from the codec."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..flac_codec import decode_flac
        from ..wav_codec import decode_wav

        durs, rms, zcr, peak, rates = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            if p[:4] == b"fLaC":
                samples, rate = decode_flac(p)
            else:
                samples, rate = decode_wav(p)
            x = samples.astype(np.float64).mean(axis=1) / 32768.0  # downmix
            n = max(len(x), 1)
            durs.append(len(x) / rate)
            rms.append(float(np.sqrt((x * x).mean())) if len(x) else 0.0)
            zcr.append(float((np.diff(np.signbit(x)) != 0).sum() / n))
            peak.append(float(np.abs(x).max()) if len(x) else 0.0)
            rates.append(rate)
        out = batch.drop_columns(["payload"])
        return (
            out.append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("duration_s", pa.array(durs, pa.float64()))
            .append_column("rms", pa.array(rms, pa.float64()))
            .append_column("zero_crossing_rate", pa.array(zcr, pa.float64()))
            .append_column("peak", pa.array(peak, pa.float64()))
        )
