"""Image-based PDF codec tests: write -> rasterize roundtrips + stage wiring."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from oar_ocr_ray.jpeg_codec import encode_jpeg
from oar_ocr_ray.pdf_codec import encode_pdf_image_pages, rasterize_pdf_pages

rng = np.random.default_rng(11)


def _pages(n=3, h=40, w=64):
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_pdf_roundtrip_exact_at_72dpi():
    pages = _pages()
    pdf = encode_pdf_image_pages(pages)
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    out = rasterize_pdf_pages(pdf, dpi=72)
    assert len(out) == 3
    for want, got in zip(pages, out):
        assert got.shape == want.shape and (got == want).all()


def test_pdf_dpi_scaling_and_cap():
    pages = _pages(1, 36, 72)
    pdf = encode_pdf_image_pages(pages)
    out = rasterize_pdf_pages(pdf, dpi=144)[0]
    assert out.shape == (72, 144, 3)  # 2x at 144 dpi
    capped = rasterize_pdf_pages(pdf, dpi=7200, max_dim=100)[0]
    assert max(capped.shape[:2]) <= 100


def test_pdf_gray_page():
    g = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    pdf = encode_pdf_image_pages([g])
    out = rasterize_pdf_pages(pdf, dpi=72)[0]
    assert (out == g[:, :, None]).all()


def test_pdf_dct_image_xobject():
    # hand-built classic PDF with a DCTDecode (JPEG) image, no xref needed
    img = np.full((24, 40), 90, np.uint8)
    jpg = encode_jpeg(img, 90)
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 40 24]"
        b" /Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >> endobj\n"
        b"4 0 obj << /Type /XObject /Subtype /Image /Width 40 /Height 24"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter [/DCTDecode]"
        b" /Length " + str(len(jpg)).encode() + b" >>\nstream\n" + jpg
        + b"\nendstream endobj\n"
        b"5 0 obj << /Length 26 >>\nstream\nq 40 0 0 24 0 0 cm /Im0 Do Q\nendstream endobj\n"
        b"%%EOF\n"
    )
    out = rasterize_pdf_pages(body, dpi=72)
    assert len(out) == 1 and out[0].shape == (24, 40, 3)
    assert np.abs(out[0].astype(int) - 90).mean() < 4  # JPEG is lossy


def test_pdf_text_only_page_needs_pdfium():
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 8 >>\nstream\nBT ET Q\nendstream endobj\n%%EOF\n"
    )
    with pytest.raises(NotImplementedError):
        rasterize_pdf_pages(body)


def test_pdf_errors():
    with pytest.raises(ValueError):
        rasterize_pdf_pages(b"not a pdf")
    with pytest.raises(ValueError):
        rasterize_pdf_pages(b"%PDF-1.4\njunk only\n")
    with pytest.raises(ValueError):
        encode_pdf_image_pages([])


def test_pdf_rasterize_stage(ray_session):
    import ray

    from oar_ocr_ray.png_codec import decode_png
    from oar_ocr_ray.stages.multimodal import PdfRasterize

    pages = _pages(2, 30, 50)
    pdf = encode_pdf_image_pages(pages)
    ds = ray.data.from_items([{"doc_id": 9, "payload": pdf}]).map_batches(
        PdfRasterize, fn_constructor_kwargs={"dpi": 72},
        concurrency=1, batch_size=1, batch_format="pyarrow",
    )
    rows = sorted(ds.take_all(), key=lambda r: r["page_idx"])
    assert [r["page_idx"] for r in rows] == [0, 1]
    for r, want in zip(rows, pages):
        got = decode_png(bytes(r["page"]))
        assert (got == want).all()
