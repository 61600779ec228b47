"""Minimal pure-python PDF codec for image-based (scanned) documents.

The reference's server rasterizes PDF pages with pdfium at 200 DPI
(/root/reference/src/bin/server/pdf.rs:24-130). pdfium is not in this
container, but the OCR-relevant subset — scanned PDFs whose pages are a
single full-page image XObject — is parseable with stdlib zlib + our own
JPEG codec, so that subset is REAL here:

- `encode_pdf_image_pages(pages)` writes a spec-valid PDF 1.4 (classic
  xref table, one FlateDecode RGB image XObject per page, content stream
  drawing it over the MediaBox) that any standard viewer opens.
- `rasterize_pdf_pages(data, dpi, max_dim)` parses the catalog/pages tree
  (classic xref not required — objects are scanned directly, which also
  survives mildly damaged files), decodes each page's image XObject
  (FlateDecode RGB/Gray, or DCTDecode via jpeg_codec) and scales it to
  the MediaBox at `dpi` with the reference's max-dim cap.

Pages with no image XObject (text/vector content) and compressed
cross-reference/object streams raise NotImplementedError — that is real
rasterization work that genuinely needs pdfium.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# writer


def encode_pdf_image_pages(pages: list[np.ndarray]) -> bytes:
    """List of (H, W, 3) uint8 rasters -> PDF bytes, one page per raster.

    MediaBox is sized 1 pixel = 1 point (72 DPI), so rasterizing at
    dpi=72 reproduces the input exactly.
    """
    if not pages:
        raise ValueError("PDF needs at least one page")
    objs: list[bytes] = []  # 1-indexed object bodies (without "N 0 obj")

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_ids = []
    pages_id_placeholder = add(b"")  # patched later (the /Pages node)
    for img in pages:
        a = np.ascontiguousarray(img, dtype=np.uint8)
        if a.ndim == 2:
            a = np.repeat(a[:, :, None], 3, axis=2)
        h, w, c = a.shape
        if c != 3:
            raise ValueError("RGB pages only")
        data = zlib.compress(a.tobytes(), 6)
        im_id = add(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
            b" /Filter /FlateDecode /Length %d >>\nstream\n" % (w, h, len(data))
            + data
            + b"\nendstream"
        )
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        ct_id = add(
            b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
        )
        pg_id = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /XObject << /Im0 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (pages_id_placeholder, w, h, im_id, ct_id)
        )
        page_ids.append(pg_id)
    objs[pages_id_placeholder - 1] = (
        b"<< /Type /Pages /Kids [" + b" ".join(b"%d 0 R" % p for p in page_ids)
        + b"] /Count %d >>" % len(page_ids)
    )
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id_placeholder)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_id, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# tiny object parser (dicts, arrays, names, numbers, references)

_TOKEN = re.compile(
    rb"<<|>>|\[|\]|/[^\s/<>\[\]()]*|\d+\s+\d+\s+R\b|[-+]?\d*\.?\d+|\(|stream|endobj"
)


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _parse_value(data: bytes, pos: int):
    m = _TOKEN.search(data, pos)
    if m is None:
        raise ValueError("PDF: unexpected end of object")
    tok = m.group()
    end = m.end()
    if tok == b"<<":
        d = {}
        while True:
            m2 = _TOKEN.search(data, end)
            if m2 is None:
                raise ValueError("PDF: unterminated dict")
            if m2.group() == b">>":
                return d, m2.end()
            if not m2.group().startswith(b"/"):
                raise ValueError("PDF: dict key must be a name")
            key = m2.group()[1:].decode("latin1")
            val, end = _parse_value(data, m2.end())
            d[key] = val
    if tok == b"[":
        arr = []
        while True:
            m2 = _TOKEN.search(data, end)
            if m2 is None:
                raise ValueError("PDF: unterminated array")
            if m2.group() == b"]":
                return arr, m2.end()
            val, end = _parse_value(data, end)
            arr.append(val)
    if tok == b">>" or tok == b"]":
        raise ValueError("PDF: unexpected closer")
    if tok.startswith(b"/"):
        return tok[1:].decode("latin1"), end
    if tok.endswith(b"R") and b" " in tok:
        return _Ref(int(tok.split()[0])), end
    if tok in (b"(", b"stream", b"endobj"):
        raise ValueError("PDF: unsupported token in value position")
    v = float(tok)
    return (int(v) if v == int(v) else v), end


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


def _scan_objects(data: bytes) -> dict[int, tuple[object, bytes | None]]:
    """num -> (parsed dict/value, raw stream bytes or None).

    Scans 'N g obj' markers directly instead of trusting the xref table."""
    objs: dict[int, tuple[object, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        try:
            val, pos = _parse_value(data, m.end())
        except ValueError:
            continue  # not a dict-bearing object we care about
        stream = None
        sm = _STREAM_RE.match(data, pos) or _STREAM_RE.search(data, pos, pos + 16)
        if sm is not None and isinstance(val, dict):
            start = sm.end()
            ln = val.get("Length")
            if isinstance(ln, int):
                stream = data[start:start + ln]
            else:
                e = data.find(b"endstream", start)
                if e < 0:
                    raise ValueError("PDF: unterminated stream")
                stream = data[start:e].rstrip(b"\r\n")
        objs[num] = (val, stream)
    if not objs:
        raise ValueError("PDF: no objects found")
    return objs


def _resolve(objs, v):
    seen = 0
    while isinstance(v, _Ref):
        if v.num not in objs:
            raise ValueError(f"PDF: dangling reference {v.num}")
        v = objs[v.num][0]
        seen += 1
        if seen > 64:
            raise ValueError("PDF: reference cycle")
    return v


def _walk_pages(objs, node, inherited_box, out):
    node = _resolve(objs, node)
    if not isinstance(node, dict):
        raise ValueError("PDF: bad pages node")
    box = _resolve(objs, node.get("MediaBox", inherited_box))
    t = node.get("Type")
    if t == "Pages" or (t is None and "Kids" in node):
        for kid in _resolve(objs, node.get("Kids", [])):
            _walk_pages(objs, kid, box, out)
    else:
        out.append((node, box))


def _decode_image_xobject(objs, xdict, stream) -> np.ndarray:
    w = _resolve(objs, xdict.get("Width"))
    h = _resolve(objs, xdict.get("Height"))
    filt = _resolve(objs, xdict.get("Filter"))
    if isinstance(filt, list):
        if len(filt) != 1:
            raise NotImplementedError("PDF: filter chains not supported")
        filt = _resolve(objs, filt[0])
    cs = _resolve(objs, xdict.get("ColorSpace", "DeviceRGB"))
    if filt == "DCTDecode":
        from .jpeg_codec import decode_jpeg

        img = decode_jpeg(stream)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    if filt == "FlateDecode":
        raw = zlib.decompress(stream)
    elif filt is None:
        raw = stream
    else:
        raise NotImplementedError(f"PDF: image filter {filt} needs pdfium")
    bpc = _resolve(objs, xdict.get("BitsPerComponent", 8))
    if bpc != 8:
        raise NotImplementedError("PDF: only 8-bit image components supported")
    if cs == "DeviceRGB":
        if len(raw) < w * h * 3:
            raise ValueError("PDF: image stream too short")
        return np.frombuffer(raw[: w * h * 3], np.uint8).reshape(h, w, 3)
    if cs == "DeviceGray":
        if len(raw) < w * h:
            raise ValueError("PDF: image stream too short")
        g = np.frombuffer(raw[: w * h], np.uint8).reshape(h, w)
        return np.repeat(g[:, :, None], 3, axis=2)
    raise NotImplementedError(f"PDF: colorspace {cs} needs pdfium")


def rasterize_pdf_pages(
    data: bytes, dpi: int = 200, max_dim: int = 4000
) -> list[np.ndarray]:
    """PDF bytes -> list of (H, W, 3) uint8 page rasters.

    Mirrors the reference's policy (pdf.rs): render at `dpi`, cap the
    long side at `max_dim`. Supports pages whose content is an image
    XObject; anything else raises NotImplementedError."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    objs = _scan_objects(data)
    catalog = None
    for val, _ in objs.values():
        if isinstance(val, dict) and val.get("Type") == "Catalog":
            catalog = val
            break
    if catalog is None:
        raise ValueError("PDF: no catalog object")
    pages: list[tuple[dict, object]] = []
    _walk_pages(objs, catalog.get("Pages"), None, pages)
    if not pages:
        raise ValueError("PDF: no pages")
    out = []
    for pg, box in pages:
        res = _resolve(objs, pg.get("Resources", {}))
        xobjs = _resolve(objs, res.get("XObject", {})) if isinstance(res, dict) else {}
        img = None
        for ref in xobjs.values():
            num = ref.num if isinstance(ref, _Ref) else None
            xval, xstream = objs[num] if num in objs else (None, None)
            if isinstance(xval, dict) and xval.get("Subtype") == "Image":
                img = _decode_image_xobject(objs, xval, xstream)
                break
        if img is None:
            raise NotImplementedError(
                "PDF page has no image XObject; text/vector rasterization "
                "needs pdfium, not present in this container"
            )
        if box is None:
            box = [0, 0, img.shape[1], img.shape[0]]
        bw = float(box[2]) - float(box[0])
        bh = float(box[3]) - float(box[1])
        tw = max(1, int(round(bw / 72.0 * dpi)))
        th = max(1, int(round(bh / 72.0 * dpi)))
        if max(tw, th) > max_dim:
            s = max_dim / max(tw, th)
            tw = max(1, int(tw * s))
            th = max(1, int(th * s))
        h, w = img.shape[:2]
        yi = (np.arange(th) * (h / th)).astype(np.int64).clip(0, h - 1)
        xi = (np.arange(tw) * (w / tw)).astype(np.int64).clip(0, w - 1)
        out.append(img[yi][:, xi])
    return out
