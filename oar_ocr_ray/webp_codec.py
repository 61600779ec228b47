"""Pure-python WebP lossless (VP8L) codec — no external imaging libs.

Implements the public WebP Lossless Bitstream Specification (RFC 9649):
RIFF container, VP8L header, all four transforms (predictor with the full
14-predictor set, cross-color, subtract-green, color-indexing with pixel
bundling), canonical prefix codes (simple + normal form with the
code-length code), meta-prefix entropy images, the color cache, and
LZ77 backward references (plain distances and the 120-entry
close-neighborhood distance map).

Stands in for the reference's webp decode (the `image` crate behind
/root/reference/src/utils/image.rs:65 load_image_from_memory) the same
way png_codec / jpeg_codec stand in for PNG/JPEG. The encoder emits a
spec-valid subset (subtract-green / predictor / cross-color / palette
paths, single prefix group, optional color cache and dist-1/dist-width
LZ77 runs) so every decoder path is exercised by roundtrip tests.
libwebp-produced vectors cannot be generated in this container (no
network, no libwebp); conformance rests on the spec text.

The close-neighborhood distance table is generated from the spec's
ordering rule (sorted by x*x+y*y, then |x| ascending, then +x before -x)
and cross-checked against the first 40 entries printed in the RFC in
tests/test_webp_codec.py.
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (VP8L is LSB-first within bytes)


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        byte_i, bit_o = divmod(self.pos, 8)
        end = byte_i + ((bit_o + n + 7) >> 3)
        chunk = int.from_bytes(self.data[byte_i:end], "little")
        self.pos += n
        if self.pos > self.nbits + 64:
            raise ValueError("VP8L: read past end of stream")
        return (chunk >> bit_o) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        byte_i, bit_o = divmod(self.pos, 8)
        end = byte_i + ((bit_o + n + 7) >> 3)
        chunk = int.from_bytes(self.data[byte_i:end], "little")
        return (chunk >> bit_o) & ((1 << n) - 1)


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        # prefix-code bits go MSB-first into the LSB-first stream
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes


class _PrefixCode:
    """Decoder for one canonical prefix code.

    `single` = 0-bit code (one symbol). `pair` = the simple 2-symbol form
    (first-written symbol gets code 0, per the spec, NOT sorted order).
    Otherwise a flat table indexed by the next `maxlen` stream bits
    (LSB-first window; canonical code bits arrive MSB-first, so table
    slots are filled at bit-reversed code indices, as in DEFLATE).
    """

    __slots__ = ("single", "pair", "table", "maxlen")

    def __init__(self, lengths=None, single=None, pair=None):
        self.single = single
        self.pair = pair
        self.table = None
        self.maxlen = 0
        if lengths is None:
            return
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        maxlen = max(l for l, _ in nz)
        if maxlen > 15:
            raise ValueError("VP8L: code length > 15")
        kraft = sum(1 << (maxlen - l) for l, _ in nz)
        if kraft != (1 << maxlen):
            raise ValueError("VP8L: prefix code not complete")
        bl_count = Counter(l for l, _ in nz)
        code = 0
        next_code = {}
        for length in range(1, maxlen + 1):
            code = (code + bl_count.get(length - 1, 0)) << 1
            next_code[length] = code
        table = [None] * (1 << maxlen)
        for s, length in enumerate(lengths):
            if length == 0:
                continue
            c = next_code[length]
            next_code[length] += 1
            # reverse `length` bits of c
            r = 0
            for i in range(length):
                r = (r << 1) | ((c >> i) & 1)
            step = 1 << length
            for idx in range(r, 1 << maxlen, step):
                table[idx] = (s, length)
        self.table = table
        self.maxlen = maxlen

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.pair is not None:
            return self.pair[br.read(1)]
        ent = self.table[br.peek(self.maxlen)]
        if ent is None:
            raise ValueError("VP8L: invalid prefix code bits")
        br.pos += ent[1]
        return ent[0]


_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple form
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        s0 = br.read(8 if first_8bits else 1)
        if num_symbols == 2:
            s1 = br.read(8)
            return _PrefixCode(pair=(s0, s1))
        return _PrefixCode(single=s0)
    # normal form: code lengths coded with the code-length code
    num_clc = br.read(4) + 4
    clc_len = [0] * 19
    for i in range(num_clc):
        clc_len[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(lengths=clc_len)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code = clc.read(br)
        if code < 16:
            lengths[i] = code
            i += 1
            if code:
                prev = code
        elif code == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif code == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixCode(lengths=lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix-coded values + the close-neighborhood distance map


def _lz77_decode_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _lz77_encode_value(v: int):
    """value (>=1) -> (prefix_code, extra_bits, extra_value)."""
    u = v - 1
    if u < 4:
        return u, 0, 0
    hb = u.bit_length() - 1
    second = (u >> (hb - 1)) & 1
    code = 2 * hb + second
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return code, extra_bits, u - offset


def _make_distance_map():
    # RFC 9649: 120 closest (x, y) offsets ordered by x*x+y*y, then |x|
    # ascending, then positive x before negative.
    cands = []
    for y in range(0, 9):
        for x in range(-8, 9):
            if y == 0 and x <= 0:
                continue
            cands.append((x, y))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return tuple(cands[:120])


_DIST_MAP = _make_distance_map()


def _plane_code_to_distance(w: int, code: int) -> int:
    if code > 120:
        return code - 120
    x, y = _DIST_MAP[code - 1]
    return max(1, y * w + x)


# ---------------------------------------------------------------------------
# entropy-coded image decode

_HASH_MUL = 0x1E35A7BD


def _decode_pixels(br, w, h, groups, meta, meta_w, meta_bits, cache_bits):
    total = w * h
    out = np.zeros(total, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    single_group = groups[0] if meta is None else None
    while pos < total:
        if single_group is not None:
            g = single_group
        else:
            y, x = divmod(pos, w)
            g = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            pos += 1
            if cache is not None:
                cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> cache_shift] = argb
        elif s < 280:
            length = _lz77_decode_value(br, s - 256)
            dist_code = _lz77_decode_value(br, g[4].read(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            if pos + length > total:
                raise ValueError("VP8L: backward reference past end")
            if cache is None:
                if dist >= length:
                    out[pos:pos + length] = out[pos - dist:pos - dist + length]
                    pos += length
                else:
                    for _ in range(length):
                        out[pos] = out[pos - dist]
                        pos += 1
            else:
                for _ in range(length):
                    argb = int(out[pos - dist])
                    out[pos] = argb
                    pos += 1
                    cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> cache_shift] = argb
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _read_entropy_image(br, w, h, *, is_main: bool):
    """Decode one entropy-coded image (no transforms) -> flat uint32 ARGB."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache bits")
    meta = None
    meta_w = meta_bits = 0
    num_groups = 1
    if is_main and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _read_entropy_image(br, meta_w, meta_h, is_main=False)
        meta = (((meta_img >> 8) & 0xFFFF)).astype(np.int64)
        num_groups = int(meta.max()) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    sizes = (green_alpha, 256, 256, 256, 40)
    groups = [
        tuple(_read_prefix_code(br, sizes[k]) for k in range(5))
        for _ in range(num_groups)
    ]
    return _decode_pixels(br, w, h, groups, meta, meta_w, meta_bits, cache_bits)


# ---------------------------------------------------------------------------
# transforms

_PRED_BLACK = np.uint32(0xFF000000)


def _argb_split(a: np.ndarray):
    return (a >> 24) & 0xFF, (a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF


def _argb_join(al, r, g, b):
    return (
        (al.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )


def _avg2(p, q):
    """Per-channel (p+q)>>1 on scalar python-int ARGB."""
    return (((p ^ q) & 0xFEFEFEFE) >> 1) + (p & q)


def _clamp_add_full(l, t, tl):
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_half(ave, tl):
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ave >> sh) & 0xFF
        v = a + ((a - ((tl >> sh) & 0xFF)) >> 1)
        out |= max(0, min(255, v)) << sh
    return out


def _select(l, t, tl):
    p_l = p_t = 0
    for sh in (0, 8, 16, 24):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p_l += abs(tc - tlc)  # |pred - L| where pred = L + T - TL
        p_t += abs(lc - tlc)
    return t if p_t <= p_l else l


def _add_pixels(p, pred):
    """Per-channel (p + pred) & 0xff on scalar ints."""
    out = 0
    for sh in (0, 8, 16, 24):
        out |= ((((p >> sh) & 0xFF) + ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _inverse_predictor(res: np.ndarray, w: int, h: int, modes, tiles_w, bits):
    """Sequential predictor inverse. Fast paths for whole rows of mode 1/2."""
    out = res.copy()
    u8 = out.view(np.uint8).reshape(h, w, 4)  # little-endian: [b, g, r, a]
    r8 = res.view(np.uint8).reshape(h, w, 4)
    # row 0: (0,0) uses the opaque-black predictor, x>0 uses L — together a
    # per-channel cumsum seeded with 0xff000000 (alpha byte = channel 3)
    row0 = np.cumsum(r8[0, :, :].astype(np.uint32), axis=0)
    row0[:, 3] += 0xFF
    u8[0, :, :] = row0.astype(np.uint8)
    flat = out
    for y in range(1, h):
        row_modes = modes[(y >> bits) * tiles_w:(y >> bits) * tiles_w + tiles_w]
        row_off = y * w
        # x = 0 always uses T
        flat[row_off] = _add_pixels(int(res[row_off]), int(flat[row_off - w]))
        uniform = len(set(int(m) for m in row_modes)) == 1
        mode_all = int(row_modes[0]) if uniform else -1
        if uniform and mode_all == 2 and w > 1:
            # T predictor: whole row is prev row + residual (vector)
            u8[y, 1:, :] = (
                r8[y, 1:, :].astype(np.uint16) + u8[y - 1, 1:, :]
            ).astype(np.uint8)
            continue
        if uniform and mode_all == 1 and w > 1:
            # L predictor: per-channel cumsum seeded by x=0 pixel
            acc = u8[y, 0, :].astype(np.uint32)
            u8[y, 1:, :] = (
                np.cumsum(r8[y, 1:, :].astype(np.uint32), axis=0) + acc
            ).astype(np.uint8)
            continue
        for x in range(1, w):
            pos = row_off + x
            mode = int(row_modes[x >> bits])
            l = int(flat[pos - 1])
            t = int(flat[pos - w])
            tl = int(flat[pos - w - 1])
            tr = int(flat[pos - w + 1])  # x==w-1 wraps to (0, y), already decoded
            if mode == 0:
                pred = int(_PRED_BLACK)
            elif mode == 1:
                pred = l
            elif mode == 2:
                pred = t
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(l, tr), t)
            elif mode == 6:
                pred = _avg2(l, tl)
            elif mode == 7:
                pred = _avg2(l, t)
            elif mode == 8:
                pred = _avg2(tl, t)
            elif mode == 9:
                pred = _avg2(t, tr)
            elif mode == 10:
                pred = _avg2(_avg2(l, tl), _avg2(t, tr))
            elif mode == 11:
                pred = _select(l, t, tl)
            elif mode == 12:
                pred = _clamp_add_full(l, t, tl)
            elif mode == 13:
                pred = _clamp_add_half(_avg2(l, t), tl)
            else:
                raise ValueError(f"VP8L: bad predictor mode {mode}")
            flat[pos] = _add_pixels(int(res[pos]), pred)
    return flat


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, vectorized."""
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def _inverse_color_transform(a, w, h, cte, tiles_w, bits):
    al, r, g, b = _argb_split(a)
    ys = (np.arange(h) >> bits)[:, None]
    xs = (np.arange(w) >> bits)[None, :]
    tile_idx = (ys * tiles_w + xs).reshape(-1)
    e = cte[tile_idx]
    g2r = (e >> 0) & 0xFF
    g2b = (e >> 8) & 0xFF
    r2b = (e >> 16) & 0xFF
    new_r = (r.astype(np.int32) + _ct_delta(g2r, g)) & 0xFF
    new_b = (b.astype(np.int32) + _ct_delta(g2b, g)) & 0xFF
    new_b = (new_b + _ct_delta(r2b, new_r.astype(np.uint32))) & 0xFF
    return _argb_join(al, new_r.astype(np.uint32), g, new_b.astype(np.uint32))


def _inverse_subtract_green(a):
    al, r, g, b = _argb_split(a)
    return _argb_join(al, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inverse_color_indexing(a, packed_w, h, full_w, palette):
    lut = np.zeros(256, dtype=np.uint32)
    lut[: len(palette)] = palette
    width_bits = _palette_width_bits(len(palette))
    idx = ((a >> 8) & 0xFF).astype(np.uint32).reshape(h, packed_w)
    if width_bits == 0:
        return lut[idx].reshape(-1)
    bpp = 8 >> width_bits
    per_byte = 1 << width_bits
    mask = (1 << bpp) - 1
    ks = np.arange(per_byte) * bpp
    unpacked = ((idx[:, :, None] >> ks[None, None, :]) & mask).reshape(h, -1)
    return lut[unpacked[:, :full_w]].reshape(-1)


# ---------------------------------------------------------------------------
# container + top-level decode


def _find_vp8l(data: bytes) -> bytes:
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if tag == b"VP8L":
            return data[pos + 8:pos + 8 + size]
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 webp requires a video codec not present in this "
                "container; only lossless VP8L is implemented"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WEBP: no VP8L chunk found")


def decode_webp(data: bytes) -> np.ndarray:
    """WebP lossless bytes -> (H, W, 3) uint8 RGB (alpha dropped)."""
    br = _BitReader(_find_vp8l(data))
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    full_w = w
    transforms = []  # (type, params...) in stream order
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            modes = ((_read_entropy_image(br, tw, th, is_main=False) >> 8) & 0xFF)
            transforms.append(("pred", bits, tw, modes))
        elif ttype == 1:  # cross-color
            bits = br.read(3) + 2
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            cte = _read_entropy_image(br, tw, th, is_main=False)
            transforms.append(("color", bits, tw, cte))
        elif ttype == 2:  # subtract green
            transforms.append(("sg",))
        else:  # color indexing
            size = br.read(8) + 1
            pal_delta = _read_entropy_image(br, size, 1, is_main=False)
            # palette entries are delta-coded per channel
            pal = np.zeros(size, dtype=np.uint32)
            prev = 0
            for i in range(size):
                prev = _add_pixels(int(pal_delta[i]), prev)
                pal[i] = prev
            packed_w = (w + (1 << _palette_width_bits(size)) - 1) >> _palette_width_bits(size) \
                if _palette_width_bits(size) else w
            transforms.append(("index", w, pal))
            w = packed_w  # subsequent decode happens at packed width
    a = _read_entropy_image(br, w, h, is_main=True)
    for t in reversed(transforms):
        if t[0] == "pred":
            _, bits, tw, modes = t
            a = _inverse_predictor(a, w, h, modes, tw, bits)
        elif t[0] == "color":
            _, bits, tw, cte = t
            a = _inverse_color_transform(a, w, h, cte, tw, bits)
        elif t[0] == "sg":
            a = _inverse_subtract_green(a)
        else:
            _, orig_w, pal = t
            a = _inverse_color_indexing(a, w, h, orig_w, pal)
            w = orig_w
    assert w == full_w, "color-indexing inverse must restore the full width"
    al, r, g, b = _argb_split(a)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return rgb.reshape(h, full_w, 3)


# ---------------------------------------------------------------------------
# encoder: length-limited Huffman


def _huff_lengths(freqs, maxlen):
    """Frequencies -> canonical code lengths, zlib-style length-limited."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    n = len(freqs)
    lengths = [0] * n
    if not syms:
        return lengths
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    import heapq

    heap = [(freqs[s], s, (s,)) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    tie = n
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1:
            depth[s] += 1
        for s in g2:
            depth[s] += 1
        tie += 1
        heapq.heappush(heap, (f1 + f2, tie, g1 + g2))
    # clip to maxlen, then zlib bl_count overflow repair
    bl = [0] * (maxlen + 1)
    overflow = 0
    for s in syms:
        d = depth[s]
        if d > maxlen:
            overflow += d - maxlen  # conservative upper bound; loop below
            d = maxlen
        bl[d] += 1
    # recompute true overflow via Kraft deficit: sum 2^-l must equal 1
    while sum(bl[l] << (maxlen - l) for l in range(1, maxlen + 1)) > (1 << maxlen):
        bits = maxlen - 1
        while bl[bits] == 0:
            bits -= 1
        bl[bits] -= 1
        bl[bits + 1] += 2
        bl[maxlen] -= 1
    # assign: most frequent symbols get the shortest codes (deterministic)
    order = sorted(syms, key=lambda s: (-freqs[s], s))
    out_lens = []
    for length in range(1, maxlen + 1):
        out_lens.extend([length] * bl[length])
    assert len(out_lens) == len(order)
    for s, length in zip(order, out_lens):
        lengths[s] = length
    kraft = sum(1 << (maxlen - l) for l in out_lens)
    if kraft != (1 << maxlen):
        raise AssertionError("internal: huffman lengths not complete")
    return lengths


def _canonical_codes(lengths):
    """lengths -> {symbol: (code, length)}; single symbol -> 0-bit code."""
    nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}
    maxlen = max(l for l, _ in nz)
    bl_count = Counter(l for l, _ in nz)
    code = 0
    next_code = {}
    for length in range(1, maxlen + 1):
        code = (code + bl_count.get(length - 1, 0)) << 1
        next_code[length] = code
    out = {}
    for s, length in enumerate(lengths):
        if length == 0:
            continue
        out[s] = (next_code[length], length)
        next_code[length] += 1
    return out


def _write_prefix_code(bw, lengths):
    nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
    if len(nz) <= 2 and all(s < 256 for s, _ in nz):
        bw.write(1, 1)  # simple form
        if not nz:
            nz = [(0, 1)]  # code never read by the decoder; emit symbol 0
        bw.write(len(nz) - 1, 1)
        s0 = nz[0][0]
        f8 = 1 if s0 > 1 else 0
        bw.write(f8, 1)
        bw.write(s0, 8 if f8 else 1)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        return
    bw.write(0, 1)  # normal form
    # RLE the full lengths array into code-length-code tokens (no max_symbol)
    n = len(lengths)
    toks = []
    i = 0
    prev = 8
    while i < n:
        v = lengths[i]
        if v == 0:
            run = 0
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                chunk = min(run, 138)
                toks.append((18, 7, chunk - 11))
                run -= chunk
            if run >= 3:
                toks.append((17, 3, run - 3))
                run = 0
            toks.extend((0, 0, 0) for _ in range(run))
        else:
            toks.append((v, 0, 0))
            prev = v
            i += 1
            run = 0
            while i + run < n and lengths[i + run] == prev:
                run += 1
            i += run
            while run >= 3:
                chunk = min(run, 6)
                toks.append((16, 2, chunk - 3))
                run -= chunk
            toks.extend((prev, 0, 0) for _ in range(run))
    clc_freqs = [0] * 19
    for sym, _, _ in toks:
        clc_freqs[sym] += 1
    clc_len = _huff_lengths(clc_freqs, maxlen=7)
    clc_codes = _canonical_codes(clc_len)
    bw.write(19 - 4, 4)
    for k in range(19):
        bw.write(clc_len[_CLC_ORDER[k]], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    for sym, ebits, eval_ in toks:
        c, cl = clc_codes[sym]
        bw.write_code(c, cl)
        if ebits:
            bw.write(eval_, ebits)


# ---------------------------------------------------------------------------
# encoder: entropy image


def _runs_starting_at(mask):
    """mask -> array r where r[i] = count of consecutive True at i onward."""
    n = len(mask)
    if n == 0:
        return np.zeros(0, np.int64)
    mr = mask[::-1]
    idx = np.arange(n, dtype=np.int64)
    last_false = np.maximum.accumulate(np.where(~mr, idx, -1))
    return (idx - last_false)[::-1]


def _tokenize(a, w, cache_bits, use_lz77):
    n = len(a)
    toks = []
    if use_lz77:
        eq1 = np.zeros(n, bool)
        eq1[1:] = a[1:] == a[:-1]
        runs1 = _runs_starting_at(eq1)
        if n > w:
            eqw = np.zeros(n, bool)
            eqw[w:] = a[w:] == a[:-w]
            runsw = _runs_starting_at(eqw)
        else:
            runsw = np.zeros(n, np.int64)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    while pos < n:
        if use_lz77:
            l1 = int(runs1[pos])
            lw = int(runsw[pos])
            length, dist = (l1, 1) if l1 >= lw else (lw, w)
            if length >= 4 and pos >= dist:
                length = min(length, 4096)
                toks.append(("copy", length, dist))
                if cache is not None:
                    for k in range(pos, pos + length):
                        v = int(a[k])
                        cache[((_HASH_MUL * v) & 0xFFFFFFFF) >> shift] = v
                pos += length
                continue
        v = int(a[pos])
        if cache is not None:
            hidx = ((_HASH_MUL * v) & 0xFFFFFFFF) >> shift
            if cache[hidx] == v:
                toks.append(("cache", hidx))
                pos += 1
                continue
            cache[hidx] = v
        toks.append(("lit", v))
        pos += 1
    return toks


def _write_entropy_image(bw, a, w, h, *, is_main, cache_bits=0, use_lz77=False):
    assert len(a) == w * h
    toks = _tokenize(a, w, cache_bits, use_lz77)
    cache_size = (1 << cache_bits) if cache_bits else 0
    gf = [0] * (256 + 24 + cache_size)
    rf = [0] * 256
    bf = [0] * 256
    af = [0] * 256
    df = [0] * 40
    for t in toks:
        if t[0] == "lit":
            v = t[1]
            gf[(v >> 8) & 0xFF] += 1
            rf[(v >> 16) & 0xFF] += 1
            bf[v & 0xFF] += 1
            af[(v >> 24) & 0xFF] += 1
        elif t[0] == "copy":
            gf[256 + _lz77_encode_value(t[1])[0]] += 1
            df[_lz77_encode_value(t[2] + 120)[0]] += 1
        else:
            gf[280 + t[1]] += 1
    lens = [
        _huff_lengths(gf, 15),
        _huff_lengths(rf, 15),
        _huff_lengths(bf, 15),
        _huff_lengths(af, 15),
        _huff_lengths(df, 15),
    ]
    codes = [_canonical_codes(l) if any(l) else {0: (0, 0)} for l in lens]
    # header: color cache, then (main only) meta-prefix bit
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_main:
        bw.write(0, 1)  # single prefix group, no meta image
    for l in lens:
        _write_prefix_code(bw, l)
    gc, rc, bc, ac, dc = codes
    for t in toks:
        if t[0] == "lit":
            v = t[1]
            c, cl = gc[(v >> 8) & 0xFF]
            bw.write_code(c, cl)
            c, cl = rc[(v >> 16) & 0xFF]
            bw.write_code(c, cl)
            c, cl = bc[v & 0xFF]
            bw.write_code(c, cl)
            c, cl = ac[(v >> 24) & 0xFF]
            bw.write_code(c, cl)
        elif t[0] == "copy":
            sym, ebits, ev = _lz77_encode_value(t[1])
            c, cl = gc[256 + sym]
            bw.write_code(c, cl)
            if ebits:
                bw.write(ev, ebits)
            sym, ebits, ev = _lz77_encode_value(t[2] + 120)
            c, cl = dc[sym]
            bw.write_code(c, cl)
            if ebits:
                bw.write(ev, ebits)
        else:
            c, cl = gc[280 + t[1]]
            bw.write_code(c, cl)


# ---------------------------------------------------------------------------
# encoder: forward transforms + top level


def _forward_subtract_green(a):
    al, r, g, b = _argb_split(a)
    return _argb_join(al, (r - g) & 0xFF, g, (b - g) & 0xFF)


def _ct_delta_scalar(t: int, c: np.ndarray) -> np.ndarray:
    ts = int(np.int8(np.uint8(t & 0xFF)))
    return (ts * c.astype(np.int8).astype(np.int32)) >> 5


def _forward_color_transform(a, g2r, g2b, r2b):
    al, r, g, b = _argb_split(a)
    new_r = (r.astype(np.int32) - _ct_delta_scalar(g2r, g)) & 0xFF
    new_b = (
        b.astype(np.int32)
        - _ct_delta_scalar(g2b, g)
        - _ct_delta_scalar(r2b, r)  # forward uses the ORIGINAL red
    ) & 0xFF
    return _argb_join(al, new_r.astype(np.uint32), g, new_b.astype(np.uint32))


def _forward_predictor(a, w, h, size_bits):
    """Residual-code `a` with per-block best of L(1)/T(2) predictors."""
    bs = 1 << size_bits
    tw = (w + bs - 1) // bs
    th = (h + bs - 1) // bs
    base = np.ascontiguousarray(a.view(np.uint8).reshape(h, w, 4))
    # wraparound cost of each candidate on interior pixels
    ld = np.zeros((h, w, 4), np.uint8)
    ud = np.zeros((h, w, 4), np.uint8)
    ld[:, 1:] = base[:, 1:] - base[:, :-1]
    ud[1:, :] = base[1:, :] - base[:-1, :]
    cl = np.minimum(ld.astype(np.int32), 256 - ld.astype(np.int32)).sum(axis=2)
    cu = np.minimum(ud.astype(np.int32), 256 - ud.astype(np.int32)).sum(axis=2)
    cl[0, :] = cu[0, :] = 0  # row 0 / col 0 modes are overridden by edge rules
    cl[:, 0] = cu[:, 0] = 0
    rows = np.arange(0, h, bs)
    cols = np.arange(0, w, bs)
    bl = np.add.reduceat(np.add.reduceat(cl, rows, axis=0), cols, axis=1)
    bu = np.add.reduceat(np.add.reduceat(cu, rows, axis=0), cols, axis=1)
    modes = np.where(bu <= bl, 2, 1).astype(np.uint32)  # (th, tw)
    res = np.empty_like(base)
    res[0, 0] = base[0, 0] - np.array([0, 0, 0, 255], np.uint8)
    if w > 1:
        res[0, 1:] = base[0, 1:] - base[0, :-1]
    if h > 1:
        res[1:, 0] = base[1:, 0] - base[:-1, 0]
    if w > 1 and h > 1:
        mm = np.repeat(np.repeat(modes, bs, axis=0)[:h], bs, axis=1)[:, :w]
        sel = (mm[1:, 1:] == 2)[:, :, None]
        res[1:, 1:] = np.where(sel, ud[1:, 1:], ld[1:, 1:])
    res_flat = np.ascontiguousarray(res).view(np.uint32).reshape(-1)
    return res_flat, modes.reshape(-1), tw, th


def _write_palette_transform(bw, argb, w, h):
    pal, inv = np.unique(argb, return_inverse=True)
    size = len(pal)
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(size - 1, 8)
    pb = np.ascontiguousarray(pal.astype(np.uint32)).view(np.uint8).reshape(size, 4)
    db = pb.copy()
    db[1:] = pb[1:] - pb[:-1]  # per-channel delta coding, uint8 wrap
    deltas = np.ascontiguousarray(db).view(np.uint32).reshape(-1)
    _write_entropy_image(bw, deltas, size, 1, is_main=False)
    wb = _palette_width_bits(size)
    idx = inv.astype(np.uint32).reshape(h, w)
    if wb == 0:
        packed = idx
        pw = w
    else:
        per = 1 << wb
        bpp = 8 >> wb
        pw = (w + per - 1) // per
        padded = np.zeros((h, pw * per), np.uint32)
        padded[:, :w] = idx
        packed = (
            padded.reshape(h, pw, per) << (np.arange(per, dtype=np.uint32) * bpp)
        ).sum(axis=2, dtype=np.uint32)
    main = (np.uint32(0xFF000000) | (packed.reshape(-1) << 8)).astype(np.uint32)
    return main, pw


def _riff_wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_webp(
    img: np.ndarray,
    *,
    palette: object = "auto",
    predictor: bool = False,
    color_transform: tuple | None = None,
    cache_bits: int = 0,
    use_lz77: bool = True,
) -> bytes:
    """(H, W, 3) uint8 RGB -> lossless WebP (VP8L) bytes.

    palette="auto" uses the color-indexing transform when the image has
    <=256 distinct colors and no other transform was requested; predictor
    enables a per-16px-block L/T predictor; color_transform=(g2r, g2b, r2b)
    applies one global cross-color element; cache_bits>0 enables the color
    cache. Every option roundtrips through decode_webp bit-exactly.
    """
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("RGB only")
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("cache_bits must be 1..11")
    argb = _argb_join(
        np.full((h, w), 255, np.uint32),
        a[:, :, 0].astype(np.uint32),
        a[:, :, 1].astype(np.uint32),
        a[:, :, 2].astype(np.uint32),
    ).reshape(-1)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    use_pal = False
    if palette == "auto":
        use_pal = (
            not predictor
            and color_transform is None
            and len(np.unique(argb)) <= 256
        )
    elif palette:
        if predictor or color_transform is not None:
            raise ValueError("palette excludes predictor/color_transform here")
        if len(np.unique(argb)) > 256:
            raise ValueError("palette requested but image has >256 colors")
        use_pal = True
    cur_w = w
    if use_pal:
        main, cur_w = _write_palette_transform(bw, argb, w, h)
    else:
        bw.write(1, 1)
        bw.write(2, 2)  # subtract green
        cur = _forward_subtract_green(argb)
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(9 - 2, 3)  # 512px tiles -> one CTE for most images
            tw = (w + 511) // 512
            th = (h + 511) // 512
            cte = (
                0xFF000000
                | ((r2b & 0xFF) << 16)
                | ((g2b & 0xFF) << 8)
                | (g2r & 0xFF)
            )
            _write_entropy_image(
                bw, np.full(tw * th, cte, np.uint32), tw, th, is_main=False
            )
            cur = _forward_color_transform(cur, g2r, g2b, r2b)
        if predictor:
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(4 - 2, 3)  # 16px blocks
            res, modes, tw, th = _forward_predictor(cur, w, h, 4)
            _write_entropy_image(
                bw,
                (np.uint32(0xFF000000) | (modes << 8)).astype(np.uint32),
                tw,
                th,
                is_main=False,
            )
            cur = res
        main = cur
    bw.write(0, 1)  # end of transforms
    _write_entropy_image(
        bw, main, cur_w, h, is_main=True, cache_bits=cache_bits, use_lz77=use_lz77
    )
    return _riff_wrap(bw.bytes())
