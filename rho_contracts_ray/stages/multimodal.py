"""Multimodal column plumbing (image/audio/video as opaque binary + typed
metadata).

Decode support — ALL real and lib-free in this container:
  * uncompressed 24-bit BMP pixel decode, full 8-bit PNG pixel decode
    (stdlib-zlib inflate + all five unfilters; gray / RGB / palette /
    alpha variants — encode_png/decode_png), GIF87a/89a decode (real LZW
    with dictionary growth, interlace, local palettes —
    encode_gif/decode_gif), baseline-DCT JPEG decode (canonical Huffman,
    dequantize/dezigzag, batched IDCT, chroma upsampling, restart
    intervals — encode_jpeg/decode_jpeg; progressive SOF2 raises), PNG
    header parsing, and PCM-16 WAV decode — pure numpy / struct / zlib;
  * `decoder="deterministic-fake"` emits a seeded feature vector for
    plumbing tests regardless of format.
Everything Ray-side — schema, actor-pool signature, batch sizing for
large payloads, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # 'image' | 'audio' | 'video'
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-feature vector: bytes of
    sha256(payload) expanded to `dim` floats in [0, 1)."""
    h = hashlib.sha256(payload).digest()
    reps = (dim * 4) // len(h) + 1
    raw = (h * reps)[: dim * 4]
    return (np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
            % 1000) / 1000.0


# -- lib-free codecs (numpy/struct only) ------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows padded to 4 bytes) — valid for any BMP viewer."""
    import struct

    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = pixels[y, :, ::-1].tobytes()
        body += bgr + b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported "
                         f"(got bpp={bpp}, compression={comp})")
    stride = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    raw = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def png_header_dims(b: bytes):
    """(width, height) from a PNG IHDR chunk — header-only, no codec."""
    import struct

    if b[:8] != b"\x89PNG\r\n\x1a\n" or len(b) < 24:
        return None
    return struct.unpack_from(">II", b, 16)


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG (8-bit truecolor, filter-0 rows, one
    zlib IDAT) — stdlib zlib + struct only, valid for any PNG viewer."""
    import struct
    import zlib

    h, w, _ = pixels.shape
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_png(b: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> (h, w, 3) uint8 RGB, REAL and lib-free
    (PNG's only codec dependency is DEFLATE — stdlib zlib — plus the five
    per-row unfilters, done here in numpy/python).  Supports color types
    0 (gray), 2 (RGB), 3 (palette via PLTE), 4 (gray+alpha), 6 (RGBA);
    alpha is dropped and gray broadcast to RGB.  16-bit and interlaced
    variants raise ValueError naming the limitation."""
    import struct
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = []
    off = 8
    while off + 8 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, off)
        data = b[off + 8: off + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        off += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace="
            f"{interlace}) — this lib-free decoder handles 8-bit "
            f"non-interlaced images")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    bpp = channels
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y]
        if f == 0:                          # None
            rec = cur.copy()
        elif f == 2:                        # Up — vectorized
            rec = (cur + prev) % 256
        elif f == 1:                        # Sub — mod-256 prefix sum/lane
            rec = cur.copy()
            for j in range(bpp):
                rec[j::bpp] = np.cumsum(cur[j::bpp]) % 256
        elif f == 3:                        # Average — left dep, per byte
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + ((left + prev[x]) >> 1)) % 256
        elif f == 4:                        # Paeth — left dep, per byte
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                up = prev[x]
                p = a + up - c
                da, db, dc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (da <= db and da <= dc) else \
                    (up if db <= dc else c)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    px = out.astype(np.uint8).reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing its PLTE chunk")
        if int(px.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index out of range")
        return plte[px[:, :, 0]]
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def encode_gif(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with <= 256 distinct colors -> GIF89a, written
    in 'uncompressed' LZW form (every index emitted as a literal code,
    CLEAR sent before the code width would grow) — decodes in any GIF
    reader, struct/numpy only."""
    import struct

    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError(f"encode_gif: {palette.shape[0]} distinct colors "
                         f"(max 256) — quantize first")
    # LZW min code size is clamped to 2 by the format, so the color table
    # must hold 1 << min_code entries — padding only to the power-of-two
    # palette size corrupted <=2-color images (header claimed 4 entries,
    # 2 were written; every decoder misparsed the stream)
    psize = max(2, 1 << int(palette.shape[0] - 1).bit_length())
    min_code = max(2, (psize - 1).bit_length())
    pal = np.zeros((1 << min_code, 3), np.uint8)
    pal[: palette.shape[0]] = palette
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1

    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    budget = (1 << width) - eoi - 2   # literals before the width would grow
    n_since = 0
    for idx in inverse.reshape(-1):
        emit(int(idx))
        n_since += 1
        if n_since >= budget:
            emit(clear)
            n_since = 0
    emit(eoi)
    if nacc:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF0 | (min_code - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<cHHHHB", b",", 0, 0, w, h, 0)   # image descriptor
    out.append(min_code)
    data = bytes(bits)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00;"
    return bytes(out)


def decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a -> (h, w, 3) uint8 RGB of the FIRST image: real LZW
    decode (dictionary growth, CLEAR/EOI, variable code width), interlace
    de-weaving, global/local color tables — struct/numpy + a per-code
    python LZW loop (fine for thumbnails; a C codec is the throughput path
    for multi-megapixel frames)."""
    import struct

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b, np.uint8, count=3 * n, offset=off) \
            .reshape(n, 3)
        off += 3 * n
    while off < len(b):
        marker = b[off]
        if marker == 0x21:                    # extension: skip sub-blocks
            off += 2
            while off < len(b) and b[off]:
                off += 1 + b[off]
            off += 1
        elif marker == 0x2C:                  # image descriptor
            _, _, w, h, iflags = struct.unpack_from("<HHHHB", b, off + 1)
            off += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(b, np.uint8, count=3 * n,
                                    offset=off).reshape(n, 3)
                off += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = b[off]
            off += 1
            data = bytearray()
            while off < len(b) and b[off]:
                ln = b[off]
                data += b[off + 1: off + 1 + ln]
                off += 1 + ln
            off += 1
            indices = _lzw_decode(bytes(data), min_code, w * h)
            if indices.size < w * h:
                raise ValueError("GIF pixel data truncated")
            idx = indices[: w * h].reshape(h, w)
            if iflags & 0x40:                 # interlaced: de-weave rows
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                de = np.empty(h, np.int64)
                de[order] = np.arange(h)
                idx = idx[de]
            if int(idx.max(initial=0)) >= pal.shape[0]:
                raise ValueError("GIF palette index out of range")
            return pal[idx]
        elif marker == 0x3B:                  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block marker 0x{marker:02x}")
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable width starting at min_code+1, dict grows
    to 4096 entries, CLEAR resets, EOI stops."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    width = min_code + 1
    next_code = eoi + 1
    acc = nacc = pos = 0
    prev = None
    out: list = []
    n = len(data)
    while len(out) < max_pixels:
        while nacc < width:
            if pos >= n:
                return np.array(out, np.int32)
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = fresh()
            width = min_code + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
        elif code == next_code:               # the KwKwK case
            entry = prev + (prev[0],)
            if next_code < 4096:
                table[next_code] = entry
                next_code += 1
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        prev = entry
        if next_code == (1 << width) and width < 12:
            width += 1
    return np.array(out, np.int32)


# ---------------------------------------------------------------------------
# JPEG (baseline DCT, lib-free)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)


def _dct_matrix_n(n: int) -> np.ndarray:
    """Orthonormal n x n DCT-II matrix A: forward DCT = A @ x @ A.T,
    inverse = A.T @ X @ A.  n=8 serves the JPEG codec, n=32 pHash."""
    k = np.arange(n)
    a = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n)) \
        * np.sqrt(2.0 / n)
    a[0] /= np.sqrt(2.0)
    return a


_DCT_A = _dct_matrix_n(8)
_DCT_A32 = _dct_matrix_n(32)


class _HuffTable:
    """Canonical JPEG Huffman table from the DHT BITS/HUFFVAL lists —
    decoded by walking (length, code) pairs (thumbnail-grade Python loop,
    same class as the GIF LZW loop; a C codec is the throughput path)."""

    def __init__(self, bits: "list[int]", vals: bytes):
        self.lookup: dict = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


def _receive_extend(bits: np.ndarray, pos: int, size: int):
    v = 0
    for _ in range(size):
        v = (v << 1) | int(bits[pos])
        pos += 1
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v, pos


def _read_huff(bits: np.ndarray, pos: int, table: _HuffTable):
    code = 0
    n = bits.size
    for ln in range(1, 17):
        if pos >= n:
            raise ValueError("JPEG entropy stream truncated")
        code = (code << 1) | int(bits[pos])
        pos += 1
        sym = table.lookup.get((ln, code))
        if sym is not None:
            return sym, pos
    raise ValueError("invalid JPEG Huffman code")


def _decode_block(bits, pos, dc_tab, ac_tab, pred):
    """One 8x8 block: DC diff + AC run-length -> 64 zigzag-ORDER coefs."""
    coef = np.zeros(64, np.float64)
    s, pos = _read_huff(bits, pos, dc_tab)
    diff = 0
    if s:
        diff, pos = _receive_extend(bits, pos, s)
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        rs, pos = _read_huff(bits, pos, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:           # ZRL: 16 zeros
                k += 16
                continue
            break                 # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        v, pos = _receive_extend(bits, pos, s)
        coef[k] = v
        k += 1
    return coef, pos, pred


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline-DCT JPEG (SOF0) -> (h, w, 3) uint8 RGB: real marker/DQT/
    DHT parsing, canonical Huffman decode, dequantize + dezigzag, batched
    orthonormal IDCT (one numpy einsum over all blocks per component),
    h/v-factor chroma upsampling (nearest) and YCbCr->RGB — struct/numpy
    plus a per-symbol Python Huffman loop (thumbnail-grade, like the GIF
    LZW loop).  Grayscale and 4:4:4/4:2:2/4:2:0 color, 8/16-bit DQT,
    restart intervals.  Progressive (SOF2) and arithmetic coding raise
    ValueError."""
    import struct

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(b)
    while pos < n:
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:        # EOI
            break
        ln = struct.unpack_from(">H", b, pos)[0]
        seg = b[pos + 2: pos + ln]
        pos += ln
        if marker == 0xDB:        # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                off += 1
                if pq:
                    qt[tq] = np.frombuffer(seg, ">u2", 64, off) \
                        .astype(np.float64)
                    off += 128
                else:
                    qt[tq] = np.frombuffer(seg, np.uint8, 64, off) \
                        .astype(np.float64)
                    off += 64
        elif marker == 0xC4:      # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits_ = list(seg[off + 1: off + 17])
                nv = sum(bits_)
                vals = seg[off + 17: off + 17 + nv]
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits_, vals)
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:   # baseline / ext. sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline JPEG (SOF0/SOF1) is supported "
                f"(SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:      # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:      # SOS: entropy-coded segment follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            # locate the end of the ECS: 0xFF not followed by 00/D0-D7
            end = pos
            while end < n - 1:
                if b[end] == 0xFF and b[end + 1] != 0x00 and \
                        not (0xD0 <= b[end + 1] <= 0xD7):
                    break
                end += 1
            ecs = b[pos:end]
            pos = end
            return _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                                restart_interval, ecs)
        # all other segments (APPn, COM) are skipped
    raise ValueError("JPEG contains no scan data")


def _decode_scan(frame, scan, qt, huff_dc, huff_ac, restart_interval, ecs):
    # split on restart markers; strip byte stuffing per interval
    intervals = []
    cur = bytearray()
    i, n = 0, len(ecs)
    while i < n:
        if ecs[i] == 0xFF and i + 1 < n:
            nxt = ecs[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(ecs[i])
        i += 1
    intervals.append(bytes(cur))

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component zigzag-order coefficient store, one row per block
    store = {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64))
             for c in comps}
    iv = 0
    bits = np.unpackbits(np.frombuffer(intervals[0], np.uint8))
    bpos = 0
    preds = {c["id"]: 0 for c in comps}
    since_restart = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_restart == restart_interval:
                iv += 1
                if iv >= len(intervals):
                    raise ValueError("JPEG restart interval underrun")
                bits = np.unpackbits(np.frombuffer(intervals[iv], np.uint8))
                bpos = 0
                preds = {c["id"]: 0 for c in comps}
                since_restart = 0
            for comp, td, ta in scan:
                for vy in range(comp["v"]):
                    for hx in range(comp["h"]):
                        coef, bpos, preds[comp["id"]] = _decode_block(
                            bits, bpos, huff_dc[td], huff_ac[ta],
                            preds[comp["id"]])
                        store[comp["id"]][my * comp["v"] + vy,
                                          mx * comp["h"] + hx] = coef
            since_restart += 1

    planes = []
    for comp in comps:
        z = store[comp["id"]].reshape(-1, 64) * qt[comp["tq"]][None, :]
        nat = np.zeros_like(z)
        nat[:, _ZIGZAG] = z          # dezigzag
        blocks = nat.reshape(-1, 8, 8)
        # batched orthonormal IDCT over every block at once
        px = np.einsum("ij,njk,kl->nil", _DCT_A.T, blocks, _DCT_A) + 128.0
        by, bx = mcuy * comp["v"], mcux * comp["h"]
        plane = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        # upsample to full resolution (nearest) and crop
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"JPEG with {len(planes)} components unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255) \
        .round().astype(np.uint8)


# encoder-side Huffman: uniform-length canonical tables (12 DC symbols at
# 4 bits, 162 AC symbols at 8 bits — the all-ones code stays unused, as
# the standard requires).  Tables travel in the stream's own DHT, so any
# decoder reads them; simplicity beats entropy here (the engine's JPEGs
# are test/plumbing artifacts, not an archival codec).
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_VALS = bytes([0x00, 0xF0] + [(r << 4) | s for r in range(16)
                                     for s in range(1, 11)])
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self):
        if self.nacc:
            self.write((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # 1-pad


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JPEG, 4:4:4, all-ones quant tables
    (maximum fidelity: round-trip error is IDCT rounding only, exact on
    flat blocks) and uniform-length Huffman tables written into the
    stream's DHT segments.  Independent of decode_jpeg's table/bit logic,
    so the round-trip is a genuine differential test."""
    import struct

    h, w, _ = pixels.shape
    p = pixels.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = 128.0 - 0.168736 * p[..., 0] - 0.331264 * p[..., 1] \
        + 0.5 * p[..., 2]
    cr = 128.0 + 0.5 * p[..., 0] - 0.418688 * p[..., 1] \
        - 0.081312 * p[..., 2]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    dc_code = {s: (s, 4) for s in range(12)}
    ac_code = {sym: (i, 8) for i, sym in enumerate(_ENC_AC_VALS)}

    def plane_blocks(plane):
        pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        coef = np.einsum("ij,njk,kl->nil", _DCT_A, blocks - 128.0,
                         _DCT_A.T)
        return np.round(coef.reshape(-1, 64)[:, _ZIGZAG]).astype(np.int64)

    comps = [plane_blocks(x) for x in (y, cb, cr)]
    bw = _BitWriter()
    preds = [0, 0, 0]
    nby, nbx = ph // 8, pw // 8
    for bi in range(nby * nbx):           # 4:4:4 -> MCU = 1 block per comp
        for ci, zz in enumerate(comps):
            row = zz[bi]
            diff = int(row[0]) - preds[ci]
            preds[ci] = int(row[0])
            s = _csize(diff)
            bw.write(*dc_code[s])
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            nz = np.flatnonzero(row[1:])
            last = int(nz[-1]) + 1 if nz.size else 0
            k = 1
            while k <= last:
                run = 0
                while row[k] == 0:
                    run += 1
                    k += 1
                while run > 15:
                    bw.write(*ac_code[0xF0])   # ZRL
                    run -= 16
                v = int(row[k])
                s = _csize(v)
                bw.write(*ac_code[(run << 4) | s])
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
            if last < 63:
                bw.write(*ac_code[0x00])       # EOB
    bw.flush()

    out = bytearray(b"\xff\xd8")
    qtab = np.ones(64, np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in (1, 2, 3):
        out += struct.pack(">BBB", cid, 0x11, 0)
    for tc, bits_, vals in ((0, _ENC_DC_BITS, _ENC_DC_VALS),
                            (1, _ENC_AC_BITS, _ENC_AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4)
        out += bytes(bits_) + vals
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += struct.pack(">BB", cid, 0x00)
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """1-D int16 PCM -> WAV (RIFF, PCM-16 mono)."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                      b"WAVE", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                      b"data", len(data))
    return hdr + data


def decode_wav(b: bytes):
    """WAV PCM-16 mono -> (samples int16 ndarray, rate).  Walks the RIFF
    chunk list (real files often carry JUNK/LIST chunks before `fmt `),
    and REFUSES multi-channel or non-16-bit payloads instead of silently
    mis-decoding them."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt = None
    off = 12
    data = None
    while off + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, off)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", b, off + 8)
        elif cid == b"data":
            data = (off + 8, sz)
        off += 8 + sz + (sz & 1)
    if fmt is None:
        raise ValueError("WAV fmt chunk not found")
    audio_fmt, ch, rate, _brate, _align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM WAV supported (fmt={audio_fmt})")
    if ch != 1:
        raise ValueError(f"only mono WAV supported (channels={ch})")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (bits={bits})")
    if data is None:
        raise ValueError("WAV data chunk not found")
    d_off, d_sz = data
    return np.frombuffer(b, "<i2", count=d_sz // 2, offset=d_off), rate


def _bmp_features(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Real image features without a codec lib: normalized grayscale
    histogram over `dim` bins."""
    gray = pixels.astype(np.float64).mean(axis=2)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
    return hist / max(gray.size, 1)


class DecodeImageStage:
    """Actor-pool stage: payload bytes -> feature vector + basic header
    metadata.  Large binary payloads => SMALL batch_size (callers should
    pass batch_size<=256 for multi-MB images so batch x concurrency fits
    worker heap).

    decoder="real": BMP, PNG, GIF and baseline JPEG payloads are
    pixel-decoded (lib-free) and get real histogram features +
    width/height.  With on_undecodable="raise" (default) a corrupt or
    unsupported payload (e.g. progressive JPEG) raises the decoder's
    ValueError; with "flag", undecodable rows are emitted with
    header-parsed dimensions when available, zero features and
    decoded=False, so mixed-format batches keep their decodable rows."""

    def __init__(self, decoder: str = "deterministic-fake",
                 feature_dim: int = 64, on_undecodable: str = "raise"):
        if decoder not in ("deterministic-fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if on_undecodable not in ("raise", "flag"):
            raise ValueError(f"unknown on_undecodable {on_undecodable!r}")
        self.decoder = decoder
        self.on_undecodable = on_undecodable
        self.feature_dim = feature_dim

    def _detect(self, p: bytes) -> str:
        if p[:2] == b"BM":
            return "bmp"
        if p[:4] == b"\x89PNG":
            return "png"
        if p[:6] in (b"GIF87a", b"GIF89a"):
            return "gif"
        if p[:2] == b"\xff\xd8":
            return "jpg"
        return "unknown"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in batch["payload"].to_pylist()]
        magics = [self._detect(p) for p in payloads]
        widths: list = [None] * len(payloads)
        heights: list = [None] * len(payloads)
        decoded = [True] * len(payloads)
        if self.decoder == "real":
            feats_rows = []
            codecs = {"bmp": decode_bmp, "png": decode_png,
                      "gif": decode_gif, "jpg": decode_jpeg}
            for i, (p, m) in enumerate(zip(payloads, magics)):
                if m in codecs:
                    try:
                        px = codecs[m](p)
                    except ValueError:
                        # corrupt/unsupported payload (e.g. progressive
                        # JPEG): raise-vs-flag policy
                        if self.on_undecodable == "raise":
                            raise
                        if m == "png":
                            dims = png_header_dims(p)
                            if dims:
                                widths[i] = int(dims[0])
                                heights[i] = int(dims[1])
                        decoded[i] = False
                        feats_rows.append(np.zeros(self.feature_dim))
                        continue
                    heights[i], widths[i] = px.shape[0], px.shape[1]
                    feats_rows.append(_bmp_features(px, self.feature_dim))
                    continue
                decoded[i] = False
                feats_rows.append(np.zeros(self.feature_dim))
            feats = (np.stack(feats_rows) if feats_rows
                     else np.empty((0, self.feature_dim)))
        else:
            feats = np.stack([
                _fake_features(p, self.feature_dim) for p in payloads
            ]) if payloads else np.empty((0, self.feature_dim))
        return pa.table({
            "media_id": batch["media_id"],
            "detected_format": pa.array(magics, type=pa.string()),
            "payload_bytes": pa.array([len(p) for p in payloads],
                                      type=pa.int64()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "decoded": pa.array(decoded, type=pa.bool_()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), type=pa.float32()),
                self.feature_dim),
        })


class ResizeImageStage:
    """Actor-pool stage: REAL nearest-neighbor image resize to
    (out_h, out_w) — decode -> one numpy index-map gather -> re-encode,
    lib-free end-to-end for BMP, PNG, GIF and baseline JPEG payloads
    (each re-encoded in its own format; JPEG re-encode is lossy by a
    couple of LSBs, like any JPEG write).  on_undecodable='raise'
    surfaces the decoder's ValueError on corrupt/unsupported payloads,
    'flag' passes the row through unresized with resized=False.  Output
    keeps the payload column (resized where decodable) plus
    out_width/out_height/resized, so the stage composes with
    DecodeImageStage downstream."""

    def __init__(self, out_h: int = 16, out_w: int = 16,
                 on_undecodable: str = "raise"):
        if on_undecodable not in ("raise", "flag"):
            raise ValueError(f"unknown on_undecodable {on_undecodable!r}")
        if out_h <= 0 or out_w <= 0:
            raise ValueError("resize dims must be positive")
        self.out_h, self.out_w = out_h, out_w
        self.on_undecodable = on_undecodable

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w = px.shape[0], px.shape[1]
        # nearest-neighbor index map (pixel-center sampling)
        ri = np.minimum(((np.arange(self.out_h) + 0.5) * h
                         // self.out_h).astype(np.int64), h - 1)
        ci = np.minimum(((np.arange(self.out_w) + 0.5) * w
                         // self.out_w).astype(np.int64), w - 1)
        return px[ri][:, ci]

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = batch["payload"].to_pylist()
        payloads = [p or b"" for p in raw]
        out_payload: list = list(raw)   # nulls pass through unchanged
        resized = [False] * len(payloads)
        for i, p in enumerate(payloads):
            kind = "bmp" if p[:2] == b"BM" else \
                "png" if p[:4] == b"\x89PNG" else \
                "gif" if p[:6] in (b"GIF87a", b"GIF89a") else \
                "jpg" if p[:2] == b"\xff\xd8" else None
            if kind:
                try:
                    px = {"bmp": decode_bmp, "png": decode_png,
                          "gif": decode_gif, "jpg": decode_jpeg}[kind](p)
                except ValueError:
                    if self.on_undecodable == "raise":
                        raise
                    continue
                out = self._resize(px)
                # nearest-neighbor only SAMPLES existing pixels, so a
                # GIF's <=256-color property survives the resize
                enc = {"bmp": encode_bmp, "png": encode_png,
                       "gif": encode_gif, "jpg": encode_jpeg}[kind]
                out_payload[i] = enc(out)
                resized[i] = True
                continue
            # unknown/empty payloads are flagged through
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(out_payload, pa.binary()),
            "out_width": pa.array(
                [self.out_w if r else None for r in resized], pa.int32()),
            "out_height": pa.array(
                [self.out_h if r else None for r in resized], pa.int32()),
            "resized": pa.array(resized, pa.bool_()),
        })


class AudioFeaturesStage:
    """Real (lib-free) audio features for PCM-16 WAV payloads: sample
    rate, duration, RMS level, zero-crossing rate, and spectral centroid
    (numpy rfft magnitude-weighted mean frequency — a pure tone at f Hz
    centroids at ~f, asserted in tests)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": batch["media_id"].to_pylist(), "rate": [],
               "duration_ms": [], "rms": [], "zero_crossings": [],
               "spectral_centroid_hz": []}
        for p in batch["payload"].to_pylist():
            samples, rate = decode_wav(p or b"")
            x = samples.astype(np.float64) / 32768.0
            out["rate"].append(rate)
            out["duration_ms"].append(int(1000 * samples.size / rate))
            out["rms"].append(float(np.sqrt((x * x).mean()))
                              if samples.size else 0.0)
            out["zero_crossings"].append(
                int((np.diff(np.signbit(x)) != 0).sum()))
            if samples.size:
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(x.size, d=1.0 / rate)
                tot = mag.sum()
                out["spectral_centroid_hz"].append(
                    float((freqs * mag).sum() / tot) if tot > 0 else 0.0)
            else:
                out["spectral_centroid_hz"].append(0.0)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "rate": pa.array(out["rate"], pa.int32()),
            "duration_ms": pa.array(out["duration_ms"], pa.int32()),
            "rms": pa.array(out["rms"], pa.float64()),
            "zero_crossings": pa.array(out["zero_crossings"], pa.int64()),
            "spectral_centroid_hz": pa.array(out["spectral_centroid_hz"],
                                             pa.float64()),
        })


class FrameSampleStage:
    """Video frame-sampling stub: emits one row per sampled frame index
    (the fan-out layout a real decoder would produce)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, ts = [], [], []
        for mid, dur in zip(batch["media_id"].to_pylist(),
                            batch["duration_ms"].to_pylist()):
            d = dur or 0
            for k, t in enumerate(range(0, max(d, 1), self.every_ms)):
                ids.append(mid)
                frames.append(k)
                ts.append(t)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(frames, pa.int32()),
            "ts_ms": pa.array(ts, pa.int32()),
        })


def decode_images(ds, feature_dim: int = 64, batch_size: int = 256,
                  decoder: str = "deterministic-fake",
                  on_undecodable: str = "raise", concurrency=None):
    from ..validate import _cluster_cpus

    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(feature_dim=feature_dim, decoder=decoder,
                                   on_undecodable=on_undecodable),
        batch_format="pyarrow",
        batch_size=batch_size,   # small: payloads are large binaries
        concurrency=concurrency if concurrency is not None else (1, _cluster_cpus()),
    )


def make_media_table(n: int, seed: int = 42, real: bool = False) -> pa.Table:
    """Deterministic synthetic media table.  real=False emits magic-header
    random bytes (plumbing tests); real=True emits genuinely decodable
    payloads — 24-bit BMP images and PCM-16 WAV audio — so the lib-free
    real decoders run end-to-end."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], n)
    payloads = []
    for i, k in enumerate(kinds):
        if real and k == "image":
            h, w = int(rng.integers(4, 24)), int(rng.integers(4, 24))
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            # cycle BMP / PNG / GIF / JPEG so all four lib-free image
            # decoders run end-to-end (GIF quantized to 8 colors to fit
            # a palette)
            if i % 4 == 2:
                px = (px // 96 * 96)
                payloads.append(encode_gif(px))
            elif i % 4 == 3:
                payloads.append(encode_jpeg(px))
            else:
                payloads.append(encode_bmp(px) if i % 4 == 0
                                else encode_png(px))
            continue
        if real and k == "audio":
            secs = float(rng.uniform(0.05, 0.4))
            t = np.arange(int(8000 * secs))
            freq = float(rng.uniform(100, 900))
            payloads.append(encode_wav(
                (np.sin(2 * np.pi * freq * t / 8000) * 12000)
                .astype(np.int16), 8000))
            continue
        body = rng.integers(0, 256, int(rng.integers(64, 2048)),
                            dtype=np.uint8).tobytes()
        head = b"\x89PNG" if k == "image" and i % 2 == 0 else \
               b"\xff\xd8" if k == "image" else b"RIFF"
        payloads.append(head + body)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array([None] * n, pa.int32()),
        "height": pa.array([None] * n, pa.int32()),
        "duration_ms": pa.array(
            [int(x) if k == "video" else None
             for x, k in zip(rng.integers(1000, 10_000, n), kinds)],
            pa.int32()),
    })


def ahash64_pixels(px: np.ndarray) -> int:
    """Average-hash (aHash) of an RGB pixel array: grayscale -> 8x8
    nearest-neighbor downsample (pixel-center sampling, the same map as
    ResizeImageStage) -> 64 bits of 'cell >= mean', packed row-major
    MSB-first.  The classic perceptual fingerprint (public domain
    algorithm): identical pixels hash identically regardless of the
    container format; small re-encode noise (JPEG) flips at most a few
    bits."""
    g = px.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ri = np.minimum(((np.arange(8) + 0.5) * h // 8).astype(np.int64),
                    h - 1)
    ci = np.minimum(((np.arange(8) + 0.5) * w // 8).astype(np.int64),
                    w - 1)
    cells = g[ri][:, ci]
    bits = (cells >= cells.mean()).astype(np.uint64).ravel()
    return int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum())


def phash64_pixels(px: np.ndarray) -> int:
    """DCT perceptual hash (pHash, public-domain algorithm): grayscale
    -> 32x32 nearest-neighbor downsample (same pixel-center map as
    ahash64_pixels) -> 32x32 DCT-II -> top-left 8x8 low-frequency block
    -> 64 bits of 'coefficient > median of the block excluding DC',
    packed row-major MSB-first.  Robust to brightness/contrast shifts
    (unlike aHash, the threshold is a frequency-domain median) and to
    re-encode noise; identical pixels hash identically."""
    g = px.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ri = np.minimum(((np.arange(32) + 0.5) * h // 32).astype(np.int64),
                    h - 1)
    ci = np.minimum(((np.arange(32) + 0.5) * w // 32).astype(np.int64),
                    w - 1)
    cells = g[ri][:, ci]
    coef = (_DCT_A32 @ cells @ _DCT_A32.T)[:8, :8]
    med = np.median(coef.ravel()[1:])      # exclude the DC term
    bits = (coef > med).astype(np.uint64).ravel()
    return int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum())


_PIXEL_HASHES = {"ahash": ahash64_pixels, "phash": phash64_pixels}


class AHashStage:
    """Actor-pool stage: image payload bytes -> 64-bit perceptual hash
    -> (media_id, <method>, decoded) with method 'ahash' (average hash)
    or 'phash' (DCT hash).  on_undecodable='flag' emits a null hash with
    decoded=False; 'raise' surfaces the decoder error.  Non-image magic
    bytes are treated as undecodable."""

    def __init__(self, on_undecodable: str = "raise",
                 method: str = "ahash"):
        if on_undecodable not in ("raise", "flag"):
            raise ValueError(f"unknown on_undecodable {on_undecodable!r}")
        if method not in _PIXEL_HASHES:
            raise ValueError(f"unknown perceptual-hash method {method!r} "
                             f"(supported: {sorted(_PIXEL_HASHES)})")
        self.on_undecodable = on_undecodable
        self.method = method
        self._hash = _PIXEL_HASHES[method]
        self._decoders = {"bmp": decode_bmp, "png": decode_png,
                          "gif": decode_gif, "jpg": decode_jpeg}

    @staticmethod
    def _kind(p: bytes) -> str | None:
        if p[:2] == b"BM":
            return "bmp"
        if p[:8] == b"\x89PNG\r\n\x1a\n":
            return "png"
        if p[:6] in (b"GIF87a", b"GIF89a"):
            return "gif"
        if p[:3] == b"\xff\xd8\xff":
            return "jpg"
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in batch["payload"].to_pylist()]
        hashes: list = [None] * len(payloads)
        decoded = [False] * len(payloads)
        for i, p in enumerate(payloads):
            kind = self._kind(p)
            if kind is None:
                if self.on_undecodable == "raise":
                    raise ValueError("AHashStage: not an image payload")
                continue
            try:
                px = self._decoders[kind](p)
            except ValueError:
                if self.on_undecodable == "raise":
                    raise
                continue
            # int64 view keeps the column hashable/groupable everywhere
            hashes[i] = np.uint64(self._hash(px)).astype(
                np.int64).item()
            decoded[i] = True
        return pa.table({
            "media_id": batch["media_id"],
            self.method: pa.array(hashes, pa.int64()),
            "decoded": pa.array(decoded, pa.bool_()),
        })


def media_ahash_dedup(ds, min_count: int = 1, concurrency=None,
                      batch_size: int = 256,
                      on_undecodable: str = "flag",
                      method: str = "ahash"):
    """Perceptual dedup of an image dataset -> Dataset[<method>, keep_id,
    cnt]: groups payloads by exact perceptual-hash equality (identical or
    near-identical frames collapse regardless of container format), keeps
    the minimum media_id per group.  method='ahash' (average hash) or
    'phash' (DCT hash — robust to brightness/contrast shifts).
    Undecodable payloads are dropped.

    Scale shape: decode runs in an actor pool (large payloads stay in
    their tasks; only 16 B (hash, id) rows move), the grouping is the
    short bucketed exchange."""
    from .agg import bucketed_group_agg

    hashed = ds.map_batches(
        AHashStage,
        fn_constructor_kwargs={"on_undecodable": on_undecodable,
                               "method": method},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency if concurrency is not None
        else (1, _cluster_cpus()))

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["decoded"]).drop_columns(["decoded"])

    agg = bucketed_group_agg(
        hashed.map_batches(keep, batch_format="pyarrow"),
        [method], [("media_id", "min"), ([], "count_all")])

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table({method: t[method],
                        "keep_id": t["media_id_min"],
                        "cnt": pc.cast(t["count_all"], pa.int64())})
        if min_count > 1:
            out = out.filter(pc.greater_equal(out["cnt"], min_count))
        return out

    return agg.map_batches(finish, batch_format="pyarrow")
