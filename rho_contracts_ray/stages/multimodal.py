"""Multimodal column plumbing (image/audio/video as opaque binary + typed
metadata).

Decode support is tiered by what this container allows:
  * REAL, lib-free: uncompressed 24-bit BMP pixel decode, full 8-bit PNG
    pixel decode (stdlib-zlib inflate + all five unfilters; gray /
    RGB / palette / alpha variants — encode_png/decode_png), GIF87a/89a
    decode (real LZW with dictionary growth, interlace, local palettes —
    encode_gif/decode_gif), PNG header parsing, and PCM-16 WAV decode —
    pure numpy / struct / zlib, fully implemented and tested;
  * STUBBED with the dependency named: JPEG pixel decode needs
    Pillow/opencv (not present) — `DecodeImageStage(decoder="real")`
    raises NotImplementedError when it meets such a payload;
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

    decoder="real": BMP and PNG payloads are pixel-decoded (lib-free) and
    get real histogram features + width/height.  JPEG pixel decode needs
    Pillow (not in this container): with on_undecodable="raise" (default)
    the batch raises NotImplementedError naming the dependency; with
    "flag", undecodable rows are emitted with header-parsed dimensions
    when available, zero features and decoded=False, so mixed-format
    batches keep their decodable rows."""

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
            for i, (p, m) in enumerate(zip(payloads, magics)):
                if m in ("bmp", "png", "gif"):
                    try:
                        px = {"bmp": decode_bmp, "png": decode_png,
                              "gif": decode_gif}[m](p)
                    except ValueError:
                        # corrupt/unsupported payload: raise-vs-flag
                        # follows the same policy as the codec-less formats
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
                if m == "jpg" and self.on_undecodable == "raise":
                    raise NotImplementedError(
                        "JPEG pixel decode requires Pillow/opencv, not "
                        "present in this container (BMP, PNG and WAV "
                        "decode lib-free; use decoder='deterministic-"
                        "fake' or on_undecodable='flag')")
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
    lib-free end-to-end for BMP and PNG payloads (each re-encoded in its
    own format).  JPEG follows DecodeImageStage's policy:
    on_undecodable='raise' names the missing dependency, 'flag' passes
    the row through unresized with resized=False.  Output keeps the
    payload column (resized where decodable) plus out_width/out_height/
    resized, so the stage composes with DecodeImageStage downstream."""

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
                "gif" if p[:6] in (b"GIF87a", b"GIF89a") else None
            if kind:
                try:
                    px = {"bmp": decode_bmp, "png": decode_png,
                          "gif": decode_gif}[kind](p)
                except ValueError:
                    if self.on_undecodable == "raise":
                        raise
                    continue
                out = self._resize(px)
                # nearest-neighbor only SAMPLES existing pixels, so a
                # GIF's <=256-color property survives the resize
                enc = {"bmp": encode_bmp, "png": encode_png,
                       "gif": encode_gif}[kind]
                out_payload[i] = enc(out)
                resized[i] = True
                continue
            # DecodeImageStage policy: only the RECOGNIZED codec-less
            # format raises (a dependency would fix it); unknown/empty
            # payloads are flagged through
            if p[:2] == b"\xff\xd8":
                if self.on_undecodable == "raise":
                    raise NotImplementedError(
                        "JPEG pixel decode requires Pillow/opencv, not "
                        "present in this container (BMP/PNG resize "
                        "lib-free; use on_undecodable='flag')")
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
            # cycle BMP / PNG / GIF so all three lib-free image decoders
            # run end-to-end (GIF quantized to 8 colors to fit a palette)
            if i % 3 == 2:
                px = (px // 96 * 96)
                payloads.append(encode_gif(px))
            else:
                payloads.append(encode_bmp(px) if i % 3 == 0
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
