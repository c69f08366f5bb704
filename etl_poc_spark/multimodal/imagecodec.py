"""Pure-stdlib image codecs for the multimodal kernels.

This container ships no PIL/ffmpeg, so the image kernels are implemented
against formats a standard library can fully handle:

- PPM (P6, 8-bit): decode + encode
- BMP (24-bit uncompressed BI_RGB): decode + encode
- PNG (8-bit truecolor RGB/RGBA, non-interlaced): decode + encode via zlib
  (all five scanline filters on decode)

plus the two real kernels the media operators need:

- resize_nearest: nearest-neighbor resample over raw RGB bytes
- luminance_histogram: normalized luma histogram feature vector

Everything is deterministic byte-level Python — no dependencies — so the
mapInPandas media operators run REAL decode/resize/feature math instead of
stubs, while JPEG (entropy coding) remains an explicitly-unsupported format
that falls back to the documented deterministic fake.

All decoders return (width, height, rgb) with rgb = w*h*3 bytes row-major,
or raise ValueError on malformed/unsupported input.
"""

from __future__ import annotations

import struct
import zlib

RGB_BPP = 3


def sniff_format(data: bytes) -> str:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P6", b"P3"):
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# --- PPM (P6) ---------------------------------------------------------------


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header tokens: P6, width, height, maxval — whitespace/comment separated
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (maxval={maxval}, {w}x{h})")
    n = w * h * RGB_BPP
    rgb = data[pos : pos + n]
    if len(rgb) != n:
        raise ValueError("truncated PPM pixel data")
    return w, h, bytes(rgb)


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    if len(rgb) != w * h * RGB_BPP:
        raise ValueError("rgb length does not match dimensions")
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


# --- BMP (24-bit BI_RGB) ----------------------------------------------------


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h_raw = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    if w <= 0 or h_raw == 0:
        raise ValueError("bad BMP dimensions")
    h = abs(h_raw)
    stride = (w * RGB_BPP + 3) & ~3
    if len(data) < pixel_offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(w * h * RGB_BPP)
    for row in range(h):
        # positive height = bottom-up row order
        src_row = (h - 1 - row) if h_raw > 0 else row
        base = pixel_offset + src_row * stride
        dst = row * w * RGB_BPP
        for x in range(w):
            b, g, r = data[base + x * 3 : base + x * 3 + 3]
            out[dst + x * 3 : dst + x * 3 + 3] = bytes((r, g, b))
    return w, h, bytes(out)


def encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    if len(rgb) != w * h * RGB_BPP:
        raise ValueError("rgb length does not match dimensions")
    stride = (w * RGB_BPP + 3) & ~3
    pixel_bytes = stride * h
    header = b"BM" + struct.pack("<IHHI", 54 + pixel_bytes, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (stride - w * RGB_BPP)
    for row in range(h - 1, -1, -1):  # bottom-up
        base = row * w * RGB_BPP
        for x in range(w):
            r, g, b = rgb[base + x * 3 : base + x * 3 + 3]
            body += bytes((b, g, r))
        body += pad
    return header + dib + bytes(body)


# --- PNG (8-bit truecolor, non-interlaced) ----------------------------------


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytes:
    stride = w * bpp
    out = bytearray(stride * h)
    pos = 0
    prev_row_start = -1
    for row in range(h):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        rs = row * stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if prev_row_start >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_row_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_row_start + i] if prev_row_start >= 0 else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_row_start + i] if prev_row_start >= 0 else 0
                c = out[prev_row_start + i - bpp] if (prev_row_start >= 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[rs : rs + stride] = line
        prev_row_start = rs
    return bytes(out)


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    h = bitdepth = colortype = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None or h is None or not idat:
        raise ValueError("truncated PNG")
    if bitdepth != 8 or colortype not in (2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bitdepth={bitdepth}, colortype={colortype}, interlace={interlace})"
        )
    bpp = 3 if colortype == 2 else 4
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (w * bpp + 1) * h:
        raise ValueError("PNG scanline size mismatch")
    px = _png_unfilter(raw, w, h, bpp)
    if bpp == 3:
        return w, h, px
    rgb = bytearray(w * h * RGB_BPP)
    for i in range(w * h):
        rgb[i * 3 : i * 3 + 3] = px[i * 4 : i * 4 + 3]
    return w, h, bytes(rgb)


def encode_png(w: int, h: int, rgb: bytes) -> bytes:
    if len(rgb) != w * h * RGB_BPP:
        raise ValueError("rgb length does not match dimensions")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    stride = w * RGB_BPP
    raw = b"".join(b"\x00" + rgb[r * stride : (r + 1) * stride] for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --- dispatch + kernels -----------------------------------------------------

_DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "png": decode_png}


def decode_image(data: bytes) -> tuple[int, int, bytes]:
    """Decode any supported format to (w, h, rgb); ValueError otherwise."""
    fmt = sniff_format(data)
    dec = _DECODERS.get(fmt)
    if dec is None:
        raise ValueError(f"unsupported image format {fmt!r}")
    return dec(data)


def resize_nearest(w: int, h: int, rgb: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resample; returns target_w*target_h*3 RGB bytes."""
    if len(rgb) != w * h * RGB_BPP:
        raise ValueError("rgb length does not match dimensions")
    out = bytearray(target_w * target_h * RGB_BPP)
    for ty in range(target_h):
        sy = ty * h // target_h
        src_base = sy * w * RGB_BPP
        dst_base = ty * target_w * RGB_BPP
        for tx in range(target_w):
            sx = tx * w // target_w
            s = src_base + sx * RGB_BPP
            d = dst_base + tx * RGB_BPP
            out[d : d + RGB_BPP] = rgb[s : s + RGB_BPP]
    return bytes(out)


def gray_downsample(w: int, h: int, rgb: bytes, gw: int, gh: int) -> list[int]:
    """Nearest-neighbor downsample to gw*gh, then integer BT.601 luma per
    pixel (0..255). The shared first stage of the perceptual hashes."""
    small = resize_nearest(w, h, rgb, gw, gh)
    return [
        (299 * small[i * 3] + 587 * small[i * 3 + 1] + 114 * small[i * 3 + 2]) // 1000
        for i in range(gw * gh)
    ]


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def ahash64(w: int, h: int, rgb: bytes) -> int:
    """Average hash: 8x8 grayscale, bit i = 1 iff pixel i is strictly above
    the mean. Integer-exact (compares g[i]*64 vs the sum, no float mean).
    Returned as a SIGNED 64-bit int (two's complement) so it fits Spark's
    LongType; banding/XOR/bit_count work on the bit pattern unchanged."""
    g = gray_downsample(w, h, rgb, 8, 8)
    total = sum(g)
    v = 0
    for i in range(64):
        if g[i] * 64 > total:
            v |= 1 << i
    return _to_signed64(v)


def dhash64(w: int, h: int, rgb: bytes) -> int:
    """Difference hash: 9x8 grayscale, bit (y*8+x) = 1 iff luma[y][x] >
    luma[y][x+1]. More robust than aHash to global brightness shifts.
    Returned as a signed 64-bit int (see ahash64)."""
    g = gray_downsample(w, h, rgb, 9, 8)
    v = 0
    for y in range(8):
        for x in range(8):
            if g[y * 9 + x] > g[y * 9 + x + 1]:
                v |= 1 << (y * 8 + x)
    return _to_signed64(v)


def luminance_histogram(rgb: bytes, bins: int = 64) -> list[float]:
    """Normalized luma (BT.601 integer approximation) histogram — a real,
    deterministic image feature vector suitable for cosine similarity."""
    n_px = len(rgb) // RGB_BPP
    counts = [0] * bins
    for i in range(n_px):
        r, g, b = rgb[i * 3 : i * 3 + 3]
        luma = (299 * r + 587 * g + 114 * b) // 1000  # 0..255
        counts[luma * bins // 256] += 1
    return [c / n_px for c in counts] if n_px else [0.0] * bins
