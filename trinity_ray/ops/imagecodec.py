"""Pure-numpy/stdlib image codecs: PNG (zlib) and BMP (24-bit).

The container ships no PIL/opencv, but PNG and BMP need nothing beyond
``zlib`` + numpy — so the multimodal decode stage can be REAL for these
formats instead of a stub.  Supports the formats a synthetic training-data
pipeline emits: 8-bit gray / RGB / RGBA PNG (all five scanline filters on
decode; encoder picks per-row filters) and uncompressed 24-bit BMP.

JPEG/GIF/video stay honestly stubbed (they need real codec libraries).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, filter_mode: str = "mixed") -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 to PNG.

    ``filter_mode``: "none" (filter 0 rows) or "mixed" (cycles through all
    five filter types row by row — exercises every decoder path and often
    compresses better)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"unsupported channel count {c}")
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int64)
    for y in range(h):
        row = px[y].astype(np.int64)
        ft = 0 if filter_mode == "none" else y % 5
        if ft == 0:
            enc = row
        elif ft == 1:  # sub
            a = np.vstack((np.zeros((1, c), np.int64), row[:-1]))
            enc = row - a
        elif ft == 2:  # up
            enc = row - prev
        elif ft == 3:  # average
            a = np.vstack((np.zeros((1, c), np.int64), row[:-1]))
            enc = row - (a + prev) // 2
        else:  # paeth
            a = np.vstack((np.zeros((1, c), np.int64), row[:-1]))
            b = prev
            cc = np.vstack((np.zeros((1, c), np.int64), prev[:-1]))
            p = a + b - cc
            pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                            np.where(pb <= pc, b, cc))
            enc = row - pred
        raw.append(ft)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit gray/RGB/RGBA non-interlaced PNG to HxWxC uint8."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or color not in _COLOR_CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} unsupported "
                    "(8-bit gray/RGB/RGBA only)")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _COLOR_CHANNELS[color]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * channels
    if raw.size != h * stride:
        raise ValueError("PNG scanline size mismatch")
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w, channels), dtype=np.int64)
    prev = np.zeros((w, channels), dtype=np.int64)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].astype(np.int64).reshape(w, channels)
        if ft == 0:
            cur = row
        elif ft == 1:  # sub: left-prefix sum (mod 256)
            cur = np.cumsum(row, axis=0) & 0xFF
        elif ft == 2:  # up
            cur = (row + prev) & 0xFF
        elif ft == 3:  # average: sequential in x
            cur = np.zeros_like(row)
            left = np.zeros(channels, dtype=np.int64)
            for x in range(w):
                left = (row[x] + (left + prev[x]) // 2) & 0xFF
                cur[x] = left
        elif ft == 4:  # paeth: sequential in x
            cur = np.zeros_like(row)
            left = np.zeros(channels, dtype=np.int64)
            upleft = np.zeros(channels, dtype=np.int64)
            for x in range(w):
                a, b, cc = left, prev[x], upleft
                p = a + b - cc
                pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                                np.where(pb <= pc, b, cc))
                left = (row[x] + pred) & 0xFF
                cur[x] = left
                upleft = b
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = cur
        prev = out[y]
    return out.astype(np.uint8)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 RGB to an uncompressed 24-bit BMP."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("BMP encoder takes HxWx3 RGB")
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3  # 4-byte aligned rows
    img = np.zeros((h, row_bytes), dtype=np.uint8)
    img[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to HxWx3 uint8 RGB."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (comp,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=h * row_bytes, offset=off)
    img = raw.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    img = img[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


def split_png_stream(payload: bytes) -> list[bytes]:
    """Split a concatenation of PNG images ("motion PNG" — the honest
    video-container substitute this environment can decode) into frames by
    walking each image's chunk chain to IEND."""
    frames = []
    pos = 0
    n = len(payload)
    while pos < n:
        if not payload.startswith(_PNG_SIG, pos):
            raise ValueError(f"not a PNG at byte {pos}")
        start = pos
        pos += 8
        while pos + 8 <= n:
            (ln,) = struct.unpack(">I", payload[pos:pos + 4])
            tag = payload[pos + 4:pos + 8]
            pos += 12 + ln
            if tag == b"IEND":
                break
        frames.append(payload[start:pos])
    return frames
