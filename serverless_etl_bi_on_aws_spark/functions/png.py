"""Minimal pure-stdlib PNG codec (zlib + struct): the real-decoder path for
the multimodal operators (X4) in a container with no PIL/ffmpeg.

Scope: 8-bit grayscale (color type 0), non-interlaced — enough to exercise
payload -> pixels end to end through Spark. Encoding always writes filter 0;
decoding implements all five standard scanline filters (None/Sub/Up/
Average/Paeth) so externally produced grayscale PNGs decode too.

This is a from-scratch implementation of the public PNG spec (RFC 2083);
it shares no code with any image library.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int) -> bytes:
    """Encode row-major 8-bit grayscale pixels (len == width*height)."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale PNG -> (width, height, row-major pixels)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color != 0:
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    out = bytearray(width * height)
    prev = bytes(width)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, scan = line[0], bytearray(line[1:])
        if ftype == 1:  # Sub
            for x in range(1, width):
                scan[x] = (scan[x] + scan[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                scan[x] = (scan[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(width):
                left = scan[x - 1] if x else 0
                scan[x] = (scan[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                a = scan[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                scan[x] = (scan[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        out[y * width : (y + 1) * width] = scan
        prev = scan
    return width, height, bytes(out)


def resize_nearest(
    pixels: bytes, width: int, height: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of row-major 8-bit grayscale pixels."""
    out = bytearray(out_w * out_h)
    for oy in range(out_h):
        sy = min(oy * height // out_h, height - 1)
        row = pixels[sy * width : (sy + 1) * width]
        base = oy * out_w
        for ox in range(out_w):
            out[base + ox] = row[min(ox * width // out_w, width - 1)]
    return bytes(out)
