"""From-scratch AVI container codec (RIFF parse via stdlib struct).

Fourth real media path: with RIFF parsing already built for WAV
(functions/wav.py) and a lossless image codec in-house (functions/png.py),
a minimal AVI container makes VIDEO real too — frames are stored as
whole PNG payloads under the registered ``MPNG`` fourcc (PNG-in-AVI), so
frame extraction + decode round-trips BIT-EXACTLY and q52 can carry a
full value oracle. The same parser hands back MJPG frames for the JPEG
decoder; only genuinely compressed inter-frame codecs (H.264 ...) are out
of scope for this container-level implementation.

Layout written/parsed (OpenDML/AVI RIFF form):
    RIFF 'AVI ' {
      LIST 'hdrl' { 'avih' main header, LIST 'strl' { 'strh', 'strf' } }
      LIST 'movi' { '00dc' frame payload, ... }
      'idx1' index (written for spec-shape; parse does not require it)
    }
Chunks are WORD-aligned (odd sizes followed by an uncounted pad byte) —
same rule as WAV, and the same skip-unknown-chunks discipline.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x10


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) % 2)


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_frames(
    frames: list[bytes], width: int, height: int, fps: int = 4, fourcc: bytes = b"MPNG"
) -> bytes:
    """Wrap already-encoded frame payloads (PNG for MPNG, JPEG for MJPG)
    into a minimal single-stream AVI. Container-lossless: decode returns
    the payload bytes unchanged."""
    n = len(frames)
    usec_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I",
        usec_per_frame, 0, 0, _AVIF_HASINDEX, n, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    # AVISTREAMHEADER after fccType/fccHandler: flags, priority, language,
    # initial_frames, scale, rate, start, length, buf_size, quality,
    # sample_size, then rcFrame as 4 shorts
    strh = (
        b"vids" + fourcc
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    # BITMAPINFOHEADER; biCompression carries the fourcc for coded streams
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, fourcc, 0, 0, 0, 0, 0
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"movi"
    offsets = []
    for fr in frames:
        offsets.append(len(movi_body))  # offset of chunk within movi LIST
        movi_body += _chunk(b"00dc", fr)
    movi = _chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(fr))
        for off, fr in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes) -> tuple[list[bytes], int, int, int, bytes]:
    """AVI -> (frame payloads, width, height, fps, fourcc).

    Walks the RIFF tree: avih for dimensions, strh for rate/fourcc, movi
    for '00dc'/'00db' frame chunks (in stream order). Unknown chunks and
    LISTs are skipped by size; odd sizes consume their pad byte. Raises
    ValueError on a non-AVI RIFF or a missing header/movi."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI file")
    width = height = None
    fps = 0
    fourcc = b""
    frames: list[bytes] = []
    seen_movi = False

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, fourcc, seen_movi
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"avi: truncated {tag!r} chunk")
            if tag == b"LIST":
                kind = data[body_start : body_start + 4]
                if kind == b"movi":
                    seen_movi = True
                walk(body_start + 4, body_start + size)
            elif tag == b"avih":
                fields = struct.unpack("<14I", data[body_start : body_start + 56])
                width, height = fields[8], fields[9]
            elif tag == b"strh":
                if data[body_start : body_start + 4] == b"vids":
                    fourcc = data[body_start + 4 : body_start + 8]
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20 : body_start + 28]
                    )
                    fps = rate // max(scale, 1)
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0]))
    if width is None or not seen_movi:
        raise ValueError("avi: missing avih header or movi list")
    return frames, width, height, fps, fourcc
