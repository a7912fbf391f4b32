"""From-scratch GIF89a codec — the engine's fifth real media codec
(after PNG, baseline JPEG, RIFF/WAV PCM, and the AVI container).

Pure stdlib (struct + bytes): an encoder producing animated grayscale
GIF89a (global 256-entry gray palette, one full-frame image per frame,
Graphic Control Extensions with per-frame delay, NETSCAPE loop block) and
a general decoder (87a/89a, global AND local color tables, unknown
extensions skipped via their sub-block structure, the KwKwK LZW corner
case, deferred-clear streams where the encoder never resets a full
table). GIF's LZW is LOSSLESS, so — like PNG/WAV/AVI — decoded pixels
are bit-exact and a SQL oracle can regenerate per-frame statistics from
first principles (the q52 discipline).

Loud refusals, never garbage: bad magic, truncated streams/sub-blocks,
interlaced frames (out of scope — flagged, not mis-decoded), LZW codes
beyond the table, missing image data.

The LZW pairing (the classic trap, pinned by roundtrip + external-decoder
validation): codes are LSB-first; the encoder grows its code width after
assigning entry 2^n (its next emitted code may then be that entry); the
decoder — which stays one table entry behind — grows when ITS next free
code reaches 2^n. Width caps at 12 bits; at 4096 entries the encoder
emits CLEAR and resets, and the decoder also tolerates encoders that
defer the reset (it simply stops adding entries until a CLEAR arrives).
"""

from __future__ import annotations

import struct

_MAX_TABLE = 4096


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    buf = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < _MAX_TABLE:
            table[wk] = next_code
            next_code += 1
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    base = [bytes([i]) for i in range(clear)] + [b"", b""]  # clear/eoi slots
    table = list(base)
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table) or code >= clear:
                raise ValueError(f"gif: invalid first code {code}")
            entry = table[code]
        elif code < len(table):
            if code == eoi or code == clear:  # pragma: no cover - handled above
                raise ValueError("gif: control code in data position")
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK: code referenced before defined
        else:
            raise ValueError(f"gif: LZW code {code} beyond table size {len(table)}")
        if prev is not None and len(table) < _MAX_TABLE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry


def encode_gif_frames(
    frames: list[bytes], width: int, height: int, delay_cs: int = 25
) -> bytes:
    """Animated grayscale GIF89a: each frame is ``width*height`` raw bytes
    (values = gray levels = palette indices, the global table being the
    identity gray ramp). ``delay_cs`` is the per-frame delay in 1/100 s."""
    if not frames:
        raise ValueError("gif: no frames")
    for px in frames:
        if len(px) != width * height:
            raise ValueError("gif: frame size mismatch")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for px in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([8])  # LZW minimum code size
        comp = _lzw_encode(px, 8)
        for off in range(0, len(comp), 255):
            chunk = comp[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(chunks), pos
        if pos + n > len(data):
            raise ValueError("gif: truncated sub-block")
        chunks += data[pos : pos + n]
        pos += n


def decode_gif_frames(data: bytes) -> tuple[list[bytes], int, int, list[int]]:
    """GIF -> (frames, width, height, delays_cs).

    Frames are full-canvas grayscale byte strings (each pixel mapped
    through its active palette's red channel — exact for gray palettes;
    frames smaller than the canvas are composited at their declared
    offset over the previous frame, per the default disposal method).
    Raises ValueError on anything malformed — never decodes garbage."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: not a GIF87a/89a stream")
    width, height, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("gif: truncated global color table")
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    frames: list[bytes] = []
    delays: list[int] = []
    canvas = bytes(width * height)
    pending_delay = 0
    while True:
        if pos >= len(data):
            raise ValueError("gif: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return frames, width, height, delays
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("gif: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 3:
                pending_delay = struct.unpack("<H", body[1:3])[0]
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iflags & 0x40:
            raise ValueError("gif: interlaced frames not supported")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("gif: truncated local color table")
            pal = data[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("gif: frame without any color table")
        if pos >= len(data):
            raise ValueError("gif: missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"gif: bad LZW minimum code size {min_code}")
        comp, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(comp, min_code)
        if len(idx) < fw * fh:
            raise ValueError("gif: LZW data shorter than frame")
        if left + fw > width or top + fh > height:
            raise ValueError("gif: frame exceeds canvas")
        gray = bytes(pal[3 * i] if 3 * i < len(pal) else 0 for i in idx[: fw * fh])
        if left == 0 and top == 0 and fw == width and fh == height:
            canvas = gray
        else:  # composite partial frame over the previous canvas
            buf = bytearray(canvas)
            for row in range(fh):
                dst = (top + row) * width + left
                buf[dst : dst + fw] = gray[row * fw : (row + 1) * fw]
            canvas = bytes(buf)
        frames.append(canvas)
        delays.append(pending_delay)
        pending_delay = 0
