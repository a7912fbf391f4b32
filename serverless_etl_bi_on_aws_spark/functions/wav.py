"""From-scratch WAV/PCM codec (RIFF parse via stdlib struct + numpy).

Third REAL codec after PNG (functions/png.py) and baseline JPEG
(functions/jpeg.py): WAV PCM is lossless, so unlike JPEG the decoded
samples are bit-exact — q51's oracle is a full value hash, not a
tolerance boolean (round-5 verdict #8).

Format notes (RIFF spec / Microsoft WAVEFORMATEX):
  * container: ``RIFF`` <size> ``WAVE`` then tagged chunks;
  * ``fmt `` chunk: audio_format (1 = integer PCM), channels, sample
    rate, byte rate, block align, bits per sample;
  * ``data`` chunk: interleaved little-endian samples;
  * chunks are WORD-aligned — a chunk with an odd size is followed by a
    pad byte that is NOT counted in the size field (real-world files do
    this for odd-sized LIST/INFO chunks);
  * unknown chunks (LIST, fact, cue ...) must be skipped, not rejected.

Supported: integer PCM (format 1), 8-bit unsigned / 16-bit / 32-bit
signed, any channel count. Everything else (IEEE float 3, A-law 6,
mu-law 7, extensible 0xFFFE, ...) raises — compressed or float audio
through this path would silently corrupt downstream statistics.
"""

from __future__ import annotations

import struct

import numpy as np

#: bits-per-sample -> numpy dtype for integer PCM. 8-bit WAV is UNSIGNED
#: by spec (biased at 128); 16/32-bit are signed little-endian.
_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav_pcm16(
    samples: np.ndarray | list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Encode int16 samples (interleaved if multi-channel) as a minimal
    RIFF/WAVE file: one fmt chunk + one data chunk. Lossless: decode of
    the result returns the exact input array."""
    arr = np.asarray(samples, dtype="<i2")
    if channels < 1 or arr.size % channels:
        raise ValueError("wav: sample count not a multiple of channels")
    payload = arr.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"".join(
        [
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(payload)),
            payload,
            b"\x00" * (len(payload) % 2),  # WORD alignment pad, uncounted
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_pcm(data: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE -> (samples, sample_rate, channels).

    ``samples`` is a 1-D interleaved int64 array (widened so 8/16/32-bit
    inputs share one exact dtype; 8-bit is re-biased from unsigned to
    signed around 0 so silence is 0 across widths). Raises ValueError on
    anything that is not integer PCM — never decodes garbage."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE file")
    declared = struct.unpack("<I", data[4:8])[0]
    end = min(len(data), 8 + declared)
    pos = 12
    fmt_fields = None
    raw = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"wav: truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("wav: fmt chunk too short")
            fmt_fields = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size % 2)  # skip the uncounted WORD pad
    if fmt_fields is None or raw is None:
        raise ValueError("wav: missing fmt /data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt_fields
    if audio_format != 1:
        raise ValueError(f"wav: only integer PCM supported (format {audio_format})")
    # a crafted fmt with rate=0 or channels=0 must fail HERE with the codec's
    # ValueError contract, not as a ZeroDivisionError in a downstream stage
    # (audio_sample_stats divides by both)
    if sample_rate < 1:
        raise ValueError(f"wav: invalid sample rate {sample_rate}")
    if channels < 1:
        raise ValueError("wav: invalid channel count 0")
    dtype = _PCM_DTYPES.get(bits)
    if dtype is None:
        raise ValueError(f"wav: unsupported bit depth {bits}")
    width = bits // 8
    usable = len(raw) - len(raw) % (width * max(channels, 1))
    samples = np.frombuffer(raw[:usable], dtype=dtype).astype(np.int64)
    if bits == 8:
        samples -= 128  # spec: 8-bit PCM is unsigned, silence at 128
    return samples, sample_rate, channels
