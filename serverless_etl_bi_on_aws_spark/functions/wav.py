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

Supported:
  * integer PCM (format 1), 8-bit unsigned / 16-bit / 32-bit signed,
    any channel count;
  * G.711 mu-law (format 7) and A-law (format 6) — REAL compressed
    telephony audio, expanded through the ITU-T G.711 segment formulas
    (256-entry LUTs built from the spec; decode verified code-for-code
    against an independent implementation in the pytest suite);
  * IMA/DVI ADPCM (format 0x11) — REAL block-compressed 4-bit audio
    (the WAV flavor: per-channel 4-byte block headers carrying the
    initial predictor + step index, low-nibble-first data, 4-byte
    per-channel interleave for multi-channel). The nibble recurrence is
    sequential WITHIN a block, so the decoder vectorizes ACROSS blocks
    x channels with numpy and loops only over the samples-per-block
    axis — corpus-scale audio decodes as (blocks) array ops, not a
    Python loop per sample.

Everything else (IEEE float 3, MS-ADPCM 2, extensible 0xFFFE, ...)
still raises — audio this module cannot decode EXACTLY per its spec
must refuse loudly, never corrupt downstream statistics.
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
    # a crafted fmt with rate=0 or channels=0 must fail HERE with the codec's
    # ValueError contract, not as a ZeroDivisionError in a downstream stage
    # (audio_sample_stats divides by both)
    if sample_rate < 1:
        raise ValueError(f"wav: invalid sample rate {sample_rate}")
    if channels < 1:
        raise ValueError("wav: invalid channel count 0")
    if audio_format in (6, 7):  # G.711 A-law / mu-law: 8-bit codes
        if bits != 8:
            raise ValueError(f"wav: G.711 requires 8 bits/sample, got {bits}")
        lut = _ALAW_LUT if audio_format == 6 else _ULAW_LUT
        codes = np.frombuffer(raw[: len(raw) - len(raw) % channels], np.uint8)
        return lut[codes], sample_rate, channels
    if audio_format == 0x11:  # IMA/DVI ADPCM (WAV block flavor)
        if bits != 4:
            raise ValueError(f"wav: IMA ADPCM requires 4 bits/sample, got {bits}")
        samples = _decode_ima_adpcm(raw, channels, _align)
        return samples, sample_rate, channels
    if audio_format != 1:
        raise ValueError(f"wav: unsupported audio format {audio_format}")
    dtype = _PCM_DTYPES.get(bits)
    if dtype is None:
        raise ValueError(f"wav: unsupported bit depth {bits}")
    width = bits // 8
    usable = len(raw) - len(raw) % (width * max(channels, 1))
    samples = np.frombuffer(raw[:usable], dtype=dtype).astype(np.int64)
    if bits == 8:
        samples -= 128  # spec: 8-bit PCM is unsigned, silence at 128
    return samples, sample_rate, channels


# ------------------------------------------------- G.711 (ITU-T) expansion


def _build_g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """256-entry code -> linear-int16 tables straight from the ITU-T
    G.711 segment formulas (mu-law: complement, 4-bit mantissa biased
    by 0x84, 3-bit exponent; A-law: XOR 0x55, segment 0/1 special)."""
    codes = np.arange(256, dtype=np.int64)
    u = (~codes) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84)
    a = codes ^ 0x55
    seg = (a & 0x70) >> 4
    base = (a & 0x0F) << 4
    mag = np.where(
        seg == 0,
        base + 8,
        np.where(seg == 1, base + 0x108, (base + 0x108) << np.maximum(seg - 1, 0)),
    )
    alaw = np.where(a & 0x80, mag, -mag)
    return ulaw.astype(np.int64), alaw.astype(np.int64)


_ULAW_LUT, _ALAW_LUT = _build_g711_luts()


# --------------------------------------------------- IMA / DVI ADPCM (0x11)

#: IMA ADPCM step-size table (89 entries) and index-adjust table — the
#: public IMA "Recommended Practices for Enhancing Digital Audio
#: Compatibility" tables, identical in every implementation.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred: np.ndarray, idx: np.ndarray, nib: np.ndarray):
    """One nibble of the IMA recurrence, vectorized over any leading
    shape (blocks x channels here): returns (new_pred, new_idx)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    diff += np.where(nib & 1, step >> 2, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX_ADJ[nib & 7], 0, 88)
    return pred, idx


def _decode_ima_adpcm(raw: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA ADPCM 'data' chunk -> interleaved int64 samples. Per the WAV
    flavor: each block holds, per channel, a 4-byte header (int16
    initial predictor — the block's FIRST output sample — uint8 step
    index, pad) followed by the nibble data in 4-byte per-channel
    groups, LOW nibble first. The recurrence is sequential within a
    block, so this vectorizes across (blocks x channels) and loops only
    over the within-block sample axis."""
    hdr = 4 * channels
    if block_align <= hdr or (block_align - hdr) % (4 * channels):
        # the data region must split into whole 4-byte-per-channel
        # round-robin groups; a block_align that merely passes % 4 (e.g.
        # 12 with 2 channels) would otherwise surface as an opaque numpy
        # reshape error instead of a codec diagnostic (round-13 ADVICE)
        raise ValueError(
            f"wav: invalid IMA ADPCM block align {block_align} for "
            f"{channels} channel(s): data region must be a multiple of "
            f"{4 * channels} bytes after the {hdr}-byte header"
        )
    if len(raw) < hdr:
        return np.zeros(0, dtype=np.int64)
    # pad a trailing partial block; remember how many data bytes are real
    n_blocks = (len(raw) + block_align - 1) // block_align
    padded = raw + b"\x00" * (n_blocks * block_align - len(raw))
    blk = np.frombuffer(padded, np.uint8).reshape(n_blocks, block_align)
    heads = blk[:, :hdr].reshape(n_blocks, channels, 4)
    pred = (
        heads[:, :, 0].astype(np.int64) + (heads[:, :, 1].astype(np.int64) << 8)
    )
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16
    idx = np.clip(heads[:, :, 2].astype(np.int64), 0, 88)
    # data region: groups of 4 bytes per channel, round-robin
    data = blk[:, hdr:].reshape(n_blocks, -1, channels, 4)  # (B, G, C, 4)
    data = data.transpose(0, 2, 1, 3).reshape(n_blocks, channels, -1)  # (B, C, bytes)
    lo = data & 0x0F
    hi = data >> 4
    nibs = np.stack([lo, hi], axis=-1).reshape(n_blocks, channels, -1)
    spb = nibs.shape[2]  # data samples per block per channel
    out = np.empty((n_blocks, channels, spb + 1), dtype=np.int64)
    out[:, :, 0] = pred
    for s in range(spb):
        pred, idx = _ima_step(pred, idx, nibs[:, :, s])
        out[:, :, s + 1] = pred
    # interleave channels: (B, C, S) -> (B, S, C) -> flat
    flat = out.transpose(0, 2, 1).reshape(-1)
    # trim samples manufactured from the pad bytes of a partial tail
    tail_bytes = len(raw) - (n_blocks - 1) * block_align
    if tail_bytes < block_align:
        full = (n_blocks - 1) * (spb + 1) * channels
        if tail_bytes < hdr:
            # the final block is truncated INSIDE its per-channel
            # header: even the predictor (the block's first output
            # sample) would be fabricated from zero padding — drop the
            # block rather than emit invented samples (round-13 ADVICE)
            flat = flat[:full]
        else:
            tail_data = tail_bytes - hdr
            tail_samples = (tail_data * 2) // channels + 1
            flat = flat[: full + tail_samples * channels]
    return flat


def encode_wav_g711(
    samples: np.ndarray | list[int],
    sample_rate: int = 8000,
    channels: int = 1,
    law: str = "ulaw",
) -> bytes:
    """Test-fixture twin: int16 linear -> G.711 (format 7 mu-law /
    format 6 A-law) WAV bytes. Compression picks, per sample, the code
    whose expansion is nearest — exact inversion of the decode LUT, so
    decode(encode(x)) equals the canonical quantization of x."""
    lut = _ULAW_LUT if law == "ulaw" else _ALAW_LUT
    order = np.argsort(lut, kind="stable")
    sorted_vals = lut[order]
    arr = np.asarray(samples, dtype=np.int64)
    pos = np.searchsorted(sorted_vals, arr)
    pos = np.clip(pos, 1, 255)
    left, right = sorted_vals[pos - 1], sorted_vals[np.clip(pos, 0, 255)]
    take_right = (np.abs(right - arr) < np.abs(arr - left)) & (pos < 256)
    codes = order[np.where(take_right, np.clip(pos, 0, 255), pos - 1)]
    payload = codes.astype(np.uint8).tobytes()
    fmt_tag = 7 if law == "ulaw" else 6
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, sample_rate, sample_rate * channels,
        channels, 8,
    )
    chunks = b"".join([
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(payload)), payload,
        b"\x00" * (len(payload) % 2),
    ])
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_ima_adpcm(
    samples: np.ndarray | list[int],
    sample_rate: int = 8000,
    channels: int = 1,
    block_align: int = 256,
) -> bytes:
    """Test-fixture twin: int16 linear (interleaved) -> IMA ADPCM WAV
    (format 0x11). Sequential reference encoder — per block and channel,
    the header carries the first sample verbatim and each later sample
    quantizes (sample - predicted) against the current step, exactly the
    published IMA encode loop."""
    arr = np.asarray(samples, dtype=np.int64)
    if channels < 1 or arr.size % channels:
        raise ValueError("wav: sample count not a multiple of channels")
    hdr = 4 * channels
    if block_align <= hdr or block_align % 4:
        raise ValueError(f"wav: invalid IMA ADPCM block align {block_align}")
    per_ch = arr.reshape(-1, channels).T  # (C, S)
    spb = (block_align - hdr) * 2 // channels + 1  # samples/block/channel
    n_blocks = (per_ch.shape[1] + spb - 1) // spb
    pad = n_blocks * spb - per_ch.shape[1]
    if pad:
        per_ch = np.concatenate(
            [per_ch, np.repeat(per_ch[:, -1:], pad, axis=1)], axis=1
        )
    idx = np.zeros(channels, dtype=np.int64)
    orig_frames = arr.size // channels
    blocks = []
    for b in range(n_blocks):
        chunk = per_ch[:, b * spb : (b + 1) * spb]
        # frames of this block that are real signal (the final block is
        # padded with last-sample repeats; seeding from the pad would
        # start the step ladder near zero and turn the block's real
        # frames into an attack transient)
        valid = max(min(spb, orig_frames - b * spb), 2)
        head = b""
        ch_nibs = []
        for c in range(channels):
            # seed the block's step index near the block's mean |delta| —
            # the standard encoder heuristic; starting every stream at
            # step 7 takes ~dozens of samples to adapt and turns the
            # attack into thousands of LSBs of transient error. The
            # index travels in the block header, so the decoder tracks
            # the encoder exactly either way.
            if chunk.shape[1] > 1:
                mean_d = float(np.abs(np.diff(chunk[c, :valid])).mean())
                idx[c] = int(np.argmin(np.abs(_IMA_STEPS - mean_d)))
            pred = int(chunk[c, 0])
            head += struct.pack("<hBB", pred, int(idx[c]), 0)
            nibs = []
            for s in chunk[c, 1:]:
                step = int(_IMA_STEPS[idx[c]])
                delta = int(s) - pred
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                p, i = _ima_step(
                    np.array(pred, dtype=np.int64),
                    idx[c : c + 1][0],
                    np.array(nib, dtype=np.int64),
                )
                pred, idx[c] = int(p), int(i)
                nibs.append(nib)
            ch_nibs.append(nibs)
        body = bytearray()
        group = 8 // 1  # 8 nibbles = 4 bytes per channel per group
        n_groups = (spb - 1 + group - 1) // group
        for g in range(n_groups):
            for c in range(channels):
                for k in range(0, 8, 2):
                    a = ch_nibs[c][g * 8 + k] if g * 8 + k < len(ch_nibs[c]) else 0
                    bnib = (
                        ch_nibs[c][g * 8 + k + 1]
                        if g * 8 + k + 1 < len(ch_nibs[c])
                        else 0
                    )
                    body.append(a | (bnib << 4))
        blocks.append(head + bytes(body))
    payload = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHH",
        0x11, channels, sample_rate,
        (sample_rate * block_align + spb - 1) // spb,
        block_align, 4, spb,
    )
    chunks = b"".join([
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(payload)), payload,
        b"\x00" * (len(payload) % 2),
    ])
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
