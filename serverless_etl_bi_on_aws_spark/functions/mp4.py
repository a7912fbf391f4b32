"""From-scratch ISO BMFF (MP4) container codec (stdlib struct only).

Sixth real media path (round-8 verdict ask #5): AVI made video real
(functions/avi.py), but the container real-world crawls actually carry is
ISO Base Media File Format — MP4. This module writes and parses the box
tree (ftyp / mdat / moov: mvhd, trak: tkhd, mdia: mdhd, hdlr, minf:
vmhd, dinf/dref, stbl: stsd, stts, stsc, stsz, stco|co64) and recovers
per-sample byte ranges from the sample tables, handing each sample —
a whole baseline JPEG — to the in-repo T.81 decoder
(functions/jpeg.decode_jpeg_gray). Motion-JPEG-in-MP4 ('jpeg' sample
entry) is the one video codec expressible with the codecs this repo
implements from scratch; genuinely inter-frame codecs (avc1/hvc1/vp09…)
are refused LOUDLY by fourcc, never silently skipped.

Box grammar implemented (ISO/IEC 14496-12):
  * size(4) type(4) body; size==1 -> 64-bit largesize follows; size==0
    -> box runs to end of file. Unknown boxes are skipped by size.
  * FullBox = version(1) + flags(3) prefix; mvhd/tkhd/mdhd accepted in
    version 0 and 1 (64-bit times), sample tables in their v0 forms plus
    co64 for 64-bit chunk offsets.
  * Sample location = stsc (chunk -> samples-per-chunk runs) x stco/co64
    (absolute file offsets) x stsz (per-sample sizes) — the full general
    walk, not the one-chunk special case the encoder happens to emit.

Scale note: this is a *driver-free byte codec* — it runs inside the same
one-Arrow-stage-per-scan discipline as PNG/JPEG/WAV/AVI/GIF
(sources/multimodal.py); only integer statistics ever reach an exchange.
"""

from __future__ import annotations

import struct

#: sample-entry fourccs the in-repo JPEG decoder can serve
JPEG_SAMPLE_ENTRIES = (b"jpeg", b"mjpa")


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, bytes([version]) + flags.to_bytes(3, "big") + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 4,
    chunk_per_sample: bool = False,
    use_co64: bool = False,
) -> bytes:
    """Wrap already-encoded baseline-JPEG frames into a minimal valid
    single-track MP4 (Motion JPEG, 'jpeg' sample entry). Container-
    lossless: :func:`decode_mp4_frames` returns the payload bytes
    unchanged. Layout: ftyp, mdat (samples concatenated), moov last — so
    chunk offsets are known when moov is built.

    ``chunk_per_sample`` writes one chunk per sample (the layout an
    interleaving muxer emits) instead of one chunk holding all samples;
    ``use_co64`` writes 64-bit chunk offsets (the >4 GB-file form). Both
    exist so the decoder's GENERAL sample walk is exercised by tests,
    not just the encoder's simplest shape."""
    if not frames:
        raise ValueError("mp4: cannot encode zero frames")
    n = len(frames)
    timescale = 1000
    delta = timescale // max(fps, 1)
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    first_sample_off = len(ftyp) + 8  # mdat header is size(4)+type(4)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in-movie | in-preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt group, volume, reserved
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # VisualSampleEntry for 'jpeg'
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count per sample
        + b"\x00" * 32  # compressorname (pascal, empty)
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    if chunk_per_sample:
        stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
        offs = []
        cur = first_sample_off
        for f in frames:
            offs.append(cur)
            cur += len(f)
    else:
        stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        offs = [first_sample_off]
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    if use_co64:
        stco = _full(
            b"co64", 0, 0,
            struct.pack(">I", len(offs)) + b"".join(struct.pack(">Q", o) for o in offs),
        )
    else:
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", len(offs)) + b"".join(struct.pack(">I", o) for o in offs),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError(f"mp4: truncated largesize box {tag!r}")
            size = struct.unpack(">Q", data[body : body + 8])[0]
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if size != 0 and (size < 8 or box_end > end):
            raise ValueError(f"mp4: truncated or malformed {tag!r} box")
        yield tag, body, box_end
        pos = box_end


def _find(data: bytes, pos: int, end: int, tag: bytes) -> tuple[int, int] | None:
    for t, b, e in _walk(data, pos, end):
        if t == tag:
            return b, e
    return None


def _fullbox(data: bytes, body: int) -> tuple[int, int]:
    """(version, first-payload-offset) of a FullBox body."""
    return data[body], body + 4


def decode_mp4_frames(data: bytes) -> tuple[list[bytes], int, int, int, bytes]:
    """MP4 -> (sample payloads, width, height, fps, sample-entry fourcc).

    Walks moov -> first 'vide' trak -> stbl and reconstructs every
    sample's absolute byte range from the general stsc x stco/co64 x
    stsz tables. Raises ValueError on: no moov / no video track /
    missing sample tables / truncation / a non-JPEG codec (the fourcc is
    reported so the refusal is actionable)."""
    if len(data) < 8:
        raise ValueError("mp4: not a BMFF file (too short)")
    top = {t: (b, e) for t, b, e in _walk(data, 0, len(data)) if t in (b"ftyp", b"moov")}
    if b"moov" not in top:
        raise ValueError("mp4: no moov box (not a BMFF movie)")
    moov_b, moov_e = top[b"moov"]

    # pick the first track whose handler is 'vide'
    stbl = None
    mdhd_body = None
    for t, b, e in _walk(data, moov_b, moov_e):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            continue
        _, h0 = _fullbox(data, hdlr[0])
        if data[h0 + 4 : h0 + 8] != b"vide":
            continue
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if mdhd is None or minf is None:
            raise ValueError("mp4: video trak missing mdhd/minf")
        stbl = _find(data, minf[0], minf[1], b"stbl")
        mdhd_body = mdhd[0]
        break
    if stbl is None:
        raise ValueError("mp4: no video track")

    boxes = {t: (b, e) for t, b, e in _walk(data, stbl[0], stbl[1])}
    for req in (b"stsd", b"stts", b"stsc", b"stsz"):
        if req not in boxes:
            raise ValueError(f"mp4: stbl missing {req.decode()} sample table")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("mp4: stbl missing chunk offsets (stco/co64)")

    # --- stsd: codec + declared dimensions ---
    _, p = _fullbox(data, boxes[b"stsd"][0])
    if struct.unpack(">I", data[p : p + 4])[0] < 1:
        raise ValueError("mp4: empty stsd")
    entry = p + 4
    fourcc = data[entry + 4 : entry + 8]
    if fourcc not in JPEG_SAMPLE_ENTRIES:
        raise ValueError(
            f"mp4: unsupported codec {fourcc.decode('latin1')!r} — only "
            "(M)JPEG tracks decode through the in-repo T.81 decoder"
        )
    se = entry + 8  # VisualSampleEntry fields
    width, height = struct.unpack(">HH", data[se + 24 : se + 28])

    # --- mdhd: timescale -> fps with the first stts delta ---
    ver, p = _fullbox(data, mdhd_body)
    timescale = struct.unpack(">I", data[p + (16 if ver == 1 else 8) : p + (20 if ver == 1 else 12)])[0]
    _, p = _fullbox(data, boxes[b"stts"][0])
    n_stts = struct.unpack(">I", data[p : p + 4])[0]
    if n_stts < 1:
        raise ValueError("mp4: empty stts")
    first_delta = struct.unpack(">I", data[p + 8 : p + 12])[0]
    fps = timescale // max(first_delta, 1)

    # --- stsz: sizes ---
    _, p = _fullbox(data, boxes[b"stsz"][0])
    fixed, n_samples = struct.unpack(">II", data[p : p + 8])
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack(f">{n_samples}I", data[p + 8 : p + 8 + 4 * n_samples]))

    # --- stco / co64: chunk offsets ---
    if b"stco" in boxes:
        _, p = _fullbox(data, boxes[b"stco"][0])
        n_chunks = struct.unpack(">I", data[p : p + 4])[0]
        offsets = list(struct.unpack(f">{n_chunks}I", data[p + 4 : p + 4 + 4 * n_chunks]))
    else:
        _, p = _fullbox(data, boxes[b"co64"][0])
        n_chunks = struct.unpack(">I", data[p : p + 4])[0]
        offsets = list(struct.unpack(f">{n_chunks}Q", data[p + 4 : p + 4 + 8 * n_chunks]))

    # --- stsc: (first_chunk, samples_per_chunk) runs -> per-chunk counts ---
    _, p = _fullbox(data, boxes[b"stsc"][0])
    n_runs = struct.unpack(">I", data[p : p + 4])[0]
    runs = [
        struct.unpack(">III", data[p + 4 + 12 * i : p + 16 + 12 * i])
        for i in range(n_runs)
    ]
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks:
        raise ValueError("mp4: stsc runs do not cover the chunk list")

    # --- general sample walk ---
    frames: list[bytes] = []
    si = 0
    for ci, off in enumerate(offsets):
        cursor = off
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            size = sizes[si]
            if cursor + size > len(data):
                raise ValueError(f"mp4: sample {si} extends past end of file")
            frames.append(data[cursor : cursor + size])
            cursor += size
            si += 1
    if si != n_samples:
        raise ValueError(f"mp4: located {si} of {n_samples} samples")
    return frames, width, height, fps, fourcc
