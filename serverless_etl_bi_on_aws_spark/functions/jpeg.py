"""Baseline JPEG codec (grayscale, from scratch: numpy + stdlib) — the
second REAL decoder for the multimodal column (north-star X4), upgrading
``image/jpeg`` from a deterministic stand-in to actual entropy-coded DCT
bytes, exactly as functions/png.py did for ``image/png`` in round 2.

Scope: ITU-T T.81 baseline sequential DCT, 8-bit, single (luma) component,
no restart intervals, no progressive/arithmetic modes. The ENCODER emits a
spec-valid JFIF stream with optimized Huffman tables derived from the
actual symbol statistics (Annex K.2's two-least-frequent merge + the
Annex K.3 BITS-length adjustment — what ``jpegtran -optimize`` produces);
the DECODER is general within the baseline profile: it parses whatever
DQT/DHT/SOF0/SOS the stream carries, huffman-decodes the MCUs with DC
prediction, dequantizes, de-zigzags, and applies the IDCT as one batched
matmul over all blocks.

Lossiness contract: unlike PNG, decode(encode(x)) != x. What IS exact:
per 8x8 block the reconstructed mean differs from the source mean by at
most quant[0]/2 DCT units = 1 gray level (DC quantization), so image-mean
statistics survive the roundtrip within ~1-2 levels — which is what the
q49 driver gate bounds. Pixel-level fidelity is bounded in tests by PSNR.

Everything here derives from the public JPEG specification (ITU-T T.81 /
ISO 10918-1) and its Annex K reference tables.
"""

from __future__ import annotations

import struct

import numpy as np

#: Annex K.1 luminance quantization table (quality ~50), row-major.
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)


def _zigzag_order() -> np.ndarray:
    """The 64 (row, col) -> scan-position permutation of T.81 Figure 5:
    anti-diagonals, odd sums walking down-left, even sums up-right."""
    coords = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )
    flat = np.empty(64, dtype=np.int64)
    for pos, (r, c) in enumerate(coords):
        flat[pos] = r * 8 + c
    return flat


ZIGZAG = _zigzag_order()  # scan position -> flat block index
UNZIGZAG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix; C @ block @ C.T gives exactly the
    T.81 A.3.3 FDCT coefficients (and C.T @ coef @ C the IDCT)."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c


DCT = _dct_matrix()


def _bit_size(v: int) -> int:
    """T.81 'category': number of bits to represent |v| (0 for 0)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Huffman table construction (encoder side) — T.81 Annex K.2 / K.3
# ---------------------------------------------------------------------------


def _build_huffman(freq_in: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies -> (BITS[1..16], HUFFVAL) per Annex K.2: merge the
    two least-frequent entries (ties to the larger symbol) tracking code
    sizes through a chain array, reserve one slot via pseudo-symbol 256,
    then Annex K.3's adjustment folds code lengths > 16 back down."""
    freq = np.zeros(257, dtype=np.int64)
    for sym, f in freq_in.items():
        freq[sym] = f
    freq[256] = 1  # reserves the all-ones code (never assigned to a symbol)
    codesize = [0] * 257
    others = [-1] * 257

    _huge = 1 << 62

    def least(exclude: int) -> int:
        # vectorized K.2 scan (round-18 optimization: the 257-entry Python
        # loop ran once per merge step and was ~half of encode time).
        # Original tie rule preserved: smallest frequency, LARGEST symbol.
        masked = np.where(freq > 0, freq, _huge)
        if exclude >= 0:
            masked[exclude] = _huge
        m = masked.min()
        if m == _huge:
            return -1
        return int(np.nonzero(masked == m)[0][-1])

    while True:
        v1 = least(-1)
        v2 = least(v1)
        if v2 == -1:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1

    bits = [0] * 33
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    # Annex K.3: fold lengths > 16 down by moving a leaf pair up
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # drop the reserved slot from the longest used length
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1
    huffval = [v for v in sorted(range(256), key=lambda s: (codesize[s], s)) if codesize[v]]
    return bits[1:17], huffval


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.buf)


def _blocks_from_gray(pixels: bytes, width: int, height: int) -> tuple[np.ndarray, int, int]:
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bw, bh = -(-width // 8), -(-height // 8)
    padded = np.pad(img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )
    return blocks.astype(np.float64) - 128.0, bw, bh


def encode_jpeg_gray(
    pixels: bytes, width: int, height: int, quant: np.ndarray | None = None
) -> bytes:
    """Row-major 8-bit grayscale -> baseline JFIF bytes (one luma component,
    optimized Huffman tables, no subsampling question to answer)."""
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant, dtype=np.int32)
    blocks, bw, bh = _blocks_from_gray(pixels, width, height)
    coef = np.einsum("ij,njk,lk->nil", DCT, blocks, DCT)
    quantized = np.round(coef / q).astype(np.int64)
    zz = quantized.reshape(-1, 64)[:, ZIGZAG]

    # symbol streams: DC differences and AC (run, size) pairs
    dc_syms: list[tuple[int, int]] = []  # (size, value)
    ac_syms: list[list[tuple[int, int, int]]] = []  # per block: (runsize, size, value)
    prev_dc = 0
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    for row in zz:
        diff = int(row[0]) - prev_dc
        prev_dc = int(row[0])
        s = _bit_size(diff)
        dc_syms.append((s, diff))
        dc_freq[s] = dc_freq.get(s, 0) + 1
        block_acs: list[tuple[int, int, int]] = []
        run = 0
        nz = np.flatnonzero(row[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                block_acs.append((0xF0, 0, 0))  # ZRL
                ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1
                run -= 16
            s = _bit_size(v)
            sym = (run << 4) | s
            block_acs.append((sym, s, v))
            ac_freq[sym] = ac_freq.get(sym, 0) + 1
            run = 0
        if last < 63:
            block_acs.append((0x00, 0, 0))  # EOB
            ac_freq[0x00] = ac_freq.get(0x00, 0) + 1
        ac_syms.append(block_acs)

    dc_bits, dc_vals = _build_huffman(dc_freq)
    ac_bits, ac_vals = _build_huffman(ac_freq)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    w = _BitWriter()
    for (s, diff), block_acs in zip(dc_syms, ac_syms):
        code, length = dc_codes[s]
        w.write(code, length)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        for sym, s2, v in block_acs:
            code, length = ac_codes[sym]
            w.write(code, length)
            if s2:
                w.write(v if v >= 0 else v + (1 << s2) - 1, s2)
    entropy = w.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_q = q.reshape(-1)[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in zz_q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    for cls, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), cls << 4) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _extend(bits: int, size: int) -> int:
    """T.81 F.12 sign extension of a magnitude-category value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _prefix_luts(codes: dict[int, tuple[int, int]]) -> tuple[bytes, bytes]:
    """Canonical codes -> 16-bit prefix lookup tables (round-18
    optimization: replaces the per-bit _BitReader walk — ~85% of decode
    time — with one index per symbol). Entry ``i`` covers every 16-bit
    window whose leading bits spell a code; length 0 marks an unassigned
    prefix (invalid code). Prefix-freeness makes the mapping unambiguous,
    so decoded symbols are identical to the bit-walk's. Returned as
    ``bytes`` — indexing bytes yields ints at C speed, where numpy scalar
    extraction (or a 65536-entry tolist per frame) dominated the decode."""
    lut_len = bytearray(65536)
    lut_sym = bytearray(65536)
    for sym, (code, ln) in codes.items():
        start = code << (16 - ln)
        end = (code + 1) << (16 - ln)
        lut_len[start:end] = bytes([ln]) * (end - start)
        lut_sym[start:end] = bytes([sym]) * (end - start)
    return bytes(lut_len), bytes(lut_sym)


def decode_jpeg_gray(data: bytes) -> tuple[bytes, int, int]:
    """Baseline JFIF bytes -> (row-major grayscale pixels, width, height).

    General within the baseline single-component profile: tables are taken
    from the stream (any spec-valid DQT/DHT layout), unknown APPn/COM
    segments are skipped by their length fields."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    width = height = None
    dc_id = ac_id = 0
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[off : off + 64], dtype=np.uint8).astype(np.int32)
                    off += 64
                else:
                    tbl = np.frombuffer(seg[off : off + 128], dtype=">u2").astype(np.int32)
                    off += 128
                quant[tq] = tbl[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC0:  # SOF0 baseline
            height, width = struct.unpack(">HH", seg[1:5])
            if seg[5] != 1:
                raise ValueError("jpeg: only single-component baseline supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("jpeg: non-baseline SOF not supported")
        elif marker == 0xDD:  # DRI: restart interval
            # A non-zero interval means RSTn markers punctuate the entropy
            # stream and DC prediction resets at each — this decoder's
            # un-stuff + single-run DC chain would silently decode such a
            # file to garbage (round-5 verdict #5). Refuse loudly.
            if struct.unpack(">H", seg[:2])[0] != 0:
                raise ValueError(
                    "jpeg: restart markers (DRI interval != 0) not supported"
                )
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nvals])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                off += 17 + nvals
        elif marker == 0xDA:  # SOS
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0xF
            entropy_start = pos + seg_len
            break
        pos += seg_len
    if entropy_start is None or width is None:
        raise ValueError("jpeg: missing SOS/SOF0")

    # entropy segment runs to EOI; un-stuff 0xFF00 -> 0xFF
    end = data.find(b"\xff\xd9", entropy_start)
    if end == -1:
        end = len(data)
    entropy = data[entropy_start:end].replace(b"\xff\x00", b"\xff")

    q = quant[0]
    bw, bh = -(-width // 8), -(-height // 8)
    n_blocks = bw * bh
    zz = np.zeros((n_blocks, 64), dtype=np.int64)

    # LUT entropy decode (round-18 optimization — see _prefix_luts): the
    # stream becomes a rolling 16-bit integer window; each symbol is one
    # LUT index + length advance, each magnitude one shift of the window.
    dc_len_l, dc_sym_l = _prefix_luts(huff[(0, dc_id)])
    ac_len_l, ac_sym_l = _prefix_luts(huff[(1, ac_id)])
    bits = np.unpackbits(np.frombuffer(entropy, dtype=np.uint8))
    total = int(bits.size)
    ext = np.concatenate([bits, np.zeros(16, dtype=np.uint8)]).astype(np.int64)
    weights = (1 << np.arange(15, -1, -1)).astype(np.int64)
    peek = np.lib.stride_tricks.sliding_window_view(ext, 16) @ weights
    peek_l = peek.tolist()  # list indexing beats np scalar extraction per symbol

    pos = 0
    prev_dc = 0
    for b in range(n_blocks):
        if pos > total:
            raise ValueError("jpeg: entropy data exhausted")
        e = peek_l[pos]
        ln = dc_len_l[e]
        if ln == 0:
            raise ValueError("jpeg: invalid huffman code")
        s = dc_sym_l[e]
        pos += ln
        if s:
            if pos > total:
                raise ValueError("jpeg: entropy data exhausted")
            prev_dc += _extend(peek_l[pos] >> (16 - s), s)
            pos += s
        zz[b, 0] = prev_dc
        k = 1
        while k < 64:
            if pos > total:
                raise ValueError("jpeg: entropy data exhausted")
            e = peek_l[pos]
            ln = ac_len_l[e]
            if ln == 0:
                raise ValueError("jpeg: invalid huffman code")
            sym = ac_sym_l[e]
            pos += ln
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                raise ValueError("jpeg: invalid AC symbol")
            k += run
            if k >= 64:
                raise ValueError("jpeg: AC run past block end")
            if pos > total:
                raise ValueError("jpeg: entropy data exhausted")
            zz[b, k] = _extend(peek_l[pos] >> (16 - size), size)
            pos += size
            k += 1
    if pos > total:
        raise ValueError("jpeg: entropy data exhausted")

    coef = (zz[:, UNZIGZAG].reshape(n_blocks, 8, 8)) * q[None, :, :]
    spatial = np.einsum("ji,njk,kl->nil", DCT, coef.astype(np.float64), DCT)
    img = (
        spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )
    img = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
    return img[:height, :width].tobytes(), width, height
