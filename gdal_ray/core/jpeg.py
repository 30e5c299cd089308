"""Real baseline JPEG (JFIF) codec — pure numpy/stdlib, no libjpeg.

Implements ITU-T T.81 baseline sequential AND progressive DCT:
  encoder: RGB→YCbCr (JFIF), 8×8 forward DCT (exact matrix form),
    Annex-K quantization tables scaled by quality, spec Annex-K Huffman
    tables, 4:4:4 sampling, byte stuffing — output opens in any viewer;
    plus a progressive (SOF2) encoder with the standard libjpeg scan
    script and per-scan optimized tables (encode_jpeg_progressive);
  decoder: DQT/DHT/SOF0/1/SOS/DRI parsing, canonical Huffman decode
    (two-level lookup), dequant + vectorized IDCT over all blocks at once,
    sampling factors (1,1) per component or (2,2) luma with (1,1) chroma
    (4:2:0), restart markers; SOF2 progressive decode (T.81 G.2) with
    spectral selection, successive approximation (DC+AC refinement,
    EOBn runs, ZRL) — interleaved DC scans and non-interleaved AC scans.

Constant tables below are the published JPEG-standard (Annex K) data —
the same numbers every implementation ships (ref frmts/jpeg/libjpeg/
jcparam.c carries them verbatim).

The per-symbol entropy loops are Python (Huffman is sequential by nature);
everything per-pixel — color transforms, DCT/IDCT, quantization,
upsampling — is vectorized numpy over all blocks simultaneously.
"""

from __future__ import annotations

import functools as _functools
import struct

import numpy as np

# ---------- spec constant tables (T.81 Annex K) ----------

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

BITS_DC_LUMA = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
VALS_DC_LUMA = list(range(12))
BITS_DC_CHROMA = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
VALS_DC_CHROMA = list(range(12))

BITS_AC_LUMA = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
VALS_AC_LUMA = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

BITS_AC_CHROMA = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
VALS_AC_CHROMA = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# zigzag order: ZIGZAG[i] = raster index of the i-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal DCT-II matrix: D @ x applies the 1-D DCT along axis 0
_k = np.arange(8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
DCT_M[0] *= 1.0 / np.sqrt(2.0)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _huff_codes(bits, vals):
    """Canonical code assignment (T.81 Annex C): {symbol: (code, length)}."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decoder(bits, vals):
    """Two-level decode tables: a 256-entry LUT of (symbol, length) for
    codes ≤ 8 bits (covers almost every symbol of the standard tables), and
    plain-python mincode/maxcode/valptr lists for the 9-16 bit tail
    (T.81 F.2.2.3).  Python lists beat numpy scalar indexing ~10× in the
    per-symbol loop."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    i = 0
    lut = [None] * 256
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = i
            mincode[length] = code
            for _ in range(bits[length - 1]):
                if length <= 8:
                    base = code << (8 - length)
                    for suffix in range(1 << (8 - length)):
                        lut[base | suffix] = (vals[i], length)
                code += 1
                i += 1
            maxcode[length] = code - 1
        code <<= 1
    return {"min": mincode, "max": maxcode, "valptr": valptr,
            "vals": list(vals), "lut": lut,
            "dbits": list(bits), "dvals": list(vals)}


def _windows16(seg: bytes) -> tuple[np.ndarray, int]:
    """w16[p] = the 16 bits of the (zero-padded) segment starting at bit
    position p, MSB-first — padded long enough that value-bit reads at
    p + code_len stay in bounds."""
    n = len(seg) * 8
    b = np.frombuffer(seg + b"\x00" * 8, np.uint8).astype(np.int32)
    u24 = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
    # broadcast (not positional gather): sequential access, no p array
    w16 = ((u24[:, None] >> (8 - np.arange(8, dtype=np.int32)[None, :]))
           & 0xFFFF).ravel()
    return w16[:n + 33], n


@_functools.lru_cache(maxsize=16)
def _ac_joint16(bits: tuple, vals: tuple) -> np.ndarray:
    """65536-entry joint AC LUT over a 16-bit window, one gather decodes
    code + appended value.  Packed int32:

        (adv << 22) | (kind << 19) | (run << 15) | payload

    kind 1 = coefficient, payload = value + 8192 (code_len + size ≤ 16);
    kind 2 = EOB; kind 3 = ZRL; kind 4 = coefficient whose value bits spill
    past the window (payload = size, adv = code_len only); 0 = invalid."""
    arr = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            rs = vals[i]
            run, size = rs >> 4, rs & 0xF
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if size == 0:
                if rs == 0xF0:
                    arr[lo:hi] = (length << 22) | (3 << 19) | 8192
                elif rs == 0:
                    arr[lo:hi] = (length << 22) | (2 << 19) | 8192
            elif size > 10:
                pass                                    # invalid in baseline
            elif length + size <= 16:
                free = 16 - length - size
                v = (np.arange(lo, hi, dtype=np.int32) >> free) \
                    & ((1 << size) - 1)
                ext = np.where(v >= (1 << (size - 1)), v,
                               v - (1 << size) + 1)
                arr[lo:hi] = ((((length + size) << 22) | (1 << 19)
                               | (run << 15)) + ext + 8192)
            else:
                arr[lo:hi] = ((length << 22) | (4 << 19) | (run << 15)
                              | size)
            code += 1
            i += 1
        code <<= 1
    return arr


@_functools.lru_cache(maxsize=16)
def _dc_joint16(bits: tuple, vals: tuple) -> np.ndarray:
    """DC analog of _ac_joint16: (adv << 15) | (ext_flag << 14) | payload;
    payload = diff + 4096 inline, or size when the value bits spill past
    the 16-bit window (ext_flag set).  0 = invalid window."""
    arr = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            size = vals[i]
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if size == 0:
                arr[lo:hi] = (length << 15) | 4096
            elif size <= 11 and length + size <= 16:
                free = 16 - length - size
                v = (np.arange(lo, hi, dtype=np.int32) >> free) \
                    & ((1 << size) - 1)
                ext = np.where(v >= (1 << (size - 1)), v,
                               v - (1 << size) + 1)
                arr[lo:hi] = (((length + size) << 15)) + ext + 4096
            elif size <= 11:
                arr[lo:hi] = (length << 15) | (1 << 14) | size
            code += 1
            i += 1
        code <<= 1
    return arr


def _entry_tables(seg: bytes, comps, huff_dc, huff_ac):
    """Whole-segment entropy precompute: ONE cached-LUT gather per table
    plus a memcpy into array.array (no per-element boxing).  The sequential
    MCU walk then needs no bit arithmetic: ``e = arr[p]; p += e >> shift``.
    Returns (dc_arrays, ac_arrays, w16_array)."""
    import array as _array

    w16, n = _windows16(seg)
    win = w16[:n]
    w16a = _array.array("i", w16.tobytes())
    dc_arrays: dict = {}
    ac_arrays: dict = {}
    for c in comps:
        td, ta = c["td"], c["ta"]
        if td not in dc_arrays:
            t = huff_dc[td]
            lut = _dc_joint16(tuple(t["dbits"]), tuple(t["dvals"]))
            dc_arrays[td] = _array.array("i", np.take(lut, win).tobytes())
        if ta not in ac_arrays:
            t = huff_ac[ta]
            lut = _ac_joint16(tuple(t["dbits"]), tuple(t["dvals"]))
            ac_arrays[ta] = _array.array("i", np.take(lut, win).tobytes())
    return dc_arrays, ac_arrays, w16a


# ---------- bit IO ----------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)   # byte stuffing
        self.acc &= (1 << self.nbits) - 1   # keep the accumulator small

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


import re as _re

_SCAN_END = _re.compile(rb"\xff[^\x00\xd0-\xd7]", _re.DOTALL)
_RST = _re.compile(rb"\xff[\xd0-\xd7]", _re.DOTALL)


def _split_entropy(data: bytes, pos: int) -> list[bytes]:
    """De-stuff the entropy-coded data ONCE (0xFF00 → 0xFF) and split it at
    restart markers — all C-level (regex + bytes.replace), no per-byte
    python loop."""
    m = _SCAN_END.search(data, pos)
    end = m.start() if m else len(data)
    body = data[pos:end]
    return [seg.replace(b"\xff\x00", b"\xff") for seg in _RST.split(body)]


class _SegReader:
    """Bit reader over one de-stuffed entropy segment (MSB first);
    refills 64 bits at a time via int.from_bytes."""
    __slots__ = ("d", "n", "pos", "acc", "nbits")

    def __init__(self, seg: bytes):
        self.d = seg + b"\x00" * 16       # zero tail = padded 1-bits absent; safe
        self.n = len(seg)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        p = self.pos
        self.acc = (self.acc << 64) | int.from_bytes(self.d[p:p + 8], "big")
        self.pos = p + 8
        self.nbits += 64

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill()
        self.nbits -= k
        v = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _decode_huff(br: _SegReader, tbl) -> int:
    """8-bit LUT fast path (covers nearly all symbols of the standard
    tables); canonical walk for 9-16 bit codes."""
    if br.nbits < 16:
        br._fill()
    window = (br.acc >> (br.nbits - 8)) & 0xFF
    e = tbl["lut"][window]
    if e is not None:
        sym, ln = e
        br.nbits -= ln
        br.acc &= (1 << br.nbits) - 1
        return sym
    maxc = tbl["max"]
    for length in range(9, 17):
        if br.nbits < length:
            br._fill()
        code = (br.acc >> (br.nbits - length)) & ((1 << length) - 1)
        if code <= maxc[length]:
            br.nbits -= length
            br.acc &= (1 << br.nbits) - 1
            return tbl["vals"][tbl["valptr"][length] + code - tbl["min"][length]]
    raise ValueError("corrupt JPEG: huffman code overrun")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------- encoder ----------

def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) spatial → (N, 8, 8) DCT coefficients (orthonormal)."""
    return np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M, optimize=True)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", DCT_M, coef, DCT_M, optimize=True)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh = -(-h // 8)
    bw = -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1:h, :]          # edge replicate
    padded[:, w:] = padded[:, w - 1:w]
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Vectorized int bit_length for non-negative values (frexp exponent —
    exact for magnitudes < 2^53)."""
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.int64)


def _code_luts(codes: dict, n: int):
    cl = np.zeros(n, np.uint64)
    ll = np.zeros(n, np.uint64)
    for s, (c, l) in codes.items():
        cl[s] = c
        ll[s] = l
    return cl, ll


def _entropy_symbols(zz: np.ndarray, bseq: np.ndarray, dc_codes, ac_codes):
    """Fully vectorized entropy-symbol generation for one component.

    Produces (sort_key, code, nbits) arrays covering the component's whole
    scan: DC size symbol + diff bits, zero-run/size AC symbols with ZRL
    expansion and appended value bits, and per-block EOB.  ``bseq`` gives
    each block's global emission sequence number; sorting the concatenated
    per-component arrays by key yields the exact interleaved MCU order the
    old per-symbol walk emitted.  Within-block key layout: DC sym 0, DC
    bits 1, coefficient at zigzag column c → ZRLs at 2+8c+{0,1,2}, symbol
    2+8c+4, value bits 2+8c+5, EOB at 2+8·63 (< the 520 block stride)."""
    dccl, dcll = _code_luts(dc_codes, 16)
    accl, acll = _code_luts(ac_codes, 256)
    STRIDE = 520
    keys = []
    cods = []
    lens = []
    # DC: differential, size symbol then mapped diff bits
    diff = np.diff(zz[:, 0], prepend=0)
    size = _bitlen(np.abs(diff))
    keys.append(bseq * STRIDE)
    cods.append(dccl[size])
    lens.append(dcll[size])
    keys.append(bseq * STRIDE + 1)
    cods.append(np.where(diff >= 0, diff,
                         diff + (1 << size) - 1).astype(np.uint64))
    lens.append(size.astype(np.uint64))
    # AC: runs between nonzeros within each block
    ac = zz[:, 1:]
    rows, cols = np.nonzero(ac)
    if rows.size:
        v = ac[rows, cols]
        first = np.ones(rows.size, bool)
        first[1:] = rows[1:] != rows[:-1]
        prevc = np.empty_like(cols)
        prevc[1:] = cols[:-1]
        run = np.where(first, cols, cols - prevc - 1)
        zc = run >> 4                             # ZRL count (≤ 3)
        sizev = _bitlen(np.abs(v))
        base = bseq[rows] * STRIDE + 2 + cols * 8
        keys.append(base + 4)
        cods.append(accl[((run & 15) << 4) | sizev])
        lens.append(acll[((run & 15) << 4) | sizev])
        keys.append(base + 5)
        cods.append(np.where(v >= 0, v, v + (1 << sizev) - 1)
                    .astype(np.uint64))
        lens.append(sizev.astype(np.uint64))
        tot = int(zc.sum())
        if tot:
            rep = np.repeat(np.arange(rows.size), zc)
            sub = np.arange(tot) - np.repeat(np.cumsum(zc) - zc, zc)
            keys.append(base[rep] + sub)
            cods.append(np.full(tot, accl[0xF0], np.uint64))
            lens.append(np.full(tot, acll[0xF0], np.uint64))
        # EOB for blocks whose last nonzero is not coefficient 63
        lastmask = np.ones(rows.size, bool)
        lastmask[:-1] = rows[1:] != rows[:-1]
        lastcol = np.full(zz.shape[0], -1, np.int64)
        lastcol[rows[lastmask]] = cols[lastmask]
    else:
        lastcol = np.full(zz.shape[0], -1, np.int64)
    eob = np.nonzero(lastcol != 62)[0]
    keys.append(bseq[eob] * STRIDE + 2 + 63 * 8)
    cods.append(np.full(eob.size, accl[0x00], np.uint64))
    lens.append(np.full(eob.size, acll[0x00], np.uint64))
    return (np.concatenate(keys), np.concatenate(cods),
            np.concatenate(lens))


def _or_scatter(vals: np.ndarray, idx: np.ndarray, n: int) -> np.ndarray:
    """OR-reduce vals into an n-word array by (sorted) word index —
    bitwise_or.reduceat beats np.bitwise_or.at by ~50×.  Groups are
    restricted to boundaries that start in range — clamping out-of-range
    boundaries instead would shift the LAST real group's end and silently
    drop the final entry."""
    w = np.zeros(n, np.uint64)
    if vals.size == 0:
        return w
    b = np.searchsorted(idx, np.arange(n))
    valid = b < vals.size
    bv = b[valid]
    r = np.bitwise_or.reduceat(vals, bv)
    bbv = np.append(bv, vals.size)
    r[bbv[1:] == bbv[:-1]] = 0                  # reduceat empty-group quirk
    w[valid] = r
    return w


def _pack_entropy(codes: list, lens: list) -> bytes:
    """Vectorized MSB-first packing of a whole entropy stream: cumsum bit
    offsets, per-entry word placement with spill, OR-reduction into 64-bit
    words, then byte stuffing (0xFF→0xFF00) and the 1-bit flush padding —
    all C-level."""
    c = np.asarray(codes, dtype=np.uint64)
    ln = np.asarray(lens, dtype=np.uint64)
    keep = ln > 0
    c = c[keep]
    ln = ln[keep]
    if c.size == 0:
        return b""
    ends = np.cumsum(ln)
    total = int(ends[-1])
    offs = ends - ln
    pad = (-total) % 8
    if pad:                                     # flush pads with 1-bits
        c = np.append(c, np.uint64((1 << pad) - 1))
        ln = np.append(ln, np.uint64(pad))
        offs = np.append(offs, np.uint64(total))
        total += pad
    nwords = total // 64 + 1
    one = np.uint64(1)
    aligned = (c & ((one << ln) - one)) << (np.uint64(64) - ln)
    word = (offs >> np.uint64(6)).astype(np.int64)
    shift = offs & np.uint64(63)
    w = _or_scatter(aligned >> shift, word, nwords)
    ovf = (shift + ln) > np.uint64(64)          # entry straddles two words
    if ovf.any():
        w |= _or_scatter(aligned[ovf] << (np.uint64(64) - shift[ovf]),
                         word[ovf] + 1, nwords)
    data = w.astype(">u8").tobytes()[: total // 8]
    return data.replace(b"\xff", b"\xff\x00")


def _dht_segment(cls: int, ident: int, bits, vals) -> bytes:
    body = bytes([(cls << 4) | ident]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """Baseline JFIF encode: grayscale (1 component) or RGB YCbCr — 4:4:4
    by default, 4:2:0 (luma 2×2, box-filtered chroma) with subsample=True."""
    a = np.ascontiguousarray(img)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    if gray:
        planes = [a.astype(np.float64)]
        subsample = False
    else:
        rgb = a[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even then 2×2 box filter the chroma planes
            he, we = h + (h & 1), w + (w & 1)
            def down(p):
                q = np.empty((he, we))
                q[:h, :w] = p
                q[h:, :w] = p[h - 1:, :]
                q[:, w:] = q[:, w - 1:w]
                return q.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            planes = [y, down(cb), down(cr)]
        else:
            planes = [y, cb, cr]

    dc_l = _huff_codes(BITS_DC_LUMA, VALS_DC_LUMA)
    ac_l = _huff_codes(BITS_AC_LUMA, VALS_AC_LUMA)
    dc_c = _huff_codes(BITS_DC_CHROMA, VALS_DC_CHROMA)
    ac_c = _huff_codes(BITS_AC_CHROMA, VALS_AC_CHROMA)

    out = bytearray(b"\xff\xd8")                                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qt_l[ZIGZAG].tolist())
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qt_c[ZIGZAG].tolist())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = 0x22 if (subsample and ci == 0) else 0x11
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof       # SOF0
    out += _dht_segment(0, 0, BITS_DC_LUMA, VALS_DC_LUMA)
    out += _dht_segment(1, 0, BITS_AC_LUMA, VALS_AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, BITS_DC_CHROMA, VALS_DC_CHROMA)
        out += _dht_segment(1, 1, BITS_AC_CHROMA, VALS_AC_CHROMA)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos       # SOS

    # interleaved MCU order: one block per component per MCU for 4:4:4,
    # 4 luma + 1 cb + 1 cr for 4:2:0
    comp_zz, comp_dims = [], []
    for ci, plane in enumerate(planes):
        if subsample and ci == 0:
            # pad luma so the block grid is even (MCUs are 2×2 luma blocks)
            ph, pw = plane.shape
            eh, ew = -(-ph // 16) * 16, -(-pw // 16) * 16
            pad = np.empty((eh, ew))
            pad[:ph, :pw] = plane
            pad[ph:, :pw] = plane[ph - 1:, :]
            pad[:, pw:] = pad[:, pw - 1:pw]
            plane = pad
        blocks, bh, bw_n = _to_blocks(plane - 128.0)
        coef = _fdct_blocks(blocks)
        qt = qt_l if ci == 0 else qt_c
        q = np.round(coef.reshape(-1, 64) / qt[None, :].astype(np.float64))
        comp_zz.append(q[:, ZIGZAG].astype(np.int64))
        comp_dims.append((bh, bw_n))
    if subsample and not gray:
        # reorder luma blocks into MCU emission order so the streaming
        # entropy state reads them sequentially
        ybh, ybw = comp_dims[0]
        mcuy, mcux = ybh // 2, ybw // 2
        my, mx = np.divmod(np.arange(mcuy * mcux), mcux)
        order = np.concatenate([((my * 2 + by) * ybw + mx * 2 + bx)[:, None]
                                for by, bx in ((0, 0), (0, 1), (1, 0), (1, 1))],
                               axis=1).ravel()
        comp_zz[0] = comp_zz[0][order]
    # global block emission sequence per component (interleaved MCU order),
    # then ONE vectorized symbol pass + stable key sort + bulk bit-pack
    if gray:
        bseqs = [np.arange(comp_zz[0].shape[0], dtype=np.int64)]
    elif not subsample:
        nb = comp_zz[0].shape[0]
        bseqs = [np.arange(nb, dtype=np.int64) * 3 + ci for ci in range(3)]
    else:
        ny = comp_zz[0].shape[0]
        ar = np.arange(ny, dtype=np.int64)
        nc = comp_zz[1].shape[0]
        arc = np.arange(nc, dtype=np.int64)
        bseqs = [(ar // 4) * 6 + ar % 4, arc * 6 + 4, arc * 6 + 5]
    keys = []
    cods = []
    lns = []
    for ci in range(ncomp):
        k, c, l = _entropy_symbols(comp_zz[ci], bseqs[ci],
                                   dc_l if ci == 0 else dc_c,
                                   ac_l if ci == 0 else ac_c)
        keys.append(k)
        cods.append(c)
        lns.append(l)
    order = np.argsort(np.concatenate(keys), kind="stable")
    out += _pack_entropy(np.concatenate(cods)[order],
                         np.concatenate(lns)[order])
    out += b"\xff\xd9"                                               # EOI
    return bytes(out)


# ---------- decoder ----------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JFIF decode → (h, w) or (h, w, 3) uint8.
    Supports 1 or 3 components with sampling 1×1 per component (4:4:4) or
    luma 2×2 with 1×1 chroma (4:2:0), DRI restart intervals."""
    assert data[:2] == b"\xff\xd8", "not a JPEG (SOI missing)"
    pos = 2
    qts: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps: list = []
    h = w = 0
    restart_interval = 0
    progressive = False
    while pos < len(data):
        assert data[pos] == 0xFF, "marker expected"
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:       # EOI carries no length field; reached only
            break                # on truncated / scan-less streams
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                       # DQT
            o = 0
            while o < len(body):
                pq = body[o] >> 4
                tq = body[o] & 0xF
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, o + 1).astype(np.int32)
                    o += 65
                else:
                    tbl = np.frombuffer(body, ">u2", 64, o + 1).astype(np.int32)
                    o += 129
                qts[tq] = tbl                    # kept in zigzag order
        elif marker == 0xC4:                     # DHT
            o = 0
            while o < len(body):
                tc = body[o] >> 4
                th = body[o] & 0xF
                bits = list(body[o + 1:o + 17])
                nv = sum(bits)
                vals = list(body[o + 17:o + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decoder(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline/ext seq)
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker == 0xC2:                     # SOF2 (progressive DCT)
            progressive = True
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]
                c["bh"] = mcuy * c["v"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
                # non-interleaved (single-component scan) block grid
                comp_w = -(-(w * c["h"]) // hmax)
                comp_h = -(-(h * c["v"]) // vmax)
                c["cw"] = -(-comp_w // 8)
                c["ch"] = -(-comp_h // 8)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("unsupported JPEG coding process")
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                     # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si:3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"] = tt >> 4
                comp["ta"] = tt & 0xF
                scan.append(comp)
            if not progressive:
                return _decode_scan(data, pos, scan, qts, huff_dc, huff_ac,
                                    h, w, restart_interval)
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos, scan, huff_dc, huff_ac, restart_interval,
                ss, se, a >> 4, a & 0xF)
        elif marker == 0xD9:
            break
    if progressive and comps and "coef" in comps[0]:
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        return _reconstruct(comps, qts, h, w, hmax, vmax)
    raise ValueError("no scan data found")


def _decode_progressive_scan(data, pos, scan, huff_dc, huff_ac,
                             restart_interval, ss, se, ah, al):
    """One progressive scan (T.81 G.2): spectral selection [ss, se] at
    successive-approximation bit position al (first pass ah=0, refinement
    ah=al+1).  Coefficients accumulate into each component's zigzag-order
    block array.  Returns the stream position of the next marker."""
    segs = _split_entropy(data, pos)
    m = _SCAN_END.search(data, pos)
    newpos = m.start() if m else len(data)
    br = _SegReader(segs[0])
    seg_i = 0
    ns = len(scan)

    if ss == 0:                                # DC scan (may be interleaved)
        assert se == 0, "DC scan must have Se=0"
        for c in scan:
            c["pred"] = 0
        if ns > 1:
            hmax = max(c["h"] for c in scan)
            units = []                         # (comp, block_index) per MCU
            mcux = scan[0]["bw"] // scan[0]["h"]
            nmcu = mcux * (scan[0]["bh"] // scan[0]["v"])
            unit_iter = range(nmcu)
        else:
            c = scan[0]
            unit_iter = range(c["cw"] * c["ch"])
        for u in unit_iter:
            if restart_interval and u and u % restart_interval == 0:
                seg_i += 1
                br = _SegReader(segs[seg_i])
                for c in scan:
                    c["pred"] = 0
            if ns > 1:
                my, mx = divmod(u, mcux)
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                            _dc_unit(br, c, bi, huff_dc, ah, al)
            else:
                c = scan[0]
                row, col = divmod(u, c["cw"])
                _dc_unit(br, c, row * c["bw"] + col, huff_dc, ah, al)
        return newpos

    assert ns == 1, "progressive AC scan must be non-interleaved"
    c = scan[0]
    act = huff_ac[c["ta"]]
    coef = c["coef"]
    eobrun = 0
    p1 = 1 << al
    nblk = c["cw"] * c["ch"]
    for u in range(nblk):
        if restart_interval and u and u % restart_interval == 0:
            seg_i += 1
            br = _SegReader(segs[seg_i])
            eobrun = 0
        row_i, col = divmod(u, c["cw"])
        blk = coef[row_i * c["bw"] + col]
        if ah == 0:                            # first pass
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_huff(br, act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:                 # EOBn
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.get(r)
                        break
                    k += 16                    # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("corrupt JPEG: AC index overrun")
                blk[k] = _extend(br.get(s), s) << al
                k += 1
        else:                                  # refinement pass (G.1.2.3)
            if eobrun > 0:
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    if v and br.get(1) and not (v & p1):
                        blk[k] = v + p1 if v >= 0 else v - p1
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_huff(br, act)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r < 15:                 # EOBn
                        eobrun = 1 << r
                        if r:
                            eobrun += br.get(r)
                        break
                else:
                    newval = p1 if br.get(1) else -p1
                while k <= se:
                    v = int(blk[k])
                    if v:
                        if br.get(1) and not (v & p1):
                            blk[k] = v + p1 if v >= 0 else v - p1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
            if eobrun:
                while k <= se:                 # trailing correction bits
                    v = int(blk[k])
                    if v and br.get(1) and not (v & p1):
                        blk[k] = v + p1 if v >= 0 else v - p1
                    k += 1
                eobrun -= 1
    return newpos


def _dc_unit(br, c, bi, huff_dc, ah, al):
    blk = c["coef"][bi]
    if ah == 0:
        s = _decode_huff(br, huff_dc[c["td"]])
        diff = _extend(br.get(s), s) if s else 0
        c["pred"] += diff
        blk[0] = c["pred"] << al
    else:
        if br.get(1):
            blk[0] = int(blk[0]) | (1 << al)


def _decode_scan(data, pos, comps, qts, huff_dc, huff_ac, h, w,
                 restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        c["pred"] = 0
        c["idxs"] = []       # flat (block*64 + zigzag_k) positions …
        c["vals"] = []       # … and their values: ONE scatter at scan end
    segs = _split_entropy(data, pos)
    dc_arrs, ac_arrs, w16a = _entry_tables(segs[0], comps, huff_dc, huff_ac)
    for c in comps:
        c["dcl"] = dc_arrs[c["td"]]
        c["acl"] = ac_arrs[c["ta"]]
    seg_i = 0
    p = 0
    try:
        for m in range(nmcu):
            if restart_interval and m and m % restart_interval == 0:
                seg_i += 1
                dc_arrs, ac_arrs, w16a = _entry_tables(segs[seg_i], comps,
                                                       huff_dc, huff_ac)
                p = 0
                for c in comps:
                    c["pred"] = 0
                    c["dcl"] = dc_arrs[c["td"]]
                    c["acl"] = ac_arrs[c["ta"]]
            my, mx = divmod(m, mcux)
            for c in comps:
                dcl = c["dcl"]
                acl = c["acl"]
                cbw = c["bw"]
                idxs = c["idxs"]
                vals = c["vals"]
                pred = c["pred"]
                for by in range(c["v"]):
                    row = (my * c["v"] + by) * cbw + mx * c["h"]
                    for bx in range(c["h"]):
                        e = dcl[p]
                        if not e:
                            raise ValueError("corrupt JPEG: bad DC code")
                        p += e >> 15
                        if e & 0x4000:          # value bits past the window
                            size = e & 0x3FFF
                            v = (w16a[p] >> (16 - size)) \
                                & ((1 << size) - 1)
                            p += size
                            pred += (v if v >= (1 << (size - 1))
                                     else v - (1 << size) + 1)
                        else:
                            pred += (e & 0x3FFF) - 4096
                        base = (row + bx) << 6
                        idxs.append(base)
                        vals.append(pred)
                        k = 1
                        while k < 64:
                            e = acl[p]
                            p += e >> 22
                            kind = (e >> 19) & 7
                            if kind == 1:
                                k += (e >> 15) & 0xF
                                if k > 63:
                                    raise ValueError(
                                        "corrupt JPEG: AC index overrun")
                                idxs.append(base + k)
                                vals.append((e & 0x7FFF) - 8192)
                                k += 1
                            elif kind == 2:     # EOB
                                break
                            elif kind == 3:     # ZRL
                                k += 16
                            elif kind == 4:     # value bits past the window
                                k += (e >> 15) & 0xF
                                if k > 63:
                                    raise ValueError(
                                        "corrupt JPEG: AC index overrun")
                                size = e & 0x7FFF
                                v = (w16a[p] >> (16 - size)) \
                                    & ((1 << size) - 1)
                                p += size
                                idxs.append(base + k)
                                vals.append(v if v >= (1 << (size - 1))
                                            else v - (1 << size) + 1)
                                k += 1
                            else:
                                raise ValueError("corrupt JPEG: bad AC code")
                c["pred"] = pred
    except IndexError:
        raise ValueError("corrupt JPEG: entropy stream overrun") from None
    for c in comps:
        c["coef"].reshape(-1)[c["idxs"]] = c["vals"]
    return _reconstruct(comps, qts, h, w, hmax, vmax)


def _reconstruct(comps, qts, h, w, hmax, vmax):
    """Dequantize + IDCT + upsample + color-convert the accumulated
    zigzag-order coefficient grids (shared by the sequential and
    progressive paths)."""
    planes = []
    for c in comps:
        qt = qts[c["tq"]].astype(np.float64)    # zigzag order
        coef = c["coef"].astype(np.float64) * qt[None, :]
        rast = np.zeros_like(coef)
        rast[:, ZIGZAG] = coef                  # de-zigzag
        blocks = _idct_blocks(rast.reshape(-1, 8, 8)) + 128.0
        bh, bw_n = c["bh"], c["bw"]
        plane = blocks.reshape(bh, bw_n, 8, 8).transpose(0, 2, 1, 3) \
                      .reshape(bh * 8, bw_n * 8)
        # upsample to full resolution if subsampled
        ry = (vmax // c["v"])
        rx = (hmax // c["h"])
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------- progressive encoder (T.81 G.1) ----------

def _bits_vals_from_lengths(lens):
    pairs = sorted((l, s) for s, l in enumerate(lens) if l)
    bits = [0] * 16
    vals = []
    for l, s in pairs:
        bits[l - 1] += 1
        vals.append(s)
    return bits, vals


def _emit_dc_first(scan_zz, al, sym, bit):
    preds = [0] * len(scan_zz)
    for bi in range(scan_zz[0].shape[0]):
        for ci, zz in enumerate(scan_zz):
            v = int(zz[bi, 0]) >> al
            diff = v - preds[ci]
            preds[ci] = v
            s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
            sym(s)
            if s:
                bit(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(scan_zz, al, bit):
    for bi in range(scan_zz[0].shape[0]):
        for zz in scan_zz:
            bit((int(zz[bi, 0]) >> al) & 1, 1)


def _emit_ac_first(zz, ss, se, al, sym, bit):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            sym(n << 4)
            if n:
                bit(eobrun - (1 << n), n)
            eobrun = 0

    for bi in range(zz.shape[0]):
        row = zz[bi]
        r = 0
        for k in range(ss, se + 1):
            v = int(row[k])
            v = (abs(v) >> al) * (1 if v >= 0 else -1)
            if v == 0:
                r += 1
                continue
            flush()
            while r > 15:
                sym(0xF0)
                r -= 16
            s = abs(v).bit_length()
            sym((r << 4) | s)
            bit(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(zz, ss, se, al, sym, bit):
    """jcphuff-style refinement emission: correction bits for already-
    significant coefficients buffer until the next symbol (or join the
    pending EOB run)."""
    eobrun = 0
    pending: list = []

    def flush():
        nonlocal eobrun, pending
        if eobrun:
            n = eobrun.bit_length() - 1
            sym(n << 4)
            if n:
                bit(eobrun - (1 << n), n)
            eobrun = 0
        for bb in pending:
            bit(bb, 1)
        pending = []

    for bi in range(zz.shape[0]):
        row = zz[bi]
        ks = list(range(ss, se + 1))
        absv = [abs(int(row[k])) >> al for k in ks]
        eob = 0
        for i, k in enumerate(ks):
            if absv[i] == 1:
                eob = k
        r = 0
        br_bits: list = []
        for i, k in enumerate(ks):
            t = absv[i]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush()
                sym(0xF0)
                r -= 16
                for bb in br_bits:
                    bit(bb, 1)
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            flush()
            sym((r << 4) | 1)
            bit(1 if int(row[k]) >= 0 else 0, 1)
            for bb in br_bits:
                bit(bb, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            pending.extend(br_bits)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """Progressive JFIF encode (SOF2): gray or RGB 4:4:4 with the standard
    libjpeg-style scan script (DC first at Al=1 + refine, spectral bands
    1-5 / 6-63 at Al=2, successive-approximation refinements down to 0).
    Per-scan optimized huffman tables (two-pass emission).  Same quantized
    coefficients as the baseline encoder — decode output is bit-identical
    to decoding the sequential stream."""
    a = np.ascontiguousarray(img)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    if gray:
        planes = [a.astype(np.float64)]
    else:
        rgb = a[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    ncomp = len(planes)
    comp_zz = []
    for ci, plane in enumerate(planes):
        blocks, bh, bw_n = _to_blocks(plane - 128.0)
        coef = _fdct_blocks(blocks)
        qt = qt_l if ci == 0 else qt_c
        q = np.round(coef.reshape(-1, 64) / qt[None, :].astype(np.float64))
        comp_zz.append(q[:, ZIGZAG].astype(np.int64))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qt_l[ZIGZAG].tolist())
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qt_c[ZIGZAG].tolist())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof       # SOF2

    # libjpeg's standard progression script
    if gray:
        script = [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    else:
        script = [([0, 1, 2], 0, 0, 0, 1),
                  ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                  ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                  ([0, 1, 2], 0, 0, 1, 0),
                  ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0)]

    for cis, ss, se, ah, al in script:
        scan_zz = [comp_zz[ci] for ci in cis]

        def run(sym, bit):
            if ss == 0 and ah == 0:
                _emit_dc_first(scan_zz, al, sym, bit)
            elif ss == 0:
                _emit_dc_refine(scan_zz, al, bit)
            elif ah == 0:
                _emit_ac_first(scan_zz[0], ss, se, al, sym, bit)
            else:
                _emit_ac_refine(scan_zz[0], ss, se, al, sym, bit)

        freq = np.zeros(256, np.int64)
        run(lambda s: freq.__setitem__(s, freq[s] + 1), lambda v, n: None)
        need_table = freq.sum() > 0
        if need_table:
            from .vp8l import _huff_lengths    # generic length-limited builder
            lens = _huff_lengths(freq, max_len=16)
            bits_l, vals_l = _bits_vals_from_lengths(lens)
            out += _dht_segment(0 if ss == 0 else 1, 0, bits_l, vals_l)
            codes = _huff_codes(bits_l, vals_l)
        bw_ = _BitWriter()
        if need_table:
            run(lambda s: bw_.put(*codes[s]), bw_.put)
        else:
            run(lambda s: None, bw_.put)
        bw_.flush()
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)
