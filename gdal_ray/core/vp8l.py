"""Real lossless WebP (VP8L) codec — pure stdlib/numpy, no libwebp.

Implements the public "WebP Lossless Bitstream Specification":
  container: RIFF/WEBP/VP8L chunk;
  header: 0x2F signature, 14-bit (w-1, h-1), alpha hint, version 0;
  encoder: SUBTRACT_GREEN only, no color cache, single huffman group —
    per-channel canonical prefix codes (simple 1/2-symbol codes or
    normal codes with RLE-coded code lengths), literal-only (no LZ77
    backreferences emitted);
  decoder: SPEC-COMPLETE for the lossless stream — literal + LZ77 +
    distance-neighbor map, color cache, meta huffman (entropy image),
    and all four transforms (predictor 0-13, cross-color,
    subtract-green, color-indexing with pixel bundling), with
    recursively-decoded transform/entropy subimage streams; so foreign
    lossless WebPs decode, not just this encoder's output.  Lossy VP8
    remains out of scope (libvpx-class machinery).

Bit order is LSB-first within bytes (spec §"RIFF header"); prefix codes
are read bit-by-bit MSB-of-code-first (spec tree-walk), so the encoder
emits each canonical code from its most-significant bit down.

The reference's webp driver (frmts/webp) delegates to libwebp; this is a
from-scratch implementation against the published spec.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# spec: order in which code-length-code lengths are stored
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# spec: 120-entry distance neighbor map (dx, dy), dy in [0, 7]
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7)]


# ---------- LSB-first bit IO ----------

class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        """Append nbits of value, LSB first."""
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int):
        """Emit a prefix code MSB-of-code first (spec tree-walk order)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def write_many(self, codes, lens):
        """Vectorized bulk append (LSB-first): cumsum bit offsets, word
        placement with spill, OR-reduction — one numpy pass instead of a
        per-symbol write() call (same design as jpeg._pack_entropy)."""
        c = np.asarray(codes, dtype=np.uint64)
        ln = np.asarray(lens, dtype=np.uint64)
        keep = ln > 0
        c = c[keep]
        ln = ln[keep]
        if c.size == 0:
            return
        if self.nbits:                          # pending bits lead the pack
            c = np.concatenate([np.array([self.acc], np.uint64), c])
            ln = np.concatenate([np.array([self.nbits], np.uint64), ln])
        ends = np.cumsum(ln)
        total = int(ends[-1])
        offs = ends - ln
        nwords = total // 64 + 1
        one = np.uint64(1)
        masked = c & ((one << ln) - one)
        word = (offs >> np.uint64(6)).astype(np.int64)
        shift = offs & np.uint64(63)
        w = _or_scatter(masked << shift, word, nwords)
        ovf = (shift + ln) > np.uint64(64)
        if ovf.any():
            w |= _or_scatter(masked[ovf] >> (np.uint64(64) - shift[ovf]),
                             word[ovf] + 1, nwords)
        data = w.astype("<u8").tobytes()
        nfull = total // 8
        self.out += data[:nfull]
        self.nbits = total % 8
        self.acc = data[nfull] & ((1 << self.nbits) - 1) if self.nbits else 0

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _or_scatter(vals: np.ndarray, idx: np.ndarray, n: int) -> np.ndarray:
    """OR-reduce vals into an n-word array by (sorted) word index.
    Groups are restricted to boundaries that start in range — clamping
    out-of-range boundaries instead would shift the LAST real group's end
    and silently drop the final entry."""
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


class _LsbReader:
    __slots__ = ("d", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.d = data + b"\x00" * 8
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            self.acc |= self.d[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def peek8(self) -> int:
        while self.nbits < 8:
            self.acc |= self.d[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        return self.acc & 0xFF

    def skip(self, n: int):
        self.acc >>= n
        self.nbits -= n


# ---------- canonical prefix codes ----------

def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (spec: deflate convention — shorter codes
    first, ties by symbol order).  {symbol: (code, length)}."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _TreeDecoder:
    """Bit-by-bit canonical prefix decode (mincode/maxcode walk)."""

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        self.single = None
        maxlen = max(l for l, _ in nz)
        self.mincode = [0] * (maxlen + 1)
        self.maxcode = [-1] * (maxlen + 1)
        self.vals: list[list[int]] = [[] for _ in range(maxlen + 1)]
        # 8-bit fast LUT over the RAW stream window: codes arrive MSB-of-
        # code-first but the stream is LSB-first, so the key is the code's
        # bit-reversal in the window's low bits
        self.lut: list = [None] * 256
        self._codes: list = []            # (length, symbol, code)
        self._full = None
        code = 0
        prev_len = 0
        for l, s in sorted(nz):
            code <<= (l - prev_len)
            if not self.vals[l]:
                self.mincode[l] = code
            self.vals[l].append(s)
            self.maxcode[l] = code
            self._codes.append((l, s, code))
            if l <= 8:
                rev = int(f"{code:0{l}b}"[::-1], 2)
                for hi in range(1 << (8 - l)):
                    self.lut[rev | (hi << l)] = (s, l)
            code += 1
            prev_len = l
        self.maxlen = maxlen

    def fulllut(self) -> np.ndarray:
        """Full-depth numpy LUT over the low ``maxlen`` bits of the raw
        LSB-first window: entry = (symbol << 5) | code_length, 0 = invalid.
        Built lazily (only the positional fast path needs it)."""
        if self._full is None:
            arr = np.zeros(1 << self.maxlen, dtype=np.int32)
            ls = np.array([c[0] for c in self._codes], np.int64)
            ss = np.array([c[1] for c in self._codes], np.int64)
            v = np.array([c[2] for c in self._codes], np.int64)
            # vectorized <=16-bit reversal, one bulk scatter per length
            v = ((v & 0x5555) << 1) | ((v >> 1) & 0x5555)
            v = ((v & 0x3333) << 2) | ((v >> 2) & 0x3333)
            v = ((v & 0x0F0F) << 4) | ((v >> 4) & 0x0F0F)
            v = ((v & 0x00FF) << 8) | ((v >> 8) & 0x00FF)
            ents = ((ss << 5) | ls).astype(np.int32)
            for l in np.unique(ls):
                m = ls == l
                revs = v[m] >> (16 - l)
                k = np.arange(1 << (self.maxlen - int(l)),
                              dtype=np.int64) << l
                arr[revs[None, :] + k[:, None]] = ents[m]
            self._full = arr
        return self._full

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        e = self.lut[br.peek8()]
        if e is not None:
            br.skip(e[1])
            return e[0]
        code = 0
        for l in range(1, self.maxlen + 1):
            code = (code << 1) | br.read(1)
            if l > 8 and self.vals[l] and code <= self.maxcode[l]:
                return self.vals[l][code - self.mincode[l]]
        raise ValueError("corrupt VP8L: prefix code overrun")


def _huff_lengths(freqs: np.ndarray, max_len: int = 15) -> list[int]:
    """Huffman code lengths from frequencies, limited to max_len (deflate-
    style overflow redistribution)."""
    syms = np.nonzero(freqs)[0]
    if len(syms) == 0:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[int(syms[0])] = 1
        return out
    heap = [(int(freqs[s]), int(s), int(s)) for s in syms]
    heapq.heapify(heap)
    parent: dict = {}
    nxt = len(freqs)
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        parent[n1] = nxt
        parent[n2] = nxt
        heapq.heappush(heap, (f1 + f2, nxt, nxt))
        nxt += 1
    depths = [0] * len(freqs)
    for s in syms:
        d = 0
        n = int(s)
        while n in parent:
            n = parent[n]
            d += 1
        depths[int(s)] = d
    # length-limit: clamp overlong codes to max_len, then restore the Kraft
    # inequality (Σ 2^-d ≤ 1, integer arithmetic in units of 2^-max_len) by
    # deepening the deepest still-extendable codes
    if max(depths) > max_len:
        depths = [min(d, max_len) if d else 0 for d in depths]
        K = sum(1 << (max_len - d) for d in depths if d)
        full = 1 << max_len
        while K > full:
            d_i = max(((d, i) for i, d in enumerate(depths)
                       if 0 < d < max_len))
            depths[d_i[1]] += 1
            K -= 1 << (max_len - d_i[0] - 1)
    return depths


# ---------- prefix-code (de)serialization ----------

def _write_code(bw: _LsbWriter, lengths: list[int]):
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) <= 2 and (not nz or max(nz) <= 255):
        bw.write(1, 1)                        # simple code
        n = max(1, len(nz))
        syms = nz if nz else [0]
        bw.write(n - 1, 1)
        if syms[0] <= 1 and n == 1:
            bw.write(0, 1)                    # first symbol in 1 bit
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        if n == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)                            # normal code
    # code-length code over the RLE alphabet {0..18}
    rle: list[tuple[int, int]] = []           # (symbol, extra)
    i = 0
    L = lengths
    while i < len(L):
        if L[i] == 0:
            run = 1
            while i + run < len(L) and L[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                r = min(run, 138)
                rle.append((18, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                rle.append((17, r - 3))
                run -= r
            for _ in range(run):
                rle.append((0, 0))
        else:
            v = L[i]
            rle.append((v, 0))
            i += 1
            run = 0
            while i < len(L) and L[i] == v:
                run += 1
                i += 1
            while run >= 3:
                r = min(run, 6)
                rle.append((16, r - 3))
                run -= r
            for _ in range(run):
                rle.append((v, 0))
    clc_freq = np.zeros(19, np.int64)
    for s, _ in rle:
        clc_freq[s] += 1
    clc_len = _huff_lengths(clc_freq, max_len=7)
    # number of CLC lengths to store (trailing zeros in _CLC_ORDER skipped)
    stored = 19
    while stored > 4 and clc_len[_CLC_ORDER[stored - 1]] == 0:
        stored -= 1
    bw.write(stored - 4, 4)
    for k in range(stored):
        bw.write(clc_len[_CLC_ORDER[k]], 3)
    bw.write(0, 1)                            # no max-symbol shortcut
    clc_codes = _canonical_codes(clc_len)
    for s, extra in rle:
        c, l = clc_codes[s]
        bw.write_code(c, l)
        if s == 16:
            bw.write(extra, 2)
        elif s == 17:
            bw.write(extra, 3)
        elif s == 18:
            bw.write(extra, 7)


def _read_code(br: _LsbReader, alphabet_size: int) -> _TreeDecoder:
    if br.read(1):                            # simple code
        n = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if n == 1:
            lengths[sym0] = 1
            dec = _TreeDecoder(lengths)
            dec.single = sym0
            return dec
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _TreeDecoder(lengths)
    stored = br.read(4) + 4
    clc_len = [0] * 19
    for k in range(stored):
        clc_len[_CLC_ORDER[k]] = br.read(3)
    clc = _TreeDecoder(clc_len)
    if br.read(1):                            # max-symbol shortcut present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return _TreeDecoder(lengths)


# ---------- encode ----------

def encode_vp8l(img: np.ndarray, predictor: bool = False,
                palette: bool | str = "auto",
                color: bool = False) -> bytes:
    """Lossless WebP of an (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA
    uint8 image — literal-only VP8L, one huffman group per channel.

    ``predictor=True`` additionally applies the spec's spatial-prediction
    transform (type 0) with per-16×16-tile mode selection before
    SUBTRACT_GREEN.  Mode choice is restricted to the L-independent
    predictors {0, 2, 3, 4, 8, 9} so the decoder's row-vectorized inverse
    stays on its fast path.

    ``palette`` selects the COLOR_INDEXING transform (type 3): palette +
    pixel-bundled indices (up to 8 px/byte) — the big win for low-color
    map tiles.  ``"auto"`` (default) uses it for genuinely multi-channel
    images with ≤ 256 distinct colors (gray images gain nothing —
    SUBTRACT_GREEN already collapses them to one coded channel);
    ``True`` forces it for any ≤ 256-color image; ``False`` disables.

    ``color=True`` adds the CROSS-COLOR transform (type 1), fitted per
    tile; most effective combined with ``predictor=True`` (residual
    domain — fixture RGB drops to ~56% of plain).  The transforms stay
    OFF by default because inverse-transform CPU outweighs the byte
    savings on a single node; on a bandwidth-bound multi-node cluster
    the trade flips — flip the flags at the catalog sink, not here."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    h, w = a.shape[:2]
    if a.shape[2] == 3:
        alpha = np.full((h, w), 255, np.uint8)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    else:
        r, g, b, alpha = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
    bw = _LsbWriter()
    bw.write(0x2F, 8)                         # VP8L signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (alpha != 255).any() else 0, 1)
    bw.write(0, 3)                            # version
    if palette:
        # palette pays when the image is genuinely multi-channel (a gray
        # image already collapses to one coded channel via SUBTRACT_GREEN)
        # and low-color; a 4k-pixel sampled unique() pre-check keeps the
        # continuous-tone fast path from paying a full-image unique()
        packed = ((alpha.astype(np.uint32) << 24)
                  | (r.astype(np.uint32) << 16)
                  | (g.astype(np.uint32) << 8) | b.astype(np.uint32))
        flat = packed.ravel()
        sample = flat[::max(1, flat.size // 4096)]
        if np.unique(sample).size <= 256:
            colors, inverse = np.unique(flat, return_inverse=True)
            cr = (colors >> 16) & 0xFF
            cg = (colors >> 8) & 0xFF
            cb = colors & 0xFF
            grayish = bool(((cr == cg) & (cg == cb)).all())
            if colors.size <= 256 and (palette is True or not grayish):
                return _encode_vp8l_palette(bw, colors,
                                            inverse.reshape(h, w), w, h)
    if predictor:
        # PREDICTOR transform (spec type 0): stream lists it BEFORE
        # SUBTRACT_GREEN so the decoder inverts sub-green first, then
        # prediction — i.e. encode applies prediction first
        bits = 4
        r, g, b, alpha, pimg = _apply_predictor(r, g, b, alpha, bits)
        bw.write(1, 1)
        bw.write(0, 2)                        # type 0 = predictor
        bw.write(bits - 2, 3)
        _write_literal_stream(bw, pimg[:, :, 0], pimg[:, :, 1],
                              pimg[:, :, 2], pimg[:, :, 3], level0=False)
    if color and not (np.array_equal(r, g) and np.array_equal(g, b)):
        # CROSS-COLOR transform (spec type 1), fitted per tile; skipped
        # when the fit is all-zero (nothing to gain, save the header)
        cbits = 4
        r_enc, b_enc, cimg, used = _apply_color(r, g, b, cbits)
        if used:
            r, b = r_enc, b_enc
            bw.write(1, 1)
            bw.write(1, 2)                    # type 1 = cross-color
            bw.write(cbits - 2, 3)
            _write_literal_stream(bw, cimg[:, :, 0], cimg[:, :, 1],
                                  cimg[:, :, 2], cimg[:, :, 3],
                                  level0=False)
    # SUBTRACT_GREEN transform (spec type 2, no payload): gray images then
    # spend ZERO bits on the r/b channels (single-symbol codes)
    bw.write(1, 1)
    bw.write(2, 2)
    bw.write(0, 1)                            # no more transforms
    r = (r.astype(np.int16) - g.astype(np.int16)).astype(np.uint8)
    b = (b.astype(np.int16) - g.astype(np.int16)).astype(np.uint8)
    _write_literal_stream(bw, r, g, b, alpha, level0=True, rle=True)
    payload = bw.flush()
    if len(payload) % 2:
        payload += b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_vp8l_palette(bw: _LsbWriter, colors: np.ndarray,
                         idx: np.ndarray, w: int, h: int) -> bytes:
    """COLOR_INDEXING transform (spec type 3): component-delta-coded
    palette subimage + indices pixel-bundled into the green channel
    (8/4/2/1 px per packed pixel by palette size)."""
    psize = colors.size
    bw.write(1, 1)
    bw.write(3, 2)                            # type 3 = color indexing
    bw.write(psize - 1, 8)
    pal = np.stack([(colors >> 16) & 0xFF, (colors >> 8) & 0xFF,
                    colors & 0xFF, (colors >> 24) & 0xFF],
                   axis=1).astype(np.int32)   # r, g, b, a
    deltas = np.diff(pal, axis=0, prepend=np.zeros((1, 4), np.int32)) & 0xFF
    deltas = deltas.astype(np.uint8)[None, :, :]     # (1, psize, 4)
    _write_literal_stream(bw, deltas[:, :, 0], deltas[:, :, 1],
                          deltas[:, :, 2], deltas[:, :, 3], level0=False)
    bw.write(0, 1)                            # no more transforms
    wbits = 3 if psize <= 2 else 2 if psize <= 4 else \
        1 if psize <= 16 else 0
    xs = 1 << wbits
    bpp = 8 >> wbits
    wp = _sub_size(w, wbits)
    pad = np.zeros((h, wp * xs), idx.dtype)
    pad[:, :w] = idx
    shifts = (np.arange(xs) * bpp).astype(idx.dtype)
    packed = (pad.reshape(h, wp, xs) << shifts[None, None, :]) \
        .sum(axis=2).astype(np.uint8)
    zero = np.zeros_like(packed)
    _write_literal_stream(bw, zero, packed, zero,
                          np.full_like(packed, 255), level0=True, rle=True)
    payload = bw.flush()
    if len(payload) % 2:
        payload += b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _apply_color(r, g, b, bits: int):
    """Forward cross-color transform fitted per tile so that AFTER the
    following SUBTRACT_GREEN the residual channels concentrate near zero:
    r' target is (r−g), modelled by g2r·int8(g)>>5; b' target is (b−g),
    modelled jointly by g2b·int8(g)>>5 + r2b·int8(r)>>5 (2-var normal
    equations).  Returns (r_enc, b_enc, cimg) with the spec's element
    packing (g2r→blue, g2b→green, r2b→red)."""
    h, w = r.shape
    th, tw = _sub_size(h, bits), _sub_size(w, bits)
    gs = g.astype(np.int8).astype(np.int32)
    rs = r.astype(np.int8).astype(np.int32)
    tr = (r.astype(np.int32) - g.astype(np.int32)).astype(np.int8) \
        .astype(np.int32)
    tb = (b.astype(np.int32) - g.astype(np.int32)).astype(np.int8) \
        .astype(np.int32)

    def tile_sum(x):
        hp, wp = th << bits, tw << bits
        p = np.zeros((hp, wp), np.int64)
        p[:h, :w] = x
        return p.reshape(th, 1 << bits, tw, 1 << bits).sum(axis=(1, 3))

    # per-tile sums for the normal equations
    sgg = tile_sum(gs * gs)
    srr = tile_sum(rs * rs)
    sgr = tile_sum(gs * rs)
    sgt_r = tile_sum(gs * tr)
    sgt_b = tile_sum(gs * tb)
    srt_b = tile_sum(rs * tb)
    with np.errstate(divide="ignore", invalid="ignore"):
        g2r = np.where(sgg > 0, np.round(32.0 * sgt_r / np.maximum(sgg, 1)),
                       0)
        det = sgg * srr - sgr * sgr
        g2b = np.where(det != 0, np.round(
            32.0 * (srr * sgt_b - sgr * srt_b) / np.where(det == 0, 1, det)),
            0)
        r2b = np.where(det != 0, np.round(
            32.0 * (sgg * srt_b - sgr * sgt_b) / np.where(det == 0, 1, det)),
            0)
    g2r = np.clip(g2r, -128, 127).astype(np.int32)
    g2b = np.clip(g2b, -128, 127).astype(np.int32)
    r2b = np.clip(r2b, -128, 127).astype(np.int32)
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    ix = np.ix_(ys, xs)
    d_r = (g2r[ix] * gs) >> 5
    r_enc = (r.astype(np.int32) - d_r) & 0xFF
    d_b = ((g2b[ix] * gs) >> 5) + ((r2b[ix] * rs) >> 5)
    b_enc = (b.astype(np.int32) - d_b) & 0xFF
    cimg = np.zeros((th, tw, 4), np.uint8)
    cimg[:, :, 0] = (r2b & 0xFF).astype(np.uint8)
    cimg[:, :, 1] = (g2b & 0xFF).astype(np.uint8)
    cimg[:, :, 2] = (g2r & 0xFF).astype(np.uint8)
    cimg[:, :, 3] = 255
    used = bool(g2r.any() or g2b.any() or r2b.any())
    return r_enc.astype(np.uint8), b_enc.astype(np.uint8), cimg, used


def _apply_predictor(r, g, b, alpha, bits: int):
    """Forward spatial prediction: per-tile best mode among the
    L-independent predictors, residuals mod 256.  Predictions come from the
    ORIGINAL pixels (lossless coding ⇒ decoded neighbours == originals),
    with the spec's fixed edge rules: (0,0)←black, row 0←L, column 0←T,
    and TR of the rightmost column wraps to the current row's first pixel.
    Returns residual channels + the ARGB predictor image (mode in green)."""
    h, w = r.shape
    px = np.stack([r, g, b, alpha], axis=-1).astype(np.int32)   # rgba
    T = np.empty_like(px)
    T[1:] = px[:-1]
    T[0] = 0
    TL = np.empty_like(px)
    TL[:, 1:] = T[:, :-1]
    TL[:, 0] = 0
    TR = np.empty_like(px)
    TR[:, :-1] = T[:, 1:]
    TR[1:, -1] = px[1:, 0]                    # contiguous-memory wrap rule
    TR[0, -1] = 0
    black = np.array([0, 0, 0, 255], np.int32)
    cands = {0: np.broadcast_to(black, px.shape),
             2: T, 3: TR, 4: TL,
             8: (TL + T) >> 1, 9: (T + TR) >> 1}
    th, tw = _sub_size(h, bits), _sub_size(w, bits)
    hp, wp = th << bits, tw << bits
    costs = np.empty((len(cands), th, tw), np.int64)
    modes_list = sorted(cands)
    for mi, mode in enumerate(modes_list):
        res = (px - cands[mode]) & 0xFF
        c = np.minimum(res, 256 - res).sum(axis=2)
        cp = np.zeros((hp, wp), np.int64)
        cp[:h, :w] = c
        costs[mi] = cp.reshape(th, 1 << bits, tw, 1 << bits).sum(axis=(1, 3))
    best = np.argmin(costs, axis=0)           # (th, tw) index into modes_list
    mode_arr = np.asarray(modes_list, np.int32)[best]
    pred = np.empty_like(px)
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    tile_mode = mode_arr[np.ix_(ys, xs)]      # (h, w)
    for mode in modes_list:
        m = tile_mode == mode
        pred[m] = cands[mode][m]
    # fixed edge rules override tile modes
    pred[0, 0] = black
    if w > 1:
        pred[0, 1:] = px[0, :-1]              # row 0: L
    if h > 1:
        pred[1:, 0] = px[:-1, 0]              # column 0: T
    res = ((px - pred) & 0xFF).astype(np.uint8)
    pimg = np.zeros((th, tw, 4), np.uint8)
    pimg[:, :, 1] = mode_arr.astype(np.uint8)
    pimg[:, :, 3] = 255
    return (res[:, :, 0], res[:, :, 1], res[:, :, 2], res[:, :, 3], pimg)


def _mask_runs(eq: np.ndarray, min_run: int):
    """Maximal True-stretches of eq (≥ min_run), split at the spec's 4096
    length cap.  Returns (starts, lengths, covered_mask)."""
    n = eq.size
    d = np.diff(eq.astype(np.int8), prepend=0, append=0)
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]
    lens = ends - starts
    keep = lens >= min_run
    starts, lens = starts[keep], lens[keep]
    if lens.size and lens.max() > 4096:
        ns, nl = [], []
        for s, ln in zip(starts.tolist(), lens.tolist()):
            while ln > 4096:
                ns.append(s)
                nl.append(4096)
                s += 4096
                ln -= 4096
            ns.append(s)
            nl.append(ln)
        starts = np.asarray(ns, np.int64)
        lens = np.asarray(nl, np.int64)
    covered = np.zeros(n, bool)
    if starts.size:
        marks = np.zeros(n + 1, np.int8)
        marks[starts] += 1
        marks[starts + lens] -= 1
        covered = np.cumsum(marks[:-1]) > 0
    return starts.astype(np.int64), lens.astype(np.int64), covered


def _rle_runs(r, g, b, alpha, min_run: int = 4):
    """Vectorized LZ77 run detection at the two distances the neighbor
    map makes free: distance 1 (previous pixel) and distance w (pixel
    above) — all four channels, row-major.  d=1 runs take priority; d=w
    runs are detected over the remaining pixels.  Returns per-distance
    (starts, lengths) plus the union coverage mask."""
    w = r.shape[1]
    rf, gf, bf, af = (x.ravel() for x in (r, g, b, alpha))
    n = rf.size
    eq1 = np.zeros(n, bool)
    eq1[1:] = ((rf[1:] == rf[:-1]) & (gf[1:] == gf[:-1])
               & (bf[1:] == bf[:-1]) & (af[1:] == af[:-1]))
    s1, l1, cov = _mask_runs(eq1, min_run)
    eqw = np.zeros(n, bool)
    if n > w:
        eqw[w:] = ((rf[w:] == rf[:-w]) & (gf[w:] == gf[:-w])
                   & (bf[w:] == bf[:-w]) & (af[w:] == af[:-w]))
    eqw &= ~cov
    sw, lw, covw = _mask_runs(eqw, min_run)
    return s1, l1, sw, lw, cov | covw


def _lit_cost_luts(g, r, b, alpha) -> np.ndarray:
    """Per-pixel literal bit-cost estimate: Huffman code lengths fitted to
    each FULL channel histogram (exact lengths, not entropy — a 2-symbol
    channel at p=0.999 has entropy 0.01 but still costs 1 bit per literal;
    single-symbol channels cost 0).  Returns the flat per-pixel cost sum
    across the four channels."""
    total = np.zeros(r.size, np.int64)
    for arr in (g, r, b, alpha):
        fq = np.bincount(arr.ravel(), minlength=256).astype(np.int64)
        if np.count_nonzero(fq) <= 1:
            continue
        lut = np.asarray(_huff_lengths(fq), np.int64)[:256]
        total += lut[arr.ravel()]
    return total


def _lz77_matches(seq: np.ndarray, covered: np.ndarray,
                  min_len: int = 4, max_len: int = 4096,
                  max_dist: int = 1048456):
    """General LZ77 matching (any distance), vectorized: candidates are
    the NEAREST previous position with the same 2-pixel hash (one stable
    argsort over splitmix-style hashes), filtered by an exact ``min_len``
    prefix compare (kills hash collisions); greedy left-to-right selection
    with chunked vectorized length extension, so the Python loop cost is
    per SELECTED match, not per pixel.  Matches never start on / extend
    into ``covered`` pixels (the distance-1/distance-w run passes own
    those).  Returns (starts, lengths, distances)."""
    z = (np.zeros(0, np.int64),) * 3
    n = seq.size
    if n < min_len + 1:
        return z
    s64 = seq.astype(np.uint64)
    h = ((s64[:-1] * np.uint64(0x9E3779B97F4A7C15))
         ^ (s64[1:] * np.uint64(0xC2B2AE3D27D4EB4F)))
    order = np.argsort(h, kind="stable")
    oh = h[order]
    same = np.zeros(order.size, bool)
    same[1:] = oh[1:] == oh[:-1]
    prev = np.full(n - 1, -1, np.int64)
    prev[order[same]] = order[np.flatnonzero(same) - 1]
    cand = np.flatnonzero(prev >= 0)
    d = cand - prev[cand]
    keep = d <= max_dist
    cand, d = cand[keep], d[keep]
    if covered.any():
        m = ~covered[cand]
        cand, d = cand[m], d[m]
    keep = cand + min_len <= n
    cand, d = cand[keep], d[keep]
    if not cand.size:
        return z
    ok = np.ones(cand.size, bool)
    for j in range(min_len):
        ok &= seq[cand + j] == seq[cand - d + j]
    cand, d = cand[ok], d[ok]
    if not cand.size:
        return z
    covpos = np.flatnonzero(covered)
    if covpos.size:
        nx = np.searchsorted(covpos, cand)
        barrier = np.where(nx < covpos.size,
                           covpos[np.minimum(nx, covpos.size - 1)], n)
    else:
        barrier = np.full(cand.size, n, np.int64)
    starts, lens, dists = [], [], []
    pos = 0
    for j in range(cand.size):
        i = int(cand[j])
        if i < pos:
            continue
        dd = int(d[j])
        lim = min(int(barrier[j]), i + max_len, n) - i
        L, chunk = 0, 64
        while L < lim:
            c = min(chunk, lim - L)
            neq = seq[i + L:i + L + c] != seq[i - dd + L:i - dd + L + c]
            if neq.any():
                L += int(np.argmax(neq))
                break
            L += c
            chunk = min(chunk * 4, max_len)
        if L >= min_len:
            starts.append(i)
            lens.append(L)
            dists.append(dd)
            pos = i + L
    if not starts:
        return z
    return (np.asarray(starts, np.int64), np.asarray(lens, np.int64),
            np.asarray(dists, np.int64))


def _dcode_plane(w: int) -> np.ndarray:
    """distance → neighbor-map code (1..120) lookup plane for width w
    (0 where the distance has no map entry)."""
    plane = np.zeros(8 * w + 16, np.int64)
    for k, (dx, dy) in enumerate(_DIST_MAP):
        dv = dy * w + dx
        if 1 <= dv < plane.size and plane[dv] == 0:
            plane[dv] = k + 1
    return plane


def _map_dcodes(d: np.ndarray, w: int) -> np.ndarray:
    """Distance → distance code: neighbor-map code (1..120) when the
    distance equals some dy*w+dx of the spec map, else d + 120."""
    plane = _dcode_plane(w)
    idx = np.minimum(d, plane.size - 1)
    mapped = plane[idx]
    return np.where((d < plane.size) & (mapped > 0), mapped, d + 120)


def _lz_prefix(values: np.ndarray):
    """Inverse of _lz_value, vectorized: value → (prefix, extra, nbits)."""
    u = values - 1
    small = u < 4
    eb = np.maximum(_bitlen_u(u) - 2, 0)
    top2 = u >> eb
    prefix = np.where(small, u, 2 * eb + 2 + (top2 - 2))
    extra = np.where(small, 0, u - (top2 << eb))
    nbits = np.where(small, 0, eb)
    return prefix.astype(np.int64), extra.astype(np.int64), \
        nbits.astype(np.int64)


def _bitlen_u(x: np.ndarray) -> np.ndarray:
    _, e = np.frexp(np.maximum(x, 0).astype(np.float64))
    return e.astype(np.int64)


def _write_literal_stream(bw: _LsbWriter, r, g, b, alpha, level0=False,
                          rle=False):
    """Emit one image stream (no cache, single group).  Pixels are
    literals, plus — when ``rle`` — distance-1 LZ77 backreferences for
    runs of identical pixels (vectorized run detection; when no runs
    exist the output is byte-identical to the literal-only stream).
    Only a level-0 (ARGB) stream carries the meta-huffman bit — subimage
    streams (transform data / entropy image / palette) must omit it."""
    bw.write(0, 1)                            # no color cache
    if level0:
        bw.write(0, 1)                        # no meta huffman image
    wimg = r.shape[1]
    if rle:
        s1, l1, sw, lw, covered = _rle_runs(r, g, b, alpha)
        # general LZ77 pass over the remaining gaps (any distance: repeated
        # tiles/patterns the two free distances cannot reach)
        seq = ((alpha.ravel().astype(np.uint32) << 24)
               | (r.ravel().astype(np.uint32) << 16)
               | (g.ravel().astype(np.uint32) << 8)
               | b.ravel().astype(np.uint32))
        sg, lg, dg = _lz77_matches(seq, covered)
        if sg.size:
            marks = np.zeros(seq.size + 1, np.int8)
            marks[sg] += 1
            marks[sg + lg] -= 1
            covered |= np.cumsum(marks[:-1]) > 0
    else:
        s1 = l1 = sw = lw = sg = lg = dg = np.zeros(0, np.int64)
        covered = np.zeros(r.size, bool)
    nruns = s1.size + sw.size + sg.size
    lit = ~covered
    # combined backref tables: starts, length-prefix decomposition, and
    # the distance-code decomposition (d=1 → neighbor-map code 2 →
    # prefix 1; d=w → code 1 → prefix 0; general → _map_dcodes)
    starts = np.concatenate([s1, sw, sg])
    lengths = np.concatenate([l1, lw, lg])
    lp, lex, lnb = (_lz_prefix(lengths) if starts.size
                    else (np.zeros(0, np.int64),) * 3)
    dcodes = np.concatenate([np.full(s1.size, 2, np.int64),
                             np.ones(sw.size, np.int64),
                             _map_dcodes(dg, wimg) if sg.size
                             else np.zeros(0, np.int64)])
    dp, dex, dnb = (_lz_prefix(dcodes) if starts.size
                    else (np.zeros(0, np.int64),) * 3)

    def _green_dist_freqs(lit, lp, dp, nruns):
        gfreq = np.zeros(280, np.int64)
        bc = np.bincount(g.ravel()[lit], minlength=256)
        gfreq[:len(bc)] = bc
        if nruns:
            gfreq[256:280] += np.bincount(lp, minlength=24)
        dfreq = np.zeros(40, np.int64)
        if nruns:
            dfreq[:40] = np.bincount(dp, minlength=40)
        else:
            dfreq[0] = 1                      # unused distance code
        return gfreq, dfreq

    glens_c = dlens_c = None                  # pass-1 trees, reusable on keep-all
    if nruns:
        # exact-cost backref-vs-literal decision (two-pass): price every
        # selected backref with its REAL pass-1 prefix code lengths + extra
        # bits against the full-histogram Huffman cost of the literals it
        # covers, drop the losers, rebuild.  At 0.5-1 bit/px post-predictor
        # residuals a 4-px run costing ~6-10 bits is a LOSS the
        # take-anything-≥4 greedy kept; on backref-dominated streams the
        # prefixes huffman down to 1-3 bits and stay profitable — only the
        # real trees can price both regimes.
        gfreq, dfreq = _green_dist_freqs(lit, lp, dp, nruns)
        glens_c = _huff_lengths(gfreq)
        dlens_c = _huff_lengths(dfreq)
        glens = np.asarray(glens_c, np.int64)
        dlens = np.asarray(dlens_c, np.int64)
        if np.count_nonzero(dlens) == 1:
            dlens = np.zeros_like(dlens)      # 1-symbol code reads 0 bits
        cs = np.concatenate([[0], np.cumsum(_lit_cost_luts(g, r, b, alpha))])
        litcost = cs[starts + lengths] - cs[starts]
        keep = glens[256 + lp] + lnb + dlens[dp] + dnb < litcost
        if not keep.all():
            starts, lengths, dcodes = starts[keep], lengths[keep], dcodes[keep]
            nruns = starts.size
            lp, lex, lnb = (_lz_prefix(lengths) if nruns
                            else (np.zeros(0, np.int64),) * 3)
            dp, dex, dnb = (_lz_prefix(dcodes) if nruns
                            else (np.zeros(0, np.int64),) * 3)
            covered = np.zeros(r.size, bool)
            if nruns:
                marks = np.zeros(r.size + 1, np.int8)
                marks[starts] += 1
                marks[starts + lengths] -= 1
                covered = np.cumsum(marks[:-1]) > 0
            lit = ~covered
            glens_c = dlens_c = None          # selection changed: rebuild

    chans = [(g.ravel()[lit], 280), (r.ravel()[lit], 256),
             (b.ravel()[lit], 256), (alpha.ravel()[lit], 256), (None, 40)]
    codes = []
    for ci, (data, size) in enumerate(chans):
        if ci == 0 and glens_c is not None:
            lens = glens_c
        elif ci == 4 and dlens_c is not None:
            lens = dlens_c
        else:
            freq = np.zeros(size, np.int64)
            if data is not None:
                bc = np.bincount(data, minlength=256)
                freq[:len(bc)] = bc
                if ci == 0 and nruns:         # length prefixes live in green
                    freq[256:280] += np.bincount(lp, minlength=24)
            else:
                if nruns:
                    freq[:40] = np.bincount(dp, minlength=40)
                else:
                    freq[0] = 1               # unused distance code
            lens = _huff_lengths(freq)
        _write_code(bw, lens)
        nz = [s for s, l in enumerate(lens) if l]
        if len(nz) == 1:
            # spec: a 1-symbol prefix code consumes ZERO bits per read
            codes.append({nz[0]: (0, 0)})
        else:
            # pre-reverse: MSB-first code == LSB-first write of its reversal
            codes.append({s: (int(f"{c:0{l}b}"[::-1], 2), l)
                          for s, (c, l) in _canonical_codes(lens).items()})
    gcode, rcode, bcode, acode, dcode = codes
    if nruns:
        _write_mixed_stream(bw, r, g, b, alpha, lit, starts, lp, lex, lnb,
                            dp, dex, dnb, gcode, rcode, bcode, acode, dcode)
        return

    def lut(cd):
        cl = np.zeros(256, np.uint64)
        ll = np.zeros(256, np.uint64)
        for s, (c, l) in cd.items():
            if s < 256:
                cl[s] = c
                ll[s] = l
        return cl, ll

    # per-channel (code,len) via 256-entry LUT gathers, interleaved in
    # g,r,b,a pixel order, then ONE vectorized bulk pack — zero-length
    # entries (single-symbol channels) drop out inside write_many
    parts = [(cl[d.ravel()], ll[d.ravel()])
             for cd, d in ((gcode, g), (rcode, r), (bcode, b),
                           (acode, alpha))
             for cl, ll in (lut(cd),)]
    bw.write_many(np.stack([p[0] for p in parts], axis=1).ravel(),
                  np.stack([p[1] for p in parts], axis=1).ravel())


def _write_mixed_stream(bw: _LsbWriter, r, g, b, alpha, lit, starts,
                        lp, lex, lnb, dp, dex, dnb, gcode, rcode, bcode,
                        acode, dcode):
    """Literal + backreference emission: entries carry
    (8·flat_pixel_index + slot) sort keys, so one stable sort reproduces
    stream order and write_many packs everything in one pass."""
    def lut(cd, size):
        cl = np.zeros(size, np.uint64)
        ll = np.zeros(size, np.uint64)
        for s, (c, l) in cd.items():
            cl[s] = c
            ll[s] = l
        return cl, ll

    gcl, gll = lut(gcode, 280)
    rcl, rll = lut(rcode, 256)
    bcl, bll = lut(bcode, 256)
    acl, all_ = lut(acode, 256)
    dcl, dll = lut(dcode, 40)
    li = np.nonzero(lit)[0].astype(np.int64)
    gv = g.ravel()[li]
    rv = r.ravel()[li]
    bv = b.ravel()[li]
    av = alpha.ravel()[li]
    gsym = 256 + lp
    keys = np.concatenate([li * 8 + 1, li * 8 + 2, li * 8 + 3, li * 8 + 4,
                           starts * 8 + 1, starts * 8 + 2, starts * 8 + 3,
                           starts * 8 + 4])
    cods = np.concatenate([gcl[gv], rcl[rv], bcl[bv], acl[av],
                           gcl[gsym], lex.astype(np.uint64), dcl[dp],
                           dex.astype(np.uint64)])
    lens = np.concatenate([gll[gv], rll[rv], bll[bv], all_[av],
                           gll[gsym], lnb.astype(np.uint64), dll[dp],
                           dnb.astype(np.uint64)])
    order = np.argsort(keys, kind="stable")
    bw.write_many(cods[order], lens[order])


# ---------- decode ----------

def _sub_size(x: int, bits: int) -> int:
    return (x + (1 << bits) - 1) >> bits


def _decode_fast_single(br: _LsbReader, n: int, w: int, trees):
    """Hot loop for the common case (single huffman group, no color cache).

    Positional precompute: for every BIT position of the remaining stream,
    gather each tree's full-depth LUT entry over a 24-bit LSB-first window
    (one vectorized numpy gather per tree + a memcpy into array.array).
    The per-pixel walk is then pure list/array indexing — no bit
    arithmetic, no method calls (same design as the JPEG scan decoder)."""
    import array as _array

    green, red, blue, alpha, dist = trees
    p0 = br.pos * 8 - br.nbits
    base = p0 >> 3
    # bound the positional precompute by the worst-case stream cost of n
    # pixels (≤ 60 bits each), so small subimage streams don't pay
    # whole-file gathers
    end = min(len(br.d), base + (n * 64 + 1024 >> 3) + 16)
    # window build in uint32 with a broadcast instead of a positional
    # gather: at 16+ concurrent workers the decode is memory-bandwidth
    # bound, and the int64 pp/gather temporaries were ~6x the traffic
    b = np.frombuffer(br.d[base:end], np.uint8).astype(np.uint32)
    u32 = b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
    w24 = ((u32[:, None] >> np.arange(8, dtype=np.uint32)[None, :])
           & np.uint32(0xFFFFFF)).ravel().view(np.int32)
    w24a = None      # extra-bits window, built lazily on first backref
    p = p0 - base * 8

    # ---- combined per-position table ----
    # The four channel trees' full-depth entries are packed into 16-bit
    # fields of ONE int64 LUT keyed by the low max-maxlen window bits
    # (entries are <= 14 bits: (sym<<5)|len, sym<=279), so the whole
    # window needs ONE int64 gather instead of one int32 gather per tree.
    packs = []
    maxm = 0
    for t, sh in ((green, 0), (red, 16), (blue, 32), (alpha, 48)):
        if t.single is None:
            packs.append((t, sh))
            maxm = max(maxm, t.maxlen)
    if packs:
        # int32 when every packed field sits below bit 32 (gray after
        # SUBTRACT_GREEN is the common case) — halves the table traffic
        dt = np.int32 if all(sh <= 16 for _, sh in packs) else np.int64
        vals = np.arange(1 << maxm, dtype=np.int64)
        comb = np.zeros(1 << maxm, dt)
        for t, sh in packs:
            comb |= (t.fulllut()[vals & ((1 << t.maxlen) - 1)]
                     .astype(dt) << dt(sh))
        C = _array.array("i" if dt is np.int32 else "q",
                         np.take(comb, w24 & ((1 << maxm) - 1)).tobytes())
    else:
        C = None
    gC = green.single is None
    rC = red.single is None
    bC = blue.single is None
    aC = alpha.single is None
    D = None                       # distance table built lazily: only the
    # first backreference pays its gather; literal-only streams never do
    g_single = green.single
    r_single = red.single
    b_single = blue.single
    a_single = alpha.single
    d_single = dist.single
    rg: list = []
    rr: list = []
    rb: list = []
    ra: list = []
    try:
        while len(rg) < n:
            if gC:
                e = C[p] & 0xFFFF
                if not e:
                    raise ValueError("corrupt VP8L: bad prefix code")
                p += e & 31
                s = e >> 5
            else:
                s = g_single
            if s < 256:
                rg.append(s)
                if rC:
                    e = (C[p] >> 16) & 0xFFFF
                    p += e & 31
                    rr.append(e >> 5)
                else:
                    rr.append(r_single)
                if bC:
                    e = (C[p] >> 32) & 0xFFFF
                    p += e & 31
                    rb.append(e >> 5)
                else:
                    rb.append(b_single)
                if aC:
                    e = (C[p] >> 48) & 0xFFFF
                    p += e & 31
                    ra.append(e >> 5)
                else:
                    ra.append(a_single)
                continue
            if s < 280:                       # LZ77 backreference
                prefix = s - 256
                if prefix < 4:
                    length = prefix + 1
                else:
                    if w24a is None:
                        w24a = _array.array("i", w24.tobytes())
                    eb = (prefix - 2) >> 1
                    length = (((2 + (prefix & 1)) << eb)
                              + (w24a[p] & ((1 << eb) - 1)) + 1)
                    p += eb
                if d_single is not None:
                    dprefix = d_single
                else:
                    if D is None:
                        dmask = (1 << dist.maxlen) - 1
                        D = _array.array(
                            "i", np.take(dist.fulllut(), w24 & dmask)
                            .tobytes())
                    e = D[p]
                    p += e & 31
                    dprefix = e >> 5
                if dprefix < 4:
                    dcode = dprefix + 1
                else:
                    if w24a is None:
                        w24a = _array.array("i", w24.tobytes())
                    eb = (dprefix - 2) >> 1
                    dcode = (((2 + (dprefix & 1)) << eb)
                             + (w24a[p] & ((1 << eb) - 1)) + 1)
                    p += eb
                if dcode > 120:
                    d = dcode - 120
                else:
                    dx, dy = _DIST_MAP[dcode - 1]
                    d = dy * w + dx
                    if d < 1:
                        d = 1
                if d == 1:                     # constant run: C-level repeat
                    rg.extend([rg[-1]] * length)
                    rr.extend([rr[-1]] * length)
                    rb.extend([rb[-1]] * length)
                    ra.extend([ra[-1]] * length)
                elif length <= d:              # non-overlapping: one slice
                    st = len(rg) - d
                    rg.extend(rg[st:st + length])
                    rr.extend(rr[st:st + length])
                    rb.extend(rb[st:st + length])
                    ra.extend(ra[st:st + length])
                else:                          # overlapping periodic copy
                    for _ in range(length):
                        rg.append(rg[-d])
                        rr.append(rr[-d])
                        rb.append(rb[-d])
                        ra.append(ra[-d])
                continue
            raise ValueError("corrupt VP8L: cache symbol without color cache")
    except IndexError:
        raise ValueError("corrupt VP8L: stream overrun") from None
    # hand the bit-reader state back for whatever follows the pixel data
    p += base * 8
    byte, bit = p >> 3, p & 7
    if bit:
        br.pos = byte + 1
        br.acc = br.d[byte] >> bit
        br.nbits = 8 - bit
    else:
        br.pos = byte
        br.acc = 0
        br.nbits = 0
    return rr, rg, rb, ra


def _decode_general(br: _LsbReader, n: int, w: int, cache_bits: int,
                    groups, gmeta):
    """General pixel loop: color cache and/or multiple huffman groups."""
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cshift = 32 - cache_bits if cache_bits else 0
    rg: list = []
    rr: list = []
    rb: list = []
    ra: list = []
    if gmeta is not None:
        gbits, gidx = gmeta
        gw = gidx.shape[1]
        gidx_flat = gidx.ravel().tolist()
    trees = groups[0]
    i = 0
    while i < n:
        if gmeta is not None:
            trees = groups[gidx_flat[(i // w >> gbits) * gw + ((i % w) >> gbits)]]
        green, red, blue, alpha, dist = trees
        s = green.read(br)
        if s < 256:
            r_ = red.read(br)
            b_ = blue.read(br)
            a_ = alpha.read(br)
            rg.append(s)
            rr.append(r_)
            rb.append(b_)
            ra.append(a_)
            if cache is not None:
                argb = (a_ << 24) | (r_ << 16) | (s << 8) | b_
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> cshift] = argb
            i += 1
        elif s < 280:
            length = _lz_value(br, s - 256)
            dcode = _lz_value(br, dist.read(br))
            if dcode > 120:
                d = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                d = max(1, dy * w + dx)
            for _ in range(length):
                rg.append(rg[-d])
                rr.append(rr[-d])
                rb.append(rb[-d])
                ra.append(ra[-d])
                if cache is not None:
                    argb = (ra[-1] << 24) | (rr[-1] << 16) | (rg[-1] << 8) | rb[-1]
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> cshift] = argb
            i += length
        else:
            if cache is None or s - 280 >= len(cache):
                raise ValueError("corrupt VP8L: bad color-cache symbol")
            argb = cache[s - 280]
            ra.append((argb >> 24) & 0xFF)
            rr.append((argb >> 16) & 0xFF)
            rg.append((argb >> 8) & 0xFF)
            rb.append(argb & 0xFF)
            i += 1
    return rr, rg, rb, ra


def _decode_stream(br: _LsbReader, w: int, h: int, level0: bool) -> np.ndarray:
    """Decode one VP8L image stream → (h, w, 4) uint8 [r, g, b, a].

    level0 (the ARGB image) may carry transforms and a meta-huffman
    (entropy) image; subimage streams (transform data, entropy image,
    palette) recurse here with level0=False — they may still use a color
    cache, per the spec / libwebp's DecodeImageStream."""
    transforms: list = []
    cur_w = w
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype == 2:                    # SUBTRACT_GREEN, no payload
                transforms.append(("sub_green", None))
            elif ttype == 0:                  # PREDICTOR
                bits = br.read(3) + 2
                pimg = _decode_stream(br, _sub_size(cur_w, bits),
                                      _sub_size(h, bits), False)
                transforms.append(("predictor", (bits, pimg)))
            elif ttype == 1:                  # cross-color transform
                bits = br.read(3) + 2
                cimg = _decode_stream(br, _sub_size(cur_w, bits),
                                      _sub_size(h, bits), False)
                transforms.append(("color", (bits, cimg)))
            else:                             # COLOR_INDEXING (palette)
                psize = br.read(8) + 1
                praw = _decode_stream(br, psize, 1, False)
                # palette entries are component-wise delta-coded
                pal = np.cumsum(praw[0].astype(np.int32), axis=0) \
                    .astype(np.uint8)
                wbits = 3 if psize <= 2 else 2 if psize <= 4 else \
                    1 if psize <= 16 else 0
                transforms.append(("palette", (wbits, pal, cur_w)))
                cur_w = _sub_size(cur_w, wbits)
    cache_bits = br.read(4) if br.read(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    gmeta = None
    n_groups = 1
    if level0 and br.read(1):                 # meta huffman (entropy image)
        gbits = br.read(3) + 2
        himg = _decode_stream(br, _sub_size(cur_w, gbits),
                              _sub_size(h, gbits), False)
        gidx = (himg[:, :, 0].astype(np.int32) << 8) | himg[:, :, 1]
        n_groups = int(gidx.max()) + 1
        gmeta = (gbits, gidx)
    groups = []
    for _ in range(n_groups):
        groups.append((_read_code(br, 280 + cache_size),
                       _read_code(br, 256), _read_code(br, 256),
                       _read_code(br, 256), _read_code(br, 40)))
    n = cur_w * h
    if cache_bits == 0 and gmeta is None:
        rr, rg, rb, ra = _decode_fast_single(br, n, cur_w, groups[0])
    else:
        rr, rg, rb, ra = _decode_general(br, n, cur_w, cache_bits,
                                         groups, gmeta)
    px = np.empty((n, 4), np.uint8)
    px[:, 0] = rr[:n]
    px[:, 1] = rg[:n]
    px[:, 2] = rb[:n]
    px[:, 3] = ra[:n]
    px = px.reshape(h, cur_w, 4)
    for kind, dat in reversed(transforms):
        if kind == "sub_green":
            px[:, :, 0] += px[:, :, 1]
            px[:, :, 2] += px[:, :, 1]
        elif kind == "color":
            px = _inv_color_transform(px, *dat)
        elif kind == "predictor":
            px = _inv_predictor(px, *dat)
        else:
            px = _inv_palette(px, *dat)
    return px


def _inv_color_transform(px: np.ndarray, bits: int, cimg: np.ndarray
                         ) -> np.ndarray:
    """Inverse cross-color transform (spec: ColorTransformElement, deltas
    are (int8(t) * int8(c)) >> 5).  Element packing: g2r = BLUE channel,
    g2b = GREEN, r2b = RED of the color image pixel."""
    h, w = px.shape[:2]
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    g2r = cimg[:, :, 2].astype(np.int8)[np.ix_(ys, xs)].astype(np.int32)
    g2b = cimg[:, :, 1].astype(np.int8)[np.ix_(ys, xs)].astype(np.int32)
    r2b = cimg[:, :, 0].astype(np.int8)[np.ix_(ys, xs)].astype(np.int32)
    g = px[:, :, 1].astype(np.int8).astype(np.int32)
    r = (px[:, :, 0].astype(np.int32) + ((g2r * g) >> 5)) & 0xFF
    b = px[:, :, 2].astype(np.int32) + ((g2b * g) >> 5)
    b = (b + ((r2b * r.astype(np.uint8).astype(np.int8).astype(np.int32)) >> 5)) & 0xFF
    out = px.copy()
    out[:, :, 0] = r.astype(np.uint8)
    out[:, :, 2] = b.astype(np.uint8)
    return out


def _inv_palette(px: np.ndarray, wbits: int, pal: np.ndarray,
                 orig_w: int) -> np.ndarray:
    """Inverse color-indexing: unbundle packed indices from the green
    channel (low bits = leftmost pixel), look up the palette (out-of-range
    indices → transparent black, as libwebp)."""
    h = px.shape[0]
    bpp = 8 >> wbits
    mask = (1 << bpp) - 1
    packed = px[:, :, 1].astype(np.int32)
    xs = np.arange(orig_w)
    shifts = (xs % (1 << wbits)) * bpp if wbits else np.zeros(orig_w, np.int64)
    idx = (packed[:, xs >> wbits] >> shifts[None, :]) & mask
    lut = np.zeros((256, 4), np.uint8)
    lut[:pal.shape[0]] = pal
    return lut[idx.reshape(h, orig_w)]


def _avg2(a, b):
    return (a + b) >> 1


def _inv_predictor(px: np.ndarray, bits: int, pimg: np.ndarray) -> np.ndarray:
    """Inverse spatial prediction (spec predictors 0-13).  Row-vectorized
    for the L-independent modes; per-pixel for modes that need the
    just-decoded left neighbor.  TR of the rightmost column is the
    leftmost pixel of the current row (contiguous-memory rule)."""
    h, w = px.shape[:2]
    res = px.astype(np.int32)
    out = np.empty((h, w, 4), np.int32)
    modes = pimg[:, :, 1]                     # green channel holds the mode
    black = np.array([0, 0, 0, 255], np.int32)   # rgba order

    # first row: (0,0) uses black, rest use L — running mod-256 prefix sum
    out[0] = (np.cumsum(res[0], axis=0, dtype=np.int64) + black) & 0xFF

    _FAST = (0, 2, 3, 4, 8, 9)                # L-independent predictors
    mode_x_cache: dict = {}
    for y in range(1, h):
        out[y, 0] = (res[y, 0] + out[y - 1, 0]) & 0xFF   # first col: T
        T = out[y - 1]
        mrow = modes[y >> bits]
        ty = y >> bits
        if ty not in mode_x_cache:
            mode_x_cache[ty] = np.asarray(mrow)[np.arange(1, w) >> bits]
        mx = mode_x_cache[ty]
        present = np.unique(mx)
        if w > 1 and all(m in _FAST for m in present):
            # whole-row vectorized path: every mode this row is
            # L-independent, so predictions depend only on row y-1 (plus
            # out[y,0], already written, for the rightmost TR)
            Tm = T[1:]
            TLm = T[:-1]
            TRm = np.empty_like(Tm)
            TRm[:-1] = T[2:]
            TRm[-1] = out[y, 0]
            pred = np.empty_like(Tm)
            for m in present:
                sel = mx == m
                if m == 0:
                    pred[sel] = black
                elif m == 2:
                    pred[sel] = Tm[sel]
                elif m == 3:
                    pred[sel] = TRm[sel]
                elif m == 4:
                    pred[sel] = TLm[sel]
                elif m == 8:
                    pred[sel] = _avg2(TLm[sel], Tm[sel])
                else:
                    pred[sel] = _avg2(Tm[sel], TRm[sel])
            out[y, 1:] = (res[y, 1:] + pred) & 0xFF
            continue
        x = 1
        while x < w:
            mode = int(mrow[x >> bits])
            xe = min(w, ((x >> bits) + 1) << bits)   # end of this tile span
            if mode == 0:
                out[y, x:xe] = (res[y, x:xe] + black) & 0xFF
                x = xe
            elif mode == 2:
                out[y, x:xe] = (res[y, x:xe] + T[x:xe]) & 0xFF
                x = xe
            elif mode in (3, 4, 8, 9):
                TL = T[x - 1:xe - 1]
                if xe == w:                   # TR wrap for the last column
                    TR = np.concatenate([T[x + 1:], out[y, 0:1]], axis=0)
                else:
                    TR = T[x + 1:xe + 1]
                if mode == 3:
                    p = TR
                elif mode == 4:
                    p = TL
                elif mode == 8:
                    p = _avg2(TL, T[x:xe])
                else:
                    p = _avg2(T[x:xe], TR)
                out[y, x:xe] = (res[y, x:xe] + p) & 0xFF
                x = xe
            else:
                # L-dependent modes: per-pixel
                for xi in range(x, xe):
                    L = out[y, xi - 1]
                    Tc = T[xi]
                    TLc = T[xi - 1]
                    TRc = out[y, 0] if xi == w - 1 else T[xi + 1]
                    if mode == 1:
                        p = L
                    elif mode == 5:
                        p = _avg2(_avg2(L, TRc), Tc)
                    elif mode == 6:
                        p = _avg2(L, TLc)
                    elif mode == 7:
                        p = _avg2(L, Tc)
                    elif mode == 10:
                        p = _avg2(_avg2(L, TLc), _avg2(Tc, TRc))
                    elif mode == 11:
                        est = L + Tc - TLc
                        pL = np.abs(est - L).sum()
                        pT = np.abs(est - Tc).sum()
                        p = L if pL < pT else Tc
                    elif mode == 12:
                        p = np.clip(L + Tc - TLc, 0, 255)
                    elif mode == 13:
                        a = _avg2(L, Tc)
                        d = a - TLc
                        # C-style truncation of (a - TL) / 2
                        p = np.clip(a + np.sign(d) * (np.abs(d) >> 1),
                                    0, 255)
                    else:
                        raise ValueError(f"bad predictor mode {mode}")
                    out[y, xi] = (res[y, xi] + p) & 0xFF
                x = xe
    return out.astype(np.uint8)


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a lossless WebP → (h, w, 3|4) uint8 (or (h, w) if the image
    is gray with opaque alpha).  Spec-complete for the lossless stream:
    all four transforms, color cache, meta huffman, LZ77.  Lossy VP8
    streams raise (libvpx-class machinery out of scope)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP", "not a WebP file"
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"VP8L":
            payload = data[pos + 8:pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    assert payload is not None, "no VP8L chunk (lossy VP8 not supported)"
    br = _LsbReader(payload)
    assert br.read(8) == 0x2F, "bad VP8L signature"
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                # alpha hint
    assert br.read(3) == 0, "unknown VP8L version"
    px = _decode_stream(br, w, h, level0=True)
    # rgba -> most compact honest representation
    if (px[:, :, 3] == 255).all():
        if (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 1] == px[:, :, 2]).all():
            return px[:, :, 0].copy()
        return np.ascontiguousarray(px[:, :, [0, 1, 2]])
    return np.ascontiguousarray(px)


def _lz_value(br: _LsbReader, prefix: int) -> int:
    """Spec LZ77 prefix decoding: prefix symbol → value."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1
