"""Lossy intra-frame codec built from RFC 6386's (VP8) toolset.

The reference ships lossy WebP through libwebp (``frmts/webp/webpdataset.cpp``);
this container has no codec libraries, so this module re-implements the VP8
intra coding toolset in pure numpy/python:

- the RFC 6386 §7 boolean (range) coder, encoder and decoder,
- 16×16 luma / 8×8 chroma intra prediction (DC / V / H / TM, §12.2),
- 4×4 block transform + the second-order Walsh-Hadamard transform of the
  luma DCs (the "Y2" block, §14.3),
- run-free context-modelled coefficient token tree (ZERO..FOUR, six
  magnitude categories with extra bits, EOB; after-ZERO EOB exclusion;
  contexts = plane × coefficient band × neighbour/previous-token state,
  §13.2-13.3),
- 4:2:0 chroma, macroblock skip flags, per-frame probability tables.

HONEST CAPABILITY BOUNDARY (do not remove): RFC 6386 fixes ~2100 default
probability constants (token probs §13.5, update probs §13.4) and the
quantizer lookup tables (§14.1) that a byte-interchangeable VP8 stream
depends on.  Those tables are not reproducible in this offline sandbox, so
streams here are NOT interchange VP8: instead of the RFC defaults the
encoder measures per-frame probabilities and serialises them in the header
(the same mechanism VP8 itself uses for per-frame prob updates), the
quantizer tables are an engine-local geometric ramp, and the 4×4 transform
is the orthonormal DCT rather than the spec's fixed-point approximation.
The RIFF payload is tagged with the private fourcc ``VP8i`` so nothing
masquerades as interchange VP8; foreign ``VP8 `` chunks raise a clear
capability error in ``codecs.decode``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------- boolean (range) coder, RFC 6386 §7 ----------


class BoolEncoder:
    """Arithmetic bool encoder (RFC 6386 §7.3 algorithm)."""

    def __init__(self):
        self.out = bytearray()
        self.bottom = 0
        self.range = 255
        self.bit_count = 24

    def put(self, bit: int, prob: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):         # propagate carry
                j = len(self.out) - 1
                while j >= 0 and self.out[j] == 0xFF:
                    self.out[j] = 0
                    j -= 1
                if j >= 0:
                    self.out[j] += 1
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def literal(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.put((value >> i) & 1, 128)

    def flush(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                j = len(self.out) - 1
                while j >= 0 and self.out[j] == 0xFF:
                    self.out[j] = 0
                    j -= 1
                if j >= 0:
                    self.out[j] += 1
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return bytes(self.out)


class BoolDecoder:
    """Arithmetic bool decoder (RFC 6386 §7.2 algorithm)."""

    def __init__(self, data: bytes):
        self.d = data + b"\x00" * 8
        self.value = (self.d[0] << 8) | self.d[1]
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self.d[self.pos]
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.get(128)
        return v


# ---------- transforms ----------

_k4 = np.arange(4)
D4 = np.sqrt(2.0 / 4.0) * np.cos((2 * _k4[None, :] + 1) * _k4[:, None]
                                 * np.pi / 8.0)
D4[0] *= 1.0 / np.sqrt(2.0)

# Walsh-Hadamard basis for the second-order luma-DC transform
WH = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
               [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)


def fdct4(blocks: np.ndarray) -> np.ndarray:
    """(N,4,4) spatial → DCT coefficients (orthonormal, float)."""
    return D4 @ blocks @ D4.T


def idct4(coefs: np.ndarray) -> np.ndarray:
    return D4.T @ coefs @ D4


def fwht4(dc: np.ndarray) -> np.ndarray:
    """4×4 int → WHT (gain 16; exact integers)."""
    return WH @ dc.astype(np.int64) @ WH.T


def iwht4(y2: np.ndarray) -> np.ndarray:
    return (WH.T @ y2.astype(np.int64) @ WH + 8) >> 4


ZZ4 = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])

# ---------- quantization (engine-local ramp; see module docstring) ----------


def _quants(qi: int):
    qi = min(127, max(0, qi))
    q_ac = 4.0 * (1.0305 ** qi)
    q_dc = max(4.0, 0.9 * q_ac)
    return q_dc, q_ac, 2.0 * q_dc, max(8.0, 1.55 * q_ac)


def quality_to_qi(quality: int) -> int:
    return min(127, max(0, int(round((100 - quality) * 1.27))))


# ---------- token tree (RFC 6386 §13.2 structure) ----------

# node index → (bit=0 branch, bit=1 branch); leaves are token ids
# tokens: 0..4 literal magnitudes, 5..10 categories 1..6, 11 EOB
_CAT_BASE = [5, 7, 11, 19, 35, 67]
_CAT_BITS = [1, 2, 3, 4, 5, 11]
N_NODES = 11
EOB = 11


def _magnitude_token(m: int):
    """|coef| → (token, extra_bits_value)."""
    if m <= 4:
        return m, 0
    for c in range(5, -1, -1):
        if m >= _CAT_BASE[c]:
            return 5 + c, m - _CAT_BASE[c]
    raise AssertionError


def _token_path(tok: int, after_zero: bool):
    """Binary decisions (node, bit) that encode ``tok``."""
    path = [] if after_zero else [(0, 1)]       # EOB excluded after ZERO
    if tok == EOB:
        return [(0, 0)]
    if tok == 0:
        return path + [(1, 0)]
    path.append((1, 1))
    if tok == 1:
        return path + [(2, 0)]
    path.append((2, 1))
    if tok <= 4:
        path.append((3, 0))
        if tok == 2:
            return path + [(4, 0)]
        path.append((4, 1))
        return path + [(5, 0)] if tok == 3 else path + [(5, 1)]
    path.append((3, 1))
    c = tok - 5
    if c <= 1:
        return path + [(6, 0), (7, c)]
    path.append((6, 1))
    if c <= 3:
        return path + [(8, 0), (9, c - 2)]
    return path + [(8, 1), (10, c - 4)]


_PATHS = {(t, az): _token_path(t, az)
          for t in range(12) for az in (False, True)}

# coefficient position → band (4 bands)
_BAND = [0, 1, 2, 2] + [3] * 12


def _decode_token(bd: BoolDecoder, probs, after_zero: bool) -> int:
    if not after_zero and not bd.get(probs[0]):
        return EOB
    if not bd.get(probs[1]):
        return 0
    if not bd.get(probs[2]):
        return 1
    if not bd.get(probs[3]):
        if not bd.get(probs[4]):
            return 2
        return 3 if not bd.get(probs[5]) else 4
    if not bd.get(probs[6]):
        return 5 if not bd.get(probs[7]) else 6
    if not bd.get(probs[8]):
        return 7 if not bd.get(probs[9]) else 8
    return 9 if not bd.get(probs[10]) else 10


# planes: 0 = luma AC (coefs 1..15), 1 = Y2, 2 = chroma
N_PLANES, N_BANDS, N_CTX = 4, 4, 3   # plane 3 = B_PRED luma (first=0)


# ---------- prediction (RFC 6386 §12.2 modes) ----------

def _predict(recon: np.ndarray, y0: int, x0: int, size: int, mode: int
             ) -> np.ndarray:
    """DC/V/H/TM prediction for the size×size block at (y0, x0) from
    already-reconstructed neighbours (127/129 border conventions)."""
    has_above = y0 > 0
    has_left = x0 > 0
    above = recon[y0 - 1, x0:x0 + size].astype(np.int32) if has_above \
        else np.full(size, 127, np.int32)
    left = recon[y0:y0 + size, x0 - 1].astype(np.int32) if has_left \
        else np.full(size, 129, np.int32)
    if mode == 0:                                # DC
        if has_above and has_left:
            dc = (int(above.sum()) + int(left.sum()) + size) // (2 * size)
        elif has_above:
            dc = (int(above.sum()) + size // 2) // size
        elif has_left:
            dc = (int(left.sum()) + size // 2) // size
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == 1:                                # V
        return np.repeat(above[None, :], size, axis=0)
    if mode == 2:                                # H
        return np.repeat(left[:, None], size, axis=1)
    corner = int(recon[y0 - 1, x0 - 1]) if (has_above and has_left) else \
        (int(above[0]) if has_above else (int(left[0]) if has_left else 128))
    tm = left[:, None] + above[None, :] - corner  # TM
    return np.clip(tm, 0, 255)


def _sub_edges(recon: np.ndarray, by: int, bx: int):
    """Edge pixels for a 4×4 subblock at (by, bx): above A[0..3],
    above-right AR[0..3], left L[0..3], corner X, with the same 127/129
    border conventions as the 16×16 path.  Above-right is only taken from
    already-reconstructed pixels: the previous MB row anywhere, or the
    subblock row above within the current MB (c < 3); otherwise A[3]
    replicates (deterministic, mirrored exactly by the decoder)."""
    has_a = by > 0
    has_l = bx > 0
    w = recon.shape[1]
    if has_a:
        A = recon[by - 1, bx:bx + 4].astype(np.int32)
        in_mb_row = (by & 15) != 0
        ar_ok = bx + 8 <= w and (not in_mb_row or (bx & 15) <= 8)
        AR = (recon[by - 1, bx + 4:bx + 8].astype(np.int32) if ar_ok
              else np.full(4, int(A[3]), np.int32))
    else:
        A = np.full(4, 127, np.int32)
        AR = np.full(4, 127, np.int32)
    L = recon[by:by + 4, bx - 1].astype(np.int32) if has_l \
        else np.full(4, 129, np.int32)
    X = int(recon[by - 1, bx - 1]) if (has_a and has_l) else \
        (127 if has_a else (129 if has_l else 128))
    return A, AR, L, X, has_a, has_l


def _predict4(A, AR, L, X, has_a, has_l, mode: int) -> np.ndarray:
    """RFC 6386 §12.3 4×4 intra prediction (B_PRED submodes 0..9:
    DC/TM/VE/HE/LD/RD/VR/VL/HD/HU)."""
    p = np.empty((4, 4), np.int32)
    if mode == 0:                                      # B_DC
        if has_a and has_l:
            dc = (int(A.sum()) + int(L.sum()) + 4) >> 3
        elif has_a:
            dc = (int(A.sum()) + 2) >> 2
        elif has_l:
            dc = (int(L.sum()) + 2) >> 2
        else:
            dc = 128
        p[:] = dc
        return p
    if mode == 1:                                      # B_TM
        return np.clip(L[:, None] + A[None, :] - X, 0, 255)
    if mode == 2:                                      # B_VE (filtered V)
        e = np.concatenate(([X], A, AR[:1]))
        ve = (e[:-2] + 2 * e[1:-1] + e[2:] + 2) >> 2
        p[:] = ve[None, :]
        return p
    if mode == 3:                                      # B_HE (filtered H)
        u = np.concatenate(([X], L, L[3:]))
        he = (u[:-2] + 2 * u[1:-1] + u[2:] + 2) >> 2
        p[:] = he[:, None]
        return p
    if mode == 4:                                      # B_LD (down-left)
        a = np.concatenate((A, AR))
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r, c] = ((a[6] + 3 * a[7] + 2) >> 2 if i == 6 else
                           (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2)
        return p
    if mode == 5:                                      # B_RD (down-right)
        E = np.array([L[3], L[2], L[1], L[0], X, A[0], A[1], A[2], A[3]],
                     np.int32)
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                p[r, c] = (E[i - 1] + 2 * E[i] + E[i + 1] + 2) >> 2
        return p
    A0, A1, A2, A3 = (int(v) for v in A)
    R0, R1, R2, R3 = (int(v) for v in AR)
    L0, L1, L2, L3 = (int(v) for v in L)
    if mode == 6:                                      # B_VR
        p[0] = [(X + A0 + 1) >> 1, (A0 + A1 + 1) >> 1,
                (A1 + A2 + 1) >> 1, (A2 + A3 + 1) >> 1]
        p[1] = [(L0 + 2 * X + A0 + 2) >> 2, (X + 2 * A0 + A1 + 2) >> 2,
                (A0 + 2 * A1 + A2 + 2) >> 2, (A1 + 2 * A2 + A3 + 2) >> 2]
        p[2] = [(X + 2 * L0 + L1 + 2) >> 2, p[0, 0], p[0, 1], p[0, 2]]
        p[3] = [(L0 + 2 * L1 + L2 + 2) >> 2, p[1, 0], p[1, 1], p[1, 2]]
        return p
    if mode == 7:                                      # B_VL
        p[0] = [(A0 + A1 + 1) >> 1, (A1 + A2 + 1) >> 1,
                (A2 + A3 + 1) >> 1, (A3 + R0 + 1) >> 1]
        p[1] = [(A0 + 2 * A1 + A2 + 2) >> 2, (A1 + 2 * A2 + A3 + 2) >> 2,
                (A2 + 2 * A3 + R0 + 2) >> 2, (A3 + 2 * R0 + R1 + 2) >> 2]
        p[2] = [p[0, 1], p[0, 2], p[0, 3], (R0 + 2 * R1 + R2 + 2) >> 2]
        p[3] = [p[1, 1], p[1, 2], p[1, 3], (R1 + 2 * R2 + R3 + 2) >> 2]
        return p
    if mode == 8:                                      # B_HD
        p[0] = [(L0 + X + 1) >> 1, (L0 + 2 * X + A0 + 2) >> 2,
                (X + 2 * A0 + A1 + 2) >> 2, (A0 + 2 * A1 + A2 + 2) >> 2]
        p[1] = [(L1 + L0 + 1) >> 1, (X + 2 * L0 + L1 + 2) >> 2,
                p[0, 0], p[0, 1]]
        p[2] = [(L2 + L1 + 1) >> 1, (L0 + 2 * L1 + L2 + 2) >> 2,
                p[1, 0], p[1, 1]]
        p[3] = [(L3 + L2 + 1) >> 1, (L1 + 2 * L2 + L3 + 2) >> 2,
                p[2, 0], p[2, 1]]
        return p
    # mode 9: B_HU
    p[0] = [(L0 + L1 + 1) >> 1, (L0 + 2 * L1 + L2 + 2) >> 2,
            (L1 + L2 + 1) >> 1, (L1 + 2 * L2 + L3 + 2) >> 2]
    p[1] = [p[0, 2], p[0, 3], (L2 + L3 + 1) >> 1, (L2 + 3 * L3 + 2) >> 2]
    p[2] = [p[1, 2], p[1, 3], L3, L3]
    p[3] = [L3, L3, L3, L3]
    return p


B_PRED = 4                 # ymode value signalling per-subblock 4×4 modes


# ---------- color ----------

def _rgb_to_yuv420(img: np.ndarray):
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    h, w = y.shape
    he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    up = np.empty((he, we))
    vp = np.empty((he, we))
    up[:h, :w] = u
    vp[:h, :w] = v
    up[h:, :w] = u[h - 1:, :]
    vp[h:, :w] = v[h - 1:, :]
    up[:, w:] = up[:, w - 1:w]
    vp[:, w:] = vp[:, w - 1:w]
    u2 = up.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
    v2 = vp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
    return (np.clip(np.round(y), 0, 255).astype(np.uint8),
            np.clip(np.round(u2), 0, 255).astype(np.uint8),
            np.clip(np.round(v2), 0, 255).astype(np.uint8))


def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray
                   ) -> np.ndarray:
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yf = y.astype(np.float64)
    cb = uu.astype(np.float64) - 128.0
    cr = vv.astype(np.float64) - 128.0
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    b = yf + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    hp = -(-h // mult) * mult
    wp = -(-w // mult) * mult
    if hp == h and wp == w:
        return plane
    out = np.empty((hp, wp), plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1:, :]
    out[:, w:] = out[:, w - 1:w]
    return out


# ---------- tokenization helpers ----------

def _tokenize_block(coefs: list, plane: int, first: int, ctx0: int,
                    record):
    """Token stream for one 4×4 block (zigzag list, positions first..15).
    record(plane, band, ctx, node, bit) + extra-bit/sign callbacks are
    provided by the caller.  Returns block-nonzero flag."""
    rec, extra = record
    nz_positions = [i for i in range(first, 16) if coefs[i]]
    last = nz_positions[-1] if nz_positions else first - 1
    ctx = ctx0
    after_zero = False
    any_nz = False
    for i in range(first, last + 1):
        c = int(coefs[i])
        m = abs(c)
        tok, ebits = _magnitude_token(m)
        for node, bit in _PATHS[(tok, after_zero)]:
            rec(plane, _BAND[i], ctx, node, bit)
        if tok >= 5:
            extra(ebits, _CAT_BITS[tok - 5])
        if m:
            extra(1 if c < 0 else 0, 1)        # sign
            any_nz = True
        after_zero = tok == 0
        ctx = 0 if m == 0 else (1 if m == 1 else 2)
    if last < 15:
        if not after_zero:                     # EOB cannot follow ZERO
            rec(plane, _BAND[min(last + 1, 15)], ctx, 0, 0)
        # (a trailing ZERO run is never emitted: after a ZERO token the
        #  encoder only continues when another nonzero follows)
    return any_nz


def _detokenize_block(bd: BoolDecoder, probs, plane: int, first: int,
                      ctx0: int) -> list:
    """Token-tree decode for one 4×4 block with the bool-decoder state
    held in locals (the per-bool method-call overhead dominates decode
    otherwise — same inlining treatment as the VP8L/JPEG hot loops)."""
    out = [0] * 16
    ctx = ctx0
    after_zero = False
    i = first
    d = bd.d
    value = bd.value
    rng = bd.range
    bit_count = bd.bit_count
    pos = bd.pos
    pl = probs[plane]

    # local-state bool read (closure built once per block, not per token)
    def _b(prob):
        nonlocal value, rng, bit_count, pos
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        if value >= big:
            ret = 1
            rng -= split
            value -= big
        else:
            ret = 0
            rng = split
        while rng < 128:
            value = (value << 1) & 0xFFFF
            rng <<= 1
            bit_count += 1
            if bit_count == 8:
                bit_count = 0
                value |= d[pos]
                pos += 1
        return ret

    while i < 16:
        pr = pl[_BAND[i]][ctx]
        if not after_zero and not _b(pr[0]):
            break                                  # EOB
        if not _b(pr[1]):
            tok = 0
            m = 0
        elif not _b(pr[2]):
            tok, m = 1, 1
        elif not _b(pr[3]):
            if not _b(pr[4]):
                tok, m = 2, 2
            elif not _b(pr[5]):
                tok, m = 3, 3
            else:
                tok, m = 4, 4
        else:
            if not _b(pr[6]):
                c = 0 if not _b(pr[7]) else 1
            elif not _b(pr[8]):
                c = 2 if not _b(pr[9]) else 3
            else:
                c = 4 if not _b(pr[10]) else 5
            tok = 5 + c
            v = 0
            for _ in range(_CAT_BITS[c]):
                v = (v << 1) | _b(128)
            m = _CAT_BASE[c] + v
        if m:
            if _b(128):
                m = -m
        out[i] = m
        after_zero = tok == 0
        ctx = 0 if m == 0 else (1 if (m if m > 0 else -m) == 1 else 2)
        i += 1
    bd.value = value
    bd.range = rng
    bd.bit_count = bit_count
    bd.pos = pos
    return out


# ---------- encoder ----------

def encode_vp8i(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h,w[,3]) uint8 → RIFF WEBP container with a ``VP8i`` chunk."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if gray:
        y = img.astype(np.uint8)
        h, w = y.shape
        u = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
        v = u.copy()
    else:
        h, w = img.shape[:2]
        y, u, v = _rgb_to_yuv420(img)
    qi = quality_to_qi(quality)
    q_dc, q_ac, q2_dc, q2_ac = _quants(qi)
    yp = _pad_to(y, 16).astype(np.int32)
    up = _pad_to(u, 8).astype(np.int32)
    vp = _pad_to(v, 8).astype(np.int32)
    mby, mbx = yp.shape[0] // 16, yp.shape[1] // 16
    ry = np.zeros_like(yp, np.uint8)
    ru = np.zeros_like(up, np.uint8)
    rv = np.zeros_like(vp, np.uint8)

    decisions: list = []  # ((plane,band,ctx,node) flat index << 1) | bit
    stream: list = []     # interleaved ops, replayed at write time

    def rec(plane, band, ctx, node, bit):
        decisions.append(
            (((((plane * N_BANDS + band) * N_CTX + ctx) * N_NODES + node)
              << 1) | bit))
        stream.append(0)

    def extra(value, nbits):
        stream.append((value << 6) | nbits)     # literal op

    record = (rec, extra)

    above_nz_y = np.zeros(mbx * 4, np.int8)
    above_nz_u = np.zeros(mbx * 2, np.int8)
    above_nz_v = np.zeros(mbx * 2, np.int8)
    above_nz_y2 = np.zeros(mbx, np.int8)

    def best_mode(recon, y0, x0, size, src):
        best, bm = None, 0
        for mode in range(4):
            pred = _predict(recon, y0, x0, size, mode)
            sad = int(np.abs(src - pred).sum())
            if best is None or sad < best:
                best, bm = sad, mode
        return bm, best

    qy_mat = np.where(np.arange(16).reshape(4, 4) == 0, q_dc, q_ac)

    def try_bpred(y0, x0):
        """Trial-encode the MB with per-subblock 4×4 modes, writing the
        reconstruction into ry (caller saves/restores the region).
        Returns (total SAD, submodes, quantized blocks in raster order)."""
        total = 0
        submodes = []
        qblocks = np.zeros((16, 4, 4), np.int64)
        src16 = yp[y0:y0 + 16, x0:x0 + 16]
        for sb in range(16):
            r, c = divmod(sb, 4)
            by, bx = y0 + r * 4, x0 + c * 4
            A, AR, L, X, ha, hl = _sub_edges(ry, by, bx)
            src = src16[r * 4:r * 4 + 4, c * 4:c * 4 + 4]
            best, bm, bp = None, 0, None
            for m in range(10):
                pred = _predict4(A, AR, L, X, ha, hl, m)
                sad = int(np.abs(src - pred).sum())
                if best is None or sad < best:
                    best, bm, bp = sad, m, pred
            total += best
            submodes.append(bm)
            coefs = fdct4((src - bp).astype(np.float64)[None])[0]
            q = np.round(coefs / qy_mat).astype(np.int64)
            qblocks[sb] = q
            rec = idct4((q * qy_mat).astype(np.float64)[None])[0] + bp
            ry[by:by + 4, bx:bx + 4] = np.clip(np.round(rec), 0, 255)
        return total, submodes, qblocks

    for my in range(mby):
        left_nz_y = np.zeros(4, np.int8)
        left_nz_u = np.zeros(2, np.int8)
        left_nz_v = np.zeros(2, np.int8)
        left_nz_y2 = 0
        for mx in range(mbx):
            y0, x0 = my * 16, mx * 16
            src_y = yp[y0:y0 + 16, x0:x0 + 16]
            ymode, sad16 = best_mode(ry, y0, x0, 16, src_y)
            submodes = None
            trial = None
            # B_PRED trial, gated: flat MBs never beat whole-MB modes, the
            # trial costs 160 4×4 predictions, and quality 100 stays on the
            # 16×16+Y2 path whose MB-constant reconstruction is PROVABLY
            # bit-exact (the driver-oracle class) — B_PRED's per-block DC
            # with filtered-edge submodes is not
            if quality < 100 and sad16 > 1024:
                saved = ry[y0:y0 + 16, x0:x0 + 16].copy()
                _, bsub, bq = try_bpred(y0, x0)
                recon_b = ry[y0:y0 + 16, x0:x0 + 16].copy()
                sse_b = int(((src_y - recon_b.astype(np.int32)) ** 2).sum())
                trial = (bsub, bq, recon_b, sse_b)
                ry[y0:y0 + 16, x0:x0 + 16] = saved
            if True:
                pred_y = _predict(ry, y0, x0, 16, ymode)
                res = (src_y - pred_y).astype(np.float64)
                blocks = res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                            .reshape(16, 4, 4)
                coefs = fdct4(blocks)
                # second-order transform of the 16 luma DCs
                dcs = coefs[:, 0, 0].reshape(4, 4)
                y2 = fwht4(np.round(dcs).astype(np.int64))
                qy2 = np.round(y2 / np.array([[q2_dc] + [q2_ac] * 3,
                                              *[[q2_ac] * 4] * 3])).astype(int)
                dy2 = qy2 * np.array([[q2_dc] + [q2_ac] * 3,
                                      *[[q2_ac] * 4] * 3])
                rdcs = iwht4(np.round(dy2).astype(np.int64)).astype(np.float64)
                qy = np.round(coefs / q_ac).astype(np.int64)
                qy[:, 0, 0] = 0
                dcoefs = qy.astype(np.float64) * q_ac
                dcoefs[:, 0, 0] = rdcs.reshape(16)
                rec_blocks = idct4(dcoefs) + pred_y.reshape(4, 4, 4, 4) \
                    .transpose(0, 2, 1, 3).reshape(16, 4, 4)
                ry[y0:y0 + 16, x0:x0 + 16] = np.clip(np.round(
                    rec_blocks.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
                    .reshape(16, 16)), 0, 255)

            if trial is not None:
                # true rate-distortion choice: SSE + λ·(coef count), with
                # the 16 submode literals charged to the B_PRED side
                bsub, bq, recon_b, sse_b = trial
                rec16 = ry[y0:y0 + 16, x0:x0 + 16].astype(np.int32)
                sse_16 = int(((src_y - rec16) ** 2).sum())
                lam = max(1, (q_ac * q_ac) // 8)
                score_b = sse_b + lam * (int(np.count_nonzero(bq)) + 12)
                score_16 = sse_16 + lam * (int(np.count_nonzero(qy))
                                           + int(np.count_nonzero(qy2)))
                if score_b < score_16:
                    ymode, submodes, qy = B_PRED, bsub, bq
                    qy2 = np.zeros((4, 4), np.int64)
                    ry[y0:y0 + 16, x0:x0 + 16] = recon_b

            c0, cx0 = my * 8, mx * 8
            chroma = []
            for plane_arr, recon_arr in ((up, ru), (vp, rv)):
                src_c = plane_arr[c0:c0 + 8, cx0:cx0 + 8]
                cmode, _ = best_mode(recon_arr, c0, cx0, 8, src_c)
                pred_c = _predict(recon_arr, c0, cx0, 8, cmode)
                resc = (src_c - pred_c).astype(np.float64)
                cb = resc.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                    .reshape(4, 4, 4)
                qc = np.round(fdct4(cb) /
                              np.where(np.arange(16).reshape(4, 4) == 0,
                                       q_dc, q_ac)[None]).astype(np.int64)
                dq = qc.astype(np.float64) * np.where(
                    np.arange(16).reshape(4, 4) == 0, q_dc, q_ac)[None]
                rc = idct4(dq) + pred_c.reshape(2, 4, 2, 4) \
                    .transpose(0, 2, 1, 3).reshape(4, 4, 4)
                recon_arr[c0:c0 + 8, cx0:cx0 + 8] = np.clip(np.round(
                    rc.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3)
                    .reshape(8, 8)), 0, 255)
                chroma.append((cmode, qc))

            skip = (not qy2.any()) and (not qy.any()) \
                and (not chroma[0][1].any()) and (not chroma[1][1].any())
            stream.append((ymode << 6) | 3)      # 3-bit literal (4=B_PRED)
            if submodes is not None:
                for m in submodes:
                    stream.append((m << 6) | 4)  # 4-bit submode literal
            stream.append((chroma[0][0] << 6) | 2)
            stream.append((chroma[1][0] << 6) | 2)
            stream.append(((1 if skip else 0) << 6) | 1)
            if skip:
                # per VP8 semantics a skipped MB counts as "no coefficients"
                above_nz_y[mx * 4:mx * 4 + 4] = 0
                left_nz_y[:] = 0
                above_nz_u[mx * 2:mx * 2 + 2] = 0
                left_nz_u[:] = 0
                above_nz_v[mx * 2:mx * 2 + 2] = 0
                left_nz_v[:] = 0
                above_nz_y2[mx] = 0
                left_nz_y2 = 0
                continue
            if submodes is None:
                # Y2 block
                ctx0 = int(above_nz_y2[mx]) + int(left_nz_y2)
                zz = qy2.reshape(16)[ZZ4].tolist()
                nz = _tokenize_block(zz, 1, 0, min(ctx0, 2), record)
                above_nz_y2[mx] = left_nz_y2 = 1 if nz else 0
                yplane, yfirst = 0, 1        # DC lives in Y2
            else:
                above_nz_y2[mx] = left_nz_y2 = 0   # B_PRED: no Y2
                yplane, yfirst = 3, 0
            # 16 luma blocks (coefs yfirst..15)
            qy_zz = qy.reshape(16, 16)[:, ZZ4].tolist()
            for b in range(16):
                brow, bcol = b // 4, b % 4
                ctx0 = int(above_nz_y[mx * 4 + bcol]) + int(left_nz_y[brow])
                nz = _tokenize_block(qy_zz[b], yplane, yfirst,
                                     min(ctx0, 2), record)
                above_nz_y[mx * 4 + bcol] = left_nz_y[brow] = 1 if nz else 0
            # chroma blocks
            for (cmode, qc), above_c, left_c, off in (
                    (chroma[0], above_nz_u, left_nz_u, mx * 2),
                    (chroma[1], above_nz_v, left_nz_v, mx * 2)):
                qc_zz = qc.reshape(4, 16)[:, ZZ4].tolist()
                for b in range(4):
                    brow, bcol = b // 2, b % 2
                    ctx0 = int(above_c[off + bcol]) + int(left_c[brow])
                    nz = _tokenize_block(qc_zz[b], 2, 0, min(ctx0, 2), record)
                    above_c[off + bcol] = left_c[brow] = 1 if nz else 0

    # per-frame probabilities from the measured decision counts
    nslots = N_PLANES * N_BANDS * N_CTX * N_NODES
    dec_arr = np.asarray(decisions, dtype=np.int64)
    counts = np.bincount(dec_arr, minlength=nslots * 2).reshape(nslots, 2)
    tot = counts.sum(axis=1)
    probs_flat = np.where(tot > 0,
                          np.clip(counts[:, 0] * 255 //
                                  np.maximum(tot, 1), 1, 255),
                          128).astype(np.uint8)
    probs = probs_flat.reshape(N_PLANES, N_BANDS, N_CTX, N_NODES)
    prob_of = probs_flat.tolist()

    be = BoolEncoder()
    out = be.out
    bottom = 0
    rng_ = 255
    bit_count = 24

    def _p(bit, prob):
        nonlocal bottom, rng_, bit_count
        split = 1 + (((rng_ - 1) * prob) >> 8)
        if bit:
            bottom += split
            rng_ -= split
        else:
            rng_ = split
        while rng_ < 128:
            rng_ <<= 1
            if bottom & 0x80000000:
                j = len(out) - 1
                while j >= 0 and out[j] == 0xFF:
                    out[j] = 0
                    j -= 1
                if j >= 0:
                    out[j] += 1
            bottom = (bottom << 1) & 0xFFFFFFFF
            bit_count -= 1
            if bit_count == 0:
                out.append((bottom >> 24) & 0xFF)
                bottom &= 0xFFFFFF
                bit_count = 8

    di = iter(dec_arr.tolist())
    for op in stream:
        if op == 0:
            dd = next(di)
            _p(dd & 1, prob_of[dd >> 1])
        else:
            v = op >> 6
            for i in range((op & 63) - 1, -1, -1):
                _p((v >> i) & 1, 128)
    be.bottom = bottom
    be.range = rng_
    be.bit_count = bit_count
    body = be.flush()

    payload = struct.pack("<HHBB", w, h, qi, 1 if gray else 0) \
        + probs.tobytes() + body
    chunk = b"VP8i" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------- decoder ----------

def decode_vp8i(data: bytes) -> np.ndarray:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP stream")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if fourcc == b"VP8i":
            payload = data[pos + 8:pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8i chunk")
    w, h, qi, gray = struct.unpack_from("<HHBB", payload, 0)
    nprob = N_PLANES * N_BANDS * N_CTX * N_NODES
    probs = np.frombuffer(payload[6:6 + nprob], np.uint8) \
        .reshape(N_PLANES, N_BANDS, N_CTX, N_NODES)
    probs_l = [[[list(map(int, probs[p, b, c]))
                 for c in range(N_CTX)] for b in range(N_BANDS)]
               for p in range(N_PLANES)]
    bd = BoolDecoder(payload[6 + nprob:])
    q_dc, q_ac, q2_dc, q2_ac = _quants(qi)

    hp = -(-h // 16) * 16
    wp = -(-w // 16) * 16
    mby, mbx = hp // 16, wp // 16
    ry = np.zeros((hp, wp), np.uint8)
    ch_h, ch_w = mby * 8, mbx * 8
    ru = np.zeros((ch_h, ch_w), np.uint8)
    rv = np.zeros((ch_h, ch_w), np.uint8)
    above_nz_y = np.zeros(mbx * 4, np.int8)
    above_nz_u = np.zeros(mbx * 2, np.int8)
    above_nz_v = np.zeros(mbx * 2, np.int8)
    above_nz_y2 = np.zeros(mbx, np.int8)
    q2_mat = np.array([[q2_dc] + [q2_ac] * 3, *[[q2_ac] * 4] * 3])
    qc_mat = np.where(np.arange(16).reshape(4, 4) == 0, q_dc, q_ac)

    for my in range(mby):
        left_nz_y = np.zeros(4, np.int8)
        left_nz_u = np.zeros(2, np.int8)
        left_nz_v = np.zeros(2, np.int8)
        left_nz_y2 = 0
        for mx in range(mbx):
            ymode = bd.literal(3)
            submodes = ([bd.literal(4) for _ in range(16)]
                        if ymode == B_PRED else None)
            umode = bd.literal(2)
            vmode = bd.literal(2)
            skip = bd.literal(1)
            y0, x0 = my * 16, mx * 16
            c0, cx0 = my * 8, mx * 8

            def bpred_block(sb, dq):
                r, c = divmod(sb, 4)
                by, bx = y0 + r * 4, x0 + c * 4
                A, AR, L, X, ha, hl = _sub_edges(ry, by, bx)
                pred = _predict4(A, AR, L, X, ha, hl, submodes[sb])
                rec = (idct4(dq[None])[0] + pred) if dq is not None else pred
                ry[by:by + 4, bx:bx + 4] = np.clip(np.round(rec), 0, 255)

            pred_y = (None if submodes is not None
                      else _predict(ry, y0, x0, 16, ymode))
            pred_u = _predict(ru, c0, cx0, 8, umode)
            pred_v = _predict(rv, c0, cx0, 8, vmode)
            if skip:
                if submodes is not None:
                    for b in range(16):
                        bpred_block(b, None)
                else:
                    ry[y0:y0 + 16, x0:x0 + 16] = np.clip(pred_y, 0, 255)
                ru[c0:c0 + 8, cx0:cx0 + 8] = np.clip(pred_u, 0, 255)
                rv[c0:c0 + 8, cx0:cx0 + 8] = np.clip(pred_v, 0, 255)
                above_nz_y[mx * 4:mx * 4 + 4] = 0
                left_nz_y[:] = 0
                above_nz_u[mx * 2:mx * 2 + 2] = 0
                left_nz_u[:] = 0
                above_nz_v[mx * 2:mx * 2 + 2] = 0
                left_nz_v[:] = 0
                above_nz_y2[mx] = 0
                left_nz_y2 = 0
                continue
            if submodes is not None:           # B_PRED: no Y2, DC in-block
                above_nz_y2[mx] = left_nz_y2 = 0
                for b in range(16):
                    brow, bcol = b // 4, b % 4
                    ctx0 = min(int(above_nz_y[mx * 4 + bcol])
                               + int(left_nz_y[brow]), 2)
                    zz = _detokenize_block(bd, probs_l, 3, 0, ctx0)
                    nzf = any(zz)
                    above_nz_y[mx * 4 + bcol] = left_nz_y[brow] = \
                        1 if nzf else 0
                    cf = np.zeros(16)
                    cf[ZZ4] = zz
                    bpred_block(b, cf.reshape(4, 4) * qc_mat)
            else:
                # Y2
                ctx0 = min(int(above_nz_y2[mx]) + int(left_nz_y2), 2)
                zz = _detokenize_block(bd, probs_l, 1, 0, ctx0)
                nzf = any(zz)
                above_nz_y2[mx] = left_nz_y2 = 1 if nzf else 0
                qy2 = np.zeros(16, np.int64)
                qy2[ZZ4] = zz
                rdcs = iwht4(np.round(qy2.reshape(4, 4) * q2_mat)
                             .astype(np.int64)).astype(np.float64)
                # luma
                dcoefs = np.zeros((16, 4, 4))
                for b in range(16):
                    brow, bcol = b // 4, b % 4
                    ctx0 = min(int(above_nz_y[mx * 4 + bcol])
                               + int(left_nz_y[brow]), 2)
                    zz = _detokenize_block(bd, probs_l, 0, 1, ctx0)
                    nzf = any(zz)
                    above_nz_y[mx * 4 + bcol] = left_nz_y[brow] = \
                        1 if nzf else 0
                    cf = np.zeros(16)
                    cf[ZZ4] = zz
                    dcoefs[b] = cf.reshape(4, 4) * q_ac
                    dcoefs[b, 0, 0] = rdcs.reshape(16)[b]
                rec_blocks = idct4(dcoefs) + pred_y.reshape(4, 4, 4, 4) \
                    .transpose(0, 2, 1, 3).reshape(16, 4, 4)
                ry[y0:y0 + 16, x0:x0 + 16] = np.clip(np.round(
                    rec_blocks.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
                    .reshape(16, 16)), 0, 255)
            # chroma
            for pred_c, recon_arr, above_c, left_c, off in (
                    (pred_u, ru, above_nz_u, left_nz_u, mx * 2),
                    (pred_v, rv, above_nz_v, left_nz_v, mx * 2)):
                dq = np.zeros((4, 4, 4))
                for b in range(4):
                    brow, bcol = b // 2, b % 2
                    ctx0 = min(int(above_c[off + bcol])
                               + int(left_c[brow]), 2)
                    zz = _detokenize_block(bd, probs_l, 2, 0, ctx0)
                    nzf = any(zz)
                    above_c[off + bcol] = left_c[brow] = 1 if nzf else 0
                    cf = np.zeros(16)
                    cf[ZZ4] = zz
                    dq[b] = cf.reshape(4, 4) * qc_mat
                rc = idct4(dq) + pred_c.reshape(2, 4, 2, 4) \
                    .transpose(0, 2, 1, 3).reshape(4, 4, 4)
                recon_arr[c0:c0 + 8, cx0:cx0 + 8] = np.clip(np.round(
                    rc.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3)
                    .reshape(8, 8)), 0, 255)

    y = ry[:h, :w]
    if gray:
        return y.copy()
    return _yuv420_to_rgb(y, ru[: (h + 1) // 2, : (w + 1) // 2],
                          rv[: (h + 1) // 2, : (w + 1) // 2])
