"""MicroStation DGN v7 (ISFF) vector codec — ``ogr/ogrsf_frmts/dgn``
analog (dgnlib read/write paths), pure stdlib/numpy.

Covered element set (the geometric core the reference's OGR layer maps
to features): LINE(3), LINE_STRING(4), SHAPE(6) in 2-D, with the TCB
header element carrying units + global origin.  Other element types
(text, arcs, cells) are SKIPPED on read with a per-type count returned —
the reference's layer likewise filters to convertible types.  Writing
builds the TCB from the documented field offsets (no seed file).

Layout facts (dgnread.cpp / dgnwrite.cpp / port/cpl_vax.cpp):
  - element header: byte0 = level | 0x80(complex), byte1 = type |
    0x80(deleted), bytes2-3 = following WORD count (LE);
  - int32 fields are word-swapped: [hi word LE][lo word LE];
  - element bounds at bytes 4..27 (min/max xyz int32) stored in
    "binary offset" form (sign byte XOR 0x80);
  - LINE vertices at byte 36; LINE_STRING/SHAPE: count at 36, vertices
    from 38; coordinates are UORs, master = uor * scale - origin;
  - TCB (type 9, 766 words): subunits_per_master @1112,
    uor_per_subunit @1116, unit names @1120/1122, 3-D flag @1214&0x40,
    global origin as VAX doubles @1240/1248/1256 (in UORs);
  - file ends with an 0xFFFF marker.
"""

from __future__ import annotations

import struct

import numpy as np

from . import wkb

__all__ = ["encode_dgn", "decode_dgn"]

DGNT_LINE = 3
DGNT_LINE_STRING = 4
DGNT_SHAPE = 6
DGNT_TCB = 9


def _int32_pack(v: int) -> bytes:
    """int32 -> DGN word-swapped bytes ([hi word LE][lo word LE])."""
    u = v & 0xFFFFFFFF
    return bytes(((u >> 16) & 0xFF, (u >> 24) & 0xFF,
                  u & 0xFF, (u >> 8) & 0xFF))


def _int32_unpack(b: bytes, off: int) -> int:
    u = (b[off + 2] + (b[off + 3] << 8) + (b[off] << 16)
         + (b[off + 1] << 24))
    return u - 0x100000000 if u & 0x80000000 else u


def _ieee_to_vax(x: float) -> bytes:
    """IEEE double -> VAX D-float bytes (port/cpl_vax.cpp
    CPLIEEEToVaxDouble)."""
    hi, lo = struct.unpack(">II", struct.pack(">d", x))
    sign = hi & 0x80000000
    exponent = (hi >> 20) & 0x7FF
    if exponent:
        exponent = exponent - 1023 + 129
    if exponent > 255:
        raise ValueError("DGN: double overflow for VAX format")
    if exponent < 0 or (exponent == 0 and sign == 0):
        return b"\0" * 8
    nhi = ((hi << 3) | (lo >> 29)) & 0x007FFFFF
    nhi |= (exponent << 23) | sign
    nlo = (lo << 3) & 0xFFFFFFFF
    be = struct.pack(">II", nhi, nlo)
    # word-swap within each half (VAX byte order)
    return bytes((be[1], be[0], be[3], be[2], be[5], be[4], be[7], be[6]))


def _vax_to_ieee(b: bytes, off: int) -> float:
    """VAX D-float bytes -> IEEE double (CPLVaxToIEEEDouble)."""
    s = b[off:off + 8]
    be = bytes((s[1], s[0], s[3], s[2], s[5], s[4], s[7], s[6]))
    hi, lo = struct.unpack(">II", be)
    sign = hi & 0x80000000
    exponent = (hi >> 23) & 0xFF
    if exponent:
        exponent = exponent - 129 + 1023
    rnd = lo & 0x7
    nlo = ((lo >> 3) & 0x1FFFFFFF) | ((hi << 29) & 0xFFFFFFFF)
    if rnd:
        nlo |= 1
    nhi = (hi >> 3) & 0x000FFFFF
    nhi |= (exponent << 20) | sign
    return struct.unpack(">d", struct.pack(">II", nhi, nlo))[0]


_UPS = 1000          # uor per subunit
_SPM = 10            # subunits per master


def _tcb_element(dim3: bool = False) -> bytes:
    e = bytearray(1536)
    e[0] = 0x08
    e[1] = DGNT_TCB
    e[2] = 0xFE
    e[3] = 0x02
    e[1112:1116] = _int32_pack(_SPM)
    e[1116:1120] = _int32_pack(_UPS)
    e[1120:1122] = b"m "
    e[1122:1124] = b"mm"
    if dim3:
        e[1214] |= 0x40
    for off in (1240, 1248, 1256):
        e[off:off + 8] = _ieee_to_vax(0.0)       # global origin, UORs
    return bytes(e)


def _to_uor(xy: np.ndarray) -> np.ndarray:
    u = np.rint(np.asarray(xy, np.float64) * (_UPS * _SPM)).astype(np.int64)
    if (np.abs(u) >= 2**31).any():
        raise ValueError("DGN: coordinate exceeds the UOR int32 range at "
                         f"resolution 1/{_UPS * _SPM} master units")
    return u


def _element(etype: int, level: int, pts_uor: np.ndarray,
             with_count: bool) -> bytes:
    n = len(pts_uor)
    body_off = 38 if with_count else 36
    raw = bytearray(body_off + 4 * 2 * n)
    nwords = (len(raw) - 4) // 2
    raw[0] = level & 0x3F
    raw[1] = etype
    raw[2] = nwords % 256
    raw[3] = nwords // 256
    mn = pts_uor.min(axis=0)
    mx = pts_uor.max(axis=0)
    raw[4:8] = _int32_pack(int(mn[0]))
    raw[8:12] = _int32_pack(int(mn[1]))
    raw[12:16] = _int32_pack(0)
    raw[16:20] = _int32_pack(int(mx[0]))
    raw[20:24] = _int32_pack(int(mx[1]))
    raw[24:28] = _int32_pack(0)
    for off in (5, 9, 13, 17, 21, 25):           # binary-offset signs
        raw[off] ^= 0x80
    att = (len(raw) - 32) // 2
    raw[30] = att % 256
    raw[31] = att // 256
    if with_count:
        raw[36] = n % 256
        raw[37] = n // 256
    for i, (x, y) in enumerate(pts_uor):
        raw[body_off + 8 * i: body_off + 8 * i + 4] = _int32_pack(int(x))
        raw[body_off + 8 * i + 4: body_off + 8 * i + 8] = \
            _int32_pack(int(y))
    return bytes(raw)


def encode_dgn(geoms: list, *, levels=None) -> bytes:
    """List of parsed geometries (``wkb.loads`` form; Point is written
    as a 2-vertex degenerate LINE like the reference's OGR layer does)
    -> DGN v7 2-D bytes."""
    out = [_tcb_element()]
    levels = levels or [0] * len(geoms)
    for g, lvl in zip(geoms, levels):
        t = g["type"]
        if t == "LineString":
            xy = _to_uor(g["xy"])
            if len(xy) == 2:
                out.append(_element(DGNT_LINE, lvl, xy, False))
            else:
                if len(xy) > 101:
                    raise ValueError("DGN: elements hold at most 101 "
                                     "vertices (dgnwrite.cpp)")
                out.append(_element(DGNT_LINE_STRING, lvl, xy, True))
        elif t == "Polygon":
            if len(g["rings"]) > 1:
                raise ValueError("DGN SHAPE elements carry one ring; "
                                 "write holes as separate shapes")
            xy = _to_uor(g["rings"][0])
            if len(xy) > 101:
                raise ValueError("DGN: elements hold at most 101 vertices")
            out.append(_element(DGNT_SHAPE, lvl, xy, True))
        elif t == "Point":
            xy = _to_uor(np.vstack([g["xy"], g["xy"]]))
            out.append(_element(DGNT_LINE, lvl, xy, False))
        else:
            raise ValueError(f"DGN writer does not handle {t}")
    out.append(b"\xff\xff")
    return b"".join(out)


def decode_dgn(data: bytes):
    """DGN v7 bytes -> (rows, skipped) where rows is a list of
    ``(element_type, level, wkb_bytes)`` and skipped maps unhandled
    element types to their counts."""
    if len(data) < 4 or data[1] & 0x7F != DGNT_TCB or \
            data[0] not in (0x08, 0xC8):
        raise ValueError("DGN: missing TCB header element")
    pos = 0
    scale = 1.0
    ox = oy = 0.0
    rows = []
    skipped: dict[int, int] = {}
    dim = 3 if data[0] == 0xC8 else 2
    while pos + 4 <= len(data):
        if data[pos] == 0xFF and data[pos + 1] == 0xFF:
            break
        nwords = data[pos + 2] + data[pos + 3] * 256
        etype = data[pos + 1] & 0x7F
        level = data[pos] & 0x3F
        deleted = bool(data[pos + 1] & 0x80)
        e = data[pos:pos + 4 + 2 * nwords]
        pos += 4 + 2 * nwords
        if len(e) < 4 + 2 * nwords or deleted:
            continue
        if etype == DGNT_TCB:
            spm = _int32_unpack(e, 1112)
            ups = _int32_unpack(e, 1116)
            dim = 3 if e[1214] & 0x40 else 2
            if ups and spm:
                scale = 1.0 / (ups * spm)
            ox = _vax_to_ieee(e, 1240) * scale
            oy = _vax_to_ieee(e, 1248) * scale
            continue
        psize = 4 * dim
        if etype == DGNT_LINE:
            pts = [(_int32_unpack(e, 36 + i * psize),
                    _int32_unpack(e, 36 + i * psize + 4))
                   for i in range(2)]
        elif etype in (DGNT_LINE_STRING, DGNT_SHAPE):
            n = e[36] + e[37] * 256
            n = min(n, (len(e) - 38) // psize)
            pts = [(_int32_unpack(e, 38 + i * psize),
                    _int32_unpack(e, 38 + i * psize + 4))
                   for i in range(n)]
        else:
            skipped[etype] = skipped.get(etype, 0) + 1
            continue
        xy = np.asarray(pts, np.float64) * scale
        xy[:, 0] -= ox
        xy[:, 1] -= oy
        if etype == DGNT_SHAPE:
            if not np.array_equal(xy[0], xy[-1]):
                xy = np.vstack([xy, xy[:1]])
            blob = wkb.dumps({"type": "Polygon", "rings": [xy]})
        elif etype == DGNT_LINE and np.array_equal(xy[0], xy[1]):
            blob = wkb.dumps({"type": "Point", "xy": xy[0]})
        else:
            blob = wkb.dumps({"type": "LineString", "xy": xy})
        rows.append((etype, level, blob))
    return rows, skipped
