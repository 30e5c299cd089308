"""OpenStreetMap PBF codec — ``ogr/ogrsf_frmts/osm`` analog against the
public OSM PBF format (wiki.openstreetmap.org/wiki/PBF_Format,
protobuf definitions osmformat.proto / fileformat.proto).

File framing: repeated [ int32 BE header length | BlobHeader | Blob ].
BlobHeader { type=1 (string: OSMHeader/OSMData), datasize=3 }.
Blob { raw=1 | zlib_data=3, raw_size=2 }.  An OSMData blob holds one
PrimitiveBlock { stringtable=1 { s=1 repeated bytes },
primitivegroup=2 { dense=2 DenseNodes, ways=3 }, granularity=17
(default 100), lat_offset=19, lon_offset=20 }.  DenseNodes carry
packed DELTA-coded sint64 ids/lats/lons and an interleaved
keys_vals index list (0 terminates each node's tags); Ways carry
packed key/val indices and DELTA-coded sint64 node refs.
Coordinates: degrees = 1e-9 · (offset + granularity · value).

Reuses the varint/zigzag primitives from core/mvt (same wire format).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .mvt import _ld, _read_varint, _tag, _unzigzag, _varint, _zigzag

__all__ = ["encode_osm_pbf", "decode_osm_pbf"]

_GRAN = 100
_SCALE = 1e-9 * _GRAN        # degrees per stored unit at granularity 100


def _packed_sint_delta(vals) -> bytes:
    out = bytearray()
    last = 0
    for v in vals:
        out += _varint(_zigzag(int(v) - last))
        last = int(v)
    return bytes(out)


def _packed_varints(vals) -> bytes:
    return b"".join(_varint(int(v)) for v in vals)


def _parse_packed(payload: bytes, *, delta: bool, signed: bool):
    out = []
    pos = 0
    last = 0
    while pos < len(payload):
        v, pos = _read_varint(payload, pos)
        if signed:
            v = _unzigzag(v)
        if delta:
            last += v
            out.append(last)
        else:
            out.append(v)
    return out


def encode_osm_pbf(nodes, ways=(), *, compress: bool = True) -> bytes:
    """nodes: [(id, lon, lat, {tags})], ways: [(id, [node refs], {tags})]
    -> OSM PBF bytes (one OSMHeader + one OSMData blob, DenseNodes)."""
    strings: list[bytes] = [b""]          # index 0 reserved (spec)
    sidx: dict[bytes, int] = {}

    def intern(s: str) -> int:
        e = s.encode("utf-8")
        if e not in sidx:
            sidx[e] = len(strings)
            strings.append(e)
        return sidx[e]

    # --- DenseNodes group ---
    kv = []
    for _id, _lon, _lat, tags in nodes:
        for k, v in (tags or {}).items():
            kv.extend((intern(k), intern(str(v))))
        kv.append(0)
    dense = bytearray()
    dense += _ld(1, _packed_sint_delta([n[0] for n in nodes]))
    dense += _ld(8, _packed_sint_delta(
        [round(n[2] / _SCALE) for n in nodes]))       # lat = field 8
    dense += _ld(9, _packed_sint_delta(
        [round(n[1] / _SCALE) for n in nodes]))       # lon = field 9
    if any(tags for *_ignore, tags in nodes):
        dense += _ld(10, _packed_varints(kv))
    groups = [_ld(2, bytes(dense))] if nodes else []

    # --- Ways group(s) ---
    for wid, refs, tags in ways:
        w = bytearray()
        w += _tag(1, 0) + _varint(int(wid))
        if tags:
            w += _ld(2, _packed_varints([intern(k) for k in tags]))
            w += _ld(3, _packed_varints([intern(str(v))
                                         for v in tags.values()]))
        w += _ld(8, _packed_sint_delta(refs))
        groups.append(_ld(3, bytes(w)))
    if ways:
        groups = [groups[0]] + [b"".join(groups[1:])] if nodes \
            else [b"".join(groups)]

    st = _ld(1, b"".join(_ld(1, s) for s in strings))
    block = bytearray(st)
    for g in groups:
        block += _ld(2, g)
    block += _tag(17, 0) + _varint(_GRAN)
    block = bytes(block)

    def blob(payload: bytes, btype: str) -> bytes:
        if compress:
            body = (_tag(2, 0) + _varint(len(payload)) +
                    _ld(3, zlib.compress(payload, 6)))
        else:
            body = _ld(1, payload)
        bh = _ld(1, btype.encode()) + _tag(3, 0) + _varint(len(body))
        return struct.pack(">i", len(bh)) + bh + body

    header_block = _ld(4, b"DenseNodes")   # required_features = field 4
    return blob(header_block, "OSMHeader") + blob(block, "OSMData")


def _parse_stringtable(payload: bytes) -> list[str]:
    out = []
    pos = 0
    while pos < len(payload):
        key, pos = _read_varint(payload, pos)
        ln, pos = _read_varint(payload, pos)
        chunk = payload[pos:pos + ln]
        pos += ln
        if key >> 3 == 1:
            out.append(chunk.decode("utf-8", "replace"))
    return out


def decode_osm_pbf(data: bytes):
    """OSM PBF bytes -> (nodes [(id, lon, lat, tags)],
    ways [(id, refs, tags)])."""
    pos = 0
    nodes, ways = [], []
    while pos + 4 <= len(data):
        (hlen,) = struct.unpack_from(">i", data, pos)
        pos += 4
        bh = data[pos:pos + hlen]
        pos += hlen
        btype = b""
        dsize = 0
        p = 0
        while p < len(bh):
            key, p = _read_varint(bh, p)
            if key >> 3 == 1:
                ln, p = _read_varint(bh, p)
                btype = bh[p:p + ln]
                p += ln
            elif key >> 3 == 3:
                dsize, p = _read_varint(bh, p)
            else:
                ln, p = _read_varint(bh, p)
                p += ln
        body = data[pos:pos + dsize]
        pos += dsize
        raw = None
        p = 0
        while p < len(body):
            key, p = _read_varint(body, p)
            f, wire = key >> 3, key & 0x7
            if wire == 0:
                _v, p = _read_varint(body, p)
                continue
            ln, p = _read_varint(body, p)
            chunk = body[p:p + ln]
            p += ln
            if f == 1:
                raw = chunk
            elif f == 3:
                raw = zlib.decompress(chunk)
        if btype != b"OSMData" or raw is None:
            continue
        # PrimitiveBlock
        strings: list[str] = []
        groups: list[bytes] = []
        gran = _GRAN
        lat_off = lon_off = 0
        p = 0
        while p < len(raw):
            key, p = _read_varint(raw, p)
            f, wire = key >> 3, key & 0x7
            if wire == 0:
                v, p = _read_varint(raw, p)
                if v >= 1 << 63:
                    v -= 1 << 64           # proto int64: two's complement
                if f == 17:
                    gran = v
                elif f == 19:
                    lat_off = v
                elif f == 20:
                    lon_off = v
                continue
            ln, p = _read_varint(raw, p)
            chunk = raw[p:p + ln]
            p += ln
            if f == 1:
                strings = _parse_stringtable(chunk)
            elif f == 2:
                groups.append(chunk)
        scale = 1e-9 * gran
        for g in groups:
            p = 0
            while p < len(g):
                key, p = _read_varint(g, p)
                f = key >> 3
                ln, p = _read_varint(g, p)
                chunk = g[p:p + ln]
                p += ln
                if f == 2:      # DenseNodes
                    ids = lats = lons = []
                    kvs: list[int] = []
                    q = 0
                    while q < len(chunk):
                        k2, q = _read_varint(chunk, q)
                        l2, q = _read_varint(chunk, q)
                        pl = chunk[q:q + l2]
                        q += l2
                        f2 = k2 >> 3
                        if f2 == 1:
                            ids = _parse_packed(pl, delta=True, signed=True)
                        elif f2 == 8:
                            lats = _parse_packed(pl, delta=True, signed=True)
                        elif f2 == 9:
                            lons = _parse_packed(pl, delta=True, signed=True)
                        elif f2 == 10:
                            kvs = _parse_packed(pl, delta=False,
                                                signed=False)
                    tags_per: list[dict] = []
                    ti = 0
                    for _ in ids:
                        cur: dict = {}
                        while ti < len(kvs) and kvs[ti] != 0:
                            cur[strings[kvs[ti]]] = strings[kvs[ti + 1]]
                            ti += 2
                        ti += 1           # skip the 0 terminator
                        tags_per.append(cur)
                    for i, nid in enumerate(ids):
                        nodes.append((nid,
                                      1e-9 * (lon_off + gran * lons[i]),
                                      1e-9 * (lat_off + gran * lats[i]),
                                      tags_per[i]))
                elif f == 3:    # Way
                    wid = 0
                    refs: list[int] = []
                    wk: list[int] = []
                    wv: list[int] = []
                    q = 0
                    while q < len(chunk):
                        k2, q = _read_varint(chunk, q)
                        f2, wire2 = k2 >> 3, k2 & 0x7
                        if wire2 == 0:
                            v, q = _read_varint(chunk, q)
                            if f2 == 1:
                                wid = v
                            continue
                        l2, q = _read_varint(chunk, q)
                        pl = chunk[q:q + l2]
                        q += l2
                        if f2 == 8:
                            refs = _parse_packed(pl, delta=True, signed=True)
                        elif f2 == 2:
                            wk = _parse_packed(pl, delta=False, signed=False)
                        elif f2 == 3:
                            wv = _parse_packed(pl, delta=False, signed=False)
                    ways.append((wid, refs,
                                 {strings[k]: strings[v]
                                  for k, v in zip(wk, wv)}))
    return nodes, ways
