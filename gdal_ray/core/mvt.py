"""Mapbox Vector Tile codec — ``ogr/ogrsf_frmts/mvt/mvtwriterlayer.cpp`` /
``mvt/ogrmvtdataset.cpp`` analog, written against the public MVT 2.1 spec
(https://github.com/mapbox/vector-tile-spec/tree/master/2.1).

Hand-rolled protobuf wire format (varint + length-delimited only — the
whole .proto uses nothing else):

  Tile    { repeated Layer layers = 3; }
  Layer   { uint32 version = 15 (=2); string name = 1;
            repeated Feature features = 2; repeated string keys = 3;
            repeated Value values = 4; uint32 extent = 5 (=4096); }
  Feature { uint64 id = 1; packed uint32 tags = 2; GeomType type = 3;
            packed uint32 geometry = 4; }
  Value   { oneof: string=1 float=2 double=3 int64=4 uint64=5
            sint64=6 bool=7 }

Geometry commands: CommandInteger = (id & 0x7) | (count << 3) with
MoveTo=1, LineTo=2, ClosePath=7; parameters are zigzag-encoded coordinate
DELTAS in integer tile units (extent 4096 across the tile).  Polygon ring
winding per spec 4.3.4.4: exterior rings positive (CW in screen space,
where y grows down), interior rings negative.

Feature dicts: ``{"type": "Point"|"LineString"|"Polygon", coords...,
"props": {k: v}}`` with coordinates already in integer tile units; the
pipeline layer (pipelines/vectortiles.py) does the geographic → tile
transform."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_tile", "decode_tile", "EXTENT"]

EXTENT = 4096

_MOVETO, _LINETO, _CLOSEPATH = 1, 2, 7
_GEOM_TYPES = {"Point": 1, "LineString": 2, "Polygon": 3}
_GEOM_NAMES = {v: k for k, v in _GEOM_TYPES.items()}


# ---------- protobuf primitives ----------

def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


# ---------- Value messages ----------

def _value_bytes(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(int(v))
    if isinstance(v, (int, np.integer)):
        v = int(v)
        if v >= 0:
            return _tag(4, 0) + _varint(v)
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, (float, np.floating)):
        return _tag(3, 1) + struct.pack("<d", float(v))
    if isinstance(v, bytes):
        return _ld(1, v)
    return _ld(1, str(v).encode("utf-8"))


def _parse_value(payload: bytes):
    buf = memoryview(payload)
    pos = 0
    key, pos = _read_varint(buf, pos)
    field, wire = key >> 3, key & 0x7
    if field == 1:
        ln, pos = _read_varint(buf, pos)
        return bytes(buf[pos:pos + ln]).decode("utf-8")
    if field == 2:
        return struct.unpack_from("<f", buf, pos)[0]
    if field == 3:
        return struct.unpack_from("<d", buf, pos)[0]
    n, pos = _read_varint(buf, pos)
    if field == 4 or field == 5:
        return n
    if field == 6:
        return _unzigzag(n)
    if field == 7:
        return bool(n)
    raise ValueError(f"unknown Value field {field}")


# ---------- geometry commands ----------

def _cmd(cid: int, count: int) -> int:
    return (cid & 0x7) | (count << 3)


def _encode_geometry(feat: dict) -> list[int]:
    t = feat["type"]
    out: list[int] = []
    cx = cy = 0

    def moveline(pts: np.ndarray, close: bool):
        nonlocal cx, cy
        pts = np.asarray(pts, dtype=np.int64)
        n = len(pts) - (1 if close else 0)  # spec: closing vertex implicit
        out.append(_cmd(_MOVETO, 1))
        out.append(_zigzag(int(pts[0, 0]) - cx))
        out.append(_zigzag(int(pts[0, 1]) - cy))
        cx, cy = int(pts[0, 0]), int(pts[0, 1])
        out.append(_cmd(_LINETO, n - 1))
        for k in range(1, n):
            out.append(_zigzag(int(pts[k, 0]) - cx))
            out.append(_zigzag(int(pts[k, 1]) - cy))
            cx, cy = int(pts[k, 0]), int(pts[k, 1])
        if close:
            out.append(_cmd(_CLOSEPATH, 1))

    if t == "Point":
        xy = np.asarray(feat["xy"], dtype=np.int64).reshape(-1, 2)
        out.append(_cmd(_MOVETO, len(xy)))
        for p in xy:
            out.append(_zigzag(int(p[0]) - cx))
            out.append(_zigzag(int(p[1]) - cy))
            cx, cy = int(p[0]), int(p[1])
    elif t == "LineString":
        moveline(np.asarray(feat["xy"]), close=False)
    elif t == "Polygon":
        for ring in feat["rings"]:
            moveline(np.asarray(ring), close=True)
    else:
        raise ValueError(f"MVT cannot encode {t}")
    return out


def _decode_geometry(cmds: list[int], gtype: int) -> dict:
    pos = 0
    cx = cy = 0
    paths: list[np.ndarray] = []
    cur: list[tuple[int, int]] = []
    while pos < len(cmds):
        cid, count = cmds[pos] & 0x7, cmds[pos] >> 3
        pos += 1
        if cid == _MOVETO:
            for _ in range(count):
                cx += _unzigzag(cmds[pos]); cy += _unzigzag(cmds[pos + 1])
                pos += 2
                if gtype == 1:
                    cur.append((cx, cy))
                else:
                    if cur:
                        paths.append(np.array(cur, dtype=np.int64))
                    cur = [(cx, cy)]
        elif cid == _LINETO:
            for _ in range(count):
                cx += _unzigzag(cmds[pos]); cy += _unzigzag(cmds[pos + 1])
                pos += 2
                cur.append((cx, cy))
        elif cid == _CLOSEPATH:
            cur.append(cur[0])  # re-materialize the implicit closing vertex
        else:
            raise ValueError(f"unknown command {cid}")
    if cur:
        paths.append(np.array(cur, dtype=np.int64))
    if gtype == 1:
        return {"type": "Point", "xy": paths[-1] if paths else
                np.array(cur, dtype=np.int64)}
    if gtype == 2:
        return {"type": "LineString", "xy": paths[0]} if len(paths) == 1 \
            else {"type": "MultiLineString", "lines": paths}
    return {"type": "Polygon", "rings": paths}


# ---------- tile encode / decode ----------

def encode_tile(layers: dict) -> bytes:
    """{layer_name: [feature dicts]} -> MVT tile bytes.

    Feature dict: type/coords in integer tile units (see module doc),
    optional ``id`` (int) and ``props`` ({key: str|int|float|bool})."""
    out = bytearray()
    for name, feats in layers.items():
        keys: list = []
        vals: list = []
        kidx: dict = {}
        vidx: dict = {}
        fbodies = []
        for f in feats:
            tags = []
            for k, v in (f.get("props") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(vals)
                    vals.append(v)
                tags.extend((kidx[k], vidx[vk]))
            body = bytearray()
            if "id" in f:
                body += _tag(1, 0) + _varint(int(f["id"]))
            if tags:
                payload = b"".join(_varint(t) for t in tags)
                body += _ld(2, payload)
            body += _tag(3, 0) + _varint(_GEOM_TYPES[f["type"]])
            geom = _encode_geometry(f)
            body += _ld(4, b"".join(_varint(g) for g in geom))
            fbodies.append(bytes(body))
        lbody = bytearray()
        lbody += _tag(15, 0) + _varint(2)          # version
        lbody += _ld(1, name.encode("utf-8"))
        for fb in fbodies:
            lbody += _ld(2, fb)
        for k in keys:
            lbody += _ld(3, k.encode("utf-8"))
        for v in vals:
            lbody += _ld(4, _value_bytes(v))
        lbody += _tag(5, 0) + _varint(EXTENT)
        out += _ld(3, bytes(lbody))
    return bytes(out)


def _parse_feature(payload: bytes, keys: list, vals: list) -> dict:
    buf = memoryview(payload)
    pos = 0
    fid = None
    tags: list[int] = []
    gtype = 0
    cmds: list[int] = []
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 1:
            fid, pos = _read_varint(buf, pos)
        elif field == 2:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                t, pos = _read_varint(buf, pos)
                tags.append(t)
        elif field == 3:
            gtype, pos = _read_varint(buf, pos)
        elif field == 4:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                c, pos = _read_varint(buf, pos)
                cmds.append(c)
        else:
            raise ValueError(f"unknown Feature field {field}")
    f = _decode_geometry(cmds, gtype)
    if fid is not None:
        f["id"] = fid
    props = {}
    for i in range(0, len(tags), 2):
        props[keys[tags[i]]] = vals[tags[i + 1]]
    f["props"] = props
    return f


def decode_tile(data: bytes) -> dict:
    """MVT tile bytes -> {layer_name: {"extent": int, "version": int,
    "features": [feature dicts]}}."""
    buf = memoryview(data)
    pos = 0
    layers: dict = {}
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field = key >> 3
        ln, pos = _read_varint(buf, pos)
        payload = bytes(buf[pos:pos + ln])
        pos += ln
        if field != 3:
            continue
        lbuf = memoryview(payload)
        lp = 0
        name = ""
        version = 1
        extent = EXTENT
        fpayloads: list[bytes] = []
        keys: list[str] = []
        vals: list = []
        while lp < len(lbuf):
            k, lp = _read_varint(lbuf, lp)
            f, wire = k >> 3, k & 0x7
            if wire == 0:
                n, lp = _read_varint(lbuf, lp)
                if f == 15:
                    version = n
                elif f == 5:
                    extent = n
            else:
                n, lp = _read_varint(lbuf, lp)
                chunk = bytes(lbuf[lp:lp + n])
                lp += n
                if f == 1:
                    name = chunk.decode("utf-8")
                elif f == 2:
                    fpayloads.append(chunk)
                elif f == 3:
                    keys.append(chunk.decode("utf-8"))
                elif f == 4:
                    vals.append(_parse_value(chunk))
        layers[name] = {
            "version": version, "extent": extent,
            "features": [_parse_feature(fp, keys, vals)
                         for fp in fpayloads]}
    return layers
