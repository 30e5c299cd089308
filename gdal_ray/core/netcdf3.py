"""netCDF-3 classic codec — the raster subset of ``frmts/netcdf`` against
the public NetCDF Classic Format specification (CDF-1 magic ``CDF\\x01``;
CDF-2 64-bit-offset variant read too).

Layout: magic, numrecs, dim_list, gatt_list, var_list (each variable:
name, dimids, attributes, nc_type, vsize, begin offset), then raw
big-endian data blocks.  Non-record (fixed-size) variables only — the
record dimension raises, which is the honest boundary for raster use
(GDAL's netCDF raster path reads fixed 2-D grids the same way).

API: ``encode_netcdf(dims, variables, global_attrs)`` /
``decode_netcdf(data) -> (dims, variables, global_attrs)`` where
``variables`` maps name -> {"dims": (names…), "data": ndarray,
"attrs": {…}}."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_netcdf", "decode_netcdf"]

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
# nc_type -> numpy dtype (big-endian on disk)
_TYPES = {1: ">i1", 2: "S1", 3: ">i2", 4: ">i4", 5: ">f4", 6: ">f8"}
_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}
_CODES = {np.dtype(np.int8): 1, np.dtype(np.int16): 3,
          np.dtype(np.int32): 4, np.dtype(np.float32): 5,
          np.dtype(np.float64): 6}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(b: str) -> bytes:
    e = b.encode("utf-8")
    return struct.pack(">i", len(e)) + _pad4(e)


def _attr_bytes(name: str, v) -> bytes:
    if isinstance(v, str):
        e = v.encode("utf-8")
        return (_name(name) + struct.pack(">ii", 2, len(e)) + _pad4(e))
    arr = np.atleast_1d(np.asarray(v))
    code = _CODES.get(arr.dtype)
    if code is None:
        if np.issubdtype(arr.dtype, np.integer) and \
                (arr >= -2**31).all() and (arr < 2**31).all():
            arr = arr.astype(np.int32)   # netCDF-3 has no 64-bit: NC_INT
            code = 4                     # when in range, else double below
        else:
            arr = arr.astype(np.float64)
            code = 6
    raw = arr.astype(_TYPES[code]).tobytes()
    return _name(name) + struct.pack(">ii", code, len(arr)) + _pad4(raw)


def _attrs_block(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)   # ABSENT = two zero words
    return (struct.pack(">ii", _NC_ATTRIBUTE, len(attrs)) +
            b"".join(_attr_bytes(k, v) for k, v in attrs.items()))


def encode_netcdf(dims: dict, variables: dict,
                  global_attrs: dict | None = None) -> bytes:
    """dims: {name: length}; variables: {name: {"dims": (dimname…),
    "data": ndarray, "attrs": {…}}} -> CDF-1 bytes."""
    dimnames = list(dims)
    dimids = {n: i for i, n in enumerate(dimnames)}
    header = bytearray()
    header += b"CDF\x01" + struct.pack(">i", 0)          # numrecs = 0
    header += struct.pack(">ii", _NC_DIMENSION, len(dims))
    for n in dimnames:
        header += _name(n) + struct.pack(">i", int(dims[n]))
    header += _attrs_block(global_attrs or {})

    # variable headers need data offsets: lay data out after the header;
    # compute header size with placeholder offsets first (fixed width)
    vorder = list(variables)
    vheads = []
    for vn in vorder:
        v = variables[vn]
        arr = np.asarray(v["data"])
        vattrs = dict(v.get("attrs") or {})
        if arr.dtype == np.uint8:
            # netCDF-3 classic has no unsigned types: store as NC_BYTE
            # with the standard _Unsigned="true" marker (same convention
            # the reference's netCDF driver reads Byte rasters through)
            arr = arr.view(np.int8)
            vattrs.setdefault("_Unsigned", "true")
        code = _CODES.get(arr.dtype)
        if code is None:
            raise ValueError(f"netCDF-3 cannot store dtype {arr.dtype}")
        vsize = arr.size * _SIZES[code]
        vsize += -vsize % 4
        head = (_name(vn) + struct.pack(">i", len(v["dims"])) +
                b"".join(struct.pack(">i", dimids[d]) for d in v["dims"]) +
                _attrs_block(vattrs) +
                struct.pack(">ii", code, vsize))
        vheads.append((head, arr, code, vsize))
    fixed = len(header) + struct.pack(">ii", _NC_VARIABLE, len(vorder)) \
        .__len__() + sum(len(h) + 4 for h, *_ in vheads)  # +4: begin word
    out = bytearray(header)
    out += struct.pack(">ii", _NC_VARIABLE, len(vorder)) if vorder \
        else struct.pack(">ii", 0, 0)
    begin = fixed
    datas = []
    for head, arr, code, vsize in vheads:
        out += head + struct.pack(">i", begin)
        raw = _pad4(arr.astype(_TYPES[code]).tobytes())
        datas.append(raw)
        begin += len(raw)
    for raw in datas:
        out += raw
    return bytes(out)


def decode_netcdf(data: bytes):
    """CDF-1/CDF-2 bytes -> (dims, variables, global_attrs)."""
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a netCDF classic file")
    offw = ">i" if data[3] == 1 else ">q"
    buf = memoryview(data)
    pos = 4 + 4                                   # skip numrecs

    def i4():
        nonlocal pos
        (v,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        return v

    def name():
        nonlocal pos
        n = i4()
        s = bytes(buf[pos:pos + n]).decode("utf-8")
        pos += n + (-n % 4)
        return s

    def attrs():
        nonlocal pos
        tag, cnt = i4(), i4()
        out = {}
        for _ in range(cnt if tag == _NC_ATTRIBUTE else 0):
            an = name()
            code, ne = i4(), i4()
            nb = ne * _SIZES[code]
            raw = bytes(buf[pos:pos + nb])
            pos += nb + (-nb % 4)
            if code == 2:
                out[an] = raw.decode("utf-8")
            else:
                a = np.frombuffer(raw, dtype=_TYPES[code])
                out[an] = a[0] if ne == 1 else a
        return out

    tag, ndims = i4(), i4()
    dimnames, dimlens = [], []
    for _ in range(ndims if tag == _NC_DIMENSION else 0):
        dimnames.append(name())
        dimlens.append(i4())
    if 0 in dimlens:
        raise NotImplementedError("netCDF record dimension not supported")
    gatts = attrs()
    tag, nvars = i4(), i4()
    variables = {}
    for _ in range(nvars if tag == _NC_VARIABLE else 0):
        vn = name()
        nd = i4()
        vdims = tuple(dimnames[i4()] for i in range(nd))
        vatts = attrs()
        code = i4()
        _vsize = i4()
        (begin,) = struct.unpack_from(offw, buf, pos)
        pos += struct.calcsize(offw)
        shape = tuple(dimlens[dimnames.index(d)] for d in vdims)
        n = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, dtype=_TYPES[code], count=n,
                            offset=begin).reshape(shape)
        arr = arr.astype(np.dtype(_TYPES[code]).newbyteorder("="))
        if code == 1 and str(vatts.get("_Unsigned", "")).lower() == "true":
            arr = arr.view(np.uint8)     # the CF/_Unsigned byte convention
        variables[vn] = {"dims": vdims, "data": arr, "attrs": vatts}
    return dict(zip(dimnames, dimlens)), variables, gatts
