"""Raw-binary grid codecs — BT, GTX, EHdr, Idrisi RST and ERS analogs
(``frmts/raw/btdataset.cpp``, ``frmts/raw/gtxdataset.cpp``,
``frmts/raw/ehdrdataset.cpp``, ``frmts/idrisi``, ``frmts/ers``).

Same conventions as :mod:`demgrids`: decoders return ``(array,
geotransform, nodata)`` with array row 0 = NORTH; encoders take that
orientation.  Multi-file formats (EHdr/Idrisi/ERS) return/accept a
``(header_bytes, data_bytes)`` pair.
"""

from __future__ import annotations

import struct

import numpy as np

from .wkt import format_double as _num

__all__ = [
    "encode_bt", "decode_bt",
    "encode_gtx", "decode_gtx",
    "encode_ehdr", "decode_ehdr",
    "encode_idrisi", "decode_idrisi",
    "encode_ers", "decode_ers",
]


# ---------- BT binary terrain (frmts/raw/btdataset.cpp) ----------

def encode_bt(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """2-D int16/int32/float32 grid (row 0 = north) -> BT 1.3 bytes:
    256-byte 'binterr1.3' header (little-endian dims/extents), data
    COLUMN-MAJOR west->east with each column stored SOUTH->NORTH
    (btdataset.cpp IReadBlock reverses on read)."""
    arr = np.asarray(arr)
    if arr.dtype == np.int16:
        dsize, isfloat = 2, 0
    elif arr.dtype == np.int32:
        dsize, isfloat = 4, 0
    elif arr.dtype == np.float32:
        dsize, isfloat = 4, 1
    else:
        raise ValueError("BT stores int16/int32/float32")
    nrows, ncols = arr.shape
    left = gt[0]
    right = gt[0] + gt[1] * ncols
    top = gt[3]
    bottom = gt[3] + gt[5] * nrows
    hdr = bytearray(256)
    hdr[0:10] = b"binterr1.3"
    struct.pack_into("<i", hdr, 10, ncols)
    struct.pack_into("<i", hdr, 14, nrows)
    struct.pack_into("<h", hdr, 18, dsize)
    hdr[20] = isfloat
    struct.pack_into("<h", hdr, 22, 1)            # horizontal units
    struct.pack_into("<4d", hdr, 28, left, right, bottom, top)
    struct.pack_into("<f", hdr, 62, 1.0)          # vertical scale
    body = np.ascontiguousarray(arr[::-1, :].T)   # col-major, south-first
    return bytes(hdr) + body.astype(arr.dtype.newbyteorder("<")).tobytes()


def decode_bt(data: bytes):
    if data[:7] != b"binterr":
        raise ValueError("BT: missing binterr signature")
    ncols, = struct.unpack_from("<i", data, 10)
    nrows, = struct.unpack_from("<i", data, 14)
    dsize, = struct.unpack_from("<h", data, 18)
    isfloat = data[20]
    left, right, bottom, top = struct.unpack_from("<4d", data, 28)
    if isfloat and dsize == 4:
        dt = np.dtype("<f4")
    elif dsize == 4:
        dt = np.dtype("<i4")
    elif dsize == 2:
        dt = np.dtype("<i2")
    else:
        raise ValueError(f"BT: unknown data size {dsize}")
    cols = np.frombuffer(data, dtype=dt, count=nrows * ncols,
                         offset=256).reshape(ncols, nrows)
    arr = np.ascontiguousarray(cols.T[::-1, :]).astype(dt.newbyteorder("="))
    gt = (left, (right - left) / ncols, 0.0,
          top, 0.0, -(top - bottom) / nrows)
    return arr, gt, None


# ---------- GTX vertical datum grid (frmts/raw/gtxdataset.cpp) ----------

def encode_gtx(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """2-D float32/float64 grid (row 0 = north) -> NOAA .gtx bytes:
    40-byte BIG-endian header (south-west sample lat/lon, spacings,
    rows, cols — pixel-is-point), rows stored SOUTH to NORTH."""
    arr = np.asarray(arr)
    if arr.dtype not in (np.float32, np.float64):
        raise ValueError("GTX stores float32/float64")
    nrows, ncols = arr.shape
    dlon, dlat = gt[1], -gt[5]
    xll = gt[0] + dlon / 2.0
    yll = gt[3] + gt[5] * (nrows - 0.5)
    hdr = struct.pack(">4d2i", yll, xll, dlat, dlon, nrows, ncols)
    return hdr + arr[::-1, :].astype(
        arr.dtype.newbyteorder(">")).tobytes()


def decode_gtx(data: bytes):
    yll, xll, dlat, dlon, nrows, ncols = struct.unpack_from(">4d2i", data, 0)
    n = nrows * ncols
    dt = np.dtype(">f8") if len(data) - 40 == 8 * n else np.dtype(">f4")
    arr = np.frombuffer(data, dtype=dt, count=n,
                        offset=40).reshape(nrows, ncols)[::-1, :]
    arr = np.ascontiguousarray(arr).astype(dt.newbyteorder("="))
    gt = (xll - dlon / 2.0, dlon, 0.0,
          yll + dlat * (nrows - 0.5), 0.0, -dlat)
    return arr, gt, -88.8888


# ---------- EHdr / ESRI BIL (frmts/raw/ehdrdataset.cpp) ----------

_EHDR_DT = {(8, "UNSIGNEDINT"): "u1", (8, "SIGNEDINT"): "i1",
            (16, "UNSIGNEDINT"): "u2", (16, "SIGNEDINT"): "i2",
            (32, "UNSIGNEDINT"): "u4", (32, "SIGNEDINT"): "i4",
            (32, "FLOAT"): "f4", (64, "FLOAT"): "f8"}


def _ehdr_pixeltype(dt: np.dtype) -> str:
    if dt.kind == "f":
        return "FLOAT"
    return "SIGNEDINT" if dt.kind == "i" else "UNSIGNEDINT"


def encode_ehdr(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
                nodata=None, layout: str = "BIL") -> tuple[bytes, bytes]:
    """(bands,rows,cols) or (rows,cols) array -> (.hdr text, raw bytes).
    ULXMAP/ULYMAP are CELL CENTERS of the upper-left pixel (the ESRI
    convention the reference writer emits); LAYOUT BIL/BIP/BSQ are pure
    transposes of the (band,row,col) cube."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, nrows, ncols = arr.shape
    nbits = arr.dtype.itemsize * 8
    if (nbits, _ehdr_pixeltype(arr.dtype)) not in _EHDR_DT:
        raise ValueError(f"EHdr: unsupported dtype {arr.dtype}")
    lay = layout.upper()
    hdr = [f"NROWS          {nrows}",
           f"NCOLS          {ncols}",
           f"NBANDS         {nb}",
           f"NBITS          {nbits}",
           f"PIXELTYPE      {_ehdr_pixeltype(arr.dtype)}",
           "BYTEORDER      I",
           f"LAYOUT         {lay}",
           f"ULXMAP         {_num(gt[0] + gt[1] / 2.0)}",
           f"ULYMAP         {_num(gt[3] + gt[5] / 2.0)}",
           f"XDIM           {_num(gt[1])}",
           f"YDIM           {_num(-gt[5])}"]
    if nodata is not None:
        hdr.append(f"NODATA         {_num(nodata)}")
    if lay == "BIL":
        cube = arr.transpose(1, 0, 2)                 # (row, band, col)
    elif lay == "BIP":
        cube = arr.transpose(1, 2, 0)                 # (row, col, band)
    elif lay == "BSQ":
        cube = arr
    else:
        raise ValueError(f"EHdr: unknown layout {layout!r}")
    raw = np.ascontiguousarray(cube).astype(
        arr.dtype.newbyteorder("<")).tobytes()
    return ("\n".join(hdr) + "\n").encode("ascii"), raw


def decode_ehdr(hdr: bytes, raw: bytes):
    """(.hdr, raw bytes) -> (array (bands,rows,cols) or 2-D when one
    band, geotransform, nodata)."""
    kv: dict[str, str] = {}
    for line in hdr.decode("ascii", errors="replace").splitlines():
        parts = line.split()
        if len(parts) >= 2:
            kv[parts[0].upper()] = parts[1]
    nrows, ncols = int(kv["NROWS"]), int(kv["NCOLS"])
    nb = int(kv.get("NBANDS", "1"))
    nbits = int(kv.get("NBITS", "8"))
    ptype = kv.get("PIXELTYPE", "UNSIGNEDINT").upper()
    code = _EHDR_DT.get((nbits, ptype))
    if code is None:
        raise ValueError(f"EHdr: unsupported NBITS={nbits} "
                         f"PIXELTYPE={ptype}")
    dt = np.dtype(code)
    dt = dt.newbyteorder(">" if kv.get("BYTEORDER", "I").upper()
                         in ("M", "MSBFIRST") else "<")
    dx = float(kv.get("XDIM", kv.get("CELLSIZE", "1")))
    dy = float(kv.get("YDIM", kv.get("CELLSIZE", "1")))
    if "ULXMAP" in kv:
        x0 = float(kv["ULXMAP"]) - dx / 2.0
        y0 = float(kv["ULYMAP"]) + dy / 2.0
    else:                                     # xllcorner family
        x0 = float(kv.get("XLLCORNER", "0"))
        y0 = float(kv.get("YLLCORNER", "0")) + nrows * dy
    lay = kv.get("LAYOUT", "BIL").upper()
    flat = np.frombuffer(raw, dtype=dt, count=nb * nrows * ncols)
    if lay == "BIL":
        cube = flat.reshape(nrows, nb, ncols).transpose(1, 0, 2)
    elif lay == "BIP":
        cube = flat.reshape(nrows, ncols, nb).transpose(2, 0, 1)
    else:
        cube = flat.reshape(nb, nrows, ncols)
    cube = np.ascontiguousarray(cube).astype(dt.newbyteorder("="))
    if nb == 1:
        cube = cube[0]
    gt = (x0, dx, 0.0, y0, 0.0, -dy)
    nodata = float(kv["NODATA"]) if "NODATA" in kv else None
    return cube, gt, nodata


# ---------- Idrisi RST (frmts/idrisi/IdrisiDataset.cpp) ----------

_RST_DT = {"byte": "u1", "integer": "<i2", "real": "<f4"}
_RST_DT_INV = {np.dtype(np.uint8): "byte", np.dtype(np.int16): "integer",
               np.dtype(np.float32): "real"}


def encode_idrisi(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
                  nodata=None) -> tuple[bytes, bytes]:
    """2-D byte/int16/float32 grid (row 0 = north) -> (.rdc metadata
    text, .rst raw bytes).  RST rows are stored top-down little-endian;
    min/max X/Y in the .rdc are grid EDGES."""
    arr = np.asarray(arr)
    dtname = _RST_DT_INV.get(arr.dtype)
    if dtname is None:
        raise ValueError("Idrisi RST stores byte/integer/real")
    nrows, ncols = arr.shape
    vmin, vmax = float(arr.min()), float(arr.max())
    lines = [
        ("file format ", "IDRISI Raster A.1"),
        ("file title  ", ""),
        ("data type   ", dtname),
        ("file type   ", "binary"),
        ("columns     ", str(ncols)),
        ("rows        ", str(nrows)),
        ("ref. system ", "plane"),
        ("ref. units  ", "m"),
        ("unit dist.  ", "1.0000000"),
        ("min. X      ", _num(gt[0])),
        ("max. X      ", _num(gt[0] + gt[1] * ncols)),
        ("min. Y      ", _num(gt[3] + gt[5] * nrows)),
        ("max. Y      ", _num(gt[3])),
        ("pos'n error ", "unknown"),
        ("resolution  ", _num(gt[1])),
        ("min. value  ", _num(vmin)),
        ("max. value  ", _num(vmax)),
        ("display min ", _num(vmin)),
        ("display max ", _num(vmax)),
        ("value units ", "unspecified"),
        ("value error ", "unknown"),
        ("flag value  ", "none" if nodata is None else _num(nodata)),
        ("flag def'n  ", "none" if nodata is None else "missing data"),
        ("legend cats ", "0"),
    ]
    rdc = "".join(f"{k}: {v}\n" for k, v in lines).encode("ascii")
    return rdc, arr.astype(arr.dtype.newbyteorder("<")).tobytes()


def decode_idrisi(rdc: bytes, rst: bytes):
    kv: dict[str, str] = {}
    for line in rdc.decode("ascii", errors="replace").splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            kv[k.strip().lower()] = v.strip()
    ncols, nrows = int(kv["columns"]), int(kv["rows"])
    dt = np.dtype(_RST_DT[kv["data type"].lower()])
    minx, maxx = float(kv["min. x"]), float(kv["max. x"])
    miny, maxy = float(kv["min. y"]), float(kv["max. y"])
    arr = np.frombuffer(rst, dtype=dt,
                        count=nrows * ncols).reshape(nrows, ncols)
    arr = np.ascontiguousarray(arr).astype(dt.newbyteorder("="))
    gt = (minx, (maxx - minx) / ncols, 0.0,
          maxy, 0.0, -(maxy - miny) / nrows)
    flag = kv.get("flag value", "none")
    nodata = None if flag == "none" else float(flag)
    return arr, gt, nodata


# ---------- ERS / ERMapper (frmts/ers/ersdataset.cpp) ----------

_ERS_DT = {"Unsigned8BitInteger": "u1", "Signed8BitInteger": "i1",
           "Unsigned16BitInteger": "u2", "Signed16BitInteger": "i2",
           "Unsigned32BitInteger": "u4", "Signed32BitInteger": "i4",
           "IEEE4ByteReal": "f4", "IEEE8ByteReal": "f8"}
_ERS_DT_INV = {np.dtype(v): k for k, v in _ERS_DT.items()}


def encode_ers(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
               nodata=None) -> tuple[bytes, bytes]:
    """(bands,rows,cols) or 2-D grid -> (.ers header text, BIL raw
    bytes).  RegistrationCoord Eastings/Northings are the UL CORNER
    (cell 0,0 registration at the reference's default CellX/CellY)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, nrows, ncols = arr.shape
    ct = _ERS_DT_INV.get(arr.dtype)
    if ct is None:
        raise ValueError(f"ERS: unsupported dtype {arr.dtype}")
    nul = "" if nodata is None else \
        f'\t\tNullCellValue\t= {_num(nodata)}\n'
    hdr = (
        'DatasetHeader Begin\n'
        '\tVersion\t\t= "6.0"\n'
        '\tDataSetType\t= ERStorage\n'
        '\tDataType\t= Raster\n'
        '\tByteOrder\t= LSBFirst\n'
        '\tRasterInfo Begin\n'
        f'\t\tCellType\t= {ct}\n'
        f'{nul}'
        f'\t\tNrOfLines\t= {nrows}\n'
        f'\t\tNrOfCellsPerLine\t= {ncols}\n'
        f'\t\tNrOfBands\t= {nb}\n'
        '\t\tCellInfo Begin\n'
        f'\t\t\tXdimension\t= {_num(gt[1])}\n'
        f'\t\t\tYdimension\t= {_num(-gt[5])}\n'
        '\t\tCellInfo End\n'
        '\t\tRegistrationCoord Begin\n'
        f'\t\t\tEastings\t= {_num(gt[0])}\n'
        f'\t\t\tNorthings\t= {_num(gt[3])}\n'
        '\t\tRegistrationCoord End\n'
        '\tRasterInfo End\n'
        'DatasetHeader End\n')
    bil = np.ascontiguousarray(arr.transpose(1, 0, 2)).astype(
        arr.dtype.newbyteorder("<")).tobytes()
    return hdr.encode("ascii"), bil


def decode_ers(ers: bytes, raw: bytes):
    kv: dict[str, str] = {}
    for line in ers.decode("ascii", errors="replace").splitlines():
        if "=" in line:
            k, _, v = line.partition("=")
            kv[k.strip().lower()] = v.strip().strip('"')
    nrows = int(kv["nroflines"])
    ncols = int(kv["nrofcellsperline"])
    nb = int(kv.get("nrofbands", "1"))
    dt = np.dtype(_ERS_DT[kv["celltype"]])
    if kv.get("byteorder", "LSBFirst").lower() == "msbfirst":
        dt = dt.newbyteorder(">")
    else:
        dt = dt.newbyteorder("<")
    dx = float(kv.get("xdimension", "1"))
    dy = float(kv.get("ydimension", "1"))
    x0 = float(kv.get("eastings", "0"))
    y0 = float(kv.get("northings", "0"))
    flat = np.frombuffer(raw, dtype=dt, count=nb * nrows * ncols)
    cube = flat.reshape(nrows, nb, ncols).transpose(1, 0, 2)
    cube = np.ascontiguousarray(cube).astype(dt.newbyteorder("="))
    if nb == 1:
        cube = cube[0]
    nodata = float(kv["nullcellvalue"]) if "nullcellvalue" in kv else None
    return cube, (x0, dx, 0.0, y0, 0.0, -dy), nodata


# ---------- NTv2 datum-shift grid (frmts/raw/ntv2dataset.cpp) ----------

def _ntv2_rec(key: str, payload: bytes) -> bytes:
    return key.encode("ascii").ljust(8)[:8] + payload


def encode_ntv2(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """(rows, cols, 4) float32 grid (row 0 = north, col 0 = west, bands
    lat-shift/lon-shift/lat-err/lon-err in arc-seconds) -> one-subgrid
    NTv2 .gsb bytes.  The FILE layout is flipped in both axes (first
    record = SOUTH-EAST corner, scanlines east->west, rows south->north,
    longitudes positive WEST) — this codec converts from/to the
    conventional orientation, like the reference driver."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim != 3 or arr.shape[2] != 4:
        raise ValueError("NTv2 grids are (rows, cols, 4) float32")
    nrows, ncols, _ = arr.shape
    # conventional gt (degrees, east-positive) -> NTv2 seconds west-pos
    lat_inc = -gt[5] * 3600.0
    lon_inc = gt[1] * 3600.0
    n_lat = (gt[3] + gt[5] * 0.5) * 3600.0            # north sample center
    s_lat = n_lat - (nrows - 1) * lat_inc
    w_long = -(gt[0] + gt[1] * 0.5) * 3600.0          # positive west
    e_long = w_long - (ncols - 1) * lon_inc
    hdr = b"".join([
        _ntv2_rec("NUM_OREC", struct.pack("<i4x", 11)),
        _ntv2_rec("NUM_SREC", struct.pack("<i4x", 11)),
        _ntv2_rec("NUM_FILE", struct.pack("<i4x", 1)),
        _ntv2_rec("GS_TYPE", b"SECONDS "),
        _ntv2_rec("VERSION", b"NTv2.0  "),
        _ntv2_rec("SYSTEM_F", b"SRC     "),
        _ntv2_rec("SYSTEM_T", b"DST     "),
        _ntv2_rec("MAJOR_F", struct.pack("<d", 6378137.0)),
        _ntv2_rec("MINOR_F", struct.pack("<d", 6356752.314)),
        _ntv2_rec("MAJOR_T", struct.pack("<d", 6378137.0)),
        _ntv2_rec("MINOR_T", struct.pack("<d", 6356752.314)),
        _ntv2_rec("SUB_NAME", b"GRID0   "),
        _ntv2_rec("PARENT", b"NONE    "),
        _ntv2_rec("CREATED", b"        "),
        _ntv2_rec("UPDATED", b"        "),
        _ntv2_rec("S_LAT", struct.pack("<d", s_lat)),
        _ntv2_rec("N_LAT", struct.pack("<d", n_lat)),
        _ntv2_rec("E_LONG", struct.pack("<d", e_long)),
        _ntv2_rec("W_LONG", struct.pack("<d", w_long)),
        _ntv2_rec("LAT_INC", struct.pack("<d", lat_inc)),
        _ntv2_rec("LONG_INC", struct.pack("<d", lon_inc)),
        _ntv2_rec("GS_COUNT", struct.pack("<i4x", nrows * ncols)),
    ])
    flipped = arr[::-1, ::-1, :]                       # SE-first, e->w
    return hdr + np.ascontiguousarray(flipped).astype("<f4").tobytes()


def decode_ntv2(data: bytes):
    """One-subgrid NTv2 .gsb -> ((rows, cols, 4) float32 row0=north
    col0=west, geotransform in degrees east-positive, None)."""
    if data[:8].rstrip() != b"NUM_OREC":
        raise ValueError("NTv2: missing NUM_OREC header")
    n_orec, = struct.unpack_from("<i", data, 8)
    kv: dict[str, bytes] = {}
    pos = 0
    for _ in range(n_orec):
        kv[data[pos:pos + 8].rstrip().decode()] = data[pos + 8:pos + 16]
        pos += 16
    n_srec, = struct.unpack_from("<i", kv["NUM_SREC"], 0)
    for _ in range(n_srec):
        kv[data[pos:pos + 8].rstrip().decode()] = data[pos + 8:pos + 16]
        pos += 16
    s_lat, = struct.unpack("<d", kv["S_LAT"])
    n_lat, = struct.unpack("<d", kv["N_LAT"])
    e_long, = struct.unpack("<d", kv["E_LONG"])
    w_long, = struct.unpack("<d", kv["W_LONG"])
    lat_inc, = struct.unpack("<d", kv["LAT_INC"])
    lon_inc, = struct.unpack("<d", kv["LONG_INC"])
    count, = struct.unpack_from("<i", kv["GS_COUNT"], 0)
    nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
    ncols = int(round((w_long - e_long) / lon_inc)) + 1
    if nrows * ncols != count:
        raise ValueError("NTv2: GS_COUNT does not match extents")
    arr = np.frombuffer(data, dtype="<f4", count=count * 4,
                        offset=pos).reshape(nrows, ncols, 4)
    arr = np.ascontiguousarray(arr[::-1, ::-1, :]).astype(np.float32)
    px = lon_inc / 3600.0
    py = lat_inc / 3600.0
    gt = (-w_long / 3600.0 - px / 2.0, px, 0.0,
          n_lat / 3600.0 + py / 2.0, 0.0, -py)
    return arr, gt, None


# ---------- Erdas LAN/GIS (frmts/raw/landataset.cpp) ----------

def encode_lan(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """(bands, rows, cols) or 2-D uint8/int16 grid (row 0 = north) ->
    Erdas 7.x HEAD74 .lan bytes: 128-byte header (UL pixel CENTER in
    float32), BIL-interleaved data."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, nrows, ncols = arr.shape
    if arr.dtype == np.uint8:
        ptype = 0
    elif arr.dtype == np.int16:
        ptype = 2
    else:
        raise ValueError("LAN stores uint8 or int16")
    hdr = bytearray(128)
    hdr[0:6] = b"HEAD74"
    struct.pack_into("<h", hdr, 6, ptype)
    struct.pack_into("<h", hdr, 8, nb)
    struct.pack_into("<i", hdr, 16, ncols)
    struct.pack_into("<i", hdr, 20, nrows)
    struct.pack_into("<h", hdr, 88, 0)                 # LAT coordinate sys
    struct.pack_into("<f", hdr, 112, gt[0] + gt[1] / 2.0)
    struct.pack_into("<f", hdr, 116, gt[3] + gt[5] / 2.0)
    struct.pack_into("<f", hdr, 120, gt[1])
    struct.pack_into("<f", hdr, 124, -gt[5])
    bil = np.ascontiguousarray(arr.transpose(1, 0, 2)).astype(
        arr.dtype.newbyteorder("<"))
    return bytes(hdr) + bil.tobytes()


def decode_lan(data: bytes):
    if data[:6] not in (b"HEAD74", b"HEADER"):
        raise ValueError("LAN: missing HEAD74/HEADER signature")
    ptype, = struct.unpack_from("<h", data, 6)
    nb, = struct.unpack_from("<h", data, 8)
    if data[:6] == b"HEAD74":
        ncols, = struct.unpack_from("<i", data, 16)
        nrows, = struct.unpack_from("<i", data, 20)
    else:
        ncols = int(struct.unpack_from("<f", data, 16)[0])
        nrows = int(struct.unpack_from("<f", data, 20)[0])
    if ptype == 0:
        dt = np.dtype("u1")
    elif ptype == 2:
        dt = np.dtype("<i2")
    else:
        raise ValueError(f"LAN: unsupported pixel type {ptype}")
    ulx, = struct.unpack_from("<f", data, 112)
    uly, = struct.unpack_from("<f", data, 116)
    dx, = struct.unpack_from("<f", data, 120)
    dy, = struct.unpack_from("<f", data, 124)
    flat = np.frombuffer(data, dtype=dt, count=nb * nrows * ncols,
                         offset=128)
    cube = flat.reshape(nrows, nb, ncols).transpose(1, 0, 2)
    cube = np.ascontiguousarray(cube).astype(dt.newbyteorder("="))
    if nb == 1:
        cube = cube[0]
    gt = (ulx - dx * 0.5, float(dx), 0.0, uly + dy * 0.5, 0.0, -float(dy))
    return cube, gt, None


# ---------- RRaster / R raster package (frmts/raw/rrasterdataset.cpp) ----

_RR_DT = {"INT1U": "u1", "INT2S": "<i2", "INT4S": "<i4",
          "FLT4S": "<f4", "FLT8S": "<f8", "LOG1S": "u1"}
_RR_DT_INV = {np.dtype(np.uint8): "INT1U", np.dtype(np.int16): "INT2S",
              np.dtype(np.int32): "INT4S", np.dtype(np.float32): "FLT4S",
              np.dtype(np.float64): "FLT8S"}


def encode_rraster(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
                   nodata=None) -> tuple[bytes, bytes]:
    """(bands, rows, cols) or 2-D grid -> (.grd INI text, .gri raw
    bytes).  BIL band order, little-endian, row-major top-down — the
    reference writer's layout."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, nrows, ncols = arr.shape
    dtname = _RR_DT_INV.get(arr.dtype)
    if dtname is None:
        raise ValueError(f"RRaster: unsupported dtype {arr.dtype}")
    grd = (
        "[general]\n"
        "creator=gdal_ray\n"
        "created=2000-01-01 00:00:00\n"
        "[georeference]\n"
        f"nrows={nrows}\n"
        f"ncols={ncols}\n"
        f"xmin={_num(gt[0])}\n"
        f"ymin={_num(gt[3] + gt[5] * nrows)}\n"
        f"xmax={_num(gt[0] + gt[1] * ncols)}\n"
        f"ymax={_num(gt[3])}\n"
        "[data]\n"
        f"datatype={dtname}\n"
        "byteorder=little\n"
        f"nbands={nb}\n"
        "bandorder=BIL\n"
        + ("" if nodata is None else f"nodatavalue={_num(nodata)}\n")
        + "[description]\nlayername=layer\n")
    bil = np.ascontiguousarray(arr.transpose(1, 0, 2)).astype(
        arr.dtype.newbyteorder("<")).tobytes()
    return grd.encode("ascii"), bil


def decode_rraster(grd: bytes, gri: bytes):
    kv: dict[str, str] = {}
    for line in grd.decode("ascii", errors="replace").splitlines():
        if "=" in line and not line.startswith("["):
            k, _, v = line.partition("=")
            kv[k.strip().lower()] = v.strip()
    nrows, ncols = int(kv["nrows"]), int(kv["ncols"])
    nb = int(kv.get("nbands", "1"))
    dt = np.dtype(_RR_DT[kv["datatype"].upper()])
    if kv.get("byteorder", "little").lower() == "big":
        dt = dt.newbyteorder(">")
    xmin, xmax = float(kv["xmin"]), float(kv["xmax"])
    ymin, ymax = float(kv["ymin"]), float(kv["ymax"])
    order = kv.get("bandorder", "BIL").upper()
    flat = np.frombuffer(gri, dtype=dt, count=nb * nrows * ncols)
    if order == "BIL":
        cube = flat.reshape(nrows, nb, ncols).transpose(1, 0, 2)
    elif order == "BIP":
        cube = flat.reshape(nrows, ncols, nb).transpose(2, 0, 1)
    else:
        cube = flat.reshape(nb, nrows, ncols)
    cube = np.ascontiguousarray(cube).astype(dt.newbyteorder("="))
    if nb == 1:
        cube = cube[0]
    gt = (xmin, (xmax - xmin) / ncols, 0.0,
          ymax, 0.0, -(ymax - ymin) / nrows)
    nodata = float(kv["nodatavalue"]) if "nodatavalue" in kv else None
    return cube, gt, nodata


# ---------- USGS DEM (frmts/usgsdem/usgsdemdataset.cpp) ----------

_USGSDEM_NODATA = -32767


def _d24(v: float) -> str:
    """Fortran D-exponent 24-char float field."""
    return f"{v:24.15E}".replace("E", "D")


def encode_usgsdem(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """2-D int16 grid (row 0 = north, geographic degrees) -> USGS DEM
    ASCII bytes (new format, 1024-byte logical records): Type A record
    with the reference-read fields at their fixed offsets (coord system
    @156, units @528, SW/NW/NE/SE corners in ARC-SECONDS @546, spatial
    resolutions @816, profile count @858, datum @890), then one Type B
    profile per column running SOUTH->NORTH, each padded to the next
    1024-byte boundary (usgsdemdataset.cpp IReadBlock's tokenizer +
    boundary-seek contract)."""
    arr = np.asarray(arr, dtype=np.int16)
    nrows, ncols = arr.shape
    dx_s = gt[1] * 3600.0
    dy_s = -gt[5] * 3600.0
    # sample-center extents in arc-seconds
    w = (gt[0] + gt[1] / 2.0) * 3600.0
    e = w + (ncols - 1) * dx_s
    n = (gt[3] + gt[5] / 2.0) * 3600.0
    s = n - (nrows - 1) * dy_s

    a = bytearray(b" " * 1024)

    def put(off: int, text: str):
        a[off:off + len(text)] = text.encode("ascii")

    put(0, "gdal_ray generated USGS DEM")
    put(150, f"{1:6d}")                    # DEM level
    put(156, f"{0:6d}")                    # coord system 0 = geographic
    put(162, f"{0:6d}")                    # zone
    put(528, f"{3:6d}")                    # ground units: arc-seconds
    put(534, f"{2:6d}")                    # vertical units: meters
    # corners are SAMPLE CENTERS (usgsdemdataset.cpp:828 subtracts the
    # half-pixel itself)
    corners = [(w, s), (w, n), (e, n), (e, s)]
    off = 546
    for cx, cy in corners:                 # SW, NW, NE, SE
        put(off, _d24(cx))
        put(off + 24, _d24(cy))
        off += 48
    put(738, _d24(float(arr.min())))
    put(762, _d24(float(arr.max())))
    put(816, f"{dx_s:12.6E}".replace("E", "D"))
    put(828, f"{dy_s:12.6E}".replace("E", "D"))
    put(840, f"{1.0:12.6E}".replace("E", "D"))
    put(852, f"{1:6d}")                    # rows of profiles
    put(858, f"{ncols:6d}")                # cols of profiles
    put(876, "2000")                       # compilation year
    put(890, " 3")                         # horizontal datum: WGS84
    out = [bytes(a)]
    for i in range(ncols):
        col = arr[::-1, i]                 # south -> north
        head = (f"{1:6d}{i + 1:6d}{nrows:6d}{1:6d}"
                f"{_d24(w + i * dx_s)}{_d24(s)}{_d24(0.0)}"
                f"{_d24(float(col.min()))}{_d24(float(col.max()))}")
        body = "".join(f"{int(v):6d}" for v in col)
        rec = (head + body).encode("ascii")
        pad = (-len(rec)) % 1024
        out.append(rec + b" " * pad)
    return b"".join(out)


def decode_usgsdem(data: bytes):
    """USGS DEM ASCII bytes -> (int16 array row 0 = north, geotransform
    in degrees, nodata).  Geographic (arc-second) coordinate system
    only — the planar/UTM variants raise."""
    text = data.decode("ascii", errors="replace")

    def read_int(off: int) -> int:
        return int(text[off:off + 6])

    def read_d(off: int, width: int) -> float:
        return float(text[off:off + width].replace("D", "E")
                     .replace("d", "e"))

    coordsys = read_int(156)
    if coordsys != 0:
        raise NotImplementedError(
            "USGS DEM: only the geographic (arc-second) coordinate "
            "system variant is implemented; planar/UTM files need the "
            "reference driver's projection branch "
            "(usgsdemdataset.cpp:756)")
    corners = [(read_d(546 + 48 * i, 24), read_d(546 + 48 * i + 24, 24))
               for i in range(4)]
    minx = min(corners[0][0], corners[1][0])
    maxy = max(corners[1][1], corners[2][1])
    dx_s = read_d(816, 12)
    dy_s = read_d(828, 12)
    vres = read_d(840, 12)
    ncols = read_int(858)

    # profile region: whitespace tokens, boundary-padded per profile
    pos = 1024
    arr = None
    nrows = 0
    for i in range(ncols):
        toks_needed = 9
        # tokenize incrementally: ints/doubles separated by spaces
        seg_end = pos
        toks = []
        p = pos
        while len(toks) < toks_needed:
            while p < len(text) and text[p].isspace():
                p += 1
            q = p
            while q < len(text) and not text[q].isspace():
                q += 1
            toks.append(text[p:q])
            p = q
        npts = int(toks[2])
        ystart = float(toks[5].replace("D", "E"))
        offset = float(toks[6].replace("D", "E"))
        if arr is None:
            nrows = npts
            arr = np.full((nrows, ncols), _USGSDEM_NODATA, dtype=np.int16)
        vals = np.empty(npts, dtype=np.int64)
        for j in range(npts):
            # sign starts a NEW token: fixed 6-char fields abut when the
            # value fills the field ("  2515-32767"), exactly like the
            # reference's integer tokenizer (USGSDEMReadIntFromBuffer)
            while p < len(text) and text[p].isspace():
                p += 1
            q = p + 1 if text[p] in "+-" else p
            while q < len(text) and text[q].isdigit():
                q += 1
            vals[j] = int(text[p:q])
            p = q
        ok = vals != _USGSDEM_NODATA
        col = np.where(ok, (vals * vres + offset), _USGSDEM_NODATA)
        arr[:, i] = col[::-1].astype(np.int16)         # south->north flip
        pos = ((p + 1023) // 1024) * 1024              # next boundary
    gt = (minx / 3600.0 - dx_s / 7200.0, dx_s / 3600.0, 0.0,
          maxy / 3600.0 + dy_s / 7200.0, 0.0, -dy_s / 3600.0)
    return arr, gt, float(_USGSDEM_NODATA)


# ---------- FARSITE LCP landscape (frmts/raw/lcpdataset.cpp) ----------

_LCP_HEADER_SIZE = 7316
_LCP_BANDS = {5: (False, False), 7: (False, True),
              8: (True, False), 10: (True, True)}


def encode_lcp(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """(bands, rows, cols) int16 cube (5/7/8/10 bands — the FARSITE
    ground/crown-fuel schemas) -> .lcp bytes: 7316-byte header (crown/
    ground flags @0/@4, dims @4164, extents/cell size doubles @4172+),
    BIP-interleaved int16 data."""
    arr = np.asarray(arr, dtype=np.int16)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, nrows, ncols = arr.shape
    if nb not in _LCP_BANDS:
        raise ValueError("LCP holds 5/7/8/10 bands (ground/crown-fuel "
                         "schemas)")
    crown, ground = _LCP_BANDS[nb]
    hdr = bytearray(_LCP_HEADER_SIZE)
    struct.pack_into("<i", hdr, 0, 21 if crown else 20)
    struct.pack_into("<i", hdr, 4, 21 if ground else 20)
    struct.pack_into("<i", hdr, 8, 0)                  # latitude
    struct.pack_into("<i", hdr, 4164, ncols)
    struct.pack_into("<i", hdr, 4168, nrows)
    east = gt[0] + gt[1] * ncols
    struct.pack_into("<d", hdr, 4172, east)
    struct.pack_into("<d", hdr, 4180, gt[0])           # west
    struct.pack_into("<d", hdr, 4188, gt[3])           # north
    struct.pack_into("<d", hdr, 4196, gt[3] + gt[5] * nrows)  # south
    struct.pack_into("<d", hdr, 4208, gt[1])           # cell x
    struct.pack_into("<d", hdr, 4216, -gt[5])          # cell y
    bip = np.ascontiguousarray(arr.transpose(1, 2, 0)).astype("<i2")
    return bytes(hdr) + bip.tobytes()


def decode_lcp(data: bytes):
    crown = struct.unpack_from("<i", data, 0)[0] == 21
    ground = struct.unpack_from("<i", data, 4)[0] == 21
    nb = {(False, False): 5, (False, True): 7,
          (True, False): 8, (True, True): 10}[(crown, ground)]
    ncols, = struct.unpack_from("<i", data, 4164)
    nrows, = struct.unpack_from("<i", data, 4168)
    east, = struct.unpack_from("<d", data, 4172)
    west, = struct.unpack_from("<d", data, 4180)
    north, = struct.unpack_from("<d", data, 4188)
    south, = struct.unpack_from("<d", data, 4196)
    flat = np.frombuffer(data, dtype="<i2", count=nb * nrows * ncols,
                         offset=_LCP_HEADER_SIZE)
    cube = np.ascontiguousarray(
        flat.reshape(nrows, ncols, nb).transpose(2, 0, 1)).astype(np.int16)
    gt = (west, (east - west) / ncols, 0.0,
          north, 0.0, -(north - south) / nrows)
    return cube, gt, None


# ---------- Terragen TER (frmts/terragen/terragendataset.cpp) ----------

_TER_MAGIC = b"TERRAGENTERRAIN "


def encode_terragen(arr: np.ndarray, *, scal: float = 30.0,
                    height_scale: int = 256,
                    base_height: int = 0) -> bytes:
    """2-D int16 elevation samples (row 0 = north) -> Terragen .ter
    bytes: 16-byte magic, SIZE/XPTS/YPTS/SCAL chunks, ALTW (height
    scale + base height + int16 samples stored BOTTOM-UP, the format's
    y-up convention).  Meters = (base + sample*hs/65536) * SCAL."""
    arr = np.asarray(arr, dtype=np.int16)
    nrows, ncols = arr.shape
    out = bytearray(_TER_MAGIC)
    out += b"SIZE" + struct.pack("<Hxx", min(ncols, nrows) - 1)
    out += b"XPTS" + struct.pack("<Hxx", ncols)
    out += b"YPTS" + struct.pack("<Hxx", nrows)
    out += b"SCAL" + struct.pack("<3f", scal, scal, scal)
    out += b"ALTW" + struct.pack("<hh", height_scale, base_height)
    out += arr[::-1, :].astype("<i2").tobytes()
    out += b"EOF "
    return bytes(out)


def decode_terragen(data: bytes):
    """Terragen .ter bytes -> (int16 samples row 0 = north,
    geotransform (SCAL spacing, origin 0), (height_scale, base_height,
    scal) conversion factors)."""
    if data[:16] != _TER_MAGIC:
        raise ValueError("Terragen: missing TERRAGENTERRAIN magic")
    pos = 16
    nsize = xpts = ypts = None
    scal = 30.0
    hs = base = 0
    arr = None
    while pos + 4 <= len(data):
        tag = data[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            nsize, = struct.unpack_from("<H", data, pos)
            pos += 4
            if xpts is None:
                xpts = ypts = nsize + 1
        elif tag in (b"XPTS", b"YPTS"):
            v, = struct.unpack_from("<H", data, pos)
            pos += 4
            if tag == b"XPTS":
                xpts = v
            else:
                ypts = v
        elif tag == b"SCAL":
            scal = struct.unpack_from("<3f", data, pos)[1]
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            hs, base = struct.unpack_from("<hh", data, pos)
            pos += 4
            n = xpts * ypts
            arr = np.frombuffer(data, dtype="<i2", count=n,
                                offset=pos).reshape(ypts, xpts)[::-1, :]
            arr = np.ascontiguousarray(arr).astype(np.int16)
            pos += 2 * n
        elif tag == b"EOF ":
            break
        else:
            raise ValueError(f"Terragen: unknown chunk {tag!r}")
    if arr is None:
        raise ValueError("Terragen: no ALTW elevation chunk")
    gt = (0.0, float(scal), 0.0, ypts * float(scal), 0.0, -float(scal))
    return arr, gt, (hs, base, float(scal))


# ---------- KRO (frmts/raw/krodataset.cpp) ----------

_KRO_DT = {8: "u1", 16: ">u2", 32: ">f4"}


def encode_kro(arr: np.ndarray) -> bytes:
    """(rows, cols[, comps]) uint8/uint16/float32 -> Autopano .kro:
    'KRO\\x01' + big-endian w/h/depth/ncomp + pixel-interleaved
    big-endian samples."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    depth = {np.dtype(np.uint8): 8, np.dtype(np.uint16): 16,
             np.dtype(np.float32): 32}.get(arr.dtype)
    if depth is None:
        raise ValueError("KRO stores uint8/uint16/float32")
    hdr = b"KRO\x01" + struct.pack(">3i", w, h, depth) + \
        struct.pack(">i", nc)
    return hdr + np.ascontiguousarray(arr).astype(
        _KRO_DT[depth]).tobytes()


def decode_kro(data: bytes):
    if data[:4] != b"KRO\x01":
        raise ValueError("KRO: missing KRO\\x01 magic")
    w, h, depth, nc = struct.unpack_from(">4i", data, 4)
    dt = np.dtype(_KRO_DT[depth])
    arr = np.frombuffer(data, dtype=dt, count=w * h * nc,
                        offset=20).reshape(h, w, nc)
    arr = np.ascontiguousarray(arr).astype(dt.newbyteorder("="))
    if nc == 1:
        arr = arr[:, :, 0]
    return arr, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0), None


# ---------- FITS (frmts/fits) ----------

_FITS_DT = {8: "u1", 16: ">i2", 32: ">i4", -32: ">f4", -64: ">f8"}
_FITS_DT_INV = {np.dtype(np.uint8): 8, np.dtype(np.int16): 16,
                np.dtype(np.int32): 32, np.dtype(np.float32): -32,
                np.dtype(np.float64): -64}


def _fits_card(key: str, value: str) -> bytes:
    return f"{key:<8}= {value:>20}".ljust(80).encode("ascii")


def encode_fits(arr: np.ndarray) -> bytes:
    """2-D array (row 0 = north) -> FITS bytes: 2880-byte header unit
    (SIMPLE/BITPIX/NAXIS cards), big-endian data stored BOTTOM-UP (the
    FITS axis-2-increases-upward convention), 2880-padded."""
    arr = np.asarray(arr)
    bitpix = _FITS_DT_INV.get(arr.dtype)
    if bitpix is None:
        raise ValueError(f"FITS: unsupported dtype {arr.dtype}")
    nrows, ncols = arr.shape
    cards = [_fits_card("SIMPLE", "T"),
             _fits_card("BITPIX", str(bitpix)),
             _fits_card("NAXIS", "2"),
             _fits_card("NAXIS1", str(ncols)),
             _fits_card("NAXIS2", str(nrows)),
             b"END".ljust(80)]
    hdr = b"".join(cards)
    hdr += b" " * (-len(hdr) % 2880)
    body = arr[::-1, :].astype(_FITS_DT[bitpix]).tobytes()
    body += b"\0" * (-len(body) % 2880)
    return hdr + body


def decode_fits(data: bytes):
    """FITS bytes -> (array row 0 = north, identity geotransform,
    BLANK-or-None).  BSCALE/BZERO are applied when present."""
    if not data.startswith(b"SIMPLE  ="):
        raise ValueError("FITS: missing SIMPLE card")
    kv: dict[str, str] = {}
    pos = 0
    while pos + 80 <= len(data):
        card = data[pos:pos + 80].decode("ascii", errors="replace")
        pos += 80
        key = card[:8].strip()
        if key == "END":
            pos = ((pos + 2879) // 2880) * 2880
            break
        if "=" in card:
            kv[key] = card.split("=", 1)[1].split("/")[0].strip()
    bitpix = int(kv["BITPIX"])
    naxis = int(kv.get("NAXIS", "2"))
    if naxis != 2:
        raise NotImplementedError(
            "FITS subset: 2-D image HDUs only (cube/table extensions "
            "need the full HDU walker)")
    ncols = int(kv["NAXIS1"])
    nrows = int(kv["NAXIS2"])
    dt = np.dtype(_FITS_DT[bitpix])
    arr = np.frombuffer(data, dtype=dt, count=nrows * ncols,
                        offset=pos).reshape(nrows, ncols)[::-1, :]
    arr = np.ascontiguousarray(arr).astype(dt.newbyteorder("="))
    bscale = float(kv.get("BSCALE", "1"))
    bzero = float(kv.get("BZERO", "0"))
    if bscale != 1.0 or bzero != 0.0:
        arr = arr * bscale + bzero
    blank = float(kv["BLANK"]) if "BLANK" in kv else None
    return arr, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0), blank


# ---------- GXF / Geosoft ASCII grid (frmts/gxf/gxfopen.c) ----------

def encode_gxf(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
               nodata: float = -1e12) -> bytes:
    """2-D float grid (row 0 = north) -> GXF text: #KEY blocks then
    #GRID with whitespace values, default SENSE 1 (first scanline =
    BOTTOM row, left to right — gxfopen.c GXFS_LL_RIGHT); #XORIGIN/
    #YORIGIN are the bottom-left SAMPLE position (pixel-is-point)."""
    arr = np.asarray(arr, dtype=np.float64)
    nrows, ncols = arr.shape
    xo = gt[0] + gt[1] / 2.0
    yo = gt[3] + gt[5] * (nrows - 0.5)
    hdr = (f"#TITLE\ngdal_ray grid\n"
           f"#POINTS\n{ncols}\n#ROWS\n{nrows}\n"
           f"#PTSEPARATION\n{_num(gt[1])}\n"
           f"#RWSEPARATION\n{_num(-gt[5])}\n"
           f"#XORIGIN\n{_num(xo)}\n#YORIGIN\n{_num(yo)}\n"
           f"#DUMMY\n{_num(nodata)}\n#SENSE\n1\n#GRID\n")
    lines = [" ".join(_num(v) for v in row) for row in arr[::-1, :]]
    return (hdr + "\n".join(lines) + "\n").encode("ascii")


def decode_gxf(data: bytes):
    text = data.decode("ascii", errors="replace")
    lines = text.splitlines()
    i = 0
    kv: dict[str, str] = {}
    grid_vals: list[str] = []
    while i < len(lines):
        ln = lines[i].strip()
        if ln.upper().startswith("#GRID"):
            grid_vals = " ".join(lines[i + 1:]).split()
            break
        if ln.startswith("#"):
            key = ln[1:5].upper()
            if i + 1 < len(lines):
                kv[key] = lines[i + 1].strip()
            i += 2
        else:
            i += 1
    if not grid_vals:
        raise ValueError("GXF: missing #GRID section")
    ncols = int(kv["POIN"])
    nrows = int(kv["ROWS"])
    dx = float(kv.get("PTSE", "1"))
    dy = float(kv.get("RWSE", "1"))
    xo = float(kv.get("XORI", "0"))
    yo = float(kv.get("YORI", "0"))
    sense = int(kv.get("SENS", "1"))
    if sense != 1:
        raise NotImplementedError(
            "GXF subset: SENSE 1 (LL, row-oriented) only — the mirrored/"
            "column-oriented orderings need gxfopen.c's sense matrix")
    vals = np.array(grid_vals[:nrows * ncols], np.float64)
    if len(vals) != nrows * ncols:
        raise ValueError("GXF: truncated #GRID data")
    arr = vals.reshape(nrows, ncols)[::-1, :].copy()
    nodata = float(kv.get("DUMM", "-1e12"))
    gtr = (xo - dx / 2.0, dx, 0.0, yo + dy * (nrows - 0.5), 0.0, -dy)
    return arr, gtr, nodata


# ---------- SIGDEM (frmts/sigdem/sigdemdataset.cpp) ----------

_SIGDEM_NODATA = -0x80000000


def encode_sigdem(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
                  scale_z: float = 1000.0) -> bytes:
    """2-D float grid (row 0 = north; NaN = nodata) -> SIGDEM bytes:
    132-byte big-endian header ('SIGDEM' + offsets/scales/extents/dims),
    int32 big-endian samples (value = offsetZ + n/scaleZ) stored
    BOTTOM-UP (sigdemdataset.cpp row indexing)."""
    arr = np.asarray(arr, dtype=np.float64)
    nrows, ncols = arr.shape
    ok = ~np.isnan(arr)
    vals = np.where(ok, np.rint(arr * scale_z), _SIGDEM_NODATA)
    if (np.abs(vals[ok]) >= 2**31).any():
        raise ValueError("SIGDEM: value exceeds int32 at this z-scale")
    zmin = float(arr[ok].min()) if ok.any() else 0.0
    zmax = float(arr[ok].max()) if ok.any() else 0.0
    minx = gt[0]
    maxy = gt[3]
    miny = gt[3] + gt[5] * nrows
    maxx = gt[0] + gt[1] * ncols
    hdr = (b"SIGDEM" + struct.pack(">hi", 1, 0)
           + struct.pack(">6d", 0.0, 1.0, 0.0, 1.0, 0.0, scale_z)
           + struct.pack(">6d", minx, miny, zmin, maxx, maxy, zmax)
           + struct.pack(">2i", ncols, nrows)
           + struct.pack(">2d", gt[1], -gt[5]))
    body = vals[::-1, :].astype(">i4").tobytes()
    return hdr + body


def decode_sigdem(data: bytes):
    if data[:6] != b"SIGDEM":
        raise ValueError("SIGDEM: missing SIGDEM magic")
    off_z, scale_z = struct.unpack_from(">d", data, 44)[0], \
        struct.unpack_from(">d", data, 52)[0]
    minx, miny = struct.unpack_from(">2d", data, 60)
    maxy, = struct.unpack_from(">d", data, 92)
    ncols, nrows = struct.unpack_from(">2i", data, 108)
    xdim, ydim = struct.unpack_from(">2d", data, 116)
    raw = np.frombuffer(data, dtype=">i4", count=nrows * ncols,
                        offset=132).reshape(nrows, ncols)[::-1, :]
    raw = np.ascontiguousarray(raw).astype(np.int64)
    arr = np.where(raw == _SIGDEM_NODATA, np.nan,
                   off_z + raw / scale_z)
    gt = (minx, xdim, 0.0, maxy, 0.0, -ydim)
    return arr, gt, float("nan")


# ---------- JDEM / Japanese DEM (frmts/jdem/jdemdataset.cpp) ----------

def _jdem_angle(deg: float) -> str:
    """decimal degrees -> DDDMMSS 7-char field (first-quadrant only,
    like the format)."""
    total = int(round(deg * 3600))
    d, rem = divmod(total, 3600)
    m, s = divmod(rem, 60)
    return f"{d * 10000 + m * 100 + s:07d}"


def encode_jdem(arr: np.ndarray, *, gt=(130.0, 1.0 / 3600, 0.0, 40.0,
                                        0.0, -1.0 / 3600),
                meshcode: str = "503545") -> bytes:
    """2-D float grid in meters (row 0 = north; 0.1 m resolution) ->
    JDEM .mem bytes: 1011-byte text header (mesh code, dims @23/26,
    corner DDDMMSS angles @29+), then per-row records 'meshcode(6) +
    row(3) + %5d decimeters * ncols'.  Corner angles quantize to whole
    arc-seconds — pass second-aligned geotransforms for exact
    roundtrips."""
    arr = np.asarray(arr, dtype=np.float64)
    nrows, ncols = arr.shape
    dm = np.rint(arr * 10).astype(np.int64)
    if (dm > 99999).any() or (dm < -9999).any():
        raise ValueError("JDEM: height exceeds the 5-char field")
    ll_lat = gt[3] + gt[5] * nrows
    ll_lon = gt[0]
    ur_lat = gt[3]
    ur_lon = gt[0] + gt[1] * ncols
    hdr = bytearray(b" " * 1011)
    hdr[0:6] = meshcode.encode("ascii")
    hdr[23:26] = b"%03d" % ncols
    hdr[26:29] = b"%03d" % nrows
    hdr[29:36] = _jdem_angle(ll_lat).encode("ascii")
    hdr[36:43] = _jdem_angle(ll_lon).encode("ascii")
    hdr[43:50] = _jdem_angle(ur_lat).encode("ascii")
    hdr[50:57] = _jdem_angle(ur_lon).encode("ascii")
    out = [bytes(hdr)]
    for r in range(nrows):
        rec = meshcode.encode("ascii") + b"%03d" % (r + 1)
        rec += b"".join(b"%5d" % int(v) for v in dm[r])
        out.append(rec)
    return b"".join(out)


def decode_jdem(data: bytes):
    hdr = data[:1011]

    def angle(off: int) -> float:
        n = int(hdr[off:off + 7])
        return n // 10000 + (n // 100) % 100 / 60.0 + n % 100 / 3600.0

    ncols = int(hdr[23:26])
    nrows = int(hdr[26:29])
    ll_lat = angle(29)
    ll_lon = angle(36)
    ur_lat = angle(43)
    ur_lon = angle(50)
    meshcode = hdr[0:6]
    rec_size = 9 + 5 * ncols
    arr = np.empty((nrows, ncols), dtype=np.float64)
    for r in range(nrows):
        rec = data[1011 + r * rec_size: 1011 + (r + 1) * rec_size]
        if rec[:6] != meshcode:
            raise ValueError(f"JDEM: scanline {r} corrupt (mesh code "
                             "mismatch — binary transfer?)")
        row = np.frombuffer(rec[9:], dtype="S1").reshape(ncols, 5)
        vals = np.array([int(bytes(row[i]).decode()) for i in
                         range(ncols)], dtype=np.int64)
        arr[r] = vals / 10.0        # divide: 3*0.1 != 3/10 in IEEE
    gt = (ll_lon, (ur_lon - ll_lon) / ncols, 0.0,
          ur_lat, 0.0, -(ur_lat - ll_lat) / nrows)
    return arr, gt, None


# ---------- NGS GEOID .bin (frmts/ngsgeoid/ngsgeoiddataset.cpp) ----------

def encode_ngsgeoid(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """2-D float32 geoid-height grid (row 0 = north) -> NGS .bin:
    little-endian SLAT/WLON/DLAT/DLON doubles (south-west SAMPLE
    position, pixel-is-point), NLAT/NLON/IKIND=1 int32, float32 rows
    stored SOUTH to NORTH."""
    arr = np.asarray(arr, dtype=np.float32)
    nrows, ncols = arr.shape
    dlat, dlon = -gt[5], gt[1]
    slat = gt[3] + gt[5] * (nrows - 0.5)
    wlon = gt[0] + dlon / 2.0
    hdr = struct.pack("<4d3i", slat, wlon, dlat, dlon, nrows, ncols, 1)
    return hdr + arr[::-1, :].astype("<f4").tobytes()


def decode_ngsgeoid(data: bytes):
    ik_le, = struct.unpack_from("<i", data, 40)
    ik_be, = struct.unpack_from(">i", data, 40)
    if ik_le == 1:
        end = "<"
    elif ik_be == 1:
        end = ">"
    else:
        raise ValueError("NGSGEOID: IKIND marker != 1 in either "
                         "byte order")
    slat, wlon, dlat, dlon = struct.unpack_from(end + "4d", data, 0)
    nlat, nlon = struct.unpack_from(end + "2i", data, 32)
    arr = np.frombuffer(data, dtype=end + "f4", count=nlat * nlon,
                        offset=44).reshape(nlat, nlon)[::-1, :]
    arr = np.ascontiguousarray(arr).astype(np.float32)
    gt = (wlon - dlon / 2.0, dlon, 0.0,
          slat + nlat * dlat - dlat / 2.0, 0.0, -dlat)
    return arr, gt, None
