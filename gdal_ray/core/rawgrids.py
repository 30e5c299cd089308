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
    dt = np.dtype(_EHDR_DT.get((nbits, ptype)))
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
