"""Elevation-grid raster codecs — SRTMHGT, DTED, SAGA and Surfer/ZMap
grid analogs (``frmts/srtmhgt``, ``frmts/dted``, ``frmts/saga``,
``frmts/gsg``, ``frmts/zmap``).

All decoders return ``(array, geotransform, nodata)`` with array row 0 =
NORTH row and the GDAL 6-tuple geotransform convention; all encoders take
the same array orientation.  Pure numpy/stdlib; row-order flips and
signed-magnitude translation are vectorized.
"""

from __future__ import annotations

import math

import numpy as np

from .wkt import format_double as _num

__all__ = [
    "encode_srtmhgt", "decode_srtmhgt",
    "encode_dted", "decode_dted",
    "encode_saga", "decode_saga",
    "encode_gsag", "decode_gsag",
    "encode_gsbg", "decode_gsbg",
    "encode_gs7bg", "decode_gs7bg",
    "encode_zmap", "decode_zmap",
]


# ---------- SRTMHGT (frmts/srtmhgt/srtmhgtdataset.cpp) ----------

def encode_srtmhgt(arr: np.ndarray) -> bytes:
    """Square int16 grid (row 0 = north) -> raw big-endian .hgt bytes.
    The reference identifies tiles purely by file size (1201/3601/...,
    srtmhgtdataset.cpp:440); any square size round-trips here, standard
    tile sizes are byte-compatible with real SRTM tiles."""
    arr = np.asarray(arr)
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        raise ValueError("SRTMHGT tiles are square single-band grids")
    if arr.dtype == np.uint8:
        return arr.tobytes()
    if arr.dtype == np.float32:
        return arr.astype(">f4").tobytes()
    return arr.astype(">i2").tobytes()


def _srtm_name_to_sw(filename: str) -> tuple[int, int]:
    """'N27E086.hgt' -> (sw_lat, sw_lon) (srtmhgtdataset.cpp:398-418)."""
    import os
    name = os.path.basename(filename)
    lat = int(name[1:3])
    lon = int(name[4:7])
    if name[0] in "Ss":
        lat = -lat
    elif name[0] not in "Nn":
        raise ValueError(f"SRTMHGT: bad filename {name!r}")
    if name[3] in "Ww":
        lon = -lon
    elif name[3] not in "Ee":
        raise ValueError(f"SRTMHGT: bad filename {name!r}")
    return lat, lon


def decode_srtmhgt(data: bytes, filename: str = "N00E000.hgt"):
    """Raw .hgt bytes + tile filename -> (array, geotransform, nodata).
    dtype from byte count per pixel-count candidates: uint8 (N*N),
    int16 (N*N*2), float32 '.hgts' (N*N*4); samples are pixel-is-point
    at 1/(N-1) degree spacing covering the 1x1 degree tile."""
    size = len(data)
    # '.hgts' names the float32 variant (srtmhgtdataset.cpp:336); raw
    # sizes alone are ambiguous (N^2 float32 == (2N)^2 uint8).
    if filename.lower().endswith(".hgts"):
        candidates = ((4, ">f4"),)
    else:
        candidates = ((2, ">i2"), (1, "u1"), (4, ">f4"))
    for itemsize, dt in candidates:
        if size % itemsize:
            continue
        n = math.isqrt(size // itemsize)
        if n * n * itemsize == size and n >= 2:
            arr = np.frombuffer(data, dtype=dt).reshape(n, n)
            arr = arr.astype(arr.dtype.newbyteorder("="))
            break
    else:
        raise ValueError("SRTMHGT: size is not a square sample grid")
    lat, lon = _srtm_name_to_sw(filename)
    px = 1.0 / (n - 1)
    gt = (lon - px / 2.0, px, 0.0, lat + 1 + px / 2.0, 0.0, -px)
    return arr, gt, -32768.0


# ---------- DTED (frmts/dted/dted_api.c, dted_create.c) ----------

_DTED_NODATA = -32767


def _dms(angle: float, is_lat: bool, fmt: str = "{:03d}{:02d}{:02d}{}") \
        -> str:
    """Angle -> DDDMMSSH text (dted_create.c DTEDFormatDMS)."""
    if is_lat:
        hemi = "S" if angle < 0 else "N"
    else:
        hemi = "W" if angle < 0 else "E"
    a = abs(angle)
    deg = int(math.floor(a + 0.5 / 3600.0))
    rem = a - deg
    minutes = int(math.floor(rem * 60.0 + 0.5 / 60.0))
    rem -= minutes / 60.0
    sec = int(math.floor(rem * 3600.0 + 0.5))
    return fmt.format(deg, minutes, sec, hemi)


def encode_dted(arr: np.ndarray, *, ll_lat: int = 0, ll_lon: int = 0) \
        -> bytes:
    """int16 grid (row 0 = north) -> DTED bytes: UHL(80) + DSI(648) +
    ACC(2700) headers then one column record per longitude — 8-byte
    prefix (0xAA sentinel + block/longitude counts), samples in SIGNED
    MAGNITUDE big-endian ordered SOUTH to NORTH, 4-byte additive
    checksum over prefix+samples (dted_api.c DTEDWriteProfile)."""
    arr = np.asarray(arr, dtype=np.int16)
    ny, nx = arr.shape
    uhl = bytearray(b" " * 80)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = _dms(ll_lon, False).encode()
    uhl[12:20] = _dms(ll_lat, True).encode()
    if nx < 5 or ny < 5 or 36000 % (nx - 1) or 36000 % (ny - 1):
        raise ValueError("DTED: grid spacing must be a whole number of "
                         "tenths of arc-seconds over a 1-degree cell "
                         "fitting the 4-char UHL interval field "
                         "(36000 % (n-1) == 0 and n >= 5)")
    uhl[20:24] = b"%04d" % (36000 // (nx - 1))
    uhl[24:28] = b"%04d" % (36000 // (ny - 1))
    uhl[28:32] = b"NA  "
    uhl[32:35] = b"U  "
    uhl[47:51] = b"%04d" % nx
    uhl[51:55] = b"%04d" % ny
    uhl[55:56] = b"0"
    dsi = bytearray(b" " * 648)
    dsi[0:3] = b"DSI"
    dsi[3:4] = b"U"
    dsi[59:64] = b"DTED1"
    dsi[126:135] = b"PRF89020B"
    dsi[281:285] = b"%04d" % ny
    dsi[285:289] = b"%04d" % nx
    acc = bytearray(b" " * 2700)
    acc[0:3] = b"ACC"
    acc[3:5] = b"NA"

    # signed magnitude, south-to-north within each column record
    flipped = arr[::-1, :].astype(np.int64)          # row 0 = south
    mag = np.abs(flipped).astype(np.uint16)
    mag = (mag | np.where(flipped < 0, 0x8000, 0).astype(np.uint16))
    be = mag.astype(">u2")                            # (ny, nx) columns in axis1
    out = [bytes(uhl), bytes(dsi), bytes(acc)]
    for col in range(nx):
        pre = bytes([0xAA, 0, col // 256, col % 256, col // 256, col % 256,
                     0, 0])
        body = be[:, col].tobytes()
        rec = pre + body
        csum = int(np.frombuffer(rec, dtype=np.uint8).sum())
        out.append(rec + csum.to_bytes(4, "big"))
    return b"".join(out)


def decode_dted(data: bytes):
    """DTED bytes -> (array row 0 = north, geotransform, nodata).
    Parses the UHL origin/intervals/dimensions, verifies each column
    record's additive checksum and translates signed-magnitude samples
    (dted_api.c DTEDReadProfileEx)."""
    if data[:3] != b"UHL":
        raise ValueError("DTED: no UHL record")
    uhl = data[:80]

    def dms(off: int, deg_w: int) -> float:
        deg = int(uhl[off:off + deg_w])
        minutes = int(uhl[off + deg_w:off + deg_w + 2])
        sec = int(uhl[off + deg_w + 2:off + deg_w + 4])
        hemi = chr(uhl[off + deg_w + 4])
        v = deg + minutes / 60.0 + sec / 3600.0
        return -v if hemi in "WS" else v

    lon0 = dms(4, 3)
    lat0 = dms(12, 3)
    px = int(uhl[20:24]) / 36000.0
    py = int(uhl[24:28]) / 36000.0
    nx = int(uhl[47:51])
    ny = int(uhl[51:55])
    off = 80 + 648 + 2700
    rec_len = 8 + 2 * ny + 4
    arr = np.empty((ny, nx), dtype=np.int16)
    for col in range(nx):
        rec = data[off + col * rec_len: off + (col + 1) * rec_len]
        if len(rec) != rec_len or rec[0] != 0xAA:
            raise ValueError(f"DTED: bad data record at column {col}")
        csum = int(np.frombuffer(rec[:-4], dtype=np.uint8).sum())
        if csum != int.from_bytes(rec[-4:], "big"):
            raise ValueError(f"DTED: checksum mismatch at column {col}")
        raw = np.frombuffer(rec[8:8 + 2 * ny], dtype=">u2").astype(np.int64)
        val = (raw & 0x7FFF) * np.where(raw & 0x8000, -1, 1)
        arr[:, col] = val[::-1].astype(np.int16)      # south->north to row0=N
    gt = (lon0 - px / 2.0, px, 0.0, lat0 - py / 2.0 + ny * py, 0.0, -py)
    return arr, gt, float(_DTED_NODATA)


# ---------- SAGA binary grid (frmts/saga/sagadataset.cpp) ----------

_SAGA_FMT = {"BYTE_UNSIGNED": "u1", "SHORTINT": "i2",
             "SHORTINT_UNSIGNED": "u2", "INTEGER": "i4",
             "INTEGER_UNSIGNED": "u4", "FLOAT": "f4", "DOUBLE": "f8"}
_SAGA_FMT_INV = {np.dtype(v): k for k, v in _SAGA_FMT.items()}


def encode_saga(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
                nodata: float = -99999.0) -> tuple[bytes, bytes]:
    """2-D array (row 0 = north) -> (.sgrd header text, .sdat raw bytes).
    Data rows are stored BOTTOM-TO-TOP little-endian (the reference
    writes TOPTOBOTTOM=FALSE); POSITION_XMIN/YMIN are CELL CENTERS."""
    arr = np.asarray(arr)
    nrows, ncols = arr.shape
    fmt = _SAGA_FMT_INV.get(arr.dtype)
    if fmt is None:
        raise ValueError(f"SAGA: unsupported dtype {arr.dtype}")
    cell = gt[1]
    xmin = gt[0] + cell / 2.0
    ymin = gt[3] + gt[5] * (nrows - 0.5)
    hdr = (f"NAME\t= grid\nDESCRIPTION\t=\nUNIT\t=\nDATAFILE_OFFSET\t= 0\n"
           f"DATAFORMAT\t= {fmt}\nBYTEORDER_BIG\t= FALSE\n"
           f"POSITION_XMIN\t= {_num(xmin)}\nPOSITION_YMIN\t= {_num(ymin)}\n"
           f"CELLCOUNT_X\t= {ncols}\nCELLCOUNT_Y\t= {nrows}\n"
           f"CELLSIZE\t= {_num(cell)}\nZ_FACTOR\t= 1.000000\n"
           f"NODATA_VALUE\t= {_num(nodata)}\nTOPTOBOTTOM\t= FALSE\n")
    sdat = arr[::-1, :].astype(arr.dtype.newbyteorder("<")).tobytes()
    return hdr.encode("ascii"), sdat


def decode_saga(sgrd: bytes, sdat: bytes):
    """(.sgrd, .sdat) -> (array row 0 = north, geotransform, nodata)."""
    kv = {}
    for line in sgrd.decode("ascii", errors="replace").splitlines():
        if "=" in line:
            k, _, v = line.partition("=")
            kv[k.strip().upper()] = v.strip()
    ncols = int(kv["CELLCOUNT_X"])
    nrows = int(kv["CELLCOUNT_Y"])
    cell = float(kv["CELLSIZE"])
    xmin = float(kv["POSITION_XMIN"])
    ymin = float(kv["POSITION_YMIN"])
    nodata = float(kv.get("NODATA_VALUE", "-99999"))
    dt = np.dtype(_SAGA_FMT[kv.get("DATAFORMAT", "FLOAT").upper()])
    if kv.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE":
        dt = dt.newbyteorder(">")
    else:
        dt = dt.newbyteorder("<")
    offset = int(kv.get("DATAFILE_OFFSET", "0"))
    arr = np.frombuffer(sdat, dtype=dt, count=nrows * ncols,
                        offset=offset).reshape(nrows, ncols)
    if kv.get("TOPTOBOTTOM", "FALSE").upper() != "TRUE":
        arr = arr[::-1, :]
    arr = np.ascontiguousarray(arr).astype(dt.newbyteorder("="))
    gt = (xmin - cell / 2.0, cell, 0.0,
          ymin + cell * (nrows - 0.5), 0.0, -cell)
    return arr, gt, nodata


# ---------- Surfer grids (frmts/gsg/gs{ag,bg,7bg}dataset.cpp) ----------

_GS_BLANK = 1.701410009187828e38


def _surfer_extents(gt, shape):
    """GDAL geotransform -> Surfer cell-center min/max extents."""
    nrows, ncols = shape
    xlo = gt[0] + gt[1] / 2.0
    xhi = gt[0] + gt[1] * (ncols - 0.5)
    ylo = gt[3] + gt[5] * (nrows - 0.5)
    yhi = gt[3] + gt[5] / 2.0
    return xlo, xhi, ylo, yhi


def _surfer_gt(xlo, xhi, ylo, yhi, shape):
    nrows, ncols = shape
    dx = (xhi - xlo) / (ncols - 1) if ncols > 1 else 1.0
    dy = (yhi - ylo) / (nrows - 1) if nrows > 1 else 1.0
    return (xlo - dx / 2.0, dx, 0.0, yhi + dy / 2.0, 0.0, -dy)


def encode_gsag(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """Surfer 6 ASCII grid: 'DSAA' header (cell-center extents) + rows
    BOTTOM-TO-TOP (gsagdataset.cpp row order)."""
    arr = np.asarray(arr, dtype=np.float64)
    nrows, ncols = arr.shape
    xlo, xhi, ylo, yhi = _surfer_extents(gt, arr.shape)
    zlo, zhi = float(arr.min()), float(arr.max())
    lines = ["DSAA", f"{ncols} {nrows}", f"{_num(xlo)} {_num(xhi)}",
             f"{_num(ylo)} {_num(yhi)}", f"{_num(zlo)} {_num(zhi)}"]
    for row in arr[::-1, :]:
        lines.append(" ".join(_num(v) for v in row))
    return ("\n".join(lines) + "\n").encode("ascii")


def decode_gsag(data: bytes):
    toks = data.decode("ascii", errors="replace").split()
    if toks[0].upper() != "DSAA":
        raise ValueError("GSAG: missing DSAA signature")
    ncols, nrows = int(toks[1]), int(toks[2])
    xlo, xhi, ylo, yhi = (float(t) for t in toks[3:7])
    vals = np.array(toks[9:9 + nrows * ncols], dtype=np.float64)
    if len(vals) != nrows * ncols:
        raise ValueError("GSAG: truncated data section")
    arr = vals.reshape(nrows, ncols)[::-1, :].copy()
    return arr, _surfer_gt(xlo, xhi, ylo, yhi, (nrows, ncols)), _GS_BLANK


def encode_gsbg(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1)) -> bytes:
    """Surfer 6 binary grid: 'DSBB' + int16 nx,ny + 6 doubles + float32
    rows BOTTOM-TO-TOP, little-endian."""
    import struct
    arr = np.asarray(arr, dtype=np.float32)
    nrows, ncols = arr.shape
    xlo, xhi, ylo, yhi = _surfer_extents(gt, arr.shape)
    hdr = b"DSBB" + struct.pack("<hh6d", ncols, nrows, xlo, xhi, ylo, yhi,
                                float(arr.min()), float(arr.max()))
    return hdr + arr[::-1, :].astype("<f4").tobytes()


def decode_gsbg(data: bytes):
    import struct
    if data[:4] != b"DSBB":
        raise ValueError("GSBG: missing DSBB signature")
    ncols, nrows, xlo, xhi, ylo, yhi, _, _ = struct.unpack_from("<hh6d",
                                                                data, 4)
    arr = np.frombuffer(data, dtype="<f4", count=nrows * ncols,
                        offset=56).reshape(nrows, ncols)[::-1, :]
    arr = np.ascontiguousarray(arr).astype(np.float32)
    return arr, _surfer_gt(xlo, xhi, ylo, yhi, (nrows, ncols)), \
        float(np.float32(_GS_BLANK))


def encode_gs7bg(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
                 nodata: float = _GS_BLANK) -> bytes:
    """Surfer 7 binary grid: DSRB/GRID/DATA tagged sections, double
    samples BOTTOM-TO-TOP (gs7bgdataset.cpp WriteHeader)."""
    import struct
    arr = np.asarray(arr, dtype=np.float64)
    nrows, ncols = arr.shape
    xlo, xhi, ylo, yhi = _surfer_extents(gt, arr.shape)
    dx = (xhi - xlo) / (ncols - 1) if ncols > 1 else 1.0
    dy = (yhi - ylo) / (nrows - 1) if nrows > 1 else 1.0
    hdr = struct.pack("<3i", 0x42525344, 4, 1)           # DSRB, size, version
    hdr += struct.pack("<2i2i8d", 0x44495247, 72, nrows, ncols, xlo, ylo,
                       dx, dy, float(arr.min()), float(arr.max()),
                       0.0, nodata)
    hdr += struct.pack("<2i", 0x41544144, nrows * ncols * 8)   # DATA
    return hdr + arr[::-1, :].astype("<f8").tobytes()


def decode_gs7bg(data: bytes):
    import struct
    if data[:4] != b"DSRB":
        raise ValueError("GS7BG: missing DSRB signature")
    pos = 4
    size, version = struct.unpack_from("<2i", data, pos)
    pos += 8 + size - 4
    nrows = ncols = 0
    xlo = ylo = dx = dy = nodata = 0.0
    while pos + 8 <= len(data):
        tag, size = struct.unpack_from("<2i", data, pos)
        pos += 8
        if tag == 0x44495247:                             # GRID
            nrows, ncols, xlo, ylo, dx, dy, _, _, _, nodata = \
                struct.unpack_from("<2i8d", data, pos)
            pos += size
        elif tag == 0x41544144:                           # DATA
            arr = np.frombuffer(data, dtype="<f8", count=nrows * ncols,
                                offset=pos).reshape(nrows, ncols)[::-1, :]
            arr = np.ascontiguousarray(arr)
            gt = _surfer_gt(xlo, xlo + dx * (ncols - 1),
                            ylo, ylo + dy * (nrows - 1), (nrows, ncols))
            return arr, gt, nodata
        else:                                             # FAULT etc: skip
            pos += size
    raise ValueError("GS7BG: no DATA section")


# ---------- ZMap plus grid (frmts/zmap/zmapdataset.cpp) ----------

def encode_zmap(arr: np.ndarray, *, gt=(0, 1, 0, 0, 0, -1),
                nodata: float = 1e30) -> bytes:
    """2-D array (row 0 = north) -> ZMap plus text: values COLUMN-MAJOR,
    each column NORTH to SOUTH, 4 right-justified width-20 values per
    line, EOL at end of each column (zmapdataset.cpp CreateCopy)."""
    arr = np.asarray(arr, dtype=np.float64)
    nrows, ncols = arr.shape
    out = ["!", "! Created by gdal_ray.", "!", "@GRID FILE, GRID, 4",
           f"{20:>10},{nodata:>20.7f},{'':>10},{7:>10},{1:>10}",
           f"{nrows:>10},{ncols:>10},{gt[0]:>14.7f},"
           f"{gt[0] + gt[1] * ncols:>14.7f},"
           f"{gt[3] + gt[5] * nrows:>14.7f},{gt[3]:>14.7f}",
           "0.0, 0.0, 0.0", "@"]
    body = []
    for col in arr.T:                                    # west to east
        for s in range(0, nrows, 4):
            body.append("".join(f"{v:>20.7f}" for v in col[s:s + 4]))
    return ("\n".join(out + body) + "\n").encode("ascii")


def decode_zmap(data: bytes):
    """ZMap plus text -> (array row 0 = north, geotransform, nodata)."""
    lines = [ln for ln in data.decode("ascii", errors="replace").splitlines()
             if not ln.lstrip().startswith("!")]
    if not lines or not lines[0].lstrip().startswith("@"):
        raise ValueError("ZMap: missing @ header")
    hdr2 = lines[1].split(",")
    nodata = float(hdr2[1])
    hdr3 = lines[2].split(",")
    nrows, ncols = int(hdr3[0]), int(hdr3[1])
    xmin, xmax, ymin, ymax = (float(v) for v in hdr3[2:6])
    i = 3
    while i < len(lines) and lines[i].strip() != "@":
        i += 1
    toks = " ".join(lines[i + 1:]).split()
    vals = np.array(toks[:nrows * ncols], dtype=np.float64)
    if len(vals) != nrows * ncols:
        raise ValueError("ZMap: truncated data section")
    arr = vals.reshape(ncols, nrows).T.copy()            # column-major, N->S
    gt = (xmin, (xmax - xmin) / ncols, 0.0,
          ymax, 0.0, -(ymax - ymin) / nrows)
    return arr, gt, nodata
