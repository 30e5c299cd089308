"""Arc/Info ASCII Grid (AAIGrid) codec — ``frmts/aaigrid/aaigriddataset.cpp``
analog.

Format: a small whitespace-separated text header (``ncols nrows
xllcorner|xllcenter yllcorner|yllcenter cellsize [dx dy] [NODATA_value]``)
followed by ``nrows`` rows of ``ncols`` values, first data row = NORTH
(top) row.  The reference writes integers without decimals and picks
Float32/Int32 on read by scanning for '.'/'e'; decode here returns int32
when every token is integral, else float64 (same discrimination).
Geotransform convention matches the reference: ``xllcorner`` is the west
edge of the west column, ``yllcorner`` the south edge of the south row, so
``gt = (xll, cellsize, 0, yll + nrows*cellsize, 0, -cellsize)``.
"""

from __future__ import annotations

import numpy as np

from .wkt import format_double as _num

__all__ = ["encode_aaigrid", "decode_aaigrid", "encode_xyz", "decode_xyz"]


def encode_aaigrid(arr: np.ndarray, *, xll: float = 0.0, yll: float = 0.0,
                   cellsize: float = 1.0, nodata=None) -> bytes:
    """2-D array (row 0 = north) -> AAIGrid text bytes."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("AAIGrid is single-band 2-D")
    nrows, ncols = arr.shape
    hdr = [f"ncols        {ncols}",
           f"nrows        {nrows}",
           f"xllcorner    {_num(xll)}",
           f"yllcorner    {_num(yll)}",
           f"cellsize     {_num(cellsize)}"]
    if nodata is not None:
        hdr.append(f"NODATA_value {_num(nodata)}")
    if np.issubdtype(arr.dtype, np.integer):
        body = "\n".join(" ".join(str(int(v)) for v in row) for row in arr)
    else:
        body = "\n".join(" ".join(_num(v) for v in row) for row in arr)
    return ("\n".join(hdr) + "\n" + body + "\n").encode("ascii")


def decode_aaigrid(data: bytes):
    """AAIGrid bytes -> (array, geotransform, nodata).

    array row 0 = north row; geotransform is the 6-tuple GDAL convention;
    nodata is None when the header has no NODATA_value."""
    text = data.decode("ascii", errors="replace")
    toks = text.split()
    pos = 0
    hdr: dict[str, float] = {}
    # header keys are case-insensitive and may appear in any order
    # (frmts/aaigrid: ParseHeader); stop at the first non-keyword token.
    keys = {"ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
            "yllcenter", "cellsize", "dx", "dy", "nodata_value"}
    while pos + 1 < len(toks) and toks[pos].lower() in keys:
        hdr[toks[pos].lower()] = float(toks[pos + 1])
        pos += 2
    if "ncols" not in hdr or "nrows" not in hdr:
        raise ValueError("AAIGrid: missing ncols/nrows header")
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    dx = hdr.get("dx", hdr.get("cellsize", 1.0))
    dy = hdr.get("dy", hdr.get("cellsize", 1.0))
    # llcenter variants shift by half a cell (aaigriddataset.cpp)
    xll = hdr.get("xllcorner", hdr.get("xllcenter", 0.0) - dx / 2.0
                  if "xllcenter" in hdr else 0.0)
    yll = hdr.get("yllcorner", hdr.get("yllcenter", 0.0) - dy / 2.0
                  if "yllcenter" in hdr else 0.0)
    nodata = hdr.get("nodata_value")
    body = toks[pos:]
    if len(body) != ncols * nrows:
        raise ValueError(f"AAIGrid: expected {ncols * nrows} values, "
                         f"got {len(body)}")
    blob = " ".join(body)
    integral = not any(c in blob for c in ".eEnN")  # nan/inf force float
    if integral:
        arr = np.array(body, dtype=np.int64)
        if (arr >= -2**31).all() and (arr < 2**31).all():
            arr = arr.astype(np.int32)
    else:
        arr = np.array(body, dtype=np.float64)
    arr = arr.reshape(nrows, ncols)
    gt = (xll, dx, 0.0, yll + nrows * dy, 0.0, -dy)
    return arr, gt, nodata


# ---------- XYZ ASCII driver (frmts/xyz/xyzdataset.cpp) ----------

def encode_xyz(arr: np.ndarray, *, xll: float = 0.0, yll: float = 0.0,
               cellsize: float = 1.0, header: bool = True) -> bytes:
    """2-D array (row 0 = north) -> 'x y z' lines at CELL CENTERS,
    x-fastest then y, north-to-south scan — the reference writer's
    ordering (frmts/xyz XYZDataset::CreateCopy)."""
    arr = np.asarray(arr)
    nrows, ncols = arr.shape
    xs = xll + (np.arange(ncols) + 0.5) * cellsize
    lines = ["X Y Z"] if header else []
    for i in range(nrows):
        y = yll + (nrows - i - 0.5) * cellsize
        row = arr[i]
        if np.issubdtype(arr.dtype, np.integer):
            lines.extend(f"{_num(x)} {_num(y)} {int(v)}"
                         for x, v in zip(xs, row))
        else:
            lines.extend(f"{_num(x)} {_num(y)} {_num(v)}"
                         for x, v in zip(xs, row))
    return ("\n".join(lines) + "\n").encode("ascii")


def decode_xyz(data: bytes):
    """'x y z' lines (any separator in [ ,;\\t], optional header, either
    y scan direction) -> (array row 0 = north, geotransform).  The
    reference infers the grid from the coordinate steps; columns must
    form a regular grid."""
    text = data.decode("ascii", errors="replace")
    rows = []
    for line in text.splitlines():
        line = line.strip().replace(",", " ").replace(";", " ")
        if not line:
            continue
        parts = line.split()
        try:
            rows.append((float(parts[0]), float(parts[1]),
                         float(parts[2])))
        except ValueError:
            continue                      # header line
    if not rows:
        raise ValueError("XYZ: no data lines")
    a = np.asarray(rows, dtype=np.float64)
    xs = np.unique(a[:, 0])
    ys = np.unique(a[:, 1])
    ncols, nrows = len(xs), len(ys)
    if ncols * nrows != len(a):
        raise ValueError("XYZ: points do not form a regular grid")
    dx = float(xs[1] - xs[0]) if ncols > 1 else 1.0
    dy = float(ys[1] - ys[0]) if nrows > 1 else 1.0
    # regular spacing check: duplicates+gaps can pass the count test
    if (ncols > 1 and not np.allclose(np.diff(xs), dx, rtol=1e-9)) or \
            (nrows > 1 and not np.allclose(np.diff(ys), dy, rtol=1e-9)):
        raise ValueError("XYZ: points do not form a regular grid")
    ci = np.searchsorted(xs, a[:, 0])
    ri = (nrows - 1) - np.searchsorted(ys, a[:, 1])  # row 0 = north
    cells = ri * ncols + ci
    if len(np.unique(cells)) != len(a):
        raise ValueError("XYZ: duplicate grid points")
    grid = np.empty((nrows, ncols), dtype=np.float64)
    grid[ri, ci] = a[:, 2]
    z = a[:, 2]
    if np.all(z == np.floor(z)) and np.abs(z).max() < 2**31:
        grid = grid.astype(np.int32)
    gt = (float(xs[0]) - dx / 2.0, dx, 0.0,
          float(ys[-1]) + dy / 2.0, 0.0, -dy)
    return grid, gt
