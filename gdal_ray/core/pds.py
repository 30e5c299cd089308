"""NASA PDS3 raster codec subset — ``frmts/pds/pdsdataset.cpp`` analog.

ODL label parse (KEY = VALUE lines, OBJECT/END_OBJECT nesting,
``^IMAGE = n <BYTES>`` byte pointers) + raw image data: 8/16/32-bit
MSB/LSB integers, IEEE/PC reals, BAND_SEQUENTIAL multiband.  Map
projection keywords are not interpreted (identity geotransform) — the
reference's projection branch needs the full PDS cartography dictionary.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_pds", "decode_pds"]

_ST = {("MSB_INTEGER", 8): "u1", ("MSB_UNSIGNED_INTEGER", 8): "u1",
       ("MSB_INTEGER", 16): ">i2", ("MSB_UNSIGNED_INTEGER", 16): ">u2",
       ("MSB_INTEGER", 32): ">i4", ("MSB_UNSIGNED_INTEGER", 32): ">u4",
       ("LSB_INTEGER", 16): "<i2", ("LSB_UNSIGNED_INTEGER", 16): "<u2",
       ("LSB_INTEGER", 32): "<i4", ("LSB_UNSIGNED_INTEGER", 32): "<u4",
       ("IEEE_REAL", 32): ">f4", ("IEEE_REAL", 64): ">f8",
       ("PC_REAL", 32): "<f4", ("PC_REAL", 64): "<f8"}
_ST_INV = {np.dtype(np.uint8): ("MSB_UNSIGNED_INTEGER", 8),
           np.dtype(np.int16): ("MSB_INTEGER", 16),
           np.dtype(np.uint16): ("MSB_UNSIGNED_INTEGER", 16),
           np.dtype(np.int32): ("MSB_INTEGER", 32),
           np.dtype(np.float32): ("IEEE_REAL", 32),
           np.dtype(np.float64): ("IEEE_REAL", 64)}

_LABEL_PAD = 2048


def encode_pds(arr: np.ndarray) -> bytes:
    """(bands, rows, cols) or 2-D array -> PDS3 bytes: ODL label padded
    to 2048 bytes, ``^IMAGE`` 1-based byte pointer, BAND_SEQUENTIAL
    big-endian samples (the PDS archive convention)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, nrows, ncols = arr.shape
    st = _ST_INV.get(arr.dtype)
    if st is None:
        raise ValueError(f"PDS: unsupported dtype {arr.dtype}")
    stype, bits = st
    label = (
        "PDS_VERSION_ID = PDS3\r\n"
        "RECORD_TYPE = UNDEFINED\r\n"
        f"^IMAGE = {_LABEL_PAD + 1} <BYTES>\r\n"
        "OBJECT = IMAGE\r\n"
        f"  LINES = {nrows}\r\n"
        f"  LINE_SAMPLES = {ncols}\r\n"
        f"  SAMPLE_TYPE = {stype}\r\n"
        f"  SAMPLE_BITS = {bits}\r\n"
        f"  BANDS = {nb}\r\n"
        "  BAND_STORAGE_TYPE = BAND_SEQUENTIAL\r\n"
        "END_OBJECT = IMAGE\r\n"
        "END\r\n").encode("ascii")
    if len(label) > _LABEL_PAD:
        raise ValueError("PDS: label exceeds the fixed pad")
    dt = np.dtype(_ST[(stype, bits)])
    return label.ljust(_LABEL_PAD) + arr.astype(dt).tobytes()


def _parse_label(text: str) -> dict:
    """Flat ODL parse: OBJECT nesting becomes dotted keys
    (IMAGE.LINES); values keep their raw token text."""
    kv: dict[str, str] = {}
    stack: list[str] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("/*"):
            continue
        if line == "END":
            break
        if "=" not in line:
            continue
        k, _, v = line.partition("=")
        k, v = k.strip(), v.strip().strip('"')
        if k == "OBJECT" or k == "GROUP":
            stack.append(v)
        elif k in ("END_OBJECT", "END_GROUP"):
            if stack:
                stack.pop()
        else:
            kv[".".join(stack + [k])] = v
    return kv


def decode_pds(data: bytes):
    """PDS3 bytes -> ((bands,rows,cols) or 2-D array, identity
    geotransform, nodata-or-None)."""
    # label is the leading ASCII region; parse up to END + pad
    head = data[:65536].decode("ascii", errors="replace")
    kv = _parse_label(head)
    if kv.get("PDS_VERSION_ID") != "PDS3":
        raise ValueError("PDS: missing PDS_VERSION_ID = PDS3")
    ptr = kv.get("^IMAGE", "")
    if "<BYTES>" in ptr:
        offset = int(ptr.split("<")[0].strip().strip("()").split(",")[-1]
                     ) - 1
    else:
        rb = int(kv.get("RECORD_BYTES", "0") or 0)
        offset = (int(ptr) - 1) * rb
    nrows = int(kv["IMAGE.LINES"])
    ncols = int(kv["IMAGE.LINE_SAMPLES"])
    nb = int(kv.get("IMAGE.BANDS", "1"))
    stype = kv.get("IMAGE.SAMPLE_TYPE", "MSB_INTEGER")
    bits = int(kv.get("IMAGE.SAMPLE_BITS", "8"))
    dt = _ST.get((stype, bits))
    if dt is None:
        raise ValueError(f"PDS: SAMPLE_TYPE {stype}/{bits} not supported")
    dt = np.dtype(dt)
    cube = np.frombuffer(data, dtype=dt, count=nb * nrows * ncols,
                         offset=offset).reshape(nb, nrows, ncols)
    cube = np.ascontiguousarray(cube).astype(dt.newbyteorder("="))
    if nb == 1:
        cube = cube[0]
    nd = kv.get("IMAGE.MISSING_CONSTANT")
    return cube, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0), \
        (float(nd) if nd else None)
