"""S-57 (IHO ENC) vector codec subset — ``ogr/ogrsf_frmts/s57`` analog
built on :mod:`iso8211`.

Covered: DSPM (COMF coordinate multiplier), vector records (isolated
nodes VI + edges VE with SG2D coordinate arrays), feature records
(FRID identity, ATTF attributes as numeric ATTL codes + string values,
FSPT spatial pointers with orientation).  Point (PRIM=1) and line
(PRIM=2) primitives; attributes surface as raw ATTL integer codes (the
reference resolves names through the S-57 object-class catalogue, which
is a lookup layer above the record structure).  Update files (.001+),
DSID metadata and area topology assembly are out of scope — honest
boundary, the reader raises on PRIM=3.

Record codes (s57.h): feature RCNM=100, isolated node VI=110,
connected node VC=120, edge VE=130; FSPT NAME = B(40) binary = RCNM
byte + RCID uint32 LE; ORNT 1=forward, 2=reverse.
"""

from __future__ import annotations

import numpy as np

from . import wkb
from .iso8211 import FieldDefn, decode_module, encode_module

__all__ = ["encode_s57", "decode_s57"]

RCNM_FE, RCNM_VI, RCNM_VC, RCNM_VE = 100, 110, 120, 130
_COMF = 10_000_000


def _defns() -> list[FieldDefn]:
    return [
        FieldDefn("DSPM", "Data set parameter field", [
            ("RCNM", "b11"), ("RCID", "b14"), ("HDAT", "b11"),
            ("VDAT", "b11"), ("SDAT", "b11"), ("CSCL", "b14"),
            ("DUNI", "b11"), ("HUNI", "b11"), ("PUNI", "b11"),
            ("COUN", "b11"), ("COMF", "b14"), ("SOMF", "b14")]),
        FieldDefn("VRID", "Vector record identifier field", [
            ("RCNM", "b11"), ("RCID", "b14"), ("RVER", "b12"),
            ("RUIN", "b11")]),
        FieldDefn("SG2D", "2-D coordinate field", [
            ("YCOO", "b24"), ("XCOO", "b24")], repeating=True),
        FieldDefn("FRID", "Feature record identifier field", [
            ("RCNM", "b11"), ("RCID", "b14"), ("PRIM", "b11"),
            ("GRUP", "b11"), ("OBJL", "b12"), ("RVER", "b12"),
            ("RUIN", "b11")]),
        FieldDefn("ATTF", "Feature record attribute field", [
            ("ATTL", "b12"), ("ATVL", "A")], repeating=True),
        FieldDefn("FSPT", "Feature to spatial record pointer field", [
            ("NAME", "B(40)"), ("ORNT", "b11"), ("USAG", "b11"),
            ("MASK", "b11")], repeating=True),
    ]


def _name(rcnm: int, rcid: int) -> bytes:
    return bytes([rcnm]) + int(rcid).to_bytes(4, "little")


def encode_s57(features: list[dict]) -> bytes:
    """Features -> S-57 base-cell bytes.  Each feature dict:
    ``{"objl": int, "attrs": {attl_code: str, ...}, "geom": parsed}``
    with geom a ``wkb.loads``-form Point or LineString.  Points become
    isolated-node VI records, lines become single VE edge records
    carrying the full vertex chain."""
    records: list[list[tuple[str, object]]] = []
    records.append([("DSPM", {
        "RCNM": 20, "RCID": 1, "HDAT": 2, "VDAT": 7, "SDAT": 23,
        "CSCL": 50000, "DUNI": 1, "HUNI": 1, "PUNI": 1, "COUN": 1,
        "COMF": _COMF, "SOMF": 10})])
    vec_recs = []
    feat_recs = []
    next_vrid = {RCNM_VI: 1, RCNM_VE: 1}
    for fid, f in enumerate(features, start=1):
        g = f["geom"]
        if g["type"] == "Point":
            rcnm, prim = RCNM_VI, 1
            xy = np.asarray(g["xy"], np.float64).reshape(1, 2)
        elif g["type"] == "LineString":
            rcnm, prim = RCNM_VE, 2
            xy = np.asarray(g["xy"], np.float64)
        else:
            raise ValueError(f"S-57 subset writes Point/LineString, "
                             f"not {g['type']}")
        rcid = next_vrid[rcnm]
        next_vrid[rcnm] += 1
        coords = np.rint(xy * _COMF).astype(np.int64)
        if (np.abs(coords) >= 2**31).any():
            raise ValueError("S-57: coordinate exceeds the COMF int32 "
                             "range")
        sg2d = [{"YCOO": int(y), "XCOO": int(x)} for x, y in coords]
        vec_recs.append([
            ("VRID", {"RCNM": rcnm, "RCID": rcid, "RVER": 1, "RUIN": 1}),
            ("SG2D", sg2d)])
        fr: list[tuple[str, object]] = [
            ("FRID", {"RCNM": RCNM_FE, "RCID": fid, "PRIM": prim,
                      "GRUP": 2, "OBJL": int(f.get("objl", 0)),
                      "RVER": 1, "RUIN": 1})]
        attrs = f.get("attrs") or {}
        if attrs:
            fr.append(("ATTF", [{"ATTL": int(k), "ATVL": str(v)}
                                for k, v in sorted(attrs.items())]))
        fr.append(("FSPT", [{"NAME": _name(rcnm, rcid), "ORNT": 1,
                             "USAG": 1, "MASK": 2}]))
        feat_recs.append(fr)
    return encode_module(_defns(), records + vec_recs + feat_recs)


def decode_s57(data: bytes) -> list[dict]:
    """S-57 bytes -> feature dicts ``{"rcid", "objl", "prim", "attrs",
    "wkb"}``.  FSPT pointers resolve through the vector-record map;
    ORNT=2 reverses an edge's vertex order; multi-pointer line features
    concatenate their edges."""
    _, records = decode_module(data)
    comf = float(_COMF)
    vecs: dict[tuple[int, int], np.ndarray] = {}
    feats = []
    for rec in records:
        d = dict()
        for tag, vals in rec:
            d[tag] = vals
        if "DSPM" in d:
            comf = float(d["DSPM"]["COMF"]) or comf
        elif "VRID" in d:
            key = (d["VRID"]["RCNM"], d["VRID"]["RCID"])
            pts = d.get("SG2D", [])
            xy = np.array([(p["XCOO"], p["YCOO"]) for p in pts],
                          np.float64)
            vecs[key] = xy
        elif "FRID" in d:
            feats.append(d)
    out = []
    for d in feats:
        prim = d["FRID"]["PRIM"]
        if prim not in (1, 2):
            raise NotImplementedError(
                "S-57 subset: area features (PRIM=3) need ring assembly "
                "from the edge topology (s57reader.cpp AssembleArea)")
        parts = []
        for p in d.get("FSPT", []):
            nm = p["NAME"]
            key = (nm[0], int.from_bytes(nm[1:5], "little"))
            xy = vecs[key]
            if p.get("ORNT") == 2:
                xy = xy[::-1]
            parts.append(xy)
        xy = np.vstack(parts) / comf if parts else np.empty((0, 2))
        attrs = {a["ATTL"]: a["ATVL"] for a in d.get("ATTF", [])}
        if prim == 1:
            blob = wkb.dumps({"type": "Point", "xy": xy[0]})
        else:
            blob = wkb.dumps({"type": "LineString", "xy": xy})
        out.append({"rcid": d["FRID"]["RCID"], "objl": d["FRID"]["OBJL"],
                    "prim": prim, "attrs": attrs, "wkb": blob})
    return out
