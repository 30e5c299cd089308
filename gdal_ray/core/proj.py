"""Coordinate reference systems + transforms, pure numpy.

Replaces the reference's PROJ-backed ``OGRCoordinateTransformation``
(``ogr/ogrct.cpp:665`` OGRProjCT, ``TransformWithErrorCodes`` :2286) for the
CRS set this engine supports:

  - EPSG:4326  geographic WGS84 (lon/lat degrees)
  - EPSG:3857  spherical web-mercator (the gdal2tiles GlobalMercator math)
  - EPSG:326xx / 327xx  WGS84 UTM zones north/south (transverse Mercator)

The transverse-Mercator forward/inverse uses the standard published
Karney–Krüger 6th-order series in n = f/(2-f) (sub-micrometer accuracy for
UTM extents) — the same math PROJ's ``tmerc`` (approx=false) implements.

``Transformer`` objects are cheap but cached per (src, dst) pair by the warp
actors (SURVEY §2.3: state loaded once per worker).
"""

from __future__ import annotations

import numpy as np

from . import mercator

# WGS84 ellipsoid
A = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2.0 - F)
E = np.sqrt(E2)
_N = F / (2.0 - F)

# Rectifying-radius factor: A_cap = a/(1+n) * (1 + n^2/4 + n^4/64 + n^6/256)
_A_CAP = A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

# Karney 2011 series coefficients (order 6)
_ALPHA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180 - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630 - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880 + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
])
_BETA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360 - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105 - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480 + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
])
_DELTA = np.array([
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45 + 26 * _N**5 / 45 - 2854 * _N**6 / 675,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45 + 2704 * _N**5 / 315 + 2323 * _N**6 / 945,
    56 * _N**3 / 15 - 136 * _N**4 / 35 - 1262 * _N**5 / 105 + 73814 * _N**6 / 2835,
    4279 * _N**4 / 630 - 332 * _N**5 / 35 - 399572 * _N**6 / 14175,
    4174 * _N**5 / 315 - 144838 * _N**6 / 6237,
    601676 * _N**6 / 22275,
])
_K0_UTM = 0.9996
_J = np.arange(1, 7, dtype=np.float64)


def tmerc_forward(lon, lat, lon0_deg: float, k0: float = _K0_UTM,
                  fe: float = 500000.0, fn: float = 0.0):
    """Geographic (deg) -> transverse-Mercator easting/northing."""
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    # conformal latitude
    t = np.sinh(np.arctanh(sphi) - E * np.arctanh(E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    two_j_xi = 2.0 * np.multiply.outer(_J, xi_p)
    two_j_eta = 2.0 * np.multiply.outer(_J, eta_p)
    alpha = _ALPHA.reshape((6,) + (1,) * xi_p.ndim)
    xi = xi_p + np.sum(alpha * np.sin(two_j_xi) * np.cosh(two_j_eta), axis=0)
    eta = eta_p + np.sum(alpha * np.cos(two_j_xi) * np.sinh(two_j_eta), axis=0)
    return fe + k0 * _A_CAP * eta, fn + k0 * _A_CAP * xi


def tmerc_inverse(x, y, lon0_deg: float, k0: float = _K0_UTM,
                  fe: float = 500000.0, fn: float = 0.0):
    """Transverse-Mercator easting/northing -> geographic (deg)."""
    xi = (np.asarray(y, dtype=np.float64) - fn) / (k0 * _A_CAP)
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * _A_CAP)
    two_j_xi = 2.0 * np.multiply.outer(_J, xi)
    two_j_eta = 2.0 * np.multiply.outer(_J, eta)
    beta = _BETA.reshape((6,) + (1,) * xi.ndim)
    xi_p = xi - np.sum(beta * np.sin(two_j_xi) * np.cosh(two_j_eta), axis=0)
    eta_p = eta - np.sum(beta * np.cos(two_j_xi) * np.sinh(two_j_eta), axis=0)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    delta = _DELTA.reshape((6,) + (1,) * chi.ndim)
    phi = chi + np.sum(delta * np.sin(2.0 * np.multiply.outer(_J, chi)), axis=0)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0_deg + np.rad2deg(lam), np.rad2deg(phi)


# ---------- conic + polar projections (Snyder closed forms) ----------
# Lambert conformal conic (1SP/2SP), Albers equal-area conic, and polar
# stereographic per Snyder, "Map Projections — A Working Manual" (USGS PP
# 1395), eqs 15-*, 14-*, 21-* — the same closed forms PROJ's lcc/aea/stere
# implement (reference delegates to PROJ via ogr/ogrct.cpp:665).

ELLIPSOIDS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "clrk66": (6378206.4, 1.0 / 294.978698214),
    "sphere": (6370997.0, 0.0),
}


def _ell(desc):
    a, f = desc.get("ellps", ELLIPSOIDS["WGS84"])
    e2 = f * (2.0 - f)
    return a, e2, np.sqrt(e2)


def _m_snyder(phi, e):
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


def _t_snyder(phi, e):
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / \
        ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)


def _phi_from_t(t, e, iters: int = 12):
    """Invert t(φ) by the standard fixed-point iteration (Snyder 7-9)."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
    return phi


def _q_snyder(phi, e, e2):
    s = np.sin(phi)
    return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                         - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s)))


def _lcc_consts(desc):
    a, e2, e = _ell(desc)
    p1 = np.deg2rad(desc["lat_1"])
    p2 = np.deg2rad(desc.get("lat_2", desc["lat_1"]))
    p0 = np.deg2rad(desc["lat_0"])
    m1, t1 = _m_snyder(p1, e), _t_snyder(p1, e)
    if abs(p1 - p2) < 1e-12:
        n = np.sin(p1)
    else:
        m2, t2 = _m_snyder(p2, e), _t_snyder(p2, e)
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = desc.get("k_0", 1.0) * m1 / (n * t1 ** n)
    rho0 = a * F * _t_snyder(p0, e) ** n
    return a, e, n, F, rho0


def lcc_forward(lon, lat, desc):
    a, e, n, F, rho0 = _lcc_consts(desc)
    lam = np.deg2rad(np.asarray(lon, np.float64) - desc["lon_0"])
    phi = np.deg2rad(np.asarray(lat, np.float64))
    rho = a * F * _t_snyder(phi, e) ** n
    th = n * lam
    return (desc.get("x_0", 0.0) + rho * np.sin(th),
            desc.get("y_0", 0.0) + rho0 - rho * np.cos(th))


def lcc_inverse(x, y, desc):
    a, e, n, F, rho0 = _lcc_consts(desc)
    dx = np.asarray(x, np.float64) - desc.get("x_0", 0.0)
    dy = rho0 - (np.asarray(y, np.float64) - desc.get("y_0", 0.0))
    rho = np.sign(n) * np.sqrt(dx * dx + dy * dy)
    t = (rho / (a * F)) ** (1.0 / n)
    th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    return (desc["lon_0"] + np.rad2deg(th / n),
            np.rad2deg(_phi_from_t(t, e)))


def _aea_consts(desc):
    a, e2, e = _ell(desc)
    p1 = np.deg2rad(desc["lat_1"])
    p2 = np.deg2rad(desc.get("lat_2", desc["lat_1"]))
    p0 = np.deg2rad(desc["lat_0"])
    m1, q1 = _m_snyder(p1, e), _q_snyder(p1, e, e2)
    if abs(p1 - p2) < 1e-12:
        n = np.sin(p1)
    else:
        m2, q2 = _m_snyder(p2, e), _q_snyder(p2, e, e2)
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * _q_snyder(p0, e, e2)) / n
    return a, e, e2, n, C, rho0


def aea_forward(lon, lat, desc):
    a, e, e2, n, C, rho0 = _aea_consts(desc)
    lam = np.deg2rad(np.asarray(lon, np.float64) - desc["lon_0"])
    phi = np.deg2rad(np.asarray(lat, np.float64))
    rho = a * np.sqrt(C - n * _q_snyder(phi, e, e2)) / n
    th = n * lam
    return (desc.get("x_0", 0.0) + rho * np.sin(th),
            desc.get("y_0", 0.0) + rho0 - rho * np.cos(th))


def aea_inverse(x, y, desc):
    a, e, e2, n, C, rho0 = _aea_consts(desc)
    dx = np.asarray(x, np.float64) - desc.get("x_0", 0.0)
    dy = rho0 - (np.asarray(y, np.float64) - desc.get("y_0", 0.0))
    rho = np.sqrt(dx * dx + dy * dy)
    q = (C - (rho * n / a) ** 2) / n
    th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    # Snyder 3-16 iteration for φ from q
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(12):
        s = np.sin(phi)
        d = 1.0 - e2 * s * s
        phi = phi + d * d / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2) - s / d
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s)))
    return desc["lon_0"] + np.rad2deg(th / n), np.rad2deg(phi)


def _ps_consts(desc):
    a, e2, e = _ell(desc)
    ts = np.deg2rad(abs(desc.get("lat_ts", 90.0)))
    if abs(ts - np.pi / 2.0) < 1e-12:
        # variant A: k0 at the pole (Snyder 21-33)
        kf = 2.0 * desc.get("k_0", 1.0) / np.sqrt(
            (1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    else:
        kf = _m_snyder(ts, e) / _t_snyder(ts, e)
    return a, e, kf


def stere_forward(lon, lat, desc):
    a, e, kf = _ps_consts(desc)
    south = desc.get("south", False)
    lam = np.deg2rad(np.asarray(lon, np.float64) - desc["lon_0"])
    phi = np.deg2rad(np.asarray(lat, np.float64))
    if south:
        phi, lam = -phi, -lam
    rho = a * kf * _t_snyder(phi, e)
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    if south:
        x, y = -x, -y
    return desc.get("x_0", 0.0) + x, desc.get("y_0", 0.0) + y


def stere_inverse(x, y, desc):
    a, e, kf = _ps_consts(desc)
    south = desc.get("south", False)
    dx = np.asarray(x, np.float64) - desc.get("x_0", 0.0)
    dy = np.asarray(y, np.float64) - desc.get("y_0", 0.0)
    if south:
        dx, dy = -dx, -dy
    rho = np.sqrt(dx * dx + dy * dy)
    t = rho / (a * kf)
    phi = _phi_from_t(t, e)
    lam = np.arctan2(dx, -dy)
    if south:
        phi, lam = -phi, -lam
    return desc["lon_0"] + np.rad2deg(lam), np.rad2deg(phi)


# EPSG registrations for the conic/polar set (parameters per the EPSG
# registry entries; ellipsoid per each CRS's datum)
_EPSG_PARAMS = {
    # RGF93 / Lambert-93 (France national grid)
    2154: {"kind": "lcc", "lat_1": 49.0, "lat_2": 44.0, "lat_0": 46.5,
           "lon_0": 3.0, "x_0": 700000.0, "y_0": 6600000.0,
           "ellps": ELLIPSOIDS["GRS80"]},
    # NAD83 / Conus Albers
    5070: {"kind": "aea", "lat_1": 29.5, "lat_2": 45.5, "lat_0": 23.0,
           "lon_0": -96.0, "x_0": 0.0, "y_0": 0.0,
           "ellps": ELLIPSOIDS["GRS80"]},
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    3413: {"kind": "stere", "lat_ts": 70.0, "lon_0": -45.0,
           "x_0": 0.0, "y_0": 0.0, "south": False,
           "ellps": ELLIPSOIDS["WGS84"]},
    # WGS84 / Antarctic Polar Stereographic
    3031: {"kind": "stere", "lat_ts": -71.0, "lon_0": 0.0,
           "x_0": 0.0, "y_0": 0.0, "south": True,
           "ellps": ELLIPSOIDS["WGS84"]},
}


def _parse_proj_string(crs: str):
    """Minimal PROJ-string parser: '+proj=lcc +lat_1=.. +lat_2=.. +lat_0=..
    +lon_0=.. +k_0=.. +x_0=.. +y_0=.. +ellps=GRS80 [+south]' for
    lcc / aea / stere / tmerc / longlat."""
    kv = {}
    for tok in crs.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        else:
            kv[tok] = True
    proj = kv.get("proj")
    if proj not in ("lcc", "aea", "stere", "tmerc", "longlat"):
        raise ValueError(f"unsupported +proj={proj!r}")
    if proj == "longlat":
        return {"kind": "geographic", "code": crs}
    ell = ELLIPSOIDS.get(kv.get("ellps", "WGS84"))
    if ell is None:
        raise ValueError(f"unsupported ellipsoid {kv.get('ellps')!r}")
    d = {"kind": proj, "code": crs, "ellps": ell,
         "lon_0": float(kv.get("lon_0", 0.0)),
         "x_0": float(kv.get("x_0", 0.0)),
         "y_0": float(kv.get("y_0", 0.0))}
    for k in ("lat_0", "lat_1", "lat_2", "lat_ts", "k_0"):
        if k in kv:
            d[k] = float(kv[k])
    if proj == "stere":
        lat0 = float(kv.get("lat_0", 90.0))
        if abs(abs(lat0) - 90.0) > 1e-9:
            raise ValueError("only polar stereographic (lat_0=±90) supported")
        d["south"] = lat0 < 0 or bool(kv.get("south"))
        if "lat_ts" not in d:
            d["lat_ts"] = 90.0
    if proj in ("lcc", "aea"):
        if "lat_1" not in d:
            raise ValueError(f"+proj={proj} needs +lat_1")
        d.setdefault("lat_0", d["lat_1"])
    if proj == "tmerc":
        d["kind"] = "tmerc_custom"
        d.setdefault("k_0", 1.0)
        d.setdefault("lat_0", 0.0)
        if abs(d["lat_0"]) > 1e-9:
            raise ValueError("tmerc with lat_0 != 0 unsupported")
        if kv.get("ellps", "WGS84") not in ("WGS84", "GRS80"):
            raise ValueError("tmerc series constants are WGS84/GRS80-only")
    return d


def parse_crs(crs: str):
    """'EPSG:4326' | 'EPSG:3857' | UTM | conic/polar EPSG codes | a PROJ
    string ('+proj=lcc +lat_1=…') -> descriptor dict."""
    crs = crs.strip()
    if crs.startswith("+"):
        return _parse_proj_string(crs)
    crs = crs.upper()
    if not crs.startswith("EPSG:"):
        raise ValueError(f"unsupported CRS {crs!r}")
    code = int(crs[5:])
    if code == 4326:
        return {"kind": "geographic", "code": code}
    if code == 3857:
        return {"kind": "webmercator", "code": code}
    if 32601 <= code <= 32660:
        return {"kind": "utm", "code": code, "zone": code - 32600, "south": False}
    if 32701 <= code <= 32760:
        return {"kind": "utm", "code": code, "zone": code - 32700, "south": True}
    if code in _EPSG_PARAMS:
        return dict(_EPSG_PARAMS[code], code=code)
    raise ValueError(f"unsupported CRS {crs!r}")


def _to_lonlat(desc, x, y):
    k = desc["kind"]
    if k == "geographic":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if k == "webmercator":
        lat, lon = mercator.meters_to_latlon(x, y)
        return lon, lat
    if k == "utm":
        lon0 = (desc["zone"] - 1) * 6 - 180 + 3
        fn = 10000000.0 if desc["south"] else 0.0
        return tmerc_inverse(x, y, lon0, fn=fn)
    if k == "lcc":
        return lcc_inverse(x, y, desc)
    if k == "aea":
        return aea_inverse(x, y, desc)
    if k == "stere":
        return stere_inverse(x, y, desc)
    if k == "tmerc_custom":
        return tmerc_inverse(x, y, desc["lon_0"], k0=desc["k_0"],
                             fe=desc["x_0"], fn=desc["y_0"])
    raise AssertionError(k)


def _from_lonlat(desc, lon, lat):
    k = desc["kind"]
    if k == "geographic":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if k == "webmercator":
        mx, my = mercator.latlon_to_meters(lat, lon)
        return mx, my
    if k == "utm":
        lon0 = (desc["zone"] - 1) * 6 - 180 + 3
        fn = 10000000.0 if desc["south"] else 0.0
        return tmerc_forward(lon, lat, lon0, fn=fn)
    if k == "lcc":
        return lcc_forward(lon, lat, desc)
    if k == "aea":
        return aea_forward(lon, lat, desc)
    if k == "stere":
        return stere_forward(lon, lat, desc)
    if k == "tmerc_custom":
        return tmerc_forward(lon, lat, desc["lon_0"], k0=desc["k_0"],
                             fe=desc["x_0"], fn=desc["y_0"])
    raise AssertionError(k)


class Transformer:
    """src CRS -> dst CRS point transform; x/y arrays in, x/y arrays out.

    Axis convention: x = lon/easting, y = lat/northing (the "traditional GIS
    order" the reference uses via OAMS_TRADITIONAL_GIS_ORDER).
    """

    def __init__(self, src_crs: str, dst_crs: str):
        self.src = parse_crs(src_crs)
        self.dst = parse_crs(dst_crs)
        self.identity = self.src["code"] == self.dst["code"]

    def transform(self, x, y):
        if self.identity:
            return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        lon, lat = _to_lonlat(self.src, x, y)
        return _from_lonlat(self.dst, lon, lat)


_CACHE: dict[tuple, Transformer] = {}


def get_transformer(src_crs: str, dst_crs: str) -> Transformer:
    """Process-level LRU-ish cache — actors call this per batch and pay the
    construction cost only once per (src, dst) pair (SURVEY §2.3)."""
    key = (src_crs, dst_crs)
    t = _CACHE.get(key)
    if t is None:
        if len(_CACHE) > 256:
            _CACHE.clear()
        t = _CACHE[key] = Transformer(src_crs, dst_crs)
    return t
