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


def parse_crs(crs: str):
    """'EPSG:4326' | 'EPSG:3857' | 'EPSG:326xx'/'327xx' -> descriptor dict."""
    crs = crs.strip().upper()
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
