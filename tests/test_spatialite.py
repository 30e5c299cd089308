"""SpatiaLite driver tests (ogr/ogrsf_frmts/sqlite analog): gaia BLOB
codec both ways, metadata sniffing, Ray reader/sink roundtrip."""

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources import vector_formats as VF
from gdal_ray.sources import vector_writers as VW
from tests.test_vector_writers import _fixture_geoms, _fixture_table


def test_gaia_blob_roundtrip_all_types():
    for name, g in _fixture_geoms().items():
        data = W.dumps(g)
        blob = VW.wkb_to_gaia_blob(data, srid=4326)
        assert blob[0] == 0x00 and blob[1] == 0x01
        assert blob[38] == 0x7C and blob[-1] == 0xFE
        assert struct.unpack_from("<i", blob, 2)[0] == 4326
        assert VF.gaia_to_wkb(blob) == data, name


def test_gaia_mbr_matches_envelope():
    g = _fixture_geoms()["poly_hole"]
    blob = VW.wkb_to_gaia_blob(W.dumps(g))
    minx, miny, maxx, maxy = struct.unpack_from("<4d", blob, 6)
    assert (minx, miny, maxx, maxy) == (0.0, 0.0, 4.0, 4.0)


def test_gaia_zm_roundtrip():
    zsq = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],
                   dtype=np.float64)
    for extra, code_off in [({"z": [np.arange(5.0)]}, 1000),
                            ({"m": [np.arange(5.0) * 2]}, 2000),
                            ({"z": [np.arange(5.0)],
                              "m": [np.arange(5.0) * 2]}, 3000)]:
        g = {"type": "Polygon", "rings": [zsq], **extra}
        data = W.dumps(g)
        blob = VW.wkb_to_gaia_blob(data)
        assert struct.unpack_from("<i", blob, 39)[0] == 3 + code_off
        assert VF.gaia_to_wkb(blob) == data


def test_gaia_big_endian_decode():
    # hand-built big-endian POINT(3 7), srid 0
    blob = (b"\x00\x00" + struct.pack(">i", 0)
            + struct.pack(">4d", 3, 7, 3, 7) + b"\x7c"
            + struct.pack(">i", 1) + struct.pack(">2d", 3, 7) + b"\xfe")
    g = W.loads(VF.gaia_to_wkb(blob))
    assert g["type"] == "Point" and tuple(g["xy"]) == (3.0, 7.0)


def test_gaia_rejects():
    assert VF.gaia_to_wkb(None) is None
    with pytest.raises(ValueError):
        VF.gaia_to_wkb(b"\x01" + b"\x00" * 42 + b"\xfe")
    blob = bytearray(VW.wkb_to_gaia_blob(W.point(1, 2)))
    struct.pack_into("<i", blob, 39, 1000001)     # compressed class
    with pytest.raises(ValueError):
        VF.gaia_to_wkb(bytes(blob))


def test_spatialite_bytes_metadata():
    tab = _fixture_table()
    payload = VW.spatialite_bytes({"features": tab})
    con = sqlite3.connect(":memory:")
    con.deserialize(payload)
    # the reference sniffs these two tables to detect SpatiaLite
    rows = con.execute(
        "SELECT f_table_name, f_geometry_column, geometry_type, srid, "
        "coord_dimension FROM geometry_columns").fetchall()
    assert rows == [("features", "geometry", 0, 4326, 2)]  # mixed → 0
    assert con.execute("SELECT auth_srid FROM spatial_ref_sys "
                       "WHERE srid=4326").fetchone() == (4326,)
    # uniform-type layer records its class
    pts = pa.table({"wkb": pa.array([W.point(1, 2), W.point(3, 4)],
                                    pa.binary())})
    con2 = sqlite3.connect(":memory:")
    con2.deserialize(VW.spatialite_bytes({"pts": pts}))
    assert con2.execute("SELECT geometry_type FROM geometry_columns") \
        .fetchone() == (1,)
    con.close()
    con2.close()


def test_spatialite_reader_roundtrip(tmp_path, ray_session):
    tab = _fixture_table()
    path = tmp_path / "out.sqlite"
    path.write_bytes(VW.spatialite_bytes({"features": tab}))
    back = VF.read_spatialite(str(path)).to_pandas().sort_values("rank")
    assert list(back["name"]) == tab.column("name").to_pylist()
    assert list(back["wkb"]) == tab.column("wkb").to_pylist()
    assert list(back["fid"]) == list(range(1, 8))


def test_spatialite_sink_readback(tmp_path, ray_session):
    import ray

    tab = _fixture_table()
    ds = ray.data.from_arrow(tab)
    man = VW.write_spatialite(ds, str(tmp_path / "slite"),
                              table="pts").to_pandas()
    assert man["n_features"].sum() == tab.num_rows
    back = VF.read_spatialite(sorted(man["path"]), table="pts").to_pandas()
    assert sorted(back["name"]) == sorted(tab.column("name").to_pylist())
    got = {n: w for n, w in zip(back["name"], back["wkb"])}
    exp = {n: w for n, w in zip(tab.column("name").to_pylist(),
                                tab.column("wkb").to_pylist())}
    assert got == exp
