"""Expression-engine conformance: mirrors the reference's OGR SQL basics
(autotest/ogr/ogr_sql_test.py shapes) and cross-checks EVERY expression
against DuckDB evaluating the same predicate over the same table."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.expr import (eval_expr, filter_table, parse_expr,
                                     project_table)


@pytest.fixture(scope="module")
def tbl():
    return pa.table({
        "fid": pa.array(range(10), pa.int64()),
        "pop": pa.array([0, 150, 2000, 35, None, 1200, 999, 1000, 7, 64],
                        pa.int64()),
        "area": pa.array([1.5, 2.0, 0.5, 3.25, 1.0, 4.0, 2.5, 0.25, 8.0, 1.0],
                         pa.float64()),
        "name": pa.array(["Athens", "berlin", "Cairo", "athens", None,
                          "Boston", "Ankara", "Amman", "Beirut", "Accra"]),
    })


WHERE_CASES = [
    "pop > 1000",
    "pop > 1000 AND name LIKE 'A%'",
    "pop >= 1000 OR area < 1.0",
    "NOT (pop < 500)",
    "name LIKE '%a%'",
    "name LIKE 'A_h%'",
    "name NOT LIKE 'A%'",
    "pop IS NULL",
    "name IS NOT NULL AND pop IS NOT NULL",
    "fid IN (1, 3, 5)",
    "fid NOT IN (0, 9)",
    "pop BETWEEN 100 AND 1200",
    "pop NOT BETWEEN 100 AND 1200",
    "pop + 1 = 1000",
    "pop * 2 > area * 100",
    "pop - 50 >= 100",
    "pop / 2 = 500",
    "fid % 3 = 1",
    "-pop < -500",
    "UPPER(name) = 'ATHENS'",
    "LOWER(name) LIKE 'a%'",
    "LENGTH(name) = 6",
    "SUBSTR(name, 1, 2) = 'At'",
    "SUBSTR(name, 3) = 'hens'",
    "ABS(pop - 1000) <= 1",
    "FLOOR(area) = 2",
    "CEIL(area) = 3",
    "ROUND(area) = 2",
    "CAST(pop AS DOUBLE) / 3 > 300",
    "CAST(area AS INTEGER) = 1",
    "COALESCE(pop, 0) < 100",
    "pop > 100 AND (name LIKE 'B%' OR name LIKE 'C%')",
    "TRUE",
    "FALSE OR fid = 2",
    "name = 'Athens' OR name = 'athens'",
    "name <> 'Athens'",
    "pop != 1000",
]


def _duck_filter(tbl, where):
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute(
        f"SELECT fid FROM t WHERE {where} ORDER BY fid").df()["fid"].tolist()


@pytest.mark.parametrize("where", WHERE_CASES)
def test_where_matches_duckdb(tbl, where):
    got = sorted(filter_table(tbl, where).column("fid").to_pylist())
    assert got == _duck_filter(tbl, where), where


def test_parse_errors():
    for bad in ("pop >", "name LIKE", "fid IN (", "1 +", "((pop)", "pop @@ 3"):
        with pytest.raises((ValueError, KeyError)):
            parse_expr(bad)
    with pytest.raises(KeyError):
        filter_table(pa.table({"a": [1]}), "missing_col = 1")


def test_eval_arithmetic(tbl):
    v = eval_expr("pop * 2 + 1", tbl)
    expect = [None if p is None else p * 2 + 1
              for p in tbl.column("pop").to_pylist()]
    assert v.to_pylist() == expect


def test_project_table(tbl):
    out = project_table(tbl, "fid, pop * 2 AS pop2, UPPER(name) AS nm")
    assert out.column_names == ["fid", "pop2", "nm"]
    assert out.column("pop2")[2].as_py() == 4000
    assert out.column("nm")[1].as_py() == "BERLIN"
    star = project_table(tbl, "*, area * 2 AS a2")
    assert star.column_names == ["fid", "pop", "area", "name", "a2"]


def test_concat_and_string_literals(tbl):
    out = project_table(tbl, "CONCAT(name, '-', CAST(fid AS VARCHAR)) AS tag")
    assert out.column("tag")[0].as_py() == "Athens-0"


def test_pipeline_filter_stage(ray_session):
    import ray.data

    from gdal_ray.pipelines import pipeline_spec as PS
    ds = ray.data.from_arrow(pa.table({
        "pop": pa.array([10, 2000, 1500, 50], pa.int64()),
        "name": pa.array(["x", "Alpha", "Argon", "Beta"]),
    }))
    out = PS._REGISTRY["filter"](ds, where="pop > 1000 AND name LIKE 'A%'")
    out = PS._REGISTRY["sql_select"](out, exprs="name, pop / 2 AS half")
    rows = sorted(out.take_all(), key=lambda r: r["name"])
    assert [r["name"] for r in rows] == ["Alpha", "Argon"]
    assert [r["half"] for r in rows] == [1000, 750]
