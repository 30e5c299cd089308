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


# ---------- run_sql: the full gensql surface (round 4) ----------

SF = "/root/testdata/sf0.001"

_SQL_CASES = [
    "SELECT n_name, n_regionkey FROM nation WHERE n_regionkey >= 2 ORDER BY n_name",
    "SELECT c_mktsegment, COUNT(*) AS n, SUM(c_acctbal) AS s FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "SELECT o_orderpriority, COUNT(*) AS n FROM orders WHERE o_totalprice > 150000 GROUP BY o_orderpriority HAVING COUNT(*) > 10 ORDER BY o_orderpriority",
    "SELECT r_name, COUNT(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
    "SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx, COUNT(*) AS n FROM orders",
    "SELECT AVG(c_acctbal) AS a, COUNT(c_acctbal) AS n FROM customer WHERE c_nationkey < 10",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 7",
    "SELECT c_mktsegment, SUM(o_totalprice) AS rev FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_totalprice > 100000 GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sq, AVG(l_extendedprice) AS ap, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "SELECT UPPER(n_name) AS nm, n_nationkey + 100 AS k2 FROM nation WHERE n_name LIKE '%A%' ORDER BY nm",
]


@pytest.mark.parametrize("q", _SQL_CASES, ids=range(len(_SQL_CASES)))
def test_run_sql_matches_duckdb(ray_session, q):
    import ray.data

    from gdal_ray.functions.sql import run_sql
    names = ["nation", "region", "customer", "orders", "lineitem"]
    tables = {t: ray.data.read_parquet(f"{SF}/{t}.parquet") for t in names}
    got = run_sql(tables, q).to_pandas()
    con = duckdb.connect()
    for t in names:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(q).df()
    g2, e2 = got[sorted(got.columns)], exp[sorted(exp.columns)]
    if "ORDER BY" not in q:
        g2 = g2.sort_values(list(g2.columns)).reset_index(drop=True)
        e2 = e2.sort_values(list(e2.columns)).reset_index(drop=True)
    else:
        g2, e2 = g2.reset_index(drop=True), e2.reset_index(drop=True)
    assert g2.shape == e2.shape
    for c in g2.columns:
        if np.issubdtype(g2[c].dtype, np.number):
            np.testing.assert_allclose(g2[c].astype(float),
                                       e2[c].astype(float), rtol=1e-12)
        else:
            assert (g2[c] == e2[c]).all()


def test_sql_pipeline_stage(ray_session):
    import ray.data

    from gdal_ray.pipelines import pipeline_spec as PS
    ds = ray.data.read_parquet(f"{SF}/nation.parquet")
    out = PS._REGISTRY["sql"](
        ds,
        query="SELECT r_name, COUNT(*) AS n FROM input "
              "JOIN region ON n_regionkey = r_regionkey "
              "GROUP BY r_name ORDER BY r_name",
        tables={"region": f"{SF}/region.parquet"})
    rows = out.take_all()
    assert len(rows) == 5 and sum(r["n"] for r in rows) == 25
