"""The remaining TPC-H query SHAPES, adapted to the synthetic schema.

Together with q1/q3/q5/q13/q18 in ``relational.py`` this completes all 22
TPC-H patterns — each one exercises a genuinely different relational plan
shape on the Ray engine (correlated min + join-back, EXISTS semi over a
coupled predicate, disjunctive join predicates, nested aggregate
thresholds, scalar-subquery filters, double-anti per-group logic …).
The OGR SQL engine (reference ``ogr/swq.cpp``, ``ogr_sql_sqlite``) exposes
the same SELECT surface; these pin the distributed plans against DuckDB.

Schema adaptations (the synthetic tables lack partsupp / phone /
shipmode / commitdate / receiptdate):

* partsupp-analog: per ``(l_partkey, l_suppkey)`` unit cost derived from
  lineitem itself (``floor(extprice·100+0.5) // qty`` — integer cents per
  unit, min over the pair's lines).
* "late" (q4/q21): ``l_shipdate ≥ o_orderdate + N days`` — the coupled
  two-table predicate the commit/receipt pair normally provides.
* q22 country code: the trailing digits of ``c_name`` (names are fixed
  'Customer#%09d', so substr is deterministic).

Exactness rules (CLAUDE.md parity playbook): money stays in scaled int64
until ONE final division; date windows compare int64 microseconds; DuckDB
``//`` truncates == numpy ``//`` floors on the non-negative ints used
here; CAST(double AS BIGINT) in DuckDB ROUNDS (quantities are whole, so
it equals the numpy int64 cast used Ray-side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _join_partitions, _read
from .shuffle_utils import grouped_agg

US_DAY = 86_400_000_000


def _us(date: str) -> int:
    return int(np.datetime64(date).astype("datetime64[us]").astype(np.int64))


def _cents(col) -> np.ndarray:
    v = np.asarray(col, np.float64)
    return np.floor(v * 100 + 0.5).astype(np.int64)


def _ts(col) -> np.ndarray:
    return np.asarray(col.cast(pa.int64()), np.int64)


def _year(ts_us: np.ndarray) -> np.ndarray:
    return (ts_us.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970)


def _tbl(out) -> pa.Table:
    """grouped_agg driver-path result or a small Dataset → one pa.Table."""
    if isinstance(out, pa.Table):
        return out
    batches = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
               for b in out.iter_batches(batch_format="pyarrow")]
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


def _emit(out, finish):
    """Apply the final (cheap, driver-safe) formatting on either path."""
    import ray.data as rd
    if isinstance(out, pa.Table):
        return rd.from_arrow(finish(out))
    return out.map_batches(finish, batch_format="pyarrow")


def _nation_names(sf_dir: str) -> dict[int, str]:
    return {r["n_nationkey"]: r["n_name"]
            for r in _read(sf_dir, "nation").take_all()}


def _region_nations(sf_dir: str, r_name: str) -> set[int]:
    reg = {r["r_regionkey"] for r in _read(sf_dir, "region").take_all()
           if r["r_name"] == r_name}
    return {r["n_nationkey"] for r in _read(sf_dir, "nation").take_all()
            if r["n_regionkey"] in reg}


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated MIN subquery + join-back.
# --------------------------------------------------------------------------

def q2_min_cost_supplier(sf_dir: str):
    """Per STANDARD part, the EUROPE supplier(s) achieving the minimum
    unit cost (partsupp-analog derived from lineitem).  Plan shape: one
    distributed (part,supp) min aggregate, a hash join against the
    SF-scaled supplier side (only nation⊂region is broadcast), then the
    groupwise-min join-back — the correlated-subquery decorrelation."""
    eu = _region_nations(sf_dir, "EUROPE")
    nat = _nation_names(sf_dir)

    def unit(b: pa.Table) -> pa.Table:
        qty = np.asarray(b.column("l_quantity"), np.float64).astype(np.int64)
        cost = _cents(b.column("l_extendedprice")) // qty
        t = pa.table({"l_partkey": b.column("l_partkey"),
                      "l_suppkey": b.column("l_suppkey"),
                      "cost_c": pa.array(cost)})
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate([("cost_c", "min")])
        return pa.table({"l_partkey": g.column("l_partkey"),
                         "l_suppkey": g.column("l_suppkey"),
                         "cost_c": g.column("cost_c_min")})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(unit, batch_format="pyarrow")
    cost = grouped_agg(li, ["l_partkey", "l_suppkey"], [("cost_c", "min")])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal",
                                      "s_nationkey"])

    def eu_only(b: pa.Table) -> pa.Table:
        nk = np.asarray(b.column("s_nationkey"), np.int64)
        keep = np.isin(nk, list(eu))
        t = b.filter(pa.array(keep))
        names = [nat[int(x)] for x in
                 np.asarray(t.column("s_nationkey"), np.int64)]
        return pa.table({"s_suppkey": t.column("s_suppkey"),
                         "s_name": t.column("s_name"),
                         "s_acctbal": t.column("s_acctbal"),
                         "n_name": pa.array(names, pa.string())})

    supp = supp.map_batches(eu_only, batch_format="pyarrow")

    import ray.data as rd
    cost_ds = rd.from_arrow(cost) if isinstance(cost, pa.Table) else cost
    cs = cost_ds.join(supp, join_type="inner",
                      num_partitions=_join_partitions(),
                      on=("l_suppkey",), right_on=("s_suppkey",))

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]) \
        .map_batches(lambda b: pa.table(
            {"p_partkey": b.column("p_partkey")}).filter(
                pc.equal(b.column("p_type"), "STANDARD")),
            batch_format="pyarrow")
    # csp feeds TWO consumers (the per-part min aggregate and the final
    # join-back) — materialize once or the whole upstream join chain
    # executes twice
    csp = cs.join(part, join_type="inner",
                  num_partitions=_join_partitions(),
                  on=("l_partkey",), right_on=("p_partkey",)).materialize()

    # groupwise min over the filtered (part × EU-supplier) candidates
    def pmin(b: pa.Table) -> pa.Table:
        g = b.group_by("l_partkey").aggregate([("cost_c", "min")])
        return pa.table({"mk": g.column("l_partkey"),
                         "min_c": g.column("cost_c_min")})

    mins = grouped_agg(csp.map_batches(pmin, batch_format="pyarrow"),
                       ["mk"], [("min_c", "min")])
    mins_ds = rd.from_arrow(mins) if isinstance(mins, pa.Table) else mins
    j = csp.join(mins_ds, join_type="inner",
                 num_partitions=_join_partitions(),
                 on=("l_partkey",), right_on=("mk",))

    def finish(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("cost_c"), b.column("min_c"))
        t = b.filter(keep)
        return pa.table({
            "p_partkey": t.column("l_partkey"),
            "min_cost": pa.array(
                np.asarray(t.column("cost_c"), np.int64) / 100.0),
            "s_name": t.column("s_name"),
            "n_name": t.column("n_name"),
            "s_acctbal": t.column("s_acctbal"),
        })

    return j.map_batches(finish, batch_format="pyarrow")


SQL_Q2_MIN_COST_SUPPLIER = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             // CAST(l_quantity AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY 1, 2),
cand AS (
  SELECT c.l_partkey AS p_partkey, c.cost_c,
         s.s_name, n.n_name, s.s_acctbal
  FROM cost c
  JOIN supplier s ON s.s_suppkey = c.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
  JOIN part p ON p.p_partkey = c.l_partkey AND p.p_type = 'STANDARD')
SELECT p_partkey, CAST(cost_c AS DOUBLE) / 100.0 AS min_cost,
       s_name, n_name, s_acctbal
FROM cand
QUALIFY cost_c = MIN(cost_c) OVER (PARTITION BY p_partkey)
"""


# --------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS over a two-table coupled predicate.
# --------------------------------------------------------------------------

def q4_order_priority(sf_dir: str):
    """Orders in one quarter having at least one LATE line (shipdate ≥
    orderdate + 30 days), counted by priority.  The EXISTS decorrelates
    to join → distinct-orderkey → count; the distinct is a two-level
    partial (per-batch unique, then grouped min)."""
    lo, hi = _us("1996-07-01"), _us("1996-10-01")

    def owin(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("o_orderdate"))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "odate": pa.array(ts),
                         "prio": b.column("o_orderpriority")}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(owin, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]) \
        .map_batches(lambda b: pa.table(
            {"l_orderkey": b.column("l_orderkey"),
             "ship": pa.array(_ts(b.column("l_shipdate")))}),
            batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def late_distinct(b: pa.Table) -> pa.Table:
        ship = np.asarray(b.column("ship"), np.int64)
        od = np.asarray(b.column("odate"), np.int64)
        t = b.filter(pa.array(ship >= od + 30 * US_DAY))
        g = t.group_by(["l_orderkey", "prio"]).aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows, np.int64)))

    dis = grouped_agg(j.map_batches(late_distinct, batch_format="pyarrow"),
                      ["l_orderkey", "prio"], [("one", "min")])

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("prio").aggregate([("one", "sum")])
        return pa.table({"o_orderpriority": g.column("prio"),
                         "order_count": g.column("one_sum")})

    if isinstance(dis, pa.Table):
        return _emit(count_partial(dis), lambda t: t)
    out = grouped_agg(dis.map_batches(count_partial, batch_format="pyarrow"),
                      ["o_orderpriority"], [("order_count", "sum")])
    return _emit(out, lambda t: t)


SQL_Q4_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure filtered aggregate, no join.
# --------------------------------------------------------------------------

def q6_forecast_revenue(sf_dir: str):
    """One-row predicate aggregate: discount-band revenue over one
    shipdate year.  Per-block int64 partial sums, driver add, one
    division."""
    lo, hi = _us("1996-01-01"), _us("1997-01-01")

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("l_shipdate"))
        qty = np.asarray(b.column("l_quantity"), np.float64)
        cents = _cents(b.column("l_extendedprice"))
        d100 = _cents(b.column("l_discount"))  # discount·100, same recipe
        keep = ((ts >= lo) & (ts < hi) & (d100 >= 5) & (d100 <= 7)
                & (qty < 24))
        s = int(np.sum(cents[keep] * d100[keep]))
        return pa.table({"k": pa.array([0], pa.int64()),
                         "s": pa.array([s], pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"])
    out = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                      ["k"], [("s", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("s"), np.int64)
        return pa.table({"revenue": pa.array(s / 1e4)})

    return _emit(out, finish)


SQL_Q6_FORECAST_REVENUE = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations: dual-dimension broadcast +
#       two data-sized hash joins + CASE pair filter.
# --------------------------------------------------------------------------

def q7_volume_shipping(sf_dir: str, nat_a: str = "NATION_3",
                       nat_b: str = "NATION_7"):
    lo, hi = _us("1996-01-01"), _us("1998-01-01")
    nat = _nation_names(sf_dir)
    keys_a = {k for k, v in nat.items() if v == nat_a}
    keys_b = {k for k, v in nat.items() if v == nat_b}
    ab = keys_a | keys_b

    def li_f(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("l_shipdate"))
        rev = _cents(b.column("l_extendedprice")) \
            * (100 - _cents(b.column("l_discount")))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "l_year": pa.array(_year(ts)),
                         "rev": pa.array(rev)}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"]) \
        .map_batches(li_f, batch_format="pyarrow")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey"),
             "s_nk": b.column("s_nationkey").cast(pa.int64())}).filter(
                pa.array(np.isin(np.asarray(b.column("s_nationkey"),
                                            np.int64), list(ab)))),
            batch_format="pyarrow")
    ls = li.join(supp, join_type="inner",
                 num_partitions=_join_partitions(),
                 on=("l_suppkey",), right_on=("s_suppkey",))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"c_custkey": b.column("c_custkey"),
             "c_nk": b.column("c_nationkey").cast(pa.int64())}).filter(
                pa.array(np.isin(np.asarray(b.column("c_nationkey"),
                                            np.int64), list(ab)))),
            batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    oc = orders.join(cust, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=("o_custkey",), right_on=("c_custkey",))
    j = ls.join(oc.select_columns(["o_orderkey", "c_nk"]),
                join_type="inner", num_partitions=_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    la, lb = sorted(keys_a), sorted(keys_b)

    def partial(b: pa.Table) -> pa.Table:
        sn = np.asarray(b.column("s_nk"), np.int64)
        cn = np.asarray(b.column("c_nk"), np.int64)
        keep = (np.isin(sn, la) & np.isin(cn, lb)) \
            | (np.isin(sn, lb) & np.isin(cn, la))
        t = b.filter(pa.array(keep))
        sn2 = np.asarray(t.column("s_nk"), np.int64)
        cn2 = np.asarray(t.column("c_nk"), np.int64)
        g = pa.table({
            "supp_nation": pa.array([nat[int(x)] for x in sn2], pa.string()),
            "cust_nation": pa.array([nat[int(x)] for x in cn2], pa.string()),
            "l_year": t.column("l_year"),
            "rev": t.column("rev"),
        }).group_by(["supp_nation", "cust_nation", "l_year"]) \
          .aggregate([("rev", "sum")])
        return pa.table({"supp_nation": g.column("supp_nation"),
                         "cust_nation": g.column("cust_nation"),
                         "l_year": g.column("l_year"),
                         "rev": g.column("rev_sum")})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["supp_nation", "cust_nation", "l_year"],
                      [("rev", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": b.column("supp_nation"),
            "cust_nation": b.column("cust_nation"),
            "l_year": b.column("l_year"),
            "revenue": pa.array(np.asarray(b.column("rev"), np.int64) / 1e4),
        })

    return _emit(out, finish)


SQL_Q7_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q8 — national market share: CASE-numerator fraction, one division.
# --------------------------------------------------------------------------

def q8_market_share(sf_dir: str, region: str = "ASIA",
                    target: str = "NATION_5", ptype: str = "PROMO"):
    lo, hi = _us("1996-01-01"), _us("1998-01-01")
    nat = _nation_names(sf_dir)
    rk = _region_nations(sf_dir, region)
    tkeys = sorted(k for k, v in nat.items() if v == target)

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]) \
        .map_batches(lambda b: pa.table(
            {"p_partkey": b.column("p_partkey")}).filter(
                pc.equal(b.column("p_type"), ptype)),
            batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) \
            * (100 - _cents(b.column("l_discount")))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_partkey": b.column("l_partkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "rev": pa.array(rev)})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"]) \
        .map_batches(li_f, batch_format="pyarrow") \
        .join(part, join_type="inner", num_partitions=_join_partitions(),
              on=("l_partkey",), right_on=("p_partkey",))

    def owin(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("o_orderdate"))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey"),
                         "o_year": pa.array(_year(ts))}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(owin, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"c_custkey": b.column("c_custkey")}).filter(
                pa.array(np.isin(np.asarray(b.column("c_nationkey"),
                                            np.int64), list(rk)))),
            batch_format="pyarrow")
    oc = orders.join(cust, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=("o_custkey",), right_on=("c_custkey",))
    j = li.join(oc.select_columns(["o_orderkey", "o_year"]),
                join_type="inner", num_partitions=_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey"),
             "s_nk": b.column("s_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")
    js = j.join(supp, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_suppkey",), right_on=("s_suppkey",))

    def partial(b: pa.Table) -> pa.Table:
        sn = np.asarray(b.column("s_nk"), np.int64)
        rev = np.asarray(b.column("rev"), np.int64)
        num = np.where(np.isin(sn, tkeys), rev, 0)
        g = pa.table({"o_year": b.column("o_year"),
                      "num": pa.array(num), "den": pa.array(rev)}) \
            .group_by("o_year").aggregate([("num", "sum"), ("den", "sum")])
        return pa.table({"o_year": g.column("o_year"),
                         "num": g.column("num_sum"),
                         "den": g.column("den_sum")})

    out = grouped_agg(js.map_batches(partial, batch_format="pyarrow"),
                      ["o_year"], [("num", "sum"), ("den", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        num = np.asarray(b.column("num"), np.int64).astype(np.float64)
        den = np.asarray(b.column("den"), np.int64).astype(np.float64)
        return pa.table({"o_year": b.column("o_year"),
                         "mkt_share": pa.array(num / den)})

    return _emit(out, finish)


SQL_Q8_MARKET_SHARE = """
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev,
         n2.n_name AS supp_nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
       region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND p_type = 'PROMO')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE 0 END)
            AS DOUBLE)
       / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year
"""

# --------------------------------------------------------------------------
# Q9 — product-type profit: 4-table join, derived supply cost, two-key group.
# --------------------------------------------------------------------------

def q9_product_profit(sf_dir: str, word: str = "widget"):
    """Profit by supplier nation and order year for parts whose name
    contains ``word``.  Supply cost analog: 60% of p_retailprice (no
    partsupp table).  profit = extprice·(100−d100) − retail_c·60·qty,
    all in 1e-4 money units — exact int64 until one final division."""
    nat = _nation_names(sf_dir)

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def pf(b: pa.Table) -> pa.Table:
        keep = pc.match_substring(b.column("p_name"), word)
        t = b.filter(keep)
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "retail_c": pa.array(_cents(t.column("p_retailprice")))})

    part = part.map_batches(pf, batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        qty = np.asarray(b.column("l_quantity"), np.float64).astype(np.int64)
        rev = _cents(b.column("l_extendedprice")) \
            * (100 - _cents(b.column("l_discount")))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_partkey": b.column("l_partkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "qty": pa.array(qty), "rev": pa.array(rev)})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"]) \
        .map_batches(li_f, batch_format="pyarrow") \
        .join(part, join_type="inner", num_partitions=_join_partitions(),
              on=("l_partkey",), right_on=("p_partkey",))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda b: pa.table(
            {"o_orderkey": b.column("o_orderkey"),
             "o_year": pa.array(_year(_ts(b.column("o_orderdate"))))}),
            batch_format="pyarrow")
    lo = li.join(orders, join_type="inner",
                 num_partitions=_join_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey"),
             "s_nk": b.column("s_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")
    j = lo.join(supp, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_suppkey",), right_on=("s_suppkey",))

    def partial(b: pa.Table) -> pa.Table:
        profit = np.asarray(b.column("rev"), np.int64) \
            - np.asarray(b.column("retail_c"), np.int64) * 60 \
            * np.asarray(b.column("qty"), np.int64)
        sn = np.asarray(b.column("s_nk"), np.int64)
        g = pa.table({
            "nation": pa.array([nat[int(x)] for x in sn], pa.string()),
            "o_year": b.column("o_year"),
            "profit": pa.array(profit),
        }).group_by(["nation", "o_year"]).aggregate([("profit", "sum")])
        return pa.table({"nation": g.column("nation"),
                         "o_year": g.column("o_year"),
                         "profit": g.column("profit_sum")})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["nation", "o_year"], [("profit", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "nation": b.column("nation"),
            "o_year": b.column("o_year"),
            "sum_profit": pa.array(
                np.asarray(b.column("profit"), np.int64) / 1e4),
        })

    return _emit(out, finish)


SQL_Q9_PRODUCT_PROFIT = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 60
                  * CAST(l_quantity AS BIGINT))
            AS DOUBLE) / 10000.0 AS sum_profit
FROM part, supplier, lineitem, orders, nation
WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: join→group→top-20 with exact-int ordering.
# --------------------------------------------------------------------------

def q10_returned_items(sf_dir: str, k: int = 20):
    nat = _nation_names(sf_dir)
    lo, hi = _us("1996-10-01"), _us("1997-01-01")

    def owin(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("o_orderdate"))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey")}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(owin, batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) \
            * (100 - _cents(b.column("l_discount")))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "rev": pa.array(rev)}) \
            .filter(pc.equal(b.column("l_returnflag"), "R"))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"]).map_batches(li_f, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("o_custkey").aggregate([("rev", "sum")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "rev": g.column("rev_sum")})

    agg = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["o_custkey"], [("rev", "sum")])

    import ray.data as rd
    # exact-int top-k WITHOUT a sort shuffle: post-merge every custkey is
    # one row, so per-block top-k candidates are exact; the driver merges
    # ≤ k·blocks candidate rows with one lexsort
    def block_topk(b: pa.Table) -> pa.Table:
        rev = np.asarray(b.column("rev"), np.int64)
        ck = np.asarray(b.column("o_custkey"), np.int64)
        o = np.lexsort((ck, -rev))[:k]
        return pa.table({"o_custkey": pa.array(ck[o]),
                         "rev": pa.array(rev[o])})

    t = (block_topk(agg) if isinstance(agg, pa.Table)
         else _tbl(agg.map_batches(block_topk, batch_format="pyarrow")))
    rev = np.asarray(t.column("rev"), np.int64)
    ck = np.asarray(t.column("o_custkey"), np.int64)
    order = np.lexsort((ck, -rev))[:k]
    head = pa.table({"o_custkey": pa.array(ck[order]),
                     "rev": pa.array(rev[order])})

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    hj = rd.from_arrow(head).join(
        cust, join_type="inner", num_partitions=_join_partitions(),
        on=("o_custkey",), right_on=("c_custkey",))

    def finish(b: pa.Table) -> pa.Table:
        nk = np.asarray(b.column("c_nationkey"), np.int64)
        return pa.table({
            "c_custkey": b.column("o_custkey"),
            "c_name": b.column("c_name"),
            "revenue": pa.array(np.asarray(b.column("rev"), np.int64) / 1e4),
            "c_acctbal": b.column("c_acctbal"),
            "n_name": pa.array([nat[int(x)] for x in nk], pa.string()),
        })

    return hj.map_batches(finish, batch_format="pyarrow")


SQL_Q10_RETURNED_ITEMS = """
WITH agg AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
             AS rev
  FROM customer, orders, lineitem, nation
  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
  GROUP BY 1, 2, 3, 4)
SELECT c_custkey, c_name, CAST(rev AS DOUBLE) / 10000.0 AS revenue,
       c_acctbal, n_name
FROM agg ORDER BY rev DESC, c_custkey LIMIT 20
"""


# --------------------------------------------------------------------------
# Q11 — important stock: group sum vs a fraction of the global sum
#        (HAVING against a scalar subquery, integer cross-multiply).
# --------------------------------------------------------------------------

def q11_important_parts(sf_dir: str, nation: str = "NATION_3"):
    """Parts whose stocked value exceeds 2× the MEAN per-part share — the
    Q11 HAVING-scalar-subquery shape with a SCALE-FREE threshold (TPC-H's
    fixed fraction goes degenerate as the part count grows with SF: at
    sf0.1 no part reaches 0.1% of the total).  Predicate stays integer:
    val·nparts > 2·total."""
    nat = _nation_names(sf_dir)
    nk = sorted(k for k, v in nat.items() if v == nation)

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey"),
             "s_nk": b.column("s_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        qty = np.asarray(b.column("l_quantity"), np.float64).astype(np.int64)
        val = _cents(b.column("l_extendedprice")) * qty
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "val": pa.array(val)})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(li_f, batch_format="pyarrow") \
        .join(supp, join_type="inner", num_partitions=_join_partitions(),
              on=("l_suppkey",), right_on=("s_suppkey",))

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pa.array(np.isin(np.asarray(b.column("s_nk"),
                                                 np.int64), nk)))
        g = t.group_by("l_partkey").aggregate([("val", "sum")])
        return pa.table({"l_partkey": g.column("l_partkey"),
                         "val": g.column("val_sum")})

    agg = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                      ["l_partkey"], [("val", "sum")])

    import ray.data as rd
    agg_ds = rd.from_arrow(agg) if isinstance(agg, pa.Table) else agg
    agg_ds = agg_ds.materialize()
    # global scalars: tiny per-block partial sums, driver add
    total = 0
    for b in agg_ds.map_batches(
            lambda t: pa.table({"s": pa.array(
                [int(np.sum(np.asarray(t.column("val"), np.int64)))],
                pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        total += int(np.sum(np.asarray(b.column("s"), np.int64)))
    nparts = agg_ds.count()
    # floor-mean keeps the comparison overflow-free (val·nparts would
    # exceed int64 at 100-TB scale); DuckDB // truncation == numpy //
    # on these non-negative ints
    mean_floor = total // max(nparts, 1)

    def finish(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("val"), np.int64)
        keep = v > 2 * mean_floor
        t = b.filter(pa.array(keep))
        return pa.table({
            "l_partkey": t.column("l_partkey"),
            "value": pa.array(
                np.asarray(t.column("val"), np.int64) / 100.0),
        })

    return agg_ds.map_batches(finish, batch_format="pyarrow")


SQL_Q11_IMPORTANT_PARTS = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS val
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_3'
  GROUP BY l_partkey)
SELECT l_partkey, CAST(val AS DOUBLE) / 100.0 AS value
FROM v WHERE val > 2 * (SELECT SUM(val) // COUNT(*) FROM v)
"""


# --------------------------------------------------------------------------
# Q12 — shipping classes: join + CASE-bucketed dual counts.
# --------------------------------------------------------------------------

def q12_priority_class(sf_dir: str):
    lo, hi = _us("1996-01-01"), _us("1997-01-01")

    def li_f(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("l_shipdate"))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "flag": b.column("l_returnflag")}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"]) \
        .map_batches(li_f, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = li.join(orders, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        pr = b.column("o_orderpriority")
        hi_m = pc.or_(pc.equal(pr, "1-URGENT"), pc.equal(pr, "2-HIGH"))
        hi_i = np.asarray(hi_m.combine_chunks(), np.bool_) \
            if isinstance(hi_m, pa.ChunkedArray) \
            else np.asarray(hi_m, np.bool_)
        g = pa.table({"l_returnflag": b.column("flag"),
                      "high_line_count": pa.array(hi_i.astype(np.int64)),
                      "low_line_count": pa.array((~hi_i).astype(np.int64))}) \
            .group_by("l_returnflag") \
            .aggregate([("high_line_count", "sum"),
                        ("low_line_count", "sum")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "high_line_count": g.column("high_line_count_sum"),
            "low_line_count": g.column("low_line_count_sum")})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["l_returnflag"],
                      [("high_line_count", "sum"), ("low_line_count", "sum")])
    return _emit(out, lambda t: t)


SQL_Q12_PRIORITY_CLASS = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Q14 — promotion effect: CASE-numerator percentage, one division.
# --------------------------------------------------------------------------

def q14_promo_effect(sf_dir: str):
    lo, hi = _us("1996-03-01"), _us("1996-04-01")

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]) \
        .map_batches(lambda b: pa.table(
            {"p_partkey": b.column("p_partkey"),
             "promo": pc.cast(pc.equal(b.column("p_type"), "PROMO"),
                              pa.int64())}),
            batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("l_shipdate"))
        rev = _cents(b.column("l_extendedprice")) \
            * (100 - _cents(b.column("l_discount")))
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "rev": pa.array(rev)}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice",
                "l_discount"]).map_batches(li_f, batch_format="pyarrow")
    j = li.join(part, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_partkey",), right_on=("p_partkey",))

    def partial(b: pa.Table) -> pa.Table:
        rev = np.asarray(b.column("rev"), np.int64)
        pr = np.asarray(b.column("promo"), np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "num": pa.array([int(np.sum(rev * pr))], pa.int64()),
                         "den": pa.array([int(np.sum(rev))], pa.int64())})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["k"], [("num", "sum"), ("den", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        num = np.asarray(b.column("num"), np.int64).astype(np.float64)
        den = np.asarray(b.column("den"), np.int64).astype(np.float64)
        return pa.table({"promo_revenue": pa.array(100.0 * num / den)})

    return _emit(out, finish)


SQL_Q14_PROMO_EFFECT = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                 ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --------------------------------------------------------------------------
# Q15 — top supplier: aggregate view + equality against its own MAX.
# --------------------------------------------------------------------------

def q15_top_supplier(sf_dir: str):
    lo, hi = _us("1996-01-01"), _us("1996-04-01")

    def li_f(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("l_shipdate"))
        rev = _cents(b.column("l_extendedprice")) \
            * (100 - _cents(b.column("l_discount")))
        t = pa.table({"l_suppkey": b.column("l_suppkey"),
                      "rev": pa.array(rev)}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))
        g = t.group_by("l_suppkey").aggregate([("rev", "sum")])
        return pa.table({"l_suppkey": g.column("l_suppkey"),
                         "rev": g.column("rev_sum")})

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]) \
        .map_batches(li_f, batch_format="pyarrow")
    agg = grouped_agg(li, ["l_suppkey"], [("rev", "sum")])

    import ray.data as rd
    agg_ds = (rd.from_arrow(agg) if isinstance(agg, pa.Table)
              else agg).materialize()
    best = -1
    for b in agg_ds.map_batches(
            lambda t: pa.table({"m": pa.array(
                [int(np.max(np.asarray(t.column("rev"), np.int64)))
                 if t.num_rows else -1], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        arr = np.asarray(b.column("m"), np.int64)
        if arr.size:
            best = max(best, int(np.max(arr)))

    top = agg_ds.filter(expr=f"rev == {best}")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    j = top.join(supp, join_type="inner",
                 num_partitions=_join_partitions(),
                 on=("l_suppkey",), right_on=("s_suppkey",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": b.column("l_suppkey"),
            "s_name": b.column("s_name"),
            "total_revenue": pa.array(
                np.asarray(b.column("rev"), np.int64) / 1e4),
        })

    return j.map_batches(finish, batch_format="pyarrow")


SQL_Q15_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
             AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier, rev
WHERE s_suppkey = l_suppkey AND total = (SELECT MAX(total) FROM rev)
"""

# --------------------------------------------------------------------------
# Q16 — supplier count by part attributes with a NOT-IN exclusion.
# --------------------------------------------------------------------------

def q16_supplier_cnt(sf_dir: str):
    """Distinct suppliers per (brand, type, size) over lineitem×part,
    excluding low-balance suppliers (< 1000 — the s_comment LIKE analog;
    the synthetic data has no negative balances at every scale).  The
    NOT IN decorrelates to a left join + null filter; the excluded side
    plants a never-matching sentinel key so the join side keeps a schema
    even when no supplier qualifies (empty datasets lose their schema).
    The distinct is per-batch unique → grouped min; the final count is a
    second partial count → grouped sum."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])

    def pf(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.invert(pc.equal(b.column("p_brand"), "Brand#13")),
                       pc.invert(pc.equal(b.column("p_type"), "PROMO")))
        sz = b.column("p_size").cast(pa.int64())
        keep = pc.and_(keep, pc.is_in(
            sz, value_set=pa.array([1, 4, 7, 10, 14, 19, 23, 45],
                                   pa.int64())))
        return pa.table({"p_partkey": b.column("p_partkey"),
                         "p_brand": b.column("p_brand"),
                         "p_type": b.column("p_type"),
                         "p_size": sz}).filter(keep)

    part = part.map_batches(pf, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    j = li.join(part, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_partkey",), right_on=("p_partkey",))

    def bad_f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b.column("s_acctbal"), 1000.0))
        keys = np.append(np.asarray(t.column("s_suppkey"), np.int64),
                         np.int64(-1))  # sentinel: schema-keeping, no match
        return pa.table({"s_suppkey": pa.array(keys),
                         "bad": pa.array(np.ones(keys.size, np.int64))})

    bad = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]) \
        .map_batches(bad_f, batch_format="pyarrow")
    ja = j.join(bad, join_type="left_outer",
                num_partitions=_join_partitions(),
                on=("l_suppkey",), right_on=("s_suppkey",))

    def distinct_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_null(b.column("bad")))
        g = t.group_by(["p_brand", "p_type", "p_size", "l_suppkey"]) \
             .aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows,
                                                       np.int64)))

    dis = grouped_agg(
        ja.map_batches(distinct_partial, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"], [("one", "min")])

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand", "p_type", "p_size"]) \
             .aggregate([("one", "sum")])
        return pa.table({"p_brand": g.column("p_brand"),
                         "p_type": g.column("p_type"),
                         "p_size": g.column("p_size"),
                         "supplier_cnt": g.column("one_sum")})

    if isinstance(dis, pa.Table):
        return _emit(count_partial(dis), lambda t: t)
    out = grouped_agg(dis.map_batches(count_partial, batch_format="pyarrow"),
                      ["p_brand", "p_type", "p_size"],
                      [("supplier_cnt", "sum")])
    return _emit(out, lambda t: t)


SQL_Q16_SUPPLIER_CNT = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 1000.0)
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity revenue: correlated avg via integer cross-multiply.
# --------------------------------------------------------------------------

def q17_small_qty_revenue(sf_dir: str, brand: str = "Brand#13"):
    """Revenue of lines whose quantity is below 0.2× the part's average,
    for one brand.  qty < sum/(5·cnt) ⟺ qty·5·cnt < sum — the predicate
    stays integer (no float avg), so both engines agree on every
    boundary.  Two passes over lineitem⋈part: per-part moments, then a
    join-back filter."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]) \
        .map_batches(lambda b: pa.table(
            {"p_partkey": b.column("p_partkey")}).filter(
                pc.equal(b.column("p_brand"), brand)),
            batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        qty = np.asarray(b.column("l_quantity"), np.float64).astype(np.int64)
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "qty": pa.array(qty),
                         "cents": pa.array(_cents(b.column("l_extendedprice")))})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(li_f, batch_format="pyarrow") \
        .join(part, join_type="inner", num_partitions=_join_partitions(),
              on=("l_partkey",), right_on=("p_partkey",))
    li = li.materialize()

    def moments(b: pa.Table) -> pa.Table:
        t = b.append_column("cnt", pa.array(np.ones(b.num_rows, np.int64)))
        g = t.group_by("l_partkey").aggregate([("qty", "sum"),
                                               ("cnt", "sum")])
        return pa.table({"mk": g.column("l_partkey"),
                         "sum_qty": g.column("qty_sum"),
                         "cnt": g.column("cnt_sum")})

    mom = grouped_agg(li.map_batches(moments, batch_format="pyarrow"),
                      ["mk"], [("sum_qty", "sum"), ("cnt", "sum")])
    import ray.data as rd
    mom_ds = rd.from_arrow(mom) if isinstance(mom, pa.Table) else mom
    j = li.join(mom_ds, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_partkey",), right_on=("mk",))

    def partial(b: pa.Table) -> pa.Table:
        qty = np.asarray(b.column("qty"), np.int64)
        s = np.asarray(b.column("sum_qty"), np.int64)
        c = np.asarray(b.column("cnt"), np.int64)
        cents = np.asarray(b.column("cents"), np.int64)
        keep = qty * 5 * c < s
        return pa.table({"k": pa.array([0], pa.int64()),
                         "s": pa.array([int(np.sum(cents[keep]))],
                                       pa.int64())})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["k"], [("s", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("s"), np.int64).astype(np.float64)
        return pa.table({"avg_yearly": pa.array((s / 100.0) / 7.0)})

    return _emit(out, finish)


SQL_Q17_SMALL_QTY_REVENUE = """
WITH mom AS (
  SELECT l_partkey AS mk, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem, part
  WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
  GROUP BY 1)
SELECT (CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             AS DOUBLE) / 100.0) / 7.0 AS avg_yearly
FROM lineitem, part, mom
WHERE p_partkey = l_partkey AND p_brand = 'Brand#13' AND mk = l_partkey
  AND CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
"""


# --------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of conjunctive clause groups.
# --------------------------------------------------------------------------

def q19_disjunctive(sf_dir: str):
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"]) \
        .map_batches(lambda b: pa.table(
            {"l_partkey": b.column("l_partkey"),
             "qty": pa.array(np.asarray(b.column("l_quantity"),
                                        np.float64).astype(np.int64)),
             "rev": pa.array(_cents(b.column("l_extendedprice"))
                             * (100 - _cents(b.column("l_discount"))))}),
            batch_format="pyarrow")
    j = li.join(part, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_partkey",), right_on=("p_partkey",))

    def partial(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand")
        size = np.asarray(b.column("p_size").cast(pa.int64()), np.int64)
        qty = np.asarray(b.column("qty"), np.int64)
        rev = np.asarray(b.column("rev"), np.int64)

        def eq(name):
            m = pc.equal(brand, name)
            m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
            return np.asarray(m, np.bool_)

        keep = (eq("Brand#12") & (size >= 1) & (size <= 5)
                & (qty >= 1) & (qty <= 11)) \
            | (eq("Brand#23") & (size >= 1) & (size <= 10)
               & (qty >= 10) & (qty <= 20)) \
            | (eq("Brand#25") & (size >= 1) & (size <= 15)
               & (qty >= 20) & (qty <= 30))
        return pa.table({"k": pa.array([0], pa.int64()),
                         "s": pa.array([int(np.sum(rev[keep]))], pa.int64())})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["k"], [("s", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"revenue": pa.array(
            np.asarray(b.column("s"), np.int64) / 1e4)})

    return _emit(out, finish)


SQL_Q19_DISJUNCTIVE = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30))
"""


# --------------------------------------------------------------------------
# Q20 — potential promotion: nested semi over an aggregate threshold.
# --------------------------------------------------------------------------

def q20_promotion_suppliers(sf_dir: str, word: str = "rod",
                            year: str = "1996"):
    """Suppliers whose 1996 shipments of a ``word``-part concentrate more
    than half of their all-time shipped quantity of that part (the
    availqty>½ analog).  One partial pass computes BOTH sums per
    (supp, part) with a CASE; the semi-distinct then joins supplier."""
    lo, hi = _us(f"{year}-01-01"), _us(f"{int(year) + 1}-01-01")

    part = _read(sf_dir, "part", ["p_partkey", "p_name"]) \
        .map_batches(lambda b: pa.table(
            {"p_partkey": b.column("p_partkey")}).filter(
                pc.match_substring(b.column("p_name"), word)),
            batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("l_shipdate"))
        qty = np.asarray(b.column("l_quantity"), np.float64).astype(np.int64)
        win = np.where((ts >= lo) & (ts < hi), qty, 0)
        g = pa.table({"l_partkey": b.column("l_partkey"),
                      "l_suppkey": b.column("l_suppkey"),
                      "qwin": pa.array(win), "qtot": pa.array(qty)}) \
            .group_by(["l_partkey", "l_suppkey"]) \
            .aggregate([("qwin", "sum"), ("qtot", "sum")])
        return pa.table({"l_partkey": g.column("l_partkey"),
                         "l_suppkey": g.column("l_suppkey"),
                         "qwin": g.column("qwin_sum"),
                         "qtot": g.column("qtot_sum")})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]) \
        .map_batches(li_f, batch_format="pyarrow")
    agg = grouped_agg(li, ["l_partkey", "l_suppkey"],
                      [("qwin", "sum"), ("qtot", "sum")])
    import ray.data as rd
    agg_ds = rd.from_arrow(agg) if isinstance(agg, pa.Table) else agg
    jp = agg_ds.join(part, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=("l_partkey",), right_on=("p_partkey",))

    def semi_partial(b: pa.Table) -> pa.Table:
        w = np.asarray(b.column("qwin"), np.int64)
        t = np.asarray(b.column("qtot"), np.int64)
        g = b.filter(pa.array(2 * w > t)).group_by("l_suppkey").aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows,
                                                       np.int64)))

    dis = grouped_agg(jp.map_batches(semi_partial, batch_format="pyarrow"),
                      ["l_suppkey"], [("one", "min")])
    dis_ds = rd.from_arrow(dis) if isinstance(dis, pa.Table) else dis
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal"])
    j = dis_ds.join(supp, join_type="inner",
                    num_partitions=_join_partitions(),
                    on=("l_suppkey",), right_on=("s_suppkey",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": b.column("l_suppkey"),
                         "s_name": b.column("s_name"),
                         "s_acctbal": b.column("s_acctbal")})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_Q20_PROMOTION_SUPPLIERS = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, l_partkey,
           SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1997-01-01'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qwin,
           SUM(CAST(l_quantity AS BIGINT)) AS qtot
    FROM lineitem GROUP BY 1, 2) q
  JOIN part ON p_partkey = q.l_partkey
  WHERE p_name LIKE '%rod%' AND 2 * qwin > qtot)
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: per-order multi-alias logic
#        (EXISTS other-supplier ∧ NOT EXISTS other-late-supplier).
# --------------------------------------------------------------------------

def q21_waiting_suppliers(sf_dir: str, k: int = 100):
    """For finalized orders: count, per supplier, the orders where that
    supplier's shipment was LATE (shipdate ≥ orderdate + 60 days), at
    least one OTHER supplier participated, and NO other supplier was
    late.  Plan: per-(order,supp) late-flag distinct (per-batch max
    combiner), then ONE bucketed vectorized per-order resolve (reduceat
    over order segments — zero per-order Python dispatch), then a count
    by supplier."""
    from .shuffle_utils import bucket_vectorized

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderstatus"]) \
        .map_batches(lambda b: pa.table(
            {"o_orderkey": b.column("o_orderkey"),
             "odate": pa.array(_ts(b.column("o_orderdate")))}).filter(
                pc.equal(b.column("o_orderstatus"), "F")),
            batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(lambda b: pa.table(
            {"l_orderkey": b.column("l_orderkey"),
             "l_suppkey": b.column("l_suppkey"),
             "ship": pa.array(_ts(b.column("l_shipdate")))}),
            batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def flag_partial(b: pa.Table) -> pa.Table:
        late = (np.asarray(b.column("ship"), np.int64)
                >= np.asarray(b.column("odate"), np.int64) + 60 * US_DAY) \
            .astype(np.int64)
        g = pa.table({"okey": b.column("l_orderkey"),
                      "sk": b.column("l_suppkey"),
                      "late": pa.array(late)}) \
            .group_by(["okey", "sk"]).aggregate([("late", "max")])
        return pa.table({"okey": g.column("okey"), "sk": g.column("sk"),
                         "late": g.column("late_max")})

    flags = grouped_agg(j.map_batches(flag_partial, batch_format="pyarrow"),
                        ["okey", "sk"], [("late", "max")])
    import ray.data as rd
    flags_ds = rd.from_arrow(flags) if isinstance(flags, pa.Table) else flags

    def resolve(t: pa.Table) -> pa.Table:
        okey = np.asarray(t.column("okey"), np.int64)
        sk = np.asarray(t.column("sk"), np.int64)
        late = np.asarray(t.column("late"), np.int64)
        order = np.argsort(okey, kind="stable")
        okey, sk, late = okey[order], sk[order], late[order]
        uniq, start = np.unique(okey, return_index=True)
        nsupp = np.diff(np.append(start, okey.size))
        nlate = np.add.reduceat(late, start)
        seg = np.repeat(np.arange(uniq.size), nsupp)
        keep = (late == 1) & (nsupp[seg] >= 2) & (nlate[seg] == 1)
        return pa.table({"sk": pa.array(sk[keep]),
                         "one": pa.array(np.ones(int(keep.sum()),
                                                 np.int64))})

    waiting = bucket_vectorized(flags_ds, "okey", resolve)

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("sk").aggregate([("one", "sum")])
        return pa.table({"sk": g.column("sk"),
                         "numwait": g.column("one_sum")})

    cnt = grouped_agg(waiting.map_batches(count_partial,
                                          batch_format="pyarrow"),
                      ["sk"], [("numwait", "sum")])
    cnt_ds = rd.from_arrow(cnt) if isinstance(cnt, pa.Table) else cnt
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    jn = cnt_ds.join(supp, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=("sk",), right_on=("s_suppkey",))
    t = _tbl(jn.map_batches(
        lambda b: pa.table({"s_name": b.column("s_name"),
                            "numwait": b.column("numwait")}),
        batch_format="pyarrow"))
    nw = np.asarray(t.column("numwait"), np.int64)
    names = np.array(t.column("s_name").to_pylist(), dtype=str)
    order = np.lexsort((names, -nw))[:k]
    return pa.table({"s_name": pa.array([str(x) for x in names[order]],
                                        pa.string()),
                     "numwait": pa.array(nw[order])})


SQL_Q21_WAITING_SUPPLIERS = """
WITH lo AS (
  SELECT l_orderkey AS okey, l_suppkey AS sk,
         MAX(CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
agg AS (SELECT okey, COUNT(*) AS ns, SUM(late) AS nl FROM lo GROUP BY okey)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lo JOIN agg USING (okey) JOIN supplier ON s_suppkey = lo.sk
WHERE lo.late = 1 AND agg.ns >= 2 AND agg.nl = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


# --------------------------------------------------------------------------
# Q22 — global sales opportunity: scalar-avg filter + anti-join + cohort.
# --------------------------------------------------------------------------

def q22_global_sales(sf_dir: str):
    """Customers in name-digit cohorts with above-average positive
    balance and NO RECENT orders (every synthetic customer has some
    order, so the anti-join is against the post-2000 window — the lapsed
    -customer variant of the same NOT EXISTS shape).  c_name is
    fixed-width 'Customer#%09d', so the cohort substring is
    deterministic; the avg filter stays integer (bal_c·cnt > sum_c)."""
    cohorts = ["1", "3", "5", "7", "9"]
    recent = _us("2000-01-01")

    def cf(b: pa.Table) -> pa.Table:
        code = pc.utf8_slice_codeunits(b.column("c_name"), 17, 18)
        keep = pc.is_in(code, value_set=pa.array(cohorts, pa.string()))
        t = pa.table({"c_custkey": b.column("c_custkey"),
                      "code": code,
                      "bal_c": pa.array(_cents(b.column("c_acctbal")))}) \
            .filter(keep)
        return t

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]) \
        .map_batches(cf, batch_format="pyarrow").materialize()

    # scalar avg over positive balances: tiny per-block moments
    tot, cnt = 0, 0
    for b in cust.map_batches(
            lambda t: pa.table({
                "s": pa.array([int(np.sum(np.asarray(t.column("bal_c"),
                                                     np.int64)[
                    np.asarray(t.column("bal_c"), np.int64) > 0]))],
                    pa.int64()),
                "c": pa.array([int(np.sum(np.asarray(t.column("bal_c"),
                                                     np.int64) > 0))],
                    pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        tot += int(np.sum(np.asarray(b.column("s"), np.int64)))
        cnt += int(np.sum(np.asarray(b.column("c"), np.int64)))

    def of(b: pa.Table) -> pa.Table:
        ts = _ts(b.column("o_orderdate"))
        g = pa.table({"o_custkey": b.column("o_custkey")}) \
            .filter(pa.array(ts >= recent)) \
            .group_by("o_custkey").aggregate([])
        # sentinel keeps the join side schema-ful even if a scale has no
        # post-2000 orders in some block
        keys = np.append(np.asarray(g.column("o_custkey"), np.int64),
                         np.int64(-1))
        return pa.table({"o_custkey": pa.array(keys),
                         "has": pa.array(np.ones(keys.size, np.int64))})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(of, batch_format="pyarrow")
    j = cust.join(orders, join_type="left_outer",
                  num_partitions=_join_partitions(),
                  on=("c_custkey",), right_on=("o_custkey",))

    def partial(b: pa.Table) -> pa.Table:
        bal = np.asarray(b.column("bal_c"), np.int64)
        has = b.column("has")
        noorder = pc.is_null(has)
        nm = np.asarray(noorder.combine_chunks()
                        if isinstance(noorder, pa.ChunkedArray) else noorder,
                        np.bool_)
        keep = nm & (bal * cnt > tot)
        t = b.filter(pa.array(keep))
        g = pa.table({"cntrycode": t.column("code"),
                      "bal": t.column("bal_c"),
                      "one": pa.array(np.ones(t.num_rows, np.int64))}) \
            .group_by("cntrycode").aggregate([("one", "sum"),
                                              ("bal", "sum")])
        return pa.table({"cntrycode": g.column("cntrycode"),
                         "numcust": g.column("one_sum"),
                         "bal": g.column("bal_sum")})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["cntrycode"], [("numcust", "sum"), ("bal", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "cntrycode": b.column("cntrycode"),
            "numcust": b.column("numcust"),
            "totacctbal": pa.array(
                np.asarray(b.column("bal"), np.int64) / 100.0),
        })

    return _emit(out, finish)


SQL_Q22_GLOBAL_SALES = """
WITH base AS (
  SELECT c_custkey, substr(c_name, 18, 1) AS code,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer
  WHERE substr(c_name, 18, 1) IN ('1', '3', '5', '7', '9')),
avg_m AS (SELECT SUM(bal_c) AS tot, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM base WHERE bal_c > 0)
SELECT code AS cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM base, avg_m
WHERE bal_c * cnt > tot
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY code
"""
