"""Relational operator suite (SURVEY §2.5-2.9) + driver-gate queries.

The reference's OGR SQL engine (ogr/ogr_gensql.cpp, swq_op_general.cpp)
evaluates SELECT/WHERE/JOIN/GROUP BY/ORDER BY/LIMIT/DISTINCT over layer
iterators single-threaded.  Here each construct maps to the Ray Data
primitive (filter → map_batches+pc.filter, join → ds.join hash join,
GROUP BY → groupby().aggregate() partial+final, ORDER BY k LIMIT n →
sort().limit()), all streaming over Arrow blocks.

Each ``q_*`` function returns a Ray Dataset whose columns match the
``SQL_*`` oracle string next to it byte-for-name; computed doubles are
rounded to fixed decimals on BOTH sides so the driver's value-hash
comparison is robust to summation-order ulp drift.

The geo_* queries derive coordinates from the TPC-H integer keys with pure
(integer-first) arithmetic reproduced in the SQL oracle, then run the REAL
engine machinery (cell joins, kNN stage, mercator math) on the derived
geometry — so the driver gate exercises the same code paths the imagery
pipelines use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..core import mercator, wkb
from . import knn as KNN
from . import spatial_join as SJ

def _join_partitions() -> int:
    """Hash-join fan-out sized to the running cluster: Ray Data's join
    spawns one aggregator actor per partition, so the count must fit the
    CPU budget (16 partitions in a 4-CPU test session deadlocks the
    streaming executor).  At real cluster scale this returns the large
    fan-out the shuffle wants."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(64, cpus // 2))





_READ_ROWS_CACHE: dict = {}


def _read(sf_dir: str, name: str, columns: list | None = None
          ) -> "ray.data.Dataset":
    """Pruned read: pass `columns` so only the needed columns leave
    storage regardless of whether the optimizer pushes a later
    select_columns into the scan.

    Small files are read with a capped block count sized from the footer
    row count (one cached metadata read).  Ray 2.49 otherwise over-fans
    tiny dimension tables into EMPTY read tasks whose 0-row blocks, after
    any map_batches, lose their schema — and a schema-less block poisons
    the hash-join schema broadcast, so a join partition that hashes no
    real rows dies with 'No match for key field on right side' (observed
    with a 2-row filtered supplier side at 4 partitions).  Big tables
    keep Ray's default parallelism: the cap only engages below 2M rows,
    where per-task overhead dominates anyway."""
    path = f"{sf_dir}/{name}.parquet"
    rows = _READ_ROWS_CACHE.get(path)
    if rows is None:
        try:
            import pyarrow.parquet as _pq
            rows = _pq.read_metadata(path).num_rows
        except Exception:
            rows = -1
        _READ_ROWS_CACHE[path] = rows
    kw = {}
    if 0 <= rows < 2_000_000:
        kw["override_num_blocks"] = max(1, -(-rows // 131072))
    return ray.data.read_parquet(path, columns=columns, **kw)


def _round_col(t: pa.Table, col: str, nd: int) -> pa.Table:
    """DuckDB-compatible rounding: ties away from zero (DuckDB round()),
    NOT banker's rounding — required for value-hash parity on boundary
    values like 0.8203125."""
    i = t.column_names.index(col)
    return t.set_column(i, col, pc.round(t.column(col), ndigits=nd,
                                         round_mode="half_towards_infinity"))


# =====================================================================
# Relational parity queries
# =====================================================================

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter + multi-key groupby + 5 aggregates.

    Shuffle shape: the group key domain is 6 rows (CHAR(1) × CHAR(1)), so
    a per-batch ``pa.Table.group_by`` combiner collapses each block to ≤6
    partial rows and ``grouped_agg`` driver-merges the measured-tiny
    partial set — the sort-shuffle Aggregate paid a ~P×B fixed cost
    (blocks × partitions slices) that dwarfed the 600k-row data."""
    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount",
                "l_returnflag", "l_linestatus"])

    # money columns are 2-decimal fixed-point: aggregate in scaled int64 so
    # the sum is EXACT and independent of partition/summation order — the
    # distributed-sum-vs-oracle determinism rule (floats drift across the
    # rounding boundary otherwise)
    def prep(b: pa.Table) -> pa.Table:
        keep = pc.less_equal(b.column("l_shipdate"),
                             pa.scalar(np.datetime64("1998-09-02", "us")))
        b = b.filter(keep)
        qty_c = np.round(np.asarray(b.column("l_quantity")) * 100).astype(np.int64)
        ep_c = np.round(np.asarray(b.column("l_extendedprice")) * 100).astype(np.int64)
        disc_c = np.round(np.asarray(b.column("l_discount")) * 100).astype(np.int64)
        t = pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty_c": pa.array(qty_c, pa.int64()),
            "ep_c": pa.array(ep_c, pa.int64()),
            "disc_price_cc": pa.array(ep_c * (100 - disc_c), pa.int64()),
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("ep_c", "sum"), ("disc_price_cc", "sum"),
             ("qty_c", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "qty_c": g.column("qty_c_sum"),
            "ep_c": g.column("ep_c_sum"),
            "disc_price_cc": g.column("disc_price_cc_sum"),
            "n": g.column("qty_c_count"),
        })

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(ds.map_batches(prep, batch_format="pyarrow"),
                      ["l_returnflag", "l_linestatus"],
                      [("qty_c", "sum"), ("ep_c", "sum"),
                       ("disc_price_cc", "sum"), ("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        qty = np.asarray(b.column("qty_c"), dtype=np.int64)
        cnt = np.asarray(b.column("n"), dtype=np.int64)
        t = pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "sum_qty": pa.array(qty / 100.0, pa.float64()),
            "sum_base_price": pa.array(np.asarray(b.column("ep_c"), dtype=np.int64) / 100.0, pa.float64()),
            "sum_disc_price": pa.array(np.asarray(b.column("disc_price_cc"), dtype=np.int64) / 10000.0, pa.float64()),
            "avg_qty": pa.array(qty / 100.0 / cnt, pa.float64()),
            "count_order": pa.array(cnt, pa.int64()),
        })
        for c, nd in (("sum_qty", 2), ("sum_base_price", 2), ("sum_disc_price", 2), ("avg_qty", 4)):
            t = _round_col(t, c, nd)
        return t

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2) AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2) AS sum_disc_price,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_segment_revenue(sf_dir: str):
    """orders ⋈ customer (hash join) + groupby segment."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "price_c": pa.array(np.round(np.asarray(b.column("o_totalprice")) * 100).astype(np.int64)),
        })

    orders = orders.map_batches(cents, batch_format="pyarrow")
    j = orders.join(cust, join_type="inner", num_partitions=_join_partitions(),
                    on=("o_custkey",), right_on=("c_custkey",))

    # ≤5 market segments: per-batch combine + measured-size final merge
    # instead of a second sort-shuffle after the join
    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_mktsegment"]).aggregate(
            [("price_c", "sum"), ("price_c", "count")])
        return pa.table({"c_mktsegment": g.column("c_mktsegment"),
                         "price_c": g.column("price_c_sum"),
                         "n": g.column("price_c_count")})

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(j.map_batches(combine, batch_format="pyarrow"),
                      ["c_mktsegment"], [("price_c", "sum"), ("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "total_price": pa.array(np.asarray(b.column("price_c"), dtype=np.int64) / 100.0, pa.float64()),
            "n_orders": b.column("n"),
        })
        return _round_col(t, "total_price", 2)

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total_price,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_topk_orders(sf_dir: str):
    """ORDER BY … LIMIT (ogr_gensql.cpp:2218 CreateOrderByIndex analog)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(lambda b: _round_col(b, "o_totalprice", 2),
                           batch_format="pyarrow")


SQL_TOPK_ORDERS = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_hash_sample(sf_dir: str, rate_num: int = 1, rate_den: int = 20):
    """Deterministic hash-threshold sample: keep rows where
    splitmix64(key) < rate·2^64 — the scale-correct distributed sampler
    (stateless, partition-invariant, reproducible; `random_sample`'s seed
    depends on blocking).  One map_batches filter, zero shuffle; the same
    arithmetic replays in DuckDB HUGEINT so the sample is oracle-exact."""
    from .dedup import _splitmix
    thr = np.uint64((rate_num << 64) // rate_den - 1)  # < is ≤ thr here

    def keep(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("o_orderkey"), np.int64).astype(np.uint64)
        m = _splitmix(k) <= thr
        out = b.filter(pa.array(m))
        return _round_col(out, "o_totalprice", 2)

    return _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(keep, batch_format="pyarrow")


def _sql_hash_sample() -> str:
    from .sketches import _sm_hugeint_select
    thr = (1 << 64) // 20 - 1
    return (f"WITH s AS ({_sm_hugeint_select('orders', 'o_orderkey')}) "
            f"SELECT o_orderkey, o_custkey, round(o_totalprice, 2) "
            f"AS o_totalprice FROM s WHERE hv <= {thr}::HUGEINT")


def q_topn_per_group(sf_dir: str, n: int = 3):
    """Per-group top-N (window-function shape: row_number() OVER
    (PARTITION BY custkey ORDER BY price DESC) <= N) — the per-customer
    largest orders.  Shuffle shape: a per-batch combiner keeps only each
    batch's per-key top-N candidates (exact — a global top-N row is a
    batch top-N row of its batch), then `grouped_map_groups`' measured-size
    merge finishes per key."""
    from .shuffle_utils import grouped_map_groups
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def combine(b: pa.Table) -> pa.Table:
        ck = np.asarray(b.column("o_custkey"), np.int64)
        ok = np.asarray(b.column("o_orderkey"), np.int64)
        tp = np.asarray(b.column("o_totalprice"), np.float64)
        order = np.lexsort((ok, -tp, ck))      # key asc, price desc, id asc
        cks = ck[order]
        newk = np.empty(cks.size, bool)
        if cks.size:
            newk[0] = True
            newk[1:] = cks[1:] != cks[:-1]
        starts = np.flatnonzero(newk)
        rank = np.arange(cks.size) - np.repeat(starts,
                                               np.diff(np.append(starts,
                                                                 cks.size)))
        keep = order[rank < n]
        return b.take(pa.array(keep, pa.int64()))

    def per_group(g: pa.Table) -> pa.Table:
        ok = np.asarray(g.column("o_orderkey"), np.int64)
        tp = np.asarray(g.column("o_totalprice"), np.float64)
        order = np.lexsort((ok, -tp))[:n]
        out = g.take(pa.array(order, pa.int64()))
        rk = pa.array(np.arange(1, out.num_rows + 1), pa.int64())
        return _round_col(out.append_column("rank", rk), "o_totalprice", 2)

    return grouped_map_groups(
        ds.map_batches(combine, batch_format="pyarrow"),
        "o_custkey", per_group)


SQL_TOPN_PER_GROUP = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rank
FROM orders
QUALIFY rank <= 3
"""


def q_distinct_brands(sf_dir: str):
    """SELECT DISTINCT (SWQM_DISTINCT_LIST, ogr_gensql.cpp:705) = groupby
    with no aggregates — a pure key shuffle."""
    # ≤25 brands: per-batch unique + measured-size merge (DISTINCT over a
    # bounded domain needs no sort-shuffle)
    def uniq(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand"]).aggregate([("p_brand", "count")])
        return pa.table({"p_brand": g.column("p_brand"),
                         "n": g.column("p_brand_count")})

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(_read(sf_dir, "part", ["p_brand"])
                      .map_batches(uniq, batch_format="pyarrow"),
                      ["p_brand"], [("n", "sum")])
    if isinstance(agg, pa.Table):
        return agg.select(["p_brand"])
    return agg.select_columns(["p_brand"])


SQL_DISTINCT_BRANDS = "SELECT DISTINCT p_brand FROM part"


def q_filter_project(sf_dir: str):
    """-where + -select + computed field (ogr2ogr_lib.cpp:7707,7729)."""
    ds = _read(sf_dir, "lineitem")

    def fn(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(b.column("l_quantity"), pa.scalar(45.0)),
                       pc.less(b.column("l_discount"), pa.scalar(0.05)))
        b = b.filter(keep)
        # price×(1-discount) is an exact 4-decimal rational; decimal ties
        # (.XX50) round differently through a float path than through
        # DuckDB's decimal-aware round — do the rounding in integer cents²
        ep_c = np.round(np.asarray(b.column("l_extendedprice")) * 100).astype(np.int64)
        disc_c = np.round(np.asarray(b.column("l_discount")) * 100).astype(np.int64)
        cc = ep_c * (100 - disc_c)
        revenue = ((cc + 50) // 100) / 100.0  # half-up on exact integers
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber"),
            "revenue": pa.array(revenue, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       ((CAST(round(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100) / 100.0 AS revenue
FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
"""


def q_nation_revenue(sf_dir: str):
    """lineitem ⋈ orders ⋈ customer ⋈ nation as a BROADCAST map-side join +
    in-batch partial aggregation (np.bincount) + tiny final groupby.

    The dimension chain (orders→customer→nation) is composed ONCE on the
    driver into a sorted orderkey → nation-index array and ray.put — the
    fact table never shuffles.  The reference's nested-loop join
    (ogr_gensql.cpp:1541) becomes a vectorized searchsorted per batch.
    At scales where orders outgrows broadcast (~10⁸ rows), swap the first
    hop for ds.join — the aggregation shape is unchanged."""
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ckey = np.asarray(cust.column("c_custkey"), dtype=np.int64)
    cnat = np.asarray(cust.column("c_nationkey"), dtype=np.int64)
    corder = np.argsort(ckey)
    ckey_s, cnat_s = ckey[corder], cnat[corder]
    nkey = np.asarray(nation.column("n_nationkey"), dtype=np.int64)
    names = nation.column("n_name").to_pylist()
    norder = np.argsort(nkey)
    nkey_s = nkey[norder]
    names_s = [names[i] for i in norder]
    okey = np.asarray(orders.column("o_orderkey"), dtype=np.int64)
    ocust = np.asarray(orders.column("o_custkey"), dtype=np.int64)
    oorder = np.argsort(okey)
    okey_s = okey[oorder]
    # compose: order -> cust -> nation-index
    nat_of_cust = np.searchsorted(nkey_s, cnat_s)
    onat = nat_of_cust[np.searchsorted(ckey_s, ocust[oorder])]
    lookup = ray.put({"okey": okey_s, "onat": onat, "names": names_s})

    def partial(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup)
        keys = np.asarray(b.column("l_orderkey"), dtype=np.int64)
        pos = np.searchsorted(lk["okey"], keys)
        pos_c = np.clip(pos, 0, lk["okey"].size - 1)
        hit = lk["okey"][pos_c] == keys
        nat = lk["onat"][pos_c[hit]]
        ep_c = np.round(np.asarray(b.column("l_extendedprice"))[hit] * 100).astype(np.int64)
        disc_c = np.round(np.asarray(b.column("l_discount"))[hit] * 100).astype(np.int64)
        rev_cc = ep_c * (100 - disc_c)
        nnat = len(lk["names"])
        cnt = np.bincount(nat, minlength=nnat)
        rev = np.bincount(nat, weights=rev_cc.astype(np.float64), minlength=nnat).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "n_name": pa.array([lk["names"][i] for i in nz], pa.string()),
            "rev_cc": pa.array(rev[nz], pa.int64()),
            "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
        })

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    # per-batch partials are ≤25 nation rows each: grouped_agg driver-merges
    # the measured-tiny set (the sort-shuffle Aggregate's fixed cost was
    # most of this query's wall time)
    from .shuffle_utils import grouped_agg
    agg = grouped_agg(li.map_batches(partial, batch_format="pyarrow"),
                      ["n_name"], [("rev_cc", "sum"), ("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table({
            "n_name": b.column("n_name"),
            "revenue": pa.array(np.asarray(b.column("rev_cc"), dtype=np.int64) / 10000.0, pa.float64()),
            "n_items": b.column("n"),
        })
        return _round_col(t, "revenue", 2)

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_NATION_REVENUE = """
SELECT n_name,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_event_stats(sf_dir: str):
    """events groupby with min/max/mean — the band-statistics aggregate
    shape (partial+final)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def micro(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b.column("event_type"),
            "value": b.column("value"),
            "value_u": pa.array(np.round(np.asarray(b.column("value")) * 1e6).astype(np.int64)),
        })
        g = t.group_by(["event_type"]).aggregate(
            [("value_u", "count"), ("value_u", "sum"),
             ("value", "min"), ("value", "max")])
        return pa.table({
            "event_type": g.column("event_type"),
            "n": g.column("value_u_count"),
            "value_u": g.column("value_u_sum"),
            "vmin": g.column("value_min"),
            "vmax": g.column("value_max"),
        })

    # per-batch combine to ≤|event_type| rows, measured-size final merge
    from .shuffle_utils import grouped_agg
    agg = grouped_agg(ds.map_batches(micro, batch_format="pyarrow"),
                      ["event_type"],
                      [("n", "sum"), ("value_u", "sum"),
                       ("vmin", "min"), ("vmax", "max")])

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b.column("event_type"),
            "n_events": pa.array(np.asarray(b.column("n"), dtype=np.int64), pa.int64()),
            "sum_value": pa.array(np.asarray(b.column("value_u"), dtype=np.int64) / 1e6, pa.float64()),
            "min_value": b.column("vmin"),
            "max_value": b.column("vmax"),
        })
        t = _round_col(t, "sum_value", 4)
        t = _round_col(t, "min_value", 6)
        return _round_col(t, "max_value", 6)

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENT_STATS = """
SELECT event_type, count(*) AS n_events,
       round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY event_type
"""


def q_union_concat(sf_dir: str):
    """union-all of two filtered layers (OGRUnionLayer / vector concat)."""
    o = _read(sf_dir, "orders")
    hi = o.filter(expr="o_totalprice > 400000.0")
    lo = o.filter(expr="o_totalprice < 10000.0")
    u = hi.union(lo).select_columns(["o_orderkey", "o_orderstatus"])
    return u


SQL_UNION_CONCAT = """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000.0
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice < 10000.0
"""


def q_semi_anti(sf_dir: str):
    """customers with no orders (anti-join via left join + null filter —
    the SQL NOT IN idiom, SURVEY §2.5 semi/anti)."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders").filter(expr="o_totalprice > 300000.0") \
        .groupby("o_custkey").aggregate(Count())
    j = cust.join(orders, join_type="left_outer", num_partitions=_join_partitions(),
                  on=("c_custkey",), right_on=("o_custkey",))

    def fn(b: pa.Table) -> pa.Table:
        keep = pc.is_null(b.column("count()"))
        return pa.table({"c_custkey": b.filter(keep).column("c_custkey")})

    return j.map_batches(fn, batch_format="pyarrow")


SQL_SEMI_ANTI = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


def q_string_funcs(sf_dir: str):
    """CONCAT/SUBSTR/LIKE/CAST of the OGR SQL function set
    (swq_op_registrar.cpp:28-62) via pyarrow.compute."""
    ds = _read(sf_dir, "part")

    def fn(b: pa.Table) -> pa.Table:
        keep = pc.match_like(b.column("p_type"), "%M%")
        b = b.filter(keep)
        label = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(b.column("p_brand"), 0, 5),
            pc.cast(b.column("p_size"), pa.string()), "#")
        return pa.table({
            "p_partkey": b.column("p_partkey"),
            "label": label,
            "upper_name": pc.utf8_upper(b.column("p_name")),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_STRING_FUNCS = """
SELECT p_partkey,
       substr(p_brand, 1, 5) || '#' || CAST(p_size AS VARCHAR) AS label,
       upper(p_name) AS upper_name
FROM part WHERE p_type LIKE '%M%'
"""


# =====================================================================
# Geo queries over key-derived coordinates (engine machinery + SQL oracle)
# =====================================================================
# Derivations are integer-modulo first, one final division — bit-identical
# in numpy and DuckDB.  Offsets (.05 / .017) keep points off cell/zone
# boundaries so floor/BETWEEN edge semantics can't diverge.

def _cust_points(b: pa.Table) -> pa.Table:
    k = np.asarray(b.column("c_custkey"), dtype=np.int64)
    x = ((k * 37) % 3600) / 10.0 - 180.0 + 0.05
    y = ((k * 91) % 1700) / 10.0 - 85.0 + 0.05
    return pa.table({"point_id": pa.array([f"c{v:08d}" for v in k]),
                     "ckey": pa.array(k, pa.int64()),
                     "x": pa.array(x, pa.float64()),
                     "y": pa.array(y, pa.float64())})


def _nation_rects(b: pa.Table) -> pa.Table:
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    xmin = ((k * 29) % 300) - 160.0 + 0.017
    ymin = ((k * 53) % 140) - 75.0 + 0.017
    xmax = xmin + 12.0 + (k % 7)
    ymax = ymin + 8.0 + (k % 5)
    wkbs = [wkb.box(a, b2, c, d) for a, b2, c, d in zip(xmin, ymin, xmax, ymax)]
    return pa.table({"poly_id": pa.array([f"n{v:04d}" for v in k]),
                     "nkey": pa.array(k, pa.int64()),
                     "wkb": pa.array(wkbs, pa.binary())})


def geo_tile_assign(sf_dir: str):
    """XYZ tile assignment at z=8 for lineitem-derived lon/lat + per-tile
    counts — the gdal2tiles PixelsToTile math as a groupby key."""
    Z = 8
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def fn(b: pa.Table) -> pa.Table:
        pk = np.asarray(b.column("l_partkey"), dtype=np.int64)
        sk = np.asarray(b.column("l_suppkey"), dtype=np.int64)
        lon = ((pk * 17 + sk * 7) % 3600) / 10.0 - 180.0 + 0.05
        lat = ((pk * 13 + sk * 29) % 1600) / 10.0 - 80.0 + 0.05
        mx, my = mercator.latlon_to_meters(lat, lon)
        px, py = mercator.meters_to_pixels(mx, my, Z)
        tx, ty_tms = mercator.pixels_to_tile(px, py)
        _, ty = mercator.tms_to_xyz(tx, ty_tms, Z)
        # map-side combiner: per-batch counts on ONE packed int64 key, so
        # the shuffle moves <= distinct-tiles-per-batch 16-byte rows (not
        # every input point) and the groupby sorts a single column
        key, cnt = np.unique((tx.astype(np.int64) << 32) | ty,
                             return_counts=True)
        return pa.table({"key": pa.array(key, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    # the z=8 key domain is <= 65536 tiles, so the measured partial set
    # stays tiny and grouped_sum_int64 takes its driver-reduce path (no
    # sort-shuffle; its fixed cost dominated this query)
    from .shuffle_utils import grouped_sum_int64
    agg = grouped_sum_int64(
        ds.map_batches(fn, batch_format="pyarrow"), "key", "n")

    def unpack(b: pa.Table) -> pa.Table:
        key = np.asarray(b.column("key"), dtype=np.int64)
        return pa.table({"z": pa.array(np.full(key.size, Z, np.int64)),
                         "x": pa.array(key >> 32, pa.int64()),
                         "y": pa.array(key & 0xFFFFFFFF, pa.int64()),
                         "n": b.column("n")})

    if isinstance(agg, pa.Table):
        return unpack(agg)
    return agg.map_batches(unpack, batch_format="pyarrow")


SQL_GEO_TILE_ASSIGN = """
WITH pts AS (
  SELECT ((l_partkey * 17 + l_suppkey * 7) % 3600) / 10.0 - 180.0 + 0.05 AS lon,
         ((l_partkey * 13 + l_suppkey * 29) % 1600) / 10.0 - 80.0 + 0.05 AS lat
  FROM lineitem
), tiles AS (
  SELECT 8 AS z,
         CAST(ceil((lon * 20037508.342789244 / 180.0 + 20037508.342789244)
              / (2 * pi() * 6378137 / 256 / 256.0) / 256.0) AS BIGINT) - 1 AS x,
         255 - (CAST(ceil((ln(tan((90 + lat) * pi() / 360.0)) / (pi() / 180.0)
              * 20037508.342789244 / 180.0 + 20037508.342789244)
              / (2 * pi() * 6378137 / 256 / 256.0) / 256.0) AS BIGINT) - 1) AS y
  FROM pts
)
SELECT z, x, y, count(*) AS n FROM tiles GROUP BY z, x, y
"""


def geo_pip_join(sf_dir: str):
    """Point-in-polygon join through the REAL cell-join machinery (WKB
    rects so the oracle is a BETWEEN join)."""
    pts = _read(sf_dir, "customer").map_batches(_cust_points, batch_format="pyarrow")
    pls = _read(sf_dir, "nation").map_batches(_nation_rects, batch_format="pyarrow")
    pairs = SJ.point_in_polygon_join(pts, pls, predicate="intersects")

    def to_keys(b: pa.Table) -> pa.Table:
        ck = [int(s[1:]) for s in b.column("point_id").to_pylist()]
        nk = [int(s[1:]) for s in b.column("poly_id").to_pylist()]
        return pa.table({"c_custkey": pa.array(ck, pa.int64()),
                         "n_nationkey": pa.array(nk, pa.int64())})

    return pairs.map_batches(to_keys, batch_format="pyarrow")


SQL_GEO_PIP_JOIN = """
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS x,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS y
  FROM customer
), rects AS (
  SELECT n_nationkey,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 AS xmin,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 AS ymin,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 + 12.0 + (n_nationkey % 7) AS xmax,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 + 8.0 + (n_nationkey % 5) AS ymax
  FROM nation
)
SELECT c_custkey, n_nationkey
FROM pts JOIN rects
  ON x BETWEEN xmin AND xmax AND y BETWEEN ymin AND ymax
"""


def geo_knn(sf_dir: str):
    """3 nearest customer-points per supplier-point via the broadcast kNN
    stage; oracle = windowed cross join."""
    cust = _read(sf_dir, "customer").map_batches(_cust_points, batch_format="pyarrow")
    sup_tbl = _read(sf_dir, "supplier", ["s_suppkey"]) \
        .map_batches(lambda b: pa.table({
            "point_id": pa.array([f"s{int(v):06d}" for v in np.asarray(b.column('s_suppkey'))]),
            "skey": b.column("s_suppkey"),
            "x": pa.array((((np.asarray(b.column('s_suppkey'), dtype=np.int64)) * 41) % 3600) / 10.0 - 180.0 + 0.03, pa.float64()),
            "y": pa.array((((np.asarray(b.column('s_suppkey'), dtype=np.int64)) * 67) % 1700) / 10.0 - 85.0 + 0.03, pa.float64()),
        }), batch_format="pyarrow")
    # broadcast side must be ordered by id so kernel tie-break == (d, id)
    ctab = pa.concat_tables([b for b in cust.iter_batches(batch_format="pyarrow")])
    order = pc.sort_indices(ctab.column("ckey"))
    ctab = ctab.take(order)
    ref_xy = np.column_stack([np.asarray(ctab.column("x")), np.asarray(ctab.column("y"))])
    ref_ids = [int(v) for v in ctab.column("ckey").to_pylist()]
    out = KNN.knn_join(sup_tbl, ref_xy, ref_ids, k=3, concurrency=2)

    def finish(b: pa.Table) -> pa.Table:
        sk = [int(s[1:]) for s in b.column("point_id").to_pylist()]
        return pa.table({"s_suppkey": pa.array(sk, pa.int64()),
                         "c_custkey": pa.array([int(v) for v in b.column("neighbor_id").to_pylist()], pa.int64()),
                         "rank": pc.cast(b.column("rank"), pa.int64()),
                         "dist": pc.round(b.column("distance"), ndigits=6,
                                          round_mode="half_towards_infinity")})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_GEO_KNN = """
WITH cust AS (
  SELECT c_custkey,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS x,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS y
  FROM customer
), sup AS (
  SELECT s_suppkey,
         ((s_suppkey * 41) % 3600) / 10.0 - 180.0 + 0.03 AS x,
         ((s_suppkey * 67) % 1700) / 10.0 - 85.0 + 0.03 AS y
  FROM supplier
), ranked AS (
  SELECT s_suppkey, c_custkey,
         sqrt((sup.x - cust.x) * (sup.x - cust.x)
              + (sup.y - cust.y) * (sup.y - cust.y)) AS d,
         row_number() OVER (PARTITION BY s_suppkey
             ORDER BY (sup.x - cust.x) * (sup.x - cust.x)
                      + (sup.y - cust.y) * (sup.y - cust.y), c_custkey) AS rank
  FROM sup CROSS JOIN cust
)
SELECT s_suppkey, c_custkey, rank, round(d, 6) AS dist
FROM ranked WHERE rank <= 3
"""


def geo_zonal_points(sf_dir: str):
    """Zonal aggregate of point values per rect zone — cell join + final
    groupby (the alg/zonal.cpp partial+final shape on vector points)."""
    def li_points(b: pa.Table) -> pa.Table:
        ok = np.asarray(b.column("l_orderkey"), dtype=np.int64)
        ln = np.asarray(b.column("l_linenumber"), dtype=np.int64)
        k = ok * 10 + ln
        x = ((k * 19) % 3600) / 10.0 - 180.0 + 0.041
        y = ((k * 73) % 1700) / 10.0 - 85.0 + 0.041
        return pa.table({"point_id": pa.array([f"l{v:010d}" for v in k]),
                         "x": pa.array(x, pa.float64()),
                         "y": pa.array(y, pa.float64()),
                         "value": b.column("l_quantity")})

    pts = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]) \
        .map_batches(li_points, batch_format="pyarrow")
    pls = _read(sf_dir, "nation").map_batches(_nation_rects, batch_format="pyarrow")

    # the cell-join CARRIES the value column through (carry_cols) — no
    # back-join by key, which both saves a shuffle and stays correct when
    # the derived key is not unique (every input row counts once)
    pairs = SJ.point_in_polygon_join(pts, pls, predicate="intersects",
                                     carry_cols=("value",))

    def attach(b: pa.Table) -> pa.Table:
        nk = [int(s[1:]) for s in b.column("poly_id").to_pylist()]
        return pa.table({
            "n_nationkey": pa.array(nk, pa.int64()),
            "value": b.column("value"),
            "value_c": pa.array(np.round(np.asarray(b.column("value")) * 100).astype(np.int64)),
        })

    # ≤25 zones: per-batch combine + measured-size merge after the cell join
    def combine(b: pa.Table) -> pa.Table:
        t = attach(b)
        g = t.group_by(["n_nationkey"]).aggregate(
            [("value_c", "count"), ("value_c", "sum"),
             ("value", "min"), ("value", "max")])
        return pa.table({"n_nationkey": g.column("n_nationkey"),
                         "n": g.column("value_c_count"),
                         "value_c": g.column("value_c_sum"),
                         "vmin": g.column("value_min"),
                         "vmax": g.column("value_max")})

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(pairs.map_batches(combine, batch_format="pyarrow"),
                      ["n_nationkey"],
                      [("n", "sum"), ("value_c", "sum"),
                       ("vmin", "min"), ("vmax", "max")])

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table({"n_nationkey": b.column("n_nationkey"),
                      "n_points": pa.array(np.asarray(b.column("n"), dtype=np.int64), pa.int64()),
                      "sum_value": pa.array(np.asarray(b.column("value_c"), dtype=np.int64) / 100.0, pa.float64()),
                      "min_value": b.column("vmin"),
                      "max_value": b.column("vmax")})
        return _round_col(t, "sum_value", 2)

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_GEO_ZONAL = """
WITH pts AS (
  SELECT (l_orderkey * 10 + l_linenumber) AS k, l_quantity AS value,
         (((l_orderkey * 10 + l_linenumber) * 19) % 3600) / 10.0 - 180.0 + 0.041 AS x,
         (((l_orderkey * 10 + l_linenumber) * 73) % 1700) / 10.0 - 85.0 + 0.041 AS y
  FROM lineitem
), rects AS (
  SELECT n_nationkey,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 AS xmin,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 AS ymin,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 + 12.0 + (n_nationkey % 7) AS xmax,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 + 8.0 + (n_nationkey % 5) AS ymax
  FROM nation
)
SELECT n_nationkey, count(*) AS n_points,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM pts JOIN rects
  ON x BETWEEN xmin AND xmax AND y BETWEEN ymin AND ymax
GROUP BY n_nationkey
"""


# =====================================================================
# Training-data queries with SQL oracles
# =====================================================================

def vector_centroid(sf_dir: str):
    """Centroids of nation-derived rect polygons through the REAL WKB
    centroid engine; oracle = rect midpoint arithmetic."""
    from ..stages import vector as V
    pls = _read(sf_dir, "nation").map_batches(_nation_rects, batch_format="pyarrow")

    def fn(b: pa.Table) -> pa.Table:
        t = V.centroids(b)
        return pa.table({
            "n_nationkey": t.column("nkey"),
            "cx": pc.round(t.column("cx"), ndigits=6, round_mode="half_towards_infinity"),
            "cy": pc.round(t.column("cy"), ndigits=6, round_mode="half_towards_infinity"),
        })

    return pls.map_batches(fn, batch_format="pyarrow")


SQL_VECTOR_CENTROID = """
SELECT n_nationkey,
       round(((n_nationkey * 29) % 300) - 160.0 + 0.017 + (12.0 + (n_nationkey % 7)) / 2.0, 6) AS cx,
       round(((n_nationkey * 53) % 140) - 75.0 + 0.017 + (8.0 + (n_nationkey % 5)) / 2.0, 6) AS cy
FROM nation
"""


def vector_clip(sf_dir: str):
    """Clip nation-rects to a window through the Sutherland-Hodgman engine;
    oracle = rect-intersection arithmetic (area of rect ∩ window)."""
    from ..stages import vector as V
    W = (-100.0, -50.0, 60.0, 40.0)
    pls = _read(sf_dir, "nation").map_batches(_nation_rects, batch_format="pyarrow")

    def fn(b: pa.Table) -> pa.Table:
        t = V.clip_to_bbox(b, *W)
        t = V.area_col(t)
        return pa.table({
            "n_nationkey": t.column("nkey"),
            "clip_area": pc.round(t.column("area"), ndigits=6,
                                  round_mode="half_towards_infinity"),
        })

    return pls.map_batches(fn, batch_format="pyarrow")


SQL_VECTOR_CLIP = """
WITH rects AS (
  SELECT n_nationkey,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 AS xmin,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 AS ymin,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 + 12.0 + (n_nationkey % 7) AS xmax,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 + 8.0 + (n_nationkey % 5) AS ymax
  FROM nation
), clipped AS (
  SELECT n_nationkey,
         greatest(xmin, -100.0) AS cxmin, least(xmax, 60.0) AS cxmax,
         greatest(ymin, -50.0) AS cymin, least(ymax, 40.0) AS cymax
  FROM rects
)
SELECT n_nationkey,
       round((cxmax - cxmin) * (cymax - cymin), 6) AS clip_area
FROM clipped WHERE cxmax > cxmin AND cymax > cymin
"""


def layer_intersection_rects(sf_dir: str):
    """Layer algebra (Intersection) through the REAL cell-join overlay:
    nation-derived rects × region-derived rects; oracle = rect-intersection
    arithmetic (areas via greatest/least)."""
    from .layer_algebra import layer_intersection

    def region_rects(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("r_regionkey"), dtype=np.int64)
        xmin = ((k * 67) % 280) - 150.0 + 0.013
        ymin = ((k * 41) % 120) - 65.0 + 0.013
        xmax = xmin + 25.0 + (k % 11)
        ymax = ymin + 18.0 + (k % 9)
        return pa.table({"b_id": pa.array([f"r{v:02d}" for v in k]),
                         "wkb": pa.array([wkb.box(a, b2, c, d) for a, b2, c, d
                                          in zip(xmin, ymin, xmax, ymax)], pa.binary())})

    def nat_rects(b: pa.Table) -> pa.Table:
        t = _nation_rects(b)
        return pa.table({"a_id": t.column("poly_id"), "wkb": t.column("wkb")})

    a = _read(sf_dir, "nation").map_batches(nat_rects, batch_format="pyarrow")
    bds = _read(sf_dir, "region").map_batches(region_rects, batch_format="pyarrow")
    out = layer_intersection(a, bds)

    def finish(b: pa.Table) -> pa.Table:
        nk = [int(s[1:]) for s in b.column("a_id").to_pylist()]
        rk = [int(s[1:]) for s in b.column("b_id").to_pylist()]
        return pa.table({
            "n_nationkey": pa.array(nk, pa.int64()),
            "r_regionkey": pa.array(rk, pa.int64()),
            "piece_area": pc.round(b.column("piece_area"), ndigits=6,
                                   round_mode="half_towards_infinity"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_LAYER_INTERSECTION = """
WITH a AS (
  SELECT n_nationkey,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 AS xmin,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 AS ymin,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 + 12.0 + (n_nationkey % 7) AS xmax,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 + 8.0 + (n_nationkey % 5) AS ymax
  FROM nation
), b AS (
  SELECT r_regionkey,
         ((r_regionkey * 67) % 280) - 150.0 + 0.013 AS xmin,
         ((r_regionkey * 41) % 120) - 65.0 + 0.013 AS ymin,
         ((r_regionkey * 67) % 280) - 150.0 + 0.013 + 25.0 + (r_regionkey % 11) AS xmax,
         ((r_regionkey * 41) % 120) - 65.0 + 0.013 + 18.0 + (r_regionkey % 9) AS ymax
  FROM region
)
SELECT n_nationkey, r_regionkey,
       round((least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin))
             * (least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin)), 6) AS piece_area
FROM a JOIN b
  ON least(a.xmax, b.xmax) > greatest(a.xmin, b.xmin)
 AND least(a.ymax, b.ymax) > greatest(a.ymin, b.ymin)
"""


def events_hourly_q(sf_dir: str):
    from .raster_ops import events_hourly
    return events_hourly(sf_dir)


from .raster_ops import SQL_EVENTS_HOURLY as SQL_EVENTS_HOURLY_ORACLE  # noqa: E402


def events_sessions_q(sf_dir: str):
    from .raster_ops import events_sessions
    return events_sessions(sf_dir)


def events_hopping_q(sf_dir: str):
    from .raster_ops import events_hopping
    return events_hopping(sf_dir)


from .raster_ops import SQL_EVENTS_HOPPING as SQL_EVENTS_HOPPING_ORACLE  # noqa: E402


def text_top_tokens_q(sf_dir: str):
    """Exact heavy-hitter tokens over the documents corpus (count desc,
    token asc tie-break)."""
    from .text import top_tokens
    return top_tokens(_read(sf_dir, "documents", ["text"]), k=25)


SQL_TEXT_TOP_TOKENS = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
), c AS (
  SELECT token, count(*) AS n FROM toks WHERE token != '' GROUP BY token
)
SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT 25
"""


def q_asof_join(sf_dir: str):
    """As-of join over the events stream: each purchase matched to the
    user's most recent prior signup (backward, ties toward the largest
    signup id); gap in µs.  The time-series custom operator Ray Data
    lacks — see pipelines/asof.py for the bucket-vectorized shape."""
    from .asof import asof_join

    def typed(t, id_name):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.equal(b.column("event_type"), t)
            f = b.filter(m)
            return pa.table({id_name: f.column("event_id"),
                             "user_id": f.column("user_id"),
                             "ts": f.column("ts")})
        return fn

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    left = ev.map_batches(typed("purchase", "purchase_id"),
                          batch_format="pyarrow")
    right = ev.map_batches(typed("signup", "signup_id"),
                           batch_format="pyarrow")
    return asof_join(left, right, by="user_id", on="ts",
                     left_id="purchase_id", right_id="signup_id") \
        .map_batches(lambda b: pa.table({
            "purchase_id": b.column("purchase_id"),
            "signup_id": b.column("signup_id"),
            "gap_us": b.column("gap")}), batch_format="pyarrow")


SQL_ASOF_JOIN = """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tu FROM events
           WHERE event_type = 'purchase'),
s AS (SELECT event_id AS sid, user_id, epoch_us(ts) AS su FROM events
      WHERE event_type = 'signup'),
j AS (SELECT p.event_id AS purchase_id, s.sid AS signup_id,
             p.tu - s.su AS gap_us,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY s.su DESC, s.sid DESC) AS rn
      FROM p JOIN s ON p.user_id = s.user_id AND s.su <= p.tu)
SELECT purchase_id, signup_id, gap_us FROM j WHERE rn = 1
"""


def q_range_join(sf_dir: str):
    """Range (interval) join: orders matched into OVERLAPPING price bands
    [k·40000, k·40000+90000) — each order lands in every containing band.
    Broadcast small-bands shape (pipelines/asof.interval_join_broadcast)."""
    from .asof import interval_join_broadcast
    ks = np.arange(14, dtype=np.int64)
    bands = pa.table({"lo": pa.array(ks * 40000.0),
                      "hi": pa.array(ks * 40000.0 + 90000.0),
                      "band": pa.array(ks)})
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = interval_join_broadcast(ds, bands, value_col="o_totalprice")
    return out.map_batches(
        lambda b: pa.table({"o_orderkey": b.column("o_orderkey"),
                            "band": b.column("band")}),
        batch_format="pyarrow")


SQL_RANGE_JOIN = """
SELECT o_orderkey, k AS band
FROM orders, generate_series(0, 13) g(k)
WHERE o_totalprice >= k * 40000 AND o_totalprice < k * 40000 + 90000
"""


def q_group_quantiles(sf_dir: str):
    """Exact per-group quantiles (median + p90 of order price per
    priority) WITHOUT collecting groups: prices quantize to exact cents,
    a per-batch (group, cents) count combiner bounds partials by the
    distinct-value count, grouped_agg merges the histograms, and the
    quantile reads off the cumulative counts — DuckDB's quantile_disc
    convention is index = ceil(n·q)-1, computed here in INTEGER
    arithmetic ((q_num·n + q_num - 1)//q_den style) because 10·0.9 > 9
    in IEEE and a float ceil picks the wrong element."""
    from .shuffle_utils import grouped_agg, grouped_map_groups
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def combine(b: pa.Table) -> pa.Table:
        prio = b.column("o_orderpriority")
        pint = pc.cast(pc.utf8_slice_codeunits(prio, 0, 1), pa.int64())
        cents = pa.array(np.round(np.asarray(b.column("o_totalprice"),
                                             np.float64) * 100)
                         .astype(np.int64))
        t = pa.table({"pint": pint, "o_orderpriority": prio,
                      "cents": cents,
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["pint", "o_orderpriority", "cents"]).aggregate(
            [("n", "sum")])
        return pa.table({"pint": g.column("pint"),
                         "o_orderpriority": g.column("o_orderpriority"),
                         "cents": g.column("cents"),
                         "n": g.column("n_sum")})

    hist = grouped_agg(ds.map_batches(combine, batch_format="pyarrow"),
                       ["pint", "o_orderpriority", "cents"], [("n", "sum")])
    if isinstance(hist, pa.Table):
        import ray.data as _rd
        hist = _rd.from_arrow(hist)

    def quantiles(g: pa.Table) -> pa.Table:
        cents = np.asarray(g.column("cents"), np.int64)
        n = np.asarray(g.column("n"), np.int64)
        order = np.argsort(cents)
        cents, n = cents[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])

        def disc(q_num: int, q_den: int) -> float:
            idx = -(-q_num * total // q_den) - 1        # ceil(n*q)-1, exact
            return float(cents[np.searchsorted(cum, idx, side="right")])

        return pa.table({
            "o_orderpriority": pa.array(
                [g.column("o_orderpriority")[0].as_py()], pa.string()),
            "n_orders": pa.array([total], pa.int64()),
            "median_price": pa.array([disc(1, 2) / 100.0], pa.float64()),
            "p90_price": pa.array([disc(9, 10) / 100.0], pa.float64()),
        })

    return grouped_map_groups(hist, "pint", quantiles)


SQL_GROUP_QUANTILES = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(quantile_disc(o_totalprice, 0.5), 2) AS median_price,
       round(quantile_disc(o_totalprice, 0.9), 2) AS p90_price
FROM orders GROUP BY o_orderpriority
"""


def sketch_ndistinct_q(sf_dir: str):
    """HLL register sketch of distinct events.user_id — the mergeable
    cardinality sketch with a FULL DuckDB register replay (sketches.py)."""
    from .sketches import hll_registers
    ds = _read(sf_dir, "events", ["user_id"])
    return hll_registers(ds, "user_id", b=10)


def _sql_sketch_ndistinct() -> str:
    from .sketches import build_sql_hll_registers
    return build_sql_hll_registers("events", "user_id", b=10)


def sketch_bloom_bits_q(sf_dir: str):
    """Bloom-filter build side over customer keys — the broadcast
    semi-join pre-filter's exact bit-position table (sketches.py)."""
    from .sketches import bloom_bits
    ds = _read(sf_dir, "customer", ["c_custkey"])
    return bloom_bits(ds, "c_custkey")


def _sql_sketch_bloom_bits() -> str:
    from .sketches import build_sql_bloom_bits
    return build_sql_bloom_bits("customer", "c_custkey")


def sketch_countmin_q(sf_dir: str):
    """Count-Min frequency counters over orders.o_custkey (a skewed
    many-rows-per-key column — the heavy-hitter shape)."""
    from .sketches import countmin_counters
    ds = _read(sf_dir, "orders", ["o_custkey"])
    return countmin_counters(ds, "o_custkey")


def _sql_sketch_countmin() -> str:
    from .sketches import build_sql_countmin
    return build_sql_countmin("orders", "o_custkey")


from .raster_ops import SQL_EVENTS_SESSIONS as SQL_EVENTS_SESSIONS_ORACLE  # noqa: E402


def dedup_exact_docs(sf_dir: str):
    from .dedup import exact_dedup
    return exact_dedup(_read(sf_dir, "documents"))


SQL_DEDUP_EXACT = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def text_token_stats(sf_dir: str):
    from .text import token_count
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(lambda b: token_count(b), batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_ws_tokens", "n_chars_calc"])


SQL_TEXT_TOKEN = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_ws_tokens,
       length(text) AS n_chars_calc
FROM documents
"""


def text_alpha_ratio(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        ar = []
        for t in texts:
            n = len(t)
            # [A-Za-z] only, to match the SQL regexp exactly (Python
            # isalpha() also counts unicode letters — NOT used here);
            # half-away-from-zero rounding = DuckDB round(), NOT Python's
            # banker's round (0.8203125 must go to 0.820313)
            n_alpha = sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in t)
            ar.append(float(np.floor(n_alpha / n * 1e6 + 0.5) / 1e6) if n else 0.0)
        return pa.table({"doc_id": b.column("doc_id"),
                         "alpha_ratio": pa.array(ar, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_TEXT_ALPHA = """
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                       / length(text), 6) END AS alpha_ratio
FROM documents
"""


def ann_topk(sf_dir: str):
    """Exact cosine top-5 for the first 3 embedding rows as queries."""
    from .ann import brute_force_topk
    emb = _read(sf_dir, "embeddings")
    head = emb.sort("vec_id").limit(3).take_all()
    Q = np.array([r["embedding"] for r in head], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in head]
    out = brute_force_topk(emb, Q, qids, k=5, concurrency=2)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": pc.cast(b.column("query_id"), pa.int64()),
            "vec_id": pc.cast(b.column("vec_id"), pa.int64()),
            "rank": pc.cast(b.column("rank"), pa.int64()),
            "cosine": pc.round(b.column("cosine"), ndigits=6,
                               round_mode="half_towards_infinity"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  ORDER BY vec_id LIMIT 3
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id) AS rank
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, rank, round(cosine, 6) AS cosine
FROM scored WHERE rank <= 5
"""


# ---------- round 2: boolean layer algebra queries ----------

def _union_a_rects(b: pa.Table) -> pa.Table:
    """Nation-derived A layer for layer_union: a 5x5 disjoint grid (pitch
    60x25, widths <= 18, heights <= 12) so the SQL oracle's pairwise
    inclusion-exclusion is exact (no A-A overlaps)."""
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    xmin = (k % 5) * 60.0 - 145.0 + 0.017
    ymin = (k // 5) * 25.0 - 60.0 + 0.017
    xmax = xmin + 12.0 + (k % 7)
    ymax = ymin + 8.0 + (k % 5)
    return pa.table({"a_id": pa.array([f"n{v:02d}" for v in k]),
                     "wkb": pa.array([wkb.box(a, c, d, e) for a, c, d, e
                                      in zip(xmin, ymin, xmax, ymax)],
                                     pa.binary())})


def _union_b_rects(b: pa.Table) -> pa.Table:
    """Region-derived B layer: tall disjoint columns (pitch 60, width
    <= 28) that each cross several A rows."""
    k = np.asarray(b.column("r_regionkey"), dtype=np.int64)
    xmin = k * 60.0 - 150.0 + 0.013
    ymin = np.full(k.shape, -55.0 + 0.013)
    xmax = xmin + 24.0 + k
    ymax = ymin + 95.0 + k
    return pa.table({"b_id": pa.array([f"r{v:02d}" for v in k]),
                     "wkb": pa.array([wkb.box(a, c, d, e) for a, c, d, e
                                      in zip(xmin, ymin, xmax, ymax)],
                                     pa.binary())})


def layer_union_rects(sf_dir: str):
    """OGRLayer::Union through the boolean overlay engine: A∩B pieces plus
    both remainders; absent-side key = -1.  Both layers are internally
    disjoint by construction, so the SQL oracle computes every remainder
    with one level of inclusion-exclusion."""
    from .layer_algebra import layer_union

    a = _read(sf_dir, "nation").map_batches(_union_a_rects, batch_format="pyarrow")
    bds = _read(sf_dir, "region").map_batches(_union_b_rects, batch_format="pyarrow")
    out = layer_union(a, bds)

    def finish(b: pa.Table) -> pa.Table:
        nk = [int(s[1:]) if s != "-" else -1 for s in b.column("a_id").to_pylist()]
        rk = [int(s[1:]) if s != "-" else -1 for s in b.column("b_id").to_pylist()]
        return pa.table({
            "n_nationkey": pa.array(nk, pa.int64()),
            "r_regionkey": pa.array(rk, pa.int64()),
            "piece_area": pc.round(b.column("piece_area"), ndigits=6,
                                   round_mode="half_towards_infinity"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_LAYER_UNION = """
WITH a AS (
  SELECT n_nationkey,
         (n_nationkey % 5) * 60.0 - 145.0 + 0.017 AS xmin,
         (n_nationkey // 5) * 25.0 - 60.0 + 0.017 AS ymin,
         (n_nationkey % 5) * 60.0 - 145.0 + 0.017 + 12.0 + (n_nationkey % 7) AS xmax,
         (n_nationkey // 5) * 25.0 - 60.0 + 0.017 + 8.0 + (n_nationkey % 5) AS ymax
  FROM nation
), b AS (
  SELECT r_regionkey,
         r_regionkey * 60.0 - 150.0 + 0.013 AS xmin,
         -55.0 + 0.013 AS ymin,
         r_regionkey * 60.0 - 150.0 + 0.013 + 24.0 + r_regionkey AS xmax,
         -55.0 + 0.013 + 95.0 + r_regionkey AS ymax
  FROM region
), inter AS (
  SELECT a.n_nationkey, b.r_regionkey,
         (least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin))
         * (least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin)) AS piece_area
  FROM a JOIN b
    ON least(a.xmax, b.xmax) > greatest(a.xmin, b.xmin)
   AND least(a.ymax, b.ymax) > greatest(a.ymin, b.ymin)
), a_rem AS (
  SELECT a.n_nationkey, -1 AS r_regionkey,
         (a.xmax - a.xmin) * (a.ymax - a.ymin)
         - coalesce((SELECT sum(i.piece_area) FROM inter i
                     WHERE i.n_nationkey = a.n_nationkey), 0) AS piece_area
  FROM a
), b_rem AS (
  SELECT -1 AS n_nationkey, b.r_regionkey,
         (b.xmax - b.xmin) * (b.ymax - b.ymin)
         - coalesce((SELECT sum(i.piece_area) FROM inter i
                     WHERE i.r_regionkey = b.r_regionkey), 0) AS piece_area
  FROM b
)
SELECT n_nationkey, r_regionkey, round(piece_area, 6) AS piece_area
FROM (SELECT * FROM inter UNION ALL
      SELECT * FROM a_rem WHERE piece_area > 1e-9 UNION ALL
      SELECT * FROM b_rem WHERE piece_area > 1e-9)
"""


def vector_dissolve_union_q(sf_dir: str):
    """Dissolve with TRUE boolean union: each nation's suppliers become a
    chain of 1x1 rects at 0.8 pitch (consecutive ranks overlap by 0.2), so
    the union area has the closed form 0.8*n + 0.2 — a collect-only
    dissolve would report n*1.0 and fail the oracle."""
    from ..stages.vector import dissolve_union

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def build_group(g: pa.Table) -> pa.Table:
        n = int(g.column("s_nationkey")[0].as_py())
        cnt = g.num_rows
        rows = [wkb.box(0.8 * rank, float(n), 0.8 * rank + 1.0, float(n) + 1.0)
                for rank in range(cnt)]
        return pa.table({"category": pa.array([n] * cnt, pa.int64()),
                         "wkb": pa.array(rows, pa.binary())})

    polys = sup.groupby("s_nationkey").map_groups(build_group,
                                                  batch_format="pyarrow")
    out = polys.groupby("category").map_groups(dissolve_union,
                                               batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "s_nationkey": pc.cast(b.column("category"), pa.int64()),
            "n_parts": pc.cast(b.column("n_parts"), pa.int64()),
            "union_area": pc.round(b.column("total_area"), ndigits=6,
                                   round_mode="half_towards_infinity"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_VECTOR_DISSOLVE_UNION = """
SELECT s_nationkey,
       1 AS n_parts,
       round(0.8 * count(*) + 0.2, 6) AS union_area
FROM supplier
GROUP BY s_nationkey
"""


def vector_makevalid_q(sf_dir: str):
    """MakeValid over part-derived bowtie rings: the self-intersecting ring
    [0,0]-[w,h]-[w,0]-[0,h] splits into two triangles of total area w*h/2."""
    from ..stages.vector import make_valid_full

    def bowties(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("p_partkey"), dtype=np.int64)
        w = 1.0 + (k % 5)
        h = 1.0 + (k % 3)
        out = []
        for i in range(len(k)):
            ring = np.array([[0.0, 0.0], [w[i], h[i]], [w[i], 0.0],
                             [0.0, h[i]], [0.0, 0.0]])
            out.append(wkb.dumps({"type": "Polygon", "rings": [ring]}))
        return pa.table({"p_partkey": pa.array(k, pa.int64()),
                         "wkb": pa.array(out, pa.binary())})

    parts = _read(sf_dir, "part", ["p_partkey"]) \
        .map_batches(lambda b: b.filter(pa.array(
            np.asarray(b.column("p_partkey"), dtype=np.int64) % 10 == 3)),
            batch_format="pyarrow")
    fixed = parts.map_batches(bowties, batch_format="pyarrow") \
                 .map_batches(make_valid_full, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        from ..core import geom as G
        nparts, areas = [], []
        for data in b.column("wkb").to_pylist():
            polys = wkb.as_polygons(wkb.loads(data))
            nparts.append(len(polys))
            areas.append(sum(G.polygon_area(r) for r in polys))
        return pa.table({
            "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
            "n_parts": pa.array(nparts, pa.int64()),
            "valid_area": pc.round(pa.array(areas, pa.float64()), ndigits=6,
                                   round_mode="half_towards_infinity"),
        })

    return fixed.map_batches(finish, batch_format="pyarrow")


SQL_VECTOR_MAKEVALID = """
SELECT p_partkey, 2 AS n_parts,
       round((1.0 + p_partkey % 5) * (1.0 + p_partkey % 3) / 2.0, 6) AS valid_area
FROM part WHERE p_partkey % 10 = 3
"""


# ---------- round 2: rows-only -> full-oracle conversions ----------
#
# The integer-derived-data trick of the geo_* family, extended to the
# raster/knn/dedup surfaces: every input (points, values, phashes, raw
# image pixels) is derived from table keys with arithmetic DuckDB can
# replay exactly, so the driver's value-hash compare covers the whole
# distributed path.

def _sup_points(b: pa.Table) -> pa.Table:
    k = np.asarray(b.column("s_suppkey"), dtype=np.int64)
    return pa.table({
        "point_id": pa.array([f"s{int(v):06d}" for v in k]),
        "skey": pa.array(k, pa.int64()),
        "x": pa.array(((k * 41) % 3600) / 10.0 - 180.0 + 0.03, pa.float64()),
        "y": pa.array(((k * 67) % 1700) / 10.0 - 85.0 + 0.03, pa.float64()),
    })


def _cust_ref_table(sf_dir: str) -> pa.Table:
    """Customer-derived reference points + values, ORDERED by custkey so the
    kernel's index tie-break equals order-by-custkey in SQL."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    tabs = [b for b in cust.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tabs)
    k = np.asarray(t.column("c_custkey"), dtype=np.int64)
    order = np.argsort(k)
    k = k[order]
    return pa.table({
        "ckey": pa.array(k, pa.int64()),
        "x": pa.array(((k * 37) % 3600) / 10.0 - 180.0 + 0.05, pa.float64()),
        "y": pa.array(((k * 91) % 1700) / 10.0 - 85.0 + 0.05, pa.float64()),
        "value": pa.array((k % 100) / 10.0, pa.float64()),
    })


def knn_idw_q(sf_dir: str):
    """gdal_grid invdistnn over table-derived points: IDW of the 12 nearest
    customer values at each supplier node."""
    from .knn import idw_interpolate
    ref = _cust_ref_table(sf_dir)
    sup = _read(sf_dir, "supplier", ["s_suppkey"]) \
        .map_batches(_sup_points, batch_format="pyarrow")
    out = idw_interpolate(sup, np.column_stack([np.asarray(ref.column("x")),
                                                np.asarray(ref.column("y"))]),
                          np.asarray(ref.column("value")), power=2.0,
                          smoothing=0.0, max_points=12, concurrency=2)

    def finish(b: pa.Table) -> pa.Table:
        sk = [int(s[1:]) for s in b.column("point_id").to_pylist()]
        return pa.table({"s_suppkey": pa.array(sk, pa.int64()),
                         "idw_value": pc.round(b.column("idw_value"), ndigits=6,
                                               round_mode="half_towards_infinity")})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_KNN_IDW = """
WITH sup AS (
  SELECT s_suppkey,
         ((s_suppkey * 41) % 3600) / 10.0 - 180.0 + 0.03 AS x,
         ((s_suppkey * 67) % 1700) / 10.0 - 85.0 + 0.03 AS y
  FROM supplier
), cust AS (
  SELECT c_custkey,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS x,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS y,
         (c_custkey % 100) / 10.0 AS v
  FROM customer
), ranked AS (
  SELECT s_suppkey, v,
         power(sqrt((sup.x - cust.x) * (sup.x - cust.x)
                    + (sup.y - cust.y) * (sup.y - cust.y)), 2.0) AS d2,
         row_number() OVER (PARTITION BY s_suppkey
             ORDER BY (sup.x - cust.x) * (sup.x - cust.x)
                      + (sup.y - cust.y) * (sup.y - cust.y), c_custkey) AS rk
  FROM sup CROSS JOIN cust
)
SELECT s_suppkey, round(sum(v / d2) / sum(1.0 / d2), 6) AS idw_value
FROM ranked WHERE rk <= 12 GROUP BY s_suppkey
"""


def grid_metrics_q(sf_dir: str):
    """gdal_grid data-metrics + moving-average + nearest over table-derived
    points (radius 12°); empty neighborhoods emit -1 sentinels."""
    from .knn import grid_metrics
    ref = _cust_ref_table(sf_dir)
    sup = _read(sf_dir, "supplier", ["s_suppkey"]) \
        .map_batches(_sup_points, batch_format="pyarrow")
    out = grid_metrics(sup, np.column_stack([np.asarray(ref.column("x")),
                                             np.asarray(ref.column("y"))]),
                       np.asarray(ref.column("value")), radius=12.0,
                       concurrency=2)

    def finish(b: pa.Table) -> pa.Table:
        sk = [int(s[1:]) for s in b.column("point_id").to_pylist()]
        cnt = np.nan_to_num(np.asarray(b.column("count"), dtype=np.float64),
                            nan=0.0).astype(np.int64)
        cols = {"s_suppkey": pa.array(sk, pa.int64()),
                "n_within": pa.array(cnt, pa.int64())}
        for src, dst in (("minimum", "vmin"), ("maximum", "vmax"),
                         ("range", "vrange"), ("average", "vavg"),
                         ("average_distance", "avg_dist"), ("nearest", "nearest_v")):
            v = np.nan_to_num(np.asarray(b.column(src), dtype=np.float64),
                              nan=-1.0)
            cols[dst] = pc.round(pa.array(v, pa.float64()), ndigits=6,
                                 round_mode="half_towards_infinity")
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


SQL_GRID_METRICS = """
WITH sup AS (
  SELECT s_suppkey,
         ((s_suppkey * 41) % 3600) / 10.0 - 180.0 + 0.03 AS x,
         ((s_suppkey * 67) % 1700) / 10.0 - 85.0 + 0.03 AS y
  FROM supplier
), cust AS (
  SELECT c_custkey,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS x,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS y,
         (c_custkey % 100) / 10.0 AS v
  FROM customer
), pairs AS (
  SELECT s_suppkey, c_custkey, v,
         sqrt((sup.x - cust.x) * (sup.x - cust.x)
              + (sup.y - cust.y) * (sup.y - cust.y)) AS d
  FROM sup CROSS JOIN cust
), near AS (
  SELECT s_suppkey, v AS nearest_v,
         row_number() OVER (PARTITION BY s_suppkey ORDER BY d, c_custkey) AS rk
  FROM pairs
), agg AS (
  SELECT s_suppkey,
         count(*) FILTER (WHERE d <= 12.0) AS n_within,
         min(v) FILTER (WHERE d <= 12.0) AS vmin,
         max(v) FILTER (WHERE d <= 12.0) AS vmax,
         max(v) FILTER (WHERE d <= 12.0) - min(v) FILTER (WHERE d <= 12.0) AS vrange,
         sum(v) FILTER (WHERE d <= 12.0) / count(*) FILTER (WHERE d <= 12.0) AS vavg,
         sum(d) FILTER (WHERE d <= 12.0) / count(*) FILTER (WHERE d <= 12.0) AS avg_dist
  FROM pairs GROUP BY s_suppkey
)
SELECT agg.s_suppkey, n_within,
       round(coalesce(vmin, -1.0), 6) AS vmin,
       round(coalesce(vmax, -1.0), 6) AS vmax,
       round(coalesce(vrange, -1.0), 6) AS vrange,
       round(coalesce(vavg, -1.0), 6) AS vavg,
       round(coalesce(avg_dist, -1.0), 6) AS avg_dist,
       round(near.nearest_v, 6) AS nearest_v
FROM agg JOIN near ON agg.s_suppkey = near.s_suppkey AND near.rk = 1
"""


def knn_bigbig_q(sf_dir: str):
    """BIG×BIG radius kNN (cell join + 3×3 halo) over table-derived points:
    3 nearest customers within 4° of each supplier."""
    from .knn import knn_radius_cell_join
    sup = _read(sf_dir, "supplier", ["s_suppkey"]) \
        .map_batches(_sup_points, batch_format="pyarrow")

    def cust_pts(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("c_custkey"), dtype=np.int64)
        return pa.table({
            "point_id": pa.array([str(int(v)) for v in k]),
            "x": pa.array(((k * 37) % 3600) / 10.0 - 180.0 + 0.05, pa.float64()),
            "y": pa.array(((k * 91) % 1700) / 10.0 - 85.0 + 0.05, pa.float64()),
        })

    cust = _read(sf_dir, "customer", ["c_custkey"]) \
        .map_batches(cust_pts, batch_format="pyarrow")
    out = knn_radius_cell_join(sup, cust, radius=4.0, k=3)

    def finish(b: pa.Table) -> pa.Table:
        sk = [int(s[1:]) for s in b.column("point_id").to_pylist()]
        return pa.table({
            "s_suppkey": pa.array(sk, pa.int64()),
            "c_custkey": pa.array([int(v) for v in
                                   b.column("neighbor_id").to_pylist()],
                                  pa.int64()),
            "rank": pc.cast(b.column("rank"), pa.int64()),
            "dist": pc.round(b.column("distance"), ndigits=6,
                             round_mode="half_towards_infinity")})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_KNN_BIGBIG = """
WITH sup AS (
  SELECT s_suppkey,
         ((s_suppkey * 41) % 3600) / 10.0 - 180.0 + 0.03 AS x,
         ((s_suppkey * 67) % 1700) / 10.0 - 85.0 + 0.03 AS y
  FROM supplier
), cust AS (
  SELECT c_custkey,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS x,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS y
  FROM customer
), ranked AS (
  SELECT s_suppkey, c_custkey,
         sqrt((sup.x - cust.x) * (sup.x - cust.x)
              + (sup.y - cust.y) * (sup.y - cust.y)) AS d,
         row_number() OVER (PARTITION BY s_suppkey
             ORDER BY sqrt((sup.x - cust.x) * (sup.x - cust.x)
                           + (sup.y - cust.y) * (sup.y - cust.y)),
                      CAST(c_custkey AS VARCHAR)) AS rank
  FROM sup CROSS JOIN cust
)
SELECT s_suppkey, c_custkey, rank, round(d, 6) AS dist
FROM ranked WHERE rank <= 3 AND d <= 4.0
"""


def dedup_phash_q(sf_dir: str):
    """phash hamming near-dup over customer-derived 62-bit hashes; every
    custkey divisible by 97 carries a 1-bit-flipped copy of the previous
    key's hash, so the expected pair set is exact integer arithmetic that
    DuckDB replays with xor + bit_count."""
    from .catalog import phash_neardup_pairs

    def derive(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("c_custkey"), dtype=np.int64)
        h1 = (k * 48271) % 2147483647
        h2 = (k * 16807) % 2147483647
        ph = h1 + (h2 << 31)
        km1 = k - 1
        p1 = (km1 * 48271) % 2147483647
        p2 = (km1 * 16807) % 2147483647
        planted = (p1 + (p2 << 31)) ^ (np.int64(1) << (k % 60))
        ph = np.where((k % 97 == 0) & (k > 0), planted, ph)
        return pa.table({
            "image_id": pa.array([f"{int(v):08d}" for v in k]),
            "phash": pa.array(ph, pa.int64()),
        })

    imgs = _read(sf_dir, "customer", ["c_custkey"]) \
        .map_batches(derive, batch_format="pyarrow")
    out = phash_neardup_pairs(imgs, max_hamming=3)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "key_a": pa.array([int(s) for s in b.column("id_a").to_pylist()],
                              pa.int64()),
            "key_b": pa.array([int(s) for s in b.column("id_b").to_pylist()],
                              pa.int64()),
            "hamming": pc.cast(b.column("hamming"), pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_DEDUP_PHASH = """
WITH ph AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 97 = 0 AND c_custkey > 0 THEN
           xor((((c_custkey - 1) * 48271) % 2147483647)
               + ((((c_custkey - 1) * 16807) % 2147483647) << 31),
               1::BIGINT << (c_custkey % 60))
         ELSE ((c_custkey * 48271) % 2147483647)
              + (((c_custkey * 16807) % 2147483647) << 31) END AS phash
  FROM customer
)
SELECT a.k AS key_a, b.k AS key_b,
       bit_count(xor(a.phash, b.phash)) AS hamming
FROM ph a JOIN ph b ON a.k < b.k
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""


def _derived_images(b: pa.Table) -> pa.Table:
    """Nation-derived 32×32 single-band raw images whose pixel values are
    pure integer arithmetic — v(k) = (n*31 + k) % (97 + n%13) — so DuckDB
    replays the raster content with generate_series.  Footprints are
    disjoint 0.32°×0.32° boxes on a 10° grid."""
    from ..core import codecs as CD
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts, gts = [], [], []
    for n in k:
        n = int(n)
        v = (n * 31 + np.arange(1024, dtype=np.int64)) % (97 + n % 13)
        img = v.astype(np.uint8).reshape(32, 32)
        ids.append(f"img{n:02d}")
        bts.append(CD.encode_raw(img))
        x0 = (n % 5) * 10.0 + 0.05
        y0 = (n // 5) * 10.0 + 0.05
        gts.append([x0, 0.01, 0.0, y0, 0.0, -0.01])
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(np.full(len(ids), 32, np.int32)),
        "h": pa.array(np.full(len(ids), 32, np.int32)),
        "fmt": pa.array(["raw"] * len(ids)),
        "caption": pa.array([""] * len(ids)),
        "geotransform": pa.array(gts, pa.list_(pa.float64(), 6)),
        "crs": pa.array(["EPSG:4326"] * len(ids)),
        "nodata": pa.nulls(len(ids), pa.float64()),
    })


_SQL_DERIVED_PIXELS = """
  SELECT n_nationkey AS n, g.k AS k,
         (n_nationkey * 31 + g.k) % (97 + n_nationkey % 13) AS v
  FROM nation, generate_series(0, 1023) g(k)
"""


def raster_band_stats_q(sf_dir: str):
    """Global band statistics (partial+final ComputeStatistics shape) over
    nation-derived raw rasters."""
    import ray.data

    from .raster_ops import band_statistics
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = band_statistics(imgs)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_pixels": pc.cast(b.column("n_pixels"), pa.int64()),
            "n_images": pc.cast(b.column("n_images"), pa.int64()),
            "vmin": pc.cast(b.column("vmin"), pa.float64()),
            "vmax": pc.cast(b.column("vmax"), pa.float64()),
            "mean": pc.round(b.column("mean"), ndigits=6,
                             round_mode="half_towards_infinity"),
            "std": pc.round(b.column("std"), ndigits=6,
                            round_mode="half_towards_infinity"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_BAND_STATS = f"""
WITH px AS ({_SQL_DERIVED_PIXELS})
SELECT count(*) AS n_pixels,
       count(DISTINCT n) AS n_images,
       CAST(min(v) AS DOUBLE) AS vmin,
       CAST(max(v) AS DOUBLE) AS vmax,
       round(sum(v) * 1.0 / count(*), 6) AS mean,
       round(sqrt(sum(v * v) * 1.0 / count(*)
                  - (sum(v) * 1.0 / count(*)) * (sum(v) * 1.0 / count(*))), 6) AS std
FROM px
"""


def raster_tindex_q(sf_dir: str):
    """gdaltindex over the derived catalog: per-image lon/lat footprint
    bbox, closed-form from the geotransform."""
    from .catalog import build_tile_index
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = build_tile_index(imgs)

    def finish(b: pa.Table) -> pa.Table:
        nk = [int(s[3:]) for s in b.column("image_id").to_pylist()]
        cols = {"n_nationkey": pa.array(nk, pa.int64())}
        for c in ("minx", "miny", "maxx", "maxy"):
            cols[c] = pc.round(b.column(c), ndigits=6,
                               round_mode="half_towards_infinity")
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_TINDEX = """
SELECT n_nationkey,
       round((n_nationkey % 5) * 10.0 + 0.05, 6) AS minx,
       round((n_nationkey // 5) * 10.0 + 0.05 - 0.32, 6) AS miny,
       round((n_nationkey % 5) * 10.0 + 0.05 + 0.32, 6) AS maxx,
       round((n_nationkey // 5) * 10.0 + 0.05, 6) AS maxy
FROM nation
"""


def raster_as_features_q(sf_dir: str):
    """gdal2xyz / as-features with step=8 over the derived rasters: every
    sampled pixel's (lon, lat, value) is integer arithmetic."""
    from .raster_ops import as_features
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = imgs.map_batches(lambda b: as_features(b, step=8),
                           batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        nk = [int(s[3:]) for s in b.column("image_id").to_pylist()]
        # coordinates are exact milli-degrees by construction — snap the
        # float-accumulated gt values back to integer/1000 so the double is
        # bit-identical to DuckDB's single-division arithmetic
        x = np.round(np.asarray(b.column("x"), dtype=np.float64) * 1000.0) / 1000.0
        y = np.round(np.asarray(b.column("y"), dtype=np.float64) * 1000.0) / 1000.0
        return pa.table({
            "n_nationkey": pa.array(nk, pa.int64()),
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64()),
            "value": pc.cast(b.column("value"), pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_AS_FEATURES = """
WITH cells AS (
  SELECT n_nationkey AS n, r.i AS i, c.j AS j
  FROM nation, generate_series(0, 31, 8) r(i), generate_series(0, 31, 8) c(j)
)
SELECT n AS n_nationkey,
       ((n % 5) * 10000 + j * 10 + 55) / 1000.0 AS x,
       ((n // 5) * 10000 + 50 - i * 10 - 5) / 1000.0 AS y,
       CAST((n * 31 + i * 32 + j) % (97 + n % 13) AS DOUBLE) AS value
FROM cells
"""


def raster_pixel_info_q(sf_dir: str):
    """gdallocationinfo / InterpolateAtPoint: supplier-derived points at
    exact pixel centers of the derived rasters — bilinear at a center is
    the pixel value itself, so the oracle is closed-form."""
    from .raster_ops import pixel_info
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    sup = _read(sf_dir, "supplier", ["s_suppkey"])
    st = pa.concat_tables(list(sup.iter_batches(batch_format="pyarrow")))
    k = np.asarray(st.column("s_suppkey"), dtype=np.int64)
    n = k % 25
    j = k % 32
    i = (k * 7) % 32
    lon = (n % 5) * 10.0 + 0.05 + (j + 0.5) * 0.01
    lat = (n // 5) * 10.0 + 0.05 - (i + 0.5) * 0.01
    out = pixel_info(imgs, lon=lon, lat=lat,
                     point_ids=[f"{int(v):06d}" for v in k], concurrency=2)

    def finish(b: pa.Table) -> pa.Table:
        sk = [int(s) for s in b.column("point_id").to_pylist()]
        nk = [int(s[3:]) for s in b.column("image_id").to_pylist()]
        return pa.table({
            "s_suppkey": pa.array(sk, pa.int64()),
            "n_nationkey": pa.array(nk, pa.int64()),
            "value": pc.round(b.column("value"), ndigits=6,
                              round_mode="half_towards_infinity"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_PIXEL_INFO = """
SELECT s_suppkey,
       s_suppkey % 25 AS n_nationkey,
       round(CAST(((s_suppkey % 25) * 31 + ((s_suppkey * 7) % 32) * 32
                   + (s_suppkey % 32)) % (97 + (s_suppkey % 25) % 13)
                  AS DOUBLE), 6) AS value
FROM supplier
"""


def _derived_dems(b: pa.Table) -> pa.Table:
    """Nation-derived FLOAT32 plane DEMs (z = 100 + gx*j + gy*i) — the
    multi-dtype raster path (GRW2 payloads; gcore/gdal.h type lattice).
    Horn derivatives of a plane are constant on the interior, so hillshade
    and aspect have closed forms DuckDB replays with its own trig."""
    from ..core import codecs as CD
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts, gts = [], [], []
    jj, ii = np.meshgrid(np.arange(16, dtype=np.float64),
                         np.arange(16, dtype=np.float64))
    for n in k:
        n = int(n)
        gx = (n % 7 - 3) * 0.5
        gy = (n % 5 - 2) * 0.3
        z = (100.0 + gx * jj + gy * ii).astype(np.float32)
        ids.append(f"dem{n:02d}")
        bts.append(CD.encode_raw(z))
        gts.append([float((n % 5) * 100), 1.0, 0.0,
                    float((n // 5) * 100), 0.0, -1.0])
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(np.full(len(ids), 16, np.int32)),
        "h": pa.array(np.full(len(ids), 16, np.int32)),
        "fmt": pa.array(["raw"] * len(ids)),
        "caption": pa.array([""] * len(ids)),
        "geotransform": pa.array(gts, pa.list_(pa.float64(), 6)),
        "crs": pa.array(["EPSG:4326"] * len(ids)),
        "nodata": pa.nulls(len(ids), pa.float64()),
    })


def _center_pixel(b: pa.Table, id_prefix: str, col: str) -> pa.Table:
    from ..core import codecs as CD
    nk, vals = [], []
    for i in range(b.num_rows):
        img = CD.decode(b.column("bytes")[i].as_py(), b.column("fmt")[i].as_py())
        band = img if img.ndim == 2 else img[:, :, 0]
        nk.append(int(b.column("image_id")[i].as_py()[len(id_prefix):]))
        vals.append(int(band[8, 8]))
    return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                     col: pa.array(vals, pa.int64())})


def raster_hillshade_q(sf_dir: str):
    """gdaldem hillshade over float32 plane DEMs; interior shade value is a
    closed-form trig expression of the plane gradient."""
    from ..stages.raster import hillshade
    dems = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_dems, batch_format="pyarrow")
    out = dems.map_batches(hillshade, batch_format="pyarrow")
    return out.map_batches(lambda b: _center_pixel(b, "dem", "shade"),
                           batch_format="pyarrow")


SQL_RASTER_HILLSHADE = """
WITH g AS (
  SELECT n_nationkey,
         (n_nationkey % 7 - 3) * 0.5 AS gx,
         (n_nationkey % 5 - 2) * 0.3 AS gy
  FROM nation
), t AS (
  SELECT n_nationkey,
         atan(sqrt(gx * gx + gy * gy)) AS slope,
         atan2(gy, -gx) AS aspect
  FROM g
)
SELECT n_nationkey,
       CAST(floor(least(greatest(
         1.0 + 254.0 * (sin(radians(45.0)) * cos(slope)
                        + cos(radians(45.0)) * sin(slope)
                          * cos(radians(315.0) - pi() / 2.0 - aspect)),
         1.0), 255.0)) AS BIGINT) AS shade
FROM t
"""


def _derived_dems_png16(b: pa.Table) -> pa.Table:
    """Nation-derived UINT16 plane DEMs carried as 16-BIT PNG payloads —
    the DEM-PNG case the reference reads via frmts/png (bit depth 16).
    Integer plane gradients keep uint16 exact, so the PNG roundtrip is
    lossless and the hillshade closed form is the same plane recipe."""
    from ..core import codecs as CD
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts, gts = [], [], []
    jj, ii = np.meshgrid(np.arange(16, dtype=np.int64),
                         np.arange(16, dtype=np.int64))
    for n in k:
        n = int(n)
        gx = (n % 7 - 3) * 2
        gy = (n % 5 - 2) * 3
        z = (1000 + gx * jj + gy * ii).astype(np.uint16)
        ids.append(f"dem{n:02d}")
        bts.append(CD.encode_png(z))
        gts.append([float((n % 5) * 100), 1.0, 0.0,
                    float((n // 5) * 100), 0.0, -1.0])
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(np.full(len(ids), 16, np.int32)),
        "h": pa.array(np.full(len(ids), 16, np.int32)),
        "fmt": pa.array(["png"] * len(ids)),
        "caption": pa.array([""] * len(ids)),
        "geotransform": pa.array(gts, pa.list_(pa.float64(), 6)),
        "crs": pa.array(["EPSG:4326"] * len(ids)),
        "nodata": pa.nulls(len(ids), pa.float64()),
    })


def raster_hillshade_png16_q(sf_dir: str):
    """gdaldem hillshade over 16-BIT PNG DEMs (decode path bit depth 16);
    same interior closed form as raster_hillshade with integer gradients."""
    from ..stages.raster import hillshade
    dems = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_dems_png16, batch_format="pyarrow")
    out = dems.map_batches(hillshade, batch_format="pyarrow")
    return out.map_batches(lambda b: _center_pixel(b, "dem", "shade"),
                           batch_format="pyarrow")


SQL_RASTER_HILLSHADE_PNG16 = """
WITH g AS (
  SELECT n_nationkey,
         (n_nationkey % 7 - 3) * 2.0 AS gx,
         (n_nationkey % 5 - 2) * 3.0 AS gy
  FROM nation
), t AS (
  SELECT n_nationkey,
         atan(sqrt(gx * gx + gy * gy)) AS slope,
         atan2(gy, -gx) AS aspect
  FROM g
)
SELECT n_nationkey,
       CAST(floor(least(greatest(
         1.0 + 254.0 * (sin(radians(45.0)) * cos(slope)
                        + cos(radians(45.0)) * sin(slope)
                          * cos(radians(315.0) - pi() / 2.0 - aspect)),
         1.0), 255.0)) AS BIGINT) AS shade
FROM t
"""


def raster_aspect_q(sf_dir: str):
    """gdaldem aspect over the same plane DEMs (output scaled deg/2 to fit
    uint8); flat cells (zero gradient) report 0."""
    from ..stages.dem import aspect
    dems = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_dems, batch_format="pyarrow")
    out = dems.map_batches(aspect, batch_format="pyarrow")
    return out.map_batches(lambda b: _center_pixel(b, "dem", "aspect_half"),
                           batch_format="pyarrow")


SQL_RASTER_ASPECT = """
WITH g AS (
  SELECT n_nationkey,
         (n_nationkey % 7 - 3) * 0.5 AS gx,
         (n_nationkey % 5 - 2) * 0.3 AS gy
  FROM nation
)
SELECT n_nationkey,
       CASE WHEN gx = 0 AND gy = 0 THEN 0
       ELSE CAST(floor(least(greatest(
         ((90.0 - degrees(atan2(gy, -gx))) % 360.0 + 360.0) % 360.0 / 2.0,
         0.0), 255.0)) AS BIGINT) END AS aspect_half
FROM g
"""


def geo_predicates_q(sf_dir: str):
    """Full binary predicate matrix (ogrgeometry.cpp:6006-6406 Touches /
    Overlaps / Disjoint / Equals + contains/within) over nation×region
    derived rects: the engine classifies every pair with the REAL geometry
    predicates (boundary tests + overlay interior area); the oracle
    replays the relations with integer rect arithmetic."""
    from ..core import geom as G

    def b_rects_tbl(b: pa.Table):
        k = np.asarray(b.column("r_regionkey"), dtype=np.int64)
        rows = []
        for r in k:
            r = int(r)
            if r == 1:
                bb = (32.0, 32.0, 40.0, 38.0)     # strictly inside A(6)
            elif r == 2:
                bb = (60.0, 60.0, 73.0, 70.0)     # exactly equals A(12)
            else:
                bb = (10.0 + r, r * 20.0, 25.0 + 2 * r, r * 20.0 + 9.0 + 2 * r)
            rows.append((r, bb))
        return rows

    bt = pa.concat_tables(list(_read(sf_dir, "region", ["r_regionkey"])
                               .iter_batches(batch_format="pyarrow")))
    b_list = b_rects_tbl(bt)
    import ray
    b_ref = ray.put([(r, wkb.as_polygons(wkb.loads(wkb.box(*bb)))[0])
                     for r, bb in b_list])

    def relate(batch: pa.Table) -> pa.Table:
        bl = ray.get(b_ref)
        k = np.asarray(batch.column("n_nationkey"), dtype=np.int64)
        nk, rk, rel = [], [], []
        for n in k:
            n = int(n)
            xmin = (n % 5) * 30.0
            ymin = (n // 5) * 30.0
            a = wkb.as_polygons(wkb.loads(wkb.box(
                xmin, ymin, xmin + 10.0 + (n % 9), ymin + 10.0 + (n % 6))))[0]
            for r, brings in bl:
                nk.append(n)
                rk.append(r)
                rel.append(G.polygon_relate(a, brings))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "r_regionkey": pa.array(rk, pa.int64()),
                         "relation": pa.array(rel, pa.string())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(relate, batch_format="pyarrow")


SQL_GEO_PREDICATES = """
WITH a AS (
  SELECT n_nationkey AS n,
         (n_nationkey % 5) * 30.0 AS xmin, (n_nationkey // 5) * 30.0 AS ymin,
         (n_nationkey % 5) * 30.0 + 10.0 + (n_nationkey % 9) AS xmax,
         (n_nationkey // 5) * 30.0 + 10.0 + (n_nationkey % 6) AS ymax
  FROM nation
), b AS (
  SELECT r_regionkey AS r,
         CASE r_regionkey WHEN 1 THEN 32.0 WHEN 2 THEN 60.0
              ELSE 10.0 + r_regionkey END AS xmin,
         CASE r_regionkey WHEN 1 THEN 32.0 WHEN 2 THEN 60.0
              ELSE r_regionkey * 20.0 END AS ymin,
         CASE r_regionkey WHEN 1 THEN 40.0 WHEN 2 THEN 73.0
              ELSE 25.0 + 2 * r_regionkey END AS xmax,
         CASE r_regionkey WHEN 1 THEN 38.0 WHEN 2 THEN 70.0
              ELSE r_regionkey * 20.0 + 9.0 + 2 * r_regionkey END AS ymax
  FROM region
), pairs AS (
  SELECT n, r,
         least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin) AS iw,
         least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin) AS ih,
         (a.xmax - a.xmin) * (a.ymax - a.ymin) AS aa,
         (b.xmax - b.xmin) * (b.ymax - b.ymin) AS ab
  FROM a CROSS JOIN b
)
SELECT n AS n_nationkey, r AS r_regionkey,
       CASE WHEN iw < 0 OR ih < 0 THEN 'disjoint'
            WHEN iw = 0 OR ih = 0 THEN 'touches'
            WHEN iw * ih = aa AND iw * ih = ab THEN 'equals'
            WHEN iw * ih = ab THEN 'contains'
            WHEN iw * ih = aa THEN 'within'
            ELSE 'overlaps' END AS relation
FROM pairs
"""


def raster_gcp_warp_q(sf_dir: str):
    """Warp-by-GCP for ungeoreferenced imagery: the derived rasters carry a
    3×3 GCP grid sampled from their (withheld) affine, the order-1
    polynomial fit reproduces it exactly, and the identity-grid warp makes
    every output pixel equal its source pixel — closed-form oracle."""
    from ..core.gcp import gcps_from_affine
    from ..stages.warp import GcpWarpStage

    def strip_gt(b: pa.Table) -> pa.Table:
        gts = b.column("geotransform").to_pylist()
        gcps = [gcps_from_affine(tuple(g), 32, 32, n=3).ravel().tolist()
                for g in gts]
        return pa.table({
            "image_id": b.column("image_id"),
            "bytes": b.column("bytes"),
            "fmt": b.column("fmt"),
            "gcps": pa.array(gcps, pa.list_(pa.float64())),
        })

    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow") \
        .map_batches(strip_gt, batch_format="pyarrow")
    from ..stages.taskmode import stage_fn
    out = imgs.map_batches(
        stage_fn(GcpWarpStage, {"order": 1, "method": "bilinear"}),
        batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        from ..core import codecs as CD
        nk, vals, x0s = [], [], []
        for i in range(b.num_rows):
            img = CD.decode(b.column("bytes")[i].as_py(), b.column("fmt")[i].as_py())
            band = img if img.ndim == 2 else img[:, :, 0]
            nk.append(int(b.column("image_id")[i].as_py()[3:]))
            vals.append(int(band[8, 8]))
            gt = b.column("geotransform")[i].as_py()
            x0s.append(float(np.round(gt[0] * 1000.0) / 1000.0))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "out_w": pc.cast(b.column("w"), pa.int64()),
                         "out_h": pc.cast(b.column("h"), pa.int64()),
                         "x0": pa.array(x0s, pa.float64()),
                         "center_v": pa.array(vals, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_GCP_WARP = """
SELECT n_nationkey, 32 AS out_w, 32 AS out_h,
       ((n_nationkey % 5) * 10000 + 50) / 1000.0 AS x0,
       (n_nationkey * 31 + 8 * 32 + 8) % (97 + n_nationkey % 13) AS center_v
FROM nation
"""


def geo_polygonize_stitched_q(sf_dir: str):
    """Cross-tile polygonize with a FULL oracle: nation-derived 64×64
    rasters of diagonal stripes v = ((i+j+7n)//16) % 4 are split into 32px
    sub-windows, polygonized per tile, and stitched back through the
    boolean-union shuffle; every stripe is one 4-connected component whose
    pixel count DuckDB recomputes from generate_series."""
    import ray.data

    from ..core import codecs as CD
    from .polygonize import polygonize_stitched

    def build(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ids, bts, gts = [], [], []
        jj, ii = np.meshgrid(np.arange(64), np.arange(64))
        for n in k:
            n = int(n)
            band = (((ii + jj + 7 * n) // 16) % 4).astype(np.uint8)
            ids.append(f"str{n:02d}")
            bts.append(CD.encode_raw(band))
            gts.append([float(n), 0.01, 0.0, 0.0, 0.0, -0.01])
        m = len(ids)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bts, pa.binary()),
            "w": pa.array(np.full(m, 64, np.int32)),
            "h": pa.array(np.full(m, 64, np.int32)),
            "fmt": pa.array(["raw"] * m),
            "caption": pa.array([""] * m),
            "geotransform": pa.array(gts, pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"] * m),
            "nodata": pa.nulls(m, pa.float64()),
        })

    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(build, batch_format="pyarrow")
    out = polygonize_stitched(imgs, max_pixels=1024, tile_px=32)

    def finish(b: pa.Table) -> pa.Table:
        nk = [int(s[3:]) for s in b.column("image_id").to_pylist()]
        return pa.table({
            "n_nationkey": pa.array(nk, pa.int64()),
            "value": pc.cast(b.column("value"), pa.int64()),
            "pix_count": pc.cast(b.column("pix_count"), pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_GEO_POLYGONIZE_STITCHED = """
WITH px AS (
  SELECT n_nationkey AS n,
         (r.i + c.j + 7 * n_nationkey) // 16 AS stripe
  FROM nation, generate_series(0, 63) r(i), generate_series(0, 63) c(j)
)
SELECT n AS n_nationkey, stripe % 4 AS value, count(*) AS pix_count
FROM px GROUP BY n, stripe
"""


SQL_TEXT_LANGID = r"""
WITH toks AS (
  SELECT doc_id,
         [lower(trim(x, '.,;:!?''"()-')) for x in
          string_split_regex(text, '\s+') if len(x) > 0] AS tk
  FROM documents
), votes AS (
  SELECT doc_id,
         len(list_filter(tk, t -> list_contains(
           ['the','and','of','to','in','is','that','it','for','was','with','on','as'], t))) AS en_c,
         len(list_filter(tk, t -> list_contains(
           ['el','la','de','que','y','en','un','una','los','las','por','con','para'], t))) AS es_c,
         len(list_filter(tk, t -> list_contains(
           ['le','la','de','et','les','des','un','une','du','est','pour','que','dans'], t))) AS fr_c,
         len(list_filter(tk, t -> list_contains(
           ['der','die','das','und','ist','von','den','mit','für','auf','ein','eine','nicht'], t))) AS de_c
  FROM toks
)
SELECT doc_id,
       CASE WHEN greatest(en_c, es_c, fr_c, de_c) = 0 THEN 'und'
            WHEN (en_c = greatest(en_c, es_c, fr_c, de_c))::int
               + (es_c = greatest(en_c, es_c, fr_c, de_c))::int
               + (fr_c = greatest(en_c, es_c, fr_c, de_c))::int
               + (de_c = greatest(en_c, es_c, fr_c, de_c))::int > 1 THEN 'und'
            WHEN en_c = greatest(en_c, es_c, fr_c, de_c) THEN 'en'
            WHEN es_c = greatest(en_c, es_c, fr_c, de_c) THEN 'es'
            WHEN fr_c = greatest(en_c, es_c, fr_c, de_c) THEN 'fr'
            ELSE 'de' END AS lang_pred
FROM votes
"""


SQL_TEXT_QUALITY = r"""
WITH f AS (
  SELECT doc_id, text,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '\p{L}', '', 'g')) AS n_alpha,
         length(text) - length(regexp_replace(text, '[.,;:!?''"()\-]', '', 'g')) AS n_punct,
         regexp_extract_all(text, '[A-Za-z]+') AS words,
         [lower(trim(x, '.,;:!?''"()-')) for x in
          string_split_regex(text, '\s+') if len(x) > 0] AS tk
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(words) > 0 THEN
           list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words)
         ELSE 0.0 END AS mwl,
         CASE WHEN n > 0 THEN n_alpha * 1.0 / n ELSE 0.0 END AS ar,
         CASE WHEN n > 0 THEN n_punct * 1.0 / n ELSE 0.0 END AS pr,
         CASE WHEN len(tk) > 0 THEN
           len(list_filter(tk, t -> list_contains(
             ['the','and','of','to','in','is','that','it','for','was','with','on','as'], t)))
           * 1.0 / len(tk)
         ELSE 0.0 END AS sr
  FROM f
)
SELECT doc_id,
       round(mwl, 6) AS mean_word_len,
       round(ar, 6) AS alpha_ratio,
       round(pr, 6) AS punct_ratio,
       round(sr, 6) AS stopword_ratio,
       round((CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN ar >= 0.6 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN sr >= 0.05 THEN 0.3 ELSE 0.0 END), 6) AS quality
FROM g
"""


def geo_rasterize_grid_q(sf_dir: str):
    """gdal_rasterize (pixel-center rule) with a FULL oracle: the disjoint
    nation grid rects burn z=5 tiles; per-tile burned-pixel counts factor
    into closed-form column x row center counts that DuckDB recomputes
    from the web-mercator pixel formulas."""
    import ray.data

    from .rasterize import rasterize
    rects = _read(sf_dir, "nation").map_batches(_union_a_rects,
                                                batch_format="pyarrow") \
        .map_batches(lambda b: pa.table({"poly_id": b.column("a_id"),
                                         "wkb": b.column("wkb")}),
                     batch_format="pyarrow")
    out = rasterize(rects, zoom=5, burn_value=1.0, merge_alg="add",
                    id_col="poly_id")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pc.cast(b.column("x"), pa.int64()),
            "y": pc.cast(b.column("y"), pa.int64()),
            "burned_px": pc.cast(b.column("burned_px"), pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_GEO_RASTERIZE_GRID = """
WITH rects AS (
  SELECT n_nationkey,
         (n_nationkey % 5) * 60.0 - 145.0 + 0.017 AS xmin,
         (n_nationkey // 5) * 25.0 - 60.0 + 0.017 AS ymin,
         (n_nationkey % 5) * 60.0 - 145.0 + 0.017 + 12.0 + (n_nationkey % 7) AS xmax,
         (n_nationkey // 5) * 25.0 - 60.0 + 0.017 + 8.0 + (n_nationkey % 5) AS ymax
  FROM nation
), px AS (
  -- global pixel coords at z=5 (2^(5+8) = 8192 px world)
  SELECT n_nationkey,
         (xmin + 180.0) / 360.0 * 8192.0 AS pxmin,
         (xmax + 180.0) / 360.0 * 8192.0 AS pxmax,
         8192.0 * (0.5 + ln(tan((90.0 + greatest(ymin, -85.05112878))
                                * pi() / 360.0)) / (2.0 * pi())) AS pymin,
         8192.0 * (0.5 + ln(tan((90.0 + least(ymax, 85.05112878))
                                * pi() / 360.0)) / (2.0 * pi())) AS pymax
  FROM rects
), ranges AS (
  -- PixelsToTile rule: ceil(p/256) - 1, clamped to the world
  SELECT n_nationkey, pxmin, pxmax, pymin, pymax,
         greatest(CAST(ceil(pxmin / 256.0) AS BIGINT) - 1, 0) AS tx0,
         least(CAST(ceil(pxmax / 256.0) AS BIGINT) - 1, 31) AS tx1,
         greatest(CAST(ceil(pymin / 256.0) AS BIGINT) - 1, 0) AS ty0,
         least(CAST(ceil(pymax / 256.0) AS BIGINT) - 1, 31) AS ty1
  FROM px
), tiles AS (
  SELECT r.n_nationkey, s.tx, t.ty, r.pxmin, r.pxmax, r.pymin, r.pymax
  FROM ranges r, generate_series(0, 31) s(tx), generate_series(0, 31) t(ty)
  WHERE s.tx BETWEEN r.tx0 AND r.tx1 AND t.ty BETWEEN r.ty0 AND r.ty1
), counts AS (
  -- pixel CENTERS j+0.5 strictly inside (pxmin, pxmax): j >= floor(lo)+1
  -- after shifting by tile origin; closed form, no per-pixel enumeration
  SELECT n_nationkey, tx, ty,
         greatest(0::BIGINT,
           least(CAST(ceil(pxmax - tx * 256 - 0.5) AS BIGINT) - 1, 255)
           - greatest(CAST(floor(pxmin - tx * 256 - 0.5) AS BIGINT) + 1, 0)
           + 1) AS ncols,
         greatest(0::BIGINT,
           least(CAST(ceil(pymax - ty * 256 - 0.5) AS BIGINT) - 1, 255)
           - greatest(CAST(floor(pymin - ty * 256 - 0.5) AS BIGINT) + 1, 0)
           + 1) AS nrows
  FROM tiles
)
SELECT tx AS x, ty AS y, CAST(SUM(ncols * nrows) AS BIGINT) AS burned_px
FROM counts GROUP BY tx, ty
"""


def raster_calc_q(sf_dir: str):
    """Band algebra over the derived single-band rasters: the expression
    where(A > T, 255, A * 2) applied per pixel, sampled at the center —
    closed-form integer oracle.  (clip(x, 0, 255) then uint8 truncation,
    so values stay exact.)"""
    from ..stages.raster2 import calc
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = imgs.map_batches(lambda b: calc(b, "where(A > 64, 255, A * 2)",
                                          out_fmt="raw"),
                           batch_format="pyarrow")
    return out.map_batches(lambda b: _center_pixel(b, "img", "calc_v"),
                           batch_format="pyarrow")


SQL_RASTER_CALC = """
WITH v AS (
  SELECT n_nationkey,
         (n_nationkey * 31 + 8 * 32 + 8) % (97 + n_nationkey % 13) AS center
  FROM nation
)
SELECT n_nationkey,
       CASE WHEN center > 64 THEN 255
            ELSE least(center * 2, 255) END AS calc_v
FROM v
"""


def raster_neighbors_q(sf_dir: str):
    """Generic focal statistics (median, 3×3) over the derived rasters,
    sampled at the interior center pixel — DuckDB recomputes the 9-value
    median from the pixel formula."""
    from ..stages.dem import neighbors
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = imgs.map_batches(lambda b: neighbors(b, stat="median", size=3),
                           batch_format="pyarrow")
    return out.map_batches(lambda b: _center_pixel(b, "img", "med_v"),
                           batch_format="pyarrow")


SQL_RASTER_NEIGHBORS = """
WITH win AS (
  SELECT n_nationkey,
         (n_nationkey * 31 + (7 + r.di) * 32 + (7 + c.dj))
           % (97 + n_nationkey % 13) AS v
  FROM nation, generate_series(0, 2) r(di), generate_series(0, 2) c(dj)
)
SELECT n_nationkey, CAST(median(v) AS BIGINT) AS med_v
FROM win GROUP BY n_nationkey
"""


def footprint_join_q(sf_dir: str):
    """Image-footprint × vector-layer intersects join through the REAL
    cell-join path (footprints stage → canonical-cell polygon×polygon
    join): derived 0.32° image footprints × region-derived rect layer;
    oracle = rect-intersection arithmetic (north-up footprints ARE their
    bboxes)."""
    from ..pipelines import spatial_join as SJ
    from ..stages.footprint import footprints

    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    fps = imgs.map_batches(footprints, batch_format="pyarrow")

    def b_rects(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("r_regionkey"), dtype=np.int64)
        # columns crossing several image rows of the 10° grid
        xmin = k * 10.0 + 0.2
        ymin = np.full(k.shape, -0.1)
        xmax = xmin + 0.05 + k * 0.1
        ymax = ymin + 40.3
        return pa.table({"poly_id": pa.array([f"r{v:02d}" for v in k]),
                         "wkb": pa.array([wkb.box(a, c, d, e) for a, c, d, e
                                          in zip(xmin, ymin, xmax, ymax)],
                                         pa.binary())})

    pls = _read(sf_dir, "region").map_batches(b_rects, batch_format="pyarrow")
    out = SJ.polygon_polygon_join(fps, pls, predicate="intersects",
                                  a_id_col="image_id", b_id_col="poly_id")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_nationkey": pa.array([int(s[3:]) for s in
                                     b.column("image_id").to_pylist()],
                                    pa.int64()),
            "r_regionkey": pa.array([int(s[1:]) for s in
                                     b.column("poly_id").to_pylist()],
                                    pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_FOOTPRINT_JOIN = """
WITH img AS (
  SELECT n_nationkey,
         (n_nationkey % 5) * 10.0 + 0.05 AS xmin,
         (n_nationkey // 5) * 10.0 + 0.05 - 0.32 AS ymin,
         (n_nationkey % 5) * 10.0 + 0.05 + 0.32 AS xmax,
         (n_nationkey // 5) * 10.0 + 0.05 AS ymax
  FROM nation
), lyr AS (
  SELECT r_regionkey,
         r_regionkey * 10.0 + 0.2 AS xmin, -0.1 AS ymin,
         r_regionkey * 10.0 + 0.2 + 0.05 + r_regionkey * 0.1 AS xmax,
         -0.1 + 40.3 AS ymax
  FROM region
)
SELECT n_nationkey, r_regionkey
FROM img JOIN lyr
  ON least(img.xmax, lyr.xmax) >= greatest(img.xmin, lyr.xmin)
 AND least(img.ymax, lyr.ymax) >= greatest(img.ymin, lyr.ymin)
"""


def tile_pyramid_q(sf_dir: str):
    """Flagship pyramid over the derived rasters with a FULL oracle:
    per-level tile counts; DuckDB recomputes base-tile membership from the
    web-mercator pixel-center formulas and parent counts by integer
    halving."""
    import ray.data

    from .tiling import tile_pyramid
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    levels = tile_pyramid(imgs, max_zoom=5, min_zoom=3, concurrency=2)
    zs, ns = [], []
    for lv in levels:
        n = lv.count()
        head = lv.select_columns(["z"]).take(1) if n else []
        zs.append(int(head[0]["z"]) if head else -1)
        ns.append(n)
    return pa.table({"z": pa.array(zs, pa.int64()),
                     "n_tiles": pa.array(ns, pa.int64())})


SQL_TILE_PYRAMID = """
WITH img AS (
  SELECT n_nationkey,
         (n_nationkey % 5) * 10.0 + 0.05 AS xmin,
         (n_nationkey // 5) * 10.0 + 0.05 - 0.32 AS ymin,
         (n_nationkey % 5) * 10.0 + 0.05 + 0.32 AS xmax,
         (n_nationkey // 5) * 10.0 + 0.05 AS ymax
  FROM nation
), px AS (
  SELECT n_nationkey,
         (xmin + 180.0) / 360.0 * 8192.0 AS pxmin,
         (xmax + 180.0) / 360.0 * 8192.0 AS pxmax,
         8192.0 * (0.5 + ln(tan((90.0 + ymin) * pi() / 360.0)) / (2.0 * pi())) AS pymin,
         8192.0 * (0.5 + ln(tan((90.0 + ymax) * pi() / 360.0)) / (2.0 * pi())) AS pymax
  FROM img
), base AS (
  SELECT DISTINCT s.tx, t.ty
  FROM px, generate_series(0, 31) s(tx), generate_series(0, 31) t(ty)
  WHERE s.tx BETWEEN greatest(CAST(ceil(pxmin / 256.0) AS BIGINT) - 1, 0)
                 AND least(CAST(ceil(pxmax / 256.0) AS BIGINT) - 1, 31)
    AND t.ty BETWEEN greatest(CAST(ceil(pymin / 256.0) AS BIGINT) - 1, 0)
                 AND least(CAST(ceil(pymax / 256.0) AS BIGINT) - 1, 31)
    AND least(CAST(ceil(pxmax - s.tx * 256 - 0.5) AS BIGINT) - 1, 255)
        >= greatest(CAST(floor(pxmin - s.tx * 256 - 0.5) AS BIGINT) + 1, 0)
    AND least(CAST(ceil(pymax - t.ty * 256 - 0.5) AS BIGINT) - 1, 255)
        >= greatest(CAST(floor(pymin - t.ty * 256 - 0.5) AS BIGINT) + 1, 0)
)
SELECT 5 AS z, count(*) AS n_tiles FROM base
UNION ALL
SELECT 4, count(*) FROM (SELECT DISTINCT tx // 2, ty // 2 FROM base)
UNION ALL
SELECT 3, count(*) FROM (SELECT DISTINCT tx // 4, ty // 4 FROM base)
"""


def vector_check_geometry_q(sf_dir: str):
    """check-geometry over part-derived features with known defects:
    p%4==0 → bowtie (self-intersection), 1 → valid rect, 2 → duplicate
    consecutive vertices, 3 → unclosed ring.  The validity verdict and
    reason string are closed-form in the key."""
    from ..stages.vector import check_geometry

    def build(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("p_partkey"), dtype=np.int64)
        out = []
        for v in k:
            v = int(v)
            m = v % 4
            if m == 0:     # bowtie
                ring = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]],
                                dtype=np.float64)
            elif m == 1:   # valid rect
                ring = np.array([[0, 0], [3, 0], [3, 2], [0, 2], [0, 0]],
                                dtype=np.float64)
            elif m == 2:   # duplicate consecutive vertex
                ring = np.array([[0, 0], [3, 0], [3, 0], [3, 2], [0, 2],
                                 [0, 0]], dtype=np.float64)
            else:          # unclosed ring
                ring = np.array([[0, 0], [3, 0], [3, 2], [0, 2]],
                                dtype=np.float64)
            out.append(wkb.dumps({"type": "Polygon", "rings": [ring]}))
        return pa.table({"p_partkey": pa.array(k, pa.int64()),
                         "wkb": pa.array(out, pa.binary())})

    parts = _read(sf_dir, "part", ["p_partkey"]) \
        .map_batches(lambda b: b.filter(pa.array(
            np.asarray(b.column("p_partkey"), dtype=np.int64) % 10 < 4)),
            batch_format="pyarrow")
    out = parts.map_batches(build, batch_format="pyarrow") \
        .map_batches(check_geometry, batch_format="pyarrow")
    return out.map_batches(lambda b: pa.table({
        "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
        "is_valid": b.column("is_valid"),
        "invalid_reason": b.column("invalid_reason"),
    }), batch_format="pyarrow")


SQL_VECTOR_CHECK_GEOMETRY = """
SELECT p_partkey,
       (p_partkey % 4 = 1) AS is_valid,
       CASE p_partkey % 4
         WHEN 0 THEN 'self-intersection'
         WHEN 1 THEN ''
         WHEN 2 THEN 'duplicate consecutive vertices'
         ELSE 'ring not closed' END AS invalid_reason
FROM part WHERE p_partkey % 10 < 4
"""


# ======================================================================
# ---------- round 3: oracle conversions for previously rows-only ops ----
# ======================================================================
#
# Recipe (CLAUDE.md "oracle-izing the non-SQL surfaces"): derive EVERY
# input from table keys with integer arithmetic so DuckDB can replay the
# content with generate_series; plant exact duplicates so candidate sets
# collapse to closed form; end each float chain with one round/floor.


def _synth_corpus(b: pa.Table) -> pa.Table:
    """Nation-derived dedup corpus: per key n, one 60-word doc (vocabulary
    w0000..w4095 chosen by splitmix of disjoint index ranges, so distinct
    docs share ~no shingles) + an EXACT copy at doc_id n+1000.  The only
    near-dup pairs are the planted copies — closed-form for SQL."""
    from .dedup import _splitmix
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, texts = [], []
    for n in k:
        n = int(n)
        w = _splitmix(np.arange(n * 60 + 1, n * 60 + 61, dtype=np.uint64)) % 4096
        text = " ".join(f"w{int(v):04d}" for v in w)
        ids.extend([n, n + 1000])
        texts.extend([text, text])
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def dedup_minhash_q(sf_dir: str):
    """MinHash-LSH near-dup over the planted corpus: exact copies have
    identical signatures, so est-jaccard is exactly 1.0 and every planted
    pair (n, n+1000) — and nothing else — survives the 0.7 threshold."""
    from .dedup import minhash_lsh_pairs
    docs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_synth_corpus, batch_format="pyarrow")
    out = minhash_lsh_pairs(docs, threshold=0.7)
    return out.map_batches(lambda b: pa.table({
        "id_a": pc.cast(b.column("id_a"), pa.int64()),
        "id_b": pc.cast(b.column("id_b"), pa.int64()),
        "sig_jaccard": pc.cast(b.column("sig_jaccard"), pa.float64()),
    }), batch_format="pyarrow")


SQL_DEDUP_MINHASH = """
SELECT n_nationkey AS id_a, n_nationkey + 1000 AS id_b,
       CAST(1.0 AS DOUBLE) AS sig_jaccard
FROM nation
"""


def dedup_simhash_q(sf_dir: str):
    """SimHash near-dup over the planted corpus: copies have hamming 0."""
    from .dedup import simhash_pairs
    docs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_synth_corpus, batch_format="pyarrow")
    out = simhash_pairs(docs, max_hamming=3)
    return out.map_batches(lambda b: pa.table({
        "id_a": pc.cast(b.column("id_a"), pa.int64()),
        "id_b": pc.cast(b.column("id_b"), pa.int64()),
        "hamming": pc.cast(b.column("hamming"), pa.int64()),
    }), batch_format="pyarrow")


SQL_DEDUP_SIMHASH = """
SELECT n_nationkey AS id_a, n_nationkey + 1000 AS id_b,
       CAST(0 AS BIGINT) AS hamming
FROM nation
"""


def dedup_embedding_q(sf_dir: str):
    """Embedding cosine near-dup with EXACT planted copies (vec_id + 10^6):
    identical vectors land in every LSH band together and give cosine
    round6 = 1.0; random base vectors max out near 0.48, far below 0.999."""
    import ray.data

    from .dedup import embedding_neardup_pairs
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = emb.sort("vec_id").limit(20).take_all()
    planted = pa.table({
        "vec_id": pa.array([int(r["vec_id"]) + 1_000_000 for r in head], pa.int64()),
        "embedding": pa.array([list(r["embedding"]) for r in head],
                              pa.list_(pa.float32())),
    })
    both = emb.union(ray.data.from_arrow(planted))
    out = embedding_neardup_pairs(both, threshold=0.999)
    return out.map_batches(lambda b: pa.table({
        "id_a": pc.cast(b.column("id_a"), pa.int64()),
        "id_b": pc.cast(b.column("id_b"), pa.int64()),
        "cosine": pc.round(b.column("cosine"), ndigits=6,
                           round_mode="half_towards_infinity"),
    }), batch_format="pyarrow")


SQL_DEDUP_EMBEDDING = """
SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings
WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 20)
"""


def ann_ivf_q(sf_dir: str):
    """IVF top-k with nprobe = n_centroids (exhaustive probe): exercises the
    full index-build → hive-partitioned write → path-pruned read → in-bucket
    scan machinery while staying EXACT, so the brute-force SQL oracle
    applies (partial-probe recall is pinned separately in pytest)."""
    from .ann import ivf_topk
    emb = _read(sf_dir, "embeddings")
    head = emb.sort("vec_id").limit(4).take_all()
    Q = np.array([r["embedding"] for r in head], dtype=np.float64)
    out = ivf_topk(emb, Q, [int(r["vec_id"]) for r in head], k=4,
                   n_centroids=8, nprobe=8)
    return out.map_batches(lambda b: pa.table({
        "query_id": pc.cast(b.column("query_id"), pa.int64()),
        "vec_id": pc.cast(b.column("vec_id"), pa.int64()),
        "rank": pc.cast(b.column("rank"), pa.int64()),
        "cosine": pc.round(b.column("cosine"), ndigits=6,
                           round_mode="half_towards_infinity"),
    }), batch_format="pyarrow")


SQL_ANN_IVF = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  ORDER BY vec_id LIMIT 4
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id) AS rank
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, rank, round(cosine, 6) AS cosine
FROM scored WHERE rank <= 4
"""


def _explode_raw_px(b: pa.Table) -> pa.Table:
    """(image_id 'imgNN', bytes raw) → per-pixel rows (n, k, v)."""
    from ..core import codecs as CD
    ns, ks, vs = [], [], []
    for i in range(b.num_rows):
        img = CD.decode(b.column("bytes")[i].as_py(), "raw")
        band = img if img.ndim == 2 else img[:, :, 0]
        n = int(b.column("image_id")[i].as_py()[3:])
        flat = band.ravel().astype(np.int64)
        ns.append(np.full(flat.size, n, np.int64))
        ks.append(np.arange(flat.size, dtype=np.int64))
        vs.append(flat)
    z = np.array([], np.int64)
    return pa.table({"n": pa.array(np.concatenate(ns) if ns else z),
                     "k": pa.array(np.concatenate(ks) if ks else z),
                     "v": pa.array(np.concatenate(vs) if vs else z)})


def raster_translate_q(sf_dir: str):
    """gdal_translate -scale -outsize (nearest) over the derived rasters,
    checked PER PIXEL: scale maps v∈[0,108] → floor(10 + v/108*190), and
    16×16 nearest picks src pixel (2i+1, 2j+1)."""
    from ..stages.raster import translate
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = imgs.map_batches(
        lambda b: translate(b, scale=(0, 108, 10, 200), out_size=(16, 16),
                            resample="near", out_fmt="raw"),
        batch_format="pyarrow")
    return out.map_batches(_explode_raw_px, batch_format="pyarrow")


SQL_RASTER_TRANSLATE = f"""
WITH px AS ({_SQL_DERIVED_PIXELS}),
sc AS (
  SELECT n, k,
         CAST(floor(least(greatest(10.0 + (v / 108.0) * 190.0, 0.0), 255.0))
              AS BIGINT) AS sv
  FROM px
)
SELECT sc.n AS n, gi.i * 16 + gj.j AS k, sc.sv AS v
FROM sc, generate_series(0, 15) gi(i), generate_series(0, 15) gj(j)
WHERE sc.k = (2 * gi.i + 1) * 32 + (2 * gj.j + 1)
"""


def _sieve_images(b: pa.Table) -> pa.Table:
    """32×32 rasters for the sieve oracle: constant base B(n), five isolated
    1-px specks (size < threshold → absorbed into the base) and one 2×2
    block (size ≥ threshold → survives).  Sieve result is closed-form."""
    from ..core import codecs as CD
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts = [], []
    for n in k:
        n = int(n)
        base = 20 + (n * 7) % 50
        img = np.full((32, 32), base, np.uint8)
        for i in range(5):
            img[2 + 4 * i, (n + 5 * i) % 28 + 2] = base + 30
        img[26:28, 26:28] = base + 60
        ids.append(f"img{n:02d}")
        bts.append(CD.encode_raw(img))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(np.full(len(ids), 32, np.int32)),
        "h": pa.array(np.full(len(ids), 32, np.int32)),
        "fmt": pa.array(["raw"] * len(ids)),
    })


def raster_sieve_q(sf_dir: str):
    """GDALSieveFilter: specks below threshold merge into the base; the 2×2
    block survives → px_sum = 1024·B + 4·60 exactly."""
    from ..core import codecs as CD
    from ..stages.raster2 import sieve
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_sieve_images, batch_format="pyarrow")
    out = imgs.map_batches(lambda b: sieve(b, threshold=3),
                           batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        ns, sums = [], []
        for i in range(b.num_rows):
            img = CD.decode(b.column("bytes")[i].as_py(), "png")
            ns.append(int(b.column("image_id")[i].as_py()[3:]))
            sums.append(int(img.astype(np.int64).sum()))
        return pa.table({"n": pa.array(ns, pa.int64()),
                         "px_sum": pa.array(sums, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_SIEVE = """
SELECT n_nationkey AS n,
       CAST(1024 * (20 + (n_nationkey * 7) % 50) + 240 AS BIGINT) AS px_sum
FROM nation
"""


def _prox_images(b: pa.Table) -> pa.Table:
    """32×32 rasters with exactly ONE target pixel (value 255) at
    (n % 32, (n*7) % 32); all other values < 109 so the target set is
    unambiguous and the exact EDT is closed-form per pixel."""
    from ..core import codecs as CD
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts = [], []
    for n in k:
        n = int(n)
        v = ((n * 31 + np.arange(1024, dtype=np.int64)) % 97).astype(np.uint8)
        img = v.reshape(32, 32)
        img[n % 32, (n * 7) % 32] = 255
        ids.append(f"img{n:02d}")
        bts.append(CD.encode_raw(img))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(np.full(len(ids), 32, np.int32)),
        "h": pa.array(np.full(len(ids), 32, np.int32)),
        "fmt": pa.array(["raw"] * len(ids)),
    })


def raster_proximity_q(sf_dir: str):
    """GDALComputeProximity with the EXACT Euclidean distance transform,
    checked per pixel against sqrt((r-tr)² + (c-tc)²)·1000 floored."""
    from ..stages.raster import proximity_rows
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_prox_images, batch_format="pyarrow")
    out = imgs.map_batches(lambda b: proximity_rows(b, target_value=255),
                           batch_format="pyarrow")
    return out.map_batches(lambda b: pa.table({
        "n": pa.array([int(s[3:]) for s in b.column("image_id").to_pylist()],
                      pa.int64()),
        "k": pc.cast(b.column("k"), pa.int64()),
        "dist_mm": pc.cast(b.column("dist_mm"), pa.int64()),
    }), batch_format="pyarrow")


SQL_RASTER_PROXIMITY = """
SELECT n_nationkey AS n, g.k AS k,
       CAST(floor(sqrt(CAST((g.k // 32 - n_nationkey % 32)
                            * (g.k // 32 - n_nationkey % 32)
                          + (g.k % 32 - (n_nationkey * 7) % 32)
                            * (g.k % 32 - (n_nationkey * 7) % 32) AS DOUBLE))
                  * 1000.0) AS BIGINT) AS dist_mm
FROM nation, generate_series(0, 1023) g(k)
"""


def raster_reproject_q(sf_dir: str):
    """gdalwarp EPSG:4326 → EPSG:3857 on the derived catalog: the suggested
    output grid (w, h, origin) is closed-form from the spherical-mercator
    forward formulas, which DuckDB replays with the same libm ops."""
    from ..stages.warp import ReprojectImageStage
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    from ..stages.taskmode import stage_fn
    out = imgs.map_batches(stage_fn(ReprojectImageStage,
                                    {"dst_crs": "EPSG:3857"}),
                           batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        gts = b.column("geotransform").to_pylist()
        return pa.table({
            "n": pa.array([int(s[3:]) for s in b.column("image_id").to_pylist()],
                          pa.int64()),
            "w": pc.cast(b.column("w"), pa.int64()),
            "h": pc.cast(b.column("h"), pa.int64()),
            "crs": b.column("crs"),
            "minx": pa.array([np.floor(g[0] * 1e6 + 0.5) / 1e6 for g in gts],
                             pa.float64()),
            "maxy": pa.array([np.floor(g[3] * 1e6 + 0.5) / 1e6 for g in gts],
                             pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_REPROJECT = """
WITH b AS (
  SELECT n_nationkey AS n,
         (n_nationkey % 5) * 10.0 + 0.05 AS x0,
         (n_nationkey // 5) * 10.0 + 0.05 AS y0
  FROM nation
), m AS (
  SELECT n,
         (x0 * (pi() * 6378137.0)) / 180.0 AS minx,
         ((x0 + 0.32) * (pi() * 6378137.0)) / 180.0 AS maxx,
         ln(tan(((90.0 + (y0 - 0.32)) * pi()) / 360.0)) / (pi() / 180.0)
             * (pi() * 6378137.0) / 180.0 AS miny,
         ln(tan(((90.0 + y0) * pi()) / 360.0)) / (pi() / 180.0)
             * (pi() * 6378137.0) / 180.0 AS maxy
  FROM b
)
SELECT n, CAST(32 AS BIGINT) AS w,
       CAST(round(32.0 * (maxy - miny) / (maxx - minx), 0) AS BIGINT) AS h,
       'EPSG:3857' AS crs,
       round(minx, 6) AS minx, round(maxy, 6) AS maxy
FROM m
"""


def geo_project_lcc_q(sf_dir: str):
    """Vector reproject through the Lambert-conformal-conic registry entry
    (EPSG:2154, round-4 CRS breadth — reference: PROJ ``lcc`` via
    ogr/ogrct.cpp:665): customer-derived lon/lat → Lambert-93 meters.
    The oracle replays the identical Snyder closed form (same libm chain,
    same op order) in DuckDB; both sides round half-up at 1 mm."""
    from ..core.proj import get_transformer

    def project(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("c_custkey"), dtype=np.int64)
        lon = ((k * 37) % 3600) / 10.0 - 180.0 + 0.05
        lat = ((k * 91) % 1700) / 10.0 - 85.0 + 0.05
        x, y = get_transformer("EPSG:4326", "EPSG:2154").transform(lon, lat)
        return pa.table({
            "ckey": pa.array(k, pa.int64()),
            "x_m": pa.array(np.floor(x * 1e3 + 0.5) / 1e3, pa.float64()),
            "y_m": pa.array(np.floor(y * 1e3 + 0.5) / 1e3, pa.float64()),
        })

    return _read(sf_dir, "customer", ["c_custkey"]) \
        .map_batches(project, batch_format="pyarrow")


SQL_GEO_PROJECT_LCC = """
WITH c AS (
  SELECT c_custkey AS ckey,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS lon,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS lat
  FROM customer
), e AS (
  SELECT sqrt((1.0/298.257222101) * (2.0 - 1.0/298.257222101)) AS ec
), con AS (
  SELECT ec,
    cos(49.0*(pi()/180.0))/sqrt(1.0-(ec*sin(49.0*(pi()/180.0)))*(ec*sin(49.0*(pi()/180.0)))) AS m1,
    cos(44.0*(pi()/180.0))/sqrt(1.0-(ec*sin(44.0*(pi()/180.0)))*(ec*sin(44.0*(pi()/180.0)))) AS m2,
    tan(pi()/4.0 - (49.0*(pi()/180.0))/2.0)/pow((1.0-ec*sin(49.0*(pi()/180.0)))/(1.0+ec*sin(49.0*(pi()/180.0))), ec/2.0) AS t1,
    tan(pi()/4.0 - (44.0*(pi()/180.0))/2.0)/pow((1.0-ec*sin(44.0*(pi()/180.0)))/(1.0+ec*sin(44.0*(pi()/180.0))), ec/2.0) AS t2,
    tan(pi()/4.0 - (46.5*(pi()/180.0))/2.0)/pow((1.0-ec*sin(46.5*(pi()/180.0)))/(1.0+ec*sin(46.5*(pi()/180.0))), ec/2.0) AS t0
  FROM e
), con2 AS (
  SELECT ec, (ln(m1)-ln(m2))/(ln(t1)-ln(t2)) AS n, m1, t1, t0 FROM con
), con3 AS (SELECT ec, n, 1.0*m1/(n*pow(t1,n)) AS F, t0 FROM con2
), con4 AS (SELECT ec, n, F, 6378137.0*F*pow(t0,n) AS rho0 FROM con3
), pt AS (
  SELECT ckey, (lon-3.0)*(pi()/180.0) AS lam, lat*(pi()/180.0) AS phi FROM c
), pr AS (
  SELECT ckey, lam,
    tan(pi()/4.0 - phi/2.0)/pow((1.0-ec*sin(phi))/(1.0+ec*sin(phi)), ec/2.0) AS tt,
    ec, n, F, rho0 FROM pt, con4
), xy AS (
  SELECT ckey,
    700000.0 + (6378137.0*F*pow(tt,n))*sin(n*lam) AS x,
    6600000.0 + rho0 - (6378137.0*F*pow(tt,n))*cos(n*lam) AS y
  FROM pr
)
SELECT ckey, floor(x*1000.0 + 0.5)/1000.0 AS x_m,
       floor(y*1000.0 + 0.5)/1000.0 AS y_m
FROM xy
"""


def image_features_q(sf_dir: str):
    """ImageFeatureStage (actor pool) over the derived rasters: mean/std are
    exact rationals; the 8×8 average-hash uses exact dyadic block means, so
    every bit comparison is reproducible in SQL integer arithmetic."""
    from ..stages.multimodal import ImageFeatureStage
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = imgs.map_batches(ImageFeatureStage, batch_format="pyarrow",
                           batch_size=8, concurrency=2)
    return out.map_batches(lambda b: pa.table({
        "n": pa.array([int(s[3:]) for s in b.column("image_id").to_pylist()],
                      pa.int64()),
        "mean": pc.round(b.column("mean"), ndigits=6,
                         round_mode="half_towards_infinity"),
        "std": pc.round(b.column("std"), ndigits=6,
                        round_mode="half_towards_infinity"),
        "ahash": pc.cast(b.column("ahash"), pa.int64()),
    }), batch_format="pyarrow")


SQL_IMAGE_FEATURES = f"""
WITH px AS ({_SQL_DERIVED_PIXELS}),
st AS (
  SELECT n, round(sum(v) * 1.0 / 1024, 6) AS mean,
         round(sqrt(sum(v * v) * 1.0 / 1024
                    - (sum(v) * 1.0 / 1024) * (sum(v) * 1.0 / 1024)), 6) AS std
  FROM px GROUP BY n
), blocks AS (
  SELECT n, (k // 32) // 4 AS bi, (k % 32) // 4 AS bj, sum(v) / 16.0 AS small
  FROM px GROUP BY n, (k // 32) // 4, (k % 32) // 4
), bmean AS (
  SELECT n, sum(small) / 64.0 AS m FROM blocks GROUP BY n
), ah AS (
  SELECT b.n,
         CAST(sum(CASE WHEN b.small > bm.m
                       THEN CAST(1 AS HUGEINT) << (b.bi * 8 + b.bj)
                       ELSE CAST(0 AS HUGEINT) END)
              - CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS ahash
  FROM blocks b JOIN bmean bm ON b.n = bm.n GROUP BY b.n
)
SELECT st.n, st.mean, st.std, ah.ahash FROM st JOIN ah ON st.n = ah.n
"""


def _palette_images(b: pa.Table) -> pa.Table:
    """32×32 RGB rasters drawing from 8 exact colors (index c = (k//(n+1))%8,
    channels c·28+6 / c·25+10 / c·30+2): median-cut with n_colors=32 resolves
    every color to its own box, so the palette and the reconstruction are
    closed-form (5-bit box center = 8·(v>>3)+4)."""
    from ..core import codecs as CD
    kk = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts = [], []
    karr = np.arange(1024, dtype=np.int64)
    for n in kk:
        n = int(n)
        c = (karr // (n + 1)) % 8
        img = np.stack([(c * 28 + 6), (c * 25 + 10), (c * 30 + 2)],
                       axis=-1).astype(np.uint8).reshape(32, 32, 3)
        ids.append(f"img{n:02d}")
        bts.append(CD.encode_raw(img))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(np.full(len(ids), 32, np.int32)),
        "h": pa.array(np.full(len(ids), 32, np.int32)),
        "fmt": pa.array(["raw"] * len(ids)),
    })


def rgb_to_palette_q(sf_dir: str):
    """Global median-cut palette + per-image palettization, verified by the
    channel sums of the RECONSTRUCTED (palette-mapped) images."""
    import ray

    from ..core import codecs as CD
    from ..stages.palette import rgb_to_palette
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_palette_images, batch_format="pyarrow")
    indexed, pal = rgb_to_palette(imgs, n_colors=32)
    pal_ref = ray.put(np.asarray(pal, dtype=np.int64))

    def finish(b: pa.Table) -> pa.Table:
        p = ray.get(pal_ref)
        ns, sr, sg, sb = [], [], [], []
        for i in range(b.num_rows):
            idx = CD.decode(b.column("bytes")[i].as_py(), "raw")
            rec = p[idx.ravel()]
            ns.append(int(b.column("image_id")[i].as_py()[3:]))
            sr.append(int(rec[:, 0].sum()))
            sg.append(int(rec[:, 1].sum()))
            sb.append(int(rec[:, 2].sum()))
        return pa.table({"n": pa.array(ns, pa.int64()),
                         "sum_r": pa.array(sr, pa.int64()),
                         "sum_g": pa.array(sg, pa.int64()),
                         "sum_b": pa.array(sb, pa.int64())})

    return indexed.map_batches(finish, batch_format="pyarrow")


SQL_RGB_TO_PALETTE = """
WITH px AS (
  SELECT n_nationkey AS n, ((g.k // (n_nationkey + 1)) % 8) AS c
  FROM nation, generate_series(0, 1023) g(k)
)
SELECT n,
       CAST(sum(((c * 28 + 6) // 8) * 8 + 4) AS BIGINT) AS sum_r,
       CAST(sum(((c * 25 + 10) // 8) * 8 + 4) AS BIGINT) AS sum_g,
       CAST(sum(((c * 30 + 2) // 8) * 8 + 4) AS BIGINT) AS sum_b
FROM px GROUP BY n
"""


def vector_sort_hilbert_q(sf_dir: str):
    """gdal vector sort: Hilbert code of rect centroids — DuckDB replays the
    Hamilton xy→d loop with a 16-step recursive CTE over bit ops."""
    from ..stages.vector import hilbert_key
    rects = _read(sf_dir, "nation").map_batches(_nation_rects,
                                                batch_format="pyarrow")
    out = rects.map_batches(hilbert_key, batch_format="pyarrow") \
               .sort("hilbert")
    return out.map_batches(lambda b: pa.table({
        "n": pc.cast(b.column("nkey"), pa.int64()),
        "hilbert": pc.cast(b.column("hilbert"), pa.int64()),
    }), batch_format="pyarrow")


SQL_VECTOR_SORT_HILBERT = """
WITH RECURSIVE pts AS (
  SELECT n_nationkey AS id,
         ((CAST(n_nationkey AS DOUBLE) * 29) % 300) - 160.0 + 0.017
             + (12.0 + (n_nationkey % 7)) / 2.0 AS cx,
         ((CAST(n_nationkey AS DOUBLE) * 53) % 140) - 75.0 + 0.017
             + (8.0 + (n_nationkey % 5)) / 2.0 AS cy
  FROM nation
), grid AS (
  SELECT id,
         least(greatest(CAST(floor((cx + 180.0) / 360.0 * 65536.0) AS BIGINT),
                        0), 65535) AS gx,
         least(greatest(CAST(floor((cy + 90.0) / 180.0 * 65536.0) AS BIGINT),
                        0), 65535) AS gy
  FROM pts
), it AS (
  SELECT id, gx AS x, gy AS y, CAST(0 AS BIGINT) AS d,
         CAST(32768 AS BIGINT) AS s
  FROM grid
  UNION ALL
  SELECT id,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END)
              ELSE y END AS y,
         d + s * s * xor(3 * rx, ry) AS d,
         s // 2 AS s
  FROM (SELECT id, x, y, d, s,
               CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
        FROM it WHERE s > 0) t
)
SELECT id AS n, d AS hilbert FROM it WHERE s = 0
"""


def geo_rasterize_q(sf_dir: str):
    """gdal_rasterize merge=ADD over the (overlapping) nation rects at z=5:
    per-tile SUM of burned values factors into closed-form center counts
    per polygon — additive, so overlaps need no inclusion-exclusion."""
    from ..core import codecs as CD  # noqa: F401  (decode below)
    from .rasterize import rasterize
    rects = _read(sf_dir, "nation").map_batches(_nation_rects,
                                                batch_format="pyarrow")
    out = rasterize(rects, zoom=5, burn_value=1.0, merge_alg="add",
                    id_col="poly_id")

    def finish(b: pa.Table) -> pa.Table:
        xs, ys, sums = [], [], []
        for i in range(b.num_rows):
            grid = np.frombuffer(b.column("data")[i].as_py(), dtype=np.uint8)
            xs.append(int(b.column("x")[i].as_py()))
            ys.append(int(b.column("y")[i].as_py()))
            sums.append(int(grid.astype(np.int64).sum()))
        return pa.table({"x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "px_sum": pa.array(sums, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_GEO_RASTERIZE = """
WITH rects AS (
  SELECT n_nationkey,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 AS xmin,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 AS ymin,
         ((n_nationkey * 29) % 300) - 160.0 + 0.017 + 12.0 + (n_nationkey % 7) AS xmax,
         ((n_nationkey * 53) % 140) - 75.0 + 0.017 + 8.0 + (n_nationkey % 5) AS ymax
  FROM nation
), px AS (
  SELECT n_nationkey,
         (xmin + 180.0) / 360.0 * 8192.0 AS pxmin,
         (xmax + 180.0) / 360.0 * 8192.0 AS pxmax,
         8192.0 * (0.5 + ln(tan((90.0 + greatest(ymin, -85.05112878))
                                * pi() / 360.0)) / (2.0 * pi())) AS pymin,
         8192.0 * (0.5 + ln(tan((90.0 + least(ymax, 85.05112878))
                                * pi() / 360.0)) / (2.0 * pi())) AS pymax
  FROM rects
), ranges AS (
  SELECT n_nationkey, pxmin, pxmax, pymin, pymax,
         greatest(CAST(ceil(pxmin / 256.0) AS BIGINT) - 1, 0) AS tx0,
         least(CAST(ceil(pxmax / 256.0) AS BIGINT) - 1, 31) AS tx1,
         greatest(CAST(ceil(pymin / 256.0) AS BIGINT) - 1, 0) AS ty0,
         least(CAST(ceil(pymax / 256.0) AS BIGINT) - 1, 31) AS ty1
  FROM px
), tiles AS (
  SELECT r.n_nationkey, s.tx, t.ty, r.pxmin, r.pxmax, r.pymin, r.pymax
  FROM ranges r, generate_series(0, 31) s(tx), generate_series(0, 31) t(ty)
  WHERE s.tx BETWEEN r.tx0 AND r.tx1 AND t.ty BETWEEN r.ty0 AND r.ty1
), counts AS (
  SELECT n_nationkey, tx, ty,
         greatest(0::BIGINT,
           least(CAST(ceil(pxmax - tx * 256 - 0.5) AS BIGINT) - 1, 255)
           - greatest(CAST(floor(pxmin - tx * 256 - 0.5) AS BIGINT) + 1, 0)
           + 1) AS ncols,
         greatest(0::BIGINT,
           least(CAST(ceil(pymax - ty * 256 - 0.5) AS BIGINT) - 1, 255)
           - greatest(CAST(floor(pymin - ty * 256 - 0.5) AS BIGINT) + 1, 0)
           + 1) AS nrows
  FROM tiles
)
SELECT tx AS x, ty AS y, CAST(SUM(ncols * nrows) AS BIGINT) AS px_sum
FROM counts GROUP BY tx, ty
"""


def geo_polygonize_q(sf_dir: str):
    """Per-image polygonize over the derived rasters quantized to 16-value
    levels: with v(k) = (n·31+k) mod m and m ∈ [97,109], vertical neighbors
    ALWAYS differ by ≥2 levels, so every component is a horizontal run —
    grouped in SQL by the run key k - (v mod 16)."""
    from ..stages.raster import reclassify_fn
    from .polygonize import polygonize
    lut = {v: (v // 16) * 16 for v in range(256)}
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = imgs.map_batches(reclassify_fn(lut), batch_format="pyarrow") \
              .map_batches(polygonize, batch_format="pyarrow")
    return out.map_batches(lambda b: pa.table({
        "n": pa.array([int(s[3:]) for s in b.column("image_id").to_pylist()],
                      pa.int64()),
        "value": pc.cast(b.column("value"), pa.int64()),
        "pix_count": pc.cast(b.column("pix_count"), pa.int64()),
    }), batch_format="pyarrow")


SQL_GEO_POLYGONIZE = f"""
WITH px AS ({_SQL_DERIVED_PIXELS})
SELECT n, (v // 16) * 16 AS value, CAST(COUNT(*) AS BIGINT) AS pix_count
FROM px
GROUP BY n, k // 32, k - (v % 16), (v // 16) * 16
"""


def grid_linear_q(sf_dir: str):
    """gdal_grid linear (TIN barycentric): 5×5 nation lattice with a LINEAR
    value field — any Delaunay triangulation reproduces a linear function
    exactly, so every interior query has a closed-form answer."""
    from .knn import grid_linear
    nat = _read(sf_dir, "nation", ["n_nationkey"]).take_all()
    k = np.array([r["n_nationkey"] for r in nat], dtype=np.int64)
    ref_xy = np.column_stack([(k % 5) * 10.0, (k // 5) * 10.0])
    ref_v = 2.0 * ref_xy[:, 0] + 3.0 * ref_xy[:, 1] + 7.0

    def pts(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("c_custkey"), dtype=np.int64)
        return pa.table({
            "point_id": pa.array(c, pa.int64()),
            "x": pa.array(1.0 + ((c * 13) % 380) / 10.0, pa.float64()),
            "y": pa.array(1.0 + ((c * 29) % 380) / 10.0, pa.float64()),
        })

    queries = _read(sf_dir, "customer", ["c_custkey"]) \
        .map_batches(pts, batch_format="pyarrow")
    out = grid_linear(queries, ref_xy, ref_v, concurrency=2)
    return out.map_batches(lambda b: pa.table({
        "point_id": b.column("point_id"),
        "linear_value": pc.round(b.column("linear_value"), ndigits=6,
                                 round_mode="half_towards_infinity"),
        "inside_tin": b.column("inside_tin"),
    }), batch_format="pyarrow")


SQL_GRID_LINEAR = """
SELECT c_custkey AS point_id,
       round(2.0 * (1.0 + ((c_custkey * 13) % 380) / 10.0)
             + 3.0 * (1.0 + ((c_custkey * 29) % 380) / 10.0) + 7.0, 6)
           AS linear_value,
       TRUE AS inside_tin
FROM customer
"""


def dedup_ngram_q(sf_dir: str):
    """Exact n-gram Jaccard near-dup over the planted corpus: exact copies
    have true shingle Jaccard exactly 1.0 (distinct docs share ~no
    shingles), so the output is the closed-form planted pair set."""
    from .dedup import ngram_jaccard_pairs
    docs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_synth_corpus, batch_format="pyarrow")
    out = ngram_jaccard_pairs(docs, threshold=0.8)
    return out.map_batches(lambda b: pa.table({
        "id_a": pc.cast(b.column("id_a"), pa.int64()),
        "id_b": pc.cast(b.column("id_b"), pa.int64()),
        "jaccard": pc.cast(b.column("jaccard"), pa.float64()),
    }), batch_format="pyarrow")


SQL_DEDUP_NGRAM = """
SELECT n_nationkey AS id_a, n_nationkey + 1000 AS id_b,
       CAST(1.0 AS DOUBLE) AS jaccard
FROM nation
"""


# ---------- text_fingerprint oracle: winnowing hash in DuckDB HUGEINT ----

_U64 = "18446744073709551616::HUGEINT"


def _fp_tobig(x: str) -> str:
    """uint64-as-HUGEINT → signed BIGINT (two's complement bridge)."""
    return (f"CAST(({x}) - CASE WHEN ({x}) >= 9223372036854775808::HUGEINT "
            f"THEN {_U64} ELSE 0::HUGEINT END AS BIGINT)")


def _fp_tohuge(b: str) -> str:
    return (f"(CAST(({b}) AS HUGEINT) + CASE WHEN ({b}) < 0 "
            f"THEN {_U64} ELSE 0::HUGEINT END)")


def _fp_xor64(a: str, b: str) -> str:
    return _fp_tohuge(f"xor({_fp_tobig(a)}, {_fp_tobig(b)})")


def _fp_mulmod(a: str, m: int) -> str:
    """(a * m) mod 2^64 without int128 overflow: split a into 32-bit halves."""
    return (f"(((({a}) % 4294967296::HUGEINT) * {m}::HUGEINT"
            f" + (((({a}) // 4294967296::HUGEINT) * {m}::HUGEINT)"
            f" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {_U64})")


def _fp_splitmix_steps(col_in: str, col_out: str, tag: str):
    """CTE column steps applying dedup._splitmix to a HUGEINT uint64 col."""
    return [
        (f"{tag}_a", f"((({col_in}) + 11400714819323198485::HUGEINT) % {_U64})"),
        (f"{tag}_x1", _fp_xor64(f"{tag}_a", f"({tag}_a // 1073741824::HUGEINT)")),
        (f"{tag}_b", _fp_mulmod(f"{tag}_x1", 13787848793156543929)),
        (f"{tag}_x2", _fp_xor64(f"{tag}_b", f"({tag}_b // 134217728::HUGEINT)")),
        (f"{tag}_c", _fp_mulmod(f"{tag}_x2", 10723151780598845931)),
        (col_out, _fp_xor64(f"{tag}_c", f"({tag}_c // 2147483648::HUGEINT)")),
    ]


def _fp_digit_bytes(v: str) -> list[str]:
    """ASCII bytes of 'w' || lpad(v, 4, '0') as integer expressions."""
    return [f"119", f"(48 + ({v}) // 1000)", f"(48 + (({v}) // 100) % 10)",
            f"(48 + (({v}) // 10) % 10)", f"(48 + ({v}) % 10)"]


def _build_sql_text_fingerprint() -> str:
    """Winnowing fingerprint of the planted corpus, fully in SQL: word
    values from splitmix(key), gram bytes packed to LE uint64 words by
    integer arithmetic, dedup._hash_bytes_to_u64 + winnowing min-window +
    XOR-reduce replayed with HUGEINT mod-2^64 arithmetic (CLAUDE.md
    'oracle-izing' recipe, taken to its logical extreme)."""
    sm1, sm2, sm3, sm17 = (10451216379200822465, 10905525725756348110,
                           2092789425003139053, 9260656408219841379)
    steps = _fp_splitmix_steps("x", "wv", "s")
    chain = ["words_0 AS (SELECT n_nationkey AS doc, i.i AS wi, "
             "CAST(n_nationkey * 60 + 1 + i.i AS HUGEINT) AS x "
             "FROM nation, generate_series(0, 59) i(i))"]
    prev = "words_0"
    for k, (name, expr) in enumerate(steps):
        nxt = f"words_{k + 1}"
        chain.append(f"{nxt} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = nxt
    chain.append(f"wvals AS (SELECT doc, wi, wv % 4096::HUGEINT AS v FROM {prev})")
    # gram rows with three word values
    chain.append(
        "grams_0 AS (SELECT a.doc, a.wi AS gi, a.v AS v1, b.v AS v2, c.v AS v3 "
        "FROM wvals a JOIN wvals b ON b.doc = a.doc AND b.wi = a.wi + 1 "
        "JOIN wvals c ON c.doc = a.doc AND c.wi = a.wi + 2 WHERE a.wi <= 57)")
    # pack 17 ASCII bytes + zero pad into 3 LE uint64 words
    d1 = _fp_digit_bytes("v1")
    d2 = _fp_digit_bytes("v2")
    d3 = _fp_digit_bytes("v3")
    bytes0 = d1 + ["32"] + [d2[0], d2[1]]
    bytes1 = d2[2:] + ["32"] + [d3[0], d3[1], d3[2], d3[3]]
    bytes2 = [d3[4]] + ["0"] * 7
    def pack(bs):
        return " + ".join(f"CAST({b} AS HUGEINT) * {1 << (8 * k)}::HUGEINT"
                          for k, b in enumerate(bs))
    chain.append(f"grams_1 AS (SELECT doc, gi, {pack(bytes0)} AS w0, "
                 f"{pack(bytes1)} AS w1, {pack(bytes2)} AS w2 FROM grams_0)")
    chain.append(
        f"grams_2 AS (SELECT *, {_fp_xor64('w0', f'{sm1}::HUGEINT')} AS q0, "
        f"{_fp_xor64('w1', f'{sm2}::HUGEINT')} AS q1, "
        f"{_fp_xor64('w2', f'{sm3}::HUGEINT')} AS q2 FROM grams_1)")
    prev = "grams_2"
    k = 2
    for col_in, col_out, tag in (("q0", "h0", "g0"), ("q1", "h1", "g1"),
                                 ("q2", "h2", "g2")):
        for name, expr in _fp_splitmix_steps(col_in, col_out, tag):
            k += 1
            chain.append(f"grams_{k} AS (SELECT *, {expr} AS {name} FROM {prev})")
            prev = f"grams_{k}"
    chain.append(
        f"grams_h AS (SELECT *, "
        f"{_fp_xor64(_fp_xor64('h0', 'h1'), _fp_xor64('h2', f'{sm17}::HUGEINT'))}"
        f" AS hg FROM {prev})")
    prev = "grams_h"
    for name, expr in _fp_splitmix_steps("hg", "h3", "f"):
        k += 1
        chain.append(f"grams_{k} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"grams_{k}"
    chain.append(
        f"wins AS (SELECT g.doc, s.w AS win, min(g.h3) AS wmin "
        f"FROM {prev} g, generate_series(0, 50) s(w) "
        f"WHERE g.gi BETWEEN s.w AND s.w + 7 GROUP BY g.doc, s.w)")
    chain.append("dmins AS (SELECT DISTINCT doc, wmin FROM wins)")
    chain.append(
        f"fp AS (SELECT doc, {_fp_tobig(_fp_tohuge('bit_xor(' + _fp_tobig('wmin') + ')') + ' - 9223372036854775808::HUGEINT')} "
        f"AS fingerprint FROM dmins GROUP BY doc)")
    return ("WITH " + ",\n".join(chain)
            + "\nSELECT doc AS doc_id, fingerprint FROM fp "
            "UNION ALL SELECT doc + 1000 AS doc_id, fingerprint FROM fp")


SQL_TEXT_FINGERPRINT = _build_sql_text_fingerprint()


def text_fingerprint_q(sf_dir: str):
    """Winnowing fingerprint over the planted corpus — exact copies share
    the fingerprint; DuckDB replays the full rolling-hash chain."""
    from .text import fingerprint
    docs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_synth_corpus, batch_format="pyarrow")
    return docs.map_batches(fingerprint, batch_format="pyarrow")


# ---------- round 4: GeoTIFF codec on the driver surface ----------

def _to_tiff_batch(b: pa.Table) -> pa.Table:
    """Re-encode derived raw rasters as tiled+LZW+predictor-2 GeoTIFF —
    exercises the full core/tiff.py write path (frmts/gtiff analog)."""
    from ..core import codecs as CD
    from ..core import tiff as TF
    ids, bts = [], []
    for i in range(b.num_rows):
        img = CD.decode(b.column("bytes")[i].as_py(), "raw")
        gt = list(b.column("geotransform")[i].as_py())
        ids.append(b.column("image_id")[i].as_py())
        bts.append(TF.encode_tiff(img, compression="lzw", tiled=True,
                                  tile_size=16, predictor=2,
                                  geotransform=gt, epsg=4326))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "fmt": pa.array(["tif"] * len(ids)),
    })


def raster_tiff_q(sf_dir: str):
    """GeoTIFF write→read roundtrip over the derived rasters: per-image GDAL
    checksum, pixel sum and recovered georeferencing, all replayed by the
    oracle from the v=(n*31+k)%(97+n%13) recipe (lossless codec ⇒ pixel
    arithmetic survives the TIFF roundtrip bit-exactly)."""
    from ..core import checksum as CK
    from ..core import tiff as TF
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    tiffs = imgs.map_batches(_to_tiff_batch, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        ns, cks, sums, x0s, eps = [], [], [], [], []
        for i in range(b.num_rows):
            img, meta = TF.decode_tiff_full(b.column("bytes")[i].as_py())
            ns.append(int(b.column("image_id")[i].as_py()[3:]))
            cks.append(CK.checksum(img))
            sums.append(int(img.astype(np.int64).sum()))
            gt = meta["geotransform"]
            x0s.append(int(np.floor(gt[0] * 1000.0 + 0.5)))
            eps.append(int(meta["epsg"]))
        return pa.table({"n": pa.array(ns, pa.int64()),
                         "cksum": pa.array(cks, pa.int64()),
                         "px_sum": pa.array(sums, pa.int64()),
                         "x0_milli": pa.array(x0s, pa.int64()),
                         "epsg": pa.array(eps, pa.int64())})

    return tiffs.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_TIFF = f"""
WITH px AS ({_SQL_DERIVED_PIXELS})
SELECT n,
       CAST(SUM(v % ([7,11,13,17,19,23,29,31,37,41,43])[(k % 11) + 1])
            % 65536 AS BIGINT) AS cksum,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST((n % 5) * 10000 + 50 AS BIGINT) AS x0_milli,
       CAST(4326 AS BIGINT) AS epsg
FROM px
GROUP BY n
"""


# ---------- round 5: COG single-file writer on the driver surface ----------

def raster_cog_q(sf_dir: str):
    """Cloud-optimized GeoTIFF (frmts/gtiff/cogdriver.cpp layout): encode the
    derived 32×32 rasters as single-file COGs (tile 16 ⇒ one overview level
    at 16×16 via half-up 2×2 average, gcore/overview.cpp AVERAGE), decode the
    whole IFD chain back and report per-image level count, base + overview
    GDAL checksums, overview pixel sum, and a layout predicate (all IFDs
    before the first tile byte; tile offsets ascending smallest-level-first).
    The oracle replays the overview average from the v=(n*31+k)%(97+n%13)
    recipe with integer arithmetic."""
    from ..core import checksum as CK
    from ..core import tiff as TF

    def per_batch(b: pa.Table) -> pa.Table:
        from ..core import codecs as CD
        ns, nlv, ck0, ck1, osum, lay = [], [], [], [], [], []
        for i in range(b.num_rows):
            img = CD.decode(b.column("bytes")[i].as_py(), "raw")
            gt = list(b.column("geotransform")[i].as_py())
            payload = TF.encode_cog(img, tile_size=16, compression="deflate",
                                    predictor=2, geotransform=gt, epsg=4326)
            levels = TF.decode_tiff_all(payload)
            base, ovr = levels[0][0], levels[1][0]
            offs = [m["tile_offsets"] for _, m in levels]
            flat = [o for lv in reversed(offs) for o in lv]
            ok = (flat == sorted(flat)
                  and all(m["ifd_offset"] < min(flat) for _, m in levels)
                  and levels[0][1].get("subfile_type") == 0
                  and levels[1][1].get("subfile_type") == 1)
            ns.append(int(b.column("image_id")[i].as_py()[3:]))
            nlv.append(len(levels))
            ck0.append(CK.checksum(base))
            ck1.append(CK.checksum(ovr))
            osum.append(int(ovr.astype(np.int64).sum()))
            lay.append(1 if ok else 0)
        return pa.table({"n": pa.array(ns, pa.int64()),
                         "n_levels": pa.array(nlv, pa.int64()),
                         "cksum_base": pa.array(ck0, pa.int64()),
                         "cksum_ovr": pa.array(ck1, pa.int64()),
                         "ovr_sum": pa.array(osum, pa.int64()),
                         "layout_ok": pa.array(lay, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow") \
        .map_batches(per_batch, batch_format="pyarrow")


SQL_RASTER_COG = f"""
WITH px AS ({_SQL_DERIVED_PIXELS}),
base AS (SELECT n, k, v, k // 32 AS r, k % 32 AS c FROM px),
ovr AS (
  SELECT n, (r // 2) * 16 + (c // 2) AS k2,
         (SUM(v) + 2) // 4 AS v2
  FROM base GROUP BY n, r // 2, c // 2
),
agg0 AS (
  SELECT n,
         CAST(SUM(v % ([7,11,13,17,19,23,29,31,37,41,43])[(k % 11) + 1])
              % 65536 AS BIGINT) AS cksum_base
  FROM base GROUP BY n
),
agg1 AS (
  SELECT n,
         CAST(SUM(v2 % ([7,11,13,17,19,23,29,31,37,41,43])[(k2 % 11) + 1])
              % 65536 AS BIGINT) AS cksum_ovr,
         CAST(SUM(v2) AS BIGINT) AS ovr_sum
  FROM ovr GROUP BY n
)
SELECT agg0.n AS n, CAST(2 AS BIGINT) AS n_levels, cksum_base, cksum_ovr,
       ovr_sum, CAST(1 AS BIGINT) AS layout_ok
FROM agg0 JOIN agg1 ON agg0.n = agg1.n
"""


# ---------- round 4: ISO curved WKB on the driver surface ----------

def vector_curves_q(sf_dir: str):
    """ISO-WKB curved geometries (SURVEY §2 full geometry set; reference
    ogr/ogr_core.h wkbCircularString/CompoundCurve/CurvePolygon): per
    nation, hand-assemble a full-circle CurvePolygon (SQL/MM p0==p2
    convention) and a line+semicircle CompoundCurve in raw WKB, parse via
    core.wkb (linearized at OGR's 4-degree step), and report linearized
    segment counts, polygon area and curve length.  Oracle: closed forms —
    a full circle strokes to exactly ceil(360/4)=90 chords (regular
    90-gon, area .5*90*r^2*sin(2pi/90)); the semicircle to 45 chords of
    length 2r*sin(pi/90).  Areas/lengths are emitted as half-up-rounded
    1e-4 integers (libm trig bit-matches DuckDB under end-of-chain
    rounding)."""
    import struct

    from ..core import wkb as W

    def per_batch(b: pa.Table) -> pa.Table:
        ns, csegs, areas, lsegs, lens_ = [], [], [], [], []
        for n in b.column("n_nationkey").to_pylist():
            r = float((n % 5) + 2)
            cx, cy = float(3 * n), float(7 * (n % 3))

            def arc3(p0, p1, p2):
                return struct.pack("<BII", 1, 8, 3) + struct.pack(
                    "<6d", *p0, *p1, *p2)

            # full-circle CurvePolygon
            ring = arc3((cx - r, cy), (cx + r, cy), (cx - r, cy))
            cp = struct.pack("<BII", 1, 10, 1) + ring
            poly = W.loads(cp)
            ringxy = poly["rings"][0]
            x, y = ringxy[:, 0], ringxy[:, 1]
            area = 0.5 * abs(float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))
            # CompoundCurve: chord line + semicircle back over the top
            ls = struct.pack("<BII", 1, 2, 2) + struct.pack(
                "<4d", cx, cy, cx + 2 * r, cy)
            arc = arc3((cx + 2 * r, cy), (cx + r, cy + r), (cx, cy))
            cc = struct.pack("<BII", 1, 9, 2) + ls + arc
            line = W.loads(cc)["xy"]
            seglen = float(np.hypot(np.diff(line[:, 0]),
                                    np.diff(line[:, 1])).sum())
            ns.append(n)
            csegs.append(len(ringxy) - 1)
            areas.append(int(np.floor(area * 1e4 + 0.5)))
            lsegs.append(len(line) - 1)
            lens_.append(int(np.floor(seglen * 1e4 + 0.5)))
        return pa.table({"n": pa.array(ns, pa.int64()),
                         "circle_segs": pa.array(csegs, pa.int64()),
                         "area_e4": pa.array(areas, pa.int64()),
                         "curve_segs": pa.array(lsegs, pa.int64()),
                         "len_e4": pa.array(lens_, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(per_batch, batch_format="pyarrow")


SQL_VECTOR_CURVES = """
SELECT n_nationkey AS n,
       CAST(90 AS BIGINT) AS circle_segs,
       CAST(FLOOR(0.5 * 90 * r * r * SIN(2 * PI() / 90) * 1e4 + 0.5)
            AS BIGINT) AS area_e4,
       CAST(46 AS BIGINT) AS curve_segs,
       CAST(FLOOR((2 * r + 45 * 2 * r * SIN(PI() / 90)) * 1e4 + 0.5)
            AS BIGINT) AS len_e4
FROM (SELECT n_nationkey, CAST((n_nationkey % 5) + 2 AS DOUBLE) AS r
      FROM nation)
"""


# ---------- round 4: lossy VP8i codec on the driver surface ----------

def raster_webp_lossy_q(sf_dir: str):
    """Lossy VP8i (core/vp8i.py) write→read on the driver surface.

    Uses the codec's provable exact-representability class: a gray image
    that is constant per 16×16 macroblock has constant residual blocks, so
    only DC coefficients survive the 4×4 DCT; at quality 100 q_dc = 4
    divides the DCT DC gain (4) exactly and the Y2 Walsh-Hadamard path is
    exact integer arithmetic, so decode == source bit-for-bit for EVERY
    such image (pinned for 60 keys in test_codecs.py).  The oracle replays
    v(r,c) = (n*31 + (r//16)*7 + (c//16)*13) % 256 with generate_series and
    computes the GDAL 11-prime checksum + pixel sum.
    """
    from ..core import checksum as CK
    from ..core import codecs as CD
    from ..core.vp8i import encode_vp8i

    def per_batch(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ns, cks, sums, tagged = [], [], [], []
        for n in ks:
            n = int(n)
            img = np.zeros((32, 48), np.uint8)
            for i in range(2):
                for j in range(3):
                    img[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16] = \
                        (n * 31 + i * 7 + j * 13) % 256
            enc = encode_vp8i(img, quality=100)
            dec = CD.decode(enc, "webp_lossy")
            ns.append(n)
            cks.append(CK.checksum(dec))
            sums.append(int(dec.astype(np.int64).sum()))
            tagged.append(1 if enc[12:16] == b"VP8i" else 0)
        return pa.table({"n": pa.array(ns, pa.int64()),
                         "cksum": pa.array(cks, pa.int64()),
                         "px_sum": pa.array(sums, pa.int64()),
                         "is_vp8i": pa.array(tagged, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(per_batch, batch_format="pyarrow")


SQL_RASTER_WEBP_LOSSY = """
WITH px AS (
  SELECT n_nationkey AS n, g.k AS k,
         (n_nationkey * 31 + ((g.k // 48) // 16) * 7
          + ((g.k % 48) // 16) * 13) % 256 AS v
  FROM nation, generate_series(0, 1535) g(k)
)
SELECT n,
       CAST(SUM(v % ([7,11,13,17,19,23,29,31,37,41,43])[(k % 11) + 1])
            % 65536 AS BIGINT) AS cksum,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(1 AS BIGINT) AS is_vp8i
FROM px
GROUP BY n
"""


# ---------- round 4: documents-table dedup/fingerprint oracles ----------
#
# The three remaining rows-only queries run over REAL documents.parquet
# text.  The corpus is pure ASCII (ord(char) == utf-8 byte, verified by the
# tests), so the whole hash stack — k-gram base-257 rolling hash →
# splitmix64 → minhash/simhash/winnowing — replays in DuckDB with the same
# HUGEINT mod-2^64 machinery as SQL_TEXT_FINGERPRINT.  Seeds/salts are
# computed once here with dedup._splitmix and inlined as literals.

def _docs_shingle_ctes(k: int, max_len: int = 2047) -> list[str]:
    """CTE chain documents → shingles(doc, sh): lowercase, <k-char pad,
    chars, k-gram polynomial (base 257, fits BIGINT), splitmix64, DISTINCT
    (mirrors dedup.shingle_hashes exactly)."""
    pows = [257 ** j for j in range(k)]
    gram = " + ".join(f"lead(b,{j}) OVER w * {pows[j]}" if j else "b"
                      for j in range(k))
    chain = [
        f"doc0 AS (SELECT doc_id AS doc, CASE WHEN length(text) < {k} "
        f"THEN lower(text) || '{' ' * k}' ELSE lower(text) END AS t "
        "FROM documents)",
        "chars AS (SELECT doc, i.i AS i, "
        "CAST(ord(substr(t, i.i + 1, 1)) AS BIGINT) AS b "
        f"FROM doc0, generate_series(0, {max_len}) i(i) "
        "WHERE i.i < length(t))",
        f"grams AS (SELECT doc, i AS gi, {gram} AS g FROM chars "
        "WINDOW w AS (PARTITION BY doc ORDER BY i) "
        f"QUALIFY lead(b,{k - 1}) OVER w IS NOT NULL)",
    ]
    prev = "grams"
    for j, (name, expr) in enumerate(
            _fp_splitmix_steps("CAST(g AS HUGEINT)", "sh", "m")):
        chain.append(f"shsm_{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"shsm_{j}"
    chain.append(f"shingles AS (SELECT DISTINCT doc, sh FROM {prev})")
    return chain


def _minhash_pairstat_ctes() -> list[str]:
    """Shared CTE chain documents → ``pairstat(da, db, t, eqcnt, fb)``:
    64 xor-minhash sigs, 16-band xor-fold + salted-splitmix buckets, the
    [2,64] bucket-size window, pairwise signature agreement, and the
    first-fully-equal-band exactly-once rule (argmax-defaults-to-0) —
    the candidate machinery of ``dedup.minhash_lsh_pairs`` and
    ``dedup.fuzzy_pairs``, replayed exactly."""
    from .dedup import _splitmix
    seeds = _splitmix(np.arange(1, 65, dtype=np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15))
    salts = _splitmix(np.arange(16, dtype=np.uint64))
    seed_vals = ", ".join(f"({j}, {int(seeds[j])}::HUGEINT)"
                          for j in range(64))
    salt_vals = ", ".join(f"({t}, {int(salts[t])}::HUGEINT)"
                          for t in range(16))
    chain = _docs_shingle_ctes(5)
    chain += [
        f"seeds(j, seed) AS (VALUES {seed_vals})",
        f"salts(t, salt) AS (VALUES {salt_vals})",
        f"sigs AS (SELECT doc, s.j, MIN({_fp_xor64('sh', 's.seed')}) AS v "
        "FROM shingles, seeds s GROUP BY doc, s.j)",
        f"bh AS (SELECT doc, j // 4 AS t, "
        f"{_fp_tohuge(f'bit_xor({_fp_tobig(chr(118))})')} AS bhv "
        "FROM sigs GROUP BY doc, j // 4)",
        "bh1 AS (SELECT bh.doc, bh.t, (bhv + salt) % "
        f"{_U64} AS x FROM bh JOIN salts ON salts.t = bh.t)",
    ]
    prev = "bh1"
    for j, (name, expr) in enumerate(_fp_splitmix_steps("x", "bh2", "q")):
        chain.append(f"bq_{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"bq_{j}"
    chain += [
        f"buckets AS (SELECT doc, t, CAST(bh2 // 256::HUGEINT AS BIGINT) "
        f"* 16 + t AS bucket FROM {prev})",
        "bsz AS (SELECT bucket, COUNT(*) AS c FROM buckets GROUP BY bucket)",
        "cand AS (SELECT a.doc AS da, b.doc AS db, a.t FROM buckets a "
        "JOIN buckets b ON b.bucket = a.bucket AND b.doc > a.doc "
        "JOIN bsz ON bsz.bucket = a.bucket WHERE bsz.c BETWEEN 2 AND 64)",
        "paireq AS (SELECT c.da, c.db, c.t, sa.j // 4 AS bb, "
        "CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END AS e FROM cand c "
        "JOIN sigs sa ON sa.doc = c.da "
        "JOIN sigs sb ON sb.doc = c.db AND sb.j = sa.j)",
        "bandeq AS (SELECT da, db, t, bb, SUM(e) AS beq FROM paireq "
        "GROUP BY da, db, t, bb)",
        "pairstat AS (SELECT da, db, t, SUM(beq) AS eqcnt, "
        "COALESCE(MIN(CASE WHEN beq = 4 THEN bb END), 0) AS fb "
        "FROM bandeq GROUP BY da, db, t)",
    ]
    return chain


def _build_sql_dedup_minhash_docs() -> str:
    """dedup.minhash_lsh_pairs over documents, end to end (see
    ``_minhash_pairstat_ctes``) + the sig-jaccard ≥ 0.7 verification."""
    return ("WITH " + ",\n".join(_minhash_pairstat_ctes())
            + "\nSELECT da AS id_a, db AS id_b, "
            "CAST(eqcnt AS DOUBLE) / 64.0 AS sig_jaccard FROM pairstat "
            "WHERE t = fb AND CAST(eqcnt AS DOUBLE) / 64.0 >= 0.7")


def _build_sql_dedup_fuzzy(max_dist: int = 8, prefix: int = 96) -> str:
    """dedup.fuzzy_pairs over documents: the SAME MinHash-LSH candidate
    machinery (``_minhash_pairstat_ctes``), but verification is EXACT
    prefix Levenshtein ≤ max_dist — DuckDB's ``levenshtein()`` stands in
    for the engine's vectorized Ukkonen band DP (``dedup._lev_band``),
    character-== byte-level on the ASCII documents corpus."""
    chain = _minhash_pairstat_ctes()
    chain.append(
        f"pfx AS (SELECT doc_id AS doc, substr(text, 1, {prefix}) AS s "
        "FROM documents)")
    return ("WITH " + ",\n".join(chain)
            + "\nSELECT da AS id_a, db AS id_b, "
            "CAST(levenshtein(pa.s, pb.s) AS INT) AS dist "
            "FROM pairstat JOIN pfx pa ON pa.doc = da "
            "JOIN pfx pb ON pb.doc = db "
            f"WHERE t = fb AND levenshtein(pa.s, pb.s) <= {max_dist}")


SQL_DEDUP_FUZZY = _build_sql_dedup_fuzzy()


def dedup_fuzzy_q(sf_dir: str):
    """Fuzzy (edit-distance) near-dup over the real corpus: LSH candidates
    + banded-Levenshtein ≤ 8 verification on the 96-char prefix (reference:
    fuzzy dedup stages of training-data pipelines; candidate-verify shape
    per dedup.fuzzy_pairs docstring)."""
    from .dedup import fuzzy_pairs
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return fuzzy_pairs(docs, max_dist=8, prefix_len=96)


def _build_sql_dedup_simhash_docs() -> str:
    """dedup.simhash_pairs over documents: 4-gram shingles → 64-bit
    majority-vote simhash → hamming ≤ 3 pairs.  The pipeline's pigeonhole
    candidate generation is complete for its distance bound and its
    first-matching-block rule keeps each pair exactly once, so the result
    set equals the all-pairs form used here."""
    pow2_vals = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))
    chain = _docs_shingle_ctes(4)
    chain += [
        "nsh AS (SELECT doc, COUNT(*) AS n FROM shingles GROUP BY doc)",
        f"pow2(b, p) AS (VALUES {pow2_vals})",
        "bitcnt AS (SELECT doc, pw.b AS b, pw.p AS p, "
        "SUM(CAST((sh // pw.p) % 2 AS BIGINT)) AS cnt "
        "FROM shingles, pow2 pw GROUP BY doc, pw.b, pw.p)",
        "simh AS (SELECT bitcnt.doc, SUM(CASE WHEN 2 * cnt > n THEN p "
        "ELSE 0::HUGEINT END) AS h FROM bitcnt "
        "JOIN nsh ON nsh.doc = bitcnt.doc GROUP BY bitcnt.doc)",
    ]
    ham = f"bit_count(xor({_fp_tobig('a.h')}, {_fp_tobig('b.h')}))"
    return ("WITH " + ",\n".join(chain)
            + f"\nSELECT a.doc AS id_a, b.doc AS id_b, "
            f"CAST({ham} AS INT) AS hamming "
            f"FROM simh a JOIN simh b ON b.doc > a.doc WHERE {ham} <= 3")


def _build_sql_text_fingerprint_docs() -> str:
    """text.fingerprint over documents: word 3-grams, LE-uint64 byte
    packing, _hash_bytes_to_u64 (position-salted splitmix + length fold),
    one more splitmix, winnowing min over 8-gram windows, DISTINCT-XOR
    reduce, −2^63 signed shift; <3-token docs → 0."""
    from .dedup import _splitmix
    posh = _splitmix(np.arange(1, 9, dtype=np.uint64))
    posh_vals = ", ".join(f"({m}, {int(posh[m])}::HUGEINT)"
                          for m in range(8))
    chain = [
        "toks0 AS (SELECT doc_id AS doc, i.i AS wi0, "
        "list_extract(string_split(lower(text), ' '), i.i) AS tok "
        "FROM documents, generate_series(1, 1024) i(i) "
        "WHERE i.i <= len(string_split(lower(text), ' ')))",
        "toks AS (SELECT doc, tok, row_number() OVER "
        "(PARTITION BY doc ORDER BY wi0) - 1 AS wi FROM toks0 "
        "WHERE tok <> '')",
        "gramt AS (SELECT doc, wi AS gi, tok || ' ' || lead(tok,1) OVER w "
        "|| ' ' || lead(tok,2) OVER w AS g FROM toks "
        "WINDOW w AS (PARTITION BY doc ORDER BY wi) "
        "QUALIFY lead(tok,2) OVER w IS NOT NULL)",
        "gbytes AS (SELECT doc, gi, length(g) AS gl, i.i AS i, "
        "CASE WHEN i.i < length(g) THEN "
        "CAST(ord(substr(g, i.i + 1, 1)) AS BIGINT) ELSE 0 END AS b "
        "FROM gramt, generate_series(0, 63) i(i) "
        "WHERE i.i < 8 * ((length(g) + 7) // 8))",
        "gwords0 AS (SELECT doc, gi, ANY_VALUE(gl) AS gl, i // 8 AS m, "
        "CAST(SUM(b * (1::BIGINT << (8 * CAST(i % 8 AS INT)))) AS HUGEINT) "
        "AS wv FROM gbytes GROUP BY doc, gi, i // 8)",
        f"posh(m, ph) AS (VALUES {posh_vals})",
        f"gwords1 AS (SELECT g.doc, g.gi, g.gl, g.m, "
        f"{_fp_xor64('g.wv', 'p.ph')} AS q "
        "FROM gwords0 g JOIN posh p ON p.m = g.m)",
    ]
    prev = "gwords1"
    for j, (name, expr) in enumerate(_fp_splitmix_steps("q", "qh", "w")):
        chain.append(f"gw_{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"gw_{j}"
    chain.append(
        f"ghx AS (SELECT doc, gi, ANY_VALUE(gl) AS gl, "
        f"{_fp_tohuge('bit_xor(' + _fp_tobig('qh') + ')')} AS hx "
        f"FROM {prev} GROUP BY doc, gi)")
    prev = "ghx"
    for j, (name, expr) in enumerate(
            _fp_splitmix_steps("CAST(gl AS HUGEINT)", "lh", "l")):
        chain.append(f"gl_{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"gl_{j}"
    chain.append(f"gh64 AS (SELECT doc, gi, {_fp_xor64('hx', 'lh')} "
                 f"AS h64 FROM {prev})")
    prev = "gh64"
    for j, (name, expr) in enumerate(_fp_splitmix_steps("h64", "h3", "f")):
        chain.append(f"g3_{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"g3_{j}"
    chain += [
        f"h3t AS (SELECT doc, gi, h3 FROM {prev})",
        "gcnt AS (SELECT doc, COUNT(*) AS n FROM h3t GROUP BY doc)",
        "wins AS (SELECT g.doc, s.w, MIN(g.h3) AS wmin FROM h3t g "
        "JOIN gcnt c ON c.doc = g.doc, generate_series(0, 1023) s(w) "
        "WHERE (c.n >= 8 AND s.w <= c.n - 8 AND "
        "g.gi BETWEEN s.w AND s.w + 7) OR (c.n < 8 AND s.w = g.gi) "
        "GROUP BY g.doc, s.w)",
        "dmins AS (SELECT DISTINCT doc, wmin FROM wins)",
        f"fp AS (SELECT doc, "
        f"{_fp_tobig(_fp_tohuge('bit_xor(' + _fp_tobig('wmin') + ')') + ' - 9223372036854775808::HUGEINT')} "
        "AS fingerprint FROM dmins GROUP BY doc)",
    ]
    return ("WITH " + ",\n".join(chain)
            + "\nSELECT d.doc_id, COALESCE(fp.fingerprint, 0) "
            "AS fingerprint FROM documents d "
            "LEFT JOIN fp ON fp.doc = d.doc_id")


SQL_DEDUP_MINHASH_DOCS = _build_sql_dedup_minhash_docs()
SQL_DEDUP_SIMHASH_DOCS = _build_sql_dedup_simhash_docs()
SQL_TEXT_FINGERPRINT_DOCS = _build_sql_text_fingerprint_docs()


# ======================================================================
# ---------- round 5 (third sitting): dedup clustering + windows --------
# ======================================================================


def dedup_components_q(sf_dir: str):
    """Near-dup CLUSTERING: connected components over a pair set — the
    step after minhash/simhash emits pairs (keep min-id doc per
    component; Lee et al. 2022 §3).  The edge set here is derived from
    document ids with integer arithmetic (the oracle-izing recipe):
    edge (d-1, d) exists iff splitmix64(d) % 3 < 2, which chains
    consecutive docs into runs — the WORST case (max diameter) for label
    propagation, and closed-form for SQL (component = running max of
    break points).  The engine path is the fully generic
    ``dedup.connected_components`` (driver pointer-jumping ≤2M edges,
    Hash-to-Min rounds beyond)."""
    from .dedup import _splitmix, connected_components
    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(b: pa.Table) -> pa.Table:
        d = np.asarray(b.column("doc_id"), np.int64)
        m = (d > 0) & ((_splitmix(d.astype(np.uint64)) % np.uint64(3))
                       < np.uint64(2))
        return pa.table({"id_a": pa.array(d[m] - 1, pa.int64()),
                         "id_b": pa.array(d[m], pa.int64())})

    return connected_components(ds.map_batches(edges,
                                               batch_format="pyarrow"))


def _sql_dedup_components() -> str:
    from .sketches import _sm_hugeint_select
    # edge (d-1, d) iff hv(d)%3 < 2; node d starts a run iff d = 0 or no
    # edge arrives from d-1; component(d) = running max of run starts;
    # output only nodes with >= 1 incident edge (operator semantics).
    return f"""
WITH s AS ({_sm_hugeint_select('documents', 'doc_id')}),
e AS (SELECT doc_id AS d,
             CASE WHEN hv % 3 < 2 AND doc_id > 0 THEN 1 ELSE 0 END AS e_prev
      FROM s),
c AS (SELECT d, e_prev,
             lead(e_prev, 1, 0) OVER (ORDER BY d) AS e_next,
             max(CASE WHEN e_prev = 0 THEN d END) OVER
                 (ORDER BY d ROWS UNBOUNDED PRECEDING) AS comp
      FROM e)
SELECT d AS node, comp AS component FROM c WHERE e_prev = 1 OR e_next = 1
"""


def q_window_funcs(sf_dir: str):
    """Window functions per partition: LAG, row_number and a running sum
    over each customer's orders in date order — the per-key ordered-scan
    shape SQL engines express with OVER (PARTITION BY … ORDER BY …).
    Shuffle shape: one groupby(custkey); inside each group the scan is a
    vectorized cumsum (no per-row Python).  No per-batch combiner is
    possible (running sums need the whole group), so the group shuffle IS
    the operator — `grouped_map_groups` keeps the measured-size driver
    path for small inputs.  Money stays in scaled int64 cents until the
    per-row division (CLAUDE.md parity rule); timestamps exchange as
    epoch microseconds and print via strftime."""
    from .shuffle_utils import grouped_map_groups
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def per_group(g: pa.Table) -> pa.Table:
        ts = np.asarray(g.column("o_orderdate").cast(pa.int64()), np.int64)
        ok = np.asarray(g.column("o_orderkey"), np.int64)
        tp = np.asarray(g.column("o_totalprice"), np.float64)
        order = np.lexsort((ok, ts))
        ts, ok = ts[order], ok[order]
        cents = np.floor(tp[order] * 100 + 0.5).astype(np.int64)
        gap_us = np.empty(ts.size, np.int64)
        gap_us[0] = -1
        gap_us[1:] = ts[1:] - ts[:-1]
        run = np.cumsum(cents)
        g = g.take(pa.array(order, pa.int64()))
        return pa.table({
            "o_orderkey": g.column("o_orderkey"),
            "o_custkey": g.column("o_custkey"),
            "rn": pa.array(np.arange(1, ts.size + 1), pa.int64()),
            "gap_us": pa.array(gap_us, pa.int64()),
            "run_sum": pa.array(run / 100.0, pa.float64()),
        })

    return grouped_map_groups(ds, "o_custkey", per_group)


SQL_WINDOW_FUNCS = """
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       COALESCE(epoch_us(o_orderdate) - lag(epoch_us(o_orderdate)) OVER w,
                -1) AS gap_us,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) / 100.0 AS run_sum
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_pivot(sf_dir: str):
    """PIVOT (crosstab): order revenue by order year × priority class,
    priorities spread across columns — conditional aggregation, the
    shuffle-light pivot shape: per-batch partial crosstab in one
    ``pa.Table.group_by`` (column set FIXED by the operator), then a
    measured-size grouped-sum merge over years × batches partials.  No
    join, no per-row Python; money in scaled int64 cents until the final
    division."""
    ds = _read(sf_dir, "orders",
               ["o_orderdate", "o_orderpriority", "o_totalprice"])

    classes = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    vals = ["rev_" + c[2:].lower() for c in classes] + ["rev_other"]

    def partial(b: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(b.column("o_orderdate")), pa.int64())
        pri = b.column("o_orderpriority")
        cents = pa.array(np.floor(np.asarray(b.column("o_totalprice"),
                                             np.float64) * 100 + 0.5)
                         .astype(np.int64))
        zero = pa.scalar(0, pa.int64())
        cols = {"yr": yr}
        for cl in classes:
            cols["rev_" + cl[2:].lower()] = pc.if_else(
                pc.equal(pri, pa.scalar(cl)), cents, zero)
        cols["rev_other"] = pc.if_else(
            pc.is_in(pri, value_set=pa.array(classes)), zero, cents)
        t = pa.table(cols)
        g = t.group_by(["yr"]).aggregate([(c, "sum") for c in vals])
        return pa.table({"yr": g.column("yr"),
                         **{c: g.column(c + "_sum") for c in vals}})

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["yr"], [(c, "sum") for c in vals])
    if not isinstance(agg, pa.Table):
        agg = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in agg.iter_batches(batch_format="pyarrow"))
    out = {"yr": agg.column("yr")}
    for c in vals:
        out[c] = pa.array(np.asarray(agg.column(c), np.int64) / 100.0,
                          pa.float64())
    return pa.table(out)


SQL_PIVOT = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderpriority = '1-URGENT'), 0)
           / 100.0 AS rev_urgent,
       COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderpriority = '2-HIGH'), 0)
           / 100.0 AS rev_high,
       COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderpriority = '3-MEDIUM'), 0)
           / 100.0 AS rev_medium,
       COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderpriority NOT IN
                        ('1-URGENT', '2-HIGH', '3-MEDIUM')), 0)
           / 100.0 AS rev_other
FROM orders
GROUP BY yr
"""


def q_unpivot(sf_dir: str):
    """UNPIVOT (melt): the pivot's wide year × priority revenue table back
    to long (yr, priority, rev) rows — a stateless per-batch column→row
    expansion (each input row becomes a fixed fan of output rows; zero
    shuffle beyond the pivot it consumes).  Zero-revenue cells are kept —
    UNPIVOT INCLUDE NULLS semantics, deterministic row count."""
    wide = q_pivot(sf_dir)          # small pa.Table (one row per year)
    names = ["rev_urgent", "rev_high", "rev_medium", "rev_other"]
    n = wide.num_rows
    yr = np.repeat(np.asarray(wide.column("yr"), np.int64), len(names))
    pri = pa.array(names * n, pa.string())
    rev = np.stack([np.asarray(wide.column(c), np.float64)
                    for c in names], axis=1).reshape(-1)
    return pa.table({"yr": pa.array(yr, pa.int64()), "priority": pri,
                     "rev": pa.array(rev, pa.float64())})


SQL_UNPIVOT = f"""
WITH wide AS ({SQL_PIVOT})
SELECT yr, name AS priority, value AS rev
FROM wide UNPIVOT (value FOR name IN (rev_urgent, rev_high,
                                      rev_medium, rev_other))
"""


def q_group_corr(sf_dir: str):
    """Per-group Pearson correlation (quantity vs discount per return
    flag) from EXACT integer moments: per-batch int64 sums of x, y, x²,
    y², xy (x = quantity units ≤50, y = discount percent ≤10 — all
    products bounded far below 2^63, so the distributed sum is exact and
    order-independent), measured-size grouped merge, ONE final float
    expression — identical int64 inputs through identical libm on both
    engines (DuckDB's own corr() walks a Welford float path whose last
    ulp depends on order; the moment replay does not)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b.column("l_quantity"), np.float64)
        x = np.floor(x + 0.5).astype(np.int64)
        y = np.asarray(b.column("l_discount"), np.float64)
        y = np.floor(y * 100 + 0.5).astype(np.int64)
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "n": pa.array(np.ones(x.size, np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxx": pa.array(x * x), "syy": pa.array(y * y),
                      "sxy": pa.array(x * y)})
        cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
        g = t.group_by(["l_returnflag"]).aggregate([(c, "sum")
                                                    for c in cols])
        return pa.table({"l_returnflag": g.column("l_returnflag"),
                         **{c: g.column(c + "_sum") for c in cols}})

    from .shuffle_utils import grouped_agg
    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["l_returnflag"], [(c, "sum") for c in cols])
    if not isinstance(agg, pa.Table):
        agg = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in agg.iter_batches(batch_format="pyarrow"))
    n = np.asarray(agg.column("n"), np.int64).astype(np.float64)
    sx = np.asarray(agg.column("sx"), np.int64).astype(np.float64)
    sy = np.asarray(agg.column("sy"), np.int64).astype(np.float64)
    sxx = np.asarray(agg.column("sxx"), np.int64).astype(np.float64)
    syy = np.asarray(agg.column("syy"), np.int64).astype(np.float64)
    sxy = np.asarray(agg.column("sxy"), np.int64).astype(np.float64)
    corr = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                                  * np.sqrt(n * syy - sy * sy))
    return pa.table({"l_returnflag": agg.column("l_returnflag"),
                     "n": pa.array(n.astype(np.int64)),
                     "corr_qty_disc": pa.array(corr, pa.float64())})


SQL_GROUP_CORR = """
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_discount * 100) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_discount * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) AS syy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
          * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           AS corr_qty_disc
FROM m
"""


def q_rollup(sf_dir: str):
    """GROUP BY ROLLUP (grouping sets): order counts + revenue by
    (status, priority), with per-status subtotals and a grand total —
    aggregate ONCE at the finest level (per-batch partial + measured-size
    merge over the bounded status×priority domain), then roll the finer
    grouped table up in-driver (pa.Table.group_by over ≤ |domain| rows):
    zero extra shuffles, the classic partial-reuse shape.  NULL group
    markers print as 'ALL' (hash-stable on both engines)."""
    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pa.array(np.floor(np.asarray(b.column("o_totalprice"),
                                             np.float64) * 100 + 0.5)
                         .astype(np.int64))
        t = pa.table({"status": b.column("o_orderstatus"),
                      "priority": b.column("o_orderpriority"),
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "cents": cents})
        g = t.group_by(["status", "priority"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return pa.table({"status": g.column("status"),
                         "priority": g.column("priority"),
                         "n": g.column("n_sum"),
                         "cents": g.column("cents_sum")})

    from .shuffle_utils import grouped_agg
    fine = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["status", "priority"],
                       [("n", "sum"), ("cents", "sum")])
    if not isinstance(fine, pa.Table):
        fine = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in fine.iter_batches(batch_format="pyarrow"))

    def level(tbl: pa.Table, keys: list) -> pa.Table:
        if keys:
            g = tbl.group_by(keys).aggregate([("n", "sum"),
                                              ("cents", "sum")])
            n, c = g.column("n_sum"), g.column("cents_sum")
        else:
            g = None
            n = pa.array([pc.sum(tbl.column("n")).as_py()], pa.int64())
            c = pa.array([pc.sum(tbl.column("cents")).as_py()], pa.int64())
        rows = len(n)
        out = {
            "status": (g.column("status") if g and "status" in keys
                       else pa.array(["ALL"] * rows)),
            "priority": (g.column("priority") if g and "priority" in keys
                         else pa.array(["ALL"] * rows)),
            "n": n,
        }
        out["revenue"] = pa.array(
            np.asarray(c, np.int64) / 100.0, pa.float64())
        return pa.table(out)

    return pa.concat_tables([level(fine, ["status", "priority"]),
                             level(fine, ["status"]),
                             level(fine, [])])


SQL_ROLLUP = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_profile(sf_dir: str):
    """Column profiler (`describe` / data-quality pass): one row per
    column with count, nulls, exact n_distinct, min, max — the profiling
    primitive every ingest pipeline runs first.  Shapes: count/null/min/
    max fold per batch then merge (tiny partials); exact distinct counts
    go per-batch-unique → one distributed dedup count per column (the
    unavoidable shuffle, bounded by the value domain, NOT the row
    count).  Values exchange as strings so one schema covers all column
    types; numeric min/max print via a fixed %.2f grid."""
    cols = ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    ds = _read(sf_dir, "orders", cols)

    def fmt(v, typ):
        if typ == "f":
            return f"{v:.2f}"
        return str(v)

    def partial(b: pa.Table) -> pa.Table:
        # min/max merge in the value's OWN domain (numeric for floats —
        # a lexicographic merge of formatted numbers picks "11110" over
        # "1320"); formatting happens once, after the final merge.
        rows = []
        for c in cols:
            col = b.column(c)
            is_f = pa.types.is_floating(col.type)
            valid = col.drop_null()
            has = len(valid) > 0
            rows.append({
                "col": c,
                "n": b.num_rows,
                "nulls": b.num_rows - len(valid),
                "vmin_s": ("\x7f" if is_f or not has
                           else str(pc.min(valid).as_py())),
                "vmax_s": ("" if is_f or not has
                           else str(pc.max(valid).as_py())),
                "vmin_f": (float(pc.min(valid).as_py())
                           if is_f and has else np.inf),
                "vmax_f": (float(pc.max(valid).as_py())
                           if is_f and has else -np.inf),
            })
        return pa.table({k: pa.array([r[k] for r in rows])
                         for k in ("col", "n", "nulls", "vmin_s", "vmax_s",
                                   "vmin_f", "vmax_f")})

    from .shuffle_utils import grouped_agg
    base = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["col"], [("n", "sum"), ("nulls", "sum"),
                                 ("vmin_s", "min"), ("vmax_s", "max"),
                                 ("vmin_f", "min"), ("vmax_f", "max")])
    if not isinstance(base, pa.Table):
        base = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in base.iter_batches(batch_format="pyarrow"))

    # exact distinct per column: per-batch unique values (domain-bounded
    # partials) -> one grouped count over (col, value)
    def uniq(b: pa.Table) -> pa.Table:
        outc, outv = [], []
        for c in cols:
            col = b.column(c)
            typ = "f" if pa.types.is_floating(col.type) else "s"
            for v in pc.unique(col.drop_null()).to_pylist():
                outc.append(c)
                outv.append(fmt(v, typ))
        return pa.table({"col": pa.array(outc), "val": pa.array(outv)})

    dis = grouped_agg(ds.map_batches(uniq, batch_format="pyarrow")
                      .map_batches(lambda b: b.append_column(
                          "one", pa.array(np.ones(b.num_rows, np.int64))),
                          batch_format="pyarrow"),
                      ["col", "val"], [("one", "min")])
    if not isinstance(dis, pa.Table):
        dis = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in dis.iter_batches(batch_format="pyarrow"))
    nd = dis.group_by(["col"]).aggregate([("val", "count_distinct")])
    ndmap = dict(zip(nd.column("col").to_pylist(),
                     np.asarray(nd.column("val_count_distinct"),
                                np.int64).tolist()))
    order = np.argsort(np.asarray(base.column("col")))
    base = base.take(pa.array(order, pa.int64()))
    names = base.column("col").to_pylist()
    fmins = np.asarray(base.column("vmin_f"), np.float64)
    fmaxs = np.asarray(base.column("vmax_f"), np.float64)
    smins = base.column("vmin_s").to_pylist()
    smaxs = base.column("vmax_s").to_pylist()
    vmin = [f"{fmins[i]:.2f}" if np.isfinite(fmins[i]) else smins[i]
            for i in range(len(names))]
    vmax = [f"{fmaxs[i]:.2f}" if np.isfinite(fmaxs[i]) else smaxs[i]
            for i in range(len(names))]
    return pa.table({
        "col": base.column("col"),
        "n": base.column("n"),
        "nulls": base.column("nulls"),
        "n_distinct": pa.array([ndmap[c] for c in names], pa.int64()),
        "vmin": pa.array(vmin, pa.string()),
        "vmax": pa.array(vmax, pa.string()),
    })


SQL_PROFILE = """
SELECT col, n, nulls, n_distinct, vmin, vmax FROM (
  SELECT 'o_orderstatus' AS col, count(*) AS n,
         count(*) - count(o_orderstatus) AS nulls,
         count(DISTINCT o_orderstatus) AS n_distinct,
         min(o_orderstatus) AS vmin, max(o_orderstatus) AS vmax
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
         count(DISTINCT o_orderpriority),
         min(o_orderpriority), max(o_orderpriority)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
         count(DISTINCT printf('%.2f', o_totalprice)),
         printf('%.2f', min(o_totalprice)), printf('%.2f', max(o_totalprice))
  FROM orders
)
"""


def text_tfidf_q(sf_dir: str):
    """Top TF-IDF term per document over the real corpus — the salient-
    term extractor (see text.tfidf_top_term for the two-exchange scale
    shape: df falls out of the token co-shuffle, no join)."""
    from .text import tfidf_top_term
    return tfidf_top_term(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_TFIDF = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks WHERE token != ''
  GROUP BY doc_id, token
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.token,
         floor(tf.tf * ln(n.n / df.df) * 1e6 + 0.5) / 1e6 AS tfidf
  FROM tf JOIN df USING (token), n
)
SELECT doc_id, token, tfidf FROM s
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, token ASC) = 1
"""


def dedup_ngram_docs_q(sf_dir: str):
    """n-gram Jaccard near-dup over the REAL documents corpus (threshold
    0.8) — completes the charter's 'each dedup family with an oracle on
    the documents table' set.  Same LSH candidate chain as minhash_docs
    (5-gram shingles, 64 sigs, 16 xor-fold bands, salted buckets, [2,64]
    window, first-fully-equal-band exactly-once) but the emitted value is
    the EXACT shingle-set Jaccard, not the signature estimate."""
    from .dedup import ngram_jaccard_pairs
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.8)


def _build_sql_dedup_ngram_docs() -> str:
    """dedup.ngram_jaccard_pairs over documents, end to end: the
    minhash-docs candidate chain verbatim (the two pipelines share
    shingle_hashes/minhash_signature/bucketing), then exact set Jaccard —
    |A∩B| via a shingle self-join restricted to surviving pairs,
    |A∪B| = na + nb − inter, one double division on both engines.
    First-band rule WITHOUT the minhash coalesce: ngram's verify demands
    some band fully equal (band_eq.any()), so fb stays NULL-filtered."""
    from .dedup import _splitmix
    seeds = _splitmix(np.arange(1, 65, dtype=np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15))
    salts = _splitmix(np.arange(16, dtype=np.uint64))
    seed_vals = ", ".join(f"({j}, {int(seeds[j])}::HUGEINT)"
                          for j in range(64))
    salt_vals = ", ".join(f"({t}, {int(salts[t])}::HUGEINT)"
                          for t in range(16))
    chain = _docs_shingle_ctes(5)
    chain += [
        f"seeds(j, seed) AS (VALUES {seed_vals})",
        f"salts(t, salt) AS (VALUES {salt_vals})",
        f"sigs AS (SELECT doc, s.j, MIN({_fp_xor64('sh', 's.seed')}) AS v "
        "FROM shingles, seeds s GROUP BY doc, s.j)",
        f"bh AS (SELECT doc, j // 4 AS t, "
        f"{_fp_tohuge(f'bit_xor({_fp_tobig(chr(118))})')} AS bhv "
        "FROM sigs GROUP BY doc, j // 4)",
        "bh1 AS (SELECT bh.doc, bh.t, (bhv + salt) % "
        f"{_U64} AS x FROM bh JOIN salts ON salts.t = bh.t)",
    ]
    prev = "bh1"
    for j, (name, expr) in enumerate(_fp_splitmix_steps("x", "bh2", "q")):
        chain.append(f"bq_{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"bq_{j}"
    chain += [
        f"buckets AS (SELECT doc, t, CAST(bh2 // 256::HUGEINT AS BIGINT) "
        f"* 16 + t AS bucket FROM {prev})",
        "bsz AS (SELECT bucket, COUNT(*) AS c FROM buckets GROUP BY bucket)",
        "cand AS (SELECT a.doc AS da, b.doc AS db, a.t FROM buckets a "
        "JOIN buckets b ON b.bucket = a.bucket AND b.doc > a.doc "
        "JOIN bsz ON bsz.bucket = a.bucket WHERE bsz.c BETWEEN 2 AND 64)",
        "paireq AS (SELECT c.da, c.db, c.t, sa.j // 4 AS bb, "
        "CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END AS e FROM cand c "
        "JOIN sigs sa ON sa.doc = c.da "
        "JOIN sigs sb ON sb.doc = c.db AND sb.j = sa.j)",
        "bandeq AS (SELECT da, db, t, bb, SUM(e) AS beq FROM paireq "
        "GROUP BY da, db, t, bb)",
        "pairstat AS (SELECT da, db, t, "
        "MIN(CASE WHEN beq = 4 THEN bb END) AS fb "
        "FROM bandeq GROUP BY da, db, t)",
        "okpair AS (SELECT da, db FROM pairstat "
        "WHERE fb IS NOT NULL AND t = fb)",
        "nsh AS (SELECT doc, COUNT(*) AS n FROM shingles GROUP BY doc)",
        "inter AS (SELECT p.da, p.db, COUNT(*) AS i FROM okpair p "
        "JOIN shingles sa ON sa.doc = p.da "
        "JOIN shingles sb ON sb.doc = p.db AND sb.sh = sa.sh "
        "GROUP BY p.da, p.db)",
    ]
    return ("WITH " + ",\n".join(chain)
            + "\nSELECT o.da AS id_a, o.db AS id_b, "
            "CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i) AS jaccard "
            "FROM okpair o JOIN inter i ON i.da = o.da AND i.db = o.db "
            "JOIN nsh na ON na.doc = o.da JOIN nsh nb ON nb.doc = o.db "
            "WHERE CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i) >= 0.8")


SQL_DEDUP_NGRAM_DOCS = _build_sql_dedup_ngram_docs()


def text_decontaminate_q(sf_dir: str):
    """Train/test decontamination over the REAL documents corpus: 10%
    deterministic test split (splitmix threshold — the q_hash_sample
    sampler), 7-char-gram containment of each test doc against the train
    shingle vocabulary.  Output: every test doc with its distinct-shingle
    count, matched count, and half-up-6dp contamination ratio (never
    empty — each test doc yields a row, so the schema survives)."""
    from .dedup import contamination
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return contamination(docs, k=7, rate_num=1, rate_den=10)


def _build_sql_text_decontaminate() -> str:
    """dedup.contamination end to end: the shared 7-gram shingle chain
    (base-257 polynomial — 257^7 < 2^63 so the gram fits BIGINT — then
    splitmix64 in HUGEINT, DISTINCT per doc), the splitmix hash-threshold
    split, a LEFT JOIN against the train vocabulary, and the half-up-6dp
    ratio (floor(x*1e6+0.5)/1e6 — Python round() is half-even, differs)."""
    from .sketches import _sm_hugeint_select
    thr = (1 << 64) // 10 - 1
    chain = _docs_shingle_ctes(7)
    chain += [
        "split AS (SELECT doc_id AS doc, hv FROM "
        f"({_sm_hugeint_select('documents', 'doc_id')}))",
        f"tst AS (SELECT doc FROM split WHERE hv <= {thr}::HUGEINT)",
        "trainsh AS (SELECT DISTINCT sh FROM shingles "
        "WHERE doc NOT IN (SELECT doc FROM tst))",
        "testsh AS (SELECT s.doc, s.sh FROM shingles s JOIN tst USING (doc))",
        "agg AS (SELECT doc, COUNT(*) AS n, "
        "SUM(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END) AS m "
        "FROM testsh LEFT JOIN trainsh t ON t.sh = testsh.sh GROUP BY doc)",
    ]
    return ("WITH " + ",\n".join(chain)
            + "\nSELECT doc AS doc_id, CAST(n AS BIGINT) AS n_shingles, "
            "CAST(m AS BIGINT) AS n_matched, "
            "floor(CAST(m AS DOUBLE) / n * 1000000.0 + 0.5) / 1000000.0 "
            "AS contamination FROM agg")


SQL_TEXT_DECONTAMINATE = _build_sql_text_decontaminate()


def text_seq_pack_q(sf_dir: str, capacity: int = 512):
    """Sequence packing over the documents corpus (GPT-style concat-and-
    chunk): global token prefix sum in doc_id order via the distributed
    range-bucket carry scheme, then fixed 512-token bin boundaries."""
    from .text import sequence_pack
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return sequence_pack(docs, capacity=capacity)


SQL_TEXT_SEQ_PACK = r"""
WITH w AS (
  SELECT doc_id,
         greatest(1, len(list_filter(string_split_regex(text, '\s+'),
                                     x -> len(x) > 0))) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_off
  FROM w)
SELECT doc_id, n_tokens, start_off,
       start_off // 512 AS bin_first,
       (start_off + n_tokens - 1) // 512 AS bin_last,
       (start_off + n_tokens - 1) // 512 - start_off // 512 + 1 AS n_bins
FROM s
"""


def text_repetition_q(sf_dir: str):
    """Within-doc repetition quality signals (Gopher-style) over the real
    corpus: top-2-gram fraction + duplicate-2-gram fraction, half-up 6dp."""
    from .text import repetition_score
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(repetition_score, batch_format="pyarrow")


SQL_TEXT_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS l
  FROM documents),
tl AS (SELECT doc_id, l, len(l) AS nt FROM toks),
pairs AS (
  SELECT doc_id, l[i.i] || ' ' || l[i.i + 1] AS g
  FROM tl, generate_series(1, 4095) i(i)
  WHERE i.i <= nt - 1),
cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM pairs GROUP BY doc_id, g),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(MAX(c) AS BIGINT) AS mx,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM cnt GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n, 0) AS n_2grams,
       COALESCE(floor(CAST(a.mx AS DOUBLE) / a.n * 1000000.0 + 0.5)
                / 1000000.0, 0.0) AS top_2gram_frac,
       COALESCE(floor(CAST(a.n - a.nd AS DOUBLE) / a.n * 1000000.0 + 0.5)
                / 1000000.0, 0.0) AS dup_2gram_frac
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def emb_kmeans_q(sf_dir: str):
    """Distributed Lloyd k-means (k=4, 3 iterations) over the embeddings
    table — the iterative-algorithm operator class, oracle-EXACT via
    quantized int64 arithmetic (see ann.kmeans_assign)."""
    from .ann import kmeans_assign
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_assign(emb, k=4, iters=3)


def _build_sql_emb_kmeans(k: int = 4, iters: int = 3,
                          scale: int = 1 << 20, dim: int = 64) -> str:
    """ann.kmeans_assign replayed exactly: floor(x·2^20) int64 coords,
    exact integer squared distances, argmin ties to the smallest cluster
    (ORDER BY dist, cluster), truncating `//` centroid update (the numpy
    side converts its floor-division explicitly), empty clusters keep
    their centroid via LEFT JOIN + COALESCE, init = k smallest vec_ids."""
    chain = [
        f"v AS (SELECT vec_id, i.i AS d, CAST(floor(embedding[i.i + 1] * "
        f"{scale}e0) AS BIGINT) AS q FROM embeddings, "
        f"generate_series(0, {dim - 1}) i(i))",
        "initids AS (SELECT vec_id, CAST(row_number() OVER "
        "(ORDER BY vec_id) - 1 AS BIGINT) AS cluster FROM "
        f"(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))",
        "c0 AS (SELECT ii.cluster, v.d, v.q FROM initids ii "
        "JOIN v ON v.vec_id = ii.vec_id)",
    ]
    for t in range(iters):
        chain += [
            f"a{t} AS (SELECT vec_id, cluster FROM ("
            "SELECT v.vec_id, c.cluster, "
            "SUM((v.q - c.q) * (v.q - c.q)) AS dist "
            f"FROM v JOIN c{t} c ON c.d = v.d GROUP BY v.vec_id, c.cluster) "
            "QUALIFY row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dist, cluster) = 1)",
            f"s{t} AS (SELECT a.cluster, v.d, SUM(v.q) AS sq, "
            f"COUNT(*) AS n FROM a{t} a JOIN v ON v.vec_id = a.vec_id "
            "GROUP BY a.cluster, v.d)",
            f"c{t + 1} AS (SELECT c.cluster, c.d, "
            "CAST(COALESCE(s.sq // s.n, c.q) AS BIGINT) AS q "
            f"FROM c{t} c LEFT JOIN s{t} s ON s.cluster = c.cluster "
            "AND s.d = c.d)",
        ]
    return ("WITH " + ",\n".join(chain)
            + "\nSELECT vec_id, cluster, CAST(dist AS BIGINT) AS dist2 "
            "FROM (SELECT v.vec_id, c.cluster, "
            "SUM((v.q - c.q) * (v.q - c.q)) AS dist "
            f"FROM v JOIN c{iters} c ON c.d = v.d "
            "GROUP BY v.vec_id, c.cluster) "
            "QUALIFY row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dist, cluster) = 1")


SQL_EMB_KMEANS = _build_sql_emb_kmeans()


def text_chunks_q(sf_dir: str, window: int = 64, stride: int = 48):
    """Overlapping token chunking (RAG/window layout) over the corpus."""
    from .text import chunk_tokens
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(
        lambda b: chunk_tokens(b, window=window, stride=stride),
        batch_format="pyarrow")


SQL_TEXT_CHUNKS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS l
  FROM documents),
tl AS (SELECT doc_id, l, greatest(len(l), 1) AS n FROM toks)
SELECT doc_id, i.i AS chunk_id, i.i * 48 AS tok_start,
       len(l[i.i * 48 + 1 : i.i * 48 + 64]) AS n_chunk_tokens,
       COALESCE(array_to_string(l[i.i * 48 + 1 : i.i * 48 + 64], ' '), '')
           AS chunk_text
FROM tl, generate_series(0, 4095) i(i)
WHERE i.i * 48 < n
"""


def q_stratified_sample(sf_dir: str):
    """Class-rebalancing stratified sampler: a DIFFERENT deterministic
    hash-threshold rate per stratum (o_orderstatus F→1/50, O→1/10, P→1/2)
    — the downsample-the-majority-class op of training pipelines.  One
    stateless map_batches filter, zero shuffle, partition-invariant and
    reproducible (splitmix64 threshold per row, like q_hash_sample)."""
    from .dedup import _splitmix
    rates = {"F": 50, "O": 10, "P": 2}
    thr = {s: np.uint64((1 << 64) // d - 1) for s, d in rates.items()}

    def keep(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("o_orderkey"), np.int64).astype(np.uint64)
        hv = _splitmix(k)
        st = b.column("o_orderstatus").to_numpy(zero_copy_only=False)
        lim = np.array([thr.get(s, np.uint64(0)) for s in st], np.uint64)
        out = b.filter(pa.array(hv <= lim))
        return _round_col(out, "o_totalprice", 2)

    return _read(sf_dir, "orders",
                 ["o_orderkey", "o_orderstatus", "o_totalprice"]) \
        .map_batches(keep, batch_format="pyarrow")


def _sql_stratified_sample() -> str:
    from .sketches import _sm_hugeint_select
    cases = " ".join(
        f"WHEN '{s}' THEN {(1 << 64) // d - 1}::HUGEINT"
        for s, d in (("F", 50), ("O", 10), ("P", 2)))
    return (f"WITH s AS ({_sm_hugeint_select('orders', 'o_orderkey')}) "
            f"SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) "
            f"AS o_totalprice FROM s WHERE hv <= "
            f"CASE o_orderstatus {cases} ELSE 0::HUGEINT END")


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


def q_outer_join(sf_dir: str):
    """FULL OUTER join completing the join-type matrix (inner/left/semi/
    anti/asof/range already covered): every-3rd customer vs per-customer
    order aggregates — both exclusive sides are naturally non-empty
    (filtered-out customers still hold orders; 1/3 of TPC-H customers hold
    none).  Money summed in scaled int64 cents, divided once at the end."""
    from ray.data.aggregate import Count, Sum
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def third(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("c_custkey"), np.int64)
        return b.filter(pa.array(k % 3 == 0))

    cust3 = cust.map_batches(third, batch_format="pyarrow")

    def cents(b: pa.Table) -> pa.Table:
        p = np.asarray(b.column("o_totalprice"), np.float64)
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "cents": pa.array(np.floor(p * 100 + 0.5).astype(np.int64))})

    agg = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(cents, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Count(), Sum("cents"))

    j = cust3.join(agg, join_type="full_outer",
                   num_partitions=_join_partitions(),
                   on=("c_custkey",), right_on=("o_custkey",))

    def finish(b: pa.Table) -> pa.Table:
        # Ray's outer join coalesces the key into the LEFT key column;
        # the customer-side indicator survives via c_acctbal validity
        # (never NULL for a real TPC-H customer row)
        key = b.column("c_custkey").cast(pa.int64())
        bal0 = b.column("c_acctbal")
        bal = pc.coalesce(bal0, pa.scalar(0.0))
        n = pc.coalesce(b.column("count()"), pa.scalar(0)).cast(pa.int64())
        c = pc.coalesce(b.column("sum(cents)"), pa.scalar(0)).cast(pa.int64())
        tp = pc.divide(c.cast(pa.float64()), 100.0)
        has = pc.cast(pc.is_valid(bal0), pa.int64())
        return pa.table({"custkey": key,
                         "acctbal": pc.round(
                             bal, ndigits=2,
                             round_mode="half_towards_infinity"),
                         "has_cust": has,
                         "n_orders": n,
                         "total_price": tp})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_OUTER_JOIN = """
WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0),
o AS (SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey)
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       COALESCE(round(c.c_acctbal, 2), 0.0) AS acctbal,
       CAST(c.c_custkey IS NOT NULL AS BIGINT) AS has_cust,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(CAST(o.cents AS DOUBLE) / 100.0, 0.0) AS total_price
FROM c FULL JOIN o ON o.o_custkey = c.c_custkey
"""


def events_funnel_q(sf_dir: str):
    from .raster_ops import events_funnel
    return events_funnel(sf_dir, window_minutes=60)


SQL_EVENTS_FUNNEL = """
WITH s AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'signup'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
hit AS (SELECT DISTINCT s.event_id FROM s JOIN p
        ON p.user_id = s.user_id AND p.ts > s.ts
        AND epoch_us(p.ts) - epoch_us(s.ts) <= 3600000000)
SELECT s.user_id, COUNT(*) AS n_signups,
       CAST(SUM(CASE WHEN h.event_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_conversions,
       floor(CAST(SUM(CASE WHEN h.event_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
           AS conv_rate
FROM s LEFT JOIN hit h ON h.event_id = s.event_id
GROUP BY s.user_id
"""


def events_outliers_q(sf_dir: str, z_thresh: float = 2.0):
    """Per-type z-score outlier flagging over the events stream — anomaly
    detection from EXACT integer moments (the q_group_corr recipe): values
    quantized to int64 cents, per-type n/Σx/Σx² folded map-side and merged
    measured-size, then one broadcast pass computes
    z = (x·n − Σx) / sqrt(n·Σx² − (Σx)²) with a single float division and
    sqrt — bit-identical on both engines because every input to the float
    stage is the same exact integer."""
    from ray.data.aggregate import Sum

    from .shuffle_utils import grouped_agg

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("value"), np.float64)
        xc = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table({"event_id": b.column("event_id"),
                         "event_type": b.column("event_type"),
                         "xc": pa.array(xc)})

    cds = ds.map_batches(cents, batch_format="pyarrow").materialize()

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "event_type": b.column("event_type"),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "s1": b.column("xc"),
            "s2": pa.array(np.asarray(b.column("xc"), np.int64) ** 2),
        }).group_by("event_type").aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "n": g.column("n_sum"), "s1": g.column("s1_sum"),
                         "s2": g.column("s2_sum")})

    mom = grouped_agg(cds.map_batches(partial, batch_format="pyarrow"),
                      ["event_type"],
                      [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
    if not isinstance(mom, pa.Table):
        mom = pa.concat_tables(list(mom.iter_batches(
            batch_format="pyarrow")))
    import math
    stats = {}
    for i in range(mom.num_rows):
        n = int(mom.column("n")[i].as_py())
        s1 = int(mom.column("s1")[i].as_py())
        s2 = int(mom.column("s2")[i].as_py())
        # exact python ints; float() rounds-to-nearest like CAST AS DOUBLE
        stats[mom.column("event_type")[i].as_py()] = \
            (n, s1, math.sqrt(float(n * s2 - s1 * s1)))

    def flag(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_pylist()
        xc = np.asarray(b.column("xc"), np.int64)
        ns = np.array([stats[t][0] for t in et], np.int64)
        s1 = np.array([stats[t][1] for t in et], np.int64)
        den = np.array([stats[t][2] for t in et], np.float64)
        z = (xc * ns - s1).astype(np.float64) / den
        keep = np.abs(z) > z_thresh
        zq = np.floor(z[keep] * 1e6 + 0.5) / 1e6
        t = b.filter(pa.array(keep))
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "zscore": pa.array(zq)})

    return cds.map_batches(flag, batch_format="pyarrow")


SQL_EVENTS_OUTLIERS = """
WITH c AS (SELECT event_id, event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
           FROM events),
m AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(xc) AS BIGINT) AS s1,
             CAST(SUM(xc * xc) AS BIGINT) AS s2
      FROM c GROUP BY event_type),
z AS (SELECT c.event_id, c.event_type,
             CAST(c.xc * m.n - m.s1 AS DOUBLE)
             / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)) AS zs
      FROM c JOIN m USING (event_type))
SELECT event_id, event_type,
       floor(zs * 1000000.0 + 0.5) / 1000000.0 AS zscore
FROM z WHERE abs(zs) > 2.0
"""


def events_retention_q(sf_dir: str):
    from .raster_ops import events_retention
    return events_retention(sf_dir)


SQL_EVENTS_RETENTION = """
WITH a AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
f AS (SELECT user_id, MIN(day) AS cohort FROM a GROUP BY user_id)
SELECT f.cohort AS cohort_day, a.day - f.cohort AS day_offset,
       COUNT(*) AS n_active
FROM a JOIN f USING (user_id)
GROUP BY f.cohort, a.day - f.cohort
"""


def events_transitions_q(sf_dir: str):
    from .raster_ops import events_transitions
    return events_transitions(sf_dir)


SQL_EVENTS_TRANSITIONS = """
WITH s AS (SELECT user_id, event_type AS type_a,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS type_b
           FROM events)
SELECT type_a, type_b, COUNT(*) AS n FROM s
WHERE type_b IS NOT NULL GROUP BY type_a, type_b
"""


def q_json_extract(sf_dir: str):
    """Semi-structured extraction over the events ``props`` JSON column —
    the one capability class the surface didn't yet exercise: pull the
    numeric field out with ONE vectorized Arrow regex kernel
    (pc.extract_regex — no Python row loop, no json.loads), then a
    map-side combined groupby over the bounded event-type domain."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        kv = pc.extract_regex(b.column("props"),
                              pattern='"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(kv, "k"), pa.int64())
        g = pa.table({"event_type": b.column("event_type"),
                      "n_events": pa.array(np.ones(b.num_rows, np.int64)),
                      "sum_k": k, "min_k": k, "max_k": k}) \
            .group_by("event_type").aggregate(
                [("n_events", "sum"), ("sum_k", "sum"),
                 ("min_k", "min"), ("max_k", "max")])
        return pa.table({"event_type": g.column("event_type"),
                         "n_events": g.column("n_events_sum"),
                         "sum_k": g.column("sum_k_sum"),
                         "min_k": g.column("min_k_min"),
                         "max_k": g.column("max_k_max")})

    from .shuffle_utils import grouped_agg
    out = grouped_agg(ds.map_batches(extract, batch_format="pyarrow"),
                      ["event_type"],
                      [("n_events", "sum"), ("sum_k", "sum"),
                       ("min_k", "min"), ("max_k", "max")])
    if isinstance(out, pa.Table):
        import ray.data as _rd
        return _rd.from_arrow(out)
    return out


SQL_JSON_EXTRACT = """
WITH k AS (SELECT event_type,
                  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                      AS k
           FROM events)
SELECT event_type, COUNT(*) AS n_events, CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM k GROUP BY event_type
"""


def q5_local_supplier(sf_dir: str):
    """TPC-H Q5 shape — the 6-table multi-join capstone: revenue by nation
    where the customer and the line's supplier share a nation inside one
    region, over a one-year order window.  Shape: the two DATA-sized sides
    (orders→customer, then ⋈lineitem, then ⋈supplier) go through hash
    joins; only the fixed-size nation⊂region set is broadcast (25/5 rows —
    supplier is NOT broadcast: it is SF-scaled).  Revenue is exact int64
    cents×(100−discount%) summed distributed, ONE division at the end."""
    from ray.data.aggregate import Sum
    lo = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64("1997-01-01").astype("datetime64[us]").astype(np.int64)

    nat = {r["n_nationkey"]: r["n_name"]
           for r in _read(sf_dir, "nation").take_all()}
    reg = {r["r_regionkey"] for r in _read(sf_dir, "region").take_all()
           if r["r_name"] == "ASIA"}
    asia = {r["n_nationkey"] for r in _read(sf_dir, "nation").take_all()
            if r["n_regionkey"] in reg}

    def owin(b: pa.Table) -> pa.Table:
        ts = np.asarray(b.column("o_orderdate").cast(pa.int64()), np.int64)
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey")}) \
            .filter(pa.array((ts >= lo) & (ts < hi)))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(owin, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"c_custkey": b.column("c_custkey"),
             "c_nationkey": b.column("c_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")
    oc = orders.join(cust, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=("o_custkey",), right_on=("c_custkey",))

    def li_rev(b: pa.Table) -> pa.Table:
        p = np.asarray(b.column("l_extendedprice"), np.float64)
        d = np.asarray(b.column("l_discount"), np.float64)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        d100 = np.floor(d * 100 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "rev": pa.array(cents * (100 - d100))})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(li_rev, batch_format="pyarrow")
    ol = li.join(oc.select_columns(["o_orderkey", "c_nationkey"]),
                 join_type="inner", num_partitions=_join_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey"),
             "s_nationkey": b.column("s_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")
    ols = ol.join(supp, join_type="inner",
                  num_partitions=_join_partitions(),
                  on=("l_suppkey",), right_on=("s_suppkey",))

    def local(b: pa.Table) -> pa.Table:
        cn = np.asarray(b.column("c_nationkey"), np.int64)
        sn = np.asarray(b.column("s_nationkey"), np.int64)
        keep = (cn == sn) & np.isin(cn, list(asia))
        t = b.filter(pa.array(keep))
        names = [nat[int(x)] for x in
                 np.asarray(t.column("c_nationkey"), np.int64)]
        g = pa.table({"n_name": pa.array(names, pa.string()),
                      "rev": t.column("rev")}) \
            .group_by("n_name").aggregate([("rev", "sum")])
        return pa.table({"n_name": g.column("n_name"),
                         "rev": g.column("rev_sum")})

    from .shuffle_utils import grouped_agg
    out = grouped_agg(ols.map_batches(local, batch_format="pyarrow"),
                      ["n_name"], [("rev", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        r = np.asarray(b.column("rev"), np.int64).astype(np.float64) / 1e4
        return pa.table({"n_name": b.column("n_name"),
                         "revenue": pa.array(r)})

    if isinstance(out, pa.Table):
        import ray.data as _rd
        return _rd.from_arrow(finish(out))
    return out.map_batches(finish, batch_format="pyarrow")


SQL_Q5_LOCAL_SUPPLIER = """
SELECT n_name,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def graph_pagerank_q(sf_dir: str):
    """Distributed PageRank over a derived customer graph (node
    v → (v² + v·m + 7) mod N for m ∈ {31, 73, 137}; the quadratic term
    makes in-degrees non-uniform so scores genuinely spread) — the
    iterative-join operator class, oracle-EXACT via scaled-int64
    truncating arithmetic (see pipelines/graph.py; unrolled-CTE replay
    like emb_kmeans)."""
    from .graph import pagerank
    cust = _read(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("c_custkey"), np.int64)
        src = np.concatenate([v, v, v])
        mult = np.repeat(np.array([31, 73, 137], np.int64), v.size)
        dst = (src * src + src * mult + 7) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    pr = pagerank(cust.map_batches(edges, batch_format="pyarrow"),
                  iters=3, scale=10 ** 9)

    def finish(b: pa.Table) -> pa.Table:
        q = np.asarray(b.column("score_q"), np.int64)
        return pa.table({"c_custkey": b.column("node"),
                         "score_q": pa.array(q),
                         "score": pa.array(q / 1e9)})

    return pr.map_batches(finish, batch_format="pyarrow")


def _build_sql_graph_pagerank(iters: int = 3, scale: int = 10 ** 9) -> str:
    """graph.pagerank over the derived customer graph, unrolled: same
    integer base/damping terms, DuckDB `//` truncation == numpy floor on
    these non-negative values, LEFT JOIN + COALESCE for in-degree-0."""
    base = (15 * scale) // 100
    chain = [
        "nn AS (SELECT COUNT(*) AS n FROM customer)",
        "edges AS (SELECT c_custkey AS src, "
        "(c_custkey * c_custkey + c_custkey * m.m + 7) % nn.n AS dst "
        "FROM customer, nn, (VALUES (31), (73), (137)) m(m))",
        "nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges "
        "UNION ALL SELECT dst FROM edges))",
        "outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        f"r0 AS (SELECT v, {scale}::BIGINT AS r FROM nodes)",
    ]
    for t in range(iters):
        chain += [
            f"c{t} AS (SELECT e.dst AS v, SUM(r.r // o.od) AS s "
            f"FROM edges e JOIN r{t} r ON r.v = e.src "
            "JOIN outdeg o ON o.src = e.src GROUP BY e.dst)",
            f"r{t + 1} AS (SELECT nodes.v, CAST({base} + "
            "(85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes LEFT JOIN c{t} c ON c.v = nodes.v)",
        ]
    return ("WITH " + ",\n".join(chain)
            + f"\nSELECT v AS c_custkey, r AS score_q, "
            f"r / 1000000000.0 AS score FROM r{iters}")


SQL_GRAPH_PAGERANK = _build_sql_graph_pagerank()


def text_unigram_lm_q(sf_dir: str):
    """Unigram-LM NLL quality scoring over the real corpus (see
    text.unigram_nll: one token-hash co-shuffle, integer-quantized
    logprobs, measured-size per-doc merge)."""
    from .text import unigram_nll
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return unigram_nll(docs)


SQL_TEXT_UNIGRAM_LM = r"""
WITH toks AS (
  SELECT doc_id, t.tok FROM documents,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> len(x) > 0)) t(tok)),
tot AS (SELECT COUNT(*) AS T FROM toks),
cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
lp AS (SELECT tok,
              CAST(floor(1000000.0 * ln(CAST(T AS DOUBLE) / c)) AS BIGINT)
                  AS q
       FROM cnt, tot),
per AS (SELECT doc_id, CAST(SUM(lp.q) AS BIGINT) AS nll_q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM toks JOIN lp ON lp.tok = toks.tok GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(per.n, 0) AS n_tokens,
       COALESCE(per.nll_q, 0) AS nll_q,
       CASE WHEN COALESCE(per.n, 0) > 0
            THEN (CAST(per.nll_q AS DOUBLE) / CAST(per.n AS DOUBLE))
                 / 1000000.0
            ELSE 0.0 END AS avg_nll
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""


def emb_covariance_q(sf_dir: str):
    """Exact covariance moments over the embeddings table (PCA prep; see
    ann.covariance — bounded-by-dim² merge, big-int numerator)."""
    from .ann import covariance
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return covariance(emb, dim=64, scale=1 << 20)


SQL_EMB_COVARIANCE = r"""
WITH v AS (
  SELECT vec_id, i.i AS d,
         CAST(floor(embedding[i.i + 1] * 1048576e0) AS BIGINT) AS q
  FROM embeddings, generate_series(0, 63) i(i)),
s AS (SELECT d, CAST(SUM(q) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY d),
p AS (SELECT a.d AS d1, b.d AS d2, CAST(SUM(a.q * b.q) AS BIGINT) AS sxy
      FROM v a JOIN v b ON b.vec_id = a.vec_id AND b.d >= a.d
      GROUP BY a.d, b.d)
SELECT p.d1, p.d2, sa.n AS n, sa.sv AS sx_q, sb.sv AS sy_q, p.sxy AS sxy_q,
       CAST(CAST(sa.n AS HUGEINT) * p.sxy
            - CAST(sa.sv AS HUGEINT) * sb.sv AS DOUBLE)
       / (CAST(sa.n AS DOUBLE) * CAST(sa.n AS DOUBLE)
          * 1048576e0 * 1048576e0) AS cov
FROM p JOIN s sa ON sa.d = p.d1 JOIN s sb ON sb.d = p.d2
"""


def q_cube(sf_dir: str):
    """GROUP BY CUBE over (returnflag, linestatus): all four grouping
    sets — finest, both one-dim subtotals, grand total — derived from ONE
    finest-level aggregate (per-batch partial + measured-size merge over
    the bounded flag×status domain), rolled up in-driver.  Same
    partial-reuse shape as q_rollup, completing the grouping-sets family.
    Quantities aggregate in exact int64 (l_quantity is integral in TPC-H);
    NULL markers print as 'ALL'."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        qty = pa.array(np.floor(np.asarray(b.column("l_quantity"),
                                           np.float64) + 0.5)
                       .astype(np.int64))
        t = pa.table({"flag": b.column("l_returnflag"),
                      "status": b.column("l_linestatus"),
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "qty": qty})
        g = t.group_by(["flag", "status"]).aggregate(
            [("n", "sum"), ("qty", "sum")])
        return pa.table({"flag": g.column("flag"),
                         "status": g.column("status"),
                         "n": g.column("n_sum"),
                         "qty": g.column("qty_sum")})

    from .shuffle_utils import grouped_agg
    fine = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["flag", "status"], [("n", "sum"), ("qty", "sum")])
    if not isinstance(fine, pa.Table):
        fine = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in fine.iter_batches(batch_format="pyarrow"))

    def level(tbl: pa.Table, keys: list) -> pa.Table:
        if keys:
            g = tbl.group_by(keys).aggregate([("n", "sum"), ("qty", "sum")])
            n, q = g.column("n_sum"), g.column("qty_sum")
        else:
            g = None
            n = pa.array([pc.sum(tbl.column("n")).as_py()], pa.int64())
            q = pa.array([pc.sum(tbl.column("qty")).as_py()], pa.int64())
        rows = len(n)
        return pa.table({
            "flag": (g.column("flag") if g and "flag" in keys
                     else pa.array(["ALL"] * rows)),
            "status": (g.column("status") if g and "status" in keys
                       else pa.array(["ALL"] * rows)),
            "n": n,
            "sum_qty": q,
        })

    return pa.concat_tables([level(fine, ["flag", "status"]),
                             level(fine, ["flag"]),
                             level(fine, ["status"]),
                             level(fine, [])])


SQL_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def audio_features_q(sf_dir: str):
    """Distributed audio decode + EXACT clip statistics over a derived WAV
    corpus (one 16-bit PCM mono clip per supplier; samples
    s_k = ((key·31 + k·7) mod 65536) − 32768, n = 2000 + (key mod 7)·100 —
    the derived-raster oracle recipe applied to the audio family).  The
    REAL core.audio container path runs distributed (make_wav →
    decode_wav inside map_batches, same decode the
    multimodal.AudioDecodeStage uses); 16-bit PCM divides by 2^15 so the
    integer samples are recovered exactly, stats aggregate in int64, and
    rms is one end-of-chain sqrt (libm both sides, half-up 6dp)."""
    from ..core.audio import make_wav
    sup = _read(sf_dir, "supplier", ["s_suppkey"])

    def mk(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("s_suppkey"), np.int64)
        blobs = []
        for i in ids:
            n = 2000 + int(i % 7) * 100
            k = np.arange(n, dtype=np.int64)
            s = (((int(i) * 31 + k * 7) % 65536) - 32768).astype("<i2")
            blobs.append(make_wav(s.tobytes(), tag=1, ch=1, rate=16000,
                                  block_align=2, bits=16))
        return pa.table({"audio_id": pa.array(ids),
                         "bytes": pa.array(blobs, pa.binary())})

    def feats(b: pa.Table) -> pa.Table:
        from ..core.audio import decode_wav
        out = {k: [] for k in ("audio_id", "sample_rate", "n_samples",
                               "sum_s", "sum_sq", "smin", "smax", "rms")}
        for i in range(b.num_rows):
            x, sr = decode_wav(b.column("bytes")[i].as_py())
            s = np.floor(x.ravel() * 32768.0 + 0.5).astype(np.int64)
            n = int(s.size)
            sq = int((s * s).sum())
            out["audio_id"].append(int(b.column("audio_id")[i].as_py()))
            out["sample_rate"].append(int(sr))
            out["n_samples"].append(n)
            out["sum_s"].append(int(s.sum()))
            out["sum_sq"].append(sq)
            out["smin"].append(int(s.min()))
            out["smax"].append(int(s.max()))
            out["rms"].append(
                np.floor(np.sqrt(sq / float(n)) * 1e6 + 0.5) / 1e6)
        return pa.table({k: pa.array(v, pa.int64() if k != "rms"
                                     else pa.float64())
                         for k, v in out.items()})

    return sup.map_batches(mk, batch_format="pyarrow") \
              .map_batches(feats, batch_format="pyarrow")


SQL_AUDIO_FEATURES = """
WITH ks AS (SELECT i.i AS k FROM generate_series(0, 2599) i(i)),
base AS (SELECT s_suppkey AS audio_id,
                2000 + (s_suppkey % 7) * 100 AS n FROM supplier),
s AS (SELECT audio_id, ((audio_id * 31 + k * 7) % 65536) - 32768 AS v
      FROM base, ks WHERE k < n),
agg AS (SELECT audio_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS sum_s,
               CAST(SUM(v * v) AS BIGINT) AS sum_sq,
               CAST(MIN(v) AS BIGINT) AS smin,
               CAST(MAX(v) AS BIGINT) AS smax
        FROM s GROUP BY audio_id)
SELECT audio_id, CAST(16000 AS BIGINT) AS sample_rate, n_samples,
       sum_s, sum_sq, smin, smax,
       floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1000000.0 + 0.5)
           / 1000000.0 AS rms
FROM agg
"""


def q_quantiles(sf_dir: str):
    """EXACT distributed quantiles of order totalprice — k-th-smallest
    selection via the iterative histogram-refinement engine
    (pipelines/quantile.py): counts-only streaming passes, no global
    sort, no all-to-all.  Money is scaled to int64 cents first so
    selection is integer-exact; ONE end-of-chain division prints the
    value (int64/100.0 bit-matches DuckDB BIGINT/100.0)."""
    from .quantile import exact_quantiles
    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda b: pa.table({"v": pa.array(np.floor(
            np.asarray(b.column("o_totalprice"), np.float64) * 100 + 0.5)
            .astype(np.int64))}),
        batch_format="pyarrow")
    t = exact_quantiles(ds, "v", [25, 50, 75, 90])
    return pa.table({
        "q_pct": t.column("q_pct"),
        "n": t.column("n"),
        "pos": t.column("pos"),
        "value": pa.array(
            np.asarray(t.column("value_q"), np.int64) / 100.0),
    })


SQL_QUANTILES = """
WITH s AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
           FROM orders),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
qq AS (SELECT CAST(q_pct AS BIGINT) AS q_pct
       FROM (VALUES (25), (50), (75), (90)) AS t(q_pct))
SELECT qq.q_pct, c.n,
       (c.n * qq.q_pct + 99) // 100 AS pos,
       CAST(r.v AS DOUBLE) / 100.0 AS value
FROM qq, c
JOIN r ON r.rn = (c.n * qq.q_pct + 99) // 100
"""


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the join→group→top-k capstone: unshipped-revenue
    per order for one market segment, top 10 by revenue.  Shape: the two
    DATA-sized joins (customer⋈orders on custkey, then ⋈lineitem on
    orderkey) are capped hash joins; the group key (orderkey) is
    data-sized so per-batch partials + grouped_agg merge, then top-10 on
    the EXACT int64 revenue (ties broken by date, orderkey — identical
    on both sides because revenue never leaves integer space until the
    final print division)."""
    cut = np.datetime64("1995-03-15").astype("datetime64[us]") \
        .astype(np.int64)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda b: pa.table(
            {"c_custkey": b.column("c_custkey")}).filter(
                pc.equal(b.column("c_mktsegment"), "BUILDING")),
            batch_format="pyarrow")

    def owin(b: pa.Table) -> pa.Table:
        ts = np.asarray(b.column("o_orderdate").cast(pa.int64()), np.int64)
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey"),
                         "odate": pa.array(ts),
                         "ship": b.column("o_orderpriority")}) \
            .filter(pa.array(ts < cut))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"]) \
        .map_batches(owin, batch_format="pyarrow")
    oc = orders.join(cust, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=("o_custkey",), right_on=("c_custkey",))

    def li_rev(b: pa.Table) -> pa.Table:
        ts = np.asarray(b.column("l_shipdate").cast(pa.int64()), np.int64)
        p = np.asarray(b.column("l_extendedprice"), np.float64)
        d = np.asarray(b.column("l_discount"), np.float64)
        rev = (np.floor(p * 100 + 0.5).astype(np.int64)
               * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "rev": pa.array(rev)}).filter(pa.array(ts > cut))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice",
                "l_discount"]).map_batches(li_rev, batch_format="pyarrow")
    j = li.join(oc.select_columns(["o_orderkey", "odate", "ship"]),
                join_type="inner", num_partitions=_join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey", "odate", "ship"]) \
             .aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "odate": g.column("odate"),
                         "ship": g.column("ship"),
                         "rev": g.column("rev_sum")})

    from .shuffle_utils import grouped_agg
    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["l_orderkey", "odate", "ship"], [("rev", "sum")])
    if not isinstance(out, pa.Table):
        # post-merge each orderkey is one row → per-block top-10
        # candidates are exact; ≤ 10·blocks rows reach the driver (no
        # sort shuffle)
        def block_top(b: pa.Table) -> pa.Table:
            r = np.asarray(b.column("rev"), np.int64)
            od_ = np.asarray(b.column("odate"), np.int64)
            ok_ = np.asarray(b.column("l_orderkey"), np.int64)
            o = np.lexsort((ok_, od_, -r))[:10]
            return b.take(pa.array(o))

        out = pa.concat_tables(
            t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in out.map_batches(block_top, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow"))
    rev = np.asarray(out.column("rev"), np.int64)
    od = np.asarray(out.column("odate"), np.int64)
    ok = np.asarray(out.column("l_orderkey"), np.int64)
    order = np.lexsort((ok, od, -rev))[:10]
    dates = (od[order] // 86_400_000_000).astype("datetime64[D]")
    return pa.table({
        "l_orderkey": pa.array(ok[order]),
        "revenue": pa.array(rev[order] / 1e4),
        "o_orderdate": pa.array([str(x) for x in dates], pa.string()),
        "o_orderpriority": pa.array(
            [out.column("ship")[int(i)].as_py() for i in order],
            pa.string()),
    })


SQL_Q3_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) DESC,
         o_orderdate, l_orderkey
LIMIT 10
"""


def q_skew_join(sf_dir: str):
    """Skew-aware hybrid hash join under a manufactured hot key (25% of
    lineitem rows collapse onto supplier 0 — the null-sentinel/
    mega-customer shape that flatlines a plain hash join): heavy keys are
    measured from a per-batch key histogram and joined MAP-SIDE against
    broadcast build rows, the cold tail goes through the capped shuffle
    join, branches union (pipelines/skewjoin.py).  Revenue stays int64
    cents end-to-end."""
    from .shuffle_utils import grouped_agg
    from .skewjoin import skew_hybrid_join

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey"),
             "s_nationkey": b.column("s_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")
    cnt = sup.count()

    def keyed(b: pa.Table) -> pa.Table:
        ok = np.asarray(b.column("l_orderkey"), np.int64)
        p = np.asarray(b.column("l_extendedprice"), np.float64)
        k = np.where(ok % 4 == 0, 0, 1 + ((ok * 7) % (cnt - 1)))
        return pa.table({"k": pa.array(k),
                         "cents": pa.array(np.floor(p * 100 + 0.5)
                                           .astype(np.int64))})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]) \
        .map_batches(keyed, batch_format="pyarrow")
    j = skew_hybrid_join(li, sup, "k", "s_suppkey",
                         hot_num=1, hot_den=10)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"s_nationkey": b.column("s_nationkey"),
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "cents": b.column("cents")})
        g = t.group_by("s_nationkey").aggregate(
            [("n", "sum"), ("cents", "sum")])
        return pa.table({"s_nationkey": g.column("s_nationkey"),
                         "n": g.column("n_sum"),
                         "rev_cents": g.column("cents_sum")})

    out = grouped_agg(j.map_batches(partial, batch_format="pyarrow"),
                      ["s_nationkey"], [("n", "sum"),
                                        ("rev_cents", "sum")])
    if isinstance(out, pa.Table):
        return ray.data.from_arrow(out)
    return out


SQL_SKEW_JOIN = """
WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM supplier),
l AS (SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0
             ELSE 1 + ((l_orderkey * 7) % ((SELECT cnt FROM c) - 1))
             END AS k,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem)
SELECT CAST(s.s_nationkey AS BIGINT) AS s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(l.cents) AS BIGINT) AS rev_cents
FROM l JOIN supplier s ON s.s_suppkey = l.k
GROUP BY s.s_nationkey
"""


def sketch_grouped_distinct_q(sf_dir: str):
    """Grouped HLL: distinct users PER EVENT TYPE at sketch cost (only
    ≤ types×2^b register rows move, never the user ids) — the mergeable
    COUNT(DISTINCT) GROUP BY primitive.  The estimate itself is
    value-hash EXACT: harmonic denominator in exact int64, one fixed
    float expression, half-up 6dp (sketches.hll_grouped_estimates)."""
    from .sketches import hll_grouped_estimates
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_grouped_estimates(ds, "user_id", "event_type", b=10)


def _sql_sketch_grouped_distinct() -> str:
    from .sketches import build_sql_hll_grouped
    return build_sql_hll_grouped("events", "user_id", "event_type", b=10)


def q_upsert_latest(sf_dir: str):
    """Latest-wins CDC merge (lakehouse upsert): a base snapshot of
    orders (version 0) unioned with a derived change stream (every third
    key, version 1, repriced +1000.00) resolves to one row per key with
    the highest version — dedup.upsert_latest's per-batch argmax
    combiner + measured-size grouped pick."""
    from .dedup import upsert_latest

    def base(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice"), np.float64)
                         * 100 + 0.5).astype(np.int64)
        return pa.table({"k": b.column("o_orderkey"),
                         "ver": pa.array(np.zeros(b.num_rows, np.int64)),
                         "cents": pa.array(cents)})

    def upd(b: pa.Table) -> pa.Table:
        t = base(b)
        k = np.asarray(t.column("k"), np.int64)
        t = t.filter(pa.array(k % 3 == 0))
        return pa.table({"k": t.column("k"),
                         "ver": pa.array(np.ones(t.num_rows, np.int64)),
                         "cents": pa.array(
                             np.asarray(t.column("cents"), np.int64)
                             + 100_000)})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    u = orders.map_batches(base, batch_format="pyarrow").union(
        orders.map_batches(upd, batch_format="pyarrow"))
    return upsert_latest(u, "k", "ver")


SQL_UPSERT_LATEST = """
WITH base AS (SELECT o_orderkey AS k, CAST(0 AS BIGINT) AS ver,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         AS cents
              FROM orders),
upd AS (SELECT k, CAST(1 AS BIGINT) AS ver, cents + 100000 AS cents
        FROM base WHERE k % 3 = 0),
u AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
SELECT k, ver, cents FROM u
QUALIFY row_number() OVER (PARTITION BY k ORDER BY ver DESC) = 1
"""


def raster_compare_q(sf_dir: str):
    """gdalcompare on the driver surface (autotest/gdalcompare.py,
    `gdal raster compare`): golden-vs-test PNG pairs per nation (test =
    pixel recurrence with a stride-7 perturbation; every 5th image is a
    PLANTED IDENTICAL copy so the 'Images are identical' branch is
    exercised), run through the REAL stages/raster2.compare_images
    stage — real PNG encode+decode, GDAL 11-prime checksums both sides,
    diff count, max |Δ|, PSNR.  The oracle replays pixels via
    generate_series; the SSE is exact int (≤256 squared-byte terms keep
    np.mean's pairwise float sum exact too), so PSNR is ONE
    deterministic log10 chain, half-up 6dp; identical pairs print the
    −1.0 sentinel."""
    from ..core import codecs
    from ..stages.raster2 import compare_images

    def mk(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("n_nationkey"), np.int64)
        k = np.arange(256, dtype=np.int64)
        gs, ts = [], []
        for n in ids:
            g = ((int(n) * 31 + k) % 256).astype(np.uint8).reshape(16, 16)
            t = g if n % 5 == 0 else \
                ((int(n) * 31 + 7 * k) % 256).astype(np.uint8) \
                .reshape(16, 16)
            gs.append(codecs.encode(g, "png"))
            ts.append(codecs.encode(t, "png"))
        return pa.table({
            "image_id": pa.array(ids, pa.int64()),
            "bytes_golden": pa.array(gs, pa.binary()),
            "fmt_golden": pa.array(["png"] * len(gs)),
            "bytes_test": pa.array(ts, pa.binary()),
            "fmt_test": pa.array(["png"] * len(ts))})

    cmp = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(compare_images, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        ps = b.column("psnr").to_pylist()
        psq = [(-1.0 if p is None
                else np.floor(p * 1e6 + 0.5) / 1e6) for p in ps]
        return pa.table({
            "n": b.column("image_id"),
            "ck_g": b.column("checksum_golden"),
            "ck_t": b.column("checksum_test"),
            "n_diff_pixels": b.column("n_diff_pixels"),
            "max_abs_diff": b.column("max_abs_diff"),
            "psnr": pa.array(psq, pa.float64())})

    return cmp.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_COMPARE = """
WITH ks AS (SELECT i.i AS k FROM generate_series(0, 255) i(i)),
px AS (SELECT n_nationkey AS n, k,
              (n_nationkey * 31 + k) % 256 AS g,
              CASE WHEN n_nationkey % 5 = 0
                   THEN (n_nationkey * 31 + k) % 256
                   ELSE (n_nationkey * 31 + 7 * k) % 256 END AS t
       FROM nation, ks),
agg AS (SELECT n,
  CAST(SUM(g % ([7,11,13,17,19,23,29,31,37,41,43])[(k % 11) + 1])
       % 65536 AS BIGINT) AS ck_g,
  CAST(SUM(t % ([7,11,13,17,19,23,29,31,37,41,43])[(k % 11) + 1])
       % 65536 AS BIGINT) AS ck_t,
  CAST(SUM(CASE WHEN g <> t THEN 1 ELSE 0 END) AS BIGINT)
      AS n_diff_pixels,
  CAST(MAX(abs(g - t)) AS BIGINT) AS maxd,
  CAST(SUM((g - t) * (g - t)) AS BIGINT) AS sse
  FROM px GROUP BY n)
SELECT n, ck_g, ck_t, n_diff_pixels,
       CAST(maxd AS DOUBLE) AS max_abs_diff,
       CASE WHEN n_diff_pixels = 0 THEN -1.0e0
            ELSE floor(10e0 * log10(65025e0
                                    / (CAST(sse AS DOUBLE) / 256e0))
                       * 1000000e0 + 0.5e0) / 1000000e0
       END AS psnr
FROM agg
"""


def q_above_group_avg(sf_dir: str):
    """Decorrelated correlated-subquery plan (WHERE price > AVG(price) of
    the row's own customer): per-customer (Σcents, count) partials merge
    measured-size, join back by custkey (capped hash join), and the
    predicate runs as the INTEGER CROSS-MULTIPLY cents·n > Σcents — no
    division, so the comparison is exact on both engines.  Qualifying
    orders aggregate per priority class."""
    from .shuffle_utils import grouped_agg

    def part(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice"), np.float64)
                         * 100 + 0.5).astype(np.int64)
        t = pa.table({"o_custkey": b.column("o_custkey"),
                      "s": pa.array(cents),
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("o_custkey").aggregate([("s", "sum"), ("c", "sum")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "s": g.column("s_sum"), "c": g.column("c_sum")})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderpriority"])
    per_cust = grouped_agg(
        orders.map_batches(part, batch_format="pyarrow"),
        ["o_custkey"], [("s", "sum"), ("c", "sum")])
    if isinstance(per_cust, pa.Table):
        per_cust = ray.data.from_arrow(per_cust)
    per_cust = per_cust.map_batches(
        lambda b: pa.table({"ck": b.column("o_custkey"),
                            "s": b.column("s"), "c": b.column("c")}),
        batch_format="pyarrow")

    def keyed(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice"), np.float64)
                         * 100 + 0.5).astype(np.int64)
        return pa.table({"o_custkey": b.column("o_custkey"),
                         "prio": b.column("o_orderpriority"),
                         "cents": pa.array(cents)})

    j = orders.map_batches(keyed, batch_format="pyarrow") \
        .join(per_cust, join_type="inner",
              num_partitions=_join_partitions(),
              on=("o_custkey",), right_on=("ck",))

    def qualify(b: pa.Table) -> pa.Table:
        cents = np.asarray(b.column("cents"), np.int64)
        s = np.asarray(b.column("s"), np.int64)
        c = np.asarray(b.column("c"), np.int64)
        t = b.filter(pa.array(cents * c > s))
        g = pa.table({"prio": t.column("prio"),
                      "n": pa.array(np.ones(t.num_rows, np.int64)),
                      "cents": t.column("cents")}) \
            .group_by("prio").aggregate([("n", "sum"), ("cents", "sum")])
        return pa.table({"o_orderpriority": g.column("prio"),
                         "n": g.column("n_sum"),
                         "sum_cents": g.column("cents_sum")})

    out = grouped_agg(j.map_batches(qualify, batch_format="pyarrow"),
                      ["o_orderpriority"], [("n", "sum"),
                                            ("sum_cents", "sum")])
    if isinstance(out, pa.Table):
        return ray.data.from_arrow(out)
    return out


SQL_ABOVE_GROUP_AVG = """
WITH o AS (SELECT o_custkey, o_orderpriority,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
g AS (SELECT o_custkey AS ck, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM o GROUP BY o_custkey)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM o JOIN g ON g.ck = o.o_custkey
WHERE o.cents * g.c > g.s
GROUP BY o_orderpriority
"""


def raster_histogram_q(sf_dir: str):
    """GetHistogram on the driver surface (gcore/rasterband.cpp histogram
    semantics: bucket = v // 16 over the byte range, 16 equal buckets):
    REAL PNG decode per derived image inside map_batches, vectorized
    bincount per image, per-(n, bucket) rows — replayed from the pixel
    recurrence via generate_series."""
    from ..core import codecs

    def mk(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("n_nationkey"), np.int64)
        k = np.arange(256, dtype=np.int64)
        bts = [codecs.encode(
            ((int(n) * 31 + k * 5) % 256).astype(np.uint8).reshape(16, 16),
            "png") for n in ids]
        return pa.table({"n": pa.array(ids, pa.int64()),
                         "bytes": pa.array(bts, pa.binary())})

    def hist(b: pa.Table) -> pa.Table:
        ns, bks, cnts = [], [], []
        for i in range(b.num_rows):
            img = codecs.decode(b.column("bytes")[i].as_py(), "png")
            h = np.bincount(img.ravel() // 16, minlength=16)
            nz = np.flatnonzero(h)
            n = int(b.column("n")[i].as_py())
            ns.extend([n] * nz.size)
            bks.extend(nz.tolist())
            cnts.extend(h[nz].tolist())
        return pa.table({"n": pa.array(ns, pa.int64()),
                         "bucket": pa.array(bks, pa.int64()),
                         "cnt": pa.array(cnts, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(hist, batch_format="pyarrow")


SQL_RASTER_HISTOGRAM = """
WITH ks AS (SELECT i.i AS k FROM generate_series(0, 255) i(i)),
px AS (SELECT n_nationkey AS n,
              ((n_nationkey * 31 + k * 5) % 256) // 16 AS bucket
       FROM nation, ks)
SELECT n, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
FROM px GROUP BY n, bucket
"""


def events_gapfill_q(sf_dir: str):
    """Time-series densification (gap fill): hourly event counts per type
    with every missing (type, hour) cell materialized as an explicit
    zero over the table's [min, max] hour span — the generate-grid +
    LEFT JOIN pattern.  Scale shape: counts come from the per-batch
    combiner + measured-size merge (bounded by types × hours), the grid
    is GENERATED distributed (`ray.data.range` over the cell space, no
    driver loop), and the left join is the capped hash join; hours print
    via ONE integer-hour → strftime chain."""
    import ray.data as _rd

    def part(b: pa.Table) -> pa.Table:
        ts = np.asarray(b.column("ts").cast(pa.int64()), np.int64)
        hr = ts // 3_600_000_000
        t = pa.table({"event_type": b.column("event_type"),
                      "hour": pa.array(hr),
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["event_type", "hour"]).aggregate([("n", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "hour": g.column("hour"),
                         "n": g.column("n_sum")})

    from .shuffle_utils import grouped_agg
    counts = grouped_agg(
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(part, batch_format="pyarrow"),
        ["event_type", "hour"], [("n", "sum")])
    if isinstance(counts, pa.Table):
        counts = _rd.from_arrow(counts)

    from ray.data.aggregate import Max, Min
    mm = counts.aggregate(Min("hour"), Max("hour"))
    h0, h1 = int(mm["min(hour)"]), int(mm["max(hour)"])
    types = sorted(str(t) for t in
                   set(counts.unique("event_type")))
    nh = h1 - h0 + 1

    def cell(b: dict) -> pa.Table:
        i = np.asarray(b["id"], np.int64)
        return pa.table({
            "g_type": pa.array([types[int(x)] for x in i // nh],
                               pa.string()),
            "g_hour": pa.array(h0 + (i % nh))})

    grid = _rd.range(len(types) * nh).map_batches(cell)
    j = grid.join(counts, join_type="left_outer",
                  num_partitions=_join_partitions(),
                  on=("g_type", "g_hour"),
                  right_on=("event_type", "hour"))

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n").fill_null(0), np.int64)
        hrs = np.asarray(b.column("g_hour"), np.int64)
        stamps = (hrs * 3600).astype("datetime64[s]")
        return pa.table({
            "event_type": b.column("g_type"),
            "hour_ts": pa.array(np.datetime_as_string(stamps, unit="s")
                                .tolist(), pa.string()),
            "n": pa.array(n)})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_GAPFILL = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour
           FROM events),
cnt AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY event_type, hour),
span AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM cnt),
grid AS (SELECT t.event_type AS g_type, s.h0 + g.i AS g_hour
         FROM (SELECT DISTINCT event_type FROM cnt) t, span s,
              generate_series(0, 50000) g(i)
         WHERE g.i <= s.h1 - s.h0)
SELECT g.g_type AS event_type,
       strftime(make_timestamp(g.g_hour * 3600000000),
                '%Y-%m-%dT%H:%M:%S') AS hour_ts,
       COALESCE(c.n, 0) AS n
FROM grid g LEFT JOIN cnt c
  ON c.event_type = g.g_type AND c.hour = g.g_hour
"""


def q_snapshot_diff(sf_dir: str):
    """Snapshot diff / change-data-feed (completes the CDC family with
    [[q_upsert_latest]]): two derived order snapshots — B removes every
    7th key, reprices every 5th, and inserts new synthetic keys — FULL
    OUTER joined by key and classified added/removed/changed/same per
    row; missing sides print the −1 sentinel so the schema stays
    NULL-free for hashing.  Aggregated per change class (n, Σ|Δcents|):
    bounded output, data-sized classify stays distributed."""
    from .shuffle_utils import grouped_agg

    def snap_a(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice"), np.float64)
                         * 100 + 0.5).astype(np.int64)
        return pa.table({"ka": b.column("o_orderkey"),
                         "ca": pa.array(cents)})

    def snap_b(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("o_orderkey"), np.int64)
        cents = np.floor(np.asarray(b.column("o_totalprice"), np.float64)
                         * 100 + 0.5).astype(np.int64)
        keep = k % 7 != 0
        kk, cc = k[keep], cents[keep]
        cc = np.where(kk % 5 == 0, cc + 12300, cc)
        ins = k[k % 11 == 0] + 1_000_000_000
        return pa.table({
            "kb": pa.array(np.concatenate([kk, ins])),
            "cb": pa.array(np.concatenate(
                [cc, (ins % 90000) + 100]).astype(np.int64))})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    a = orders.map_batches(snap_a, batch_format="pyarrow")
    bds = orders.map_batches(snap_b, batch_format="pyarrow")
    j = a.join(bds, join_type="full_outer",
               num_partitions=_join_partitions(),
               on=("ka",), right_on=("kb",))

    def classify(b: pa.Table) -> pa.Table:
        ca, cb = b.column("ca"), b.column("cb")
        in_a = np.asarray(pc.is_valid(ca), bool)
        in_b = np.asarray(pc.is_valid(cb), bool)
        va = np.asarray(pc.coalesce(ca, pa.scalar(-1)).cast(pa.int64()),
                        np.int64)
        vb = np.asarray(pc.coalesce(cb, pa.scalar(-1)).cast(pa.int64()),
                        np.int64)
        status = np.where(~in_a, "added",
                          np.where(~in_b, "removed",
                                   np.where(va != vb, "changed", "same")))
        dc = np.where(in_a & in_b, np.abs(vb - va), np.int64(0))
        t = pa.table({"change": pa.array(status.tolist(), pa.string()),
                      "n": pa.array(np.ones(len(va), np.int64)),
                      "abs_dcents": pa.array(dc.astype(np.int64))})
        g = t.group_by("change").aggregate([("n", "sum"),
                                            ("abs_dcents", "sum")])
        return pa.table({"change": g.column("change"),
                         "n": g.column("n_sum"),
                         "abs_dcents": g.column("abs_dcents_sum")})

    out = grouped_agg(j.map_batches(classify, batch_format="pyarrow"),
                      ["change"], [("n", "sum"), ("abs_dcents", "sum")])
    if isinstance(out, pa.Table):
        return ray.data.from_arrow(out)
    return out


SQL_SNAPSHOT_DIFF = """
WITH a AS (SELECT o_orderkey AS ka,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS ca
           FROM orders),
b AS (SELECT ka AS kb,
             CASE WHEN ka % 5 = 0 THEN ca + 12300 ELSE ca END AS cb
      FROM a WHERE ka % 7 <> 0
      UNION ALL
      SELECT ka + 1000000000, ((ka + 1000000000) % 90000) + 100
      FROM a WHERE ka % 11 = 0),
j AS (SELECT a.ka, a.ca, b.kb, b.cb FROM a FULL JOIN b ON b.kb = a.ka)
SELECT CASE WHEN ka IS NULL THEN 'added'
            WHEN kb IS NULL THEN 'removed'
            WHEN ca <> cb THEN 'changed' ELSE 'same' END AS change,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                     THEN abs(cb - ca) ELSE 0 END) AS BIGINT)
           AS abs_dcents
FROM j GROUP BY 1
"""


def q_weighted_sample(sf_dir: str, k: int = 50):
    """Distributed weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis priorities): u = deterministic splitmix uniform
    from the top 53 hash bits (exact int→double, no wrap), priority =
    −ln(u)/w with w = price cents, global k smallest win.  Scale shape:
    per-block top-k candidates (exact — a global winner is a winner in
    its block) + one ≤ k·blocks driver merge; zero shuffle.  Selection
    runs on the UNQUANTIZED doubles (identical expression both sides);
    the printed priority is half-up 6dp."""
    from .dedup import _splitmix

    def cand(b: pa.Table) -> pa.Table:
        key = np.asarray(b.column("o_orderkey"), np.int64)
        p = np.asarray(b.column("o_totalprice"), np.float64)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        hv = _splitmix(key.astype(np.uint64))
        u = ((hv >> np.uint64(11)).astype(np.float64) + 1.0) / 9007199254740992.0
        prio = -np.log(u) / cents.astype(np.float64)
        order = np.lexsort((key, prio))[:k]
        return pa.table({"o_orderkey": pa.array(key[order]),
                         "cents": pa.array(cents[order]),
                         "prio": pa.array(prio[order])})

    rows = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]) \
        .map_batches(cand, batch_format="pyarrow").take_all()
    key = np.array([r["o_orderkey"] for r in rows], np.int64)
    cents = np.array([r["cents"] for r in rows], np.int64)
    prio = np.array([r["prio"] for r in rows], np.float64)
    order = np.lexsort((key, prio))[:k]
    return pa.table({
        "o_orderkey": pa.array(key[order]),
        "o_totalprice": pa.array(cents[order] / 100.0),
        "prio": pa.array(np.floor(prio[order] * 1e6 + 0.5) / 1e6)})


def _sql_weighted_sample(k: int = 50) -> str:
    from .sketches import _sm_hugeint_select
    return f"""
WITH s AS ({_sm_hugeint_select('orders', 'o_orderkey')}),
pr AS (SELECT o_orderkey,
              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
              -ln((CAST(hv // 2048::HUGEINT AS DOUBLE) + 1.0e0)
                  / 9007199254740992e0)
              / CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS prio
       FROM s)
SELECT o_orderkey, CAST(cents AS DOUBLE) / 100.0 AS o_totalprice,
       floor(prio * 1000000e0 + 0.5e0) / 1000000e0 AS prio
FROM pr ORDER BY pr.prio, o_orderkey LIMIT {k}
"""


def graph_triangles_q(sf_dir: str):
    """Distributed triangle counting over a derived customer graph —
    the third graph-operator class member (clustering-coefficient /
    link-farm-signal step of web-corpus curation; see graph.triangles:
    degree-ordered orientation bounds wedges at O(m^1.5)).  Edges:
    (v, (v+1) mod N) always, plus (v, (v+2) mod N) iff
    splitmix64(v) % 4 < 3 — the mask makes per-vertex counts vary while
    the generic 3-way self-join oracle verifies the full semantics."""
    from .dedup import _splitmix
    from .graph import triangles
    cust = _read(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("c_custkey"), np.int64)
        hv = _splitmix(v.astype(np.uint64))
        m = (hv % np.uint64(4)) < np.uint64(3)
        src = np.concatenate([v, v[m]])
        dst = np.concatenate([(v + 1) % n, (v[m] + 2) % n])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return triangles(cust.map_batches(edges, batch_format="pyarrow"))


def _sql_graph_triangles() -> str:
    from .sketches import _sm_hugeint_select
    # generic semantics oracle: canonical u<v edge set, each triangle
    # a<b<c enumerated exactly once by the 3-way self-join, per-vertex
    # counts from the role union
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM customer),
s AS ({_sm_hugeint_select('customer', 'c_custkey')}),
raw AS (
  SELECT c_custkey AS u, (c_custkey + 1) % nn.n AS v FROM customer, nn
  UNION ALL
  SELECT c_custkey, (c_custkey + 2) % nn.n FROM s, nn WHERE hv % 4 < 3),
e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
      FROM raw WHERE u <> v),
t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
r AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t)
SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM r GROUP BY node
"""


SQL_GRAPH_TRIANGLES = _sql_graph_triangles()


def dedup_keep_docs_q(sf_dir: str):
    """End-to-end dedup KEEP-LIST over documents — pairs → connected
    components → one kept representative per component + cluster size,
    singletons kept (dedup.dedup_keep; the actual deliverable of a
    training-data dedup stage).  Edge set = the dedup_components chain
    construction (edge (d-1, d) iff splitmix64(d) % 3 < 2) so the SQL
    closed form extends with sizes/keeps."""
    from .dedup import _splitmix, dedup_keep
    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(b: pa.Table) -> pa.Table:
        d = np.asarray(b.column("doc_id"), np.int64)
        m = (d > 0) & ((_splitmix(d.astype(np.uint64)) % np.uint64(3))
                       < np.uint64(2))
        return pa.table({"id_a": pa.array(d[m] - 1, pa.int64()),
                         "id_b": pa.array(d[m], pa.int64())})

    return dedup_keep(ds, ds.map_batches(edges, batch_format="pyarrow"))


def _sql_dedup_keep_docs() -> str:
    from .sketches import _sm_hugeint_select
    # components closed form as in _sql_dedup_components, extended with
    # per-component sizes, singleton fallback and the min-id keep rule
    return f"""
WITH s AS ({_sm_hugeint_select('documents', 'doc_id')}),
e AS (SELECT doc_id AS d,
             CASE WHEN hv % 3 < 2 AND doc_id > 0 THEN 1 ELSE 0 END AS e_prev
      FROM s),
c AS (SELECT d, e_prev,
             lead(e_prev, 1, 0) OVER (ORDER BY d) AS e_next,
             max(CASE WHEN e_prev = 0 THEN d END) OVER
                 (ORDER BY d ROWS UNBOUNDED PRECEDING) AS comp
      FROM e),
n AS (SELECT d, comp FROM c WHERE e_prev = 1 OR e_next = 1),
z AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS csize FROM n GROUP BY comp)
SELECT doc.doc_id,
       COALESCE(n.comp, doc.doc_id) AS component,
       COALESCE(z.csize, 1) AS csize,
       CASE WHEN COALESCE(n.comp, doc.doc_id) = doc.doc_id
            THEN 1 ELSE 0 END AS keep
FROM documents doc
LEFT JOIN n ON n.d = doc.doc_id
LEFT JOIN z ON z.comp = n.comp
"""


SQL_DEDUP_KEEP_DOCS = _sql_dedup_keep_docs()


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    join customer←orders (filter: non-URGENT, the comment-filter analog),
    count per customer INCLUDING zeros, then count-of-counts.  Shape:
    per-batch unique+count combiner → grouped_agg per custkey (small
    partials), zero-preserving left merge via ONE bucket_vectorized
    co-shuffle of customer keys + counts, then a tiny second aggregate
    over the count domain."""
    from .shuffle_utils import bucket_vectorized, grouped_agg

    def part(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.match_substring(
            b.column("o_orderpriority"), "URGENT"))
        ck = np.asarray(b.filter(keep).column("o_custkey"), np.int64)
        u, c = np.unique(ck, return_counts=True)
        return pa.table({"k": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64))})

    counts = grouped_agg(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(part, batch_format="pyarrow"),
        ["k"], [("c", "sum")])
    if isinstance(counts, pa.Table):
        counts = ray.data.from_arrow(counts)

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({
            "k": b.column("c_custkey"),
            "c": pa.array(np.zeros(b.num_rows, np.int64)),
            "tag": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    cnt_rows = counts.map_batches(
        lambda b: pa.table({
            "k": b.column("k"), "c": b.column("c"),
            "tag": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        k = np.asarray(g.column("k"), np.int64)
        c = np.asarray(g.column("c"), np.int64)
        tag = np.asarray(g.column("tag"), np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        cc = np.zeros(uk.size, np.int64)
        m1 = tag == 1
        cc[inv[m1]] = c[m1]
        is_cust = np.zeros(uk.size, bool)
        is_cust[inv[tag == 0]] = True   # drop counts for non-customer keys
        # partial count-of-counts inside the bucket
        u2, n2 = np.unique(cc[is_cust], return_counts=True)
        return pa.table({"c_count": pa.array(u2, pa.int64()),
                         "custdist": pa.array(n2.astype(np.int64))})

    dist = bucket_vectorized(cust.union(cnt_rows), "k", merge)
    out = grouped_agg(dist, ["c_count"], [("custdist", "sum")])
    return out if isinstance(out, pa.Table) else out


SQL_Q13_CUSTOMER_DISTRIBUTION = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority NOT LIKE '%URGENT%'
      GROUP BY c.c_custkey) t
GROUP BY c_count
"""


def q18_large_volume(sf_dir: str, thresh: int = 250, k: int = 100):
    """TPC-H Q18 shape — large-volume customers: orders whose total
    lineitem quantity exceeds ``thresh`` (the HAVING-over-big-groupby
    class), joined back to orders+customer, top ``k`` by (totalprice
    desc, orderdate, orderkey).  Shape: per-batch quantity combiner →
    grouped_agg per orderkey → filter (the HAVING), hash join to orders,
    customer joined by hash too (SF-scaled side, q5 discipline); final
    top-k via per-block candidates + ONE bounded driver merge.  Money
    and quantity stay integer until print."""
    from .shuffle_utils import grouped_agg

    def part(b: pa.Table) -> pa.Table:
        ok = np.asarray(b.column("l_orderkey"), np.int64)
        q = np.floor(np.asarray(b.column("l_quantity"), np.float64)
                     + 0.5).astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(u.size, np.int64)
        np.add.at(s, inv, q)
        return pa.table({"l_orderkey": pa.array(u, pa.int64()),
                         "sq": pa.array(s)})

    sums = grouped_agg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(part, batch_format="pyarrow"),
        ["l_orderkey"], [("sq", "sum")])
    if isinstance(sums, pa.Table):
        sums = ray.data.from_arrow(sums)
    big = sums.map_batches(
        lambda b: b.filter(pc.greater(b.column("sq"), thresh)),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    j = orders.join(big, join_type="inner",
                    num_partitions=_join_partitions(),
                    on=("o_orderkey",), right_on=("l_orderkey",))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = j.join(cust, join_type="inner", num_partitions=_join_partitions(),
                on=("o_custkey",), right_on=("c_custkey",))

    def cand(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice"), np.float64)
                         * 100 + 0.5).astype(np.int64)
        ts = np.asarray(b.column("o_orderdate").cast(pa.int64()), np.int64)
        ok = np.asarray(b.column("o_orderkey"), np.int64)
        order = np.lexsort((ok, ts, -cents))[:k]
        t = b.take(pa.array(order, pa.int64()))
        return pa.table({
            "c_name": t.column("c_name"),
            "c_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate": pa.array(
                [str(x)[:10] for x in
                 np.asarray(t.column("o_orderdate").cast(pa.int64()),
                            np.int64).astype("datetime64[us]")],
                pa.string()),
            "cents": pa.array(cents[order]),
            "sum_qty": t.column("sq")})

    rows = j2.map_batches(cand, batch_format="pyarrow").take_all()
    cents = np.array([r["cents"] for r in rows], np.int64)
    okey = np.array([r["o_orderkey"] for r in rows], np.int64)
    dt = np.array([r["o_orderdate"] for r in rows])
    order = np.lexsort((okey, dt, -cents))[:k]
    return pa.table({
        "c_name": pa.array([rows[i]["c_name"] for i in order], pa.string()),
        "c_custkey": pa.array([rows[i]["c_custkey"] for i in order],
                              pa.int64()),
        "o_orderkey": pa.array(okey[order]),
        "o_orderdate": pa.array([rows[i]["o_orderdate"] for i in order],
                                pa.string()),
        "o_totalprice": pa.array(cents[order] / 100.0),
        "sum_qty": pa.array([rows[i]["sum_qty"] for i in order], pa.int64())})


SQL_Q18_LARGE_VOLUME = """
WITH s AS (SELECT l_orderkey, CAST(SUM(CAST(floor(l_quantity + 0.5) AS
                BIGINT)) AS BIGINT) AS sum_qty
           FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250)
SELECT c.c_name, o.o_custkey AS c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) / 100.0
           AS o_totalprice,
       s.sum_qty
FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY floor(o.o_totalprice * 100 + 0.5) DESC,
         strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderkey
LIMIT 100
"""


def q_group_mode(sf_dir: str):
    """Per-group MODE with an explicit deterministic tie-break (smallest
    value wins) — quantity mode per return flag.  Shape: per-batch
    (flag, qty) count combiner → grouped_agg over the tiny joint domain
    (|flags|×|qty| rows), then one vectorized argmax pass.  DuckDB's
    mode() leaves ties unspecified; both sides pin count DESC, value ASC."""
    from .shuffle_utils import grouped_agg
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        q = np.floor(np.asarray(b.column("l_quantity"), np.float64)
                     + 0.5).astype(np.int64)
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "qty": pa.array(q),
                      "c": pa.array(np.ones(q.size, np.int64))})
        g = t.group_by(["l_returnflag", "qty"]).aggregate([("c", "sum")])
        return pa.table({"l_returnflag": g.column("l_returnflag"),
                         "qty": g.column("qty"), "c": g.column("c_sum")})

    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["l_returnflag", "qty"], [("c", "sum")])
    if not isinstance(agg, pa.Table):
        agg = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in agg.iter_batches(batch_format="pyarrow"))
    flag = np.asarray(agg.column("l_returnflag"))
    qty = np.asarray(agg.column("qty"), np.int64)
    c = np.asarray(agg.column("c"), np.int64)
    order = np.lexsort((qty, -c, flag))  # per flag: count desc, qty asc
    flag, qty, c = flag[order], qty[order], c[order]
    _, starts = np.unique(flag, return_index=True)
    return pa.table({"l_returnflag": pa.array(flag[starts]),
                     "mode_qty": pa.array(qty[starts], pa.int64()),
                     "mode_count": pa.array(c[starts], pa.int64())})


SQL_GROUP_MODE = """
WITH c AS (SELECT l_returnflag,
                  CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2)
SELECT l_returnflag, qty AS mode_qty, c AS mode_count FROM c
QUALIFY row_number() OVER (PARTITION BY l_returnflag
                           ORDER BY c DESC, qty) = 1
"""


def q_group_regression(sf_dir: str):
    """Per-group OLS regression (extendedprice cents vs quantity units,
    per return flag) from EXACT int64 moments — the q_group_corr recipe:
    distributed integer sums are order-independent, then ONE fixed float
    expression per group on both sides.  slope/intercept half-up 6dp."""
    from .shuffle_utils import grouped_agg
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = np.floor(np.asarray(b.column("l_quantity"), np.float64)
                     + 0.5).astype(np.int64)
        y = np.floor(np.asarray(b.column("l_extendedprice"), np.float64)
                     * 100 + 0.5).astype(np.int64)
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "n": pa.array(np.ones(x.size, np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxx": pa.array(x * x), "sxy": pa.array(x * y)})
        cols = ["n", "sx", "sy", "sxx", "sxy"]
        g = t.group_by(["l_returnflag"]).aggregate([(c, "sum")
                                                    for c in cols])
        return pa.table({"l_returnflag": g.column("l_returnflag"),
                         **{c: g.column(c + "_sum") for c in cols}})

    cols = ["n", "sx", "sy", "sxx", "sxy"]
    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["l_returnflag"], [(c, "sum") for c in cols])
    if not isinstance(agg, pa.Table):
        agg = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in agg.iter_batches(batch_format="pyarrow"))
    n = np.asarray(agg.column("n"), np.int64).astype(np.float64)
    sx = np.asarray(agg.column("sx"), np.int64).astype(np.float64)
    sy = np.asarray(agg.column("sy"), np.int64).astype(np.float64)
    sxx = np.asarray(agg.column("sxx"), np.int64).astype(np.float64)
    sxy = np.asarray(agg.column("sxy"), np.int64).astype(np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pa.table({
        "l_returnflag": agg.column("l_returnflag"),
        "n": pa.array(n.astype(np.int64)),
        "slope": pa.array(np.floor(slope * 1e6 + 0.5) / 1e6),
        "intercept": pa.array(np.floor(intercept * 1e6 + 0.5) / 1e6)})


SQL_GROUP_REGRESSION = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sx,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)
             * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sxx,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)
             * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag),
f AS (SELECT l_returnflag, n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
             sx, sy
      FROM m)
SELECT l_returnflag, n,
       floor(slope * 1000000e0 + 0.5e0) / 1000000e0 AS slope,
       floor((CAST(sy AS DOUBLE) - slope * sx) / n * 1000000e0 + 0.5e0)
           / 1000000e0 AS intercept
FROM f
"""


def emb_pca_q(sf_dir: str):
    """Top principal component of the embeddings table via exact integer
    power iteration over the distributed covariance moments (see
    ann.pca_top_component — HUGEINT unrolled-CTE replay)."""
    from .ann import pca_top_component
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_top_component(emb, dim=64, scale=1 << 20, iters=4)


def _build_sql_emb_pca(iters: int = 4, dim: int = 64,
                       scale: int = 1 << 20) -> str:
    """pca_top_component replayed exactly: same covariance moments as
    SQL_EMB_COVARIANCE, symmetric M, v0 = 1, per round y = M·v in HUGEINT
    and v' = sign(y)·((|y|·scale) // max|y|) (abs-first so DuckDB's
    truncating // matches the engine's formulation on negatives)."""
    chain = [
        f"v AS (SELECT vec_id, i.i AS d, CAST(floor(embedding[i.i + 1] * "
        f"{scale}e0) AS BIGINT) AS q FROM embeddings, "
        f"generate_series(0, {dim - 1}) i(i))",
        "s AS (SELECT d, CAST(SUM(q) AS BIGINT) AS sv, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY d)",
        "p AS (SELECT a.d AS d1, b.d AS d2, CAST(SUM(a.q * b.q) AS BIGINT) "
        "AS sxy FROM v a JOIN v b ON b.vec_id = a.vec_id AND b.d >= a.d "
        "GROUP BY a.d, b.d)",
        "mm AS (SELECT d1, d2, CAST(sa.n AS HUGEINT) * sxy "
        "- CAST(sa.sv AS HUGEINT) * sb.sv AS num "
        "FROM p JOIN s sa ON sa.d = p.d1 JOIN s sb ON sb.d = p.d2)",
        "m AS (SELECT d1, d2, num FROM mm "
        "UNION ALL SELECT d2, d1, num FROM mm WHERE d1 <> d2)",
        f"v0 AS (SELECT i.i AS d, CAST(1 AS HUGEINT) AS vv "
        f"FROM generate_series(0, {dim - 1}) i(i))",
    ]
    for t in range(iters):
        chain += [
            f"y{t} AS (SELECT m.d1 AS d, SUM(m.num * v{t}.vv) AS y "
            f"FROM m JOIN v{t} ON v{t}.d = m.d2 GROUP BY m.d1)",
            f"x{t} AS (SELECT GREATEST(MAX(abs(y)), 1) AS mx FROM y{t})",
            f"v{t + 1} AS (SELECT d, CASE WHEN y < 0 "
            f"THEN -((-y * {scale}) // mx) "
            f"ELSE (y * {scale}) // mx END AS vv FROM y{t}, x{t})",
        ]
    return ("WITH " + ",\n".join(chain)
            + f"\nSELECT d, CAST(vv AS BIGINT) AS v_q, "
            f"CAST(vv AS DOUBLE) / {scale}.0 AS loading FROM v{iters}")


SQL_EMB_PCA = _build_sql_emb_pca()


def events_watermark_q(sf_dir: str, delay_s: int = 300):
    """Event-time WATERMARK / late-data classification — the streaming
    semantics primitive (Flink/Beam watermark = running max event time −
    allowed delay; a row arriving after the watermark passed its
    timestamp is late).  Arrival order = event time + a deterministic
    splitmix64 jitter of up to 2 h (the synthetic stream is perfectly
    time-ordered, so id-order arrival would classify nothing late; the
    bounded hash jitter models network-delayed arrival — ~2.6% of rows
    land behind the 5-min watermark — and the SQL side replays the
    identical order).  Shape: ONE bucket_vectorized co-shuffle on
    user_id; inside, the per-user
    prev-running-max is a single segmented cummax via the composite-key
    offset trick (events_funnel recipe — ordinal·SPAN + (ts−tmin) makes
    user segments non-overlapping, so one np.maximum.accumulate serves
    every user with zero per-user dispatch).  All arithmetic in int64
    epoch-microseconds."""
    from .dedup import _splitmix
    from .shuffle_utils import bucket_vectorized
    D = int(delay_s) * 1_000_000

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]) \
        .map_batches(lambda b: pa.table({
            "k": b.column("user_id"),
            "event_id": b.column("event_id"),
            "tu": b.column("ts").cast(pa.int64())}),
            batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        k = np.asarray(g.column("k"), np.int64)
        e = np.asarray(g.column("event_id"), np.int64)
        t = np.asarray(g.column("tu"), np.int64)
        hv = _splitmix(e.astype(np.uint64))
        arr = t + (hv % np.uint64(7_200_000_000)).astype(np.int64)
        order = np.lexsort((e, arr, k))
        k, e, t = k[order], e[order], t[order]
        uk, starts = np.unique(k, return_index=True)
        inv = np.zeros(k.size, np.int64)
        inv[starts[1:]] = 1
        inv = np.cumsum(inv)                      # ordinal per row
        tmin = int(t.min())
        span = int(t.max()) - tmin + 1
        comp = inv * span + (t - tmin)
        cm = np.maximum.accumulate(comp)
        prev = np.empty_like(cm)
        prev[0] = 0
        prev[1:] = cm[:-1]
        first = np.zeros(k.size, bool)
        first[starts] = True
        wm = (prev - inv * span) + tmin - D       # prev max ts − delay
        late = (~first) & (t < wm)
        return pa.table({
            "event_id": pa.array(e),
            "user_id": pa.array(k),
            "late": pa.array(late.astype(np.int64)),
            "lateness_us": pa.array(np.where(late, wm - t, 0))})

    return bucket_vectorized(ds, "k", per_bucket)


def _sql_events_watermark() -> str:
    from .sketches import _sm_hugeint_select
    return f"""
WITH s AS ({_sm_hugeint_select('events', 'event_id')}),
w AS (
  SELECT event_id, user_id, epoch_us(ts) AS tu,
         max(epoch_us(ts)) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts) + hv % 7200000000, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM s)
SELECT event_id, user_id,
       CASE WHEN prevmax IS NOT NULL AND tu < prevmax - 300000000
            THEN 1 ELSE 0 END AS late,
       CASE WHEN prevmax IS NOT NULL AND tu < prevmax - 300000000
            THEN prevmax - 300000000 - tu ELSE 0 END AS lateness_us
FROM w
"""


SQL_EVENTS_WATERMARK = _sql_events_watermark()


def text_c4_filters_q(sf_dir: str):
    """C4-style composite quality gate over the real corpus (see
    text.c4_quality_filter): per-reason flags, reason bitmask, keep."""
    from .text import c4_quality_filter
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(c4_quality_filter, batch_format="pyarrow")


SQL_TEXT_C4_FILTERS = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS l
  FROM documents),
m AS (
  SELECT doc_id,
         greatest(len(l), 1) AS n,
         CAST(COALESCE(list_sum([len(x) for x in l]), 0) AS BIGINT) AS sl,
         CAST(len(list_filter(l, x -> x IN
              ('the', 'a', 'of', 'to', 'and', 'in'))) AS BIGINT) AS ns
  FROM t),
q AS (
  SELECT doc_id, n,
         floor(CAST(sl AS DOUBLE) / n * 1000000e0 + 0.5e0) / 1000000e0
             AS mean_token_len,
         floor(CAST(ns AS DOUBLE) / n * 1000000e0 + 0.5e0) / 1000000e0
             AS stopword_frac
  FROM m)
SELECT doc_id, n AS n_tokens, mean_token_len, stopword_frac,
       (CASE WHEN n < 20 THEN 1 ELSE 0 END
        + CASE WHEN n > 1000 THEN 2 ELSE 0 END
        + CASE WHEN mean_token_len < 4.0 OR mean_token_len > 5.0
               THEN 4 ELSE 0 END
        + CASE WHEN stopword_frac < 0.02 THEN 8 ELSE 0 END) AS reasons,
       CASE WHEN n >= 20 AND n <= 1000
             AND mean_token_len >= 4.0 AND mean_token_len <= 5.0
             AND stopword_frac >= 0.02 THEN 1 ELSE 0 END AS keep
FROM q
"""


def _derived_overlap_images(b: pa.Table) -> pa.Table:
    """Per nation, THREE co-registered 32×32 derived rasters with value
    v(idx, k) = (n·31 + 7·idx + k) mod (97 + n mod 13) and nodata = 3 —
    the overlapping-stack input for the mosaic first-non-nodata oracle.
    The geotransform is DYADIC (res = 2^-6, origins on the chunk grid +
    integer multiples of res) so world→pixel math is float-EXACT and the
    bilinear sample degenerates to identity — every mosaic pixel replays
    as pure integer arithmetic in SQL."""
    from ..core import codecs as CD
    k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    res = 1.0 / 64.0
    ids, bts, gts = [], [], []
    for n in k:
        n = int(n)
        for idx in range(3):
            v = (n * 31 + 7 * idx + np.arange(1024, dtype=np.int64)) \
                % (97 + n % 13)
            img = v.astype(np.uint8).reshape(32, 32)
            ids.append(f"img{n:02d}_{idx}")
            bts.append(CD.encode_raw(img))
            x0 = (n % 5) * 4.0 + 1.0
            y0 = (n // 5) * 4.0 + 3.0
            gts.append([x0, res, 0.0, y0, 0.0, -res])
    m = len(ids)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(np.full(m, 32, np.int32)),
        "h": pa.array(np.full(m, 32, np.int32)),
        "fmt": pa.array(["raw"] * m),
        "caption": pa.array([""] * m),
        "geotransform": pa.array(gts, pa.list_(pa.float64(), 6)),
        "crs": pa.array(["EPSG:4326"] * m),
        "nodata": pa.nulls(m, pa.float64()),
    })


def raster_mosaic_q(sf_dir: str):
    """Mosaic/stack with first-non-nodata-wins (gdalalg_raster_mosaic
    semantics, tiling.mosaic_images) over per-nation overlapping derived
    stacks — the §2.8 mosaic operator under the oracle gate: per output
    chunk, the GDAL 11-prime checksum of band 0 plus the contribution
    count, both replayed closed-form in SQL (first valid idx per pixel =
    min idx with v≠3; checksum = Σ v mod prime[(row-major index) mod 11]
    mod 65536 — zeros contribute nothing)."""
    from .tiling import mosaic_images
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_overlap_images, batch_format="pyarrow")
    out = mosaic_images(imgs, resolution=1.0 / 64.0, nodata=3.0)
    return out.map_batches(lambda b: pa.table({
        "x": b.column("x").cast(pa.int64()),
        "y": b.column("y").cast(pa.int64()),
        "checksum": b.column("checksum").cast(pa.int64()),
        "n_contrib": b.column("n_contrib").cast(pa.int64())}),
        batch_format="pyarrow")


SQL_RASTER_MOSAIC = """
WITH px AS (
  SELECT n_nationkey AS n, g.k AS k, i.i AS idx,
         (n_nationkey * 31 + 7 * i.i + g.k) % (97 + n_nationkey % 13) AS v
  FROM nation, generate_series(0, 1023) g(k), generate_series(0, 2) i(i)),
first AS (
  SELECT n, k, v FROM px WHERE v <> 3
  QUALIFY row_number() OVER (PARTITION BY n, k ORDER BY idx) = 1),
chk AS (
  SELECT n, CAST(SUM(v % ([7,11,13,17,19,23,29,31,37,41,43])[
                ((64 + k // 32) * 256 + 64 + k % 32) % 11 + 1])
            AS BIGINT) % 65536 AS checksum
  FROM first GROUP BY n),
contrib AS (
  SELECT n, CAST(COUNT(DISTINCT CASE WHEN v <> 3 THEN idx END) AS BIGINT)
         AS n_contrib
  FROM px GROUP BY n)
SELECT c.n % 5 AS x, c.n // 5 AS y, chk.checksum, c.n_contrib
FROM contrib c JOIN chk ON chk.n = c.n
"""


def _derived_pansharpen_inputs(b: pa.Table) -> pa.Table:
    """Per nation: a 32×32 3-band derived RGB + a co-registered raw pan
    band, all pure integer formulas (r=(n·31+k)%m, g=(n·37+k+5)%m,
    b=(n·41+k+9)%m, pan=(n·53+k+13)%m, m=97+n%13) for exact SQL replay."""
    from ..core import codecs as CD
    kk = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts, pans = [], [], []
    k = np.arange(1024, dtype=np.int64)
    for n in kk:
        n = int(n)
        m = 97 + n % 13
        r = (n * 31 + k) % m
        g = (n * 37 + k + 5) % m
        bb = (n * 41 + k + 9) % m
        p = (n * 53 + k + 13) % m
        rgb = np.stack([r, g, bb], axis=-1).astype(np.uint8) \
            .reshape(32, 32, 3)
        ids.append(f"img{n:02d}")
        bts.append(CD.encode_raw(rgb))
        pans.append(CD.encode_raw(p.astype(np.uint8).reshape(32, 32)))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "fmt": pa.array(["raw"] * len(ids)),
        "pan_bytes": pa.array(pans, pa.binary())})


def raster_pansharpen_q(sf_dir: str):
    """Weighted-Brovey pansharpening (§2.2, stages/raster2.pansharpen —
    alg/gdalpansharpen.cpp semantics) under the oracle gate: per image the
    GDAL checksum of output band 0 plus the center output pixel, replayed
    per-pixel in SQL with the IDENTICAL float chain ((r·w + g·w) + b·w
    pseudo-pan, one division, clip then truncate — every input an exact
    integer, every op correctly rounded on both engines)."""
    from ..core import codecs as CD
    from ..core.checksum import checksum as gchk
    from ..stages.raster2 import pansharpen
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_pansharpen_inputs, batch_format="pyarrow")
    out = imgs.map_batches(pansharpen, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        ids, chks, c0, c1, c2 = [], [], [], [], []
        for iid, bt in zip(t.column("image_id").to_pylist(),
                           t.column("bytes").to_pylist()):
            img = CD.decode(bt, "png")
            ids.append(iid)
            chks.append(gchk(img[:, :, 0]))
            c0.append(int(img[16, 16, 0]))
            c1.append(int(img[16, 16, 1]))
            c2.append(int(img[16, 16, 2]))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "checksum": pa.array(chks, pa.int64()),
            "center_r": pa.array(c0, pa.int64()),
            "center_g": pa.array(c1, pa.int64()),
            "center_b": pa.array(c2, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_PANSHARPEN = """
WITH px AS (
  SELECT n_nationkey AS n, g.k AS k,
         (n_nationkey * 31 + g.k) % (97 + n_nationkey % 13) AS r,
         (n_nationkey * 37 + g.k + 5) % (97 + n_nationkey % 13) AS gg,
         (n_nationkey * 41 + g.k + 9) % (97 + n_nationkey % 13) AS b,
         (n_nationkey * 53 + g.k + 13) % (97 + n_nationkey % 13) AS p
  FROM nation, generate_series(0, 1023) g(k)),
o AS (
  SELECT n, k,
         CASE WHEN (r * (1.0e0/3.0e0) + gg * (1.0e0/3.0e0))
                   + b * (1.0e0/3.0e0) > 0e0
              THEN p / ((r * (1.0e0/3.0e0) + gg * (1.0e0/3.0e0))
                        + b * (1.0e0/3.0e0))
              ELSE 0e0 END AS ratio,
         r, gg, b
  FROM px),
v AS (
  SELECT n, k,
         CAST(floor(least(greatest(r * ratio, 0e0), 255e0)) AS BIGINT)
             AS vr,
         CAST(floor(least(greatest(gg * ratio, 0e0), 255e0)) AS BIGINT)
             AS vg,
         CAST(floor(least(greatest(b * ratio, 0e0), 255e0)) AS BIGINT)
             AS vb
  FROM o)
SELECT printf('img%02d', CAST(n AS INTEGER)) AS image_id,
       CAST(SUM(vr % ([7,11,13,17,19,23,29,31,37,41,43])[k % 11 + 1])
            AS BIGINT) % 65536 AS checksum,
       CAST(MAX(CASE WHEN k = 528 THEN vr END) AS BIGINT) AS center_r,
       CAST(MAX(CASE WHEN k = 528 THEN vg END) AS BIGINT) AS center_g,
       CAST(MAX(CASE WHEN k = 528 THEN vb END) AS BIGINT) AS center_b
FROM v GROUP BY n
"""


def raster_color_relief_q(sf_dir: str):
    """color-map / color-relief (§2.2, stages/raster2.color_map —
    apps/gdaldem_lib.cpp color-relief) under the oracle gate.  Derived
    pixel values stay < 128, so only the ramp's FIRST segment is
    exercised and its slope 255/128 is DYADIC — every interpolated double
    is exact regardless of np.interp's internal expression order, and the
    SQL replay (g = ⌊v·255/128⌋, b = ⌊255 − v·255/128⌋) is bit-safe.
    Output: per-band GDAL checksums + center pixel."""
    from ..core import codecs as CD
    from ..core.checksum import checksum as gchk
    from ..stages.raster2 import color_map
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_images, batch_format="pyarrow")
    out = imgs.map_batches(color_map, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        ids, cr, cg, cb, pg = [], [], [], [], []
        for iid, bt in zip(t.column("image_id").to_pylist(),
                           t.column("bytes").to_pylist()):
            img = CD.decode(bt, "png")
            ids.append(iid)
            cr.append(gchk(img[:, :, 0]))
            cg.append(gchk(img[:, :, 1]))
            cb.append(gchk(img[:, :, 2]))
            pg.append(int(img[16, 16, 1]))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "chk_r": pa.array(cr, pa.int64()),
            "chk_g": pa.array(cg, pa.int64()),
            "chk_b": pa.array(cb, pa.int64()),
            "center_g": pa.array(pg, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_COLOR_RELIEF = """
WITH px AS (
  SELECT n_nationkey AS n, g.k AS k,
         (n_nationkey * 31 + g.k) % (97 + n_nationkey % 13) AS v
  FROM nation, generate_series(0, 1023) g(k)),
v AS (
  SELECT n, k,
         CAST(floor(v * (255.0e0 / 128.0e0)) AS BIGINT) AS vg,
         CAST(floor(255.0e0 - v * (255.0e0 / 128.0e0)) AS BIGINT) AS vb
  FROM px)
SELECT printf('img%02d', CAST(n AS INTEGER)) AS image_id,
       CAST(0 AS BIGINT) AS chk_r,
       CAST(SUM(vg % ([7,11,13,17,19,23,29,31,37,41,43])[k % 11 + 1])
            AS BIGINT) % 65536 AS chk_g,
       CAST(SUM(vb % ([7,11,13,17,19,23,29,31,37,41,43])[k % 11 + 1])
            AS BIGINT) % 65536 AS chk_b,
       CAST(MAX(CASE WHEN k = 528 THEN vg END) AS BIGINT) AS center_g
FROM v GROUP BY n
"""


def _derived_collar_images(b: pa.Table) -> pa.Table:
    """Per nation: a 32×32 band with an exactly-known collar topology —
    a near-black border frame, a CONNECTED inlet column (col 5, rows
    1..r0(n)) and a DISCONNECTED 2×2 near-black blob at the center that
    flood-fill must NOT clean (pins nearblack's connectivity semantics
    against a plain threshold).  Interior values are 20 + derived ≥ 20,
    near values ≤ 11 — all pure integer formulas."""
    from ..core import codecs as CD
    kk = np.asarray(b.column("n_nationkey"), dtype=np.int64)
    ids, bts = [], []
    k = np.arange(1024, dtype=np.int64)
    r, c = k // 32, k % 32
    for n in kk:
        n = int(n)
        m = 97 + n % 13
        v = 20 + (n * 31 + k) % m
        border = (r == 0) | (r == 31) | (c == 0) | (c == 31)
        r0 = 8 + n % 16
        inlet = (c == 5) & (r >= 1) & (r <= r0)
        blob = (r >= 15) & (r <= 16) & (c >= 15) & (c <= 16)
        v = np.where(border, (n + k) % 12, v)
        v = np.where(inlet, k % 10, v)
        v = np.where(blob, 7, v)
        ids.append(f"img{n:02d}")
        bts.append(CD.encode_raw(v.astype(np.uint8).reshape(32, 32)))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "fmt": pa.array(["raw"] * len(ids))})


def raster_collar_q(sf_dir: str):
    """nearblack / clean-collar (§2.2, stages/raster2.clean_collar —
    apps/nearblack_lib.cpp flood-fill semantics) under the oracle gate:
    collar pixel count + checksum of the cleaned band over the known-
    topology fixture (border + connected inlet cleaned to 0; the
    disconnected near-black blob survives — a threshold-only
    implementation would fail the hash)."""
    from ..core import codecs as CD
    from ..core.checksum import checksum as gchk
    from ..stages.raster2 import clean_collar
    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(_derived_collar_images, batch_format="pyarrow")
    out = imgs.map_batches(lambda b: clean_collar(b, threshold=15),
                           batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        ids, chks = [], []
        for iid, bt in zip(t.column("image_id").to_pylist(),
                           t.column("bytes").to_pylist()):
            img = CD.decode(bt, "png")
            ids.append(iid)
            chks.append(gchk(img))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "collar_px": t.column("collar_px"),
            "checksum": pa.array(chks, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RASTER_COLLAR = """
WITH px AS (
  SELECT n_nationkey AS n, g.k AS k, g.k // 32 AS r, g.k % 32 AS c
  FROM nation, generate_series(0, 1023) g(k)),
v AS (
  SELECT n, k,
         CASE
           WHEN r = 0 OR r = 31 OR c = 0 OR c = 31 THEN (n + k) % 12
           WHEN c = 5 AND r >= 1 AND r <= 8 + n % 16 THEN k % 10
           WHEN r BETWEEN 15 AND 16 AND c BETWEEN 15 AND 16 THEN 7
           ELSE 20 + (n * 31 + k) % (97 + n % 13) END AS val,
         (r = 0 OR r = 31 OR c = 0 OR c = 31
          OR (c = 5 AND r >= 1 AND r <= 8 + n % 16)) AS cleaned
  FROM px)
SELECT printf('img%02d', CAST(n AS INTEGER)) AS image_id,
       CAST(SUM(CASE WHEN cleaned THEN 1 ELSE 0 END) AS BIGINT)
           AS collar_px,
       CAST(SUM((CASE WHEN cleaned THEN 0 ELSE val END)
                % ([7,11,13,17,19,23,29,31,37,41,43])[k % 11 + 1])
            AS BIGINT) % 65536 AS checksum
FROM v GROUP BY n
"""


def raster_blend_update_q(sf_dir: str):
    """blend (source-over, constant opacity ½ — dyadic, so the float
    chain is exact) and update (integer patch paste) — §2.2's remaining
    per-pixel composition ops (stages/raster2.blend / raster_update)
    under ONE oracle slot: per image the checksum of the blended band 0
    and of the updated band."""
    from ..core import codecs as CD
    from ..core.checksum import checksum as gchk
    from ..stages.raster2 import blend, raster_update

    def inputs(b: pa.Table) -> pa.Table:
        kk = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ids, bts, obts, pbts, pxs, pys = [], [], [], [], [], []
        k = np.arange(1024, dtype=np.int64)
        for n in kk:
            n = int(n)
            m = 97 + n % 13
            base = ((n * 31 + k) % m).astype(np.uint8).reshape(32, 32)
            over = ((n * 37 + k + 5) % m).astype(np.uint8).reshape(32, 32)
            patch = ((n * 41 + np.arange(64) + 9) % m) \
                .astype(np.uint8).reshape(8, 8)
            ids.append(f"img{n:02d}")
            bts.append(CD.encode_raw(base))
            obts.append(CD.encode_raw(over))
            pbts.append(CD.encode_raw(patch))
            pxs.append(n % 20)
            pys.append((n * 3) % 20)
        z = len(ids)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bts, pa.binary()),
            "fmt": pa.array(["raw"] * z),
            "overlay_bytes": pa.array(obts, pa.binary()),
            "overlay_fmt": pa.array(["raw"] * z),
            "patch_bytes": pa.array(pbts, pa.binary()),
            "patch_fmt": pa.array(["raw"] * z),
            "patch_x": pa.array(pxs, pa.int64()),
            "patch_y": pa.array(pys, pa.int64())})

    imgs = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(inputs, batch_format="pyarrow")
    blended = imgs.map_batches(lambda b: blend(b, opacity=0.5),
                               batch_format="pyarrow")
    updated = imgs.map_batches(raster_update, batch_format="pyarrow")

    def chk_of(t: pa.Table, col: str) -> pa.Table:
        ids, chks = [], []
        for iid, bt, fmt in zip(t.column("image_id").to_pylist(),
                                t.column("bytes").to_pylist(),
                                t.column("fmt").to_pylist()
                                if "fmt" in t.column_names
                                else ["png"] * t.num_rows):
            img = CD.decode(bt, fmt)
            band = img if img.ndim == 2 else img[:, :, 0]
            ids.append(iid)
            chks.append(gchk(band))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         col: pa.array(chks, pa.int64())})

    a = blended.map_batches(lambda t: chk_of(t, "chk_blend"),
                            batch_format="pyarrow")
    u = updated.map_batches(lambda t: chk_of(t, "chk_update"),
                            batch_format="pyarrow")
    j = a.join(u, join_type="inner", num_partitions=_join_partitions(),
               on=("image_id",))
    return j.select_columns(["image_id", "chk_blend", "chk_update"])


SQL_RASTER_BLEND_UPDATE = """
WITH px AS (
  SELECT n_nationkey AS n, g.k AS k, g.k // 32 AS r, g.k % 32 AS c,
         (n_nationkey * 31 + g.k) % (97 + n_nationkey % 13) AS base,
         (n_nationkey * 37 + g.k + 5) % (97 + n_nationkey % 13) AS ov
  FROM nation, generate_series(0, 1023) g(k)),
v AS (
  SELECT n, k, r, c,
         CAST(floor(least(greatest(ov * 0.5e0 + base * 0.5e0, 0e0), 255e0)
                    + 0.5e0) AS BIGINT) AS vblend,
         CASE WHEN c >= n % 20 AND c < n % 20 + 8
               AND r >= (n * 3) % 20 AND r < (n * 3) % 20 + 8
              THEN (n * 41 + (r - (n * 3) % 20) * 8 + (c - n % 20) + 9)
                   % (97 + n % 13)
              ELSE base END AS vupd
  FROM px)
SELECT printf('img%02d', CAST(n AS INTEGER)) AS image_id,
       CAST(SUM(vblend % ([7,11,13,17,19,23,29,31,37,41,43])[k % 11 + 1])
            AS BIGINT) % 65536 AS chk_blend,
       CAST(SUM(vupd % ([7,11,13,17,19,23,29,31,37,41,43])[k % 11 + 1])
            AS BIGINT) % 65536 AS chk_update
FROM v GROUP BY n
"""


def raster_contour_q(sf_dir: str):
    """Contour / iso-lines (§2.12, polygonize.contour_lines — marching
    squares + segment stitching per alg/contour.cpp) under the oracle
    gate.  Input: per-nation PLANE DEMs z = n%7 + row + 2·col with a
    half-integer level (base + 31.5), so every cell crossing has exact
    dyadic interpolation t ∈ {¼, ½, ¾} and the full vertex set is a
    closed-form union of the three marching-square cases (u2 = 1/3/5)
    along the band 29 ≤ row + 2·col ≤ 31.  Output: one row per DISTINCT
    stitched-polyline vertex (coords ×4 → exact ints) + the stitched
    line count (pins the merge step: one connected polyline)."""
    from .polygonize import contour_lines

    def make(b: pa.Table) -> pa.Table:
        kk = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        r = np.arange(32, dtype=np.int64)[:, None]
        c = np.arange(32, dtype=np.int64)[None, :]
        ids, nls, x4s, y4s = [], [], [], []
        for n in kk:
            n = int(n)
            band = (n % 7 + r + 2 * c).astype(np.float64)
            lv = float(n % 7) + 31.5
            lines = contour_lines(band, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
                                  [lv])
            nl = len(lines)
            for _, xy in lines:
                for px, py in xy:
                    ids.append(f"img{n:02d}")
                    nls.append(nl)
                    x4s.append(int(round(px * 4)))
                    y4s.append(int(round(py * 4)))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "n_lines": pa.array(nls, pa.int64()),
            "x4": pa.array(x4s, pa.int64()),
            "y4": pa.array(y4s, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(make, batch_format="pyarrow")


SQL_RASTER_CONTOUR = """
WITH cells AS (
  SELECT n_nationkey AS n, x.x AS x, y.y AS y,
         63 - 2 * y.y - 4 * x.x AS u2
  FROM nation, generate_series(0, 30) x(x), generate_series(0, 30) y(y)
  WHERE 63 - 2 * y.y - 4 * x.x IN (1, 3, 5)),
pts AS (
  SELECT n, 4 * x + 3 AS x4, 4 * y + 2 AS y4 FROM cells WHERE u2 = 1
  UNION SELECT n, 4 * x + 2, 4 * y + 4 FROM cells WHERE u2 = 1
  UNION SELECT n, 4 * x + 5, 4 * y + 2 FROM cells WHERE u2 = 3
  UNION SELECT n, 4 * x + 3, 4 * y + 6 FROM cells WHERE u2 = 3
  UNION SELECT n, 4 * x + 6, 4 * y + 4 FROM cells WHERE u2 = 5
  UNION SELECT n, 4 * x + 5, 4 * y + 6 FROM cells WHERE u2 = 5)
SELECT printf('img%02d', CAST(n AS INTEGER)) AS image_id,
       CAST(1 AS BIGINT) AS n_lines, x4, y4
FROM pts
"""


# ---------------------------------------------------------------------------
# Round-5 sixth sitting: training-pipeline text ops under the oracle gate
# ---------------------------------------------------------------------------

def text_pii_scrub_q(sf_dir: str):
    """PII scrub + normalization over the real corpus (text.pii_scrub:
    planted deterministic contact blocks, RE2 redaction, whitespace
    collapse — stateless vectorized map, no shuffle)."""
    from .text import pii_scrub
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(pii_scrub, batch_format="pyarrow")


SQL_TEXT_PII_SCRUB = r"""
WITH aug AS (
  SELECT doc_id,
         text || repeat(' contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                        || '.com call +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                        CAST(doc_id % 3 AS INTEGER) + 1) AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(t), 'user[0-9]+@mail[0-9]+\.com'))
            + len(regexp_extract_all(lower(t), '\+1-555-[0-9]{4}'))
            AS BIGINT) AS n_redacted,
       trim(regexp_replace(regexp_replace(regexp_replace(lower(t),
                'user[0-9]+@mail[0-9]+\.com', '<EMAIL>', 'g'),
                '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
                '\s+', ' ', 'g')) AS clean
FROM aug
"""


def text_seg_dedup_q(sf_dir: str):
    """Segment-level (RefinedWeb line-level) exact dedup over the real
    corpus (text.segment_dedup: one hash-bucketed shuffle for the
    global first-occurrence keep, one doc-bucketed reassembly)."""
    from .text import segment_dedup
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return segment_dedup(docs, seg_words=10)


SQL_TEXT_SEG_DEDUP = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'),
                     x -> len(x) > 0) AS words
  FROM documents),
n AS (SELECT doc_id, words, CAST(len(words) AS BIGINT) AS nw,
             CAST((len(words) + 9) // 10 AS BIGINT) AS nseg FROM w),
segs AS (
  SELECT doc_id, i.i AS idx,
         array_to_string(words[(i.i - 1) * 10 + 1 : LEAST(i.i * 10, nw)],
                         ' ') AS seg
  FROM n, generate_series(1, 64) i(i)  -- no subquery args allowed; fixed
  WHERE i.i <= nseg),                  -- bound ≥ max segs (docs ≤ ~100 words)
kept AS (
  SELECT doc_id, idx, seg FROM segs
  QUALIFY doc_id * 1048576 + idx
          = MIN(doc_id * 1048576 + idx) OVER (PARTITION BY seg)),
re AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS clean,
              CAST(COUNT(*) AS BIGINT) AS n_kept
       FROM kept GROUP BY doc_id)
SELECT n.doc_id, COALESCE(re.clean, '') AS clean_text,
       COALESCE(re.n_kept, 0) AS n_kept, n.nseg AS n_total
FROM n LEFT JOIN re ON re.doc_id = n.doc_id
"""


def vector_convex_hull_q(sf_dir: str):
    """Convex hull (OGRGeometry::ConvexHull analog, stages/vector.py
    Andrew monotone chain) under the oracle gate: per nation a planted
    vertex set of m points on the integer parabola (t, t²) — which are
    in strictly convex position, so ALL of them are hull vertices — plus
    interior points (t, t²+1) that sit strictly between the parabola and
    its closing chord whenever (t−t0)(tm−t) ≥ 2 (guaranteed by m ≥ 4).
    The hull is therefore exactly the m parabola points and its doubled
    shoelace area is closed-form:
      2A = Σ_{t=t0}^{tm−1} t(t+1) − t0·tm·(tm−t0)
    (consecutive parabola cross terms t(t+1), one closing-chord term) —
    pure integers, replayed in DuckDB with a generate_series sum."""
    from ..core import wkb as WKB
    from ..stages.vector import convex_hull as hull_stage

    def mk(b: pa.Table) -> pa.Table:
        ks, blobs = [], []
        for k in np.asarray(b.column("n_nationkey"), np.int64):
            k = int(k)
            m = 4 + k % 5
            t0 = k % 7 - 3
            tm = t0 + m - 1
            pts = [(float(t), float(t * t)) for t in range(t0, tm + 1)]
            pts += [(float(t), float(t * t + 1))
                    for t in range(t0 + 1, tm)]
            ring = np.asarray(pts + [pts[0]], np.float64)
            ks.append(k)
            blobs.append(WKB.dumps({"type": "Polygon", "rings": [ring]}))
        return pa.table({"n_nationkey": pa.array(np.asarray(ks, np.int64)),
                         "wkb": pa.array(blobs, pa.binary())})

    def measure(b: pa.Table) -> pa.Table:
        n_hull, area2 = [], []
        for blob in b.column("wkb").to_pylist():
            ring = WKB.as_polygons(WKB.loads(blob))[0][0]
            v = np.asarray(np.round(ring), np.int64)
            n_hull.append(v.shape[0] - 1)
            x, y = v[:-1, 0], v[:-1, 1]
            xn, yn = np.roll(x, -1), np.roll(y, -1)
            area2.append(int(np.sum(x * yn - xn * y)))
        return pa.table({"n_nationkey": b.column("n_nationkey"),
                         "n_hull": pa.array(np.asarray(n_hull, np.int64)),
                         "area2": pa.array(np.asarray(area2, np.int64))})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(hull_stage, batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_CONVEX_HULL = """
WITH g AS (SELECT CAST(n_nationkey AS BIGINT) AS gid,
                  CAST(4 + n_nationkey % 5 AS BIGINT) AS m,
                  CAST(n_nationkey % 7 - 3 AS BIGINT) AS t0
           FROM nation),
s AS (SELECT gid, m, t0, t0 + m - 1 AS tm FROM g),
acc AS (SELECT gid, SUM(i.i * (i.i + 1)) AS ssum
        FROM s, generate_series(-3, 12) i(i)
        WHERE i.i >= t0 AND i.i <= tm - 1
        GROUP BY gid)
SELECT s.gid AS n_nationkey, s.m AS n_hull,
       CAST(acc.ssum - s.t0 * s.tm * (s.tm - s.t0) AS BIGINT) AS area2
FROM s JOIN acc ON acc.gid = s.gid
"""


def raster_viewshed_q(sf_dir: str):
    """gdal viewshed (alg/viewshed/viewshed.cpp Wang reference-plane; the
    engine's stages/dem.viewshed) under the oracle gate: 1×32 profile
    DEMs with a single wall column at k = 3 + n%20 of height 4 + n%5 —
    with the wall strictly higher than the observer (z=0, obs_height 2),
    the line of sight is blocked for every x > k with a margin ≥ 2 (no
    1e-9 tie cases), so the mask is exactly [x ≤ k] and its row sums are
    closed-form: n_visible = k+1, vis_xsum = k(k+1)/2.  The engine runs
    the REAL ring-ordered min-elevation propagation on real rasters."""
    from ..core import codecs as CD
    from ..stages.dem import viewshed

    def mk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ids, bts, gts, ox, oy = [], [], [], [], []
        for n in k:
            n = int(n)
            wall = 3 + n % 20
            z = np.zeros((1, 32), np.float32)
            z[0, wall] = 4 + n % 5
            ids.append(f"vs{n:02d}")
            bts.append(CD.encode_raw(z))
            gts.append([0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
            ox.append(0)
            oy.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bts, pa.binary()),
            "fmt": pa.array(["raw"] * len(ids)),
            "geotransform": pa.array(gts, pa.list_(pa.float64(), 6)),
            "obs_x": pa.array(np.asarray(ox, np.int64)),
            "obs_y": pa.array(np.asarray(oy, np.int64)),
        })

    def measure(b: pa.Table) -> pa.Table:
        nk, nvis, xsum = [], [], []
        for i in range(b.num_rows):
            mask = CD.decode(b.column("bytes")[i].as_py(),
                             b.column("fmt")[i].as_py())
            row = (mask.reshape(-1) > 0)
            nk.append(int(b.column("image_id")[i].as_py()[2:]))
            nvis.append(int(row.sum()))
            xsum.append(int(np.sum(np.nonzero(row)[0])))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "n_visible": pa.array(nvis, pa.int64()),
                         "vis_xsum": pa.array(xsum, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(viewshed, batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")


SQL_RASTER_VIEWSHED = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       CAST(3 + n_nationkey % 20 + 1 AS BIGINT) AS n_visible,
       CAST((3 + n_nationkey % 20) * (3 + n_nationkey % 20 + 1) // 2
            AS BIGINT) AS vis_xsum
FROM nation
"""


def raster_fillnodata_q(sf_dir: str):
    """GDALFillNodata edge-IDW (alg/rasterfill.cpp; the engine's
    stages/raster2.fill_nodata_idw) under the oracle gate: constant-value
    rasters (v = 2^(4+n%4), a POWER OF TWO so w·v is exact float scaling
    and acc/ws == v bit-exactly) with an interior nodata hole.  The
    directional max_distance=3 search decides WHICH pixels fill — hole
    pixels whose min axis distance to the hole edge exceeds 3 stay
    nodata — so the filled/unfilled split replays the real reachability
    geometry: unfilled = max(0, wh−6)·max(0, hh−6)."""
    from ..core import codecs as CD
    from ..stages.raster2 import fill_nodata_idw

    def mk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ids, bts, nods = [], [], []
        for n in k:
            n = int(n)
            v = 1 << (4 + n % 4)
            c0, r0 = 2 + n % 3, 2 + n % 2
            wh, hh = 5 + n % 7, 5 + n % 5
            z = np.full((16, 16), v, np.uint8)
            z[r0:r0 + hh, c0:c0 + wh] = 0
            ids.append(f"fn{n:02d}")
            bts.append(CD.encode(z, "png"))
            nods.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bts, pa.binary()),
            "fmt": pa.array(["png"] * len(ids)),
            "nodata": pa.array(nods, pa.float64()),
        })

    def measure(b: pa.Table) -> pa.Table:
        nk, nf, nu, fs = [], [], [], []
        for i in range(b.num_rows):
            n = int(b.column("image_id")[i].as_py()[2:])
            c0, r0 = 2 + n % 3, 2 + n % 2
            wh, hh = 5 + n % 7, 5 + n % 5
            img = CD.decode(b.column("bytes")[i].as_py(),
                            b.column("fmt")[i].as_py())
            band = (img if img.ndim == 2 else img[:, :, 0])
            hole = band[r0:r0 + hh, c0:c0 + wh]
            nk.append(n)
            nf.append(int(np.sum(hole > 0)))
            nu.append(int(np.sum(hole == 0)))
            fs.append(int(np.sum(hole.astype(np.int64))))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "n_filled": pa.array(nf, pa.int64()),
                         "n_unfilled": pa.array(nu, pa.int64()),
                         "fill_sum": pa.array(fs, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(lambda b: fill_nodata_idw(b, max_distance=3),
                     batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")


SQL_RASTER_FILLNODATA = """
WITH g AS (
  SELECT CAST(n_nationkey AS BIGINT) AS n,
         CAST(1 << (4 + n_nationkey % 4) AS BIGINT) AS v,
         CAST(5 + n_nationkey % 7 AS BIGINT) AS wh,
         CAST(5 + n_nationkey % 5 AS BIGINT) AS hh
  FROM nation),
u AS (SELECT n, v, wh, hh, wh * hh AS hole,
             greatest(0, wh - 6) * greatest(0, hh - 6) AS unfilled
      FROM g)
SELECT n AS n_nationkey,
       hole - unfilled AS n_filled,
       unfilled AS n_unfilled,
       v * (hole - unfilled) AS fill_sum
FROM u
"""


def vector_buffer_q(sf_dir: str):
    """OGRGeometry::Buffer on points (stages/vector.buffer_points →
    core/geom.buffer_point regular-polygon circles) under the oracle
    gate.  Angle k·(2π/N) is bit-identical between numpy linspace
    (endpoint=False ⇒ arange·(2π/N)) and the SQL expression, cos/sin are
    libm on both sides, and every vertex coordinate is snapped half-up at
    1e-6 BEFORE the doubled shoelace — the cross-term sum is then pure
    int64 (≤ ~5e15), order-free and exact.  The oracle replays all 32
    vertices and the cyclic cross terms with a generate_series self-join."""
    from ..stages.vector import buffer_points

    def mk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        return pa.table({
            "n_nationkey": pa.array(k),
            "x": pa.array((k % 10).astype(np.float64)),
            "y": pa.array((k // 5).astype(np.float64)),
        })

    def measure(b: pa.Table) -> pa.Table:
        from ..core import wkb as WKB
        nk, a2, sxmin, symax = [], [], [], []
        for i in range(b.num_rows):
            ring = WKB.as_polygons(
                WKB.loads(b.column("wkb")[i].as_py()))[0][0][:-1]
            sx = np.floor(ring[:, 0] * 1e6 + 0.5).astype(np.int64)
            sy = np.floor(ring[:, 1] * 1e6 + 0.5).astype(np.int64)
            nx, ny = np.roll(sx, -1), np.roll(sy, -1)
            nk.append(int(b.column("n_nationkey")[i].as_py()))
            a2.append(int(np.sum(sx * ny - nx * sy)))
            sxmin.append(int(sx.min()))
            symax.append(int(sy.max()))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "area2": pa.array(a2, pa.int64()),
                         "sx_min": pa.array(sxmin, pa.int64()),
                         "sy_max": pa.array(symax, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(lambda b: buffer_points(b, dist=2.0, quadsegs=8),
                     batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_BUFFER = """
WITH pts AS (
  SELECT CAST(n_nationkey AS BIGINT) AS n,
         CAST(n_nationkey % 10 AS DOUBLE) AS cx,
         CAST(n_nationkey // 5 AS DOUBLE) AS cy
  FROM nation),
v AS (
  SELECT n, k.k AS k,
         CAST(floor((cx + 2.0 * cos(k.k * (2 * pi() / 32))) * 1000000
                    + 0.5) AS BIGINT) AS sx,
         CAST(floor((cy + 2.0 * sin(k.k * (2 * pi() / 32))) * 1000000
                    + 0.5) AS BIGINT) AS sy
  FROM pts, generate_series(0, 31) k(k))
SELECT v.n AS n_nationkey,
       CAST(SUM(v.sx * w.sy - w.sx * v.sy) AS BIGINT) AS area2,
       MIN(v.sx) AS sx_min, MAX(v.sy) AS sy_max
FROM v JOIN v w ON w.n = v.n AND w.k = (v.k + 1) % 32
GROUP BY v.n
"""


def raster_resize_reduce_q(sf_dir: str):
    """Non-kernel reduce resamplers (alg/gdalwarper.h GRA_Min/Max/Med/Sum;
    core/resample.resize_reduce) under the oracle gate: derived integer
    16×16 rasters v = (n·31 + r·16 + c) % 251 reduced 2× — with an exact
    integer factor every output cell covers one 2×2 block at weight 1, so
    min/max are block order statistics, median of 4 = (total−min−max)/2
    (exact dyadic), and sum is sum-preserving (output total == input
    total).  DuckDB replays every block with generate_series."""
    from ..core.resample import resize_reduce

    def run(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        nk, mins, maxs, med2, tot = [], [], [], [], []
        for n in k:
            n = int(n)
            rr, cc = np.meshgrid(np.arange(16), np.arange(16),
                                 indexing="ij")
            v = ((n * 31 + rr * 16 + cc) % 251).astype(np.float64)
            o_min = resize_reduce(v, 8, 8, "min")
            o_max = resize_reduce(v, 8, 8, "max")
            o_med = resize_reduce(v, 8, 8, "median")
            o_sum = resize_reduce(v, 8, 8, "sum")
            nk.append(n)
            mins.append(int(np.sum(o_min)))
            maxs.append(int(np.sum(o_max)))
            med2.append(int(np.sum(np.round(o_med * 2.0))))
            tot.append(int(np.sum(o_sum)))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "min_sum": pa.array(mins, pa.int64()),
                         "max_sum": pa.array(maxs, pa.int64()),
                         "med2_sum": pa.array(med2, pa.int64()),
                         "sum_total": pa.array(tot, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_RESIZE_REDUCE = """
WITH blocks AS (
  SELECT CAST(n_nationkey AS BIGINT) AS n, by.b AS br, bx.b AS bc,
         (n_nationkey * 31 + (by.b * 2) * 16 + bx.b * 2) % 251 AS a,
         (n_nationkey * 31 + (by.b * 2) * 16 + bx.b * 2 + 1) % 251 AS b,
         (n_nationkey * 31 + (by.b * 2 + 1) * 16 + bx.b * 2) % 251 AS c,
         (n_nationkey * 31 + (by.b * 2 + 1) * 16 + bx.b * 2 + 1) % 251 AS d
  FROM nation, generate_series(0, 7) by(b), generate_series(0, 7) bx(b))
SELECT n AS n_nationkey,
       CAST(SUM(LEAST(a, b, c, d)) AS BIGINT) AS min_sum,
       CAST(SUM(GREATEST(a, b, c, d)) AS BIGINT) AS max_sum,
       CAST(SUM(a + b + c + d - LEAST(a, b, c, d)
                - GREATEST(a, b, c, d)) AS BIGINT) AS med2_sum,
       CAST(SUM(a + b + c + d) AS BIGINT) AS sum_total
FROM blocks GROUP BY n
"""


def vector_segmentize_q(sf_dir: str):
    """gdal vector segmentize (OGRGeometry::segmentize; the engine's
    stages/vector.segmentize → core/geom.segmentize_line) under the
    oracle gate: axis-aligned squares of side L = 5 + n%7 at max_len 1.5
    — every side length is the exact float L, the subdivision count
    n = ceil(L/1.5) is integer-identical on both engines, and the
    interpolated vertices t_k = k·(1/n) (numpy linspace step semantics)
    replay as the SAME double chain in SQL; coordinates snap half-up at
    1e-6 before summing."""
    from ..core import wkb as WKB
    from ..stages.vector import segmentize

    def mk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        nk, blobs = [], []
        for n in k:
            n = int(n)
            L = float(5 + n % 7)
            ring = np.asarray([(0.0, 0.0), (L, 0.0), (L, L), (0.0, L),
                               (0.0, 0.0)], np.float64)
            nk.append(n)
            blobs.append(WKB.dumps({"type": "Polygon", "rings": [ring]}))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "wkb": pa.array(blobs, pa.binary())})

    def measure(b: pa.Table) -> pa.Table:
        nk, nv, sx, sy = [], [], [], []
        for i in range(b.num_rows):
            ring = WKB.as_polygons(
                WKB.loads(b.column("wkb")[i].as_py()))[0][0]
            nk.append(int(b.column("n_nationkey")[i].as_py()))
            nv.append(ring.shape[0])
            sx.append(int(np.sum(np.floor(ring[:, 0] * 1e6 + 0.5)
                                 .astype(np.int64))))
            sy.append(int(np.sum(np.floor(ring[:, 1] * 1e6 + 0.5)
                                 .astype(np.int64))))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "n_vertices": pa.array(nv, pa.int64()),
                         "sx_sum": pa.array(sx, pa.int64()),
                         "sy_sum": pa.array(sy, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(lambda b: segmentize(b, max_len=1.5),
                     batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_SEGMENTIZE = """
WITH g AS (
  SELECT CAST(n_nationkey AS BIGINT) AS n,
         CAST(5 + n_nationkey % 7 AS DOUBLE) AS L,
         CAST(ceil(CAST(5 + n_nationkey % 7 AS DOUBLE) / 1.5) AS BIGINT)
             AS ns
  FROM nation),
pts AS (
  -- side s, interpolation step k (1..ns): p + t*(q-p), t = k*(1/ns)
  SELECT n, L, ns, s.s AS s, k.k AS k,
         CASE s.s
           WHEN 0 THEN (k.k * (1.0 / CAST(ns AS DOUBLE))) * L
           WHEN 1 THEN L
           WHEN 2 THEN L + (k.k * (1.0 / CAST(ns AS DOUBLE))) * (-L)
           ELSE 0.0 END AS x,
         CASE s.s
           WHEN 0 THEN 0.0
           WHEN 1 THEN (k.k * (1.0 / CAST(ns AS DOUBLE))) * L
           WHEN 2 THEN L
           ELSE L + (k.k * (1.0 / CAST(ns AS DOUBLE))) * (-L) END AS y
  FROM g, generate_series(0, 3) s(s), generate_series(1, 16) k(k)
  WHERE k.k <= ns)
SELECT n AS n_nationkey,
       CAST(4 * MAX(ns) + 1 AS BIGINT) AS n_vertices,
       CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sx_sum,  -- the ring's leading (0,0) adds zero to both sums
       CAST(SUM(CAST(floor(y * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sy_sum
FROM pts GROUP BY n
"""


def vector_explode_q(sf_dir: str):
    """gdal vector explode-collections
    (apps/gdalalg_vector_explode_collections.cpp; the engine's
    stages/vector.explode_collections) under the oracle gate: planted
    MultiPolygons of 1 + n%4 unit squares at x-offsets 3i — one output
    row per part with attributes replicated, counted and checksummed by
    the snapped first-vertex x."""
    from ..core import wkb as WKB
    from ..stages.vector import explode_collections

    def mk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        nk, blobs = [], []
        for n in k:
            n = int(n)
            polys = []
            for i in range(1 + n % 4):
                x0 = 3.0 * i
                polys.append([np.asarray(
                    [(x0, 0.0), (x0 + 1.0, 0.0), (x0 + 1.0, 1.0),
                     (x0, 1.0), (x0, 0.0)], np.float64)])
            nk.append(n)
            blobs.append(WKB.dumps({"type": "MultiPolygon",
                                    "polys": polys}))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "wkb": pa.array(blobs, pa.binary())})

    def measure(b: pa.Table) -> pa.Table:
        nk = np.asarray(b.column("n_nationkey"), np.int64)
        xs = []
        for blob in b.column("wkb").to_pylist():
            ring = WKB.as_polygons(WKB.loads(blob))[0][0]
            xs.append(int(np.floor(ring[0, 0] * 1e6 + 0.5)))
        g = pa.table({"n_nationkey": pa.array(nk),
                      "one": pa.array(np.ones(nk.size, np.int64)),
                      "x0": pa.array(np.asarray(xs, np.int64))}) \
            .group_by("n_nationkey") \
            .aggregate([("one", "sum"), ("x0", "sum")])
        return pa.table({"n_nationkey": g.column("n_nationkey"),
                         "n_parts": g.column("one_sum"),
                         "x0_sum": g.column("x0_sum")})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(explode_collections, batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_EXPLODE = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       CAST(1 + n_nationkey % 4 AS BIGINT) AS n_parts,
       -- sum over parts i of snapped 3i: 3e6 * (m-1)m/2, m = parts
       CAST(3000000 * ((n_nationkey % 4) * (n_nationkey % 4 + 1)) // 2
            AS BIGINT) AS x0_sum
FROM nation
"""


def dedup_span_docs_q(sf_dir: str):
    """Exact substring-span dedup over the real corpus (Lee et al. 2022
    ExactSubstr; dedup.span_dedup): non-first occurrences of globally
    duplicated 5-word grams are removed word-by-word and the survivors
    re-joined.  DuckDB replays: window MIN over the gram for the
    first-occurrence rule, a width-5 windowed SUM for coverage, ordered
    FILTER string_agg for the reassembly."""
    from .dedup import span_dedup
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return span_dedup(docs, k=5)


SQL_DEDUP_SPAN_DOCS = r"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) AS words
  FROM documents),
pos AS (
  SELECT doc_id, p.p AS p, words[p.p] AS word,
         CAST(len(words) AS BIGINT) AS nw
  FROM w, generate_series(1, 128) p(p)
  WHERE p.p <= len(words)),
grams AS (
  SELECT doc_id, p, array_to_string(words[p : p + 4], ' ') AS g
  FROM w, generate_series(1, 128) p(p)
  WHERE p.p <= len(words) - 4),
flag AS (
  SELECT doc_id, p,
         CASE WHEN doc_id * 1048576 + p
                   > MIN(doc_id * 1048576 + p) OVER (PARTITION BY g)
              THEN 1 ELSE 0 END AS dup
  FROM grams),
cov AS (
  SELECT pos.doc_id, pos.p, pos.word,
         SUM(COALESCE(f.dup, 0)) OVER (
             PARTITION BY pos.doc_id ORDER BY pos.p
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS c
  FROM pos LEFT JOIN flag f
       ON f.doc_id = pos.doc_id AND f.p = pos.p),
re AS (
  SELECT doc_id,
         string_agg(word, ' ' ORDER BY p) FILTER (WHERE c = 0) AS clean,
         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM cov GROUP BY doc_id)
SELECT doc_id, COALESCE(clean, '') AS clean_text, n_words, n_removed
FROM re
"""


def text_importance_q(sf_dir: str):
    """DSIR importance weights over the real corpus, target slice
    lang='en' vs full-corpus background (text.importance_weights — one
    token-hash co-shuffle, dual in-group segment counts, int64-quantized
    log-ratios)."""
    from .text import importance_weights
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return importance_weights(docs)


SQL_TEXT_IMPORTANCE = r"""
WITH toks AS (
  SELECT doc_id, lang, t.tok FROM documents,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> len(x) > 0)) t(tok)),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tb,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS tt
        FROM toks),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cb,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ct
        FROM toks GROUP BY tok),
lp AS (SELECT tok,
              CAST(floor(1000000.0 * ln(
                  CAST((ct + 1) * (tb + 1) AS DOUBLE)
                  / CAST((cb + 1) * (tt + 1) AS DOUBLE))) AS BIGINT) AS q
       FROM cnt, tot),
per AS (SELECT doc_id, CAST(SUM(lp.q) AS BIGINT) AS logw_q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM toks JOIN lp ON lp.tok = toks.tok GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(per.n, 0) AS n_tokens,
       COALESCE(per.logw_q, 0) AS logw_q,
       CAST(COALESCE(per.logw_q, 0) AS DOUBLE) / 1000000.0 AS logw
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""


def q_date_funcs(sf_dir: str):
    """Datetime scalar-function surface (the OGR SQL datetime set,
    swq_op_registrar.cpp + ogr_sql date functions): year/month/day/hour/
    minute, ISO day-of-week, day-of-year, quarter, epoch seconds and a
    month-truncation string — all exact integer calendar math (numpy
    datetime64 casts vs DuckDB extract functions), no float anywhere."""
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def fn(b: pa.Table) -> pa.Table:
        ts = np.asarray(b.column("ts").cast(pa.int64()), np.int64) \
            .astype("datetime64[us]")
        days = ts.astype("datetime64[D]")
        years = ts.astype("datetime64[Y]")
        months = ts.astype("datetime64[M]")
        y = years.astype(np.int64) + 1970
        m = (months - years).astype(np.int64) + 1
        d = (days - months).astype(np.int64) + 1
        sec_of_day = (ts - days).astype("timedelta64[s]").astype(np.int64)
        hour = sec_of_day // 3600
        minute = sec_of_day % 3600 // 60
        epoch_days = days.astype(np.int64)
        isodow = (epoch_days + 3) % 7 + 1           # 1970-01-01 = Thursday
        doy = (days - years).astype(np.int64) + 1
        quarter = (m - 1) // 3 + 1
        epoch_s = ts.astype("datetime64[s]").astype(np.int64)
        mstart = np.datetime_as_string(months.astype("datetime64[D]"),
                                       unit="D")
        return pa.table({
            "event_id": b.column("event_id"),
            "y": pa.array(y), "m": pa.array(m), "d": pa.array(d),
            "hour": pa.array(hour), "minute": pa.array(minute),
            "isodow": pa.array(isodow), "doy": pa.array(doy),
            "quarter": pa.array(quarter), "epoch_s": pa.array(epoch_s),
            "month_start": pa.array([str(x) for x in mstart], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DATE_FUNCS = """
SELECT event_id,
       CAST(year(ts) AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(day(ts) AS BIGINT) AS d,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(minute(ts) AS BIGINT) AS minute,
       CAST(isodow(ts) AS BIGINT) AS isodow,
       CAST(dayofyear(ts) AS BIGINT) AS doy,
       CAST(quarter(ts) AS BIGINT) AS quarter,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
       strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_start
FROM events
"""


def video_frames_q(sf_dir: str):
    """Video frame sampling under the oracle gate: REAL MJPEG-in-AVI
    containers (stages/multimodal.build_mjpeg_avi RIFF layout) with
    constant-gray frames at JPEG quality 100 — DC-only blocks with
    all-ones quant tables decode BIT-EXACTLY (the vp8i constant-class
    trick applied to T.81), so after the real RIFF walk + real JPEG
    decode + real PNG re-encode, each sampled frame's value is the
    planted g = (n·31 + 17·fi) % 200 + 20 and the sums are closed-form.
    F = 6 + n%7 frames at 2 fps sampled every 1 s → stride 2."""
    from ..core import codecs as CD
    from ..stages.multimodal import VideoFrameSampleStage, build_mjpeg_avi

    def mk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ids, blobs = [], []
        for n in k:
            n = int(n)
            frames = [np.full((16, 16), (n * 31 + 17 * i) % 200 + 20,
                              np.uint8) for i in range(6 + n % 7)]
            ids.append(f"vid{n:02d}")
            blobs.append(build_mjpeg_avi(frames, fps=2.0, quality=100))
        return pa.table({"video_id": pa.array(ids, pa.string()),
                         "bytes": pa.array(blobs, pa.binary())})

    def measure(b: pa.Table) -> pa.Table:
        vals = {}
        for i in range(b.num_rows):
            n = int(b.column("video_id")[i].as_py()[3:])
            img = CD.decode(b.column("frame_png")[i].as_py(), "png")
            band = img if img.ndim == 2 else img[:, :, 0]
            fi = int(b.column("frame_idx")[i].as_py())
            s = vals.setdefault(n, [0, 0, 0])
            s[0] += 1
            s[1] += fi
            s[2] += int(band[0, 0]) if np.all(band == band[0, 0]) else -1
        nk = sorted(vals)
        return pa.table({
            "n_nationkey": pa.array(nk, pa.int64()),
            "n_sampled": pa.array([vals[n][0] for n in nk], pa.int64()),
            "idx_sum": pa.array([vals[n][1] for n in nk], pa.int64()),
            "gray_sum": pa.array([vals[n][2] for n in nk], pa.int64()),
        })

    sampler = VideoFrameSampleStage(every_n_seconds=1.0)
    parts = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(sampler, batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")
    # partial rows are per-BATCH; merge in case Ray re-batches the
    # sampler output across measure calls
    from .shuffle_utils import grouped_agg
    out = grouped_agg(parts, ["n_nationkey"],
                      [("n_sampled", "sum"), ("idx_sum", "sum"),
                       ("gray_sum", "sum")])
    import ray.data as _rd
    return _rd.from_arrow(out) if isinstance(out, pa.Table) else out


SQL_VIDEO_FRAMES = """
WITH g AS (SELECT CAST(n_nationkey AS BIGINT) AS n,
                  CAST(6 + n_nationkey % 7 AS BIGINT) AS f
           FROM nation),
-- sampled frames fi = 2j, j = 0..ceil(f/2)-1
s AS (SELECT n, f, j.j AS j, 2 * j.j AS fi
      FROM g, generate_series(0, 6) j(j)
      WHERE 2 * j.j < f)
SELECT n AS n_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(fi) AS BIGINT) AS idx_sum,
       CAST(SUM((n * 31 + 17 * fi) % 200 + 20) AS BIGINT) AS gray_sum
FROM s GROUP BY n
"""


def vector_format_roundtrip_q(sf_dir: str):
    """OGR format writers on the driver surface: one planted point layer
    (dyadic coordinates, so every text/binary representation roundtrips
    bit-exactly) is written as GeoJSON, GeoPackage, FlatGeobuf and
    Shapefile (sources/vector_writers — hand-built spec bytes), then
    read back through the REAL spec-conformant readers
    (sources/vector_formats) as Ray datasets; per format the feature
    count and snapped coordinate sums must equal the closed form."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = _read(sf_dir, "nation", ["n_nationkey"]).take_all()
    fids, blobs = [], []
    for r in sorted(x["n_nationkey"] for x in nat):
        n = int(r)
        for j in range(3):
            fids.append(n * 10 + j)
            blobs.append(WKB.dumps({"type": "Point",
                                    "xy": (n % 10 + j + 0.25,
                                           n // 5 + 0.5)}))
    tab = pa.table({"fid": pa.array(fids, pa.int64()),
                    "wkb": pa.array(blobs, pa.binary())})

    d = tempfile.mkdtemp(prefix="vecrt_")
    open(os.path.join(d, "a.geojson"), "wb").write(VW.geojson_bytes(tab))
    open(os.path.join(d, "a.gpkg"), "wb").write(
        VW.gpkg_bytes({"layer": tab}))
    open(os.path.join(d, "a.fgb"), "wb").write(VW.flatgeobuf_bytes(tab))
    for ext, bts in VW.shapefile_bytes(tab).items():
        open(os.path.join(d, "a." + ext), "wb").write(bts)

    readers = {
        "geojson": VF.read_geojson([os.path.join(d, "a.geojson")]),
        "gpkg": VF.read_gpkg([os.path.join(d, "a.gpkg")]),
        "flatgeobuf": VF.read_flatgeobuf([os.path.join(d, "a.fgb")]),
        "shapefile": VF.read_shapefile([os.path.join(d, "a.shp")]),
    }

    def measure(fmt):
        def fn(b: pa.Table) -> pa.Table:
            sx = sy = 0
            for blob in b.column("wkb").to_pylist():
                g = WKB.loads(blob)
                x, y = g["xy"] if "xy" in g else tuple(g["points"][0])
                sx += int(np.floor(x * 1e6 + 0.5))
                sy += int(np.floor(y * 1e6 + 0.5))
            return pa.table({"fmt": pa.array([fmt], pa.string()),
                             "n_features": pa.array([b.num_rows],
                                                    pa.int64()),
                             "sx_sum": pa.array([sx], pa.int64()),
                             "sy_sum": pa.array([sy], pa.int64())})
        return fn

    parts = None
    for fmt, ds in readers.items():
        p = ds.map_batches(measure(fmt), batch_format="pyarrow")
        parts = p if parts is None else parts.union(p)
    from .shuffle_utils import grouped_agg
    out = grouped_agg(parts, ["fmt"],
                      [("n_features", "sum"), ("sx_sum", "sum"),
                       ("sy_sum", "sum")])
    import ray.data as _rd
    return _rd.from_arrow(out) if isinstance(out, pa.Table) else out


SQL_VECTOR_FORMAT_ROUNDTRIP = """
WITH f(fmt) AS (VALUES ('geojson'), ('gpkg'), ('flatgeobuf'),
                       ('shapefile')),
pts AS (
  SELECT n_nationkey AS n, j.j AS j,
         CAST(floor((n_nationkey % 10 + j.j + 0.25) * 1000000 + 0.5)
              AS BIGINT) AS sx,
         CAST(floor((n_nationkey // 5 + 0.5) * 1000000 + 0.5)
              AS BIGINT) AS sy
  FROM nation, generate_series(0, 2) j(j))
SELECT f.fmt, CAST(COUNT(*) AS BIGINT) AS n_features,
       CAST(SUM(sx) AS BIGINT) AS sx_sum,
       CAST(SUM(sy) AS BIGINT) AS sy_sum
FROM f, pts GROUP BY f.fmt
"""


def catalog_mixed_formats_q(sf_dir: str):
    """Mixed web-scraped-catalog ingest: every nation contributes one
    PNG, one JPEG, one GeoTIFF, one lossless-WebP (VP8L) AND one foreign
    interchange-lossy `VP8 ` WebP.  The real ImageFeatureStage decodes
    the four supported payloads through the real codecs (constant-gray
    content, bit-exact in all four — JPEG DC-only blocks included) and
    QUARANTINES the foreign row (codecs.CapabilityError → null features
    + decode_error reason; reference driver-level 'cannot open'
    semantics) instead of failing the batch.  Per nation: 4 decoded,
    1 quarantined, mean_sum = 4a + 6 closed-form."""
    import struct

    from ..core import codecs as CD
    from ..stages.multimodal import ImageFeatureStage

    def mk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ids, bts, fmts = [], [], []
        for n in k:
            n = int(n)
            a = (n * 31) % 200 + 10
            for off, fmt in enumerate(("png", "jpeg", "tiff", "webp")):
                img = np.full((16, 16), a + off, np.uint8)
                ids.append(f"mx{n:02d}_{fmt}")
                bts.append(CD.encode(img, fmt))
                fmts.append(fmt)
            payload = b"\x00" * 20
            chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
            body = b"WEBP" + chunk
            ids.append(f"mx{n:02d}_vp8lossy")
            bts.append(b"RIFF" + struct.pack("<I", len(body)) + body)
            fmts.append("webp")
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "bytes": pa.array(bts, pa.binary()),
                         "fmt": pa.array(fmts, pa.string())})

    def measure(b: pa.Table) -> pa.Table:
        counts = {}
        means = b.column("mean").to_pylist()
        errs = b.column("decode_error").to_pylist()
        for i in range(b.num_rows):
            n = int(b.column("image_id")[i].as_py()[2:4])
            s = counts.setdefault(n, [0, 0, 0])
            if errs[i]:
                s[1] += 1
            else:
                s[0] += 1
                s[2] += int(np.floor(means[i] + 0.5))
        nk = sorted(counts)
        return pa.table({
            "n_nationkey": pa.array(nk, pa.int64()),
            "n_decoded": pa.array([counts[n][0] for n in nk], pa.int64()),
            "n_quarantined": pa.array([counts[n][1] for n in nk],
                                      pa.int64()),
            "mean_sum": pa.array([counts[n][2] for n in nk], pa.int64()),
        })

    stage = ImageFeatureStage(on_error="quarantine")
    parts = _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(mk, batch_format="pyarrow") \
        .map_batches(stage, batch_format="pyarrow") \
        .map_batches(measure, batch_format="pyarrow")
    from .shuffle_utils import grouped_agg
    out = grouped_agg(parts, ["n_nationkey"],
                      [("n_decoded", "sum"), ("n_quarantined", "sum"),
                       ("mean_sum", "sum")])
    import ray.data as _rd
    return _rd.from_arrow(out) if isinstance(out, pa.Table) else out


SQL_CATALOG_MIXED_FORMATS = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       CAST(4 AS BIGINT) AS n_decoded,
       CAST(1 AS BIGINT) AS n_quarantined,
       CAST(4 * ((n_nationkey * 31) % 200 + 10) + 6 AS BIGINT)
           AS mean_sum
FROM nation
"""


def raster_warp_kernels_q(sf_dir: str):
    """Warp kernel matrix under the oracle gate (gdalwarpkernel.cpp
    GWKNearest / GWKBilinear / GWKCubic via core/resample.resize): 2×
    downscale of dyadic plane rasters puts every sample at ±0.5 / ±1.5
    pixel offsets where the bilinear (0.5) and Catmull-Rom (0.5625,
    −0.0625) weights are exactly representable, so the interpolating
    kernels reproduce the plane BIT-EXACTLY at interior pixels (linear
    reproduction with dyadic arithmetic; cubicspline's /6 weights are
    excluded for that reason) and nearest picks the integer-index plane
    value.  Interior 6×6 sums ×8 are integers with per-kernel closed
    forms."""
    from ..core.resample import resize

    def run(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        nk, nearq, bilq, cubq = [], [], [], []
        jj, ii = np.meshgrid(np.arange(16, dtype=np.float64),
                             np.arange(16, dtype=np.float64))
        for n in k:
            n = int(n)
            gx = (n % 7 - 3) * 0.5
            gy = (n % 5 - 2) * 0.25
            z = (128.0 + gx * jj + gy * ii).astype(np.float32)
            sums = []
            for method in ("near", "bilinear", "cubic"):
                o = resize(z, 8, 8, method=method)
                sums.append(int(np.round(
                    np.sum(o[1:7, 1:7].astype(np.float64)) * 8.0)))
            nk.append(n)
            nearq.append(sums[0])
            bilq.append(sums[1])
            cubq.append(sums[2])
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "near_q8": pa.array(nearq, pa.int64()),
                         "bilinear_q8": pa.array(bilq, pa.int64()),
                         "cubic_q8": pa.array(cubq, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_WARP_KERNELS = """
-- interior output pixels (1..6)^2; dst center j maps to src index
-- 2j+0.5 for interpolating kernels, floor(2j+1) = 2j+1 for nearest.
-- sum_{k=1..6}(2k+0.5) = 45, sum_{k=1..6}(2k+1) = 48; 36 pixels.
-- 8*plane = 1024 + 4*(n%7-3)*j8 + 2*(n%5-2)*i8 at (j8,i8) index*8 terms.
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       CAST(36 * 1024 + 4 * (n_nationkey % 7 - 3) * 48 * 6
            + 2 * (n_nationkey % 5 - 2) * 48 * 6 AS BIGINT) AS near_q8,
       CAST(36 * 1024 + 4 * (n_nationkey % 7 - 3) * 45 * 6
            + 2 * (n_nationkey % 5 - 2) * 45 * 6 AS BIGINT)
           AS bilinear_q8,
       CAST(36 * 1024 + 4 * (n_nationkey % 7 - 3) * 45 * 6
            + 2 * (n_nationkey % 5 - 2) * 45 * 6 AS BIGINT) AS cubic_q8
FROM nation
"""


def vector_csv_roundtrip_q(sf_dir: str):
    """OGR CSV driver on the driver surface (ogr/ogrsf_frmts/csv):
    a planted layer with RFC-4180 hostile strings (embedded commas and
    quotes), a NULL-bearing dyadic float column and WKT point geometry is
    written with sources.vector_writers.csv_bytes (AS_WKT layout), read
    back through the REAL typed parser (sources.vector_formats.read_csv:
    autodetect int64/float64/string, WKT→wkb), and measured: the round
    trip must be identity, so every aggregate has a closed form over
    nation."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    fids, names, vals, blobs = [], [], [], []
    for r in sorted(nat, key=lambda x: int(x["n_nationkey"])):
        n = int(r["n_nationkey"])
        fids.append(n)
        names.append(str(r["n_name"]) + ',"')     # force RFC 4180 quoting
        vals.append(None if n % 5 == 0 else n + 0.25)
        blobs.append(WKB.point(n % 10 + 0.25, n // 5 + 0.5))
    tab = pa.table({"fid": pa.array(fids, pa.int64()),
                    "name": pa.array(names, pa.string()),
                    "val": pa.array(vals, pa.float64()),
                    "wkb": pa.array(blobs, pa.binary())})
    d = tempfile.mkdtemp(prefix="csvrt_")
    p = os.path.join(d, "layer.csv")
    open(p, "wb").write(VW.csv_bytes(tab))

    def measure(b: pa.Table) -> pa.Table:
        fid = np.asarray(b.column("fid"), dtype=np.int64)
        val = b.column("val")
        v = np.asarray(val.fill_null(0.0), dtype=np.float64)
        nn = int(val.null_count)
        sx = sy = 0
        for blob in b.column("wkb").to_pylist():
            x, y = WKB.loads(blob)["xy"]
            sx += int(np.floor(x * 1e6 + 0.5))
            sy += int(np.floor(y * 1e6 + 0.5))
        nlen = sum(len(s) for s in b.column("name").to_pylist())
        return pa.table({
            "n_features": pa.array([b.num_rows], pa.int64()),
            "fid_sum": pa.array([int(fid.sum())], pa.int64()),
            "val4_sum": pa.array([int(np.round(v.sum() * 4))], pa.int64()),
            "n_nulls": pa.array([nn], pa.int64()),
            "name_len_sum": pa.array([nlen], pa.int64()),
            "sx_sum": pa.array([sx], pa.int64()),
            "sy_sum": pa.array([sy], pa.int64())})

    return VF.read_csv([p]).map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_CSV_ROUNDTRIP = """
SELECT COUNT(*) AS n_features,
       SUM(n_nationkey) AS fid_sum,
       CAST(SUM(CASE WHEN n_nationkey % 5 = 0 THEN 0
                     ELSE 4 * n_nationkey + 1 END) AS BIGINT) AS val4_sum,
       CAST(SUM(CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
       CAST(SUM(LENGTH(n_name) + 2) AS BIGINT) AS name_len_sum,
       CAST(SUM((n_nationkey % 10) * 1000000 + 250000) AS BIGINT) AS sx_sum,
       CAST(SUM((n_nationkey // 5) * 1000000 + 500000) AS BIGINT) AS sy_sum
FROM nation
"""


def raster_aaigrid_q(sf_dir: str):
    """AAIGrid driver on the driver surface (frmts/aaigrid): per nation a
    derived 12×10 int raster (v = (n·31 + i·12 + j) % 97, cells with
    v % 13 == 0 stamped -9999) is encoded to Arc/Info ASCII text and
    decoded back by core.aaigrid; integer text round-trips exactly, so
    the nodata count, the valid-cell sum and the decoded geotransform's
    north edge (yll + nrows·cellsize, dyadic) are closed forms."""
    from ..core.aaigrid import decode_aaigrid, encode_aaigrid

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        nk, nnod, vsum, north4 = [], [], [], []
        ii, jj = np.meshgrid(np.arange(10), np.arange(12), indexing="ij")
        for n in ks:
            n = int(n)
            v = (n * 31 + ii * 12 + jj) % 97
            grid = np.where(v % 13 == 0, -9999, v).astype(np.int32)
            blob = encode_aaigrid(grid, xll=n + 0.25, yll=2 * n + 0.5,
                                  cellsize=0.75, nodata=-9999)
            a2, gt2, nd2 = decode_aaigrid(blob)
            mask = a2 == int(nd2)
            nk.append(n)
            nnod.append(int(mask.sum()))
            vsum.append(int(a2[~mask].sum()))
            north4.append(int(np.round(gt2[3] * 4)))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "n_nodata": pa.array(nnod, pa.int64()),
                         "valid_sum": pa.array(vsum, pa.int64()),
                         "north4": pa.array(north4, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_AAIGRID = """
WITH cells AS (
    SELECT n.n_nationkey AS nk,
           (n.n_nationkey * 31 + (c.ij // 12) * 12 + (c.ij % 12)) % 97 AS v
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 119)) AS ij) c
)
SELECT nk AS n_nationkey,
       CAST(SUM(CASE WHEN v % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nodata,
       CAST(SUM(CASE WHEN v % 13 = 0 THEN 0 ELSE v END) AS BIGINT)
           AS valid_sum,
       CAST(MIN(nk) * 8 + 2 + 30 AS BIGINT) AS north4
FROM cells
GROUP BY nk
"""


def raster_cutline_q(sf_dir: str):
    """gdalwarp -cutline on the driver surface (alg/gdalwarper.cpp
    cutline masker): per nation a derived 16×16 raster
    (v = (n·31 + i·16 + j) % 251, north-up gt) is masked by a triangle
    cutline ((0,0),(K+.5,0),(0,K+.5)), K = 6 + n%7, through the REAL
    even-odd PIP path (stages.raster2.cutline_mask → geom.points_in_ring).
    Pixel centers sit at half-integers, the hypotenuse at a half-integer
    sum, so no boundary ties exist and the kept set has the closed form
    j + (15 - i) ≤ K - 1."""
    from ..stages.raster2 import cutline_mask

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ii, jj = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        nk, kept, ksum = [], [], []
        for n in ks:
            n = int(n)
            K = 6 + n % 7
            v = ((n * 31 + ii * 16 + jj) % 251 + 1).astype(np.int32)
            tri = [[np.array([[0.0, 0.0], [K + 0.5, 0.0],
                              [0.0, K + 0.5], [0.0, 0.0]])]]
            out = cutline_mask(v, (0, 1, 0, 16, 0, -1), tri, nodata=0)
            nk.append(n)
            kept.append(int((out != 0).sum()))
            ksum.append(int(out.sum()))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "kept_px": pa.array(kept, pa.int64()),
                         "kept_sum": pa.array(ksum, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_CUTLINE = """
-- center (j+0.5, 15.5-i) inside x>=0, y>=0, x+y<=K+0.5 with K=6+n%7
-- <=> j + 15 - i <= K - 1  (half-integer threshold: no boundary ties)
WITH cells AS (
    SELECT n.n_nationkey AS nk,
           c.ij // 16 AS i, c.ij % 16 AS j,
           (n.n_nationkey * 31 + c.ij) % 251 + 1 AS v
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS ij) c
)
SELECT nk AS n_nationkey,
       CAST(SUM(CASE WHEN j + 15 - i <= 6 + nk % 7 - 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS kept_px,
       CAST(SUM(CASE WHEN j + 15 - i <= 6 + nk % 7 - 1 THEN v ELSE 0 END)
            AS BIGINT) AS kept_sum
FROM cells
GROUP BY nk
"""


def vector_mvt_tiles_q(sf_dir: str):
    """MVT driver on the driver surface (ogr/ogrsf_frmts/mvt): customer-
    derived points run the full vectortiles.point_vector_tiles pipeline
    (mercator tile assignment + integer tile-unit quantization + hand-
    rolled protobuf encode, splitmix-bucketed per-tile groups), then
    every produced tile blob is DECODED back through core/mvt and
    measured against the closed-form mercator replay."""
    return _mvt_points_tiles(sf_dir).map_batches(
        _measure_mvt("mvt"), batch_format="pyarrow")


SQL_VECTOR_MVT_TILES = """
WITH pts AS (
  SELECT c_custkey AS fid,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS lon,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS lat
  FROM customer
), px AS (
  SELECT fid,
         (lon * 20037508.342789244 / 180.0 + 20037508.342789244)
             / (2 * pi() * 6378137 / 256 / 32.0) AS px,
         (ln(tan((90 + lat) * pi() / 360.0)) / (pi() / 180.0)
             * 20037508.342789244 / 180.0 + 20037508.342789244)
             / (2 * pi() * 6378137 / 256 / 32.0) AS py
  FROM pts
), tiled AS (
  SELECT fid, px, py,
         CAST(ceil(px / 256.0) AS BIGINT) - 1 AS tx,
         CAST(ceil(py / 256.0) AS BIGINT) - 1 AS ty_tms
  FROM px
), local AS (
  SELECT fid, tx, 31 - ty_tms AS y,
         CAST(floor((px - tx * 256) * 16 + 0.5) AS BIGINT) AS lx,
         CAST(floor(((ty_tms + 1) * 256 - py) * 16 + 0.5) AS BIGINT) AS ly
  FROM tiled
)
SELECT 5 AS z, tx AS x, y,
       COUNT(*) AS n_features,
       SUM(fid) AS id_sum,
       SUM(lx) AS lx_sum,
       SUM(ly) AS ly_sum
FROM local
GROUP BY tx, y
"""


def vector_gpx_kml_roundtrip_q(sf_dir: str):
    """GPX + KML drivers on the driver surface (ogr/ogrsf_frmts/gpx,
    ogr/ogrsf_frmts/kml): the planted dyadic point layer is written as
    GPX waypoints and KML Placemarks (sources.vector_writers), read back
    through the REAL stdlib-XML parsers (sources.vector_formats) as Ray
    datasets, and per format the feature count and snapped coordinate
    sums must equal the closed form — the same contract the parquet/
    GeoJSON/GPKG/FGB/Shapefile roundtrip slots pin."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = _read(sf_dir, "nation", ["n_nationkey"]).take_all()
    names, blobs = [], []
    for r in sorted(x["n_nationkey"] for x in nat):
        n = int(r)
        for j in range(3):
            names.append(f"f{n * 10 + j}")
            blobs.append(WKB.point(n % 10 + j + 0.25, n // 5 + 0.5))
    tab = pa.table({"name": pa.array(names, pa.string()),
                    "wkb": pa.array(blobs, pa.binary())})

    d = tempfile.mkdtemp(prefix="gpxkml_")
    open(os.path.join(d, "a.gpx"), "wb").write(
        VW.gpx_bytes(tab, name_col="name"))
    open(os.path.join(d, "a.kml"), "wb").write(
        VW.kml_bytes(tab, name_col="name"))

    readers = {"gpx": VF.read_gpx([os.path.join(d, "a.gpx")]),
               "kml": VF.read_kml([os.path.join(d, "a.kml")])}

    def measure(fmt):
        def fn(b: pa.Table) -> pa.Table:
            sx = sy = 0
            for blob in b.column("wkb").to_pylist():
                x, y = WKB.loads(blob)["xy"]
                sx += int(np.floor(x * 1e6 + 0.5))
                sy += int(np.floor(y * 1e6 + 0.5))
            nlen = sum(len(s) for s in b.column("name").to_pylist())
            return pa.table({"fmt": pa.array([fmt], pa.string()),
                             "n_features": pa.array([b.num_rows],
                                                    pa.int64()),
                             "name_len_sum": pa.array([nlen], pa.int64()),
                             "sx_sum": pa.array([sx], pa.int64()),
                             "sy_sum": pa.array([sy], pa.int64())})
        return fn

    parts = None
    for fmt, ds in readers.items():
        p = ds.map_batches(measure(fmt), batch_format="pyarrow")
        parts = p if parts is None else parts.union(p)
    return parts


SQL_VECTOR_GPX_KML_ROUNDTRIP = """
WITH feats AS (
    SELECT n.n_nationkey AS n, j.j AS j
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS j) j
), sums AS (
    SELECT COUNT(*) AS n_features,
           CAST(SUM(LENGTH('f' || CAST(n * 10 + j AS VARCHAR))) AS BIGINT)
               AS name_len_sum,
           CAST(SUM((n % 10 + j) * 1000000 + 250000) AS BIGINT) AS sx_sum,
           CAST(SUM((n // 5) * 1000000 + 500000) AS BIGINT) AS sy_sum
    FROM feats
)
SELECT f.fmt, s.n_features, s.name_len_sum, s.sx_sum, s.sy_sum
FROM sums s
CROSS JOIN (SELECT UNNEST(['gpx', 'kml']) AS fmt) f
"""


def vector_arrow_ipc_roundtrip_q(sf_dir: str):
    """Arrow IPC / Feather driver on the driver surface
    (ogr/ogrsf_frmts/arrow): the planted typed layer is serialized to
    BOTH IPC framings (file='ARROW1' magic / stream), read back through
    sources.vector_formats.read_arrow_ipc as Ray datasets, and measured
    per framing — identity roundtrip, closed form over nation."""
    import os
    import tempfile

    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    rows = sorted(nat, key=lambda x: int(x["n_nationkey"]))
    tab = pa.table({
        "fid": pa.array([int(r["n_nationkey"]) for r in rows], pa.int64()),
        "name": pa.array([str(r["n_name"]) for r in rows], pa.string()),
        "val": pa.array([int(r["n_nationkey"]) * 3 + 0.5 for r in rows],
                        pa.float64())})
    d = tempfile.mkdtemp(prefix="arrowrt_")
    pf = os.path.join(d, "a.arrow")
    ps = os.path.join(d, "a.stream.arrow")
    open(pf, "wb").write(VW.arrow_ipc_bytes(tab, file_format=True))
    open(ps, "wb").write(VW.arrow_ipc_bytes(tab, file_format=False))

    def measure(fmt):
        def fn(b: pa.Table) -> pa.Table:
            fid = np.asarray(b.column("fid"), dtype=np.int64)
            val = np.asarray(b.column("val"), dtype=np.float64)
            nlen = sum(len(s) for s in b.column("name").to_pylist())
            return pa.table({
                "fmt": pa.array([fmt], pa.string()),
                "n_features": pa.array([b.num_rows], pa.int64()),
                "fid_sum": pa.array([int(fid.sum())], pa.int64()),
                "val2_sum": pa.array([int(np.round(val.sum() * 2))],
                                     pa.int64()),
                "name_len_sum": pa.array([nlen], pa.int64())})
        return fn

    a = VF.read_arrow_ipc([pf]).map_batches(measure("file"),
                                            batch_format="pyarrow")
    b = VF.read_arrow_ipc([ps]).map_batches(measure("stream"),
                                            batch_format="pyarrow")
    return a.union(b)


SQL_VECTOR_ARROW_IPC_ROUNDTRIP = """
WITH sums AS (
    SELECT COUNT(*) AS n_features,
           SUM(n_nationkey) AS fid_sum,
           CAST(SUM(6 * n_nationkey + 1) AS BIGINT) AS val2_sum,
           CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_len_sum
    FROM nation
)
SELECT f.fmt, s.n_features, s.fid_sum, s.val2_sum, s.name_len_sum
FROM sums s
CROSS JOIN (SELECT UNNEST(['file', 'stream']) AS fmt) f
"""


def raster_envi_roundtrip_q(sf_dir: str):
    """ENVI raw driver on the driver surface (frmts/raw/envidataset.cpp):
    per nation a derived 3-band 8×6 uint16 cube (band b value
    (n·31 + b·7 + i·8 + j) % 501) is written through every interleave
    (bsq/bil/bip chosen by n%3) at byte order n%2 and decoded back; the
    interleave/byte-order transposes are lossless, so per-band sums are
    closed forms."""
    from ..core.envi import decode_envi, encode_envi

    ILS = ("bsq", "bil", "bip")

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ii, jj = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
        nk, ils, b0, b1, b2 = [], [], [], [], []
        for n in ks:
            n = int(n)
            cube = np.stack(
                [((n * 31 + bb * 7 + ii * 8 + jj) % 501).astype(np.uint16)
                 for bb in range(3)], axis=2)
            il = ILS[n % 3]
            hdr, raw = encode_envi(cube, interleave=il, byte_order=n % 2)
            a2 = decode_envi(hdr, raw)
            assert a2.dtype == np.uint16
            nk.append(n)
            ils.append(il)
            b0.append(int(a2[:, :, 0].sum()))
            b1.append(int(a2[:, :, 1].sum()))
            b2.append(int(a2[:, :, 2].sum()))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "interleave": pa.array(ils, pa.string()),
                         "band0_sum": pa.array(b0, pa.int64()),
                         "band1_sum": pa.array(b1, pa.int64()),
                         "band2_sum": pa.array(b2, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_ENVI_ROUNDTRIP = """
WITH cells AS (
    SELECT n.n_nationkey AS nk, c.ij // 8 AS i, c.ij % 8 AS j
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 47)) AS ij) c
)
SELECT nk AS n_nationkey,
       CASE nk % 3 WHEN 0 THEN 'bsq' WHEN 1 THEN 'bil'
            ELSE 'bip' END AS interleave,
       CAST(SUM((nk * 31 + i * 8 + j) % 501) AS BIGINT) AS band0_sum,
       CAST(SUM((nk * 31 + 7 + i * 8 + j) % 501) AS BIGINT) AS band1_sum,
       CAST(SUM((nk * 31 + 14 + i * 8 + j) % 501) AS BIGINT) AS band2_sum
FROM cells
GROUP BY nk
"""


def vector_layer_info_q(sf_dir: str):
    """ogrinfo -so on the driver surface (apps/ogrinfo_lib.cpp): a planted
    mixed layer (customer-derived points; every 3rd feature a rect
    polygon) through stages.vector.layer_info — feature count, per-type
    counts and extent as a distributed partial+fold; every output is a
    closed form over customer."""
    from ..core import wkb as WKB
    from ..stages.vector import layer_info

    def mk(b: pa.Table) -> pa.Table:
        ck = np.asarray(b.column("c_custkey"), dtype=np.int64)
        x = ((ck * 37) % 3600) / 10.0 - 180.0 + 0.05
        y = ((ck * 91) % 1700) / 10.0 - 85.0 + 0.05
        blobs = []
        for k, xi, yi in zip(ck, x, y):
            if int(k) % 3 == 0:
                blobs.append(WKB.box(xi, yi, xi + 1.5, yi + 2.25))
            else:
                blobs.append(WKB.point(xi, yi))
        return pa.table({"wkb": pa.array(blobs, pa.binary())})

    pts = _read(sf_dir, "customer", ["c_custkey"]) \
        .map_batches(mk, batch_format="pyarrow")
    return layer_info(pts).select(
        ["n_features", "n_point", "n_polygon", "minx", "miny",
         "maxx", "maxy"])


SQL_VECTOR_LAYER_INFO = """
WITH feats AS (
  SELECT c_custkey AS ck,
         ((c_custkey * 37) % 3600) / 10.0 - 180.0 + 0.05 AS x,
         ((c_custkey * 91) % 1700) / 10.0 - 85.0 + 0.05 AS y
  FROM customer
)
SELECT COUNT(*) AS n_features,
       CAST(SUM(CASE WHEN ck % 3 = 0 THEN 0 ELSE 1 END) AS BIGINT)
           AS n_point,
       CAST(SUM(CASE WHEN ck % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_polygon,
       MIN(x) AS minx, MIN(y) AS miny,
       MAX(CASE WHEN ck % 3 = 0 THEN x + 1.5 ELSE x END) AS maxx,
       MAX(CASE WHEN ck % 3 = 0 THEN y + 2.25 ELSE y END) AS maxy
FROM feats
"""


def raster_netcdf_roundtrip_q(sf_dir: str):
    """netCDF-3 classic driver on the driver surface (frmts/netcdf,
    CDF-1 raster subset): per nation a derived int16 grid with
    scale_factor/add_offset attributes is encoded to CDF-1 bytes
    (core/netcdf3) and decoded back; the big-endian block roundtrip is
    lossless, so the raw sum and the CF-scaled sum (dyadic scale 0.25,
    offset n) are closed forms."""
    from ..core.netcdf3 import decode_netcdf, encode_netcdf

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ii, jj = np.meshgrid(np.arange(7), np.arange(9), indexing="ij")
        nk, rsum, ssum4, nbytes = [], [], [], []
        for n in ks:
            n = int(n)
            z = ((n * 31 + ii * 9 + jj) % 397).astype(np.int16)
            blob = encode_netcdf(
                {"y": 7, "x": 9},
                {"elev": {"dims": ("y", "x"), "data": z,
                          "attrs": {"units": "m",
                                    "scale_factor": 0.25,
                                    "add_offset": float(n)}}},
                {"title": f"n{n}"})
            dims, vs, _g = decode_netcdf(blob)
            a = vs["elev"]["data"]
            sf = float(vs["elev"]["attrs"]["scale_factor"])
            off = float(vs["elev"]["attrs"]["add_offset"])
            scaled = a.astype(np.float64) * sf + off   # CF unpacking rule
            nk.append(n)
            rsum.append(int(a.astype(np.int64).sum()))
            ssum4.append(int(np.round(scaled.sum() * 4)))
            nbytes.append(len(blob))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "raw_sum": pa.array(rsum, pa.int64()),
                         "scaled4_sum": pa.array(ssum4, pa.int64()),
                         "n_bytes": pa.array(nbytes, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_NETCDF_ROUNDTRIP = """
-- header: magic+numrecs 8, dim_list 8+2*(8+4), gatt 8+(8+4+8+4),
-- var_list 8 + name(8+8 'elev') + ndims 4 + dimids 8 + vatts
-- (8 + units(12+8+4) + scale_factor(8+16+8+8) + add_offset(8+16+8+8))
-- + nc_type 4 + vsize 4 + begin 4; data 7*9*2 padded to 128
WITH cells AS (
    SELECT n.n_nationkey AS nk,
           (n.n_nationkey * 31 + c.ij) % 397 AS v
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 62)) AS ij) c
)
SELECT nk AS n_nationkey,
       CAST(SUM(v) AS BIGINT) AS raw_sum,
       CAST(SUM(v) + 4 * 63 * nk AS BIGINT) AS scaled4_sum,
       CAST(332 + ((LENGTH('n' || CAST(nk AS VARCHAR)) + 3) // 4) * 4
            AS BIGINT) AS n_bytes
FROM cells
GROUP BY nk
"""


def vector_geojsonseq_roundtrip_q(sf_dir: str):
    """GeoJSONSeq driver on the driver surface (ogr/ogrsf_frmts/geojson
    newline-delimited variant): the planted dyadic point layer through
    BOTH framings (plain NDJSON and RFC 8142 RS-framed), read back by the
    REAL parser as Ray datasets; identity roundtrip, closed form."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = _read(sf_dir, "nation", ["n_nationkey"]).take_all()
    fids, blobs = [], []
    for r in sorted(x["n_nationkey"] for x in nat):
        n = int(r)
        fids.append(n)
        blobs.append(WKB.point(n % 10 + 0.25, n // 5 + 0.5))
    tab = pa.table({"fid": pa.array(fids, pa.int64()),
                    "wkb": pa.array(blobs, pa.binary())})
    d = tempfile.mkdtemp(prefix="gjseq_")
    pp = os.path.join(d, "a.geojsonl")
    pr = os.path.join(d, "b.geojsonl")
    open(pp, "wb").write(VW.geojsonseq_bytes(tab, rs=False))
    open(pr, "wb").write(VW.geojsonseq_bytes(tab, rs=True))

    def measure(fmt):
        def fn(b: pa.Table) -> pa.Table:
            fid = np.asarray(b.column("fid"), dtype=np.int64)
            sx = sy = 0
            for blob in b.column("wkb").to_pylist():
                x, y = WKB.loads(blob)["xy"]
                sx += int(np.floor(x * 1e6 + 0.5))
                sy += int(np.floor(y * 1e6 + 0.5))
            return pa.table({"fmt": pa.array([fmt], pa.string()),
                             "n_features": pa.array([b.num_rows],
                                                    pa.int64()),
                             "fid_sum": pa.array([int(fid.sum())],
                                                 pa.int64()),
                             "sx_sum": pa.array([sx], pa.int64()),
                             "sy_sum": pa.array([sy], pa.int64())})
        return fn

    a = VF.read_geojsonseq([pp]).map_batches(measure("ndjson"),
                                             batch_format="pyarrow")
    b = VF.read_geojsonseq([pr]).map_batches(measure("rs"),
                                             batch_format="pyarrow")
    return a.union(b)


SQL_VECTOR_GEOJSONSEQ_ROUNDTRIP = """
WITH sums AS (
    SELECT COUNT(*) AS n_features,
           SUM(n_nationkey) AS fid_sum,
           CAST(SUM((n_nationkey % 10) * 1000000 + 250000) AS BIGINT)
               AS sx_sum,
           CAST(SUM((n_nationkey // 5) * 1000000 + 500000) AS BIGINT)
               AS sy_sum
    FROM nation
)
SELECT f.fmt, s.n_features, s.fid_sum, s.sx_sum, s.sy_sum
FROM sums s
CROSS JOIN (SELECT UNNEST(['ndjson', 'rs']) AS fmt) f
"""


def raster_equalize_q(sf_dir: str):
    """gdalenhance histogram equalization on the driver surface
    (apps/gdalenhance.cpp): per nation a derived 16×16 uint8 raster is
    equalized by stages.raster2.equalize_array (bincount + cumsum LUT,
    half-up rounding); the DuckDB replay builds the same CDF with a
    window SUM and applies the identical double chain, so the equalized
    pixel sum is exact."""
    from ..stages.raster2 import equalize_array

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        k = np.arange(256, dtype=np.int64)
        nk, eqs = [], []
        for n in ks:
            n = int(n)
            v = ((n * 31 + k) % 211).astype(np.uint8).reshape(16, 16)
            e = equalize_array(v)
            nk.append(n)
            eqs.append(int(e.astype(np.int64).sum()))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "eq_sum": pa.array(eqs, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_EQUALIZE = """
WITH cells AS (
    SELECT n.n_nationkey AS nk, (n.n_nationkey * 31 + c.k) % 211 AS v
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS k) c
), counts AS (
    SELECT nk, v, COUNT(*) AS c FROM cells GROUP BY nk, v
), cdfs AS (
    SELECT nk, v, c,
           SUM(c) OVER (PARTITION BY nk ORDER BY v) AS cdf
    FROM counts
), cm AS (
    SELECT nk, MIN(cdf) AS cmin FROM cdfs GROUP BY nk
)
SELECT d.nk AS n_nationkey,
       CAST(SUM(d.c * FLOOR((d.cdf - m.cmin) * 255.0
                            / (256 - m.cmin) + 0.5)) AS BIGINT) AS eq_sum
FROM cdfs d JOIN cm m ON d.nk = m.nk
GROUP BY d.nk
"""


def raster_xyz_roundtrip_q(sf_dir: str):
    """XYZ ASCII driver on the driver surface (frmts/xyz): per nation a
    derived 8×6 int grid is written as cell-center 'x y z' lines (dyadic
    origins/cellsize so the text round-trips exactly) and re-gridded by
    the REAL reader (unique-coordinate grid inference); the decoded sum
    and the geotransform's north edge ×4 are closed forms."""
    from ..core.aaigrid import decode_xyz, encode_xyz

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        ii, jj = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
        nk, vsum, north4 = [], [], []
        for n in ks:
            n = int(n)
            grid = ((n * 31 + ii * 8 + jj) % 127).astype(np.int32)
            blob = encode_xyz(grid, xll=n + 0.5, yll=2 * n + 0.25,
                              cellsize=0.5)
            a2, gt2 = decode_xyz(blob)
            assert a2.dtype == np.int32
            nk.append(n)
            vsum.append(int(a2.astype(np.int64).sum()))
            north4.append(int(np.round(gt2[3] * 4)))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "valid_sum": pa.array(vsum, pa.int64()),
                         "north4": pa.array(north4, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_XYZ_ROUNDTRIP = """
-- north edge = yll + nrows*cellsize = 2n + 0.25 + 3.0; ×4 = 8n + 13
WITH cells AS (
    SELECT n.n_nationkey AS nk,
           (n.n_nationkey * 31 + c.ij) % 127 AS v
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 47)) AS ij) c
)
SELECT nk AS n_nationkey,
       CAST(SUM(v) AS BIGINT) AS valid_sum,
       CAST(8 * nk + 13 AS BIGINT) AS north4
FROM cells
GROUP BY nk
"""


def _mvt_points_tiles(sf_dir: str, Z: int = 5):
    """Shared by the MVT/PMTiles/MBTiles/GPKG-tiles slots: the customer-
    derived point set through vectortiles.point_vector_tiles."""
    from .vectortiles import point_vector_tiles

    def pts(b: pa.Table) -> pa.Table:
        ck = np.asarray(b.column("c_custkey"), dtype=np.int64)
        return pa.table({
            "fid": pa.array(ck, pa.int64()),
            "lon": pa.array(((ck * 37) % 3600) / 10.0 - 180.0 + 0.05,
                            pa.float64()),
            "lat": pa.array(((ck * 91) % 1700) / 10.0 - 85.0 + 0.05,
                            pa.float64())})

    return point_vector_tiles(
        _read(sf_dir, "customer", ["c_custkey"])
        .map_batches(pts, batch_format="pyarrow"), Z)


def _measure_mvt(payload_col: str):
    """Decode-and-measure stage shared by the tile-archive slots."""
    from ..core import mvt as MVT

    def measure(b: pa.Table) -> pa.Table:
        zs, xs, ys, nf, ids, lxs, lys = [], [], [], [], [], [], []
        for i, blob in enumerate(b.column(payload_col).to_pylist()):
            feats = MVT.decode_tile(blob)["points"]["features"]
            zs.append(b.column("z")[i].as_py())
            xs.append(b.column("x")[i].as_py())
            ys.append(b.column("y")[i].as_py())
            nf.append(len(feats))
            ids.append(sum(f["id"] for f in feats))
            lxs.append(sum(int(f["xy"][0, 0]) for f in feats))
            lys.append(sum(int(f["xy"][0, 1]) for f in feats))
        return pa.table({"z": pa.array(zs, pa.int64()),
                         "x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64()),
                         "n_features": pa.array(nf, pa.int64()),
                         "id_sum": pa.array(ids, pa.int64()),
                         "lx_sum": pa.array(lxs, pa.int64()),
                         "ly_sum": pa.array(lys, pa.int64())})

    return measure


def _mvt_archive_roundtrip(sf_dir: str, writer, reader, prefix: str):
    """Write the shared tile set through `writer`, read back through
    `reader`, measure (the identity-roundtrip contract all three archive
    drivers share)."""
    import tempfile

    tiles = _mvt_points_tiles(sf_dir)
    d = tempfile.mkdtemp(prefix=prefix)
    paths = [r["path"] for r in writer(tiles, d).take_all()]  # bounded
    return reader(paths).map_batches(_measure_mvt("payload"),
                                     batch_format="pyarrow")


def vector_pmtiles_roundtrip_q(sf_dir: str):
    """PMTiles v3 driver on the driver surface (ogr/ogrsf_frmts/pmtiles):
    the shared customer MVT tile set packed into partitioned single-file
    archives (catalog.write_pmtiles — gzip'd varint directories, Hilbert
    tile ids, content dedup), read back through catalog.read_pmtiles and
    MVT-decoded; identity roundtrip, same mercator oracle."""
    from .catalog import read_pmtiles, write_pmtiles
    return _mvt_archive_roundtrip(
        sf_dir, lambda t, d: write_pmtiles(t, d, tile_type="mvt",
                                           metadata={"name": "customers"}),
        read_pmtiles, "pmt_")


# identical tile/feature closed form — the archive roundtrip is identity
SQL_VECTOR_PMTILES_ROUNDTRIP = SQL_VECTOR_MVT_TILES


def raster_zarr_roundtrip_q(sf_dir: str):
    """Zarr v2 driver on the driver surface (frmts/zarr): per nation a
    derived 20×18 int32 grid is written as a chunked zlib Zarr store
    (core/zarr2, 8×8 chunks → padded edge chunks) and read back CHUNK-
    PARALLEL through catalog.read_zarr_chunks; per-chunk partial sums
    over the cropped valid region aggregate to the grid's closed form,
    and the chunk count pins the grid geometry."""
    import tempfile

    from ..core.zarr2 import write_zarr

    import ray.data as rd

    from ..core.zarr2 import chunk_grid, read_zarr_chunk, read_zarr_meta

    nat = sorted(r["n_nationkey"] for r in
                 _read(sf_dir, "nation", ["n_nationkey"]).take_all())
    ii, jj = np.meshgrid(np.arange(20), np.arange(18), indexing="ij")
    # write the stores, then ONE flat chunk dataset over every
    # (store, chunk) pair — a single pipeline, not 25 unioned ones
    items = []
    for n in nat:
        n = int(n)
        grid = ((n * 31 + ii * 18 + jj) % 311).astype(np.int32)
        d = tempfile.mkdtemp(prefix=f"zarr{n}_")
        write_zarr(d, grid, chunks=(8, 8))
        meta = read_zarr_meta(d)
        for ci, cj in chunk_grid(meta):
            items.append({"nk": n, "path": d, "ci": ci, "cj": cj})

    def measure(b: pa.Table) -> pa.Table:
        nks, sums, cnts = [], [], []
        metas: dict = {}
        for i in range(b.num_rows):
            path = b.column("path")[i].as_py()
            if path not in metas:
                metas[path] = read_zarr_meta(path)
            meta = metas[path]
            blk = read_zarr_chunk(path, meta,
                                  b.column("ci")[i].as_py(),
                                  b.column("cj")[i].as_py())
            h, w = meta["shape"]
            ch, cw = meta["chunks"]
            vh = min(ch, h - b.column("ci")[i].as_py() * ch)
            vw = min(cw, w - b.column("cj")[i].as_py() * cw)
            nks.append(b.column("nk")[i].as_py())
            sums.append(int(blk[:vh, :vw].astype(np.int64).sum()))
            cnts.append(1)
        return pa.table({"n_nationkey": pa.array(nks, pa.int64()),
                         "part_sum": pa.array(sums, pa.int64()),
                         "n_chunks": pa.array(cnts, pa.int64())})

    parts = rd.from_items(items).map_batches(measure,
                                             batch_format="pyarrow")
    agg = parts.groupby("n_nationkey") \
        .aggregate(__import__("ray").data.aggregate.Sum(
                       "part_sum", alias_name="valid_sum"),
                   __import__("ray").data.aggregate.Sum(
                       "n_chunks", alias_name="chunk_total"))
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["n_nationkey", "valid_sum", "n_chunks"]),
        batch_format="pyarrow")


SQL_RASTER_ZARR_ROUNDTRIP = """
WITH cells AS (
    SELECT n.n_nationkey AS nk,
           (n.n_nationkey * 31 + c.ij) % 311 AS v
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 359)) AS ij) c
)
SELECT nk AS n_nationkey,
       CAST(SUM(v) AS BIGINT) AS valid_sum,
       CAST(9 AS BIGINT) AS n_chunks        -- ceil(20/8)*ceil(18/8)=3*3
FROM cells
GROUP BY nk
"""


def vector_mbtiles_roundtrip_q(sf_dir: str):
    """MBTiles driver on the driver surface (frmts/mbtiles): the shared
    tile set through partitioned .mbtiles sqlite databases
    (catalog.write_mbtiles — TMS row flip, metadata table) and back;
    identity roundtrip, same mercator oracle."""
    from .catalog import read_mbtiles, write_mbtiles
    return _mvt_archive_roundtrip(
        sf_dir, lambda t, d: write_mbtiles(t, d,
                                           metadata={"name": "customers"}),
        read_mbtiles, "mbt_")


SQL_VECTOR_MBTILES_ROUNDTRIP = SQL_VECTOR_MVT_TILES


def vector_gml_roundtrip_q(sf_dir: str):
    """GML driver on the driver surface (ogr/ogrsf_frmts/gml): the
    planted dyadic point layer written as a GML 3.2 FeatureCollection
    and read back through the stdlib-XML parser; identity roundtrip,
    closed form over nation (same contract as the other format slots)."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = _read(sf_dir, "nation", ["n_nationkey"]).take_all()
    names, blobs = [], []
    for r in sorted(x["n_nationkey"] for x in nat):
        n = int(r)
        for j in range(3):
            names.append(f"f{n * 10 + j}")
            blobs.append(WKB.point(n % 10 + j + 0.25, n // 5 + 0.5))
    tab = pa.table({"name": pa.array(names, pa.string()),
                    "wkb": pa.array(blobs, pa.binary())})
    d = tempfile.mkdtemp(prefix="gml_")
    p = os.path.join(d, "a.gml")
    open(p, "wb").write(VW.gml_bytes(tab))

    def measure(b: pa.Table) -> pa.Table:
        sx = sy = 0
        for blob in b.column("wkb").to_pylist():
            x, y = WKB.loads(blob)["xy"]
            sx += int(np.floor(x * 1e6 + 0.5))
            sy += int(np.floor(y * 1e6 + 0.5))
        nlen = sum(len(s) for s in b.column("name").to_pylist())
        return pa.table({"n_features": pa.array([b.num_rows], pa.int64()),
                         "name_len_sum": pa.array([nlen], pa.int64()),
                         "sx_sum": pa.array([sx], pa.int64()),
                         "sy_sum": pa.array([sy], pa.int64())})

    return VF.read_gml([p]).map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_GML_ROUNDTRIP = """
WITH feats AS (
    SELECT n.n_nationkey AS n, j.j AS j
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS j) j
)
SELECT COUNT(*) AS n_features,
       CAST(SUM(LENGTH('f' || CAST(n * 10 + j AS VARCHAR))) AS BIGINT)
           AS name_len_sum,
       CAST(SUM((n % 10 + j) * 1000000 + 250000) AS BIGINT) AS sx_sum,
       CAST(SUM((n // 5) * 1000000 + 500000) AS BIGINT) AS sy_sum
FROM feats
"""


def raster_gpkg_tiles_q(sf_dir: str):
    """GPKG tile-pyramid half of the GeoPackage driver on the driver
    surface (ogr/ogrsf_frmts/gpkg raster side): the shared tile set
    through partitioned GPKG pyramids (top-down tile_row,
    gpkg_tile_matrix per zoom) and back; identity roundtrip, same
    mercator oracle."""
    from .catalog import read_gpkg_tiles, write_gpkg_tiles
    return _mvt_archive_roundtrip(sf_dir, write_gpkg_tiles,
                                  read_gpkg_tiles, "gpkgt_")


SQL_RASTER_GPKG_TILES = SQL_VECTOR_MVT_TILES


def q_global_shuffle(sf_dir: str):
    """Deterministic global shuffle for training-data ordering: sort
    documents by splitmix64(doc_id) — partition-invariant, reproducible
    (the scale-correct replacement for random_shuffle's block-dependent
    seed), ONE distributed sort; emitted with the global rank so the
    oracle pins the exact permutation, not just the membership."""
    from .dedup import _splitmix

    def key(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("doc_id"), np.int64).astype(np.uint64)
        hv = _splitmix(k)
        return pa.table({"doc_id": b.column("doc_id"),
                         "hv_hi": pa.array(
                             (hv >> np.uint64(1)).astype(np.int64),
                             pa.int64())})

    # the emitted hv_hi sort key pins the permutation (top-63 bits of
    # splitmix64 — collision-free unless full hashes collide); limit =
    # the training head, i.e. the first N docs of the shuffled order
    return _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(key, batch_format="pyarrow").sort("hv_hi").limit(200)


def _sql_global_shuffle() -> str:
    from .sketches import _sm_hugeint_select
    return (f"WITH s AS ({_sm_hugeint_select('documents', 'doc_id')}) "
            "SELECT doc_id, CAST(hv // 2 AS BIGINT) AS hv_hi FROM s "
            "ORDER BY hv_hi LIMIT 200")


SQL_Q_GLOBAL_SHUFFLE = _sql_global_shuffle()


def emb_pq_q(sf_dir: str):
    """Product quantization (IVF-PQ's code path) over the embeddings
    table: the 64-dim vectors split into two 32-dim subspaces, each
    quantized by the SAME oracle-exact integer Lloyd machinery as
    emb_kmeans (k=4, 2 iterations per subspace); the output is each
    vector's (code0, code1) PQ code plus the exact integer quantization
    error per subspace — the training-data-pipeline embedding-compression
    operator, replayed in DuckDB by two offset copies of the kmeans CTE
    chain."""
    from .ann import kmeans_assign

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def subspace(lo, hi):
        def fn(b: pa.Table) -> pa.Table:
            from ..core.arrow_utils import list_column_to_ndarray
            V = list_column_to_ndarray(b.column("embedding"))
            return pa.table({
                "vec_id": b.column("vec_id"),
                "embedding": pa.array(list(V[:, lo:hi].astype(np.float64)),
                                      pa.list_(pa.float64()))})
        return fn

    parts = []
    for si, (lo, hi) in enumerate(((0, 32), (32, 64))):
        sub = emb.map_batches(subspace(lo, hi), batch_format="pyarrow")
        a = kmeans_assign(sub, k=4, iters=2)

        def tag(b: pa.Table, si=si) -> pa.Table:
            return pa.table({
                "vec_id": b.column("vec_id"),
                f"code{si}": b.column("cluster"),
                f"dist{si}": b.column("dist2")})

        parts.append(a.map_batches(tag, batch_format="pyarrow"))

    return parts[0].join(parts[1], join_type="inner",
                         num_partitions=_join_partitions(),
                         on=("vec_id",), right_on=("vec_id",))


def _build_sql_emb_pq(k: int = 4, iters: int = 2,
                      scale: int = 1 << 20) -> str:
    """Two offset copies of the emb_kmeans CTE chain (dims [0,32) and
    [32,64)), joined on vec_id."""
    def chain(pfx: str, off: int, dim: int) -> list[str]:
        out = [
            f"{pfx}v AS (SELECT vec_id, i.i AS d, "
            f"CAST(floor(embedding[i.i + {off} + 1] * {scale}e0) AS BIGINT)"
            f" AS q FROM embeddings, generate_series(0, {dim - 1}) i(i))",
            f"{pfx}init AS (SELECT vec_id, CAST(row_number() OVER "
            "(ORDER BY vec_id) - 1 AS BIGINT) AS cluster FROM "
            f"(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))",
            f"{pfx}c0 AS (SELECT ii.cluster, v.d, v.q FROM {pfx}init ii "
            f"JOIN {pfx}v v ON v.vec_id = ii.vec_id)",
        ]
        for t in range(iters):
            out += [
                f"{pfx}a{t} AS (SELECT vec_id, cluster FROM ("
                "SELECT v.vec_id, c.cluster, "
                "SUM((v.q - c.q) * (v.q - c.q)) AS dist "
                f"FROM {pfx}v v JOIN {pfx}c{t} c ON c.d = v.d "
                "GROUP BY v.vec_id, c.cluster) "
                "QUALIFY row_number() OVER (PARTITION BY vec_id "
                "ORDER BY dist, cluster) = 1)",
                f"{pfx}s{t} AS (SELECT a.cluster, v.d, SUM(v.q) AS sq, "
                f"COUNT(*) AS n FROM {pfx}a{t} a JOIN {pfx}v v "
                "ON v.vec_id = a.vec_id GROUP BY a.cluster, v.d)",
                f"{pfx}c{t + 1} AS (SELECT c.cluster, c.d, "
                "CAST(COALESCE(s.sq // s.n, c.q) AS BIGINT) AS q "
                f"FROM {pfx}c{t} c LEFT JOIN {pfx}s{t} s "
                "ON s.cluster = c.cluster AND s.d = c.d)",
            ]
        out.append(
            f"{pfx}fin AS (SELECT vec_id, cluster, CAST(dist AS BIGINT) "
            "AS dist2 FROM (SELECT v.vec_id, c.cluster, "
            "SUM((v.q - c.q) * (v.q - c.q)) AS dist "
            f"FROM {pfx}v v JOIN {pfx}c{iters} c ON c.d = v.d "
            "GROUP BY v.vec_id, c.cluster) "
            "QUALIFY row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dist, cluster) = 1)")
        return out

    ctes = chain("p0", 0, 32) + chain("p1", 32, 32)
    return ("WITH " + ",\n".join(ctes) +
            "\nSELECT a.vec_id, a.cluster AS code0, a.dist2 AS dist0, "
            "b.cluster AS code1, b.dist2 AS dist1 "
            "FROM p0fin a JOIN p1fin b ON b.vec_id = a.vec_id")


SQL_EMB_PQ = _build_sql_emb_pq()


def vector_osm_roundtrip_q(sf_dir: str):
    """OSM PBF driver on the driver surface (ogr/ogrsf_frmts/osm): a
    planted node+way set (7-decimal coordinates — exact in the format's
    nano-degree integers) written as a real PBF (DenseNodes delta
    coding, string table, zlib blob) and read back BLOB-parallel through
    sources.vector_formats.read_osm_pbf; counts, id sums, snapped
    coordinate sums, way-ref sums and tag counts are closed forms."""
    import json as _json
    import os
    import tempfile

    from ..core.osmpbf import encode_osm_pbf
    from ..sources.vector_formats import read_osm_pbf

    nat = sorted(int(r["n_nationkey"]) for r in
                 _read(sf_dir, "nation", ["n_nationkey"]).take_all())
    nodes, ways = [], []
    for n in nat:
        for j in range(3):
            nid = n * 10 + j
            tags = {"ref": str(nid)} if (n + j) % 2 == 0 else {}
            nodes.append((nid, n % 10 + j * 0.1 + 0.05,
                          n // 5 + 0.25, tags))
        ways.append((9000 + n, [n * 10, n * 10 + 1, n * 10 + 2],
                     {"highway": "x"} if n % 3 == 0 else {}))
    d = tempfile.mkdtemp(prefix="osm_")
    p = os.path.join(d, "a.osm.pbf")
    open(p, "wb").write(encode_osm_pbf(nodes, ways))

    def measure(b: pa.Table) -> pa.Table:
        kind = b.column("kind").to_pylist()
        ids = np.asarray(b.column("id"), dtype=np.int64)
        isn = np.array([k == "node" for k in kind])
        lon = np.asarray(b.column("lon").fill_null(0.0), np.float64)
        lat = np.asarray(b.column("lat").fill_null(0.0), np.float64)
        sx = int(np.floor(lon * 1e6 + 0.5)[isn].sum())
        sy = int(np.floor(lat * 1e6 + 0.5)[isn].sum())
        nref = ntags = 0
        for i in range(b.num_rows):
            r = b.column("refs")[i].as_py()
            nref += sum(r) if r else 0
            ntags += len(_json.loads(b.column("tags")[i].as_py()))
        return pa.table({
            "n_nodes": pa.array([int(isn.sum())], pa.int64()),
            "n_ways": pa.array([int((~isn).sum())], pa.int64()),
            "node_id_sum": pa.array([int(ids[isn].sum())], pa.int64()),
            "way_id_sum": pa.array([int(ids[~isn].sum())], pa.int64()),
            "sx_sum": pa.array([sx], pa.int64()),
            "sy_sum": pa.array([sy], pa.int64()),
            "ref_sum": pa.array([nref], pa.int64()),
            "n_tags": pa.array([ntags], pa.int64())})

    return read_osm_pbf([p]).map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_OSM_ROUNDTRIP = """
WITH nd AS (
    SELECT n.n_nationkey AS n, j.j AS j, n.n_nationkey * 10 + j.j AS nid
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS j) j
)
SELECT COUNT(*) AS n_nodes,
       (SELECT COUNT(*) FROM nation) AS n_ways,
       SUM(nid) AS node_id_sum,
       (SELECT SUM(9000 + n_nationkey) FROM nation) AS way_id_sum,
       CAST(SUM((n % 10) * 1000000 + j * 100000 + 50000) AS BIGINT)
           AS sx_sum,
       CAST(SUM((n // 5) * 1000000 + 250000) AS BIGINT) AS sy_sum,
       CAST(SUM(nid) AS BIGINT) AS ref_sum,
       CAST(SUM(CASE WHEN (n + j) % 2 = 0 THEN 1 ELSE 0 END)
            + (SELECT SUM(CASE WHEN n_nationkey % 3 = 0 THEN 1 ELSE 0 END)
               FROM nation) AS BIGINT) AS n_tags
FROM nd
"""


def vector_mif_roundtrip_q(sf_dir: str):
    """MapInfo MIF/MID driver on the driver surface
    (ogr/ogrsf_frmts/mitab): the planted dyadic point layer with typed
    attributes written as a MIF/MID pair and read back through the
    sidecar-aware reader; identity roundtrip, closed form over nation."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    rows = sorted(nat, key=lambda r: int(r["n_nationkey"]))
    tab = pa.table({
        "fid": pa.array([int(r["n_nationkey"]) for r in rows], pa.int64()),
        "name": pa.array([str(r["n_name"]) + ",x" for r in rows],
                         pa.string()),
        "wkb": pa.array([WKB.point(int(r["n_nationkey"]) % 10 + 0.25,
                                   int(r["n_nationkey"]) // 5 + 0.5)
                         for r in rows], pa.binary())})
    d = tempfile.mkdtemp(prefix="mif_")
    pair = VW.mif_bytes(tab)
    open(os.path.join(d, "a.mif"), "wb").write(pair["mif"])
    open(os.path.join(d, "a.mid"), "wb").write(pair["mid"])

    def measure(b: pa.Table) -> pa.Table:
        fid = np.asarray(b.column("fid"), dtype=np.int64)
        sx = sy = 0
        for blob in b.column("wkb").to_pylist():
            x, y = WKB.loads(blob)["xy"]
            sx += int(np.floor(x * 1e6 + 0.5))
            sy += int(np.floor(y * 1e6 + 0.5))
        nlen = sum(len(s) for s in b.column("name").to_pylist())
        return pa.table({
            "n_features": pa.array([b.num_rows], pa.int64()),
            "fid_sum": pa.array([int(fid.sum())], pa.int64()),
            "name_len_sum": pa.array([nlen], pa.int64()),
            "sx_sum": pa.array([sx], pa.int64()),
            "sy_sum": pa.array([sy], pa.int64())})

    return VF.read_mif([os.path.join(d, "a.mif")]) \
        .map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_MIF_ROUNDTRIP = """
SELECT COUNT(*) AS n_features,
       SUM(n_nationkey) AS fid_sum,
       CAST(SUM(LENGTH(n_name) + 2) AS BIGINT) AS name_len_sum,
       CAST(SUM((n_nationkey % 10) * 1000000 + 250000) AS BIGINT) AS sx_sum,
       CAST(SUM((n_nationkey // 5) * 1000000 + 500000) AS BIGINT) AS sy_sum
FROM nation
"""


def vector_dxf_roundtrip_q(sf_dir: str):
    """DXF driver on the driver surface (ogr/ogrsf_frmts/dxf): planted
    per-nation POINT + closed-LWPOLYLINE entities (layer name = nation
    key) written as ASCII DXF and read back; per-kind counts, snapped
    coordinate sums and the polygon vertex total are closed forms."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = sorted(int(r["n_nationkey"]) for r in
                 _read(sf_dir, "nation", ["n_nationkey"]).take_all())
    layers, blobs = [], []
    for n in nat:
        layers.append(f"L{n}")
        blobs.append(WKB.point(n % 10 + 0.25, n // 5 + 0.5))
        layers.append(f"L{n}")
        s = (n % 4) + 1.0
        blobs.append(WKB.box(float(n), 0.0, n + s, s))
    tab = pa.table({"layer": pa.array(layers, pa.string()),
                    "wkb": pa.array(blobs, pa.binary())})
    d = tempfile.mkdtemp(prefix="dxf_")
    p = os.path.join(d, "a.dxf")
    open(p, "wb").write(VW.dxf_bytes(tab, layer_col="layer"))

    def measure(b: pa.Table) -> pa.Table:
        npts = npoly = 0
        sx = sy = nvert = 0
        for blob in b.column("wkb").to_pylist():
            g = WKB.loads(blob)
            if g["type"] == "Point":
                npts += 1
                sx += int(np.floor(g["xy"][0] * 1e6 + 0.5))
                sy += int(np.floor(g["xy"][1] * 1e6 + 0.5))
            else:
                npoly += 1
                nvert += len(g["rings"][0])
        return pa.table({
            "n_points": pa.array([npts], pa.int64()),
            "n_polygons": pa.array([npoly], pa.int64()),
            "sx_sum": pa.array([sx], pa.int64()),
            "sy_sum": pa.array([sy], pa.int64()),
            "vert_sum": pa.array([nvert], pa.int64())})

    return VF.read_dxf([p]).map_batches(measure, batch_format="pyarrow")


SQL_VECTOR_DXF_ROUNDTRIP = """
SELECT COUNT(*) AS n_points,
       COUNT(*) AS n_polygons,
       CAST(SUM((n_nationkey % 10) * 1000000 + 250000) AS BIGINT) AS sx_sum,
       CAST(SUM((n_nationkey // 5) * 1000000 + 500000) AS BIGINT) AS sy_sum,
       CAST(COUNT(*) * 5 AS BIGINT) AS vert_sum
FROM nation
"""


def raster_bmp_gif_roundtrip_q(sf_dir: str):
    """BMP / PNM / GIF drivers on the driver surface (frmts/bmp,
    frmts/pnm, frmts/gif): per nation three derived 16x16 grids round-trip
    through each codec — BMP 8-bit paletted (4-byte row padding,
    bottom-up rows), PNM P5 16-bit (big-endian samples), GIF LZW
    (variable-width LSB codes over a runs-heavy grid) — and the decoded
    sums are closed forms over the derivation."""
    from ..core.bmp import decode_bmp, encode_bmp
    from ..core.gif import decode_gif, encode_gif
    from ..core.pnm import decode_pnm, encode_pnm

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        k = np.arange(256, dtype=np.int64)
        pal7 = np.repeat(np.arange(7, dtype=np.uint8)[:, None], 3, 1)
        nk, bsum, psum, gsum = [], [], [], []
        for n in ks:
            n = int(n)
            gb = ((n * 31 + k) % 251).astype(np.uint8).reshape(16, 16)
            a, _ = decode_bmp(encode_bmp(gb))
            assert np.array_equal(a, gb)
            g16 = ((n * 17 + k) % 60000).astype(np.uint16).reshape(16, 16)
            a16 = decode_pnm(encode_pnm(g16))
            assert a16.dtype == np.uint16 and np.array_equal(a16, g16)
            gg = ((n * 13 + k) % 7).astype(np.uint8).reshape(16, 16)
            ag, _ = decode_gif(encode_gif(gg, pal7))
            assert np.array_equal(ag, gg)
            nk.append(n)
            bsum.append(int(a.astype(np.int64).sum()))
            psum.append(int(a16.astype(np.int64).sum()))
            gsum.append(int(ag.astype(np.int64).sum()))
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "bmp_sum": pa.array(bsum, pa.int64()),
                         "pnm_sum": pa.array(psum, pa.int64()),
                         "gif_sum": pa.array(gsum, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_BMP_GIF_ROUNDTRIP = """
WITH cells AS (
    SELECT n.n_nationkey AS nk, c.k
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS k) c
)
SELECT nk AS n_nationkey,
       CAST(SUM((nk * 31 + k) % 251) AS BIGINT) AS bmp_sum,
       CAST(SUM((nk * 17 + k) % 60000) AS BIGINT) AS pnm_sum,
       CAST(SUM((nk * 13 + k) % 7) AS BIGINT) AS gif_sum
FROM cells
GROUP BY nk
"""


def vector_spatialite_roundtrip_q(sf_dir: str):
    """SpatiaLite driver on the driver surface (ogr/ogrsf_frmts/sqlite):
    planted per-nation POINT + LINESTRING features with typed attributes
    written as gaia BLOBs into a SpatiaLite database (v4
    geometry_columns metadata) and read back through the Ray reader;
    counts, snapped coordinate sums, vertex totals and the attribute sum
    are closed forms."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    nat = sorted(int(r["n_nationkey"]) for r in
                 _read(sf_dir, "nation", ["n_nationkey"]).take_all())
    vals, blobs = [], []
    for n in nat:
        vals.append(2 * n)
        blobs.append(WKB.point(n % 10 + 0.25, n // 5 + 0.5))
        vals.append(2 * n + 1)
        npts = n % 3 + 2
        xy = np.stack([n + 0.5 * np.arange(npts),
                       0.25 * np.arange(npts)], axis=1)
        blobs.append(WKB.dumps({"type": "LineString", "xy": xy}))
    tab = pa.table({"val": pa.array(vals, pa.int64()),
                    "wkb": pa.array(blobs, pa.binary())})
    d = tempfile.mkdtemp(prefix="slite_")
    p = os.path.join(d, "a.sqlite")
    open(p, "wb").write(VW.spatialite_bytes({"features": tab}))

    def measure(b: pa.Table) -> pa.Table:
        npts = nlin = 0
        sx = sy = nvert = lx = 0
        for blob in b.column("wkb").to_pylist():
            g = WKB.loads(blob)
            if g["type"] == "Point":
                npts += 1
                sx += int(np.floor(g["xy"][0] * 1e6 + 0.5))
                sy += int(np.floor(g["xy"][1] * 1e6 + 0.5))
            else:
                nlin += 1
                nvert += len(g["xy"])
                lx += int(np.floor(g["xy"][:, 0] * 1e6 + 0.5).sum())
        vsum = int(np.asarray(b.column("val"), dtype=np.int64).sum())
        return pa.table({
            "n_points": pa.array([npts], pa.int64()),
            "n_lines": pa.array([nlin], pa.int64()),
            "sx_sum": pa.array([sx], pa.int64()),
            "sy_sum": pa.array([sy], pa.int64()),
            "vert_sum": pa.array([nvert], pa.int64()),
            "lx_sum": pa.array([lx], pa.int64()),
            "attr_sum": pa.array([vsum], pa.int64())})

    return VF.read_spatialite([p]).map_batches(
        measure, batch_format="pyarrow")


SQL_VECTOR_SPATIALITE_ROUNDTRIP = """
WITH verts AS (
    SELECT n.n_nationkey AS nk, c.k
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS k) c
    WHERE c.k < n.n_nationkey % 3 + 2
)
SELECT (SELECT COUNT(*) FROM nation) AS n_points,
       (SELECT COUNT(*) FROM nation) AS n_lines,
       (SELECT CAST(SUM((n_nationkey % 10) * 1000000 + 250000) AS BIGINT)
        FROM nation) AS sx_sum,
       (SELECT CAST(SUM((n_nationkey // 5) * 1000000 + 500000) AS BIGINT)
        FROM nation) AS sy_sum,
       CAST(COUNT(*) AS BIGINT) AS vert_sum,
       CAST(SUM(nk * 1000000 + k * 500000) AS BIGINT) AS lx_sum,
       (SELECT CAST(SUM(4 * n_nationkey + 1) AS BIGINT) FROM nation)
           AS attr_sum
FROM verts
"""


def raster_dem_formats_q(sf_dir: str):
    """DEM-grid + TGA drivers on the driver surface (frmts/srtmhgt,
    frmts/dted, frmts/gsg, frmts/zmap, frmts/tga): per nation six derived
    16x16 grids round-trip through each codec — SRTMHGT raw big-endian
    int16, DTED signed-magnitude column records with additive checksums,
    Surfer 6 ASCII (DSAA) + Surfer 7 binary (DSRB tags), ZMap column-major
    text, TGA RLE — and the decoded sums are closed forms over the
    derivation."""
    from ..core import demgrids as DG
    from ..core import tga as TGA

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        k = np.arange(256, dtype=np.int64)
        out = {"n_nationkey": [], "hgt_sum": [], "dted_sum": [],
               "gsag_sum": [], "gs7bg_sum": [], "zmap_sum": [],
               "tga_sum": []}
        for n in ks:
            n = int(n)
            g = ((n * 31 + k) % 2001 - 1000).astype(np.int16).reshape(16, 16)
            a, _, _ = DG.decode_srtmhgt(DG.encode_srtmhgt(g))
            assert np.array_equal(a, g)
            out["hgt_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 17 + k) % 2001 - 1000).astype(np.int16).reshape(16, 16)
            a, _, _ = DG.decode_dted(DG.encode_dted(g))
            assert np.array_equal(a, g)
            out["dted_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 11 + k) % 499).astype(np.float64).reshape(16, 16)
            a, _, _ = DG.decode_gsag(DG.encode_gsag(g))
            assert np.array_equal(a, g)
            out["gsag_sum"].append(int(a.sum()))
            g = ((n * 13 + k) % 997).astype(np.float64).reshape(16, 16)
            a, _, _ = DG.decode_gs7bg(DG.encode_gs7bg(g))
            assert np.array_equal(a, g)
            out["gs7bg_sum"].append(int(a.sum()))
            g = ((n * 7 + k) % 199).astype(np.float64).reshape(16, 16)
            a, _, _ = DG.decode_zmap(DG.encode_zmap(g))
            assert np.array_equal(a, g)
            out["zmap_sum"].append(int(a.sum()))
            g = ((n * 3 + k) % 251).astype(np.uint8).reshape(16, 16)
            a, _ = TGA.decode_tga(TGA.encode_tga(g, rle=True))
            assert np.array_equal(a, g)
            out["tga_sum"].append(int(a.astype(np.int64).sum()))
            out["n_nationkey"].append(n)
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in out.items()})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_DEM_FORMATS = """
WITH cells AS (
    SELECT n.n_nationkey AS nk, c.k
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS k) c
)
SELECT nk AS n_nationkey,
       CAST(SUM((nk * 31 + k) % 2001 - 1000) AS BIGINT) AS hgt_sum,
       CAST(SUM((nk * 17 + k) % 2001 - 1000) AS BIGINT) AS dted_sum,
       CAST(SUM((nk * 11 + k) % 499) AS BIGINT) AS gsag_sum,
       CAST(SUM((nk * 13 + k) % 997) AS BIGINT) AS gs7bg_sum,
       CAST(SUM((nk * 7 + k) % 199) AS BIGINT) AS zmap_sum,
       CAST(SUM((nk * 3 + k) % 251) AS BIGINT) AS tga_sum
FROM cells
GROUP BY nk
"""


def vector_xlsx_gtfs_jsonfg_q(sf_dir: str):
    """XLSX / ODS / GTFS / JSON-FG drivers on the driver surface
    (ogr/ogrsf_frmts/{xlsx,ods,gtfs,jsonfg}): per nation, planted typed
    attributes round-trip through an OOXML spreadsheet, a synthetic GTFS
    stops feed (written as RFC 4180 text, read through the feed reader),
    and a JSON-FG FeatureCollection (time instants + WGS84 geometry).
    Decoded sums are closed forms; quarter coordinates snap exactly at
    *100."""
    import os
    import tempfile

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        names = ["n" * (int(n) % 5 + 1) for n in ks]
        # XLSX roundtrip
        tab = pa.table({
            "name": pa.array(names),
            "val": pa.array([3 * int(n) + 7 for n in ks], pa.int64()),
            "score": pa.array([int(n) % 13 + 0.25 for n in ks],
                              pa.float64())})
        back = VF.parse_xlsx_bytes(VW.xlsx_bytes(tab))
        oback = VF.parse_ods_bytes(VW.ods_bytes(tab))
        ods_val = np.asarray(oback.column("val"), dtype=np.int64)
        ods_score4 = (np.asarray(oback.column("score"), np.float64) * 4) \
            .round().astype(np.int64)
        xlsx_val = np.asarray(back.column("val"), dtype=np.int64)
        xlsx_namelen = np.array([len(s) for s in
                                 back.column("name").to_pylist()],
                                dtype=np.int64)
        xlsx_score4 = (np.asarray(back.column("score"), np.float64) * 4) \
            .round().astype(np.int64)
        # GTFS stops roundtrip (one feed per batch)
        with tempfile.TemporaryDirectory() as td:
            lines = ["stop_id,stop_name,stop_lat,stop_lon"]
            for n in ks:
                n = int(n)
                lines.append(f"{n},s{n},{n % 10 + 0.5},{n // 5 + 0.25}")
            with open(os.path.join(td, "stops.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
            st = VF.gtfs_table(td, "stops")
        order = np.argsort(np.asarray(st.column("stop_id"), np.int64))
        pts = [WKB.loads(v) for v in st.column("wkb").to_pylist()]
        gx = np.array([p["xy"][0] for p in pts])[order]
        gy = np.array([p["xy"][1] for p in pts])[order]
        gtfs_sx = (gx * 100).round().astype(np.int64)
        gtfs_sy = (gy * 100).round().astype(np.int64)
        # JSON-FG roundtrip
        fg = pa.table({
            "k": pa.array(ks, pa.int64()),
            "time_start": pa.array([f"2024-01-{int(n) % 28 + 1:02d}"
                                    for n in ks]),
            "time_end": pa.array([f"2024-01-{int(n) % 28 + 1:02d}"
                                  for n in ks]),
            "wkb": pa.array([WKB.point(int(n) % 7 + 0.5,
                                       int(n) % 3 + 0.25) for n in ks],
                            pa.binary())})
        fb = VF.parse_jsonfg_bytes(VW.jsonfg_bytes(fg))
        fgo = np.argsort(np.asarray(fb.column("k"), np.int64))
        fpts = [WKB.loads(v) for v in fb.column("wkb").to_pylist()]
        fx = np.array([p["xy"][0] for p in fpts])[fgo]
        fy = np.array([p["xy"][1] for p in fpts])[fgo]
        fday = np.array([int(s[8:10]) for s in
                         fb.column("time_start").to_pylist()],
                        dtype=np.int64)[fgo]
        return pa.table({
            "n_nationkey": pa.array(ks, pa.int64()),
            "xlsx_val": pa.array(xlsx_val, pa.int64()),
            "xlsx_namelen": pa.array(xlsx_namelen, pa.int64()),
            "xlsx_score4": pa.array(xlsx_score4, pa.int64()),
            "ods_val": pa.array(ods_val, pa.int64()),
            "ods_score4": pa.array(ods_score4, pa.int64()),
            "gtfs_sx": pa.array(gtfs_sx, pa.int64()),
            "gtfs_sy": pa.array(gtfs_sy, pa.int64()),
            "fg_x2": pa.array((fx * 100).round().astype(np.int64),
                              pa.int64()),
            "fg_y4": pa.array((fy * 100).round().astype(np.int64),
                              pa.int64()),
            "fg_day": pa.array(fday, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_VECTOR_XLSX_GTFS_JSONFG = """
SELECT n_nationkey,
       CAST(3 * n_nationkey + 7 AS BIGINT) AS xlsx_val,
       CAST(n_nationkey % 5 + 1 AS BIGINT) AS xlsx_namelen,
       CAST((n_nationkey % 13) * 4 + 1 AS BIGINT) AS xlsx_score4,
       CAST(3 * n_nationkey + 7 AS BIGINT) AS ods_val,
       CAST((n_nationkey % 13) * 4 + 1 AS BIGINT) AS ods_score4,
       CAST((n_nationkey // 5) * 100 + 25 AS BIGINT) AS gtfs_sx,
       CAST((n_nationkey % 10) * 100 + 50 AS BIGINT) AS gtfs_sy,
       CAST((n_nationkey % 7) * 100 + 50 AS BIGINT) AS fg_x2,
       CAST((n_nationkey % 3) * 100 + 25 AS BIGINT) AS fg_y4,
       CAST(n_nationkey % 28 + 1 AS BIGINT) AS fg_day
FROM nation
"""


def vector_geoparquet_roundtrip_q(sf_dir: str):
    """GeoParquet driver on the driver surface (ogr/ogrsf_frmts/parquet):
    planted per-nation POINT features round-trip through GeoParquet bytes
    (``geo`` file metadata verified: WKB encoding, bbox); snapped
    coordinate sums and the bbox corners are closed forms."""
    import ray as _ray

    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    # nation is a bounded 25-row dim table — materialize ONCE so the
    # file-level geo metadata (bbox over the whole layer) is global, not
    # per-batch (the same take_all exception the spatialite slot uses).
    ks = sorted(int(r["n_nationkey"]) for r in
                _read(sf_dir, "nation", ["n_nationkey"]).take_all())
    tab = pa.table({
        "k": pa.array(ks, pa.int64()),
        "wkb": pa.array([WKB.point(n % 10 + 0.25, n // 5 + 0.5)
                         for n in ks], pa.binary())})
    blob = VW.geoparquet_bytes(tab)
    geo = VF.geoparquet_meta(blob)
    assert geo["columns"]["wkb"]["encoding"] == "WKB"
    back = VF.parse_geoparquet_bytes(blob)
    order = np.argsort(np.asarray(back.column("k"), np.int64))
    pts = [WKB.loads(v) for v in back.column("wkb").to_pylist()]
    x = np.array([p["xy"][0] for p in pts])[order]
    y = np.array([p["xy"][1] for p in pts])[order]
    bb = geo["columns"]["wkb"]["bbox"]
    out = pa.table({
        "n_nationkey": pa.array(ks, pa.int64()),
        "x4": pa.array((x * 4).round().astype(np.int64), pa.int64()),
        "y2": pa.array((y * 2).round().astype(np.int64), pa.int64()),
        "bb_x4": pa.array(np.full(len(ks), int(round(bb[0] * 4)),
                                  np.int64)),
        "bb_y2": pa.array(np.full(len(ks), int(round(bb[3] * 2)),
                                  np.int64))})
    return _ray.data.from_arrow(out)


SQL_VECTOR_GEOPARQUET_ROUNDTRIP = """
SELECT n_nationkey,
       CAST((n_nationkey % 10) * 4 + 1 AS BIGINT) AS x4,
       CAST((n_nationkey // 5) * 2 + 1 AS BIGINT) AS y2,
       (SELECT CAST(MIN((m.n_nationkey % 10) * 4 + 1) AS BIGINT)
        FROM nation m) AS bb_x4,
       (SELECT CAST(MAX((m.n_nationkey // 5) * 2 + 1) AS BIGINT)
        FROM nation m) AS bb_y2
FROM nation
"""


def raster_rawgrid_formats_q(sf_dir: str):
    """Raw-binary grid drivers on the driver surface (frmts/raw/{bt,gtx,
    ehdr,ntv2,lan,rraster}, frmts/idrisi, frmts/ers): per nation eight
    derived grids round-trip — BT column-major south-first, GTX
    big-endian south-up rows, EHdr BIL with cell-center ULXMAP, Idrisi
    RST + .rdc metadata, ERS tagged header + BIL, NTv2 double-flipped
    subgrid records, Erdas LAN HEAD74 BIL, RRaster .grd/.gri — and the
    decoded sums are closed forms."""
    from ..core import rawgrids as RG

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        k = np.arange(256, dtype=np.int64)
        out = {"n_nationkey": [], "bt_sum": [], "gtx_sum": [],
               "ehdr_sum": [], "rst_sum": [], "ers_sum": [],
               "ntv2_sum": [], "lan_sum": [], "rr_sum": [],
               "dem_sum": [], "lcp_sum": [], "pds_sum": [],
               "bsb_sum": [], "ter_sum": [], "kro_sum": [],
               "fits_sum": [], "gxf_sum": [], "sig_sum": [],
               "jdem_sum": [], "geoid_sum": []}
        for n in ks:
            n = int(n)
            g = ((n * 31 + k) % 2001 - 1000).astype(np.int16).reshape(16, 16)
            a, _, _ = RG.decode_bt(RG.encode_bt(g))
            assert np.array_equal(a, g)
            out["bt_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 17 + k) % 997).astype(np.float32).reshape(16, 16)
            a, _, _ = RG.decode_gtx(RG.encode_gtx(g))
            assert np.array_equal(a, g)
            out["gtx_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 13 + k) % 251).astype(np.uint8).reshape(16, 16)
            a, _, _ = RG.decode_ehdr(*RG.encode_ehdr(g))
            assert np.array_equal(a, g)
            out["ehdr_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 11 + k) % 30000 - 15000).astype(np.int16) \
                .reshape(16, 16)
            a, _, _ = RG.decode_idrisi(*RG.encode_idrisi(g))
            assert np.array_equal(a, g)
            out["rst_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 7 + k) % 499).astype(np.uint16).reshape(16, 16)
            a, _, _ = RG.decode_ers(*RG.encode_ers(g))
            assert np.array_equal(a, g)
            out["ers_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 23 + k) % 199 - 99).astype(np.float32) \
                .reshape(8, 8, 4)
            a, _, _ = RG.decode_ntv2(RG.encode_ntv2(
                g, gt=(-72.0, 0.25, 0.0, 46.0, 0.0, -0.125)))
            assert np.array_equal(a, g)
            out["ntv2_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 29 + k) % 251).astype(np.uint8).reshape(16, 16)
            a, _, _ = RG.decode_lan(RG.encode_lan(g))
            assert np.array_equal(a, g)
            out["lan_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 19 + k) % 1009 - 500).astype(np.int32) \
                .reshape(16, 16)
            a, _, _ = RG.decode_rraster(*RG.encode_rraster(g))
            assert np.array_equal(a, g)
            out["rr_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 37 + k) % 2001 - 1000).astype(np.int16) \
                .reshape(16, 16)
            a, _, _ = RG.decode_usgsdem(RG.encode_usgsdem(
                g, gt=(-106.0, 1 / 1200, 0.0, 40.0, 0.0, -1 / 1200)))
            assert np.array_equal(a, g)
            out["dem_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 41 + np.arange(320, dtype=np.int64)) % 2001
                 - 1000).astype(np.int16).reshape(5, 8, 8)
            a, _, _ = RG.decode_lcp(RG.encode_lcp(g))
            assert np.array_equal(a, g)
            out["lcp_sum"].append(int(a.astype(np.int64).sum()))
            from ..core import pds as PDSC
            g = ((n * 43 + k) % 251).astype(np.uint8).reshape(16, 16)
            a, _, _ = PDSC.decode_pds(PDSC.encode_pds(g))
            assert np.array_equal(a, g)
            out["pds_sum"].append(int(a.astype(np.int64).sum()))
            from ..core import bsb as BSBC
            g = ((n * 47 + k) % 113).astype(np.uint8).reshape(16, 16)
            pal = np.repeat(np.arange(113, dtype=np.uint8)[:, None], 3, 1)
            a, _ = BSBC.decode_bsb(BSBC.encode_bsb(g, pal))
            assert np.array_equal(a, g)
            out["bsb_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 53 + k) % 2001 - 1000).astype(np.int16) \
                .reshape(16, 16)
            a, _, _ = RG.decode_terragen(RG.encode_terragen(g))
            assert np.array_equal(a, g)
            out["ter_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 59 + k) % 251).astype(np.uint8).reshape(16, 16)
            a, _, _ = RG.decode_kro(RG.encode_kro(g))
            assert np.array_equal(a, g)
            out["kro_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 61 + k) % 2001 - 1000).astype(np.int16) \
                .reshape(16, 16)
            a, _, _ = RG.decode_fits(RG.encode_fits(g))
            assert np.array_equal(a, g)
            out["fits_sum"].append(int(a.astype(np.int64).sum()))
            g = ((n * 67 + k) % 499).astype(np.float64).reshape(16, 16)
            a, _, _ = RG.decode_gxf(RG.encode_gxf(g))
            assert np.array_equal(a, g)
            out["gxf_sum"].append(int(a.sum()))
            g = ((n * 71 + k) % 997).astype(np.float64).reshape(16, 16)
            a, _, _ = RG.decode_sigdem(RG.encode_sigdem(g, scale_z=1.0))
            assert np.array_equal(a, g)
            out["sig_sum"].append(int(a.sum()))
            g = ((n * 73 + k) % 5000 - 2000).astype(np.float64) \
                .reshape(16, 16) / 10.0
            a, _, _ = RG.decode_jdem(RG.encode_jdem(g))
            assert np.array_equal(a, g)
            out["jdem_sum"].append(int(round(a.sum() * 10)))
            g = ((n * 79 + k) % 256 - 128).astype(np.float32) \
                .reshape(16, 16)
            a, _, _ = RG.decode_ngsgeoid(RG.encode_ngsgeoid(g))
            assert np.array_equal(a, g)
            out["geoid_sum"].append(int(a.astype(np.int64).sum()))
            out["n_nationkey"].append(n)
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in out.items()})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_RASTER_RAWGRID_FORMATS = """
WITH cells AS (
    SELECT n.n_nationkey AS nk, c.k
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS k) c
), lcp AS (
    SELECT n.n_nationkey AS nk,
           CAST(SUM((n.n_nationkey * 41 + c.k) % 2001 - 1000) AS BIGINT)
               AS lcp_sum
    FROM nation n
    CROSS JOIN (SELECT UNNEST(generate_series(0, 319)) AS k) c
    GROUP BY n.n_nationkey
)
SELECT cells.nk AS n_nationkey,
       CAST(SUM((cells.nk * 31 + k) % 2001 - 1000) AS BIGINT) AS bt_sum,
       CAST(SUM((cells.nk * 17 + k) % 997) AS BIGINT) AS gtx_sum,
       CAST(SUM((cells.nk * 13 + k) % 251) AS BIGINT) AS ehdr_sum,
       CAST(SUM((cells.nk * 11 + k) % 30000 - 15000) AS BIGINT) AS rst_sum,
       CAST(SUM((cells.nk * 7 + k) % 499) AS BIGINT) AS ers_sum,
       CAST(SUM((cells.nk * 23 + k) % 199 - 99) AS BIGINT) AS ntv2_sum,
       CAST(SUM((cells.nk * 29 + k) % 251) AS BIGINT) AS lan_sum,
       CAST(SUM((cells.nk * 19 + k) % 1009 - 500) AS BIGINT) AS rr_sum,
       CAST(SUM((cells.nk * 37 + k) % 2001 - 1000) AS BIGINT) AS dem_sum,
       CAST(SUM((cells.nk * 43 + k) % 251) AS BIGINT) AS pds_sum,
       CAST(SUM((cells.nk * 47 + k) % 113) AS BIGINT) AS bsb_sum,
       CAST(SUM((cells.nk * 53 + k) % 2001 - 1000) AS BIGINT) AS ter_sum,
       CAST(SUM((cells.nk * 59 + k) % 251) AS BIGINT) AS kro_sum,
       CAST(SUM((cells.nk * 61 + k) % 2001 - 1000) AS BIGINT) AS fits_sum,
       CAST(SUM((cells.nk * 67 + k) % 499) AS BIGINT) AS gxf_sum,
       CAST(SUM((cells.nk * 71 + k) % 997) AS BIGINT) AS sig_sum,
       CAST(SUM((cells.nk * 73 + k) % 5000 - 2000) AS BIGINT) AS jdem_sum,
       CAST(SUM((cells.nk * 79 + k) % 256 - 128) AS BIGINT) AS geoid_sum,
       MIN(lcp.lcp_sum) AS lcp_sum
FROM cells JOIN lcp ON lcp.nk = cells.nk
GROUP BY cells.nk
"""


def text_bpe_pairs_q(sf_dir: str, top_k: int = 32):
    """Distributed BPE merge-candidate counting (the first step of
    byte-pair-encoding tokenizer training, Sennrich et al. 2016): count
    every ADJACENT byte pair over the real corpus and rank the top merge
    candidates.  Scale shape in ``text.bpe_pair_counts``: one bincount
    partial per batch over a single concatenated byte buffer (doc
    boundaries masked), bounded <=65536-key measured-size merge.  Corpus
    is pure ASCII so DuckDB ord() replays byte values exactly."""
    from .text import bpe_pair_counts
    return bpe_pair_counts(_read(sf_dir, "documents", ["text"]),
                           top_k=top_k)


SQL_TEXT_BPE_PAIRS = """
WITH chars AS (
    SELECT doc_id AS doc, i.i AS i,
           CAST(ord(substr(text, i.i + 1, 1)) AS BIGINT) AS b
    FROM documents, generate_series(0, 2047) i(i)
    WHERE i.i < length(text)
), pairs AS (
    SELECT doc, b * 256 + lead(b, 1) OVER w AS p
    FROM chars
    WINDOW w AS (PARTITION BY doc ORDER BY i)
    QUALIFY lead(b, 1) OVER w IS NOT NULL
), cnts AS (
    SELECT p, COUNT(*) AS n FROM pairs GROUP BY p
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, p) AS BIGINT) AS rank,
       CAST(p AS BIGINT) AS pair_key,
       CAST(p // 256 AS BIGINT) AS c1,
       CAST(p % 256 AS BIGINT) AS c2,
       CAST(n AS BIGINT) AS cnt
FROM cnts
ORDER BY n DESC, p
LIMIT 32
"""


def q_source_cap(sf_dir: str, cap: int = 50):
    """Per-source document rate limiting (the Common-Crawl-style
    per-domain cap): keep at most ``cap`` docs per source, ranked by
    splitmix64(doc_id) — deterministic, partition-invariant, RNG-free.
    Shuffle shape in ``text.source_cap``: per-batch combiner keeps each
    batch's per-source best-``cap`` (exact — a global survivor is a batch
    survivor), then a measured-size grouped finish per source key."""
    from .text import source_cap
    return source_cap(_read(sf_dir, "documents", ["doc_id", "source"]),
                      cap=cap)


def hash_source(s: str) -> int:
    """Deterministic int64 key for a source string: base-257 polynomial
    over the ASCII bytes in int64 wraparound (process-salt-free; the
    corpus source names are short ASCII)."""
    h = np.int64(0)
    with np.errstate(over="ignore"):
        for ch in s.encode("utf-8"):
            h = h * np.int64(257) + np.int64(ch)
    return int(h)


def _sql_source_cap(cap: int = 50) -> str:
    from .sketches import _sm_hugeint_select
    inner = _sm_hugeint_select(
        "(SELECT doc_id, source FROM documents)", "doc_id")
    # hv is splitmix64 as HUGEINT in [0, 2^64); numpy's int64 view wraps —
    # ORDER BY the SIGNED value: hv - 2^64 when >= 2^63
    return (f"WITH s AS ({inner}) "
            "SELECT source, doc_id, "
            "CAST(row_number() OVER (PARTITION BY source ORDER BY "
            "CASE WHEN hv >= 9223372036854775808::HUGEINT "
            "THEN hv - 18446744073709551616::HUGEINT ELSE hv END, doc_id) "
            "AS BIGINT) AS rk "
            "FROM s "
            "QUALIFY row_number() OVER (PARTITION BY source ORDER BY "
            "CASE WHEN hv >= 9223372036854775808::HUGEINT "
            "THEN hv - 18446744073709551616::HUGEINT ELSE hv END, doc_id) "
            f"<= {cap}")


def text_unigram_logprob_q(sf_dir: str):
    """Unigram LM scoring on the driver surface (the CCNet/KenLM
    perplexity-filter analog): global char-frequency pass + broadcast
    256-entry quantized log-prob table + per-doc integer score — see
    ``text.unigram_logprob`` for the scale shape and the exact-replay
    quantization contract."""
    from .text import unigram_logprob
    return unigram_logprob(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_UNIGRAM_LOGPROB = """
WITH chars AS (
    SELECT doc_id AS doc, CAST(ord(substr(text, i.i + 1, 1)) AS BIGINT) AS b
    FROM documents, generate_series(0, 2047) i(i)
    WHERE i.i < length(text)
), freq AS (
    SELECT b, COUNT(*) AS cnt FROM chars GROUP BY b
), tot AS (
    SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM freq
), logq AS (
    SELECT b, CAST(floor(ln(CAST(cnt AS DOUBLE) / total) * 1048576e0)
                   AS BIGINT) AS lq
    FROM freq, tot
)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS nch,
       COALESCE((SELECT CAST(SUM(lq) AS BIGINT)
                 FROM chars c JOIN logq l ON c.b = l.b
                 WHERE c.doc = d.doc_id), 0) AS lp_q
FROM documents d
"""


def vector_gmt_roundtrip_q(sf_dir: str):
    """GMT ASCII driver on the driver surface (ogr/ogrsf_frmts/gmt):
    per-nation planted POINT features with typed attributes round-trip
    through the @VGMT1.0 text layout; snapped coordinate sums and the
    attribute sum are closed forms."""
    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        tab = pa.table({
            "k": pa.array(ks, pa.int64()),
            "name": pa.array(["n|a\"m" * (int(n) % 3 + 1) for n in ks]),
            "wkb": pa.array([WKB.point(int(n) % 10 + 0.25,
                                       int(n) // 5 + 0.5) for n in ks],
                            pa.binary())})
        back = VF.parse_gmt_bytes(VW.gmt_bytes(tab))
        order = np.argsort(np.asarray(back.column("k"), np.int64))
        pts = [WKB.loads(v) for v in back.column("wkb").to_pylist()]
        x = np.array([p["xy"][0] for p in pts])[order]
        y = np.array([p["xy"][1] for p in pts])[order]
        nlen = np.array([len(s) for s in back.column("name").to_pylist()],
                        dtype=np.int64)[order]
        return pa.table({
            "n_nationkey": pa.array(ks, pa.int64()),
            "x4": pa.array((x * 4).round().astype(np.int64), pa.int64()),
            "y2": pa.array((y * 2).round().astype(np.int64), pa.int64()),
            "name_len": pa.array(nlen, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_VECTOR_GMT_ROUNDTRIP = """
SELECT n_nationkey,
       CAST((n_nationkey % 10) * 4 + 1 AS BIGINT) AS x4,
       CAST((n_nationkey // 5) * 2 + 1 AS BIGINT) AS y2,
       CAST(5 * (n_nationkey % 3 + 1) AS BIGINT) AS name_len
FROM nation
"""


def text_bpe_train_q(sf_dir: str):
    """Iterative BPE training on the driver surface (2 merge rounds over
    the real corpus — see ``text.bpe_train`` for the per-round
    distributed shape).  The DuckDB oracle replays BOTH rounds exactly:
    round-1 argmax, then the greedy leftmost-first APPLY as window
    arithmetic (runs of equal-pair matches keep even positions — the
    parity-of-(i - last run start) rule), then the round-2 recount."""
    import ray as _ray

    from .text import bpe_train
    tab = bpe_train(_read(sf_dir, "documents", ["text"]), n_merges=2)
    return _ray.data.from_arrow(tab)


SQL_TEXT_BPE_TRAIN = """
WITH chars AS (
    SELECT doc_id AS doc, i.i AS i,
           CAST(ord(substr(text, i.i + 1, 1)) AS BIGINT) AS t
    FROM documents, generate_series(0, 2047) i(i)
    WHERE i.i < length(text)
), p1 AS (
    SELECT t * 65536 + lead(t, 1) OVER w AS p
    FROM chars WINDOW w AS (PARTITION BY doc ORDER BY i)
    QUALIFY lead(t, 1) OVER w IS NOT NULL
), best1 AS (
    SELECT p // 65536 AS a1, p % 65536 AS b1, COUNT(*) AS n1
    FROM p1 GROUP BY p ORDER BY COUNT(*) DESC, p LIMIT 1
), marked AS (
    SELECT c.doc, c.i, c.t,
           (c.t = b.a1 AND lead(c.t, 1) OVER w = b.b1) AS m
    FROM chars c CROSS JOIN best1 b
    WINDOW w AS (PARTITION BY c.doc ORDER BY c.i)
), runs AS (
    SELECT doc, i, t, m,
           (m AND NOT COALESCE(lag(m, 1) OVER w, FALSE)) AS run_start
    FROM marked WINDOW w AS (PARTITION BY doc ORDER BY i)
), kept AS (
    SELECT doc, i, t, m,
           (m AND ((i - MAX(CASE WHEN run_start THEN i END)
                    OVER (PARTITION BY doc ORDER BY i)) % 2 = 0)) AS keep
    FROM runs
), surviv AS (
    SELECT doc, i, CASE WHEN keep THEN 256 ELSE t END AS t
    FROM kept
    QUALIFY NOT COALESCE(lag(keep, 1)
                         OVER (PARTITION BY doc ORDER BY i), FALSE)
), seq2 AS (
    SELECT doc,
           row_number() OVER (PARTITION BY doc ORDER BY i) - 1 AS j, t
    FROM surviv
), p2 AS (
    SELECT t * 65536 + lead(t, 1) OVER w AS p
    FROM seq2 WINDOW w AS (PARTITION BY doc ORDER BY j)
    QUALIFY lead(t, 1) OVER w IS NOT NULL
), best2 AS (
    SELECT p // 65536 AS a2, p % 65536 AS b2, COUNT(*) AS n2
    FROM p2 GROUP BY p ORDER BY COUNT(*) DESC, p LIMIT 1
)
SELECT CAST(1 AS BIGINT) AS rank, CAST(a1 AS BIGINT) AS tok_a,
       CAST(b1 AS BIGINT) AS tok_b, CAST(256 AS BIGINT) AS new_id,
       CAST(n1 AS BIGINT) AS cnt
FROM best1
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(a2 AS BIGINT), CAST(b2 AS BIGINT),
       CAST(257 AS BIGINT), CAST(n2 AS BIGINT)
FROM best2
"""


def vector_dgn_roundtrip_q(sf_dir: str):
    """DGN v7 driver on the driver surface (ogr/ogrsf_frmts/dgn):
    per-nation planted POINT + 3-vertex LINE_STRING elements round-trip
    through the ISFF element stream (TCB units, word-swapped int32 UORs,
    VAX origin doubles); quarter coordinates snap exactly at the 1e-4
    master-unit resolution, so sums are closed forms."""
    from ..core import wkb as WKB
    from ..sources import vector_formats as VF
    from ..sources import vector_writers as VW

    def run(b: pa.Table) -> pa.Table:
        import os
        import tempfile
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        blobs, levels = [], []
        for n in ks:
            n = int(n)
            blobs.append(WKB.point(n % 10 + 0.25, n // 5 + 0.5))
            levels.append(n % 63)
            xy = np.array([(n % 7, 0.0), (n % 7 + 1, 0.25),
                           (n % 7 + 2, 0.5)], np.float64)
            blobs.append(WKB.dumps({"type": "LineString", "xy": xy}))
            levels.append((n + 1) % 63)
        tab = pa.table({"level": pa.array(levels, pa.int64()),
                        "wkb": pa.array(blobs, pa.binary())})
        payload = VW.dgn_bytes(tab)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "b.dgn")
            with open(p, "wb") as f:
                f.write(payload)
            from ..core.dgn import decode_dgn
            rows, skipped = decode_dgn(open(p, "rb").read())
        assert not skipped
        pts = [WKB.loads(w) for _, _, w in rows]
        px4, lx4, lvl = [], [], []
        for i, n in enumerate(ks):
            g0 = pts[2 * i]
            g1 = pts[2 * i + 1]
            assert g0["type"] == "Point"
            assert g1["type"] == "LineString"
            px4.append(int(round((g0["xy"][0] + g0["xy"][1]) * 4)))
            lx4.append(int(round(g1["xy"].sum() * 4)))
            lvl.append(rows[2 * i][1])
        return pa.table({
            "n_nationkey": pa.array(ks, pa.int64()),
            "pt_sum4": pa.array(px4, pa.int64()),
            "line_sum4": pa.array(lx4, pa.int64()),
            "level": pa.array(lvl, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_VECTOR_DGN_ROUNDTRIP = """
SELECT n_nationkey,
       CAST((n_nationkey % 10) * 4 + 1 + (n_nationkey // 5) * 4 + 2
            AS BIGINT) AS pt_sum4,
       CAST(3 * (n_nationkey % 7) * 4 + 12 + 3 AS BIGINT) AS line_sum4,
       CAST(n_nationkey % 63 AS BIGINT) AS level
FROM nation
"""


def vector_s57_roundtrip_q(sf_dir: str):
    """S-57 driver on the driver surface (ogr/ogrsf_frmts/s57 +
    frmts/iso8211): per-nation planted point + edge features round-trip
    through the ISO 8211 record stream (binary subfields, repeating
    SG2D/FSPT, COMF=1e7 coordinate scaling); quarter coordinates snap
    exactly, so sums are closed forms."""
    from ..core import wkb as WKB
    from ..core.s57 import decode_s57, encode_s57

    def run(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("n_nationkey"), dtype=np.int64)
        feats = []
        for n in ks:
            n = int(n)
            feats.append({"objl": 2 * n, "attrs": {95: str(n)},
                          "geom": {"type": "Point",
                                   "xy": np.array([n % 10 + 0.25,
                                                   n // 5 + 0.5])}})
            xy = np.array([(n % 7, 0.0), (n % 7 + 0.5, 0.25)], np.float64)
            feats.append({"objl": 2 * n + 1, "attrs": {},
                          "geom": {"type": "LineString", "xy": xy}})
        back = decode_s57(encode_s57(feats))
        pts = [WKB.loads(f["wkb"]) for f in back]
        px4, lx4, objl_sum, attr_sum = [], [], [], []
        for i, n in enumerate(ks):
            g0, g1 = pts[2 * i], pts[2 * i + 1]
            assert g0["type"] == "Point" and g1["type"] == "LineString"
            px4.append(int(round((g0["xy"][0] + g0["xy"][1]) * 4)))
            lx4.append(int(round(g1["xy"].sum() * 4)))
            objl_sum.append(back[2 * i]["objl"] + back[2 * i + 1]["objl"])
            attr_sum.append(int(back[2 * i]["attrs"][95]))
        return pa.table({
            "n_nationkey": pa.array(ks, pa.int64()),
            "pt_sum4": pa.array(px4, pa.int64()),
            "line_sum4": pa.array(lx4, pa.int64()),
            "objl_sum": pa.array(objl_sum, pa.int64()),
            "attr_val": pa.array(attr_sum, pa.int64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(run, batch_format="pyarrow")


SQL_VECTOR_S57_ROUNDTRIP = """
SELECT n_nationkey,
       CAST((n_nationkey % 10) * 4 + 1 + (n_nationkey // 5) * 4 + 2
            AS BIGINT) AS pt_sum4,
       CAST(2 * (n_nationkey % 7) * 4 + 2 + 1 AS BIGINT) AS line_sum4,
       CAST(4 * n_nationkey + 1 AS BIGINT) AS objl_sum,
       CAST(n_nationkey AS BIGINT) AS attr_val
FROM nation
"""


def q_temperature_mix(sf_dir: str, alpha: float = 0.5):
    """Temperature-based data-mixture sampling on the driver surface —
    see ``text.temperature_mix`` for the two-pass shape and the
    exact-replay threshold contract."""
    from .text import temperature_mix
    return temperature_mix(
        _read(sf_dir, "documents", ["doc_id", "source"]), alpha=alpha)


def _sql_temperature_mix(alpha: float = 0.5) -> str:
    from .sketches import _sm_hugeint_select
    inner = _sm_hugeint_select(
        "(SELECT doc_id, source FROM documents)", "doc_id")
    return f"""
WITH s AS ({inner}), cnt AS (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), mn AS (SELECT MIN(n) AS nmin FROM cnt), thr AS (
    SELECT source,
           CAST(floor(power(CAST(n AS DOUBLE) / nmin, ({alpha!r} - 1e0))
                      * 9007199254740992e0) AS HUGEINT) * 2048 AS t
    FROM cnt, mn
)
SELECT s.doc_id, s.source
FROM s JOIN thr ON thr.source = s.source
WHERE s.hv < thr.t
"""
