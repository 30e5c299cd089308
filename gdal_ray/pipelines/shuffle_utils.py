"""Shared shuffle-minimization helpers.

``filter_multi_keys``: the singleton-elimination pattern used by tile
compositing and LSH bucketing — a key-only count pre-pass (per-block
partial counts, driver-merged histogram) decides which keys have ≥2 rows;
only those rows enter the groupby shuffle.  For LSH-style workloads the
multi fraction is tiny, so this removes ~all of the per-group map_groups
overhead (50 µs × 10⁶ singleton groups is real money)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def multi_key_array(ds: "ray.data.Dataset", key_col: str,
                    max_count: int | None = None) -> np.ndarray:
    """Sorted array of keys that occur on ≥2 rows.  ``max_count`` drops
    degenerate hot keys (LSH mega-buckets from trivial/short documents
    explode quadratically in candidate pairs and are pure noise — the
    standard bucket-size cap).

    Scale shape: per-block partial counts (vectorized) are materialized
    (16-byte rows), their size is MEASURED, and the merge strategy follows
    the measurement: small partial sets (≤ ``driver_limit`` rows ≈ 64 MB)
    merge with one vectorized driver reduce — no shuffle round, no fixed
    sort cost; larger sets go through a DISTRIBUTED ``groupby(k).sum``
    whose singleton majority is filtered out before anything reaches the
    driver.  Either way the returned multi-key set is small by the
    workload's premise."""
    driver_limit = 4_000_000

    def partial(b: pa.Table) -> pa.Table:
        k, c = np.unique(np.asarray(b.column(key_col), dtype=np.int64),
                         return_counts=True)
        return pa.table({"k": pa.array(k), "c": pa.array(c)})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()

    if partials.count() <= driver_limit:
        ks, cs = [], []
        for b in partials.iter_batches(batch_format="pyarrow"):
            ks.append(np.asarray(b.column("k"), dtype=np.int64))
            cs.append(np.asarray(b.column("c"), dtype=np.int64))
        if not ks:
            return np.array([], dtype=np.int64)
        k = np.concatenate(ks)
        c = np.concatenate(cs)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        uniq, start = np.unique(k, return_index=True)
        total = np.add.reduceat(c, start)
        keep = total > 1
        if max_count is not None:
            keep &= total <= max_count
        return uniq[keep]

    counted = partials.groupby("k").sum("c")

    def keep_multi(b: pa.Table) -> pa.Table:
        total = np.asarray(b.column("sum(c)"), dtype=np.int64)
        mask = total > 1
        if max_count is not None:
            mask &= total <= max_count
        return pa.table({"k": b.column("k").filter(pa.array(mask))})

    ks = [np.asarray(b.column("k"), dtype=np.int64)
          for b in counted.map_batches(keep_multi, batch_format="pyarrow")
                          .iter_batches(batch_format="pyarrow")]
    if not ks:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(ks))


def filter_multi_keys(ds: "ray.data.Dataset", key_col: str,
                      max_count: int | None = None) -> "ray.data.Dataset":
    """Rows whose key occurs ≥2 times (anywhere in the dataset)."""
    multi = multi_key_array(ds, key_col, max_count)
    ref = ray.put(multi)

    def keep(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = np.asarray(b.column(key_col), dtype=np.int64)
        if m.size == 0:
            return b.slice(0, 0)
        pos = np.clip(np.searchsorted(m, keys), 0, m.size - 1)
        return b.filter(pa.array(m[pos] == keys))

    return ds.map_batches(keep, batch_format="pyarrow")


def hot_keys_distributed(ds: "ray.data.Dataset", key_col: str,
                         threshold: int | None = None) -> np.ndarray:
    """Keys whose row count exceeds ``threshold`` (default 8× the mean,
    min 64) — distributed count, only the small hot set reaches the
    driver.  The generic form of the spatial joins' skew pre-pass."""
    def partial(b: pa.Table) -> pa.Table:
        k, c = np.unique(np.asarray(b.column(key_col), dtype=np.int64),
                         return_counts=True)
        return pa.table({"k": pa.array(k), "c": pa.array(c)})

    counted = ds.map_batches(partial, batch_format="pyarrow") \
                .groupby("k").sum("c").materialize()
    if threshold is None:
        total = counted.sum("sum(c)")
        ncells = max(1, counted.count())
        threshold = max(64, int(8 * (total / ncells)))
    thr = threshold

    def keep(b: pa.Table) -> pa.Table:
        mask = np.asarray(b.column("sum(c)"), dtype=np.int64) > thr
        return pa.table({"k": b.column("k").filter(pa.array(mask))})

    hs = [np.asarray(b.column("k"), dtype=np.int64)
          for b in counted.map_batches(keep, batch_format="pyarrow")
                          .iter_batches(batch_format="pyarrow")]
    if not hs:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(hs))


def salt_keys_batch(t: pa.Table, key_col: str, out_col: str,
                    hot: np.ndarray, salt: int,
                    replicate: bool) -> pa.Table:
    """Exactness-preserving salt: non-replicating rows of a hot key hash
    into ``salt`` sub-keys; replicating rows copy into all of them — every
    cross-side pair still meets in exactly one group.  The original key
    column is left intact (canonical-cell tests keep working)."""
    keys = np.asarray(t.column(key_col), dtype=np.int64)
    if hot.size == 0:
        return t.append_column(out_col, pa.array(keys * np.int64(salt)))
    pos = np.clip(np.searchsorted(hot, keys), 0, hot.size - 1)
    is_hot = hot[pos] == keys
    base = keys * np.int64(salt)
    if not replicate:
        h = (keys + np.arange(keys.size, dtype=np.int64)
             * np.int64(2654435761)) % salt
        return t.append_column(out_col, pa.array(
            base + np.where(is_hot, h, 0)))
    reps = np.where(is_hot, salt, 1).astype(np.int64)
    idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
    offsets = np.zeros(idx.size, dtype=np.int64)
    starts = np.cumsum(reps) - reps
    hot_rows = np.nonzero(is_hot)[0]
    for s in range(salt):
        offsets[starts[hot_rows] + s] = s
    out = t.take(pa.array(idx, pa.int64()))
    return out.append_column(out_col, pa.array(base[idx] + offsets))


# ---------- cluster/size-derived shuffle sizing ----------

def _cluster_cpus(cpus: int | None = None) -> int:
    if cpus is not None:
        return int(cpus)
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    return 8


def shuffle_partitions(est_bytes: int | None = None, *,
                       cpus: int | None = None,
                       target_bytes: int = 256 << 20,
                       lo: int = 8, cpu_frac: float = 0.75,
                       hi_factor: int = 4) -> int:
    """Partition count for a sort/repartition exchange, derived from the
    CLUSTER size and (when the caller can estimate it cheaply) the data
    size — never a constant measured on one box.

    - floor: ``max(lo, 0.75·CPUs)`` — on a 32-CPU single node this is 24,
      the measured sweet spot for Ray's sort-shuffle fixed cost (fragment
      traffic grows ~P² per node), so single-node behavior is unchanged;
      on a 256-node cluster the floor scales with the fleet.
    - size term: ``est_bytes / target_bytes`` (~256 MB per partition)
      raises the count beyond the CPU floor for big exchanges, capped at
      ``hi_factor·CPUs`` so reduce tasks stay schedulable.
    """
    c = _cluster_cpus(cpus)
    floor_p = max(lo, int(c * cpu_frac))
    if est_bytes is None:
        return floor_p
    need = -(-int(est_bytes) // int(target_bytes))
    return max(floor_p, min(need, max(floor_p, hi_factor * c)))


def bucket_count(est_groups: int | None = None, *,
                 cpus: int | None = None, per_cpu: int = 4,
                 lo: int = 16) -> int:
    """Hash-bucket count for bucketed ``groupby().map_groups`` stages
    (composite/overview): ~4 buckets per CPU amortizes the ~1-5 ms
    per-group dispatch while keeping buckets numerous enough to balance;
    grows with the cluster instead of the old hard 128 cap.  When the
    caller knows the group count, buckets never exceed it (empty buckets
    are pure overhead)."""
    c = _cluster_cpus(cpus)
    n = max(lo, per_cpu * c)
    if est_groups is not None and est_groups > 0:
        n = min(n, max(1, int(est_groups)))
    return n


def grouped_sum_int64(partials: "ray.data.Dataset", key_col: str,
                      val_col: str,
                      driver_limit: int = 4_000_000) -> "ray.data.Dataset | pa.Table":
    """Sum ``val_col`` per int64 ``key_col`` over already-combined partial
    rows, picking the merge strategy from the MEASURED partial size (the
    multi_key_array contract): ≤ ``driver_limit`` 16-byte rows merge with
    one vectorized driver reduce — no sort-shuffle round, whose fixed cost
    dwarfs the data at this size; anything bigger goes through the
    distributed ``groupby(key).sum``.  Callers with a bounded key domain
    (e.g. a z-level tile space) can keep the driver path at any input
    scale by inserting a repartition + second combine pass upstream."""
    partials = partials.materialize()
    if partials.count() > driver_limit:
        ds = partials.groupby(key_col).sum(val_col)
        return ds.map_batches(
            lambda b: pa.table({key_col: b.column(key_col),
                                val_col: b.column(f"sum({val_col})")}),
            batch_format="pyarrow")
    ks, vs = [], []
    for b in partials.iter_batches(batch_format="pyarrow"):
        ks.append(np.asarray(b.column(key_col), dtype=np.int64))
        vs.append(np.asarray(b.column(val_col), dtype=np.int64))
    if not ks:
        return pa.table({key_col: pa.array([], pa.int64()),
                         val_col: pa.array([], pa.int64())})
    k = np.concatenate(ks)
    v = np.concatenate(vs)
    order = np.argsort(k, kind="stable")
    k, v = k[order], v[order]
    uniq, start = np.unique(k, return_index=True)
    total = np.add.reduceat(v, start)
    return pa.table({key_col: pa.array(uniq, pa.int64()),
                     val_col: pa.array(total, pa.int64())})


def grouped_map_groups(ds: "ray.data.Dataset", key_col: str, fn,
                       driver_limit: int = 200_000) -> "ray.data.Dataset":
    """``groupby(key).map_groups(fn)`` with a measured-size driver path for
    int64 keys.  The candidate streams this serves (LSH multi-bucket rows,
    hamming-prefix collisions) are a small minority BY PREMISE; when the
    measured row count fits ``driver_limit``, one stable driver-side sort +
    zero-copy slices replace the sort-shuffle round, whose fixed cost is
    most of the query at that size.  Bigger streams keep the distributed
    groupby.  ``fn`` sees exactly the same per-group tables either way
    (groups arrive key-sorted on both paths)."""
    ds = ds.materialize()
    if ds.count() > driver_limit:
        sch = ds.schema(fetch_if_missing=False)
        if sch is not None and pa.types.is_integer(
                sch.base_schema.field(key_col).type):
            # HASHED-bucket mode: groupby(bucket) + in-process key-segment
            # iteration.  Plain groupby(key).map_groups pays ~1-5 ms
            # dispatch PER GROUP — fatal when groups are numerous (per-
            # customer windows, per-doc tf-idf, per-token df at corpus
            # scale); ~4 buckets per CPU amortizes it while keeping the
            # shuffle balanced.  Keys are splitmixed first (raw keys
            # stripe); a single hot GROUP still lands in one bucket, same
            # as plain map_groups — no worse, per the round-5 poly-poly
            # lesson.  fn sees exactly the driver path's key-sorted
            # slices.
            nb = bucket_count()

            def bucketize(b: pa.Table) -> pa.Table:
                k = np.asarray(b.column(key_col), np.int64)
                x = (k.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
                x = (x ^ (x >> np.uint64(30))) * np.uint64(
                    0xBF58476D1CE4E5B9)
                x = (x ^ (x >> np.uint64(27))) * np.uint64(
                    0x94D049BB133111EB)
                x ^= x >> np.uint64(31)
                return b.append_column(
                    "__gmg_bkt",
                    pa.array((x % np.uint64(nb)).astype(np.int64)))

            def bucket_fn(g: pa.Table) -> pa.Table:
                g = g.drop_columns(["__gmg_bkt"])
                keys = np.asarray(g.column(key_col), np.int64)
                order = np.argsort(keys, kind="stable")
                g = g.take(pa.array(order, pa.int64()))
                _, starts = np.unique(keys[order], return_index=True)
                bounds = np.append(starts, keys.size)
                out = [fn(g.slice(int(bounds[i]),
                                  int(bounds[i + 1] - bounds[i])))
                       for i in range(starts.size)]
                out = [t for t in out if t.num_rows] or out[:1]
                return pa.concat_tables(out)

            return ds.map_batches(bucketize, batch_format="pyarrow") \
                .groupby("__gmg_bkt") \
                .map_groups(bucket_fn, batch_format="pyarrow")
        return ds.groupby(key_col).map_groups(fn, batch_format="pyarrow")
    batches = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
               for b in ds.iter_batches(batch_format="pyarrow")]
    if not batches:
        sch = ds.schema(fetch_if_missing=False)
        if sch is None:
            return ds  # schema-less empty input: nothing to group
        empty = pa.table({f.name: pa.array([], f.type)
                          for f in sch.base_schema})
        try:
            # preserve fn's OUTPUT schema when it handles an empty group
            return ray.data.from_arrow(fn(empty))
        except Exception:
            # group fns may assume non-empty groups (map_groups never
            # passes one) — mirror the distributed path: empty in, empty
            # out, input schema
            return ray.data.from_arrow(empty)
    tbl = pa.concat_tables(batches).combine_chunks()
    keys = np.asarray(tbl.column(key_col), dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    tbl = tbl.take(pa.array(order, pa.int64()))
    _, starts = np.unique(keys[order], return_index=True)
    bounds = np.append(starts, keys.size)
    out = [fn(tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])))
           for i in range(starts.size)]
    out = [t for t in out if t.num_rows] or out[:1]
    return ray.data.from_arrow(pa.concat_tables(out))


def grouped_agg(partials: "ray.data.Dataset", keys: list,
                specs: list,
                driver_limit: int = 4_000_000) -> "ray.data.Dataset | pa.Table":
    """Final merge of already-combined per-block partial aggregates, for
    any key type and multiple value columns.  ``specs`` is a list of
    ``(col, op)`` with op in {'sum', 'min', 'max'}; output columns keep
    their input names on BOTH paths, so callers see one schema.

    Merge strategy follows the MEASURED partial size (the
    ``multi_key_array`` contract): a small partial set (bounded by
    blocks × distinct-keys-per-block) merges with ONE driver-side
    ``pa.Table.group_by`` — vectorized C++, no sort-shuffle round, whose
    fixed cost (~P×B block slices) dwarfs the data for low-cardinality
    groupbys like TPC-H Q1's 6 groups; anything bigger goes through the
    distributed ``groupby().aggregate``.  A bounded key domain keeps the
    driver path valid at any input scale."""
    from ray.data.aggregate import Max, Min, Sum
    partials = partials.materialize()
    if partials.count() > driver_limit:
        ops = {"sum": Sum, "min": Min, "max": Max}
        aggs = [ops[op](c) for c, op in specs]
        ds = partials.groupby(keys if len(keys) > 1 else keys[0]) \
                     .aggregate(*aggs)

        def rename(b: pa.Table) -> pa.Table:
            cols = {k: b.column(k) for k in keys}
            for c, op in specs:
                cols[c] = b.column(f"{op}({c})")
            return pa.table(cols)

        return ds.map_batches(rename, batch_format="pyarrow")
    batches = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
               for b in partials.iter_batches(batch_format="pyarrow")]
    if not batches:
        sch = partials.schema()
        empty = {k: pa.array([], sch.base_schema.field(k).type) for k in keys}
        for c, _ in specs:
            empty[c] = pa.array([], sch.base_schema.field(c).type)
        return pa.table(empty)
    tbl = pa.concat_tables(batches)
    res = tbl.group_by(keys).aggregate([(c, op) for c, op in specs])
    cols = {k: res.column(k) for k in keys}
    for c, op in specs:
        cols[c] = res.column(f"{c}_{op}")
    return pa.table(cols)


def bucket_vectorized(ds: "ray.data.Dataset", key_col: str, fn,
                      driver_limit: int = 4_000_000) -> "ray.data.Dataset":
    """groupby(HASHED bucket of an int64 key) + a fn that is VECTORIZED
    over key segments — for full-table merges (keep-lists, left-merge
    distributions) where even grouped_map_groups' per-key fn dispatch
    would dominate (one Python call per doc/customer).  ``fn`` receives a
    table containing WHOLE key groups (never split across calls) and must
    do its own per-key segmentation (np.unique(..., return_inverse)).
    Measured-size contract: inputs fitting ``driver_limit`` rows run fn
    once on the driver over everything — identical kernel, zero shuffle."""
    ds = ds.materialize()
    if ds.count() <= driver_limit:
        batches = [b if isinstance(b, pa.Table)
                   else pa.Table.from_batches([b])
                   for b in ds.iter_batches(batch_format="pyarrow")]
        if not batches:
            return ds
        return ray.data.from_arrow(fn(pa.concat_tables(batches)))
    nb = bucket_count()

    def bucketize(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column(key_col), np.int64)
        x = (k.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return b.append_column("__bv_bkt",
                               pa.array((x % np.uint64(nb)).astype(np.int64)))

    def bfn(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["__bv_bkt"]))

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("__bv_bkt").map_groups(bfn, batch_format="pyarrow")
