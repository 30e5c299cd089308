"""Mergeable cardinality sketch (HyperLogLog) — the "novel sketch" class of
custom operator a 100 TB training-data pipeline needs for cheap distinct
counts (unique users / URLs / tokens) without a `unique()` shuffle.

Scale shape: each batch folds to at most ``m = 2**b`` (register, rho) rows
with one vectorized pass (`np.maximum.at`), the partial volume is bounded
by ``m × blocks`` regardless of input size, and `grouped_agg`'s
measured-size merge combines them (driver-side when tiny, distributed
groupby-max above the limit).  Registers are exact integers, so the driver
oracle replays the ENTIRE sketch in DuckDB: splitmix64 in HUGEINT
arithmetic (the dedup recipe), bucket/suffix split by integer division,
and bit-length via a cross-joined generate_series counter — value-hash
equality on the register table, not an "approximately equal" assertion.

References: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007) — standard bias constant and
small-range (linear counting) correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (floor(log2(w))+1; 0 for w=0).
    Binary-reduction shifts — float tricks (frexp/log2) round 54-bit
    values near powers of two and are NOT exact here."""
    r = np.zeros(w.shape, np.int64)
    x = w.astype(np.uint64).copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        r[m] += s
        x[m] >>= np.uint64(s)
    return r + (x > 0)


def hll_registers(ds: "ray.data.Dataset", col: str, *, b: int = 10):
    """Nonzero HLL registers of an int64 column: rows (register, rho) with
    ``register = splitmix64(v) >> (64-b)`` and ``rho`` = 1-based position
    of the highest set bit in the remaining ``64-b`` hash bits (``64-b+1``
    when they are all zero), maxed per register."""
    from .dedup import _splitmix
    from .shuffle_utils import grouped_agg

    wbits = 64 - b
    wmask = np.uint64((1 << wbits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col), np.int64).astype(np.uint64)
        h = _splitmix(v)
        j = (h >> np.uint64(wbits)).astype(np.int64)
        rho = (wbits + 1 - _bitlen_u64(h & wmask)).astype(np.int64)
        regs = np.zeros(1 << b, np.int64)
        np.maximum.at(regs, j, rho)
        nz = np.flatnonzero(regs)
        return pa.table({"register": pa.array(nz, pa.int64()),
                         "rho": pa.array(regs[nz], pa.int64())})

    merged = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         ["register"], [("rho", "max")])
    if isinstance(merged, pa.Table):
        return ray.data.from_arrow(merged)
    return merged


def hll_estimate(ds: "ray.data.Dataset", col: str, *, b: int = 10) -> float:
    """Distinct-count estimate from the register sketch (standard bias
    constant + linear-counting small-range correction).  The register
    fetch is bounded by ``m`` rows — never by the input size."""
    m = 1 << b
    regs = np.zeros(m, np.int64)
    for row in hll_registers(ds, col, b=b).take_all():
        regs[int(row["register"])] = int(row["rho"])
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * float(np.log(m / zeros))    # linear counting
    return est


# ---------- Bloom filter (membership sketch / semi-join pre-filter) ----------

def _bloom_positions(v: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m with h1 = splitmix(v), h2 = splitmix(h1).
    uint64 wraparound is harmless because m is a power of two dividing
    2^64 — the same positions fall out of DuckDB's unwrapped HUGEINT
    arithmetic, which is what makes the oracle replay exact."""
    from .dedup import _splitmix
    h1 = _splitmix(v.astype(np.uint64))
    h2 = _splitmix(h1)
    mm = np.uint64(m_bits)
    return np.stack([(h1 + np.uint64(i) * h2) % mm for i in range(k)],
                    axis=1).astype(np.int64)


def bloom_bits(ds: "ray.data.Dataset", col: str, *, m_bits: int = 1 << 17,
               k: int = 4):
    """Distinct set-bit positions of a Bloom filter over an int64 column —
    the build side of a broadcast semi-join pre-filter.  Per batch the
    positions fold to ≤min(k·rows, m) distinct rows; the measured-size
    merge dedups them (driver-side when tiny, distributed groupby-max
    above the limit)."""
    from .shuffle_utils import grouped_agg
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col), np.int64)
        bits = np.unique(_bloom_positions(v, m_bits, k))
        return pa.table({"bit": pa.array(bits, pa.int64()),
                         "one": pa.array(np.ones(bits.size, np.int64))})

    merged = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         ["bit"], [("one", "max")])
    if isinstance(merged, pa.Table):
        return ray.data.from_arrow(merged.select(["bit"]))
    return merged.map_batches(lambda b: b.select(["bit"]),
                              batch_format="pyarrow")


def bloom_words(bits_ds: "ray.data.Dataset", m_bits: int) -> np.ndarray:
    """Pack the (bounded-by-m) bit rows into the int64 word array a probe
    task tests against — 2^17 bits = 16 KB, the classic ray.put broadcast."""
    words = np.zeros(m_bits // 64, np.uint64)
    for row in bits_ds.take_all():              # ≤ m rows by construction
        b = int(row["bit"])
        words[b >> 6] |= np.uint64(1) << np.uint64(b & 63)
    return words


def bloom_semi_join(probe: "ray.data.Dataset", build: "ray.data.Dataset",
                    *, probe_col: str, build_col: str,
                    m_bits: int = 1 << 17, k: int = 4):
    """Bloom-prefiltered semi-join: build side folds to a 16 KB bit array
    shipped ONCE via ray.put; every probe batch keeps rows whose k
    positions are all set.  No false negatives (guaranteed superset of the
    exact semi-join); false positives bounded by (1-e^(-kn/m))^k — chain an
    exact verify (broadcast key set or hash join) when exactness matters."""
    words = bloom_words(bloom_bits(build, build_col, m_bits=m_bits, k=k),
                        m_bits)
    ref = ray.put(words)

    def fn(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        v = np.asarray(batch.column(probe_col), np.int64)
        pos = _bloom_positions(v, m_bits, k)
        hit = np.ones(v.size, bool)
        for i in range(k):
            p = pos[:, i]
            hit &= ((w[p >> 6] >> (p & 63).astype(np.uint64))
                    & np.uint64(1)).astype(bool)
        return batch.filter(pa.array(hit))

    return probe.map_batches(fn, batch_format="pyarrow")


# ---------- Count-Min sketch (frequency estimation / heavy hitters) ----------

def countmin_counters(ds: "ray.data.Dataset", col: str, *,
                      w_buckets: int = 1 << 14, d: int = 4):
    """Nonzero Count-Min counters of an int64 column: rows (row, bucket, n)
    with bucket_i = (h1 + i*h2) mod w (same double-hashing family as the
    Bloom filter — and the same exact-HUGEINT-replay property since w is a
    power of two).  Per batch the counters fold to ≤d·min(w, distinct)
    rows via ONE bincount per row; counters MERGE BY SUM, so grouped_agg's
    measured-size merge applies unchanged."""
    from .shuffle_utils import grouped_agg
    assert w_buckets & (w_buckets - 1) == 0, "w_buckets must be 2^k"

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col), np.int64)
        pos = _bloom_positions(v, w_buckets, d)      # (n, d) buckets
        rows, buckets, counts = [], [], []
        for i in range(d):
            bc = np.bincount(pos[:, i], minlength=w_buckets)
            nz = np.flatnonzero(bc)
            rows.append(np.full(nz.size, i, np.int64))
            buckets.append(nz)
            counts.append(bc[nz])
        return pa.table({
            "row": pa.array(np.concatenate(rows), pa.int64()),
            "bucket": pa.array(np.concatenate(buckets), pa.int64()),
            "n": pa.array(np.concatenate(counts).astype(np.int64))})

    merged = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         ["row", "bucket"], [("n", "sum")])
    if isinstance(merged, pa.Table):
        return ray.data.from_arrow(merged)
    return merged


def countmin_estimate(counters_ds: "ray.data.Dataset", values: np.ndarray,
                      *, w_buckets: int = 1 << 14, d: int = 4) -> np.ndarray:
    """Point-query frequency estimates: min over the d rows of the queried
    counters.  Never underestimates; overestimates by at most the
    collision mass (≤ 2N/w with prob ≥ 1-2^-d)."""
    tab = np.zeros((d, w_buckets), np.int64)
    for r in counters_ds.take_all():             # ≤ d·w rows by construction
        tab[int(r["row"]), int(r["bucket"])] = int(r["n"])
    pos = _bloom_positions(np.asarray(values, np.int64), w_buckets, d)
    return np.min(
        np.stack([tab[i, pos[:, i]] for i in range(d)], axis=1), axis=1)


def build_sql_countmin(table: str, col: str, *, w_buckets: int = 1 << 14,
                       d: int = 4) -> str:
    """Exact SQL replay of countmin_counters (NO distinct — counters count
    every occurrence)."""
    from .relational import _fp_splitmix_steps

    chain = [f"cm_0 AS (SELECT CAST({col} AS HUGEINT) AS x FROM {table})"]
    prev = "cm_0"
    n = 0
    for col_in, col_out, tag in (("x", "h1", "c1"), ("h1", "h2", "c2")):
        for name, expr in _fp_splitmix_steps(col_in, col_out, tag):
            n += 1
            chain.append(f"cm_{n} AS (SELECT *, {expr} AS {name} FROM {prev})")
            prev = f"cm_{n}"
    return ("WITH " + ",\n".join(chain)
            + f"\nSELECT i AS row, CAST((h1 + i * h2) % {w_buckets}::HUGEINT "
            f"AS BIGINT) AS bucket, count(*) AS n "
            f"FROM {prev}, generate_series(0, {d - 1}) g(i) "
            "GROUP BY 1, 2")


# ---------- DuckDB oracle: full register replay ----------

def build_sql_hll_registers(table: str, col: str, *, b: int = 10) -> str:
    """Exact SQL replay of hll_registers over a non-negative BIGINT column:
    splitmix64 in HUGEINT (dedup recipe), bucket/suffix by integer
    division (2^(64-b)), bit length by counting i in 1..64-b with
    w >= 1<<(i-1) over a cross-joined series (no correlated args —
    the DuckDB limitation documented in CLAUDE.md)."""
    from .relational import _fp_splitmix_steps

    wbits = 64 - b
    p2w = 1 << wbits
    # DISTINCT first: repeated values are idempotent for a max-register
    # sketch, and duplicate (register, w) rows would otherwise multiply the
    # cross-joined bit-length SUM
    chain = [f"hl_0 AS (SELECT DISTINCT CAST({col} AS HUGEINT) AS x "
             f"FROM {table})"]
    prev = "hl_0"
    for i, (name, expr) in enumerate(_fp_splitmix_steps("x", "hv", "q")):
        chain.append(f"hl_{i + 1} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"hl_{i + 1}"
    chain.append(
        f"hl_jw AS (SELECT CAST(hv // {p2w}::HUGEINT AS BIGINT) AS register, "
        f"CAST(hv % {p2w}::HUGEINT AS BIGINT) AS w FROM {prev})")
    chain.append(
        f"hl_bl AS (SELECT register, w, "
        f"SUM(CASE WHEN w >= (1::BIGINT << (i - 1)) THEN 1 ELSE 0 END) AS bl "
        f"FROM hl_jw, generate_series(1, {wbits}) g(i) GROUP BY register, w)")
    return ("WITH " + ",\n".join(chain)
            + f"\nSELECT register, CAST(MAX({wbits + 1} - bl) AS BIGINT) "
            "AS rho FROM hl_bl GROUP BY register")


def _sm_hugeint_select(table: str, col: str) -> str:
    """A SELECT exposing every source column plus ``hv`` =
    splitmix64(col) as HUGEINT — the building block for hash-threshold
    sampling and any other keep-if-hash-below-p oracle."""
    from .relational import _fp_splitmix_steps

    q = f"SELECT *, CAST({col} AS HUGEINT) AS sm_x FROM {table}"
    for name, expr in _fp_splitmix_steps("sm_x", "hv", "smq"):
        q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return q


def build_sql_bloom_bits(table: str, col: str, *, m_bits: int = 1 << 17,
                         k: int = 4) -> str:
    """Exact SQL replay of bloom_bits: two chained splitmix64 passes in
    HUGEINT, then pos_i = (h1 + i*h2) % m over a cross-joined i series.
    Unwrapped HUGEINT mod equals the numpy uint64-wrapped mod because m
    is a power of two dividing 2^64."""
    from .relational import _fp_splitmix_steps

    chain = [f"bf_0 AS (SELECT DISTINCT CAST({col} AS HUGEINT) AS x "
             f"FROM {table})"]
    prev = "bf_0"
    n = 0
    for col_in, col_out, tag in (("x", "h1", "b1"), ("h1", "h2", "b2")):
        for name, expr in _fp_splitmix_steps(col_in, col_out, tag):
            n += 1
            chain.append(f"bf_{n} AS (SELECT *, {expr} AS {name} FROM {prev})")
            prev = f"bf_{n}"
    return ("WITH " + ",\n".join(chain)
            + f"\nSELECT DISTINCT CAST((h1 + i * h2) % {m_bits}::HUGEINT "
            f"AS BIGINT) AS bit FROM {prev}, generate_series(0, {k - 1}) g(i)")


# ---------- grouped HLL (distinct-per-group at sketch cost) ----------

def hll_registers_grouped(ds: "ray.data.Dataset", col: str,
                          group_col: str, *, b: int = 10):
    """Per-group HLL register sketches: rows (group, register, rho),
    maxed per (group, register).  The mergeable grouped-cardinality
    primitive — COUNT(DISTINCT x) GROUP BY g at 100 TB without shuffling
    the values, only ≤ groups×2^b register rows.  Per batch the groups
    are factorized once and one ``np.maximum.at`` scatter fills a
    (groups_in_batch × 2^b) register plane — no per-group dispatch."""
    from .dedup import _splitmix
    from .shuffle_utils import grouped_agg

    m = 1 << b
    wbits = 64 - b
    wmask = np.uint64((1 << wbits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        v = np.asarray(batch.column(col), np.int64).astype(np.uint64)
        ug, gi = np.unique(g, return_inverse=True)
        h = _splitmix(v)
        j = (h >> np.uint64(wbits)).astype(np.int64)
        rho = (wbits + 1 - _bitlen_u64(h & wmask)).astype(np.int64)
        regs = np.zeros(ug.size * m, np.int64)
        np.maximum.at(regs, gi * m + j, rho)
        nz = np.flatnonzero(regs)
        return pa.table({
            group_col: pa.array(list(ug[nz // m]), pa.string()),
            "register": pa.array(nz % m, pa.int64()),
            "rho": pa.array(regs[nz], pa.int64())})

    merged = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         [group_col, "register"], [("rho", "max")])
    if isinstance(merged, pa.Table):
        return ray.data.from_arrow(merged)
    return merged


def hll_grouped_estimates(ds: "ray.data.Dataset", col: str,
                          group_col: str, *, b: int = 10) -> pa.Table:
    """Distinct-count estimate per group from the grouped register
    sketch.  The harmonic denominator is computed in EXACT int64
    (Σ 2^(wbits−rho) over present registers + 2^wbits per absent one —
    every rho ≤ wbits+1 so each term is integral), then ONE fixed float
    expression prints the estimate: ((α · m) · m) · 2^wbits / T, with
    the linear-counting small-range branch on the register zero count.
    Both factors replay verbatim in SQL, so the estimate is value-hash
    exact, not approximately-equal."""
    m = 1 << b
    wbits = 64 - b
    regs = hll_registers_grouped(ds, col, group_col, b=b)
    parts = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
             for t in regs.iter_batches(batch_format="pyarrow")]
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {group_col: pa.array([], pa.string()),
         "register": pa.array([], pa.int64()),
         "rho": pa.array([], pa.int64())})
    g = np.asarray(tbl.column(group_col).to_pylist(), dtype=object)
    rho = np.asarray(tbl.column("rho"), np.int64)
    ug, gi = np.unique(g, return_inverse=True)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    names, n_regs, n_zeros, ests = [], [], [], []
    # driver-side per-group finish: the denominator Σ2^(wbits−rho) +
    # zeros·2^wbits reaches 2^64 — Python big ints keep it exact (the
    # SQL side uses HUGEINT), ONE float conversion at the division
    for i, name in enumerate(ug):
        rr = rho[gi == i]
        pres = int(rr.size)
        zeros = m - pres
        T = int(sum(1 << (wbits - int(r)) for r in rr)) \
            + zeros * (1 << wbits)
        est = ((alpha * float(m)) * float(m)) * float(1 << wbits) \
            / float(T)
        if est <= 2.5 * m and zeros > 0:
            est = float(m) * float(np.log(m / float(zeros)))
        names.append(str(name))
        n_regs.append(pres)
        n_zeros.append(zeros)
        ests.append(np.floor(est * 1e6 + 0.5) / 1e6)
    return pa.table({group_col: pa.array(names, pa.string()),
                     "n_registers": pa.array(n_regs, pa.int64()),
                     "zeros": pa.array(n_zeros, pa.int64()),
                     "est": pa.array(ests, pa.float64())})


def build_sql_hll_grouped(table: str, col: str, group_col: str, *,
                          b: int = 10) -> str:
    """Exact SQL replay of hll_grouped_estimates: the register replay of
    build_sql_hll_registers carrying the group column, then the same
    exact-int64 harmonic denominator and the same fixed float expression
    (multiplication order matters — ((α·m)·m)·2^wbits / T)."""
    from .relational import _fp_splitmix_steps

    m = 1 << b
    wbits = 64 - b
    p2w = 1 << wbits
    chain = [f"hg_0 AS (SELECT DISTINCT {group_col} AS grp, "
             f"CAST({col} AS HUGEINT) AS x FROM {table})"]
    prev = "hg_0"
    for i, (name, expr) in enumerate(_fp_splitmix_steps("x", "hv", "q")):
        chain.append(f"hg_{i + 1} AS (SELECT *, {expr} AS {name} "
                     f"FROM {prev})")
        prev = f"hg_{i + 1}"
    chain.append(
        f"hg_jw AS (SELECT grp, "
        f"CAST(hv // {p2w}::HUGEINT AS BIGINT) AS register, "
        f"CAST(hv % {p2w}::HUGEINT AS BIGINT) AS w FROM {prev})")
    chain.append(
        f"hg_bl AS (SELECT grp, register, w, "
        f"SUM(CASE WHEN w >= (1::BIGINT << (i - 1)) THEN 1 ELSE 0 END) "
        f"AS bl FROM hg_jw, generate_series(1, {wbits}) g(i) "
        f"GROUP BY grp, register, w)")
    chain.append(
        f"hg_reg AS (SELECT grp, register, "
        f"CAST(MAX({wbits + 1} - bl) AS BIGINT) AS rho "
        f"FROM hg_bl GROUP BY grp, register)")
    chain.append(
        f"hg_agg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_registers, "
        f"CAST({m} - COUNT(*) AS BIGINT) AS zeros, "
        f"SUM(CAST(1::BIGINT << ({wbits} - rho) AS HUGEINT)) "
        f"+ ({m} - COUNT(*))::HUGEINT * {p2w}::HUGEINT AS t "
        f"FROM hg_reg GROUP BY grp)")
    alpha = f"(0.7213e0 / (1.0e0 + 1.079e0 / {m}e0))"
    raw = (f"((({alpha} * {m}e0) * {m}e0) * {p2w}e0 "
           f"/ CAST(t AS DOUBLE))")
    lc = f"({m}e0 * ln({m}e0 / CAST(zeros AS DOUBLE)))"
    return ("WITH " + ",\n".join(chain)
            + f"\nSELECT grp AS {group_col}, n_registers, zeros, "
            f"floor((CASE WHEN {raw} <= {25 * m}e0 / 10e0 AND zeros > 0 "
            f"THEN {lc} ELSE {raw} END) * 1000000e0 + 0.5e0) / 1000000e0 "
            "AS est FROM hg_agg")
