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
