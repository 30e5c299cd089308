"""Raster pipeline operators beyond tiling (SURVEY §2.2/2.6/2.14):
as-features, pixel-info (point sampling), global band statistics, and the
events windowed aggregate (the streaming-analog groupby).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..core import codecs, proj
from ..core import geotransform as gtm
from ..core.resample import sample as resample_sample
from ..stages.raster import decode_stats


def as_features(batch: pa.Table, step: int = 1) -> pa.Table:
    """gdal2xyz / `gdal raster as-features` (apps/gdalalg_raster_as_features
    .h:29): explode each image into (x, y, value) pixel rows — the flat_map
    that feeds pixel-level relational queries.  ``step`` decimates (the
    bApproxOK sampling of ComputeStatistics)."""
    ids, xs, ys, vals = [], [], [], []
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    gts = batch.column("geotransform").to_pylist()
    iids = batch.column("image_id").to_pylist()
    for i in range(batch.num_rows):
        img = codecs.decode(bts[i], fmts[i])
        band = img if img.ndim == 2 else img[:, :, 0]
        h, w = band.shape
        px, py = np.meshgrid(np.arange(0, w, step) + 0.5, np.arange(0, h, step) + 0.5)
        gx, gy = gtm.apply(tuple(gts[i]), px.ravel(), py.ravel())
        v = band[::step, ::step].ravel()
        n = v.size
        ids.extend([iids[i]] * n)
        xs.append(gx); ys.append(gy); vals.append(v.astype(np.float64))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "x": pa.array(np.concatenate(xs) if xs else np.array([]), pa.float64()),
        "y": pa.array(np.concatenate(ys) if ys else np.array([]), pa.float64()),
        "value": pa.array(np.concatenate(vals) if vals else np.array([]), pa.float64()),
    })


def band_statistics(images: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global band statistics over the whole catalog — the partial+final
    pattern of GDALRasterBand::ComputeStatistics (gcore/gdalrasterband.cpp
    :7126): per-image partials in map_batches, single global combine."""
    partials = images.map_batches(decode_stats, batch_format="pyarrow")

    # single global group: combine per batch, driver-merge the ≤1-row-per-
    # block partials (a sort-shuffle for ONE group is pure fixed cost)
    def combine(b: pa.Table) -> pa.Table:
        g = b.append_column("all", pa.array(np.zeros(b.num_rows, np.int8))) \
             .group_by(["all"]).aggregate(
                 [("count", "sum"), ("vsum", "sum"), ("vsumsq", "sum"),
                  ("vmin", "min"), ("vmax", "max"), ("count", "count")])
        return pa.table({"all": g.column("all"),
                         "count": g.column("count_sum"),
                         "vsum": g.column("vsum_sum"),
                         "vsumsq": g.column("vsumsq_sum"),
                         "vmin": g.column("vmin_min"),
                         "vmax": g.column("vmax_max"),
                         "n_img": g.column("count_count")})

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(partials.map_batches(combine, batch_format="pyarrow"),
                      ["all"],
                      [("count", "sum"), ("vsum", "sum"), ("vsumsq", "sum"),
                       ("vmin", "min"), ("vmax", "max"), ("n_img", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        n = float(b.column("count")[0].as_py())
        s = float(b.column("vsum")[0].as_py())
        ss = float(b.column("vsumsq")[0].as_py())
        mean = s / n
        var = max(0.0, ss / n - mean * mean)
        return pa.table({
            "n_pixels": pa.array([int(n)], pa.int64()),
            "n_images": pa.array([b.column("n_img")[0].as_py()], pa.int64()),
            "vmin": pa.array([b.column("vmin")[0].as_py()], pa.float64()),
            "vmax": pa.array([b.column("vmax")[0].as_py()], pa.float64()),
            "mean": pa.array([mean], pa.float64()),
            "std": pa.array([float(np.sqrt(var))], pa.float64()),
        })

    import ray.data as _rd
    if isinstance(agg, pa.Table):
        return _rd.from_arrow(finish(agg))
    return agg.map_batches(finish, batch_format="pyarrow")


class PixelInfoStage:
    """gdallocationinfo / InterpolateAtPoint (gcore/gdalrasterband.cpp
    :11450): sample each image at broadcast query points that fall inside
    its footprint.  Points broadcast once per actor/process."""

    def __init__(self, points_ref, method: str = "bilinear"):
        p = ray.get(points_ref) if isinstance(points_ref, ray.ObjectRef) else points_ref
        self.lon = np.asarray(p["lon"], dtype=np.float64)
        self.lat = np.asarray(p["lat"], dtype=np.float64)
        self.pids = list(p["ids"])
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"point_id": [], "image_id": [], "value": []}
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        gts = batch.column("geotransform").to_pylist()
        crss = batch.column("crs").to_pylist()
        ids = batch.column("image_id").to_pylist()
        for i in range(batch.num_rows):
            gt = tuple(gts[i])
            tr = proj.get_transformer("EPSG:4326", crss[i])
            gx, gy = tr.transform(self.lon, self.lat)
            px, py = gtm.geo_to_pixel(gt, gx, gy)
            img = None
            w = batch.column("w")[i].as_py()
            h = batch.column("h")[i].as_py()
            inside = (px >= 0) & (px <= w) & (py >= 0) & (py <= h)
            if not inside.any():
                continue
            img = codecs.decode(bts[i], fmts[i])
            band = img if img.ndim == 2 else img[:, :, 0]
            idx = np.nonzero(inside)[0]
            vals, valid = resample_sample(band.astype(np.float64), px[idx], py[idx],
                                          method=self.method)
            for k, j in enumerate(idx):
                if valid[k]:
                    out["point_id"].append(self.pids[j])
                    out["image_id"].append(ids[i])
                    out["value"].append(float(vals[k]))
        return pa.table({"point_id": pa.array(out["point_id"], pa.string()),
                         "image_id": pa.array(out["image_id"], pa.string()),
                         "value": pa.array(out["value"], pa.float64())})


def pixel_info(images: "ray.data.Dataset", lon, lat, point_ids,
               method: str = "bilinear", concurrency=2) -> "ray.data.Dataset":
    ref = ray.put({"lon": np.asarray(lon, dtype=np.float64),
                   "lat": np.asarray(lat, dtype=np.float64),
                   "ids": list(point_ids)})
    from ..stages.taskmode import stage_fn
    return images.map_batches(
        stage_fn(PixelInfoStage, {"points_ref": ref, "method": method}),
        batch_format="pyarrow")


def events_hourly(sf_dir: str):
    """Windowed aggregate over the events stream table: tumbling 1-hour
    event-time windows (the batch analog of a streaming window — the
    reference has no window machinery, SURVEY §2.10; large-scale training
    telemetry needs it)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def window(b: pa.Table) -> pa.Table:
        # window key as ISO string: timestamp unit (s vs us) varies across
        # Arrow/pandas/DuckDB conversions and breaks value-hash comparison
        hour = pc.strftime(pc.floor_temporal(b.column("ts"), unit="hour"),
                           format="%Y-%m-%d %H:%M")
        return pa.table({
            "window_start": hour,
            "event_type": b.column("event_type"),
            "value_u": pa.array(np.round(np.asarray(b.column("value")) * 1e6).astype(np.int64)),
        })

    # key domain = hours × event types (bounded); per-batch combine keeps
    # partials ≤ that per block, and grouped_agg's measured-size merge
    # avoids the sort-shuffle at any realistic window count
    def combine(b: pa.Table) -> pa.Table:
        g = window(b).group_by(["window_start", "event_type"]).aggregate(
            [("value_u", "count"), ("value_u", "sum")])
        return pa.table({"window_start": g.column("window_start"),
                         "event_type": g.column("event_type"),
                         "n": g.column("value_u_count"),
                         "value_u": g.column("value_u_sum")})

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(ds.map_batches(combine, batch_format="pyarrow"),
                      ["window_start", "event_type"],
                      [("n", "sum"), ("value_u", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": b.column("window_start"),
            "event_type": b.column("event_type"),
            "n_events": pa.array(np.asarray(b.column("n"), dtype=np.int64), pa.int64()),
            "sum_value": pc.round(
                pc.divide(pc.cast(b.column("value_u"), pa.float64()), 1e6),
                ndigits=4, round_mode="half_towards_infinity"),
        })

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start, event_type,
       count(*) AS n_events,
       round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def events_sessions(sf_dir: str, *, gap_minutes: int = 30,
                    num_buckets: int = 64):
    """Session windows over the events stream: per-user gap-based
    sessionization (a new session starts when >``gap_minutes`` passes
    between a user's consecutive events) — the second streaming-window
    analog next to the tumbling ``events_hourly`` (SURVEY §2.10; the
    session window is the standard activity unit of training telemetry).

    Scale shape (the tiling composite_bucket pattern): users are routed to
    HASHED buckets (splitmix — raw user ids stripe), each bucket group is
    sessionized for ALL its users in ONE vectorized pass (lexsort by
    (user, ts, event_id), break where user changes or gap exceeded,
    reduceat per session) — no per-user ``map_groups`` dispatch; and the
    measured-size ``grouped_map_groups`` skips the shuffle entirely when
    the event stream is small."""
    gap_us = np.int64(gap_minutes) * 60_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])

    from .dedup import _splitmix

    def bucket(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("user_id"), np.int64)
        bk = (_splitmix(u.astype(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int64)
        return b.append_column("bucket", pa.array(bk, pa.int64()))

    def sessionize(g: pa.Table) -> pa.Table:
        u = np.asarray(g.column("user_id"), np.int64)
        n = u.size
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "session_id": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.string()),
            "session_end": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64())})
        if n == 0:
            return empty
        ts = np.asarray(g.column("ts").cast(pa.int64()), np.int64)  # µs
        eid = np.asarray(g.column("event_id"), np.int64)
        vc = np.round(np.asarray(g.column("value"), np.float64)
                      * 1e6).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, vc = u[order], ts[order], vc[order]
        newu = np.empty(n, bool)
        newu[0] = True
        newu[1:] = u[1:] != u[:-1]
        brk = newu.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sg = np.cumsum(brk)                      # global session ordinal
        base = sg[np.flatnonzero(newu)]          # value at each user's start
        sid = sg - base[np.cumsum(newu) - 1] + 1
        bidx = np.flatnonzero(brk)
        nxt = np.append(bidx[1:], n)
        return pa.table({
            "user_id": pa.array(u[bidx], pa.int64()),
            "session_id": pa.array(sid[bidx], pa.int64()),
            # second-precision timestamps: Arrow %S appends the fractional
            # part on sub-second units, DuckDB strftime truncates it
            "session_start": pc.strftime(
                pa.array((ts[bidx] // 1_000_000).astype("datetime64[s]")),
                format="%Y-%m-%d %H:%M:%S"),
            "session_end": pc.strftime(
                pa.array((ts[nxt - 1] // 1_000_000).astype("datetime64[s]")),
                format="%Y-%m-%d %H:%M:%S"),
            "n_events": pa.array(nxt - bidx, pa.int64()),
            "sum_value": pc.round(
                pc.divide(pc.cast(pa.array(np.add.reduceat(vc, bidx)),
                                  pa.float64()), 1e6),
                ndigits=4, round_mode="half_towards_infinity"),
        })

    from .shuffle_utils import grouped_map_groups
    return grouped_map_groups(ds.map_batches(bucket, batch_format="pyarrow"),
                              "bucket", sessionize)


def events_hopping(sf_dir: str, *, window_minutes: int = 60,
                   hop_minutes: int = 15):
    """Hopping (sliding) windows over the events stream: 60-minute windows
    advancing every 15 — each event lands in window_minutes/hop_minutes
    overlapping windows (the third streaming-window analog, next to
    tumbling events_hourly and session events_sessions).

    Scale shape: the per-batch combiner REPLICATES each row once per
    covering window and collapses to ≤(windows × types) partial rows via
    ``pa.Table.group_by`` before anything shuffles — the bounded key
    domain keeps grouped_agg's measured-size merge valid at any input
    size."""
    reps = window_minutes // hop_minutes
    hop_us = np.int64(hop_minutes) * 60_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def combine(b: pa.Table) -> pa.Table:
        ts = np.asarray(b.column("ts").cast(pa.int64()), np.int64)
        # window starts: the hop-aligned start of the LAST window covering
        # the event, then the reps-1 earlier ones
        last = (ts // hop_us) * hop_us
        starts = np.concatenate([last - i * hop_us for i in range(reps)])
        et = pa.concat_arrays([b.column("event_type").combine_chunks()
                               .cast(pa.string())] * reps)
        vu = np.round(np.asarray(b.column("value"), np.float64)
                      * 1e6).astype(np.int64)
        t = pa.table({
            "window_start": pc.strftime(
                pa.array((starts // 1_000_000).astype("datetime64[s]")),
                format="%Y-%m-%d %H:%M"),
            "event_type": et,
            "n": pa.array(np.ones(starts.size, np.int64)),
            "value_u": pa.array(np.tile(vu, reps)),
        })
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("n", "sum"), ("value_u", "sum")])
        return pa.table({"window_start": g.column("window_start"),
                         "event_type": g.column("event_type"),
                         "n": g.column("n_sum"),
                         "value_u": g.column("value_u_sum")})

    from .shuffle_utils import grouped_agg
    agg = grouped_agg(ds.map_batches(combine, batch_format="pyarrow"),
                      ["window_start", "event_type"],
                      [("n", "sum"), ("value_u", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": b.column("window_start"),
            "event_type": b.column("event_type"),
            "n_events": pa.array(np.asarray(b.column("n"), np.int64),
                                 pa.int64()),
            "sum_value": pc.round(
                pc.divide(pc.cast(b.column("value_u"), pa.float64()), 1e6),
                ndigits=4, round_mode="half_towards_infinity"),
        })

    if isinstance(agg, pa.Table):
        return finish(agg)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_HOPPING = """
WITH w AS (
  SELECT strftime(make_timestamp((epoch_us(ts) // 900000000 - i)
                                 * 900000000), '%Y-%m-%d %H:%M')
             AS window_start,
         event_type, CAST(round(value * 1000000) AS BIGINT) AS vu
  FROM events, generate_series(0, 3) g(i)
)
SELECT window_start, event_type, count(*) AS n_events,
       round(sum(vu) / 1000000.0, 4) AS sum_value
FROM w GROUP BY 1, 2
"""


SQL_EVENTS_SESSIONS = """
WITH e AS (
  SELECT user_id, ts, event_id, CAST(round(value * 1000000) AS BIGINT) AS vu,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS BIGINT)
            AS session_id
  FROM e
)
SELECT user_id, session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(sum(vu) / 1000000.0, 4) AS sum_value
FROM s GROUP BY user_id, session_id
"""


def events_funnel(sf_dir: str, *, window_minutes: int = 60,
                  num_buckets: int = 64, first_type: str = "signup",
                  then_type: str = "purchase"):
    """Funnel / conversion detection (the ordered-sequence analytics op):
    for every ``first_type`` event, did the same user emit a
    ``then_type`` event strictly later but within ``window_minutes``?
    Per user: signup count, converted-signup count, half-up-6dp rate.

    Scale shape (the events_sessions bucket pattern): only the two event
    types survive the column-pruned read; users route to hashed buckets
    and each bucket resolves ALL its users in one vectorized pass — both
    sides get a composite key ``user_ordinal·SPAN + (ts − tmin)`` whose
    user blocks cannot overlap (SPAN > bucket time-span + window), so one
    pair of np.searchsorted calls counts each signup's in-window
    purchases with zero per-user dispatch."""
    W = np.int64(window_minutes) * 60_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])

    from .dedup import _splitmix

    def bucket(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("event_type"),
                        value_set=pa.array([first_type, then_type]))
        b = b.filter(keep)
        u = np.asarray(b.column("user_id"), np.int64)
        bk = (_splitmix(u.astype(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int64)
        return b.append_column("bucket", pa.array(bk, pa.int64()))

    def funnel(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_signups": pa.array([], pa.int64()),
            "n_conversions": pa.array([], pa.int64()),
            "conv_rate": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        u = np.asarray(g.column("user_id"), np.int64)
        ts = np.asarray(g.column("ts").cast(pa.int64()), np.int64)
        eid = np.asarray(g.column("event_id"), np.int64)
        isf = np.asarray(pc.equal(g.column("event_type"), first_type))
        uu = np.unique(u)
        ordn = np.searchsorted(uu, u)
        tmin = ts.min()
        span = np.int64(ts.max() - tmin + W + 1)
        assert uu.size < (1 << 62) // max(int(span), 1), \
            "composite funnel key would overflow int64"
        key = ordn.astype(np.int64) * span + (ts - tmin)
        sk = key[isf]
        su = u[isf]
        se = eid[isf]
        pk = np.sort(key[~isf])
        hits = (np.searchsorted(pk, sk + W, side="right")
                - np.searchsorted(pk, sk, side="right")) > 0
        if sk.size == 0:
            return empty
        order = np.lexsort((se, su))
        su, hits = su[order], hits[order]
        uniq, starts = np.unique(su, return_index=True)
        bounds = np.append(starts, su.size)
        n_sign = (bounds[1:] - bounds[:-1]).astype(np.int64)
        n_conv = np.add.reduceat(hits.astype(np.int64), starts)
        rate = np.floor(n_conv / n_sign * 1e6 + 0.5) / 1e6
        return pa.table({
            "user_id": pa.array(uniq),
            "n_signups": pa.array(n_sign),
            "n_conversions": pa.array(n_conv),
            "conv_rate": pa.array(rate)})

    from .shuffle_utils import grouped_map_groups
    return grouped_map_groups(ds.map_batches(bucket, batch_format="pyarrow"),
                              "bucket", funnel)


def events_retention(sf_dir: str, *, num_buckets: int = 64):
    """Cohort retention (the day-N retention table): cohort = epoch-day of
    a user's first event, one output row per (cohort_day, day_offset) with
    the count of users active that day.  Day index = epoch_us // 86.4e9 —
    positive, so numpy floor division == DuckDB truncating `//`.

    Scale shape: users route to hashed buckets; each bucket collapses to
    distinct (user, day), takes per-user min via one reduceat, and emits
    per-(cohort, offset) partial counts — a user contributes one row per
    active day, so partial volume is bounded by distinct (cohort, offset)
    pairs per bucket.  The merge is a measured-size grouped sum."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    from .dedup import _splitmix

    def bucket(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("user_id"), np.int64)
        day = (np.asarray(b.column("ts").cast(pa.int64()), np.int64)
               // np.int64(86_400_000_000))
        t = pa.table({"user_id": pa.array(u), "day": pa.array(day)})
        # per-batch distinct (user, day) — the only payload that shuffles
        t = t.group_by(["user_id", "day"]).aggregate([])
        bk = (_splitmix(np.asarray(t.column("user_id"), np.int64)
                        .astype(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int64)
        return t.append_column("bucket", pa.array(bk))

    def cohorts(g: pa.Table) -> pa.Table:
        u = np.asarray(g.column("user_id"), np.int64)
        d = np.asarray(g.column("day"), np.int64)
        if u.size == 0:
            return pa.table({"cohort_day": pa.array([], pa.int64()),
                             "day_offset": pa.array([], pa.int64()),
                             "n_active": pa.array([], pa.int64())})
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        # cross-batch duplicates survive the per-batch distinct — dedup
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cohort = np.minimum.reduceat(d, starts)
        seg = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        off = d - cohort[seg]
        key = cohort[seg] * np.int64(1 << 20) + off  # offsets ≪ 2^20 days
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cohort_day": pa.array(uniq // (1 << 20)),
            "day_offset": pa.array(uniq % (1 << 20)),
            "n_active": pa.array(cnt.astype(np.int64))})

    from .shuffle_utils import grouped_agg, grouped_map_groups
    parts = grouped_map_groups(
        ds.map_batches(bucket, batch_format="pyarrow"), "bucket", cohorts)
    out = grouped_agg(parts, ["cohort_day", "day_offset"],
                      [("n_active", "sum")])
    if isinstance(out, pa.Table):
        import ray.data as _rd
        return _rd.from_arrow(out)
    return out


def events_transitions(sf_dir: str, *, num_buckets: int = 64):
    """Per-user event-type transition counts (the Markov-chain statistic):
    for each user's events ordered by (ts, event_id), count consecutive
    (type_a → type_b) pairs across the whole stream.

    Scale shape: hashed user buckets; each bucket lexsorts once and reads
    the transitions off the shifted arrays (no per-user dispatch), then
    collapses to ≤ types² partial rows; the merge is a measured-size
    grouped sum over a bounded key domain."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])

    from .dedup import _splitmix

    def bucket(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("user_id"), np.int64)
        bk = (_splitmix(u.astype(np.uint64)) % np.uint64(num_buckets)) \
            .astype(np.int64)
        return b.append_column("bucket", pa.array(bk))

    def trans(g: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        u = np.asarray(g.column("user_id"), np.int64)
        ts = np.asarray(g.column("ts").cast(pa.int64()), np.int64)
        eid = np.asarray(g.column("event_id"), np.int64)
        et = np.array(g.column("event_type").to_pylist())
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        a, b = et[:-1][same], et[1:][same]
        types, inv_a = np.unique(a, return_inverse=True)
        types_b, inv_b = np.unique(b, return_inverse=True)
        key = inv_a * types_b.size + inv_b
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "type_a": pa.array(types[uniq // types_b.size]),
            "type_b": pa.array(types_b[uniq % types_b.size]),
            "n": pa.array(cnt.astype(np.int64))})

    from .shuffle_utils import grouped_agg, grouped_map_groups
    parts = grouped_map_groups(
        ds.map_batches(bucket, batch_format="pyarrow"), "bucket", trans)
    out = grouped_agg(parts, ["type_a", "type_b"], [("n", "sum")])
    if isinstance(out, pa.Table):
        import ray.data as _rd
        return _rd.from_arrow(out)
    return out
