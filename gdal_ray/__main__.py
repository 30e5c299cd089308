"""CLI for serialized pipelines — the engine's analog of the reference's
``gdal pipeline`` app (apps/gdalalg_pipeline.cpp) over the gdalg-style
spec driver (pipelines/pipeline_spec.py):

    python -m gdal_ray 'read_parquet path=/data/img ! hillshade z_factor=2 \
                        ! write_parquet path=/out/shaded'
    python -m gdal_ray --spec pipeline.json
    python -m gdal_ray --list-stages

Owns its Ray session (guarded init + shutdown) per the driver contract —
library code never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m gdal_ray",
        description="run a serialized gdal_ray pipeline "
                    "(JSON spec or 'read ! op ! write' one-liner)")
    p.add_argument("pipeline", nargs="?",
                   help="one-liner spec: stages separated by '!', "
                        "params as key=value")
    p.add_argument("--spec", help="path to a JSON spec file")
    p.add_argument("--list-stages", action="store_true",
                   help="print the registered stage names and exit")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: let Ray decide)")
    p.add_argument("--show", type=int, default=0, metavar="N",
                   help="print the first N result rows as JSON lines")
    args = p.parse_args(argv)

    from .pipelines import pipeline_spec as PS

    if args.list_stages:
        print("\n".join(PS.registered_stages()))
        return 0
    if not args.pipeline and not args.spec:
        p.error("need a pipeline one-liner or --spec FILE")

    spec = open(args.spec).read() if args.spec else args.pipeline

    import ray
    owned = not ray.is_initialized()
    if owned:
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 log_to_driver=False, **kw)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        ds = PS.run_pipeline(spec)
        n = ds.count()
        if args.show:
            for row in ds.take(args.show):
                print(json.dumps({k: (v if isinstance(v, (int, float, str,
                                                          bool, type(None)))
                                      else f"<{type(v).__name__}:{len(v) if hasattr(v, '__len__') else '?'}>")
                                  for k, v in row.items()}))
        sys.stderr.write(f"[gdal_ray] pipeline done: {n} rows\n")
    finally:
        if owned:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
