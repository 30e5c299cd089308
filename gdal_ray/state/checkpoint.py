"""Checkpoint / resume manifest store (north_rule requirement).

The reference resumes a tiling run by stat-ing output files
(gdal2tiles.py:1492 ``options.resume``; ``gdal raster tile --resume``,
apps/gdalalg_raster_tile.cpp:289).  File-stat does not scale to object
stores, so this engine writes an explicit **manifest**: one parquet row per
finished partition with its key range, row count and lineage id.  A
restarted run anti-joins the manifest to skip finished partitions and can
audit per-partition row-count metrics.

Layout:  <root>/manifest/part-<partition_id>.parquet  (one tiny file per
finished partition — written AFTER the partition's data file, so a crash
between the two leaves the partition unclaimed and it is simply redone;
writes are idempotent because partition output paths are deterministic).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema([
    ("partition_id", pa.string()),
    ("key_min", pa.int64()),
    ("key_max", pa.int64()),
    ("row_count", pa.int64()),
    ("lineage_id", pa.string()),
    ("run_id", pa.string()),
])


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def finished_partitions(self) -> set[str]:
        done = set()
        if not os.path.isdir(self.manifest_dir):
            return done
        for f in os.listdir(self.manifest_dir):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(self.manifest_dir, f),
                                  columns=["partition_id"])
                done.update(t.column(0).to_pylist())
        return done

    def commit_partition(self, partition_id: str, key_min: int, key_max: int,
                         row_count: int, run_id: str) -> None:
        t = pa.table({
            "partition_id": [partition_id],
            "key_min": pa.array([key_min], pa.int64()),
            "key_max": pa.array([key_max], pa.int64()),
            "row_count": pa.array([row_count], pa.int64()),
            "lineage_id": [uuid.uuid4().hex],
            "run_id": [run_id],
        }, schema=MANIFEST_SCHEMA)
        path = os.path.join(self.manifest_dir, f"part-{partition_id}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic publish

    def metrics(self) -> pa.Table:
        files = [os.path.join(self.manifest_dir, f)
                 for f in sorted(os.listdir(self.manifest_dir))
                 if f.endswith(".parquet")]
        if not files:
            return MANIFEST_SCHEMA.empty_table()
        return pa.concat_tables([pq.read_table(f) for f in files])
