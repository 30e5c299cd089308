"""Serialized pipeline spec / stage registry (the gdalg analog,
frmts/gdalg/gdalgdriver.cpp + apps/gdalalg_pipeline.cpp)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.core import geom, wkb
from gdal_ray.pipelines.pipeline_spec import (parse_pipeline, register,
                                              registered_stages, run_pipeline)


def _polys_parquet(tmp_path):
    import pyarrow.parquet as pq
    rows = []
    for i in range(8):
        x0 = i * 5.0
        ring = np.array([[x0, 0], [x0 + 3, 0], [x0 + 3, 2], [x0, 2], [x0, 0]])
        rows.append(wkb.dumps({"type": "Polygon", "rings": [ring]}))
    t = pa.table({"fid": pa.array(range(8), pa.int64()),
                  "wkb": pa.array(rows, pa.binary())})
    p = str(tmp_path / "polys.parquet")
    pq.write_table(t, p)
    return p


def test_json_spec_runs_vector_chain(tmp_path, ray_session):
    path = _polys_parquet(tmp_path)
    spec = {"steps": [
        {"op": "read_parquet", "path": path},
        {"op": "centroids"},
        {"op": "area"},
        {"op": "select", "columns": ["fid", "cx", "cy", "area"]},
        {"op": "sort", "key": "fid"},
    ]}
    rows = run_pipeline(spec).take_all()
    assert len(rows) == 8
    assert rows[0]["cx"] == pytest.approx(1.5)
    assert rows[0]["area"] == pytest.approx(6.0)
    assert rows[3]["cx"] == pytest.approx(15.0 + 1.5)


def test_cli_grammar_and_json_string(tmp_path, ray_session):
    path = _polys_parquet(tmp_path)
    line = f"read_parquet path={path} ! area ! select columns=[\"fid\",\"area\"] ! limit n=3"
    spec = parse_pipeline(line)
    assert [s["op"] for s in spec["steps"]] == ["read_parquet", "area",
                                               "select", "limit"]
    rows = run_pipeline(line).take_all()
    assert len(rows) == 3 and rows[0]["area"] == pytest.approx(6.0)
    # same via a JSON string
    rows2 = run_pipeline(json.dumps(spec)).take_all()
    assert len(rows2) == 3


def test_write_parquet_sink(tmp_path, ray_session):
    path = _polys_parquet(tmp_path)
    out = str(tmp_path / "out")
    run_pipeline({"steps": [
        {"op": "read_parquet", "path": path},
        {"op": "area"},
        {"op": "write_parquet", "path": out},
    ]})
    import ray.data
    back = ray.data.read_parquet(out)
    assert back.count() == 8


def test_user_registered_stage(tmp_path, ray_session):
    path = _polys_parquet(tmp_path)

    @register("double_fid")
    def _double(ds):
        return ds.map_batches(
            lambda b: b.set_column(b.column_names.index("fid"), "fid",
                                   pa.compute.multiply(b.column("fid"), 2)),
            batch_format="pyarrow")

    assert "double_fid" in registered_stages()
    rows = run_pipeline({"steps": [
        {"op": "read_parquet", "path": path},
        {"op": "double_fid"},
        {"op": "sort", "key": "fid"},
    ]}).take_all()
    assert rows[-1]["fid"] == 14


def test_unknown_stage_raises(ray_session):
    with pytest.raises(ValueError, match="unknown pipeline stage"):
        run_pipeline({"steps": [{"op": "nope"}]})


def test_tee_and_materialize_stages(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from gdal_ray.pipelines import pipeline_spec as PS
    ds = ray.data.range(100).map_batches(
        lambda b: {"id": b["id"], "v": b["id"] * 2}, batch_format="numpy")
    tee_dir = str(tmp_path / "tee_out")
    ds2 = PS._REGISTRY["tee"](ds, path=tee_dir)
    ds3 = PS._REGISTRY["materialize"](ds2)
    assert ds3.count() == 100                  # stream continues
    snap = pq.read_table(tee_dir)              # snapshot landed on disk
    assert snap.num_rows == 100
    assert sorted(snap.column("v").to_pylist()) == sorted(
        r["v"] for r in ds3.take_all())


def test_trainingdata_stages_registered(ray_session):
    import ray.data

    from gdal_ray.pipelines.pipeline_spec import registered_stages, run_pipeline
    regs = registered_stages()
    for name in ("exact_dedup", "minhash_pairs", "simhash_pairs",
                 "ngram_jaccard_pairs", "embedding_neardup", "langid",
                 "text_quality", "token_count", "fingerprint", "filter",
                 "sql_select", "tee", "materialize", "buffer",
                 "simplify_coverage", "read_flatgeobuf", "fill_nodata_idw"):
        assert name in regs, name
    # end-to-end: dedup a tiny corpus through the spec surface
    import pyarrow as pa
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["same text", "same text", "other words"]),
    }))
    from gdal_ray.pipelines import pipeline_spec as PS
    out = PS._REGISTRY["exact_dedup"](ds)
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 3]


def test_cli_main_end_to_end(ray_session, tmp_path):
    """python -m gdal_ray — the `gdal pipeline` app analog
    (apps/gdalalg_pipeline.cpp): one-liner spec through the stage
    registry, --list-stages, and the multimodal image_features stage;
    owns no Ray session when one is already live."""
    import pyarrow.parquet as pq

    from gdal_ray.__main__ import main
    from gdal_ray.core import fixtures

    src = str(tmp_path / "imgs.parquet")
    out = str(tmp_path / "feat")
    pq.write_table(fixtures.images_table(6), src)
    rc = main([f"read_parquet path={src} ! image_features "
               f"! write_parquet path={out}"])
    assert rc == 0
    t = pq.read_table(out)
    assert t.num_rows == 6
    assert {"image_id", "mean", "std", "ahash"} <= set(t.column_names)
    assert main(["--list-stages"]) == 0
    from gdal_ray.pipelines.pipeline_spec import registered_stages
    assert {"image_features", "audio_decode", "video_frames"} \
        <= set(registered_stages())


def test_connected_components_and_tfidf_stages(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pairs = pa.table({"id_a": pa.array([0, 1, 5], pa.int64()),
                      "id_b": pa.array([1, 2, 6], pa.int64())})
    p = str(tmp_path / "pairs.parquet")
    pq.write_table(pairs, p)
    rows = run_pipeline(f"read_parquet path={p} ! connected_components") \
        .take_all()
    comp = {r["node"]: r["component"] for r in rows}
    assert comp == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["aa bb aa", "bb cc"], pa.string())})
    d = str(tmp_path / "docs.parquet")
    pq.write_table(docs, d)
    rows = run_pipeline(f"read_parquet path={d} ! tfidf_top_term").take_all()
    top = {r["doc_id"]: r["token"] for r in rows}
    # 'aa' appears only in doc 1 (tf=2, df=1); 'cc' only in doc 2
    assert top == {1: "aa", 2: "cc"}


def test_select_stage_accepts_comma_string(ray_session):
    """The one-liner CLI passes columns as a comma-joined string —
    list("a,b") would explode into characters (found driving the CLI)."""
    import pyarrow as pa
    import ray

    from gdal_ray.pipelines.pipeline_spec import _REGISTRY

    ds = ray.data.from_arrow(pa.table({"a": [1], "b": [2], "c": [3]}))
    out = _REGISTRY["select"](ds, columns="a, c")
    assert out.schema().names == ["a", "c"]
    out = _REGISTRY["select"](ds, columns=["b"])
    assert out.schema().names == ["b"]
