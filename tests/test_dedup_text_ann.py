"""Dedup / text-analysis / similarity-search pipelines vs brute-force
oracles on the driver-provided documents + embeddings tables."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.pipelines import ann as ANN
from gdal_ray.pipelines import dedup as DD
from gdal_ray.pipelines import text as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    t = pq.read_table(f"{SF}/documents.parquet")
    # append exact duplicates + near duplicates for dedup coverage
    n = t.num_rows
    texts = t.column("text").to_pylist()
    extra_text = [texts[0], texts[1], texts[2] + " extra tail words here"]
    extra = pa.table({
        "doc_id": pa.array([10_000, 10_001, 10_002], pa.int64()),
        "text": pa.array(extra_text),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["dup"] * 3),
        "n_chars": pa.array([len(x) for x in extra_text], pa.int64()),
    })
    return pa.concat_tables([t, extra])


@pytest.fixture(scope="module")
def emb_tbl():
    return pq.read_table(f"{SF}/embeddings.parquet")


def test_exact_dedup(ray_session, docs_tbl):
    import ray
    out = DD.exact_dedup(ray.data.from_arrow(docs_tbl)).take_all()
    got = sorted(r["doc_id"] for r in out)
    # oracle: min doc_id per text
    by_text = {}
    for did, text in zip(docs_tbl.column("doc_id").to_pylist(),
                         docs_tbl.column("text").to_pylist()):
        by_text[text] = min(by_text.get(text, did), did)
    assert got == sorted(by_text.values())
    assert len(got) < docs_tbl.num_rows  # the injected dups collapsed


def test_minhash_lsh_driver_oracle(docs_tbl):
    pairs = DD.minhash_lsh_verified_pairs(docs_tbl, threshold=0.6)
    ids = {(a, b) for a, b, _ in pairs}
    # injected exact dups must be found
    texts = docs_tbl.column("text").to_pylist()
    d0 = docs_tbl.column("doc_id").to_pylist()[0]
    assert (d0, 10_000) in ids
    # near-dup (prefix + tail) should be found at 0.6
    assert any(b == 10_002 for _, b in ids)
    # verify precision: every reported pair truly >= threshold by jaccard
    for a, b, j in pairs:
        assert j >= 0.6


def test_minhash_lsh_distributed_matches_driver(ray_session, docs_tbl):
    import ray
    got = DD.minhash_lsh_pairs(ray.data.from_arrow(docs_tbl), threshold=0.6).take_all()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got}
    expect = {(a, b) for a, b, _ in DD.minhash_lsh_verified_pairs(docs_tbl, threshold=0.6)}
    # distributed variant uses signature-estimate verification; candidate
    # sets identical, verification may differ slightly near threshold —
    # exact dup pairs must always be present, no pair may be duplicated
    assert len(got) == len(got_pairs)
    d0 = docs_tbl.column("doc_id").to_pylist()[0]
    assert (d0, 10_000) in got_pairs
    assert got_pairs >= {p for p in expect if p[1] in (10_000, 10_001)}


def test_simhash_pairs(ray_session, docs_tbl):
    import ray
    out = DD.simhash_pairs(ray.data.from_arrow(docs_tbl), max_hamming=3).take_all()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    # exactly-once
    assert len(out) == len(pairs)
    # exact duplicates have hamming 0 and must appear
    d0 = docs_tbl.column("doc_id").to_pylist()[0]
    d1 = docs_tbl.column("doc_id").to_pylist()[1]
    assert pairs[(d0, 10_000)] == 0
    assert pairs[(d1, 10_001)] == 0
    # oracle: brute-force simhash hamming over all pairs
    ids = docs_tbl.column("doc_id").to_pylist()
    hs = {i: DD.simhash64(t) for i, t in zip(ids, docs_tbl.column("text").to_pylist())}
    expect = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((ids[i], ids[j]))
            if a == b:
                continue
            d = bin(hs[a] ^ hs[b]).count("1")
            if d <= 3:
                expect[(a, b)] = d
    assert pairs == expect


def test_embedding_neardup(ray_session, emb_tbl):
    import ray
    # add a near-identical vector for a guaranteed hit
    v0 = np.array(emb_tbl.column("embedding")[0].as_py(), dtype=np.float64)
    extra = pa.table({
        "vec_id": pa.array([99_999], pa.int64()),
        "embedding": pa.array([(v0 + 1e-6).tolist()],
                              emb_tbl.schema.field("embedding").type),
        "label": pa.array([0], pa.int32()),
    })
    tbl = pa.concat_tables([emb_tbl, extra])
    out = DD.embedding_neardup_pairs(ray.data.from_arrow(tbl), threshold=0.999).take_all()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    v0_id = emb_tbl.column("vec_id")[0].as_py()
    assert (v0_id, 99_999) in pairs
    for r in out:
        assert r["cosine"] >= 0.999


def test_embedding_neardup_banded_recall_095(ray_session):
    """Banded hyperplane LSH (B=8 bands × r=8 planes) vs brute force at
    threshold 0.95: recall ≥ 0.9 on planted near-dup pairs, exact precision,
    exactly-once emission."""
    import ray
    rng = np.random.default_rng(7)
    dim, n_base, n_pairs = 32, 300, 40
    base = rng.standard_normal((n_base, dim))
    # planted near-dups: small perturbations → cosine just above 0.95
    mates = base[:n_pairs] + 0.18 * rng.standard_normal((n_pairs, dim))
    V = np.vstack([base, mates])
    ids = list(range(len(V)))
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([v.tolist() for v in V],
                                          pa.list_(pa.float64()))})
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    ii, jj = np.nonzero(np.triu(S >= 0.95, k=1))
    expect = {(int(a), int(b)) for a, b in zip(ii, jj)}
    assert len(expect) >= 20  # the planting actually produced pairs
    out = DD.embedding_neardup_pairs(ray.data.from_arrow(tbl),
                                     threshold=0.95).take_all()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert len(got) == len(out)          # exactly-once
    assert got <= expect                 # exact precision (verified in-bucket)
    recall = len(got & expect) / len(expect)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9"


def test_token_and_quality(docs_tbl):
    out = TX.token_count(docs_tbl.slice(0, 50))
    for i in range(50):
        t = docs_tbl.column("text")[i].as_py()
        assert out.column("n_ws_tokens")[i].as_py() == len(t.split())
        assert out.column("n_chars_calc")[i].as_py() == len(t)
    q = TX.quality_score(docs_tbl.slice(0, 20))
    for c in ("mean_word_len", "alpha_ratio", "quality"):
        assert c in q.column_names
    ar = q.column("alpha_ratio").to_pylist()
    assert all(0.0 <= v <= 1.0 for v in ar)


def test_langid_deterministic(docs_tbl):
    out1 = TX.detect_language(docs_tbl.slice(0, 100))
    out2 = TX.detect_language(docs_tbl.slice(0, 100))
    assert out1.column("lang_pred").to_pylist() == out2.column("lang_pred").to_pylist()
    en = TX.detect_language(pa.table({"doc_id": [1], "text": ["the cat is on the mat and it was good"]}))
    assert en.column("lang_pred")[0].as_py() == "en"


def test_fingerprint_stable_and_discriminative(docs_tbl):
    a = TX.fingerprint(docs_tbl.slice(0, 30))
    b = TX.fingerprint(docs_tbl.slice(0, 30))
    assert a.column("fingerprint").to_pylist() == b.column("fingerprint").to_pylist()
    fps = a.column("fingerprint").to_pylist()
    assert len(set(fps)) > 25  # near-unique on distinct docs


def test_brute_force_topk_matches_oracle(ray_session, emb_tbl):
    import ray
    Q = np.array(emb_tbl.column("embedding").to_pylist()[:5], dtype=np.float64)
    qids = [f"q{i}" for i in range(5)]
    out = ANN.brute_force_topk(ray.data.from_arrow(emb_tbl), Q, qids, k=10,
                               concurrency=2).take_all()
    V = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float64)
    ids = emb_tbl.column("vec_id").to_pylist()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Vn @ Qn.T
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r[ "vec_id"], r["cosine"]))
    for qi, qid in enumerate(qids):
        col = S[:, qi]
        expect = sorted(range(len(ids)), key=lambda j: (-col[j], ids[j]))[:10]
        got = [g[1] for g in sorted(by_q[qid])]
        assert got == [ids[j] for j in expect]


def test_ivf_topk_recall(ray_session, emb_tbl):
    import ray
    Q = np.array(emb_tbl.column("embedding").to_pylist()[:3], dtype=np.float64)
    qids = [f"q{i}" for i in range(3)]
    exact = ANN.brute_force_topk(ray.data.from_arrow(emb_tbl), Q, qids, k=5).take_all()
    approx = ANN.ivf_topk(ray.data.from_arrow(emb_tbl), Q, qids, k=5,
                          n_centroids=8, nprobe=4).take_all()
    ex = {}
    ap = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.6  # nprobe=4/8 buckets


def test_image_feature_stage(ray_session):
    import ray
    from gdal_ray.core import fixtures
    from gdal_ray.stages.multimodal import ImageFeatureStage
    ds = ray.data.from_arrow(fixtures.images_table(8))
    out = ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                         batch_size=4, concurrency=1).take_all()
    assert len(out) == 8
    assert all(0 <= r["mean"] <= 255 for r in out)
    assert all(sum(r["hist"]) > 0 for r in out)


def test_image_feature_quarantine_vp8(ray_session):
    """A web-scraped catalog containing one interchange lossy `VP8 ` file
    must complete with that row FLAGGED (decode_error), not thrown —
    reference drivers report per-file 'cannot open', they don't abort the
    dataset (frmts/webp/webpdataset.cpp open path)."""
    import struct

    import pyarrow as pa
    import pytest
    import ray

    from gdal_ray.core import codecs, fixtures
    from gdal_ray.stages.multimodal import ImageFeatureStage

    tbl = fixtures.images_table(4)
    vp8 = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
           + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(codecs.CapabilityError):
        codecs.decode(vp8, "webp")
    mixed = pa.table({
        "image_id": pa.array(tbl.column("image_id").to_pylist() + ["img_vp8"]),
        "bytes": pa.array(tbl.column("bytes").to_pylist() + [vp8]),
        "fmt": pa.array(tbl.column("fmt").to_pylist() + ["webp"]),
    })
    ds = ray.data.from_arrow(mixed)
    # default on_error="raise" fails the batch (corrupt-data discipline)
    with pytest.raises(Exception):
        ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                       batch_size=8, concurrency=1).take_all()
    out = ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                         fn_constructor_kwargs={"on_error": "quarantine"},
                         batch_size=8, concurrency=1).take_all()
    assert len(out) == 5
    flagged = [r for r in out if r["decode_error"]]
    assert len(flagged) == 1
    assert flagged[0]["image_id"] == "img_vp8"
    assert flagged[0]["decode_error"] == "vp8_interchange_lossy"
    assert flagged[0]["mean"] is None
    assert all(r["mean"] is not None for r in out if not r["decode_error"])


def test_ngram_jaccard_pairs(ray_session, docs_tbl):
    """Exact n-gram Jaccard dedup: same candidates as minhash-LSH, but the
    emitted similarity is the TRUE shingle Jaccard (brute-force oracle)."""
    import ray

    out = DD.ngram_jaccard_pairs(ray.data.from_arrow(docs_tbl),
                                 threshold=0.6).take_all()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert len(got) == len(out)              # exactly-once
    expect = {(a, b): j for a, b, j in
              DD.minhash_lsh_verified_pairs(docs_tbl, threshold=0.6)}
    assert got == pytest.approx(expect)      # identical pairs AND values
    d0 = docs_tbl.column("doc_id").to_pylist()[0]
    assert got[(d0, 10_000)] == 1.0          # exact dup -> jaccard exactly 1


def test_audio_decode_stage_real_wav(ray_session):
    """AudioDecodeStage decodes real PCM WAV payloads (stdlib wave):
    a 440 Hz sine at 8 kHz has rms 1/sqrt(2) of its amplitude."""
    import io
    import struct
    import wave

    import ray.data

    from gdal_ray.stages.multimodal import AudioDecodeStage
    sr, secs = 8000, 0.5
    t = np.arange(int(sr * secs)) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())
    tbl = pa.table({"audio_id": pa.array(["a0"]),
                    "bytes": pa.array([buf.getvalue()], pa.binary())})
    out = ray.data.from_arrow(tbl).map_batches(
        AudioDecodeStage, batch_format="pyarrow", concurrency=1).take_all()[0]
    assert out["sample_rate"] == sr
    assert out["n_samples"] == int(sr * secs)
    assert abs(out["duration_s"] - secs) < 1e-9
    assert abs(out["rms"] - 0.5 / np.sqrt(2)) < 1e-3


def test_train_centroids_order_insensitive(ray_session, emb_tbl):
    """VERDICT r3 #3: the IVF training sample must be a content-hashed
    sample, not limit() — centroids identical under reversed input order."""
    import ray
    n = emb_tbl.num_rows
    rev = emb_tbl.take(pa.array(np.arange(n - 1, -1, -1)))
    C1 = ANN.train_centroids(ray.data.from_arrow(emb_tbl), 8, sample_rows=64)
    C2 = ANN.train_centroids(ray.data.from_arrow(rev), 8, sample_rows=64)
    np.testing.assert_allclose(C1, C2, rtol=0, atol=0)
    # and the sample is genuinely sub-sampled when sample_rows < n
    assert C1.shape == (8, emb_tbl.column("embedding").type.list_size
                        if hasattr(emb_tbl.column("embedding").type, "list_size")
                        else len(emb_tbl.column("embedding")[0].as_py()))


def test_video_frame_sample_stage(ray_session):
    """MJPEG-in-AVI frame sampling: deterministic synthetic AVI → sampled
    frames as real PNGs, 1 frame per second at 10 fps → every 10th frame."""
    import ray
    from gdal_ray.core import codecs
    from gdal_ray.stages.multimodal import (VideoFrameSampleStage,
                                            build_mjpeg_avi, parse_mjpeg_avi)
    rng = np.random.default_rng(7)
    frames = []
    for f in range(25):
        img = np.zeros((32, 48, 3), np.uint8)
        img[:, :, 0] = (f * 10) % 256          # frame-varying channel
        img[8:24, 8:40, 1] = 200
        frames.append(img)
    avi = build_mjpeg_avi(frames, fps=10.0, quality=95)
    fps, jpegs = parse_mjpeg_avi(avi)
    assert fps == 10.0 and len(jpegs) == 25
    ds = ray.data.from_arrow(pa.table({
        "video_id": pa.array(["v0", "v1"]),
        "bytes": pa.array([avi, avi], pa.binary())}))
    out = ds.map_batches(VideoFrameSampleStage(every_n_seconds=1.0),
                         batch_format="pyarrow", batch_size=2).take_all()
    per_vid = {}
    for r in out:
        per_vid.setdefault(r["video_id"], []).append(r)
    assert set(per_vid) == {"v0", "v1"}
    for rows in per_vid.values():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 10, 20]
        for r in rows:
            img = codecs.decode_png(r["frame_png"])
            assert img.shape == (32, 48, 3)
            # frame 10 has red channel ~100 (JPEG is lossy: tolerance)
            if r["frame_idx"] == 10:
                assert abs(float(img[:, :, 0].mean()) - 100) < 12
    # non-AVI payload raises the honest capability boundary
    with pytest.raises(NotImplementedError):
        parse_mjpeg_avi(b"\x00" * 64)


# ---------- connected components (pairs -> clusters) ----------

def _uf_components(a, b):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a, b):
        x, y = int(x), int(y)
        if x == y:
            continue
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    nodes = sorted({int(v) for x, y in zip(a, b) if x != y for v in (x, y)})
    import collections
    members = collections.defaultdict(list)
    for n in nodes:
        members[find(n)].append(n)
    out = {}
    for ms in members.values():
        mn = min(ms)
        for n in ms:
            out[n] = mn
    return out


def _cc_dict(pairs_tbl, **kw):
    import ray
    out = DD.connected_components(ray.data.from_arrow(pairs_tbl), **kw)
    t = out.to_pandas()
    return dict(zip(t.node.astype(int), t.component.astype(int)))


def test_connected_components_random_vs_union_find(ray_session):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 3000, 4000)
    b = rng.integers(0, 3000, 4000)
    tbl = pa.table({"id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(b, pa.int64())})
    expect = _uf_components(a, b)
    got = _cc_dict(tbl)
    assert got == expect


def test_connected_components_distributed_matches_driver(ray_session):
    """Path parity: driver_limit=0 forces the Hash-to-Min rounds."""
    rng = np.random.default_rng(13)
    a = rng.integers(0, 800, 900)
    b = rng.integers(0, 800, 900)
    tbl = pa.table({"id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(b, pa.int64())})
    assert _cc_dict(tbl, driver_limit=0) == _cc_dict(tbl)


def test_connected_components_chain_worst_case(ray_session):
    """A single long chain maximizes diameter — the Hash-to-Min stress."""
    n = 4000
    tbl = pa.table({"id_a": pa.array(np.arange(n - 1), pa.int64()),
                    "id_b": pa.array(np.arange(1, n), pa.int64())})
    for dl in (10**9, 0):
        got = _cc_dict(tbl, driver_limit=dl)
        assert len(got) == n and set(got.values()) == {0}


def test_connected_components_clusters_simhash_pairs(ray_session, docs_tbl):
    """End-to-end: simhash pairs -> components == union-find over the
    same pairs (the dedup keep-one-per-cluster step)."""
    import ray
    pairs = DD.simhash_pairs(ray.data.from_arrow(docs_tbl), max_hamming=3)
    ptbl = pairs.to_pandas()
    if len(ptbl) == 0:
        pytest.skip("fixture produced no near-dup pairs")
    expect = _uf_components(ptbl.id_a.to_numpy(), ptbl.id_b.to_numpy())
    got = _cc_dict(pa.table({"id_a": pa.array(ptbl.id_a, pa.int64()),
                             "id_b": pa.array(ptbl.id_b, pa.int64())}))
    assert got == expect


# ---------- tf-idf top term ----------

def test_tfidf_top_term_brute_force(ray_session, docs_tbl):
    import math
    import ray
    docs = ray.data.from_arrow(docs_tbl)
    got = TX.tfidf_top_term(docs).to_pandas()
    texts = dict(zip(docs_tbl.column("doc_id").to_pylist(),
                     docs_tbl.column("text").to_pylist()))
    n = len(texts)
    from collections import Counter
    df = Counter()
    tfs = {}
    for d, t in texts.items():
        c = Counter(t.split())
        tfs[d] = c
        df.update(c.keys())
    expect = {}
    for d, c in tfs.items():
        if not c:
            continue
        best = None
        for tok, tf in c.items():
            s = math.floor(tf * math.log(n / df[tok]) * 1e6 + 0.5) / 1e6
            k = (-s, tok)
            if best is None or k < best[0]:
                best = (k, tok, s)
        expect[d] = (best[1], best[2])
    got_map = {int(r.doc_id): (r.token, r.tfidf) for r in got.itertuples()}
    assert got_map == expect


def test_tfidf_distributed_matches_driver(ray_session, docs_tbl):
    """Path parity: monkeypatch-free — shrink grouped_map_groups' driver
    window via a tiny wrapper dataset and compare to the default path."""
    import ray
    from gdal_ray.pipelines import shuffle_utils as SU
    docs = ray.data.from_arrow(docs_tbl)
    base = TX.tfidf_top_term(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    orig = SU.grouped_map_groups

    def forced(ds, key, fn, driver_limit=200_000):
        return orig(ds, key, fn, driver_limit=0)

    SU.grouped_map_groups = forced
    try:
        forced_out = TX.tfidf_top_term(docs).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    finally:
        SU.grouped_map_groups = orig
    import pandas as pd
    pd.testing.assert_frame_equal(base, forced_out, check_dtype=False)


def test_contamination_semantics(ray_session):
    """Planted split: an exact copy of a train doc scores 1.0; a doc over a
    disjoint alphabet scores 0.0; containment (test substring of a longer
    train doc) also scores 1.0 — asymmetric by design."""
    import ray.data as rd
    from gdal_ray.pipelines.dedup import _splitmix, contamination

    thr = np.uint64((1 << 64) // 10 - 1)
    ids = np.arange(0, 400, dtype=np.int64)
    flags = _splitmix(ids.astype(np.uint64)) <= thr
    test_ids = ids[flags]
    train_ids = ids[~flags]
    assert test_ids.size >= 3 and train_ids.size >= 3

    long_train = "the quick brown fox jumps over the lazy dog again and again"
    texts = {}
    for i in train_ids:
        texts[int(i)] = long_train if i == train_ids[0] else f"train filler document number {i} with ordinary words"
    # exact copy, contained substring, disjoint alphabet
    texts[int(test_ids[0])] = long_train
    texts[int(test_ids[1])] = "quick brown fox jumps"
    texts[int(test_ids[2])] = "XXXXQQQQZZZZXXXXQQQQZZZZ"
    for i in test_ids[3:]:
        texts[int(i)] = f"test filler document number {i} with ordinary words"

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }))
    res = contamination(docs, k=7)
    df = (res.to_pandas() if hasattr(res, "to_pandas") else res.to_pandas())
    df = df.set_index("doc_id")
    assert set(df.index) == set(int(i) for i in test_ids)
    assert df.loc[int(test_ids[0]), "contamination"] == 1.0
    assert df.loc[int(test_ids[1]), "contamination"] == 1.0
    assert df.loc[int(test_ids[2]), "contamination"] < 0.1
    # totals: distinct 7-gram count of the exact copy matches numpy
    from gdal_ray.pipelines.dedup import shingle_hashes
    assert df.loc[int(test_ids[0]), "n_shingles"] == shingle_hashes(long_train, 7).size


def test_sequence_pack_invariance_and_spanning(ray_session):
    """Packing is partition-invariant (the carry scheme owns the global
    order) and a doc longer than capacity spans multiple bins."""
    import ray.data as rd
    from gdal_ray.pipelines.text import sequence_pack

    rng = np.random.default_rng(7)
    n = 300
    texts = [" ".join("w" * 1 for _ in range(int(l)))
             for l in rng.integers(1, 40, n)]
    texts[120] = " ".join(["tok"] * 300)   # spans >2 bins at capacity 128
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})

    a = sequence_pack(rd.from_arrow(tbl), capacity=128) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = sequence_pack(rd.from_arrow(tbl).repartition(13), capacity=128) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    w = np.array([max(1, len(t.split())) for t in texts], np.int64)
    start = np.concatenate([[0], np.cumsum(w)[:-1]])
    assert (a["start_off"].to_numpy() == start).all()
    row = a.set_index("doc_id").loc[120]
    assert row["n_bins"] >= 3 and row["bin_last"] - row["bin_first"] + 1 == row["n_bins"]


def test_kmeans_partition_invariance_and_quality(ray_session, emb_tbl):
    """k-means assignments are partition-invariant (the per-iteration
    merge is order-free integer arithmetic) and clusters align with the
    generator's labels on the blob-structured embeddings."""
    import ray.data as rd
    from gdal_ray.pipelines.ann import kmeans_assign

    a = kmeans_assign(rd.from_arrow(emb_tbl), k=4, iters=3) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = kmeans_assign(rd.from_arrow(emb_tbl).repartition(7), k=4, iters=3) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)

    # Lloyd monotonicity: total squared distance never increases with
    # more iterations (the one guarantee k-means gives)
    c0 = kmeans_assign(rd.from_arrow(emb_tbl), k=4, iters=0) \
        .to_pandas()["dist2"].sum()
    c3 = a["dist2"].sum()
    assert c3 <= c0
    assert a["cluster"].nunique() >= 2  # init spread keeps >1 cluster live


def test_contamination_and_seqpack_path_parity(ray_session, docs_tbl):
    """driver_limit=0 forces grouped_agg's distributed branch — both paths
    must emit identical tables (the distributed-branch pin the small-sf
    suite would otherwise never execute)."""
    import ray.data as rd
    from gdal_ray.pipelines.dedup import contamination
    from gdal_ray.pipelines.text import sequence_pack

    ds = rd.from_arrow(docs_tbl)
    def norm(x):
        df = x.to_pandas() if hasattr(x, "to_pandas") else x
        return df.sort_values("doc_id").reset_index(drop=True)
    a = norm(contamination(ds, k=7))
    b = norm(contamination(ds, k=7, driver_limit=0))
    assert a.equals(b)
    c = norm(sequence_pack(ds, capacity=128))
    d = norm(sequence_pack(ds, capacity=128, driver_limit=0))
    assert c.equals(d)


def test_chunk_tokens_semantics():
    """Window/stride geometry, tail chunks, and the empty-doc row pin."""
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["a b c d e f g", "x", ""])})
    out = TX.chunk_tokens(tbl, window=3, stride=2)
    rows = list(zip(out.column("doc_id").to_pylist(),
                    out.column("chunk_id").to_pylist(),
                    out.column("tok_start").to_pylist(),
                    out.column("n_chunk_tokens").to_pylist(),
                    out.column("chunk_text").to_pylist()))
    assert rows == [
        (1, 0, 0, 3, "a b c"), (1, 1, 2, 3, "c d e"),
        (1, 2, 4, 3, "e f g"), (1, 3, 6, 1, "g"),
        (2, 0, 0, 1, "x"),
        (3, 0, 0, 0, ""),       # zero-token doc keeps one empty chunk
    ]


def _lev_brute(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_lev_band_matches_brute_force():
    """Ukkonen band DP == full DP for dist <= D; band-clipped values stay
    > D (the only contract callers rely on).  Covers empty strings, equal
    strings, pure inserts/deletes and random mutation mixes."""
    import random
    rng = random.Random(11)
    cases = [("", "", 3), ("abc", "", 3), ("", "abc", 3),
             ("kitten", "sitting", 3), ("abcdef", "abcdef", 2)]
    for _ in range(300):
        D = rng.choice([1, 2, 3, 5, 8])
        a = "".join(rng.choice("abz") for _ in range(rng.randint(0, 24)))
        b = list(a)
        for _ in range(rng.randint(0, 12)):
            op = rng.choice("ids")
            if op == "i":
                b.insert(rng.randint(0, len(b)), rng.choice("abz"))
            elif b:
                p = rng.randrange(len(b))
                if op == "d":
                    del b[p]
                else:
                    b[p] = rng.choice("abz")
        cases.append((a, "".join(b), D))
    for a, b, D in cases:
        if abs(len(a) - len(b)) > D:
            continue
        L = max(len(a), len(b), 1)
        A = np.zeros((1, L), np.uint8)
        A[0, :len(a)] = np.frombuffer(a.encode(), np.uint8)
        B = np.zeros((1, L), np.uint8)
        B[0, :len(b)] = np.frombuffer(b.encode(), np.uint8)
        d = DD._lev_band(A, np.array([len(a)]), B, np.array([len(b)]), D)[0]
        t = _lev_brute(a, b)
        if t <= D:
            assert d == t, (a, b, D, d, t)
        else:
            assert d > D, (a, b, D, d, t)


def test_fuzzy_pairs_finds_planted_near_copies(ray_session, docs_tbl):
    import ray.data
    docs = ray.data.from_arrow(docs_tbl)
    pairs = DD.fuzzy_pairs(docs, max_dist=8, prefix_len=96).to_pandas()
    assert len(pairs) > 0
    assert (pairs["dist"] <= 8).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    # every reported pair's true prefix distance matches the brute DP
    texts = {int(i): t[:96] for i, t in
             zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist())}
    for _, r in pairs.iterrows():
        assert _lev_brute(texts[int(r.id_a)], texts[int(r.id_b)]) == int(r.dist)


def test_pagerank_distributed_matches_driver(ray_session):
    """Path parity: the distributed bucket-round PageRank (driver_limit=0)
    must equal the exact driver bincount pass on the same edge set."""
    import ray.data
    from gdal_ray.pipelines.graph import pagerank
    rng = np.random.default_rng(5)
    n = 400
    src = np.repeat(np.arange(n, dtype=np.int64), 3)
    dst = (src * src + src * np.tile(np.array([31, 73, 137], np.int64), n)
           + 7) % n
    # add some dangling/dst-only structure: drop out-edges of 30 nodes
    keep = ~np.isin(src, rng.choice(n, 30, replace=False))
    edges = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    ds = ray.data.from_arrow(edges)
    a = pagerank(ds, iters=3).to_pandas().sort_values("node").reset_index(drop=True)
    b = pagerank(ds, iters=3, driver_limit=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a["node"].values == b["node"].values).all()
    assert (a["score_q"].values == b["score_q"].values).all()


def test_upsert_latest_paths_and_invariance(ray_session):
    """upsert_latest: distributed grouped path == driver path, and the
    result is partition-invariant (latest version wins per key)."""
    import ray.data
    from gdal_ray.pipelines.dedup import upsert_latest

    rng = np.random.default_rng(21)
    n = 5000
    k = rng.integers(0, 800, size=n).astype(np.int64)
    ver = rng.integers(0, 5, size=n).astype(np.int64)
    # make (key, version) unique so the winning row is well-defined
    seen = {}
    keep = np.zeros(n, bool)
    for i in range(n):
        if (int(k[i]), int(ver[i])) not in seen:
            seen[(int(k[i]), int(ver[i]))] = True
            keep[i] = True
    k, ver = k[keep], ver[keep]
    payload = k * 1000 + ver
    tbl = pa.table({"k": pa.array(k), "ver": pa.array(ver),
                    "p": pa.array(payload)})

    def norm(ds):
        df = ds.to_pandas().sort_values("k").reset_index(drop=True)
        return list(map(tuple, df[["k", "ver", "p"]].to_numpy()))

    expect = {}
    for kk, vv, pp in zip(k, ver, payload):
        if kk not in expect or vv > expect[kk][1]:
            expect[kk] = (int(kk), int(vv), int(pp))
    exp = sorted(expect.values())

    for parts in (2, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        assert norm(upsert_latest(ds, "k", "ver")) == exp
        assert norm(upsert_latest(ds, "k", "ver", driver_limit=0)) == exp


def test_triangles_brute_and_path_parity(ray_session):
    """graph.triangles vs an O(n^3) brute-force reference on a random
    graph, and distributed (driver_limit=0) == driver path."""
    from itertools import combinations

    import ray.data

    from gdal_ray.pipelines.graph import triangles

    rng = np.random.default_rng(11)
    n, m = 70, 380
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    adj = {i: set() for i in range(n)}
    for a, b in zip(u, v):
        if a != b:
            adj[int(min(a, b))].add(int(max(a, b)))
            adj[int(max(a, b))].add(int(min(a, b)))
    cnt = {}
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                cnt[x] = cnt.get(x, 0) + 1
    expect = {k: v for k, v in cnt.items() if v > 0}

    ds = ray.data.from_arrow(pa.table({"src": pa.array(u),
                                       "dst": pa.array(v)}))
    a = triangles(ds).to_pandas()
    b = triangles(ds, driver_limit=0).to_pandas()
    got_a = dict(zip(a["node"].astype(int), a["tri"].astype(int)))
    got_b = dict(zip(b["node"].astype(int), b["tri"].astype(int)))
    assert got_a == expect
    assert got_b == expect


def test_dedup_keep_brute_and_path_parity(ray_session):
    """dedup_keep vs brute union-find: every id labeled, min-id kept per
    component, singletons kept; distributed (driver_limit=0) == driver."""
    import ray.data

    from gdal_ray.pipelines.dedup import dedup_keep

    rng = np.random.default_rng(13)
    N = 150
    a = rng.integers(0, N, 60).astype(np.int64)
    b = rng.integers(0, N, 60).astype(np.int64)
    m = a != b
    parent = list(range(N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a[m], b[m]):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    from collections import defaultdict
    members = defaultdict(list)
    for i in range(N):
        members[find(i)].append(i)
    expect = {}
    for ms in members.values():
        mn = min(ms)
        for i in ms:
            expect[i] = (mn, len(ms), 1 if i == mn else 0)

    ids = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(N, dtype=np.int64))}))
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array(a[m]), "id_b": pa.array(b[m])}))
    for dl in (4_000_000, 0):
        out = dedup_keep(ids, pairs, driver_limit=dl).to_pandas()
        got = {int(r.doc_id): (int(r.component), int(r.csize), int(r.keep))
               for r in out.itertuples()}
        assert got == expect, f"driver_limit={dl}"
        assert out["keep"].sum() == len(members)


def test_pca_top_component_matches_numpy(ray_session):
    """Integer power iteration must align with numpy's top covariance
    eigenvector (|cosine| > 0.999) on a synthetic anisotropic cloud."""
    import ray.data

    from gdal_ray.pipelines.ann import pca_top_component

    rng = np.random.default_rng(17)
    dim, n = 16, 400
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    X = (rng.normal(size=(n, 1)) * 3.0) @ direction[None, :] \
        + rng.normal(size=(n, dim)) * 0.3
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array([list(map(float, r)) for r in X],
                                          pa.list_(pa.float32()))})
    out = pca_top_component(ray.data.from_arrow(tbl), dim=dim,
                            iters=6).to_pandas()
    v = out.sort_values("d")["loading"].values
    C = np.cov(X.T, bias=True)
    w, V = np.linalg.eigh(C)
    top = V[:, -1]
    cos = abs(np.dot(v, top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.999, cos


def test_bpe_train_matches_reference(ray_session):
    """Distributed BPE training == a sequential pure-Python reference
    (greedy leftmost-first apply, most-frequent-pair-smallest-key pick),
    including equal-pair runs (aaaa) and cross-doc boundary masking."""
    import ray

    import pyarrow as pa
    from gdal_ray.pipelines.text import bpe_train

    docs = ["aaaa banana band", "banana anna", "aa aa b", "x"]
    tab = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})

    def ref_bpe(texts, k):
        seqs = [list(t.encode()) for t in texts]
        merges = []
        for r in range(k):
            cnt = {}
            for s in seqs:
                for i in range(len(s) - 1):
                    cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + 1
            if not cnt:
                break
            best = min(cnt, key=lambda p: (-cnt[p], p[0] * 65536 + p[1]))
            merges.append((best, 256 + r, cnt[best]))
            out = []
            for s in seqs:
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                        ns.append(256 + r)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                out.append(ns)
            seqs = out
        return merges

    for k in (1, 3, 5):
        got = bpe_train(ray.data.from_arrow(tab), n_merges=k)
        exp = ref_bpe(docs, k)
        assert got.num_rows == len(exp)
        for i, (pair, new_id, c) in enumerate(exp):
            assert got.column("tok_a")[i].as_py() == pair[0]
            assert got.column("tok_b")[i].as_py() == pair[1]
            assert got.column("new_id")[i].as_py() == new_id
            assert got.column("cnt")[i].as_py() == c


def test_bpe_apply_equal_pair_runs():
    import numpy as np
    from gdal_ray.pipelines.text import _bpe_apply

    # "aaaaa" with merge (a,a)->Z: greedy leftmost gives Z Z a
    t = np.array([97] * 5, dtype=np.int64)
    starts = np.array([0, 5])
    toks, _ = _bpe_apply(t, starts, [((97, 97), 300)])
    assert toks.tolist() == [300, 300, 97]
    # boundary between docs is never merged
    t = np.array([97, 97, 97, 97], dtype=np.int64)
    starts = np.array([0, 2, 4])
    toks, _ = _bpe_apply(t, starts, [((97, 97), 300)])
    assert toks.tolist() == [300, 300]


def test_bpe_ops_empty_documents(ray_session):
    """Empty first/last docs must neither crash _bpe_apply nor corrupt
    bpe_pair_counts' boundary mask (review findings: clip remapped
    out-of-range boundaries ONTO real pairs)."""
    import ray

    import pyarrow as pa
    from gdal_ray.pipelines.text import bpe_pair_counts, bpe_train

    tab = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(["", "abc", "abc", ""])})
    t = bpe_pair_counts(ray.data.from_arrow(tab)).to_pandas()
    got = {(int(r.c1), int(r.c2)): int(r.cnt) for r in t.itertuples()}
    # both (a,b) and (b,c) appear twice — nothing masked away
    assert got[(97, 98)] == 2 and got[(98, 99)] == 2
    m = bpe_train(ray.data.from_arrow(tab), n_merges=1)
    assert m.num_rows == 1 and m.column("cnt")[0].as_py() == 2
