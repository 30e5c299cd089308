"""Deduplication suite for large-scale training-data pipelines.

The reference's only dedup is SQL ``SELECT DISTINCT`` (ogr_gensql.cpp:705)
plus our phash column extension (SURVEY §2.8); the rest are the standard
web-scale text-dedup operators, built Ray-Data-first:

  - exact_dedup:      hash-partition on a key → groupby.first (one shuffle
                      of (key, id), never of payloads)
  - minhash_lsh:      shingle → minhash sigs (vectorized) → band buckets →
                      groupby(bucket) emits candidate pairs → verified by
                      exact shingle-Jaccard, exactly-once per pair via
                      first-bucket rule
  - simhash:          64-bit simhash per doc; near-dup = hamming ≤ t via
                      bit-block bucketing (pigeonhole: t=3 → 4 blocks)
  - ngram_jaccard:    exact pairwise Jaccard inside candidate buckets
  - embedding near-dup: cosine ≥ threshold via LSH random-hyperplane buckets

All hashes are deterministic (splitmix-style / fixed seeds) so results are
reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
# byte-popcount lookup table (numpy<2 has no bitwise_count)
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * _M1).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * _M2).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


def _hash_bytes_to_u64(texts: list[str]) -> np.ndarray:
    """Deterministic, order-sensitive 64-bit content hash, vectorized:
    XOR of splitmix(word_i ^ splitmix(position_i)) over 8-byte words plus
    the length — collision-negligible for dedup grouping."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        pad = (-len(b)) % 8
        w = np.frombuffer(b + b"\x00" * pad, dtype=np.uint64)
        pos = _splitmix(np.arange(1, w.size + 1, dtype=np.uint64))
        h = np.bitwise_xor.reduce(_splitmix(w ^ pos)) if w.size else np.uint64(0)
        out[i] = h ^ _splitmix(np.uint64(len(b)))
    return out


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """k-gram (character shingle) hash set of one document."""
    b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.frombuffer((text.lower() + " " * k).encode("utf-8"), dtype=np.uint8)
    n = len(b) - k + 1
    # rolling polynomial hash, vectorized via strided matmul
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    pows = np.power(np.uint64(257), np.arange(k, dtype=np.uint64),
                    dtype=np.uint64)
    h = (windows * pows[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(_splitmix(h))


def minhash_signature(shingles: np.ndarray, num_hashes: int = 64) -> np.ndarray:
    """num_hashes minhash values via one-permutation-per-seed xor trick."""
    seeds = _splitmix(np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    # (num_hashes, n_shingles) xor then min — vectorized
    return np.bitwise_xor(shingles[None, :], seeds[:, None]).min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def simhash64(text: str, k: int = 4) -> int:
    sh = shingle_hashes(text, k)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


# ---------- exact dedup ----------

def exact_dedup(docs: "ray.data.Dataset", *, key_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep the min-id row per exact content hash.  Only (hash, id) shuffles;
    the survivor set is joined back by id — at 100 TB the payload never
    moves through the exchange."""
    def hash_batch(b: pa.Table) -> pa.Table:
        h = _hash_bytes_to_u64(b.column(key_col).to_pylist()).astype(np.int64)
        return pa.table({id_col: b.column(id_col), "content_hash": pa.array(h, pa.int64())})

    def combine(b: pa.Table) -> pa.Table:
        t = hash_batch(b)
        g = t.group_by(["content_hash"]).aggregate([(id_col, "min")])
        return pa.table({"content_hash": g.column("content_hash"),
                         id_col: g.column(f"{id_col}_min")})

    # measured-size final merge: partials are (hash, id) 16-byte rows, one
    # per distinct hash per block — small sets skip the sort-shuffle, big
    # ones take the distributed groupby automatically
    from .shuffle_utils import grouped_agg
    survivors = grouped_agg(docs.map_batches(combine, batch_format="pyarrow"),
                            ["content_hash"], [(id_col, "min")])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b.column(id_col)})

    if isinstance(survivors, pa.Table):
        import ray.data as _rd
        return _rd.from_arrow(finish(survivors))
    return survivors.map_batches(finish, batch_format="pyarrow")


# ---------- minhash LSH ----------

def minhash_lsh_pairs(docs: "ray.data.Dataset", *, threshold: float = 0.7,
                      num_hashes: int = 64, bands: int = 16,
                      shingle_k: int = 5, id_col: str = "doc_id",
                      text_col: str = "text") -> "ray.data.Dataset":
    """Near-duplicate pairs (id_a < id_b, sig-estimated jaccard ≥ threshold).

    Scale shape (what moves where) — NOTHING is materialized on the driver:
      1. one signature row per DOC (id + 8·num_hashes bytes) — computed once,
         materialized in the (spillable, distributed) object store;
      2. a key-only pre-pass shuffles (id, bucket) INTEGER rows (~16 B/row)
         through a distributed count to find multi-member buckets; only that
         SMALL multi-bucket key set reaches the driver / broadcast;
      3. signatures ship through the exchange ONLY for rows landing in a
         multi bucket (the tiny near-dup candidate minority);
      4. verification is IN-GROUP: each bucket group holds its members' full
         sigs, so pairwise agreement, the first-matching-band exactly-once
         rule, and the ≥ threshold cut all run vectorized with no broadcast
         matrix and no second shuffle.
    Requires integer doc ids (the documents table contract)."""
    rows_per_band = num_hashes // bands

    def sig_batch(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        sigs = np.empty((len(ids), num_hashes), dtype=np.uint64)
        for i, text in enumerate(b.column(text_col).to_pylist()):
            sigs[i] = minhash_signature(shingle_hashes(text, shingle_k), num_hashes)
        return pa.table({id_col: pa.array(ids),
                         "sig": pa.array([s.tobytes() for s in sigs], pa.binary())})

    def _buckets_of(b: pa.Table) -> np.ndarray:
        """(n, bands) int64 bucket keys; band index in the low 4 bits."""
        n = b.num_rows
        sigs = np.frombuffer(b"".join(b.column("sig").to_pylist()),
                             dtype=np.uint64).reshape(n, num_hashes)
        segs = sigs.reshape(n, bands, rows_per_band)
        bh = np.bitwise_xor.reduce(segs, axis=2)  # (n, bands)
        bh = _splitmix(bh + _splitmix(np.arange(bands, dtype=np.uint64))[None, :])
        return ((bh >> np.uint64(8)).astype(np.int64) << 4) \
            | np.arange(bands, dtype=np.int64)[None, :]

    def bucket_int_batch(b: pa.Table) -> pa.Table:
        bucket = _buckets_of(b)
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "bucket": pa.array(bucket.ravel()),
        })

    from .shuffle_utils import multi_key_array
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    sigs_ds = docs.repartition(cpus * 2) \
                  .map_batches(sig_batch, batch_format="pyarrow").materialize()

    # bucket-size cap: buckets larger than 64 members are band-hash
    # degeneracies (short/empty docs) whose O(n²) candidate verification
    # would reject wholesale; true duplicates still collide in other bands
    multi = multi_key_array(sigs_ds.map_batches(bucket_int_batch,
                                                batch_format="pyarrow"),
                            "bucket", max_count=64)
    multi_ref = ray.put(multi)

    def bucket_sig_batch(b: pa.Table) -> pa.Table:
        """(bucket, id, sig) rows ONLY for multi-member buckets — sig bytes
        enter the shuffle solely for candidate rows."""
        m = ray.get(multi_ref)
        bucket = _buckets_of(b).ravel()
        if m.size == 0:
            keep = np.zeros(bucket.size, dtype=bool)
        else:
            pos = np.clip(np.searchsorted(m, bucket), 0, m.size - 1)
            keep = m[pos] == bucket
        ids = np.repeat(np.asarray(b.column(id_col), dtype=np.int64), bands)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64), bands)
        kept = np.nonzero(keep)[0]
        return pa.table({
            id_col: pa.array(ids[kept]),
            "bucket": pa.array(bucket[kept]),
            "sig": b.column("sig").take(pa.array(row[kept], pa.int64())),
        })

    def verify_group(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "sig_jaccard": pa.array([], pa.float64())})
        m = g.num_rows
        if m < 2:
            return empty
        band = int(g.column("bucket")[0].as_py()) & 0xF
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.frombuffer(b"".join(g.column("sig").to_pylist()),
                            dtype=np.uint64).reshape(m, num_hashes)[order]
        ii, jj = np.triu_indices(m, k=1)
        eq = mat[ii] == mat[jj]                     # (p, H)
        est = eq.mean(axis=1)
        band_eq = eq.reshape(ii.size, bands, rows_per_band).all(axis=2)
        first_band = np.argmax(band_eq, axis=1)     # exactly-once rule
        keep = (first_band == band) & (est >= threshold)
        return pa.table({
            "id_a": pa.array(ids[ii[keep]]),
            "id_b": pa.array(ids[jj[keep]]),
            "sig_jaccard": pa.array(est[keep], pa.float64()),
        })

    from .shuffle_utils import grouped_map_groups
    return grouped_map_groups(
        sigs_ds.map_batches(bucket_sig_batch, batch_format="pyarrow"),
        "bucket", verify_group)


def minhash_lsh_verified_pairs(docs_tbl: pa.Table, *, threshold: float = 0.7,
                               num_hashes: int = 64, bands: int = 16,
                               shingle_k: int = 5, id_col: str = "doc_id",
                               text_col: str = "text"):
    """Driver-side exact variant for tests/oracles: same candidate
    generation, but verification computes true shingle Jaccard."""
    texts = dict(zip(docs_tbl.column(id_col).to_pylist(),
                     docs_tbl.column(text_col).to_pylist()))
    sh = {d: shingle_hashes(t, shingle_k) for d, t in texts.items()}
    sig = {d: minhash_signature(s, num_hashes) for d, s in sh.items()}
    rows_per_band = num_hashes // bands
    buckets: dict = {}
    for d, s in sig.items():
        for band in range(bands):
            seg = tuple(s[band * rows_per_band:(band + 1) * rows_per_band].tolist())
            buckets.setdefault((band, seg), []).append(d)
    pairs = set()
    for (_, _), members in sorted(buckets.items()):
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = sorted((members[i], members[j]))
                pairs.add((a, b))
    out = [(a, b, jaccard(sh[a], sh[b])) for a, b in sorted(pairs)]
    return [(a, b, jc) for a, b, jc in out if jc >= threshold]


# ---------- simhash ----------

def simhash_pairs(docs: "ray.data.Dataset", *, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  ) -> "ray.data.Dataset":
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.

    Pigeonhole bucketing: split 64 bits into (max_hamming+1) blocks — any
    pair within distance t agrees on ≥1 whole block; groupby(block value)
    then exact-hamming-verify.  First-matching-block rule keeps pairs
    exactly-once."""
    nblocks = max_hamming + 1
    bits = 64 // nblocks

    def sh_batch(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        n = len(texts)
        hs = np.fromiter((simhash64(t) for t in texts), dtype=np.uint64,
                         count=n)
        blk = np.tile(np.arange(nblocks, dtype=np.uint64), n)      # (n*B,)
        hrep = np.repeat(hs, nblocks)
        v = (hrep >> (blk * np.uint64(bits))) & np.uint64((1 << bits) - 1)
        bval = ((blk << np.uint64(60)) | v).astype(np.int64)
        row = np.repeat(np.arange(n, dtype=np.int64), nblocks)
        return pa.table({
            id_col: b.column(id_col).take(pa.array(row)),
            "block": pa.array(blk.astype(np.int32)),
            "bval": pa.array(bval),
            "simhash": pa.array((hrep - np.uint64(1 << 63)).view(np.int64)),
        })

    def block_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int32())})
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        blk = int(g.column("block")[0].as_py())
        hs = (np.asarray(g.column("simhash"), dtype=np.int64)
              .astype(np.uint64) + np.uint64(1 << 63))
        ii, jj = np.triu_indices(n, k=1)
        x = hs[ii] ^ hs[jj]                               # (p,) xor words
        d = _POPCNT8[x.view(np.uint8)].reshape(x.size, 8).sum(axis=1)
        # first-matching-block rule, vectorized: block pb of the xor is zero
        # iff the pair agrees on that whole block
        shifts = (np.arange(nblocks, dtype=np.uint64) * np.uint64(bits))
        mask = np.uint64((1 << bits) - 1)
        block_eq = ((x[:, None] >> shifts[None, :]) & mask) == 0  # (p, nblocks)
        first = np.argmax(block_eq, axis=1)
        keep = (d <= max_hamming) & (first == blk) & (ids[ii] != ids[jj])
        a = np.minimum(ids[ii[keep]], ids[jj[keep]])
        b2 = np.maximum(ids[ii[keep]], ids[jj[keep]])
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b2),
                         "hamming": pa.array(d[keep].astype(np.int32))})

    from .shuffle_utils import filter_multi_keys
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    rows = docs.repartition(cpus * 2) \
               .map_batches(sh_batch, batch_format="pyarrow").materialize()
    from .shuffle_utils import grouped_map_groups
    return grouped_map_groups(filter_multi_keys(rows, "bval"),
                              "bval", block_pairs)


# ---------- embedding cosine near-dup ----------

def _lsh_plane_codes(Vn: np.ndarray, dim: int, bands: int,
                     planes_per_band: int) -> np.ndarray:
    """(n, bands) int64 per-band hyperplane sign codes.  Planes come from a
    FIXED seed so every task (and in-group recomputation) agrees."""
    rng = np.random.default_rng(12345)
    planes = rng.standard_normal((dim, bands * planes_per_band))
    signs = (Vn @ planes) >= 0
    codes = signs.reshape(-1, bands, planes_per_band)
    return (codes.astype(np.int64)
            << np.arange(planes_per_band, dtype=np.int64)).sum(axis=2)


def embedding_neardup_pairs(emb: "ray.data.Dataset", *, threshold: float = 0.95,
                            bands: int = 8, planes_per_band: int = 8,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            max_bucket: int = 256) -> "ray.data.Dataset":
    """Pairs with cosine ≥ threshold via BANDED random-hyperplane LSH +
    exact in-bucket verification (precision exact; recall = 1-(1-p^r)^B with
    p = 1 - θ/π — ≈0.99 at cosine 0.95 for B=8, r=8).

    First-matching-band rule keeps each pair exactly-once: a pair found in
    band b is emitted only if b is the FIRST band whose codes agree (band
    codes are recomputed in-group from the vectors — planes are seed-fixed,
    so no extra columns ship through the shuffle)."""
    from gdal_ray.core.arrow_utils import list_column_to_ndarray

    def bucket_batch(b: pa.Table) -> pa.Table:
        vecs = list_column_to_ndarray(b.column(vec_col))
        n, dim = vecs.shape
        codes = _lsh_plane_codes(vecs, dim, bands, planes_per_band)
        # bucket key: splitmix(code + band salt), band index in low bits
        bh = _splitmix(codes.astype(np.uint64)
                       + _splitmix(np.arange(1, bands + 1, dtype=np.uint64))[None, :])
        bucket = ((bh >> np.uint64(8)).astype(np.int64) << 4) \
            | np.arange(bands, dtype=np.int64)[None, :]
        return pa.table({
            id_col: b.column(id_col).take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))),
            "bucket": pa.array(bucket.ravel()),
            "vec": pa.array([v.tobytes() for v in
                             np.repeat(vecs, bands, axis=0)], pa.binary()),
        })

    def verify(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        n = g.num_rows
        if n < 2:
            return empty
        band = int(g.column("bucket")[0].as_py()) & 0xF
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        V = np.frombuffer(b"".join(g.column("vec").to_pylist()),
                          dtype=np.float64).reshape(n, -1)[order]
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        S = Vn @ Vn.T
        codes = _lsh_plane_codes(V, V.shape[1], bands, planes_per_band)
        ii, jj = np.nonzero(np.triu(S >= threshold, k=1))
        if ii.size == 0:
            return empty
        agree = codes[ii] == codes[jj]              # (p, bands)
        first = np.argmax(agree, axis=1)
        keep = agree[:, band] & (first == band) & (ids[ii] != ids[jj])
        return pa.table({"id_a": pa.array(ids[ii[keep]]),
                         "id_b": pa.array(ids[jj[keep]]),
                         "cosine": pa.array(S[ii[keep], jj[keep]], pa.float64())})

    from .shuffle_utils import filter_multi_keys, grouped_map_groups
    rows = emb.map_batches(bucket_batch, batch_format="pyarrow")
    return grouped_map_groups(
        filter_multi_keys(rows, "bucket", max_count=max_bucket),
        "bucket", verify)


# ---------- exact n-gram Jaccard near-dup ----------

def ngram_jaccard_pairs(docs: "ray.data.Dataset", *, threshold: float = 0.8,
                        shingle_k: int = 5, num_hashes: int = 64,
                        bands: int = 16, id_col: str = "doc_id",
                        text_col: str = "text") -> "ray.data.Dataset":
    """Near-duplicate pairs by EXACT character-shingle Jaccard ≥ threshold.

    Same scale shape as minhash_lsh_pairs (the LSH bands only GENERATE
    candidates), but verification computes the true n-gram Jaccard from the
    documents' shingle sets, co-shuffled ONLY for rows that land in a
    multi-member bucket — so the emitted similarity is exact, not a
    signature estimate.  Exactly-once via the first-matching-band rule over
    minhash signatures (recomputed in-group from the shipped shingles)."""
    rows_per_band = num_hashes // bands

    def sig_batch(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        sh_blobs, sigs = [], np.empty((len(ids), num_hashes), np.uint64)
        for i, text in enumerate(b.column(text_col).to_pylist()):
            sh = shingle_hashes(text, shingle_k)
            sh_blobs.append(sh.tobytes())
            sigs[i] = minhash_signature(sh, num_hashes)
        return pa.table({id_col: pa.array(ids),
                         "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
                         "shingles": pa.array(sh_blobs, pa.binary())})

    def _buckets_of(b: pa.Table) -> np.ndarray:
        n = b.num_rows
        sigs = np.frombuffer(b"".join(b.column("sig").to_pylist()),
                             dtype=np.uint64).reshape(n, num_hashes)
        segs = sigs.reshape(n, bands, rows_per_band)
        bh = np.bitwise_xor.reduce(segs, axis=2)
        bh = _splitmix(bh + _splitmix(np.arange(bands, dtype=np.uint64))[None, :])
        return ((bh >> np.uint64(8)).astype(np.int64) << 4) \
            | np.arange(bands, dtype=np.int64)[None, :]

    def bucket_int_batch(b: pa.Table) -> pa.Table:
        bucket = _buckets_of(b)
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        return pa.table({id_col: pa.array(np.repeat(ids, bands)),
                         "bucket": pa.array(bucket.ravel())})

    from .shuffle_utils import multi_key_array
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    sigs_ds = docs.repartition(cpus * 2) \
                  .map_batches(sig_batch, batch_format="pyarrow").materialize()
    multi = multi_key_array(sigs_ds.map_batches(bucket_int_batch,
                                                batch_format="pyarrow"),
                            "bucket", max_count=64)
    multi_ref = ray.put(multi)

    def bucket_payload_batch(b: pa.Table) -> pa.Table:
        m = ray.get(multi_ref)
        bucket = _buckets_of(b).ravel()
        if m.size == 0:
            keep = np.zeros(bucket.size, dtype=bool)
        else:
            pos = np.clip(np.searchsorted(m, bucket), 0, m.size - 1)
            keep = m[pos] == bucket
        ids = np.repeat(np.asarray(b.column(id_col), dtype=np.int64), bands)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64), bands)
        kept = np.nonzero(keep)[0]
        take = pa.array(row[kept], pa.int64())
        return pa.table({
            id_col: pa.array(ids[kept]),
            "bucket": pa.array(bucket[kept]),
            "sig": b.column("sig").take(take),
            "shingles": b.column("shingles").take(take),
        })

    def verify_group(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        m = g.num_rows
        if m < 2:
            return empty
        band = int(g.column("bucket")[0].as_py()) & 0xF
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        sigs = np.frombuffer(b"".join(g.column("sig").to_pylist()),
                             dtype=np.uint64).reshape(m, num_hashes)[order]
        sh = [np.frombuffer(g.column("shingles")[int(i)].as_py(), np.uint64)
              for i in order]
        ii, jj = np.triu_indices(m, k=1)
        eq = sigs[ii] == sigs[jj]
        band_eq = eq.reshape(ii.size, bands, rows_per_band).all(axis=2)
        first_band = np.argmax(band_eq, axis=1)
        out_a, out_b, out_j = [], [], []
        for p in range(ii.size):
            if not band_eq[p].any() or first_band[p] != band:
                continue
            if ids[ii[p]] == ids[jj[p]]:
                continue
            jc = jaccard(sh[ii[p]], sh[jj[p]])
            if jc >= threshold:
                out_a.append(int(ids[ii[p]]))
                out_b.append(int(ids[jj[p]]))
                out_j.append(jc)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    from .shuffle_utils import grouped_map_groups
    return grouped_map_groups(
        sigs_ds.map_batches(bucket_payload_batch, batch_format="pyarrow"),
        "bucket", verify_group)


# ---------- connected components (pairs -> duplicate clusters) ----------

def _pairs_dedup(node: np.ndarray, nbr: np.ndarray):
    """Unique (node, nbr) rows, self-rows dropped — lexsort + adjacent-equal
    mask (np.unique(axis=0) is an order of magnitude slower)."""
    keep = node != nbr
    node, nbr = node[keep], nbr[keep]
    if node.size == 0:
        return node, nbr
    order = np.lexsort((nbr, node))
    node, nbr = node[order], nbr[order]
    first = np.empty(node.size, bool)
    first[0] = True
    first[1:] = (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])
    return node[first], nbr[first]


def _cc_driver(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Exact driver-side components: vectorized min-propagation with
    pointer jumping (edge relax via np.minimum.at, then label[label]
    compression) — O(log n) vector passes, no Python per-edge loop."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[:a.size], inv[a.size:]
    lab = np.arange(nodes.size, dtype=np.int64)
    while True:
        m = np.minimum(lab[ea], lab[eb])
        new = lab.copy()
        np.minimum.at(new, ea, m)
        np.minimum.at(new, eb, m)
        while True:                       # pointer jumping to the root
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            break
        lab = new
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "component": pa.array(nodes[lab], pa.int64())})


def connected_components(pairs: "ray.data.Dataset", *,
                         id_a: str = "id_a", id_b: str = "id_b",
                         driver_limit: int = 2_000_000,
                         max_rounds: int = 64) -> "ray.data.Dataset":
    """Connected components over an undirected pair set — the clustering
    step that turns near-dup PAIRS (minhash/simhash/phash output) into
    duplicate GROUPS (keep one doc per component).  Returns one row per
    node that appears in an edge: (node, component) with component = the
    smallest node id reachable.

    Measured-size contract (the repo-wide shuffle discipline): an edge set
    whose row count fits ``driver_limit`` (2M int64 pairs = 32 MB) resolves
    with one exact driver-side pointer-jumping pass; larger sets run
    Hash-to-Min label propagation (Rastogi et al. 2013, "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds"): each round every
    node u with incident set N(u) sends m = min(N(u) ∪ {u}) to all of
    N(u) ∪ {u} and N(u) ∪ {u} to m, converging to per-component stars in
    O(log diameter) shuffle rounds.  Rounds are groupby(HASHED bucket)
    (splitmix of the node — raw ids stripe) with the per-node min/emit
    fully vectorized inside each bucket (reduceat over node segments — no
    per-group dispatch, per CLAUDE.md's map_groups-cost rule).  Fixpoint
    is detected by an order-invariant u64 content checksum of the deduped
    edge set (collision odds ~2^-64; ``max_rounds`` backstops).

    Reference analog: near-dup clustering in deduplication pipelines
    (e.g. Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better" §3 — suffix/minhash pairs → components → keep one).
    """
    def canon(b: pa.Table) -> pa.Table:
        x = np.asarray(b.column(id_a), np.int64)
        y = np.asarray(b.column(id_b), np.int64)
        node = np.concatenate([x, y])
        nbr = np.concatenate([y, x])
        node, nbr = _pairs_dedup(node, nbr)
        return pa.table({"node": pa.array(node), "nbr": pa.array(nbr)})

    edges = pairs.map_batches(canon, batch_format="pyarrow").materialize()
    n_rows = edges.count()
    if n_rows == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}))
    if n_rows <= driver_limit:
        tbl = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in edges.iter_batches(batch_format="pyarrow"))
        a = np.asarray(tbl.column("node"), np.int64)
        b = np.asarray(tbl.column("nbr"), np.int64)
        return ray.data.from_arrow(_cc_driver(a, b))

    # ---- distributed Hash-to-Min ----
    from .shuffle_utils import bucket_count
    nparts = bucket_count()

    def bucketize(b: pa.Table) -> pa.Table:
        node = np.asarray(b.column("node"), np.int64)
        bkt = (_splitmix(node.astype(np.uint64)) % np.uint64(nparts)) \
            .astype(np.int64)
        return b.append_column("bkt", pa.array(bkt))

    def _segments(g: pa.Table):
        node = np.asarray(g.column("node"), np.int64)
        nbr = np.asarray(g.column("nbr"), np.int64)
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        uniq, starts = np.unique(node, return_index=True)
        m = np.minimum(uniq, np.minimum.reduceat(nbr, starts))
        return node, nbr, uniq, starts, m

    def ht_min_round(g: pa.Table) -> pa.Table:
        node, nbr, uniq, starts, m = _segments(g)
        seg_len = np.diff(np.append(starts, node.size))
        m_row = np.repeat(m, seg_len)
        # Hash-to-Min messages: send m_u to every x in N(u), and send
        # N(u) ∪ {u} to m_u.  (Sending m_u only back to u itself is NOT
        # the algorithm — a 3-chain then fixpoints non-star.)
        out_node = np.concatenate([nbr, m_row, m])
        out_nbr = np.concatenate([m_row, nbr, uniq])
        out_node, out_nbr = _pairs_dedup(out_node, out_nbr)
        return pa.table({"node": pa.array(out_node),
                         "nbr": pa.array(out_nbr)})

    def checksum(b: pa.Table) -> pa.Table:
        node = np.asarray(b.column("node"), np.int64).astype(np.uint64)
        nbr = np.asarray(b.column("nbr"), np.int64).astype(np.uint64)
        h = _splitmix(node) ^ _splitmix(~nbr)
        s = int(h.sum(dtype=np.uint64))
        return pa.table({"sig": pa.array([s - (1 << 63)], pa.int64()),
                         "n": pa.array([node.size], pa.int64())})

    def _sig(ds):
        parts = pa.concat_tables(
            t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in ds.map_batches(checksum, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow"))
        sigs = np.asarray(parts.column("sig"), np.int64).astype(np.uint64)
        return (int(sigs.sum(dtype=np.uint64)),
                int(np.asarray(parts.column("n"), np.int64).sum()))

    prev = _sig(edges)
    for _ in range(max_rounds):
        edges = edges.map_batches(bucketize, batch_format="pyarrow") \
            .groupby("bkt") \
            .map_groups(ht_min_round, batch_format="pyarrow").materialize()
        cur = _sig(edges)
        if cur == prev:
            break
        prev = cur

    def labels(g: pa.Table) -> pa.Table:
        _, _, uniq, _, m = _segments(g)
        return pa.table({"node": pa.array(uniq), "component": pa.array(m)})

    return edges.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bkt").map_groups(labels, batch_format="pyarrow")


# ---------- train/test decontamination ----------

def contamination(docs: "ray.data.Dataset", *, k: int = 7,
                  rate_num: int = 1, rate_den: int = 10,
                  id_col: str = "doc_id", text_col: str = "text",
                  driver_limit: int = 4_000_000) -> "ray.data.Dataset | pa.Table":
    """Train/test decontamination — the training-pipeline staple the other
    dedup families don't cover: split the corpus by a deterministic
    splitmix64 hash threshold (test = hash(id) ≤ rate·2^64, the same
    sampler as q_hash_sample), then score every TEST document by the
    fraction of its distinct k-char-gram shingles that appear anywhere on
    the TRAIN side (n-gram containment, not symmetric Jaccard — a test doc
    embedded inside a long train doc still scores 1.0).

    Scale shape: one pass shingles the corpus into (sh, doc, test) integer
    rows; ONE sort-shuffle groups them by hashed shingle bucket
    (shuffle_utils.bucket_count buckets, ~4/CPU) and each bucket resolves
    train-presence per shingle FULLY VECTORIZED (argsort + segment
    bincount — no per-shingle Python, shingle groups are far too numerous
    for map_groups dispatch); each bucket emits per-doc (total, matched)
    partials in one shot — a doc's test rows land in exactly one bucket
    per shingle, so bucket-local counts SUM to the doc's distinct-shingle
    totals, and the whole pipeline is a single streaming chain with no
    mid-pipeline materialization.  The partials merge in a measured-size
    grouped_agg by doc.  Neither side is broadcast or
    driver-materialized: at 100 TB the train vocabulary lives only inside
    the exchange.
    """
    from .shuffle_utils import bucket_count, grouped_agg
    thr = np.uint64((rate_num << 64) // rate_den - 1)
    nb = bucket_count()

    def mk_rows(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        is_test = _splitmix(ids.astype(np.uint64)) <= thr
        shs, dids, flags = [], [], []
        train_sh = []
        for i, text in enumerate(b.column(text_col).to_pylist()):
            sh = shingle_hashes(text, k)
            if is_test[i]:
                shs.append(sh.view(np.int64))
                dids.append(np.full(sh.size, ids[i], np.int64))
                flags.append(np.ones(sh.size, np.int64))
            else:
                train_sh.append(sh.view(np.int64))
        # train side carries only shingle PRESENCE — collapse per-batch
        # duplicates before the shuffle (doc identity is never needed
        # downstream; the majority side shrinks by its common-shingle mass)
        if train_sh:
            tsh = np.unique(np.concatenate(train_sh))
            shs.append(tsh)
            dids.append(np.full(tsh.size, np.int64(-1)))
            flags.append(np.zeros(tsh.size, np.int64))
        sh_all = np.concatenate(shs) if shs else np.empty(0, np.int64)
        return pa.table({
            "sh": pa.array(sh_all),
            id_col: pa.array(np.concatenate(dids) if dids
                             else np.empty(0, np.int64)),
            "test": pa.array(np.concatenate(flags) if flags
                             else np.empty(0, np.int64)),
            "bkt": pa.array((_splitmix(sh_all.view(np.uint64))
                             % np.uint64(nb)).astype(np.int64)),
        })

    rows = docs.map_batches(mk_rows, batch_format="pyarrow")

    def bucket_fn(g: pa.Table) -> pa.Table:
        """One hash bucket of shingle rows → per-doc (total, matched)
        partials in a single emission (every test row of a doc lands in
        exactly one bucket, so bucket-local test-row counts SUM to the
        doc's distinct-shingle count — no separate totals pass, nothing
        materialized).  Vectorized: sort by shingle, segment-id via
        adjacent-diff, train presence per segment via bincount — zero
        per-shingle Python."""
        sh = np.asarray(g.column("sh"), np.int64)
        t = np.asarray(g.column("test"), np.int64)
        d = np.asarray(g.column(id_col), np.int64)
        order = np.argsort(sh, kind="stable")
        sh, t, d = sh[order], t[order], d[order]
        seg = np.cumsum(np.r_[False, sh[1:] != sh[:-1]])
        has_train = np.bincount(seg, weights=(t == 0)) > 0
        istest = t == 1
        dt = d[istest]
        if dt.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_shingles": pa.array([], pa.int64()),
                             "n_matched": pa.array([], pa.int64())})
        hit = has_train[seg][istest]
        uniq, inv = np.unique(dt, return_inverse=True)
        return pa.table({
            id_col: pa.array(uniq),
            "n_shingles": pa.array(np.bincount(inv).astype(np.int64)),
            "n_matched": pa.array(np.bincount(inv, weights=hit)
                                  .astype(np.int64))})

    partials = rows.groupby("bkt").map_groups(
        lambda g: bucket_fn(g), batch_format="pyarrow")
    agg = grouped_agg(partials, [id_col],
                      [("n_shingles", "sum"), ("n_matched", "sum")],
                      driver_limit=driver_limit)

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n_shingles"), np.int64)
        m = np.asarray(b.column("n_matched"), np.int64)
        # half-up 6-dp quantization — bit-matches DuckDB
        # floor(CAST(m AS DOUBLE)/n * 1000000.0 + 0.5)/1000000.0
        ratio = np.floor(m.astype(np.float64) / n.astype(np.float64)
                         * 1e6 + 0.5) / 1e6
        return pa.table({id_col: b.column(id_col),
                         "n_shingles": pa.array(n),
                         "n_matched": pa.array(m),
                         "contamination": pa.array(ratio)})

    if isinstance(agg, pa.Table):
        import ray.data as _rd
        if agg.num_rows == 0:  # schema-stable empty (no test docs at all)
            return _rd.from_arrow(pa.table({
                id_col: pa.array([], pa.int64()),
                "n_shingles": pa.array([], pa.int64()),
                "n_matched": pa.array([], pa.int64()),
                "contamination": pa.array([], pa.float64())}))
        return _rd.from_arrow(finish(agg))
    return agg.map_batches(finish, batch_format="pyarrow")


# ---------- fuzzy (edit-distance) near-dup ----------

def _lev_band(A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray,
              max_dist: int) -> np.ndarray:
    """Exact Levenshtein for pairs within ``max_dist`` (Ukkonen band DP).

    ``A``/``B``: (P, L) uint8 code matrices (zero-padded); ``la``/``lb``
    lengths.  Vectorized ACROSS pairs: each of the ≤``max(la)`` row steps is
    a handful of numpy kernels over a (P, 2D+1) band — ~la·(2D+1) element
    ops per pair instead of la·lb.  The left-neighbour (insertion) chain
    inside a row is the prefix-min trick: dp[j] = min_k≤j (t[k] + (j−k)) =
    accumulate-min(t[k]−k) + j.  Distances above ``max_dist`` are inexact
    (band-clipped) but provably still > ``max_dist`` — callers filter.
    Requires |la−lb| ≤ max_dist."""
    P, L = A.shape
    D = int(max_dist)
    W = 2 * D + 1
    INF = np.int32(60000)
    k = np.arange(W, dtype=np.int32)
    la = la.astype(np.int32)
    lb = lb.astype(np.int32)
    res = np.full(P, INF, np.int32)
    dp = np.broadcast_to(np.where(k >= D, k - D, INF), (P, W)).copy()
    dp[(k[None, :] - D) > lb[:, None]] = INF
    fin0 = la == 0
    res[fin0] = lb[fin0]
    for i in range(1, int(la.max(initial=0)) + 1):
        jv = i + k - D                                  # column at band pos k
        bj = np.clip(jv - 1, 0, L - 1)
        cost = (A[:, i - 1][:, None] != B[:, bj]).astype(np.int32)
        up = np.concatenate([dp[:, 1:], np.full((P, 1), INF, np.int32)],
                            axis=1)
        t = np.minimum(up + 1, dp + cost)
        k0 = D - i
        if 0 <= k0 < W:
            t[:, k0] = i                                # j == 0: i deletions
        invalid = (jv[None, :] < 0) | (jv[None, :] > lb[:, None])
        t[invalid] = INF
        dp = np.minimum(
            t, np.minimum.accumulate(t - k[None, :], axis=1) + k[None, :])
        dp[invalid] = INF
        fin = la == i
        if fin.any():
            res[fin] = dp[fin, lb[fin] - i + D]
    return res


def fuzzy_pairs(docs: "ray.data.Dataset", *, max_dist: int = 8,
                prefix_len: int = 96, num_hashes: int = 64, bands: int = 16,
                shingle_k: int = 5, id_col: str = "doc_id",
                text_col: str = "text") -> "ray.data.Dataset":
    """Edit-distance near-dup pairs: MinHash-LSH candidate generation +
    banded-Levenshtein verification over a ``prefix_len``-char prefix.

    The production fuzzy-dedup shape: LSH bands PROPOSE (same machinery and
    exactly-once first-fully-equal-band rule as ``minhash_lsh_pairs``,
    including the [2,64] bucket-size window), and the verifier is an EXACT
    string measure — Levenshtein ≤ ``max_dist`` on the document prefix —
    rather than a signature estimate.  Prefixes ship through the exchange
    only for rows landing in a multi-member bucket; verification is
    in-group via the vectorized Ukkonen band DP (``_lev_band``), so no
    second shuffle and no driver materialization.  Distances are byte-level
    (== character-level on ASCII corpora, the documents-table contract)."""
    rows_per_band = num_hashes // bands

    def sig_batch(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        sigs = np.empty((len(ids), num_hashes), dtype=np.uint64)
        pfx = []
        for i, text in enumerate(b.column(text_col).to_pylist()):
            sigs[i] = minhash_signature(shingle_hashes(text, shingle_k),
                                        num_hashes)
            pfx.append(text[:prefix_len])
        return pa.table({id_col: pa.array(ids),
                         "sig": pa.array([s.tobytes() for s in sigs],
                                         pa.binary()),
                         "pfx": pa.array(pfx, pa.string())})

    def _buckets_of(b: pa.Table) -> np.ndarray:
        n = b.num_rows
        sigs = np.frombuffer(b"".join(b.column("sig").to_pylist()),
                             dtype=np.uint64).reshape(n, num_hashes)
        segs = sigs.reshape(n, bands, rows_per_band)
        bh = np.bitwise_xor.reduce(segs, axis=2)
        bh = _splitmix(bh + _splitmix(np.arange(bands, dtype=np.uint64))[None, :])
        return ((bh >> np.uint64(8)).astype(np.int64) << 4) \
            | np.arange(bands, dtype=np.int64)[None, :]

    def bucket_int_batch(b: pa.Table) -> pa.Table:
        bucket = _buckets_of(b)
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        return pa.table({id_col: pa.array(np.repeat(ids, bands)),
                         "bucket": pa.array(bucket.ravel())})

    from .shuffle_utils import multi_key_array
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    sigs_ds = docs.repartition(cpus * 2) \
                  .map_batches(sig_batch, batch_format="pyarrow").materialize()
    multi = multi_key_array(sigs_ds.map_batches(bucket_int_batch,
                                                batch_format="pyarrow"),
                            "bucket", max_count=64)
    multi_ref = ray.put(multi)

    def bucket_payload_batch(b: pa.Table) -> pa.Table:
        m = ray.get(multi_ref)
        bucket = _buckets_of(b).ravel()
        if m.size == 0:
            keep = np.zeros(bucket.size, dtype=bool)
        else:
            pos = np.clip(np.searchsorted(m, bucket), 0, m.size - 1)
            keep = m[pos] == bucket
        ids = np.repeat(np.asarray(b.column(id_col), dtype=np.int64), bands)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64), bands)
        kept = np.nonzero(keep)[0]
        take = pa.array(row[kept], pa.int64())
        return pa.table({
            id_col: pa.array(ids[kept]),
            "bucket": pa.array(bucket[kept]),
            "sig": b.column("sig").take(take),
            "pfx": b.column("pfx").take(take),
        })

    def verify_group(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int32())})
        m = g.num_rows
        if m < 2:
            return empty
        band = int(g.column("bucket")[0].as_py()) & 0xF
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        sigs = np.frombuffer(b"".join(g.column("sig").to_pylist()),
                             dtype=np.uint64).reshape(m, num_hashes)[order]
        raw = [g.column("pfx")[int(i)].as_py().encode("utf-8") for i in order]
        lens = np.fromiter((len(r) for r in raw), np.int32, count=m)
        L = max(int(lens.max(initial=0)), 1)
        mat = np.zeros((m, L), dtype=np.uint8)
        for i, r in enumerate(raw):
            mat[i, :len(r)] = np.frombuffer(r, np.uint8)
        ii, jj = np.triu_indices(m, k=1)
        eq = sigs[ii] == sigs[jj]
        band_eq = eq.reshape(ii.size, bands, rows_per_band).all(axis=2)
        first_band = np.argmax(band_eq, axis=1)        # defaults-to-0 rule
        cand = (first_band == band) & (ids[ii] != ids[jj]) \
            & (np.abs(lens[ii] - lens[jj]) <= max_dist)
        ci, cj = ii[cand], jj[cand]
        if ci.size == 0:
            return empty
        dist = _lev_band(mat[ci], lens[ci], mat[cj], lens[cj], max_dist)
        keep = dist <= max_dist
        return pa.table({"id_a": pa.array(ids[ci[keep]]),
                         "id_b": pa.array(ids[cj[keep]]),
                         "dist": pa.array(dist[keep].astype(np.int32))})

    from .shuffle_utils import grouped_map_groups
    return grouped_map_groups(
        sigs_ds.map_batches(bucket_payload_batch, batch_format="pyarrow"),
        "bucket", verify_group)


def upsert_latest(ds: "ray.data.Dataset", key_col: str, version_col: str,
                  driver_limit: int = 200_000) -> "ray.data.Dataset":
    """Latest-wins merge by key (the lakehouse CDC/upsert primitive):
    from a union of snapshot + change rows, keep each key's row with the
    highest version.  Scale shape: a per-batch combiner first collapses
    every block to one candidate row per key (argmax by version inside
    the block — zero extra shuffle volume for keys that repeat within a
    block), then the measured-size grouped merge picks the global max.
    Version ties keep ONE deterministic row (the max-version row that
    sorts last by version within the key group — callers needing a
    different tiebreak should fold it into the version)."""
    from .shuffle_utils import bucket_count

    def combine(b: pa.Table) -> pa.Table:
        # ONE vectorized pass: last row per key in (key, version) order =
        # per-key max version.  Associative, so the same kernel serves as
        # the per-block combiner, the driver merge, AND the per-bucket
        # finisher — never a per-key Python call (150k keys at sf0.1 made
        # a per-group fn path take 50+ s; this is <0.1 s).
        k = np.asarray(b.column(key_col), np.int64)
        v = np.asarray(b.column(version_col), np.int64)
        order = np.lexsort((v, k))
        kk = k[order]
        last = np.flatnonzero(np.append(kk[1:] != kk[:-1], True))
        return b.take(pa.array(order[last], pa.int64()))

    partials = ds.map_batches(combine, batch_format="pyarrow") \
        .materialize()
    if partials.count() <= driver_limit:
        parts = [t if isinstance(t, pa.Table)
                 else pa.Table.from_batches([t])
                 for t in partials.iter_batches(batch_format="pyarrow")]
        if not parts:
            return partials
        return ray.data.from_arrow(combine(
            pa.concat_tables(parts).combine_chunks()))

    # distributed: hashed-key buckets (splitmix — raw keys stripe), the
    # SAME vectorized kernel per bucket; a key's rows all land in one
    # bucket so per-bucket last-per-key is globally correct
    nb = bucket_count()

    def bucketize(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column(key_col), np.int64)
        x = (k.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return b.append_column(
            "__up_bkt", pa.array((x % np.uint64(nb)).astype(np.int64)))

    def bucket_fn(g: pa.Table) -> pa.Table:
        return combine(g.drop_columns(["__up_bkt"]))

    return partials.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("__up_bkt").map_groups(bucket_fn, batch_format="pyarrow")


def dedup_keep(ids: "ray.data.Dataset", pairs: "ray.data.Dataset", *,
               id_col: str = "doc_id", pair_a: str = "id_a",
               pair_b: str = "id_b",
               driver_limit: int = 4_000_000) -> "ray.data.Dataset":
    """End-to-end dedup KEEP-LIST — the deliverable of a training-data
    dedup stage (Lee et al. 2022 §3): near-dup pairs → connected
    components → keep exactly one representative (the min id) per
    component; every id outside any component is a kept singleton.

    Output: one row per input id — (id_col, component, csize, keep) with
    keep ∈ {0,1}, component = min reachable id (own id for singletons),
    csize = component size (1 for singletons).

    Scale shape: ``connected_components`` does the iterative work
    (measured-size driver pointer-jumping vs Hash-to-Min rounds); this
    adds ONE aggregate for component sizes plus two hashed co-shuffles
    (sizes onto labels by component, labels onto ids by id), each a
    bucket groupby whose in-group merge is fully VECTORIZED over key
    segments (sort + searchsorted scatter — no per-key Python dispatch;
    a keep-list visits every doc id, so per-key fn cost would dominate).
    Small inputs (measured ≤ ``driver_limit`` rows) merge on the driver
    with the identical kernel."""
    from .shuffle_utils import bucket_vectorized, grouped_agg

    def _bucket_pass(ds, fn):
        return bucket_vectorized(ds, "k", fn, driver_limit=driver_limit)

    comp = connected_components(pairs, id_a=pair_a, id_b=pair_b) \
        .materialize()

    def size_rows(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("component"), np.int64)
        return pa.table({"component": pa.array(c),
                         "c": pa.array(np.ones(c.size, np.int64))})

    sizes = grouped_agg(comp.map_batches(size_rows, batch_format="pyarrow"),
                        ["component"], [("c", "sum")])
    if isinstance(sizes, pa.Table):
        sizes = ray.data.from_arrow(sizes)

    # pass 1: attach csize to each (node, component) label row.  Row
    # encoding: tag 0 = label row (payload=node), tag 1 = size row
    # (payload=csize); both keyed by k=component.
    def lab_rows(b: pa.Table) -> pa.Table:
        return pa.table({"k": b.column("component"), "p": b.column("node"),
                         "tag": pa.array(np.zeros(b.num_rows, np.int64))})

    def sz_rows(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("component"), np.int64)
        return pa.table({"k": pa.array(c), "p": b.column("c"),
                         "tag": pa.array(np.ones(c.size, np.int64))})

    def fill_size(g: pa.Table) -> pa.Table:
        k = np.asarray(g.column("k"), np.int64)
        p = np.asarray(g.column("p"), np.int64)
        tag = np.asarray(g.column("tag"), np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        sz = np.zeros(uk.size, np.int64)
        m1 = tag == 1
        sz[inv[m1]] = p[m1]          # exactly one size row per component
        m0 = ~m1
        return pa.table({"node": pa.array(p[m0], pa.int64()),
                         "component": pa.array(k[m0], pa.int64()),
                         "csize": pa.array(sz[inv[m0]], pa.int64())})

    labeled = _bucket_pass(
        comp.map_batches(lab_rows, batch_format="pyarrow").union(
            sizes.map_batches(sz_rows, batch_format="pyarrow")),
        fill_size)

    # pass 2: merge labels onto the full id table (singletons keep
    # themselves).  tag 0 = id row, tag 1 = labeled row (component,csize).
    def id_rows(b: pa.Table) -> pa.Table:
        i = np.asarray(b.column(id_col), np.int64)
        z = np.zeros(i.size, np.int64)
        return pa.table({"k": pa.array(i), "component": pa.array(i),
                         "csize": pa.array(z + 1), "tag": pa.array(z)})

    def lab2_rows(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("node"), np.int64)
        return pa.table({"k": pa.array(n), "component": b.column("component"),
                         "csize": b.column("csize"),
                         "tag": pa.array(np.ones(n.size, np.int64))})

    def merge(g: pa.Table) -> pa.Table:
        k = np.asarray(g.column("k"), np.int64)
        cm = np.asarray(g.column("component"), np.int64)
        cs = np.asarray(g.column("csize"), np.int64)
        tag = np.asarray(g.column("tag"), np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        m1 = tag == 1
        comp_of = uk.copy()          # default: singleton labels itself
        size_of = np.ones(uk.size, np.int64)
        comp_of[inv[m1]] = cm[m1]    # ≤1 label row per id by construction
        size_of[inv[m1]] = cs[m1]
        has_id = np.zeros(uk.size, bool)
        has_id[inv[tag == 0]] = True  # drop labels for ids outside `ids`
        comp_of, size_of, uk = comp_of[has_id], size_of[has_id], uk[has_id]
        return pa.table({id_col: pa.array(uk, pa.int64()),
                         "component": pa.array(comp_of, pa.int64()),
                         "csize": pa.array(size_of, pa.int64()),
                         "keep": pa.array((comp_of == uk).astype(np.int64))})

    sel = ids.select_columns([id_col])
    return _bucket_pass(
        sel.map_batches(id_rows, batch_format="pyarrow").union(
            labeled.map_batches(lab2_rows, batch_format="pyarrow")),
        merge)


def span_dedup(docs: "ray.data.Dataset", *, k: int = 5,
               id_col: str = "doc_id", text_col: str = "text",
               driver_limit: int = 4_000_000) -> "ray.data.Dataset":
    """Exact substring-span dedup (Lee et al. 2022 §4 ExactSubstr,
    word-granular): a ``k``-word gram that occurs at ≥2 (doc, pos)
    locations globally is a duplicated span; every NON-FIRST occurrence
    (ordered by doc id then position) is removed by dropping all words
    its window covers, and the surviving words are re-joined.  Differs
    from segment_dedup: spans are position-free and overlapping, so
    repeated passages are removed mid-document, not only on fixed
    segment boundaries.

    Scale shape: gram rows shuffle ONCE keyed by a 64-bit gram hash
    (whole hash groups per call; first-occurrence selection compares the
    actual gram strings inside the group, so hash collisions cannot
    merge distinct grams); the duplicate (doc, pos) markers then ride a
    second doc-keyed bucket shuffle together with the word rows, where
    coverage is a vectorized width-k window-OR (two cumsum reads) per
    document."""
    import ray.data as rd

    from .shuffle_utils import bucket_vectorized

    MUL = np.int64(1 << 20)

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        g_id, g_p, g_s = [], [], []
        for i, t in zip(ids, b.column(text_col).to_pylist()):
            words = t.split()
            for p in range(len(words) - k + 1):
                g_id.append(int(i))
                g_p.append(p + 1)  # 1-based, mirrors the SQL list slice
                g_s.append(" ".join(words[p:p + k]))
        h = _hash_bytes_to_u64(g_s).astype(np.int64)
        return pa.table({"doc_id": pa.array(np.asarray(g_id, np.int64)),
                         "p": pa.array(np.asarray(g_p, np.int64)),
                         "g": pa.array(g_s, pa.string()),
                         "h": pa.array(h)})

    grams = docs.map_batches(explode, batch_format="pyarrow")

    def non_first(t: pa.Table) -> pa.Table:
        g = np.asarray(t.column("g").to_pylist(), dtype=object)
        did = np.asarray(t.column("doc_id"), np.int64)
        p = np.asarray(t.column("p"), np.int64)
        comp = did * MUL + p
        uniq, inv = np.unique(g.astype(str), return_inverse=True)
        mins = np.full(uniq.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, comp)
        dup = comp != mins[inv]
        return pa.table({"doc_id": pa.array(did[dup]),
                         "p": pa.array(p[dup]),
                         "tag": pa.array(np.ones(int(dup.sum()), np.int64)),
                         "word": pa.array([""] * int(dup.sum()),
                                          pa.string())})

    dups = bucket_vectorized(grams, "h", non_first,
                             driver_limit=driver_limit)
    if isinstance(dups, pa.Table):
        dups = rd.from_arrow(dups)

    def words_rows(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        w_id, w_p, w_w = [], [], []
        for i, t in zip(ids, b.column(text_col).to_pylist()):
            for p, w in enumerate(t.split(), start=1):
                w_id.append(int(i))
                w_p.append(p)
                w_w.append(w)
        nn = len(w_id)
        return pa.table({"doc_id": pa.array(np.asarray(w_id, np.int64)),
                         "p": pa.array(np.asarray(w_p, np.int64)),
                         "tag": pa.array(np.zeros(nn, np.int64)),
                         "word": pa.array(w_w, pa.string())})

    words = docs.map_batches(words_rows, batch_format="pyarrow")
    tagged = words.union(dups)

    def resolve(t: pa.Table) -> pa.Table:
        did = np.asarray(t.column("doc_id"), np.int64)
        p = np.asarray(t.column("p"), np.int64)
        tag = np.asarray(t.column("tag"), np.int64)
        word = t.column("word").to_pylist()
        order = np.lexsort((tag, p, did))
        did, p, tag = did[order], p[order], tag[order]
        word = [word[int(i)] for i in order]
        out_id, out_txt, out_nw, out_rm = [], [], [], []
        uniq, start = np.unique(did, return_index=True)
        bounds = np.append(start, did.size)
        for u in range(uniq.size):
            s, e = bounds[u], bounds[u + 1]
            wmask = tag[s:e] == 0
            wp = p[s:e][wmask]
            ww = [word[int(i)] for i in np.nonzero(wmask)[0] + s]
            nw = wp.size
            flags = np.zeros(nw + 1, np.int64)
            dp = p[s:e][~wmask]
            flags[np.minimum(dp, nw)] += 1  # gram starts (1-based)
            c = np.cumsum(flags)
            # word w covered iff a dup gram starts in [w-k+1, w]
            lo = np.maximum(np.arange(1, nw + 1) - k, 0)
            covered = (c[np.arange(1, nw + 1)] - c[lo]) > 0
            keep = [ww[i] for i in range(nw) if not covered[i]]
            out_id.append(int(uniq[u]))
            out_txt.append(" ".join(keep))
            out_nw.append(nw)
            out_rm.append(int(covered.sum()))
        return pa.table({"doc_id": pa.array(np.asarray(out_id, np.int64)),
                         "clean_text": pa.array(out_txt, pa.string()),
                         "n_words": pa.array(np.asarray(out_nw, np.int64)),
                         "n_removed": pa.array(np.asarray(out_rm,
                                                          np.int64))})

    out = bucket_vectorized(tagged, "doc_id", resolve,
                            driver_limit=driver_limit)
    return rd.from_arrow(out) if isinstance(out, pa.Table) else out
