"""Text analysis stages for training-data pipelines: language-ID, quality
scoring, token counting, fingerprinting — all stateless vectorized
``map_batches`` over the documents table.

Definitions are fixed and simple so DuckDB oracle SQL can reproduce the
token/quality metrics exactly (driver correctness gate); langid uses a
deterministic stopword/character heuristic (rows-only checkable)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# compiled ONCE at module import (per worker process) — the regex-compile
# analogue of the reference's per-worker cached state
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z]+)?|[^\sA-Za-z0-9]")
_WORD_RE = re.compile(r"[A-Za-z]+")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "on", "as"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "du", "est", "pour", "que", "dans"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "mit", "für", "auf", "ein", "eine", "nicht"},
}


def token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish subtoken count (regex pieces).

    n_ws_tokens matches DuckDB `len(string_split(trim(text), ' '))` ONLY for
    single-space text, so the SQL-matched definition here is:
      n_ws_tokens  = number of maximal whitespace-separated pieces
      n_chars      = UTF-8 character count
    """
    texts = batch.column(text_col).to_pylist()
    n_ws = [len(t.split()) for t in texts]
    n_re = [len(_TOKEN_RE.findall(t)) for t in texts]
    n_ch = [len(t) for t in texts]
    out = {c: batch.column(c) for c in batch.column_names if c != text_col}
    out["n_ws_tokens"] = pa.array(n_ws, pa.int64())
    out["n_re_tokens"] = pa.array(n_re, pa.int64())
    out["n_chars_calc"] = pa.array(n_ch, pa.int64())
    return pa.table(out)


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features (Gopher/C4-style rules, simplified):
    mean word length, alpha ratio, punct ratio, stopword ratio, plus a
    0-1 composite.  All ratios are exact rational arithmetic → SQL-matchable
    after fixed rounding."""
    texts = batch.column(text_col).to_pylist()
    rows = {"mean_word_len": [], "alpha_ratio": [], "punct_ratio": [],
            "stopword_ratio": [], "quality": []}

    def _r6(x: float) -> float:
        # half-UP at 6 digits: ratios are exact rationals that can land on
        # representable ties (e.g. 105/128), where Python round()'s
        # half-even disagrees with DuckDB round()'s half-away
        import math
        return math.floor(x * 1e6 + 0.5) / 1e6
    for t in texts:
        n = len(t)
        words = _WORD_RE.findall(t)
        n_alpha = sum(c.isalpha() for c in t)
        n_punct = sum(c in ".,;:!?'\"()-" for c in t)
        toks = [w.lower() for w in t.split()]
        n_stop = sum(tok.strip(".,;:!?'\"()-").lower() in _STOPWORDS["en"] for tok in toks)
        mwl = (sum(len(w) for w in words) / len(words)) if words else 0.0
        ar = n_alpha / n if n else 0.0
        pr = n_punct / n if n else 0.0
        sr = n_stop / len(toks) if toks else 0.0
        q = 0.0
        if 3.0 <= mwl <= 10.0:
            q += 0.4
        if ar >= 0.6:
            q += 0.3
        if sr >= 0.05:
            q += 0.3
        rows["mean_word_len"].append(_r6(mwl))
        rows["alpha_ratio"].append(_r6(ar))
        rows["punct_ratio"].append(_r6(pr))
        rows["stopword_ratio"].append(_r6(sr))
        rows["quality"].append(_r6(q))
    out = {c: batch.column(c) for c in batch.column_names if c != text_col}
    for k, v in rows.items():
        out[k] = pa.array(v, pa.float64())
    return pa.table(out)


def detect_language(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic stopword-vote language ID over {en, es, fr, de},
    'und' (undetermined) on ties/empty — an n-gram-heuristic stand-in for a
    fasttext model; the actor-pool plumbing is what a model-backed stage
    would reuse."""
    texts = batch.column(text_col).to_pylist()
    langs = []
    for t in texts:
        toks = [w.strip(".,;:!?'\"()-").lower() for w in t.split()]
        votes = {lang: sum(tok in sw for tok in toks) for lang, sw in _STOPWORDS.items()}
        best = max(votes.items(), key=lambda kv: (kv[1], kv[0]))
        second = sorted(votes.values())[-2] if len(votes) > 1 else 0
        langs.append(best[0] if best[1] > 0 and best[1] > second else "und")
    out = {c: batch.column(c) for c in batch.column_names if c != text_col}
    out["lang_pred"] = pa.array(langs, pa.string())
    return pa.table(out)


def fingerprint(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling-hash over each
    window of word 3-grams, XOR-combined — a compact dedup/similarity key."""
    from .dedup import _hash_bytes_to_u64, _splitmix
    texts = batch.column(text_col).to_pylist()
    fps = []
    for t in texts:
        toks = t.lower().split()
        if len(toks) < 3:
            fps.append(0)
            continue
        # Python's builtin hash() is per-process salted — NOT usable here;
        # deterministic content hash instead (same value on every worker)
        grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        h3 = _splitmix(_hash_bytes_to_u64(grams))
        if len(h3) >= window:
            mins = np.lib.stride_tricks.sliding_window_view(h3, window).min(axis=1)
        else:
            mins = h3
        fps.append(int(np.bitwise_xor.reduce(np.unique(mins))) - (1 << 63))
    out = {c: batch.column(c) for c in batch.column_names if c != text_col}
    out["fingerprint"] = pa.array(fps, pa.int64())
    return pa.table(out)


def top_tokens(docs: "object", *, k: int = 25,
               text_col: str = "text") -> pa.Table:
    """Exact heavy-hitter tokens over a corpus: whitespace tokenization,
    global counts, top-k with a deterministic tie-break (count desc,
    token asc).

    Scale shape: each batch collapses to its distinct (token, n) pairs —
    bounded by the batch vocabulary, not its length — and `grouped_agg`'s
    measured-size merge sums them (driver-side C++ group_by at small
    vocabularies, distributed groupby above the limit).  After the merge
    every token is a single row, so per-block top-k candidates are exact
    and the final k-row head is a driver-side sort of a bounded set."""
    from .shuffle_utils import grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column(text_col).to_pylist():
            toks.extend(t.split())
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"token": pa.array(list(u), pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    merged = grouped_agg(docs.map_batches(partial, batch_format="pyarrow"),
                         ["token"], [("n", "sum")])
    if not isinstance(merged, pa.Table):
        # distributed case: every token is one row post-merge, so per-block
        # top-k candidates are exact; ship ≤ k rows per block to the driver
        def block_topk(b: pa.Table) -> pa.Table:
            return _topk_table(b, k)
        parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                 for b in merged.map_batches(block_topk,
                                             batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")]
        merged = pa.concat_tables(parts) if parts else pa.table(
            {"token": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())})
    return _topk_table(merged, k)


def _topk_table(t: pa.Table, k: int) -> pa.Table:
    if isinstance(t, pa.RecordBatch):
        t = pa.Table.from_batches([t])
    n = np.asarray(t.column("n"), np.int64)
    toks = np.asarray(t.column("token").to_pylist(), dtype=object)
    order = np.lexsort((toks, -n))[:k]
    return pa.table({"token": pa.array(list(toks[order]), pa.string()),
                     "n": pa.array(n[order], pa.int64())})


def tfidf_top_term(docs: "object", *, text_col: str = "text",
                   id_col: str = "doc_id",
                   n_docs: int | None = None) -> "object":
    """Top TF-IDF term per document (score = tf · ln(N/df), rank by
    score desc / token asc) — the classic salient-term extractor for
    corpus triage.

    Scale shape, two grouped exchanges and nothing else:
    1. per batch: distinct (doc, token, tf) rows — a document's tokens
       live in one row, so tf needs NO shuffle;
    2. groupby(token): df = rows in the group (each row is a distinct
       doc×token), so document frequency and the score fall out of ONE
       co-shuffle — no separate df table, no join.  Tokens group via a
       splitmix of their bytes (string keys stripe; the group fn handles
       hash collisions by sub-grouping on the token itself);
    3. groupby(doc): per-batch best-of combiner (exact — the global
       max row of a doc is a batch max row), measured-size merge.
    Scores are quantized floor(x·1e6 + 0.5)/1e6 BEFORE ranking so the
    deterministic tie-break (token asc) applies to identical doubles on
    any engine (ln is libm on both sides)."""
    from .dedup import _hash_bytes_to_u64
    from .shuffle_utils import grouped_map_groups

    if n_docs is None:
        n_docs = docs.count()
    n_f = float(n_docs)

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for d, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            ts = t.split()
            if not ts:
                continue
            u, c = np.unique(np.asarray(ts, dtype=object),
                             return_counts=True)
            ids.extend([d] * len(u))
            toks.extend(list(u))
            tfs.extend(c.tolist())
        tkey = _hash_bytes_to_u64([str(t) for t in toks]) \
            .view(np.int64) if toks else np.array([], np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "tkey": pa.array(tkey, pa.int64())})

    def score_group(g: pa.Table) -> pa.Table:
        # one hash-key group may hold >1 token (collisions): df per
        # distinct token via sorted-segment counts
        toks = np.asarray(g.column("token").to_pylist(), dtype=object)
        order = np.argsort(toks, kind="stable")
        toks_s = toks[order]
        newk = np.empty(toks_s.size, bool)
        newk[0] = True
        newk[1:] = toks_s[1:] != toks_s[:-1]
        seg = np.cumsum(newk) - 1
        df_per_seg = np.bincount(seg)
        df = np.empty(toks.size, np.int64)
        df[order] = df_per_seg[seg]
        tf = np.asarray(g.column("tf"), np.int64).astype(np.float64)
        score = tf * np.log(n_f / df)
        score = np.floor(score * 1e6 + 0.5) / 1e6
        return pa.table({id_col: g.column(id_col),
                         "token": g.column("token"),
                         "tfidf": pa.array(score, pa.float64())})

    def best_per_doc(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        sc = np.asarray(b.column("tfidf"), np.float64)
        toks = np.asarray(b.column("token").to_pylist(), dtype=object)
        order = np.lexsort((toks, -sc, ids))
        idx = order[np.unique(ids[order], return_index=True)[1]]
        return b.take(pa.array(np.sort(idx), pa.int64()))

    scored = grouped_map_groups(
        docs.map_batches(tf_rows, batch_format="pyarrow"),
        "tkey", score_group)
    combined = scored.map_batches(best_per_doc, batch_format="pyarrow") \
        .map_batches(lambda b: b.select([id_col, "token", "tfidf"]),
                     batch_format="pyarrow")
    return grouped_map_groups(combined, id_col, best_per_doc)


def sequence_pack(docs: "object", *, capacity: int = 512,
                  id_col: str = "doc_id", text_col: str = "text",
                  driver_limit: int = 4_000_000) -> "object":
    """Concat-and-chunk sequence packing (the GPT-style training layout):
    documents are concatenated in id order into one token stream and split
    at fixed ``capacity`` boundaries; each doc reports its global start
    offset and the bin range it spans.  Zero-token docs count as 1 so
    every doc owns at least one slot.

    The global running offset is a DISTRIBUTED PREFIX SUM: contiguous
    id-range buckets (one sort-free shuffle — range bucketing preserves
    order across buckets by construction), per-bucket token sums collapse
    map-side to ≤ buckets×blocks partial rows whose exclusive prefix is
    computed once on the driver (one int per bucket — bounded by cluster
    size, not data), then each bucket resolves its docs with a vectorized
    in-group cumsum plus its carry-in.  No stage sees more than its
    bucket; nothing data-sized reaches the driver.
    """
    from ray.data.aggregate import Max, Min

    from .shuffle_utils import bucket_count, grouped_agg

    def toks_fn(b: pa.Table) -> pa.Table:
        w = [max(1, len(t.split())) for t in b.column(text_col).to_pylist()]
        return pa.table({id_col: b.column(id_col),
                         "w": pa.array(w, pa.int64())})

    toks = docs.map_batches(toks_fn, batch_format="pyarrow").materialize()
    mm = toks.aggregate(Min(id_col), Max(id_col))
    lo, hi = int(mm[f"min({id_col})"]), int(mm[f"max({id_col})"])
    nb = bucket_count()
    span = hi - lo + 1

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        bkt = ((ids - lo).astype(np.uint64) * np.uint64(nb)
               // np.uint64(span)).astype(np.int64)
        return b.append_column("bkt", pa.array(bkt))

    bucketed = toks.map_batches(add_bucket, batch_format="pyarrow") \
        .materialize()

    def bucket_sums(b: pa.Table) -> pa.Table:
        bkt = np.asarray(b.column("bkt"), np.int64)
        w = np.asarray(b.column("w"), np.int64)
        s = np.bincount(bkt, weights=w, minlength=0)
        nz = np.nonzero(s)[0]
        return pa.table({"bkt": pa.array(nz.astype(np.int64)),
                         "s": pa.array(s[nz].astype(np.int64))})

    sums = grouped_agg(bucketed.map_batches(bucket_sums,
                                            batch_format="pyarrow"),
                       ["bkt"], [("s", "sum")], driver_limit=driver_limit)
    if not isinstance(sums, pa.Table):  # ≤ nb rows — driver-safe by bound
        sums = pa.concat_tables(list(sums.iter_batches(
            batch_format="pyarrow")))
    full = np.zeros(nb, np.int64)
    full[np.asarray(sums.column("bkt"), np.int64)] = \
        np.asarray(sums.column("s"), np.int64)
    carries = np.concatenate([[0], np.cumsum(full)[:-1]])
    cap = np.int64(capacity)

    def resolve(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column(id_col), np.int64)
        w = np.asarray(g.column("w"), np.int64)
        order = np.argsort(ids, kind="stable")
        ids, w = ids[order], w[order]
        start = carries[int(g.column("bkt")[0].as_py())] \
            + np.concatenate([[0], np.cumsum(w)[:-1]])
        bin_first = start // cap
        bin_last = (start + w - 1) // cap
        return pa.table({id_col: pa.array(ids),
                         "n_tokens": pa.array(w),
                         "start_off": pa.array(start.astype(np.int64)),
                         "bin_first": pa.array(bin_first.astype(np.int64)),
                         "bin_last": pa.array(bin_last.astype(np.int64)),
                         "n_bins": pa.array((bin_last - bin_first
                                             + 1).astype(np.int64))})

    return bucketed.groupby("bkt").map_groups(resolve,
                                              batch_format="pyarrow")


def repetition_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals over word 2-grams:
    the fraction of all 2-grams taken by the single most frequent one, and
    the duplicate fraction (1 − distinct/total).  Both quantized half-up
    6 dp (floor(x·1e6+0.5)/1e6 — matches DuckDB, not Python round()).
    Docs with < 2 tokens emit zeros."""
    texts = batch.column(text_col).to_pylist()
    top, dup, tot = [], [], []
    for t in texts:
        toks = t.split()
        n = len(toks) - 1
        if n < 1:
            top.append(0.0); dup.append(0.0); tot.append(0)
            continue
        from collections import Counter
        c = Counter(zip(toks, toks[1:]))
        mx, nd = max(c.values()), len(c)
        top.append(float(np.floor(mx / n * 1e6 + 0.5) / 1e6))
        dup.append(float(np.floor((n - nd) / n * 1e6 + 0.5) / 1e6))
        tot.append(n)
    out = {c: batch.column(c) for c in batch.column_names if c != text_col}
    out["n_2grams"] = pa.array(tot, pa.int64())
    out["top_2gram_frac"] = pa.array(top, pa.float64())
    out["dup_2gram_frac"] = pa.array(dup, pa.float64())
    return pa.table(out)


def chunk_tokens(batch: pa.Table, *, window: int = 64, stride: int = 48,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """RAG/training-style overlapping token chunking: whitespace tokens,
    fixed ``window``-token chunks every ``stride`` tokens (chunk starts at
    0, stride, 2·stride, … while start < n_tokens).  A zero-token doc
    still emits one empty chunk so every doc survives into the output.
    Stateless flat expansion — one doc's chunks never cross a batch."""
    ids, cids, starts, lens, texts_out = [], [], [], [], []
    id_vals = batch.column(id_col).to_pylist()
    for did, t in zip(id_vals, batch.column(text_col).to_pylist()):
        toks = t.split()
        n = max(len(toks), 1)
        s = 0
        cid = 0
        while s < n:
            chunk = toks[s:s + window]
            ids.append(did)
            cids.append(cid)
            starts.append(s)
            lens.append(len(chunk))
            texts_out.append(" ".join(chunk))
            cid += 1
            s += stride
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "chunk_id": pa.array(cids, pa.int64()),
                     "tok_start": pa.array(starts, pa.int64()),
                     "n_chunk_tokens": pa.array(lens, pa.int64()),
                     "chunk_text": pa.array(texts_out, pa.string())})


def unigram_nll(docs: "object", *, id_col: str = "doc_id",
                text_col: str = "text") -> "object":
    """Corpus-unigram-LM perplexity proxy per document: each token's
    negative log-probability under the corpus's OWN unigram distribution
    (−ln(c/T) = ln(T/c)), averaged over the document — the classic
    language-model quality filter of training-data pipelines (documents
    with high NLL are off-distribution / noise).

    Scale shape (mirrors ``tfidf_top_term``): distinct (doc, token, tf)
    rows — tf needs no shuffle — through ONE groupby(token-hash)
    co-shuffle; all occurrences of a token land in one group, so the
    GLOBAL token count is an in-group segment sum and no separate count
    table or join exists.  The corpus total T is one scalar
    pre-aggregate.  Per-token logprobs are quantized to int64
    (floor(1e6·ln(T/c))) BEFORE summation, so float addition order can
    never perturb the result (the repo's oracle-parity discipline); the
    only float ops are one ln and two final divisions, identical on the
    DuckDB side."""
    from .dedup import _hash_bytes_to_u64
    from .shuffle_utils import grouped_agg, grouped_map_groups

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for d, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            ts = t.split()
            if not ts:
                continue
            u, c = np.unique(np.asarray(ts, dtype=object),
                             return_counts=True)
            ids.extend([d] * len(u))
            toks.extend(list(u))
            tfs.extend(c.tolist())
        tkey = _hash_bytes_to_u64([str(t) for t in toks]) \
            .view(np.int64) if toks else np.array([], np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "tkey": pa.array(tkey, pa.int64())})

    def empty_rows(batch: pa.Table) -> pa.Table:
        ids = [d for d, t in zip(batch.column(id_col).to_pylist(),
                                 batch.column(text_col).to_pylist())
               if not t.split()]
        z = np.zeros(len(ids), np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "nll_q": pa.array(z), "n": pa.array(z)})

    tf = docs.map_batches(tf_rows, batch_format="pyarrow").materialize()
    total = tf.sum("tf") or 0
    t_f = float(total)

    def nll_group(g: pa.Table) -> pa.Table:
        # a hash-key group may hold >1 token (collisions): global count
        # per distinct token via sorted-segment sums of tf
        toks = np.asarray(g.column("token").to_pylist(), dtype=object)
        order = np.argsort(toks, kind="stable")
        toks_s = toks[order]
        newk = np.empty(toks_s.size, bool)
        newk[0] = True
        newk[1:] = toks_s[1:] != toks_s[:-1]
        starts = np.nonzero(newk)[0]
        seg = np.cumsum(newk) - 1
        tf_s = np.asarray(g.column("tf"), np.int64)[order]
        c_seg = np.add.reduceat(tf_s, starts)
        lp_q = np.floor(1e6 * np.log(t_f / c_seg.astype(np.float64))) \
            .astype(np.int64)
        contrib = tf_s * lp_q[seg]
        ids = np.asarray(g.column(id_col), np.int64)[order]
        return pa.table({id_col: pa.array(ids),
                         "nll_q": pa.array(contrib),
                         "n": pa.array(tf_s)})

    parts = grouped_map_groups(tf, "tkey", nll_group).union(
        docs.map_batches(empty_rows, batch_format="pyarrow"))
    agg = grouped_agg(parts, [id_col], [("nll_q", "sum"), ("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        q = np.asarray(b.column("nll_q"), np.int64)
        n = np.asarray(b.column("n"), np.int64)
        avg = np.where(n > 0, (q.astype(np.float64)
                               / np.maximum(n, 1).astype(np.float64)) / 1e6,
                       0.0)
        return pa.table({id_col: b.column(id_col),
                         "n_tokens": pa.array(n),
                         "nll_q": pa.array(q),
                         "avg_nll": pa.array(avg, pa.float64())})

    if isinstance(agg, pa.Table):
        import ray.data as _rd
        return _rd.from_arrow(finish(agg))
    return agg.map_batches(finish, batch_format="pyarrow")


_C4_STOPWORDS = ("the", "a", "of", "to", "and", "in")


def c4_quality_filter(batch: pa.Table, *, text_col: str = "text",
                      min_tokens: int = 20, max_tokens: int = 1000,
                      min_meanlen: float = 4.0, max_meanlen: float = 5.0,
                      min_stop_frac: float = 0.02) -> pa.Table:
    """C4-style composite quality gate (Raffel et al. 2020 §2.2 adapted to
    a line-less corpus): token-count bounds, mean-token-length band and a
    minimum stopword fraction, folded into per-reason flags, a reason
    BITMASK (1=short, 2=long, 4=meanlen, 8=stopword) and the final keep.
    Stateless vectorized map_batches; fractions are half-up 6dp and the
    band tests run on the QUANTIZED values so both engines compare
    identical doubles (CLAUDE.md tie rule)."""
    texts = batch.column(text_col).to_pylist()
    n_tok = np.empty(len(texts), np.int64)
    sumlen = np.empty(len(texts), np.int64)
    n_stop = np.empty(len(texts), np.int64)
    stopset = set(_C4_STOPWORDS)
    for i, t in enumerate(texts):
        toks = t.split()
        n_tok[i] = max(len(toks), 1)
        sumlen[i] = sum(len(w) for w in toks)
        n_stop[i] = sum(1 for w in toks if w in stopset)
    meanlen = np.floor(sumlen / n_tok * 1e6 + 0.5) / 1e6
    stopf = np.floor(n_stop / n_tok * 1e6 + 0.5) / 1e6
    f_short = (n_tok < min_tokens).astype(np.int64)
    f_long = (n_tok > max_tokens).astype(np.int64)
    f_mean = ((meanlen < min_meanlen) | (meanlen > max_meanlen)) \
        .astype(np.int64)
    f_stop = (stopf < min_stop_frac).astype(np.int64)
    reasons = f_short + 2 * f_long + 4 * f_mean + 8 * f_stop
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tok),
        "mean_token_len": pa.array(meanlen),
        "stopword_frac": pa.array(stopf),
        "reasons": pa.array(reasons),
        "keep": pa.array((reasons == 0).astype(np.int64))})


def pii_scrub(batch: pa.Table, *, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """PII redaction + normalization (the C4/RefinedWeb scrub stage):
    lowercase, redact e-mail/phone patterns, collapse whitespace.  The
    corpus has no organic PII, so a deterministic contact block derived
    from the doc id is planted first (repeated id%3+1 times so redaction
    counts vary) — the scrub itself is the real RE2 regex pipeline, and
    both engines (pyarrow.compute and DuckDB) run the SAME RE2 patterns
    in the SAME order.  Stateless vectorized map — no shuffle."""
    ids = np.asarray(batch.column(id_col), np.int64)
    texts = batch.column(text_col).to_pylist()
    aug = []
    for i, t in zip(ids, texts):
        block = (f" contact user{i}@mail{i % 7}.com"
                 f" call +1-555-{i % 10000:04d}")
        aug.append(t + block * (int(i) % 3 + 1))
    arr = pc.utf8_lower(pa.array(aug, pa.string()))
    n_email = pc.count_substring_regex(arr, r"user[0-9]+@mail[0-9]+\.com")
    n_phone = pc.count_substring_regex(arr, r"\+1-555-[0-9]{4}")
    out = pc.replace_substring_regex(arr, r"user[0-9]+@mail[0-9]+\.com",
                                     "<EMAIL>")
    out = pc.replace_substring_regex(out, r"\+1-555-[0-9]{4}", "<PHONE>")
    out = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(out, r"\s+", " "))
    n = pc.add(pc.cast(n_email, pa.int64()), pc.cast(n_phone, pa.int64()))
    return pa.table({id_col: batch.column(id_col),
                     "n_redacted": n, "clean": out})


def segment_dedup(docs: "object", *, seg_words: int = 10,
                  id_col: str = "doc_id", text_col: str = "text",
                  driver_limit: int = 4_000_000) -> "object":
    """Segment-level (RefinedWeb 'line-level') exact dedup: split every
    document into ``seg_words``-word segments, keep only the globally
    FIRST occurrence of each distinct segment (ordered by doc id then
    position), and reassemble the surviving text.

    Scale shape: segments are grouped by a 64-bit content hash through
    ONE ``bucket_vectorized`` shuffle (whole hash groups per call; the
    per-segment min is np.minimum.at over the string-deduplicated
    inverse, guarding hash collisions by comparing the actual strings);
    reassembly is a second bucketed pass keyed on the doc id.  Documents
    whose every segment was seen earlier survive as empty rows via a
    left join against the per-doc segment totals — nothing materializes
    on the driver beyond grouped_agg's measured-size contract."""
    from .dedup import _hash_bytes_to_u64
    from .shuffle_utils import bucket_vectorized

    MUL = np.int64(1 << 20)

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        out_id, out_idx, out_seg = [], [], []
        for i, t in zip(ids, b.column(text_col).to_pylist()):
            words = t.split()
            for j in range(0, len(words), seg_words):
                out_id.append(int(i))
                out_idx.append(j // seg_words + 1)
                out_seg.append(" ".join(words[j:j + seg_words]))
        h = _hash_bytes_to_u64(out_seg).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.asarray(out_id, np.int64)),
            "idx": pa.array(np.asarray(out_idx, np.int64)),
            "seg": pa.array(out_seg, pa.string()),
            "h": pa.array(h),
        })

    lines = docs.map_batches(explode, batch_format="pyarrow")

    def keep_first(t: pa.Table) -> pa.Table:
        seg = np.asarray(t.column("seg").to_pylist(), dtype=object)
        did = np.asarray(t.column("doc_id"), np.int64)
        idx = np.asarray(t.column("idx"), np.int64)
        comp = did * MUL + idx
        uniq, inv = np.unique(seg.astype(str), return_inverse=True)
        mins = np.full(uniq.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, comp)
        keep = comp == mins[inv]
        return pa.table({"doc_id": pa.array(did[keep]),
                         "idx": pa.array(idx[keep]),
                         "seg": t.column("seg").filter(pa.array(keep))})

    kept = bucket_vectorized(lines, "h", keep_first,
                             driver_limit=driver_limit)

    def reassemble(t: pa.Table) -> pa.Table:
        did = np.asarray(t.column("doc_id"), np.int64)
        idx = np.asarray(t.column("idx"), np.int64)
        seg = t.column("seg").to_pylist()
        order = np.lexsort((idx, did))
        did, idx = did[order], idx[order]
        seg = [seg[int(i)] for i in order]
        uniq, start = np.unique(did, return_index=True)
        bounds = np.append(start, did.size)
        texts = [" ".join(seg[bounds[k]:bounds[k + 1]])
                 for k in range(uniq.size)]
        n_kept = np.diff(bounds)
        return pa.table({"doc_id": pa.array(uniq),
                         "clean_text": pa.array(texts, pa.string()),
                         "n_kept": pa.array(n_kept.astype(np.int64))})

    re_ds = bucket_vectorized(kept, "doc_id", reassemble,
                              driver_limit=driver_limit)
    import ray.data as rd
    if isinstance(re_ds, pa.Table):
        re_ds = rd.from_arrow(re_ds)

    def totals(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        nseg = np.asarray(
            [max(1, -(-len(t.split()) // seg_words)) if t.split() else 0
             for t in b.column(text_col).to_pylist()], np.int64)
        return pa.table({"base_id": pa.array(ids),
                         "n_total": pa.array(nseg)})

    from .relational import _join_partitions
    base = docs.map_batches(totals, batch_format="pyarrow")
    j = base.join(re_ds, join_type="left_outer",
                  num_partitions=_join_partitions(),
                  on=("base_id",), right_on=("doc_id",))

    def finish(b: pa.Table) -> pa.Table:
        clean = b.column("clean_text")
        nk = b.column("n_kept")
        return pa.table({
            "doc_id": b.column("base_id"),
            "clean_text": pc.coalesce(clean, pa.scalar("", pa.string())),
            "n_kept": pc.coalesce(pc.cast(nk, pa.int64()),
                                  pa.scalar(0, pa.int64())),
            "n_total": b.column("n_total"),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def importance_weights(docs: "object", *, id_col: str = "doc_id",
                       text_col: str = "text", target_col: str = "lang",
                       target_val: str = "en") -> "object":
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    'Data Selection for Language Models via Importance Resampling'):
    per-document log importance weight under unigram bag-of-words models
    of a TARGET slice (here ``lang == target_val``) versus the full
    corpus as background,

        logw(d) = Σ_tok tf · ln( ((c_t+1)(T_b+1)) / ((c_b+1)(T_t+1)) )

    with add-one smoothing.  High-weight documents look like the target
    distribution and would be upsampled by importance resampling.

    Scale shape mirrors ``unigram_nll``: distinct (doc, token, tf,
    is_target) rows through ONE token-hash co-shuffle; target and
    background counts are BOTH in-group segment sums (no second pass, no
    count-table join); per-token log-ratios are quantized to int64
    before summation so float order never matters — inside the quantizer
    sit exact int64 products and ONE division + ln, identical in
    DuckDB."""
    from .dedup import _hash_bytes_to_u64
    from .shuffle_utils import grouped_agg, grouped_map_groups

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, toks, tfs, tgt = [], [], [], []
        for d, t, lv in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist(),
                            batch.column(target_col).to_pylist()):
            ts = t.split()
            if not ts:
                continue
            u, c = np.unique(np.asarray(ts, dtype=object),
                             return_counts=True)
            ids.extend([d] * len(u))
            toks.extend(list(u))
            tfs.extend(c.tolist())
            tgt.extend([1 if lv == target_val else 0] * len(u))
        tkey = _hash_bytes_to_u64([str(t) for t in toks]) \
            .view(np.int64) if toks else np.array([], np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "is_t": pa.array(tgt, pa.int64()),
                         "tkey": pa.array(tkey, pa.int64())})

    def empty_rows(batch: pa.Table) -> pa.Table:
        ids = [d for d, t in zip(batch.column(id_col).to_pylist(),
                                 batch.column(text_col).to_pylist())
               if not t.split()]
        z = np.zeros(len(ids), np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "logw_q": pa.array(z), "n": pa.array(z)})

    tf = docs.map_batches(tf_rows, batch_format="pyarrow").materialize()
    t_b = int(tf.sum("tf") or 0)
    t_t = 0
    for b in tf.map_batches(
            lambda t: pa.table({"s": pa.array(
                [int(np.sum(np.asarray(t.column("tf"), np.int64)
                            * np.asarray(t.column("is_t"), np.int64)))],
                pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        t_t += int(np.sum(np.asarray(b.column("s"), np.int64)))

    def ratio_group(g: pa.Table) -> pa.Table:
        toks = np.asarray(g.column("token").to_pylist(), dtype=object)
        order = np.argsort(toks, kind="stable")
        toks_s = toks[order]
        newk = np.empty(toks_s.size, bool)
        newk[0] = True
        newk[1:] = toks_s[1:] != toks_s[:-1]
        starts = np.nonzero(newk)[0]
        seg = np.cumsum(newk) - 1
        tf_s = np.asarray(g.column("tf"), np.int64)[order]
        it_s = np.asarray(g.column("is_t"), np.int64)[order]
        c_b = np.add.reduceat(tf_s, starts)
        c_t = np.add.reduceat(tf_s * it_s, starts)
        num = (c_t + 1) * np.int64(t_b + 1)
        den = (c_b + 1) * np.int64(t_t + 1)
        q = np.floor(1e6 * np.log(num.astype(np.float64)
                                  / den.astype(np.float64))) \
            .astype(np.int64)
        contrib = tf_s * q[seg]
        ids = np.asarray(g.column(id_col), np.int64)[order]
        return pa.table({id_col: pa.array(ids),
                         "logw_q": pa.array(contrib),
                         "n": pa.array(tf_s)})

    parts = grouped_map_groups(tf, "tkey", ratio_group).union(
        docs.map_batches(empty_rows, batch_format="pyarrow"))
    agg = grouped_agg(parts, [id_col], [("logw_q", "sum"), ("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        q = np.asarray(b.column("logw_q"), np.int64)
        n = np.asarray(b.column("n"), np.int64)
        return pa.table({id_col: b.column(id_col),
                         "n_tokens": pa.array(n),
                         "logw_q": pa.array(q),
                         "logw": pa.array(q / 1e6, pa.float64())})

    if isinstance(agg, pa.Table):
        import ray.data as _rd
        return _rd.from_arrow(finish(agg))
    return agg.map_batches(finish, batch_format="pyarrow")


def bpe_pair_counts(ds: "ray.data.Dataset", *, text_col: str = "text",
                    top_k: int = 32) -> "ray.data.Dataset":
    """Adjacent byte-pair frequency counting (BPE tokenizer training's
    merge-candidate step): one bincount partial per batch over a single
    concatenated byte buffer (doc boundaries masked), bounded <=65536-key
    merge, top-k by count.  The pipeline-stage form of
    ``relational.text_bpe_pairs_q``."""
    import ray as _ray

    from .shuffle_utils import grouped_sum_int64

    def partial(b: pa.Table) -> pa.Table:
        bufs = [t.encode("utf-8") for t in b.column(text_col).to_pylist()]
        lens = np.array([len(x) for x in bufs], dtype=np.int64)
        if lens.sum() < 2:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        cat = np.frombuffer(b"".join(bufs), np.uint8).astype(np.int64)
        pairs = cat[:-1] * 256 + cat[1:]
        valid = np.ones(len(cat) - 1, dtype=bool)
        # position i crosses a boundary iff i+1 is an interior doc
        # start; empty first/last docs put start-1 out of [0, n-2] and
        # must be DROPPED, not clipped onto a real pair
        cross = np.cumsum(lens)[:-1] - 1
        cross = cross[(cross >= 0) & (cross < len(valid))]
        valid[cross] = False
        cnt = np.bincount(pairs[valid], minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.table({"pair": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    merged = grouped_sum_int64(
        ds.map_batches(partial, batch_format="pyarrow"), "pair", "cnt")
    if not isinstance(merged, pa.Table):
        merged = pa.concat_tables(
            list(merged.iter_batches(batch_format="pyarrow")))
    p = np.asarray(merged.column("pair"), np.int64)
    c = np.asarray(merged.column("cnt"), np.int64)
    order = np.lexsort((p, -c))[:top_k]
    p, c = p[order], c[order]
    return _ray.data.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, len(p) + 1), pa.int64()),
        "pair_key": pa.array(p, pa.int64()),
        "c1": pa.array(p // 256, pa.int64()),
        "c2": pa.array(p % 256, pa.int64()),
        "cnt": pa.array(c, pa.int64())}))


def source_cap(ds: "ray.data.Dataset", *, key_col: str = "source",
               id_col: str = "doc_id", cap: int = 50) -> "ray.data.Dataset":
    """Per-source rate limiting: keep at most ``cap`` rows per source,
    ranked by splitmix64(id) — deterministic, RNG-free.  Batch combiner
    keeps per-batch survivors only, then a measured-size grouped finish.
    The pipeline-stage form of ``relational.q_source_cap``."""
    from .dedup import _splitmix
    from .relational import hash_source
    from .shuffle_utils import grouped_map_groups

    def combine(b: pa.Table) -> pa.Table:
        did = np.asarray(b.column(id_col), np.int64)
        hv = _splitmix(did.astype(np.uint64)).astype(np.int64)
        src = np.asarray(b.column(key_col).cast(pa.string()))
        skey = np.array([hash_source(s) for s in src], dtype=np.int64)
        order = np.lexsort((did, hv, skey))
        ss = skey[order]
        newk = np.empty(ss.size, bool)
        if ss.size:
            newk[0] = True
            newk[1:] = ss[1:] != ss[:-1]
        starts = np.flatnonzero(newk)
        rank = np.arange(ss.size) - np.repeat(
            starts, np.diff(np.append(starts, ss.size)))
        keep = order[rank < cap]
        out = b.take(pa.array(keep, pa.int64()))
        return out.append_column(
            "skey", pa.array(skey[keep], pa.int64())).append_column(
            "hv", pa.array(hv[keep], pa.int64()))

    def per_group(g: pa.Table) -> pa.Table:
        hv = np.asarray(g.column("hv"), np.int64)
        did = np.asarray(g.column(id_col), np.int64)
        order = np.lexsort((did, hv))[:cap]
        out = g.take(pa.array(order, pa.int64()))
        rk = pa.array(np.arange(1, out.num_rows + 1), pa.int64())
        return pa.table({key_col: out.column(key_col),
                         id_col: out.column(id_col),
                         "rk": rk})

    return grouped_map_groups(
        ds.map_batches(combine, batch_format="pyarrow"), "skey", per_group)


def unigram_logprob(ds: "ray.data.Dataset", *, text_col: str = "text",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """Unigram language-model scoring (the KenLM-perplexity-filter
    analog, CCNet-style): pass 1 aggregates GLOBAL character frequencies
    (one 256-bin bincount partial per batch, bounded-key merge); the
    256-entry quantized log-prob table broadcasts to pass 2, which sums
    ``floor(ln(cnt/total) * 2^20)`` per document — per-char flooring
    BEFORE the sum keeps the integer score order-free, so the score is
    exactly replayable (ln is libm on both engines)."""
    from .shuffle_utils import grouped_sum_int64

    def freq_partial(b: pa.Table) -> pa.Table:
        bufs = [t.encode("utf-8") for t in b.column(text_col).to_pylist()]
        if not bufs:
            return pa.table({"ch": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        cat = np.frombuffer(b"".join(bufs), np.uint8)
        cnt = np.bincount(cat, minlength=256)
        nz = np.flatnonzero(cnt)
        return pa.table({"ch": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    merged = grouped_sum_int64(
        ds.map_batches(freq_partial, batch_format="pyarrow"), "ch", "cnt")
    if not isinstance(merged, pa.Table):          # bounded: <=256 keys
        merged = pa.concat_tables(
            list(merged.iter_batches(batch_format="pyarrow")))
    counts = np.zeros(256, dtype=np.int64)
    counts[np.asarray(merged.column("ch"), np.int64)] = \
        np.asarray(merged.column("cnt"), np.int64)
    total = float(counts.sum())
    logq = np.full(256, np.iinfo(np.int64).min, dtype=np.int64)
    pos = counts > 0
    logq[pos] = np.floor(np.log(counts[pos] / total) * 1048576.0) \
        .astype(np.int64)

    def score(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), np.int64)
        texts = b.column(text_col).to_pylist()
        lp = np.empty(len(texts), dtype=np.int64)
        nch = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            a = np.frombuffer(t.encode("utf-8"), np.uint8)
            nch[i] = len(a)
            lp[i] = int(logq[a].sum()) if len(a) else 0
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "nch": pa.array(nch, pa.int64()),
                         "lp_q": pa.array(lp, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def _bpe_apply(tokens: np.ndarray, starts: np.ndarray,
               merges: list) -> tuple[np.ndarray, np.ndarray]:
    """Apply ranked BPE merges to a concatenated token array with doc
    boundaries.  Greedy leftmost-first non-overlapping matching, one
    vectorized pass per merge: non-equal pairs cannot overlap; equal-pair
    runs (aaaa) take even positions within each run — exactly the
    sequential greedy outcome."""
    seg = np.zeros(len(tokens), dtype=np.int64)
    # interior doc starts; empty trailing docs produce starts == len
    # (out of range) and empty interior docs produce duplicates — both
    # are safe to drop/collapse (a single transition point suffices)
    interior = starts[1:-1]
    seg[interior[interior < len(tokens)]] = 1
    seg = np.cumsum(seg)
    for (a, b), new_id in merges:
        if len(tokens) < 2:
            break
        m = (tokens[:-1] == a) & (tokens[1:] == b) & (seg[:-1] == seg[1:])
        if a == b:
            run_start = m & ~np.concatenate([[False], m[:-1]])
            run_id = np.cumsum(run_start)
            pos_in_run = np.arange(len(m)) - \
                np.maximum.accumulate(np.where(run_start,
                                               np.arange(len(m)), -1))
            m = m & ((pos_in_run & 1) == 0)
        idx = np.flatnonzero(m)
        if len(idx) == 0:
            continue
        tokens = tokens.copy()
        tokens[idx] = new_id
        keep = np.ones(len(tokens), dtype=bool)
        keep[idx + 1] = False
        tokens = tokens[keep]
        seg = seg[keep]
    return tokens, seg


def bpe_train(ds: "ray.data.Dataset", *, n_merges: int = 3,
              text_col: str = "text") -> "pa.Table":
    """Iterative BPE tokenizer training (Sennrich et al. 2016) over the
    corpus: ``n_merges`` rounds, each ONE distributed pass — apply the
    merges learned so far (broadcast via closure; tiny), count adjacent
    token pairs (one packed-key bincount per batch, doc-boundary
    masked), merge the bounded pair domain, pick the global argmax
    (ties -> smallest packed key).  Returns the ranked merge table
    (rank, tok_a, tok_b, new_id, cnt).  Re-tokenizes from bytes each
    round (k small; stateless map_batches keeps the scale shape)."""
    from .shuffle_utils import grouped_sum_int64

    V = 65536                                    # pair packing base
    merges: list = []
    counts: list = []

    for r in range(n_merges):
        cur = list(merges)

        def partial(b: pa.Table, _cur=cur) -> pa.Table:
            bufs = [t.encode("utf-8")
                    for t in b.column(text_col).to_pylist()]
            lens = np.array([len(x) for x in bufs], dtype=np.int64)
            if lens.sum() < 2:
                return pa.table({"pair": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            cat = np.frombuffer(b"".join(bufs), np.uint8).astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(lens)])
            toks, seg = _bpe_apply(cat, starts, _cur)
            if len(toks) < 2:
                return pa.table({"pair": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            ok = seg[:-1] == seg[1:]
            pairs = toks[:-1][ok] * V + toks[1:][ok]
            uniq, cnt = np.unique(pairs, return_counts=True)
            return pa.table({"pair": pa.array(uniq, pa.int64()),
                             "cnt": pa.array(cnt, pa.int64())})

        merged = grouped_sum_int64(
            ds.map_batches(partial, batch_format="pyarrow"),
            "pair", "cnt")
        if not isinstance(merged, pa.Table):
            merged = pa.concat_tables(
                list(merged.iter_batches(batch_format="pyarrow")))
        p = np.asarray(merged.column("pair"), np.int64)
        c = np.asarray(merged.column("cnt"), np.int64)
        if len(p) == 0:
            break
        best = np.lexsort((p, -c))[0]
        merges.append(((int(p[best]) // V, int(p[best]) % V), 256 + r))
        counts.append(int(c[best]))

    return pa.table({
        "rank": pa.array(np.arange(1, len(merges) + 1), pa.int64()),
        "tok_a": pa.array([m[0][0] for m in merges], pa.int64()),
        "tok_b": pa.array([m[0][1] for m in merges], pa.int64()),
        "new_id": pa.array([m[1] for m in merges], pa.int64()),
        "cnt": pa.array(counts, pa.int64())})


def temperature_mix(ds: "ray.data.Dataset", *, alpha: float = 0.5,
                    key_col: str = "source",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """Temperature-based source mixing (the multilingual/data-mixture
    sampler, e.g. mC4/XLM-R: sample source s with probability
    proportional to n_s^alpha).  Per-doc keep rate r_s =
    (n_s/n_min)^(alpha-1), so the smallest source keeps everything and
    large sources are downweighted.  Two passes: a bounded
    per-source count (groupby over the small source domain, driver
    fold), then ONE stateless filter with deterministic
    splitmix64(doc_id) thresholds — RNG-free, partition-invariant, and
    exactly replayable (the n_s/n_min division and libm pow produce
    bit-identical doubles in DuckDB; the threshold is floored to 2^53
    then rescaled, one fixed float chain)."""
    from .dedup import _splitmix
    from .relational import hash_source

    counts: dict[int, int] = {}
    src_of_key: dict[int, str] = {}

    def cnt_partial(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column(key_col).cast(pa.string()))
        keys = np.array([hash_source(s) for s in src], dtype=np.int64)
        uniq, c = np.unique(keys, return_counts=True)
        first = {int(k): s for k, s in zip(keys, src)}
        return pa.table({
            "skey": pa.array(uniq, pa.int64()),
            "cnt": pa.array(c, pa.int64()),
            "sname": pa.array([first[int(k)] for k in uniq], pa.string())})

    for b in ds.map_batches(cnt_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):      # bounded domain
        for k, c, s in zip(b.column("skey").to_pylist(),
                           b.column("cnt").to_pylist(),
                           b.column("sname").to_pylist()):
            counts[k] = counts.get(k, 0) + c
            src_of_key[k] = s
    if not counts:
        return ds.limit(0)
    nmin = min(counts.values())
    thr: dict[int, int] = {}
    for k, n in counts.items():
        r = (n / nmin) ** (alpha - 1.0)       # one fixed float chain
        thr[k] = int(np.floor(r * 9007199254740992.0)) * 2048

    def keep(b: pa.Table) -> pa.Table:
        did = np.asarray(b.column(id_col), np.int64)
        hv = _splitmix(did.astype(np.uint64))
        src = np.asarray(b.column(key_col).cast(pa.string()))
        keys = np.array([hash_source(s) for s in src], dtype=np.int64)
        t = np.array([thr[int(k)] for k in keys], dtype=object)
        mask = np.array([int(h) < int(tt) for h, tt in zip(hv, t)],
                        dtype=bool)           # t can be exactly 2^64
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
