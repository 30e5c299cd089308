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
