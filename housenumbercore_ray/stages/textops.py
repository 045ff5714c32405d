"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — vectorized ``map_batches`` stages over a document
table. Semantics chosen to be independently reproducible in SQL for the
oracle (see __ray_entry__.oracle_sql):

  - token count: whitespace tokenization of the trimmed text;
  - quality: stopword ratio, punctuation ratio, mean token length;
  - language ID: per-language stopword-hit counts, argmax with fixed
    tie-break order (de > en > fr > it > unknown);
  - fingerprint: md5 content hash (SQL: md5(text)); plus a rolling-hash
    winnowing fingerprint (rows-only, unit-tested) for shingle-level
    matching.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

#: codepoints Python's str.split() / unicode ``\s`` treat as whitespace but
#: DuckDB's RE2 ``\s`` (ASCII-only) does not. token_stats / quality_scores /
#: lang_id normalize them to ' ' BEFORE tokenizing — identity on ASCII text,
#: and it makes the Python-vs-SQL token parity hold for ALL inputs, not just
#: ASCII-whitespace ones (the oracle applies the same regexp_replace). The
#: substitution is length-preserving, so char-level stats are unaffected.
EXOTIC_WS_CLASS = ("\x1c-\x1f\x85\xa0\u1680\u2000-\u200a"
                   "\u2028\u2029\u202f\u205f\u3000")
_EXOTIC_WS_RE = re.compile(f"[{EXOTIC_WS_CLASS}]")
#: the same class in RE2 syntax for the DuckDB oracle
EXOTIC_WS_RE2 = (r"[\x{001C}-\x{001F}\x{0085}\x{00A0}\x{1680}"
                 r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]")


def _norm_ws(series: pd.Series) -> pd.Series:
    return series.fillna("").str.replace(_EXOTIC_WS_RE, " ", regex=True)

STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "auf", "für"],
    "en": ["the", "and", "is", "not", "with", "a", "on", "for", "of", "to"],
    "fr": ["le", "la", "et", "est", "pas", "avec", "un", "sur", "pour", "de"],
    "it": ["il", "la", "e", "è", "non", "con", "un", "su", "per", "di"],
}
LANG_ORDER = ["de", "en", "fr", "it"]
PUNCT = ".,;:!?"


#: BPE-style pre-tokenizer (GPT-2-ish): letter runs, digit runs, single
#: other non-space chars. Explicit character classes (no \p{L}) so Python
#: re and DuckDB RE2 count identically — the oracle uses the same pattern.
BPE_TOKEN_PATTERN = r"[A-Za-zÄÖÜäöüß]+|[0-9]+|[^\sA-Za-z0-9ÄÖÜäöüß]"


def token_stats(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    text = _norm_ws(batch[col])
    toks = text.str.strip().str.split()
    n_tokens = toks.str.len().fillna(0).astype(np.int64)
    n_chars = text.str.len().astype(np.int64)
    n_bpe = text.str.count(BPE_TOKEN_PATTERN).astype(np.int64)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].astype(np.int64),
        "n_tokens": n_tokens,
        "n_tokens_bpe": n_bpe,
        "n_chars": n_chars,
    })


def quality_scores(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    # unique positional index — the explode/groupby(level=0) aggregation
    # below silently merges rows under a duplicated caller index
    batch = batch.reset_index(drop=True)
    text = _norm_ws(batch[col])
    toks = text.str.strip().str.split()
    n_tokens = toks.str.len().fillna(0).astype(np.int64)
    n_chars = text.str.len().astype(np.int64)
    punct = text.str.count(f"[{PUNCT}]").astype(np.int64)
    all_stop = set(w for ws in STOPWORDS.values() for w in ws)
    # vectorized stopword count: explode tokens once, C-speed lower+isin,
    # re-aggregate by row (the per-token Python loop was the hot spot)
    ex = toks.explode()
    hit = ex.str.lower().isin(all_stop)
    stop_hits = (hit.groupby(level=0).sum().reindex(batch.index, fill_value=0)
                 .astype(np.int64))
    alpha_chars = text.str.count(r"[A-Za-zÄÖÜäöüß]").astype(np.int64)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].astype(np.int64),
        "n_tokens": n_tokens,
        "stop_ratio": np.where(n_tokens > 0, stop_hits / n_tokens, 0.0),
        "punct_ratio": np.where(n_chars > 0, punct / n_chars, 0.0),
        "alpha_ratio": np.where(n_chars > 0, alpha_chars / n_chars, 0.0),
        "mean_token_len": np.where(n_tokens > 0, (n_chars - (n_tokens - 1).clip(lower=0)) / n_tokens.replace(0, 1), 0.0),
    })


#: fixed logistic-regression weights for the document quality classifier —
#: the shape of published web-quality filters (Gopher/CCNet-style: reward
#: stopword density + alphabetic text, punish punctuation walls and
#:  degenerate token lengths). Deterministic constants so the SQL oracle
#: replays the model exactly; a real deployment would train these.
QC_WEIGHTS = {
    "bias": -3.2,
    "stop_ratio": 6.0,
    "punct_ratio": -8.0,
    "alpha_ratio": 3.0,
    "mean_token_len": -0.15,
    "log_tokens": 0.25,
}


def quality_classifier(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Logistic quality score per document: sigmoid of a fixed linear model
    over the :func:`quality_scores` features plus ln(1+n_tokens).

    Output: (doc_id, score round-6, keep) with keep = score ≥ 0.5. The
    round-6 absorbs last-ulp libm exp() differences between numpy and
    DuckDB; the keep threshold compares the ROUNDED score so both engines
    branch on the identical value."""
    f = quality_scores(batch, col)
    w = QC_WEIGHTS
    z = (w["bias"]
         + w["stop_ratio"] * f["stop_ratio"].to_numpy()
         + w["punct_ratio"] * f["punct_ratio"].to_numpy()
         + w["alpha_ratio"] * f["alpha_ratio"].to_numpy()
         + w["mean_token_len"] * f["mean_token_len"].to_numpy()
         + w["log_tokens"] * np.log1p(f["n_tokens"].to_numpy(np.float64)))
    score = np.round(1.0 / (1.0 + np.exp(-z)), 6)
    return pd.DataFrame({"doc_id": f["doc_id"],
                         "score": score,
                         "keep": (score >= 0.5).astype(np.int64)})


def lang_id(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    batch = batch.reset_index(drop=True)
    toks = _norm_ws(batch[col]).str.strip().str.lower().str.split()
    ex = toks.explode()  # one exploded pass shared by all four languages
    counts = {}
    for lang in LANG_ORDER:
        hit = ex.isin(set(STOPWORDS[lang]))
        counts[lang] = (hit.groupby(level=0).sum()
                        .reindex(batch.index, fill_value=0).astype(np.int64))
    cnt = pd.DataFrame(counts)
    best = cnt.max(axis=1)
    # argmax with fixed tie-break order; all-zero → 'unknown'
    pred = pd.Series("unknown", index=batch.index, dtype=object)
    for lang in reversed(LANG_ORDER):  # earlier langs overwrite later → order wins ties
        pred = pred.where(~((cnt[lang] == best) & (best > 0)), lang)
    out = pd.DataFrame({"doc_id": batch["doc_id"].astype(np.int64), "lang_pred": pred})
    for lang in LANG_ORDER:
        out[f"hits_{lang}"] = cnt[lang].astype(np.int64)
    return out


def fingerprint(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": batch["doc_id"].astype(np.int64),
        "content_md5": batch[col].fillna("").map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()),
    })


def ngram_flat(texts, n: int) -> tuple[list, np.ndarray]:
    """All word n-grams of each text, concatenated, plus per-doc counts.
    Docs with fewer than ``n`` tokens yield ZERO grams (a 3-token doc cannot
    contain a 4-gram — decontamination semantics, unlike ``dedup.shingles``
    which falls back to the whole text). Construction stays in C (zip of
    shifted token views + mapped join)."""
    counts = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    join = " ".join
    for d, t in enumerate(texts):
        toks = t.split()
        if len(toks) < n:
            counts[d] = 0
            continue
        g = list(map(join, zip(*(toks[i:] for i in range(n)))))
        counts[d] = len(g)
        flat.extend(g)
    return flat, counts


class NGramContamination:
    """map_batches actor for benchmark decontamination (the GPT-3/Gopher
    eval-set overlap filter): per corpus doc, count how many of its DISTINCT
    word n-grams appear in a broadcast benchmark gram-hash set, and flag the
    doc as contaminated if any do.

    Scale shape: the benchmark side is an eval suite — small by premise —
    so its gram hashes are the canonical broadcast side (``ray.put`` once,
    ``ray.get`` per actor in ``__init__``); the 100-TB corpus side streams
    through this kernel with no shuffle at all. Per batch: factorize gram
    instances at C speed, md5 only the uniques (cached across batches),
    one sorted-array membership test, one bincount."""

    def __init__(self, bench_ref, n: int = 4, bench_mod: int = 25,
                 id_col: str = "doc_id", text_col: str = "text"):
        import ray

        from .dedup import _HashCache

        self.bench = ray.get(bench_ref)  # SORTED unique uint64 gram hashes
        self.n = n
        self.bench_mod = bench_mod
        self.id_col = id_col
        self.text_col = text_col
        self._cache = _HashCache()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        corpus_mask = (ids % self.bench_mod) != 0  # benchmark docs are not corpus
        ids = ids[corpus_mask]
        texts = batch[self.text_col].fillna("").to_numpy()[corpus_mask]
        n_docs = len(ids)
        n_hits = np.zeros(n_docs, dtype=np.int64)
        flat, counts = ngram_flat(texts, self.n)
        if flat:
            codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
            hv = self._cache.hash_unique(uniques)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            # distinct (doc, gram) membership — duplicates inside a doc count once
            key = np.unique(doc_idx * np.int64(len(uniques)) + codes)
            d = key // len(uniques)
            c = key % len(uniques)
            hit = np.isin(hv[c], self.bench)
            n_hits += np.bincount(d[hit], minlength=n_docs).astype(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "n_hit_grams": n_hits,
            "contaminated": (n_hits > 0).astype(np.int64),
        })


class ContaminationSpans:
    """map_batches actor for SPAN-LEVEL decontamination (the Dolma /
    RedPajama surgical variant of :class:`NGramContamination`): instead of
    flagging whole docs, emit the maximal contaminated TOKEN RANGES — every
    position whose word ``n``-gram appears in the broadcast benchmark set,
    with touching-or-overlapping matches (gap ≤ n) merged into one span —
    so a cleaner can excise spans and keep the rest of the document.

    Same scale shape as the doc-level kernel: benchmark gram hashes are the
    broadcast side, the corpus streams through with zero shuffles; the
    per-batch work is factorize → md5-of-uniques → one membership test →
    a fully vectorized island merge (no Python loop over positions)."""

    def __init__(self, bench_ref, n: int = 4, bench_mod: int = 25,
                 id_col: str = "doc_id", text_col: str = "text"):
        import ray

        from .dedup import _HashCache

        self.bench = ray.get(bench_ref)  # SORTED unique uint64 gram hashes
        self.n = n
        self.bench_mod = bench_mod
        self.id_col = id_col
        self.text_col = text_col
        self._cache = _HashCache()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "span_start": pd.Series([], dtype=np.int64),
            "span_end": pd.Series([], dtype=np.int64),
            "n_grams": pd.Series([], dtype=np.int64),
        })
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        corpus_mask = (ids % self.bench_mod) != 0
        ids = ids[corpus_mask]
        texts = batch[self.text_col].fillna("").to_numpy()[corpus_mask]
        flat, counts = ngram_flat(texts, self.n)
        if not flat:
            return empty
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        hv = self._cache.hash_unique(uniques)
        hit = np.isin(hv, self.bench)[codes]  # per POSITION membership
        if not hit.any():
            return empty
        total = len(codes)
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        d, p = doc_idx[hit], pos[hit]  # already (doc, pos)-ordered
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > self.n)
        first = np.flatnonzero(brk)
        last = np.append(first[1:] - 1, len(d) - 1)
        gid = np.cumsum(brk) - 1
        return pd.DataFrame({
            "doc_id": ids[d[first]],
            "span_start": p[first],
            "span_end": p[last] + self.n,
            "n_grams": np.bincount(gid).astype(np.int64),
        })


def winnowing_fingerprint(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Rolling-hash winnowing (Schleimer et al.): k-gram token hashes, min per
    window, dedup preserving order. Gram hash is the md5-derived 63-bit value
    (``stages.dedup._md5_hash64 >> 1``) so a DuckDB oracle recomputes the
    fingerprints bit-for-bit (``text_winnow`` query)."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[8:16], "big") >> 1
          for g in grams]
    if not hs:
        return []
    out, last = [], None
    for i in range(max(1, len(hs) - window + 1)):
        w = hs[i:i + window]
        m = min(w)
        if m != last:
            out.append(m)
            last = m
    return out
