"""Deduplication operators over a document table (training-data pipeline ops).

These generalize the reference's exact-dedup semantics
(HousenumberList.getHousenumberKey/contains/addHousenumber:117-188 — key-based
hash-partition + first-wins) to web-scale text corpora:

  - exact dedup / dup groups: content-hash partition + per-group min-id.
    At 100 TB the shuffle key is the 128-bit content hash (never the text);
    here the oracle groups by text directly, which agrees absent md5
    collisions.
  - MinHash + LSH near-dup candidate pairs: shingle → k minhashes → b bands
    → groupby (band, band-hash) buckets → verified candidate pairs.
  - SimHash fingerprints: 64-bit hamming-based near-dup sketch.
  - n-gram Jaccard verification kernel (exact, used on LSH candidates).

All hashing is deterministic (md5 / blake2b digests of content — no Python
``hash()`` which is salted per process).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd

__all__ = [
    "content_hash_series",
    "add_content_hash",
    "dup_groups",
    "exact_dup_pairs_in_group",
    "shingles",
    "minhash_signature",
    "MinHashLSH",
    "simhash64",
    "ngram_jaccard",
]


def content_hash_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())


def add_content_hash(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["content_hash"] = content_hash_series(batch[col])
    return batch


def dup_groups(group: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Per content-hash group → one row: keeper (min id) + dup count."""
    return pd.DataFrame({
        "doc_id": [np.int64(group[id_col].min())],
        "n_dups": [np.int64(len(group))],
        "content_hash": [group["content_hash"].iloc[0]],
    })


def exact_dup_pairs_in_group(group: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    ids = sorted(group[id_col].tolist())
    pairs = list(combinations(ids, 2))
    return pd.DataFrame({
        f"{id_col}_a": pd.Series([a for a, _ in pairs], dtype=np.int64),
        f"{id_col}_b": pd.Series([b for _, b in pairs], dtype=np.int64),
    })


def shingles(text: str, width: int = 3) -> set:
    """Word w-shingles of the whitespace-tokenized text."""
    toks = text.split()
    if len(toks) < width:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + width]) for i in range(len(toks) - width + 1)}


def _stable_hash64(s: str, seed: int) -> int:
    d = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little")).digest()
    return int.from_bytes(d, "little")


_PRIME = (1 << 61) - 1


class _MinHasher:
    """k permutation-style minhashes via (a*x + b) mod p over one base hash."""

    def __init__(self, k: int = 64, seed: int = 12345):
        rng = np.random.RandomState(seed)  # fixed seed → deterministic params
        self.a = rng.randint(1, _PRIME, size=k, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _PRIME, size=k, dtype=np.int64).astype(np.uint64)
        self.k = k

    def signature(self, shingle_set: set) -> np.ndarray:
        if not shingle_set:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.fromiter(
            (_stable_hash64(s, 0) for s in shingle_set), dtype=np.uint64, count=len(shingle_set)
        )
        with np.errstate(over="ignore"):
            # (a*x+b) mod p per hash function, vectorized over shingles
            vals = (self.a[:, None] * base[None, :] + self.b[:, None]) % np.uint64(_PRIME)
        return vals.min(axis=1)


_DEFAULT_HASHER = _MinHasher()


def minhash_signature(text: str, width: int = 3, k: int = 64) -> np.ndarray:
    hasher = _DEFAULT_HASHER if k == _DEFAULT_HASHER.k else _MinHasher(k)
    return hasher.signature(shingles(text, width))


class MinHashLSH:
    """map_batches actor: documents → (band_id, band_hash, doc_id) rows.

    Banding: k=64 minhashes → bands of r=4 rows → 16 bands; docs sharing any
    full band collide into a bucket. Downstream: groupby(band_id, band_hash)
    → candidate pairs → exact Jaccard verification."""

    def __init__(self, width: int = 3, k: int = 64, bands: int = 16):
        assert k % bands == 0
        self.width = width
        self.hasher = _MinHasher(k)
        self.bands = bands
        self.rows = k // bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_doc = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.hasher.signature(shingles(text, self.width))
            for b in range(self.bands):
                chunk = sig[b * self.rows:(b + 1) * self.rows]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_band.append(b)
                out_hash.append(int.from_bytes(h, "little") >> 1)  # fits int64
                out_doc.append(doc_id)
        return pd.DataFrame({
            "band_id": pd.Series(out_band, dtype=np.int64),
            "band_hash": pd.Series(out_hash, dtype=np.int64),
            "doc_id": pd.Series(out_doc, dtype=np.int64),
        })


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unweighted)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        hv = _stable_hash64(tok, 1)
        bits = (hv >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def ngram_jaccard(a: str, b: str, width: int = 3) -> float:
    sa, sb = shingles(a, width), shingles(b, width)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0
