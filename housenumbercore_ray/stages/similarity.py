"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exactness baseline: the query matrix is
broadcast (``ray.put`` once), each ``map_batches`` task computes a numpy
matmul of its batch against all queries and emits only its batch-local top-k
per query (the partial/combiner), and a tiny final reduce merges partials —
the scale path is identical at 10^12 rows because per-batch output is
O(queries × k), never O(rows).

An LSH-bucketed variant (random signed projections) is included as the
approximate scale path: probe only buckets matching the query's signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["BruteForceTopK", "topk_finalize", "SignedProjectionLSH",
           "ScalarQuantTopK", "sq_quantize"]


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


class BruteForceTopK:
    """map_batches actor: embedding rows → per-batch top-k partials.

    Output rows: (qid, vec_id, sim). Cosine computed in float64 for
    deterministic cross-engine agreement."""

    def __init__(self, query_ref, k: int = 5, exclude_self: bool = True):
        import ray

        q = ray.get(query_ref)  # dict: qid -> vector
        self.qids = np.asarray(list(q.keys()), dtype=np.int64)
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in q.values()])
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = _to_matrix(batch["embedding"])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ self.Qn.T  # (batch, nq)
        vec_ids = batch["vec_id"].to_numpy(dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            s = sims[:, j]
            mask = np.ones(len(s), dtype=bool)
            if self.exclude_self:
                mask &= vec_ids != qid
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            order = idx[np.lexsort((vec_ids[idx], -s[idx]))][: self.k]
            out_q.extend([qid] * len(order))
            out_v.extend(vec_ids[order])
            out_s.extend(s[order])
        return pd.DataFrame({
            "qid": pd.Series(out_q, dtype=np.int64),
            "vec_id": pd.Series(out_v, dtype=np.int64),
            "sim": pd.Series(out_s, dtype=np.float64),
        })


def topk_finalize(group: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """groupby(qid) final reduce: global top-k by (sim desc, vec_id asc)."""
    g = group.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    return pd.DataFrame({
        "qid": g["qid"].astype(np.int64),
        "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        "vec_id": g["vec_id"].astype(np.int64),
    })


def l2_normalize(X: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization (zero rows pass through): SQ8 quantizes
    NORMALIZED vectors so integer dot products rank like cosine — the faiss
    convention for SQ + inner-product metric."""
    n = np.sqrt((X * X).sum(axis=1, keepdims=True))
    return X / np.where(n > 0, n, 1.0)


def sq_quantize(X: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """SQ8 scalar quantization, SYMMETRIC signed variant:
    ``q = clip(floor(x / s * 127 + 0.5), -127, 127)`` with per-dimension
    scale ``s = max(|mn|, |mx|)``; all-zero dimensions code to 0. Symmetric
    (offset-free) codes are what makes the INTEGER dot product a faithful
    cosine proxy: an affine (min/max-offset) quantizer would leave a
    candidate-dependent Σ mn·x cross-term inside Σ qa·qb and scramble the
    ranking. Float64 arithmetic in exactly this op order — the SQL oracle
    replays the expression IEEE-754 op-for-op, so codes agree bit-exactly
    (the only cross-engine freedom is the norm's summation order, whose
    ≤4-ulp noise would have to land a value within ~1e-14 of a quantizer
    boundary to matter)."""
    s = np.maximum(np.abs(mn), np.abs(mx))
    safe = np.where(s > 0, s, 1.0)
    q = np.floor(X / safe * 127.0 + 0.5)
    q = np.where(s > 0, q, 0.0)
    return np.clip(q, -127.0, 127.0).astype(np.int64)


class ScalarQuantTopK:
    """map_batches actor for the SQ8 ANN scan (the 4×-memory-reduction scale
    path of the ANN family: 1 byte/dim instead of 4): quantize the batch
    against broadcast per-dimension (min, max), integer matmul against the
    quantized query matrix, per-batch partial top-k. Scores are int64 sums
    of int8-domain products — exact integers, hash-safe across engines.

    A real deployment persists the codes column once and scans codes only;
    computing them in the scan keeps this operator single-pass over the
    driver's embeddings table without a side output."""

    def __init__(self, side_ref, k: int = 5):
        import ray

        self.qids, self.Qq, self.mn, self.mx = ray.get(side_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = l2_normalize(_to_matrix(batch["embedding"]))
        Xq = sq_quantize(X, self.mn, self.mx)
        S = Xq @ self.Qq.T  # (batch, nq) int64
        vec_ids = batch["vec_id"].to_numpy(dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            s = S[:, j]
            idx = np.flatnonzero(vec_ids != qid)
            if len(idx) == 0:
                continue
            order = idx[np.lexsort((vec_ids[idx], -s[idx]))][: self.k]
            out_q.extend([qid] * len(order))
            out_v.extend(vec_ids[order])
            out_s.extend(s[order])
        return pd.DataFrame({
            "qid": pd.Series(out_q, dtype=np.int64),
            "vec_id": pd.Series(out_v, dtype=np.int64),
            "score_q": pd.Series(out_s, dtype=np.int64),
        })


class BandedProjectionLSH:
    """Multi-band signed random projections for NEAR-DUP PAIR candidates
    (the minhash-banding analog for cosine space): ``bands`` bands of
    ``rowbits`` hyperplane bits each; vectors colliding in ANY band are
    candidates. With 48×4 the collision probability at cos=0.45 per band is
    ≈0.18 → miss probability (1−0.18)^48 ≈ 8e-5; on the test embeddings the
    fixed planes give deterministic recall 1.0 (verified against the exact
    all-pairs oracle at sf0.001/0.01/0.1).

    map_batches stage emitting (band_id, bucket, vec_id) — embeddings are
    NOT replicated through the banding shuffle; pair verification fetches
    them afterwards via a hash-partitioned join."""

    def __init__(self, dim: int, bands: int = 48, rowbits: int = 4, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.bands = bands
        self.rowbits = rowbits
        self.planes = rng.normal(size=(bands * rowbits, dim)).astype(np.float64)

    def band_buckets(self, X: np.ndarray) -> np.ndarray:
        """(n, bands) int64 bucket ids (the packed r bits of each band)."""
        bits = ((X @ self.planes.T) > 0).astype(np.int64)
        b3 = bits.reshape(len(X), self.bands, self.rowbits)
        weights = (np.int64(1) << np.arange(self.rowbits, dtype=np.int64))
        return (b3 * weights[None, None, :]).sum(axis=2)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = _to_matrix(batch["embedding"])
        buckets = self.band_buckets(X)
        n = len(batch)
        return pd.DataFrame({
            "band_id": np.tile(np.arange(self.bands, dtype=np.int64), n),
            "bucket": buckets.ravel(),
            "vec_id": np.repeat(batch["vec_id"].to_numpy(dtype=np.int64), self.bands),
        })


class SignedProjectionLSH:
    """Approximate path: 16-bit signed random projection signature per vector;
    vectors sharing the query's bucket (or hamming ≤ 1 neighbor buckets) are
    the candidate set. map_batches stage emitting (bucket, vec_id)."""

    def __init__(self, dim: int, bits: int = 16, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(bits, dim)).astype(np.float64)

    def signature(self, X: np.ndarray) -> np.ndarray:
        bits = (X @ self.planes.T) > 0
        return (bits.astype(np.uint32) << np.arange(self.planes.shape[0], dtype=np.uint32)).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = _to_matrix(batch["embedding"])
        return pd.DataFrame({
            "bucket": self.signature(X),
            "vec_id": batch["vec_id"].astype(np.int64),
        })


class PQTopK:
    """Product-quantization ADC scan stage (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): ``__init__`` builds the
    per-query asymmetric-distance lookup tables LUT[q, s, c] =
    ‖q_sub_s − codebook[s][c]‖² ONCE per actor; ``__call__`` encodes a
    batch to m codes (per-subspace squared-euclid argmin, ties → lowest
    centroid — the engine-wide kmeans assignment contract) and scores
    every (query, vector) pair with m LUT adds. At deployment scale the
    scan reads only the m-byte codes — vectors are never re-touched; here
    codes are derived in the same pass to keep the input table unchanged.
    Emits per-batch partial top-k rows (qid, vec_id, d2_adc round-6)."""

    def __init__(self, side_ref, k: int = 5):
        import ray

        self.qids, Q, self.C = ray.get(side_ref)
        self.k = k
        m, kc, sd = self.C.shape
        Qs = Q.reshape(len(Q), m, sd)
        self.lut = ((Qs[:, :, None, :] - self.C[None]) ** 2).sum(-1)  # (nq, m, kc)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        m, kc, sd = self.C.shape
        X = _to_matrix(b["embedding"])
        Xs = X.reshape(len(X), m, sd)
        codes = np.empty((len(X), m), dtype=np.int64)
        for s in range(m):
            codes[:, s] = ((Xs[:, s, None, :] - self.C[s][None]) ** 2).sum(-1).argmin(1)
        nq = len(self.qids)
        adc = np.zeros((nq, len(X)))
        for s in range(m):
            adc += self.lut[:, s, codes[:, s]]
        vec_ids = b["vec_id"].to_numpy(np.int64)
        k = min(self.k, len(X))
        out = []
        for qi in range(nq):
            d = np.round(adc[qi], 6)
            order = np.lexsort((vec_ids, d))[:k]
            out.append(pd.DataFrame({
                "qid": np.full(k, self.qids[qi], dtype=np.int64),
                "vec_id": vec_ids[order],
                "d2_adc": d[order],
            }))
        return pd.concat(out, ignore_index=True)
