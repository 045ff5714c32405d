"""Training-data corpus pipelines over the driver's ``documents`` /
``embeddings`` tables and the synthetic ``pages`` table: dedup, text
analysis, similarity search, multimodal plumbing.

Every function takes ``sf_dir`` and returns a lazy ``ray.data.Dataset``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..stages.dedup import MinHashLSH, add_content_hash, exact_dup_pairs_in_group, ngram_jaccard
from ..stages.multimodal import BinaryFeatureExtract, FrameSampleStub
from ..stages.similarity import BruteForceTopK, SignedProjectionLSH, topk_finalize
from ..stages.textops import fingerprint, lang_id, quality_scores, token_stats


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


N_SHARDS = 64


def _shard_on(cols):
    """Stable shard column over one or more key columns — the two-level
    groupby pattern: shuffle on ~N_SHARDS coarse shards, run the fine
    per-key logic VECTORIZED inside each shard. One Ray group per key is
    pathological (per-group Python call overhead dominates); one group per
    shard keeps the reduce at pandas speed and the shuffle balanced."""

    def add(b: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(b), dtype=np.uint64)
        for c in cols:
            h = h * np.uint64(1099511628211) + pd.util.hash_array(b[c].to_numpy(dtype=object))
        return b.assign(_shard=(h % N_SHARDS).astype(np.int64))

    return add


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Exact dedup: content-hash partition + per-group keeper (min doc_id) +
    duplicate count — HousenumberList dedup semantics generalized. Sharded
    two-level groupby; inner reduce fully vectorized."""

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("content_hash", sort=True)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index()
        )
        return out[["doc_id", "n_dups", "content_hash"]].astype({"doc_id": np.int64, "n_dups": np.int64})

    return (
        _docs(sf_dir)
        .map_batches(add_content_hash, batch_format="pandas")
        .map_batches(_shard_on(["content_hash"]), batch_format="pandas")
        .groupby("_shard")
        .map_groups(agg, batch_format="pandas")
    )


def list_dup_pairs(world_dir: str) -> rd.Dataset:
    """Duplicate-pair detection on the official list with the REFERENCE's
    dedup key: street + subarea + postcode + housenumber within municipality,
    coordinates deliberately excluded (HousenumberList.java:117-158, comment
    :131-138). Hash-partition on the key, pairs per group by addr_id."""
    ds = rd.read_parquet(
        f"{world_dir}/list_addresses.parquet",
        columns=["addr_id", "muni_ref", "subarea", "street", "housenumber", "postcode"],
    )

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["dedup_key"] = (b["muni_ref"] + "|" + b["subarea"] + "|" + b["street"]
                          + "|" + b["housenumber"] + "|" + b["postcode"])
        return b

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        # only keys with >1 rows can produce pairs; loop over those few
        sizes = g.groupby("dedup_key")["addr_id"].transform("size")
        dups = g[sizes > 1]
        frames = [
            exact_dup_pairs_in_group(sub, id_col="addr_id")
            for _, sub in dups.groupby("dedup_key", sort=True)
        ]
        if not frames:
            return pd.DataFrame({"addr_id_a": pd.Series([], dtype=np.int64),
                                 "addr_id_b": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .map_batches(_shard_on(["dedup_key"]), batch_format="pandas")
        .groupby("_shard")
        .map_groups(pairs_in_shard, batch_format="pandas")
    )


def doc_token_stats(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir).map_batches(token_stats, batch_format="pandas")


def doc_quality(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir).map_batches(quality_scores, batch_format="pandas")


def doc_lang_id(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir).map_batches(lang_id, batch_format="pandas")


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir).map_batches(fingerprint, batch_format="pandas")


def minhash_buckets(sf_dir: str) -> rd.Dataset:
    """MinHash+LSH banding rows (band_id, band_hash, doc_id)."""
    return _docs(sf_dir).map_batches(
        MinHashLSH, batch_format="pandas", batch_size=1024, concurrency=(1, 4), num_cpus=1
    )


def minhash_near_dup_pairs(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """LSH candidate pairs verified with exact n-gram Jaccard ≥ threshold.

    groupby (band_id, band_hash) buckets → pairwise within bucket → global
    pair dedup → verify. Verification joins back to the (small at test
    scale) text by broadcast lookup; at 100 TB the verify stage would fetch
    texts via a hash-partitioned join instead."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts_ref = ray.put(dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        from itertools import combinations

        pairs = list(combinations(ids, 2))
        return pd.DataFrame({
            "doc_id_a": pd.Series([a for a, _ in pairs], dtype=np.int64),
            "doc_id_b": pd.Series([b for _, b in pairs], dtype=np.int64),
        })

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return batch.assign(jaccard=pd.Series([], dtype=np.float64))
            batch = batch.drop_duplicates(["doc_id_a", "doc_id_b"])
            jac = [ngram_jaccard(self.texts[a], self.texts[b])
                   for a, b in zip(batch["doc_id_a"], batch["doc_id_b"])]
            batch = batch.assign(jaccard=np.asarray(jac, dtype=np.float64))
            return batch[batch["jaccard"] >= threshold]

    def bucket_pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        frames = [bucket_pairs(sub) for _, sub in g[sizes > 1].groupby(["band_id", "band_hash"], sort=True)]
        if not frames:
            return pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                                 "doc_id_b": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    pairs = (
        minhash_buckets(sf_dir)
        .map_batches(_shard_on(["band_hash"]), batch_format="pandas")
        .groupby("_shard")
        .map_groups(bucket_pairs_shard, batch_format="pandas")
    )
    # global pair dedup (a pair can collide in several bands) then verify
    return (
        pairs.map_batches(_shard_on(["doc_id_a", "doc_id_b"]), batch_format="pandas")
        .groupby("_shard")
        .map_groups(lambda g: g.drop_duplicates(["doc_id_a", "doc_id_b"]).drop(columns=["_shard"]),
                    batch_format="pandas")
        .map_batches(Verify, batch_format="pandas", concurrency=(1, 4), num_cpus=1)
    )


def minhash_page_pairs(world_dir: str, threshold: float = 0.7) -> pd.DataFrame:
    """Near-duplicate PAGES via MinHash+LSH (the crawl-dedup use case; the
    world plants ~0.2% near-copy pages, ground truth in
    near_dup_pages.parquet).

    Two streaming passes, both scale-shaped: (1) banding rows → bucket
    groupby → candidate pairs (tiny); (2) re-scan pages fetching ONLY texts
    of candidate ids (broadcast id set filter), then exact n-gram Jaccard
    verification of the small candidate set."""

    def with_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["url"].str.rsplit("/", n=1).str[1].astype(np.int64),
            "text": b["text"],
        })

    pages = rd.read_parquet(f"{world_dir}/pages", columns=["url", "text"]).map_batches(
        with_ids, batch_format="pandas"
    )
    buckets = pages.map_batches(
        MinHashLSH, batch_format="pandas", batch_size=1024, concurrency=(1, 4), num_cpus=1
    )

    def bucket_pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        from itertools import combinations

        sizes = g.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        out_a, out_b = [], []
        for _, sub in g[sizes > 1].groupby(["band_id", "band_hash"], sort=True):
            for a, b in combinations(sorted(set(sub["doc_id"])), 2):
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame({"doc_id_a": pd.Series(out_a, dtype=np.int64),
                             "doc_id_b": pd.Series(out_b, dtype=np.int64)})

    pairs = (
        buckets.map_batches(_shard_on(["band_hash"]), batch_format="pandas")
        .groupby("_shard")
        .map_groups(bucket_pairs_shard, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["doc_id_a", "doc_id_b"])
    )
    if len(pairs) == 0:
        return pd.DataFrame({"page_a": pd.Series([], dtype=np.int64),
                             "page_b": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=np.float64)})
    cand_ids = set(pairs["doc_id_a"]) | set(pairs["doc_id_b"])
    texts_df = pages.map_batches(
        lambda b: b[b["doc_id"].isin(cand_ids)], batch_format="pandas"
    ).to_pandas()
    texts = dict(zip(texts_df["doc_id"], texts_df["text"]))
    jac = np.asarray([
        ngram_jaccard(texts[a], texts[b])
        for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"])
    ])
    out = pd.DataFrame({
        "page_a": pairs["doc_id_a"].to_numpy(dtype=np.int64),
        "page_b": pairs["doc_id_b"].to_numpy(dtype=np.int64),
        "jaccard": jac,
    })
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def doc_simhash(sf_dir: str) -> rd.Dataset:
    from ..stages.dedup import simhash64

    def sh(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype(np.int64),
            "simhash": pd.Series([simhash64(t) >> 1 for t in batch["text"]], dtype=np.int64),
        })

    return _docs(sf_dir).map_batches(sh, batch_format="pandas")


DEFAULT_QUERY_IDS = (0, 1, 2, 3)
TOPK = 5


def ann_topk(sf_dir: str, query_ids=DEFAULT_QUERY_IDS, k: int = TOPK) -> rd.Dataset:
    """Brute-force cosine top-k against broadcast query vectors: per-batch
    partial top-k (map_batches) → tiny groupby(qid) final reduce."""
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    lookup = {int(v): e for v, e in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist())
              if int(v) in set(query_ids)}
    query_ref = ray.put(lookup)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BruteForceTopK, fn_constructor_args=(query_ref, k),
        batch_format="pandas", batch_size=4096, concurrency=(1, 4), num_cpus=1,
    )
    return partials.groupby("qid").map_groups(lambda g: topk_finalize(g, k), batch_format="pandas")


def ann_lsh_buckets(sf_dir: str) -> rd.Dataset:
    """Approximate path: signed-projection LSH bucket per vector."""
    import pyarrow.parquet as pq

    dim = len(pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])[0][0].as_py())
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        SignedProjectionLSH, fn_constructor_args=(dim,),
        batch_format="pandas", batch_size=4096, concurrency=(1, 4), num_cpus=1,
    )


def embedding_near_dup_pairs(sf_dir: str, tau: float = 0.45) -> rd.Dataset:
    """Embedding-cosine near-dup pairs: all (a < b) with cosine ≥ tau.

    Small-side broadcast of the normalized matrix (embeddings tables are the
    dimension side here); each batch computes a (batch × all) matmul and
    emits only qualifying pairs with a<b — per-batch output is bounded by
    the true pair count. At 10^12 rows the same stage runs per LSH bucket
    (SignedProjectionLSH) instead of against the full matrix."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    X = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    side_ref = ray.put((ids, Xn))

    class Pairs:
        def __init__(self):
            self.ids, self.Xn = ray.get(side_ref)
            self.pos = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            rows_idx = np.asarray([self.pos[int(v)] for v in b["vec_id"]], dtype=np.int64)
            sims = self.Xn[rows_idx] @ self.Xn.T
            bi, bj = np.nonzero(sims >= tau)
            gi = self.ids[rows_idx[bi]]
            gj = self.ids[bj]
            keep = gi < gj
            return pd.DataFrame({
                "vec_id_a": pd.Series(gi[keep], dtype=np.int64),
                "vec_id_b": pd.Series(gj[keep], dtype=np.int64),
                "cos_sim": np.round(sims[bi[keep], bj[keep]], 6),
            })

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        Pairs, batch_format="pandas", batch_size=2048, concurrency=(1, 4), num_cpus=1,
    )


def ann_lsh_topk(sf_dir: str, query_ids=DEFAULT_QUERY_IDS, k: int = TOPK,
                 max_hamming: int = 6) -> rd.Dataset:
    """Approximate ANN (the scale path): signed-projection LSH buckets; a
    query probes only vectors whose 16-bit signature is within
    ``max_hamming`` of its own, then exact cosine top-k among candidates.
    Rows-only (approximate by design); recall vs `ann_topk` is unit-tested."""
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(emb["embedding"][0].as_py())
    lsh = SignedProjectionLSH(dim)
    qvecs = {int(v): np.asarray(e, dtype=np.float64)
             for v, e in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist())
             if int(v) in set(query_ids)}
    qids = np.asarray(sorted(qvecs), dtype=np.int64)
    Q = np.stack([qvecs[int(q)] for q in qids])
    qsig = lsh.signature(Q)
    ref = ray.put((qids, Q / np.linalg.norm(Q, axis=1, keepdims=True), qsig, lsh.planes))

    class Probe:
        def __init__(self):
            self.qids, self.Qn, self.qsig, planes = ray.get(ref)
            self.lsh = SignedProjectionLSH.__new__(SignedProjectionLSH)
            self.lsh.planes = planes

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            sig = self.lsh.signature(X)
            vec_ids = b["vec_id"].to_numpy(dtype=np.int64)
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(self.qids):
                ham = np.bitwise_count((sig ^ self.qsig[j]).astype(np.uint32)) if hasattr(np, "bitwise_count") else np.array([bin(int(x)).count("1") for x in (sig ^ self.qsig[j])])
                cand = (ham <= max_hamming) & (vec_ids != qid)
                if not cand.any():
                    continue
                sims = Xn[cand] @ self.Qn[j]
                cidx = np.flatnonzero(cand)
                order = cidx[np.lexsort((vec_ids[cidx], -sims))][:k]
                sel = {int(v): s for v, s in zip(vec_ids[cidx], sims)}
                out_q.extend([qid] * len(order))
                out_v.extend(vec_ids[order])
                out_s.extend(sel[int(v)] for v in vec_ids[order])
            return pd.DataFrame({
                "qid": pd.Series(out_q, dtype=np.int64),
                "vec_id": pd.Series(out_v, dtype=np.int64),
                "sim": pd.Series(out_s, dtype=np.float64),
            })

    partials = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        Probe, batch_format="pandas", batch_size=4096, concurrency=(1, 4), num_cpus=1,
    )
    return partials.groupby("qid").map_groups(lambda g: topk_finalize(g, k), batch_format="pandas")


def media_features(world_dir: str) -> rd.Dataset:
    """Multimodal plumbing over the binary html column: small batches sized
    for binary payloads, actor pool, typed metadata out."""
    return rd.read_parquet(f"{world_dir}/pages", columns=["url", "html"]).map_batches(
        BinaryFeatureExtract, fn_constructor_args=("html", "url"),
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )


def frame_samples(world_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{world_dir}/pages", columns=["url", "html"]).map_batches(
        FrameSampleStub, fn_constructor_args=(10, 4096, "html", "url"),
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )
