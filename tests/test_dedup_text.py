import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.stages.dedup import (
    MinHashLSH,
    minhash_signature,
    ngram_jaccard,
    shingles,
    simhash64,
)
from housenumbercore_ray.stages.textops import (
    lang_id,
    quality_scores,
    token_stats,
    winnowing_fingerprint,
)

BASE = ("the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep dark forest where nobody ever goes at night")
NEAR = BASE.replace("lazy", "sleepy")
FAR = "completely different content about database engines and query plans"


class TestMinHash:
    def test_signature_deterministic(self):
        a = minhash_signature(BASE)
        b = minhash_signature(BASE)
        assert np.array_equal(a, b)

    def test_estimates_jaccard(self):
        sa, sb = minhash_signature(BASE), minhash_signature(NEAR)
        est = (sa == sb).mean()
        true = ngram_jaccard(BASE, NEAR)
        assert abs(est - true) < 0.25
        sc = minhash_signature(FAR)
        assert (sa == sc).mean() < 0.2

    def test_lsh_buckets_collide_for_near_dups(self):
        lsh = MinHashLSH()
        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [BASE, NEAR, FAR]})
        rows = lsh(df)
        b1 = set(rows[rows.doc_id == 1]["band_hash"].tolist())
        b2 = set(rows[rows.doc_id == 2]["band_hash"].tolist())
        b3 = set(rows[rows.doc_id == 3]["band_hash"].tolist())
        assert b1 & b2      # near-dups share ≥1 band
        assert not (b1 & b3)

    def test_empty_text(self):
        assert shingles("") == set()
        sig = minhash_signature("")
        assert (sig == np.iinfo(np.uint64).max).all()


class TestSimhash:
    def test_hamming_property(self):
        def ham(a, b):
            return bin(a ^ b).count("1")

        ha, hb, hc = simhash64(BASE), simhash64(NEAR), simhash64(FAR)
        assert ham(ha, hb) < ham(ha, hc)
        assert simhash64(BASE) == ha  # deterministic


class TestJaccard:
    def test_bounds(self):
        assert ngram_jaccard(BASE, BASE) == 1.0
        assert ngram_jaccard("", "") == 1.0
        assert 0.0 <= ngram_jaccard(BASE, FAR) < 0.1


class TestWinnowing:
    def test_overlap_detection(self):
        fa = set(winnowing_fingerprint(BASE))
        fb = set(winnowing_fingerprint(NEAR))
        fc = set(winnowing_fingerprint(FAR))
        assert len(fa & fb) > 0
        assert len(fa & fc) == 0
        assert winnowing_fingerprint("") == []


class TestTextOps:
    def test_token_stats(self):
        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a  b   c", "", "ein wort"]})
        out = token_stats(df)
        assert out["n_tokens"].tolist() == [3, 0, 2]
        assert out["n_chars"].tolist() == [8, 0, 8]

    def test_quality_empty_safe(self):
        df = pd.DataFrame({"doc_id": [1], "text": [""]})
        out = quality_scores(df)
        assert out.iloc[0]["stop_ratio"] == 0.0
        assert out.iloc[0]["punct_ratio"] == 0.0

    def test_lang_id(self):
        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
            "der hund und die katze ist nicht da",
            "the cat and the dog is not here",
            "xyz qqq zzz",
        ]})
        out = lang_id(df)
        assert out["lang_pred"].tolist() == ["de", "en", "unknown"]

    def test_lang_tiebreak_order(self):
        # 'la' is both fr and it stopword; fr comes first in LANG_ORDER
        df = pd.DataFrame({"doc_id": [1], "text": ["la la la"]})
        assert lang_id(df)["lang_pred"].iloc[0] == "fr"


class TestSimilarityKernel:
    def test_bruteforce_topk_matches_numpy(self, ray_session):
        import ray

        from housenumbercore_ray.stages.similarity import BruteForceTopK, topk_finalize

        rng = np.random.default_rng(3)
        X = rng.normal(size=(50, 8))
        q = {0: X[0], 7: X[7]}
        ref = ray.put(q)
        bf = BruteForceTopK.__new__(BruteForceTopK)
        bf.qids = np.asarray([0, 7], dtype=np.int64)
        Q = np.stack([q[0], q[7]])
        bf.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        bf.k = 3
        bf.exclude_self = True
        batch = pd.DataFrame({"vec_id": np.arange(50), "embedding": list(X)})
        partial = bf(batch)
        final = partial.groupby("qid", group_keys=False).apply(lambda g: topk_finalize(g, 3))
        # independent check
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        for qid in (0, 7):
            sims = Xn @ (X[qid] / np.linalg.norm(X[qid]))
            sims[qid] = -np.inf
            want = np.argsort(-sims, kind="stable")[:3].tolist()
            got = final[final.qid == qid].sort_values("rank")["vec_id"].tolist()
            assert got == want


class TestMultimodal:
    def test_binary_feature_extract(self):
        import hashlib

        import pyarrow as pa

        import numpy as np

        from housenumbercore_ray.stages.multimodal import (
            BinaryFeatureExtract,
            FrameSampleStub,
            encode_bmp,
        )

        t = pa.table({"url": ["a", "b"], "payload": [b"\x00\x01\x02", b"x" * 10000]})
        ext = BinaryFeatureExtract(col="payload", id_col="url")
        out = ext(t)
        assert out["n_bytes"].to_pylist() == [3, 10000]
        assert out["content_md5"].to_pylist()[0] == hashlib.md5(b"\x00\x01\x02").hexdigest()

        fs = FrameSampleStub(every_nth=1, frame_bytes=4096, col="payload", id_col="url")(t)
        assert fs["frame_idx"].to_pylist() == [0, 0, 1]  # 3B→1 frame; 10000B→2 frames

        # r5: _decode is REAL for uncompressed formats, None for junk
        pix = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
        assert (ext._decode(encode_bmp(pix)) == pix).all()
        assert ext._decode(b"\x00not an image") is None

    def test_type_sniff_magic_and_entropy(self):
        import numpy as np
        import pyarrow as pa

        from housenumbercore_ray.stages.multimodal import TypeSniff

        payloads = [
            b"\x1f\x8b\x08rest",          # gzip
            b"\x89PNG\r\n\x1a\n...",      # png
            b"\xff\xd8\xff\xe0jfif",      # jpeg
            b"%PDF-1.7 x",                # pdf
            b"GIF89a....",                # gif
            b"<html><body>",              # html
            b"\x00\xfeopaque",            # unknown
            b"\x00" * 64,                 # zero entropy
            bytes(range(256)),            # max entropy (8 bits)
        ]
        t = pa.table({"url": [str(i) for i in range(len(payloads))],
                      "payload": payloads})
        out = TypeSniff(col="payload", id_col="url")(t)
        assert out["mime"].to_pylist() == [
            "application/gzip", "image/png", "image/jpeg",
            "application/pdf", "image/gif", "text/html",
            "application/octet-stream", "application/octet-stream",
            "application/octet-stream",
        ]
        ent = out["entropy_bits"].to_pylist()
        assert ent[7] == 0.0
        assert ent[8] == pytest.approx(8.0)
        assert all(0.0 <= e <= 8.0 + 1e-12 for e in ent)
        # gzip prefix beats the generic fallback even with '<' inside
        mixed = TypeSniff(col="payload", id_col="url")(
            pa.table({"url": ["m"], "payload": [b"\x1f\x8b<html>"]}))
        assert mixed["mime"].to_pylist() == ["application/gzip"]


class TestRepetitionMetrics:
    """Gopher repetition kernel — engine kernel vs an in-test DuckDB
    recomputation of the documented semantics (same SQL the oracle uses)."""

    def test_kernel_matches_sql(self, tmp_path):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import repetition_kernel
        from housenumbercore_ray.pipelines.corpus_oracle import repetition_sql

        pages = pd.DataFrame({
            "url": [f"https://h/{i}" for i in range(6)],
            "text": [
                "a b c\na b c\nd e f",            # one duplicated line
                "",                                # empty page → 1 empty line
                "x",                               # single token → no 2-gram
                "spam spam spam spam spam",        # overlapping top gram
                "l1\nl2\nl3\nl1\nl1",              # dups + cross-line grams
                "wort eins zwei drei vier fünf",   # clean text
            ],
        })
        (tmp_path / "pages").mkdir()
        pages.to_parquet(tmp_path / "pages" / "p.parquet")
        eng = repetition_kernel(pages).sort_values("url").reset_index(drop=True)
        ora = duckdb.sql(repetition_sql(str(tmp_path))).df() \
            .sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # spot semantics: dup line frac of page 0 is 1 - 2/3
        assert eng.loc[0, "dup_line_frac"] == pytest.approx(1 - 2 / 3)
        assert eng.loc[0, "keep"] == 0 and eng.loc[1, "keep"] == 1

    def test_dataset_roundtrip(self, tmp_path):
        import ray.data as rd

        from housenumbercore_ray.pipelines.corpus import repetition_metrics

        pages = pd.DataFrame({
            "url": [f"https://h/{i}" for i in range(10)],
            "text": ["zeile eins\nzeile zwei"] * 5 + ["dup\ndup\ndup\ndup"] * 5,
        })
        (tmp_path / "pages").mkdir()
        pages.to_parquet(tmp_path / "pages" / "p.parquet")
        out = repetition_metrics(str(tmp_path)).to_pandas()
        assert len(out) == 10
        assert set(out[out["dup_line_frac"] > 0.3]["url"]) == set(pages["url"][5:])


class TestPiiRedact:
    def test_kernel_matches_sql(self, tmp_path):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import pii_redact_kernel
        from housenumbercore_ray.pipelines.corpus_oracle import pii_redact_sql

        pages = pd.DataFrame({
            "url": [f"u/{i}" for i in range(6)],
            "text": [
                "Kontakt: nutzer123@beispiel-001.de Tel. +49 30 1234567",
                "zwei mails a@b.de und c.d+e@f-g.org hier",
                "Server 10.1.2.3 und 192.168.255.1 Tel. 030/5551234",
                "kein pii hier, nur text 1-2",
                "",
                "rand +1 212 5551234 und 0999/99999999",
            ],
        })
        (tmp_path / "pages").mkdir()
        pages.to_parquet(tmp_path / "pages" / "p.parquet")
        eng = pii_redact_kernel(pages).sort_values("url").reset_index(drop=True)
        ora = duckdb.sql(pii_redact_sql(str(tmp_path))).df() \
            .sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        assert eng["n_emails"].tolist() == [1, 2, 0, 0, 0, 0]
        assert eng["n_ips"].tolist() == [0, 0, 2, 0, 0, 0]
        assert eng["n_phones"].tolist() == [1, 0, 1, 0, 0, 2]

    def test_world_has_planted_pii(self, ray_session):
        """v10 worlds plant contact footers on ~20% of pages; the operator
        must find them (non-trivial counts), and redaction must change the
        text hash on exactly the pages with hits."""
        from housenumbercore_ray.pipelines.corpus import pii_redact
        from housenumbercore_ray.sources.worldgen import ensure_world_scale

        out = pii_redact(ensure_world_scale("sf0.001")).to_pandas()
        frac = (out["n_emails"] > 0).mean()
        assert 0.1 < frac < 0.3
        assert (out[out["n_emails"] > 0]["n_phones"] > 0).all()


class TestPackSequences:
    def test_matches_recursive_cte(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import pack_sequences
        from housenumbercore_ray.pipelines.corpus_oracle import pack_sequences_sql

        sf = "/root/testdata/sf0.001"
        eng = pack_sequences(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
        ora = con.sql(pack_sequences_sql()).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns].astype("int64"), ora.astype("int64"))
        # invariants: offsets within capacity; sequence fill never exceeds it
        assert (eng["tok_offset"] + eng["n_tok"] <= 128).all()
        per_seq = eng.groupby(["shard", "seq_idx"])["n_tok"].sum()
        assert (per_seq <= 128).all()
        # packing is dense: every non-final sequence could not fit its successor's first doc
        assert eng["n_tok"].ge(0).all() and len(eng) == 500


class TestUrlCanonical:
    def test_kernel_matches_sql(self, tmp_path):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import canonical_url_kernel
        from housenumbercore_ray.pipelines.corpus_oracle import url_canonical_sql

        pages = pd.DataFrame({"url": [
            "https://www.beispiel-012.de/seite/0",
            "https://www.beispiel-012.de/seite/1?utm_source=crawler&utm_medium=web",
            "HTTPS://WWW.BEISPIEL-012.DE/seite/2",
            "https://beispiel-012.de/seite/3",
            "https://www.x.de/seite/4?b=2&a=1&utm_y=9",
            "https://www.x.de/dir/",
        ]})
        (tmp_path / "pages").mkdir()
        pages.to_parquet(tmp_path / "pages" / "p.parquet")
        eng = canonical_url_kernel(pages).sort_values("url").reset_index(drop=True)
        ora = duckdb.sql(url_canonical_sql(str(tmp_path))).df() \
            .sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        got = dict(zip(eng["url"], eng["canonical_url"]))
        assert got["https://www.x.de/seite/4?b=2&a=1&utm_y=9"] == "https://x.de/seite/4?a=1&b=2"
        assert got["HTTPS://WWW.BEISPIEL-012.DE/seite/2"] == "https://beispiel-012.de/seite/2"

    def test_world_variants_collapse(self, ray_session):
        """v11 worlds plant messy url variants; canonicalization maps every
        url to the lowercase no-www form, keeping one url per page."""
        from housenumbercore_ray.pipelines.corpus import url_canonicalize
        from housenumbercore_ray.sources.worldgen import ensure_world_scale

        out = url_canonicalize(ensure_world_scale("sf0.001")).to_pandas()
        assert out["canonical_url"].str.match(r"https://beispiel-[0-9]{3}\.de/seite/[0-9]+$").all()
        assert out["canonical_url"].is_unique
        # utm variants exist and were stripped
        assert out["url"].str.contains("utm_").any()
        assert not out["canonical_url"].str.contains("utm_").any()


class TestTfidfTopk:
    def test_matches_sql_and_invariants(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import tfidf_topk
        from housenumbercore_ray.pipelines.corpus_oracle import tfidf_topk_sql

        sf = "/root/testdata/sf0.001"
        eng = tfidf_topk(sf).to_pandas() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
        ora = con.sql(tfidf_topk_sql()).df() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        assert (eng.groupby("doc_id")["rank"].max() == 5).all()
        # scores are non-increasing within a doc
        by_doc = eng.sort_values(["doc_id", "rank"]).groupby("doc_id")["score"]
        assert (by_doc.diff().fillna(0) <= 1e-12).all()


class TestDecontaminateSpans:
    def test_matches_sql_and_doc_level_consistency(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import (
            decontaminate,
            decontaminate_spans,
        )
        from housenumbercore_ray.pipelines.corpus_oracle import decontaminate_spans_sql

        sf = "/root/testdata/sf0.001"
        key = ["doc_id", "span_start"]
        eng = decontaminate_spans(sf).to_pandas().sort_values(key).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
        ora = con.sql(decontaminate_spans_sql()).df().sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # spans are well-formed: end > start, wide enough for n_grams 4-grams
        assert (eng["span_end"] - eng["span_start"] >= 4).all()
        assert (eng["span_end"] - eng["span_start"] <= eng["n_grams"] * 4).all()
        # doc-level and span-level ops agree on WHICH docs are contaminated
        doc = decontaminate(sf).to_pandas()
        flagged = set(doc.loc[doc["contaminated"] == 1, "doc_id"])
        assert set(eng["doc_id"]) == flagged


class TestIncrementalNewContent:
    def test_consistency_with_url_level_diff(self, ray_session):
        from housenumbercore_ray.pipelines.corpus import (
            incremental_new_content,
            snapshot_diff,
        )
        from housenumbercore_ray.sources.worldgen import ensure_world_scale

        wd = ensure_world_scale("sf0.001")
        inc = incremental_new_content(wd).to_pandas()
        assert (inc.loc[inc["status"] == "seen", "n_prev_urls"] >= 1).all()
        assert (inc.loc[inc["status"] == "new", "n_prev_urls"] == 0).all()
        # url-level 'unchanged' ⇒ the same content existed in prev ⇒ 'seen'
        sd = snapshot_diff(wd).to_pandas()
        unchanged = set(sd.loc[sd["status"] == "unchanged", "url"])
        sub = inc[inc["url"].isin(unchanged)]
        assert (sub["status"] == "seen").all()
        # worldgen plants both removals (pg%7==3) and edits (pg%13==6),
        # so both classes must be present
        assert (inc["status"] == "new").any() and (inc["status"] == "seen").any()


class TestFillTokenBudget:
    def test_matches_sql_and_budget_is_tight(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import fill_token_budget
        from housenumbercore_ray.pipelines.corpus_oracle import fill_token_budget_sql

        sf = "/root/testdata/sf0.001"
        eng = fill_token_budget(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
        ora = con.sql(fill_token_budget_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # the cut is tight: every source stays within budget, and adding the
        # NEXT doc_id-ordered doc of that source would overflow it
        docs = pd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "source", "text"])
        docs["n_tok"] = docs["text"].fillna("").str.split().str.len()
        per_src = eng.groupby("source")["cum_tok"].max()
        for src, used in per_src.items():
            assert used <= 800
            kept = set(eng.loc[eng["source"] == src, "doc_id"])
            rest = docs[(docs["source"] == src) & ~docs["doc_id"].isin(kept)]
            if len(rest):
                nxt = rest.sort_values("doc_id").iloc[0]
                assert used + nxt["n_tok"] > 800


class TestDsirWeights:
    def test_matches_sql_and_separates_target(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import dsir_weights
        from housenumbercore_ray.pipelines.corpus_oracle import dsir_weights_sql

        sf = "/root/testdata/sf0.001"
        eng = dsir_weights(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
        ora = con.sql(dsir_weights_sql()).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # the importance weight must actually separate the target slice:
        # target-language docs score higher on average than the rest
        langs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
        m = eng.merge(langs, on="doc_id")
        de = m.loc[m["lang"] == "de", "log_ratio"].mean()
        rest = m.loc[m["lang"] != "de", "log_ratio"].mean()
        assert de > rest


class TestBm25Topk:
    def test_matches_sql_and_invariants(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import bm25_topk
        from housenumbercore_ray.pipelines.corpus_oracle import bm25_topk_sql

        sf = "/root/testdata/sf0.001"
        eng = bm25_topk(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
        ora = con.sql(bm25_topk_sql()).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # ranks are 1..k with strictly non-increasing scores
        assert (eng["rank"].to_numpy() == np.arange(1, len(eng) + 1)).all()
        assert (np.diff(eng["score"].to_numpy()) <= 1e-12).all()
        # every hit matched at least one of the <=8 query terms
        assert eng["n_terms"].between(1, 8).all()


class TestEmbeddingKnnGraph:
    def test_matches_sql_and_structure(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import embedding_knn_graph
        from housenumbercore_ray.pipelines.corpus_oracle import knn_graph_sql

        sf = "/root/testdata/sf0.001"
        key = ["src_id", "rank"]
        eng = embedding_knn_graph(sf).to_pandas().sort_values(key).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
        ora = con.sql(knn_graph_sql()).df().sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # every vector appears as a source with ranks 1..k, no self-edges
        per_src = eng.groupby("src_id")["rank"].agg(["min", "max", "size"])
        assert (per_src["min"] == 1).all() and (per_src["max"] == per_src["size"]).all()
        assert (eng["src_id"] != eng["dst_id"]).all()
        # approximation quality: recall@k vs brute-force kNN must beat the
        # probed-list coverage (nprobe/nlist = 12.5%) and random (~0.6%);
        # measured 0.30 on this table — centroid routing concentrates true
        # neighbors into the probed lists even without planted structure
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).to_pandas()
        X = np.stack(t["embedding"].apply(np.asarray)).astype(np.float64)
        ids = t["vec_id"].to_numpy(np.int64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ Xn.T
        np.fill_diagonal(S, -2.0)
        exact = {int(ids[i]): set(ids[np.argsort(-S[i], kind="stable")[:3]])
                 for i in range(len(ids))}
        recall = np.mean([len(set(g["dst_id"]) & exact[int(s)]) / 3
                          for s, g in eng.groupby("src_id")])
        assert recall > 0.2


class TestEmbeddingKmeans:
    def test_matches_sql_oracle(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import embedding_kmeans
        from housenumbercore_ray.pipelines.corpus_oracle import embedding_kmeans_sql

        sf = "/root/testdata/sf0.001"
        eng = embedding_kmeans(sf).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
        ora = con.sql(embedding_kmeans_sql()).df() \
            .sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # all k clusters populated on the planted-label world
        assert eng["cluster"].nunique() == 8


class TestBloomSeen:
    def test_end_to_end(self, ray_session):
        from housenumbercore_ray.pipelines.corpus import bloom_seen
        from housenumbercore_ray.sources.worldgen import ensure_world_scale

        out = bloom_seen(ensure_world_scale("sf0.001")).to_pandas()
        seen = out[out["actually_seen"] == 1]
        unseen = out[out["actually_seen"] == 0]
        assert len(seen) == len(unseen) == 2000
        assert (seen["in_bloom"] == 1).all()          # blooms have no false negatives
        assert unseen["in_bloom"].mean() < 0.01       # m=2^20, ~8k bits set → FP ~0


class TestHll:
    def test_estimate_accuracy_and_oracle(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import distinct_urls_hll
        from housenumbercore_ray.pipelines.corpus_oracle import distinct_hll_sql
        from housenumbercore_ray.sources.worldgen import ensure_world_scale

        wd = ensure_world_scale("sf0.001")
        eng = distinct_urls_hll(wd).to_pandas()
        ora = duckdb.sql(distinct_hll_sql(wd)).df()
        pd.testing.assert_frame_equal(
            eng[ora.columns].reset_index(drop=True), ora, check_dtype=False)
        est, exact = eng["estimate"].iloc[0], eng["n_exact"].iloc[0]
        # p=12 → ~1.6% std error; allow 5%
        assert abs(est - exact) / exact < 0.05


class TestDedupComponents:
    def test_chain_transitivity(self, ray_session, tmp_path, monkeypatch):
        """A near-dup CHAIN a~b~c (a≁c directly) must land in ONE cluster —
        the property pairwise output alone cannot express."""
        import housenumbercore_ray.pipelines.corpus as corpus

        base = ("wort " + " ".join(f"tok{i}" for i in range(40)))
        b_txt = base.replace("tok5", "anders5")
        c_txt = b_txt.replace("tok30", "anders30")
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [base, b_txt, c_txt, "etwas voellig anderes hier"],
        })
        docs.to_parquet(tmp_path / "documents.parquet")
        out = corpus.dedup_components(str(tmp_path), max_rounds=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pairs = corpus.minhash_near_dup_pairs(str(tmp_path)).to_pandas()
        # chain holds pairwise (0,1) and (1,2); component must unify all three
        assert {(0, 1), (1, 2)} <= set(zip(pairs["doc_id_a"], pairs["doc_id_b"]))
        assert out["cluster"].tolist()[:3] == [0, 0, 0]
        assert out.loc[3, "cluster"] == 3
        assert out["is_canonical"].tolist() == [1, 0, 0, 1]

    def test_long_chain_star_contraction(self, ray_session):
        """A 100-link chain converges inside max_rounds=10: plain min-label
        propagation would need ~100 rounds; alternating large/small-star
        contraction needs ~log2(100) ≈ 7-8. Proves contraction is live."""
        import ray.data as rd

        import housenumbercore_ray.pipelines.corpus as corpus
        from housenumbercore_ray.state import metrics

        n = 100
        nodes = rd.from_pandas(pd.DataFrame({"node": np.arange(n, dtype=np.int64)}))
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)]).astype(np.int64)
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)]).astype(np.int64)
        edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
        metrics.reset()
        out = corpus.connected_components(nodes, edges, max_rounds=10,
                                          metrics_prefix="chain_test",
                                          small_edges=0).to_pandas()
        assert (out["label"] == 0).all()
        snap = metrics.snapshot()
        assert 0 < snap["chain_test_rounds"] <= 10

    def test_divergence_raises(self, ray_session):
        """max_rounds too small for the diameter → RuntimeError, never a
        silently-unconverged labeling (ADVICE r2)."""
        import ray.data as rd

        import housenumbercore_ray.pipelines.corpus as corpus

        n = 64
        nodes = rd.from_pandas(pd.DataFrame({"node": np.arange(n, dtype=np.int64)}))
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)]).astype(np.int64)
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)]).astype(np.int64)
        edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
        with pytest.raises(RuntimeError, match="fixpoint"):
            corpus.connected_components(nodes, edges, max_rounds=2, small_edges=0)


class TestCmsCounts:
    def test_overestimate_property_and_oracle(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.corpus import cms_token_counts
        from housenumbercore_ray.pipelines.corpus_oracle import cms_counts_sql

        sf = "/root/testdata/sf0.001"
        eng = cms_token_counts(sf).to_pandas().sort_values("term").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
        ora = con.sql(cms_counts_sql()).df().sort_values("term").reset_index(drop=True)
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        # CMS never underestimates
        assert (eng["est"] >= eng["exact"]).all()
        assert (eng["exact"] > 0).all()


class TestExoticWhitespaceParity:
    """ADVICE r2: Python \\s is unicode-aware, DuckDB RE2 \\s is ASCII-only.
    The kernels normalize exotic whitespace before tokenizing and the oracle
    applies the same regexp_replace — token counts must agree for NBSP,
    LINE SEPARATOR, ideographic space, etc."""

    TEXTS = [
        "der die das und",          # NBSP between tokens
        "a b c",               # LINE/PARAGRAPH SEPARATOR
        "x　y  z",              # ideographic + math space
        "  ",                  # exotic-only text → zero tokens
        "plain ascii text only",
        "",
    ]

    def _oracle(self, sql_expr_rows):
        import duckdb

        from housenumbercore_ray.stages.textops import EXOTIC_WS_RE2
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(
            {"doc_id": range(len(self.TEXTS)), "text": self.TEXTS}))
        norm = f"regexp_replace(text, '{EXOTIC_WS_RE2}', ' ', 'g')"
        return con.sql(f"""
            SELECT doc_id,
                   CASE WHEN trim({norm}) = '' THEN 0
                        ELSE length(string_split_regex(trim({norm}), '\\s+')) END AS n_tokens,
                   length(regexp_extract_all({norm},
                     '[A-Za-zÄÖÜäöüß]+|[0-9]+|[^\\sA-Za-z0-9ÄÖÜäöüß]')) AS n_bpe
            FROM documents ORDER BY doc_id
        """).df()

    def test_token_counts_match_duckdb(self):
        df = pd.DataFrame({"doc_id": range(len(self.TEXTS)), "text": self.TEXTS})
        eng = token_stats(df)
        ora = self._oracle(self.TEXTS)
        assert eng["n_tokens"].tolist() == ora["n_tokens"].tolist()
        assert eng["n_tokens_bpe"].tolist() == ora["n_bpe"].tolist()
        # NBSP really separates: first doc has 4 tokens
        assert eng["n_tokens"].iloc[0] == 4


class TestQualityClassifier:
    """Fixed-weight logistic quality filter: SQL parity (round-6 sigmoid)
    and a non-trivial decision boundary."""

    def test_matches_duckdb_and_splits(self):
        import duckdb

        import __ray_entry__ as e
        from housenumbercore_ray.stages.textops import quality_classifier

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = quality_classifier(docs).sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", docs)
        want = (con.sql(e._corpus_oracles("/tmp/unused")["text_quality_classifier"])
                .df().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["doc_id", "score", "keep"]], want[["doc_id", "score", "keep"]],
            check_dtype=False)
        # the boundary must actually split the corpus (a keep-all/drop-all
        # filter would be vacuously "correct")
        assert 0.05 < got["keep"].mean() < 0.95

    def test_degenerate_inputs(self):
        from housenumbercore_ray.stages.textops import quality_classifier

        df = pd.DataFrame({"doc_id": [0, 1, 2],
                           "text": ["", "!!!???...", "der die das und ist gut"]})
        out = quality_classifier(df)
        assert (out["score"] >= 0).all() and (out["score"] <= 1).all()
        # punctuation wall scores below the stopword-rich sentence
        assert out["score"].iloc[1] < out["score"].iloc[2]


class TestComponentsTwoRegimes:
    """The single-task union-find regime and the distributed star
    contraction must produce identical labels on the same graph."""

    def test_small_path_matches_distributed(self, ray_session):
        import ray.data as rd

        import housenumbercore_ray.pipelines.corpus as corpus

        rng = np.random.RandomState(11)
        n = 300
        ids = rng.permutation(10_000)[:n].astype(np.int64)
        us = rng.randint(0, n, 500)
        vs = rng.randint(0, n, 500)
        keep = us != vs
        src = np.concatenate([ids[us[keep]], ids[vs[keep]]])
        dst = np.concatenate([ids[vs[keep]], ids[us[keep]]])
        nodes = rd.from_pandas(pd.DataFrame({"node": ids}))

        def run(small_edges):
            edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
            return (corpus.connected_components(nodes, edges, max_rounds=16,
                                                small_edges=small_edges)
                    .to_pandas().sort_values("node").reset_index(drop=True))

        fast = run(None)      # takes the union-find path (500 < CC_SMALL_EDGES)
        slow = run(0)         # forced star contraction
        pd.testing.assert_frame_equal(fast, slow)


def test_cdc_chunks_shift_invariance():
    """The content-defined property: inserting bytes near the front of a
    blob changes only the chunks up to the first post-insertion anchor —
    the chunk hashes after it are IDENTICAL (fixed-size chunking would
    rewrite every downstream chunk)."""
    import hashlib

    import numpy as np

    from housenumbercore_ray.pipelines.corpus import (CDC_DIV, CDC_KJ, CDC_M,
                                                      CDC_W)

    def chunk_hashes(data: bytes) -> list[str]:
        n = len(data)
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        h = np.zeros(n - CDC_W + 1, dtype=np.int64)
        for j, kj in enumerate(CDC_KJ):
            h += (arr[j:n - CDC_W + 1 + j] * kj) % CDC_M
        h %= CDC_M
        cuts = np.flatnonzero(h % CDC_DIV == 0)
        bounds = [0] + [int(c) for c in cuts if c >= 1] + [n]
        hx = data.hex().upper()
        return [hashlib.md5(hx[2 * s:2 * e].encode()).hexdigest()
                for s, e in zip(bounds, bounds[1:])]

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, size=4096, dtype=np.uint8).tobytes()
    edited = base[:10] + b"INSERTED" + base[10:]
    a, b = chunk_hashes(base), chunk_hashes(edited)
    # the tails realign: a long common suffix of chunk hashes survives
    suffix = 0
    while suffix < min(len(a), len(b)) and a[-1 - suffix] == b[-1 - suffix]:
        suffix += 1
    assert suffix >= len(a) - 3, (len(a), len(b), suffix)


def test_line_dedup_antijoin_fallback_matches_broadcast(ray_session, tmp_path):
    """max_broadcast=0 forces the bucketed anti-join path; output must be
    byte-identical to the broadcast membership path on the same pages."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from housenumbercore_ray.pipelines.corpus import line_dedup

    boiler = "copyright 2026 example corp"
    nav = "home | products | contact"
    texts, urls = [], []
    for i in range(12):
        body = f"unique body line {i}\nsecond unique {i * 7}"
        parts = [boiler, body] if i % 2 == 0 else [boiler, nav, body, boiler]
        texts.append("\n".join(parts))
        urls.append(f"https://ex.test/seite/{i}")
    texts.append("")                      # empty page
    urls.append("https://ex.test/leer")
    os.makedirs(tmp_path / "pages", exist_ok=True)
    pq.write_table(pa.table({"url": urls, "text": texts}),
                   tmp_path / "pages" / "p0.parquet")

    def run(max_broadcast):
        return (line_dedup(str(tmp_path), min_pages=3,
                           max_broadcast=max_broadcast)
                .to_pandas().sort_values("url").reset_index(drop=True))

    broadcast = run(4_000_000)
    fallback = run(0)
    assert (broadcast["n_boilerplate"] > 0).any()     # the rule actually fired
    assert (broadcast["n_boilerplate"] == 0).any()    # and left clean pages
    pd.testing.assert_frame_equal(broadcast, fallback)


class TestNgramContainmentPairs:
    """Containment vs Jaccard inclusion semantics: a short excerpt embedded
    verbatim in a much longer page has containment 1.0 but low Jaccard, so
    only the containment pipeline surfaces the pair."""

    def test_inclusion_pair_found_only_by_containment(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.corpus import (
            ngram_containment_pairs, ngram_jaccard_pairs)

        long_words = [f"wort{i}" for i in range(120)]
        long_doc = " ".join(long_words)
        excerpt = " ".join(long_words[40:52])     # 12 words => 10 shingles, all shared
        other = " ".join(f"anders{i}" for i in range(40))
        pq.write_table(
            pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": [long_doc, excerpt, other]}),
            tmp_path / "documents.parquet")

        con = ngram_containment_pairs(str(tmp_path), threshold=0.9).to_pandas()
        assert len(con) == 1
        assert (int(con.iloc[0]["doc_id_a"]), int(con.iloc[0]["doc_id_b"])) == (1, 2)
        assert con.iloc[0]["containment"] == 1.0

        # Jaccard on the same pair is 10/118 — far below any usable threshold
        jac = ngram_jaccard_pairs(str(tmp_path), threshold=0.5).to_pandas()
        assert len(jac) == 0

    def test_oracle_parity_small(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.corpus import ngram_containment_pairs
        from housenumbercore_ray.pipelines.corpus_oracle import (
            ngram_containment_pairs_sql)

        texts = []
        base = [f"t{i}" for i in range(30)]
        texts.append(" ".join(base))                       # 0
        texts.append(" ".join(base[5:15]))                 # 1: contained in 0
        texts.append(" ".join(base[:20] + ["extra", "x"])) # 2: high overlap w/ 0
        texts.append("kurz")                               # 3: <3 tokens edge case
        texts.append("")                                   # 4: empty
        pq.write_table(
            pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts}),
            tmp_path / "documents.parquet")

        eng = (ngram_containment_pairs(str(tmp_path), threshold=0.6)
               .to_pandas().sort_values(["doc_id_a", "doc_id_b"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
        ora = (con.sql(ngram_containment_pairs_sql(threshold=0.6)).df()
               .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
        assert len(eng) >= 2      # the planted inclusion + high-overlap pairs
