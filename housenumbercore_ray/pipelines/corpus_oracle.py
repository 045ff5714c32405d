"""DuckDB oracle SQL for the dedup / similarity pipelines.

Every query here is an INDEPENDENT recomputation of the engine result in
SQL — including the approximate ones, which are deterministic given their
fixed hash/plane constants:

  - ``dedup_simhash``: per-token md5-derived bit votes re-summed in SQL;
  - ``dedup_minhash_pairs``: the FULL MinHash+LSH pipeline rebuilt in SQL
    (shingles → 64 wrap-mod minhashes via HUGEINT arithmetic → band
    equality → exact n-gram Jaccard ≥ threshold);
  - ``dedup_minhash_pages``: planted ground truth (worldgen
    near_dup_pages.parquet) joined with an exact SQL Jaccard — independent
    of the engine's LSH entirely;
  - ``ann_lsh_buckets`` / ``ann_lsh_topk``: the signed-projection planes are
    embedded as SQL literals, signatures/hamming/cosine recomputed with
    ``list_dot_product`` / ``bit_count`` / window top-k.

The shared 64-bit base hash is ``('0x' || substr(md5(s),17,16))::UBIGINT``
(bytes 8..16 of md5, big-endian), bit-identical to
``stages.dedup._md5_hash64``. The minhash arithmetic deliberately models
numpy's uint64 WRAPPING semantics: ``((a*x + b) % 2^64) % (2^61-1)``.
"""

from __future__ import annotations

import numpy as np

_U64 = "18446744073709551616"          # 2^64
_P61 = "2305843009213693951"           # 2^61 - 1
_SENTINEL = "CAST(18446744073709551615 AS UBIGINT)"  # empty-shingle signature

_HASH64 = "('0x' || substr(md5({s}), 17, 16))::UBIGINT"


def _tokens_cte(src: str, id_col: str, text_col: str) -> str:
    """tokens list per doc — Python str.split() semantics (empty/whitespace
    text → empty list)."""
    return f"""
tok AS (
  SELECT {id_col} AS doc_id,
         CASE WHEN trim({text_col}) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim({text_col}), '\\s+') END AS ts
  FROM {src}
)"""


def _shingles_cte() -> str:
    """word 3-shingles (distinct) — stages.dedup.shingles semantics."""
    return """
sh AS (
  SELECT doc_id,
         CASE WHEN len(ts) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
              ELSE list_distinct(list_transform(range(1, len(ts) - 1),
                     i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) END AS ss
  FROM tok
)"""


_JACCARD = ("CASE WHEN len({a}) = 0 AND len({b}) = 0 THEN 1.0 "
            "ELSE CAST(len(list_intersect({a}, {b})) AS DOUBLE) "
            "/ len(list_distinct({a} || {b})) END")


def simhash_sql(src: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """dedup_simhash: bit i of the sketch is set iff the ±1 vote sum over all
    token occurrences is > 0; published form drops bit 0 (>> 1)."""
    return f"""
WITH {_tokens_cte(src, id_col, text_col)},
t1 AS (SELECT doc_id, unnest(ts) AS t FROM tok),
th AS (SELECT doc_id, {_HASH64.format(s='t')} AS hv FROM t1),
bits AS (
  SELECT doc_id, r.i AS i,
         sum(CASE WHEN (hv >> r.i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th, range(1, 64) r(i)
  GROUP BY doc_id, r.i
),
sk AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT)) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT CAST(d.{id_col} AS BIGINT) AS doc_id, coalesce(sk.simhash, 0) AS simhash
FROM {src} d LEFT JOIN sk ON sk.doc_id = d.{id_col}
"""


def simhash_pairs_sql(src: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3) -> str:
    """dedup_simhash_pairs: sketches recomputed in SQL, candidate pairs via
    the same 4-band equality the engine uses (EXACT for max_hamming ≤ 3 by
    pigeonhole — the banded join equals the all-pairs hamming filter), then
    the exact popcount filter."""
    band_joins = []
    for shift, mask in [(0, 0xFFFF), (16, 0xFFFF), (32, 0xFFFF), (48, 0x7FFF)]:
        band_joins.append(
            f"SELECT a.doc_id AS ida, b.doc_id AS idb, a.simhash AS sa, b.simhash AS sb "
            f"FROM sk a JOIN sk b ON a.doc_id < b.doc_id "
            f"AND ((a.simhash >> {shift}) & {mask}) = ((b.simhash >> {shift}) & {mask})"
        )
    cand = " UNION ".join(band_joins)
    return f"""
WITH sk AS ({simhash_sql(src, id_col, text_col)}),
cand AS ({cand})
SELECT CAST(ida AS BIGINT) AS doc_id_a, CAST(idb AS BIGINT) AS doc_id_b,
       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def _minhash_list_expr() -> str:
    """The 64-element minhash list: per hash fn k,
    min over shingle hashes x of ((a_k*x + b_k) mod 2^64) mod (2^61-1);
    empty shingle set → uint64-max sentinel. a/b constants are the
    RandomState(12345) draw of stages.dedup._MinHasher."""
    rng = np.random.RandomState(12345)
    prime = (1 << 61) - 1
    a = rng.randint(1, prime, size=64, dtype=np.int64)
    b = rng.randint(0, prime, size=64, dtype=np.int64)
    parts = [
        ("coalesce(list_min(list_transform(hs, x -> "
         f"CAST((CAST({int(ak)} AS HUGEINT) * x + {int(bk)}) % {_U64} AS UBIGINT) % {_P61})), "
         f"{_SENTINEL})")
        for ak, bk in zip(a, b)
    ]
    return "[" + ", ".join(parts) + "]"


_BAND_COLLIDE = (
    "len(list_filter(range(0, 16), bd -> "
    "a.mh[4*bd+1] = b.mh[4*bd+1] AND a.mh[4*bd+2] = b.mh[4*bd+2] AND "
    "a.mh[4*bd+3] = b.mh[4*bd+3] AND a.mh[4*bd+4] = b.mh[4*bd+4])) > 0"
)


def minhash_pairs_sql(src: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.8,
                      out_a: str = "doc_id_a", out_b: str = "doc_id_b") -> str:
    """dedup_minhash_pairs: full LSH pipeline rebuilt in SQL. A band
    collision is modeled directly as equality of the band's 4 minhash values
    (the engine's band hash is an injective fold of exactly those values)."""
    jac = _JACCARD.format(a="c.ssa", b="c.ssb")
    return f"""
WITH {_tokens_cte(src, id_col, text_col)},
{_shingles_cte()},
hh AS (SELECT doc_id, ss, list_transform(ss, s -> {_HASH64.format(s='s')}) AS hs FROM sh),
m AS (SELECT doc_id, ss, {_minhash_list_expr()} AS mh FROM hh),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, a.ss AS ssa, b.ss AS ssb
  FROM m a JOIN m b ON a.doc_id < b.doc_id
  WHERE {_BAND_COLLIDE}
)
SELECT CAST(ida AS BIGINT) AS {out_a}, CAST(idb AS BIGINT) AS {out_b},
       jac AS jaccard
FROM (SELECT c.*, {jac} AS jac FROM cand c)
WHERE jac >= {threshold}
"""


def minhash_pages_sql(world_dir: str, threshold: float = 0.7) -> str:
    """dedup_minhash_pages: the planted near-dup ground truth
    (near_dup_pages.parquet, written by worldgen INDEPENDENTLY of any engine
    code) joined with an exact SQL 3-gram Jaccard — verifies both that the
    engine finds exactly the planted pairs (recall AND precision) and that
    its Jaccard values are exact."""
    jac = _JACCARD.format(a="sa.ss", b="sb.ss")
    return f"""
WITH pages_src AS (
  SELECT CAST(regexp_extract(url, '/seite/([0-9]+)', 1) AS BIGINT) AS pid, text
  FROM read_parquet('{world_dir}/pages/*.parquet')
),
{_tokens_cte('pages_src', 'pid', 'text')},
{_shingles_cte()},
nd AS (SELECT page_a, page_b FROM read_parquet('{world_dir}/near_dup_pages.parquet'))
SELECT CAST(nd.page_a AS BIGINT) AS page_a, CAST(nd.page_b AS BIGINT) AS page_b,
       jac AS jaccard
FROM (
  SELECT nd.*, {jac} AS jac
  FROM nd
  JOIN sh sa ON sa.doc_id = nd.page_a
  JOIN sh sb ON sb.doc_id = nd.page_b
) nd
WHERE jac >= {threshold}
"""


def decontaminate_sql(src: str = "documents", n: int = 4,
                      bench_mod: int = 25) -> str:
    """text_decontaminate: benchmark n-gram overlap recomputed in SQL on the
    RAW GRAM STRINGS (no hashes) — agreement with the engine's md5-hash-set
    membership also confirms the hash path is collision-free on this input."""
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n)) \
        .replace("ts[i+0]", "ts[i]")
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
g AS (
  SELECT doc_id,
         CASE WHEN len(ts) < {n} THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(range(1, len(ts) - {n - 2}), i -> {gram})) END AS grams
  FROM tok
),
e AS (SELECT doc_id, unnest(grams) AS gm FROM g),
bg AS (SELECT DISTINCT gm FROM e WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT e.doc_id, count(bg.gm) AS nh
  FROM e LEFT JOIN bg USING (gm)
  WHERE e.doc_id % {bench_mod} <> 0
  GROUP BY e.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(h.nh, 0) AS BIGINT) AS n_hit_grams,
       CAST(CASE WHEN coalesce(h.nh, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM {src} d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {bench_mod} <> 0
"""


def decontaminate_spans_sql(src: str = "documents", n: int = 4,
                            bench_mod: int = 25) -> str:
    """text_decontaminate_spans: positional n-gram matches recomputed on the
    RAW GRAM STRINGS (vs the engine's md5-hash membership — agreement also
    re-proves collision-freeness), then the same touching-or-overlapping
    merge (gap ≤ n) as a gaps-and-islands window. SQL positions are 1-based;
    the final select converts to the engine's 0-based half-open spans."""
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n)) \
        .replace("ts[i+0]", "ts[i]")
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
g AS (
  SELECT doc_id, i, {gram} AS gm
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - {n - 2})) AS i
        FROM tok WHERE len(ts) >= {n})
),
bg AS (SELECT DISTINCT gm FROM g WHERE doc_id % {bench_mod} = 0),
m AS (SELECT g.doc_id, g.i FROM g JOIN bg USING (gm)
      WHERE g.doc_id % {bench_mod} <> 0),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= {n}
              THEN 0 ELSE 1 END AS brk
  FROM m),
grp AS (
  SELECT doc_id, i,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS gid
  FROM isl)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(i) - 1 AS BIGINT) AS span_start,
       CAST(max(i) - 1 + {n} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM grp GROUP BY doc_id, gid
"""


def dsir_weights_sql(src: str = "documents", n_buckets: int = 1024,
                     target_lang: str = "de") -> str:
    """corpus_dsir_weights: the hashed-unigram importance weights
    recomputed in SQL — same md5 bucket hash (_HASH64 % n_buckets), same
    +1/(N+B) Laplace smoothing and ln-ratio op order; the per-doc sum runs
    over token instances (vs the engine's bucket-count dot product), which
    is the same value up to summation order — absorbed by round(…, 6) on
    BOTH sides."""
    bk = _HASH64.format(s="term") + f" % {n_buckets}"
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
e AS (SELECT doc_id, unnest(ts) AS term FROM tok),
b AS (SELECT e.doc_id, CAST({bk} AS BIGINT) AS bk, d.lang
      FROM e JOIN {src} d USING (doc_id)),
tb AS (SELECT bk, count(*) AS n FROM b WHERE lang = '{target_lang}' GROUP BY bk),
ab AS (SELECT bk, count(*) AS n FROM b GROUP BY bk),
tot AS (SELECT (SELECT count(*) FROM b WHERE lang = '{target_lang}') AS nt,
               (SELECT count(*) FROM b) AS na),
lr AS (
  SELECT g.bk,
         ln(((coalesce(tb.n, 0) + 1.0) / (tot.nt + {n_buckets}))
            / ((coalesce(ab.n, 0) + 1.0) / (tot.na + {n_buckets}))) AS w
  FROM (SELECT unnest(range({n_buckets})) AS bk) g
  LEFT JOIN tb USING (bk) LEFT JOIN ab USING (bk) CROSS JOIN tot),
s AS (SELECT b.doc_id, count(*) AS n_tok, sum(lr.w) AS w
      FROM b JOIN lr USING (bk) GROUP BY b.doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(s.n_tok, 0) AS BIGINT) AS n_tok,
       round(coalesce(s.w, 0.0), 6) AS log_ratio
FROM {src} d LEFT JOIN s USING (doc_id)
"""


def fill_token_budget_sql(src: str = "documents", budget: int = 800) -> str:
    """corpus_fill_token_budget: the per-source running-total cut
    recomputed as a single ordered window cumsum — the engine's two-stage
    exclusive prefix scan must telescope to exactly this."""
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
tk AS (SELECT doc_id, len(ts) AS n_tok FROM tok),
d AS (SELECT s.doc_id, s.source, tk.n_tok
      FROM {src} s JOIN tk USING (doc_id)),
c AS (SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tok
      FROM d)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_tok AS BIGINT) AS n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
FROM c WHERE cum_tok <= {budget}
"""


def stratified_sample_sql(src: str = "documents", rates: dict | None = None,
                          default_rate: int = 60) -> str:
    """corpus_sample_stratified: the md5-derived bucket recomputed in SQL
    (same base hash as _HASH64, over the doc_id rendered as a string)."""
    rates = rates or {"en": 30}
    cases = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(rates.items()))
    bucket = _HASH64.format(s="CAST(doc_id AS VARCHAR)") + " % 100"
    return f"""
WITH b AS (
  SELECT doc_id, lang, CAST({bucket} AS BIGINT) AS bucket,
         CASE {cases} ELSE {default_rate} END AS rate
  FROM {src}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, bucket
FROM b WHERE bucket < rate
"""


def line_dedup_sql(world_dir: str, min_pages: int = 100) -> str:
    """web_line_dedup: boilerplate lines and the cleaned-text md5 recomputed
    in SQL on the RAW LINE STRINGS (the engine works on line hashes —
    agreement also confirms the hash path collision-free)."""
    return f"""
WITH p AS (SELECT url, text FROM read_parquet('{world_dir}/pages/*.parquet')),
ls AS (SELECT url, string_split(text, chr(10)) AS lls FROM p),
l AS (SELECT url, unnest(lls) AS line, generate_subscripts(lls, 1) AS ord FROM ls),
d AS (SELECT line, count(DISTINCT url) AS np FROM l GROUP BY line),
bp AS (SELECT line FROM d WHERE np > {min_pages}),
k AS (SELECT l.url, l.ord, l.line, (bp.line IS NOT NULL) AS is_bp
      FROM l LEFT JOIN bp USING (line))
SELECT url,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       md5(coalesce(string_agg(CASE WHEN NOT is_bp THEN line END, chr(10) ORDER BY ord), '')) AS clean_md5
FROM k GROUP BY url
"""


def cms_counts_sql(src: str = "documents", w: int = 1024, d: int = 4) -> str:
    """corpus_cms_counts: the count-min sketch replayed exactly — same
    md5('i:term') % w cell function, counters as a (row, col) groupby,
    estimate = min over rows, exact = a real count; both integer paths."""
    cell_e = _HASH64.format(s="CAST(r.i AS VARCHAR) || ':' || e.term")
    cell_p = _HASH64.format(s="CAST(r.i AS VARCHAR) || ':' || p.term")
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
e AS (SELECT doc_id, unnest(ts) AS term FROM tok),
probes AS (
  SELECT term FROM (
    SELECT t.term, min(t.ord) AS o
    FROM (SELECT unnest(ts) AS term, generate_subscripts(ts, 1) AS ord
          FROM tok WHERE doc_id = 0) t
    GROUP BY t.term)
  ORDER BY o LIMIT 16),
counters AS (
  SELECT r.i AS row_, CAST({cell_e} % {w} AS BIGINT) AS col_, count(*) AS n
  FROM e CROSS JOIN range({d}) r(i)
  GROUP BY 1, 2),
est AS (
  SELECT p.term, min(coalesce(c.n, 0)) AS est
  FROM probes p CROSS JOIN range({d}) r(i)
  LEFT JOIN counters c
    ON c.row_ = r.i AND c.col_ = CAST({cell_p} % {w} AS BIGINT)
  GROUP BY p.term),
exact AS (SELECT term, count(*) AS n FROM e GROUP BY term)
SELECT p.term, CAST(est.est AS BIGINT) AS est,
       CAST(coalesce(exact.n, 0) AS BIGINT) AS exact
FROM probes p JOIN est USING (term) LEFT JOIN exact USING (term)
"""


def dedup_components_sql(src: str = "documents") -> str:
    """dedup_components: the verified-pair graph rebuilt by the full
    minhash_pairs_sql recomputation (as a subquery), then connected
    components as a recursive reachability closure — min reachable label
    per node is exactly the min-label-propagation fixpoint."""
    pairs = minhash_pairs_sql(src)
    return f"""
WITH RECURSIVE p AS (SELECT * FROM ({pairs})),
e AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM p
      UNION ALL
      SELECT doc_id_b, doc_id_a FROM p),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM {src}
  UNION
  SELECT e.dst, w.label FROM walk w JOIN e ON e.src = w.node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(min(label) AS BIGINT) AS cluster,
       CAST(CASE WHEN node = min(label) THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM walk GROUP BY node
"""


def distinct_hll_sql(world_dir: str, p: int = 12) -> str:
    """web_distinct_urls_hll: the HLL sketch replayed exactly — same md5
    base hash, bucket = top p bits, rho via length(bin(rem)) (exact integer
    bit-length, no float log), the same alpha expression and small-range
    branch, estimate rounded to 6 on both sides."""
    m = 1 << p
    rem_bits = 64 - p
    h = _HASH64.format(s="url")
    return f"""
WITH pages AS (SELECT url FROM read_parquet('{world_dir}/pages/*.parquet')),
h AS (SELECT {h} AS hv FROM pages),
r AS (SELECT CAST(hv >> {rem_bits} AS BIGINT) AS bucket,
             CAST(hv % {1 << rem_bits} AS BIGINT) AS rem FROM h),
rr AS (SELECT bucket,
              max(CASE WHEN rem > 0 THEN {rem_bits + 1} - length(bin(rem))
                       ELSE {rem_bits + 1} END) AS rho
       FROM r GROUP BY bucket),
agg AS (SELECT count(*) AS nz, sum(power(2.0, -rho)) AS s FROM rr),
n AS (SELECT count(*) AS n_exact FROM pages),
est AS (SELECT nz, {m} - nz AS v,
               (0.7213 / (1 + 1.079 / {m})) * {m} * {m} / (({m} - nz) + s) AS raw
        FROM agg)
SELECT CAST({m} AS BIGINT) AS m,
       CAST(nz AS BIGINT) AS nonzero_registers,
       round(CASE WHEN raw <= 2.5 * {m} AND v > 0
                  THEN {m} * ln(CAST({m} AS DOUBLE) / v)
                  ELSE raw END, 6) AS estimate,
       CAST(n.n_exact AS BIGINT) AS n_exact
FROM est, n
"""


def bloom_seen_sql(world_dir: str, m_bits: int = 1 << 20,
                   k_hashes: int = 4) -> str:
    """web_bloom_seen: the bloom filter replayed bit-exactly — positions are
    the shared md5 base hash over 'i:url' mod m; the built filter is the
    DISTINCT position set over all page urls; a probe is in_bloom iff every
    one of its k positions is present (false positives reproduce exactly)."""
    h = _HASH64.format(s="CAST(r.i AS VARCHAR) || ':' || p.probe_url")
    hb = _HASH64.format(s="CAST(r.i AS VARCHAR) || ':' || p.url")
    return f"""
WITH pages AS (SELECT url FROM read_parquet('{world_dir}/pages/*.parquet')),
bits AS (
  SELECT DISTINCT CAST({hb} % {m_bits} AS BIGINT) AS bit
  FROM pages p CROSS JOIN range({k_hashes}) r(i)
),
probes AS (
  SELECT url AS probe_url, CAST(1 AS BIGINT) AS actually_seen FROM pages
  UNION ALL
  SELECT 'https://unseen.example/seite/' || regexp_extract(url, '/seite/([0-9]+)', 1),
         CAST(0 AS BIGINT) FROM pages
),
pb AS (
  SELECT p.probe_url, p.actually_seen,
         CAST({h} % {m_bits} AS BIGINT) AS bit
  FROM probes p CROSS JOIN range({k_hashes}) r(i)
)
SELECT pb.probe_url, pb.actually_seen,
       CAST(CASE WHEN bool_and(b.bit IS NOT NULL) THEN 1 ELSE 0 END AS BIGINT) AS in_bloom
FROM pb LEFT JOIN bits b USING (bit)
GROUP BY pb.probe_url, pb.actually_seen
"""


def _kmeans_ctes(k: int = 8, iters: int = 3, dim: int = 64) -> tuple[str, str]:
    """Shared Lloyd-recursion CTE chain (embedding_kmeans /
    dedup_semantic): returns (cte_sql, final_centroid_cte_name). The chain
    defines ``e`` (vectors as DOUBLE[]) and ``c0..cN`` (round-6 centroid
    iterates); callers append the final assignment."""
    d2 = (f"list_sum(list_transform(range(1, {dim + 1}), "
          f"i -> (e.v[i]-c.cv[i])*(e.v[i]-c.cv[i])))")
    avg_list = "[" + ", ".join(f"round(avg(e.v[{i}]), 6)"
                               for i in range(1, dim + 1)) + "]"
    parts = [f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT vec_id AS cl, v AS cv FROM e WHERE vec_id < {k})"""]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(f""",
a{t} AS (SELECT vec_id, cl FROM (
  SELECT vec_id, cl, d2, row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d2, cl) AS rn
  FROM (SELECT e.vec_id, c.cl, {d2} AS d2 FROM e, {prev} c))
  WHERE rn = 1),
c{t}r AS (SELECT a{t}.cl, {avg_list} AS cv
          FROM a{t} JOIN e USING (vec_id) GROUP BY a{t}.cl),
c{t} AS (SELECT p.cl, coalesce(r.cv, p.cv) AS cv
         FROM {prev} p LEFT JOIN c{t}r r USING (cl))""")
        prev = f"c{t}"
    return "".join(parts), prev


def _kmeans_d2(dim: int) -> str:
    return (f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (e.v[i]-c.cv[i])*(e.v[i]-c.cv[i])))")


def embedding_kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """embedding_kmeans: the full Lloyd recursion unrolled — init = vectors
    with vec_id < k, squared-euclidean argmin (ties → lowest cluster),
    per-iteration centroid averages ROUNDED to 6 (the cross-engine
    summation-noise absorber, same rounding the engine applies), empty
    clusters keep the previous centroid. One CTE pair (assign, centroid)
    per iteration, then the final assignment with round-6 d2."""
    ctes, prev = _kmeans_ctes(k, iters, dim)
    d2 = _kmeans_d2(dim)
    return ctes + f"""
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cl AS BIGINT) AS cluster,
       round(d2, 6) AS d2
FROM (
  SELECT vec_id, cl, d2, row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d2, cl) AS rn
  FROM (SELECT e.vec_id, c.cl, {d2} AS d2 FROM e, {prev} c))
WHERE rn = 1
"""


def semantic_pairs_sql(threshold: float = 0.45, k: int = 8, iters: int = 3,
                       dim: int = 64) -> str:
    """dedup_semantic: same Lloyd recursion for the cluster assignment,
    then within-cluster pairwise cosine ≥ threshold — the SemDeDup
    candidate set recomputed exactly (cross-cluster pairs excluded by the
    algorithm's definition on BOTH sides)."""
    ctes, prev = _kmeans_ctes(k, iters, dim)
    d2 = _kmeans_d2(dim)
    return ctes + f""",
fin AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl, d2, row_number() OVER (PARTITION BY vec_id
                                              ORDER BY d2, cl) AS rn
    FROM (SELECT e.vec_id, c.cl, {d2} AS d2 FROM e, {prev} c))
  WHERE rn = 1
)
SELECT CAST(a.vec_id AS BIGINT) AS vec_id_a, CAST(b.vec_id AS BIGINT) AS vec_id_b,
       round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
FROM fin a JOIN fin b ON a.cl = b.cl AND a.vec_id < b.vec_id
JOIN e ea ON ea.vec_id = a.vec_id
JOIN e eb ON eb.vec_id = b.vec_id
WHERE list_cosine_similarity(ea.v, eb.v) >= {threshold}
"""


def tfidf_topk_sql(src: str = "documents", k: int = 5) -> str:
    """text_tfidf_topk: tf, df, N and tf·ln(N/df) recomputed in SQL; both
    engines round the score to 9 decimals, so a ≤1-ulp libm difference in
    ln cannot flip the emitted values (ordering uses the raw double on both
    sides with term-ascending tie-break)."""
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
e AS (SELECT doc_id, unnest(ts) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM {src}),
s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM s)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rn AS BIGINT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       round(score, 9) AS score
FROM r WHERE rn <= {k}
"""


def bm25_topk_sql(src: str = "documents", k: int = 50, n_query: int = 8,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """text_bm25_topk: Okapi BM25 with Lucene ln(1+…) IDF recomputed in SQL
    — same probe query (first ``n_query`` distinct tokens of doc 0, CMS
    contract), same float literals (``repr`` of the engine's constants) and
    the same operation order in the per-term weight, so the only divergence
    source is libm ln / sum order, absorbed by round(score, 9) on BOTH
    sides before the rank ORDER BY (doc_id tie-break)."""
    k1_l, b_l, k1p_l = repr(float(k1)), repr(float(b)), repr(float(k1) + 1.0)
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
q AS (
  SELECT term FROM (
    SELECT t.term, min(t.ord) AS o
    FROM (SELECT unnest(ts) AS term, generate_subscripts(ts, 1) AS ord
          FROM tok WHERE doc_id = 0) t
    GROUP BY t.term)
  ORDER BY o LIMIT {n_query}),
dl AS (SELECT doc_id, len(ts) AS dl FROM tok),
st AS (SELECT sum(dl) AS sum_dl, count(*) AS n FROM dl),
e AS (SELECT doc_id, unnest(ts) AS term FROM tok),
tf AS (SELECT e.doc_id, e.term, count(*) AS tf
       FROM e JOIN q USING (term) GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
c AS (
  SELECT tf.doc_id, dl.dl,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * {k1p_l}
           / (tf.tf + {k1_l} * (1.0 - {b_l} + {b_l} * dl.dl
                                / (CAST(st.sum_dl AS DOUBLE) / st.n))) AS contrib
  FROM tf JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN st),
s AS (SELECT doc_id, round(sum(contrib), 9) AS score,
             count(*) AS n_terms, min(dl) AS dl
      FROM c GROUP BY doc_id),
r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM s)
SELECT CAST(rank AS BIGINT) AS rank, CAST(doc_id AS BIGINT) AS doc_id,
       score, CAST(n_terms AS BIGINT) AS n_terms, CAST(dl AS BIGINT) AS dl
FROM r WHERE rank <= {k}
"""


def url_canonical_sql(world_dir: str) -> str:
    """web_url_canonical: the same scheme/host/path/query split pattern and
    the same normalization steps (lower, www-strip, slash-rtrim, utm-drop +
    param sort) recomputed with DuckDB string/list functions."""
    from .corpus import URL_SPLIT_RE

    re_ = URL_SPLIT_RE
    return f"""
WITH p AS (SELECT url FROM read_parquet('{world_dir}/pages/*.parquet')),
x AS (
  SELECT url,
         lower(regexp_extract(url, '{re_}', 1)) AS scheme,
         lower(regexp_extract(url, '{re_}', 2)) AS host0,
         rtrim(regexp_extract(url, '{re_}', 3), '/') AS path,
         regexp_extract(url, '{re_}', 4) AS q
  FROM p
),
y AS (
  SELECT url, scheme,
         CASE WHEN starts_with(host0, 'www.') THEN substr(host0, 5)
              ELSE host0 END AS host,
         path,
         CASE WHEN q = '' THEN ''
              ELSE coalesce(array_to_string(
                     list_sort(list_filter(string_split(q, '&'),
                                           z -> NOT starts_with(z, 'utm_'))),
                     '&'), '') END AS q2
  FROM x
)
SELECT url,
       scheme || '://' || host || path ||
         CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canonical_url,
       CAST(CASE WHEN scheme || '://' || host || path ||
                      CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END <> url
                 THEN 1 ELSE 0 END AS BIGINT) AS changed
FROM y
"""


def pack_sequences_sql(src: str = "documents", capacity: int = 128,
                       n_shards: int = 8) -> str:
    """corpus_pack_sequences: the greedy per-shard first-fit recursion
    replayed as a DuckDB recursive CTE (one recursion step per doc rank,
    all shards advancing in lock-step)."""
    return f"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id % {n_shards} AS shard,
         least(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END,
               {capacity}) AS tok,
         row_number() OVER (PARTITION BY doc_id % {n_shards}
                            ORDER BY doc_id) AS rn
  FROM {src}
),
pack AS (
  SELECT shard, rn, doc_id, tok,
         CAST(0 AS BIGINT) AS seq_idx, CAST(0 AS BIGINT) AS tok_offset,
         tok AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.tok,
         CASE WHEN p.fill + d.tok <= {capacity} THEN p.seq_idx
              ELSE p.seq_idx + 1 END,
         CASE WHEN p.fill + d.tok <= {capacity} THEN p.fill ELSE 0 END,
         CASE WHEN p.fill + d.tok <= {capacity} THEN p.fill + d.tok
              ELSE d.tok END
  FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(seq_idx AS BIGINT) AS seq_idx,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(tok AS BIGINT) AS n_tok
FROM pack
"""


def pii_redact_sql(world_dir: str) -> str:
    """web_pii_redact: identical pattern strings (RE2 ∩ Python-re subset),
    same email → ip → phone chaining, recomputed with DuckDB regexp
    functions; agreement proves pattern-semantics parity across engines."""
    from .corpus import PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE

    em, ip, ph = PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE
    return f"""
WITH p AS (SELECT url, text FROM read_parquet('{world_dir}/pages/*.parquet')),
r1 AS (SELECT url,
              len(regexp_extract_all(text, '{em}')) AS n_emails,
              regexp_replace(text, '{em}', '<EMAIL>', 'g') AS t1
       FROM p),
r2 AS (SELECT url, n_emails,
              len(regexp_extract_all(t1, '{ip}')) AS n_ips,
              regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
       FROM r1),
r3 AS (SELECT url, n_emails, n_ips,
              len(regexp_extract_all(t2, '{ph}')) AS n_phones,
              regexp_replace(t2, '{ph}', '<PHONE>', 'g') AS t3
       FROM r2)
SELECT url, CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_ips AS BIGINT) AS n_ips,
       CAST(n_phones AS BIGINT) AS n_phones,
       md5(t3) AS redacted_md5
FROM r3
"""


def repetition_sql(world_dir: str, max_dup_line: float = 0.3,
                   max_dup_char: float = 0.2, max_top2: float = 0.2) -> str:
    """web_repetition: the Gopher repetition metrics recomputed in SQL —
    line counting via unnest/groupby on the raw line strings, the top
    2-gram via a full gram expansion + window top-1 (count DESC, gram ASC),
    every division int→double so it matches the numpy arithmetic bit for
    bit."""
    return f"""
WITH p AS (SELECT url, text, length(text) AS n_chars
           FROM read_parquet('{world_dir}/pages/*.parquet')),
ls AS (SELECT url, string_split(text, chr(10)) AS lls FROM p),
l AS (SELECT url, unnest(lls) AS line FROM ls),
lc AS (SELECT url, line, count(*) AS c, length(line) AS ln FROM l GROUP BY 1, 2),
lm AS (SELECT url, sum(c) AS n_lines, count(*) AS n_distinct,
              sum(c * ln) AS char_total, sum((c - 1) * ln) AS char_dup
       FROM lc GROUP BY url),
tok AS (SELECT url, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                         ELSE string_split_regex(trim(text), '\\s+') END AS ts
        FROM p),
g AS (SELECT url, CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
                       ELSE list_transform(range(1, len(ts)),
                                           i -> ts[i] || ' ' || ts[i+1]) END AS grams
      FROM tok),
e AS (SELECT url, unnest(grams) AS gm FROM g),
gcnt AS (SELECT url, gm, count(*) AS c FROM e GROUP BY 1, 2),
topg AS (SELECT url, gm, c
         FROM (SELECT *, row_number() OVER (PARTITION BY url
                                            ORDER BY c DESC, gm) AS rn
               FROM gcnt)
         WHERE rn = 1),
m AS (
  SELECT p.url,
         CAST(lm.n_lines AS BIGINT) AS n_lines,
         1 - CAST(lm.n_distinct AS DOUBLE) / lm.n_lines AS dup_line_frac,
         CASE WHEN lm.char_total > 0
              THEN CAST(lm.char_dup AS DOUBLE) / lm.char_total
              ELSE 0.0 END AS dup_line_char_frac,
         coalesce(topg.gm, '') AS top_2gram,
         CASE WHEN topg.c IS NOT NULL AND p.n_chars > 0
              THEN CAST(topg.c * length(topg.gm) AS DOUBLE) / p.n_chars
              ELSE 0.0 END AS top_2gram_frac
  FROM p JOIN lm USING (url) LEFT JOIN topg USING (url)
)
SELECT *, CAST(CASE WHEN dup_line_frac <= {max_dup_line}
                     AND dup_line_char_frac <= {max_dup_char}
                     AND top_2gram_frac <= {max_top2}
               THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m
"""


def host_stats_sql(world_dir: str) -> str:
    """web_host_stats: host = third '/'-separated url segment."""
    return f"""
SELECT string_split(url, '/')[3] AS host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM read_parquet('{world_dir}/pages/*.parquet')
GROUP BY 1
"""


def crawl_waves_sql(world_dir: str) -> str:
    """web_crawl_waves: rank-within-host recomputed as a plain window
    function — independent of the engine's shard+sort+cumcount path."""
    return f"""
SELECT url, string_split(url, '/')[3] AS host,
       CAST(row_number() OVER (PARTITION BY string_split(url, '/')[3]
                               ORDER BY url) - 1 AS BIGINT) AS wave
FROM read_parquet('{world_dir}/pages/*.parquet')
"""


def top_ngrams_sql(src: str = "documents", n: int = 3, k: int = 20) -> str:
    """corpus_top_ngrams: total n-gram occurrence counts (NOT per-doc
    distinct), deterministic (count DESC, gram ASC) top-k."""
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n)) \
        .replace("ts[i+0]", "ts[i]")
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
g AS (
  SELECT doc_id,
         CASE WHEN len(ts) < {n} THEN CAST([] AS VARCHAR[])
              ELSE list_transform(range(1, len(ts) - {n - 2}), i -> {gram}) END AS grams
  FROM tok
),
e AS (SELECT unnest(grams) AS gm FROM g),
c AS (SELECT gm, count(*) AS cnt FROM e GROUP BY gm)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, gm) AS BIGINT) AS rank,
       gm AS gram, CAST(cnt AS BIGINT) AS n
FROM c
ORDER BY cnt DESC, gm
LIMIT {k}
"""


def winnow_sql(src: str = "documents", id_col: str = "doc_id",
               text_col: str = "text", k: int = 5, window: int = 4) -> str:
    """text_winnow: winnowing fingerprints recomputed in SQL — k-gram md5
    hashes (63-bit), sliding-window min, consecutive-dup drop, 1-based seq."""
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(k)) \
        .replace("ts[i+0]", "ts[i]")
    return f"""
WITH {_tokens_cte(src, id_col, text_col)},
g AS (
  SELECT doc_id,
         CASE WHEN len(ts) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(ts) < {k} THEN [array_to_string(ts, ' ')]
              ELSE list_transform(range(1, len(ts) - {k - 2}), i -> {gram}) END AS grams
  FROM tok
),
h AS (
  SELECT doc_id,
         list_transform(grams, s -> CAST(({_HASH64.format(s='s')} >> 1) AS BIGINT)) AS hs
  FROM g
),
w AS (
  SELECT doc_id,
         list_transform(range(1, greatest(1, len(hs) - {window - 1}) + 1),
                        i -> list_min(hs[i:i+{window - 1}])) AS mins
  FROM h WHERE len(hs) > 0
),
e AS (SELECT doc_id, unnest(mins) AS m, generate_subscripts(mins, 1) AS pos FROM w),
d AS (SELECT doc_id, m, pos, lag(m) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM e)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS seq,
       m AS fp
FROM d WHERE prev IS NULL OR m <> prev
"""


def winnow_pairs_sql(min_shared: int = 3, max_fp_docs: int = 64) -> str:
    """dedup_winnow_pairs: docs sharing >= min_shared winnowing fingerprints,
    recomputed end-to-end in SQL by wrapping the text_winnow recomputation
    (winnow_sql) in a CTE: distinct (doc, fp) membership, boilerplate cap
    (fingerprints in more than max_fp_docs docs dropped), self-join on fp,
    pair count filter — independently exercising the same cap semantics the
    engine applies before pair expansion."""
    return f"""
WITH wfull AS ({winnow_sql()}),
u AS (SELECT DISTINCT doc_id, fp FROM wfull),
ok AS (SELECT fp FROM u GROUP BY fp HAVING count(*) BETWEEN 2 AND {max_fp_docs}),
uf AS (SELECT u.doc_id, u.fp FROM u JOIN ok USING (fp))
SELECT CAST(a.doc_id AS BIGINT) AS doc_id_a, CAST(b.doc_id AS BIGINT) AS doc_id_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM uf a JOIN uf b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def ngram_jaccard_pairs_sql(src: str = "documents", threshold: float = 0.5,
                            max_sh_docs: int = 64) -> str:
    """dedup_ngram_jaccard: candidate pairs = docs sharing at least one
    shingle whose document frequency is <= max_sh_docs (the same
    boilerplate cap the engine applies before pair expansion, recomputed
    here over shingle STRINGS — the engine's 64-bit md5 shingle hashes
    agree absent collisions); each candidate's EXACT word-3-shingle
    Jaccard recomputed from the full shingle lists, kept at >= threshold."""
    return f"""
WITH {_tokens_cte(src, "doc_id", "text")},
{_shingles_cte()},
inv AS (SELECT doc_id, unnest(ss) AS s FROM sh),
ok AS (SELECT s FROM inv GROUP BY s HAVING count(DISTINCT doc_id) <= {max_sh_docs}),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN ok ON ok.s = a.s
),
j AS (
  SELECT cand.da, cand.db, {_JACCARD.format(a="sa.ss", b="sb.ss")} AS jac
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.da
  JOIN sh sb ON sb.doc_id = cand.db
)
SELECT CAST(da AS BIGINT) AS doc_id_a, CAST(db AS BIGINT) AS doc_id_b,
       jac AS jaccard
FROM j WHERE jac >= {threshold}
"""


# ss lists are already distinct (see _shingles_cte), so plain len() is the
# set cardinality
_CONTAINMENT = ("CASE WHEN least(len({a}), len({b})) = 0 THEN 1.0 "
                "ELSE CAST(len(list_intersect({a}, {b})) AS DOUBLE) "
                "/ least(len({a}), len({b})) END")


def ngram_containment_pairs_sql(src: str = "documents", threshold: float = 0.7,
                                max_sh_docs: int = 64) -> str:
    """dedup_ngram_containment: same candidate generation as the Jaccard
    oracle (shared shingle under the boilerplate doc-frequency cap), then
    exact max-containment |A∩B| / min(|A|,|B|) over the distinct
    word-3-shingle sets, kept at >= threshold."""
    return f"""
WITH {_tokens_cte(src, "doc_id", "text")},
{_shingles_cte()},
inv AS (SELECT doc_id, unnest(ss) AS s FROM sh),
ok AS (SELECT s FROM inv GROUP BY s HAVING count(DISTINCT doc_id) <= {max_sh_docs}),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN ok ON ok.s = a.s
),
j AS (
  SELECT cand.da, cand.db, {_CONTAINMENT.format(a="sa.ss", b="sb.ss")} AS con
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.da
  JOIN sh sb ON sb.doc_id = cand.db
)
SELECT CAST(da AS BIGINT) AS doc_id_a, CAST(db AS BIGINT) AS doc_id_b,
       con AS containment
FROM j WHERE con >= {threshold}
"""


def _plane_literals(dim: int, bits: int = 16, seed: int = 7) -> list[str]:
    """The SignedProjectionLSH planes as SQL double-list literals."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(bits, dim)).astype(np.float64)
    return ["[" + ", ".join(repr(float(v)) for v in row) + "]" for row in planes]


def _signature_expr(vec: str, dim: int) -> str:
    planes = _plane_literals(dim)
    terms = [
        f"(CASE WHEN list_dot_product({vec}, {p}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def lsh_buckets_sql(dim: int) -> str:
    """ann_lsh_buckets: the 16-bit signed-projection signature recomputed
    with the seed-7 planes as literals."""
    sig = _signature_expr("CAST(embedding AS DOUBLE[])", dim)
    return f"""
SELECT CAST({sig} AS BIGINT) AS bucket, CAST(vec_id AS BIGINT) AS vec_id
FROM embeddings
"""


def ivf_topk_sql(query_ids=(0, 1, 2, 3), k: int = 5, nlist: int = 16,
                 nprobe: int = 4) -> str:
    """ann_ivf_topk: the IVF-flat path fully recomputed — centroids are the
    first ``nlist`` vectors (deterministic coarse quantizer), assignment =
    max-cosine centroid (ties → lower id), probes = ``nprobe`` nearest
    centroid lists per query, exact cosine top-k within."""
    qlist = ", ".join(str(q) for q in query_ids)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {nlist}),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qlist})),
ac AS (
  SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS s
  FROM e CROSS JOIN c
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM ac
  ) WHERE rn = 1
),
qp AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT q.qid, a.vec_id, list_cosine_similarity(a.v, q.qv) AS sim
  FROM assign a JOIN qp ON qp.cid = a.cid JOIN q ON q.qid = qp.qid
  WHERE a.vec_id <> q.qid
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id
FROM cand
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) <= {k}
"""


def knn_graph_sql(k: int = 3, nlist: int = 16, nprobe: int = 2) -> str:
    """embedding_knn_graph: the IVF kNN-graph fully recomputed — same
    deterministic coarse quantizer as ``ivf_topk_sql`` (centroids = first
    nlist vectors, assignment = max-cosine centroid with ties → lower cid),
    every vector probes its nprobe nearest lists, exact cosine top-k over
    the probed lists' members; rank-only output (float-free compare)."""
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {nlist}),
ac AS (
  SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS s
  FROM e CROSS JOIN c
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM ac
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS uid, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY s DESC, cid) AS rn
    FROM ac
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.uid, a.vec_id AS vid, list_cosine_similarity(u.v, a.v) AS sim
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN e u ON u.vec_id = p.uid
  WHERE a.vec_id <> p.uid
)
SELECT CAST(uid AS BIGINT) AS src_id,
       CAST(row_number() OVER (PARTITION BY uid ORDER BY sim DESC, vid) AS BIGINT) AS rank,
       CAST(vid AS BIGINT) AS dst_id
FROM cand
QUALIFY row_number() OVER (PARTITION BY uid ORDER BY sim DESC, vid) <= {k}
"""


def hard_negatives_sql(k: int = 3, nlist: int = 16, nprobe: int = 2) -> str:
    """embedding_hard_negatives: the IVF kNN-graph oracle with the label
    constraint — candidates must have a DIFFERENT label than the prober;
    everything else (quantizer, probes, tie rules, rank-only output) is
    identical to ``knn_graph_sql``."""
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {nlist}),
ac AS (
  SELECT e.vec_id, e.label, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS s
  FROM e CROSS JOIN c
),
assign AS (
  SELECT vec_id, label, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM ac
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS uid, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY s DESC, cid) AS rn
    FROM ac
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.uid, a.vec_id AS vid, list_cosine_similarity(u.v, a.v) AS sim
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN e u ON u.vec_id = p.uid
  WHERE a.vec_id <> p.uid AND a.label <> u.label
)
SELECT CAST(uid AS BIGINT) AS src_id,
       CAST(row_number() OVER (PARTITION BY uid ORDER BY sim DESC, vid) AS BIGINT) AS rank,
       CAST(vid AS BIGINT) AS dst_id
FROM cand
QUALIFY row_number() OVER (PARTITION BY uid ORDER BY sim DESC, vid) <= {k}
"""


def lsh_topk_sql(dim: int, query_ids=(0, 1, 2, 3), k: int = 5,
                 max_hamming: int = 6) -> str:
    """ann_lsh_topk: deterministic approximate ANN fully recomputed —
    signature hamming filter (bit_count of xor) then exact cosine top-k."""
    qlist = ", ".join(str(q) for q in query_ids)
    sig = _signature_expr("v", dim)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sg AS (SELECT vec_id, v, CAST({sig} AS BIGINT) AS s FROM e),
q AS (SELECT vec_id AS qid, v AS qv, s AS qs FROM sg WHERE vec_id IN ({qlist})),
cand AS (
  SELECT q.qid, sg.vec_id, list_cosine_similarity(sg.v, q.qv) AS sim
  FROM sg CROSS JOIN q
  WHERE sg.vec_id <> q.qid AND bit_count(xor(sg.s, q.qs)) <= {max_hamming}
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id
FROM cand
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) <= {k}
"""


def _media_gram_src(world_dir: str, width: int = 8, stride: int = 4) -> str:
    """Derived (doc_id, text) source for the media perceptual-hash path:
    text = space-joined UPPERCASE hex byte-grams of the binary payload —
    the exact gram extractor of corpus._media_gram_text, so the standard
    simhash oracles run unchanged on top of it."""
    return (
        "(SELECT CAST(regexp_extract(url, '/seite/([0-9]+)', 1) AS BIGINT) AS doc_id, "
        "array_to_string(list_transform("
        f"range(1, greatest(length(hex(html)) - {width - 1}, 0) + 1, {stride}), "
        f"i -> substr(hex(html), i, {width})), ' ') AS text "
        f"FROM read_parquet('{world_dir}/pages/*.parquet'))"
    )


def media_phash_sql(world_dir: str) -> str:
    """media_phash: SimHash-of-byte-grams sketch recomputed in SQL."""
    return f"""
SELECT doc_id AS page_id, simhash AS phash
FROM ({simhash_sql(_media_gram_src(world_dir))})
"""


def media_phash_pairs_sql(world_dir: str, max_hamming: int = 1) -> str:
    """media_phash_pairs: banded candidate pairs + exact hamming filter over
    the byte-gram sketches (pigeonhole-exact for d ≤ 3)."""
    return f"""
SELECT doc_id_a AS page_a, doc_id_b AS page_b, hamming
FROM ({simhash_pairs_sql(_media_gram_src(world_dir), max_hamming=max_hamming)})
"""


def source_jaccard_sql(k: int = 64) -> str:
    """corpus_source_jaccard: the bottom-k sketch and estimator replayed
    exactly — distinct (source, token) → _md5_hash64 (bit-identical via
    '0x'||substr(md5(tok),17,16)) → per-source k smallest → per-pair union
    sketch → |U ∩ A ∩ B| / |U|."""
    from ..stages.textops import EXOTIC_WS_RE2

    return f"""
WITH d0 AS (SELECT source,
                   regexp_replace(text, '{EXOTIC_WS_RE2}', ' ', 'g') AS text
            FROM documents),
toks AS (SELECT DISTINCT source,
                unnest(string_split_regex(trim(text), '\\s+')) AS tok
         FROM d0 WHERE trim(text) <> ''),
h AS (SELECT DISTINCT source,
             ('0x' || substr(md5(tok), 17, 16))::UBIGINT AS hv FROM toks),
sk AS (SELECT source, hv FROM (
         SELECT source, hv,
                row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
         FROM h)
       WHERE rn <= {k}),
srcs AS (SELECT DISTINCT source FROM sk),
pairs AS (SELECT a.source AS sa, b.source AS sb
          FROM srcs a JOIN srcs b ON a.source < b.source),
uh AS (SELECT DISTINCT p.sa, p.sb, s.hv
       FROM pairs p JOIN sk s ON s.source IN (p.sa, p.sb)),
uk AS (SELECT sa, sb, hv FROM (
         SELECT sa, sb, hv,
                row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn
         FROM uh)
       WHERE rn <= {k}),
est AS (SELECT uk.sa, uk.sb,
               count(*) AS n_union,
               sum(CASE WHEN ia.hv IS NOT NULL AND ib.hv IS NOT NULL
                        THEN 1 ELSE 0 END) AS n_shared
        FROM uk
        LEFT JOIN sk ia ON ia.source = uk.sa AND ia.hv = uk.hv
        LEFT JOIN sk ib ON ib.source = uk.sb AND ib.hv = uk.hv
        GROUP BY uk.sa, uk.sb)
SELECT sa AS source_a, sb AS source_b,
       n_shared::BIGINT AS sketch_shared,
       n_union::BIGINT AS sketch_union,
       n_shared::DOUBLE / n_union AS est_jaccard
FROM est
"""


def bigram_lm_sql() -> str:
    """text_bigram_lm: the whole two-pass model replayed — bigram counts,
    context counts, V, then per-doc  -(Σ occ·ln((c12+1)/(c1+V)))/Σ occ  with
    the engine's exact expression shapes (occ·lp, not lp repeated)."""
    from ..stages.textops import EXOTIC_WS_RE2

    return f"""
WITH d0 AS (SELECT doc_id,
                   regexp_replace(text, '{EXOTIC_WS_RE2}', ' ', 'g') AS text
            FROM documents),
tl AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       FROM d0 WHERE trim(text) <> ''),
bg0 AS (SELECT doc_id,
               unnest(list_transform(range(1, len(l)),
                                     i -> l[i] || chr(31) || l[i+1])) AS gram
        FROM tl WHERE len(l) >= 2),
bg AS (SELECT doc_id, gram, count(*)::BIGINT AS occ
       FROM bg0 GROUP BY doc_id, gram),
cnt AS (SELECT gram, sum(occ)::BIGINT AS c12 FROM bg GROUP BY gram),
ctx AS (SELECT split_part(gram, chr(31), 1) AS w1, sum(occ)::BIGINT AS c1
        FROM bg GROUP BY 1),
vv AS (SELECT count(DISTINCT tok) AS v
       FROM (SELECT unnest(l) AS tok FROM tl)),
s AS (SELECT b.doc_id, b.occ,
             b.occ * ln((c.c12 + 1)::DOUBLE / (x.c1 + (SELECT v FROM vv))) AS slp
      FROM bg b
      JOIN cnt c USING (gram)
      JOIN ctx x ON x.w1 = split_part(b.gram, chr(31), 1))
SELECT doc_id,
       sum(occ)::BIGINT AS n_bigrams,
       (-sum(slp)) / sum(occ) AS nll
FROM s GROUP BY doc_id
"""


def substring_spans_sql(w: int = 8, min_shared: int = 2,
                        max_h_docs: int = 64) -> str:
    """dedup_substring_spans: full-density w-token window hashes, capped
    pair candidacy, and the longest consecutive flagged-position run per
    pair (gaps-and-islands), all recomputed independently."""
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(w)) \
        .replace("ts[i+0]", "ts[i]")
    h64 = _HASH64.format(s="gram")
    return f"""
WITH {_tokens_cte("documents", "doc_id", "text")},
g AS (
  SELECT doc_id,
         CASE WHEN len(ts) < {w} THEN CAST([] AS VARCHAR[])
              ELSE list_transform(range(1, len(ts) - {w - 2}), i -> {gram}) END AS grams
  FROM tok
),
e AS (SELECT doc_id, unnest(grams) AS gram,
             generate_subscripts(grams, 1) AS pos FROM g),
wn AS (SELECT doc_id, pos, CAST(({h64} >> 1) AS BIGINT) AS h FROM e),
mem AS (SELECT DISTINCT doc_id, h FROM wn),
ok AS (SELECT h FROM mem GROUP BY h HAVING count(*) BETWEEN 2 AND {max_h_docs}),
mf AS (SELECT mem.doc_id, mem.h FROM mem JOIN ok USING (h)),
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
  FROM mf a JOIN mf b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {min_shared}
),
flags AS (
  SELECT p.da, p.db, wa.pos,
         CASE WHEN mb.h IS NOT NULL THEN 1 ELSE 0 END AS f
  FROM pairs p
  JOIN wn wa ON wa.doc_id = p.da
  LEFT JOIN mem mb ON mb.doc_id = p.db AND mb.h = wa.h
),
fl AS (SELECT da, db, pos,
              pos - row_number() OVER (PARTITION BY da, db ORDER BY pos) AS isl
       FROM flags WHERE f = 1),
mr AS (SELECT da, db, max(cnt) AS max_run FROM (
         SELECT da, db, isl, count(*) AS cnt FROM fl GROUP BY da, db, isl)
       GROUP BY da, db)
SELECT p.da AS doc_id_a, p.db AS doc_id_b,
       p.shared::BIGINT AS shared_windows,
       coalesce(mr.max_run, 0)::BIGINT AS max_run_windows,
       (CASE WHEN coalesce(mr.max_run, 0) > 0
             THEN coalesce(mr.max_run, 0) + {w} - 1 ELSE 0 END)::BIGINT
         AS max_span_tokens
FROM pairs p LEFT JOIN mr ON mr.da = p.da AND mr.db = p.db
"""


def media_type_sniff_sql(world_dir: str) -> str:
    """media_type_sniff: the magic-number CASE (same fixed order) and the
    byte-histogram entropy recomputed from hex pairs."""
    return f"""
WITH p AS (SELECT url, hex(html) AS hx, octet_length(html) AS n
           FROM read_parquet('{world_dir}/pages/*.parquet')),
b AS (SELECT url, n, substr(hx, 2*i + 1, 2) AS byte
      FROM (SELECT url, n, hx, unnest(range(n)) AS i FROM p)),
cnt AS (SELECT url, n, byte, count(*) AS c FROM b GROUP BY url, n, byte),
ent AS (SELECT url, -sum((c::DOUBLE / n) * log2(c::DOUBLE / n)) AS h
        FROM cnt GROUP BY url)
SELECT p.url,
       CASE WHEN substr(p.hx, 1, 4) = '1F8B' THEN 'application/gzip'
            WHEN substr(p.hx, 1, 8) = '89504E47' THEN 'image/png'
            WHEN substr(p.hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
            WHEN substr(p.hx, 1, 8) = '25504446' THEN 'application/pdf'
            WHEN substr(p.hx, 1, 8) = '47494638' THEN 'image/gif'
            WHEN substr(p.hx, 1, 2) = '3C' THEN 'text/html'
            ELSE 'application/octet-stream' END AS mime,
       p.n::BIGINT AS n_bytes,
       coalesce(ent.h, 0.0) AS entropy_bits
FROM p LEFT JOIN ent USING (url)
"""


def pagerank_sql(damping: float = 0.85, iters: int = 6) -> str:
    """text_pagerank: TextRank over the bigram graph, fully unrolled (the
    kmeans round-6 precedent, here round-9 = the driver's own comparison
    granularity). Edges/weights recomputed independently from the tokens;
    zero-inbound nodes kept alive by the LEFT JOIN, danging mass dropped
    exactly as the engine does."""
    from ..stages.textops import EXOTIC_WS_RE2

    e_cte = f"""
d0 AS (SELECT doc_id,
              regexp_replace(text, '{EXOTIC_WS_RE2}', ' ', 'g') AS text
       FROM documents),
tl AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       FROM d0 WHERE trim(text) <> ''),
bg AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i])) AS src,
              unnest(list_transform(range(1, len(l)), i -> l[i+1])) AS dst
       FROM tl WHERE len(l) >= 2),
e AS (SELECT src, dst, count(*)::BIGINT AS w FROM bg GROUP BY src, dst),
ctx AS (SELECT src, sum(w)::BIGINT AS ww FROM e GROUP BY src),
ew AS (SELECT e.src, e.dst, e.w, ctx.ww FROM e JOIN ctx USING (src)),
nodes AS (SELECT DISTINCT node FROM (
            SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
s{k} AS (SELECT ew.dst, sum(p.r * ew.w / ew.ww) AS s
        FROM ew JOIN r{k - 1} p ON p.node = ew.src
        GROUP BY ew.dst),
r{k} AS (SELECT n.node,
               round((1.0 - {damping!r}) / (SELECT n FROM nn)
                     + {damping!r} * coalesce(s{k}.s, 0.0), 9) AS r
        FROM nodes n LEFT JOIN s{k} ON s{k}.dst = n.node)""")
    return (f"WITH {e_cte}," + ",".join(steps)
            + f"\nSELECT node AS token, r AS rank FROM r{iters}")


def corpus_clean_sql(classifier_sql: str, bench_mod: int = 25) -> str:
    """corpus_clean: the full composition recomputed — exact-dup clique
    (md5(text) equality — connectivity-identical to the engine's star
    pairs), the minhash pair recomputation, recursive reachability closure,
    the classifier keep, and the decontamination flag, joined per doc."""
    return f"""
WITH RECURSIVE
mh AS (SELECT doc_id_a, doc_id_b FROM ({minhash_pairs_sql()})
       WHERE doc_id_a % {bench_mod} <> 0 AND doc_id_b % {bench_mod} <> 0),
dh AS (SELECT doc_id, md5(text) AS h FROM documents
       WHERE doc_id % {bench_mod} <> 0),
ex AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
       FROM dh a JOIN dh b ON a.h = b.h AND a.doc_id < b.doc_id),
p AS (SELECT * FROM mh UNION ALL SELECT * FROM ex),
e AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM p
      UNION ALL SELECT doc_id_b, doc_id_a FROM p),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id % {bench_mod} <> 0
  UNION
  SELECT e.dst, w.label FROM walk w JOIN e ON e.src = w.node
),
comp AS (SELECT node AS doc_id, min(label) AS cluster,
                CASE WHEN node = min(label) THEN 1 ELSE 0 END AS is_can
         FROM walk GROUP BY node),
clf AS (SELECT doc_id, keep AS clf_keep FROM ({classifier_sql})),
dec AS (SELECT doc_id, contaminated FROM ({decontaminate_sql(bench_mod=bench_mod)}))
SELECT CAST(comp.doc_id AS BIGINT) AS doc_id,
       CAST(comp.cluster AS BIGINT) AS cluster,
       CAST(comp.is_can AS BIGINT) AS is_canonical,
       CAST(clf.clf_keep AS BIGINT) AS clf_keep,
       CAST(dec.contaminated AS BIGINT) AS contaminated,
       CAST(CASE WHEN comp.is_can = 1 AND clf.clf_keep = 1
                      AND dec.contaminated = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM comp JOIN clf USING (doc_id) JOIN dec USING (doc_id)
"""


def sq_topk_sql(query_ids=(0, 1, 2, 3), k: int = 5) -> str:
    """ann_sq_topk: the SQ8 path fully recomputed in SQL — row L2
    normalization (cosine-compatible codes, the faiss SQ+IP convention),
    per-dimension symmetric scale s = max(|min|, |max|) over the normalized
    values, the quantizer expression
    ``clip(floor(x / s * 127 + 0.5), -127, 127)`` replayed IEEE-754
    op-for-op (stages.similarity.sq_quantize), integer
    dot-product scores, window top-k by (score desc, vec_id)."""
    qlist = ", ".join(str(q) for q in query_ids)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nrm AS (
  SELECT vec_id, v,
         CASE WHEN sqrt(list_sum(list_transform(v, y -> y * y))) > 0
              THEN sqrt(list_sum(list_transform(v, y -> y * y)))
              ELSE 1.0 END AS nz
  FROM e
),
u AS (
  SELECT vec_id, unnest(v) / nz AS x,
         CAST(generate_subscripts(v, 1) AS BIGINT) AS i
  FROM nrm
),
mm AS (SELECT i, greatest(abs(min(x)), abs(max(x))) AS s FROM u GROUP BY i),
qz AS (
  SELECT u.vec_id, u.i,
         CASE WHEN mm.s > 0
              THEN CAST(least(greatest(floor(u.x / mm.s * 127.0 + 0.5),
                                       -127.0), 127.0) AS BIGINT)
              ELSE 0 END AS qv
  FROM u JOIN mm USING (i)
),
qq AS (SELECT vec_id AS qid, i, qv FROM qz WHERE vec_id IN ({qlist})),
s AS (
  SELECT qq.qid, z.vec_id, sum(z.qv * qq.qv) AS score_q
  FROM qz z JOIN qq USING (i)
  WHERE z.vec_id <> qq.qid
  GROUP BY qq.qid, z.vec_id
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(row_number() OVER w AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(score_q AS BIGINT) AS score_q
FROM s
WINDOW w AS (PARTITION BY qid ORDER BY score_q DESC, vec_id)
QUALIFY row_number() OVER w <= {k}
"""


def chunk_overlap_sql(size: int = 64, stride: int = 48) -> str:
    """corpus_chunk_overlap: windows of ``size`` tokens every ``stride``
    tokens per document (tail may be short; empty docs emit nothing), md5 of
    the space-joined window. Tokenization = exotic-ws normalize + trim +
    RE2 \\s+ split — identical to textops._norm_ws + str.split()."""
    from ..stages.textops import EXOTIC_WS_RE2

    return f"""
WITH dn AS (SELECT doc_id,
                   regexp_replace(text, '{EXOTIC_WS_RE2}', ' ', 'g') AS text
            FROM documents),
d AS (SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\\s+') END AS ts
      FROM dn),
o AS (SELECT doc_id, ts, len(ts) AS n,
             unnest(range(0, len(ts), {stride})) AS off
      FROM d WHERE len(ts) > 0)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(off // {stride} AS BIGINT) AS chunk_id,
       CAST(off AS BIGINT) AS tok_offset,
       CAST(least({size}, n - off) AS BIGINT) AS n_tok,
       md5(array_to_string(ts[off + 1 : off + {size}], ' ')) AS chunk_md5
FROM o
"""


def quality_filter_sql(classifier_sql: str, keep_num: int = 1,
                       keep_den: int = 5) -> str:
    """corpus_quality_filter: per-language top-p% by classifier score with
    doc_id tie-break — the window-rank recomputation of the engine's
    histogram-threshold selection. keep_n = ceil(n·num/den) in exact integer
    arithmetic ((n·num + den − 1) // den) on both sides."""
    return f"""
WITH scored AS ({classifier_sql}),
j AS (SELECT s.doc_id, d.lang, s.score
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY score DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM j)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, score
FROM r WHERE rn <= (n * {keep_num} + {keep_den} - 1) // {keep_den}
"""


def label_centroids_sql() -> str:
    """embedding_label_centroids: per-label count, centroid norm and mean
    squared distance to centroid recomputed from per-dimension sums; round-6
    absorbs cross-engine summation order (the kmeans contract)."""
    return """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT label, count(*) AS n,
             sum(list_sum(list_transform(v, x -> x * x))) AS sumsq
      FROM e GROUP BY label),
u AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e),
s AS (SELECT label, i, sum(x) AS sx FROM u GROUP BY label, i),
c AS (SELECT s.label, sum((s.sx / n.n) * (s.sx / n.n)) AS c2
      FROM s JOIN n USING (label) GROUP BY s.label)
SELECT CAST(n.label AS BIGINT) AS label,
       CAST(n.n AS BIGINT) AS n,
       round(sqrt(c.c2), 6) AS centroid_norm,
       round(n.sumsq / n.n - c.c2, 6) AS dispersion
FROM n JOIN c USING (label)
"""


def dup_rate_by_source_sql() -> str:
    """corpus_dup_rate_by_source: per-source doc / distinct-text /
    duplicate counts — md5(text) is the engine's content hash."""
    return """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dups
FROM documents
GROUP BY source
"""


def shuffle_shards_sql(n_shards: int = 16) -> str:
    """corpus_shuffle_shards: the md5-keyed deterministic permutation
    recomputed in SQL — same base hash as the engine
    (bytes 8..16 of md5, big-endian)."""
    key = _HASH64.format(s="CAST(doc_id AS VARCHAR)")
    return f"""
WITH k AS (SELECT doc_id, {key} AS key FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(key % {n_shards} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY key % {n_shards}
                               ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
FROM k
"""


def sample_weighted_sql(ppm_scale: int = 1_000_000) -> str:
    """corpus_sample_weighted: the integer keep rule replayed in SQL —
    draw = md5-hash64('sw:' || doc_id) mod ppm_scale, threshold =
    (n_chars * ppm_scale) // max(n_chars); pure integer arithmetic on both
    engines, so the decision is bit-identical."""
    key = _HASH64.format(s="'sw:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH mx AS (SELECT max(n_chars) AS m FROM documents),
k AS (SELECT doc_id, source, n_chars,
             CAST({key} % {ppm_scale} AS BIGINT) AS draw,
             (n_chars * {ppm_scale}) // (SELECT m FROM mx) AS thresh
      FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(thresh AS BIGINT) AS keep_ppm
FROM k WHERE draw < thresh
"""


def pca_power_sql(dim: int = 64, iters: int = 8) -> str:
    """embedding_pca_power: the full deterministic power iteration replayed
    in SQL — mean and per-iteration w sums rounded to 6 decimals exactly
    like the engine (absorbing summation order), the normalization /
    sign-fix / Rayleigh arithmetic written as the same left-associative
    IEEE-double chains the engine executes. Generated, like the kmeans and
    minhash oracles: one CTE pair (dot row-expression + 64 rounded sums)
    per iteration."""
    import math

    e = lambda j: f"CAST(embedding[{j + 1}] AS DOUBLE)"
    v0 = repr(1.0 / math.sqrt(dim))   # shortest round-trip literal

    parts = []
    parts.append(
        "mu AS MATERIALIZED (SELECT "
        + ", ".join(
            f"round(sum({e(j)}) / (SELECT count(*) FROM embeddings), 6) AS m{j}"
            for j in range(dim))
        + " FROM embeddings)")

    for k in range(1, iters + 1):
        if k == 1:
            dot = " + ".join(f"({e(j)} - m{j}) * {v0}" for j in range(dim))
            src = "embeddings, mu"
        else:
            dot = " + ".join(f"({e(j)} - m{j}) * v{j}" for j in range(dim))
            src = f"embeddings, mu, n{k - 1}"
        parts.append(f"r{k} AS MATERIALIZED (SELECT embedding, ({dot}) AS dot FROM {src})")
        parts.append(
            f"it{k} AS MATERIALIZED (SELECT "
            + ", ".join(f"round(sum(({e(j)} - m{j}) * dot), 6) AS w{j}"
                        for j in range(dim))
            + f" FROM r{k}, mu)")
        ss = " + ".join(f"w{j} * w{j}" for j in range(dim))
        parts.append(f"s{k} AS MATERIALIZED (SELECT *, sqrt({ss}) AS nrm FROM it{k})")
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT "
            + ", ".join(f"w{j} / nrm AS v{j}" for j in range(dim))
            + f", nrm FROM s{k})")

    final = "\nUNION ALL\n".join(
        f"SELECT CAST({j} AS BIGINT) AS component, "
        f"round(CASE WHEN v0 < 0 THEN -v{j} ELSE v{j} END, 6) AS loading, "
        f"round(nrm / (SELECT count(*) FROM embeddings), 6) AS eigval "
        f"FROM n{iters}"
        for j in range(dim))
    return "WITH " + ",\n".join(parts) + "\n" + final


def spell_variants_sql(world_dir: str, min_len: int = 4, max_len: int = 20) -> str:
    """text_spell_variants: INDEPENDENT recomputation — blocked self-join
    (lev<=1 pairs with len>=2 provably share their first or last char;
    the edit touches one end at most) + DuckDB's levenshtein(), a wholly
    different algorithm from the engine's FastSS deletion-neighborhood
    join. Same explicit [^a-zäöüß0-9]+ token class on both sides (no
    ``\\s`` RE2-vs-Python divergence possible)."""
    return f"""
WITH toks AS (SELECT unnest(string_split_regex(lower(text), '[^a-zäöüß0-9]+')) AS w
              FROM read_parquet('{world_dir}/pages/*.parquet')),
v AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks
      WHERE length(w) BETWEEN {min_len} AND {max_len} GROUP BY w)
SELECT a.w AS w1, b.w AS w2, a.n AS n1, b.n AS n2
FROM v a JOIN v b
  ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
 AND (left(a.w,1) = left(b.w,1) OR right(a.w,1) = right(b.w,1))
WHERE levenshtein(a.w, b.w) <= 1
"""


def cooccurrence_triangles_sql(world_dir: str) -> str:
    """text_cooccurrence_triangles: INDEPENDENT id-ordered 3-way self-join
    (the engine uses degree-ordered orientation — different algorithm,
    same triangle set). String order parity: DuckDB's binary UTF-8
    compare equals Python codepoint order (UTF-8 is order-preserving)."""
    return f"""
WITH toks AS (
  SELECT string_split_regex(lower(text), '[^a-zäöüß0-9]+') AS ts
  FROM read_parquet('{world_dir}/pages/*.parquet')),
bi AS (
  SELECT DISTINCT least(ts[i], ts[i+1]) AS lo, greatest(ts[i], ts[i+1]) AS hi
  FROM toks, LATERAL unnest(range(1, len(ts))) AS u(i)
  WHERE ts[i] <> '' AND ts[i+1] <> '' AND ts[i] <> ts[i+1])
SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
FROM bi e1
JOIN bi e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
JOIN bi e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
"""


def triangles_sampled_sql(world_dir: str, n_colors: int = 4) -> str:
    """text_triangles_sampled: same independent 3-way self-join, restricted
    to monochromatic edges under the engine's md5-hash64 vertex coloring
    (colorful sampling — the color rule is the shared spec, the triangle
    enumeration is recomputed independently)."""
    color = "(" + _HASH64.format(s="{v}") + f" % {n_colors})"
    return f"""
WITH toks AS (
  SELECT string_split_regex(lower(text), '[^a-zäöüß0-9]+') AS ts
  FROM read_parquet('{world_dir}/pages/*.parquet')),
bi0 AS (
  SELECT DISTINCT least(ts[i], ts[i+1]) AS lo, greatest(ts[i], ts[i+1]) AS hi
  FROM toks, LATERAL unnest(range(1, len(ts))) AS u(i)
  WHERE ts[i] <> '' AND ts[i+1] <> '' AND ts[i] <> ts[i+1]),
bi AS (
  SELECT lo, hi FROM bi0
  WHERE {color.format(v='lo')} = {color.format(v='hi')})
SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c,
       CAST({n_colors * n_colors} AS BIGINT) AS est_factor
FROM bi e1
JOIN bi e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
JOIN bi e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
"""


def pq_topk_sql(query_ids=(0, 1, 2, 3), k: int = 5, m: int = 16,
                kc: int = 16, iters: int = 4, dim: int = 64) -> str:
    """ann_pq_topk: the per-subspace Lloyd training, code assignment and
    ADC scoring replayed end-to-end in SQL. One CTE chain with the
    subspace index as a COLUMN (``sub`` = vectors × range(m) sub-slices):
    init = subvectors of vec_id < kc, per-iteration argmin assignment
    (ties → lowest cluster) and round-6 centroid averages with empty
    clusters keeping the previous centroid — the embedding_kmeans
    contract per subspace — then the final codes, per-(query, vector,
    subspace) squared distances to the ASSIGNED centroid, summed and
    rounded to 6, ranked (d2_adc, vec_id) per query."""
    sd = dim // m
    d2 = (f"list_sum(list_transform(range(1, {sd + 1}), "
          f"i -> (x.sv[i]-c.cv[i])*(x.sv[i]-c.cv[i])))")
    avg_list = "[" + ", ".join(f"round(avg(x.sv[{i}]), 6)"
                               for i in range(1, sd + 1)) + "]"
    ids = ", ".join(str(int(q)) for q in query_ids)
    parts = [f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sub AS (SELECT e.vec_id, t.s, e.v[(t.s*{sd}+1):(t.s*{sd}+{sd})] AS sv
        FROM e, range(0, {m}) t(s)),
c0 AS (SELECT s, vec_id AS cl, sv AS cv FROM sub WHERE vec_id < {kc})"""]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(f""",
a{t} AS (SELECT vec_id, s, cl FROM (
  SELECT vec_id, s, cl, d2, row_number() OVER (PARTITION BY vec_id, s
                                               ORDER BY d2, cl) AS rn
  FROM (SELECT x.vec_id, x.s, c.cl, {d2} AS d2
        FROM sub x JOIN {prev} c ON c.s = x.s))
  WHERE rn = 1),
c{t}r AS (SELECT a{t}.s, a{t}.cl, {avg_list} AS cv
          FROM a{t} JOIN sub x ON x.vec_id = a{t}.vec_id AND x.s = a{t}.s
          GROUP BY a{t}.s, a{t}.cl),
c{t} AS (SELECT p.s, p.cl, coalesce(r.cv, p.cv) AS cv
         FROM {prev} p LEFT JOIN c{t}r r ON r.s = p.s AND r.cl = p.cl)""")
        prev = f"c{t}"
    parts.append(f""",
codes AS (SELECT vec_id, s, cl FROM (
  SELECT vec_id, s, cl, d2, row_number() OVER (PARTITION BY vec_id, s
                                               ORDER BY d2, cl) AS rn
  FROM (SELECT x.vec_id, x.s, c.cl, {d2} AS d2
        FROM sub x JOIN {prev} c ON c.s = x.s))
  WHERE rn = 1),
q AS (SELECT vec_id AS qid, s, sv FROM sub WHERE vec_id IN ({ids})),
per AS (SELECT q.qid, co.vec_id,
               list_sum(list_transform(range(1, {sd + 1}),
                 i -> (q.sv[i]-c.cv[i])*(q.sv[i]-c.cv[i]))) AS pd2
        FROM q JOIN codes co ON co.s = q.s
        JOIN {prev} c ON c.s = co.s AND c.cl = co.cl),
ad AS (SELECT qid, vec_id, round(sum(pd2), 6) AS d2_adc
       FROM per GROUP BY 1, 2)
SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id, d2_adc
FROM (SELECT qid, vec_id, d2_adc,
             row_number() OVER (PARTITION BY qid
                                ORDER BY d2_adc, vec_id) AS rn
      FROM ad)
WHERE rn <= {k}
""")
    return "".join(parts)


def gram_novelty_sql(src: str = "documents", n: int = 5) -> str:
    """corpus_gram_novelty: min-doc gram ownership and per-doc novelty
    recomputed on the raw gram strings (distinct per doc, docs shorter
    than n tokens drop out of the GROUP BY)."""
    gram = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n)) \
        .replace("ts[i+0]", "ts[i]")
    return f"""
WITH {_tokens_cte(src, 'doc_id', 'text')},
g AS (
  SELECT doc_id,
         CASE WHEN len(ts) < {n} THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(range(1, len(ts) - {n - 2}), i -> {gram})) END AS grams
  FROM tok
),
e AS (SELECT doc_id, unnest(grams) AS gm FROM g),
mn AS (SELECT gm, min(doc_id) AS own FROM e GROUP BY gm)
SELECT CAST(e.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN mn.own = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(sum(CASE WHEN mn.own = e.doc_id THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM e JOIN mn USING (gm)
GROUP BY e.doc_id
"""


def fps_sample_sql(k: int = 16, dim: int = 64) -> str:
    """embedding_fps_sample: the greedy farthest-point chain replayed
    round by round — m0 = round-6 d2 to the seed, each round picks the
    max-md row (ties → lowest vec_id) and folds the new center in with
    least(md, round-6 d2), exactly the engine's recomputed running min."""
    def d2(a: str, b: str) -> str:
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))")

    parts = [f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m0 AS MATERIALIZED (SELECT e.vec_id, round({d2('e.v', 'c.v')}, 6) AS md
       FROM e JOIN e c ON c.vec_id = 0)"""]
    prev = "m0"
    for t in range(1, k):
        parts.append(f""",
s{t} AS MATERIALIZED (SELECT vec_id, md FROM {prev} ORDER BY md DESC, vec_id LIMIT 1),
m{t} AS MATERIALIZED (SELECT m.vec_id,
                least(m.md, round({d2('ev.v', 'cv.v')}, 6)) AS md
         FROM {prev} m
         JOIN e ev ON ev.vec_id = m.vec_id
         CROSS JOIN (SELECT e.v FROM e JOIN s{t} ON e.vec_id = s{t}.vec_id) cv)""")
        prev = f"m{t}"
    rows = ["SELECT CAST(1 AS BIGINT) AS rank, CAST(0 AS BIGINT) AS vec_id, 0.0 AS radius"]
    for t in range(1, k):
        rows.append(f"SELECT CAST({t + 1} AS BIGINT), CAST(vec_id AS BIGINT), md FROM s{t}")
    parts.append("\n" + "\nUNION ALL ".join(rows) + "\n")
    return "".join(parts)


def trigram_lm_sql() -> str:
    """text_trigram_lm: the stupid-backoff chain replayed — train-half
    trigram/bigram/unigram counts with their context denominators, then
    per-occurrence CASE walking exactly the engine's backoff branches and
    the same division shapes; -(Σ occ·ln S)/Σ occ per doc."""
    from ..stages.textops import EXOTIC_WS_RE2

    return f"""
WITH d0 AS (SELECT doc_id,
                   regexp_replace(text, '{EXOTIC_WS_RE2}', ' ', 'g') AS text
            FROM documents),
tl AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       FROM d0 WHERE trim(text) <> ''),
tg0 AS (SELECT doc_id,
               unnest(list_transform(range(1, len(l) - 1),
                      i -> l[i] || chr(31) || l[i+1] || chr(31) || l[i+2])) AS tri,
               unnest(list_transform(range(1, len(l) - 1),
                      i -> l[i] || chr(31) || l[i+1])) AS ctx,
               unnest(list_transform(range(1, len(l) - 1),
                      i -> l[i+1] || chr(31) || l[i+2])) AS bi23,
               unnest(list_transform(range(1, len(l) - 1), i -> l[i+2])) AS w3
        FROM tl WHERE len(l) >= 3),
tg AS (SELECT doc_id, tri, any_value(ctx) AS ctx, any_value(bi23) AS bi23,
              any_value(w3) AS w3, count(*)::BIGINT AS occ
       FROM tg0 GROUP BY doc_id, tri),
c123t AS (SELECT tri, sum(occ)::BIGINT AS c123 FROM tg
          WHERE doc_id % 2 = 0 GROUP BY tri),
c12t AS (SELECT ctx, sum(occ)::BIGINT AS c12 FROM tg
         WHERE doc_id % 2 = 0 GROUP BY ctx),
bg0 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || chr(31) || l[i+1])) AS bi,
               unnest(list_transform(range(1, len(l)), i -> l[i])) AS w1
        FROM tl WHERE len(l) >= 2 AND doc_id % 2 = 0),
c23t AS (SELECT bi, count(*)::BIGINT AS c23 FROM bg0 GROUP BY bi),
c2t AS (SELECT w1, count(*)::BIGINT AS c2 FROM bg0 GROUP BY w1),
ug AS (SELECT unnest(l) AS w FROM tl WHERE doc_id % 2 = 0),
nv AS (SELECT count(*)::BIGINT AS n, count(DISTINCT w)::BIGINT AS v FROM ug),
c3t AS (SELECT w, count(*)::BIGINT AS c3 FROM ug GROUP BY w),
s AS (SELECT g.doc_id, g.occ,
             g.occ * ln(CASE WHEN t.c123 IS NOT NULL
                               THEN t.c123::DOUBLE / x.c12
                             WHEN b.c23 IS NOT NULL
                               THEN 0.4 * b.c23::DOUBLE / w.c2
                             ELSE 0.16 * (coalesce(u.c3, 0) + 1)::DOUBLE
                                  / (nv.n + nv.v) END) AS slp
      FROM tg g
      LEFT JOIN c123t t ON t.tri = g.tri
      LEFT JOIN c12t x ON x.ctx = g.ctx
      LEFT JOIN c23t b ON b.bi = g.bi23
      LEFT JOIN c2t w ON w.w1 = split_part(g.bi23, chr(31), 1)
      LEFT JOIN c3t u ON u.w = g.w3
      CROSS JOIN nv)
SELECT doc_id, sum(occ)::BIGINT AS n_trigrams, (-sum(slp)) / sum(occ) AS nll
FROM s GROUP BY doc_id
"""


def zipf_fit_sql(top_k: int = 1000) -> str:
    """corpus_zipf_fit: token counts, global (count DESC, token ASC)
    ranking limited to top_k, and the closed-form least-squares slope /
    intercept with the engine's literal expression shapes."""
    from ..stages.textops import EXOTIC_WS_RE2

    return f"""
WITH d0 AS (SELECT doc_id,
                   regexp_replace(text, '{EXOTIC_WS_RE2}', ' ', 'g') AS text
            FROM documents),
tl AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       FROM d0 WHERE trim(text) <> ''),
ug AS (SELECT unnest(l) AS w FROM tl),
cnt AS (SELECT w, count(*)::BIGINT AS c FROM ug GROUP BY w),
tot AS (SELECT sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types FROM cnt),
top AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank
        FROM cnt ORDER BY c DESC, w LIMIT {top_k}),
xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM top),
fit AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM xy)
SELECT tot.n_tokens, tot.n_types,
       CAST(fit.n AS BIGINT) AS fit_k,
       round(-((fit.sxy - fit.sx * fit.sy / fit.n)
               / (fit.sxx - fit.sx * fit.sx / fit.n)), 6) AS alpha,
       round(fit.sy / fit.n - ((fit.sxy - fit.sx * fit.sy / fit.n)
                               / (fit.sxx - fit.sx * fit.sx / fit.n))
                              * (fit.sx / fit.n), 6) AS c
FROM fit, tot
"""


def char_entropy_sql() -> str:
    """text_char_entropy: per-char counts via positional substr unnest,
    −Σ p·ln p per doc with the engine's division/log shapes; empty docs
    emit 0.0 via the left join."""
    return """
WITH ch AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
        FROM documents WHERE text IS NOT NULL)
),
cc AS (SELECT doc_id, c, count(*)::BIGINT AS k FROM ch GROUP BY doc_id, c),
tl AS (SELECT doc_id, coalesce(len(text), 0)::BIGINT AS n FROM documents),
h AS (SELECT cc.doc_id,
             sum(-(cc.k::DOUBLE / tl.n) * ln(cc.k::DOUBLE / tl.n)) AS ent
      FROM cc JOIN tl USING (doc_id) GROUP BY cc.doc_id)
SELECT tl.doc_id, tl.n AS n_chars,
       round(coalesce(h.ent, 0.0), 6) AS entropy
FROM tl LEFT JOIN h USING (doc_id)
"""


def media_cdc_chunks_sql(world_dir: str) -> str:
    """media_cdc_chunks: the position-local anchor hash, cut set and chunk
    md5 replayed on the hex-decoded bytes — byte(i) = ('0x'||substr(hx,
    2i+1, 2))::BIGINT, the identical polynomial/mod shapes, md5 over the
    hex substring (DuckDB hex() is uppercase, matching the engine)."""
    from .corpus import CDC_DIV, CDC_KJ, CDC_M, CDC_W

    def byte(off: str) -> str:
        return f"(('0x' || substr(hx, 2*({off}) + 1, 2))::BIGINT)"

    terms = " + ".join(f"({byte(f'i + {j}')} * {kj}) % {CDC_M}"
                       for j, kj in enumerate(CDC_KJ))
    return f"""
WITH p AS (SELECT url, hex(html) AS hx, octet_length(html)::BIGINT AS n
           FROM read_parquet('{world_dir}/pages/*.parquet')
           WHERE octet_length(html) > 0),
pos AS (SELECT url, hx, unnest(range(1, n - {CDC_W} + 1)) AS i
        FROM p WHERE n >= {CDC_W}),
cuts AS (SELECT url, i FROM pos
         WHERE (({terms}) % {CDC_M}) % {CDC_DIV} = 0),
bounds AS (
  SELECT DISTINCT url, b FROM (
    SELECT url, 0 AS b FROM p
    UNION ALL SELECT url, i AS b FROM cuts
    UNION ALL SELECT url, n AS b FROM p)
),
ordered AS (SELECT url, b,
                   row_number() OVER (PARTITION BY url ORDER BY b) AS k
            FROM bounds),
chunks AS (SELECT a.url, a.k - 1 AS chunk_idx, a.b AS start,
                  nx.b - a.b AS length
           FROM ordered a
           JOIN ordered nx ON nx.url = a.url AND nx.k = a.k + 1)
SELECT c.url, CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
       CAST(c.start AS BIGINT) AS start, CAST(c.length AS BIGINT) AS length,
       md5(substr(p.hx, 2*c.start + 1, 2*c.length)) AS chunk_md5
FROM chunks c JOIN p USING (url)
"""


def dedup_keep_best_sql(src: str = "documents") -> str:
    """corpus_dedup_keep_best: components recomputed via the recursive
    closure, token counts via the shared whitespace-token expression, then
    the keep-longest rule as a plain window rank (n_tokens DESC, doc_id) —
    integer-only ordering, so no FP-argmax ambiguity exists between the
    engines."""
    comp = dedup_components_sql(src)
    ntok = ("CASE WHEN trim(text) = '' THEN 0 "
            "ELSE length(string_split_regex(trim(text), '\\s+')) END")
    return f"""
WITH comp AS (SELECT * FROM ({comp})),
tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST({ntok} AS BIGINT) AS n_tokens FROM {src}),
j AS (SELECT c.cluster, c.doc_id, t.n_tokens
      FROM comp c JOIN tok t USING (doc_id)),
r AS (SELECT cluster, doc_id, n_tokens,
             count(*) OVER (PARTITION BY cluster) AS n_members,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n_tokens DESC, doc_id) AS rn
      FROM j)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(doc_id AS BIGINT) AS keep_doc_id,
       CAST(n_tokens AS BIGINT) AS kept_n_tokens,
       CAST(n_members AS BIGINT) AS n_members
FROM r WHERE rn = 1
"""


def source_js_divergence_sql() -> str:
    """corpus_js_divergence: per-source JSD (bits) vs the whole-corpus
    unigram distribution; absent-token tail folded into ½·(1 − cov)."""
    return """
WITH tok AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS ts
  FROM documents
),
tl AS (SELECT source, unnest(ts) AS t FROM tok),
c AS (SELECT source, t, CAST(count(*) AS DOUBLE) AS k FROM tl GROUP BY 1, 2),
ns AS (SELECT source, sum(k) AS n FROM c GROUP BY 1),
g AS (SELECT t, sum(k) AS kg FROM c GROUP BY 1),
tot AS (SELECT sum(k) AS nn FROM c),
terms AS (
  SELECT c.source, c.k / ns.n AS p, g.kg / tot.nn AS q
  FROM c JOIN ns USING (source) JOIN g USING (t) CROSS JOIN tot
),
agg AS (
  SELECT source,
         sum(0.5 * p * log2(p / ((p + q) / 2))
             + 0.5 * q * log2(q / ((p + q) / 2))) AS part,
         sum(q) AS cov
  FROM terms GROUP BY 1
)
SELECT agg.source, CAST(ns.n AS BIGINT) AS n_tokens,
       round(agg.part + 0.5 * (1 - agg.cov), 6) AS js_bits
FROM agg JOIN ns USING (source)
ORDER BY agg.source
"""


def heavy_hitters_sql(k: int = 32) -> str:
    """corpus_heavy_hitters: exact top-k tokens, (count desc, token asc)."""
    return f"""
WITH tok AS (
  SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS ts
  FROM documents
),
tl AS (SELECT unnest(ts) AS t FROM tok),
c AS (SELECT t, count(*) AS n FROM tl GROUP BY t)
SELECT CAST(row_number() OVER (ORDER BY n DESC, t) AS BIGINT) AS rank,
       t AS tok, CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, t LIMIT {k}
"""


def perplexity_buckets_sql() -> str:
    """text_perplexity_buckets: per-lang tertiles of the round-6 trigram
    nll; cuts at the ceil(n/3)/ceil(2n/3) order statistics, ties to the
    lower bucket — the same rule the engine states."""
    return f"""
WITH s AS ({trigram_lm_sql()}),
j AS (SELECT s.doc_id, d.lang,
             round(s.nll, 6) AS nll_r,
             CAST(round(round(s.nll, 6) * 1e6) AS BIGINT) AS s6
      FROM s JOIN documents d USING (doc_id)),
n AS (SELECT lang, count(*) AS n FROM j GROUP BY 1),
h AS (SELECT lang, s6, count(*) AS c FROM j GROUP BY 1, 2),
cum AS (SELECT lang, s6, sum(c) OVER (PARTITION BY lang ORDER BY s6) AS ck
        FROM h),
cuts AS (SELECT cum.lang,
                min(s6) FILTER (WHERE ck >= ceil(n.n / 3.0)) AS c1,
                min(s6) FILTER (WHERE ck >= ceil(2.0 * n.n / 3.0)) AS c2
         FROM cum JOIN n USING (lang) GROUP BY 1)
SELECT j.doc_id, j.lang, j.nll_r,
       CASE WHEN j.s6 <= c.c1 THEN 'head'
            WHEN j.s6 <= c.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM j JOIN cuts c USING (lang)
"""
