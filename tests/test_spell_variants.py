"""Spell-variant mining (FastSS deletion-neighborhood join, lev <= 1).

Corpus-normalization primitive (Bocek et al. 2007; SymSpell): reference
analog is the street-name normalization chain (reference
src/de/regioosm/housenumbercore/util/Street.java normalization), which
only handles EQUALITY after rewriting — this op mines the near-miss
pairs themselves.
"""

import itertools
import os
import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from housenumbercore_ray.pipelines.corpus import (
    _deletion_variants,
    _lev1_mask,
    spell_variants,
)
from housenumbercore_ray.pipelines.corpus_oracle import spell_variants_sql


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


class TestLev1Kernel:
    def test_exact_vs_dp_on_random_words(self):
        rng = random.Random(7)
        words = sorted({"".join(rng.choice("abcäö") for _ in range(rng.randint(3, 7)))
                        for _ in range(400)})
        pairs = [(a, b) for a, b in itertools.combinations(words, 2)
                 if abs(len(a) - len(b)) <= 1]
        a = np.array([p[0] for p in pairs], object)
        b = np.array([p[1] for p in pairs], object)
        got = _lev1_mask(a, b)
        exp = np.array([_lev(x, y) <= 1 for x, y in pairs])
        assert exp.sum() > 100  # the fixture actually exercises accepts
        assert (got == exp).all()

    def test_known_edges(self):
        cases = [("haus", "hause", True), ("test", "tost", True),
                 ("abc", "acb", False), ("aaa", "aaaa", True),
                 ("ab", "ba", False), ("tost", "xtost", True)]
        m = _lev1_mask(np.array([c[0] for c in cases], object),
                       np.array([c[1] for c in cases], object))
        assert list(m) == [c[2] for c in cases]


class TestDeletionVariants:
    def test_emits_word_plus_each_deletion(self):
        dv = _deletion_variants(np.array(["abc"], object),
                                np.array([5], np.int64))
        assert sorted(dv["variant"]) == ["ab", "abc", "ac", "bc"]
        assert set(dv["w"]) == {"abc"} and set(dv["n"]) == {5}

    def test_neighborhood_is_complete_for_lev1(self):
        # any lev<=1 pair must share a variant — the blocking soundness
        rng = random.Random(3)
        words = sorted({"".join(rng.choice("abc") for _ in range(rng.randint(4, 6)))
                        for _ in range(120)})
        dv = _deletion_variants(np.array(words, object),
                                np.ones(len(words), np.int64))
        byw = dv.groupby("w")["variant"].apply(set)
        missed = [(a, b) for a, b in itertools.combinations(words, 2)
                  if _lev(a, b) <= 1 and not (byw[a] & byw[b])]
        assert missed == []


class TestSpellVariantsEndToEnd:
    def test_matches_blocked_levenshtein_oracle(self, ray_session, tmp_path):
        # planted near-miss vocabulary inside a tiny pages world
        texts = ["das haus am see", "das hause am see see",
                 "Die strasse und die strase sind gleich",
                 "haus haus tost test tost", "unrelated wording entirely"]
        wd = str(tmp_path)
        os.makedirs(f"{wd}/pages")
        pq.write_table(pa.table({"text": texts}), f"{wd}/pages/p0.parquet")
        eng = (spell_variants(wd).to_pandas()
               .sort_values(["w1", "w2"]).reset_index(drop=True))
        ora = (duckdb.connect().execute(spell_variants_sql(wd)).df()
               .sort_values(["w1", "w2"]).reset_index(drop=True))
        assert ("haus", "hause") in set(zip(eng["w1"], eng["w2"]))
        assert ("strase", "strasse") in set(zip(eng["w1"], eng["w2"]))
        pd.testing.assert_frame_equal(
            eng.astype({"n1": "int64", "n2": "int64"}),
            ora.astype({"n1": "int64", "n2": "int64"}))
