"""Triangle counting over the bigram co-occurrence graph (degree-oriented,
Suri & Vassilvitskii WWW'11 shape) vs an adjacency-set ground truth and
the id-ordered SQL oracle."""

import os
import re
from collections import defaultdict

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from housenumbercore_ray.pipelines.corpus import (
    cooccurrence_triangles,
    cooccurrence_triangles_sampled,
)
from housenumbercore_ray.pipelines.corpus_oracle import (
    cooccurrence_triangles_sql,
    triangles_sampled_sql,
)

_TOK = re.compile(r"[^a-zäöüß0-9]+")


def _truth(texts):
    edges = set()
    for t in texts:
        ts = [w for w in _TOK.split(t.lower()) if w]
        for x, y in zip(ts[:-1], ts[1:]):
            if x != y:
                edges.add((min(x, y), max(x, y)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = set()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            out.add(tuple(sorted((a, b, c))))
    return out


class TestTriangles:
    def _world(self, tmp_path, texts):
        os.makedirs(tmp_path / "pages", exist_ok=True)
        pq.write_table(pa.table({"text": texts}), tmp_path / "pages" / "p0.parquet")
        return str(tmp_path)

    def test_planted_graph(self, ray_session, tmp_path):
        texts = [
            "alpha beta gamma alpha",        # closes alpha-beta-gamma? a-b, b-g, g-a
            "beta delta alpha delta gamma",  # wedges through delta
            "epsilon zeta",                  # isolated edge: no triangle
            "hub1 x hub1 y hub1 z x y",      # hub word: star + one closing edge
        ]
        wd = self._world(tmp_path, texts)
        eng = cooccurrence_triangles(wd).to_pandas()
        got = set(map(tuple, eng[["a", "b", "c"]].itertuples(index=False)))
        assert got == _truth(texts)
        assert ("alpha", "beta", "gamma") in got
        assert ("hub1", "x", "y") in got
        # each triangle exactly once (orientation counts it at one apex)
        assert len(eng) == len(got)

    def test_sampled_is_monochromatic_subset(self, ray_session, tmp_path):
        """Colorful sampling: the sampled set is exactly the exact set
        restricted to triangles whose three vertices share an md5 color,
        and every row carries est_factor = n_colors²."""
        from housenumbercore_ray.stages.dedup import _md5_hash64

        texts = [
            "alpha beta gamma alpha",
            "beta delta alpha delta gamma",
            "hub1 x hub1 y hub1 z x y",
            "ein haus und ein",   # ein/haus/und all hash to color 1 of 2
        ]
        wd = self._world(tmp_path, texts)
        n_colors = 2
        exact = _truth(texts)
        eng = cooccurrence_triangles_sampled(wd, n_colors=n_colors).to_pandas()
        assert len(eng) > 0
        assert set(eng["est_factor"]) == {n_colors * n_colors}

        def color(v):
            return _md5_hash64(v) % n_colors

        expect = {t for t in exact
                  if color(t[0]) == color(t[1]) == color(t[2])}
        got = set(map(tuple, eng[["a", "b", "c"]].itertuples(index=False)))
        assert got == expect

    def test_sampled_matches_sql_oracle(self, ray_session, tmp_path):
        texts = ["ein haus am see und ein boot am see",
                 "haus und boot und see boot haus",
                 "ein boot ein haus ein see und see",
                 "ein haus und ein"]
        wd = self._world(tmp_path, texts)
        eng = (cooccurrence_triangles_sampled(wd, n_colors=2).to_pandas()
               .sort_values(["a", "b", "c"]).reset_index(drop=True))
        ora = (duckdb.connect().execute(triangles_sampled_sql(wd, n_colors=2)).df()
               .sort_values(["a", "b", "c"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(eng, ora)

    def test_matches_sql_oracle(self, ray_session, tmp_path):
        texts = ["ein haus am see und ein boot am see",
                 "haus und boot und see",
                 "ein boot ein haus ein see"]
        wd = self._world(tmp_path, texts)
        eng = (cooccurrence_triangles(wd).to_pandas()
               .sort_values(["a", "b", "c"]).reset_index(drop=True))
        ora = (duckdb.connect().execute(cooccurrence_triangles_sql(wd)).df()
               .sort_values(["a", "b", "c"]).reset_index(drop=True))
        assert len(eng) > 0
        pd.testing.assert_frame_equal(eng, ora)
