"""Hot-key skew: the skewed world (metropolis ≈ 40% of page mentions,
reference hot-job regime MunicipalityJobs.java:314-318) and the salted
evaluation merge that absorbs it (VERDICT r4 next-round #3)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.sources.worldgen import ensure_world_scale


@pytest.fixture(scope="module")
def skew_world(ray_session):
    return ensure_world_scale("sf0.001skew")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_skew_world_is_skewed(skew_world):
    """The metropolis really holds a hot-key share of the join rows
    (~40% by construction; uniform worlds sit at ~1/M)."""
    from housenumbercore_ray.pipelines import evaluation as ev

    jr = ev.join_rows(skew_world).to_pandas()
    share = float((jr["muni_id"] == 0).mean())
    assert share > 0.30, f"metro share {share:.3f} — skew world not skewed"


def test_salt_splits_hot_key(skew_world):
    """The salted shuffle key actually SPLITS the hot municipality across
    shards (no single reducer gets the whole metropolis) while keeping
    every (muni_id, street_key) co-located on one shard."""
    from housenumbercore_ray.pipelines import evaluation as ev
    from housenumbercore_ray.pipelines.evaluation import EVAL_SALT, _add_shard

    jr = ev.join_rows(skew_world).to_pandas()
    sharded = _add_shard(jr)
    hot = sharded[sharded["muni_id"] == 0]
    n_shards = hot["_shard"].nunique()
    assert n_shards > 1, "salt left the hot municipality on one shard"
    # the hot key's rows spread: no shard holds more than ~2/EVAL_SALT-ish
    # of the metropolis (street-hash balance over EVAL_SALT salts)
    top_share = hot["_shard"].value_counts(normalize=True).iloc[0]
    assert top_share < min(0.9, 3.0 / EVAL_SALT + 0.25), (
        f"hot-key top shard holds {top_share:.2f} of metro rows "
        f"across {n_shards} shards"
    )
    # co-location invariant: one shard per (muni_id, street_key)
    per_key = sharded.groupby(["muni_id", "street_key"])["_shard"].nunique()
    assert (per_key == 1).all()


def test_skew_world_matches_oracle(skew_world):
    """Full evaluation parity on the skewed world — skew changes the data
    distribution, never the results."""
    from housenumbercore_ray.pipelines import evaluation as ev
    from housenumbercore_ray.pipelines.oracle import queries_sql

    got = _normalize(ev.muni_summary(skew_world).to_pandas())
    want = _normalize(duckdb.sql(queries_sql(skew_world)["hnr_muni_summary"]).df())
    assert got.shape == want.shape
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
