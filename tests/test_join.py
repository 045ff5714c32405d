"""bucketed_hash_join unit tests — dtype-proof bucket hashing (ADVICE r2 #1)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _run(left_df, right_df, left_schema, right_schema):
    import ray.data as rd

    from housenumbercore_ray.stages.join import bucketed_hash_join

    j = bucketed_hash_join(
        rd.from_pandas(left_df), rd.from_pandas(right_df),
        "k", "k", num_buckets=8,
        left_schema=left_schema, right_schema=right_schema,
    )
    return j.to_pandas().sort_values(["k"]).reset_index(drop=True)


class TestBucketedJoinDtypes:
    def test_matching_int_keys(self, ray_session):
        l = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "a": np.arange(10)})
        r = pd.DataFrame({"k": np.arange(0, 20, 2, dtype=np.int64), "b": np.arange(10)})
        out = _run(l, r,
                   {"k": pa.int64(), "a": pa.int64()},
                   {"k": pa.int64(), "b": pa.int64()})
        assert list(out["k"]) == [0, 2, 4, 6, 8]

    def test_int_vs_float_keys_same_bucket(self, ray_session):
        # int64 left keys vs float64 right keys: equal values MUST land in
        # the same bucket (pre-fix, native int64 hash != float64 hash would
        # silently drop every match)
        l = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "a": np.arange(50)})
        r = pd.DataFrame({"k": np.arange(50, dtype=np.float64), "b": np.arange(50)})
        out = _run(l, r,
                   {"k": pa.int64(), "a": pa.int64()},
                   {"k": pa.float64(), "b": pa.int64()})
        assert len(out) == 50

    def test_string_keys(self, ray_session):
        l = pd.DataFrame({"k": [f"s{i}" for i in range(20)], "a": np.arange(20)})
        r = pd.DataFrame({"k": [f"s{i}" for i in range(0, 40, 2)], "b": np.arange(20)})
        out = _run(l, r,
                   {"k": pa.string(), "a": pa.int64()},
                   {"k": pa.string(), "b": pa.int64()})
        assert len(out) == 10
        assert set(out["k"]) == {f"s{i}" for i in range(0, 20, 2)}
