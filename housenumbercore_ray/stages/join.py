"""Explicit partitioned (bucketed) hash join — the both-sides-large join.

Small-side joins in this engine broadcast (``ray.put`` + per-batch lookup,
SURVEY.md J3/J9). When BOTH sides are large, the portable Ray Data pattern
is: add ``bucket = hash(key) % B`` to both sides, co-locate buckets with one
``groupby(bucket)``, and run the per-bucket join as a vectorized pandas merge
inside ``map_groups`` (ray_guide.md "Joins and lookups"). B is the shuffle
fan-out knob; skewed keys salt into sub-buckets by raising B.

Implementation detail: Ray's ``union`` requires identical schemas, so both
sides are projected into one combined frame (other side's columns = NA) with
a ``_side`` tag; the per-bucket merge strips the padding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["bucketed_hash_join"]


def bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    num_buckets: int = 32,
    how: str = "inner",
    left_schema: dict | None = None,
    right_schema: dict | None = None,
) -> rd.Dataset:
    """Hash-partitioned join of two Datasets on integer/string keys.

    Returns the pandas-merge result per bucket (left columns + right
    columns, pandas suffix rules apply to collisions).

    Pass ``left_schema`` / ``right_schema`` (column → pyarrow DataType)
    whenever the caller knows them: ``Dataset.schema()`` EXECUTES the
    upstream pipeline (a limit cannot short-circuit all-to-all stages), so
    inferring the schema of a shuffled side doubles its work."""
    if left_schema is None:
        s = left.schema()
        left_schema = dict(zip(s.names, s.types))
    if right_schema is None:
        s = right.schema()
        right_schema = dict(zip(s.names, s.types))
    lcols = list(left_schema)
    rcols = list(right_schema)
    all_cols = list(dict.fromkeys(lcols + rcols))
    # Arrow type per column (either side) → typed padding for the absent
    # side, so both sides union with IDENTICAL Arrow schemas rather than
    # relying on null-type promotion (brittle across Ray/Arrow versions)
    arrow_types = dict(right_schema)
    arrow_types.update(left_schema)

    def _pad_dtype(t):
        import pyarrow as pa

        if isinstance(t, pa.DataType):
            return pd.ArrowDtype(t)
        return object  # pandas-block schema (e.g. object column): untyped NA

    pad_dtypes = {c: _pad_dtype(t) for c, t in arrow_types.items()}

    # Canonical key dtype for bucket hashing, derived from the DECLARED
    # schemas: both sides' key arrays are cast to ONE dtype before
    # pd.util.hash_array, so an int64/float64/object dtype mismatch between
    # sides can never send equal keys to different buckets (ADVICE r2 #1).
    def _key_kind(t):
        import pyarrow as pa

        if isinstance(t, pa.DataType):
            if pa.types.is_integer(t):
                return "i"
            if pa.types.is_floating(t):
                return "f"
        return "o"

    kinds = {_key_kind(left_schema.get(left_on)), _key_kind(right_schema.get(right_on))}
    if kinds == {"i"}:
        _key_cast = np.int64
    elif kinds <= {"i", "f"}:
        _key_cast = np.float64
    else:
        _key_cast = object

    def pad(side: str, key: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=b.index)
            for c in all_cols:
                if c in b.columns:
                    out[c] = b[c]
                else:
                    out[c] = pd.Series(pd.NA, index=b.index, dtype=pad_dtypes[c])
            out["_side"] = side
            karr = b[key].to_numpy()
            try:
                karr = karr.astype(_key_cast)
            except (TypeError, ValueError):
                karr = karr.astype(object)
            out["_bucket"] = (pd.util.hash_array(karr) % num_buckets).astype(np.int64)
            return out

        return fn

    both = left.map_batches(pad("L", left_on), batch_format="pandas").union(
        right.map_batches(pad("R", right_on), batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "L"][lcols]
        rg = g[g["_side"] == "R"][rcols]
        return lg.merge(rg, left_on=left_on, right_on=right_on, how=how)

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")
