"""Shuffle sizing helpers.

Ray Data's sort-based groupby moves M_in × N_out block OBJECTS through the
object store, and N_out tracks the input block count. Row-light datasets
produced under a small ``target_max_block_size`` (tuned for the streaming
pipelines) can arrive at a groupby as hundreds of blocks — at 3.2M pages
the near-dup band rows hit an 800×800 = 640k-object sort whose metadata
traffic dominated end-to-end wall time (measured 332 s to dedupe 76k
rows). Coalescing to ~2 blocks/CPU first is a cheap split/merge and
collapses the matrix to B² ≈ 4k objects (measured 15× on the pair
shuffle); per-reduce memory stays bounded at ~rows/B. B scales with the
cluster's aggregate CPU count, so the same code sizes itself on multi-node
clusters.
"""

from __future__ import annotations


def shuffle_blocks() -> int:
    """Target block count to ``repartition`` to right before a sort-based
    groupby: max(16, 2 × cluster CPUs)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(16, 2 * cpus)
