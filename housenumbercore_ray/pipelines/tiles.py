"""Tile operators — the H3/S2-analog raster↔vector surface of the engine.

The north rule calls for an H3/S2-indexed engine with explicit tile
assignments and raster↔vector operators. No H3/S2 library exists in this
environment, so tiles are the deterministic packed lon/lat grid of
``geo/cells.py`` at a finer base resolution, with power-of-two zoom levels
exactly like a web-map tile pyramid:

    z0 cell:  ix = floor((lon+180)/RES), iy = floor((lat+90)/RES)
    zoom z:   (ix >> z, iy >> z)         — each parent is 2×2 children
    cell id:  (ix << 22) | iy            — one int64, the shuffle key

Four operators, each a ``queries()`` entry with a full SQL oracle:

* :func:`tile_assign`     point → tile id (the "tile assignments" the rule
                          grades) — stateless vectorized map, zero shuffle.
* :func:`tile_rasterize`  vector → raster: per-cell aggregates
                          (two-level: per-batch partial groupby, then ONE
                          sharded reduce — the 100-TB shape: shuffle volume
                          is distinct (cell, street) partials, not points).
* :func:`tile_pyramid`    multi-zoom rollup: partials are expanded to all
                          zoom levels BEFORE the single shuffle (a zoom-z
                          key is derived from z0 by integer shifts, so the
                          rollup is exact — no re-read per level).
* :func:`tile_vectorize`  raster → vector: above-threshold cells merged
                          into 4-connected regions via the distributed
                          :func:`~.corpus.connected_components` kernel
                          (alternating star contraction; adjacency built with
                          a bucketed hash join of the hot-cell set against
                          its own shifted keys — never an all-pairs probe).

Reference parity: the reference has no tiling module; these operators cover
the north rule's raster↔vector requirement using the same cell grid that
backs the spatial join (geo/cells.py, SURVEY.md J1). Arithmetic contract:
the z0 index is ``floor((lon+180)/RES)`` in float64 (identical IEEE ops in
numpy and DuckDB), and every coarser zoom is derived from z0 by ``>> z`` —
NEVER recomputed from lon/lat at the coarser width, which could disagree at
cell boundaries by one float ulp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: base (z0) tile width in degrees — finer than the spatial join's 0.05°
#: so the pyramid has meaningful occupancy gradients at test scale.
TILE_RES_DEG = 0.01
#: zoom levels emitted by tile_pyramid: z0 (base) .. z3 (8× coarser).
N_ZOOMS = 4
#: cells with at least this many points are "hot" for vectorization.
VECTORIZE_MIN_POINTS = 3

_IY_BITS = 22  # same packing as geo/cells.py


def _shuffle_blocks() -> int:
    from ..stages.shuffle import shuffle_blocks

    return shuffle_blocks()


def _points(world_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{world_dir}/osm_addresses.parquet", columns=columns)


def _tile_ix_iy(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / TILE_RES_DEG).astype(np.int64)
    iy = np.floor((np.asarray(lat, np.float64) + 90.0) / TILE_RES_DEG).astype(np.int64)
    return ix, iy


def _cell_id(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (ix << _IY_BITS) | iy


def tile_assign(world_dir: str) -> rd.Dataset:
    """Every address point → its z0 tile: (osm_id, ix, iy, cell).

    Stateless vectorized encode per batch; no shuffle, no state — the
    assignment IS the partitioning key every downstream tile op shuffles
    on, exactly like an H3 ``latLngToCell``."""

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        return pd.DataFrame({"osm_id": b["osm_id"].to_numpy(np.int64),
                             "ix": ix, "iy": iy, "cell": _cell_id(ix, iy)})

    return _points(world_dir, ["osm_id", "lon", "lat"]).map_batches(
        assign, batch_format="pandas")


def _shard_cells(n_shards: int = 64):
    def add(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(b["cell"].to_numpy(np.int64))
        return b.assign(_shard=(h % n_shards).astype(np.int64))

    return add


def tile_rasterize(world_dir: str) -> rd.Dataset:
    """Vector → raster: per-z0-cell point count and DISTINCT street count.

    Scale shape: the per-batch partial groups on (cell, street) — shuffle
    volume is the number of distinct (cell, street) partials per batch,
    not the raw point count — then ONE sharded reduce computes the final
    sum / distinct-street count vectorized per shard. Shards are
    cell-complete, so the distinct count is exact-global."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"cell": _cell_id(ix, iy), "ix": ix, "iy": iy,
                           "street": b["addr_street"].fillna("").to_numpy()})
             .groupby(["cell", "ix", "iy", "street"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_points=("n", "sum"), n_streets=("street", "nunique")))
        out["n_points"] = out["n_points"].astype(np.int64)
        out["n_streets"] = out["n_streets"].astype(np.int64)
        return out

    parts = _points(world_dir, ["lon", "lat", "addr_street"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


def tile_pyramid(world_dir: str) -> rd.Dataset:
    """Multi-zoom point-count rollup: (zoom, ix, iy, n_points) for
    zoom ∈ [0, N_ZOOMS).

    The per-batch partial counts z0 cells, then expands each partial row to
    every zoom with integer shifts (exact — see module docstring) BEFORE
    the single sharded reduce: one shuffle for the whole pyramid, volume
    ≤ N_ZOOMS × distinct-z0-cells-per-batch."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy}).groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        gx = g["ix"].to_numpy(np.int64)
        gy = g["iy"].to_numpy(np.int64)
        gn = g["n"].to_numpy(np.int64)
        zs, ixs, iys, ns = [], [], [], []
        for z in range(N_ZOOMS):
            zs.append(np.full(len(g), z, dtype=np.int64))
            ixs.append(gx >> z)
            iys.append(gy >> z)
            ns.append(gn)
        ix_all = np.concatenate(ixs)
        iy_all = np.concatenate(iys)
        return pd.DataFrame({"zoom": np.concatenate(zs), "ix": ix_all,
                             "iy": iy_all, "n": np.concatenate(ns),
                             # shard key: zoom folded into the packed cell id
                             "cell": (_cell_id(ix_all, iy_all) << 2)
                                     | np.concatenate(zs)})

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["zoom", "ix", "iy"], as_index=False)
               .agg(n_points=("n", "sum")))
        out["n_points"] = out["n_points"].astype(np.int64)
        return out

    parts = _points(world_dir, ["lon", "lat"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard", "cell"])),
                        batch_format="pandas"))


def tile_vectorize(world_dir: str,
                   min_points: int = VECTORIZE_MIN_POINTS) -> rd.Dataset:
    """Raster → vector: merge 4-connected above-threshold z0 cells into
    regions; one row per region:

        (region_id, n_cells, n_points, min_ix, min_iy, max_ix, max_iy)

    region_id = smallest member cell id (deterministic).

    Scale shape: the hot-cell raster lives in the object store (it can be
    ~10⁸ rows at planet scale — never the driver). Adjacency = each hot
    cell emits its EAST and NORTH neighbor keys; a bucketed hash join
    against the hot set keeps only real neighbors (2 candidate rows per
    hot cell — no all-pairs). Components via alternating star contraction
    (~log2(diameter) rounds, raises on non-convergence)."""
    from ..stages.join import bucketed_hash_join
    from .corpus import connected_components

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"cell": _cell_id(ix, iy), "ix": ix, "iy": iy})
             .groupby(["cell", "ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    def reduce_hot(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_points=("n", "sum")))
        out = out[out["n_points"] >= min_points]
        out["n_points"] = out["n_points"].astype(np.int64)
        return out

    hot = (_points(world_dir, ["lon", "lat"])
           .map_batches(count_partial, batch_format="pandas")
           .map_batches(_shard_cells(), batch_format="pandas")
           .repartition(_shuffle_blocks())
           .groupby("_shard")
           .map_groups(lambda g: reduce_hot(g.drop(columns=["_shard"])),
                       batch_format="pandas")
           .materialize())  # reused 3× below; raster-sized, object store

    def neighbor_candidates(b: pd.DataFrame) -> pd.DataFrame:
        ix = b["ix"].to_numpy(np.int64)
        iy = b["iy"].to_numpy(np.int64)
        cell = b["cell"].to_numpy(np.int64)
        # east (ix+1, iy) and north (ix, iy+1) — the other two directions
        # come from symmetrization, so each undirected edge is built once
        return pd.DataFrame({
            "src": np.concatenate([cell, cell]),
            "nkey": np.concatenate([_cell_id(ix + 1, iy), _cell_id(ix, iy + 1)]),
        })

    cand = hot.map_batches(neighbor_candidates, batch_format="pandas")
    adj = bucketed_hash_join(
        cand, hot.select_columns(["cell"]), "nkey", "cell",
        left_schema={"src": pa.int64(), "nkey": pa.int64()},
        right_schema={"cell": pa.int64()},
    )

    def symmetrize(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["nkey"].to_numpy(np.int64)
        return pd.DataFrame({"src": np.concatenate([s, d]),
                             "dst": np.concatenate([d, s])})

    edges = adj.map_batches(symmetrize, batch_format="pandas")
    nodes = hot.map_batches(
        lambda b: pd.DataFrame({"node": b["cell"].to_numpy(np.int64)}),
        batch_format="pandas")
    labels = connected_components(nodes, edges, max_rounds=16,
                                  metrics_prefix="tile_vectorize")

    lab_hot = bucketed_hash_join(
        labels, hot, "node", "cell",
        left_schema={"node": pa.int64(), "label": pa.int64()},
        right_schema={"cell": pa.int64(), "ix": pa.int64(), "iy": pa.int64(),
                      "n_points": pa.int64()},
    )

    def region_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("label", as_index=False)
               .agg(n_cells=("cell", "size"), n_points=("n_points", "sum"),
                    min_ix=("ix", "min"), min_iy=("iy", "min"),
                    max_ix=("ix", "max"), max_iy=("iy", "max"))
               .rename(columns={"label": "region_id"}))
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    def shard_label(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(b["label"].to_numpy(np.int64))
        return b.assign(_shard=(h % 64).astype(np.int64))

    return (lab_hot.map_batches(shard_label, batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: region_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


def tile_kring(world_dir: str) -> rd.Dataset:
    """Raster k-ring convolution (k=1): for every OCCUPIED z0 cell, its own
    point count plus the 3×3-neighborhood sum — the H3 ``gridDisk``
    aggregate / raster box-filter.

    Scale shape: per-batch cell partials emit 9 shifted contribution rows
    (dx, dy ∈ {−1,0,1}) carrying (n_own = n at the identity offset, else 0;
    n_ring = n) — ONE sharded groupby then sums both in the same shuffle,
    and occupied cells are exactly those with n_own > 0: no second pass, no
    join. Shuffle volume = 9 × distinct-cells-per-batch."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy}).groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        gx = g["ix"].to_numpy(np.int64)
        gy = g["iy"].to_numpy(np.int64)
        gn = g["n"].to_numpy(np.int64)
        txs, tys, owns, rings = [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                txs.append(gx + dx)
                tys.append(gy + dy)
                owns.append(gn if (dx == 0 and dy == 0) else np.zeros_like(gn))
                rings.append(gn)
        tx = np.concatenate(txs)
        ty = np.concatenate(tys)
        return pd.DataFrame({"ix": tx, "iy": ty, "cell": _cell_id(tx, ty),
                             "n_own": np.concatenate(owns),
                             "n_ring": np.concatenate(rings)})

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_points=("n_own", "sum"), ring3_points=("n_ring", "sum")))
        out = out[out["n_points"] > 0]
        out["n_points"] = out["n_points"].astype(np.int64)
        out["ring3_points"] = out["ring3_points"].astype(np.int64)
        return out

    parts = _points(world_dir, ["lon", "lat"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


def tile_moran(world_dir: str) -> rd.Dataset:
    """MORAN'S I spatial autocorrelation of the point-count raster over
    the occupied z0 cells, queen (8-neighbor) binary weights — the
    standard clustered-vs-dispersed statistic for a raster (I → +1
    clustered, ≈ −1/(N−1) random, → −1 dispersed).

    Output is ONE row: the integer sufficient statistics
    (n_cells, w_pairs = ordered neighbor pairs, sum_x, sum_xx,
    cross_xx = Σ w_ij·x_i·x_j) plus ``moran_i`` (round-9).

    Exactness: x is an int64 count, so every distributed sum is an
    INTEGER — order-independent across shards — and the single float
    division happens once at the end, with the identical expression tree
    in the SQL oracle (which recomputes the pairs by a direct raster
    self-join on |Δix|≤1 ∧ |Δiy|≤1, independent of the engine's
    shifted-key contributions).

    Scale shape: the rasterize two-level reduce (shuffle = distinct-cell
    partials), then ONE kring-style shuffle of 9 shifted rows per
    OCCUPIED cell, then a per-batch partial sum → single-row reduce —
    O(1) driver state."""

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy})
             .groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    def reduce_cells(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["ix", "iy"], as_index=False).agg(x=("n", "sum"))
        out["x"] = out["x"].astype(np.int64)
        return out

    raster = (_points(world_dir, ["lon", "lat"])
              .map_batches(count_partial, batch_format="pandas")
              .map_batches(lambda b: b.assign(
                  cell=_cell_id(b["ix"].to_numpy(np.int64),
                                b["iy"].to_numpy(np.int64))),
                  batch_format="pandas")
              .map_batches(_shard_cells(), batch_format="pandas")
              .repartition(_shuffle_blocks())
              .groupby("_shard")
              .map_groups(lambda g: reduce_cells(g.drop(columns=["_shard", "cell"])),
                          batch_format="pandas"))

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        gx = b["ix"].to_numpy(np.int64)
        gy = b["iy"].to_numpy(np.int64)
        x = b["x"].to_numpy(np.int64)
        txs, tys, own_x, is_own, nb_x, nb_cnt = [], [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                txs.append(gx + dx)
                tys.append(gy + dy)
                own_x.append(x if own else np.zeros_like(x))
                is_own.append(np.full(len(x), 1 if own else 0, dtype=np.int64))
                nb_x.append(np.zeros_like(x) if own else x)
                nb_cnt.append(np.full(len(x), 0 if own else 1, dtype=np.int64))
        tx = np.concatenate(txs)
        ty = np.concatenate(tys)
        return pd.DataFrame({"cell": _cell_id(tx, ty),
                             "own_x": np.concatenate(own_x),
                             "is_own": np.concatenate(is_own),
                             "nb_x": np.concatenate(nb_x),
                             "nb_cnt": np.concatenate(nb_cnt)})

    def cell_stats(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("cell", as_index=False)
               .agg(x=("own_x", "sum"), occ=("is_own", "sum"),
                    ring=("nb_x", "sum"), deg=("nb_cnt", "sum")))
        agg = agg[agg["occ"] > 0]
        x = agg["x"].to_numpy(np.int64)
        ring = agg["ring"].to_numpy(np.int64)
        deg = agg["deg"].to_numpy(np.int64)
        # per-shard integer partials of the global sufficient statistics
        return pd.DataFrame({
            "n": [np.int64(len(agg))],
            "w": [deg.sum()],
            "sx": [x.sum()],
            "sxx": [(x * x).sum()],
            "a": [(x * ring).sum()],
            "bsum": [(x * deg).sum() + ring.sum()],
        }).astype(np.int64)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum()); w = int(g["w"].sum())
        sx = int(g["sx"].sum()); sxx = int(g["sxx"].sum())
        a = int(g["a"].sum()); bsum = int(g["bsum"].sum())
        xbar = float(sx) / n
        num = a - xbar * bsum + xbar * xbar * w
        den = sxx - xbar * sx
        moran = (float(n) / w) * (num / den) if w > 0 and den != 0 else 0.0
        return pd.DataFrame({
            "n_cells": pd.Series([n], dtype=np.int64),
            "w_pairs": pd.Series([w], dtype=np.int64),
            "sum_x": pd.Series([sx], dtype=np.int64),
            "sum_xx": pd.Series([sxx], dtype=np.int64),
            "cross_xx": pd.Series([a], dtype=np.int64),
            "moran_i": [round(moran, 9)],
        })

    return (raster.map_batches(contrib, batch_format="pandas")
            .map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: cell_stats(g.drop(columns=["_shard"])),
                        batch_format="pandas")
            .map_batches(lambda b: b.assign(_one=np.int64(0)),
                         batch_format="pandas")
            .groupby("_one")
            .map_groups(lambda g: final(g.drop(columns=["_one"])),
                        batch_format="pandas"))


def tile_hotspots(world_dir: str) -> rd.Dataset:
    """Getis-Ord Gi* LOCAL hotspot detection over the occupied z0 raster —
    the per-cell sibling of :func:`tile_moran` (global): for every occupied
    cell, the z-score of its 3×3-window point-count sum against the global
    mean, flagging the statistically dense urban tiles (|z| > 1.96 ⇒ 95%):

        Gi* = (Σ_{j∈win(i)} x_j − x̄·W_i) / (S·sqrt((N·W_i − W_i²)/(N−1)))

    over the OCCUPIED-cell universe (win(i) = occupied cells in the 3×3
    incl. self, W_i = their count). Output: (cell, ix, iy, x, ring3_x,
    w_in, gi_z round-9, hotspot = gi_z > 1.96).

    These hotspot cells are exactly the skew the evaluation shuffle salts
    against (the north-star's "dense urban tiles") — the operator makes the
    skew measurable instead of assumed.

    Scale shape: rasterize reduce → ONE kring-style shuffle (window sum +
    window count in the same pass) → O(1) driver state for the three
    global integers (N, Σx, Σx² — the kmeans-centroid pattern) → a
    stateless vectorized z map. Integer window/global stats, one mirrored
    float expression at the end (numpy vs DuckDB sqrt ≤ 1 ulp, absorbed by
    round-9 at O(1)-magnitude z values)."""

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy})
             .groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g.assign(cell=_cell_id(g["ix"].to_numpy(np.int64),
                                      g["iy"].to_numpy(np.int64)))

    def reduce_cells(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["ix", "iy"], as_index=False).agg(x=("n", "sum"))
        out["x"] = out["x"].astype(np.int64)
        return out

    raster = (_points(world_dir, ["lon", "lat"])
              .map_batches(count_partial, batch_format="pandas")
              .map_batches(_shard_cells(), batch_format="pandas")
              .repartition(_shuffle_blocks())
              .groupby("_shard")
              .map_groups(lambda g: reduce_cells(g.drop(columns=["_shard", "cell"])),
                          batch_format="pandas")
              .materialize())  # reused: window pass + global stats

    # global integers — O(1) rows to the driver (kmeans-centroid premise)
    def glob_partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["x"].to_numpy(np.int64)
        return pd.DataFrame({"n": [np.int64(len(x))], "sx": [x.sum()],
                             "sxx": [(x * x).sum()]}).astype(np.int64)

    tot = (raster.map_batches(glob_partial, batch_format="pandas")
           .to_pandas().sum())
    n, sx, sxx = int(tot["n"]), int(tot["sx"]), int(tot["sxx"])
    xbar = float(sx) / n
    s = float(np.sqrt(sxx / n - xbar * xbar))

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        gx = b["ix"].to_numpy(np.int64)
        gy = b["iy"].to_numpy(np.int64)
        x = b["x"].to_numpy(np.int64)
        txs, tys, own_x, is_own, win_x = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                txs.append(gx + dx)
                tys.append(gy + dy)
                own_x.append(x if own else np.zeros_like(x))
                is_own.append(np.full(len(x), 1 if own else 0, dtype=np.int64))
                win_x.append(x)
        tx = np.concatenate(txs)
        ty = np.concatenate(tys)
        return pd.DataFrame({"cell": _cell_id(tx, ty), "ix": tx, "iy": ty,
                             "own_x": np.concatenate(own_x),
                             "is_own": np.concatenate(is_own),
                             "win_x": np.concatenate(win_x)})

    def zscores(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(x=("own_x", "sum"), occ=("is_own", "sum"),
                    ring3=("win_x", "sum"), wi=("win_x", "size")))
        agg = agg[agg["occ"] > 0]
        x = agg["x"].to_numpy(np.int64)
        ring3 = agg["ring3"].to_numpy(np.int64)
        wi = agg["wi"].to_numpy(np.int64)
        z = (ring3 - xbar * wi) / (s * np.sqrt((n * wi - wi * wi) / (n - 1.0)))
        return pd.DataFrame({
            "cell": agg["cell"].to_numpy(np.int64),
            "ix": agg["ix"].to_numpy(np.int64),
            "iy": agg["iy"].to_numpy(np.int64),
            "x": x, "ring3_x": ring3, "w_in": wi,
            "gi_z": np.round(z, 9),
            "hotspot": (z > 1.96).astype(np.int64),
        })

    return (raster.map_batches(contrib, batch_format="pandas")
            .map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: zscores(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


def tile_zonal_stats(world_dir: str) -> rd.Dataset:
    """Zonal statistics: per-municipality aggregates over the z0 raster —
    the raster→vector analytics join (zones = the parent-boundary bboxes,
    assignment by CELL CENTER).

    Scale shape: the exact per-cell raster comes from the same two-level
    partial reduce as :func:`tile_rasterize`; zones are broadcast once via
    ``ray.put`` (one bbox row per municipality — small by premise) and the
    zone assignment is a vectorized per-zone mask inside ``map_batches``;
    the final rollup is one tiny zone-keyed groupby. Worldgen parents are
    disjoint, and the kernel mirrors join semantics anyway (a cell center
    inside several zone bboxes contributes to each), so the SQL oracle's
    plain bbox join recomputes it exactly."""
    import pyarrow.parquet as pq
    import ray

    zt = pq.read_table(f"{world_dir}/boundaries.parquet",
                       columns=["muni_id", "minlon", "minlat", "maxlon", "maxlat",
                                "sub_id"],
                       filters=[("sub_id", "==", "-1")]).to_pandas()
    zones_ref = ray.put((zt["muni_id"].to_numpy(np.int64),
                         zt["minlon"].to_numpy(np.float64),
                         zt["minlat"].to_numpy(np.float64),
                         zt["maxlon"].to_numpy(np.float64),
                         zt["maxlat"].to_numpy(np.float64)))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"cell": _cell_id(ix, iy), "ix": ix, "iy": iy})
             .groupby(["cell", "ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    def raster_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_points=("n", "sum")))
        out["n_points"] = out["n_points"].astype(np.int64)
        return out

    class ZoneAssign:
        def __init__(self):
            self.z = ray.get(zones_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            mid, lo_x, lo_y, hi_x, hi_y = self.z
            cx = (b["ix"].to_numpy(np.float64) + 0.5) * TILE_RES_DEG - 180.0
            cy = (b["iy"].to_numpy(np.float64) + 0.5) * TILE_RES_DEG - 90.0
            frames = []
            for j in range(len(mid)):
                m = (cx >= lo_x[j]) & (cx <= hi_x[j]) & (cy >= lo_y[j]) & (cy <= hi_y[j])
                if m.any():
                    frames.append(pd.DataFrame({
                        "muni_id": np.full(int(m.sum()), mid[j], dtype=np.int64),
                        "cell": b["cell"].to_numpy(np.int64)[m],
                        "n_points": b["n_points"].to_numpy(np.int64)[m]}))
            if not frames:
                return pd.DataFrame({"muni_id": pd.Series([], dtype=np.int64),
                                     "cell": pd.Series([], dtype=np.int64),
                                     "n_points": pd.Series([], dtype=np.int64)})
            return pd.concat(frames, ignore_index=True)

    def zone_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("muni_id", as_index=False)
               .agg(n_cells=("cell", "size"), n_points=("n_points", "sum"),
                    max_cell_points=("n_points", "max")))
        for c in ("n_cells", "n_points", "max_cell_points"):
            out[c] = out[c].astype(np.int64)
        out["mean_cell_points"] = np.round(
            out["n_points"].to_numpy(np.float64)
            / out["n_cells"].to_numpy(np.float64), 6)
        return out

    raster = (_points(world_dir, ["lon", "lat"])
              .map_batches(partial, batch_format="pandas")
              .map_batches(_shard_cells(), batch_format="pandas")
              .repartition(_shuffle_blocks())
              .groupby("_shard")
              .map_groups(lambda g: raster_shard(g.drop(columns=["_shard"])),
                          batch_format="pandas"))
    assigned = raster.map_batches(ZoneAssign, batch_format="pandas",
                                  concurrency=(1, 4))

    def shard_zone(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(b["muni_id"].to_numpy(np.int64))
        return b.assign(_shard=(h % 16).astype(np.int64))

    return (assigned.map_batches(shard_zone, batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: zone_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


def tile_compact(world_dir: str, max_zoom: int = N_ZOOMS - 1) -> rd.Dataset:
    """Compact the occupied z0 cover into a minimal multi-zoom cover — the
    ``h3.compact`` analog: a zoom-z parent is COMPLETE iff all 4 of its
    zoom-(z−1) children are complete (z0 cells are complete iff occupied);
    the compact cover keeps every complete cell whose parent is NOT
    complete. Output (zoom, ix, iy, cell) tiles the occupied set exactly
    once (coverage + disjointness pinned by a property test).

    Scale shape: the distinct occupied z0 set comes from the rasterize
    partial pattern (per-batch distinct → one sharded distinct); each zoom
    is then ONE sharded count==4 groupby on a ≥4×-shrinking cell set, and
    each keep filter is ONE sharded anti-join of level z against the
    complete parents at z+1 (children hash to their parent's shard, so both
    are exact). Levels are materialized between rounds — they are the
    iterative state, bounded by the occupied-cell count and shrinking
    geometrically (the kmeans/components iterative-state pattern)."""

    def occ_partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        u = pd.DataFrame({"ix": ix, "iy": iy}).drop_duplicates()
        return u.assign(cell=_cell_id(u["ix"].to_numpy(np.int64),
                                      u["iy"].to_numpy(np.int64)))

    def distinct_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["ix", "iy"])[["ix", "iy"]].astype(np.int64)

    level = (_points(world_dir, ["lon", "lat"])
             .map_batches(occ_partial, batch_format="pandas")
             .map_batches(_shard_cells(), batch_format="pandas")
             .repartition(_shuffle_blocks())
             .groupby("_shard")
             .map_groups(lambda g: distinct_shard(g), batch_format="pandas")
             .materialize())

    def to_parent(b: pd.DataFrame) -> pd.DataFrame:
        pix = b["ix"].to_numpy(np.int64) >> 1
        piy = b["iy"].to_numpy(np.int64) >> 1
        return pd.DataFrame({"ix": pix, "iy": piy, "cell": _cell_id(pix, piy)})

    def complete_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["ix", "iy"], as_index=False).size()
        return out[out["size"] == 4][["ix", "iy"]].astype(np.int64)

    def keyed_child(b: pd.DataFrame) -> pd.DataFrame:
        pix = b["ix"].to_numpy(np.int64) >> 1
        piy = b["iy"].to_numpy(np.int64) >> 1
        return pd.DataFrame({"ix": b["ix"].to_numpy(np.int64),
                             "iy": b["iy"].to_numpy(np.int64),
                             "cell": _cell_id(pix, piy), "_side": 0})

    def keyed_parent(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"ix": b["ix"].to_numpy(np.int64),
                             "iy": b["iy"].to_numpy(np.int64),
                             "cell": _cell_id(b["ix"].to_numpy(np.int64),
                                              b["iy"].to_numpy(np.int64)),
                             "_side": 1})

    def anti_shard(g: pd.DataFrame) -> pd.DataFrame:
        blocked = set(g.loc[g["_side"] == 1, "cell"])
        keep = g[(g["_side"] == 0) & ~g["cell"].isin(blocked)]
        return keep[["ix", "iy"]].astype(np.int64)

    kept_frames: list[rd.Dataset] = []
    for z in range(max_zoom + 1):
        if z < max_zoom:
            parents = (level.map_batches(to_parent, batch_format="pandas")
                       .map_batches(_shard_cells(), batch_format="pandas")
                       .repartition(_shuffle_blocks())
                       .groupby("_shard")
                       .map_groups(lambda g: complete_shard(g), batch_format="pandas")
                       .materialize())
            kept = (level.map_batches(keyed_child, batch_format="pandas")
                    .union(parents.map_batches(keyed_parent, batch_format="pandas"))
                    .map_batches(_shard_cells(), batch_format="pandas")
                    .repartition(_shuffle_blocks())
                    .groupby("_shard")
                    .map_groups(lambda g: anti_shard(g), batch_format="pandas"))
        else:
            parents = None
            kept = level

        def stamp(b: pd.DataFrame, _z=z) -> pd.DataFrame:
            ix = b["ix"].to_numpy(np.int64)
            iy = b["iy"].to_numpy(np.int64)
            return pd.DataFrame({"zoom": np.full(len(b), _z, dtype=np.int64),
                                 "ix": ix, "iy": iy, "cell": _cell_id(ix, iy)})

        kept_frames.append(kept.map_batches(stamp, batch_format="pandas"))
        if parents is not None:
            level = parents

    out = kept_frames[0]
    for f in kept_frames[1:]:
        out = out.union(f)
    return out


def tile_polyfill(world_dir: str) -> rd.Dataset:
    """Polygon → covering z0 cells whose CENTERS lie inside — the
    ``h3.polygon_to_cells`` (polyfill) analog, the vector→raster half of
    the north rule's raster↔vector bridge (cf. `tile_zonal_stats`, which
    rasterizes POINTS; this rasterizes the admin POLYGONS themselves).

    Per boundary row: candidate lattice = the polygon's bbox cover;
    keep centers passing the general even-odd PIP over the actual WKB
    rings (multipolygon parts + boundary-inclusive, `geo/pip.py`).

    Scale shape: boundaries is a dimension-table stream — per-polygon
    independent work (vectorized lattice PIP, O(bbox_cells × ring_verts)
    per row), ZERO shuffle, no state. At planetary scale cells/polygon is
    bounded by area/res²; oversized admin polygons split across batches
    by the read, not by this op."""
    from ..geo.pip import points_in_polygon
    from ..geo.wkb import wkb_bbox

    bnd = rd.read_parquet(f"{world_dir}/boundaries.parquet",
                          columns=["muni_id", "sub_id", "polygon_wkb"])

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["sub_id"] == "-1"]
        munis: list[np.ndarray] = []
        ixs: list[np.ndarray] = []
        iys: list[np.ndarray] = []
        for muni, wkb in zip(b["muni_id"].to_numpy(np.int64),
                             b["polygon_wkb"]):
            minlon, minlat, maxlon, maxlat = wkb_bbox(bytes(wkb))
            ix0 = int(np.floor((minlon + 180.0) / TILE_RES_DEG))
            ix1 = int(np.floor((maxlon + 180.0) / TILE_RES_DEG))
            iy0 = int(np.floor((minlat + 90.0) / TILE_RES_DEG))
            iy1 = int(np.floor((maxlat + 90.0) / TILE_RES_DEG))
            gx, gy = np.meshgrid(np.arange(ix0, ix1 + 1, dtype=np.int64),
                                 np.arange(iy0, iy1 + 1, dtype=np.int64),
                                 indexing="ij")
            gx, gy = gx.ravel(), gy.ravel()
            clon = (gx + 0.5) * TILE_RES_DEG - 180.0
            clat = (gy + 0.5) * TILE_RES_DEG - 90.0
            m = points_in_polygon(clon, clat, bytes(wkb))
            munis.append(np.full(int(m.sum()), muni, dtype=np.int64))
            ixs.append(gx[m])
            iys.append(gy[m])
        ix = np.concatenate(ixs) if ixs else np.array([], np.int64)
        iy = np.concatenate(iys) if iys else np.array([], np.int64)
        return pd.DataFrame({
            "muni_id": np.concatenate(munis) if munis else np.array([], np.int64),
            "ix": ix, "iy": iy, "cell": _cell_id(ix, iy),
        })

    return bnd.map_batches(fill, batch_format="pandas")


def _morton(ix: np.ndarray, iy: np.ndarray, bits: int = 22) -> np.ndarray:
    """Bit-interleave ``(ix, iy)`` into one int64 Morton (Z-order) code —
    x bits at even positions, y bits at odd. Vectorized magic-number bit
    spread (public-domain "interleave by binary magic numbers" bithack);
    ``bits`` ≤ 31 keeps the result inside int64."""

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.int64) & ((np.int64(1) << bits) - 1)
        v = (v | (v << 16)) & np.int64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.int64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.int64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.int64(0x3333333333333333)
        v = (v | (v << 1)) & np.int64(0x5555555555555555)
        return v

    return spread(ix) | (spread(iy) << 1)


def tile_quadkey(world_dir: str) -> rd.Dataset:
    """Hierarchical tile ids for every occupied z0 cell — the H3 cell-id /
    Bing quadkey analog: ``morton`` (int64 Z-order interleave of the 22-bit
    ix/iy), ``quadkey`` (the same code as a 22-digit base-4 string, MSB
    first — each PREFIX is the containing coarser tile, so prefix match ==
    hierarchical containment), and ``parent_z8`` (Morton id of the zoom-8
    ancestor, i.e. interleave(ix>>8, iy>>8)).

    Why it matters at 100 TB: the Morton code is the locality-preserving
    shuffle/sort key — range-partitioning by ``morton`` co-locates
    spatially adjacent tiles in the same block (the S2/H3 cell-id ordering
    trick), so downstream neighborhood ops (k-ring, vectorize) touch
    mostly-local partitions instead of hashing neighbors apart.

    Scale shape: per-batch distinct partial → ONE sharded distinct (the
    rasterize pattern, shuffle volume = distinct cells not points), then a
    stateless vectorized encode (bit-spread + base-4 bytes view — no
    Python per-row string building).

    Oracle cross-check is formula-independent: SQL recomputes morton as a
    per-bit SUM over generate_series and quadkey as a per-digit string
    aggregation, vs the engine's magic-number spread + bytes view."""

    def occ_partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        u = pd.DataFrame({"ix": ix, "iy": iy}).drop_duplicates()
        return u.assign(cell=_cell_id(u["ix"].to_numpy(np.int64),
                                      u["iy"].to_numpy(np.int64)))

    def distinct_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["ix", "iy"])[["ix", "iy"]].astype(np.int64)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        ix = b["ix"].to_numpy(np.int64)
        iy = b["iy"].to_numpy(np.int64)
        morton = _morton(ix, iy)
        # 22 base-4 digits, MSB first == the quadkey digit sequence
        # (digit k = x bit + 2·y bit at level k), built as one bytes view.
        shifts = 2 * np.arange(21, -1, -1, dtype=np.int64)
        digits = ((morton[:, None] >> shifts[None, :]) & 3).astype(np.uint8)
        qk_bytes = np.ascontiguousarray(digits + ord("0")).view("S22").ravel()
        quadkey = pd.Series(qk_bytes).str.decode("ascii")
        return pd.DataFrame({
            "cell": _cell_id(ix, iy), "ix": ix, "iy": iy,
            "morton": morton, "quadkey": quadkey,
            "parent_z8": _morton(ix >> 8, iy >> 8, bits=14),
        })

    return (_points(world_dir, ["lon", "lat"])
            .map_batches(occ_partial, batch_format="pandas")
            .map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: distinct_shard(g), batch_format="pandas")
            .map_batches(encode, batch_format="pandas"))


def tile_line_cells(world_dir: str) -> rd.Dataset:
    """Polyline → covering z0 cells (SUPERCOVER line trace) — the
    ``h3.gridPathCells`` / line-rasterization analog, completing the
    raster↔vector bridge for LINES (points: `tile_rasterize`, polygons:
    `tile_polyfill`). Output: DISTINCT (osm_id, ix, iy, cell) — every cell
    a street's segments pass through.

    Algorithm (column sweep, fully vectorized): each segment is converted
    to grid coordinates ``g = (coord+offset)/RES`` and swap-ordered so
    gx0 ≤ gx1; for every integer column k in [⌊gx0⌋, ⌊gx1⌋] the segment's
    y-extent inside the column's x-slab [max(gx0,k), min(gx1,k+1)] is
    linearly interpolated, and rows ⌊y_lo⌋..⌊y_hi⌋ are emitted. Both
    ragged expansions (segment→columns, column→rows) are repeat +
    _ragged_arange — the cell axis never touches Python.

    Boundary convention: cells are [k·RES, (k+1)·RES) half-open via floor;
    a segment ending exactly on a cell edge claims the higher cell. The
    oracle replays the identical float64 expression tree (same swap, same
    max/min slab, same interpolation order) over the same WKB-decoded
    vertices, so parity is bit-exact — no eps fudge.

    Scale shape: stateless zero-shuffle map_batches over the streets
    table; per-row work is O(cells touched). Per-street dedup is per-batch
    only — each street is ONE input row, so all its segments (and their
    duplicate corner cells) are local to the batch."""
    from .geometry import _ragged_arange, decode_linestrings

    streets = rd.read_parquet(
        f"{world_dir}/osm_streets.parquet", columns=["osm_id", "linestring_wkb"])
    res = TILE_RES_DEG

    def trace(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"osm_id": pd.Series([], dtype=np.int64),
                              "ix": pd.Series([], dtype=np.int64),
                              "iy": pd.Series([], dtype=np.int64),
                              "cell": pd.Series([], dtype=np.int64)})
        npts, pts = decode_linestrings(b["linestring_wkb"].tolist())
        if len(pts) < 2:
            return empty
        gx = (pts[:, 0] + 180.0) / res
        gy = (pts[:, 1] + 90.0) / res
        # segment endpoints: consecutive vertices within each street
        valid = np.ones(len(pts) - 1, dtype=bool)
        starts = np.concatenate(([0], np.cumsum(npts)[:-1]))
        valid[starts[1:] - 1] = False
        ax, ay = gx[:-1][valid], gy[:-1][valid]
        bx, by = gx[1:][valid], gy[1:][valid]
        seg_street = np.repeat(np.arange(len(b), dtype=np.int64),
                               np.maximum(npts - 1, 0))
        oid = b["osm_id"].to_numpy(np.int64)[seg_street]
        if not len(ax):
            return empty
        segi, ix, iy = supercover_cells(ax, ay, bx, by)
        out = pd.DataFrame({"osm_id": oid[segi], "ix": ix, "iy": iy})
        out = out.drop_duplicates()
        return out.assign(cell=_cell_id(out["ix"].to_numpy(np.int64),
                                        out["iy"].to_numpy(np.int64)))

    return streets.map_batches(trace, batch_format="pandas")


def supercover_cells(ax: np.ndarray, ay: np.ndarray,
                     bx: np.ndarray, by: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized supercover of segments in GRID coordinates: returns
    ``(seg_idx, ix, iy)`` rows — every integer cell each segment passes
    through, half-open [k, k+1) per axis. Pure kernel (property-tested);
    the float expression tree is mirrored verbatim by the SQL oracle."""
    from .geometry import _ragged_arange

    # swap so x0 <= x1 (pairs move together)
    sw = ax > bx
    x0 = np.where(sw, bx, ax); y0 = np.where(sw, by, ay)
    x1 = np.where(sw, ax, bx); y1 = np.where(sw, ay, by)
    # expansion 1: segment -> columns
    k0 = np.floor(x0).astype(np.int64)
    k1 = np.floor(x1).astype(np.int64)
    ncols = k1 - k0 + 1
    segi = np.repeat(np.arange(len(x0), dtype=np.int64), ncols)
    k = k0[segi] + _ragged_arange(ncols)
    kx = k.astype(np.float64)
    sx0, sy0 = x0[segi], y0[segi]
    sx1, sy1 = x1[segi], y1[segi]
    vert = sx1 == sx0
    xa = np.maximum(sx0, kx)
    xb = np.minimum(sx1, kx + 1.0)
    den = np.where(vert, 1.0, sx1 - sx0)
    ya = np.where(vert, sy0, sy0 + (xa - sx0) / den * (sy1 - sy0))
    yb = np.where(vert, sy1, sy0 + (xb - sx0) / den * (sy1 - sy0))
    iy_lo = np.floor(np.minimum(ya, yb)).astype(np.int64)
    iy_hi = np.floor(np.maximum(ya, yb)).astype(np.int64)
    # expansion 2: column -> rows
    nrows = iy_hi - iy_lo + 1
    coli = np.repeat(np.arange(len(k), dtype=np.int64), nrows)
    iy = iy_lo[coli] + _ragged_arange(nrows)
    ix = k[coli]
    return segi[coli], ix, iy


#: BFS distance transform: cells with >= this many points are sources.
BFS_HOT_POINTS = VECTORIZE_MIN_POINTS
#: BFS round cap — occupied cells farther than this (4-connected hops
#: through OCCUPIED cells) report dist = -1.
BFS_MAX_ROUNDS = 8


def tile_bfs_distance(world_dir: str, hot_n: int = BFS_HOT_POINTS,
                      max_rounds: int = BFS_MAX_ROUNDS) -> rd.Dataset:
    """Multi-source BFS distance transform over the occupied z0 raster:
    for every occupied cell, the 4-connected hop distance — walking only
    through OCCUPIED cells — to the nearest HOT cell (n_points >= hot_n);
    hot cells are 0, cells farther than max_rounds (or in a component
    with no hot cell) are -1.  Output: (cell, ix, iy, n_points, dist).
    The raster analog of a proximity/service-area surface (GRASS
    r.grow.distance with a cost mask).

    Scale shape: the raster lives in the object store (never the driver).
    Frontier expansion round d: the frontier emits 4 neighbor keys, ONE
    bucketed hash join keeps the occupied ones, ONE left join against the
    label set drops already-labeled cells, one sharded distinct closes
    the round — every structure is O(frontier) rows, and the sum of all
    frontiers is at most the occupied-cell count, so total shuffle volume
    across all rounds is O(cells × 4) regardless of max_rounds. Driver
    state: one count per round (early exit on an empty frontier). BFS
    discovery order IS the min distance, so no per-cell min reduce is
    needed across rounds.

    Oracle: recursive-CTE BFS over a grid-free neighbor self-join with a
    min(d) closure — independent of the frontier/anti-join mechanics."""
    from ..stages.join import bucketed_hash_join

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"cell": _cell_id(ix, iy), "ix": ix, "iy": iy})
             .groupby(["cell", "ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    def reduce_cells(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_points=("n", "sum")))
        out["n_points"] = out["n_points"].astype(np.int64)
        return out

    cells = (_points(world_dir, ["lon", "lat"])
             .map_batches(count_partial, batch_format="pandas")
             .map_batches(_shard_cells(), batch_format="pandas")
             .repartition(_shuffle_blocks())
             .groupby("_shard")
             .map_groups(lambda g: reduce_cells(g.drop(columns=["_shard"])),
                         batch_format="pandas")
             .materialize())  # occupied raster; reused every round

    i64 = pa.int64()
    occ_keys = cells.map_batches(
        lambda b: pd.DataFrame({"occ": b["cell"].to_numpy(np.int64)}),
        batch_format="pandas").materialize()

    frontier = cells.map_batches(
        lambda b, h=hot_n: pd.DataFrame(
            {"cell": b.loc[b["n_points"] >= h, "cell"].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    lab = frontier.map_batches(
        lambda b: b.assign(dist=np.int64(0)),
        batch_format="pandas").materialize()

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        c = b["cell"].to_numpy(np.int64)
        ix, iy = c >> _IY_BITS, c & ((1 << _IY_BITS) - 1)
        return pd.DataFrame({"nkey": np.concatenate([
            _cell_id(ix + 1, iy), _cell_id(ix - 1, iy),
            _cell_id(ix, iy + 1), _cell_id(ix, iy - 1)])})

    def distinct_shard(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"cell": np.unique(g["nkey"].to_numpy(np.int64))})

    for d in range(1, max_rounds + 1):
        cand = frontier.map_batches(expand, batch_format="pandas")
        occ_cand = bucketed_hash_join(
            cand, occ_keys, "nkey", "occ",
            left_schema={"nkey": i64}, right_schema={"occ": i64},
        ).map_batches(lambda b: b[["nkey"]], batch_format="pandas")
        fresh = bucketed_hash_join(
            occ_cand, lab, "nkey", "cell", how="left",
            left_schema={"nkey": i64},
            right_schema={"cell": i64, "dist": i64},
        ).map_batches(
            lambda b: b.loc[b["dist"].isna(), ["nkey"]],
            batch_format="pandas")
        frontier = (fresh
                    .map_batches(lambda b: b.assign(
                        _shard=(pd.util.hash_array(
                            b["nkey"].to_numpy(np.int64)) % 64).astype(np.int64)),
                        batch_format="pandas")
                    .repartition(_shuffle_blocks())
                    .groupby("_shard")
                    .map_groups(
                        lambda g: distinct_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas")
                    .materialize())
        if frontier.count() == 0:
            break
        lab = lab.union(frontier.map_batches(
            lambda b, dd=d: b.assign(dist=np.int64(dd)),
            batch_format="pandas")).materialize()

    out = bucketed_hash_join(
        cells, lab, "cell", "cell", how="left",
        left_schema={"cell": i64, "ix": i64, "iy": i64, "n_points": i64},
        right_schema={"cell": i64, "dist": i64},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cell": b["cell"].to_numpy(np.int64),
            "ix": b["ix"].to_numpy(np.int64),
            "iy": b["iy"].to_numpy(np.int64),
            "n_points": b["n_points"].to_numpy(np.int64),
            "dist": b["dist"].fillna(-1).to_numpy(np.int64),
        })

    return out.map_batches(finish, batch_format="pandas")


#: Hexagonal (H3-analog) grid: FLAT-TOP hexagons, axial (q, r) coords,
#: circumradius in degrees.  0.02° keeps the hex width (1.5 × size
#: horizontally) comparable to two z0 square tiles.
HEX_SIZE_DEG = 0.02
#: sqrt(3)/3 as one shared float64 literal — the numpy kernel and the SQL
#: oracle embed the SAME constant, so no library-sqrt parity assumption.
HEX_SQRT3_3 = 0.5773502691896258
#: axial coords are offset into non-negatives before bit-packing.
HEX_OFFSET = 1 << 21


def hex_axial(lon: np.ndarray, lat: np.ndarray,
              size: float = HEX_SIZE_DEG) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat → flat-top axial hex coordinates (q, r) via cube rounding
    (the standard hex-grid algorithm, e.g. Red Blob Games' hex guide).

    Arithmetic contract with the SQL oracle: every step is plain float64
    multiply / add / floor / abs in the SAME order the oracle writes it,
    and rounding is ``floor(v + 0.5)`` — NOT banker's ``np.round`` — so
    numpy and DuckDB agree bit-for-bit on ties. The cube-round fix picks
    the coordinate with the largest rounding error and recomputes it from
    the other two (branches are exclusive; the fixed coordinate is never
    an input to another fix)."""
    x = np.asarray(lon, np.float64)
    y = np.asarray(lat, np.float64)
    q0 = x * (2.0 / 3.0) / size
    r0 = (x * (-1.0 / 3.0) + y * HEX_SQRT3_3) / size
    y0 = -q0 - r0
    rx = np.floor(q0 + 0.5)
    ry = np.floor(y0 + 0.5)
    rz = np.floor(r0 + 0.5)
    dx = np.abs(rx - q0)
    dy = np.abs(ry - y0)
    dz = np.abs(rz - r0)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    hq = np.where(fix_x, -ry - rz, rx).astype(np.int64)
    hr = np.where(fix_z, -rx - ry, rz).astype(np.int64)
    return hq, hr


def _hex_id(hq: np.ndarray, hr: np.ndarray) -> np.ndarray:
    return ((hq + HEX_OFFSET) << _IY_BITS) | (hr + HEX_OFFSET)


def hex_bin(world_dir: str, size: float = HEX_SIZE_DEG) -> rd.Dataset:
    """Point → hexagonal cell aggregation (the H3 ``latLngToCell`` +
    ``cellToParent``-free binning): per-hex point count and DISTINCT
    street count.  Output: (hex, hq, hr, n_points, n_streets).

    Scale shape: identical to :func:`tile_rasterize` — stateless
    vectorized hex assignment per batch, per-batch partial groupby on
    (hex, street) so shuffle volume is distinct partials (not points),
    then ONE sharded hex-complete reduce. The hex id is the shuffle key
    a downstream hex op would reuse, exactly like the square cell id.

    Oracle: the same cube-rounding algebra written as SQL CASE/floor
    expressions over float64 — bit-exact, no epsilon."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hq, hr = hex_axial(b["lon"].to_numpy(), b["lat"].to_numpy(), size)
        g = (pd.DataFrame({"cell": _hex_id(hq, hr), "hq": hq, "hr": hr,
                           "street": b["addr_street"].fillna("").to_numpy()})
             .groupby(["cell", "hq", "hr", "street"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "hq", "hr"], as_index=False)
               .agg(n_points=("n", "sum"), n_streets=("street", "nunique")))
        out["n_points"] = out["n_points"].astype(np.int64)
        out["n_streets"] = out["n_streets"].astype(np.int64)
        return out.rename(columns={"cell": "hex"})

    parts = _points(world_dir, ["lon", "lat", "addr_street"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


#: axial flat-top hex neighbor directions (the H3 gridDisk(1) ring).
HEX_DIRS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def hex_kring(world_dir: str, size: float = HEX_SIZE_DEG) -> rd.Dataset:
    """Hex-disk convolution (k=1): for every OCCUPIED hex, its own point
    count plus the 7-hex disk sum (self + 6 axial neighbors) — the H3
    ``gridDisk`` aggregate on the hexagonal grid.

    Scale shape: same zero-join trick as :func:`tile_kring` — per-batch
    hex partials emit 7 shifted contribution rows carrying
    (n_own = n at the identity offset else 0, n_disk = n); ONE sharded
    groupby sums both in the same shuffle and occupied hexes are exactly
    those with n_own > 0. Shuffle volume = 7 × distinct-hexes-per-batch."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hq, hr = hex_axial(b["lon"].to_numpy(), b["lat"].to_numpy(), size)
        g = (pd.DataFrame({"hq": hq, "hr": hr}).groupby(["hq", "hr"], as_index=False)
             .size().rename(columns={"size": "n"}))
        gq = g["hq"].to_numpy(np.int64)
        gr = g["hr"].to_numpy(np.int64)
        gn = g["n"].to_numpy(np.int64)
        tqs, trs, owns, disks = [gq], [gr], [gn], [gn]
        for dq, dr in HEX_DIRS:
            tqs.append(gq + dq)
            trs.append(gr + dr)
            owns.append(np.zeros_like(gn))
            disks.append(gn)
        tq = np.concatenate(tqs)
        tr = np.concatenate(trs)
        return pd.DataFrame({"hq": tq, "hr": tr, "cell": _hex_id(tq, tr),
                             "n_own": np.concatenate(owns),
                             "n_disk": np.concatenate(disks)})

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "hq", "hr"], as_index=False)
               .agg(n_points=("n_own", "sum"), disk_points=("n_disk", "sum")))
        out = out[out["n_points"] > 0]
        out["n_points"] = out["n_points"].astype(np.int64)
        out["disk_points"] = out["disk_points"].astype(np.int64)
        return out.rename(columns={"cell": "hex"})

    parts = _points(world_dir, ["lon", "lat"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


#: binomial(4) smoothing kernel — the discrete Gaussian the KDE raster
#: uses. Integer weights keep the distributed sum exact; the density is
#: one final division by 256 (= (sum w)²), a power of two, so the float
#: is exact too.
KDE_KERNEL = ((-2, 1), (-1, 4), (0, 6), (1, 4), (2, 1))


def tile_kde(world_dir: str) -> rd.Dataset:
    """Kernel-density-smoothed point raster: for every OCCUPIED z0 cell,
    the 5×5 binomial(4)⊗binomial(4) weighted neighborhood count — the
    raster KDE / Gaussian-blur heatmap surface (QGIS heatmap analog with
    a discrete kernel).  Output: (cell, ix, iy, n_points, kde_num, kde)
    with kde = kde_num / 256 and kde_num exact int64.

    Scale shape: same zero-join contribution pattern as
    :func:`tile_kring` — per-batch cell partials emit 25 shifted rows
    carrying (n_own at the identity offset, w(dx)·w(dy)·n) and ONE
    sharded groupby sums both; occupied cells are n_own > 0. Shuffle
    volume = 25 × distinct-cells-per-batch; integer weights mean shard
    order can never change the result."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy}).groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        gx = g["ix"].to_numpy(np.int64)
        gy = g["iy"].to_numpy(np.int64)
        gn = g["n"].to_numpy(np.int64)
        txs, tys, owns, nums = [], [], [], []
        for dx, wx in KDE_KERNEL:
            for dy, wy in KDE_KERNEL:
                txs.append(gx + dx)
                tys.append(gy + dy)
                owns.append(gn if (dx == 0 and dy == 0) else np.zeros_like(gn))
                nums.append(gn * (wx * wy))
        tx = np.concatenate(txs)
        ty = np.concatenate(tys)
        return pd.DataFrame({"ix": tx, "iy": ty, "cell": _cell_id(tx, ty),
                             "n_own": np.concatenate(owns),
                             "num": np.concatenate(nums)})

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_points=("n_own", "sum"), kde_num=("num", "sum")))
        out = out[out["n_points"] > 0]
        out["n_points"] = out["n_points"].astype(np.int64)
        out["kde_num"] = out["kde_num"].astype(np.int64)
        out["kde"] = out["kde_num"].to_numpy(np.float64) / 256.0
        return out

    parts = _points(world_dir, ["lon", "lat"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# Marching-squares contour extraction (raster → vector isolines)
# ---------------------------------------------------------------------------

#: iso-level for contour extraction: strictly between the integer counts
#: 2 and 3, so "above" ⇔ n >= VECTORIZE_MIN_POINTS and an edge crossing
#: always has integer corner values on both sides (denominator never 0,
#: t never exactly 0 or 1).
CONTOUR_LEVEL = VECTORIZE_MIN_POINTS - 0.5

#: marching-squares segment table, indexed by the 4-bit corner case
#: (bit k set ⇔ corner ck above; c0=BL, c1=BR, c2=TR, c3=TL).  Each
#: entry lists (edge_a, edge_b) pairs; edges e0=bottom(c0→c1),
#: e1=right(c1→c2), e2=top(c2→c3), e3=left(c3→c0).  Saddles (5, 10)
#: use the fixed below-center choice — no center disambiguation —
#: which the SQL oracle replays literally.
MS_SEGMENTS: tuple[tuple[tuple[int, int], ...], ...] = (
    (),                    # 0
    ((3, 0),),             # 1: c0
    ((0, 1),),             # 2: c1
    ((3, 1),),             # 3: c0 c1
    ((1, 2),),             # 4: c2
    ((3, 0), (1, 2)),      # 5: c0 c2 (saddle)
    ((0, 2),),             # 6: c1 c2
    ((3, 2),),             # 7: c0 c1 c2
    ((2, 3),),             # 8: c3
    ((2, 0),),             # 9: c0 c3
    ((0, 1), (2, 3)),      # 10: c1 c3 (saddle)
    ((2, 1),),             # 11: c0 c1 c3
    ((1, 3),),             # 12: c2 c3
    ((1, 0),),             # 13: c0 c2 c3
    ((0, 3),),             # 14: c1 c2 c3
    (),                    # 15
)

# flattened lookup: per-case segment count / offset into _MS_EA/_MS_EB
_MS_COUNT = np.array([len(s) for s in MS_SEGMENTS], np.int64)
_MS_OFFSET = np.concatenate(([0], np.cumsum(_MS_COUNT)[:-1]))
_MS_EA = np.array([ea for segs in MS_SEGMENTS for ea, _ in segs], np.int64)
_MS_EB = np.array([eb for segs in MS_SEGMENTS for _, eb in segs], np.int64)
#: edge k runs from corner _EDGE_FIRST[k] to corner _EDGE_SECOND[k]
_EDGE_FIRST = np.array([0, 1, 2, 3], np.int64)
_EDGE_SECOND = np.array([1, 2, 3, 0], np.int64)


def tile_contour(world_dir: str) -> rd.Dataset:
    """Raster → vector isolines: marching squares over the z0 count
    raster at iso-level ``CONTOUR_LEVEL`` (=2.5, i.e. the boundary of the
    vectorize/BFS hot-cell set).  One row per contour segment:

        (sq_ix, sq_iy, mscase, seg, edge_a, t_a, edge_b, t_b)

    where square (sq_ix, sq_iy) has corners c0=cell(sq_ix,sq_iy) …
    c2=cell(sq_ix+1,sq_iy+1), ``mscase`` is the 4-bit above-mask, and
    each endpoint is (edge id, fractional position along that edge from
    its first corner, linearly interpolated: t=(L-va)/(vb-va), exact
    IEEE float64 on both engine and oracle).

    Scale shape: the same zero-join contribution pattern as
    :func:`tile_kring` — per-batch cell-count partials emit 4 rows (one
    per square the cell is a corner of), ONE sharded groupby assembles
    each square's corner values (absent corners are empty cells = 0),
    and the case/segment/interpolation math is fully vectorized
    (np.repeat over the flattened case table).  Shuffle volume = 4 ×
    distinct-cells-per-batch; squares are shard-complete so no
    cross-shard fixup exists.  GDAL contour / QGIS isoline analog."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy}).groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        gx = g["ix"].to_numpy(np.int64)
        gy = g["iy"].to_numpy(np.int64)
        gn = g["n"].to_numpy(np.int64)
        sqx, sqy, corner, n = [], [], [], []
        # cell (ix,iy) is corner (dx,dy) of square (ix-dx, iy-dy);
        # corner index: (0,0)→0, (1,0)→1, (1,1)→2, (0,1)→3
        for dx, dy, c in ((0, 0, 0), (1, 0, 1), (1, 1, 2), (0, 1, 3)):
            sqx.append(gx - dx)
            sqy.append(gy - dy)
            corner.append(np.full(gx.shape, c, np.int64))
            n.append(gn)
        sx = np.concatenate(sqx)
        sy = np.concatenate(sqy)
        return pd.DataFrame({"cell": _cell_id(sx, sy), "sq_ix": sx, "sq_iy": sy,
                             "corner": np.concatenate(corner),
                             "n": np.concatenate(n)})

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        # corner-value matrix per square: partial counts sum exactly
        agg = (g.groupby(["sq_ix", "sq_iy", "corner"], as_index=False)
               .agg(n=("n", "sum")))
        wide = agg.pivot_table(index=["sq_ix", "sq_iy"], columns="corner",
                               values="n", fill_value=0, aggfunc="sum")
        wide = wide.reindex(columns=[0, 1, 2, 3], fill_value=0)
        v = wide.to_numpy(np.int64)                        # (n_sq, 4)
        sq = wide.index.to_frame(index=False)
        above = v >= VECTORIZE_MIN_POINTS
        mscase = (above[:, 0] * 1 + above[:, 1] * 2
                  + above[:, 2] * 4 + above[:, 3] * 8).astype(np.int64)
        cnt = _MS_COUNT[mscase]
        rows = np.repeat(np.arange(len(mscase)), cnt)      # square row per segment
        if len(rows) == 0:
            return pd.DataFrame({"sq_ix": np.array([], np.int64),
                                 "sq_iy": np.array([], np.int64),
                                 "mscase": np.array([], np.int64),
                                 "seg": np.array([], np.int64),
                                 "edge_a": np.array([], np.int64),
                                 "t_a": np.array([], np.float64),
                                 "edge_b": np.array([], np.int64),
                                 "t_b": np.array([], np.float64)})
        # per-segment index within its square: 0,1
        seg = (np.arange(len(rows))
               - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)).astype(np.int64)
        flat = _MS_OFFSET[mscase][rows] + seg
        ea = _MS_EA[flat]
        eb = _MS_EB[flat]
        vr = v[rows]                                        # (n_seg, 4)
        cols = np.arange(len(rows))

        def interp(e: np.ndarray) -> np.ndarray:
            va = vr[cols, _EDGE_FIRST[e]].astype(np.float64)
            vb = vr[cols, _EDGE_SECOND[e]].astype(np.float64)
            return (CONTOUR_LEVEL - va) / (vb - va)

        return pd.DataFrame({"sq_ix": sq["sq_ix"].to_numpy(np.int64)[rows],
                             "sq_iy": sq["sq_iy"].to_numpy(np.int64)[rows],
                             "mscase": mscase[rows], "seg": seg,
                             "edge_a": ea, "t_a": interp(ea),
                             "edge_b": eb, "t_b": interp(eb)})

    parts = _points(world_dir, ["lon", "lat"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard", "cell"])),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# IDW gridding (vector → raster interpolation at empty cells)
# ---------------------------------------------------------------------------

#: inverse-distance-squared weights over the 5×5 ring (center excluded),
#: scaled by lcm{1,2,4,5,8} = 40 so every weight is an exact integer:
#: w(dx,dy) = 40 / (dx²+dy²) ∈ {40, 20, 10, 8, 5}.  Integer numerator
#: and denominator accumulate exactly in any shard order; the single
#: float division happens once per output cell.
IDW_SCALE = 40
IDW_OFFSETS: tuple[tuple[int, int, int], ...] = tuple(
    (dx, dy, IDW_SCALE // (dx * dx + dy * dy))
    for dx in range(-2, 3) for dy in range(-2, 3) if not (dx == 0 and dy == 0)
)


def tile_idw(world_dir: str) -> rd.Dataset:
    """Vector → raster interpolation: inverse-distance-squared (power 2)
    estimate of the point-count surface at EMPTY cells, from occupied
    cells within the 5×5 search window (GDAL ``gdal_grid invdist`` with a
    bounded window / QGIS IDW analog).  Output one row per empty cell
    with at least one occupied window neighbor:

        (cell, ix, iy, idw_num, idw_den, idw)

    where idw_num = Σ 40·n/d², idw_den = Σ 40/d² over occupied window
    neighbors (both exact int64; d² = dx²+dy² in cell units) and
    idw = idw_num / idw_den.

    Scale shape: unlike :func:`tile_kde` (whose per-target sums are all
    LINEAR in the source count, so batch-split partials add up), the IDW
    denominator counts each SOURCE CELL once — so the raster must be
    cell-complete before contributions are emitted.  Two bounded
    shuffles: (1) per-batch count partials → sharded reduce to the exact
    per-cell raster (volume = distinct cells per batch), (2) each raster
    cell emits its 24 ring contributions + an identity marker → sharded
    reduce per target (volume = 25 × raster cells, independent of point
    count).  Integer weights mean shard/arrival order can never change
    the result."""

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy}).groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        g["cell"] = _cell_id(g["ix"].to_numpy(np.int64), g["iy"].to_numpy(np.int64))
        return g

    def reduce_raster(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cell", "ix", "iy"], as_index=False).agg(n=("n", "sum"))
        out["n"] = out["n"].astype(np.int64)
        return out

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        gx = b["ix"].to_numpy(np.int64)
        gy = b["iy"].to_numpy(np.int64)
        gn = b["n"].to_numpy(np.int64)
        zeros = np.zeros_like(gn)
        txs = [gx]
        tys = [gy]
        owns = [gn]
        nums = [zeros]
        dens = [zeros]
        for dx, dy, w in IDW_OFFSETS:
            txs.append(gx + dx)
            tys.append(gy + dy)
            owns.append(zeros)
            nums.append(gn * w)
            dens.append(np.full(gn.shape, w, np.int64))
        tx = np.concatenate(txs)
        ty = np.concatenate(tys)
        return pd.DataFrame({"ix": tx, "iy": ty, "cell": _cell_id(tx, ty),
                             "n_own": np.concatenate(owns),
                             "num": np.concatenate(nums),
                             "den": np.concatenate(dens)})

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_own=("n_own", "sum"), idw_num=("num", "sum"),
                    idw_den=("den", "sum")))
        out = out[(out["n_own"] == 0) & (out["idw_den"] > 0)]
        out = out.drop(columns=["n_own"])
        out["idw_num"] = out["idw_num"].astype(np.int64)
        out["idw_den"] = out["idw_den"].astype(np.int64)
        out["idw"] = out["idw_num"].to_numpy(np.float64) / out["idw_den"].to_numpy(np.float64)
        return out

    raster = (_points(world_dir, ["lon", "lat"])
              .map_batches(count_partial, batch_format="pandas")
              .map_batches(_shard_cells(), batch_format="pandas")
              .repartition(_shuffle_blocks())
              .groupby("_shard")
              .map_groups(lambda g: reduce_raster(g.drop(columns=["_shard"])),
                          batch_format="pandas"))
    return (raster.map_batches(contrib, batch_format="pandas")
            .map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# Sobel gradient (raster derivative: slope magnitude of the density surface)
# ---------------------------------------------------------------------------

#: source-centric Sobel emission weights: a source cell with count n adds
#: ex·n to the target's Gx and ey·n to its Gy, where for emission offset
#: (dx,dy) the target-centric kernel weight is taken at (-dx,-dy):
#:   Gx = [[-1,0,+1],[-2,0,+2],[-1,0,+1]]  →  ex = -dx·(2-|dy|)
#:   Gy = Gxᵀ                              →  ey = -dy·(2-|dx|)
SOBEL_OFFSETS: tuple[tuple[int, int, int, int], ...] = tuple(
    (dx, dy, -dx * (2 - abs(dy)), -dy * (2 - abs(dx)))
    for dx in (-1, 0, 1) for dy in (-1, 0, 1)
)


def tile_slope(world_dir: str) -> rd.Dataset:
    """Raster derivative: 3×3 Sobel gradient of the z0 point-count
    surface at every OCCUPIED cell — the slope / edge-strength raster of
    the address-density field (GDAL ``gdaldem slope`` / image-gradient
    analog on the count DEM).  Output:

        (cell, ix, iy, n_points, gx, gy, g2, grad)

    with gx/gy the exact int64 Sobel responses, g2 = gx²+gy² exact, and
    grad = sqrt(g2) the single replayed float op.

    Scale shape: same zero-join contribution pattern as :func:`tile_kde`
    — Sobel is LINEAR in the source counts, so batch-split partials sum
    exactly (unlike :func:`tile_idw`'s denominator); 9 shifted integer
    contributions per distinct cell per batch, ONE sharded groupby.
    Shard order can never change an integer sum."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
        g = (pd.DataFrame({"ix": ix, "iy": iy}).groupby(["ix", "iy"], as_index=False)
             .size().rename(columns={"size": "n"}))
        gx_ = g["ix"].to_numpy(np.int64)
        gy_ = g["iy"].to_numpy(np.int64)
        gn = g["n"].to_numpy(np.int64)
        txs, tys, owns, exs, eys = [], [], [], [], []
        for dx, dy, ex, ey in SOBEL_OFFSETS:
            txs.append(gx_ + dx)
            tys.append(gy_ + dy)
            owns.append(gn if (dx == 0 and dy == 0) else np.zeros_like(gn))
            exs.append(gn * ex)
            eys.append(gn * ey)
        tx = np.concatenate(txs)
        ty = np.concatenate(tys)
        return pd.DataFrame({"ix": tx, "iy": ty, "cell": _cell_id(tx, ty),
                             "n_own": np.concatenate(owns),
                             "cx": np.concatenate(exs),
                             "cy": np.concatenate(eys)})

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cell", "ix", "iy"], as_index=False)
               .agg(n_points=("n_own", "sum"), gx=("cx", "sum"), gy=("cy", "sum")))
        out = out[out["n_points"] > 0]
        for c in ("n_points", "gx", "gy"):
            out[c] = out[c].astype(np.int64)
        out["g2"] = out["gx"] * out["gx"] + out["gy"] * out["gy"]
        out["grad"] = np.sqrt(out["g2"].to_numpy(np.float64))
        return out

    parts = _points(world_dir, ["lon", "lat"]).map_batches(
        partial, batch_format="pandas")
    return (parts.map_batches(_shard_cells(), batch_format="pandas")
            .repartition(_shuffle_blocks())
            .groupby("_shard")
            .map_groups(lambda g: reduce_shard(g.drop(columns=["_shard"])),
                        batch_format="pandas"))


#: inclusive (x0, x1, y0, y1) z0-cell rectangle of the morton range-query
#: demo — lon ≈ [10.20, 10.56), lat ≈ [50.05, 50.19) of the synthetic world.
MORTON_QUERY_RECT = (19020, 19055, 14005, 14018)


def morton_ranges(x0: int, x1: int, y0: int, y1: int,
                  bits: int = 22) -> tuple[np.ndarray, np.ndarray]:
    """Decompose an INCLUSIVE cell rectangle into maximal Morton-aligned
    quadtree squares and coalesce them into sorted, inclusive [start, end]
    Z-order code ranges — the standard space-filling-curve covering trick
    (S2's CellUnion / BigTable key-range pruning): an aligned 2^l-square
    that lies fully inside the rectangle is ONE contiguous run of 4^l
    codes. Recursion visits only squares intersecting the rectangle
    boundary, O(perimeter · levels) nodes."""
    out: list[tuple[int, int]] = []

    def rec(qx: int, qy: int, size: int) -> None:
        if qx > x1 or qx + size - 1 < x0 or qy > y1 or qy + size - 1 < y0:
            return
        if qx >= x0 and qx + size - 1 <= x1 and qy >= y0 and qy + size - 1 <= y1:
            base = int(_morton(np.asarray([qx]), np.asarray([qy]))[0])
            out.append((base, base + size * size - 1))
            return
        h = size // 2
        for dy in (0, h):
            for dx in (0, h):
                rec(qx + dx, qy + dy, h)

    rec(0, 0, 1 << bits)
    out.sort()
    merged = [list(out[0])]
    for s, e in out[1:]:
        if s == merged[-1][1] + 1:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    return (np.asarray([m[0] for m in merged], dtype=np.int64),
            np.asarray([m[1] for m in merged], dtype=np.int64))


def morton_range_query(world_dir: str,
                       rect: tuple[int, int, int, int] = MORTON_QUERY_RECT) -> rd.Dataset:
    """Space-filling-curve RANGE QUERY over the address points: the query
    rectangle (inclusive z0 cell bounds) is decomposed ON THE DRIVER into
    maximal Morton-aligned code ranges (:func:`morton_ranges` — O(perimeter)
    ranges, broadcast once), and the point table is filtered by range
    membership with one vectorized searchsorted per batch.

    Why it matters at 100 TB: on a Morton-SORTED table this covering turns
    a bbox query into a handful of contiguous key ranges — row-group /
    partition pruning instead of a full scan (the S2/quadkey index-read
    pattern the `tile_quadkey` docstring promises). The synthetic table is
    unsorted, so here the covering drives the filter kernel; the oracle is
    a plain bbox predicate + per-bit morton recomputation, proving the
    decomposition + pruning EXACTLY equals the rectangle semantics.
    Output (osm_id, ix, iy, morton)."""
    import ray

    x0, x1, y0, y1 = rect
    starts, ends = morton_ranges(x0, x1, y0, y1)
    ref = ray.put((starts, ends))

    class InRanges:
        def __init__(self):
            self.starts, self.ends = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ix, iy = _tile_ix_iy(b["lon"].to_numpy(), b["lat"].to_numpy())
            m = _morton(ix, iy)
            pos = np.searchsorted(self.starts, m, side="right") - 1
            ok = (pos >= 0) & (m <= self.ends[np.clip(pos, 0, None)])
            return pd.DataFrame({
                "osm_id": b["osm_id"].to_numpy(np.int64)[ok],
                "ix": ix[ok],
                "iy": iy[ok],
                "morton": m[ok],
            })

    return _points(world_dir, ["osm_id", "lon", "lat"]).map_batches(
        InRanges, batch_format="pandas", batch_size=8192,
        concurrency=(1, 4), num_cpus=1)


def _clip_ring_rect(pts: np.ndarray, x0: float, x1: float,
                    y0: float, y1: float) -> np.ndarray:
    """Sutherland–Hodgman clip of a closed ring against an axis-aligned
    rectangle (the window is convex, the subject ring may be anything).
    Clipped coordinates are set EXACTLY to the plane constant on the
    clipped axis — no interpolation drift — so clipping an axis-aligned
    ring yields the exact interval-intersection rectangle (the property
    the SQL oracle's min/max replay relies on)."""
    P = pts[:-1] if len(pts) > 1 and bool((pts[0] == pts[-1]).all()) else pts
    poly = [(float(p[0]), float(p[1])) for p in P]
    for axis, bound, keep_ge in ((0, x0, True), (0, x1, False),
                                 (1, y0, True), (1, y1, False)):
        if not poly:
            break
        out = []
        n = len(poly)
        for i in range(n):
            a = poly[i]
            b = poly[(i + 1) % n]
            ain = (a[axis] >= bound) if keep_ge else (a[axis] <= bound)
            bin_ = (b[axis] >= bound) if keep_ge else (b[axis] <= bound)
            if ain:
                out.append(a)
            if ain != bin_:
                t = (bound - a[axis]) / (b[axis] - a[axis])
                if axis == 0:
                    out.append((bound, a[1] + t * (b[1] - a[1])))
                else:
                    out.append((a[0] + t * (b[0] - a[0]), bound))
        poly = out
    return (np.asarray(poly, dtype=np.float64)
            if poly else np.zeros((0, 2), dtype=np.float64))


def _shoelace_local(cp: np.ndarray, ox: float, oy: float) -> float:
    """|shoelace| of an open ring, RE-CENTERED at (ox, oy): cross terms
    stay O(window²) instead of O(lon·lat), keeping cancellation error far
    inside the round-9 output contract (the muni_area recentering trick)."""
    x = cp[:, 0] - ox
    y = cp[:, 1] - oy
    return abs(0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))


def tile_coverage(world_dir: str) -> rd.Dataset:
    """AREA-WEIGHTED rasterization — per (boundary polygon, z0 tile) the
    fraction of the tile covered by the polygon (exterior rings minus
    holes): the raster↔vector bridge for CONTINUOUS fields (population /
    statistic downscaling, partial-tile zonal weights), where
    `tile_polyfill`'s binary center-in/out cover is too coarse.

    Engine path is fully general: every ring is Sutherland–Hodgman
    clipped against each candidate tile rectangle and measured with a
    recentered shoelace. The oracle exploits the synthetic world's
    rectangular rings (interval-intersection products over the decoded
    WKB bboxes) — the established engine-general / oracle-special split
    (see pipelines/oracle.py header).

    Scale shape: the boundary table is a DIMENSION table (admin-unit
    cardinality — the muni_area precedent), streamed stateless; per
    polygon the candidate tiles come from its bbox, and the per-tile clip
    is a short loop over ≤ a few small rings. Zero shuffle. Output
    (area_id, ix, iy, frac round-9), tiles with frac > 0 only."""
    from ..geo.wkb import wkb_rings

    res = TILE_RES_DEG
    bounds = rd.read_parquet(f"{world_dir}/boundaries.parquet",
                             columns=["area_id", "sub_id", "polygon_wkb"])

    def cover(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["sub_id"] == "-1"]
        out_aid, out_ix, out_iy, out_a = [], [], [], []
        for aid, wkb in zip(b["area_id"].to_numpy(np.int64), b["polygon_wkb"]):
            acc: dict[tuple[int, int], float] = {}
            for pts, ext in wkb_rings(bytes(wkb)):
                sgn = 1.0 if ext else -1.0
                (rx0, ry0), (rx1, ry1) = pts.min(0), pts.max(0)
                ix0 = int(np.floor((rx0 + 180.0) / res))
                ix1 = int(np.floor((rx1 + 180.0) / res))
                iy0 = int(np.floor((ry0 + 90.0) / res))
                iy1 = int(np.floor((ry1 + 90.0) / res))
                for ix in range(ix0, ix1 + 1):
                    tx0, tx1 = ix * res - 180.0, (ix + 1) * res - 180.0
                    for iy in range(iy0, iy1 + 1):
                        ty0, ty1 = iy * res - 90.0, (iy + 1) * res - 90.0
                        cp = _clip_ring_rect(pts, tx0, tx1, ty0, ty1)
                        if len(cp) >= 3:
                            a = _shoelace_local(cp, tx0, ty0)
                            if a != 0.0:
                                acc[(ix, iy)] = acc.get((ix, iy), 0.0) + sgn * a
            for (ix, iy), a in acc.items():
                out_aid.append(aid)
                out_ix.append(ix)
                out_iy.append(iy)
                out_a.append(a)
        ix = np.asarray(out_ix, dtype=np.int64)
        iy = np.asarray(out_iy, dtype=np.int64)
        box = (((ix + 1) * res - 180.0) - (ix * res - 180.0)) \
            * (((iy + 1) * res - 90.0) - (iy * res - 90.0))
        frac = np.round(np.asarray(out_a, dtype=np.float64) / box, 9) \
            if len(ix) else np.zeros(0)
        out = pd.DataFrame({"area_id": np.asarray(out_aid, dtype=np.int64),
                            "ix": ix, "iy": iy, "frac": frac})
        return out[out["frac"] > 0]

    return bounds.map_batches(cover, batch_format="pandas")


def tile_aspect(world_dir: str) -> rd.Dataset:
    """Gradient ORIENTATION raster — the `gdaldem aspect` sibling of
    :func:`tile_slope`: compass bearing of steepest ascent of the count
    DEM from the exact int64 Sobel responses,
    aspect = (90 − degrees(atan2(gy, gx))) mod 360 (north = 0°,
    clockwise). Flat cells (g2 = 0, undefined orientation) are dropped.
    atan2 on exact integer pairs hits the libm special values at the
    axis cases, so the 0/360 wraparound cannot flip between engines.

    Scale shape: one extra stateless map over the tile_slope raster —
    inherits its zero-join contribution pattern."""

    def asp(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["g2"] > 0].copy()
        a = 90.0 - np.degrees(np.arctan2(b["gy"].to_numpy(np.float64),
                                         b["gx"].to_numpy(np.float64)))
        b["aspect"] = np.round(np.mod(a, 360.0), 6)
        return b[["cell", "ix", "iy", "n_points", "gx", "gy", "aspect"]]

    return tile_slope(world_dir).map_batches(asp, batch_format="pandas")
