"""The "theoretical" evaluation pipeline — nationwide OSM address counting
per municipality plus the population-density regression model.

Reference: TheoreticalHousenumbers.main (entry 3, SURVEY.md §3.3) — the
per-municipality loop with three extraction passes becomes ONE streaming pass
over ``osm_addresses``:

  - street resolution order (TheoreticalHousenumbers.java:943-1010):
    ``addr:street`` → associatedStreet relation name (J5, via the broadcast
    relation dictionary, ST2) → ``addr:place`` fallback (M12) → incomplete
    (M15; counted per object type, never dropped silently);
  - per-municipality counters (A1, theoevaluations columns,
    dbstructure_theoeval.sql:20-49): complete addresses by object type,
    addr:street hits by type (relation → "polygons" per the reference's
    polygon pass), associatedStreet hits by type, place fallbacks,
    incomplete by type;
  - theoretical address model (A5, dbstructure_theoeval.sql:71-87):
    ``theo_anzahl_adressen = round(pop * 1.052178115 / (c1 * pop/km² + c2))``
    with 5 population brackets, and coverage
    ``theo_adressenabdeckung = 100 * anzahl / model``; round() is
    half-away-from-zero (SQL round) → ``floor(x + 0.5)`` here.

Counting is object-level (no housenumber explosion) exactly like the
reference's counters. The shuffle is a pre-aggregated (muni, type,
resolution) partial count per batch — O(munis × 12) rows per batch — then a
tiny groupby(muni_id) finalize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.context import get_context, get_context_ref

# (c1, c2) per population bracket — dbstructure_theoeval.sql:71-87
MODEL_BRACKETS = [
    (0, 5_000, 0.000920645, 3.002091115),
    (5_000, 20_000, 0.000509945, 3.086196323),
    (20_000, 100_000, 0.000865691, 3.490431037),
    (100_000, 250_000, 0.000728235, 3.394332878),
    (250_000, None, 0.001400991, 3.46995551),
]
POP_FACTOR = 1.052178115


def model_value(population: float, area_km2: float) -> float:
    """Raw (unrounded) model denominator-applied value; 0 outside brackets."""
    if not (area_km2 > 0 and population > 0):
        return 0.0
    for lo, hi, c1, c2 in MODEL_BRACKETS:
        if population > lo and (hi is None or population <= hi):
            return population * POP_FACTOR / (c1 * population / area_km2 + c2)
    return 0.0


class TheoCount:
    """map_batches actor: osm_addresses rows → per-batch partial counts
    (muni_id, osm_type, resolution, n)."""

    def __init__(self, ctx_ref) -> None:
        import ray

        self.ctx = ray.get(ctx_ref)
        # vectorized membership probe for the relation dictionary (the
        # per-row Python lambda was the stage's only row loop)
        self.rel_ids = np.asarray(list(self.ctx.relations.keys()), dtype=np.float64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        area = self.ctx.boundary_index.locate(batch["lon"].to_numpy(), batch["lat"].to_numpy())
        batch = batch.assign(area_id=area)
        batch = batch[batch["area_id"] >= 0]
        if len(batch) == 0:
            return pd.DataFrame({
                "muni_id": pd.Series([], dtype=np.int64),
                "osm_type": pd.Series([], dtype=str),
                "resolution": pd.Series([], dtype=str),
                "n": pd.Series([], dtype=np.int64),
            })
        batch = batch.assign(muni_id=batch["area_id"].map(self.ctx.area_to_muni))
        rel_known = pd.to_numeric(batch["assoc_rel_id"], errors="coerce").isin(
            self.rel_ids).to_numpy()
        resolution = np.where(
            batch["addr_street"].notna(), "street",
            np.where(rel_known, "assoc",
                     np.where(batch["addr_place"].notna(), "place", "incomplete")),
        )
        batch = batch.assign(resolution=resolution)
        out = (
            batch.groupby(["muni_id", "osm_type", "resolution"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        return out.astype({"muni_id": np.int64, "n": np.int64})


def theo_muni_summary(world_dir: str, *, prev_month: bool = False) -> rd.Dataset:
    ref = get_context_ref(world_dir)
    ctx = get_context(world_dir)
    pop = {meta["muni_id"]: meta["population"] for meta in ctx.boundary_index.payload.values()}
    km2 = {meta["muni_id"]: meta["area_km2"] for meta in ctx.boundary_index.payload.values()}

    cols = ["osm_type", "addr_street", "addr_place", "assoc_rel_id", "lon", "lat"]
    src = rd.read_parquet(
        f"{world_dir}/osm_addresses.parquet",
        columns=cols + (["osm_id"] if prev_month else []),
    )
    if prev_month:
        # deterministic previous-month snapshot: addresses with
        # osm_id % 9 == 4 were "mapped since last month" and are absent
        # from the old snapshot (the oracle re-derives the same rule in
        # SQL — mirrors the pages-side prev_pages_sql discipline)
        src = src.map_batches(
            lambda b: b[b["osm_id"].to_numpy(np.int64) % 9 != 4][cols],
            batch_format="pandas",
        )
    partials = src.map_batches(
        TheoCount, fn_constructor_args=(ref,),
        batch_format="pandas", batch_size=8192, concurrency=(1, 4), num_cpus=1,
    )

    # planet_line pass (r5, TheoreticalHousenumbers.java:1056-1071): address
    # WAYS enter the count per covers-OR-crosses municipality — a
    # boundary-crossing address way is counted by EVERY municipality it
    # reaches into, where the point pass above would centroid-locate it
    # once. Same partial schema, unioned before the finalize groupby.
    # Deliberately a TASK stage, not another actor pool: mom_diff runs TWO
    # summaries concurrently, and a third+fourth min-1 actor pool can pin
    # every CPU on a small cluster while the reads starve (observed 4-cpu
    # deadlock); tasks release their CPU between batches, and the context
    # ray.get is a zero-copy object-store read per batch.
    def line_theo_count(b: pd.DataFrame) -> pd.DataFrame:
        import ray

        ctx = ray.get(ref)
        b = b.reset_index(drop=True)
        ridx, areas = ctx.boundary_index.locate_polyline_multi(
            b["linestring_wkb"].to_numpy())
        hit = b.iloc[ridx]
        resolution = np.where(
            hit["addr_street"].notna(), "street",
            np.where(hit["addr_place"].notna(), "place", "incomplete"))
        out = pd.DataFrame({
            "muni_id": pd.Series(areas).map(ctx.area_to_muni).to_numpy(np.int64),
            "osm_type": np.full(len(hit), "way", dtype=object),
            "resolution": resolution,
        })
        out = out.groupby(["muni_id", "osm_type", "resolution"],
                          as_index=False).size().rename(columns={"size": "n"})
        return out.astype({"muni_id": np.int64, "n": np.int64})

    way_src = rd.read_parquet(
        f"{world_dir}/osm_address_ways.parquet",
        columns=["osm_id", "addr_street", "addr_place", "linestring_wkb"],
    )
    if prev_month:
        way_src = way_src.map_batches(
            lambda b: b[b["osm_id"].to_numpy(np.int64) % 9 != 4],
            batch_format="pandas",
        )
    way_partials = way_src.map_batches(
        line_theo_count, batch_format="pandas", batch_size=8192)
    partials = partials.union(way_partials)

    TYPE_COL = {"node": "nodes", "way": "ways", "relation": "rels"}
    TREFFER_COL = {"node": "nodes", "way": "ways", "relation": "polygons"}

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        muni = int(g["muni_id"].iloc[0])
        agg = g.groupby(["osm_type", "resolution"])["n"].sum()

        def get(t, r):
            return int(agg.get((t, r), 0))

        row = {"muni_id": np.int64(muni)}
        complete_by_type = {
            t: sum(get(t, r) for r in ("street", "assoc", "place")) for t in TYPE_COL
        }
        row["anzahl_osmadressen"] = np.int64(sum(complete_by_type.values()))
        for t, col in TYPE_COL.items():
            row[f"anzahl_osmadressen{col}"] = np.int64(complete_by_type[t])
        for t, col in TREFFER_COL.items():
            row[f"anzahl_{col}_addrstreet_treffer"] = np.int64(get(t, "street"))
        for t, col in TREFFER_COL.items():
            row[f"anzahl_{col}_associatedstreet_treffer"] = np.int64(get(t, "assoc"))
        row["anzahl_osmadressenplaces"] = np.int64(sum(get(t, "place") for t in TYPE_COL))
        for t, col in TYPE_COL.items():
            row[f"anzahl_osmadressen{col}unvollstaendig"] = np.int64(get(t, "incomplete"))
        raw = model_value(float(pop.get(muni, 0)), float(km2.get(muni, 0.0)))
        row["theo_anzahl_adressen"] = np.int64(np.floor(raw + 0.5)) if raw > 0 else np.int64(0)
        row["theo_adressenabdeckung"] = (
            100 * row["anzahl_osmadressen"] / raw if raw > 0 else 0.0
        )
        return pd.DataFrame([row])

    return partials.groupby("muni_id").map_groups(finalize, batch_format="pandas")


def theo_mom_diff(world_dir: str) -> rd.Dataset:
    """Month-over-month diff of the theoretical evaluation — the analog of
    the reference's ``theoevalYYYYMMdiffYYYYMM`` materialized views
    (dbstructure_theoeval.sql:1019-1037): per municipality, this month's
    and last month's OSM address counts, model predictions and coverage,
    plus the address-count delta. The previous month is the deterministic
    snapshot rule above (osm_id % 9 == 4 rows absent).

    Scale shape: both sides are full theo summaries (one row per muni —
    bounded by the muni dimension, ~10k nationally); the combine is ONE
    muni-keyed groupby over tagged sides, vectorized inside the group.
    Coverage percentages round to 1 decimal like the reference view."""
    keep = ["muni_id", "anzahl_osmadressen", "theo_anzahl_adressen",
            "theo_adressenabdeckung"]

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return b[keep].assign(_side=side)

        return fn

    cur = theo_muni_summary(world_dir).map_batches(tag("n"), batch_format="pandas")
    prv = theo_muni_summary(world_dir, prev_month=True).map_batches(
        tag("a"), batch_format="pandas")

    ctx = get_context(world_dir)
    pop = {m["muni_id"]: m["population"] for m in ctx.boundary_index.payload.values()}
    km2 = {m["muni_id"]: m["area_km2"] for m in ctx.boundary_index.payload.values()}

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        muni = int(g["muni_id"].iloc[0])
        n = g[g["_side"] == "n"]
        a = g[g["_side"] == "a"]
        if len(n) != 1 or len(a) != 1:
            # inner-join semantics of the reference view (te2 × te1 on
            # gemeinde_id): munis present in only one month drop out
            return pd.DataFrame()
        n, a = n.iloc[0], a.iloc[0]
        return pd.DataFrame([{
            "muni_id": np.int64(muni),
            "flaechekm2": float(km2.get(muni, 0.0)),
            "bevoelkerungszahl": np.int64(pop.get(muni, 0)),
            "diff_anzahl_osmadressen": np.int64(
                n["anzahl_osmadressen"] - a["anzahl_osmadressen"]),
            "neue_anzahl_osmadressen": np.int64(n["anzahl_osmadressen"]),
            "alte_anzahl_osmadressen": np.int64(a["anzahl_osmadressen"]),
            "neue_theo_anzahl_adressen": np.int64(n["theo_anzahl_adressen"]),
            "alte_theo_anzahl_adressen": np.int64(a["theo_anzahl_adressen"]),
            "neue_theo_adressenabdeckung": np.round(
                float(n["theo_adressenabdeckung"]), 1),
            "alte_theo_adressenabdeckung": np.round(
                float(a["theo_adressenabdeckung"]), 1),
        }])

    return cur.union(prv).groupby("muni_id").map_groups(
        combine, batch_format="pandas")
