"""Vector-geometry kernel tests (pipelines/geometry.py): WKB batch decode
round-trip, shoelace measurement on known shapes, densify determinism, and
Douglas-Peucker invariants.  Oracle parity at sf0.001 is covered by
test_extended_queries."""

import numpy as np
import pytest

from housenumbercore_ray.geo.wkb import linestring_wkb, multipolygon_wkb, polygon_wkb
from housenumbercore_ray.pipelines.geometry import (
    DENSIFY_D,
    _densify,
    _dp_keep,
    _ragged_arange,
    decode_linestrings,
)


class TestDecode:
    def test_ragged_arange(self):
        out = _ragged_arange(np.array([3, 0, 2], dtype=np.int64))
        assert out.tolist() == [0, 1, 2, 0, 1]

    def test_round_trip(self):
        lines = [
            [(10.0, 50.0), (10.1, 50.1)],
            [(9.5, 49.0), (9.6, 49.2), (9.7, 49.1)],
            [(11.0, 51.0), (11.0, 51.5), (11.2, 51.5), (11.3, 51.6)],
        ]
        bufs = [linestring_wkb(c) for c in lines]
        npts, pts = decode_linestrings(bufs)
        assert npts.tolist() == [2, 3, 4]
        flat = np.vstack([np.asarray(c) for c in lines])
        assert np.array_equal(pts, flat)

    def test_rejects_polygon(self):
        with pytest.raises(ValueError):
            decode_linestrings([polygon_wkb([(0, 0), (1, 0), (1, 1)])])

    def test_empty_batch(self):
        npts, pts = decode_linestrings([])
        assert len(npts) == 0 and pts.shape == (0, 2)


class TestShoelace:
    def _measure(self, wkb):
        # same re-centered shoelace the muni_area batch kernel applies
        from housenumbercore_ray.geo.wkb import wkb_rings

        rings = wkb_rings(wkb)
        area = 0.0
        for ring, is_ext in rings:
            fx, fy = ring[0, 0], ring[0, 1]
            x, y = ring[:, 0] - fx, ring[:, 1] - fy
            cr = x[:-1] * y[1:] - x[1:] * y[:-1]
            if is_ext:
                area += abs(0.5 * float(np.sum(cr)))
            else:
                area -= abs(0.5 * float(np.sum(cr)))
        return area

    def test_unit_square(self):
        wkb = polygon_wkb([(0, 0), (1, 0), (1, 1), (0, 1)])
        assert self._measure(wkb) == pytest.approx(1.0)

    def test_square_with_hole(self):
        wkb = polygon_wkb(
            [(0, 0), (4, 0), (4, 4), (0, 4)],
            holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]],
        )
        assert self._measure(wkb) == pytest.approx(16.0 - 1.0)

    def test_multipolygon_sums_parts(self):
        wkb = multipolygon_wkb([
            [(0, 0), (1, 0), (1, 1), (0, 1)],
            [(10, 10), (12, 10), (12, 11), (10, 11)],
        ])
        assert self._measure(wkb) == pytest.approx(1.0 + 2.0)


class TestDensify:
    def _one(self, osm_id=77):
        coords = np.array([(10.0, 50.0), (10.01, 50.0), (10.01, 50.02)])
        npts = np.array([len(coords)], dtype=np.int64)
        return _densify(np.array([osm_id], dtype=np.int64), npts, coords)

    def test_counts_and_order(self):
        row, seq, x, y = self._one()
        assert len(seq) == 2 * DENSIFY_D + 1
        assert seq.tolist() == list(range(2 * DENSIFY_D + 1))
        # originals preserved exactly at seq 0, D, 2D
        assert (x[0], y[0]) == (10.0, 50.0)
        assert (x[DENSIFY_D], y[DENSIFY_D]) == (10.01, 50.0)
        assert (x[2 * DENSIFY_D], y[2 * DENSIFY_D]) == (10.01, 50.02)

    def test_deterministic(self):
        a = self._one()
        b = self._one()
        for u, v in zip(a, b):
            assert np.array_equal(u, v)

    def test_osm_id_changes_offsets(self):
        _, _, x1, _ = self._one(osm_id=77)
        _, _, x2, _ = self._one(osm_id=78)
        interior = np.ones(len(x1), dtype=bool)
        interior[[0, DENSIFY_D, 2 * DENSIFY_D]] = False
        assert (x1[interior] != x2[interior]).any()


class TestDouglasPeucker:
    def test_straight_line_collapses(self):
        x = np.linspace(0, 1, 20)
        y = np.zeros(20)
        keep = _dp_keep(x, y, eps=1e-9)
        assert keep[0] and keep[-1] and keep.sum() == 2

    def test_spike_kept(self):
        x = np.arange(10, dtype=float)
        y = np.zeros(10)
        y[4] = 1.0
        keep = _dp_keep(x, y, eps=0.1)
        assert keep[4]

    def test_idempotent(self):
        rng = np.random.RandomState(11)
        x = np.cumsum(rng.uniform(0.1, 1.0, 40))
        y = rng.uniform(-1, 1, 40)
        keep = _dp_keep(x, y, eps=0.3)
        x2, y2 = x[keep], y[keep]
        keep2 = _dp_keep(x2, y2, eps=0.3)
        assert keep2.all()

    def test_degenerate_chord_uses_endpoint_distance(self):
        # closed loop: first == last → zero-length chord
        x = np.array([0.0, 1.0, 0.5, 0.0])
        y = np.array([0.0, 0.0, 2.0, 0.0])
        keep = _dp_keep(x, y, eps=0.5)
        assert keep[0] and keep[-1]
        assert keep[1] or keep[2]


class TestDouglasPeuckerProperties:
    """_dp_keep vs an O(n²) reference implementation on random polylines."""

    @staticmethod
    def _dp_reference(x, y, eps):
        n = len(x)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True

        def rec(i, j):
            if j - i < 2:
                return
            xi, yi, xj, yj = x[i], y[i], x[j], y[j]
            dx, dy = xj - xi, yj - yi
            den = np.sqrt(dx * dx + dy * dy)
            best_d, best_k = -1.0, -1
            for p in range(i + 1, j):
                if den == 0.0:
                    d = np.sqrt((x[p] - xi) ** 2 + (y[p] - yi) ** 2)
                else:
                    d = abs(dx * (yi - y[p]) - (xi - x[p]) * dy) / den
                if d > best_d:
                    best_d, best_k = d, p
            if best_d > eps:
                keep[best_k] = True
                rec(i, best_k)
                rec(best_k, j)

        rec(0, n - 1)
        return keep

    def test_matches_reference_on_random_polylines(self):
        from housenumbercore_ray.pipelines.geometry import _dp_keep

        rng = np.random.RandomState(7)
        for trial in range(25):
            n = rng.randint(3, 60)
            x = np.cumsum(rng.uniform(-0.5, 1.0, n))
            y = rng.uniform(-2, 2, n)
            eps = float(rng.uniform(0.05, 1.5))
            got = _dp_keep(x, y, eps)
            want = self._dp_reference(x, y, eps)
            assert np.array_equal(got, want), f"trial {trial}"

    def test_decode_fuzz_round_trip(self):
        from housenumbercore_ray.geo.wkb import linestring_wkb
        from housenumbercore_ray.pipelines.geometry import decode_linestrings

        rng = np.random.RandomState(13)
        lines = [rng.uniform(-180, 180, (rng.randint(2, 40), 2))
                 for _ in range(50)]
        npts, pts = decode_linestrings([linestring_wkb(c) for c in lines])
        assert npts.tolist() == [len(c) for c in lines]
        assert np.array_equal(pts, np.vstack(lines))


class TestLongStreetOracleParity:
    """The worldgen streets have 2-3 vertices; this pins the DP recursive
    CTE and the engine stack on a CRAFTED 30-vertex street (densified to
    233 points, recursion depth ~8) written to a scratch world dir."""

    def test_long_street_parity(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines import geometry as g
        from housenumbercore_ray.pipelines import geometry_oracle as go

        rng = np.random.RandomState(42)
        n = 30
        lon = 10.0 + np.cumsum(rng.uniform(0.0005, 0.003, n))
        lat = 50.0 + np.cumsum(rng.uniform(-0.002, 0.002, n))
        coords = np.column_stack([lon, lat])
        wkb = linestring_wkb(coords)
        short = linestring_wkb([(9.0, 49.0), (9.1, 49.05)])
        tbl = pa.table({
            "osm_id": pa.array([501, 502], type=pa.int64()),
            "linestring_wkb": pa.array([wkb, short], type=pa.binary()),
        })
        wd = str(tmp_path / "world")
        import os
        os.makedirs(wd, exist_ok=True)
        pq.write_table(tbl, f"{wd}/osm_streets.parquet")

        eng = g.line_simplify(wd).to_pandas()
        ora = duckdb.sql(go.line_simplify_sql(wd)).df()

        def norm(df):
            df = df.copy()
            for c in ("osm_id", "seq"):
                df[c] = df[c].astype(np.int64)
            return (df.sort_values(["osm_id", "seq"])
                      .reset_index(drop=True)[["osm_id", "seq", "lon", "lat"]])

        a, b = norm(eng), norm(ora)
        assert len(a) == len(b)
        pd.testing.assert_frame_equal(a, b)
        # the long street must actually exercise DP: some but not all
        # densified points kept
        n_kept = (a["osm_id"] == 501).sum()
        assert 2 < n_kept < (n - 1) * DENSIFY_D + 1


class TestStreetLength:
    def test_known_length_and_oracle_parity(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines import geometry as g
        from housenumbercore_ray.pipelines import geometry_oracle as go

        # street 1: pure-latitude 0.01 deg hop at the equator = R*0.01*pi/180;
        # street 2: pure-longitude 0.02 deg hop at lat 60 (cos factor ~0.5);
        # street 3: 3 vertices, two equal hops
        wkbs = [
            linestring_wkb([(10.0, 0.0), (10.0, 0.01)]),
            linestring_wkb([(10.0, 60.0), (10.02, 60.0)]),
            linestring_wkb([(10.0, 0.0), (10.0, 0.01), (10.0, 0.02)]),
        ]
        tbl = pa.table({"osm_id": pa.array([1, 2, 3], pa.int64()),
                        "linestring_wkb": pa.array(wkbs, pa.binary())})
        wd = str(tmp_path / "w")
        import os
        os.makedirs(wd, exist_ok=True)
        pq.write_table(tbl, f"{wd}/osm_streets.parquet")

        eng = (g.street_length(wd).to_pandas()
               .sort_values("osm_id").reset_index(drop=True))
        r = 6371000.0
        lat_hop = r * 0.01 * np.pi / 180
        lon_hop = r * 0.02 * np.pi / 180 * np.cos(60.0 * np.pi / 180)
        assert abs(eng.loc[0, "length_m"] - round(lat_hop, 2)) < 0.02
        assert abs(eng.loc[1, "length_m"] - round(lon_hop, 2)) < 0.02
        assert abs(eng.loc[2, "length_m"] - 2 * lat_hop) < 0.05
        assert list(eng["n_vertices"]) == [2, 2, 3]
        assert list(eng["n_segments"]) == [1, 1, 2]

        ora = (duckdb.sql(go.street_length_sql(wd)).df()
               .sort_values("osm_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)


class TestRadiusPairs:
    def test_cross_cell_pair_found_exactly_once(self, ray_session, tmp_path):
        """A pair straddling a cell boundary is found (4-cell replication
        covers it) and reported exactly once (min-corner rule); points
        beyond the radius are excluded; same_hnr flags duplicates."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines import geometry as g
        from housenumbercore_ray.pipelines import geometry_oracle as go

        wd = str(tmp_path)
        res = g.RADIUS_PAIR_RES
        # cell boundary in lon at multiples of res; put two points ~20 m
        # apart on opposite sides of a boundary at lat 50
        blon = (95000 * res) - 180.0  # some boundary line
        lat = 50.0
        m_per_deg_lon = 6371000.0 * np.pi / 180 * np.cos(lat * np.pi / 180)
        d = 10.0 / m_per_deg_lon  # 10 m in deg lon
        pts = {
            "osm_id": [1, 2, 3, 4, 5],
            "lon": [blon - d, blon + d,  # pair across the boundary (~20 m)
                    blon + 10 * res,     # far away
                    blon - 5 * res, blon - 5 * res + 2 * d],  # same-cell pair
            "lat": [lat, lat, lat, lat, lat],
            "addr_housenumber": ["7", "7", "9", "4", "5"],
        }
        pq.write_table(pa.table(pts), f"{wd}/osm_addresses.parquet")

        eng = (g.address_radius_pairs(wd).to_pandas()
               .sort_values(["osm_id_a", "osm_id_b"]).reset_index(drop=True))
        assert list(zip(eng["osm_id_a"], eng["osm_id_b"])) == [(1, 2), (4, 5)]
        assert list(eng["same_hnr"]) == [1, 0]
        assert abs(eng.loc[0, "dist_m"] - 20.0) < 0.1
        # no duplicates from the replicated cover
        assert not eng.duplicated(["osm_id_a", "osm_id_b"]).any()

        ora = (duckdb.sql(go.radius_pairs_sql(wd)).df()
               .sort_values(["osm_id_a", "osm_id_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)


class TestDbscan:
    def test_crafted_clusters_border_and_noise(self, ray_session, tmp_path):
        """Two 5-point core clusters 80 m-spaced (every point sees the other
        4 -> deg 4, core at min_pts=4), one point B midway that sees exactly
        one core from EACH cluster (deg 2 -> border, min-label tie rule picks
        the lower cluster id), and two isolated noise points.  Engine output
        is checked against the hand-derived roles AND the recursive-CTE
        oracle."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines import geometry as g
        from housenumbercore_ray.pipelines import geometry_oracle as go

        lat0 = 50.0
        m_per_deg_lat = 6371000.0 * np.pi / 180
        step = 80.0 / m_per_deg_lat     # 80 m in deg lat
        gap = 350.0 / m_per_deg_lat     # B sits 350 m off each cluster tip
        ids, lats, lons = [], [], []
        # cluster A: ids 1..5, stacked in latitude
        for i in range(5):
            ids.append(1 + i); lats.append(lat0 + i * step); lons.append(10.0)
        top_a = lat0 + 4 * step
        # border B: id 6, 350 m above A's top point (only A5 within 400 m)
        ids.append(6); lats.append(top_a + gap); lons.append(10.0)
        # cluster C: ids 11..15, starting 350 m above B
        base_c = top_a + 2 * gap
        for i in range(5):
            ids.append(11 + i); lats.append(base_c + i * step); lons.append(10.0)
        # noise: ids 20, 21 far away in lon
        for j, nid in enumerate((20, 21)):
            ids.append(nid); lats.append(lat0); lons.append(11.0 + j)
        pq.write_table(pa.table({
            "osm_id": pa.array(ids, pa.int64()),
            "lon": pa.array(lons, pa.float64()),
            "lat": pa.array(lats, pa.float64()),
            "addr_housenumber": pa.array(["1"] * len(ids)),
        }), str(tmp_path / "osm_addresses.parquet"))

        wd = str(tmp_path)
        eng = (g.dbscan_clusters(wd).to_pandas()
               .sort_values("osm_id").reset_index(drop=True))
        got = {int(r.osm_id): (r.role, int(r.cluster_id))
               for r in eng.itertuples()}
        for i in range(1, 6):
            assert got[i] == ("core", 1)
        for i in range(11, 16):
            assert got[i] == ("core", 11)
        # B borders cores 5 (cluster 1) and 11 (cluster 11): min label wins
        assert got[6] == ("border", 1)
        assert got[20] == ("noise", -1)
        assert got[21] == ("noise", -1)
        assert len(eng) == 13

        ora = (duckdb.sql(go.dbscan_sql(wd)).df()
               .sort_values("osm_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
