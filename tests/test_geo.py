import numpy as np
import pytest

from housenumbercore_ray.geo import (
    cell_bounds,
    latlng_to_cell,
    linestring_wkb,
    multipolygon_wkb,
    parse_wkb,
    point_segment_distance_m,
    point_wkb,
    points_in_polygon,
    polygon_cover,
    polygon_wkb,
    equirect_distance_m,
)
from housenumbercore_ray.geo.index import BoundaryIndex, StreetIndex
from housenumbercore_ray.geo.wkb import wkb_bbox, wkb_rings


class TestWkb:
    def test_point_roundtrip(self):
        kind, arr = parse_wkb(point_wkb(10.5, 50.25))
        assert kind == "point"
        assert arr.tolist() == [[10.5, 50.25]]

    def test_linestring_roundtrip(self):
        coords = [(10, 40), (10.1, 40.1), (10, 40.2)]
        kind, arr = parse_wkb(linestring_wkb(coords))
        assert kind == "linestring"
        assert arr.tolist() == [list(map(float, c)) for c in coords]

    def test_polygon_autoclose_and_rings(self):
        ext = [(0, 0), (4, 0), (4, 4), (0, 4)]
        hole = [(1, 1), (2, 1), (2, 2), (1, 2)]
        wkb = polygon_wkb(ext, [hole])
        kind, rings = parse_wkb(wkb)
        assert kind == "polygon"
        assert len(rings) == 2
        assert np.array_equal(rings[0][0], rings[0][-1])
        flat = wkb_rings(wkb)
        assert [is_ext for _, is_ext in flat] == [True, False]

    def test_multipolygon(self):
        a = [(0, 0), (1, 0), (1, 1), (0, 1)]
        b = [(5, 5), (6, 5), (6, 6), (5, 6)]
        wkb = multipolygon_wkb([a, b])
        kind, polys = parse_wkb(wkb)
        assert kind == "multipolygon"
        assert len(polys) == 2
        assert wkb_bbox(wkb) == (0.0, 0.0, 6.0, 6.0)


class TestCells:
    def test_encode_decode(self):
        cells = latlng_to_cell([50.025], [10.025])
        minlon, minlat, maxlon, maxlat = cell_bounds(int(cells[0]))
        assert minlon <= 10.025 < maxlon
        assert minlat <= 50.025 < maxlat

    def test_vectorized_matches_scalar(self):
        lats = np.linspace(-89, 89, 97)
        lons = np.linspace(-179, 179, 97)
        cells = latlng_to_cell(lats, lons)
        for lat, lon, c in zip(lats, lons, cells):
            assert latlng_to_cell([lat], [lon])[0] == c

    def test_polygon_cover_contains_point_cell(self):
        wkb = polygon_wkb([(10, 50), (10.3, 50), (10.3, 50.2), (10, 50.2)])
        cover = set(polygon_cover(wkb).tolist())
        inside_cell = int(latlng_to_cell([50.1], [10.15])[0])
        assert inside_cell in cover


class TestPip:
    SQUARE = polygon_wkb([(0, 0), (10, 0), (10, 10), (0, 10)])

    def test_basic(self):
        lon = [5, 15, 0, 10, -0.001]
        lat = [5, 5, 0, 10, 5]
        got = points_in_polygon(lon, lat, self.SQUARE).tolist()
        assert got == [True, False, True, True, False]

    def test_hole(self):
        wkb = polygon_wkb([(0, 0), (10, 0), (10, 10), (0, 10)], [[(4, 4), (6, 4), (6, 6), (4, 6)]])
        assert points_in_polygon([5], [5], wkb)[0] == np.False_
        assert points_in_polygon([2], [2], wkb)[0] == np.True_

    def test_concave(self):
        # L-shape
        wkb = polygon_wkb([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])
        got = points_in_polygon([1, 3, 3], [3, 1, 3], wkb).tolist()
        assert got == [True, True, False]

    def test_multipolygon_parts(self):
        wkb = multipolygon_wkb([[(0, 0), (1, 0), (1, 1), (0, 1)], [(5, 5), (6, 5), (6, 6), (5, 6)]])
        from housenumbercore_ray.geo.pip import points_in_rings

        got = points_in_rings([0.5, 5.5, 3], [0.5, 5.5, 3], wkb_rings(wkb)).tolist()
        assert got == [True, True, False]

    def test_equirect_distance(self):
        # one degree of latitude ≈ 111.2 km
        d = equirect_distance_m([10], [50], [10], [51])[0]
        assert d == pytest.approx(111194, rel=0.01)

    def test_point_segment_distance(self):
        seg = [(10.0, 50.0), (10.01, 50.0)]
        d = point_segment_distance_m([10.005], [50.001], seg)[0]
        assert d == pytest.approx(111.2, rel=0.02)
        d_end = point_segment_distance_m([10.02], [50.0], seg)[0]
        assert d_end > d


class TestBoundaryIndex:
    def test_locate(self):
        polys = [
            polygon_wkb([(10, 50), (10.2, 50), (10.2, 50.2), (10, 50.2)]),
            polygon_wkb([(10.2, 50), (10.4, 50), (10.4, 50.2), (10.2, 50.2)]),
        ]
        idx = BoundaryIndex([101, 102], polys)
        lon = np.array([10.1, 10.3, 11.5])
        lat = np.array([50.1, 50.1, 50.1])
        assert idx.locate(lon, lat).tolist() == [101, 102, -1]

    def test_locate_empty(self):
        idx = BoundaryIndex([1], [polygon_wkb([(0, 0), (1, 0), (1, 1), (0, 1)])])
        assert idx.locate(np.array([]), np.array([])).tolist() == []


class TestStreetIndex:
    def test_name_match_then_knn(self):
        streets = StreetIndex(
            area_ids=[1, 1],
            names_norm=["hauptstrasse", "nebenweg"],
            linestring_wkbs=[
                linestring_wkb([(10.0, 50.00), (10.1, 50.00)]),
                linestring_wkb([(10.0, 50.01), (10.1, 50.01)]),
            ],
            osm_ids=[11, 22],
        )
        names, ids, by_name = streets.assign(
            1, [10.05, 10.05], [50.0095, 50.0005], ["hauptstrasse", "unbekannt"]
        )
        assert names.tolist() == ["hauptstrasse", "hauptstrasse"]
        assert ids.tolist() == [11, 11]
        assert by_name.tolist() == [True, False]
        # the second point is nearer nebenweg when name doesn't pin it
        names2, ids2, _ = streets.assign(1, [10.05], [50.0095], ["unbekannt"])
        assert names2[0] == "nebenweg" and ids2[0] == 22


class TestSpatialJoinStreetlessArea:
    def test_candidates_in_streetless_area_dropped(self):
        """A municipality with zero valid streets assigns nothing — its
        candidates are dropped (MunicipalityJobs.java:284-304 skip), matching
        the oracle's inner street-assignment join."""
        import pandas as pd

        from housenumbercore_ray.stages.spatial import SpatialStreetJoin

        class Ctx:
            boundary_index = BoundaryIndex(
                [7], [polygon_wkb([(0, 0), (1, 0), (1, 1), (0, 1)])]
            )
            area_to_muni = {7: 3}
            muni_exactly = {3: False}
            street_index = StreetIndex([], [], [], [])  # no streets anywhere

        join = SpatialStreetJoin.__new__(SpatialStreetJoin)
        join.ctx = Ctx()
        batch = pd.DataFrame({
            "url": ["u"], "cand_seq": [0], "street_raw": ["Hauptstraße"],
            "hnr_raw": ["1"], "plz": ["10000"], "muni_raw": ["X"],
            "lat": [0.5], "lon": [0.5], "tags_text": [""],
        })
        out = join(batch)
        assert len(out) == 0


class TestKnnCellBuckets:
    def test_bucketed_knn_matches_dense_argmin(self):
        """The ring-expansion kNN must reproduce the dense all-streets argmin
        exactly (including lowest-index tie-breaks) on random geometry."""
        rng = np.random.RandomState(42)
        for trial in range(5):
            n_streets = rng.randint(7, 25)  # above BRUTE_FORCE_MAX
            wkbs, names = [], []
            for j in range(n_streets):
                x0, y0 = 10 + rng.rand() * 0.1, 50 + rng.rand() * 0.08
                pts = [(x0, y0)]
                for _ in range(rng.randint(1, 4)):
                    x0 += (rng.rand() - 0.3) * 0.03
                    y0 += (rng.rand() - 0.5) * 0.02
                    pts.append((x0, y0))
                wkbs.append(linestring_wkb(pts))
                names.append(f"s{j}")
            streets = StreetIndex([1] * n_streets, names, wkbs,
                                  osm_ids=list(range(100, 100 + n_streets)))
            n_pts = 200
            lon = 10 + rng.rand(n_pts) * 0.14 - 0.02   # includes points outside bbox
            lat = 50 + rng.rand(n_pts) * 0.12 - 0.02
            entry = streets.by_area[1]
            got = streets._knn_top1(entry, lon, lat)
            from housenumbercore_ray.geo.pip import point_segment_distance_m

            dists = np.full((n_pts, n_streets), np.inf)
            for j, coords in enumerate(entry["coords"]):
                dists[:, j] = point_segment_distance_m(lon, lat, coords)
            want = dists.argmin(axis=1)
            assert (got == want).all(), f"trial {trial}: {np.flatnonzero(got != want)[:5]}"


class TestKnnEdgeCases:
    """ADVICE r2: cross-ring tie-breaks, point-degenerate geometries, and
    the high-latitude ring stop bound must all match the dense argmin."""

    def _dense(self, entry, lon, lat):
        from housenumbercore_ray.geo.pip import point_segment_distance_m
        n = len(entry["names"])
        dists = np.full((len(lon), n), np.inf)
        for j, coords in enumerate(entry["coords"]):
            dists[:, j] = point_segment_distance_m(lon, lat, coords)
        return dists.argmin(axis=1)

    def test_point_degenerate_geometry_reachable(self):
        """A single-vertex geometry must be indexed into its cell and win
        when it is the nearest street."""
        from housenumbercore_ray.geo.wkb import linestring_wkb
        n = 10
        wkbs = [linestring_wkb([(10.5 + 0.02 * j, 50.5), (10.5 + 0.02 * j, 50.52)])
                for j in range(n - 1)]
        wkbs.append(linestring_wkb([(10.4, 50.4)]))  # lone point, far south-west
        streets = StreetIndex([1] * n, [f"s{j}" for j in range(n)], wkbs,
                              osm_ids=list(range(n)))
        entry = streets.by_area[1]
        lon = np.array([10.4001, 10.52])
        lat = np.array([50.4001, 50.51])
        got = streets._knn_top1(entry, lon, lat)
        assert (got == self._dense(entry, lon, lat)).all()
        assert got[0] == n - 1  # the lone point wins for the nearby query

    def test_cross_ring_tie_breaks_to_lowest_index(self):
        """Two streets exactly equidistant from the query but in different
        rings: the LOWER index must win even when it is discovered later."""
        from housenumbercore_ray.geo.wkb import linestring_wkb
        # query at (10.005, 50.005); street 0 is 0.04° north (4 cells up,
        # later ring), street 1 is 0.04° south shifted to an adjacent cell
        # column... instead plant exact mirror segments: same |Δlat|.
        wkbs = [
            linestring_wkb([(9.95, 50.045), (10.06, 50.045)]),   # north, ring ~4
            linestring_wkb([(9.95, 49.985), (10.06, 49.985)]),   # south, ring ~1
        ]
        # pad with far streets to exceed BRUTE_FORCE_MAX
        for j in range(8):
            wkbs.append(linestring_wkb([(10.3 + 0.01 * j, 50.3), (10.31 + 0.01 * j, 50.31)]))
        streets = StreetIndex([1] * 10, [f"s{j}" for j in range(10)], wkbs,
                              osm_ids=list(range(10)))
        entry = streets.by_area[1]
        lon = np.array([10.005])
        lat = np.array([50.015])  # 0.03° to both horizontal segments
        got = streets._knn_top1(entry, lon, lat)
        assert (got == self._dense(entry, lon, lat)).all()
        assert got[0] == 0  # index 0 ties and must win despite the later ring

    def test_high_latitude_queries_match_dense(self):
        """Query points at |lat| ≫ streets' |lat|: the per-group cos bound
        must stay conservative (old streets-only bound was not)."""
        from housenumbercore_ray.geo.wkb import linestring_wkb
        rng = np.random.RandomState(7)
        n_streets = 12
        wkbs, names = [], []
        for j in range(n_streets):
            x0, y0 = 10 + rng.rand() * 0.1, 70 + rng.rand() * 0.05
            wkbs.append(linestring_wkb([(x0, y0), (x0 + 0.02, y0 + 0.01)]))
            names.append(f"s{j}")
        streets = StreetIndex([1] * n_streets, names, wkbs, osm_ids=list(range(n_streets)))
        entry = streets.by_area[1]
        lon = 10 + rng.rand(80) * 0.15 - 0.02
        lat = 70 + rng.rand(80) * 0.2  # up to 70.2°, above every street
        got = streets._knn_top1(entry, lon, lat)
        assert (got == self._dense(entry, lon, lat)).all()
