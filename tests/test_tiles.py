"""Tile operator unit tests (pipelines/tiles.py) — grid arithmetic,
pyramid rollup identity, and vectorize region merging on a crafted world.
Oracle parity at sf0.001 is covered by test_extended_queries."""

import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.pipelines.tiles import (
    N_ZOOMS,
    TILE_RES_DEG,
    _cell_id,
    _tile_ix_iy,
)


class TestGridArithmetic:
    def test_ix_iy_basic(self):
        ix, iy = _tile_ix_iy(np.array([10.005]), np.array([50.005]))
        assert ix[0] == int(np.floor(190.005 / TILE_RES_DEG))
        assert iy[0] == int(np.floor(140.005 / TILE_RES_DEG))

    def test_cell_pack_unpack(self):
        ix = np.array([19001, 0, 35999], dtype=np.int64)
        iy = np.array([14000, 0, 17999], dtype=np.int64)
        cell = _cell_id(ix, iy)
        assert ((cell >> 22) == ix).all()
        assert ((cell & ((1 << 22) - 1)) == iy).all()

    def test_zoom_rollup_is_shift_exact(self):
        """floor(floor(x)/2^z) == floor(x/2^z) for integer base index —
        the identity that makes the pyramid exact without re-dividing
        lon/lat at coarser widths."""
        rng = np.random.RandomState(3)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-90, 90, 1000)
        ix, iy = _tile_ix_iy(lon, lat)
        for z in range(N_ZOOMS):
            assert ((ix >> z) == np.floor(ix / (1 << z)).astype(np.int64)).all()


@pytest.fixture(scope="module")
def crafted_world(tmp_path_factory):
    """A tiny world whose hot cells form one L-shaped region, one isolated
    hot cell, and background cold cells."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("tileworld")
    res = TILE_RES_DEG

    def pts_in_cell(ix, iy, n):
        # n points near the center of cell (ix, iy)
        lon = (ix + 0.5) * res - 180.0
        lat = (iy + 0.5) * res - 90.0
        return [(lon + 1e-5 * i, lat) for i in range(n)]

    pts = []
    # L-shape: (100,100), (101,100), (101,101) each with 3 points (hot)
    for c in [(100, 100), (101, 100), (101, 101)]:
        pts += pts_in_cell(*c, 3)
    # isolated hot cell far away
    pts += pts_in_cell(300, 300, 5)
    # cold cells (1-2 points) adjacent to the L — must not join the region
    pts += pts_in_cell(100, 101, 2)
    pts += pts_in_cell(102, 101, 1)
    lon = [p[0] for p in pts]
    lat = [p[1] for p in pts]
    t = pa.table({
        "osm_id": pa.array(range(len(pts)), pa.int64()),
        "osm_type": pa.array(["node"] * len(pts)),
        "addr_street": pa.array([f"s{i % 4}" for i in range(len(pts))]),
        "addr_place": pa.array([None] * len(pts), pa.string()),
        "addr_housenumber": pa.array(["1"] * len(pts)),
        "tags_text": pa.array([""] * len(pts)),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "assoc_rel_id": pa.array([None] * len(pts), pa.int64()),
        "muni_id": pa.array([1] * len(pts), pa.int64()),
    })
    pq.write_table(t, str(d / "osm_addresses.parquet"))
    # one zone bbox covering the L-shape + its cold neighbors, one covering
    # the isolated cell (zonal-stats fixture)
    bounds = pa.table({
        "muni_id": pa.array([1, 2], pa.int64()),
        "minlon": pa.array([(99 * res) - 180.0, (299 * res) - 180.0]),
        "minlat": pa.array([(99 * res) - 90.0, (299 * res) - 90.0]),
        "maxlon": pa.array([(104 * res) - 180.0, (302 * res) - 180.0]),
        "maxlat": pa.array([(104 * res) - 90.0, (302 * res) - 90.0]),
        "sub_id": pa.array(["-1", "-1"]),
    })
    pq.write_table(bounds, str(d / "boundaries.parquet"))
    return str(d)


class TestTileOps:
    def test_assign_covers_every_point(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_assign

        df = tile_assign(crafted_world).to_pandas()
        assert len(df) == 17
        assert set(df.columns) == {"osm_id", "ix", "iy", "cell"}
        assert df["osm_id"].is_unique

    def test_rasterize_counts(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_rasterize

        df = tile_rasterize(crafted_world).to_pandas()
        by = df.set_index(["ix", "iy"])
        assert by.loc[(100, 100)]["n_points"] == 3
        assert df["n_points"].sum() == 17

    def test_pyramid_mass_conserved_per_zoom(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_pyramid

        df = tile_pyramid(crafted_world).to_pandas()
        per_zoom = df.groupby("zoom")["n_points"].sum()
        assert (per_zoom == 17).all()
        assert sorted(df["zoom"].unique()) == list(range(N_ZOOMS))
        # coarser zooms have <= cells of finer zooms
        n_cells = df.groupby("zoom").size()
        assert (n_cells.diff().dropna() <= 0).all()

    def test_vectorize_merges_l_shape(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_vectorize

        df = tile_vectorize(crafted_world).to_pandas().sort_values("n_cells")
        # one isolated 1-cell region (5 pts) + one 3-cell L region (9 pts)
        assert len(df) == 2
        iso, lshape = df.iloc[0], df.iloc[1]
        assert iso["n_cells"] == 1 and iso["n_points"] == 5
        assert lshape["n_cells"] == 3 and lshape["n_points"] == 9
        assert lshape["min_ix"] == 100
        assert lshape["max_ix"] == 101
        assert lshape["min_iy"] == 100
        assert lshape["max_iy"] == 101


class TestAssocStreetFix:
    def test_fix_rows(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.workaround import (
            MARKER_TAG,
            assoc_street_fix,
        )

        t = pa.table({
            "osm_id": pa.array([1, 2, 3, 4], pa.int64()),
            "osm_type": pa.array(["node", "way", "node", "way"]),
            "addr_street": pa.array(["Hauptstraße", None, None, None]),
            "assoc_rel_id": pa.array([9, 9, None, 777], pa.int64()),
            "tags_text": pa.array(["a=b", "building=yes", "", "x=y"]),
            "lon": pa.array([0.0] * 4), "lat": pa.array([0.0] * 4),
            "muni_id": pa.array([1] * 4, pa.int64()),
        })
        pq.write_table(t, str(tmp_path / "osm_addresses.parquet"))
        rels = pa.table({"rel_id": pa.array([9], pa.int64()),
                         "name": pa.array(["Schulstraße"])})
        pq.write_table(rels, str(tmp_path / "osm_relations.parquet"))

        df = assoc_street_fix(str(tmp_path)).to_pandas()
        # osm 1 has a street (skip), osm 3 has no relation (skip),
        # osm 4's relation is unknown (skip) -> only osm 2 fixed
        assert list(df["osm_id"]) == [2]
        assert df["street_fixed"].iloc[0] == "Schulstraße"
        assert df["tags_fixed"].iloc[0] == (
            "building=yes;addr:street=Schulstraße;" + MARKER_TAG)


class TestKringAndZonal:
    def test_kring_window_sums(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_kring

        df = tile_kring(crafted_world).to_pandas().set_index(["ix", "iy"])
        # occupied cells only
        assert len(df) == 6
        # 3x3 window of (100,100): self 3 + (101,100) 3 + (100,101) 2
        # + (101,101) 3 = 11
        assert df.loc[(100, 100)]["ring3_points"] == 11
        assert df.loc[(100, 100)]["n_points"] == 3
        # isolated cell: window holds only itself
        assert df.loc[(300, 300)]["ring3_points"] == 5

    def test_kde_binomial_window(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_kde

        df = tile_kde(crafted_world).to_pandas().set_index(["ix", "iy"])
        # occupied cells only
        assert len(df) == 6
        # (100,100): self 3*36 + (101,100) 3*w(1)w(0)=3*24 + (101,101)
        # 3*16 + (100,101) 2*24 + (102,101) 1*w(2)w(1)=1*4 = 280
        assert df.loc[(100, 100)]["kde_num"] == 280
        assert df.loc[(100, 100)]["kde"] == 280 / 256.0
        assert df.loc[(100, 100)]["n_points"] == 3
        # isolated cell: only its own 5*36
        assert df.loc[(300, 300)]["kde_num"] == 180

    def test_zonal_rollup(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_zonal_stats

        df = tile_zonal_stats(crafted_world).to_pandas().set_index("muni_id")
        # zone 1: 5 occupied cells (3+3+3+2+1 = 12 points), zone 2: 1 cell
        assert df.loc[1]["n_cells"] == 5
        assert df.loc[1]["n_points"] == 12
        assert df.loc[1]["max_cell_points"] == 3
        assert df.loc[2]["n_cells"] == 1 and df.loc[2]["n_points"] == 5


class TestPolyfill:
    def test_l_shape_excludes_notch(self, ray_session, tmp_path):
        """The engine runs true even-odd PIP over the WKB rings — an
        L-shaped polygon must exclude the notch cells a bbox test keeps."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.geo.wkb import polygon_wkb
        from housenumbercore_ray.pipelines.tiles import TILE_RES_DEG, tile_polyfill

        r = TILE_RES_DEG
        # L covering a 2x2-cell bbox minus the top-right cell
        x0, y0 = -180.0 + 1000 * r, -90.0 + 1000 * r
        ring = [(x0, y0), (x0 + 2 * r, y0), (x0 + 2 * r, y0 + r),
                (x0 + r, y0 + r), (x0 + r, y0 + 2 * r), (x0, y0 + 2 * r)]
        t = pa.table({
            "muni_id": pa.array([7], pa.int64()),
            "sub_id": pa.array(["-1"]),
            "polygon_wkb": pa.array([polygon_wkb(ring)], pa.binary()),
        })
        pq.write_table(t, tmp_path / "boundaries.parquet")
        df = tile_polyfill(str(tmp_path)).to_pandas()
        got = set(zip(df["ix"], df["iy"]))
        assert got == {(1000, 1000), (1001, 1000), (1000, 1001)}
        assert (df["muni_id"] == 7).all()
        import numpy as np

        expect_cell = (df["ix"].to_numpy(np.int64) << 22) | df["iy"].to_numpy(np.int64)
        assert (df["cell"].to_numpy(np.int64) == expect_cell).all()

    def test_matches_oracle_on_world(self, ray_session):
        import duckdb

        from housenumbercore_ray.pipelines.oracle import tiles_sql
        from housenumbercore_ray.pipelines.tiles import tile_polyfill
        from housenumbercore_ray.sources.worldgen import ensure_world

        wd = ensure_world("/root/testdata/sf0.001")
        eng = (tile_polyfill(wd).to_pandas()
               .sort_values(["muni_id", "ix", "iy"]).reset_index(drop=True))
        ora = (duckdb.connect().execute(tiles_sql(wd)["geo_tile_polyfill"]).df()
               .sort_values(["muni_id", "ix", "iy"]).reset_index(drop=True)
               .astype({"muni_id": "int64", "ix": "int64",
                        "iy": "int64", "cell": "int64"}))
        import pandas as pd

        pd.testing.assert_frame_equal(eng, ora)
        # multipolygon parent (muni 2) fully covered despite two parts
        assert (eng["muni_id"] == 2).sum() == (eng["muni_id"] == 1).sum() > 0


class TestQuadkey:
    def test_morton_roundtrip_and_order(self):
        """Morton interleave is invertible bit-exactly and the base-4
        digits of the code read MSB-first ARE the Bing quadkey digits."""
        from housenumbercore_ray.pipelines.tiles import _morton

        rng = np.random.RandomState(7)
        ix = rng.randint(0, 1 << 22, 500).astype(np.int64)
        iy = rng.randint(0, 1 << 22, 500).astype(np.int64)
        m = _morton(ix, iy)
        # de-interleave by per-bit reconstruction
        rix = np.zeros_like(ix)
        riy = np.zeros_like(iy)
        for k in range(22):
            rix |= ((m >> (2 * k)) & 1) << k
            riy |= ((m >> (2 * k + 1)) & 1) << k
        assert (rix == ix).all() and (riy == iy).all()

    def test_quadkey_prefix_is_parent(self, ray_session, crafted_world):
        """Every quadkey PREFIX identifies the containing coarser tile:
        two cells share a parent at zoom-above-z iff their first 22-z
        digits match; parent_z8 equals the interleave of (ix>>8, iy>>8)."""
        from housenumbercore_ray.pipelines.tiles import _morton, tile_quadkey

        df = tile_quadkey(crafted_world).to_pandas()
        # one row per occupied cell (6 distinct cells in the fixture)
        assert len(df) == 6
        assert df["cell"].is_unique
        assert (df["quadkey"].str.len() == 22).all()
        ix = df["ix"].to_numpy(np.int64)
        iy = df["iy"].to_numpy(np.int64)
        assert (df["parent_z8"].to_numpy() == _morton(ix >> 8, iy >> 8, bits=14)).all()
        # prefix-containment: truncate to 14 digits == quadkey of z8 parent
        pk = df["quadkey"].str[:14].to_numpy()
        want = []
        for a, b in zip(ix >> 8, iy >> 8):
            digs = [str(((a >> (13 - k)) & 1) + 2 * ((b >> (13 - k)) & 1))
                    for k in range(14)]
            want.append("".join(digs))
        assert (pk == np.array(want)).all()


class TestLineTrace:
    def test_supercover_known_cells_and_parity(self, ray_session, tmp_path):
        """Diagonal / vertical / horizontal segments produce exactly the
        cells the line passes through (supercover), cells form a connected
        path, and the SQL oracle replays bit-exactly."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.geo.wkb import linestring_wkb
        from housenumbercore_ray.pipelines import geometry_oracle as go
        from housenumbercore_ray.pipelines.tiles import TILE_RES_DEG, tile_line_cells

        res = TILE_RES_DEG
        # grid origin shorthand: cell (ix, iy) covers
        # [ix*res-180, (ix+1)*res-180) x [iy*res-90, (iy+1)*res-90)
        def pt(gx, gy):
            return (gx * res - 180.0, gy * res - 90.0)

        tbl = pa.table({
            "osm_id": pa.array([1, 2, 3], type=pa.int64()),
            "linestring_wkb": pa.array([
                # diagonal through cell interiors: (10.2,10.2) -> (12.8,11.8)
                linestring_wkb([pt(10.2, 10.2), pt(12.8, 11.8)]),
                # vertical: same column, 3 rows
                linestring_wkb([pt(20.5, 20.1), pt(20.5, 22.9)]),
                # horizontal: same row, 3 columns
                linestring_wkb([pt(30.1, 30.5), pt(32.9, 30.5)]),
            ], type=pa.binary()),
        })
        wd = str(tmp_path)
        pq.write_table(tbl, f"{wd}/osm_streets.parquet")

        eng = (tile_line_cells(wd).to_pandas()
               .sort_values(["osm_id", "ix", "iy"]).reset_index(drop=True))
        got = {oid: set(zip(g["ix"], g["iy"]))
               for oid, g in eng.groupby("osm_id")}
        # diagonal: slope (1.6/2.6); crosses x=11 at y≈10.69 (row 10),
        # x=12 at y≈11.31 (row 11) → column 11 spans rows 10-11
        assert got[1] == {(10, 10), (11, 10), (11, 11), (12, 11)}
        assert got[2] == {(20, 20), (20, 21), (20, 22)}
        assert got[3] == {(30, 30), (31, 30), (32, 30)}
        # 4-connectivity of each trace (supercover property)
        for cells in got.values():
            for c in cells:
                if len(cells) > 1:
                    assert any((abs(c[0]-d[0]) + abs(c[1]-d[1])) == 1
                               for d in cells if d != c)

        ora = (duckdb.sql(go.line_cells_sql(wd)).df()
               .sort_values(["osm_id", "ix", "iy"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)


class TestMoran:
    def test_checkerboard_negative_uniform_cluster_positive(self, ray_session, tmp_path):
        """Moran's I sanity on crafted rasters: a checkerboard of high/low
        counts is strongly NEGATIVE (dispersed); two compact blobs of
        high counts amid low background are POSITIVE (clustered)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.tiles import TILE_RES_DEG, tile_moran

        res = TILE_RES_DEG

        def world(points, d):
            lon = [p[0] for p in points]
            lat = [p[1] for p in points]
            t = pa.table({
                "osm_id": pa.array(range(len(points)), pa.int64()),
                "addr_street": pa.array(["s"] * len(points)),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            })
            pq.write_table(t, f"{d}/osm_addresses.parquet")
            return str(d)

        def cell_pts(ix, iy, n):
            lon = (ix + 0.5) * res - 180.0
            lat = (iy + 0.5) * res - 90.0
            return [(lon + 1e-6 * i, lat) for i in range(n)]

        # checkerboard 6x6: parity-high (5 points) / parity-low (1 point)
        pts = []
        for ix in range(6):
            for iy in range(6):
                pts += cell_pts(100 + ix, 100 + iy, 5 if (ix + iy) % 2 else 1)
        d1 = tmp_path / "checker"; d1.mkdir()
        df1 = tile_moran(world(pts, d1)).to_pandas()
        # queen weights dilute the rook anti-correlation (diagonals share
        # parity), so the checkerboard is mildly negative, not -1
        assert df1.loc[0, "moran_i"] < 0.0

        # clustered: 3x3 blob of 5s in a 6x6 field of 1s
        pts = []
        for ix in range(6):
            for iy in range(6):
                hot = ix < 3 and iy < 3
                pts += cell_pts(200 + ix, 200 + iy, 5 if hot else 1)
        d2 = tmp_path / "blob"; d2.mkdir()
        df2 = tile_moran(world(pts, d2)).to_pandas()
        assert df2.loc[0, "moran_i"] > 0.3
        # integer sufficient stats are exact
        assert df2.loc[0, "n_cells"] == 36
        assert df2.loc[0, "sum_x"] == 9 * 5 + 27 * 1


class TestHotspots:
    def test_blob_center_is_hotspot(self, ray_session, tmp_path):
        """The center of a dense blob gets the highest Gi* and a hotspot
        flag; far-field background cells do not."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.tiles import TILE_RES_DEG, tile_hotspots

        res = TILE_RES_DEG
        pts = []
        def cell_pts(ix, iy, n):
            lon = (ix + 0.5) * res - 180.0
            lat = (iy + 0.5) * res - 90.0
            return [(lon + 1e-6 * i, lat) for i in range(n)]
        # 10x10 field of 1s with a 3x3 blob of 20s at (304..306, 304..306)
        for ix in range(300, 310):
            for iy in range(300, 310):
                hot = 304 <= ix <= 306 and 304 <= iy <= 306
                pts += cell_pts(ix, iy, 20 if hot else 1)
        t = pa.table({
            "osm_id": pa.array(range(len(pts)), pa.int64()),
            "addr_street": pa.array(["s"] * len(pts)),
            "lon": pa.array([p[0] for p in pts], pa.float64()),
            "lat": pa.array([p[1] for p in pts], pa.float64()),
        })
        pq.write_table(t, f"{tmp_path}/osm_addresses.parquet")
        df = tile_hotspots(str(tmp_path)).to_pandas().set_index(["ix", "iy"])
        assert df.loc[(305, 305), "hotspot"] == 1
        assert df["gi_z"].idxmax() == (305, 305)
        assert df.loc[(305, 305), "ring3_x"] == 9 * 20
        assert df.loc[(300, 300), "hotspot"] == 0
        assert df.loc[(300, 300), "w_in"] == 4  # corner window


class TestBfsDistance:
    def test_corridor_cap_island_and_diagonal(self, ray_session, tmp_path):
        """BFS distance transform on a crafted raster: a hot source at the
        head of a 1-cell-wide corridor yields hop distances 1,2,...; cells
        past the round cap report -1; a disconnected occupied island is -1;
        a diagonal-only neighbor is NOT reachable (4-connectivity)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.tiles import (
            BFS_MAX_ROUNDS, TILE_RES_DEG, tile_bfs_distance)

        res = TILE_RES_DEG
        pts = []
        def cell_pts(ix, iy, n):
            lon = (ix + 0.5) * res - 180.0
            lat = (iy + 0.5) * res - 90.0
            return [(lon + 1e-6 * i, lat) for i in range(n)]
        pts += cell_pts(100, 100, 5)            # hot source (>= 3 points)
        for k in range(1, BFS_MAX_ROUNDS + 3):  # corridor beyond the cap
            pts += cell_pts(100 + k, 100, 1)
        pts += cell_pts(99, 99, 1)              # diagonal-only neighbor
        pts += cell_pts(200, 200, 1)            # disconnected island
        t = pa.table({
            "osm_id": pa.array(range(len(pts)), pa.int64()),
            "addr_street": pa.array(["s"] * len(pts)),
            "lon": pa.array([p[0] for p in pts], pa.float64()),
            "lat": pa.array([p[1] for p in pts], pa.float64()),
        })
        pq.write_table(t, f"{tmp_path}/osm_addresses.parquet")
        df = (tile_bfs_distance(str(tmp_path)).to_pandas()
              .set_index(["ix", "iy"]))
        assert df.loc[(100, 100), "dist"] == 0
        for k in range(1, BFS_MAX_ROUNDS + 1):
            assert df.loc[(100 + k, 100), "dist"] == k
        for k in range(BFS_MAX_ROUNDS + 1, BFS_MAX_ROUNDS + 3):
            assert df.loc[(100 + k, 100), "dist"] == -1
        assert df.loc[(99, 99), "dist"] == -1
        assert df.loc[(200, 200), "dist"] == -1
        assert (df["n_points"] >= 1).all()


class TestHexBin:
    def test_axial_round_trip_and_disk(self, ray_session, tmp_path):
        """hex_axial maps hex centers back to their (q, r); hex_kring's
        7-hex disk sums self + the 6 axial neighbors (and nothing else)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.tiles import (
            HEX_DIRS, HEX_SIZE_DEG, hex_axial, hex_bin, hex_kring)

        s = HEX_SIZE_DEG
        sq3 = 3.0 ** 0.5

        def center(q, r):  # flat-top axial -> lon/lat of the hex center
            return s * 1.5 * q, s * (sq3 / 2.0 * q + sq3 * r)

        qs = np.array([0, 5, -7, 100, -100], np.int64)
        rs = np.array([0, -3, 11, -50, 50], np.int64)
        lon, lat = zip(*(center(q, r) for q, r in zip(qs, rs)))
        hq, hr = hex_axial(np.array(lon), np.array(lat))
        assert (hq == qs).all() and (hr == rs).all()

        # disk fixture: 5 points at hex (10, 10), 1 in each neighbor,
        # 1 in a far hex
        pts = []
        cx, cy = center(10, 10)
        pts += [(cx + 1e-9 * i, cy) for i in range(5)]
        for dq, dr in HEX_DIRS:
            pts.append(center(10 + dq, 10 + dr))
        pts.append(center(40, 40))
        t = pa.table({
            "osm_id": pa.array(range(len(pts)), pa.int64()),
            "addr_street": pa.array(["s"] * len(pts)),
            "lon": pa.array([p[0] for p in pts], pa.float64()),
            "lat": pa.array([p[1] for p in pts], pa.float64()),
        })
        pq.write_table(t, f"{tmp_path}/osm_addresses.parquet")
        binned = hex_bin(str(tmp_path)).to_pandas().set_index(["hq", "hr"])
        assert binned.loc[(10, 10), "n_points"] == 5
        assert binned.loc[(40, 40), "n_points"] == 1
        assert len(binned) == 8
        disk = hex_kring(str(tmp_path)).to_pandas().set_index(["hq", "hr"])
        assert disk.loc[(10, 10), "n_points"] == 5
        assert disk.loc[(10, 10), "disk_points"] == 11
        assert disk.loc[(40, 40), "disk_points"] == 1
        # a neighbor's disk: itself + center(5) + the two adjacent dirs
        assert disk.loc[(11, 10), "disk_points"] == 1 + 5 + 2


class TestContour:
    def test_isolated_hot_cell_yields_diamond(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_contour

        df = tile_contour(crafted_world).to_pandas()
        # the isolated hot cell (300,300; 5 points, empty neighbors)
        # crosses the iso-line in exactly the 4 squares it corners
        iso = df[(df.sq_ix.between(299, 300)) & (df.sq_iy.between(299, 300))]
        assert len(iso) == 4
        got = {(r.sq_ix, r.sq_iy): (r.mscase, r.edge_a, r.t_a, r.edge_b, r.t_b)
               for r in iso.itertuples()}
        # t = (2.5-0)/(5-0) or (2.5-5)/(0-5) = 0.5 on every crossing edge
        assert got[(300, 300)] == (1, 3, 0.5, 0, 0.5)
        assert got[(299, 300)] == (2, 0, 0.5, 1, 0.5)
        assert got[(299, 299)] == (4, 1, 0.5, 2, 0.5)
        assert got[(300, 299)] == (8, 2, 0.5, 3, 0.5)

    def test_l_shape_interpolation(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_contour

        df = tile_contour(crafted_world).to_pandas().set_index(["sq_ix", "sq_iy"])
        # sq(100,100): corners 3,3,3 hot + c3=cell(100,101)=2 cold → case 7
        r = df.loc[(100, 100)]
        assert (r.mscase, r.edge_a, r.edge_b) == (7, 3, 2)
        assert r.t_a == (2.5 - 2.0) / (3.0 - 2.0)   # e3: c3(2)→c0(3)
        assert r.t_b == (2.5 - 3.0) / (2.0 - 3.0)   # e2: c2(3)→c3(2)
        # sq(101,100): c0=3 hot, c3=3 hot, c1 empty, c2=cell(102,101)=1 → case 9
        r = df.loc[(101, 100)]
        assert (r.mscase, r.edge_a, r.edge_b) == (9, 2, 0)
        assert r.t_a == (2.5 - 1.0) / (3.0 - 1.0)   # e2: c2(1)→c3(3)
        assert r.t_b == (2.5 - 3.0) / (0.0 - 3.0)   # e0: c0(3)→c1(0)

    def test_saddle_fixed_choice(self, ray_session, tmp_path):
        """Diagonal hot pair → case 5 square emits the fixed two-segment
        below-center resolution (no center disambiguation)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.tiles import TILE_RES_DEG, tile_contour

        res = TILE_RES_DEG
        pts = []
        for ix, iy in [(200, 200), (201, 201)]:
            lon = (ix + 0.5) * res - 180.0
            lat = (iy + 0.5) * res - 90.0
            pts += [(lon + 1e-5 * i, lat) for i in range(3)]
        t = pa.table({
            "osm_id": pa.array(range(len(pts)), pa.int64()),
            "addr_street": pa.array(["s"] * len(pts)),
            "lon": pa.array([p[0] for p in pts], pa.float64()),
            "lat": pa.array([p[1] for p in pts], pa.float64()),
        })
        pq.write_table(t, f"{tmp_path}/osm_addresses.parquet")
        df = tile_contour(str(tmp_path)).to_pandas()
        sad = df[(df.sq_ix == 200) & (df.sq_iy == 200)].sort_values("seg")
        assert list(sad.mscase) == [5, 5]
        assert [(r.edge_a, r.edge_b) for r in sad.itertuples()] == [(3, 0), (1, 2)]
        # every crossing edge here runs 0↔3 → t = 2.5/3 or 1/6 depending
        # on direction; case-5 square: e3 c3(0)→c0(3), e0 c0(3)→c1(0),
        # e1 c1(0)→c2(3), e2 c2(3)→c3(0)
        r0, r1 = sad.itertuples()
        assert r0.t_a == 2.5 / 3.0 and r0.t_b == (2.5 - 3.0) / (0.0 - 3.0)
        assert r1.t_a == 2.5 / 3.0 and r1.t_b == (2.5 - 3.0) / (0.0 - 3.0)


class TestIdw:
    def test_isolated_cell_window(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_idw

        df = tile_idw(crafted_world).to_pandas()
        win = df[(df.ix.between(298, 302)) & (df.iy.between(298, 302))]
        # the isolated hot cell (300,300; 5 pts) fills its 24 ring cells
        assert len(win) == 24
        w = win.set_index(["ix", "iy"])
        # direct neighbor: d²=1 → num=5·40, den=40, idw=5
        assert w.loc[(301, 300)]["idw_num"] == 200
        assert w.loc[(301, 300)]["idw_den"] == 40
        assert w.loc[(301, 300)]["idw"] == 5.0
        # diagonal: d²=2 → w=20; knight: d²=5 → w=8; corner: d²=8 → w=5
        assert w.loc[(301, 301)]["idw_den"] == 20
        assert w.loc[(302, 301)]["idw_den"] == 8
        assert w.loc[(302, 302)]["idw_den"] == 5
        assert (win["idw"] == 5.0).all()  # single source → estimate = its value

    def test_occupied_cells_excluded_and_blend(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_idw

        df = tile_idw(crafted_world).to_pandas().set_index(["ix", "iy"])
        # occupied cells never appear
        for c in [(100, 100), (101, 100), (101, 101), (100, 101), (102, 101), (300, 300)]:
            assert c not in df.index
        # (100, 102): sources within the 5x5 window — (100,100) n=3 d²=4,
        # (101,100) n=3 d²=5, (101,101) n=3 d²=1... wait d²=(1²+1²)=2? no:
        # target (100,102): (101,101) → d²=1+1=2 w=20; (100,101) → d²=1 w=40;
        # (101,100) → d²=1+4=5 w=8; (100,100) → d²=4 w=10; (102,101) → d²=4+1=5 w=8
        r = df.loc[(100, 102)]
        num = 20 * 3 + 40 * 2 + 8 * 3 + 10 * 3 + 8 * 1
        den = 20 + 40 + 8 + 10 + 8
        assert r["idw_num"] == num and r["idw_den"] == den
        assert r["idw"] == num / den


class TestSlope:
    def test_isolated_cell_gradient_points_inward(self, ray_session, crafted_world):
        from housenumbercore_ray.pipelines.tiles import tile_slope

        df = tile_slope(crafted_world).to_pandas().set_index(["ix", "iy"])
        # only occupied cells appear
        assert (300, 300) in df.index
        r = df.loc[(300, 300)]
        # symmetric isolated peak: zero gradient at the peak itself
        assert r["gx"] == 0 and r["gy"] == 0 and r["g2"] == 0 and r["grad"] == 0.0
        assert r["n_points"] == 5

    def test_l_shape_sobel_values(self, ray_session, crafted_world):
        import numpy as np

        from housenumbercore_ray.pipelines.tiles import tile_slope

        df = tile_slope(crafted_world).to_pandas().set_index(["ix", "iy"])
        # raster: (100,100)=3 (101,100)=3 (101,101)=3 (100,101)=2 (102,101)=1
        # Gx at (100,100): +1·n(101,101) +2·n(101,100) -1·n(100,101)... careful:
        # Gx(t) = Σ u·(2-|v|)·n(t+(u,v)):
        #   (1,0)→2·3=6, (1,1)→1·3=3, (-0/-1 col: u=-1 all empty), (0,±1) w=0
        #   plus (1,-1): empty → Gx=9
        # Gy(t) = Σ v·(2-|u|)·n: (0,1)→2·2=4, (1,1)→1·3=3 → Gy=7
        r = df.loc[(100, 100)]
        assert r["gx"] == 9 and r["gy"] == 7
        assert r["g2"] == 81 + 49
        assert r["grad"] == np.sqrt(130.0)


def test_morton_ranges_cover_rectangle_exactly():
    """SFC covering invariant: the decoded union of the morton ranges is
    EXACTLY the rectangle's cell set (coverage + nothing extra), ranges
    are sorted, disjoint and non-adjacent (maximally coalesced)."""
    import numpy as np

    from housenumbercore_ray.pipelines.tiles import _morton, morton_ranges

    rng = np.random.RandomState(7)
    for _ in range(25):
        x0 = int(rng.randint(0, 500)); x1 = x0 + int(rng.randint(0, 60))
        y0 = int(rng.randint(0, 500)); y1 = y0 + int(rng.randint(0, 60))
        starts, ends = morton_ranges(x0, x1, y0, y1)
        assert (starts[1:] > ends[:-1] + 1).all()  # sorted, coalesced
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        codes = np.sort(_morton(xs.ravel(), ys.ravel()))
        # total size matches and every cell code lands inside a range
        assert (ends - starts + 1).sum() == codes.size
        pos = np.searchsorted(starts, codes, side="right") - 1
        assert (pos >= 0).all() and (codes <= ends[pos]).all()


def test_clip_ring_rect_general_polygon():
    """The SH clip is exercised on a NON-rectangular subject (the oracle
    only sees rectangles): a triangle clipped to a unit square, area
    checked against the analytic value, plus containment/idempotence."""
    import numpy as np

    from housenumbercore_ray.pipelines.tiles import (_clip_ring_rect,
                                                     _shoelace_local)

    tri = np.array([[-1.0, 0.0], [2.0, 0.0], [0.5, 3.0], [-1.0, 0.0]])
    cp = _clip_ring_rect(tri, 0.0, 1.0, 0.0, 1.0)
    assert (cp[:, 0] >= 0).all() and (cp[:, 0] <= 1).all()
    assert (cp[:, 1] >= 0).all() and (cp[:, 1] <= 1).all()
    # analytic: triangle covers the square's lower band minus two corner
    # cuts; brute-force via fine sampling to 3 decimals
    xs, ys = np.meshgrid(np.linspace(0.0005, 0.9995, 1000),
                         np.linspace(0.0005, 0.9995, 1000))
    # inside test for the triangle via barycentric sign checks
    def side(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    s1 = side(-1, 0, 2, 0, xs, ys)
    s2 = side(2, 0, 0.5, 3, xs, ys)
    s3 = side(0.5, 3, -1, 0, xs, ys)
    inside = ((s1 >= 0) & (s2 >= 0) & (s3 >= 0))
    approx = inside.mean()
    area = _shoelace_local(cp, 0.0, 0.0)
    assert abs(area - approx) < 2e-3
    # clipping the already-clipped polygon is a fixpoint
    cp2 = _clip_ring_rect(np.vstack([cp, cp[:1]]), 0.0, 1.0, 0.0, 1.0)
    assert abs(_shoelace_local(cp2, 0.0, 0.0) - area) < 1e-12


def test_tile_coverage_conserves_polygon_area(ray_session):
    """Σ (frac · tile_box) over a polygon's tiles equals its shoelace
    area (deg²), and fully-interior tiles have frac exactly 1.0."""
    import numpy as np

    import housenumbercore_ray.sources.worldgen as wg
    from housenumbercore_ray.pipelines.geometry import muni_area
    from housenumbercore_ray.pipelines.tiles import TILE_RES_DEG, tile_coverage

    wd = wg.ensure_world("/root/testdata/sf0.001")
    cov = tile_coverage(wd).to_pandas()
    area = muni_area(wd).to_pandas()
    res = TILE_RES_DEG
    box = ((cov["ix"] + 1) * res - 180.0 - (cov["ix"] * res - 180.0)) \
        * ((cov["iy"] + 1) * res - 90.0 - (cov["iy"] * res - 90.0))
    got = (cov["frac"] * box).groupby(cov["area_id"]).sum()
    want = area.set_index("area_id")["area_deg2"]
    for aid, v in got.items():
        assert abs(v - want.loc[aid]) < 1e-7, aid
    assert (cov["frac"] == 1.0).sum() > 0
    assert (cov["frac"] <= 1.0).all() and (cov["frac"] > 0).all()
