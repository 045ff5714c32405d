import numpy as np
import pandas as pd
import pytest

from housenumbercore_ray.geo.proj import transform_to_wgs84, utm_to_wgs84, wgs84_to_utm
from housenumbercore_ray.geo.wkb import parse_wkb, polygon_wkb
from housenumbercore_ray.stages.boundaries import pick_best_relation, snapshot_diff, union_parts


class TestPickBestRelation:
    def _cands(self, rows):
        return pd.DataFrame(rows, columns=["relation_id", "name", "official_key_raw", "part"])

    def test_first_usable_wins_by_default(self):
        c = self._cands([("r1", "Astadt", "0315", b"p1"), ("r2", "Bstadt", "0315", b"p2")])
        rid, parts = pick_best_relation(c, "Cstadt")
        assert rid == "r1" and parts["part"].tolist() == [b"p1"]

    def test_longer_key_replaces(self):
        # TheoreticalHousenumbers.java:433-444
        c = self._cands([("r1", "Astadt", "0315", b"p1"), ("r2", "Bstadt", "03152012", b"p2")])
        rid, _ = pick_best_relation(c, "X")
        assert rid == "r2"

    def test_equal_length_exact_name_replaces(self):
        # :445-451
        c = self._cands([("r1", "Astadt", "0315", b"p1"), ("r2", "Wanted", "0315", b"p2")])
        assert pick_best_relation(c, "Wanted")[0] == "r2"
        assert pick_best_relation(c, "Other")[0] == "r1"

    def test_spaced_key_length_uses_stripped(self):
        c = self._cands([("r1", "A", "03 1 52 012", b"p1"), ("r2", "B", "0315201", b"p2")])
        assert pick_best_relation(c, "X")[0] == "r1"  # stripped len 8 > 7

    def test_multi_part_winner_keeps_all_parts(self):
        c = self._cands([("r1", "A", "03152012", b"p1"), ("r1", "A", "03152012", b"p2")])
        rid, parts = pick_best_relation(c, "A")
        assert rid == "r1" and len(parts) == 2

    def test_empty(self):
        rid, parts = pick_best_relation(self._cands([]), "X")
        assert rid == "" and len(parts) == 0


class TestUnionParts:
    def test_assembles_multipolygon(self):
        a = polygon_wkb([(0, 0), (1, 0), (1, 1), (0, 1)])
        b = polygon_wkb([(1, 0), (2, 0), (2, 1), (1, 1)])
        kind, polys = parse_wkb(union_parts([a, b]))
        assert kind == "multipolygon" and len(polys) == 2


class TestSnapshotDiff:
    OLD = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    NEW = pd.DataFrame({"k": ["b", "c", "d"], "v": [2, 99, 4]})

    def test_classification(self):
        d = snapshot_diff(self.OLD, self.NEW, ["k"]).set_index("k")
        assert d.loc["a", "change"] == "delete"
        assert d.loc["b", "change"] == "unchanged"
        assert d.loc["c", "change"] == "update"
        assert d.loc["d", "change"] == "insert"

    def test_payload_sides(self):
        d = snapshot_diff(self.OLD, self.NEW, ["k"]).set_index("k")
        assert d.loc["a", "v"] == 1      # delete keeps old payload
        assert d.loc["c", "v"] == 99     # update carries new payload

    def test_nan_equality(self):
        old = pd.DataFrame({"k": ["a"], "v": [np.nan]})
        new = pd.DataFrame({"k": ["a"], "v": [np.nan]})
        assert snapshot_diff(old, new, ["k"])["change"].iloc[0] == "unchanged"


class TestProjection:
    def test_central_meridian_identity(self):
        # on the central meridian of zone 32 (9°E), easting is exactly 500000
        e, n = wgs84_to_utm([9.0], [50.0])
        assert e[0] == pytest.approx(500000.0, abs=1e-6)
        lon, lat = utm_to_wgs84(e, n)
        assert lon[0] == pytest.approx(9.0, abs=1e-7)
        assert lat[0] == pytest.approx(50.0, abs=1e-7)

    def test_roundtrip_grid(self):
        lons = np.linspace(6.5, 11.5, 11)
        lats = np.linspace(47.5, 54.5, 11)
        glon, glat = np.meshgrid(lons, lats)
        e, n = wgs84_to_utm(glon.ravel(), glat.ravel())
        lon2, lat2 = utm_to_wgs84(e, n)
        assert np.abs(lon2 - glon.ravel()).max() < 1e-7
        assert np.abs(lat2 - glat.ravel()).max() < 1e-7

    def test_known_anchor(self):
        # Cologne cathedral vicinity: ~(6.958°E, 50.941°N) ↔ zone-32 UTM
        e, n = wgs84_to_utm([6.958], [50.941])
        assert 300000 < e[0] < 360000
        assert 5_640_000 < n[0] < 5_650_000

    def test_transform_entry(self):
        lon, lat = transform_to_wgs84([500000.0], [5538630.0], "25832")
        assert lon[0] == pytest.approx(9.0, abs=1e-6)
        # zone-prefixed false easting tolerated
        lon2, _ = transform_to_wgs84([32_500_000.0], [5538630.0], "25832")
        assert lon2[0] == pytest.approx(9.0, abs=1e-6)
        with pytest.raises(ValueError):
            transform_to_wgs84([1.0], [2.0], "31467")
        id_lon, id_lat = transform_to_wgs84([10.5], [50.5], "4326")
        assert id_lon[0] == 10.5 and id_lat[0] == 50.5
