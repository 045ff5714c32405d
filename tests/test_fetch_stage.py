"""Fetch-stage contract tests (S5/S6 shape) — retry/backoff/gzip/validation/
raw-persistence/resume against a mock transport; no network.

Reference discipline under test: MunicipalityJobs.java:385-633 (3 retries,
linear 2*n backoff, gzip decode, XML-header validation, raw persistence,
osm_base extraction) and HousenumberListDownload.java:38-301 (arbitrary
content, validation off).
"""

import functools
import gzip

import pyarrow as pa
import pytest

from housenumbercore_ray.sources.fetch import (
    FetchStage,
    MockTransport,
    Response,
    build_overpass_query,
    build_overpass_url,
    extract_osm_base,
)

XML_OK = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n'
    b'<osm version="0.6" generator="Overpass API">\n'
    b'<meta osm_base="2018-02-03T10:00:02Z"/>\n'
    b'<node id="1" lat="50.0" lon="7.0"/>\n'
    b"</osm>\n"
)


def make_stage(script, **kw):
    transport = MockTransport(script)
    stage = FetchStage(lambda: transport, sleep=kw.pop("sleep", lambda s: None), **kw)
    return stage, transport


class TestFetchDiscipline:
    def test_success_first_try(self):
        stage, t = make_stage({"u": [("ok", XML_OK, {})]})
        row = stage.fetch_one("r1", "u")
        assert row["ok"] and row["tries"] == 1 and row["body"] == XML_OK
        assert row["osm_base"] == "2018-02-03T10:00:02Z"
        assert t.calls == ["u"]

    def test_retry_then_success_linear_backoff(self):
        sleeps = []
        stage, t = make_stage(
            {"u": [("err", "boom"), ("err", "boom"), ("ok", XML_OK, {})]},
            sleep=sleeps.append,
        )
        row = stage.fetch_one("r1", "u")
        assert row["ok"] and row["tries"] == 3
        # MunicipalityJobs.java:436-441 — sleep 2*failed before each retry
        assert sleeps == [2.0, 4.0]
        assert len(t.calls) == 3

    def test_gives_up_after_max_tries(self):
        sleeps = []
        stage, t = make_stage({"u": [("err", "down")]}, sleep=sleeps.append)
        row = stage.fetch_one("r1", "u")
        assert not row["ok"] and row["body"] is None
        # 1 initial + 3 retries = 4 attempts, then give up (:390,470-477)
        assert row["tries"] == 4 and len(t.calls) == 4
        assert sleeps == [2.0, 4.0, 6.0]
        assert "gave up after 4 failed requests" in row["error"]

    def test_gzip_decode(self):
        stage, _ = make_stage(
            {"u": [("ok", gzip.compress(XML_OK), {"Content-Encoding": "gzip"})]}
        )
        row = stage.fetch_one("r1", "u")
        assert row["ok"] and row["body"] == XML_OK

    def test_non_xml_payload_discarded(self):
        stage, _ = make_stage({"u": [("ok", b"<html>rate limited</html>", {})]})
        row = stage.fetch_one("r1", "u")
        assert not row["ok"] and "xml header" in row["error"]

    def test_validation_off_for_list_downloads(self):
        csv = b"strasse;hausnummer\nHauptstr.;1\n"
        stage, _ = make_stage({"u": [("ok", csv, {})]}, validate_xml=False)
        row = stage.fetch_one("r1", "u")
        assert row["ok"] and row["body"] == csv and row["osm_base"] is None


class TestRawPersistenceResume:
    def test_persist_and_resume_skips_transport(self, tmp_path):
        raw = str(tmp_path / "overpassdownload")
        stage, t = make_stage({"u": [("ok", XML_OK, {})]}, raw_dir=raw)
        row = stage.fetch_one("r1", "u")
        assert row["ok"] and row["raw_path"] is not None
        with open(row["raw_path"], "rb") as f:
            assert f.read() == XML_OK

        # a fresh stage (new actor / restarted run) serves from disk
        stage2, t2 = make_stage({"u": [("err", "network is gone")]}, raw_dir=raw)
        row2 = stage2.fetch_one("r1", "u")
        assert row2["ok"] and row2["from_cache"] and row2["body"] == XML_OK
        assert t2.calls == []

    def test_failed_fetch_not_persisted(self, tmp_path):
        raw = str(tmp_path / "raw")
        stage, _ = make_stage({"u": [("err", "down")]}, raw_dir=raw)
        row = stage.fetch_one("r1", "u")
        assert not row["ok"]
        import os

        assert os.listdir(raw) == []

    def test_distinct_requests_distinct_files(self, tmp_path):
        raw = str(tmp_path / "raw")
        stage, _ = make_stage(
            {"a": [("ok", XML_OK, {})], "b": [("ok", XML_OK, {})]}, raw_dir=raw
        )
        ra = stage.fetch_one("r1", "a")
        rb = stage.fetch_one("r2", "b")
        assert ra["raw_path"] != rb["raw_path"]


class TestOverpassTemplate:
    def test_query_area_id_negated_relation(self):
        # reference stores relation polygon ids negated; area id is
        # 3600000000 + -1 * id (MunicipalityJobs.java:406)
        q = build_overpass_query(-62782)
        assert "area(3600062782)->.boundaryarea;" in q
        assert '["highway"]["name"]' in q and "out meta;" in q
        assert q.startswith("[timeout:3600][maxsize:1073741824]")

    def test_url_encoding_quirks(self):
        url = build_overpass_url("https://overpass.example/api/", build_overpass_query(-1))
        # parens kept literal, spaces as %20, never '+' (:418-421)
        assert "(" in url and ")" in url and "+" not in url
        assert "%20" not in build_overpass_query(-1)  # sanity: quirk is in the url only
        assert url.startswith("https://overpass.example/api/interpreter?data=")

    def test_extract_osm_base_missing(self):
        assert extract_osm_base("<osm><node id='1'/></osm>") is None


SCRIPT = {
    f"https://ex/{i}": [("ok", XML_OK, {})] for i in range(6)
}
SCRIPT["https://ex/3"] = [("err", "always down")]

# NOTE: the factory shipped into Ray actors must NOT be a def/lambda from
# this module — cloudpickle serializes module-level functions of an
# importable module BY REFERENCE, and Ray workers cannot import
# `test_fetch_stage` (it is only on the driver's sys.path), which makes the
# actor constructor fail on deserialization and the actor pool restart
# forever (observed as a suite hang). functools.partial of the LIBRARY
# class pickles the class by importable reference and the script dict by
# value, so it deserializes anywhere.
_factory = functools.partial(MockTransport, SCRIPT)


class TestRayIntegration:
    def test_map_batches_fetch(self, ray_session, tmp_path):
        import ray.data as rd

        reqs = pa.table({
            "request_id": [f"r{i}" for i in range(6)],
            "url": [f"https://ex/{i}" for i in range(6)],
        })
        out = (
            rd.from_arrow(reqs)
            .map_batches(
                FetchStage,
                fn_constructor_kwargs={
                    "transport_factory": _factory,
                    "sleep": float,  # no real sleeping in tests
                    "raw_dir": str(tmp_path / "raw"),
                },
                batch_format="pyarrow",
                batch_size=2,
                concurrency=2,
            )
            .to_pandas()
        )
        assert len(out) == 6
        ok = out.set_index("request_id")["ok"]
        assert not ok["r3"] and ok.drop("r3").all()
        assert (out.loc[out.ok, "body"].str.len() > 0).all()
