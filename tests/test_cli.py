"""``python -m housenumbercore_ray`` job-submit entrypoint.

Reference analog: the batch runner the cron deployment submits
(reference src/de/regioosm/housenumbercore/MunicipalityJobs.java:1-120);
here a Ray job entrypoint over the single queries() registry.
"""

import json
import os

import pyarrow.parquet as pq

from housenumbercore_ray.__main__ import main

SF = "/root/testdata/sf0.001"


class TestCli:
    def test_list_names_registry(self, ray_session, capsys):
        assert main(["--list"]) == 0
        names = capsys.readouterr().out.split()
        assert "hnr_evaluation" in names and "dedup_exact" in names
        assert len(names) >= 100

    def test_count_only(self, ray_session, capsys):
        assert main(["rel_distinct_segments", "--sf-dir", SF]) == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["query"] == "rel_distinct_segments" and rec["rows"] > 0

    def test_dataset_written_partitioned(self, ray_session, capsys, tmp_path):
        out = str(tmp_path / "seg")
        assert main(["rel_distinct_segments", "--sf-dir", SF,
                     "--out", out]) == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files, "expected partitioned parquet output"
        n = sum(pq.read_metadata(os.path.join(out, f)).num_rows for f in files)
        assert n == rec["rows"] > 0

    def test_small_result_written(self, ray_session, capsys, tmp_path):
        out = str(tmp_path / "q")
        assert main(["rel_price_quantiles", "--sf-dir", SF,
                     "--out", out]) == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        t = pq.read_table(os.path.join(out, "part-0.parquet"))
        assert t.num_rows == rec["rows"] == 3
