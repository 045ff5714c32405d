"""Job schedule registry (jobs table analog, dbstructure.sql:83-94)."""

from housenumbercore_ray.state.jobs import Job, JobRegistry, next_due_after


class TestSchedule:
    def test_next_due_weekly(self):
        # Mon 2026-08-10 12:00 → next Wed 03:00 is 2026-08-12
        assert next_due_after(["Wed 03:00:00"], "2026-08-10T12:00:00") == "2026-08-12T03:00:00"
        # already past this week's slot → next week
        assert next_due_after(["Mon 03:00:00"], "2026-08-10T12:00:00") == "2026-08-17T03:00:00"
        # numeric day-of-week (Monday=0)
        assert next_due_after(["2 03:00:00"], "2026-08-10T12:00:00") == "2026-08-12T03:00:00"
        # earliest of several entries wins
        assert next_due_after(["Fri 01:00:00", "Tue 05:30:00"],
                              "2026-08-10T12:00:00") == "2026-08-11T05:30:00"
        assert next_due_after([], "2026-08-10T12:00:00") is None

    def test_exact_hit_rolls_a_week(self):
        assert next_due_after(["Mon 12:00:00"], "2026-08-10T12:00:00") == "2026-08-17T12:00:00"


class TestRegistry:
    def test_upsert_due_and_persistence(self, tmp_path):
        p = str(tmp_path / "jobs.json")
        reg = JobRegistry(p)
        j1 = reg.generate_job("Grossmetropole", "Deutschland", 0, 1000,
                              "2026-08-10T00:00:00", schedule=["Mon 03:00:00"])
        j2 = reg.generate_job("Oberdorf", "Deutschland", 1, 1001,
                              "2026-08-10T00:00:00", schedule=["Wed 03:00:00"])
        # upsert: same area → same job id, refreshed name/checkedtime
        j1b = reg.generate_job("Grossmetropole (renamed)", "Deutschland", 0, 1000,
                               "2026-08-11T00:00:00")
        assert j1b.job_id == j1.job_id
        assert j1b.jobname == "Grossmetropole (renamed)"
        assert j1b.checkedtime == "2026-08-11T00:00:00"
        # due: j1 checked 08-11 → next Mon 03:00 = 08-17; j2 checked 08-10 →
        # next Wed 03:00 = 08-12
        due = reg.due_jobs("2026-08-13T00:00:00")
        assert [j.job_id for j in due] == [j2.job_id]
        due2 = reg.due_jobs("2026-08-17T04:00:00")
        assert {j.job_id for j in due2} == {j1.job_id, j2.job_id}
        reg.mark_checked(j2.job_id, "2026-08-13T00:00:00")
        assert [j.job_id for j in reg.due_jobs("2026-08-13T01:00:00")] == []
        # persistence round-trip
        reg2 = JobRegistry(p)
        assert {j.job_id for j in reg2.jobs.values()} == {j1.job_id, j2.job_id}
        assert reg2.jobs[j2.job_id].checkedtime == "2026-08-13T00:00:00"
        # lineage combination
        states = reg2.job_states({"00000"})
        assert states[j1.job_id] == "done" and states[j2.job_id] == "queued"


class TestJobsWithLineage:
    def test_jobs_flip_done_via_resumable_run(self, ray_session, tmp_path):
        """Jobs generated from the world's boundaries report 'done' exactly
        for municipalities whose partitions the resumable run committed."""
        import pyarrow.parquet as pq

        from housenumbercore_ray.pipelines.evaluation import run_join_rows_resumable
        from housenumbercore_ray.sources.worldgen import ensure_world
        from housenumbercore_ray.state.lineage import read_manifest

        wd = ensure_world("/root/testdata/sf0.001")
        b = pq.read_table(f"{wd}/boundaries.parquet",
                          columns=["muni_id", "sub_id", "name", "area_id"]).to_pandas()
        b = b[b["sub_id"] == "-1"]
        reg = JobRegistry(str(tmp_path / "jobs.json"))
        for r in b.itertuples():
            reg.generate_job(r.name, "Deutschland", int(r.muni_id), int(r.area_id),
                             "2026-08-01T00:00:00", schedule=["Mon 03:00:00"])
        out = str(tmp_path / "parts")
        res = run_join_rows_resumable(wd, out)
        done_parts = {row["part"] for row in read_manifest(out)}
        states = reg.job_states(done_parts)
        by_muni = {j.muni_id: states[j.job_id] for j in reg.jobs.values()}
        assert set(by_muni) == set(int(m) for m in b["muni_id"])
        assert all(v == "done" for v in by_muni.values()), by_muni
