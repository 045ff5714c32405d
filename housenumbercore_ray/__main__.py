"""``ray job submit`` entrypoint: run any registered query as a Ray job.

The north rule's deployment surface (reference analog: the cron-driven
``MunicipalityJobs`` batch runner, reference
src/de/regioosm/housenumbercore/MunicipalityJobs.java:1-120) is a batch
job submitted to a fixed-size cluster:

    ray job submit --working-dir . -- \
        python -m housenumbercore_ray hnr_evaluation \
            --sf-dir /data/sf0.1 --out /data/out/eval --reps 1

Behavior:
  - connects to the cluster Ray was started with (``ray.init(address=
    "auto")`` inside a job; ``address="local"`` standalone) — guarded so
    an already-initialised session (driver/pytest) is reused untouched;
  - resolves the query from ``__ray_entry__.queries()`` (the single
    registry — no second list to drift);
  - streams the result to partitioned parquet under ``--out`` when the
    result is a Dataset (resumable output contract: one file per block,
    never one giant file), or writes a single parquet for small
    pandas/Arrow results;
  - prints ONE JSON metrics line (rows, seconds, output path) so the
    job log is machine-parseable, mirroring bench.py's contract.

``--list`` prints the registry and exits; ``--reps N`` re-runs the query
N times and reports the minimum (the VM-steal measurement protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_registry():
    # __ray_entry__.py lives at the repo root next to this package
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __ray_entry__ as ent

    return ent.queries()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m housenumbercore_ray",
        description="Run a registered pipeline query as a Ray job.")
    p.add_argument("query", nargs="?", help="query name from queries()")
    p.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p.add_argument("--out", default=None,
                   help="output directory (partitioned parquet); omit to "
                        "only count rows")
    p.add_argument("--reps", type=int, default=1)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None)
    p.add_argument("--list", action="store_true", help="list queries and exit")
    args = p.parse_args(argv)

    registry = _load_registry()
    if args.list or not args.query:
        for name in sorted(registry):
            print(name)
        return 0
    if args.query not in registry:
        p.error(f"unknown query {args.query!r} (see --list)")

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` RAY_ADDRESS is set by the job runtime;
        # standalone falls back to a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")

    import ray.data as rd

    fn = registry[args.query]
    best = None
    for _ in range(max(1, args.reps)):
        t0 = time.time()
        res = fn(args.sf_dir)
        if isinstance(res, rd.Dataset):
            if args.out:
                res.write_parquet(args.out)
                n = None  # counted below from the written files, not a re-run
                import pyarrow.dataset as pads

                n = pads.dataset(args.out).count_rows()
            else:
                n = res.count()
        else:  # small pandas / Arrow result
            n = len(res)
            if args.out:
                import pandas as pd
                import pyarrow as pa
                import pyarrow.parquet as pq

                os.makedirs(args.out, exist_ok=True)
                tbl = (pa.Table.from_pandas(res, preserve_index=False)
                       if isinstance(res, pd.DataFrame) else res)
                pq.write_table(tbl, os.path.join(args.out, "part-0.parquet"))
        dt = round(time.time() - t0, 3)
        if best is None or dt < best["sec"]:
            best = {"query": args.query, "rows": int(n), "sec": dt,
                    "sf_dir": args.sf_dir, "out": args.out}
    print(json.dumps(best))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
