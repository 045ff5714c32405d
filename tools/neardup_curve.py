"""Measure the crawl-scale near-dup growth curve (VERDICT r2 item 1).

Runs ``minhash_page_pairs`` end-to-end (banding → candidate pairs →
[scale profile: signature-estimate prefilter] → semi-join text fetch →
exact-Jaccard verify) on the ``bench`` (800k pages) and ``bench4`` (3.2M
pages) worlds in FRESH processes, and reports wall seconds, verified-pair
counts, and the growth ratio. The r2 finding: with the default exact
profile, FALSE LSH candidates grow ~quadratically (730 s at 3.2M vs 110 s
at 800k). The r3 scale profile (k=192 / 24×8 banding, no prefilter — 8-row
bands measured zero false candidates) plus the pre-groupby block coalesce
(stages/shuffle.py) brings the curve SUBLINEAR: 58 s at 800k → 184 s at
3.2M (3.15× for 4× data).

Usage:
  python tools/neardup_curve.py [profile] [scales...]   # default: scale bench bench4
  python tools/neardup_curve.py --child <profile> <scale>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(profile: str, scale: str) -> None:
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = 8 * 1024 * 1024

    from housenumbercore_ray.pipelines.corpus import minhash_page_pairs
    from housenumbercore_ray.sources.worldgen import ensure_world_scale

    wd = ensure_world_scale(scale)
    import pyarrow.dataset as pads

    n_pages = pads.dataset(f"{wd}/pages").count_rows()
    # warm page cache so the curve measures compute+shuffle, not disk
    import ray.data as rd

    rd.read_parquet(f"{wd}/pages").count()

    t = time.time()
    n_pairs = minhash_page_pairs(wd, profile=profile).count()
    wall = round(time.time() - t, 1)
    print(json.dumps({"scale": scale, "profile": profile, "n_pages": n_pages,
                      "n_pairs": int(n_pairs), "wall_s": wall,
                      "pages_per_sec": round(n_pages / wall, 1)}))
    ray.shutdown()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    args = sys.argv[1:]
    profile = args[0] if args else "scale"
    scales = args[1:] or ["bench", "bench4"]
    results = []
    for scale in scales:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", profile, scale],
            capture_output=True, text=True, check=False)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if out.returncode != 0 or not line.startswith("{"):
            print(json.dumps({"scale": scale, "error": out.stderr[-2000:]}))
            continue
        results.append(json.loads(line))
        print(line, flush=True)
    if len(results) >= 2:
        r0, r1 = results[0], results[-1]
        size_ratio = r1["n_pages"] / r0["n_pages"]
        time_ratio = r1["wall_s"] / r0["wall_s"]
        print(json.dumps({
            "metric": f"near-dup growth curve ({profile} profile)",
            "size_ratio": round(size_ratio, 2),
            "time_ratio": round(time_ratio, 2),
            "linearity": round(time_ratio / size_ratio, 3),  # 1.0 = perfectly linear
        }))


if __name__ == "__main__":
    main()
