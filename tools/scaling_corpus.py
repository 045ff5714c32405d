"""Supplementary N→4N scaling evidence for a representative CORPUS operator
(the north-rule criterion is measured on the flagship pipeline by
``bench.py --scaling``; this tool shows the curation ops scale the same way).

Runs ``web_line_dedup`` (partial line-counts → one sharded sum → broadcast
boilerplate set → per-page rewrite) over the 3.2M-page ``bench4`` world at 8
and 32 cpus in fresh processes, min-of-REPS interleaved (the VM-steal
protocol), and prints one JSON line.

The 800k ``bench`` world is NOT used: its pages sit in 40 single-row-group
files, so the fused read+map stage is wave-quantized at 32 cpus (40 tasks =
2 waves, the second 25%% full) and the measurement reflects file-count
granularity, not the operator. bench4's 160 files give 5 exact waves.

Usage: python tools/scaling_corpus.py [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one(ncpu: int) -> float:
    code = """
import time, ray, os, sys
sys.path.insert(0, %r)
ray.init(address="local", num_cpus=%d, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
ctx = DataContext.get_current(); ctx.enable_progress_bars = False
ctx.target_max_block_size = 8 * 1024 * 1024
from housenumbercore_ray.sources.worldgen import ensure_world_scale
from housenumbercore_ray.pipelines import corpus
wd = ensure_world_scale("bench4")
corpus.host_stats(wd).count()  # warm page cache with a cheap pass
t = time.time()
corpus.line_dedup(wd).count()
print("RESULT", time.time() - t)
ray.shutdown()
""" % (REPO, ncpu)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True).stdout
    for line in out.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(out[-2000:])


def _cpu_jiffies() -> tuple[int, int]:
    with open("/proc/stat") as f:
        fields = f.readline().split()[1:]
    vals = [int(x) for x in fields]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    max_frac = float(os.environ.get("GRAFT_STEAL_MAX_FRAC", "0.015"))
    lo_runs, hi_runs = [], []

    def timed(ncpu: int) -> tuple[float, float]:
        s0, t0 = _cpu_jiffies()
        sec = _one(ncpu)
        s1, t1 = _cpu_jiffies()
        return sec, round((s1 - s0) / max(1, t1 - t0), 4)

    for _ in range(reps):
        lo_runs.append(timed(8))
        hi_runs.append(timed(32))

    def pick(runs):
        valid = [r for r in runs if r[1] <= max_frac]
        return min(valid or runs, key=lambda r: r[0])[0], bool(valid)

    lo, lo_clean = pick(lo_runs)
    hi, hi_clean = pick(hi_runs)
    print(json.dumps({
        "metric": "corpus-op scaling (web_line_dedup, bench4 world 3.2M pages)",
        "sec_8": round(lo, 2), "sec_32": round(hi, 2),
        "sec_8_all": [round(x, 2) for x, _ in lo_runs],
        "sec_32_all": [round(x, 2) for x, _ in hi_runs],
        "steal_frac_8": [s for _, s in lo_runs],
        "steal_frac_32": [s for _, s in hi_runs],
        "steal_max_frac": max_frac,
        "steal_gate_clean": lo_clean and hi_clean,
        "scaling_efficiency": round((lo / hi) / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
