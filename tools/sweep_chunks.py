"""Chunk-width experiment driver (real TPU, serialized runs).

Round-4 question: PERF.md measured only the two extremes of the pf-kernel
chunk decomposition at 1M — full-width bands (50.33 ms f32 / 47.30 bf16) and
128-lane chunks (91.1 ms, ILP collapse). This sweeps the middle widths and the
per-pass ctx override (the 5-accumulator ctx pass previously IMPROVED at 128
while every 1-2-output value kernel regressed).

Each configuration runs bench.bench_one(1M, N steps, plane) in a fresh
subprocess (fresh TPU client; the persistent compile cache is SHARED so only
new kernel variants pay Mosaic compiles).

Usage: python tools/sweep_chunks.py [n_particles] [steps]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, sys
sys.path.insert(0, {repo!r})
from bench import bench_one
out = bench_one({target}, {steps}, "plane")
print("SWEEPRESULT " + json.dumps(out))
"""

# (label, env overrides). PF_CHUNK = width for every pf kernel;
# PF_STAT_CHUNK = override for the fluid-boundary (stat) passes only.
# Phase-1 results (PERF.md round 4): baseline full-width 47.25 ms at 1M bf16;
# chunking the 5-acc ctx pass (both dyn+stat) LOST (ctx128 51.3, ctx256 49.0);
# global widths 256/512 LOST (ILP collapse persists below full width).
CONFIGS = [
    ("stat128", {"YASPH_BENCH_PF_STAT_CHUNK": "128"}),
    ("stat256", {"YASPH_BENCH_PF_STAT_CHUNK": "256"}),
    ("stat512", {"YASPH_BENCH_PF_STAT_CHUNK": "512"}),
]


def run_one(target: int, steps: int, label: str, extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, target=target,
                                            steps=steps)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    res = {"label": label, "env": extra_env, "ok": proc.returncode == 0}
    for line in proc.stdout.splitlines():
        if line.startswith("SWEEPRESULT "):
            res.update(json.loads(line[len("SWEEPRESULT "):]))
    if proc.returncode != 0:
        res["error_tail"] = proc.stderr[-2000:]
    return res


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    results = []
    for label, extra in CONFIGS:
        print(f"=== {label} ===", flush=True)
        r = run_one(target, steps, label, extra)
        print(json.dumps(r), flush=True)
        results.append(r)
    print("SWEEP " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
