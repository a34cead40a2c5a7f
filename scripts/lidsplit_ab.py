"""A/B: split-lid paged geometry (r5) vs the r4 fused (cx,cz,kc,lid) layout.

The split (models/paged_grid.py `lids`) removes the lid row from the march
fetch's per-trip gather — the paged kernel's dominant serial cost (36-50%,
docs/PERFORMANCE.md r4 attribution) — and fetches the winner's lid in a
mostly-zero-trip masked box loop instead.

The old layout no longer exists in the tree, so this driver alternates
PROCESSES over a pre-split snapshot (git archive) and the working tree:
old,new,old,new..., one stretch_bench config-5 run each, medians reported.
Cross-process axon noise is ~+-7%; alternation cancels slow drift, and the
delta of interest (~10-25%) is well above it.

Usage:  python scripts/lidsplit_ab.py [rounds] [config]
  old snapshot expected at /tmp/paged_old (git archive HEAD before the
  split); config default 3840x2160x8 (the BASELINE config-5 headline).
"""
import json
import os
import statistics
import subprocess
import sys

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
CONFIG = sys.argv[2] if len(sys.argv) > 2 else "3840x2160x8"
NEW = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD = "/tmp/paged_old"

env = dict(os.environ, STRETCH_MODE="fast")


def run(tree):
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "scripts", "stretch_bench.py"),
         "100000", CONFIG],
        capture_output=True, text=True, env=env, cwd=tree, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {tree}: {out.stdout[-500:]}\n"
                       f"{out.stderr[-500:]}")


print(f"config {CONFIG}, {ROUNDS} alternating rounds", flush=True)
times = {"old": [], "new": []}
means = {}
for rnd in range(ROUNDS):
    for name, tree in (("old", OLD), ("new", NEW)):
        j = run(tree)
        times[name].append(j["seconds"])
        means[name] = j["mean"]
        print(f"round {rnd} {name}: {j['seconds']:.2f}s "
              f"({j['ns_per_sample']} ns/sample, mean {j['mean']})",
              flush=True)

old_m = statistics.median(times["old"])
new_m = statistics.median(times["new"])
print(f"\nold(fused-lid) median {old_m:.3f}s  new(split-lid) median "
      f"{new_m:.3f}s  delta {new_m-old_m:+.3f}s "
      f"({100*(new_m-old_m)/old_m:+.1f}%)")
print(f"image means old {means['old']} new {means['new']} "
      f"(RR fast mode; identical seeds -> should match exactly)")
