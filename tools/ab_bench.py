#!/usr/bin/env python
"""Interleaved A/B bench harness: run the same queries from TWO repo
checkouts in ALTERNATING fresh processes (old, new, old, new, ...), so
host-speed drift (documented ~1.6x between same-day windows on this
VM) cancels out and a perf delta can be attributed to CODE, not the
machine.  One Ray session per process — the two checkouts cannot share
a session because Ray workers resolve ``pyschema_ray`` by module name
from their own sys.path (old-code closures would unpickle against
new-code modules).

Usage:
    python tools/ab_bench.py --old /tmp/r3repo --new /root/repo \
        [--sf /root/testdata/sf0.1] [--trials 3] [--cpus 32] [q1 q2 ...]

Prints one JSON line: per-query best-of-trials seconds for old/new and
the new/old ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
import ray
ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as E
qs = E.queries()
# warmup: the session's first union+groupby pays a ~3 s one-off
qs["events_histogram"](SF)
out = {}
for q in NAMES:
    t0 = time.perf_counter()
    qs[q](SF)
    out[q] = time.perf_counter() - t0
print("RESULT " + json.dumps(out))
ray.shutdown()
"""


def run_side(repo: str, names: list[str], sf: str, cpus: int) -> dict:
    code = CHILD.replace("CPUS", str(cpus)) \
                .replace("NAMES", json.dumps(names)) \
                .replace("SF", json.dumps(sf))
    env = dict(os.environ, PYTHONPATH=repo)
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=2400,
                          check=False)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--new", required=True)
    ap.add_argument("--sf", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = args.queries
    if not names:
        sys.path.insert(0, args.new)
        from bench import QUERY_SUBSET
        names = list(QUERY_SUBSET)

    repos = {"old": args.old, "new": args.new}
    best: dict[str, dict[str, float]] = {q: {} for q in names}
    for trial in range(args.trials):
        order = ["old", "new"] if trial % 2 == 0 else ["new", "old"]
        for tag in order:
            res = run_side(repos[tag], names, args.sf, args.cpus)
            for q, dt in res.items():
                cur = best[q].get(tag)
                if cur is None or dt < cur:
                    best[q][tag] = dt
            sys.stderr.write(f"[trial {trial} {tag} done]\n")
            sys.stderr.flush()

    out = {q: {"old_sec": round(v["old"], 3), "new_sec": round(v["new"], 3),
               "ratio": round(v["new"] / v["old"], 3)}
           for q, v in best.items()}
    print(json.dumps({"cpus": args.cpus, "sf": args.sf,
                      "trials": args.trials, "queries": out}))


if __name__ == "__main__":
    main()
