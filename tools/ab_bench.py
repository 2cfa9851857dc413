#!/usr/bin/env python
"""Interleaved A/B micro-bench between two source trees.

Runs the named registered queries bench-style (same session config as
bench.py: warm run, then min-of-3 noop writes) in CHILD processes whose
PYTHONPATH points at tree A or tree B, strictly alternating A B A B ...
for ``--rounds`` rounds, and reports each tree's per-query minimum.
Interleaving absorbs slow host drift; the min-of-mins is the same
reproducible plan cost bench.py reports.

    python tools/ab_bench.py --tree-a /tmp/ab_base --tree-b /root/repo \
        --rounds 2 pipeline_multilingual_tokens dedup_components

Tree paths must each contain __spark_entry__.py (use `git worktree add
/tmp/ab_base <rev>` for the baseline).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

CHILD = r"""
import json, os, sys, time
tree = sys.argv[1]
names = json.loads(sys.argv[2])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, tree)
import __spark_entry__ as entrymod
from task_on_dataframes_spark.session import get_spark

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
biggest = max(
    (os.path.getsize(os.path.join(sf_dir, f))
     for f in os.listdir(sf_dir)
     if os.path.isfile(os.path.join(sf_dir, f))),
    default=0,
)
mpb = min(max(biggest // (3 * cpus), 4 << 20), 128 << 20)
spark = get_spark("ab_bench", max_partition_bytes=str(mpb))
spark.sparkContext.setLogLevel("ERROR")
for t in ("region nation customer supplier part orders lineitem "
          "documents").split():
    spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
qs = entrymod.queries()
out = {}
for name in names:
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    out[name] = round(best, 3)
    spark.catalog.clearCache()
print("ABRESULT " + json.dumps(out))
"""


def run_child(tree: str, names: list[str]) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    with tempfile.NamedTemporaryFile("w+", suffix=".log", delete=False) as f:
        rc = subprocess.run(
            [sys.executable, "-c", CHILD, tree, json.dumps(names)],
            stdout=f, stderr=subprocess.DEVNULL, env=env, cwd=tree,
        ).returncode
        body = open(f.name).read()
    for line in body.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise SystemExit(f"child in {tree} produced no result (rc={rc}); "
                     f"log: {f.name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    results: dict[str, list[dict]] = {"a": [], "b": []}
    for r in range(args.rounds):
        for label, tree in (("a", args.tree_a), ("b", args.tree_b)):
            res = run_child(tree, args.names)
            results[label].append(res)
            print(f"round {r} {label} ({tree}): {json.dumps(res)}",
                  flush=True)

    print("\nquery                              "
          "A_min    B_min   B/A speedup")
    summary = {}
    for n in args.names:
        amin = min(r[n] for r in results["a"])
        bmin = min(r[n] for r in results["b"])
        summary[n] = {"a": amin, "b": bmin,
                      "speedup": round(amin / bmin, 3) if bmin else None}
        print(f"{n:34s} {amin:7.3f} {bmin:8.3f}   {amin/bmin:.3f}")
    print("ABSUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
