"""Plan-invariant audit over the ENTIRE query registry.

The plan-shape pytest suite asserts deep properties on ~20 chosen
queries; this tool sweeps every ``queries()`` entry and enforces the
three invariants that must hold repo-wide for the 100 TB story:

1. **No CartesianProduct** — an unconstrained cross join is corpus x
   corpus at scale. (``BroadcastNestedLoopJoin`` with a broadcast
   1-row/dimension side is the sanctioned scalar-attachment pattern
   and is reported, not flagged.)
2. **No BatchEvalPython** — row-at-a-time Python UDFs are forbidden;
   Python may only touch data through Arrow-batched
   MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython.
3. **Exchange count is recorded** per query so a future edit that
   doubles a query's shuffles shows up as a diff in PLANAUDIT.md.

Usage: python tools/plan_audit.py [--sf-dir DIR] [--out PLANAUDIT.md]
Exit code 1 if any invariant is violated.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from task_on_dataframes_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    rows, violations = [], []
    for name, fn in entrymod.queries().items():
        if args.names and name not in args.names:
            continue
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must not abort
            rows.append((name, "-", "-", f"ERROR building plan: {e}"))
            violations.append(name)
            continue
        bad = [f for f in FORBIDDEN if f in plan]
        notes = []
        if "BroadcastNestedLoopJoin" in plan:
            notes.append("BNLJ(broadcast scalar)")
        if "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan:
            notes.append("arrow-python")
        if "StreamingRelation" in plan or name.startswith("stream_"):
            notes.append("drained stream")
        if (
            ("LocalTableScan" in plan or "Scan ExistingRDD" in plan)
            and "FileScan" not in plan
            and "Exchange" not in plan
        ):
            # the returned frame is driver-collected state: the query
            # executed EAGERLY while building (iterative driver loop
            # with localCheckpoint lineage cuts), so the static plan
            # under-reports its work. The shuffle budget is documented
            # and tested at the operator (e.g. bpe_train_delta: ~3
            # shuffles/merge, one job/merge).
            notes.append("eager driver-loop; plan post-lineage-cut")
        if bad:
            violations.append(name)
            notes.append("VIOLATION: " + ",".join(bad))
        rows.append(
            (
                name,
                str(plan.count("Exchange")),
                str(plan.count("FileScan")),
                "; ".join(notes),
            )
        )

    lines = [
        "# PLANAUDIT — repo-wide physical-plan invariants",
        "",
        f"Queries audited: {len(rows)}; violations: {len(violations)}.",
        "Invariants: no CartesianProduct, no row-at-a-time Python",
        "(BatchEvalPython). Exchange/scan counts recorded for drift",
        f"review. sf_dir={args.sf_dir}.",
        "",
        "| query | exchanges | scans | notes |",
        "|---|---|---|---|",
    ]
    lines += [f"| {n} | {e} | {s} | {x} |" for n, e, s, x in rows]
    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        print(text)
    if violations:
        print(f"VIOLATIONS: {violations}", file=sys.stderr)
        return 1
    print(f"plan audit clean: {len(rows)} queries", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
