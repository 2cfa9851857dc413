"""Physical-plan introspection: the properties that decide whether a
plan survives scale-up, as data instead of strings.

Used by the plan-shape tests and available to users for asserting their
own pipelines' scale contracts::

    from task_on_dataframes_spark.introspect import plan_facts
    facts = plan_facts(df)
    assert facts["pushed_filters"], "filter did not reach the scan"
    assert not facts["single_partition_exchanges"]
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any, Dict, List

if TYPE_CHECKING:  # keep the package importable without a JVM
    from pyspark.sql import DataFrame


def physical_plan(df: "DataFrame") -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_facts(df: "DataFrame") -> Dict[str, Any]:
    """Summarize the scale-relevant facts of a DataFrame's physical
    plan."""
    plan = physical_plan(df)
    pushed: List[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        pushed.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    read_cols: List[List[str]] = [
        [c.split("#")[0] for c in m.group(1).split(",") if c]
        for m in re.finditer(r"FileScan \w+ [^\[]*\[([^\]]*)\]", plan)
    ]
    return {
        "pushed_filters": pushed,
        "scan_columns": read_cols,
        "partition_filters": re.findall(r"PartitionFilters: \[([^\]]*)\]", plan),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loop_joins": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "exchanges": len(re.findall(r"Exchange", plan)),
        "single_partition_exchanges": len(
            re.findall(r"Exchange SinglePartition", plan)
        ),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "plan": plan,
    }
