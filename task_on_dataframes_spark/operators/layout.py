"""Multi-dimensional data layout: Z-order (Morton) clustering.

Range-sorting a table clusters ONE column's rowgroup min/max stats
(``sources/writers.py:compact_parquet`` does that); queries that
filter on a *second* column still read every rowgroup. Interleaving
the bits of two key columns into a Morton code and sorting by it
gives every rowgroup a tight bounding RECTANGLE in (x, y) space —
the standard lakehouse trick (Delta/Iceberg `ZORDER BY`) for making
parquet min/max pruning effective on multi-column predicates at
100 TB.

The code is pure integer bit arithmetic (shift/and/or), identical in
Spark and DuckDB, so layout decisions are engine-deterministic and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: result bit 2i is x's bit i, bit 2i+1 is y's bit i. Scan
    stage only — a chain of shift/and/or folded by Catalyst."""
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        xb = F.shiftleft(
            F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        yb = F.shiftleft(
            F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
        code = code.bitwiseOR(xb).bitwiseOR(yb)
    return code


def morton_code_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB rendering of :func:`morton_code` (identical bits)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    out_path: str,
    bits: int = 16,
    files: int = 8,
) -> None:
    """Write ``df`` Z-ordered on (x_col, y_col): repartitionByRange on
    the Morton code (range partitioner → file-level clustering), sort
    within partitions (rowgroup-level clustering). Each output file's
    rowgroups then cover a small Morton range = a tight (x, y)
    rectangle, so a predicate on EITHER column prunes most rowgroups
    via parquet min/max stats. One range shuffle — the layout cost is
    paid once at write time, amortized over every later scan."""
    z = morton_code(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
