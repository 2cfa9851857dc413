"""Relational + text + dedup + similarity operators, DataFrame-native.

Every operator here is a pure function ``DataFrame -> DataFrame`` built
from ``pyspark.sql.functions`` so Catalyst sees one logical plan across
any composition (predicate pushdown, column pruning, join selection,
whole-stage codegen all apply). Pandas-UDF escape hatches are isolated
and clearly marked.
"""

from .text import (
    tokenize,
    clean_tokens,
    value_counts,
    top_mass_fraction,
    top_mass_filter,
    running_sum,
)
