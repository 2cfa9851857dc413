"""Planner layer: pure Python, no pyspark import.

Operates only on column-name sets; execution binds plans to Spark
DataFrames in :mod:`task_on_dataframes_spark.runtime`.
"""
