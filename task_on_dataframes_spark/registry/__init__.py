"""Query registry package: the per-family modules backing
``__spark_entry__.queries()``. Split for ergonomics — the entry file
re-exports every query callable and keeps the driver-window ordering.
"""
