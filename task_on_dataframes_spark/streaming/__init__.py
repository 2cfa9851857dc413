"""Structured Streaming surface (SURVEY §2.9 ⊕ — absent in the
reference, required by the north-star extensions).

Batch/stream parity by construction: the same column expressions used
by the batch event queries run under ``readStream`` with a watermark,
so one definition serves both; :func:`sessionize_stream` is the
stateful custom-operator pattern (``applyInPandasWithState``) for
semantics window functions can't express incrementally.
"""

from .events import (
    dedup_stream,
    enrich_stream,
    events_stream,
    hourly_counts_stream,
    sliding_counts_stream,
    sessionize_stream,
    stream_stream_window_join,
    run_available_now,
)
