"""Streaming maintenance of the persisted LSH and IVF indexes.

Each document micro-batch is probed against the CURRENT index inside
``foreachBatch``, its verified near-dup matches appended to a results
sink, and then its own band keys + packed shingle sets appended into
the index — so micro-batch N+1's probe sees micro-batch N. This is
the continuous-ingest form of the build → probe → append lifecycle
(``operators/dedup.py``): the batch path runs it wave-by-wave from a
driver loop; this module runs it from a Structured Streaming drain.
Micro-batches execute sequentially, but ``foreachBatch`` is
AT-LEAST-ONCE: a micro-batch that fails (or whose driver dies) after
side effects but before its offset commits is re-run with the same
``batch_id`` on restart. Neither a parquet append nor an index-table
append is naturally idempotent, so the batch body makes itself so:
results are written under a per-batch directory with ``overwrite``
(a retry replaces, never duplicates), and the index append is gated
by a per-batch ledger marker written after the append lands (a retry
skips it). The residual window — a crash exactly between the index
append and its marker — is the window every non-transactional sink
has; a production deployment closes it with a transactional table
format (Delta/Iceberg) whose append and commit are atomic.

Scale shape: identical to the batch probe/append — every stage inside
``foreachBatch`` is micro-batch-sized (shingle, sign, pack, probe
join against the pre-bucketed index scans); the corpus index is never
re-shingled or shuffled. State lives in the index tables themselves,
not in Spark streaming state, so there is nothing watermark-bounded
to evict: the operator is stateless from the engine's point of view.

Reference note: the reference engine (frame_tasks/) has no streaming
surface at all; this is ⊕ production shape for rolling 100 TB crawl
ingest where dedup must converge across waves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def index_maintain_stream(
    spark: SparkSession,
    src_dir: str,
    keys_table: str,
    sets_table: str,
    results_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 2,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain ``src_dir`` (one parquet file per ingest wave; the file
    source orders files oldest-mtime-first) through probe-then-append
    maintenance of the persisted LSH index, with ``availableNow``.

    Per micro-batch, in order: (1) probe the batch against the index
    AS OF the previous batch — matches go to
    ``results_dir/b{batch_id}`` with ``overwrite``, so an
    at-least-once re-run of the same batch REPLACES its own output
    instead of duplicating match rows; (2) append the batch's band
    keys + packed sets into the index, gated by a ledger marker
    (``{results_dir}_ledger/appended_{batch_id}``) so a re-run never
    double-appends index keys. Returns the drained results frame
    ``(id_col, n_matches, max_jaccard)``.

    The probe result must be materialized BEFORE the append (the
    write action does this naturally) — a lazy probe evaluated after
    the append would see the batch's own signatures and self-match.
    On a retried batch whose append already landed, the probe result
    is rebuilt against an index that already CONTAINS the batch; the
    overwrite would then record self-matches — so a ledgered batch
    skips the probe rewrite too (its previous overwrite already
    committed the pre-append probe result; parquet directory writes
    finish with the _SUCCESS marker the ledger write follows).
    """
    import os

    from task_on_dataframes_spark.operators.dedup import (
        append_lsh_index,
        probe_lsh_index,
    )

    schema = spark.read.parquet(src_dir).schema
    ledger = results_dir.rstrip("/") + "_ledger"
    os.makedirs(ledger, exist_ok=True)

    def _probe_then_append(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger, f"appended_{batch_id}")
        if os.path.exists(marker):
            # at-least-once replay of a fully-applied batch: both the
            # per-batch results overwrite and the index append landed
            return
        sess = batch_df.sparkSession
        # shape="merge": the streaming drain is the one probe call
        # site where the broadcast-batch shape measured SLOWER, both
        # locally and at scale (sf0.1: 5.9 vs 7.4 s; sf3: 14.5 vs
        # 24.3 s, interleaved min-of-2 — SCALE.md r13): each
        # micro-batch pays two driver-side broadcast builds whose
        # fixed latency cannot amortize over a drain of small batches,
        # while the SMJ probe is one pipelined multi-stage job.
        matches = probe_lsh_index(
            sess, batch_df, id_col, text_col, keys_table, sets_table,
            num_perm=num_perm, bands=bands, threshold=threshold,
            shingle_n=shingle_n, shape="merge",
        )
        matches.write.mode("overwrite").parquet(
            os.path.join(results_dir, f"b{batch_id}")
        )
        append_lsh_index(
            sess, batch_df, id_col, text_col, keys_table, sets_table,
            num_perm=num_perm, bands=bands, shingle_n=shingle_n,
        )
        with open(marker, "w") as fh:
            fh.write("committed\n")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
        .writeStream.foreachBatch(_probe_then_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(results_dir):  # empty stream: no batch ran
        return spark.createDataFrame(
            [], schema=f"{id_col} bigint, n_matches int, max_jaccard double"
        )
    # per-batch subdirectories: recursive lookup, no partition inference
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(results_dir)
    )


def ann_maintain_stream(
    spark: SparkSession,
    src_dir: str,
    cents_table: str,
    lists_table: str,
    results_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain ``src_dir`` (one parquet file of ``(id_col, vec_col)``
    rows per ingest wave) through probe-then-append maintenance of the
    persisted IVF index — the vector twin of
    :func:`index_maintain_stream`, completing the lifecycle matrix
    {LSH, IVF} x {batch driver loop, Structured Streaming drain}.

    Per micro-batch, in order: (1) each arriving vector is probed as a
    query against the index AS OF the previous batch (top-``k`` by
    exact cosine within ``n_probe`` coarse lists — the "link new
    embeddings to their nearest indexed neighbors" step of a rolling
    ingest pipeline); results land in ``results_dir/b{batch_id}`` with
    ``overwrite``; (2) the batch is appended into the list table under
    the FROZEN stored quantizer (O(batch x n_centroids), existing
    files untouched). Wave N+1's neighbors can therefore include
    wave-N vectors, which a build-once index can never return.

    The same at-least-once idempotency contract as the LSH drain: a
    per-batch ledger marker gates the append, the per-batch overwrite
    replaces rather than duplicates on replay, and a fully-applied
    batch is skipped wholesale (re-probing it would see its own
    appended vectors and self-match). Scale shape: every stage inside
    ``foreachBatch`` is micro-batch-sized; the index is read
    bucket-pruned (``cid IN (...)``) and never shuffled.

    Returns the drained results frame
    ``(query_id, vec_id, cos, rank)`` where ``query_id`` is the
    arriving vector's id.
    """
    import os

    from task_on_dataframes_spark.operators.similarity import (
        append_ivf_index,
        probe_ivf_index,
    )

    schema = spark.read.parquet(src_dir).schema
    ledger = results_dir.rstrip("/") + "_ledger"
    os.makedirs(ledger, exist_ok=True)

    def _probe_then_append(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger, f"appended_{batch_id}")
        if os.path.exists(marker):
            return
        sess = batch_df.sparkSession
        queries = batch_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col)
        )
        matches = probe_ivf_index(
            sess, queries, cents_table, lists_table,
            k=k, n_probe=n_probe, vec_col=vec_col,
        )
        matches.write.mode("overwrite").parquet(
            os.path.join(results_dir, f"b{batch_id}")
        )
        append_ivf_index(
            sess, batch_df, cents_table, lists_table,
            id_col=id_col, vec_col=vec_col,
        )
        with open(marker, "w") as fh:
            fh.write("committed\n")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
        .writeStream.foreachBatch(_probe_then_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(results_dir):  # empty stream: no batch ran
        return spark.createDataFrame(
            [],
            schema=(
                "query_id bigint, vec_id bigint, cos double, rank int"
            ),
        )
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(results_dir)
    )


def stage_wave_files(
    spark: SparkSession,
    docs: DataFrame,
    waves: list,
    id_col: str = "doc_id",
) -> str:
    """Test/demo plumbing, NOT the production path: write each wave
    (a filter predicate over ``docs``) as one parquet file into a
    fresh temp directory with strictly increasing mtimes, so the
    streaming file source replays them as ordered micro-batches. In
    production the crawl already lands as timestamped files; this
    simulates that arrival from a static table. Driver-local pyarrow
    write — wave-sized, bounded by the simulated ingest batch."""
    import os
    import tempfile
    import time

    import pyarrow as pa

    d = tempfile.mkdtemp(prefix="tada_wave_src_")
    now = time.time()
    for i, pred in enumerate(waves, start=1):
        pdf = docs.filter(pred).toPandas()
        path = os.path.join(d, f"{i:02d}_wave.parquet")
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        os.utime(path, (now + i, now + i))
    return d
