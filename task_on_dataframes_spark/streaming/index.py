"""Streaming maintenance of the persisted LSH index.

Each document micro-batch is probed against the CURRENT index inside
``foreachBatch``, its verified near-dup matches appended to a results
sink, and then its own band keys + packed shingle sets appended into
the index — so micro-batch N+1's probe sees micro-batch N. This is
the continuous-ingest form of the build → probe → append lifecycle
(``operators/dedup.py``): the batch path runs it wave-by-wave from a
driver loop; this module runs it from a Structured Streaming drain,
where Spark guarantees micro-batches execute sequentially and exactly
once per checkpoint — the property the index append needs (a replayed
batch would double-append; the checkpoint prevents replays).

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
    AS OF the previous batch — matches go to ``results_dir`` (parquet
    append; each batch writes its own files, no rewrite); (2) append
    the batch's band keys + packed sets into the index. Returns the
    drained results frame ``(id_col, n_matches, max_jaccard)``.

    The probe result must be materialized BEFORE the append (the
    write action does this naturally) — a lazy probe evaluated after
    the append would see the batch's own signatures and self-match.
    """
    from task_on_dataframes_spark.operators.dedup import (
        append_lsh_index,
        probe_lsh_index,
    )

    schema = spark.read.parquet(src_dir).schema

    def _probe_then_append(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        matches = probe_lsh_index(
            sess, batch_df, id_col, text_col, keys_table, sets_table,
            num_perm=num_perm, bands=bands, threshold=threshold,
            shingle_n=shingle_n,
        )
        matches.write.mode("append").parquet(results_dir)
        append_lsh_index(
            sess, batch_df, id_col, text_col, keys_table, sets_table,
            num_perm=num_perm, bands=bands, shingle_n=shingle_n,
        )

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
    import os

    if not os.path.exists(results_dir):  # empty stream: no batch ran
        return spark.createDataFrame(
            [], schema=f"{id_col} bigint, n_matches int, max_jaccard double"
        )
    return spark.read.parquet(results_dir)


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
