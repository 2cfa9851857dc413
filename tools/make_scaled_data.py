"""Generate a ~Nx scaled copy of a testdata SF dir for local scale-stress runs.

The driver ships sf0.001/0.01/0.1 only; SCALE.md's 100-TB design claims
deserve at least one data point beyond sf0.1. This tool replicates the
sf0.1 tables REPLICAS times with key-space offsets so that:

- primary keys stay unique and foreign keys stay consistent
  (replica i offsets every *key* column by ``i * K`` with K = a
  per-table stride above the max key);
- dimension tables (region, nation) stay fixed — as at real scale;
- ``documents.text`` is word-shuffled per replica (seeded): unigram
  token statistics are IDENTICAL to the source (text_* workloads keep
  their shape) while digests / shingles / fingerprints differ, so the
  dedup workload does NOT collapse into 10x exact duplicates;
- ``embeddings.embedding`` is cyclically rotated by ``i`` dimensions:
  norms and coordinate distributions are preserved, neighborhoods
  change, so ANN retains its selectivity profile.

Writes to the output dir (default /tmp/spark_graft_sf1) in the driver's
one-parquet-per-table layout. Never touches /root/testdata.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE_DST", "/tmp/spark_graft_sf1")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))

# key columns to offset per table (PKs and FKs into replicated tables)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def _stride(table: pa.Table, cols: list[str]) -> int:
    m = 0
    for c in cols:
        m = max(m, int(pa.compute.max(table[c]).as_py()))
    # round up to a clean power of ten so offset keys are readable
    s = 1
    while s <= m:
        s *= 10
    return s


def _shuffle_words(text: str, rng: random.Random) -> str:
    words = text.split(" ")
    rng.shuffle(words)
    return " ".join(words)


def scale_table(name: str, table: pa.Table, out_path: str) -> int:
    import pyarrow.compute as pc

    cols = KEY_COLS[name]
    stride = _stride(table, cols)
    chunks = []
    for i in range(REPLICAS):
        t = table
        if i > 0:
            for c in cols:
                t = t.set_column(
                    t.schema.get_field_index(c),
                    t.schema.field(c),
                    pc.add(t[c], i * stride).cast(t.schema.field(c).type),
                )
            if name == "documents":
                rng = random.Random(10_000 + i)
                texts = t["text"].to_pylist()
                shuffled = [
                    _shuffle_words(x, rng) if x is not None else None
                    for x in texts
                ]
                idx = t.schema.get_field_index("text")
                t = t.set_column(
                    idx, t.schema.field("text"), pa.array(shuffled, pa.string())
                )
            if name == "embeddings":
                embs = t["embedding"].to_pylist()
                rolled = [
                    None if e is None else list(np.roll(np.asarray(e), i))
                    for e in embs
                ]
                idx = t.schema.get_field_index("embedding")
                t = t.set_column(
                    idx,
                    t.schema.field("embedding"),
                    pa.array(rolled, t.schema.field("embedding").type),
                )
        chunks.append(t)
    out = pa.concat_tables(chunks)
    # row groups are Spark's parquet split boundary: one giant group
    # would serialize every downstream pipeline onto a single task no
    # matter what maxPartitionBytes says. Target ~64 groups per table.
    rg = max(4096, out.num_rows // 64)
    pq.write_table(out, out_path, row_group_size=rg)
    return out.num_rows


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in COPY_AS_IS:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} (copied)")
    for name in KEY_COLS:
        src_path = f"{SRC}/{name}.parquet"
        if not os.path.exists(src_path):
            print(f"{name}: missing in {SRC}, skipped", file=sys.stderr)
            continue
        n = scale_table(name, pq.read_table(src_path), f"{DST}/{name}.parquet")
        print(f"{name}: {n}")
    print(f"wrote {DST} (x{REPLICAS} of {SRC})")


if __name__ == "__main__":
    main()
