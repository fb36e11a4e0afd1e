#!/usr/bin/env python3
"""Build an R-times replica of the sf0.1 testdata for scale-evidence runs
(dev tool, driver-side python — pyarrow/pandas are NOT available to engine
code). Usage: python3 tools/make_scale_replica.py [outdir] [replicas]

Replication preserves type fidelity (notably events.ts layout) and — the
part that matters for honest scaling numbers — keeps the duplicate
structure LINEAR in the replica count:

- documents: every token gets a per-replica suffix, so within-replica
  shingle/minhash dup structure is preserved exactly while cross-replica
  shingles are disjoint (no quadratic cross-replica pair blowup).
- embeddings: vectors are rotated by 6*k dims AND multiplied by a
  per-replica Rademacher ±1 sign pattern. The sign flip is what makes the
  construction survive R > 32: pure rotations repeat every gcd-cycle of
  the 64-dim space (replica k and k+32 would carry IDENTICAL vectors,
  seeding cross-replica exact-dup clusters), while an elementwise sign
  pattern s preserves every within-replica dot product exactly
  (dot(s*u, s*v) = dot(u, v)) and keeps independently-signed replicas
  near-orthogonal in expectation for ANY replica count. vec_id offsets
  stay multiples of 100 so the %50/%100 query-set selections keep the
  same per-replica shape.
- events: id offsets are multiples of every modulus the catalog synthesis
  uses (event_id: lcm(23,5,10,4,17,6,3,7,11,100) = 9_032_100; user_id:
  lcm(2..7,13)*1000 = 5_460_000), so each replica reproduces the same
  payload-shape distribution under the mod-pattern generators. All id
  columns are int64 in the source schema, so offsets stay exact to
  R ≈ 10^9 (the 1000× decade lands at event_id ≈ 9·10^9).

Replicas are STREAMED through a ParquetWriter in fixed-size batches (the
r15 rewrite): the old concat-everything shape held R·|table| rows in
pandas memory, which at R=1000 is ~100M event rows — pointless peak
memory for an embarrassingly-batchable write. Per-replica content is
IDENTICAL to the old tool; only row-group layout differs (irrelevant to
the engine, which reads through Spark's parquet scan).
"""
import sys, re
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = "/root/testdata/sf0.1"

import os
os.makedirs(OUT, exist_ok=True)


def stream(table_name, transform, batch_replicas):
    """Write R transformed copies of SRC/<table>.parquet to OUT, flushing a
    row group every `batch_replicas` replicas."""
    t = pq.read_table(f"{SRC}/{table_name}.parquet")
    base = t.to_pandas()
    writer = pq.ParquetWriter(f"{OUT}/{table_name}.parquet", t.schema)
    n = 0
    batch = []
    for k in range(R):
        batch.append(transform(base.copy(), k))
        if len(batch) >= batch_replicas or k == R - 1:
            out = pd.concat(batch, ignore_index=True)
            writer.write_table(pa.Table.from_pandas(
                out, schema=t.schema, preserve_index=False))
            n += len(out)
            batch = []
    writer.close()
    return t, n


def doc_transform(c, k):
    c["doc_id"] = c["doc_id"] + k * 1_000_000
    if k > 0:
        suf = f"_r{k}"
        c["text"] = c["text"].map(lambda s: re.sub(r"(\S+)", r"\1" + suf, s))
        c["n_chars"] = c["text"].str.len()
    return c


def emb_transform(c, k):
    c["vec_id"] = c["vec_id"] + k * 1_000_000
    if k > 0:
        signs = np.random.RandomState(k).choice(
            np.array([-1.0, 1.0], dtype=np.float32), size=64)
        c["embedding"] = c["embedding"].map(
            lambda v: (np.roll(np.asarray(v, dtype=np.float32), 6 * k) * signs))
    return c


def evt_transform(c, k):
    c["event_id"] = c["event_id"] + k * 9_032_100
    c["user_id"] = c["user_id"] + k * 5_460_000
    return c


_, n = stream("documents", doc_transform, batch_replicas=20)
print("documents", n, flush=True)
_, n = stream("embeddings", emb_transform, batch_replicas=50)
print("embeddings", n, flush=True)
t, n = stream("events", evt_transform, batch_replicas=10)
print("events", n, t.schema.field("ts").type, flush=True)
