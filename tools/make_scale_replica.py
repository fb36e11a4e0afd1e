#!/usr/bin/env python3
"""Build an R-times replica of the sf0.1 testdata for scale-evidence runs
(dev tool, driver-side python — pyarrow/pandas are NOT available to engine
code). Usage: python3 tools/make_scale_replica.py [outdir] [replicas]

Replication preserves type fidelity (notably events.ts TIMESTAMP(NANOS))
and — the part that matters for honest scaling numbers — keeps the
duplicate structure LINEAR in the replica count:

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
  payload-shape distribution under the mod-pattern generators.
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

t = pq.read_table(f"{SRC}/documents.parquet")
d = t.to_pandas()
parts = []
for k in range(R):
    c = d.copy()
    c["doc_id"] = c["doc_id"] + k * 1_000_000
    if k > 0:
        suf = f"_r{k}"
        c["text"] = c["text"].map(lambda s: re.sub(r"(\S+)", r"\1" + suf, s))
        c["n_chars"] = c["text"].str.len()
    parts.append(c)
out = pd.concat(parts, ignore_index=True)
pq.write_table(pa.Table.from_pandas(out, schema=t.schema, preserve_index=False),
               f"{OUT}/documents.parquet")
print("documents", len(out))

t = pq.read_table(f"{SRC}/embeddings.parquet")
e = t.to_pandas()
parts = []
for k in range(R):
    c = e.copy()
    c["vec_id"] = c["vec_id"] + k * 1_000_000
    if k > 0:
        signs = np.random.RandomState(k).choice(
            np.array([-1.0, 1.0], dtype=np.float32), size=64)
        c["embedding"] = c["embedding"].map(
            lambda v: (np.roll(np.asarray(v, dtype=np.float32), 6 * k) * signs))
    parts.append(c)
out = pd.concat(parts, ignore_index=True)
pq.write_table(pa.Table.from_pandas(out, schema=t.schema, preserve_index=False),
               f"{OUT}/embeddings.parquet")
print("embeddings", len(out))

t = pq.read_table(f"{SRC}/events.parquet")
v = t.to_pandas()
parts = []
for k in range(R):
    c = v.copy()
    c["event_id"] = c["event_id"] + k * 9_032_100
    c["user_id"] = c["user_id"] + k * 5_460_000
    parts.append(c)
out = pd.concat(parts, ignore_index=True)
pq.write_table(pa.Table.from_pandas(out, schema=t.schema, preserve_index=False),
               f"{OUT}/events.parquet")
print("events", len(out), t.schema.field("ts").type)
