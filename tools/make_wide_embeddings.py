#!/usr/bin/env python3
"""Build a WIDE-DIMENSION (default d=768) variant of the embeddings table
for the PQ wide-dim evidence run (dev tool, driver-side python — numpy/
pyarrow are NOT available to engine code; same status as
make_scale_replica.py).

Usage: python3 tools/make_wide_embeddings.py [outdir] [replicas] [width]

Construction: replicas follow make_scale_replica.py exactly (vec_id offset
k*1_000_000, rotate 6k dims, per-replica Rademacher signs — within-replica
dot products preserved, cross-replica near-orthogonal). Each 64-dim vector
then widens to `width` dims as width/64 concatenated blocks, block b being
the vector times a FIXED per-block Rademacher pattern s_b (the same s_b
for every vector). Because dot(s_b*u, s_b*v) = dot(u, v), every pairwise
dot product scales by exactly width/64 and every COSINE is preserved
bit-for-bit in exact arithmetic — so the wide corpus has the SAME
neighbor structure as the 64-dim replica while costing true
production-width bandwidth/compute. That is the point of the run: the
r13 PQ-tier caveat is that its motivating win is dimension-dependent and
d=64 only ties raw IVF; this fixture measures the claim at d=768 without
changing what the right answers are."""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_wide768"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
WIDTH = int(sys.argv[3]) if len(sys.argv) > 3 else 768
SRC = "/root/testdata/sf0.1"

import os
os.makedirs(OUT, exist_ok=True)
assert WIDTH % 64 == 0
blocks = WIDTH // 64
# fixed per-block sign patterns, shared by every vector (seed disjoint
# from the per-replica seeds k=1..R-1 used below)
bsigns = np.random.RandomState(10_000).choice(
    np.array([-1.0, 1.0], dtype=np.float32), size=(blocks, 64))

t = pq.read_table(f"{SRC}/embeddings.parquet")
e = t.to_pandas()
parts = []
for k in range(R):
    c = e.copy()
    c["vec_id"] = c["vec_id"] + k * 1_000_000
    if k > 0:
        signs = np.random.RandomState(k).choice(
            np.array([-1.0, 1.0], dtype=np.float32), size=64)
    else:
        signs = np.ones(64, dtype=np.float32)
    c["embedding"] = c["embedding"].map(
        lambda v: np.concatenate(
            [(np.roll(np.asarray(v, dtype=np.float32), 6 * k) * signs) * sb
             for sb in bsigns]))
    parts.append(c)

import pandas as pd
out = pd.concat(parts, ignore_index=True)
# label rides along unchanged: the q48 fixture family selects it, and a
# wide run of the semantic tier must accept the same fixture SQL
schema = pa.schema([("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32())])
pq.write_table(pa.Table.from_pandas(out, schema=schema, preserve_index=False),
               f"{OUT}/embeddings.parquet")
print("embeddings", len(out), "width", WIDTH)
