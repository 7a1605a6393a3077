#!/usr/bin/env python3
"""Generate the sf10 embeddings table (100x the driver's sf0.1) for the
G-family ANN/clustering SCALE stretch, under testdata/sf10.

Construction: 10 vec_id-shifted copies of the sf1 table; copy j > 0
applies a per-copy deterministic SIGN-FLIP mask: flip dim i iff bit
(i mod 64) of splitmix64(j) is set (the public-domain Steele et al.
finalizer — distinct, balanced, ~32-bit-apart masks for every pair
of copies; a simple arithmetic rule like (3i+j) % 3 degenerates to
the IDENTITY mask for j in {1,4,7} and would plant exact cross-copy
duplicates). A diagonal +/-1 matrix is orthogonal, so
norms and all WITHIN-copy pairwise cosines are preserved EXACTLY
(d_i^2 = 1 — float sign flips are lossless, unlike rotations of
already-rotated sf1 copies which would need a second rotation compose
and re-collide with level-1 copies). Cross-copy cosines decorrelate
under the differing masks, so ANN/near-dup structure scales linearly:
the same rationale as gen_sf1.py's rotation, applied as a second
independent orthogonal family.

Deterministic: no RNG anywhere.
"""
import os
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "sf1")
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "sf10")
COPIES = 10

os.makedirs(DST, exist_ok=True)

M64 = (1 << 64) - 1


def splitmix64(x):
    x = (x + 0x9E3779B97F4A7C15) & M64
    z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


emb = pq.read_table(f"{SRC}/embeddings.parquet")
v_span = pc.max(emb.column("vec_id")).as_py() + 1
vecs = emb.column("embedding").to_pylist()
dim = len(vecs[0])

out = f"{DST}/embeddings.parquet"
writer = pq.ParquetWriter(out, emb.schema)
total = 0
for j in range(COPIES):
    if j == 0:
        writer.write_table(emb)
        total += emb.num_rows
        print(f"copy {j}: {emb.num_rows} rows (verbatim)")
        continue
    c = splitmix64(j)
    mask = [-1.0 if (c >> (i % 64)) & 1 else 1.0 for i in range(dim)]
    flipped = [[x * m for x, m in zip(v, mask)] if v is not None else None
               for v in vecs]
    cols = []
    for name in emb.column_names:
        if name == "vec_id":
            cols.append(pc.add(emb.column(name),
                               pa.scalar(j * v_span, type=emb.column(name).type)))
        elif name == "embedding":
            cols.append(pa.array(flipped, type=emb.schema.field("embedding").type))
        else:
            cols.append(emb.column(name))
    t = pa.table(cols, schema=emb.schema)
    writer.write_table(t)
    total += t.num_rows
    print(f"copy {j}: {t.num_rows} rows (mask j={j})")
writer.close()
print(f"done -> {out} ({total} rows)")
