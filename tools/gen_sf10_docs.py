#!/usr/bin/env python3
"""Generate the sf10 documents table (100x the driver's sf0.1) for the
dedup/text-family SCALE stretch, under testdata/sf10.

Same construction as gen_sf1.py's documents step, applied to the sf1
table: 10 doc_id-shifted copies, with every word in copy j>0 suffixed
by a LETTER 'a'..'i'. Level-1 (gen_sf1.py) suffixes are DIGITS, so the
two levels compose without collisions: copy (i, j) of an original word
w is w+digit(i)+letter(j), and no (i, j) != (i', j') pair collides —
a collision would make cross-copy near-dup pairs and grow the LSH
pair count quadratically in the copy count, poisoning the scaling
measurement (see gen_sf1.py's rationale).

Dup groups, shingle sets, LSH pairs, winnowing spans and entropy
distributions therefore all scale exactly 100x vs sf0.1. Streams one
copy at a time through a ParquetWriter so peak memory stays ~1 copy.
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

docs = pq.read_table(f"{SRC}/documents.parquet")
d_span = pc.max(docs.column("doc_id")).as_py() + 1
texts = docs.column("text").to_pylist()

out = f"{DST}/documents.parquet"
writer = pq.ParquetWriter(out, docs.schema)
total = 0
for j in range(COPIES):
    if j == 0:
        writer.write_table(docs)
        total += docs.num_rows
        print(f"copy {j}: {docs.num_rows} rows (verbatim)")
        continue
    suf = chr(ord("a") + j - 1)
    new_texts = [" ".join(w + suf for w in t.split(" ")) if t is not None
                 else None for t in texts]
    ta = pa.array(new_texts, type=docs.schema.field("text").type)
    nc = pa.array([len(t) if t is not None else None for t in new_texts],
                  type=docs.schema.field("n_chars").type)
    cols = []
    for name in docs.column_names:
        if name == "doc_id":
            cols.append(pc.add(docs.column(name),
                               pa.scalar(j * d_span, type=docs.column(name).type)))
        elif name == "text":
            cols.append(ta)
        elif name == "n_chars":
            cols.append(nc)
        else:
            cols.append(docs.column(name))
    t = pa.table(cols, schema=docs.schema)
    writer.write_table(t)
    total += t.num_rows
    print(f"copy {j}: {t.num_rows} rows (suffix '{suf}')")
writer.close()
print(f"done -> {out} ({total} rows)")
