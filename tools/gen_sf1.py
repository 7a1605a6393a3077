#!/usr/bin/env python3
"""Generate a deterministic sf1 dataset (10x sf0.1) for SCALE
measurement, under testdata/sf1 in the repo (the driver-provided
/root/testdata is read-only and tops out at sf0.1).

Construction: 10 key-shifted copies of every scaling table, with the
copy structure chosen so every operator's PROBLEM scales linearly —
the measurement target is plan behavior at 10x data, not data realism:

- Relational tables shift all foreign keys consistently (copy i adds
  i*maxKey to each key column), so join fan-outs and group
  cardinalities scale 10x with identical per-key distributions.
- documents: every word in copy i>0 gets a deterministic suffix
  (`w` -> `w<i>`), so copies share NO shingles/tokens with each other
  or the original: the near-dup/dup structure within each copy is
  exactly the original's, i.e. dup groups, LSH pairs and components
  all scale exactly 10x (a verbatim copy would instead near-dup every
  doc against its 9 clones and grow pairs quadratically, poisoning
  the scaling signal).
- embeddings: copy i cyclically rotates the 64 dims by i positions —
  norms and all WITHIN-copy pairwise cosines are preserved exactly
  (rotation is orthogonal), while cross-copy cosines are as random as
  the underlying vectors, so ANN/near-dup structure scales linearly.
- region/nation are dimensions and stay as-is.

Arrow schemas are preserved exactly (events.ts is TIMESTAMP(NANOS);
a pandas round-trip would silently rewrite it and break the reader).
Deterministic: no RNG anywhere.
"""
import os
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "sf1")
COPIES = 10

os.makedirs(DST, exist_ok=True)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def write(t, table):
    pq.write_table(table, f"{DST}/{t}.parquet")
    print(f"{t}: {table.num_rows} rows")


def shift(col, off):
    return pc.add(col, pa.scalar(off, type=col.type))


def shifted_copies(t, key_spans):
    """key_spans: {col: span} — copy i adds i*span to col."""
    base = read(t)
    parts = []
    for i in range(COPIES):
        cols = []
        for name in base.column_names:
            c = base.column(name)
            if name in key_spans and i > 0:
                c = shift(c, i * key_spans[name])
            cols.append(c)
        parts.append(pa.table(cols, schema=base.schema))
    write(t, pa.concat_tables(parts))


def span(t, col):
    tab = read(t)
    return pc.max(tab.column(col)).as_py() + 1


# --- dimensions: unchanged ---
for t in ("region", "nation"):
    write(t, read(t))

s_span = span("supplier", "s_suppkey")
p_span = span("part", "p_partkey")
c_span = span("customer", "c_custkey")
o_span = span("orders", "o_orderkey")
e_span = span("events", "event_id")
u_span = span("events", "user_id")
d_span = span("documents", "doc_id")
v_span = span("embeddings", "vec_id")

shifted_copies("supplier", {"s_suppkey": s_span})
shifted_copies("part", {"p_partkey": p_span})
shifted_copies("customer", {"c_custkey": c_span})
shifted_copies("orders", {"o_orderkey": o_span, "o_custkey": c_span})
shifted_copies("lineitem", {"l_orderkey": o_span, "l_partkey": p_span,
                            "l_suppkey": s_span})
shifted_copies("events", {"event_id": e_span, "user_id": u_span})

# --- documents: shift ids, suffix every word in copies > 0 ---
docs = read("documents")
parts = []
texts = docs.column("text").to_pylist()
for i in range(COPIES):
    if i == 0:
        parts.append(docs)
        continue
    new_texts = [" ".join(w + str(i) for w in t.split(" ")) if t is not None
                 else None for t in texts]
    ta = pa.array(new_texts, type=docs.schema.field("text").type)
    nc = pa.array([len(t) if t is not None else None for t in new_texts],
                  type=docs.schema.field("n_chars").type)
    cols = []
    for name in docs.column_names:
        if name == "doc_id":
            cols.append(shift(docs.column(name), i * d_span))
        elif name == "text":
            cols.append(ta)
        elif name == "n_chars":
            cols.append(nc)
        else:
            cols.append(docs.column(name))
    parts.append(pa.table(cols, schema=docs.schema))
write("documents", pa.concat_tables(parts))

# --- embeddings: shift ids, rotate dims by copy index ---
emb = read("embeddings")
vecs = emb.column("embedding").to_pylist()
parts = []
for i in range(COPIES):
    if i == 0:
        parts.append(emb)
        continue
    rot = [v[i:] + v[:i] if v is not None else None for v in vecs]
    va = pa.array(rot, type=emb.schema.field("embedding").type)
    cols = []
    for name in emb.column_names:
        if name == "vec_id":
            cols.append(shift(emb.column(name), i * v_span))
        elif name == "embedding":
            cols.append(va)
        else:
            cols.append(emb.column(name))
    parts.append(pa.table(cols, schema=emb.schema))
write("embeddings", pa.concat_tables(parts))

print("done ->", DST)
