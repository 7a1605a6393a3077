#!/usr/bin/env python3
"""Extend the 100x stretch to the RELATIONAL tables: 10 key-shifted
copies of testdata/sf1's supplier/part/customer/orders/lineitem/events
(which are themselves 10 key-shifted copies of the driver's sf0.1)
under testdata/sf10rel. Same construction and rationale as gen_sf1.py
— two shift levels compose because shifts are by the PARENT dir's key
span, so copy (i, j) occupies the disjoint range i*10*span0 + j*span0;
join fan-outs and per-key group distributions are exactly the
original's at 100x rows.

documents/embeddings are NOT built here: their 100x variants need the
suffix/sign-flip constructions (gen_sf10_docs.py / _embeddings.py) and
already exist under testdata/sf10. region/nation are dimensions and
copy through unchanged. Arrow-only transforms preserve schemas exactly
(events.ts stays TIMESTAMP(NANOS) / its sf1 vintage). Deterministic:
no RNG anywhere.
"""
import os
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "testdata", "sf1")
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "testdata", "sf10rel")
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
    return pc.max(read(t).column(col)).as_py() + 1


for t in ("region", "nation"):
    write(t, read(t))

s_span = span("supplier", "s_suppkey")
p_span = span("part", "p_partkey")
c_span = span("customer", "c_custkey")
o_span = span("orders", "o_orderkey")
e_span = span("events", "event_id")
u_span = span("events", "user_id")

shifted_copies("supplier", {"s_suppkey": s_span})
shifted_copies("part", {"p_partkey": p_span})
shifted_copies("customer", {"c_custkey": c_span})
shifted_copies("orders", {"o_orderkey": o_span, "o_custkey": c_span})
shifted_copies("lineitem", {"l_orderkey": o_span, "l_partkey": p_span,
                            "l_suppkey": s_span})
shifted_copies("events", {"event_id": e_span, "user_id": u_span})
print("done:", DST)
