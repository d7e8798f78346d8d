#!/usr/bin/env python3
"""Local sf1 generator for scale-stress runs (SCALE.md round-8 task).

Builds a 10x replica of /root/testdata/sf0.1 with DISJOINT replicas so
heavyweight operator costs scale linearly by construction and any
super-linear runtime at sf1 is an ENGINE property, not a data artifact:

- integer keys shift by a per-replica offset (joins stay within-replica,
  per-key group sizes preserved);
- document words get a per-replica prefix (replica vocabularies are
  disjoint -> n-gram/minhash candidate pairs are exactly 10x sf0.1's,
  no cross-replica near-dup explosion);
- event timestamps shift by a per-replica era (interval overlaps stay
  within-replica -> range-join pair count is exactly 10x);
- embeddings get small seeded per-replica noise (top-k geometry kept,
  no exact-duplicate vector explosion).

Dev tool only (driver-side python); the Scala library never calls this.
Usage: python3 tools/gen_sf1.py [outdir] [replicas]
       (default /tmp/testdata/sf1, 10 replicas; 100 -> a ~1.6 GB sf10
       for the two-decade scale probes in SCALE.md)
"""
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
KEY_SHIFT = 10_000_000        # per-replica shift for dim/doc/vec/user keys
ORDER_SHIFT = 100_000_000     # per-replica shift for order/event ids

os.makedirs(OUT, exist_ok=True)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet", compression="snappy")
    print(f"{name}: {table.num_rows} rows")


def tile(name, shifts):
    """Concatenate REPLICAS copies with per-replica int64 column shifts."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(REPLICAS):
        cols = {}
        for field in t.schema:
            c = t.column(field.name)
            if field.name in shifts:
                c = pa.compute.add(c, shifts[field.name] * i)
            cols[field.name] = c
        parts.append(pa.table(cols, schema=t.schema))
    write(name, pa.concat_tables(parts))


# dimension domain tables: fixed, copied once
for name in ("region", "nation"):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    write(name, t)

tile("customer", {"c_custkey": KEY_SHIFT})
tile("supplier", {"s_suppkey": KEY_SHIFT})
tile("part", {"p_partkey": KEY_SHIFT})
tile("orders", {"o_orderkey": ORDER_SHIFT, "o_custkey": KEY_SHIFT})
tile("lineitem", {"l_orderkey": ORDER_SHIFT, "l_partkey": KEY_SHIFT,
                  "l_suppkey": KEY_SHIFT})

# events: shift ids AND the time axis (one disjoint era per replica).
# The time unit follows the SOURCE schema (testdata generations have
# shipped both timestamp[ns] and timestamp[us]): one hour expressed in
# that unit, cast back to the source type.
ev = pq.read_table(f"{SRC}/events.parquet")
ts_type = ev.schema.field("ts").type
ts = ev.column("ts").cast(pa.int64())
span = pa.compute.max(ts).as_py() - pa.compute.min(ts).as_py()
hour = {"ns": 3_600_000_000_000, "us": 3_600_000_000,
        "ms": 3_600_000, "s": 3_600}[ts_type.unit]
era = span + hour  # +1h gap in the source unit
parts = []
for i in range(REPLICAS):
    cols = {
        "event_id": pa.compute.add(ev.column("event_id"), ORDER_SHIFT * i),
        "ts": pa.compute.add(ts, era * i).cast(ts_type),
        "user_id": pa.compute.add(ev.column("user_id"), KEY_SHIFT * i),
        "event_type": ev.column("event_type"),
        "value": ev.column("value"),
        "props": ev.column("props"),
    }
    parts.append(pa.table(cols, schema=ev.schema))
write("events", pa.concat_tables(parts))

# documents: per-replica word-prefix namespace (replica 0 = original)
doc = pq.read_table(f"{SRC}/documents.parquet")
texts = doc.column("text").to_pylist()
parts = []
for i in range(REPLICAS):
    if i == 0:
        txt, nchars = doc.column("text"), doc.column("n_chars")
    else:
        pref = f"r{i}"
        rewritten = [re.sub(r"(\S+)", pref + r"\1", s) if s else s
                     for s in texts]
        txt = pa.array(rewritten, pa.string())
        nchars = pa.array([len(s) if s is not None else 0 for s in rewritten],
                          pa.int64())
    parts.append(pa.table({
        "doc_id": pa.compute.add(doc.column("doc_id"), KEY_SHIFT * i),
        "text": txt,
        "lang": doc.column("lang"),
        "source": doc.column("source"),
        "n_chars": nchars,
    }, schema=doc.schema))
write("documents", pa.concat_tables(parts))

# embeddings: seeded small noise per replica (replica 0 = original)
emb = pq.read_table(f"{SRC}/embeddings.parquet")
vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
sigma = 0.05 * float(vecs.std())
parts = []
for i in range(REPLICAS):
    if i == 0:
        v = vecs
    else:
        rng = np.random.default_rng(42 + i)
        v = vecs + rng.normal(0.0, sigma, vecs.shape).astype(np.float32)
    parts.append(pa.table({
        "vec_id": pa.compute.add(emb.column("vec_id"), KEY_SHIFT * i),
        "embedding": pa.array([row for row in v.tolist()],
                              pa.list_(pa.float32())),
        "label": emb.column("label"),
    }, schema=emb.schema))
write("embeddings", pa.concat_tables(parts))

print(f"done -> {OUT}")
