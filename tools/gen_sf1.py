#!/usr/bin/env python3
"""Local sf1/sf10/sf100 generator for scale-stress runs (SCALE.md).

Builds an N-replica copy of /root/testdata/sf0.1 with DISJOINT replicas
so heavyweight operator costs scale linearly by construction and any
super-linear runtime at the target SF is an ENGINE property, not a data
artifact:

- integer keys shift by a per-replica offset (joins stay within-replica,
  per-key group sizes preserved);
- document words get a per-replica prefix (replica vocabularies are
  disjoint -> n-gram/minhash candidate pairs are exactly Nx sf0.1's,
  no cross-replica near-dup explosion);
- event timestamps shift by a per-replica era (interval overlaps stay
  within-replica -> range-join pair count is exactly Nx);
- embeddings get small seeded per-replica noise (top-k geometry kept,
  no exact-duplicate vector explosion).

Replicas stream to the parquet writer ONE AT A TIME (r15: the 1000-
replica sf100 rung would otherwise hold ~15 GB of concatenated tables
in memory), and an optional table subset keeps the third-decade rung
to the law-carrying families' inputs.

Dev tool only (driver-side python); the Scala library never calls this.
Usage: python3 tools/gen_sf1.py [outdir] [replicas] [table,table,...]
       (default /tmp/testdata/sf1, 10 replicas, all tables;
        100 -> ~1.6 GB sf10; 1000 + "documents,embeddings" -> the
        sf100 rung for SCALE.md's third decade)
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
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
KEY_SHIFT = 10_000_000        # per-replica shift for dim/doc/vec/user keys
ORDER_SHIFT = 100_000_000     # per-replica shift for order/event ids

os.makedirs(OUT, exist_ok=True)


def wanted(name):
    return ONLY is None or name in ONLY


def stream(name, make_replica, schema):
    """Write REPLICAS row groups produced one at a time."""
    n = 0
    with pq.ParquetWriter(f"{OUT}/{name}.parquet", schema,
                          compression="snappy") as w:
        for i in range(REPLICAS):
            t = make_replica(i)
            w.write_table(t)
            n += t.num_rows
    print(f"{name}: {n} rows")


def tile(name, shifts):
    """REPLICAS copies with per-replica int64 column shifts, streamed."""
    if not wanted(name):
        return
    t = pq.read_table(f"{SRC}/{name}.parquet")

    def rep(i):
        cols = {}
        for field in t.schema:
            c = t.column(field.name)
            if field.name in shifts:
                c = pa.compute.add(c, shifts[field.name] * i)
            cols[field.name] = c
        return pa.table(cols, schema=t.schema)

    stream(name, rep, t.schema)


# dimension domain tables: fixed, copied once
for name in ("region", "nation"):
    if wanted(name):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{OUT}/{name}.parquet", compression="snappy")
        print(f"{name}: {t.num_rows} rows")

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
if wanted("events"):
    ev = pq.read_table(f"{SRC}/events.parquet")
    ts_type = ev.schema.field("ts").type
    ts = ev.column("ts").cast(pa.int64())
    span = pa.compute.max(ts).as_py() - pa.compute.min(ts).as_py()
    hour = {"ns": 3_600_000_000_000, "us": 3_600_000_000,
            "ms": 3_600_000, "s": 3_600}[ts_type.unit]
    era = span + hour  # +1h gap in the source unit

    def ev_rep(i):
        return pa.table({
            "event_id": pa.compute.add(ev.column("event_id"), ORDER_SHIFT * i),
            "ts": pa.compute.add(ts, era * i).cast(ts_type),
            "user_id": pa.compute.add(ev.column("user_id"), KEY_SHIFT * i),
            "event_type": ev.column("event_type"),
            "value": ev.column("value"),
            "props": ev.column("props"),
        }, schema=ev.schema)

    stream("events", ev_rep, ev.schema)

# documents: per-replica word-prefix namespace (replica 0 = original)
if wanted("documents"):
    doc = pq.read_table(f"{SRC}/documents.parquet")
    texts = doc.column("text").to_pylist()

    def doc_rep(i):
        if i == 0:
            txt, nchars = doc.column("text"), doc.column("n_chars")
        else:
            pref = f"r{i}"
            rewritten = [re.sub(r"(\S+)", pref + r"\1", s) if s else s
                         for s in texts]
            txt = pa.array(rewritten, pa.string())
            nchars = pa.array(
                [len(s) if s is not None else 0 for s in rewritten],
                pa.int64())
        return pa.table({
            "doc_id": pa.compute.add(doc.column("doc_id"), KEY_SHIFT * i),
            "text": txt,
            "lang": doc.column("lang"),
            "source": doc.column("source"),
            "n_chars": nchars,
        }, schema=doc.schema)

    stream("documents", doc_rep, doc.schema)

# embeddings: seeded small noise per replica (replica 0 = original)
if wanted("embeddings"):
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    sigma = 0.05 * float(vecs.std())

    def emb_rep(i):
        if i == 0:
            v = vecs
        else:
            rng = np.random.default_rng(42 + i)
            v = vecs + rng.normal(0.0, sigma, vecs.shape).astype(np.float32)
        return pa.table({
            "vec_id": pa.compute.add(emb.column("vec_id"), KEY_SHIFT * i),
            "embedding": pa.array([row for row in v.tolist()],
                                  pa.list_(pa.float32())),
            "label": emb.column("label"),
        }, schema=emb.schema)

    stream("embeddings", emb_rep, emb.schema)

print(f"done -> {OUT}")
