#!/usr/bin/env python3
"""Build the 10x stress corpus SCALE.md measures against.

Usage: python3 scripts/make_scale10.py [src_sf_dir] [out_dir]
       python3 scripts/make_scale10.py --densify K [src_sf_dir] [out_dir]

documents/embeddings are replicated 10-fold with shifted ids (every
original row gains 9 exact clones -> dedup output inflates ~1000x, a
harder test than plain volume); events are replicated 10-fold with
shifted user_id AND event_id (10x the users over the SAME time range
-> 10x per-instant concurrency, the event-battery stress shape; the
round-8 ladder); lineitem/orders are replicated 10-fold with shifted
order AND entity keys (since round 9 — every clone is a DISJOINT copy
of the co-purchase/co-trade graphs: ~10x nodes and edges with the
degree distribution preserved exactly, the weak-scaling shape the
g-family ladder needs; r8-verdict item 4); the remaining tables are
copied as-is (their scale story is covered by the sf ladder itself,
and copying preserves the exact parquet types, e.g. events'
TIMESTAMP(NANOS)).

--densify K (r9-verdict item 4) builds the OTHER graph ladder the
weak-scaling clones deliberately exclude: lineitem is cloned K-fold
with shifted order keys but REUSED part keys (each clone shifts
l_partkey by just +i, staying inside the ~20k-part domain), so the
co-purchase graph keeps ~the same node set while every node's degree
multiplies ~K — the densifying shape whose d^2 wedge work is exactly
what kTruss's degree-ordered orientation + bounded rounds exist to
cut. Only lineitem densifies (g17 reads nothing else); the remaining
tables copy as-is.
"""
import shutil, sys, os
import pyarrow as pa
import pyarrow.parquet as pq

ID_SHIFT = 1_000_000
# user_id shift is EVEN so the e21/e28 parity-variant split is
# preserved per clone (each clone lands whole users in the same arm
# their original sits in).
USER_SHIFT = 10_000_000
# graph-table shifts: all far above the sf0.1 key domains (orderkey
# ~600k, partkey ~20k, suppkey/custkey ~15k), so the 10 clones'
# key ranges never collide and each clone is a disjoint subgraph
ORDER_SHIFT = 10_000_000
ENTITY_SHIFT = 1_000_000


def clone10(src, dst, id_cols, k=10):
    t = pq.read_table(src)
    parts = []
    for i in range(k):
        c = t
        for col, shift in id_cols:
            ids = pa.compute.add(c[col], i * shift)
            c = c.set_column(c.schema.get_field_index(col), col, ids)
        parts.append(c)
    out = pa.concat_tables(parts)
    pq.write_table(out, dst)
    print(f"{dst}: {out.num_rows} rows")


def densify(k, src_dir="/root/testdata/sf0.1", out_dir="/tmp/densify3"):
    """K-fold lineitem clones with DISJOINT orders but near-identical
    part keys (+i per clone): ~same co-purchase node set, degrees x~K.
    """
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(src_dir):
        if not f.endswith(".parquet"):
            continue
        src, dst = f"{src_dir}/{f}", f"{out_dir}/{f}"
        if f == "lineitem.parquet":
            clone10(src, dst,
                    [("l_orderkey", ORDER_SHIFT), ("l_partkey", 1)], k=k)
        else:
            shutil.copyfile(src, dst)
            print(f"{dst}: copied")


def main(src_dir="/root/testdata/sf0.1", out_dir="/tmp/scale10"):
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(src_dir):
        if not f.endswith(".parquet"):
            continue
        src, dst = f"{src_dir}/{f}", f"{out_dir}/{f}"
        if f == "documents.parquet":
            clone10(src, dst, [("doc_id", ID_SHIFT)])
        elif f == "embeddings.parquet":
            clone10(src, dst, [("vec_id", ID_SHIFT)])
        elif f == "events.parquet":
            clone10(src, dst,
                    [("event_id", ID_SHIFT), ("user_id", USER_SHIFT)])
        elif f == "lineitem.parquet":
            clone10(src, dst,
                    [("l_orderkey", ORDER_SHIFT),
                     ("l_partkey", ENTITY_SHIFT),
                     ("l_suppkey", ENTITY_SHIFT)])
        elif f == "orders.parquet":
            clone10(src, dst,
                    [("o_orderkey", ORDER_SHIFT),
                     ("o_custkey", ENTITY_SHIFT)])
        else:
            shutil.copyfile(src, dst)
            print(f"{dst}: copied")


def clone_stream(src, dst, id_cols, k):
    """K-fold clone with shifted ids, written one clone per row-group
    batch (never K copies in memory) — the 100x ladder's writer."""
    t = pq.read_table(src)
    writer = pq.ParquetWriter(dst, t.schema)
    n = 0
    for i in range(k):
        c = t
        for col, shift in id_cols:
            ids = pa.compute.add(c[col], i * shift)
            c = c.set_column(c.schema.get_field_index(col), col, ids)
        writer.write_table(c)
        n += c.num_rows
    writer.close()
    print(f"{dst}: {n} rows")


def scale(k, src_dir="/root/testdata/sf0.1", out_dir="/tmp/scale100"):
    """The Kx weak-scaling corpus for the battery heavyweights
    (r10-verdict item 8: confirm the 10x slopes hold a second decade):
    lineitem (g17's co-purchase graph — disjoint clone subgraphs),
    events (x10b's concurrency — Kx users over the same time range),
    documents (d12's segment dedup — every row gains K-1 exact clones),
    embeddings (the ANN lifecycle's vector corpus — n25/n29/st27's
    second-decade rung; same shifted-id clones the 10x corpus uses).
    Remaining tables copy as-is."""
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(src_dir):
        if not f.endswith(".parquet"):
            continue
        src, dst = f"{src_dir}/{f}", f"{out_dir}/{f}"
        if f == "documents.parquet":
            clone_stream(src, dst, [("doc_id", ID_SHIFT)], k)
        elif f == "embeddings.parquet":
            clone_stream(src, dst, [("vec_id", ID_SHIFT)], k)
        elif f == "events.parquet":
            clone_stream(src, dst,
                         [("event_id", ID_SHIFT),
                          ("user_id", USER_SHIFT)], k)
        elif f == "lineitem.parquet":
            clone_stream(src, dst,
                         [("l_orderkey", ORDER_SHIFT),
                          ("l_partkey", ENTITY_SHIFT),
                          ("l_suppkey", ENTITY_SHIFT)], k)
        else:
            shutil.copyfile(src, dst)
            print(f"{dst}: copied")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--densify":
        densify(int(sys.argv[2]), *sys.argv[3:])
    elif len(sys.argv) > 1 and sys.argv[1] == "--scale":
        scale(int(sys.argv[2]), *sys.argv[3:])
    else:
        main(*sys.argv[1:])
