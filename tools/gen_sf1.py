#!/usr/bin/env python3
"""Generate an sf1 fixture decade under fixtures/sf1/ (dev tooling only —
NOT part of the engine; the driver's /root/testdata is read-only, so the
extra scaling decade lives inside the repo).

Schemas and value distributions mimic the driver's sf0.1 tables
(inspected, not copied): same columns/types, same categorical domains,
same word pool for document text (re-derived from sf0.1), ~10x rows
with key-space scaling matching the driver's own sf0.01->sf0.1 step
(10x parts/customers/users, same 30-day event window, same ~4
lineitems/order). Deterministic (numpy PCG64 seed 42). Intended solely
for the SCALING.md top-decade rehearsal of the heavy query set; oracle
correctness still runs against the driver's data.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

# Optional decade multiplier vs sf1 (tools/gen_sf1.py 10 -> fixtures/sf10
# with 10x sf1 rows; default 1 -> fixtures/sf1). Same seed, schemas and
# distributions either way.
SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 1
NAME = "sf1" if SCALE == 1 else f"sf{SCALE}"
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", NAME)
SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(42)


def write(name, table):
    os.makedirs(OUT, exist_ok=True)
    # row groups sized so file scans can split ~64 ways (parquet cannot
    # split below a row group; pyarrow's 1M-row default would make the
    # 50k-row documents table ONE unsplittable group)
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"),
                   row_group_size=max(1024, table.num_rows // 64))
    print(f"{name}: {table.num_rows} rows")


def documents(n=50_000):
    # re-derive the word pool from the driver's data so token statistics
    # (and therefore shingle/posting distributions) match
    pool = [r[0] for r in duckdb.sql(
        f"select distinct unnest(string_split(text,' ')) w "
        f"from '{SRC}/documents.parquet' order by 1").fetchall()]
    langs = ["en"] * 8 + ["zh", "zh", "es", "es", "fr", "fr", "de", "de"]
    texts, out_lang, out_src = [], [], []
    for i in range(n):
        wc = int(rng.integers(8, 101))
        words = [pool[int(j)] for j in rng.integers(0, len(pool), wc)]
        t = " ".join(words)
        r = rng.random()
        if i > 10 and r < 0.0016:           # exact duplicate pressure
            t = texts[int(rng.integers(0, i))]
        elif i > 10 and r < 0.05:           # shared-prefix near-dups
            donor = texts[int(rng.integers(0, i))]
            t = donor[: len(donor) // 2] + " " + t
        texts.append(t)
        out_lang.append(langs[int(rng.integers(0, len(langs)))])
        out_src.append(f"src{int(rng.integers(0, 20))}")
    write("documents", pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(out_lang),
        "source": pa.array(out_src),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def embeddings(n=20_000, dim=64, labels=10):
    v = np.clip(rng.normal(0.0, 0.125, (n, dim)), -0.4, 0.4).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, labels, n), pa.int32()),
    }))


def events(n=1_000_000, users=15_000):
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30, "D").astype("timedelta64[us]").astype(np.int64)
    ts = t0 + rng.integers(0, span, n).astype("timedelta64[us]")
    types = np.array(["click", "view", "signup", "purchase", "error"])
    write("events", pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(np.sort(ts) if False else ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(
            np.minimum(rng.exponential(60.0, n), 560.0), 2)),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, n)]),
    }))


def orders(n=1_500_000, customers=150_000):
    d0 = np.datetime64("1995-01-01", "us")
    span_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                    / np.timedelta64(1, "D"))
    days = rng.integers(0, span_days + 1, n)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                      "4-NOT SPECIFIED", "5-LOW"])
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, customers, n), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[
            rng.integers(0, 3, n)]),
        "o_totalprice": pa.array(np.round(
            rng.uniform(1000.0, 500000.0, n), 2)),
        "o_orderdate": pa.array(
            d0 + (days * 86_400_000_000).astype("timedelta64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n)]),
    }))


def lineitem(n=6_000_000, n_orders=1_500_000, parts=200_000, supps=10_000):
    d0 = np.datetime64("1995-01-02", "us")
    span_days = int((np.datetime64("2001-11-04") - np.datetime64("1995-01-02"))
                    / np.timedelta64(1, "D"))
    qty = rng.integers(1, 51, n).astype(np.float64)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, parts, n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, supps, n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(np.round(
            qty * rng.uniform(900.0, 1000.0, n), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(
            d0 + (rng.integers(0, span_days + 1, n)
                  * 86_400_000_000).astype("timedelta64[us]"),
            pa.timestamp("us")),
    }))


def part(n=200_000):
    adjs = ["large", "hot", "blue", "small", "red", "green", "dark", "light"]
    nouns = ["ring", "bolt", "gear", "cap", "tube", "disk", "rod", "pin"]
    types = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
    i = np.arange(n)
    write("part", pa.table({
        "p_partkey": pa.array(i, pa.int64()),
        "p_name": pa.array([f"{adjs[int(a)]} {nouns[int(b)]}" for a, b in
                            zip(rng.integers(0, 8, n), rng.integers(0, 8, n))]),
        "p_brand": pa.array([f"Brand#{int(b)}"
                             for b in rng.integers(0, 25, n)]),
        "p_type": pa.array(np.array(types)[rng.integers(0, 6, n)]),
        "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
        "p_retailprice": pa.array(np.round(900.0 + (i % 1000) / 10.0, 1)),
    }))


def customer(n=150_000):
    segs = ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
    write("customer", pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000.0, 10000.0, n), 2)),
        "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, n)]),
    }))


def supplier(n=10_000):
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000.0, 10000.0, n), 2)),
    }))


def copy_small():
    for t in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       os.path.join(OUT, f"{t}.parquet"))
        print(f"{t}: copied")


if __name__ == "__main__":
    documents(50_000 * SCALE)
    embeddings(20_000 * SCALE)
    events(1_000_000 * SCALE, users=15_000 * SCALE)
    orders(1_500_000 * SCALE, customers=150_000 * SCALE)
    lineitem(6_000_000 * SCALE, n_orders=1_500_000 * SCALE,
             parts=200_000 * SCALE, supps=10_000 * SCALE)
    part(200_000 * SCALE)
    customer(150_000 * SCALE)
    supplier(10_000 * SCALE)
    copy_small()
    print("done ->", os.path.abspath(OUT))
