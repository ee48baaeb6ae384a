"""Generate driver-compatible synthetic fixtures at any scale factor.

The driver ships sf0.001/0.01/0.1 under /root/testdata (read-only); the
r11 verdict's top ask is one more decade on the scaling curve, so this
script re-creates the same schema and distributions (measured from the
driver fixtures — row-count ratios, value ranges, category sets, the
planted 5% near-dup / ~0.3% exact-dup document structure, unit-norm
64-d embeddings with weak label signal) at arbitrary sf.  Values are
NOT bit-identical to the driver's (its generator is not shipped); the
scaling curve only needs the same shape and cardinalities, and every
oracle comparison runs Spark and DuckDB on the SAME files anyway.

Usage: python scripts/gen_testdata.py SF OUT_DIR [--seed 42]
   e.g. python scripts/gen_testdata.py 1 testdata_sf1
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["small", "large", "red", "blue", "hot", "cold", "old", "new"]
NOUNS = ["ring", "gear", "bolt", "plate", "anvil", "widget", "gizmo", "rod"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

DAY_US = 86_400_000_000


def _ts_col(days_lo: str, days_hi: str, n: int, rng, sort: bool = False):
    lo = np.datetime64(days_lo).astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64(days_hi).astype("datetime64[us]").astype(np.int64)
    v = rng.integers(lo, hi, n)
    if sort:
        v.sort()
    return v.astype("datetime64[us]")


def _dates(days_lo: str, days_hi: str, n: int, rng):
    lo = np.datetime64(days_lo).astype(np.int64)
    hi = np.datetime64(days_hi).astype(np.int64)
    return (
        rng.integers(lo, hi + 1, n).astype("datetime64[D]")
        .astype("datetime64[us]")
    )


def generate(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"  {name}: {table.num_rows} rows")

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    n_supp = int(10_000 * sf)
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    names = np.array([f"{a} {n}" for a in ADJS for n in NOUNS])
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array(names[rng.integers(0, 64, n_part)]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part), 2),
    }))

    n_ord = int(1_500_000 * sf)
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(_dates("1995-01-01", "2001-08-01", n_ord, rng)),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    n_li = int(6_000_000 * sf)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(_dates("1995-01-02", "2001-11-04", n_li, rng)),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = max(int(15_000 * sf), 1)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(_ts_col("2024-01-01", "2024-01-31", n_ev, rng, sort=True)),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    n_doc = int(50_000 * sf)
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    # planted duplicate structure (measured from the driver fixtures):
    # ~5% near-dups = another doc's text + ' dup', ~0.3% exact copies
    for i in rng.choice(n_doc, max(n_doc // 20, 1), replace=False):
        texts[i] = texts[int(rng.integers(0, n_doc))] + " dup"
    for i in rng.choice(n_doc, max(int(n_doc * 0.0032), 1), replace=False):
        j = int(rng.integers(0, n_doc))
        if j != i:
            texts[i] = texts[j]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = int(20_000 * sf)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = rng.standard_normal((n_emb, 64)) + 0.5 * centers[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument("out")
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(f"generating sf={a.sf} -> {a.out} (seed {a.seed})")
    generate(a.sf, a.out, a.seed)
