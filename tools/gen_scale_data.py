#!/usr/bin/env python
"""Distribution-matched scale-up of the driver's synthetic tables.

The driver generates its own sfN datasets at measurement time (seed
unknown to us); `/root/testdata/` holds only sf0.001/0.01/0.1 and is
read-only.  For LOCAL performance measurement at the driver's recorded
measurement scale (BENCH_r09.json: sf=1.0) this script synthesizes a
dataset whose row counts, schemas, key cardinalities, value ranges and
text/token distributions match the driver's tables, scaled from the
observed sf0.1 copy.  It is NOT bit-identical to the driver's data and
must never be written under /root/testdata or used for oracle pinning —
measurement only.

Usage: python tools/gen_scale_data.py <out_dir> [sf]   # default sf=1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

REF = "/root/testdata/sf0.1"


def _write(df: pd.DataFrame, out_dir: str, name: str):
    path = os.path.join(out_dir, f"{name}.parquet")
    df.to_parquet(path, index=False)
    print(f"{name}: {len(df)} rows -> {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB)")


def main():
    out_dir = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    scale = sf / 0.1
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260822)

    # region / nation: fixed dimension tables, copy verbatim.
    for name in ("region", "nation"):
        df = pd.read_parquet(f"{REF}/{name}.parquet")
        _write(df, out_dir, name)

    n_cust = int(15000 * scale)
    n_supp = int(1000 * scale)
    n_part = int(20000 * scale)
    n_ord = int(150000 * scale)
    n_ev = int(100000 * scale)
    n_doc = int(5000 * scale)
    n_emb = int(2000 * scale)

    seg = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                    "HOUSEHOLD", "MACHINERY"])
    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": seg[rng.integers(0, len(seg), n_cust)],
    })
    _write(cust, out_dir, "customer")

    supp = pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    })
    _write(supp, out_dir, "supplier")

    ref_part = pd.read_parquet(f"{REF}/part.parquet")
    adjs = sorted({n.split()[0] for n in ref_part.p_name})
    nouns = sorted({n.split()[1] for n in ref_part.p_name})
    types = sorted(ref_part.p_type.unique())
    part = pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{adjs[int(a)]} {nouns[int(b)]}" for a, b in zip(
            rng.integers(0, len(adjs), n_part),
            rng.integers(0, len(nouns), n_part))],
        "p_brand": [f"Brand#{int(b)}" for b in
                    rng.integers(0, 25, n_part)],
        "p_type": [types[int(t)] for t in
                   rng.integers(0, len(types), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2),
    })
    _write(part, out_dir, "part")

    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                     "4-NOT SPECIFIED", "5-LOW"])
    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2404, n_ord).astype("timedelta64[D]"))
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(["P", "O", "F"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": prio[rng.integers(0, len(prio), n_ord)],
    })
    _write(orders, out_dir, "orders")

    nl = rng.integers(1, 8, n_ord)
    okey = np.repeat(orders.o_orderkey.values, nl)
    n_li = len(okey)
    lno = np.concatenate([np.arange(1, k + 1) for k in nl])
    ship = (np.repeat(odate, nl) +
            rng.integers(1, 122, n_li).astype("timedelta64[D]"))
    lineitem = pd.DataFrame({
        "l_orderkey": okey,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": lno.astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["N", "R", "A"])[
            rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ship.astype("datetime64[us]"),
    })
    _write(lineitem, out_dir, "lineitem")

    # events: same 30-day span, 10x denser (sessionization windows see
    # proportionally more rows per user — the worst case for the window
    # queries, which is the honest direction to stress).
    span_us = 30 * 86400 * 1_000_000
    ts = (np.datetime64("2024-01-01", "us") +
          np.sort(rng.integers(0, span_us, n_ev))
          .astype("timedelta64[us]"))
    etypes = np.array(["view", "click", "purchase", "signup", "error"])
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, int(1500 * scale),
                                n_ev).astype(np.int64),
        "event_type": etypes[rng.integers(0, len(etypes), n_ev)],
        "value": np.round(rng.uniform(0, 500, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    })
    _write(events, out_dir, "events")

    # documents: random word sequences over the observed vocabulary,
    # uniform word count matched to the observed 44-577 char range,
    # same lang/source mix, plus a ~0.2% exact-duplicate tail.
    ref_doc = pd.read_parquet(f"{REF}/documents.parquet")
    vocab = sorted({w for t in ref_doc.text for w in t.split()})
    wc = rng.integers(8, 106, n_doc)
    vocab_arr = np.array(vocab)
    texts = [" ".join(vocab_arr[rng.integers(0, len(vocab_arr), k)])
             for k in wc]
    dup_n = int(0.002 * n_doc)
    dup_to = rng.integers(0, n_doc, dup_n)
    dup_at = rng.integers(0, n_doc, dup_n)
    for a, b in zip(dup_at, dup_to):
        texts[int(a)] = texts[int(b)]
    langs = np.array(["en"] * 41 + ["zh"] * 15 + ["es"] * 15 +
                     ["fr"] * 15 + ["de"] * 14)
    docs = pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs[rng.integers(0, len(langs), n_doc)],
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
    })
    docs["n_chars"] = docs.text.str.len().astype(np.int64)
    _write(docs, out_dir, "documents")

    # embeddings: 10 gaussian clusters in 64-d, like the reference set.
    cent = rng.normal(0, 1, (10, 64)).astype(np.float32)
    lab = rng.integers(0, 10, n_emb)
    vecs = cent[lab] + rng.normal(0, 0.35, (n_emb, 64)).astype(
        np.float32)
    emb = pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": lab.astype(np.int32),
    })
    _write(emb, out_dir, "embeddings")


if __name__ == "__main__":
    main()
