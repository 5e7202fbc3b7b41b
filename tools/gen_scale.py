#!/usr/bin/env python3
"""Scale-data generator (sf0.3 / sf1) for the bench scaling curve.

Reproduces the driver testdata's schema and measured distributions
(TESTDATA.md; row counts, key ranges, value ranges, category mixes,
doc vocab and near-dup mechanism sampled from /root/testdata/sf0.1) at
larger scale factors, so Bench can measure how the headline queries grow
with input size. The driver data itself is read-only and stops at sf0.1.

Deterministic (seed 42). Output goes under /root/repo/scaledata/
(gitignored). Physical types mirror the driver files exactly, including
events.ts as TIMESTAMP(MICROS, no tz) — the encoding the driver files
carry since r6; Tables.normalizeEventTs dispatches on the loaded type,
so either generation loads — and orders/lineitem timestamps at
millisecond resolution.

Usage: python3 tools/gen_scale.py 0.3 1
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "/root/repo/scaledata"

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
ADJS = ["large", "hot", "blue", "small", "green", "dark", "light",
        "cold", "red", "plain"]
NOUNS = ["ring", "bolt", "gear", "wheel", "pipe", "plate", "rod",
         "cap", "valve", "disk"]
VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "the", "row", "agg", "key", "query", "a",
         "scan", "batch"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def day_ts_ms(rng, n, start, end):
    """Random midnight timestamps in [start, end], millis resolution."""
    s = np.datetime64(start).astype("datetime64[D]").astype(np.int64)
    e = np.datetime64(end).astype("datetime64[D]").astype(np.int64)
    days = rng.integers(s, e + 1, n)
    return pa.array(days.astype("datetime64[D]").astype("datetime64[ms]"))


def r2(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def gen(sf: float, scale_vocab: bool = False) -> None:
    rng = np.random.default_rng(42)
    tag = ("%g" % sf) + ("sv" if scale_vocab else "")
    out = f"{OUT}/sf{tag}"
    os.makedirs(out, exist_ok=True)

    def write(name, table):
        pq.write_table(table, f"{out}/{name}.parquet",
                       row_group_size=1_000_000)
        print(f"  {name}: {table.num_rows} rows")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS)}))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    k = np.arange(n_cust)
    write("customer", pa.table({
        "c_custkey": pa.array(k, pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in k]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(r2(rng, -1000, 10000, n_cust)),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)])}))

    k = np.arange(n_supp)
    write("supplier", pa.table({
        "s_suppkey": pa.array(k, pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in k]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(r2(rng, -1000, 10000, n_supp))}))

    k = np.arange(n_part)
    write("part", pa.table({
        "p_partkey": pa.array(k, pa.int64()),
        "p_name": pa.array([
            f"{ADJS[i % 10]} {NOUNS[(i // 10) % 10]}" for i in k]),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(900.0 + (k % 1000) / 10.0)}))

    ok = np.arange(n_ord)
    write("orders", pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(r2(rng, 1000, 500000, n_ord)),
        "o_orderdate": day_ts_ms(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)])}))

    lines = rng.integers(1, 8, n_ord)  # avg ~4 lines per order
    n_li = int(lines.sum())
    lkey = np.repeat(ok, lines)
    lno = np.concatenate([np.arange(1, c + 1) for c in lines])
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lno, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(float)),
        "l_extendedprice": pa.array(r2(rng, 900, 105000, n_li)),
        "l_discount": pa.array(r2(rng, 0, 0.10, n_li)),
        "l_tax": pa.array(r2(rng, 0, 0.08, n_li)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": day_ts_ms(rng, n_li, "1995-01-02", "2001-11-04")}))

    # events: ascending microsecond timestamps over 30 days (the driver
    # files are TIMESTAMP(MICROS, isAdjustedToUTC=0) since r6;
    # Tables.normalizeEventTs also accepts the older NANOS encoding)
    base = np.datetime64("2024-01-01").astype("datetime64[us]")
    offs = np.sort(rng.uniform(0, 30 * 86400 * 1e6, n_ev)).astype(np.int64)
    n_users = max(1, n_cust // 10)
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(base + offs.astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(r2(rng, 0, 560, n_ev)),
        "props": pa.array(
            [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)])}))

    # documents: 30-word vocab; ~1% near-dups (one word replaced by the
    # 'dup' marker token) and ~0.2% exact dups, as in the driver corpus.
    #
    # scale_vocab mode: real corpora grow vocabulary with size (Heaps'
    # law, V = K * N_tokens^beta — Heaps 1978; K=3, beta=0.6 here) with
    # Zipf-distributed word frequencies, instead of the driver corpus's
    # FIXED 30-word vocabulary, which saturates every shingle/band
    # bucket as the corpus grows (the sf3 stress artifact measured in
    # BASELINE.md). This mode exists to validate by contrast that the
    # superlinear sf3 candidate growth is a property of the synthetic
    # saturating vocabulary, not of the dedup kernels.
    if scale_vocab:
        n_tokens_est = n_doc * 56  # mean doc length ~56 tokens
        v_size = max(len(VOCAB), int(3 * n_tokens_est ** 0.6))
        vocab = np.array([f"w{i}" for i in range(v_size)])
        zipf_w = 1.0 / np.arange(1, v_size + 1) ** 1.05
        zipf_p = zipf_w / zipf_w.sum()
        print(f"  scale-vocab: {v_size} words (Heaps), zipf 1.05")
    else:
        vocab = np.array(VOCAB)
        zipf_p = None
    texts = []
    for i in range(n_doc):
        L = int(rng.integers(8, 106))
        if zipf_p is None:
            idx = rng.integers(0, len(vocab), L)
        else:
            idx = rng.choice(len(vocab), L, p=zipf_p)
        texts.append(" ".join(vocab[idx]))
    for i in rng.integers(1, n_doc, max(1, n_doc // 100)):
        words = texts[int(i) - 1].split(" ")
        words[int(rng.integers(0, len(words)))] = "dup"
        texts[int(i)] = " ".join(words)
    for i in rng.integers(1, n_doc, max(1, n_doc // 500)):
        texts[int(i)] = texts[int(i) - 1]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    emb = rng.normal(0, 0.12, (n_emb, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))


def main() -> None:
    scale_vocab = "--scale-vocab" in sys.argv
    sfs = [float(a) for a in sys.argv[1:]
           if a != "--scale-vocab"] or [0.3, 1.0]
    for sf in sfs:
        suffix = "sv" if scale_vocab else ""
        print(f"generating sf{sf:g}{suffix} under {OUT} ...")
        gen(sf, scale_vocab)


if __name__ == "__main__":
    main()
