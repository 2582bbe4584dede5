"""Self-consistent scale-family generator for the scaling-exponent audit.

The driver ships sf0.001/0.01/0.1 only; measuring how the cost-board
operators SCALE needs a third decade. Rather than guessing the driver's
generator, this produces its own family (same schemas, similar
distributions, fixed seed) at s in {0.01, 0.1, 1} under
`.scale/s{X}/` — exponents are fitted WITHIN this self-consistent
family, so absolute distribution differences vs the driver data don't
bias the slopes.

Distribution choices that matter for the exponents:
  - documents: words drawn from the same ~40-token vocabulary as the
    driver corpus (Zipf-ish weights), with a 3% planted near-duplicate
    rate (mutated copy of an earlier doc) so MinHash/SimHash/Jaccard
    see a realistic, scale-proportional pair volume.
  - embeddings: 64-dim Gaussian mixture around 8 label centroids so
    IVF/LSH see real cluster structure at every scale.
  - lineitem/orders/events: key cardinalities scale linearly with s
    (suppliers ~ 10/sf0.01 x s, users ~ 2k x s), value distributions
    scale-free.

Usage: python tools/gen_scale_data.py [--scales 0.01 0.1 1]
Writes parquet via pyarrow; events.ts is TIMESTAMP(ns) to match the
driver files (the loader's nanosAsLong path must engage identically).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "the a key order sort table scan merge part window small hash join "
    "batch stream spark group query row data slow filter customer line "
    "value agg big fast dup shard page cache disk net code plan cost "
    "stat tune"
).split()

BASE = {  # rows at s = 1.0
    "lineitem": 6_000_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    # documents follow the DRIVER's own scaling law (5k rows at sf0.1 →
    # 50k at sf1): on this ~31-token vocabulary Σ df² grows
    # quadratically with corpus size, so the inverted-index dedup
    # family is deliberately audited at corpus sizes where the
    # quadratic shape is measurable but feasible
    "documents": 20_000,
    # embeddings sized so fixed-cell ops (semantic_dedup bits=6) stay in
    # their designed envelope at s1; the "cells must scale with corpus"
    # requirement is itself a measured finding (PLANS.md r07)
    "embeddings": 20_000,
}


def _write(path: str, table: pa.Table) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path, compression="snappy")


def gen_documents(rng: np.random.Generator, n: int, out: str) -> None:
    p = np.arange(1, len(VOCAB) + 1, dtype=np.float64) ** -0.8
    p /= p.sum()
    lengths = rng.integers(10, 60, size=n)
    texts: "list[str]" = []
    for i in range(n):
        if i > 1000 and rng.random() < 0.03:
            # planted near-dup: copy an earlier doc, mutate one word
            src = texts[int(rng.integers(0, i - 1))].split()
            src[int(rng.integers(0, len(src)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(src))
        else:
            texts.append(" ".join(rng.choice(VOCAB, size=lengths[i], p=p)))
    langs = rng.choice(["en", "de", "es", "zh", "fr"], size=n, p=[0.6, 0.1, 0.1, 0.1, 0.1])
    srcs = [f"src{int(x)}" for x in rng.integers(0, 20, size=n)]
    _write(out, pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def gen_documents_heaps(rng: np.random.Generator, n: int, out: str) -> None:
    """Open-vocabulary corpus following Heaps' law (V ~ K·n^beta) with
    a Zipf rank-frequency draw — the realistic web-crawl shape the
    fixed ~40-token audit corpus deliberately is NOT. On this corpus a
    stopword-df cap (`max_token_df`) prunes only the Zipf head and
    KEEPS a long content-word tail, so the capped inverted-index
    jaccard path can be measured doing real work (r07 audit caveat:
    on the closed vocabulary the cap pruned every token)."""
    V = 50 + int(20 * n ** 0.62)
    vocab = np.array([f"w{k}" for k in range(V)])
    p = np.arange(1, V + 1, dtype=np.float64) ** -1.05
    p /= p.sum()
    lengths = rng.integers(10, 60, size=n)
    flat = rng.choice(V, size=int(lengths.sum()), p=p)
    texts: "list[str]" = []
    pos = 0
    for i in range(n):
        L = int(lengths[i])
        if i > 1000 and rng.random() < 0.03:
            src = texts[int(rng.integers(0, i - 1))].split()
            src[int(rng.integers(0, len(src)))] = vocab[int(rng.integers(0, V))]
            texts.append(" ".join(src))
        else:
            texts.append(" ".join(vocab[flat[pos:pos + L]]))
        pos += L
    langs = rng.choice(["en", "de", "es", "zh", "fr"], size=n, p=[0.6, 0.1, 0.1, 0.1, 0.1])
    srcs = [f"src{int(x)}" for x in rng.integers(0, 20, size=n)]
    _write(out, pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def gen_embeddings(rng: np.random.Generator, n: int, out: str) -> None:
    centroids = rng.normal(0, 1.0, size=(8, 64))
    labels = rng.integers(0, 8, size=n)
    vecs = centroids[labels] + rng.normal(0, 0.35, size=(n, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(out, pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    }))


def gen_lineitem(rng: np.random.Generator, n: int, s: float, out: str) -> None:
    n_orders = max(int(BASE["orders"] * s), 100)
    n_supp = max(int(1000 * s), 10)
    n_part = max(int(20_000 * s), 200)
    days = rng.integers(0, 2557, size=n) * 86_400_000_000  # us, 7 years
    _write(out, pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, size=n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, size=n).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 100_000, size=n), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, size=n), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, size=n), 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n).tolist()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], size=n).tolist()),
        # MICROSECOND timestamps like the driver's lineitem/orders —
        # only events.ts is TIMESTAMP(NANOS)
        "l_shipdate": pa.array(
            (np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64) + days)
            .astype("datetime64[us]")
        ),
    }))


def gen_orders(rng: np.random.Generator, n: int, s: float, out: str) -> None:
    n_cust = max(int(150_000 * s), 100)
    days = rng.integers(0, 2557, size=n) * 86_400_000_000
    _write(out, pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], size=n).tolist()),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 500_000, size=n), 2)),
        "o_orderdate": pa.array(
            (np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64) + days)
            .astype("datetime64[us]")
        ),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NONE"], size=n).tolist()
        ),
    }))


def gen_events(rng: np.random.Generator, n: int, s: float, out: str) -> None:
    n_users = max(int(20_000 * s), 50)
    base = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    offs = np.sort(rng.integers(0, 30 * 86_400_000_000_000, size=n))
    _write(out, pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array((base + offs).astype("datetime64[ns]")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "click", "cart", "purchase", "search"],
                       size=n, p=[0.5, 0.25, 0.12, 0.05, 0.08]).tolist()
        ),
        "value": pa.array(np.round(rng.exponential(20.0, size=n), 3)),
        "props": pa.array(['{"p":' + str(int(x)) + "}" for x in rng.integers(0, 100, size=n)]),
    }))


REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
P_TYPES = [
    f"{a} {b} {c}"
    for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
]


def gen_dims(rng: np.random.Generator, s: float, d: str) -> None:
    """Dimension tables mirroring the driver schemas so the ENTIRE
    query surface (TPC-H shapes included) runs on the scale family.
    Key cardinalities follow the same laws the fact generators assume
    (customers 150k·s, suppliers 1k·s, parts 20k·s)."""
    _write(os.path.join(d, "region.parquet"), pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    nkeys = np.arange(25, dtype=np.int32)
    _write(os.path.join(d, "nation.parquet"), pa.table({
        "n_nationkey": pa.array(nkeys, pa.int32()),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        "n_regionkey": pa.array((nkeys % 5).astype(np.int32), pa.int32()),
    }))
    n_cust = max(int(150_000 * s), 100)
    _write(os.path.join(d, "customer.parquet"), pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, size=n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, size=n_cust).tolist()),
    }))
    n_supp = max(int(1000 * s), 10)
    _write(os.path.join(d, "supplier.parquet"), pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, size=n_supp), 2)),
    }))
    n_part = max(int(20_000 * s), 200)
    colors = ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
              "black", "blanched", "blue", "blush"]
    _write(os.path.join(d, "part.parquet"), pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([
            f"{colors[i % 10]} {colors[(i // 10) % 10]} part{i}" for i in range(n_part)
        ]),
        "p_brand": pa.array(rng.choice(P_BRANDS, size=n_part).tolist()),
        "p_type": pa.array(rng.choice(P_TYPES, size=n_part).tolist()),
        "p_size": pa.array(rng.integers(1, 51, size=n_part).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, size=n_part), 2)),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+", type=float, default=[0.01, 0.1, 1.0])
    ap.add_argument("--root", default=os.path.join(os.path.dirname(__file__), "..", ".scale"))
    ap.add_argument(
        "--corpus", choices=["closed", "heaps"], default="closed",
        help="heaps: open Zipf/Heaps-law documents only, under heaps_s{X}/",
    )
    args = ap.parse_args()
    if args.corpus == "heaps":
        for s in args.scales:
            d = os.path.join(args.root, f"heaps_s{s:g}")
            rng = np.random.default_rng(42)
            gen_documents_heaps(
                rng, max(int(BASE["documents"] * s), 500),
                os.path.join(d, "documents.parquet"),
            )
            print("wrote", d)
        return
    for s in args.scales:
        d = os.path.join(args.root, f"s{s:g}")
        rng = np.random.default_rng(42)  # same seed: smaller scales are prefixes-in-law
        gen_documents(rng, max(int(BASE["documents"] * s), 500), os.path.join(d, "documents.parquet"))
        gen_embeddings(rng, max(int(BASE["embeddings"] * s), 200), os.path.join(d, "embeddings.parquet"))
        gen_lineitem(rng, max(int(BASE["lineitem"] * s), 1000), s, os.path.join(d, "lineitem.parquet"))
        gen_orders(rng, max(int(BASE["orders"] * s), 500), s, os.path.join(d, "orders.parquet"))
        gen_events(rng, max(int(BASE["events"] * s), 500), s, os.path.join(d, "events.parquet"))
        gen_dims(rng, s, d)
        print("wrote", d)


if __name__ == "__main__":
    main()
