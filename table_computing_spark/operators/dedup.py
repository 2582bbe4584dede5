"""Deduplication operators — exact and near-duplicate, at corpus scale.

Five strategies, all expression-first (no Python in the hot path):

  exact          — hash-groupBy on a normalized fingerprint.
  minhash_lsh    — word-shingle MinHash signatures + banded LSH:
                   candidates meet only inside a band bucket, so the
                   join is an equi-join on (band, band_hash) — shuffle
                   cost O(docs x bands), never O(docs^2).
  simhash        — 64-bit bit-majority fingerprint; near-dups =
                   small Hamming distance, blocked by 16-bit chunks
                   (pigeonhole: hamming<=3 => one of 4 chunks equal).
  ngram_jaccard  — exact token-set Jaccard via a shared-token join
                   (inverted-index style, pruned by document frequency).
  embedding      — cosine near-dup over vector columns (see similarity).

Scale notes: every strategy reduces to scan -> narrow transform ->
equi-join/groupBy, which Spark shuffles by key; nothing collects to the
driver. At 100 TB, minhash_lsh with (bands=16, rows=8) is the intended
workhorse; df-pruning in ngram_jaccard caps inverted-list explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table_computing_spark.operators.text import fingerprint, shingles, tokens


def exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per normalized-text fingerprint.
    Returns (id, fingerprint, group_size, is_canonical) for every row —
    filter is_canonical=1 to materialize the deduped corpus."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        fp.join(groups, "fingerprint")
        .withColumn(
            "is_canonical", (F.col(id_col) == F.col("canonical_id")).cast("int")
        )
        .select(id_col, "fingerprint", "canonical_id", "group_size", "is_canonical")
    )


def _minhash_signature(text_col, num_hashes: int, shingle_k: int):
    """num_hashes minhash values: min over shingles of xxhash64(shingle, seed).
    xxhash64 is a JVM builtin → vectorized, deterministic across runs."""
    sh = shingles(text_col, k=shingle_k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs.

    Pipeline: signature (narrow) → explode to (band, hash-of-rows)
    → self equi-join on the band bucket → estimate Jaccard as the
    fraction of agreeing signature positions → threshold.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("__id"),
        _minhash_signature(F.col(text_col), num_hashes, shingle_k).alias("__sig"),
    )
    banded = sig.select(
        "__id",
        "__sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("__sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "__sig", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sig").alias("sig_a"),
            F.col("b.__sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(len(range(num_hashes))))
    return (
        pairs.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash fingerprint per document: per token, xxhash64 bits
    vote +1/-1 per position; the sign of each position's sum is the
    fingerprint bit. Pure aggregate expressions."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"bit{i}")
            for i in range(64)
        ]
    )
    fp = F.lit(0).cast("bigint")
    for i in range(64):
        fp = fp + F.when(F.col(f"bit{i}") > 0, F.lit(1).cast("bigint") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return votes.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks (hamming<=3 guarantees at least one of 4 chunks is equal, so
    the candidate join is an equi-join per chunk, not a cross join)."""
    fps = simhash(df, text_col, id_col).withColumnRenamed(id_col, "__id")
    chunks = fps.select(
        "__id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("__id", "simhash", "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_token_df: int | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard similarity for all pairs sharing >= 1
    token, via an inverted-index self-join (never a cross join):

        tokens -> (token, id) -> join on token -> count shared
        jaccard = shared / (|A| + |B| - shared)

    `max_token_df` drops tokens appearing in more than N docs (stopword
    pruning) — essential at scale to bound the inverted-list join."""
    toks = (
        df.select(F.col(id_col).alias("__id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
    )
    if max_token_df is not None:
        dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        toks = toks.join(dfreq.filter(F.col("df") <= max_token_df), "tok")
        toks = toks.select("__id", "tok")
    sizes = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    shared = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
