"""Distributed BPE (byte-pair-encoding) vocabulary learning.

The classic subword tokenizer build (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public
algorithm): repeatedly count adjacent symbol pairs over the corpus and
merge the most frequent one. The distributed form rests on the
standard word-count reduction: BPE statistics depend only on the
corpus's DISTINCT words and their counts, so a 100 TB corpus first
collapses to a vocabulary table (one shuffle, ~millions of rows) and
every merge iteration then runs at vocabulary scale, not corpus scale.

Per iteration:
  1. explode each word's current token sequence into adjacent pairs,
     weighted by the word count — narrow + one hash aggregation;
  2. argmax pair by (count desc, pair asc — deterministic tie-break):
     a one-row driver pull (same bounded-scalar discipline as the
     connected-components rounds in operators/graph.py);
  3. apply the merge to every word's token list with a greedy
     left-to-right fold — a row-local `aggregate` expression, no
     Python, no shuffle.
The evolving vocabulary is localCheckpoint()ed periodically to keep
the plan depth O(1) across iterations.

`bpe_segment` applies a learned merge table to text with the standard
rank-greedy algorithm (lowest-rank pair merges first) as an
Arrow-vectorized pandas UDF — the apply side is embarrassingly
parallel and needs real loops, so Python is the honest vehicle there.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "▁"  # sentinel glued to the word end (SentencePiece-style)


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, n) distinct-word counts, lowercased, whitespace
    tokenized. The one corpus-scale shuffle of the whole build."""
    from table_computing_spark.operators.text import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_tokens() -> F.Column:
    """word -> [c1, c2, ..., ck + END_OF_WORD]"""
    chars = F.split(F.col("word"), "")
    last = F.concat(F.element_at(chars, -1), F.lit(END_OF_WORD))
    return F.concat(F.slice(chars, 1, F.size(chars) - 1), F.array(last))


def _apply_merge(tokens_col, left: str, right: str):
    """Greedy left-to-right single-pair merge as a fold: append each
    token unless it completes (left, right) at the tail, in which case
    the tail is replaced by the merged token. Correct for overlapping
    runs (aaa + (a,a) -> [aa, a]) because the merged tail no longer
    equals `left`."""
    merged = F.lit(left + right)
    return F.aggregate(
        tokens_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    checkpoint_every: int = 4,
) -> "tuple[list[tuple[int, str, str, int]], DataFrame]":
    """Learn `num_merges` BPE merges. Returns (merges, vocab_df):
    merges is [(iteration, left, right, pair_count)] in merge order;
    vocab_df is the final (word, n, tokens) vocabulary."""
    vocab = (
        word_vocab(df, text_col)
        .withColumn("tokens", _initial_tokens())
        .localCheckpoint()
    )
    merges: "list[tuple[int, str, str, int]]" = []
    for it in range(1, num_merges + 1):
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("tokens"), 1, F.size("tokens") - 1),
                        F.slice(F.col("tokens"), 2, F.size("tokens") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best or best[0]["cnt"] < 2:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((it, left, right, cnt))
        vocab = vocab.withColumn("tokens", _apply_merge(F.col("tokens"), left, right))
        if it % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def merges_df(spark, merges) -> DataFrame:
    """Merge list -> DataFrame (iteration, left, right, pair_count)."""
    return spark.createDataFrame(
        merges, "iteration int, left string, right string, pair_count bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a learned merge table: whitespace-split, then
    rank-greedy BPE per word (always merge the lowest-rank eligible
    pair — the standard apply algorithm, NOT the training-time greedy
    scan). Arrow-batched pandas UDF; ranks broadcast via closure."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}

    def encode_word(word: str) -> "list[str]":
        toks = list(word[:-1]) + [word[-1] + END_OF_WORD] if word else []
        while len(toks) > 1:
            best_rank, best_i = None, None
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
        return toks

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: "list[str]" = []
            for w in (t or "").lower().split():
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, seg(F.col(text_col)))
