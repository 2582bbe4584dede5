"""Bloom-filter join pruning: drop non-joining fact rows BEFORE the
shuffle.

When the dimension side of a join is too big to broadcast as a hash
table (tens of millions of keys) but the fact side is 100 TB, the
shuffle of never-to-match fact rows dominates the job. A Bloom filter
of the dimension keys is thousands of times smaller than the dimension
itself, broadcasts trivially, and eliminates almost every non-matching
fact row at the scan stage. The final equi-join stays exact: a Bloom
filter has no false negatives, and its false positives are removed by
the join itself — so `bloom_join` returns exactly the rows of the
plain inner join and oracle-checks against it.

Representation: `num_bits` bits packed into 64-bit words, built as a
DataFrame of (word_idx, word) rows via bit_or aggregation — at the
default 2^20 bits that is 16,384 rows (128 KiB), joined to the fact
side as `num_hashes` broadcast hash joins (one per probe), all
JVM-side codegen, no Python and no driver collect.

Spark 3.3+ can inject a similar runtime bloom filter itself
(spark.sql.optimizer.runtime.bloomFilter.enabled) when statistics make
the opportunity visible; this operator is the explicit form for when
the planner can't see it (e.g. the dimension is itself the output of
an upstream stage with no stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key, num_bits: int, num_hashes: int):
    """k deterministic bit positions for a key: xxhash64 with the probe
    index as a second hashed column gives k independent 64-bit hashes."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 3
) -> DataFrame:
    """Aggregate the dimension keys into a packed bitmap DataFrame of
    (word_idx: long, word: long). One narrow explode (k rows per key)
    and one hash aggregation — the result has at most num_bits/64 rows
    however large the dimension is."""
    pos = F.explode(F.array(*_positions(F.col(key_col), num_bits, num_hashes)))
    bits = dim.select(pos.alias("__pos")).select(
        F.shiftright("__pos", 6).alias("word_idx"),
        # shiftleft needs a literal count — variable shifts go via expr
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
            "__bit"
        ),
    )
    return bits.groupBy("word_idx").agg(F.bit_or("__bit").alias("word"))


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key tests positive in the bitmap:
    num_hashes broadcast joins on word_idx, each followed by a bit
    test. Rows failing any probe are dropped immediately — before any
    shuffle of the fact side."""
    out = fact
    for i, pos in enumerate(_positions(F.col(key_col), num_bits, num_hashes)):
        bm = bitmap.select(
            F.col("word_idx").alias(f"__w{i}"), F.col("word").alias(f"__word{i}")
        )
        out = (
            out.withColumn(f"__p{i}", pos)
            .join(
                F.broadcast(bm),
                F.shiftright(f"__p{i}", 6) == F.col(f"__w{i}"),
                "left",
            )
            .filter(
                # variable shift count — expr, shiftright only takes literals
                F.expr(
                    f"shiftright(coalesce(__word{i}, CAST(0 AS BIGINT)),"
                    f" CAST(__p{i} % 64 AS INT)) & CAST(1 AS BIGINT)"
                )
                == 1
            )
            .drop(f"__p{i}", f"__w{i}", f"__word{i}")
        )
    return out


def bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Exact `how`-join of fact to dim with the fact side Bloom-pruned
    first. Only dim-matching-only modes are legal: pruning drops fact
    rows BEFORE the join, which is invisible to inner/left_semi (no
    false negatives; false positives die in the final join) but would
    corrupt outer modes (a left join must keep non-matching fact rows
    with NULLs) and invert anti modes (survivors would be exactly the
    Bloom false positives)."""
    allowed = ("inner", "semi", "leftsemi", "left_semi")
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"bloom_join supports only {allowed}; {how!r} would change "
            "results because the fact side is pruned before the join — "
            "use a plain join for outer/anti modes"
        )
    bitmap = bloom_build(dim, dim_key, num_bits, num_hashes)
    pruned = bloom_prune(fact, fact_key, bitmap, num_bits, num_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
