"""Reproducible sampling for training-data pipelines.

A 100 TB corpus pipeline needs splits that are (a) deterministic across
runs and engines (no seed-dependent RNG state), (b) stable under
repartitioning, and (c) consistent for the same key everywhere (the
same document must land in the same split in every job). Hash-based
sampling gives all three: a row is kept iff a cryptographic hash of its
KEY falls under a threshold.

md5 is used (not xxhash64) because every engine agrees on it — the
DuckDB correctness oracle computes the identical sample. The first 8
hex chars are compared lexicographically against a threshold derived
from the fraction: uniform, portable, and pure codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of the hash — fraction resolution 2^-32


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS)


def sample_threshold(fraction: float) -> str:
    """Hex threshold string: keep iff md5-prefix < threshold.

    fraction >= 1.0 returns 'g', which sorts above every hex digit —
    a full-hex integer threshold would be 9 chars and compare
    lexicographically BELOW 'f…' prefixes."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    n = int(fraction * (16**_HEX_DIGITS))
    if n >= 16**_HEX_DIGITS:
        return "g"
    return format(n, f"0{_HEX_DIGITS}x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep ~`fraction` of rows, decided ONLY by the key: the same key
    is kept or dropped identically in every run, engine, and partition
    layout. The filter is a scan-level expression (no shuffle)."""
    return df.filter(_hash_prefix(F.col(key_col)) < F.lit(sample_threshold(fraction)))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Tag every row 'train' or 'test' by key hash — a reproducible
    held-out split that survives reprocessing and incremental appends
    (new rows with the same key join the same side)."""
    thr = F.lit(sample_threshold(test_fraction))
    return df.withColumn(
        split_col,
        F.when(_hash_prefix(F.col(key_col)) < thr, "test").otherwise("train"),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction, still keyed (same key → same decision). Strata absent
    from `fractions` are dropped — the training-mix downsampler."""
    expr = None
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == F.lit(stratum)) & (
            _hash_prefix(F.col(key_col)) < F.lit(sample_threshold(frac))
        )
        expr = cond if expr is None else (expr | cond)
    return df.filter(expr if expr is not None else F.lit(False))


def multi_split(
    df: DataFrame,
    group_col: str,
    fractions: "dict[str, float]",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe multi-way split: the assignment is decided ONLY by
    the hash of `group_col`, so every row of a group (all documents of
    one source, all events of one user) lands in the SAME split — the
    grouped analogue of train_test_split, preventing the classic
    train/test contamination where one entity straddles the boundary.

    `fractions` maps split name -> fraction; fractions must sum to
    <= 1.0 (any remainder is assigned to the LAST split listed, so
    {'train': .8, 'val': .1, 'test': .1} is exact). Assignment is a
    scan-level expression — no shuffle, stable under repartitioning
    and incremental appends."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1.0")
    h = _hash_prefix(F.col(group_col))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(sample_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: "str | None" = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-k by
    priority), the distributed form of Efraimidis–Spirakis A-ES: each
    row gets priority ln(u)/w with u a uniform derived from the md5 of
    its key — so inclusion probability is proportional to weight, yet
    the chosen set is a pure function of the data (same rows selected
    in every run, engine, and partition layout). Rows with
    non-positive weight are excluded.

    With `strata_col`, the top-k is per stratum (WindowGroupLimit —
    no global sort); otherwise the top-k is taken by orderBy+limit
    (plans as TakeOrderedAndProject — per-partition heaps, never a
    global sort) and only the k survivors are ranked. Adds `priority`
    (rounded to 6) and `rank`."""
    from pyspark.sql import Window

    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**_HEX_DIGITS))
    w = F.col(weight_col).cast("double")
    pri = F.log(u) / w
    scored = df.filter(w > 0).withColumn("__priority", pri)
    if strata_col is not None:
        win = Window.partitionBy(strata_col).orderBy(
            F.desc("__priority"), F.col(key_col)
        )
        picked = scored.withColumn("rank", F.row_number().over(win)).filter(
            F.col("rank") <= k
        )
    else:
        topk = scored.orderBy(F.desc("__priority"), F.col(key_col)).limit(k)
        # ranking k rows: the window runs over an already-tiny input
        picked = topk.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("__priority"), F.col(key_col))
            ),
        )
    return picked.withColumn("priority", F.round("__priority", 6)).drop(
        "__priority"
    )


def exact_k_sample(
    df: DataFrame, strata_col: str, key_col: str, k: int
) -> DataFrame:
    """EXACTLY k rows per stratum (fewer only when the stratum is
    smaller), chosen by md5-hash order of the key with key tiebreak —
    a uniform without-replacement sample that is a pure function of
    the data: reruns, retries, engines, and incremental re-extracts
    all pick the same rows. The fraction-based samplers above cannot
    promise a COUNT; eval sets and labeling budgets need one.

    Shape: one rank window PARTITIONED by stratum ordered by the key
    hash (the per-group-exact-order-statistic idiom shared with
    group_quantiles/conformal) + one filter. Output schema == input
    schema."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        _hash_prefix(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def temperature_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-based sampling weights across corpus groups
    (languages, domains, sources) — the multilingual rebalancing rule
    from XLM/mBERT-era training (Conneau & Lample 2019, public; α=0.3
    is the canonical low-resource boost, α=1 is proportional):

        p_g ∝ n_g/N,    q_g = p_g^α / Σ_h p_h^α

    The readout every mixture decision needs before a 100 TB training
    run: per group its natural share, its temperature-adjusted share,
    and the boost factor q/p (>1 = upsampled).

    Shape: ONE hash aggregate to the ≤|groups| count table; p^α terms
    are fixed-order doubles nano-rounded to DECIMAL before the
    group-count-sized normalization sum (reduce-order-free); the
    normalizer joins back broadcast. NULL groups drop. Output:
    (group, n, p_raw, p_sampled, boost)."""
    dec = "decimal(38,0)"
    per = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per.agg(F.sum("n").alias("__nn"))
    staged = per.crossJoin(F.broadcast(tot)).withColumn(
        "__pa",
        F.round(
            F.pow(
                F.col("n").cast("double") / F.col("__nn").cast("double"),
                F.lit(float(alpha)),
            )
            * 1e9
        ).cast(dec),
    )
    norm = staged.agg(F.sum("__pa").alias("__za"))
    out = staged.crossJoin(F.broadcast(norm))
    p = F.col("n").cast("double") / F.col("__nn").cast("double")
    q = F.col("__pa").cast("double") / F.col("__za").cast("double")
    return out.select(
        "group",
        F.col("n").cast("long").alias("n"),
        F.round(p, round_to).alias("p_raw"),
        F.round(q, round_to).alias("p_sampled"),
        F.round(q / p, round_to).alias("boost"),
    )
