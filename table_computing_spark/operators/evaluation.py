"""Model/retrieval evaluation operators — the readout side of the
training-data pipeline (classifier quality, ranking quality, summary
overlap). Complements classify.py (the models) and text.py (BM25/TF-IDF
retrieval) the way drift.py complements the ingest ops.

All engine-exact by the house discipline: exact integer counts from
hash aggregates, fixed-point nano/micro longs wherever a float SUM
would be order-dependent, one final double division, one round.

Reference parity note: the reference engine (alibaba/table-computing)
has no evaluation library — these are the pipeline-completing additions
the build brief asks for beyond `SURVEY.md §2`, in the same spirit as
dedup.py/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    label_col: Column,
    score_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Exact ROC AUC via the Mann–Whitney rank-sum identity (public,
    Hanley & McNeil 1982):

        AUC = (R⁺ − P(P+1)/2) / (P·N⁻)

    with R⁺ the sum of average ranks of the positives under ascending
    score (ties get the midrank). Everything stays in integers until
    one division: per distinct score s with n rows (n⁺ positive), the
    tied group's midrank is cum_before + (n+1)/2, so

        2·R⁺ = Σ_s n⁺ · (2·cum_before(s) + n + 1)

    — exact longs (DECIMAL past 2^63), then AUC = (2R⁺ − P(P+1)) /
    (2·P·N⁻) as a single double division.

    Scale shape: one hash aggregate onto DISTINCT scores, then the
    running count in score order via prefix.prefix_agg — the
    distributed two-pass prefix sum, never an unpartitioned window
    over data rows. Returns one row (auc, n_pos, n_neg)."""
    from table_computing_spark.operators.prefix import prefix_agg

    s = df.select(
        score_col.cast("double").alias("__s"),
        label_col.cast("int").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    per = s.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__np")
    )
    pre = prefix_agg(
        per, order_by=["__s"], specs={"__cb": ("sum", "__n")}, exclusive=True
    )
    dec = "decimal(38,0)"
    cb = F.coalesce(F.col("__cb"), F.lit(0)).cast(dec)
    r2 = (F.col("__np").cast(dec) * (F.lit(2).cast(dec) * cb
          + F.col("__n").cast(dec) + F.lit(1).cast(dec)))
    out = pre.agg(
        F.sum(r2).alias("__r2"),
        F.sum("__np").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("long").alias("n_neg"),
    )
    p = F.col("n_pos").cast(dec)
    u2 = F.col("__r2") - p * (p + F.lit(1).cast(dec))
    den = F.lit(2).cast(dec) * p * F.col("n_neg").cast(dec)
    return out.select(
        F.round(u2.cast("double") / den.cast("double"), round_to).alias("auc"),
        "n_pos",
        "n_neg",
    )


def classification_report(
    df: DataFrame,
    label_col: Column,
    pred_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-class precision / recall / F1 + supports, plus one
    `__macro__` row with the unweighted class means — the standard
    classifier readout next to calibration_bins.

    Exact counts from ONE (label, pred) hash aggregate (classes =
    labels ∪ predictions, so a class never predicted and a hallucinated
    class both still get their row). Ratios are single double
    divisions; F1 is fixed-point micro (round(f1·1e6) as long) so the
    macro mean is an exact long sum with one final division —
    engine-portable where a float sum of per-class F1s would be
    order-dependent. Zero denominators (no predictions / no support /
    p+r = 0) yield 0.0, the scikit-learn zero_division=0 convention."""
    pairs = df.select(
        label_col.cast("string").alias("__l"), pred_col.cast("string").alias("__p")
    ).groupBy("__l", "__p").agg(F.count(F.lit(1)).alias("__n"))
    classes = (
        pairs.select(F.col("__l").alias("clazz"))
        .union(pairs.select(F.col("__p").alias("clazz")))
        .distinct()
    )
    stats = classes.join(
        pairs.groupBy(F.col("__l").alias("clazz")).agg(
            F.sum("__n").alias("__support")
        ),
        "clazz", "left",
    ).join(
        pairs.groupBy(F.col("__p").alias("clazz")).agg(
            F.sum("__n").alias("__predicted")
        ),
        "clazz", "left",
    ).join(
        pairs.filter(F.col("__l") == F.col("__p"))
        .select(F.col("__l").alias("clazz"), F.col("__n").alias("__tp")),
        "clazz", "left",
    ).fillna(0, subset=["__support", "__predicted", "__tp"])
    tp = F.col("__tp").cast("double")
    prec = F.when(F.col("__predicted") > 0, tp / F.col("__predicted")).otherwise(0.0)
    rec = F.when(F.col("__support") > 0, tp / F.col("__support")).otherwise(0.0)
    f1 = F.when(prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)).otherwise(0.0)
    per = stats.withColumn(
        "__f1u", F.round(f1 * 1e6).cast("long")
    ).select(
        "clazz",
        F.col("__support").alias("support"),
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(F.col("__f1u").cast("double") / 1e6, round_to).alias("f1"),
        "__f1u",
        F.round(prec * 1e6).cast("long").alias("__pu"),
        F.round(rec * 1e6).cast("long").alias("__ru"),
    )
    macro = per.agg(
        F.lit("__macro__").alias("clazz"),
        F.sum("support").cast("long").alias("support"),
        F.round(F.sum("__pu").cast("double") / F.count(F.lit(1)) / 1e6,
                round_to).alias("precision"),
        F.round(F.sum("__ru").cast("double") / F.count(F.lit(1)) / 1e6,
                round_to).alias("recall"),
        F.round(F.sum("__f1u").cast("double") / F.count(F.lit(1)) / 1e6,
                round_to).alias("f1"),
    )
    return per.select("clazz", "support", "precision", "recall", "f1").unionByName(
        macro
    )


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: Column,
    rel_col: Column,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """NDCG@k per query (Järvelin & Kekäläinen 2002, public) with the
    natural-log discount variant (ln(pos+1) instead of log2 — ln is the
    one transcendental measured bit-identical across engines here,
    BASELINE.md portability notes; the constant factor cancels in the
    DCG/IDCG ratio anyway):

        DCG@k  = Σ_{pos≤k} (2^rel − 1) / ln(pos + 1)
        IDCG@k = the same over the query's rel values sorted desc
        NDCG   = DCG / IDCG   (1.0 when IDCG is 0 — all-zero rel)

    Ranking order is (score desc, item asc) — the deterministic-tiebreak
    contract. Per-position terms go to nano longs before summing (float
    sums are order-dependent); one final division. All windows are
    PARTITIONED by query. Output: (query, ndcg, n_rated)."""
    from pyspark.sql.window import Window as W

    base = df.select(
        F.col(query_col).alias("query"),
        F.col(item_col).alias("__item"),
        score_col.cast("double").alias("__score"),
        rel_col.cast("int").alias("__rel"),
    )
    gain = F.pow(F.lit(2.0), F.col("__rel").cast("double")) - F.lit(1.0)
    run = W.partitionBy("query").orderBy(
        F.col("__score").desc(), F.col("__item").asc()
    )
    ideal = W.partitionBy("query").orderBy(
        F.col("__rel").desc(), F.col("__item").asc()
    )
    ranked = base.select(
        "query",
        F.row_number().over(run).alias("__pos"),
        F.row_number().over(ideal).alias("__ipos"),
        gain.alias("__g"),
    )
    dterm = F.when(
        F.col("__pos") <= k,
        F.round(F.col("__g") / F.log(F.col("__pos").cast("double") + 1.0) * 1e9)
        .cast("long"),
    ).otherwise(F.lit(0))
    iterm = F.when(
        F.col("__ipos") <= k,
        F.round(F.col("__g") / F.log(F.col("__ipos").cast("double") + 1.0) * 1e9)
        .cast("long"),
    ).otherwise(F.lit(0))
    agg = ranked.groupBy("query").agg(
        F.sum(dterm).alias("__dcg"),
        F.sum(iterm).alias("__idcg"),
        F.count(F.lit(1)).alias("n_rated"),
    )
    return agg.select(
        "query",
        F.round(
            F.when(F.col("__idcg") > 0,
                   F.col("__dcg").cast("double") / F.col("__idcg").cast("double"))
            .otherwise(F.lit(1.0)),
            round_to,
        ).alias("ndcg"),
        "n_rated",
    )


def rouge_n(
    pairs: DataFrame,
    cand_col: str,
    ref_col: str,
    pair_col: str,
    n: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """ROUGE-N recall and precision per (candidate, reference) pair
    (Lin 2004, public): clipped n-gram overlap

        recall    = Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_g cnt_ref(g)
        precision = the same over Σ_g cnt_cand(g)

    — the summarization / dedup-quality readout. Tokenization is the
    repo-standard lowercase non-alphanumeric split; n-grams assemble
    from a posexplode + partitioned lead window (per-document — never
    global). Counts are exact; two divisions; pairs whose reference (or
    candidate) has < n tokens get NULL recall (resp. precision) —
    explicit, not silent 0. Output: (pair, n_overlap, n_ref, n_cand,
    rouge_recall, rouge_precision)."""
    from pyspark.sql.window import Window as W

    def grams(col: str, side: str) -> DataFrame:
        toks = pairs.select(
            F.col(pair_col).alias("pair"),
            F.posexplode(
                F.split(F.lower(F.col(col)), r"[^a-z0-9]+")
            ).alias("__pos", "__tok"),
        ).filter(F.col("__tok") != "")
        w = W.partitionBy("pair").orderBy("__pos")
        parts = [F.col("__tok")] + [
            F.lead("__tok", i).over(w) for i in range(1, n)
        ]
        g = toks.select(
            "pair", F.concat_ws(" ", *parts).alias("__g"),
            parts[-1].isNotNull().alias("__full"),
        ).filter(F.col("__full"))
        return g.groupBy("pair", "__g").agg(F.count(F.lit(1)).alias(f"__c_{side}"))

    c = grams(cand_col, "cand")
    r = grams(ref_col, "ref")
    joined = c.join(r, ["pair", "__g"], "full")
    agg = joined.groupBy("pair").agg(
        F.sum(
            F.least(F.coalesce(F.col("__c_cand"), F.lit(0)),
                    F.coalesce(F.col("__c_ref"), F.lit(0)))
        ).alias("n_overlap"),
        F.sum(F.coalesce(F.col("__c_ref"), F.lit(0))).alias("n_ref"),
        F.sum(F.coalesce(F.col("__c_cand"), F.lit(0))).alias("n_cand"),
    )
    # pairs can drop out entirely when BOTH sides have < n tokens; keep
    # them with NULL metrics via a left join from the pair list
    all_pairs = pairs.select(F.col(pair_col).alias("pair")).distinct()
    agg = all_pairs.join(agg, "pair", "left").fillna(
        0, subset=["n_overlap", "n_ref", "n_cand"]
    )
    rec = F.when(
        F.col("n_ref") > 0,
        F.col("n_overlap").cast("double") / F.col("n_ref").cast("double"),
    )
    prec = F.when(
        F.col("n_cand") > 0,
        F.col("n_overlap").cast("double") / F.col("n_cand").cast("double"),
    )
    return agg.select(
        "pair", "n_overlap", "n_ref", "n_cand",
        F.round(rec, round_to).alias("rouge_recall"),
        F.round(prec, round_to).alias("rouge_precision"),
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 60,
    top: int = 20,
    round_to: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009, public)
    of bounded ranked lists:  rrf(d) = Σ_lists 1/(k + rank_list(d)),
    items absent from a list contribute 0. THE standard way to merge a
    lexical (BM25) and a dense (cosine) retrieval run without score
    calibration.

    Inputs are already-bounded top-X lists (the TakeOrderedAndProject
    contract — each list is orderBy().limit() output, so every join
    here is broadcast-sized regardless of corpus size). Per-list ranks
    are 1/(k+r) doubles; the cross-list sum goes through nano longs so
    list order never flips a near-tie. Output: the global top-`top` by
    (rrf desc, id asc) with a dense final rank."""
    from functools import reduce

    from pyspark.sql.window import Window as W

    contribs = [
        r.select(
            F.col(id_col).alias("id"),
            F.round(F.lit(1e9) / (F.lit(k) + F.col(rank_col)).cast("double"))
            .cast("long")
            .alias("__nano"),
        )
        for r in rankings
    ]
    allc = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = allc.groupBy("id").agg(F.sum("__nano").alias("__s"))
    topd = fused.orderBy(F.col("__s").desc(), F.col("id").asc()).limit(top)
    w = W.orderBy(F.col("__s").desc(), F.col("id").asc())  # top rows only
    return topd.select(
        "id",
        F.round(F.col("__s").cast("double") / 1e9, round_to).alias("rrf"),
        F.row_number().over(w).alias("fused_rank"),
    )
