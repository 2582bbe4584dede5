"""Probabilistic record linkage — Fellegi–Sunter scoring over blocked
candidate pairs.

Entity resolution across two sources (the classic data-integration
problem: same real-world entity, different keys) in the standard
decomposition (Fellegi & Sunter 1969, public method):

  1. BLOCK: a conjunction of cheap equality keys turns the A×B cross
     product into an equi-join — the only thing that makes linkage
     possible at scale (never compare all pairs).
  2. COMPARE: per-field agreement predicates (exact, bounded edit
     distance, numeric tolerance) evaluated per candidate pair.
  3. SCORE: each field contributes its log-likelihood weight —
     ln(m/u) on agreement, ln((1-m)/(1-u)) on disagreement, where m =
     P(agree | match) and u = P(agree | non-match) — summed into a
     match score; thresholds split match / possible / non-match.

m and u are caller-supplied here (the EM estimation loop is an
orchestration detail; with labeled data the weights are just
frequencies). Weights are Python-float literals folded into the plan,
and the score is a FIXED-ORDER sum of per-field terms — the same
expression in any engine gives the identical double.

Plan shape: one equi-join on the blocking key (shuffle or broadcast by
size), then row-local comparisons — cost is O(pairs sharing a block),
controlled entirely by blocking-key selectivity (check with
skew.key_skew_report before running at 100 TB).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldRule:
    """One comparison field: `agree(joined_df)` returns a boolean
    Column over the blocked-pair DataFrame; m/u are P(agree|match),
    P(agree|nonmatch)."""

    name: str
    agree: Callable[[DataFrame], Column]
    m: float
    u: float

    @property
    def agree_weight(self) -> float:
        return math.log(self.m / self.u)

    @property
    def disagree_weight(self) -> float:
        return math.log((1.0 - self.m) / (1.0 - self.u))


def score_pairs(
    a: DataFrame,
    b: DataFrame,
    block_cols: Sequence[str],
    rules: Sequence[FieldRule],
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_to: int = 6,
) -> DataFrame:
    """Blocked Fellegi–Sunter scoring: (id_a, id_b, <field flags...>,
    score). Columns of `a` are referenced as-is; columns of `b` must be
    pre-aliased by the caller (suffix them) except the shared blocking
    columns. The score adds field terms in rule order — deterministic
    and engine-portable."""
    joined = a.join(b, list(block_cols))
    score = None
    flags = []
    for r in rules:
        ag = r.agree(joined)
        flags.append(ag.cast("int").alias(f"agree_{r.name}"))
        term = F.when(ag, F.lit(r.agree_weight)).otherwise(
            F.lit(r.disagree_weight)
        )
        score = term if score is None else score + term
    return joined.select(
        F.col(id_a),
        F.col(id_b),
        *flags,
        F.round(score, round_to).alias("score"),
    )


def classify(scored: DataFrame, upper: float, lower: float) -> DataFrame:
    """Fellegi–Sunter decision rule: score >= upper → 'match',
    <= lower → 'non_match', else 'possible' (clerical review)."""
    return scored.withColumn(
        "decision",
        F.when(F.col("score") >= upper, "match")
        .when(F.col("score") <= lower, "non_match")
        .otherwise("possible"),
    )


def estimate_em(
    pairs: DataFrame,
    agree_cols: Sequence[str],
    iterations: int = 25,
    prior: float = 0.05,
) -> "tuple[list[tuple[float, float]], float]":
    """Estimate (m_k, u_k) per field and the match prior via EM over
    AGREEMENT PATTERNS (Winkler's standard unsupervised fit for
    Fellegi–Sunter weights). The E/M steps run on the driver — but over
    the ≤ 2^K distinct agreement patterns, not the pairs: Spark
    aggregates pattern counts once (one shuffle of K booleans), and the
    pattern space is independent of corpus size, so this is
    scale-correct at any pair count.

    Returns ([(m_k, u_k)...] in agree_cols order, match_prior).
    Conditional-independence assumption as usual; degenerate fits are
    clamped away from 0/1 for stability. Needs >= 3 comparison fields:
    with K=2 the model is underdetermined (4 patterns vs 5 free
    parameters) and the fit drifts — the classic identifiability
    condition for unsupervised Fellegi–Sunter."""
    if len(agree_cols) < 3:
        raise ValueError(
            "estimate_em needs >= 3 comparison fields (2^K patterns must "
            "exceed the 2K+1 free parameters)"
        )
    rows = pairs.groupBy(*agree_cols).agg(F.count(F.lit(1)).alias("__n")).collect()
    patterns = [
        ([int(bool(r[c])) for c in agree_cols], float(r["__n"])) for r in rows
    ]
    # collect() order is partition-dependent; the E/M accumulations sum
    # doubles in pattern order, so pin it for run-to-run (and oracle)
    # reproducibility
    patterns.sort(key=lambda t: t[0])
    k = len(agree_cols)
    m = [0.9] * k
    u = [0.1] * k
    p = prior

    def clamp(x: float) -> float:
        return min(0.9999, max(0.0001, x))

    for _ in range(iterations):
        # E-step: posterior match probability per pattern
        g_sum = 0.0
        n_sum = 0.0
        m_num = [0.0] * k
        u_num = [0.0] * k
        for bits, n in patterns:
            pm = p
            pu = 1.0 - p
            for i, b in enumerate(bits):
                pm *= m[i] if b else (1.0 - m[i])
                pu *= u[i] if b else (1.0 - u[i])
            g = pm / (pm + pu) if (pm + pu) > 0 else 0.0
            g_sum += g * n
            n_sum += n
            for i, b in enumerate(bits):
                if b:
                    m_num[i] += g * n
                    u_num[i] += (1.0 - g) * n
        # M-step
        if g_sum <= 0 or g_sum >= n_sum:
            break
        m = [clamp(m_num[i] / g_sum) for i in range(k)]
        u = [clamp(u_num[i] / (n_sum - g_sum)) for i in range(k)]
        p = clamp(g_sum / n_sum)
    return list(zip(m, u)), p
