"""Plan-fingerprint regression gate (r09 verdict task 2).

bench.py records a normalized physical-plan fingerprint per query in
BENCH_LOCAL.json["plan_sha"]; PLAN_FINGERPRINTS.json is the committed
baseline (promoted via tools/promote_plan_fingerprints.py). A query
whose fingerprint changed between baseline and the latest capture MUST
have its NEW sha adjudicated in PLANS.md — otherwise a silent plan
regression (a lost broadcast, an extra Exchange) would ride a bench
round unnoticed, and every timing swing re-litigates as a same-boot
re-run study. New queries (absent from the baseline) are exempt until
their first promotion.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str) -> dict:
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


# Plans whose RENDERING is a function of the session's expression-id
# counter, not of the physical strategy: RewriteDistinctAggregates
# orders its gid assignment by absolute exprId, so multi-count-distinct
# plans permute (gid=1 <-> gid=2, Expand row order) with how many
# frames were built earlier in the session — warm reps and outlier
# reruns shift that count between bench runs. The strategy itself
# (Expand -> double HashAggregate) is identical; only the text
# permutes. Exempted by NAME with this explanation — everything else
# stays exact (verified: full-surface reversed-order fresh-session
# recompute matches the baseline on all 289).
_ID_ORDER_SENSITIVE = {"q_count_distinct"}


def test_plan_sha_changes_are_adjudicated_in_plans_md():
    baseline = _load("PLAN_FINGERPRINTS.json").get("plan_sha", {})
    current = _load("BENCH_LOCAL.json").get("plan_sha", {})
    if not baseline or not current:
        import pytest

        pytest.skip("no fingerprint capture yet (pre-r10 BENCH_LOCAL)")
    with open(os.path.join(ROOT, "PLANS.md")) as f:
        plans_md = f.read()
    unadjudicated = []
    for name, sha in current.items():
        old = baseline.get(name)
        if old is None or old == sha or name in _ID_ORDER_SENSITIVE:
            continue
        # a changed plan is fine IF PLANS.md names the new fingerprint
        if sha not in plans_md:
            unadjudicated.append(f"{name}: {old} -> {sha}")
    assert not unadjudicated, (
        "plan fingerprints changed without a PLANS.md entry naming the "
        "new sha (run tools/promote_plan_fingerprints.py after writing "
        "the adjudication):\n" + "\n".join(unadjudicated)
    )


def test_plan_fingerprint_is_session_stable(spark):
    """The normalizer must strip every session-dependent token: the
    same logical query built twice (fresh expression ids) and against
    a different path must fingerprint identically."""
    from pyspark.sql import functions as F

    from table_computing_spark.plans import plan_fingerprint

    def build(tag):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        return df.groupBy("v").agg(F.sum("k").alias("s")).filter(F.col("s") > 0)

    # burn expression ids between the two builds
    spark.range(10).select((F.col("id") + 1).alias("x")).count()
    assert plan_fingerprint(build("a")) == plan_fingerprint(build("b"))
    # and a DIFFERENT plan must fingerprint differently
    other = (
        spark.createDataFrame([(1, "a")], "k long, v string")
        .groupBy("v")
        .agg(F.max("k").alias("s"))
    )
    assert plan_fingerprint(other) != plan_fingerprint(build("a"))
