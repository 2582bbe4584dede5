"""r15 operator pins.

connected_components non-ASCII string ids (r14 ADVICE): the local
finish orders ids with numpy's Unicode code-point sort while the
distributed star path compares Spark UTF8String bytes — UTF-8 byte
order preserves code-point order by construction, so both paths must
pick the same minimum-id representative even for non-ASCII ids.
"""

import pytest


def _cc_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_cc_non_ascii_ids_local_matches_distributed(spark):
    from table_computing_spark.operators.graph import connected_components

    # ids straddling ASCII / Latin-1 / CJK / astral planes, arranged so
    # the minimum of each component is a different script class and so
    # code-point vs byte ordering would disagree if either path were
    # using a locale or UTF-16 collation: "Z" < "é" < "中" < "😀" in
    # both code-point and UTF-8 byte order.
    edges = [
        ("é-node", "中-node"), ("中-node", "😀-node"),  # min é-node
        ("Z-plain", "é-2"),                              # min Z-plain
        ("😀-a", "😀-b"),                                # min 😀-a
    ]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")

    local = _cc_map(connected_components(pairs))  # under threshold → local finish
    dist = _cc_map(connected_components(pairs, local_threshold=0))
    assert local == dist
    assert local["😀-node"] == "é-node"
    assert local["é-2"] == "Z-plain"
    assert local["😀-b"] == "😀-a"
