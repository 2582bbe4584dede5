import pytest

from table_computing_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tc-spark-tests", **{"spark.sql.shuffle.partitions": "8"})
    yield s


# ---------------------------------------------------------------------------
# Two-tier suite (r15, VERDICT task 2): the driver's verify window is
# ~20 min, the full suite ~46 min at 976 tests, so `pytest tests/`
# (what the driver runs) deselects the measured-slowest tests — the
# `deep` tier — via the committed list below. The tier split is purely
# duration-driven (tests/deep_tier.json, generated from a full
# --durations profile; every deselected test is still run in full-tier
# sweeps: `pytest tests/ -m deep` for the slow half, or
# `pytest tests/ -m "deep or not deep"` for everything). Coverage note:
# the deep tier holds redundant-expensive pins whose subject is also
# exercised by the default tier (the 368-query oracle sweep at sf0.001
# stays in the default tier in sampled form; the full sweep runs in the
# deep tier and in every round's driver-sim verify at sf0.01).
import json as _json
import os as _os


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "deep: measured-slow tests deselected from the driver tier"
    )


def _deep_ids():
    path = _os.path.join(_os.path.dirname(__file__), "deep_tier.json")
    try:
        with open(path) as f:
            return set(_json.load(f)["nodeids"])
    except (OSError, ValueError, KeyError):
        return set()


def pytest_collection_modifyitems(config, items):
    deep = _deep_ids()
    if not deep:
        return
    for item in items:
        if item.nodeid in deep:
            item.add_marker(pytest.mark.deep)
