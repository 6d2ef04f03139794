"""t2-style correctness gate, run locally: every declared query executes on
Spark and its oracle SQL on DuckDB over the same parquet tables; results
must match after canonical normalization.  Mirrors the driver's
CORRECTNESS_r{N}.json check at sf0.001 (fast) — the driver runs sf0.01."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE, assert_frames_match, register_views

from bigdataproject_formula1_telemetry_spark.plans import queries as Q

SF_DIR = os.environ.get("PARITY_SF_DIR", SF_SMOKE)

ORACLE_NAMES = sorted(Q.ORACLES)
ROWS_ONLY_NAMES = sorted(set(Q.QUERIES) - set(Q.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    register_views(duck, SF_DIR)
    sdf = Q.QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(Q.ORACLES[name]).fetchdf()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    df = Q.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    # stable schema: re-running yields identical results (determinism)
    a = df.toPandas()
    b = Q.QUERIES[name](spark, SF_DIR).toPandas()
    assert a.equals(b), f"{name}: nondeterministic output"


def test_every_registered_query_is_inside_the_driver_window():
    """The grading driver correctness-checks only the FIRST 50 registered
    queries.  The registry's invariant is that EVERY registered query is
    externally checked: at most 50 entries, each with an oracle, with the
    north-star (LLM-data) queries prioritized first."""
    names = list(Q.QUERIES)
    assert len(names) <= Q._DRIVER_WINDOW, (
        "registry exceeds the driver's check window — consolidate queries "
        "so none goes externally unverified"
    )
    assert tuple(names[: len(Q._CHECK_FIRST)]) == Q._CHECK_FIRST
    for n in names:
        assert n in Q.ORACLES, f"{n} registered without an oracle"
    # QUERIES and ORACLES iterate in the same order
    oracle_names = [n for n in names if n in Q.ORACLES]
    assert oracle_names == list(Q.ORACLES)
