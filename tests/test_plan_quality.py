"""Plan-quality gates: the optimizations SURVEY §4 promises must actually
appear in the executed plans — pushdown, pruning, broadcast, bounded
shuffle counts.  These are the 100 TB safeguards; a regression here is a
perf bug even if results stay correct."""

from __future__ import annotations

import re

import pytest

from bigdataproject_formula1_telemetry_spark.plans import queries as Q
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    return Q.QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    assert m, plan
    prefix = m.group(1)  # toString truncates with '...' — check the prefix
    # pruned: scan starts with the needed measure columns, key columns absent
    assert "l_orderkey" not in prefix and "l_partkey" not in prefix
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        assert c in prefix


def test_small_dims_broadcast(spark):
    plan = plan_of(spark, "q03_star_join")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_asof_join_single_shuffle(spark):
    """The union+window as-of plan must stay one exchange + one sort —
    that's its whole scale advantage over a range join."""
    plan = plan_of(spark, "q22_asof_join")
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_topk_uses_window_group_limit(spark):
    """Spark 4 pushes rank<=k below the sort (WindowGroupLimit) — keeps
    per-group top-1 from materializing whole groups."""
    plan = plan_of(spark, "q05_top1_per_group")
    assert "WindowGroupLimit" in plan


def test_resample_shares_one_sort(spark):
    """Both bracketing windows (prev/next) share partitioning+ordering —
    must collapse into a single sort, not two."""
    plan = plan_of(spark, "q28_resample_grid")
    assert plan.count("Sort ") <= 2  # one for the window; AQE may add none
    assert plan.count("Window") <= 2


def test_partition_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdataproject_formula1_telemetry_spark import io

    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    root = str(tmp_path / "pp")
    io.write_partitioned(df, root, ("part",))
    pruned = io.read_partition(spark, root, part=2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "part" in m.group(1)


def test_q26_base_is_single_pass_via_barrier(spark):
    """q26 feeds its per-doc stats frame into ppl_buckets, which consumes
    it TWICE (tercile sketch + label join); the memory barrier must make
    both branches read the cached narrow frame instead of re-inlining the
    whole upstream lineage (LM train + perplexity scoring + nine Gopher
    rules) into each — at bench scale AQE exchange reuse happened to hide
    the recompute, but reuse is best-effort canonicalization while the
    barrier is structural."""
    plan = plan_of(spark, "q26_text_stats")
    assert plan.count("InMemoryTableScan") == 2


def test_q53_global_topk_is_take_ordered(spark):
    """The sorted-limit must compile to TakeOrderedAndProject (per-
    partition top-k + k-way driver merge), never a global sort."""
    plan = plan_of(spark, "q53_returned_top_customers")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 1  # nation side broadcast


def test_q52_nation_sides_broadcast(spark):
    """Both nation lookups (supplier path and customer path) broadcast —
    no shuffle keyed on a 25-row dim."""
    plan = plan_of(spark, "q52_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2


def test_lsh_pair_join_is_hash_partitioned_on_bucket(spark):
    """The minhash candidate self-join must shuffle on (band, bhash) —
    bounded-bucket equi-join, never a nested-loop/cartesian."""
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators import dedup

    docs = io.read_table(spark, SF_SMOKE, "documents")
    plan = (
        dedup.minhash_lsh_candidates(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_warehouse_partition_mode_single_exchange(spark):
    """The throughput-mode ETL must stay ONE shuffle (the repartition on
    lap keys) with no sort: the kernel handles ordering per group."""
    from bigdataproject_formula1_telemetry_spark import schemas
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P
    from tests import fixtures

    bronze = spark.createDataFrame(
        fixtures.gen_telemetry_raw(years=(2021,), rounds=(1,), laps_per_driver=2),
        schema=schemas.TELEMETRY_RAW,
    )
    plan = (
        P.build_warehouse(bronze)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Sort " not in plan, plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with ZERO
    exchanges — the co-located join that saves the big-fact shuffle at
    100 TB."""
    from pyspark.sql import functions as F

    from bigdataproject_formula1_telemetry_spark import io

    # saveAsTable writes under the session warehouse dir (gitignored
    # ./spark-warehouse locally); DROP TABLE below removes the data
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("vb")
    )
    io.write_bucketed(a, "bj_a", ("k",), n_buckets=8, sort_cols=("k",))
    io.write_bucketed(b, "bj_b", ("k",), n_buckets=8, sort_cols=("k",))
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = io.read_bucketed(spark, "bj_a").join(
            io.read_bucketed(spark, "bj_b"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
        # and a groupBy on the bucket key also skips its exchange
        agg = io.read_bucketed(spark, "bj_a").groupBy("k").agg(F.sum("va"))
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bj_a")
        spark.sql("DROP TABLE IF EXISTS bj_b")
