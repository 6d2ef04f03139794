"""Driver-facing query registry: one entry per implemented operator from
SURVEY.md §2, each with a DuckDB oracle SQL twin.

Conventions (driver contract, see __spark_entry__.py):
- every computed column is aliased identically in Spark and SQL;
- cross-engine float determinism: sums are rounded at (or beyond) their
  true decimal precision; averages divide a decimal-exact rounded sum by
  the exact count so both engines divide identical doubles; ratios/lerps
  and other division-derived values use portable floor-based rounding
  (``_pround``) because ``round()`` semantics diverge at representable
  midpoints (Spark HALF_UP vs DuckDB mathematical);
- integer-valued computed columns are cast to long/BIGINT on both sides
  (DuckDB SUM(int) yields HUGEINT otherwise);
- every ranking includes a unique tiebreaker column for determinism.

These rules are validated not just at the driver's sf0.01 gate but also
against a 10×-replicated sf0.1 dataset (see SCALING.md), which is what
exposed the average-midpoint class in the first place.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import functions as FN
from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import (
    asof,
    dedup,
    lm as LM,
    relational as R,
    resample,
    semdedup as SD,
    similarity as sim,
    text as T,
    urls as U,
    windows as W,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        import functools

        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release cache blocks left behind by the PREVIOUS registry
            # query's dedup/similarity barriers: queries return lazy
            # DataFrames, so a pipeline can only release its own barriers
            # after its terminal action — which the caller runs.  In a
            # long-lived sequential session (the grading driver, a
            # notebook) the previous query's action has completed by the
            # time the next query is built, so releasing here bounds the
            # session to ONE pipeline's DISK_ONLY blocks instead of
            # accumulating forever.  If a caller interleaves
            # (build A, build B, collect A), A's barriers recompute —
            # slower, never wrong (see dedup.release_barriers).
            from bigdataproject_formula1_telemetry_spark.operators import dedup as _dd

            _dd.release_barriers()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapper
        if sql is not None:
            ORACLES[name] = sql
        return wrapper

    return deco



def _pround(col, n: int):
    """Portable half-up rounding: floor(x*10^n + 0.5)/10^n.

    ``round()`` differs between engines at representable midpoints (Spark
    HALF_UP on the shortest decimal repr vs DuckDB mathematical rounding
    of the double) — division-derived values (averages, ratios, lerps)
    can land exactly on such midpoints.  floor-based rounding evaluates
    identically on the same IEEE double in every engine.  SQL twin:
    ``floor(x * 10^n + 0.5) / 10^n.0``."""
    f = 10 ** n
    return F.floor(col * F.lit(float(f)) + F.lit(0.5)) / F.lit(float(f))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # CONTRACT (documented in __spark_entry__): running any registry query
    # pins the caller session's spark.sql.session.timeZone to UTC, and the
    # setting persists on the session afterwards.  This is deliberate —
    # the grading driver calls queries() on a vanilla session, and
    # date_trunc/date_format/collected timestamps must align with the
    # DuckDB oracle regardless of host timezone.  Callers mixing in their
    # own timezone-sensitive queries should set their timezone after
    # running registry queries.
    # NB: conf.get(key, default) VALIDATES the default string in Spark 4.1
    # (an empty-string default raises INVALID_CONF_VALUE) — use the
    # no-default form; session.timeZone always resolves to a value.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return io.read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4: A1-A7) + scan/filter pushdown (S10, P1-P5)
# ---------------------------------------------------------------------------

@_q(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2)                                   AS sum_qty,
      round(sum(l_extendedprice), 2)                              AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
      floor(round(sum(l_quantity), 4) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_qty,
      floor(round(sum(l_extendedprice), 4) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_price,
      floor(round(sum(l_discount), 4) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_disc,
      count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4 — multi-key hash agg with mixed functions (the 80M→73k lap
    aggregation at F1_Data_PreProcessing.ipynb:288-306, TPC-H-Q1-shaped).
    Filter + column prune reach the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            _pround(F.round(F.sum("l_quantity"), 4) / F.count(F.lit(1)), 6).alias("avg_qty"),
            _pround(F.round(F.sum("l_extendedprice"), 4) / F.count(F.lit(1)), 6).alias("avg_price"),
            _pround(F.round(F.sum("l_discount"), 4) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "q02_filter_project",
    """
    SELECT l_orderkey, l_linenumber,
      round(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag IN ('A', 'R')
      AND l_discount BETWEEN 0.02 AND 0.08
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-P5 + F1 — conjunctive/membership/range predicates with a computed
    projection; all predicates push to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 30)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_discount").between(0.02, 0.08)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@_q(
    "q03_star_join",
    """
    SELECT r.r_name, n.n_name,
      count(*) AS n_cust,
      floor(round(sum(c.c_acctbal), 4) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q03_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — star joins against small dims, explicitly broadcast (the
    reference's dict-lookup joins, F1_web_dashboard_app.py:74-86)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _pround(F.round(F.sum("c_acctbal"), 4) / F.count(F.lit(1)), 6).alias("avg_bal"),
        )
    )


@_q(
    "q04_left_join_audit",
    """
    SELECT n.n_name,
      CAST(coalesce(a.cnt, 0) AS BIGINT) AS cust_cnt,
      round(coalesce(a.total_bal, 0), 2) AS total_bal
    FROM nation n
    LEFT JOIN (
      SELECT c_nationkey, count(*) AS cnt, sum(c_acctbal) AS total_bal
      FROM customer GROUP BY c_nationkey
    ) a ON n.n_nationkey = a.c_nationkey
    """,
)
def q04_left_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — planned-vs-actual reconciliation audit with NaN→0 fill
    (F1_Data_Test.ipynb:174-178)."""
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"), "n_name"
    )
    a = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"), F.sum("c_acctbal").alias("bal"))
    )
    return R.left_join_audit(n, a, ["key"], ["cust_cnt", "bal"]).select(
        "n_name",
        F.col("cust_cnt").cast("long").alias("cust_cnt"),
        F.round("bal", 2).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Window / ordered analytics (SURVEY §2.5)
# ---------------------------------------------------------------------------

@_q(
    "q05_top1_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) = 1
    """,
)
def q05_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/J5 — top-1 per group via row_number (the fastest-lap ``idxmin``
    pattern, F1_Preprocessed_Data_test.ipynb:67-68)."""
    o = _t(spark, sf_dir, "orders")
    return W.top_n_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        n=1,
    ).select("o_custkey", "o_orderkey", "o_totalprice")


@_q(
    "q06_window_ratio",
    """
    SELECT o_orderkey, o_custkey,
      floor(o_totalprice / min(o_totalprice) OVER (PARTITION BY o_custkey)
            * 1000000 + 0.5) / 1000000.0 AS price_ratio
    FROM orders
    """,
)
def q06_window_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-group min broadcast back to rows + ratio (the pace-ratio
    target, P1-...ipynb:263-267)."""
    o = _t(spark, sf_dir, "orders")
    return W.group_min_ratio(o, ["o_custkey"], "o_totalprice", "price_ratio").select(
        "o_orderkey", "o_custkey", _pround(F.col("price_ratio"), 6).alias("price_ratio")
    )


@_q(
    "q07_window_lag",
    """
    SELECT event_id, user_id,
      round(value - lag(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta
    FROM events
    """,
)
def q07_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W7 — per-key lag feature + ordered delta (P1-...ipynb:456-457)."""
    ev = _t(spark, sf_dir, "events")
    out = W.lag_features(ev, ["user_id"], ["ts", "event_id"], ["value"])
    return out.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.col("Prev_value"), 6).alias("delta"),
    )


@_q(
    "q08_window_cumsum",
    """
    SELECT event_id, user_id,
      round(sum(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value
    FROM events
    """,
)
def q08_window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — running sum in event order (cumulative race time,
    P1-...ipynb:585)."""
    ev = _t(spark, sf_dir, "events")
    out = W.cumulative_sum(ev, ["user_id"], ["ts", "event_id"], "value", "cum_value")
    return out.select(
        "event_id", "user_id", F.round("cum_value", 4).alias("cum_value")
    )


@_q(
    "q09_gaps_islands",
    """
    WITH f AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value > 250 THEN 1 ELSE 0 END AS flag
      FROM events
    ), c AS (
      SELECT *, CASE WHEN lag(flag) OVER w IS NULL
                       OR lag(flag) OVER w <> flag THEN 1 ELSE 0 END AS chg
      FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, CAST(sum(chg) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg_id
      FROM c
    )
    SELECT user_id, seg_id, count(*) AS n_events,
           min(ts) AS seg_start, max(ts) AS seg_end,
           round(max(value), 6) AS max_value
    FROM s WHERE flag = 1
    GROUP BY user_id, seg_id
    """,
)
def q09_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — gaps-and-islands segmentation (the coaching "slow zones" scan,
    P3-...ipynb:147-170) as two window passes + group-agg."""
    ev = _t(spark, sf_dir, "events")
    seg = W.segments(ev, F.col("value") > 250, ["user_id"], ["ts", "event_id"])
    return (
        seg.where(F.col("__flag") == 1)
        .groupBy("user_id", "seg_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("seg_start"),
            F.max("ts").alias("seg_end"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits / distinct (SURVEY §2.6) + set ops (§2.7)
# ---------------------------------------------------------------------------

@_q(
    "q10_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q10_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — sorted limit → TakeOrderedAndProject (last-5000-docs scan,
    F1-25_analyze_my_session.py:31)."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(
        100
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@_q(
    "q14_dedup_rank",
    """
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    """,
)
def q14_dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — deterministic dedup-by-key, keep earliest
    (drop_duplicates(subset=['Distance']), F1_Data_PreProcessing.ipynb:70)."""
    ev = _t(spark, sf_dir, "events")
    return R.dedup_by_key(ev, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


# ---------------------------------------------------------------------------
# Reference-signature filters (P7, P8)
# ---------------------------------------------------------------------------

@_q(
    "q16_107_rule",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT *, min(l_extendedprice) OVER (PARTITION BY l_orderkey) AS grp_min
      FROM lineitem
    ) WHERE l_extendedprice <= 1.07 * grp_min
    """,
)
def q16_107_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — the 107%-rule correlated group-min filter
    (F1_Data_PreProcessing.ipynb:313-326) on generic data."""
    li = _t(spark, sf_dir, "lineitem")
    return R.pct_of_group_min_filter(
        li, ["l_orderkey"], "l_extendedprice", pct=1.07
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@_q(
    "q17_group_size",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    """,
)
def q17_group_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — group-size filter (drop laps with <10 samples,
    F1_Data_PreProcessing.ipynb:71)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )


@_q(
    "q18_distinct_agg",
    """
    SELECT n.n_name,
      CAST(count(DISTINCT c.c_mktsegment) AS BIGINT) AS n_segments,
      count(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q18_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — distinct-set cardinality per group ($addToSet + $size audit,
    F1_Data_Test.ipynb:150-165)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@_q(
    "q19_cube",
    """
    SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q19_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 note — the per-year/per-compound report pair expressed as one
    CUBE (F1_Data_Interactive_Analysis.ipynb:29-62)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# ---------------------------------------------------------------------------

@_q(
    "q20_scalar_funcs",
    """
    SELECT o_orderkey,
      CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS prio_code,
      strftime(o_orderdate, '%Y-%m') AS order_month,
      lower(o_orderstatus) AS status_lc,
      CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      split_part(o_orderpriority, '-', 2) AS prio_name,
      regexp_replace(o_orderpriority, '[^A-Z]', '', 'g') AS prio_clean,
      concat_ws('|', o_orderstatus, split_part(o_orderpriority, '-', 2)) AS label
    FROM orders
    """,
)
def q20_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F5/F6/F8/F10 — casts, regex replace, split/lower/concat, date
    formatting (scattered sites, SURVEY §2.8)."""
    o = _t(spark, sf_dir, "orders")
    prio = F.split("o_orderpriority", "-")
    return o.select(
        "o_orderkey",
        prio.getItem(0).cast("long").alias("prio_code"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.lower("o_orderstatus").alias("status_lc"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        prio.getItem(1).alias("prio_name"),
        F.regexp_replace("o_orderpriority", "[^A-Z]", "").alias("prio_clean"),
        F.concat_ws("|", "o_orderstatus", prio.getItem(1)).alias("label"),
    )


@_q(
    "q21_minmax_scale",
    """
    SELECT event_id, round((value - 0.0) / 500.0, 6) AS scaled
    FROM events
    """,
)
def q21_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — fixed-physics-bounds min-max scaling as pure column math
    (MinMaxScaler fit on literals, F1_web_dashboard_app.py:451-453)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(FN.minmax_scale(F.col("value"), 0.0, 500.0), 6).alias("scaled")
    )


# ---------------------------------------------------------------------------
# As-of join / sessionization / event-time windows (J3, T-series analogs)
# ---------------------------------------------------------------------------

@_q(
    "q22_asof_join",
    """
    SELECT c.event_id, c.user_id, c.value, p.value AS prev_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q22_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — as-of (latest-value) join: every click gets the most recent
    prior purchase value per user (the recorder's curr_tel/curr_lap merge,
    F1-25_Telemetry_DB_Record.py:146-191).  Union+ordered-window plan —
    one shuffle, no range join; DuckDB verifies via native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    out = asof.asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        value_cols=["value"],
        tiebreak_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("asof_value").alias("prev_purchase_value"),
    )


@_q(
    "q23_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS tus FROM events
    ), m AS (
      SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                       OR tus - lag(tus) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, CAST(sum(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM m
    )
    SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def q23_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 analog — 30-minute-gap sessionization (gaps-and-islands on the
    time axis; batch twin of streaming session windows).  Exact µs integer
    arithmetic on both engines."""
    ev = _t(spark, sf_dir, "events").withColumn("tus", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("tus").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("tus") - prev > 1_800_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = ev.withColumn("session_id", F.sum(new_sess).over(wc).cast("long"))
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@_q(
    "q24_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
      count(*) AS n_events,
      round(sum(value), 4) AS sum_value,
      floor(round(sum(value), 4) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_value
    FROM events GROUP BY 1
    """,
)
def q24_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 analog — event-time tumbling window aggregation (batch twin of
    the watermarked streaming agg; sink-throttling bucket semantics,
    F1-25_Telemetry_DB_Record.py:183-191)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        _pround(F.round(F.sum("value"), 4) / F.count(F.lit(1)), 6).alias("avg_value"),
    )


@_q(
    "q28_resample_grid",
    """
    WITH s AS (
      SELECT user_id, CAST(epoch_us(ts) AS DOUBLE) AS x, value AS y FROM events
    ), b AS (
      SELECT user_id, min(x) AS xmin, max(x) AS xmax FROM s GROUP BY user_id
    ), g AS (
      -- bound derived from the data (global max grid steps per key), so
      -- the generator can never silently truncate at larger time spans
      SELECT b.user_id, b.xmin + k.k * 21600000000.0 AS gx
      FROM b, (SELECT unnest(range(0, (
        SELECT CAST(ceil((max(x) - min(x)) / 21600000000.0) AS BIGINT) + 1
        FROM s))) AS k) k
      WHERE k.k < CAST(ceil((b.xmax - b.xmin) / 21600000000.0) AS BIGINT)
    ), p AS (
      SELECT g.user_id, g.gx, s.x AS px, s.y AS py
      FROM g ASOF LEFT JOIN s ON g.user_id = s.user_id AND g.gx >= s.x
    ), n AS (
      SELECT p.user_id, p.gx, p.px, p.py, s.x AS nx, s.y AS ny
      FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.gx <= s.x
    )
    SELECT user_id, CAST(gx AS BIGINT) AS grid_us,
      floor((CASE WHEN nx = px THEN py
                 ELSE py + (gx - px) / (nx - px) * (ny - py) END)
            * 1000000 + 0.5) / 1000000.0 AS value_interp
    FROM n
    """,
)
def q28_resample_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 (scale mode) — pure-SQL linear resampling of each user's event
    series onto a 6-hour grid (the 10 m distance grid re-expressed on the
    time axis; F1_Data_PreProcessing.ipynb:65-103).  Grid explode + one
    per-key ordered window pass; DuckDB verifies with two ASOF joins."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tus"), "value"
    )
    step = 6 * 3600 * 1_000_000  # 6h in µs
    out = resample.resample_linear_sql(
        ev, ["user_id"], "tus", ["value"], step=float(step), start=None, edge="clamp"
    )
    return out.select(
        "user_id",
        F.col("tus").cast("long").alias("grid_us"),
        _pround(F.col("value"), 6).alias("value_interp"),
    )


# ---------------------------------------------------------------------------
# Training-data extensions: dedup / text / similarity (north star)
# ---------------------------------------------------------------------------

@_q(
    "q25_dedup_exact",
    """
    SELECT doc_id, lang, n_chars FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
)
def q25_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, deterministic keeper (north-star).
    (The r10 decontamination driver row lives in q29 — the curation-gate
    family — so this BENCHED entry keeps its exact-dedup identity and
    its round-over-round band stays comparable.)"""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).select("doc_id", "lang", "n_chars")


@_q(
    "q26_text_stats",
    """
    WITH t AS (
      SELECT doc_id, text,
        len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        x -> x <> '')) AS ntok
      FROM documents
    ), gtok AS (
      SELECT doc_id, text,
        list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    x -> x <> '') AS toks,
        list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                    x -> x <> '') AS ltoks,
        list_filter(list_transform(regexp_split_to_array(text, '\\n'),
                                   x -> trim(x)), x -> x <> '') AS lns
      FROM documents
    ), g AS (
      SELECT doc_id,
        len(toks) AS nw,
        CASE WHEN len(toks) > 0 THEN
          CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            / len(toks) ELSE 0 END AS mwl,
        CASE WHEN len(toks) > 0 THEN
          (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
           + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE)
             / 3.0) / len(toks) ELSE 0 END AS symr,
        CASE WHEN len(lns) > 0 THEN
          CAST(len(list_filter(lns, x -> regexp_matches(x, '^[•‣▪*\\-]')))
               AS DOUBLE) / len(lns) ELSE 0 END AS bullf,
        CASE WHEN len(lns) > 0 THEN
          CAST(len(list_filter(lns, x -> regexp_matches(x, '(\\.\\.\\.|…)$')))
               AS DOUBLE) / len(lns) ELSE 0 END AS ellf,
        CASE WHEN len(toks) > 0 THEN
          CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
               AS DOUBLE) / len(toks) ELSE 0 END AS alphaf,
        (CASE WHEN list_contains(ltoks, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(ltoks, 'be') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(ltoks, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(ltoks, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(ltoks, 'and') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(ltoks, 'that') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(ltoks, 'have') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(ltoks, 'with') THEN 1 ELSE 0 END) AS stw
      FROM gtok
    ), lt AS (
      SELECT doc_id,
        unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                           x -> x <> '')) AS tok
      FROM documents
    ), cnt AS (
      SELECT tok, count(*) AS c FROM lt GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
      FROM cnt
    ), lmt AS (
      SELECT tok,
        ln((CAST(c AS DOUBLE) + 1.0) / (n + 1.0 * (v + 1.0))) AS logp
      FROM cnt, tot
    ), sc AS (
      SELECT lt.doc_id, count(*) AS nt, sum(lmt.logp) AS lp
      FROM lt JOIN lmt USING (tok)
      GROUP BY lt.doc_id
    )
    , base AS (
    SELECT t.doc_id,
      CAST(t.ntok AS BIGINT) AS n_tokens,
      floor((CASE WHEN length(t.text) > 0
                 THEN CAST(length(regexp_replace(t.text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                      / length(t.text)
                 ELSE 0 END) * 1000000 + 0.5) / 1000000.0 AS punct_ratio,
      floor(CAST(length(t.text) AS DOUBLE) / t.ntok * 1000000 + 0.5) / 1000000.0
        AS avg_tok_len,
      floor(exp(-sc.lp / sc.nt) * 10000 + 0.5) / 10000.0 AS ppl,
      COALESCE(
        g.nw >= 40 AND g.nw <= 100000
        AND g.mwl >= 3.0 AND g.mwl <= 4.8
        AND g.symr <= 0.1 AND g.bullf <= 0.9 AND g.ellf <= 0.3
        AND g.alphaf >= 0.8 AND g.stw >= 1, FALSE) AS gopher_kept
    FROM t
    LEFT JOIN sc ON t.doc_id = sc.doc_id
    LEFT JOIN g ON t.doc_id = g.doc_id
    ), th AS (
      SELECT d.lang,
        quantile_disc(b.ppl, 1.0/3.0) AS t1,
        quantile_disc(b.ppl, 2.0/3.0) AS t2
      FROM base b JOIN documents d USING (doc_id)
      WHERE b.ppl IS NOT NULL
      GROUP BY d.lang
    )
    SELECT b.doc_id, b.n_tokens, b.punct_ratio, b.avg_tok_len, b.ppl,
      b.gopher_kept,
      CASE WHEN b.ppl IS NULL OR th.t1 IS NULL THEN NULL
           WHEN b.ppl <= th.t1 THEN 'head'
           WHEN b.ppl <= th.t2 THEN 'middle'
           ELSE 'tail' END AS ppl_bucket
    FROM base b
    JOIN documents d USING (doc_id)
    LEFT JOIN th ON d.lang IS NOT DISTINCT FROM th.lang
    """,
)
def q26_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality stats: token count, punctuation density, mean token
    length — JVM-side regex, no UDFs — plus CCNet-style corpus
    perplexity under a self-trained smoothed unigram LM
    (`operators/lm.py`: word-count train, broadcast-join score;
    north-star quality-filtering op).  Every doc_id is emitted: the
    perplexity frame only covers docs with ≥1 token, so it is LEFT
    joined (token-less/empty docs get NULL ppl, not silently dropped).

    ``gopher_kept`` exercises the published text-quality rule family
    end-to-end: the REAL ``text.gopher_filter`` operator (all nine
    Gopher A1.1 rules) runs with thresholds tuned so three rules bite
    on this corpus (min_words=40 → 331/500 at sf0.01, mean-word-len
    ≤ 4.8 → 466/500, ≥1 of the 8 required stopwords → 382/500; 282
    kept overall), and the oracle recomputes every rule in DuckDB —
    the q54 ``sem_kept`` pattern on the text-quality axis.

    ``ppl_bucket`` (r7) completes the CCNet release shape: per-language
    head/middle/tail terciles from the REAL ``lm.ppl_buckets`` operator
    over the rounded ppl column.  At full sketch accuracy Spark's
    ``percentile_approx`` returns the EXACT ceil(p·n)-rank order
    statistic — probed identical to DuckDB's ``quantile_disc`` across
    sizes and heavy-tie corpora — so the oracle recomputes the cut
    points and labels engine-exactly."""
    from bigdataproject_formula1_telemetry_spark.operators import dedup as _dd

    docs = _t(spark, sf_dir, "documents")
    model = LM.unigram_lm(docs)
    ppl = LM.doc_perplexity(docs, model).select(
        "doc_id", _pround(F.col("ppl"), 4).alias("ppl")
    )
    gf = (
        T.gopher_filter(
            docs.select("doc_id", "text"),
            min_words=40,
            max_mean_word_len=4.8,
            min_stopword_hits=1,
        )
        .select("doc_id")
        .withColumn("__gk", F.lit(True))
    )
    ntok = T.token_count(F.col("text"))
    base = (
        docs.select(
            "doc_id",
            "lang",
            ntok.cast("long").alias("n_tokens"),
            _pround(T.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
            _pround(F.length("text").cast("double") / ntok, 6).alias("avg_tok_len"),
        )
        .join(ppl, "doc_id", "left")
        .join(gf, "doc_id", "left")
        .withColumn("gopher_kept", F.coalesce(F.col("__gk"), F.lit(False)))
        .drop("__gk")
    )
    # barrier before the two-pass bucketing: ppl_buckets consumes `base`
    # twice (tercile sketch + label join), and without a barrier Catalyst
    # re-inlines the ENTIRE upstream lineage — LM train, perplexity
    # scoring, all nine Gopher rules — into both branches (measured: 14
    # documents scans / 30 exchanges vs 7 / ~15 with it).  `base` is the
    # narrow per-doc stats frame (7 scalar columns, no text), so caching
    # it costs ~tens of bytes per doc — the persist-vs-recompute call is
    # the OPPOSITE of span dedup's O(n_tokens) frame (SCALING.md r6 A/B).
    base = _dd._barrier(base, "memory")
    return LM.ppl_buckets(
        base, ppl_col="ppl", lang_col="lang", accuracy=1_000_000
    ).drop("lang")


@_q(
    "q29_lang_id",
    """
    WITH t AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                    x -> x <> '') AS toks
      FROM documents
    ), nt AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> '') AS t
      FROM documents
    ), bg AS (
      -- benchmark 8-grams: tokens 6..17 of every doc_id%7==0 doc yield
      -- five overlapping 8-grams each (planted so the gate BITES)
      SELECT DISTINCT array_to_string(nt.t[6 + g.k : 13 + g.k], ' ') AS gram
      FROM nt, (SELECT unnest(range(0, 5)) AS k) g
      WHERE doc_id % 7 = 0 AND len(nt.t) >= 17
    ), cg AS (
      SELECT doc_id, array_to_string(t[p + 1 : p + 8], ' ') AS gram
      FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - 7, 0))) AS p
            FROM nt)
    ), bad AS (
      SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)
    ), se_tb AS (
      -- hashed-BoW embedding (embed.py md5 bucket+sign, dim 256): the
      -- semantic-decontamination twin — benchmark = word-REVERSED
      -- doc_id%13==0 texts, whose bag-of-words vectors equal the
      -- source docs' own vectors exactly (integer +/-1 sums), so the
      -- oracle uses the docs' vectors directly
      SELECT doc_id,
        CAST(('0x' || substr(md5('hashemb|' || tok), 1, 8)) AS UBIGINT)
          % 256 AS b,
        CASE WHEN (strpos('0123456789abcdef',
                          substr(md5('hashemb|' || tok), 9, 1)) - 1) % 2 = 0
             THEN 1.0 ELSE -1.0 END AS s
      FROM (
        SELECT doc_id,
          unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                                                   '\\s+'),
                             x -> x <> '')) AS tok
        FROM documents
      )
    ), se_v AS (
      SELECT doc_id, b, sum(s) AS v FROM se_tb GROUP BY doc_id, b
    ), se_n AS (
      SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM se_v GROUP BY doc_id
    ), se_x AS (
      SELECT v.doc_id, v.b, v.v / n.nrm AS x
      FROM se_v v JOIN se_n n USING (doc_id) WHERE n.nrm > 0
    ), se_bad AS (
      SELECT DISTINCT doc_id FROM (
        SELECT d.doc_id, bch.doc_id AS bid, sum(d.x * bch.x) AS cs
        FROM se_x d JOIN se_x bch ON d.b = bch.b
        WHERE bch.doc_id % 13 = 0
        GROUP BY d.doc_id, bch.doc_id
        HAVING sum(d.x * bch.x) >= 0.9
      )
    ), h AS (
      SELECT doc_id,
        len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS h_de,
        len(list_filter(toks, x -> x IN ('the','and','of','to','is')))   AS h_en,
        len(list_filter(toks, x -> x IN ('el','la','de','que','los')))   AS h_es,
        len(list_filter(toks, x -> x IN ('le','la','les','des','est')))  AS h_fr
      FROM t
    )
    , lang AS (
    SELECT doc_id,
      CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
           WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
           WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
           WHEN h_es >= h_fr THEN 'es'
           ELSE 'fr' END AS lang_pred
    FROM h
    ), u AS (
      SELECT doc_id,
        'https://www.' ||
        (CASE doc_id % 4 WHEN 0 THEN 'news-site' WHEN 1 THEN 'spamfarm'
                         WHEN 2 THEN 'blogs' ELSE 'casino-hub' END) ||
        (CASE doc_id % 3 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
                         ELSE '.org' END) ||
        '/page/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, url,
        regexp_replace(lower(regexp_extract(url,
          '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#:]+)', 1)),
          '^www\\.', '') AS host
      FROM u
    ), dom AS (
      SELECT doc_id, url, host,
        CASE
          WHEN len(string_split(host, '.')) <= 2 THEN host
          WHEN array_to_string(string_split(host, '.')[-2:], '.') IN
               ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
                'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',
                'com.mx','com.tr','com.ar','co.in','co.kr','co.za',
                'co.nz')
               AND len(string_split(host, '.')) >= 3
          THEN array_to_string(string_split(host, '.')[-3:], '.')
          ELSE array_to_string(string_split(host, '.')[-2:], '.')
        END AS domain
      FROM parts
    )
    SELECT l.doc_id, l.lang_pred, d.host, d.domain,
      NOT (
        d.host = 'spamfarm.com' OR d.host LIKE '%.spamfarm.com'
        OR regexp_matches(d.url, '(?i)(casino)')
      ) AS url_kept,
      -- PII scrub oracle (r10): the planted email/IPv4/phone strings are
      -- doc_id-parameterized, so the chars a CORRECT redaction removes
      -- are pure arithmetic over the id's digit lengths: email drops
      -- 1+len(id) ('u<id>@ex.com' -> '<EMAIL>'), IPv4 drops
      -- 2+len(id%250)+len(id%200) ('10.0.A.B' -> '<IP>'), phone drops 1
      -- ('555-12XY' -> '<PHONE>'); the digit/@-stripped base text must
      -- contribute NOTHING (a false-positive redaction there breaks the
      -- equality)
      CAST(4 + length(CAST(l.doc_id AS VARCHAR))
             + length(CAST(l.doc_id % 250 AS VARCHAR))
             + length(CAST(l.doc_id % 200 AS VARCHAR))
           AS BIGINT) AS pii_redacted_chars,
      (b.doc_id IS NULL) AS contam_free,
      (sb.doc_id IS NULL) AS sem_free,
      -- URL canonicalization oracle (r11): the planted messy URL is
      -- doc_id-parameterized (upper scheme/host, www., DNS-root dot,
      -- default vs :8080 port, empty path, shuffled+tracking params,
      -- trailing empty param, fragment), so the CORRECT canonical
      -- string is pure arithmetic — any rule misfiring (a kept utm_,
      -- an unsorted param, a stripped :8080, a lowercased path...)
      -- breaks string equality.  Construction-independent: this CASE
      -- never runs the operator's parse/rebuild pipeline.
      (CASE WHEN l.doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
        || '://site-' || CAST(l.doc_id % 7 AS VARCHAR) || '.org'
        || (CASE WHEN l.doc_id % 3 = 1 THEN ':8080' ELSE '' END)
        || (CASE WHEN l.doc_id % 5 = 0 THEN '/'
                 ELSE '/P/' || CAST(l.doc_id % 5 AS VARCHAR) END)
        || '?a=' || CAST(l.doc_id % 11 AS VARCHAR) || '&z=9'
        AS url_canon,
      -- text normalization oracle (r11): the planted string carries n
      -- combining-acute e+U+0301 pairs, a BEL, and tab/space runs; the
      -- expected NFC+strip+collapse result is stated analytically
      -- (chr(233) = precomposed e-acute) — no normalizer runs here
      'Doc' || repeat(chr(233), CAST(l.doc_id % 5 AS INTEGER) + 1)
        || ' end ' || CAST(l.doc_id % 3 AS VARCHAR) AS text_norm,
      (SELECT len(list_filter(
          list_filter(string_split_regex(lower(doc.text), '[^a-z0-9]+'),
                      x -> x <> ''),
          t -> list_contains(['batch','spark'], t)))
       FROM documents doc WHERE doc.doc_id = l.doc_id) < 4 AS c4_kept
    FROM lang l JOIN dom d ON l.doc_id = d.doc_id
    LEFT JOIN bad b ON l.doc_id = b.doc_id
    LEFT JOIN se_bad sb ON l.doc_id = sb.doc_id
    """,
)
def q29_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID heuristic (north-star text op).

    r7 scope-deepening (the q54/q26/q56 pattern): the row also carries
    ``host`` / ``domain`` / ``url_kept`` from the REAL URL-curation
    operators (`operators/urls.py`) over a deterministic synthesized
    URL per doc (documents carry no url column; the synthesis is the
    same expression in both engines, so the CHECK is on the operators:
    host extraction with www-stripping, 2-level-ccTLD registered
    domains, UT1-style suffix blocklist — spelled WITH a ``www.``
    prefix, so entry normalization is oracle-checked (r9) — + C4
    keyword gate).  A quarter of the corpus hits the domain rule and a
    quarter the keyword rule, so the boolean genuinely bites.

    ``c4_kept`` oracle-checks the C4 banned-WORDS gate
    (``text.blocklist_filter``): word-boundary tokenization + blocked
    OCCURRENCE counting (the r6-ADVICE semantics — a page repeating a
    blocked word must eventually trip ``min_hits``), thresholds tuned
    to split this corpus 273/227 at sf0.01.

    ``pii_redacted_chars`` (r10) oracle-checks ``text.redact_pii``:
    each doc's text is digit/@-stripped (PII-free by construction in
    both engines — email needs '@', IPv4/phone need digits) and a
    doc_id-parameterized email + IPv4 + phone suffix is planted; the
    column is the chars the real chained-regexp scrub removed.  The
    oracle recomputes it as pure digit-length arithmetic over doc_id,
    so BOTH failure modes trip the driver compare: a planted pattern
    missed (chars under), or a false positive in the stripped prose
    (chars over).  The phone pattern's lookarounds are
    RE2-inexpressible, which is exactly why the oracle checks the
    redaction's EFFECT rather than re-running the regex.

    ``url_canon`` (r11) oracle-checks URL canonicalization
    (``urls.canonicalize_url``): a doc_id-parameterized messy URL
    exercises EVERY rule at once (scheme/host case, ``www.``, DNS-root
    dot, default-port strip vs non-default keep, empty path → ``/``,
    tracking + empty param drop, bytewise param sort, fragment drop);
    the oracle states the expected canonical string ANALYTICALLY from
    doc_id arithmetic — construction-independent, so both parse and
    rebuild bugs break string equality.  No float margin exists (string
    column); checked green at sf0.001/0.01/0.1.

    ``text_norm`` (r11) oracle-checks text normalization
    (``text.normalize_text``): the planted string carries doc_id%5+1
    combining-acute ``e``+U+0301 pairs (NFC must fold each to the
    precomposed é — the one Arrow step), a BEL control char, and
    tab/space runs; the oracle states the expected result analytically
    with ``repeat(chr(233), n)``, so the NFC fold, the control strip,
    and the whitespace collapse are each independently load-bearing.
    String-exact, green at all SFs.

    ``contam_free`` (r10) oracle-checks 8-gram eval-set
    decontamination (``dedup.decontaminate``, the published
    long-n-gram-overlap recipe) against a PLANTED benchmark: tokens
    6..17 of every ``doc_id%7==0`` document (normalized tokenization,
    so the slice is identical in both engines).  Every planted source
    doc contains its own benchmark grams, so the gate provably bites;
    the oracle recomputes the overlap on exact gram STRINGS, so any
    OTHER doc sharing one of those 8-grams is checked too (sf0.01:
    76 flagged = 72 planted + 4 accidental).  Spark-side xxhash64
    gram hashes differ only on 64-bit collisions (~1e-13 here).
    Hosted in q29 rather than the BENCHED q25 so the exact-dedup
    bench entry keeps its identity (the 8-gram shingle pass costs
    ~2 s at sf0.1 — real operator cost, wrong entry to carry it).

    ``sem_free`` (r10) oracle-checks SEMANTIC decontamination
    (``embed.semantic_decontaminate``) — the order-invariant twin the
    8-gram pass cannot catch: the benchmark is the word-REVERSED text
    of every ``doc_id%13==0`` doc, whose hashed-BoW vector equals the
    source doc's exactly (integer ±1 bucket sums are order-free), so
    every planted doc is dropped at cosine ~1.0 and organic
    high-cosine docs fall with them (sf0.01: 4 organic drops).  The
    oracle rebuilds the md5 bucket+sign embedding, L2 norms, and every
    corpus×benchmark cosine in SQL; min |cos − 0.9| probed at
    1.6e-5..1.8e-3 across SFs vs ~1e-15 engine drift."""
    from bigdataproject_formula1_telemetry_spark.operators import embed as EM

    docs = _t(spark, sf_dir, "documents")
    _rev_bench = docs.where(F.col("doc_id") % 13 == 0).select(
        F.array_join(
            F.reverse(F.split(F.trim(F.col("text")), r"\s+")), " "
        ).alias("text")
    )
    sem_ok = EM.semantic_decontaminate(
        docs.select("doc_id", "text"), _rev_bench, threshold=0.9
    ).select("doc_id", F.lit(True).alias("__sf"))
    _norm = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    _bench = (
        docs.where(F.col("doc_id") % 7 == 0)
        .select(_norm.alias("__t"))
        .where(F.size("__t") >= 17)
        .select(F.array_join(F.slice("__t", 6, 12), " ").alias("text"))
    )
    contam_ok = dedup.decontaminate(docs, _bench).select(
        "doc_id", F.lit(True).alias("__cf")
    )
    _d = F.col("doc_id").cast("string")
    # coalesce: F.concat returns NULL if ANY input is NULL, which would
    # make the Spark column NULL on a NULL-text doc while the oracle's
    # text-independent digit arithmetic still emits a value (ADVICE r10);
    # the empty string degrades gracefully to the identical arithmetic.
    _stripped = F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), "[0-9@]", ""
    )
    _planted = F.concat(
        _stripped,
        F.lit(" u"), _d, F.lit("@ex.com 10.0."),
        (F.col("doc_id") % 250).cast("string"), F.lit("."),
        (F.col("doc_id") % 200).cast("string"), F.lit(" 555-12"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    pii = docs.select(
        "doc_id",
        (F.length(_planted) - F.length(T.redact_pii(_planted)))
        .cast("long")
        .alias("pii_redacted_chars"),
    )
    base = docs.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lang_pred"),
        F.concat(
            F.lit("https://www."),
            F.element_at(
                F.array(
                    F.lit("news-site"), F.lit("spamfarm"),
                    F.lit("blogs"), F.lit("casino-hub"),
                ),
                (F.col("doc_id") % 4).cast("int") + 1,
            ),
            F.element_at(
                F.array(F.lit(".co.uk"), F.lit(".com"), F.lit(".org")),
                (F.col("doc_id") % 3).cast("int") + 1,
            ),
            F.lit("/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    kept = (
        U.url_filter(
            base,
            # the UT1-style spelling WITH the www. prefix (real UT1
            # lists carry thousands): the operator must normalize it
            # like corpus hosts or it blocks nothing — the oracle
            # expresses the normalized rule (host = spamfarm.com or a
            # subdomain), so the driver compare is the regression
            # tripwire for the r9 www-normalization fix
            blocked_domains=["www.spamfarm.com"],
            blocked_keywords=["casino"],
        )
        .select("doc_id")
        .withColumn("__uk", F.lit(True))
    )
    kept_c4 = (
        T.blocklist_filter(
            docs.select("doc_id", "text"), ["batch", "spark"], min_hits=4
        )
        .select("doc_id")
        .withColumn("__c4", F.lit(True))
    )
    # URL canonicalization (r11): a doc_id-parameterized MESSY url —
    # uppercase scheme+host, www., DNS-root trailing dot, the scheme's
    # default port (%3==0) vs a kept :8080 (%3==1), an empty path
    # (%5==0), out-of-order + tracking + empty query params, and a
    # fragment — canonicalized by the real operator; the oracle states
    # the expected string analytically (never re-running the pipeline)
    _i = F.col("doc_id")
    _messy = F.concat(
        F.when(_i % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://WWW.Site-"), (_i % 7).cast("string"), F.lit(".ORG."),
        F.when(_i % 3 == 0, F.when(_i % 2 == 0, F.lit(":443"))
               .otherwise(F.lit(":80")))
        .when(_i % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(_i % 5 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("/P/"), (_i % 5).cast("string"))),
        F.lit("?z=9&utm_source=s"), _i.cast("string"),
        F.lit("&a="), (_i % 11).cast("string"), F.lit("&fbclid=f&"),
        F.lit("#frag"), _i.cast("string"),
    )
    canon = docs.select(
        "doc_id", U.canonicalize_url(_messy).alias("url_canon")
    )
    # text normalization (r11): a doc_id-parameterized DENORMALIZED
    # string — n combining-acute 'e'+U+0301 pairs (NFC folds each to é),
    # a BEL control char, and tab/space runs — through the real
    # normalize_text; the oracle states the normalized string
    # analytically (repeat(chr(233), n)), never running a normalizer
    _nmessy = F.concat(
        F.lit("Doc"),
        F.expr("repeat('é', CAST(doc_id % 5 AS INT) + 1)"),
        F.lit("\x07  end\t\t "),
        (F.col("doc_id") % 3).cast("string"),
    )
    tnorm = docs.select(
        "doc_id", T.normalize_text(_nmessy).alias("text_norm")
    )
    return (
        U.url_parts(base)
        .join(kept, "doc_id", "left")
        .join(kept_c4, "doc_id", "left")
        .join(pii, "doc_id")
        .join(canon, "doc_id")
        .join(tnorm, "doc_id")
        .join(contam_ok, "doc_id", "left")
        .join(sem_ok, "doc_id", "left")
        .withColumn("url_kept", F.coalesce(F.col("__uk"), F.lit(False)))
        .withColumn("c4_kept", F.coalesce(F.col("__c4"), F.lit(False)))
        .withColumn("contam_free", F.coalesce(F.col("__cf"), F.lit(False)))
        .withColumn("sem_free", F.coalesce(F.col("__sf"), F.lit(False)))
        .select(
            "doc_id", "lang_pred", "host", "domain", "url_kept",
            "pii_redacted_chars", "url_canon", "text_norm", "contam_free",
            "sem_free", "c4_kept",
        )
    )


@_q(
    "q27_knn_cosine",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
    ), x AS (
      SELECT q.qid, e.vec_id AS nid,
        sum(CAST(q.qe[u.i] AS DOUBLE) * CAST(e.embedding[u.i] AS DOUBLE)) AS dp,
        sum(CAST(q.qe[u.i] AS DOUBLE) * CAST(q.qe[u.i] AS DOUBLE)) AS qq,
        sum(CAST(e.embedding[u.i] AS DOUBLE) * CAST(e.embedding[u.i] AS DOUBLE)) AS ee
      FROM q, embeddings e, (SELECT unnest(range(1, 65)) AS i) u
      WHERE e.vec_id <> q.qid
      GROUP BY q.qid, e.vec_id
    )
    SELECT qid AS query_id, nid AS neighbor_id,
      round(dp / (sqrt(qq) * sqrt(ee)), 6) AS cos_sim
    FROM x
    QUALIFY row_number() OVER (
      PARTITION BY qid ORDER BY dp / (sqrt(qq) * sqrt(ee)) DESC, nid) <= 5
    """,
)
def q27_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search over the embedding
    column — broadcast queries, JVM-side zip_with/aggregate dot products
    (north-star ANN baseline; embeddings are 64-dim)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = sim.knn_bruteforce(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim")
    )


@_q(
    "q33_aligned_gap",
    """
    WITH d1 AS (
      SELECT date_trunc('day', ts) AS d, round(sum(value), 4) AS v
      FROM events WHERE user_id = 1 GROUP BY 1
    ), d2 AS (
      SELECT date_trunc('day', ts) AS d, round(sum(value), 4) AS v
      FROM events WHERE user_id = 2 GROUP BY 1
    )
    SELECT d1.d AS d,
      round(d1.v - d2.v, 4) AS diff,
      round(sum(d1.v - d2.v) OVER (ORDER BY d1.d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_gap
    FROM d1 JOIN d2 ON d1.d = d2.d
    """,
)
def q33_aligned_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+W3+W7 — align two entities on a shared axis, diff, accumulate
    the running gap (the two-driver race-gap analysis,
    P1-...ipynb:605-616)."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("d")
    mk = lambda uid: (
        ev.where(F.col("user_id") == uid)
        .groupBy(day)
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    aligned = R.aligned_diff(mk(1), mk(2), ["d"], "v", out_col="diff")
    out = W.cumulative_sum(aligned, [], ["d"], "diff", "cum_gap")
    return out.select(
        "d", F.round("diff", 4).alias("diff"), F.round("cum_gap", 4).alias("cum_gap")
    )


@_q(
    "q34_global_scalars",
    """
    SELECT round(max(value), 6) AS max_value, round(min(value), 6) AS min_value,
      floor(round(sum(value), 4) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_value,
      CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
    FROM events
    """,
)
def q34_global_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — global scalar aggregates in one pass (dashboard KPIs,
    F1_web_dashboard_app.py:225-229)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        _pround(F.round(F.sum("value"), 4) / F.count(F.lit(1)), 6).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@_q(
    "q35_collect_set",
    """
    SELECT event_type,
      array_to_string(list_sort(list(DISTINCT user_id % 10)), ',') AS user_buckets,
      CAST(len(list(DISTINCT user_id % 10)) AS BIGINT) AS n_buckets
    FROM events GROUP BY event_type
    """,
)
def q35_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — distinct-set aggregation + cardinality ($addToSet + $size,
    F1_Data_Test.ipynb:150-165); sorted + stringified for deterministic
    cross-engine comparison."""
    ev = _t(spark, sf_dir, "events")
    buckets = F.array_sort(F.collect_set(F.col("user_id") % 10))
    return ev.groupBy("event_type").agg(
        F.array_join(buckets, ",").alias("user_buckets"),
        F.size(buckets).cast("long").alias("n_buckets"),
    )


@_q(
    "q36_map_encode",
    """
    SELECT c_custkey,
      CAST(CASE upper(c_mktsegment)
        WHEN 'BUILDING' THEN 1 WHEN 'AUTOMOBILE' THEN 2 WHEN 'MACHINERY' THEN 3
        WHEN 'HOUSEHOLD' THEN 4 WHEN 'FURNITURE' THEN 5 ELSE 0
      END AS BIGINT) AS segment_code
    FROM customer
    """,
)
def q36_map_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — upper + dict-map encode with 0 default (the compound encoding,
    F1_Data_PreProcessing.ipynb:336-341, on generic data)."""
    c = _t(spark, sf_dir, "customer")
    code = FN.map_lookup(
        F.upper(F.col("c_mktsegment")),
        {"BUILDING": 1, "AUTOMOBILE": 2, "MACHINERY": 3, "HOUSEHOLD": 4, "FURNITURE": 5},
        default=0,
    )
    return c.select("c_custkey", code.cast("long").alias("segment_code"))


@_q(
    "q38_degradation_curve",
    """
    SELECT c.code AS compound_code, CAST(l.lap AS BIGINT) AS lap,
      round(90.0 * (1 + 0.005 * l.lap * c.code), 6) AS predicted_time
    FROM (SELECT unnest(range(1, 4)) AS code) c,
         (SELECT unnest(range(1, 41)) AS lap) l
    """,
)
def q38_degradation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 — synthetic tyre-degradation curve generation
    (base*(1+0.005*lap*compound), F1_web_dashboard_app.py:381-383)."""
    base = spark.range(1, 4).select(F.col("id").alias("compound_code"))
    curve = base.withColumn("lap", F.explode(F.sequence(F.lit(1), F.lit(40))))
    return curve.select(
        "compound_code",
        F.col("lap").cast("long").alias("lap"),
        F.round(
            F.lit(90.0) * (1 + F.lit(0.005) * F.col("lap") * F.col("compound_code")), 6
        ).alias("predicted_time"),
    )


@_q(
    "q39_sliding_windows",
    """
    SELECT event_id, user_id,
      CAST(count(*) OVER w AS BIGINT) AS win_len,
      round(sum(value) OVER w, 4) AS win_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    QUALIFY count(*) OVER w = 5
    """,
)
def q39_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — fixed-length sliding sequence windows (the 20-step LSTM
    windows, train_by_circuit.py:164-167; length 5 here).  Built via the
    collect_list operator, summarized so the oracle can verify with plain
    window sums."""
    ev = _t(spark, sf_dir, "events")
    seqs = W.sliding_sequences(
        ev, ["user_id"], ["ts", "event_id"], ["value"], length=5, out_col="win"
    )
    return seqs.select(
        "event_id",
        "user_id",
        F.size("win").cast("long").alias("win_len"),
        F.round(
            F.aggregate(
                F.transform("win", lambda v: v.getItem(0)),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            4,
        ).alias("win_sum"),
    )


@_q(
    "q42_embedding_norms",
    """
    WITH nx AS (
      SELECT e.vec_id, e.label,
        sqrt(sum(CAST(e.embedding[u.i] AS DOUBLE) ** 2)) AS nrm
      FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) u
      GROUP BY e.vec_id, e.label
    ), dots AS (
      SELECT e.vec_id AS vid,
        sum((CAST(e.embedding[u.i] AS DOUBLE) / ne.nrm)
            * (CAST(c.embedding[u.i] AS DOUBLE) / ncx.nrm)) AS cs
      FROM embeddings e
      JOIN nx ne ON ne.vec_id = e.vec_id,
      embeddings c
      JOIN nx ncx ON ncx.vec_id = c.vec_id,
      (SELECT unnest(range(1, 65)) AS i) u
      WHERE c.vec_id < 4
      GROUP BY e.vec_id, c.vec_id
    ), best AS (
      SELECT vid, max(cs) AS best FROM dots GROUP BY vid
    )
    SELECT label,
      round(avg(nrm), 6) AS avg_norm,
      round(max(nrm), 6) AS max_norm,
      count(*) AS n_vecs,
      CAST(sum(CASE WHEN best IS NULL OR best <= 0.3 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_proto_kept
    FROM nx LEFT JOIN best ON nx.vec_id = best.vid
    GROUP BY label
    """,
)
def q42_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-lambda math over the embedding column: per-label L2-norm
    stats — the vector-column hygiene check of the similarity stack.

    ``n_proto_kept`` (r10) oracle-checks SSL-prototypes pruning
    (``semdedup.prototype_prune``, Sorscher et al. 2022 — the D4
    diversification stage) on its explicit-cutoff path: centroids are
    the first four embeddings, cutoff 0.3, so the most prototypical
    ~4% (plus the four self-matching rows) are dropped and the oracle
    recomputes every normalize-then-dot max-cosine score from scratch.
    The cutoff sits ≥4.5e-4 from every score at all three SFs (probed)
    vs ~1e-15 cross-engine float drift — the boolean cannot flip."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        r["embedding"]
        for r in emb.where(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    kept = SD.prototype_prune(
        emb, cents, cutoff=0.3, id_col="vec_id", vec_col="embedding"
    ).select("vec_id", F.lit(1).alias("__pk"))
    return (
        emb.select("vec_id", "label", sim.l2_norm(F.col("embedding")).alias("nrm"))
        .join(kept, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.coalesce(F.col("__pk"), F.lit(0))).cast("long").alias(
                "n_proto_kept"
            ),
        )
    )


# --- rows-only checks (no SQL-expressible oracle) --------------------------

@_q(
    "q47_shipping_priority",
    """
    SELECT l.l_orderkey,
      round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q47_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join + agg + top-k: the multi-join shuffle
    path the reference never stresses (its joins are all tiny) — declared
    for engine completeness and bench depth."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@_q(
    "q48_regional_revenue",
    """
    SELECT n.n_name,
      round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      count(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA' AND o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def q48_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 5-way star join: broadcast dims + shuffled fact
    joins, regional revenue rollup."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "q52_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q52_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped bidirectional trade volume: the fact table joins
    two *different* dimension paths to the same nation table (supplier
    nation vs customer nation).  Both nation sides broadcast; the only
    shuffles are the fact-fact joins on orderkey/custkey."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_q(
    "q53_returned_top_customers",
    """
    SELECT c.c_custkey, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q53_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-items ranking: filtered fact → two fact
    joins → broadcast dim → grouped revenue → global sorted limit (the
    TakeOrderedAndProject path).  c_custkey is the deterministic
    tiebreaker at the k-boundary."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_q(
    "q44_semi_anti_join",
    """
    SELECT 'has_f_order' AS side, c.c_mktsegment AS key, count(*) AS n_cust
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    GROUP BY c.c_mktsegment
    UNION ALL
    SELECT 'no_orders' AS side, n.n_name AS key, count(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    GROUP BY n.n_name
    """,
)
def q44_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 — explicit left-semi AND left-anti joins in one report (the
    reference's J5 group↔detail rejoin is a semi-join in disguise; the
    audit's missing-entities direction is the anti side).  Tagged union so
    both join types carry a driver-checked row."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    semi = (
        c.join(
            o.where(F.col("o_orderstatus") == "F"),
            c.c_custkey == o.o_custkey,
            "left_semi",
        )
        .groupBy(F.col("c_mktsegment").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .select(F.lit("has_f_order").alias("side"), "key", "n_cust")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .select(F.lit("no_orders").alias("side"), "key", "n_cust")
    )
    return semi.unionByName(anti)


@_q(
    "q46_set_ops",
    """
    SELECT 'both' AS tag, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'only_f' AS tag, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def q46_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — intersect / except surfaced natively (the reference only
    has union-all; these come free in Spark and are declared here)."""
    o = _t(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f.intersect(op).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("tag"), "n"
    )
    only_f = f.subtract(op).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_f").alias("tag"), "n"
    )
    return both.unionByName(only_f)


@_q(
    "q43_resample_parity",
    """
    WITH s0 AS (
      SELECT user_id, CAST(epoch_us(ts) AS DOUBLE) AS x, value AS y FROM events
    ), b AS (
      SELECT user_id, min(x) AS xmin, max(x) AS xmax FROM s0 GROUP BY user_id
    ), s AS (
      SELECT s0.user_id, s0.x - b.xmin AS x, s0.y
      FROM s0 JOIN b ON s0.user_id = b.user_id
    ), g AS (
      -- bound derived from the data (global max grid steps per key), so
      -- the generator can never silently truncate at larger time spans
      SELECT b.user_id, k.k * 21600000000.0 AS gx
      FROM b, (SELECT unnest(range(0, (
        SELECT CAST(ceil(max(xmax - xmin) / 21600000000.0) AS BIGINT) + 1
        FROM b))) AS k) k
      WHERE k.k * 21600000000.0 < b.xmax - b.xmin
    ), p AS (
      SELECT g.user_id, g.gx, s.x AS px, s.y AS py
      FROM g ASOF LEFT JOIN s ON g.user_id = s.user_id AND g.gx >= s.x
    ), n AS (
      SELECT p.user_id, p.gx, p.px, p.py, s.x AS nx, s.y AS ny
      FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.gx <= s.x
    )
    SELECT user_id, CAST(gx AS BIGINT) AS rel_us,
      floor((CASE WHEN nx = px THEN py
                 ELSE py + (gx - px) / (nx - px) * (ny - py) END)
            * 1000000 + 0.5) / 1000000.0 AS value_interp
    FROM n
    """,
)
def q43_resample_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 (parity mode) — the ``applyInPandas`` numpy resampler on the
    events time axis (relative µs per user, 6-hour grid).  Same semantics
    as q28's pure-SQL plan but through the Arrow grouped-map kernel — the
    reference's exact per-lap interpolation path
    (F1_Data_PreProcessing.ipynb:65-103), oracle-checked."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tus"), "value"
    )
    wmin = Window.partitionBy("user_id")
    rel = ev.withColumn(
        "rel_us", (F.col("tus") - F.min("tus").over(wmin)).cast("double")
    )
    step = float(6 * 3600 * 1_000_000)
    out = resample.resample_grouped(
        rel,
        keys=["user_id"],
        x_col="rel_us",
        linear_cols=["value"],
        step=step,
        start=0.0,
        min_rows=2,
        min_extent=None,
    )
    return out.select(
        "user_id",
        F.col("rel_us").cast("long").alias("rel_us"),
        _pround(F.col("value"), 6).alias("value_interp"),
    )


@_q(
    "q51_deterministic_sample",
    """
    SELECT count(*) AS n_sampled, round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE substr(md5('seed|' || CAST(o_orderkey AS VARCHAR)), 1, 8)
          < '19999999'
    """,
)
def q51_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample gated on md5(salt|id) — reproducible
    across engines/retries/partitionings (unlike rand()-based sampling),
    which is exactly why it hash-matches a DuckDB oracle.  The curation
    primitive behind reproducible training-data subsets."""
    from bigdataproject_formula1_telemetry_spark.operators import sampling

    o = _t(spark, sf_dir, "orders")
    s = sampling.deterministic_sample(o, ["o_orderkey"], 0.1, salt="seed")
    return s.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@_q(
    "q56_stratified_sample",
    """
    WITH tok AS (
      SELECT doc_id, lang,
        list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                    x -> x <> '') AS toks
      FROM documents
    ), ng AS (
      SELECT doc_id, lang,
        CAST(('0x' || substr(md5('dsir56|' || g), 1, 8)) AS UBIGINT)
          % 1024 AS b
      FROM tok, unnest(list_concat(toks,
            list_transform(list_zip(toks[1:len(toks)-1], toks[2:]),
                           p -> p[1] || ' ' || p[2]))) AS u(g)
    ), tc AS (
      SELECT b, CAST(count(*) AS DOUBLE) AS c FROM ng
      WHERE lang = 'en' GROUP BY b
    ), rc AS (
      SELECT b, CAST(count(*) AS DOUBLE) AS c FROM ng GROUP BY b
    ), buckets AS (
      SELECT range AS b FROM range(1024)
    ), model AS (
      SELECT k.b,
        ln((coalesce(tc.c, 0) + 1.0)
           / ((SELECT sum(c) FROM tc) + 1.0 * 1024))
        - ln((coalesce(rc.c, 0) + 1.0)
             / ((SELECT sum(c) FROM rc) + 1.0 * 1024)) AS lam
      FROM buckets k LEFT JOIN tc ON k.b = tc.b LEFT JOIN rc ON k.b = rc.b
    ), w AS (
      SELECT ng.doc_id, sum(m.lam) AS log_w
      FROM ng JOIN model m ON ng.b = m.b
      GROUP BY ng.doc_id
    ), kept AS (
      SELECT d.doc_id, d.lang, coalesce(w.log_w, 0.0) AS log_w
      FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
      WHERE substr(md5('strat|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
            < (CASE WHEN d.lang = 'en' THEN '40000000' ELSE 'g' END)
    ),
    -- quality classifier (r10): replay ONE full-batch logistic epoch
    -- from w0 = 0 in closed form (sigma(0) = 1/2 exactly, so the
    -- residual r = 1/2 - y is EXACT and the gradient needs no
    -- recursion), then score every doc with the updated weights —
    -- featurization (md5 bucket+sign, L2 row norm), distributed
    -- gradient, update rule, and Arrow serving all oracle-checked
    clf_tb AS (
      SELECT doc_id,
        CAST(('0x' || substr(md5('clf56|' || tok), 1, 8)) AS UBIGINT)
          % 256 AS b,
        CASE WHEN (strpos('0123456789abcdef',
                          substr(md5('clf56|' || tok), 9, 1)) - 1) % 2 = 0
             THEN 1.0 ELSE -1.0 END AS s
      FROM tok, unnest(toks) AS u(tok)
    ), clf_v AS (
      SELECT doc_id, b, sum(s) AS v FROM clf_tb GROUP BY doc_id, b
    ), clf_nrm AS (
      SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM clf_v GROUP BY doc_id
    ), clf_x AS (
      SELECT v.doc_id, v.b, v.v / n.nrm AS x
      FROM clf_v v JOIN clf_nrm n USING (doc_id) WHERE n.nrm > 0
    ), clf_r AS (
      -- lang IS NOT NULL aligns with the Spark side: (lang='en') is NULL
      -- for NULL lang and train_text_classifier drops NULL labels, so a
      -- NULL-lang row must not enter the gradient here either (ADVICE r10)
      SELECT doc_id, 0.5 - (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS r
      FROM documents WHERE lang IS NOT NULL
    ), clf_n AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(r) AS gb FROM clf_r
    ), clf_w AS (
      SELECT x.b, -2.0 * (sum(r.r * x.x) / (SELECT n FROM clf_n)) AS w
      FROM clf_x x JOIN clf_r r USING (doc_id) GROUP BY x.b
    ), clf_p AS (
      SELECT d.doc_id,
        1.0 / (1.0 + exp(-(coalesce(s.dot, 0.0)
          + (SELECT -2.0 * (gb / n) FROM clf_n)))) AS p
      FROM documents d LEFT JOIN (
        SELECT x.doc_id, sum(x.x * w.w) AS dot
        FROM clf_x x JOIN clf_w w USING (b) GROUP BY x.doc_id
      ) s ON d.doc_id = s.doc_id
    )
    SELECT k.lang, count(*) AS n_kept,
      floor(sum(k.log_w) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_logw,
      floor(sum(p.p) / count(*) * 1000000 + 0.5) / 1000000.0 AS avg_clf_prob
    FROM kept k JOIN clf_p p ON k.doc_id = p.doc_id
    GROUP BY k.lang ORDER BY k.lang
    """,
)
def q56_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — the canonical language-rebalance
    step of a training-data pipeline: downsample the dominant language
    (en → 25%) while keeping the rare ones whole.  Same portable md5 gate
    as q51, so the kept *set* (not just the counts) is engine-exact.

    r7 scope-deepening (the q54 ``sem_kept`` / q26 ``gopher_kept``
    pattern): each language's row also carries ``avg_logw`` — the mean
    DSIR importance logit (Xie et al. 2023, ``operators/dsir.py``) of
    the KEPT docs, target = the English subset, raw = the whole corpus.
    The oracle recomputes the ENTIRE selection pipeline in DuckDB SQL:
    hashed unigram+bigram bucketing (md5 first-8-hex mod 1024), both
    Laplace-smoothed multinomials, per-doc Σ c_b·(log p_b − log q_b),
    and the rebalance gate — so model fit, featurization, and weighting
    are all oracle-checked end-to-end (prototype: max |Δ| vs numpy
    2.4e-14 at sf0.01, rounded at 1e-6).

    ``avg_clf_prob`` (r10) oracle-checks the quality classifier
    (``classifier.train_text_classifier`` +
    ``score_text_classifier``): ONE full-batch logistic epoch from
    w0 = 0 is closed-form (σ(0) = ½ exactly, so the residual ½ − y is
    exact and the gradient is a single aggregate, no recursion) — the
    oracle recomputes the md5 bucket+sign hashing trick, the L2 row
    normalization, the distributed gradient, the −lr·g/n update, and
    the sigmoid serving pass entirely in SQL, then averages the score
    over each language's kept docs.  Engine float drift is partition-
    sum associativity only (~1e-15 for one epoch), absorbed by the
    1e-6 portable rounding."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        classifier as CLF,
        dsir,
        sampling,
    )

    docs = _t(spark, sf_dir, "documents")
    # lang IS NOT NULL: (lang == 'en') is NULL for NULL lang and the
    # trainer drops NULL labels — the explicit filter keeps the Spark
    # training set and the oracle's clf_r CTE the same set by
    # construction, not by the trainer's drop rule (ADVICE r10)
    wvec = CLF.train_text_classifier(
        docs.where(F.col("lang").isNotNull()).select(
            "text", (F.col("lang") == "en").cast("int").alias("label")
        ),
        dim=256,
        epochs=1,
        lr=2.0,
        salt="clf56",
    )
    scored = CLF.score_text_classifier(
        docs, wvec, out_col="__p", salt="clf56"
    ).select("doc_id", "__p")
    p = dsir.fit_hashed_ngram_model(
        docs.where(F.col("lang") == "en"), dim=1024, salt="dsir56"
    )
    q = dsir.fit_hashed_ngram_model(docs, dim=1024, salt="dsir56")
    w = dsir.dsir_log_weights(docs, p, q, salt="dsir56")
    s = sampling.stratified_sample(
        docs, "lang", {"en": 0.25}, ["doc_id"], default_fraction=1.0, salt="strat"
    )
    return (
        s.join(w, "doc_id")
        .join(scored, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            _pround(F.avg("log_w"), 6).alias("avg_logw"),
            _pround(F.avg("__p"), 6).alias("avg_clf_prob"),
        )
        .orderBy("lang")
    )


@_q(
    "q50_approx_distinct",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q50_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 scale path — HyperLogLog++ approx_count_distinct next to the
    exact count (the $addToSet cardinality at 100 TB where exact distinct
    is a full shuffle).  The HLL sketch value itself is engine-specific,
    so the hashed column is the *error-bound assertion*: ``within_5pct``
    is TRUE iff |approx - exact| / exact < 0.05, and the oracle expects
    TRUE for every group — i.e. the driver hash-check fails unless the
    sketch is genuinely inside its documented band (rsd=0.02 ⇒ 5% is a
    2.5σ bound; measured error on this data is ≤0.4%)."""
    ev = _t(spark, sf_dir, "events")
    out = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
    return out.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            < 0.05
        ).alias("within_5pct"),
    ).orderBy("event_type")


#: DuckDB twin of ``dedup.shingles`` + all-pairs exact Jaccard — the
#: portable oracle for the MinHash/LSH near-dedup queries.  Same word
#: split (lower → [^a-z0-9]+ → drop empties), same 3-gram windows, same
#: short-text fallback (≤2 words ⇒ whole text as one shingle), same
#: distinct-set Jaccard.  Set Jaccard over xxhash64(shingle) (Spark side)
#: equals string-set Jaccard (this side) absent 64-bit collisions —
#: verified collision-free on this corpus.  All-pairs is fine for the
#: oracle: it runs only at the driver's sf0.01 gate (500 docs); the Spark
#: side under test is the sub-quadratic LSH path.
_JACCARD_PAIRS_CTE = """
    words_t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         w -> w <> '') AS words
      FROM documents
    ),
    sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(words) <= 2 THEN [array_to_string(words, ' ')]
             ELSE list_transform(range(1, len(words) - 1),
                    i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2])
        END) AS s
      FROM words_t
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_cat(a.s, b.s)))::DOUBLE AS j
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
"""


@_q(
    "q49_near_dedup_clustered",
    f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE},
    dupe AS (SELECT id_a, id_b FROM pairs WHERE j >= 0.7),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM dupe
      UNION
      SELECT id_b AS s, id_a AS d FROM dupe
    ),
    tc(a, b) AS (
      SELECT s, d FROM edges
      UNION
      SELECT tc.a, e.d FROM tc JOIN edges e ON tc.b = e.s
    ),
    comp AS (SELECT a AS id, least(a, min(b)) AS component FROM tc GROUP BY a)
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    ORDER BY doc_id
    """,
)
def q49_near_dedup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware near-dedup: LSH → Jaccard verify → connected
    components (iterative min-label propagation) → keep min id per
    duplicate cluster.  Oracle: all-pairs exact Jaccard + recursive-CTE
    transitive closure in DuckDB.  The LSH stage is an exact-recall
    candidate generator on this corpus, verified exhaustively against
    the all-pairs truth at BOTH 500 docs (sf0.01, the driver gate) and
    5000 docs (sf0.1): survivors match exactly.  The pipeline is fully
    deterministic (xxhash64 + splitmix64 lanes, no rand), so local
    parity at sf0.01 is the driver's exact run."""
    docs = _t(spark, sf_dir, "documents")
    kept = dedup.near_dedup_clustered(docs, threshold=0.7)
    return kept.select("doc_id").orderBy("doc_id")


@_q(
    "q41_decode_packets",
    # The corpus below is a deterministic constant (synthetic encoders,
    # no randomness), so the decode summary is computable by hand:
    # 60 telemetry datagrams (packet id 6) carry player-car (index 4)
    # speed 100+i+4 for i in 0..59 → avg = 104 + 59/2 = 133.5 exactly
    # (a dyadic rational — exact in IEEE754, no rounding hazard); lap
    # datagrams (packet id 2) fire at i=0 and i=30 with lap_num 1 and 2;
    # the truncated garbage datagram decodes to nothing.  DuckDB cannot
    # parse the binary wire format, but it can assert the expected
    # constant — the q50/q55 literal-assertion oracle pattern.
    """
    SELECT * FROM (VALUES
      (CAST(2 AS BIGINT), CAST(2  AS BIGINT), CAST(NULL  AS DOUBLE), CAST(2 AS BIGINT)),
      (CAST(6 AS BIGINT), CAST(60 AS BIGINT), CAST(133.5 AS DOUBLE), CAST(NULL AS BIGINT))
    ) AS t(packet_id, n, avg_speed, max_lap)
    ORDER BY packet_id
    """,
)
def q41_decode_packets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 — binary record decode through the contract: deterministic
    packed datagrams (telemetry + lap + garbage) decoded with the
    mapInPandas struct.unpack kernel, demuxed, and summarized.  The
    binary wire format has no SQL parser, but the corpus is a synthetic
    constant, so the expected summary is emitted as a literal-SELECT
    oracle (hash-checkable); exact per-field decode values are
    additionally asserted in tests/test_decoder.py."""
    import datetime as dt

    from bigdataproject_formula1_telemetry_spark import schemas
    from bigdataproject_formula1_telemetry_spark.sources import telemetry as tel

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(60):
        cars = [{"speed": 100 + i + c, "rpm": 9000 + c} for c in range(tel.N_CARS)]
        rows.append(
            (t0 + dt.timedelta(milliseconds=16 * i), tel.encode_telemetry_packet(4, cars))
        )
        if i % 30 == 0:
            laps = [{"lap_num": 1 + i // 30, "lap_distance": 100.0 * i}] * tel.N_CARS
            rows.append(
                (t0 + dt.timedelta(milliseconds=16 * i + 1), tel.encode_lap_packet(4, laps))
            )
    rows.append((t0, b"\x00\x01"))  # truncated garbage must be skipped
    raw = spark.createDataFrame(rows, schema=schemas.LIVE_PACKET_RAW)
    decoded = tel.decode_packets(raw)
    return (
        decoded.groupBy("packet_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("Speed"), 6).alias("avg_speed"),
            F.max("LapNumber").alias("max_lap"),
        )
        .orderBy("packet_id")
    )


@_q(
    "q30_minhash_near_dedup",
    f"""
    WITH {_JACCARD_PAIRS_CTE}
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM pairs WHERE j >= 0.7)
    ORDER BY doc_id
    """,
)
def q30_minhash_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dedup (shingle→minhash→band→bucket-join→verify),
    greedy keep-lowest-id.  Oracle: all-pairs exact Jaccard in DuckDB over
    the same shingle semantics — valid because the exact-verify stage
    makes survivors depend only on candidate *recall*, and recall on this
    corpus is exact (see q49 docstring: all dup pairs ≥ 0.9 Jaccard,
    miss probability ≈ 4e-8, fully deterministic pipeline)."""
    docs = _t(spark, sf_dir, "documents")
    kept = dedup.near_dedup_minhash(docs, threshold=0.7)
    return kept.select("doc_id").orderBy("doc_id")


def _q54_centroids() -> list[list[float]]:
    """Fixed spherical centroids for q54's SemDeDup column — generated
    once (seeded), embedded verbatim as DOUBLE literals in the oracle
    SQL (Python float repr round-trips exactly, so both engines score
    the identical matrix)."""
    import numpy as np

    g = np.random.default_rng(11)
    M = g.standard_normal((4, 64))
    M = M / np.linalg.norm(M, axis=1)[:, None]
    return [[float(x) for x in row] for row in M]


_Q54_CENTS = _q54_centroids()
_Q54_CENT_ROWS = ", ".join(
    f"({i}, {c}::DOUBLE[])" for i, c in enumerate(_Q54_CENTS)
)


@_q(
    "q54_embedding_near_dedup",
    f"""
    WITH cents(cid, cv) AS (VALUES {_Q54_CENT_ROWS}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nz AS (SELECT *, sqrt(list_inner_product(v, v)) AS nrm FROM e),
    reps AS (SELECT min(vec_id) AS id, v FROM nz WHERE nrm > 0 GROUP BY v),
    asg AS (
        SELECT r.id, r.v,
               (SELECT cid FROM cents
                ORDER BY list_cosine_similarity(r.v, cv) DESC, cid
                LIMIT 1) AS cl
        FROM reps r
    ),
    drops AS (
        SELECT DISTINCT a.id FROM asg a JOIN asg b
        ON a.cl = b.cl AND b.id < a.id
           AND list_cosine_similarity(a.v, b.v) >= 0.2
    ),
    sem AS (
        SELECT id FROM asg WHERE id NOT IN (SELECT id FROM drops)
        UNION ALL
        SELECT vec_id FROM nz WHERE nrm = 0 OR nrm IS NULL
    )
    SELECT vec_id, (vec_id IN (SELECT id FROM sem)) AS sem_kept
    FROM embeddings
    WHERE vec_id NOT IN (
      SELECT b.vec_id
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    )
    ORDER BY vec_id
    """,
)
def q54_embedding_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dedup (north-star): sign-LSH bucketed
    candidates → exact cosine verify → greedy keep-lowest-id.  Oracle:
    all-pairs exact cosine in DuckDB (fine at the sf0.01 gate; the Spark
    side under test is the sub-quadratic LSH path).  Safe because the
    threshold region is empty on this corpus (max off-diagonal cosine
    ≈ 0.5), so survivor equality checks exactly for false drops; real
    drop behavior is pytest-verified on planted near-duplicates.

    ``sem_kept`` adds the SemDeDup axis (``semdedup.semantic_dedup``,
    ``keep="min_id"`` — the SQL-expressible mode: drop iff a smaller-id
    same-cluster row clears the threshold) at a LOW threshold (0.2) so
    the within-cluster join genuinely fires on this corpus; the oracle
    recomputes the whole operator — collapse, argmax assignment,
    within-cluster drop — in DuckDB over the shared centroid literals."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    rng = np.random.default_rng(7)
    planes = [
        [[float(x) for x in rng.standard_normal(64)] for _ in range(8)]
        for _ in range(4)
    ]
    # storage="memory" (r14): the default persist(DISK_ONLY) barrier's
    # block-manager disk round trip is this entry's measured variance
    # source — 1.8x min-to-max spread within ONE quiet session, and the
    # component the driver's machine mode inflates (the r13 driver
    # reading stayed +14% above the canary-NORMALIZED band; q55's was
    # fully mode-explained).  MEMORY_AND_DISK is faster and tight
    # (probe: near leg 1.435-2.631 -> 1.340-1.387 s), same lineage
    # semantics, spills under pressure (tools/probe_q54_storage.py).
    kept = sim.near_dedup_cosine(emb, planes, threshold=0.95, storage="memory")
    sem = SD.semantic_dedup(
        emb, _Q54_CENTS, threshold=0.2, keep="min_id", storage="memory"
    ).select("vec_id").withColumn("__sk", F.lit(True))
    return (
        kept.select("vec_id")
        .join(sem, "vec_id", "left")
        .select(
            "vec_id", F.coalesce(F.col("__sk"), F.lit(False)).alias("sem_kept")
        )
        .orderBy("vec_id")
    )


@_q(
    "q55_ivf_ann_recall",
    """
    SELECT CAST(20 AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
           TRUE AS recall_ok
    """,
)
def q55_ivf_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (spherical-k-means coarse quantizer, 8 clusters, 4 probes)
    self-checked against the exact brute-force top-5 for 20 queries: the
    output boolean asserts mean recall ≥ 0.55.  The IVF result set itself
    is quantizer-specific (not SQL-expressible), so — like q50's HLL
    error band — the oracle checks the *assertion*, which fails the
    driver hash-match if the inverted file ever degrades.  Measured mean
    recall on this corpus ≈ 0.76-0.80 (random embeddings, the worst case
    for IVF: no cluster structure to exploit).

    The quantizer trains on a ~40% deterministic sample with 2 Lloyd
    rounds — the scale recipe ivf_centroids documents (at 100 TB you
    never train the coarse quantizer on the full corpus).  Recall is
    insensitive to this (the recall_ok assertion is the guard): the
    quantizer only partitions the space, and nprobe=4 of 8 clusters
    covers half of it regardless of where the boundaries fall."""
    from bigdataproject_formula1_telemetry_spark.operators import sampling

    emb = _t(spark, sf_dir, "embeddings")
    train = sampling.deterministic_sample(emb, ["vec_id"], 0.4, salt="ivf-train")
    C = sim.ivf_centroids(train, n_clusters=8, max_iter=2)
    queries = emb.where(F.col("vec_id") < 20)
    # Arrow-matmul exact side: equality-tested against the HOF form in
    # pytest; the recall assertion is insensitive to float-noise ties
    exact = sim.knn_bruteforce_arrow(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    # fused single-scan IVF form: the sf tables are flat parquet (no
    # materialized inverted file to partition-prune), so the join form
    # would re-scan and HOF-score ~nprobe/n_clusters of the corpus per
    # query; equality with knn_ivf is pytest-asserted
    ivf = sim.knn_ivf_arrow(emb, queries, C, k=5, nprobe=4).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor_id")
    )
    # single left join so the brute-force frame is consumed ONCE (a
    # semi-join + separate groupBy re-ran the whole exact scoring twice);
    # (query_id, ivf_neighbor_id) is unique on the ivf side, so the left
    # join can't duplicate exact rows
    joined = exact.join(
        ivf,
        (exact["query_id"] == ivf["query_id"])
        & (exact["neighbor_id"] == ivf["ivf_neighbor_id"]),
        "left",
    ).select(exact["query_id"].alias("__qid"), ivf["ivf_neighbor_id"].alias("__hit"))
    per_q = joined.groupBy("__qid").agg(
        (F.count("__hit") / F.count(F.lit(1))).alias("recall")
    )
    agg = per_q.agg(
        F.count(F.lit(1)).alias("n_queries"), F.avg("recall").alias("mean_recall")
    )
    return agg.select(
        F.col("n_queries").cast("long"),
        F.lit(5).cast("long").alias("k"),
        (F.col("mean_recall") >= 0.55).alias("recall_ok"),
    )


@_q(
    "q31_simhash",
    """
    WITH words AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x <> '') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
        list_distinct(CASE WHEN len(w) <= 1 THEN [array_to_string(w, ' ')]
          ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
        END) AS g
      FROM words
    ), toks AS (
      SELECT doc_id, unnest(g) AS tok FROM grams
    ), bits AS (
      -- bit k of hex nibble i of md5(tok): per-position vote input
      SELECT doc_id, i.i AS i, k.k AS k,
        ((strpos('0123456789abcdef', substr(md5(tok), CAST(i.i AS INT), 1)) - 1)
          >> k.k) & 1 AS bit
      FROM toks
      CROSS JOIN (SELECT unnest(range(1, 17)) AS i) i
      CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
    ), maj AS (
      SELECT doc_id, i, k,
        CASE WHEN 2 * SUM(bit) > COUNT(*) THEN 1 ELSE 0 END AS mb
      FROM bits GROUP BY doc_id, i, k
    ), nibs AS (
      SELECT doc_id, i, SUM(mb * (1 << k)) AS nib FROM maj GROUP BY doc_id, i
    )
    SELECT doc_id,
      string_agg(substr('0123456789abcdef', CAST(nib AS INT) + 1, 1), ''
                 ORDER BY i) AS fp_hex
    FROM nibs GROUP BY doc_id ORDER BY doc_id
    """,
)
def q31_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints, portable-hash mode: per-bit majority vote over
    ``md5`` shingle hashes, emitted as a 16-char hex fingerprint.  md5 is
    identical in every engine, so — unlike the xxhash64 production path
    (``dedup.simhash_table``, pytest-covered) — the full fingerprint is
    oracle-checkable: DuckDB rebuilds every bit from per-nibble extraction
    of the same md5 hex strings."""
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.simhash_md5_table(docs).select(
        F.col("id").alias("doc_id"), "fp_hex"
    )
    # barrier before the sort: global orderBy range-samples its child,
    # which would run the Arrow kernel twice (measured 2× at sf0.1)
    return dedup._barrier(fp).orderBy("doc_id")


@_q(
    "q32_fingerprint_knn_lsh",
    """
    SELECT source,
           CAST(count(DISTINCT array_to_string(
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         w -> w <> ''), ' ')) AS BIGINT) AS n_distinct_fp,
           count(*) AS n_docs
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q32_fingerprint_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-fingerprint audit: distinct fingerprint count and doc
    count per source.  The fingerprint is xxhash64 of the normalized
    token stream, so its distinct count equals the distinct count of the
    normalized text itself absent 64-bit collisions — which is exactly
    what the oracle counts portably (verified collision-free on this
    corpus)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", T.fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.countDistinct("fp").alias("n_distinct_fp"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


@_q(
    "q57_report_compose",
    """
    SELECT section, key, sort_key, n, total FROM (
      SELECT 'priority' AS section, o_orderpriority AS key,
        CAST(CASE o_orderpriority
          WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
          WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE 6
        END AS BIGINT) AS sort_key,
        count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT 'ladder' AS section,
        CASE WHEN value > 300 THEN 'critical'
             WHEN value > 150 THEN 'major'
             ELSE 'minor' END AS key,
        CAST(CASE WHEN value > 300 THEN 1
                  WHEN value > 150 THEN 2
                  ELSE 3 END AS BIGINT) AS sort_key,
        count(*) AS n, round(sum(value), 4) AS total
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'segment' AS section, c_mktsegment AS key,
        CAST(row_number() OVER (ORDER BY c_mktsegment) AS BIGINT) AS sort_key,
        n, total
      FROM (
        SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
          AND c_acctbal > 0
        GROUP BY c_mktsegment
      )
      UNION ALL
      SELECT 'cap' AS section, tag AS key,
        CAST(CASE tag WHEN 'head' THEN 1 ELSE 2 END AS BIGINT) AS sort_key,
        count(*) AS n, round(sum(value), 4) AS total
      FROM (
        SELECT 'head' AS tag, value FROM
          (SELECT * FROM events ORDER BY ts, event_id LIMIT 1000)
        UNION ALL
        SELECT 'tail' AS tag, value FROM
          (SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 1000)
      ) GROUP BY tag
      UNION ALL
      -- ExactSubstr span dedup (Lee et al. ACL 2022), FULL keeper rule:
      -- every 50-token window occurring >1x in the planted corpus is
      -- excised from all occurrences except the global min-(doc_id,pos)
      SELECT 'exact_substr' AS section,
        CASE WHEN nt <> old THEN 'docs_changed' ELSE 'docs_unchanged' END AS key,
        CAST(CASE WHEN nt <> old THEN 1 ELSE 2 END AS BIGINT) AS sort_key,
        count(*) AS n,
        round(CAST(sum(length(old) - length(nt)) AS DOUBLE), 2) AS total
      FROM (
        WITH es_tok0 AS (
          SELECT doc_id, text,
            list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        x -> x <> '') AS toks
          FROM documents
          WHERE doc_id % 10 = 0
        ), es_base AS (
          SELECT doc_id, text, toks FROM es_tok0 WHERE len(toks) >= 60
        ), es_planted AS (
          SELECT doc_id, text FROM es_base
          UNION ALL
          SELECT doc_id + 100000000,
            'twin prefix for doc ' || CAST(doc_id AS VARCHAR) || ' ' ||
              array_to_string(toks[1:60], ' ')
          FROM es_base
        ), es_tok AS (
          SELECT doc_id, text,
            list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        x -> x <> '') AS toks
          FROM es_planted
        ), es_pos AS (
          SELECT doc_id, toks,
            unnest(range(0, greatest(len(toks) - 49, 0))) AS pos
          FROM es_tok
        ), es_sp AS (
          SELECT doc_id, pos,
            array_to_string(toks[pos + 1: pos + 50], ' ') AS sp
          FROM es_pos
        ), es_dup AS (
          SELECT doc_id, pos,
            count(*) OVER (PARTITION BY sp) AS c,
            row_number() OVER (PARTITION BY sp ORDER BY doc_id, pos) AS rn
          FROM es_sp
        ), es_cuts AS (
          SELECT doc_id, pos FROM es_dup WHERE c > 1 AND rn > 1
        ), es_cut_docs AS (
          SELECT DISTINCT doc_id FROM es_cuts
        ), es_toki AS (
          SELECT doc_id, unnest(toks) AS tok,
            unnest(range(0, len(toks))) AS i
          FROM es_tok WHERE doc_id IN (SELECT doc_id FROM es_cut_docs)
        ), es_kept AS (
          SELECT k.doc_id, k.tok, k.i FROM es_toki k
          WHERE NOT EXISTS (
            SELECT 1 FROM es_cuts c
            WHERE c.doc_id = k.doc_id
              AND c.pos <= k.i AND k.i < c.pos + 50)
        ), es_new AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS nt
          FROM es_kept GROUP BY doc_id
        )
        SELECT p.doc_id, p.text AS old,
          CASE WHEN cd.doc_id IS NULL THEN p.text
               ELSE COALESCE(n.nt, '') END AS nt
        FROM es_planted p
        LEFT JOIN es_cut_docs cd USING (doc_id)
        LEFT JOIN es_new n USING (doc_id)
      ) GROUP BY 2, 3
      UNION ALL
      -- UniMax waterfill (Chung et al. 2023 Algorithm 1): the oracle
      -- replays the EXACT sequential fill (ascending-capacity visit
      -- order, alloc = min(cap, remaining/left)) as a recursive CTE, so
      -- every IEEE double op happens in the same order as the Python
      -- driver loop — bit-identical allocations, then portable rounding
      SELECT 'unimax' AS section, source AS key,
        CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sort_key,
        n, floor(alloc * 10000.0 + 0.5) / 10000.0 AS total
      FROM (
        WITH RECURSIVE um_caps AS (
          SELECT source, 1.0 * CAST(sum(n_chars) AS DOUBLE) AS cap,
            count(*) AS n,
            CAST(row_number() OVER (
              ORDER BY 1.0 * CAST(sum(n_chars) AS DOUBLE), source
            ) AS INTEGER) AS rn
          FROM documents GROUP BY source
        ), um_l AS (SELECT count(*) AS l FROM um_caps),
        um_b AS (
          SELECT 0.97 * CAST(sum(n_chars) AS DOUBLE) AS budget
          FROM documents
        ),
        um_fill AS (
          SELECT 0 AS rn, (SELECT budget FROM um_b) AS remaining,
            CAST(NULL AS DOUBLE) AS alloc,
            CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n
          UNION ALL
          SELECT c.rn,
            f.remaining
              - least(c.cap,
                      f.remaining / ((SELECT l FROM um_l) - c.rn + 1)),
            least(c.cap,
                  f.remaining / ((SELECT l FROM um_l) - c.rn + 1)),
            c.source, c.n
          FROM um_fill f JOIN um_caps c ON c.rn = f.rn + 1
        )
        SELECT source, n, alloc FROM um_fill WHERE rn > 0
      )
      UNION ALL
      -- Z-order layout key (layout.zorder_key, minmax mode): the oracle
      -- recomputes bounds -> equi-width bucket (trunc, NOT round: Spark's
      -- double->long cast truncates) -> Morton interleave, then sums the
      -- full 16-bit keys per curve cell — any misplaced bit shifts a sum
      SELECT 'zorder' AS section, CAST(z >> 12 AS VARCHAR) AS key,
        CAST((z >> 12) + 1 AS BIGINT) AS sort_key,
        count(*) AS n, CAST(sum(z) AS DOUBLE) AS total
      FROM (
        SELECT CAST(list_sum(list_transform(range(0, 8), i ->
                 (((b.bx >> i) & 1) << (2 * i))
                 + (((b.by >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
        FROM (
          SELECT
            least(greatest(CAST(trunc((CAST(o_custkey AS DOUBLE) - st.lo1)
              / (st.hi1 - st.lo1) * 256.0) AS BIGINT), 0), 255) AS bx,
            least(greatest(CAST(trunc((CAST(o_orderkey AS DOUBLE) - st.lo2)
              / (st.hi2 - st.lo2) * 256.0) AS BIGINT), 0), 255) AS by
          FROM orders, (
            SELECT min(CAST(o_custkey AS DOUBLE)) AS lo1,
                   max(CAST(o_custkey AS DOUBLE)) AS hi1,
                   min(CAST(o_orderkey AS DOUBLE)) AS lo2,
                   max(CAST(o_orderkey AS DOUBLE)) AS hi2
            FROM orders) st
        ) b
      )
      GROUP BY z >> 12
      UNION ALL
      -- temperature-mixture sizing (mixing.temperature_fractions,
      -- tau=0.7, target = one epoch = N rows): f_c = min(1, target *
      -- (n^tau / Z) / n) — the head language's fraction stays < 1 while
      -- the tail languages cap at exactly 1.0, so the min() genuinely
      -- branches.  pow/sum drift between the Python driver loop and SQL
      -- is ~1e-16 against 1e-6 rounding.
      SELECT 'temp_mix' AS section, lang AS key,
        CAST(row_number() OVER (ORDER BY lang) AS BIGINT) AS sort_key,
        n, floor(frac * 1000000 + 0.5) / 1000000.0 AS total
      FROM (
        WITH tm_c AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY lang
        ), tm_z AS (
          SELECT sum(pow(CAST(n AS DOUBLE), 0.7)) AS z,
            CAST((SELECT sum(n) FROM tm_c) AS DOUBLE) AS tgt
          FROM tm_c
        )
        SELECT c.lang, c.n,
          least(1.0,
                tgt * (pow(CAST(c.n AS DOUBLE), 0.7) / z)
                    / CAST(c.n AS DOUBLE)) AS frac
        FROM tm_c c, tm_z
      )
      UNION ALL
      -- BM25 top-3 retrieval (operators/retrieval.py): five queries are
      -- token-4..9 slices of planted docs; the oracle recomputes the
      -- ENTIRE ranking function — corpus stats, tf, df, Lucene-style
      -- idf, length norm, per-query top-k.  Ranking is on the PORTABLY
      -- ROUNDED score (floor(x*1e6+0.5)/1e6, = score_round=6 on the
      -- Spark side) so exact-duplicate docs tie exactly and split by
      -- doc_id in both engines rather than by ~1e-16 float-sum order.
      -- Literal note: 2.2 == 1.2 + 1.0 bit-exactly, and DuckDB decimal
      -- literals promote to the identical doubles.  coalesce(text,'')
      -- mirrors _tokens's NULL->empty-array rule (dl=0, still in N).
      SELECT 'bm25' AS section,
        qid || '#' || CAST(rk AS VARCHAR) AS key,
        CAST(qnum * 10 + rk AS BIGINT) AS sort_key,
        CAST(id AS BIGINT) AS n,
        rscore AS total
      FROM (
        WITH bm_tok AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(coalesce(text, '')),
                                           '[^a-z0-9]+'),
                        x -> x <> '') AS t
          FROM documents
        ), bm_qt AS (
          SELECT DISTINCT 'q' || CAST(doc_id AS VARCHAR) AS qid,
            doc_id AS qnum, u.tok
          FROM bm_tok, unnest(t[4:9]) AS u(tok)
          WHERE doc_id IN (1, 101, 201, 301, 401) AND len(t) >= 9
        ), bm_stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(len(t)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          FROM bm_tok
        ), bm_tf AS (
          SELECT d.doc_id, u.tok, CAST(count(*) AS DOUBLE) AS tf,
            CAST(any_value(len(d.t)) AS DOUBLE) AS dl
          FROM bm_tok d, unnest(d.t) AS u(tok)
          WHERE u.tok IN (SELECT DISTINCT tok FROM bm_qt)
          GROUP BY d.doc_id, u.tok
        ), bm_df AS (
          SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM bm_tf GROUP BY tok
        ), bm_sc AS (
          SELECT q.qid, q.qnum, f.doc_id AS id,
            sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                * ((f.tf * 2.2)
                   / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl))))) AS score
          FROM bm_tf f
          JOIN bm_df d USING (tok)
          JOIN bm_qt q USING (tok), bm_stats s
          GROUP BY q.qid, q.qnum, f.doc_id
        )
        SELECT qid, qnum, id,
          floor(score * 1000000 + 0.5) / 1000000.0 AS rscore,
          row_number() OVER (
            PARTITION BY qid
            ORDER BY floor(score * 1000000 + 0.5) / 1000000.0 DESC, id
          ) AS rk
        FROM bm_sc
        QUALIFY rk <= 3
      )
      UNION ALL
      -- RRF hybrid fusion (retrieval.rrf_fuse, Cormack/Clarke/Buettcher
      -- 2009): the bm25 top-3 (rounded ranking, same as above — CTEs
      -- restated because UNION ALL branches don't share scope) fused
      -- with a term-overlap-count ranking.  Each 1/(60+r) divides
      -- identical integers (CAST forces double division — a bare 1.0/
      -- BIGINT would be DECIMAL) and the two-term sum is ONE
      -- commutative IEEE addition, so rrf is bit-exact across engines.
      SELECT 'rrf' AS section,
        qid || '#' || CAST(rk AS VARCHAR) AS key,
        CAST(qnum * 10 + rk AS BIGINT) AS sort_key,
        CAST(id AS BIGINT) AS n,
        floor(rrf * 1000000 + 0.5) / 1000000.0 AS total
      FROM (
        WITH f_tok AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(coalesce(text, '')),
                                           '[^a-z0-9]+'),
                        x -> x <> '') AS t
          FROM documents
        ), f_qt AS (
          SELECT DISTINCT 'q' || CAST(doc_id AS VARCHAR) AS qid,
            doc_id AS qnum, u.tok
          FROM f_tok, unnest(t[4:9]) AS u(tok)
          WHERE doc_id IN (1, 101, 201, 301, 401) AND len(t) >= 9
        ), f_stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(len(t)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          FROM f_tok
        ), f_tf AS (
          SELECT d.doc_id, u.tok, CAST(count(*) AS DOUBLE) AS tf,
            CAST(any_value(len(d.t)) AS DOUBLE) AS dl
          FROM f_tok d, unnest(d.t) AS u(tok)
          WHERE u.tok IN (SELECT DISTINCT tok FROM f_qt)
          GROUP BY d.doc_id, u.tok
        ), f_df AS (
          SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM f_tf GROUP BY tok
        ), f_sc AS (
          SELECT q.qid, q.qnum, f.doc_id AS id,
            sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                * ((f.tf * 2.2)
                   / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl))))) AS score
          FROM f_tf f
          JOIN f_df d USING (tok)
          JOIN f_qt q USING (tok), f_stats s
          GROUP BY q.qid, q.qnum, f.doc_id
        ), f_lex AS (
          SELECT qid, qnum, id,
            row_number() OVER (
              PARTITION BY qid
              ORDER BY floor(score * 1000000 + 0.5) / 1000000.0 DESC, id
            ) AS r1
          FROM f_sc
          QUALIFY r1 <= 3
        ), f_ov AS (
          SELECT q.qid, q.qnum, p.doc_id AS id, count(*) AS ov
          FROM (
            SELECT DISTINCT d2.doc_id, u.tok
            FROM f_tok d2, unnest(d2.t) AS u(tok)
          ) p
          JOIN f_qt q USING (tok)
          GROUP BY q.qid, q.qnum, p.doc_id
        ), f_ov3 AS (
          SELECT qid, qnum, id,
            row_number() OVER (
              PARTITION BY qid ORDER BY ov DESC, id
            ) AS r2
          FROM f_ov
          QUALIFY r2 <= 3
        ), f_fuse AS (
          SELECT coalesce(l.qid, o.qid) AS qid,
            coalesce(l.qnum, o.qnum) AS qnum,
            coalesce(l.id, o.id) AS id,
            coalesce(CAST(1.0 AS DOUBLE) / (60 + l.r1), 0.0)
              + coalesce(CAST(1.0 AS DOUBLE) / (60 + o.r2), 0.0) AS rrf
          FROM f_lex l
          FULL OUTER JOIN f_ov3 o ON l.qid = o.qid AND l.id = o.id
        )
        SELECT qid, qnum, id, rrf,
          row_number() OVER (
            PARTITION BY qid ORDER BY rrf DESC, id
          ) AS rk
        FROM f_fuse
        QUALIFY rk <= 3
      )
      UNION ALL
      -- RM3 expansion + weighted BM25 re-query (retrieval.bm25_topk_rm3,
      -- Lavrenko & Croft SIGIR 2001; fb_docs=3, fb_terms=5,
      -- orig_weight=0.5, k=3, score_round=6): the oracle replays BOTH
      -- passes — rounded-score feedback retrieval, relevance model
      -- P(t|R) = Σ P(t|d)·P(d|q) over the feedback docs, the (weight
      -- DESC, term ASC) fb_terms cut renormalized and 0.5/0.5-
      -- interpolated with the uniform original model, then weighted
      -- BM25 over the EXPANSION vocabulary ranked on the portably
      -- rounded score.  Multiplication order matches the engine:
      -- (w · idf) · sat, summed per (query, doc).  The fb_terms cut
      -- ranks RAW relevance-model weights; its adjacent-gap margin is
      -- probed at all SFs (tools/probe_rm3_margins.py, SCALING r12).
      SELECT 'rm3' AS section,
        qid || '#' || CAST(rk AS VARCHAR) AS key,
        CAST(qnum * 10 + rk AS BIGINT) AS sort_key,
        CAST(id AS BIGINT) AS n,
        rscore AS total
      FROM (
        WITH r3_tok AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(coalesce(text, '')),
                                           '[^a-z0-9]+'),
                        x -> x <> '') AS t
          FROM documents
        ), r3_qt AS (
          SELECT DISTINCT 'q' || CAST(doc_id AS VARCHAR) AS qid,
            doc_id AS qnum, u.tok
          FROM r3_tok, unnest(t[4:9]) AS u(tok)
          WHERE doc_id IN (1, 101, 201, 301, 401) AND len(t) >= 9
        ), r3_stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(len(t)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          FROM r3_tok
        ), r3_tf AS (
          SELECT d.doc_id, u.tok, CAST(count(*) AS DOUBLE) AS tf,
            CAST(any_value(len(d.t)) AS DOUBLE) AS dl
          FROM r3_tok d, unnest(d.t) AS u(tok)
          WHERE u.tok IN (SELECT DISTINCT tok FROM r3_qt)
          GROUP BY d.doc_id, u.tok
        ), r3_df AS (
          SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM r3_tf GROUP BY tok
        ), r3_fb AS (
          SELECT qid, qnum, id, rscore FROM (
            SELECT q.qid, q.qnum, f.doc_id AS id,
              floor(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                  * ((f.tf * 2.2)
                     / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl)))))
                * 1000000 + 0.5) / 1000000.0 AS rscore
            FROM r3_tf f
            JOIN r3_df d USING (tok)
            JOIN r3_qt q USING (tok), r3_stats s
            GROUP BY q.qid, q.qnum, f.doc_id
          )
          QUALIFY row_number() OVER (
            PARTITION BY qid ORDER BY rscore DESC, id) <= 3
        ), r3_pd AS (
          SELECT qid, qnum, id,
            rscore / sum(rscore) OVER (PARTITION BY qid) AS pd
          FROM r3_fb
        ), r3_ptd AS (
          SELECT t.doc_id AS id, u.tok,
            CAST(count(*) AS DOUBLE)
              / CAST(any_value(len(t.t)) AS DOUBLE) AS ptd
          FROM r3_tok t, unnest(t.t) AS u(tok)
          WHERE t.doc_id IN (SELECT DISTINCT id FROM r3_fb)
            AND len(t.t) > 0
          GROUP BY t.doc_id, u.tok
        ), r3_rm AS (
          -- relevance-model weights rounded portably at 1e-9 (the
          -- operator's fb_score_round+3 quantum) BEFORE the term cut:
          -- structurally-tied terms tie exactly in both engines and
          -- split on the term tiebreak (margins probed, SCALING r12)
          SELECT p.qid, p.qnum, d.tok,
            floor(sum(d.ptd * p.pd) * 1000000000 + 0.5)
              / 1000000000.0 AS rm
          FROM r3_ptd d JOIN r3_pd p USING (id)
          GROUP BY p.qid, p.qnum, d.tok
        ), r3_rmcut AS (
          SELECT qid, qnum, tok, rm FROM (
            SELECT qid, qnum, tok, rm,
              row_number() OVER (
                PARTITION BY qid ORDER BY rm DESC, tok) AS rn
            FROM r3_rm)
          WHERE rn <= 5
        ), r3_rmtop AS (
          SELECT qid, qnum, tok,
            rm / sum(rm) OVER (PARTITION BY qid) AS prm
          FROM r3_rmcut
        ), r3_pq AS (
          SELECT qid, qnum, tok,
            1.0 / CAST(count(*) OVER (PARTITION BY qid) AS DOUBLE) AS pq
          FROM r3_qt
        ), r3_w AS (
          SELECT coalesce(p.qid, r.qid) AS qid,
            coalesce(p.qnum, r.qnum) AS qnum,
            coalesce(p.tok, r.tok) AS tok,
            0.5 * coalesce(p.pq, 0.0) + 0.5 * coalesce(r.prm, 0.0) AS w
          FROM r3_pq p
          FULL OUTER JOIN r3_rmtop r ON p.qid = r.qid AND p.tok = r.tok
          WHERE 0.5 * coalesce(p.pq, 0.0)
              + 0.5 * coalesce(r.prm, 0.0) > 0
        ), r3_tf2 AS (
          SELECT d.doc_id, u.tok, CAST(count(*) AS DOUBLE) AS tf,
            CAST(any_value(len(d.t)) AS DOUBLE) AS dl
          FROM r3_tok d, unnest(d.t) AS u(tok)
          WHERE u.tok IN (SELECT DISTINCT tok FROM r3_w)
          GROUP BY d.doc_id, u.tok
        ), r3_df2 AS (
          SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM r3_tf2 GROUP BY tok
        ), r3_sc AS (
          SELECT w.qid, w.qnum, f.doc_id AS id,
            floor(sum(w.w * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                * ((f.tf * 2.2)
                   / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl)))))
              * 1000000 + 0.5) / 1000000.0 AS rscore
          FROM r3_tf2 f
          JOIN r3_df2 d USING (tok)
          JOIN r3_w w USING (tok), r3_stats s
          GROUP BY w.qid, w.qnum, f.doc_id
        )
        SELECT qid, qnum, id, rscore,
          row_number() OVER (
            PARTITION BY qid ORDER BY rscore DESC, id) AS rk
        FROM r3_sc
        QUALIFY rk <= 3
      )
      UNION ALL
      -- contamination_report (pipelines.py): the composed audit — BM25
      -- top-3 per benchmark item (rounded ranking, CTEs restated per
      -- UNION-branch scoping), left-joined with the BIGRAM distinct-
      -- overlap count (global bench gram set, the contamination_hits
      -- rule; shingle_n=2 so the gram leg bites on this small-vocab
      -- corpus) and the >= 0.3 hashed-BoW cosine (md5 bucket+sign, the
      -- q29 sem pattern, computed only for the report's 15 pairs).
      -- `contam_report` rows carry (doc, rounded score); `contam_flags`
      -- rows carry (gram hits, cosine | -2 when below threshold/absent).
      SELECT section, key, sort_key, n, total FROM (
        WITH cr_tok AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(coalesce(text, '')),
                                           '[^a-z0-9]+'),
                        x -> x <> '') AS t
          FROM documents
        ), cr_qt AS (
          SELECT DISTINCT doc_id AS qnum, u.tok
          FROM cr_tok, unnest(t[4:9]) AS u(tok)
          WHERE doc_id IN (1, 101, 201, 301, 401) AND len(t) >= 9
        ), cr_stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(len(t)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          FROM cr_tok
        ), cr_tf AS (
          SELECT d.doc_id, u.tok, CAST(count(*) AS DOUBLE) AS tf,
            CAST(any_value(len(d.t)) AS DOUBLE) AS dl
          FROM cr_tok d, unnest(d.t) AS u(tok)
          WHERE u.tok IN (SELECT DISTINCT tok FROM cr_qt)
          GROUP BY d.doc_id, u.tok
        ), cr_df AS (
          SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM cr_tf GROUP BY tok
        ), cr_top AS (
          SELECT qnum, id, rscore,
            row_number() OVER (
              PARTITION BY qnum ORDER BY rscore DESC, id) AS rk
          FROM (
            SELECT q.qnum, f.doc_id AS id,
              floor(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                  * ((f.tf * 2.2)
                     / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl)))))
                * 1000000 + 0.5) / 1000000.0 AS rscore
            FROM cr_tf f
            JOIN cr_df d USING (tok)
            JOIN cr_qt q USING (tok), cr_stats s
            GROUP BY q.qnum, f.doc_id
          )
          QUALIFY rk <= 3
        ), cr_ids AS (
          SELECT DISTINCT id FROM cr_top
        ), cr_bt AS (
          -- benchmark item text = tokens 4..9 re-tokenized (6 tokens)
          SELECT doc_id AS qnum, t[4:9] AS bt
          FROM cr_tok
          WHERE doc_id IN (1, 101, 201, 301, 401) AND len(t) >= 9
        ), cr_bg AS (
          -- GLOBAL distinct bench bigram set (contamination_hits rule)
          SELECT DISTINCT array_to_string(bt[p + 1 : p + 2], ' ') AS gram
          FROM (SELECT bt, unnest(range(0, greatest(len(bt) - 1, 0))) AS p
                FROM cr_bt)
        ), cr_dg AS (
          -- per report doc: DISTINCT grams (shingles is array_distinct;
          -- docs under 2 tokens contribute their whole text, the
          -- operator's short-text branch)
          SELECT g.doc_id, CAST(count(*) AS BIGINT) AS hits
          FROM (
            SELECT DISTINCT doc_id, gram FROM (
              SELECT doc_id, array_to_string(t[p + 1 : p + 2], ' ') AS gram
              FROM (SELECT doc_id, t,
                      unnest(range(0, greatest(len(t) - 1, 0))) AS p
                    FROM cr_tok
                    WHERE doc_id IN (SELECT id FROM cr_ids))
              UNION ALL
              SELECT doc_id, array_to_string(t, ' ') AS gram
              FROM cr_tok
              WHERE doc_id IN (SELECT id FROM cr_ids) AND len(t) < 2
            )
          ) g JOIN cr_bg USING (gram)
          GROUP BY g.doc_id
        ), cr_dtb AS (
          -- hashed-BoW (md5 bucket+sign, dim 256, salt 'hashemb') for
          -- the report docs — WHITESPACE tokens (the embed.py rule)
          SELECT doc_id,
            CAST(('0x' || substr(md5('hashemb|' || tok), 1, 8)) AS UBIGINT)
              % 256 AS b,
            CASE WHEN (strpos('0123456789abcdef',
                              substr(md5('hashemb|' || tok), 9, 1)) - 1)
                      % 2 = 0
                 THEN 1.0 ELSE -1.0 END AS s
          FROM (
            SELECT doc_id,
              unnest(list_filter(regexp_split_to_array(
                       trim(lower(coalesce(text, ''))), '\\s+'),
                     x -> x <> '')) AS tok
            FROM documents WHERE doc_id IN (SELECT id FROM cr_ids)
          )
        ), cr_dv AS (
          SELECT doc_id, b, sum(s) AS v FROM cr_dtb GROUP BY doc_id, b
        ), cr_dn AS (
          SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM cr_dv GROUP BY doc_id
        ), cr_dx AS (
          SELECT v.doc_id, v.b, v.v / n.nrm AS x
          FROM cr_dv v JOIN cr_dn n USING (doc_id) WHERE n.nrm > 0
        ), cr_btb AS (
          SELECT qnum,
            CAST(('0x' || substr(md5('hashemb|' || tok), 1, 8)) AS UBIGINT)
              % 256 AS b,
            CASE WHEN (strpos('0123456789abcdef',
                              substr(md5('hashemb|' || tok), 9, 1)) - 1)
                      % 2 = 0
                 THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT qnum, unnest(bt) AS tok FROM cr_bt)
        ), cr_bv AS (
          SELECT qnum, b, sum(s) AS v FROM cr_btb GROUP BY qnum, b
        ), cr_bn AS (
          SELECT qnum, sqrt(sum(v * v)) AS nrm FROM cr_bv GROUP BY qnum
        ), cr_bx AS (
          SELECT v.qnum, v.b, v.v / n.nrm AS x
          FROM cr_bv v JOIN cr_bn n USING (qnum) WHERE n.nrm > 0
        ), cr_cos AS (
          SELECT t.qnum, t.id, sum(d.x * b.x) AS cs
          FROM cr_top t
          JOIN cr_dx d ON d.doc_id = t.id
          JOIN cr_bx b ON b.qnum = t.qnum AND b.b = d.b
          GROUP BY t.qnum, t.id
        ), cr_out AS (
          SELECT t.qnum, t.rk, t.id, t.rscore,
            coalesce(g.hits, 0) AS hits,
            CASE WHEN c.cs >= 0.3
                 THEN floor(c.cs * 1000000 + 0.5) / 1000000.0
                 ELSE -2.0 END AS cosv
          FROM cr_top t
          LEFT JOIN cr_dg g ON g.doc_id = t.id
          LEFT JOIN cr_cos c ON c.qnum = t.qnum AND c.id = t.id
        )
        SELECT 'contam_report' AS section,
          'q' || CAST(qnum AS VARCHAR) || '#' || CAST(rk AS VARCHAR) AS key,
          CAST(qnum * 10 + rk AS BIGINT) AS sort_key,
          CAST(id AS BIGINT) AS n, rscore AS total
        FROM cr_out
        UNION ALL
        SELECT 'contam_flags' AS section,
          'q' || CAST(qnum AS VARCHAR) || '#' || CAST(rk AS VARCHAR) AS key,
          CAST(qnum * 10 + rk AS BIGINT) AS sort_key,
          CAST(hits AS BIGINT) AS n, cosv AS total
        FROM cr_out
      )
      UNION ALL
      -- MMR diversity re-rank (retrieval.mmr_rerank, Carbonell &
      -- Goldstein 1998): 5 queries x 12 candidates (embeddings vec_ids
      -- qnum..qnum+11), rel = ((id*7)%13)/13, lam=0.7, k=3.  The oracle
      -- UNROLLS the greedy as three stages (window functions are not
      -- allowed in a recursive term): each stage ranks the portably
      -- rounded MMR = floor((0.7*rel - 0.3*max_sim)*1e6 + 0.5)/1e6 with
      -- an id tiebreak, exactly the Spark kernel's score_round=6 rule;
      -- max_sim is the TRUE max cosine over the picked set (negative
      -- cosines stay negative — the paper's definition).  Margins at
      -- all SFs: rounding-edge >= 7.7e-9 abs, pick gap >= 0.0118.
      SELECT 'mmr' AS section,
        'q' || CAST(qnum AS VARCHAR) || '#' || CAST(rk AS VARCHAR) AS key,
        CAST(qnum * 10 + rk AS BIGINT) AS sort_key,
        CAST(id AS BIGINT) AS n,
        mmr AS total
      FROM (
        WITH mm_q AS (
          SELECT unnest([1, 101, 201, 301, 401]) AS qnum
        ), mm_cand AS (
          -- pool generated ANALYTICALLY (qnum..qnum+11, mirroring the
          -- Spark side's sequence()) with a LEFT JOIN to embeddings: a
          -- dataset missing a vec_id degrades exactly like the kernel's
          -- zero-fill (nv NULL -> every dot coalesces to 0 below)
          -- instead of silently shrinking the pool (ADVICE r11); the
          -- norm>0 guard matches the kernel's zero-norm handling
          SELECT q.qnum, q.qnum + o.off AS id,
            CAST(((q.qnum + o.off) * 7) % 13 AS DOUBLE) / 13.0 AS rel,
            CASE WHEN e.vec_id IS NOT NULL AND
                      list_sum(list_transform(e.embedding,
                        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) > 0
                 THEN list_transform(e.embedding, x -> CAST(x AS DOUBLE) /
                   sqrt(list_sum(list_transform(e.embedding,
                     y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
                 END AS nv
          FROM mm_q q
          CROSS JOIN (SELECT unnest(range(0, 12)) AS off) o
          LEFT JOIN embeddings e ON e.vec_id = q.qnum + o.off
        ), mm_p1 AS (
          SELECT qnum, id, nv, mmr FROM (
            SELECT qnum, id, nv,
              floor(CAST(0.7 AS DOUBLE) * rel * 1000000 + 0.5)
                / 1000000.0 AS mmr,
              row_number() OVER (PARTITION BY qnum ORDER BY
                floor(CAST(0.7 AS DOUBLE) * rel * 1000000 + 0.5)
                  / 1000000.0 DESC, id) AS rn
            FROM mm_cand)
          WHERE rn = 1
        ), mm_p2 AS (
          SELECT qnum, id, nv, mmr FROM (
            SELECT c.qnum, c.id, c.nv,
              floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
                     coalesce(list_sum(list_transform(range(1, 65),
                       i -> c.nv[i] * p.nv[i])), 0.0))
                    * 1000000 + 0.5) / 1000000.0 AS mmr,
              row_number() OVER (PARTITION BY c.qnum ORDER BY
                floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
                       coalesce(list_sum(list_transform(range(1, 65),
                         i -> c.nv[i] * p.nv[i])), 0.0))
                      * 1000000 + 0.5) / 1000000.0 DESC, c.id) AS rn
            FROM mm_cand c JOIN mm_p1 p USING (qnum)
            WHERE c.id <> p.id)
          WHERE rn = 1
        ), mm_p3 AS (
          SELECT qnum, id, mmr FROM (
            SELECT c.qnum, c.id,
              floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
                     greatest(
                       coalesce(list_sum(list_transform(range(1, 65),
                         i -> c.nv[i] * p1.nv[i])), 0.0),
                       coalesce(list_sum(list_transform(range(1, 65),
                         i -> c.nv[i] * p2.nv[i])), 0.0)))
                    * 1000000 + 0.5) / 1000000.0 AS mmr,
              row_number() OVER (PARTITION BY c.qnum ORDER BY
                floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
                       greatest(
                         coalesce(list_sum(list_transform(range(1, 65),
                           i -> c.nv[i] * p1.nv[i])), 0.0),
                         coalesce(list_sum(list_transform(range(1, 65),
                           i -> c.nv[i] * p2.nv[i])), 0.0)))
                      * 1000000 + 0.5) / 1000000.0 DESC, c.id) AS rn
            FROM mm_cand c
            JOIN mm_p1 p1 USING (qnum) JOIN mm_p2 p2 ON p2.qnum = c.qnum
            WHERE c.id <> p1.id AND c.id <> p2.id)
          WHERE rn = 1
        )
        SELECT qnum, id, mmr, 1 AS rk FROM mm_p1
        UNION ALL SELECT qnum, id, mmr, 2 FROM mm_p2
        UNION ALL SELECT qnum, id, mmr, 3 FROM mm_p3
      )
      UNION ALL
      -- IR metrics (retrieval.retrieval_metrics): fully analytic
      -- results/qrels (rank 4 retrieved-but-unjudged, graded rels with
      -- judged-non-relevant rows), all four trec_eval-core metrics
      -- recomputed — precision/recall@5, MRR, burges-gain nDCG@5 with
      -- the id-tiebroken ideal ordering.  Rounding-edge >= 5.1e-8 abs.
      SELECT 'ir_metrics' AS section,
        'q' || CAST(qnum AS VARCHAR) || '#' || m AS key,
        CAST(qnum * 10 + mi AS BIGINT) AS sort_key,
        n_rel AS n,
        floor(v * 1000000 + 0.5) / 1000000.0 AS total
      FROM (
        WITH im_q AS (
          SELECT unnest([1, 2, 3, 4, 5]) AS qnum
        ), im_res AS (
          SELECT qnum, qnum * 1000 + r AS id, r AS rank
          FROM im_q, unnest(range(1, 9)) AS t(r)
        ), im_qrel AS (
          SELECT qnum, qnum * 1000 + j AS id,
            CAST((j * 3 + qnum) % 4 AS DOUBLE) AS rel
          FROM im_q, unnest(range(1, 13)) AS t(j)
          WHERE j % 5 <> 4
        ), im_base AS (
          SELECT qnum,
            CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_rel,
            sum(CASE WHEN irank <= 5
                THEN (pow(2.0, rel) - 1.0)
                     / log2(CAST(irank AS DOUBLE) + 1.0)
                ELSE 0.0 END) AS idcg
          FROM (
            SELECT qnum, rel,
              row_number() OVER (
                PARTITION BY qnum ORDER BY rel DESC, id) AS irank
            FROM im_qrel
          ) GROUP BY qnum
          HAVING sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) > 0
        ), im_hits AS (
          SELECT r.qnum, r.rank, coalesce(q.rel, 0.0) AS rel
          FROM im_res r
          LEFT JOIN im_qrel q ON q.qnum = r.qnum AND q.id = r.id
          WHERE r.rank <= 5
        ), im_per AS (
          SELECT qnum,
            sum(CASE WHEN rel > 0 THEN 1.0 ELSE 0.0 END) / 5.0 AS p_at_k,
            sum(CASE WHEN rel > 0 THEN 1.0 ELSE 0.0 END) AS n_hit,
            sum((pow(2.0, rel) - 1.0)
                / log2(CAST(rank AS DOUBLE) + 1.0)) AS dcg
          FROM im_hits GROUP BY qnum
        ), im_mrr AS (
          -- mrr over the FULL run (trec_eval recip_rank), not the @k cut
          SELECT r.qnum, max(1.0 / CAST(r.rank AS DOUBLE)) AS mrr
          FROM im_res r
          JOIN im_qrel q ON q.qnum = r.qnum AND q.id = r.id
          WHERE q.rel > 0
          GROUP BY r.qnum
        ), im_fin AS (
          SELECT b.qnum, b.n_rel,
            coalesce(p.p_at_k, 0.0) AS p_at_k,
            coalesce(p.n_hit, 0.0) / CAST(b.n_rel AS DOUBLE) AS recall,
            coalesce(m.mrr, 0.0) AS mrr,
            coalesce(p.dcg, 0.0) / b.idcg AS ndcg
          FROM im_base b LEFT JOIN im_per p USING (qnum)
          LEFT JOIN im_mrr m USING (qnum)
        )
        SELECT qnum, n_rel, 'p' AS m, 1 AS mi, p_at_k AS v FROM im_fin
        UNION ALL SELECT qnum, n_rel, 'r', 2, recall FROM im_fin
        UNION ALL SELECT qnum, n_rel, 'mrr', 3, mrr FROM im_fin
        UNION ALL SELECT qnum, n_rel, 'ndcg', 4, ndcg FROM im_fin
      )
      UNION ALL
      -- corpus_diff: full-outer change classification recomputed on raw
      -- TEXT equality (the operator joins 16-byte md5 hashes — the
      -- oracle is hash-free, so hashing bugs trip the compare)
      SELECT 'corpus_diff' AS section, change AS key,
        CAST(CASE change WHEN 'added' THEN 1 WHEN 'modified' THEN 2
             WHEN 'removed' THEN 3 ELSE 4 END AS BIGINT) AS sort_key,
        count(*) AS n, CAST(sum(id) AS DOUBLE) AS total
      FROM (
        SELECT COALESCE(o.doc_id, n.doc_id) AS id,
          CASE WHEN o.doc_id IS NULL THEN 'added'
               WHEN n.doc_id IS NULL THEN 'removed'
               WHEN o.text = n.text THEN 'unchanged'
               ELSE 'modified' END AS change
        FROM (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0) o
        FULL OUTER JOIN (
          SELECT doc_id,
            CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
          FROM documents WHERE doc_id % 3 <> 0
        ) n ON o.doc_id = n.doc_id
      ) GROUP BY change
      UNION ALL
      -- incrementally-merged datasheet card: the Spark side runs the
      -- REAL corpus_card_partial + merge_card_partials over a 3-way
      -- doc_id split; the oracle recomputes the mergeable sums in ONE
      -- pass over the union (the merge contract).  The hll/* rows are
      -- Spark-side ±5% band assertions against true distinct counts
      -- (the q50 pattern) — the oracle states the expected verdict.
      SELECT 'card_merge' AS section, key, sort_key, n, total FROM (
        WITH cm_base AS (
          SELECT doc_id, text, lang,
            list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        x -> x <> '') AS toks,
            list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                        x -> x <> '') AS lower_toks,
            list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                        w -> w <> '') AS words
          FROM documents
        ), cm_q AS (
          -- per-doc fixed quality bin: same scalar IEEE math as the
          -- Spark score (probe: tools/probe_quality_hist_margins.py
          -- pins per-doc bit-identity at every SF)
          SELECT CAST(least(floor(
            ((least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
              + (1.0 - least(CASE WHEN length(text) > 0
                   THEN CAST(length(regexp_replace(
                          text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                        / CAST(length(text) AS DOUBLE) * 5.0
                   ELSE 0.0 END, 1.0)))
             + least(CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(lower_toks,
                        w -> list_contains(
                          ['the','and','of','to','is'], w)))
                      AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 10.0
                 ELSE 0.0 END, 1.0)) / 3.0
            * 100), 99) AS BIGINT) AS b
          FROM cm_base WHERE text IS NOT NULL
        ), cm_qn AS (
          SELECT count(*) AS n FROM cm_q
        ), cm_qcum AS (
          SELECT b, sum(c) OVER (ORDER BY b) AS cum FROM (
            SELECT b, count(*) AS c FROM cm_q GROUP BY b
          )
        ), cm_grams AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len(words) <= 12 THEN [array_to_string(words, ' ')]
                 ELSE list_transform(range(1, len(words) - 11),
                        i -> array_to_string(words[i : i + 12], ' '))
            END) AS g
          FROM cm_base
        )
        SELECT 'size/docs' AS key, CAST(1 AS BIGINT) AS sort_key,
               count(*) AS n, CAST(count(*) AS DOUBLE) AS total
        FROM documents
        UNION ALL
        SELECT 'size/tokens', CAST(2 AS BIGINT),
               CAST(sum(len(toks)) AS BIGINT),
               CAST(sum(len(toks)) AS DOUBLE)
        FROM cm_base
        UNION ALL
        SELECT 'size/chars', CAST(3 AS BIGINT),
               CAST(sum(length(text)) AS BIGINT),
               CAST(sum(length(text)) AS DOUBLE)
        FROM documents
        UNION ALL
        SELECT 'pii/emails', CAST(4 AS BIGINT),
               CAST(sum(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')))
                 AS BIGINT),
               CAST(sum(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')))
                 AS DOUBLE)
        FROM documents
        UNION ALL
        SELECT 'pii/ipv4', CAST(5 AS BIGINT),
               CAST(sum(len(regexp_extract_all(text,
                 '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))) AS BIGINT),
               CAST(sum(len(regexp_extract_all(text,
                 '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))) AS DOUBLE)
        FROM documents
        UNION ALL
        SELECT 'diversity/ngrams_13', CAST(6 AS BIGINT),
               CAST(sum(len(g)) AS BIGINT), CAST(sum(len(g)) AS DOUBLE)
        FROM cm_grams
        UNION ALL
        SELECT 'hll/dup_frac_ok', CAST(7 AS BIGINT),
               CAST(1 AS BIGINT), CAST(1 AS DOUBLE)
        UNION ALL
        SELECT 'hll/gram_frac_ok', CAST(8 AS BIGINT),
               CAST(1 AS BIGINT), CAST(1 AS DOUBLE)
        UNION ALL
        SELECT 'quality/n_scored', CAST(9 AS BIGINT),
               n, CAST(n AS DOUBLE) FROM cm_qn
        UNION ALL
        -- smallest bin whose cumulative count reaches ceil(p*n), the
        -- pure-integer rank ((num*n + den-1) // den) the merge uses
        SELECT 'quality/p10_bin', CAST(10 AS BIGINT),
               min(b), CAST(min(b) AS DOUBLE)
        FROM cm_qcum, cm_qn WHERE cum >= (n + 9) // 10
        UNION ALL
        SELECT 'quality/p50_bin', CAST(11 AS BIGINT),
               min(b), CAST(min(b) AS DOUBLE)
        FROM cm_qcum, cm_qn WHERE cum >= (n + 1) // 2
        UNION ALL
        SELECT 'quality/p90_bin', CAST(12 AS BIGINT),
               min(b), CAST(min(b) AS DOUBLE)
        FROM cm_qcum, cm_qn WHERE cum >= (9 * n + 9) // 10
        UNION ALL
        SELECT 'lang/' || lang,
               CAST(12 + row_number() OVER (ORDER BY lang) AS BIGINT),
               n, CAST(n AS DOUBLE)
        FROM (
          SELECT lang, count(*) AS n FROM documents
          WHERE lang IS NOT NULL GROUP BY lang
        )
      )
    )
    ORDER BY section, sort_key, key
    """,
)
def q57_report_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite report covering five §2 shapes in one driver-checked row:
    A8 union-concat of tagged section frames (pd.concat sites,
    F1_Data_PreProcessing.ipynb:124), O4 categorical custom order
    (pd.Categorical, F1_Data_Interactive_Analysis.ipynb:66-68), F12
    threshold-ladder advice rules (P3-...ipynb:180-185), O5 distinct+sort
    surfaced as a rank over the sorted distinct set
    (F1_web_dashboard_app.py:252), O3 head/tail row caps
    (train_by_circuit.py:160-162), plus a P4 membership predicate.
    All sections aggregate to a handful of rows before the union, so the
    union-all is over tiny frames — the scans themselves stay pushed-down
    and parallel.

    The ``exact_substr`` section (r10) gives ExactSubstr span dedup
    (``dedup.remove_duplicate_spans``) its driver-checked oracle row: a
    deterministic planted corpus — every ≥60-token ``doc_id%10==0``
    document plus a twin embedding its first 60 tokens behind a unique
    prefix — runs the real operator, and the DuckDB oracle recomputes
    the complete keeper rule (50-token window strings, global
    min-(doc_id,pos) keeper, per-doc cut-range union, token-level text
    reconstruction).  The planting guarantees the rule BITES (every twin
    is cut); the oracle is the rule itself, so accidental duplicate
    spans between base docs are checked too (at sf0.1 it catches 2 of
    them beyond the 215 twins).  Spark-side hashes vs oracle-side exact
    strings differ only on 64-bit rolling-hash collisions (~1e-11 at
    this scale, deterministic corpus).

    The ``rrf`` section (r11) oracle-checks Reciprocal Rank Fusion
    (``retrieval.rrf_fuse``, Cormack et al. 2009): the bm25 top-3
    fused with an integer term-overlap ranking.  Every 1/(60+rank)
    contribution divides identical integers and the two-ranker sum is
    ONE commutative IEEE addition, so the fused score is bit-exact
    across engines — the one float driver column with NO margin to
    probe, by construction.

    The ``mmr`` section (r11) oracle-checks Maximal Marginal Relevance
    re-ranking (``retrieval.mmr_rerank``, Carbonell & Goldstein 1998):
    five queries with 12-candidate pools from the embeddings table,
    analytic relevance, lam=0.7, k=3, ranked on the portably rounded
    MMR (score_round=6).  The REAL greedy Arrow kernel runs; the
    oracle unrolls the 3-step greedy as three SQL stages over the same
    normalized vectors.  Margins probed at all SFs: rounding-edge
    distance ≥ 7.7e-9 absolute, pick/runner-up rounded gap ≥ 0.0118,
    zero rounded ties.

    The ``ir_metrics`` section (r11) oracle-checks the trec_eval core
    (``retrieval.retrieval_metrics``) on FULLY ANALYTIC inputs (no
    corpus dependency): 5 queries × (precision/recall@5, MRR, nDCG@5),
    every convention branching — a retrieved-but-unjudged rank, graded
    rels, judged-non-relevant rows.  Rounding-edge ≥ 5.1e-8 absolute."""
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")

    # O4 — custom categorical order over order priorities
    prio_rank = R.custom_order(
        F.col("o_orderpriority"),
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    )
    priority = (
        o.groupBy("o_orderpriority")
        .agg(
            F.first(prio_rank).cast("long").alias("sort_key"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.lit("priority").alias("section"),
            F.col("o_orderpriority").alias("key"),
            "sort_key",
            "n",
            "total",
        )
    )

    # F12 — threshold ladder over event values, with its own custom order
    sev = FN.threshold_ladder(
        F.col("value"), [(300.0, "critical"), (150.0, "major")], "minor"
    )
    ladder = (
        ev.select(sev.alias("key"), "value")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.lit("ladder").alias("section"),
            "key",
            R.custom_order(F.col("key"), ["critical", "major", "minor"])
            .cast("long")
            .alias("sort_key"),
            "n",
            "total",
        )
    )

    # P4 membership + O5 distinct+sort (rank over the sorted distinct set)
    seg_agg = (
        c.where(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
        )
        .where(F.col("c_acctbal") > 0)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total"))
    )
    segment = seg_agg.select(
        F.lit("segment").alias("section"),
        F.col("c_mktsegment").alias("key"),
        F.row_number()
        .over(Window.orderBy("c_mktsegment"))
        .cast("long")
        .alias("sort_key"),
        "n",
        "total",
    )

    # ExactSubstr span dedup (operators/dedup.py remove_duplicate_spans —
    # Lee et al. ACL 2022) as a driver-checked section: a deterministic
    # planted corpus (every ≥60-token doc with doc_id%10==0, plus a twin
    # that embeds its first 60 tokens behind a unique prefix) runs the
    # REAL operator end-to-end (rolling-hash kernel → keeper aggregate →
    # join-back → excise), and the oracle recomputes the FULL keeper rule
    # in SQL (window strings, global min-(doc_id,pos) keeper, cut-range
    # union, token-level reconstruction) — it also catches accidental
    # duplicate spans between base docs, not just the planted twins.
    docs = _t(spark, sf_dir, "documents")
    es_toks = F.split(F.trim(F.col("text")), r"\s+")
    es_base = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text", es_toks.alias("__toks"))
        .where(F.size("__toks") >= 60)
    )
    es_twins = es_base.select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"),
        F.concat(
            F.lit("twin prefix for doc "),
            F.col("doc_id").cast("string"),
            F.lit(" "),
            F.array_join(F.slice("__toks", 1, 60), " "),
        ).alias("text"),
    )
    es_planted = es_base.select("doc_id", "text").unionByName(es_twins)
    es_deduped = dedup.remove_duplicate_spans(
        es_planted.withColumn("__old", F.col("text")), span_tokens=50
    )
    es_changed = F.col("text") != F.col("__old")
    exact_substr = (
        es_deduped.select(
            F.when(es_changed, F.lit("docs_changed"))
            .otherwise(F.lit("docs_unchanged"))
            .alias("key"),
            F.when(es_changed, F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
            .alias("sort_key"),
            (F.length("__old") - F.length("text")).cast("double").alias("__cr"),
        )
        .groupBy("key", "sort_key")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("__cr"), 2).alias("total"))
        .select(
            F.lit("exact_substr").alias("section"), "key", "sort_key", "n", "total"
        )
    )

    # UniMax mixing (operators/mixing.py unimax_budgets — Chung et al.
    # 2023) as a driver-checked section: budget = 0.97× total corpus
    # chars with max_epochs=1, so the fair share lands INSIDE the
    # per-source capacity range at every SF (small sources bind at cap,
    # large sources absorb the slack — the waterfill genuinely branches).
    # The oracle replays the exact fill sequence as a recursive CTE.
    from bigdataproject_formula1_telemetry_spark.operators import mixing

    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    budgets = mixing.unimax_budgets(
        docs,
        "source",
        token_budget=0.97 * float(total_chars),
        max_epochs=1.0,
        n_tokens_col="n_chars",
    )
    alloc_df = spark.createDataFrame(
        [(k, float(v)) for k, v in budgets.items()],
        "key string, __alloc double",
    )
    unimax = (
        docs.groupBy(F.col("source").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .join(alloc_df, "key")
        .select(
            F.lit("unimax").alias("section"),
            "key",
            F.row_number().over(Window.orderBy("key")).cast("long").alias("sort_key"),
            "n",
            _pround(F.col("__alloc"), 4).alias("total"),
        )
    )

    # Z-order layout (operators/layout.py zorder_key, minmax mode) as a
    # driver-checked section: the REAL bounds-aggregate + equi-width
    # bucket + codegen Morton interleave runs over orders, and the sum
    # of full 16-bit keys per curve cell pins every bit position (a
    # single misplaced interleave bit shifts a sum).
    from bigdataproject_formula1_telemetry_spark.operators import layout as LY

    zsrc = o.select("o_custkey", "o_orderkey")
    zkey = LY.zorder_key(
        zsrc, ["o_custkey", "o_orderkey"], bits=8, mode="minmax"
    )
    zorder = (
        zsrc.select(zkey.alias("__z"))
        .groupBy(F.shiftright(F.col("__z"), 12).alias("__cell"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__z").cast("double").alias("total"),
        )
        .select(
            F.lit("zorder").alias("section"),
            F.col("__cell").cast("string").alias("key"),
            (F.col("__cell") + 1).cast("long").alias("sort_key"),
            "n",
            "total",
        )
    )

    # temperature-mixture sizing (mixing.temperature_fractions) as a
    # driver-checked section: tau=0.7, target = one epoch (N rows) —
    # the tail languages cap at fraction 1.0, the head stays below, so
    # the published temperature-flattening rule genuinely branches.
    n_total = docs.count()
    tm_fracs = mixing.temperature_fractions(
        docs, "lang", temperature=0.7, target_rows=n_total
    )
    tm_df = spark.createDataFrame(
        [(k, float(v)) for k, v in tm_fracs.items()],
        "key string, __frac double",
    )
    temp_mix = (
        docs.groupBy(F.col("lang").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .join(tm_df, "key")
        .select(
            F.lit("temp_mix").alias("section"),
            "key",
            F.row_number().over(Window.orderBy("key")).cast("long").alias(
                "sort_key"
            ),
            "n",
            _pround(F.col("__frac"), 6).alias("total"),
        )
    )

    # BM25 retrieval (operators/retrieval.py bm25_topk) as a
    # driver-checked section: five queries are token-4..9 slices of the
    # planted docs (1, 101, ...), so top-1 is usually the source doc and
    # the tail exercises real cross-doc term statistics; the oracle
    # recomputes corpus stats, tf/df, idf, length norm, and the ranked
    # cut from scratch.
    from bigdataproject_formula1_telemetry_spark.operators import retrieval as RT

    bm_norm = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    bm_queries = (
        docs.where(F.col("doc_id").isin(1, 101, 201, 301, 401))
        .select("doc_id", bm_norm.alias("__t"))
        .where(F.size("__t") >= 9)
        .select(
            F.concat(F.lit("q"), F.col("doc_id").cast("string")).alias(
                "query_id"
            ),
            F.col("doc_id").alias("__qnum"),
            F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
        )
    )
    # score_round=6: rank on the PORTABLY ROUNDED score so exact-duplicate
    # docs (identical term multisets — this corpus plants them for the
    # dedup queries) tie exactly and split by doc_id in BOTH engines,
    # instead of by the sign of ~1e-16 float-sum order drift (ADVICE r10).
    bm25 = (
        RT.bm25_topk(
            docs.select("doc_id", "text"), bm_queries, k=3, score_round=6
        )
        .join(
            F.broadcast(bm_queries.select("query_id", "__qnum")), "query_id"
        )
        .select(
            F.lit("bm25").alias("section"),
            F.concat(
                F.col("query_id"), F.lit("#"), F.col("rank").cast("string")
            ).alias("key"),
            (F.col("__qnum") * 10 + F.col("rank")).cast("long").alias(
                "sort_key"
            ),
            F.col("doc_id").cast("long").alias("n"),
            F.col("score").alias("total"),
        )
    )

    # RRF hybrid fusion (retrieval.rrf_fuse, Cormack et al. 2009) as a
    # driver-checked section: the bm25 top-3 above fused with a
    # term-overlap-count ranking (distinct matched query terms per doc,
    # integer — engine-exact).  Every 1/(60+rank) contribution divides
    # identical integers and the two-term fused sum is ONE commutative
    # IEEE addition, so the rrf_score is bit-exact across engines — no
    # float margin exists for this section by construction.
    lex3 = RT.bm25_topk(
        docs.select("doc_id", "text"), bm_queries, k=3, score_round=6
    ).select("query_id", "doc_id", "rank")
    _doc_terms = docs.select(
        "doc_id", F.explode(bm_norm).alias("__t")
    ).distinct()
    _q_terms = bm_queries.select(
        "query_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("__t"),
    ).distinct()
    ov3 = (
        _doc_terms.join(F.broadcast(_q_terms), "__t")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("__ov"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("__ov").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .where(F.col("rank") <= 3)
        .select("query_id", "doc_id", "rank")
    )
    rrf = (
        RT.rrf_fuse([lex3, ov3], k=60)
        .where(F.col("rank") <= 3)
        .join(
            F.broadcast(bm_queries.select("query_id", "__qnum")), "query_id"
        )
        .select(
            F.lit("rrf").alias("section"),
            F.concat(
                F.col("query_id"), F.lit("#"), F.col("rank").cast("string")
            ).alias("key"),
            (F.col("__qnum") * 10 + F.col("rank")).cast("long").alias(
                "sort_key"
            ),
            F.col("doc_id").cast("long").alias("n"),
            _pround(F.col("rrf_score"), 6).alias("total"),
        )
    )

    # RM3 pseudo-relevance-feedback expansion + weighted BM25 re-query
    # (retrieval.rm3_expand / bm25_scores_weighted / bm25_topk_rm3,
    # Lavrenko & Croft SIGIR 2001; Anserini-standard RM3 interpolation)
    # as a driver-checked section — VERDICT r11 item 3: the FULL
    # two-pass ranking is recomputed in DuckDB (feedback retrieval on
    # rounded scores → relevance model P(t|R)=Σ P(t|d)·P(d|q) → top
    # fb_terms by (weight DESC, term ASC), renormalized → 0.5/0.5
    # interpolation with the uniform original model → weighted BM25 over
    # the EXPANSION vocabulary → rounded-score final cut).  Both ranked
    # cuts use score_round=6 (the bm25 section's portable-rounding
    # rule); the fb_terms cut ranks raw relevance-model weights — its
    # adjacent-gap margin is probed at all SFs
    # (tools/probe_rm3_margins.py; figures in SCALING r12).
    rm3 = (
        RT.bm25_topk_rm3(
            docs.select("doc_id", "text"), bm_queries, k=3, fb_docs=3,
            fb_terms=5, orig_weight=0.5, score_round=6,
        )
        .join(
            F.broadcast(bm_queries.select("query_id", "__qnum")), "query_id"
        )
        .select(
            F.lit("rm3").alias("section"),
            F.concat(
                F.col("query_id"), F.lit("#"), F.col("rank").cast("string")
            ).alias("key"),
            (F.col("__qnum") * 10 + F.col("rank")).cast("long").alias(
                "sort_key"
            ),
            F.col("doc_id").cast("long").alias("n"),
            F.col("score").alias("total"),
        )
    )

    # contamination_report (plans/pipelines.py:835) as TWO driver-checked
    # sections — VERDICT r11 item 5: the COMPOSED report (BM25 top-3
    # evidence per benchmark item, left-joined with the bigram overlap
    # count and the ≥0.3 hashed-BoW cosine) runs the REAL operator
    # end-to-end; the oracle recomputes retrieval, distinct-gram
    # overlap, md5 bucket+sign cosines, and the join/coalesce semantics
    # from scratch.  `contam_report` pins (bench_id, rank) -> (doc_id,
    # rounded score); `contam_flags` pins the same keys ->
    # (contam_ngrams, cos_sim | -2 sentinel for semantically-clean).
    # Benchmark = the five bm25 token-slice queries as (doc_id, text)
    # items; shingle_n=2 because the ~50-word synthetic vocabulary lets
    # high-tf docs outrank a slice's SOURCE doc, so 4-grams never
    # overlap the top-3 at sf>=0.01 — bigrams hit 13-15 of 15 report
    # rows at every SF with counts 1..9 (genuinely discriminating);
    # threshold 0.3 fires the semantic leg on all 15 pairs (both
    # margins probed at all SFs — tools/probe_contam_report_margins.py,
    # SCALING r12).
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as PL

    cr_bench = bm_queries.select(F.col("__qnum").alias("doc_id"), "text")
    cr_rep = PL.contamination_report(
        docs.select("doc_id", "text"), cr_bench, k=3,
        shingle_n=2, semantic_threshold=0.3, score_round=6,
    )
    cr_key = F.concat(
        F.lit("q"), F.col("bench_id").cast("string"),
        F.lit("#"), F.col("rank").cast("string"),
    )
    cr_sort = (F.col("bench_id") * 10 + F.col("rank")).cast("long")
    contam_report = cr_rep.select(
        F.lit("contam_report").alias("section"),
        cr_key.alias("key"),
        cr_sort.alias("sort_key"),
        F.col("doc_id").cast("long").alias("n"),
        F.col("score").alias("total"),
    ).unionByName(
        cr_rep.select(
            F.lit("contam_flags").alias("section"),
            cr_key.alias("key"),
            cr_sort.alias("sort_key"),
            F.col("contam_ngrams").cast("long").alias("n"),
            F.coalesce(_pround(F.col("cos_sim"), 6), F.lit(-2.0)).alias(
                "total"
            ),
        )
    )

    # MMR diversity re-rank (retrieval.mmr_rerank, Carbonell & Goldstein
    # SIGIR 1998) as a driver-checked section: five queries, each with a
    # 12-candidate pool (vec_ids qnum..qnum+11 from the embeddings
    # table), analytic relevance rel = ((id*7) % 13)/13 — identical
    # integer arithmetic + ONE IEEE division in both engines — lam=0.7,
    # k=3, score_round=6.  The REAL greedy applyInPandas kernel runs
    # end-to-end (broadcast-semi vector narrowing included); the oracle
    # unrolls the 3-step greedy as three SQL stages over the same
    # normalized vectors.  Margins probed at all SFs (tools note in
    # SCALING): min rounding-edge distance of any step value ≥ 7.7e-9
    # absolute (vs ~1e-16 cross-engine float-sum spread), min
    # pick/runner-up ROUNDED gap ≥ 0.0118, zero rounded ties.
    emb = _t(spark, sf_dir, "embeddings")
    mm_q = spark.createDataFrame(
        [(q,) for q in (1, 101, 201, 301, 401)], "qnum long"
    )
    mm_cands = mm_q.select(
        "qnum",
        F.explode(F.sequence(F.col("qnum"), F.col("qnum") + 11)).alias(
            "doc_id"
        ),
    ).withColumn(
        "score", ((F.col("doc_id") * 7) % 13).cast("double") / F.lit(13.0)
    )
    mmr = RT.mmr_rerank(
        mm_cands,
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        k=3,
        lam=0.7,
        query_id_col="qnum",
        score_round=6,
    ).select(
        F.lit("mmr").alias("section"),
        F.concat(
            F.lit("q"), F.col("qnum").cast("string"),
            F.lit("#"), F.col("rank").cast("string"),
        ).alias("key"),
        (F.col("qnum") * 10 + F.col("rank")).cast("long").alias("sort_key"),
        F.col("doc_id").cast("long").alias("n"),
        F.col("mmr_score").alias("total"),
    )

    # IR evaluation metrics (retrieval.retrieval_metrics, the trec_eval
    # core) as a driver-checked section: FULLY ANALYTIC inputs — 5
    # queries, results rank r=1..8 → doc qnum*1000+r, qrels j=1..12
    # minus j%5==4 (so rank 4 is retrieved-but-unjudged) with graded
    # rel=(3j+qnum)%4 (judged-non-relevant rows included) — so every
    # trec_eval convention branches; the oracle recomputes all four
    # metrics (precision/recall@5, MRR, burges-gain nDCG@5 with the
    # id-tiebroken ideal ordering) from the same arithmetic.  Rounded
    # at 1e-6; probed rounding-edge distance 5.1e-8 absolute
    # (tools/probe_ir_metrics_margins.py; data is SF-independent).
    im_q = spark.createDataFrame([(q,) for q in (1, 2, 3, 4, 5)], "qnum long")
    im_results = im_q.select(
        "qnum", F.explode(F.sequence(F.lit(1), F.lit(8))).alias("rank")
    ).select(
        "qnum", (F.col("qnum") * 1000 + F.col("rank")).alias("doc_id"), "rank"
    )
    im_qrels = (
        im_q.select(
            "qnum", F.explode(F.sequence(F.lit(1), F.lit(12))).alias("__j")
        )
        .where(F.col("__j") % 5 != 4)
        .select(
            "qnum",
            (F.col("qnum") * 1000 + F.col("__j")).alias("doc_id"),
            ((F.col("__j") * 3 + F.col("qnum")) % 4).alias("rel"),
        )
    )
    im = RT.retrieval_metrics(im_results, im_qrels, k=5, query_id_col="qnum")
    ir_metrics = im.select(
        "qnum",
        "n_rel",
        F.expr(
            "stack(4, 'p', precision_at_k, 'r', recall_at_k, "
            "'mrr', mrr, 'ndcg', ndcg_at_k) as (__m, __v)"
        ),
    ).select(
        F.lit("ir_metrics").alias("section"),
        F.concat(
            F.lit("q"), F.col("qnum").cast("string"), F.lit("#"), F.col("__m")
        ).alias("key"),
        (
            F.col("qnum") * 10
            + F.when(F.col("__m") == "p", 1)
            .when(F.col("__m") == "r", 2)
            .when(F.col("__m") == "mrr", 3)
            .otherwise(4)
        ).cast("long").alias("sort_key"),
        F.col("n_rel").cast("long").alias("n"),
        _pround(F.col("__v"), 6).alias("total"),
    )

    # corpus_diff (plans/pipelines.py) as a driver-checked section: old =
    # even ids, new = ids not divisible by 3 with %5==0 texts modified —
    # all four change classes populated.  The operator classifies on md5
    # content hashes; the oracle reclassifies on raw text equality.
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    old_docs = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new_docs = docs.where(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    diff = (
        P.corpus_diff(old_docs, new_docs)
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").cast("double").alias("total"),
        )
        .select(
            F.lit("corpus_diff").alias("section"),
            F.col("change").alias("key"),
            R.custom_order(
                F.col("change"), ["added", "modified", "removed", "unchanged"]
            )
            .cast("long")
            .alias("sort_key"),
            "n",
            "total",
        )
    )

    # Incrementally-merged datasheet card (r14, VERDICT r13 item 3) as
    # a driver-checked section: the documents table split into THREE
    # "increments" (doc_id % 3) runs the REAL corpus_card_partial +
    # merge_card_partials machinery, and the oracle recomputes every
    # emitted mergeable sum from ONE pass over the union — the property
    # under test is exactly the merge's contract (partials over a
    # partition sum to the union's totals, order-independent).
    # pii_phones is not emitted (its lookbehind/lookahead regex is not
    # RE2-portable, so DuckDB cannot recompute it); the domains section
    # rides pytest-only (registered-domain suffix logic).  The two
    # HLL-backed rows are asserted as ±5% bands against true distinct
    # counts computed independently in both engines (the q50 pattern:
    # DataSketches HLL at the default lgK is ~1-2% RSE, so the band
    # fails only on real estimator/merge damage).
    parts3 = [
        P.corpus_card_partial(
            docs.where(F.col("doc_id") % 3 == k),
            text_col="text",
            lang_col="lang",
            id_col="doc_id",
        )
        for k in range(3)
    ]
    cm = {
        (r["section"], r["key"]): r["value"]
        for r in P.merge_card_partials(
            parts3[0].unionByName(parts3[1]).unionByName(parts3[2])
        ).collect()
    }
    true_dup = (
        docs.select(
            F.when(F.col("text").isNotNull(), F.md5("text"))
            .otherwise(F.lit("\x00null"))
            .alias("__k")
        )
        .distinct()
        .count()
    )
    true_grams = (
        docs.select(
            F.explode(T.shingles_ngrams(F.col("text"), 13)).alias("__g")
        )
        .distinct()
        .count()
    )
    est_dup = (1.0 - cm[("dup", "exact_dup_frac_approx")]) * cm[
        ("size", "docs")
    ]
    est_gram = cm[("diversity", "distinct_13gram_frac_approx")] * cm[
        ("diversity", "ngrams_13")
    ]
    dup_ok = true_dup > 0 and abs(est_dup / true_dup - 1.0) <= 0.05
    gram_ok = true_grams > 0 and abs(est_gram / true_grams - 1.0) <= 0.05
    cm_rows = [
        ("size/docs", 1, cm[("size", "docs")]),
        ("size/tokens", 2, cm[("size", "tokens")]),
        ("size/chars", 3, cm[("size", "chars")]),
        ("pii/emails", 4, cm[("pii", "pii_emails")]),
        ("pii/ipv4", 5, cm[("pii", "pii_ipv4")]),
        ("diversity/ngrams_13", 6, cm[("diversity", "ngrams_13")]),
        ("hll/dup_frac_ok", 7, 1.0 if dup_ok else 0.0),
        ("hll/gram_frac_ok", 8, 1.0 if gram_ok else 0.0),
        # merged fixed-bin quality percentiles (r14): the BIN INDEX is
        # the integer-exact essence (the reported value is just
        # (bin + 0.5) / 100), so the oracle recomputes the bins by its
        # own cumulative integer-rank walk over the union — a
        # histogram-merge or rank-math bug lands in a different bin
        ("quality/n_scored", 9, cm[("quality_hist", "n_scored")]),
        (
            "quality/p10_bin",
            10,
            float(int(cm[("quality_hist", "q_p10_approx")] * 100)),
        ),
        (
            "quality/p50_bin",
            11,
            float(int(cm[("quality_hist", "q_p50_approx")] * 100)),
        ),
        (
            "quality/p90_bin",
            12,
            float(int(cm[("quality_hist", "q_p90_approx")] * 100)),
        ),
    ] + [
        (f"lang/{k}", 13 + i, cm[("lang", k)])
        for i, k in enumerate(
            sorted(k for (s, k) in cm if s == "lang" and k is not None)
        )
    ]
    card_merge = spark.createDataFrame(
        [
            ("card_merge", key, sk, int(v), float(v))
            for key, sk, v in cm_rows
        ],
        "section string, key string, sort_key long, n long, total double",
    )

    # O3 head/tail caps + A8 union of the two sorted-limit frames
    head = (
        ev.orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(1000)
        .select(F.lit("head").alias("tag"), "value")
    )
    tail = (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1000)
        .select(F.lit("tail").alias("tag"), "value")
    )
    cap = (
        head.unionByName(tail)
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.lit("cap").alias("section"),
            F.col("tag").alias("key"),
            F.when(F.col("tag") == "head", F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
            .alias("sort_key"),
            "n",
            "total",
        )
    )

    return (
        priority.unionByName(ladder)
        .unionByName(segment)
        .unionByName(cap)
        .unionByName(exact_substr)
        .unionByName(unimax)
        .unionByName(temp_mix)
        .unionByName(zorder)
        .unionByName(bm25)
        .unionByName(rrf)
        .unionByName(rm3)
        .unionByName(contam_report)
        .unionByName(mmr)
        .unionByName(ir_metrics)
        .unionByName(diff)
        .unionByName(card_merge)
        .orderBy("section", "sort_key", "key")
    )


# ---------------------------------------------------------------------------
# Registry ordering (driver contract)
# ---------------------------------------------------------------------------

# The grading driver runs its rows+schema+hash correctness check over the
# FIRST 50 entries of queries() in registration order.  The registry holds
# EXACTLY 50 queries — every registered query is externally checked, none
# is deferred (redundant trivia shapes were consolidated into composites:
# q57_report_compose carries A8/O3/O4/O5/F12/P4, q44_semi_anti_join both
# semi and anti).  The only reordering is the benign north-star-first
# prioritization; _DRIVER_WINDOW guards that a 51st registration fails
# loudly here instead of silently dropping a query out of the window.

_DRIVER_WINDOW = 50

_CHECK_FIRST = (
    "q30_minhash_near_dedup",
    "q31_simhash",
    "q32_fingerprint_knn_lsh",
    "q41_decode_packets",
    "q54_embedding_near_dedup",
    "q55_ivf_ann_recall",
)


def _finalize_order() -> None:
    assert len(QUERIES) <= _DRIVER_WINDOW, (
        f"{len(QUERIES)} queries registered but the driver checks only the "
        f"first {_DRIVER_WINDOW}; consolidate before adding more so every "
        "registered query stays externally verified"
    )
    ordered = [*_CHECK_FIRST, *(n for n in QUERIES if n not in _CHECK_FIRST)]
    missing = set(ordered) ^ set(QUERIES)
    assert not missing, f"registry reorder out of sync: {missing}"
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update(
            (n, snapshot[n]) for n in ordered if n in snapshot
        )


_finalize_order()
