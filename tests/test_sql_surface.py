"""The engine's SQL surface: registered views + raw spark.sql parity with
the DataFrame API."""

from __future__ import annotations

import pytest

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.plans import queries as Q
from tests.conftest import SF_SMOKE


def test_spark_sql_over_views_matches_dataframe_api(spark):
    io.register_views(spark, SF_SMOKE)
    sql_df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
          round(sum(l_quantity), 2) AS sum_qty,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).toPandas()
    api_df = (
        Q.QUERIES["q01_pricing_summary"](spark, SF_SMOKE)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .toPandas()
    )
    assert sql_df.equals(api_df)


def test_sql_events_view_aggregate(spark):
    io.register_views(spark, SF_SMOKE, ("events",))
    out = spark.sql(
        """
        SELECT user_id, round(sum(value), 4) AS total
        FROM events GROUP BY user_id ORDER BY user_id LIMIT 5
        """
    ).collect()
    assert len(out) == 5 and out[0]["total"] is not None
