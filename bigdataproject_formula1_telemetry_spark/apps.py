"""M8 — application query layer: the reference's Streamlit dashboard and
post-session analyzer re-expressed as engine-client query functions.

Each function is a pure DataFrame computation a UI can call (the
reference's pages: F1_web_dashboard_app.py explorer :244-304, strategy
:310-389, ghost lab :396-591; analyzer F1-25_analyze_my_session.py).
Interactive latency comes from partition pruning + ``df.cache()`` on the
circuit slice, not from pre-materialized extracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io, ml
from bigdataproject_formula1_telemetry_spark.operators import windows as W


def load_circuit(spark: SparkSession, warehouse_root: str, year: int, rnd: int) -> DataFrame:
    """Partition-pruned circuit slice (replaces the dashboard's manual
    path construction + @st.cache_resource, F1_web_dashboard_app.py:103-179).
    Callers may ``.cache()`` the result for interactive reuse."""
    return io.normalize_telemetry_columns(
        io.read_partition(spark, warehouse_root, Year=year, Round=rnd)
    )


def explorer_drivers(circuit: DataFrame) -> DataFrame:
    """O5 — distinct driver picker (F1_web_dashboard_app.py:252)."""
    return circuit.select("Driver").distinct().orderBy("Driver")


def explorer_lap_trace(circuit: DataFrame, driver: int, lap: int) -> DataFrame:
    """P2/O1 — one lap's telemetry trace ordered by distance
    (F1_web_dashboard_app.py:273-304)."""
    return (
        circuit.where((F.col("Driver") == driver) & (F.col("LapNumber") == lap))
        .select("Distance", "Speed", "RPM", "Throttle", "Brake", "nGear")
        .orderBy("Distance")
    )


def strategy_base_time(circuit: DataFrame) -> DataFrame:
    """A7 — session base lap time (min lap time > 10 s guard,
    F1_web_dashboard_app.py:324-327)."""
    return (
        circuit.where(F.col("LapTime_Sec") > 10)
        .agg(F.min("LapTime_Sec").alias("base_time"))
    )


def strategy_what_if(
    spark: SparkSession,
    models: DataFrame,
    base_time: float,
    tyre_life: float,
    compound_code: int,
    prev_pace_ratio: float,
) -> DataFrame:
    """U3 — single-scenario what-if predict (the strategy page's one-row
    inference, F1_web_dashboard_app.py:342-369): predicted ratio × base
    time restores seconds."""
    row = spark.createDataFrame(
        [(float(tyre_life), int(compound_code), float(prev_pace_ratio))],
        "TyreLife_max double, Compound_Encoded int, Prev_Pace_Ratio double",
    )
    scored = ml.predict_global(
        row, models, ["TyreLife_max", "Compound_Encoded", "Prev_Pace_Ratio"],
        out_col="pred_ratio",
    )
    return scored.withColumn(
        "predicted_lap_time", F.col("pred_ratio") * F.lit(float(base_time))
    )


def fastest_lap_overlay(warehouse: DataFrame, years: list[int]) -> DataFrame:
    """J5/W4 — fastest lap per year with its full speed trace (the
    audit notebook's 2019-vs-2023 overlay, F1_Preprocessed_Data_test.ipynb:42-87):
    rank laps per year, keep rank 1, return the traces."""
    laps = (
        warehouse.where(F.col("Year").isin(years))
        .select("Year", "Round", "Driver", "LapNumber", "LapTime_Sec")
        .where(F.col("LapTime_Sec") > 10)
        .distinct()
    )
    best = W.top_n_per_group(
        laps,
        ["Year"],
        [
            F.col("LapTime_Sec").asc(),
            F.col("Round").asc(),
            F.col("Driver").asc(),
            F.col("LapNumber").asc(),
        ],
        n=1,
    )
    return warehouse.join(
        F.broadcast(best.select("Year", "Round", "Driver", "LapNumber")),
        ["Year", "Round", "Driver", "LapNumber"],
        "inner",
    ).select("Year", "Distance", "Speed").orderBy("Year", "Distance")


def ghost_vs_human(
    circuit: DataFrame,
    models: DataFrame,
    driver: int,
    length: int = 20,
    stride: int = 5,
) -> DataFrame:
    """Ghost lab (F1_web_dashboard_app.py:396-591): pick the driver's
    longest lap, run strided ghost inference, union with the human trace
    tagged per series for plotting."""
    lap_pick = (
        circuit.where(F.col("Driver") == driver)
        .groupBy("LapNumber")
        .count()
        .orderBy(F.col("count").desc(), F.col("LapNumber").desc())
        .limit(1)
    )
    lap_df = circuit.join(F.broadcast(lap_pick.select("LapNumber")), "LapNumber")
    human = lap_df.select(
        F.lit("human").alias("series"), "Distance", F.col("Speed").cast("double").alias("Speed")
    )
    ghost = ml.ghost_inference(
        lap_df.where(F.col("Driver") == driver),
        models,
        ["Driver"],
        ["Distance"],
        ["Speed"],
        length=length,
        stride=stride,
    ).select(
        F.lit("ghost").alias("series"),
        "Distance",
        F.col("ghost_pred").alias("Speed"),
    )
    return human.unionByName(ghost).orderBy("series", "Distance")


def ann_method_report(
    corpus: "DataFrame",
    queries: "DataFrame",
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 4,
    pq_m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Method-comparison report over one embedding corpus: run exact
    brute-force, IVF, int8 and PQ-ADC top-``k`` for the same query set
    and return tidy rows ``(method, recall_at_k, mean_top1_sim)`` with
    exact brute-force as the recall reference — the capacity-planning
    artifact an ANN deployment decision wants (feeds
    ``sinks.write_html_report`` directly).  Driver-side comparison is
    bounded by the kNN query-set contract (small by construction)."""
    from pyspark.sql import functions as F

    from bigdataproject_formula1_telemetry_spark.operators import (
        pq as PQ,
        sampling,
        similarity as sim,
    )

    def topk_sets(df, id_out="neighbor_id"):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r[id_out])
        return out

    exact_df = sim.knn_bruteforce_arrow(corpus, queries, k=k,
                                        id_col=id_col, vec_col=vec_col)
    exact = topk_sets(exact_df)
    top1 = {}
    for r in exact_df.collect():
        cur = top1.get(r["query_id"])
        if cur is None or (r["cos_sim"] or -2) > cur:
            top1[r["query_id"]] = r["cos_sim"] or -2

    train = sampling.deterministic_sample(corpus, [id_col], 0.4, salt="annrep")
    C = sim.ivf_centroids(train, n_clusters=n_clusters, max_iter=2,
                          id_col=id_col, vec_col=vec_col)
    ivf = topk_sets(
        sim.knn_ivf_arrow(corpus, queries, C, k=k, nprobe=nprobe,
                          id_col=id_col, vec_col=vec_col)
    )
    q8 = sim.quantize_embeddings(corpus, vec_col=vec_col)
    q8q = sim.quantize_embeddings(queries, vec_col=vec_col)
    int8 = topk_sets(
        sim.knn_bruteforce_arrow(
            q8, q8q, k=k, id_col=id_col, vec_col="embedding_q8", quantized=True
        )
    )
    books = PQ.pq_train(train, m=pq_m, n_codes=256, max_iter=2,
                        id_col=id_col, vec_col=vec_col)
    pq = topk_sets(
        PQ.knn_pq_adc(
            PQ.pq_encode(corpus, books, id_col=id_col, vec_col=vec_col),
            queries, books, k=k, id_col=id_col,
            query_id_col=id_col, query_vec_col=vec_col,
        )
    )

    # PCA tier: halve the dimension, brute-force on the projection —
    # the compression axis orthogonal to int8/PQ code budgets
    from bigdataproject_formula1_telemetry_spark.operators import pca as PCA

    probe = corpus.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    pca_rows = []
    if probe is not None and len(probe[0]) >= 4:
        pk = max(2, len(probe[0]) // 2)
        pm = PCA.pca_train(train, k=pk, vec_col=vec_col)
        red = PCA.pca_transform(corpus, pm, vec_col=vec_col).select(
            id_col, F.col("embedding_pca").alias(vec_col)
        )
        redq = PCA.pca_transform(queries, pm, vec_col=vec_col).select(
            id_col, F.col("embedding_pca").alias(vec_col)
        )
        pca_half = topk_sets(
            sim.knn_bruteforce_arrow(red, redq, k=k, id_col=id_col, vec_col=vec_col)
        )
        pca_rows = [(f"pca_k{pk}_bruteforce", pca_half)]

    def recall(cand: dict) -> float:
        if not exact:
            return 0.0
        return sum(
            len(cand.get(q, set()) & s) / max(len(s), 1) for q, s in exact.items()
        ) / len(exact)

    spark = corpus.sparkSession
    rows = [
        ("exact_bruteforce", 1.0, float(sum(top1.values()) / max(len(top1), 1))),
        ("ivf", recall(ivf), None),
        ("int8_bruteforce", recall(int8), None),
        ("pq_adc", recall(pq), None),
    ] + [(name, recall(cand), None) for name, cand in pca_rows]
    return spark.createDataFrame(
        rows, schema="method string, recall_at_k double, mean_top1_sim double"
    )
