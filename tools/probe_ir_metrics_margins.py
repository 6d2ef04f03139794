"""Margin probe for q57's `ir_metrics` driver section (r11).

Runs the REAL ``retrieval.retrieval_metrics`` over the section's fully
analytic results/qrels frames and the DuckDB SQL recomputation the q57
oracle embeds, asserts value agreement, and reports the min distance of
any metric value from a 1e-6 rounding boundary (the only cross-engine
failure mode: pow/log2 are libm-vs-JVM transcendentals that can differ
by ~1 ulp, so every rounded value must sit far from an edge).  The
inputs are SF-independent — one run covers every scale.

Run: python tools/probe_ir_metrics_margins.py
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np

from bigdataproject_formula1_telemetry_spark import get_spark
from bigdataproject_formula1_telemetry_spark.operators import retrieval as RT
from pyspark.sql import functions as F

K = 5

SQL = """
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
    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
    sum(CASE WHEN irank <= 5
        THEN (pow(2.0, rel) - 1.0) / log2(CAST(irank AS DOUBLE) + 1.0)
        ELSE 0.0 END) AS idcg
  FROM (
    SELECT qnum, rel,
      row_number() OVER (PARTITION BY qnum ORDER BY rel DESC, id) AS irank
    FROM im_qrel
  ) GROUP BY qnum
  HAVING sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) > 0
), im_hits AS (
  SELECT r.qnum, r.rank, coalesce(q.rel, 0.0) AS rel
  FROM im_res r LEFT JOIN im_qrel q ON q.qnum = r.qnum AND q.id = r.id
  WHERE r.rank <= 5
), im_per AS (
  SELECT qnum,
    sum(CASE WHEN rel > 0 THEN 1.0 ELSE 0.0 END) / 5.0 AS p_at_k,
    sum(CASE WHEN rel > 0 THEN 1.0 ELSE 0.0 END) AS n_hit,
    coalesce(max(CASE WHEN rel > 0
                 THEN 1.0 / CAST(rank AS DOUBLE) END), 0.0) AS mrr,
    sum((pow(2.0, rel) - 1.0) / log2(CAST(rank AS DOUBLE) + 1.0)) AS dcg
  FROM im_hits GROUP BY qnum
)
SELECT b.qnum, b.n_rel,
  coalesce(p.p_at_k, 0.0) AS p_at_k,
  coalesce(p.n_hit, 0.0) / CAST(b.n_rel AS DOUBLE) AS recall,
  coalesce(p.mrr, 0.0) AS mrr,
  coalesce(p.dcg, 0.0) / b.idcg AS ndcg
FROM im_base b LEFT JOIN im_per p USING (qnum)
ORDER BY qnum
"""

spark = get_spark(master="local[8]", shuffle_partitions=8)
qn = spark.createDataFrame([(q,) for q in (1, 2, 3, 4, 5)], "qnum long")
results = qn.select(
    "qnum", F.explode(F.sequence(F.lit(1), F.lit(8))).alias("rank")
).select(
    "qnum", (F.col("qnum") * 1000 + F.col("rank")).alias("doc_id"), "rank"
)
qrels = (
    qn.select("qnum", F.explode(F.sequence(F.lit(1), F.lit(12))).alias("j"))
    .where(F.col("j") % 5 != 4)
    .select(
        "qnum",
        (F.col("qnum") * 1000 + F.col("j")).alias("doc_id"),
        ((F.col("j") * 3 + F.col("qnum")) % 4).alias("rel"),
    )
)
m = RT.retrieval_metrics(
    results, qrels, k=K, query_id_col="qnum"
).collect()
mine = sorted(
    (r["qnum"], r["n_rel"], r["precision_at_k"], r["recall_at_k"],
     r["mrr"], r["ndcg_at_k"])
    for r in m
)
con = duckdb.connect()
theirs = sorted(tuple(r) for r in con.execute(SQL).fetchall())

edge = 1.0
ok = len(mine) == len(theirs)
for a, b in zip(mine, theirs):
    assert a[0] == b[0] and a[1] == b[1], (a, b)
    for x, y in zip(a[2:], b[2:]):
        if abs(x - y) > 1e-12:
            print("DRIFT", a[0], x, y, abs(x - y))
            ok = False
        f = abs(((x * 1e6 + 0.5) % 1.0) - 0.5)
        edge = min(edge, 0.5 - f)
print("rows:", len(mine), "match:", ok, "edge:", f"{edge:.3e}")
print("values:")
for a in mine:
    print(" ", a)
spark.stop()
