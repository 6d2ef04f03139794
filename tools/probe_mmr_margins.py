"""Margin probe for q57's `mmr` driver section (r11).

Replays the exact numpy greedy that `retrieval.mmr_rerank`'s kernel runs
(same pool construction as q57: queries {1,101,201,301,401}, candidates
qnum..qnum+11 from the embeddings table, rel = ((id*7)%13)/13, lam=0.7,
k=3, score_round=6) and the DuckDB 3-stage unrolled oracle, then reports
the two failure-mode margins the fold relies on:

- ``edge``: min distance of any step's raw MMR·1e6+0.5 from an integer —
  how far every value sits from a rounding boundary where a ~1e-16
  cross-engine float-sum difference could flip floor().  Units: 1e-6 of
  score, i.e. edge=7.7e-3 means 7.7e-9 absolute score distance.
- ``min_gap``: min (rounded) gap between each step's pick and its best
  runner-up — how far the ARGMAX is from being a tie.  Rounded ties are
  fine (both engines agree bit-exactly on the rounded value and split by
  id); the probe counts them separately.

Run: python tools/probe_mmr_margins.py   (exits non-zero on mismatch)
"""
import sys

import duckdb
import numpy as np

QN = [1, 101, 201, 301, 401]
NC = 12
K = 3
LAM = 0.7
P = 1e6

ORACLE = """
WITH mm_q AS (
  SELECT unnest([1, 101, 201, 301, 401]) AS qnum
), mm_cand AS (
  -- analytic pool + LEFT JOIN with zero-fallback, mirroring the r12
  -- oracle (ADVICE r11: an inner join would silently shrink the pool)
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
      floor(CAST(0.7 AS DOUBLE) * rel * 1000000 + 0.5) / 1000000.0 AS mmr,
      row_number() OVER (PARTITION BY qnum ORDER BY
        floor(CAST(0.7 AS DOUBLE) * rel * 1000000 + 0.5) / 1000000.0 DESC,
        id) AS rn
    FROM mm_cand)
  WHERE rn = 1
), mm_p2 AS (
  SELECT qnum, id, nv, mmr FROM (
    SELECT c.qnum, c.id, c.nv,
      floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
             coalesce(list_sum(list_transform(range(1, 65), i -> c.nv[i] * p.nv[i])), 0.0))
            * 1000000 + 0.5) / 1000000.0 AS mmr,
      row_number() OVER (PARTITION BY c.qnum ORDER BY
        floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
               coalesce(list_sum(list_transform(range(1, 65), i -> c.nv[i] * p.nv[i])), 0.0))
              * 1000000 + 0.5) / 1000000.0 DESC, c.id) AS rn
    FROM mm_cand c JOIN mm_p1 p USING (qnum)
    WHERE c.id <> p.id)
  WHERE rn = 1
), mm_p3 AS (
  SELECT qnum, id, mmr FROM (
    SELECT c.qnum, c.id,
      floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
             greatest(
               coalesce(list_sum(list_transform(range(1, 65), i -> c.nv[i] * p1.nv[i])), 0.0),
               coalesce(list_sum(list_transform(range(1, 65), i -> c.nv[i] * p2.nv[i])), 0.0)))
            * 1000000 + 0.5) / 1000000.0 AS mmr,
      row_number() OVER (PARTITION BY c.qnum ORDER BY
        floor((CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
               greatest(
                 coalesce(list_sum(list_transform(range(1, 65), i -> c.nv[i] * p1.nv[i])), 0.0),
                 coalesce(list_sum(list_transform(range(1, 65), i -> c.nv[i] * p2.nv[i])), 0.0)))
              * 1000000 + 0.5) / 1000000.0 DESC, c.id) AS rn
    FROM mm_cand c
    JOIN mm_p1 p1 USING (qnum) JOIN mm_p2 p2 ON p2.qnum = c.qnum
    WHERE c.id <> p1.id AND c.id <> p2.id)
  WHERE rn = 1
)
SELECT qnum, id, mmr, 1 AS rk FROM mm_p1
UNION ALL SELECT qnum, id, mmr, 2 FROM mm_p2
UNION ALL SELECT qnum, id, mmr, 3 FROM mm_p3
"""


def kernel_mirror(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id <= {max(QN) + NC - 1}"
    ).fetchall()
    vec = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    out, edge, gap, ties = [], 1.0, 1.0, 0
    for q in QN:
        ids = np.array([q + j for j in range(NC)])
        rel = ((ids * 7) % 13) / 13.0
        V = np.stack([vec[i] for i in ids])
        Vn = V / np.linalg.norm(V, axis=1)[:, None]
        max_sim, alive = None, np.ones(NC, bool)
        for r in range(1, K + 1):
            red = np.zeros(NC) if max_sim is None else max_sim
            raw = LAM * rel - (1 - LAM) * red
            f = np.abs(((raw[alive] * P + 0.5) % 1.0) - 0.5)
            edge = min(edge, float(np.min(0.5 - f)))
            m = np.floor(raw * P + 0.5) / P
            masked = np.where(alive, m, -np.inf)
            pick = int(np.argmax(masked))
            others = masked[np.arange(NC) != pick]
            ru = np.max(others[np.isfinite(others)])
            if ru == masked[pick]:
                ties += 1
            else:
                gap = min(gap, float(masked[pick] - ru))
            out.append((q, int(ids[pick]), float(masked[pick]), r))
            alive[pick] = False
            sims = Vn @ Vn[pick]
            max_sim = sims if max_sim is None else np.maximum(max_sim, sims)
    return out, edge, gap, ties


def main():
    ok = True
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        mine, edge, gap, ties = kernel_mirror(d)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{d}/embeddings.parquet'"
        )
        theirs = [
            (r[0], r[1], float(r[2]), r[3])
            for r in con.execute(ORACLE).fetchall()
        ]
        match = sorted(mine) == sorted(theirs)
        ok = ok and match
        print(
            f"{sf}: match={match} edge={edge:.3e} (x1e-6 score) "
            f"min_gap={gap:.6f} rounded_ties={ties}"
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
