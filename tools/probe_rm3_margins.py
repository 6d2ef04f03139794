"""Margin probe for q57's `rm3` driver section (r12).

The RM3 fold has THREE ranking decisions whose cross-engine stability
the oracle row relies on; this probe measures each one's distance from
a flip at every SF (all quantities computed in DuckDB over the exact
oracle CTE arithmetic — the margins are data properties; cross-engine
float-sum drift on these sums is ~1e-16):

1. ``fb``: the feedback cut (bm25_topk with score_round=6, fb_docs=3) —
   min raw-score distance from a rounding boundary over the top-4
   candidates per query (units 1e-6 of score: edge=5e-3 means 5e-9
   absolute) and the min ROUNDED adjacent-rank gap at the 3/4 boundary.
2. ``rm``: the fb_terms=5 relevance-model term cut, which ranks P(t|R)
   weights portably ROUNDED at 1e-9 (rm3_expand's fb_score_round+3
   quantum — an sf0.01 rank-5/6 structural tie motivated the rounding:
   exact rounded ties split on the term tiebreak in both engines) —
   the hazard is the RAW sum's distance from a 1e-9 rounding boundary.
3. ``final``: the weighted re-query's k=3 cut (score_round=6) — same
   two quantities as (1).

Run: python tools/probe_rm3_margins.py   (exits non-zero if any margin
is within 1000x of 1e-15 engine drift, or a rounded tie straddles a cut)
"""
import sys

import duckdb

CTES = """
WITH r3_tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
                x -> x <> '') AS t
  FROM documents
), r3_qt AS (
  SELECT DISTINCT 'q' || CAST(doc_id AS VARCHAR) AS qid, doc_id AS qnum, u.tok
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
), r3_raw AS (
  SELECT q.qid, q.qnum, f.doc_id AS id,
    sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
        * ((f.tf * 2.2)
           / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl))))) AS score
  FROM r3_tf f JOIN r3_df d USING (tok) JOIN r3_qt q USING (tok), r3_stats s
  GROUP BY q.qid, q.qnum, f.doc_id
), r3_fb AS (
  SELECT qid, qnum, id, score,
    floor(score * 1000000 + 0.5) / 1000000.0 AS rscore,
    row_number() OVER (PARTITION BY qid ORDER BY
      floor(score * 1000000 + 0.5) / 1000000.0 DESC, id) AS rk
  FROM r3_raw
), r3_pd AS (
  SELECT qid, qnum, id, rscore / sum(rscore) OVER (PARTITION BY qid) AS pd
  FROM r3_fb WHERE rk <= 3
), r3_ptd AS (
  SELECT t.doc_id AS id, u.tok,
    CAST(count(*) AS DOUBLE) / CAST(any_value(len(t.t)) AS DOUBLE) AS ptd
  FROM r3_tok t, unnest(t.t) AS u(tok)
  WHERE t.doc_id IN (SELECT DISTINCT id FROM r3_pd) AND len(t.t) > 0
  GROUP BY t.doc_id, u.tok
), r3_rmraw AS (
  SELECT p.qid, p.qnum, d.tok, sum(d.ptd * p.pd) AS rmraw
  FROM r3_ptd d JOIN r3_pd p USING (id)
  GROUP BY p.qid, p.qnum, d.tok
), r3_rm AS (
  SELECT qid, qnum, tok, rmraw,
    floor(rmraw * 1000000000 + 0.5) / 1000000000.0 AS rm,
    row_number() OVER (PARTITION BY qid
                       ORDER BY floor(rmraw * 1000000000 + 0.5)
                                / 1000000000.0 DESC, tok) AS rn
  FROM r3_rmraw
), r3_rmtop AS (
  SELECT qid, qnum, tok, rm / sum(rm) OVER (PARTITION BY qid) AS prm
  FROM r3_rm WHERE rn <= 5
), r3_pq AS (
  SELECT qid, qnum, tok,
    1.0 / CAST(count(*) OVER (PARTITION BY qid) AS DOUBLE) AS pq
  FROM r3_qt
), r3_w AS (
  SELECT coalesce(p.qid, r.qid) AS qid, coalesce(p.qnum, r.qnum) AS qnum,
    coalesce(p.tok, r.tok) AS tok,
    0.5 * coalesce(p.pq, 0.0) + 0.5 * coalesce(r.prm, 0.0) AS w
  FROM r3_pq p FULL OUTER JOIN r3_rmtop r ON p.qid = r.qid AND p.tok = r.tok
  WHERE 0.5 * coalesce(p.pq, 0.0) + 0.5 * coalesce(r.prm, 0.0) > 0
), r3_tf2 AS (
  SELECT d.doc_id, u.tok, CAST(count(*) AS DOUBLE) AS tf,
    CAST(any_value(len(d.t)) AS DOUBLE) AS dl
  FROM r3_tok d, unnest(d.t) AS u(tok)
  WHERE u.tok IN (SELECT DISTINCT tok FROM r3_w)
  GROUP BY d.doc_id, u.tok
), r3_df2 AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
  FROM r3_tf2 GROUP BY tok
), r3_raw2 AS (
  SELECT w.qid, w.qnum, f.doc_id AS id,
    sum(w.w * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
        * ((f.tf * 2.2)
           / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl))))) AS score
  FROM r3_tf2 f JOIN r3_df2 d USING (tok) JOIN r3_w w USING (tok), r3_stats s
  GROUP BY w.qid, w.qnum, f.doc_id
), r3_fin AS (
  SELECT qid, qnum, id, score,
    floor(score * 1000000 + 0.5) / 1000000.0 AS rscore,
    row_number() OVER (PARTITION BY qid ORDER BY
      floor(score * 1000000 + 0.5) / 1000000.0 DESC, id) AS rk
  FROM r3_raw2
)
"""

EDGE = (
    "min(abs(((score * 1000000 + 0.5) % 1.0) - 0.5))"
)

QUERIES = {
    # rounding-edge distance over the candidates the cut actually ranks
    "fb_edge": CTES + f"SELECT 0.5 - {EDGE} FROM r3_fb WHERE rk <= 4",
    "final_edge": CTES + f"SELECT 0.5 - {EDGE} FROM r3_fin WHERE rk <= 4",
    # min ROUNDED adjacent gap at the cut boundary (ties counted apart)
    "fb_cut": CTES + """
      SELECT min(a.rscore - b.rscore),
             sum(CASE WHEN a.rscore = b.rscore THEN 1 ELSE 0 END)
      FROM r3_fb a JOIN r3_fb b ON a.qid = b.qid AND a.rk = 3 AND b.rk = 4
    """,
    "final_cut": CTES + """
      SELECT min(a.rscore - b.rscore),
             sum(CASE WHEN a.rscore = b.rscore THEN 1 ELSE 0 END)
      FROM r3_fin a JOIN r3_fin b ON a.qid = b.qid AND a.rk = 3 AND b.rk = 4
    """,
    # the fb_terms cut ranks 1e-9-ROUNDED weights: exact (rounded) ties
    # split on the term tiebreak in both engines, so the hazard is the
    # RAW sum's distance from a 1e-9 rounding boundary (x1e-9 units)
    "rm_gap": CTES + """
      SELECT min(a.rm - b.rm),
             sum(CASE WHEN a.rm = b.rm THEN 1 ELSE 0 END)
      FROM r3_rm a JOIN r3_rm b ON a.qid = b.qid AND a.rn = 5 AND b.rn = 6
    """,
    "rm_edge": CTES + """
      SELECT 0.5 - min(abs(((rmraw * 1000000000 + 0.5) % 1.0) - 0.5))
      FROM r3_rm WHERE rn <= 6
    """,
}


def main():
    ok = True
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '/root/testdata/{sf}/documents.parquet'"
        )
        fb_edge = con.execute(QUERIES["fb_edge"]).fetchone()[0]
        fin_edge = con.execute(QUERIES["final_edge"]).fetchone()[0]
        fb_gap, fb_ties = con.execute(QUERIES["fb_cut"]).fetchone()
        fin_gap, fin_ties = con.execute(QUERIES["final_cut"]).fetchone()
        rm_gap, rm_ties = con.execute(QUERIES["rm_gap"]).fetchone()
        rm_edge = con.execute(QUERIES["rm_edge"]).fetchone()[0]
        # edges are in 1e-6-score units; 1e-3 here = 1e-9 absolute score,
        # ~1e6x the 1e-15 drift; rm gap is an absolute weight
        bad = (
            (fb_edge is not None and fb_edge < 1e-6)
            or (fin_edge is not None and fin_edge < 1e-6)
            or (rm_edge is not None and rm_edge < 1e-6)
        )
        ok = ok and not bad
        print(
            f"{sf}: fb_edge={fb_edge:.3e} final_edge={fin_edge:.3e} "
            f"(x1e-6 score) fb_cut_gap={fb_gap} (ties={fb_ties}) "
            f"final_cut_gap={fin_gap} (ties={fin_ties}) "
            f"rm_cut_gap={rm_gap:.3e} (exact_rounded_ties={rm_ties}) "
            f"rm_edge={rm_edge:.3e} (x1e-9 weight)"
            + ("  << MARGIN TOO THIN" if bad else "")
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
