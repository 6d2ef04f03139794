"""Margin probe for q57's `contam_report`/`contam_flags` sections (r12).

The composed contamination_report fold has two float hazards beyond the
bm25 ranking (whose cut margins tools/probe_rm3_margins.py's `fb_*`
figures already measure on the identical query set / k):

- ``thr``: the semantic leg emits a pair only when cos >= 0.3 — a
  report pair whose TRUE cosine sits within cross-engine drift (~1e-15)
  of the threshold would flip between a value and the -2 sentinel.
  Reported: min |cos - 0.3| over the report's (doc, bench) pairs.
- ``edge``: reported cosines are rounded at 1e-6 — min distance of
  cos*1e6+0.5 from an integer over the >= threshold pairs.

Also prints how often the flags BITE (nonzero gram hits / above-
threshold cosines) so the fold is demonstrably not vacuous.

Run: python tools/probe_contam_report_margins.py  (non-zero exit if any
margin is within 1000x of 1e-12)
"""
import sys

import duckdb

SQL = """
WITH cr_tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
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
    row_number() OVER (PARTITION BY qnum ORDER BY rscore DESC, id) AS rk
  FROM (
    SELECT q.qnum, f.doc_id AS id,
      floor(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
          * ((f.tf * 2.2)
             / (f.tf + 1.2 * (0.25 + 0.75 * (f.dl / s.avgdl)))))
        * 1000000 + 0.5) / 1000000.0 AS rscore
    FROM cr_tf f JOIN cr_df d USING (tok) JOIN cr_qt q USING (tok),
         cr_stats s
    GROUP BY q.qnum, f.doc_id
  )
  QUALIFY rk <= 3
), cr_ids AS (SELECT DISTINCT id FROM cr_top),
cr_bt AS (
  SELECT doc_id AS qnum, t[4:9] AS bt
  FROM cr_tok WHERE doc_id IN (1, 101, 201, 301, 401) AND len(t) >= 9
), cr_bg AS (
  SELECT DISTINCT array_to_string(bt[p + 1 : p + 2], ' ') AS gram
  FROM (SELECT bt, unnest(range(0, greatest(len(bt) - 1, 0))) AS p
        FROM cr_bt)
), cr_dg AS (
  SELECT g.doc_id, count(*) AS hits
  FROM (
    SELECT DISTINCT doc_id, array_to_string(t[p + 1 : p + 2], ' ') AS gram
    FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - 1, 0))) AS p
          FROM cr_tok WHERE doc_id IN (SELECT id FROM cr_ids))
  ) g JOIN cr_bg USING (gram)
  GROUP BY g.doc_id
), cr_dtb AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5('hashemb|' || tok), 1, 8)) AS UBIGINT)
      % 256 AS b,
    CASE WHEN (strpos('0123456789abcdef',
                      substr(md5('hashemb|' || tok), 9, 1)) - 1) % 2 = 0
         THEN 1.0 ELSE -1.0 END AS s
  FROM (
    SELECT doc_id,
      unnest(list_filter(regexp_split_to_array(
               trim(lower(coalesce(text, ''))), '\\s+'),
             x -> x <> '')) AS tok
    FROM documents WHERE doc_id IN (SELECT id FROM cr_ids)
  )
), cr_dv AS (SELECT doc_id, b, sum(s) AS v FROM cr_dtb GROUP BY doc_id, b),
cr_dn AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM cr_dv GROUP BY doc_id),
cr_dx AS (
  SELECT v.doc_id, v.b, v.v / n.nrm AS x
  FROM cr_dv v JOIN cr_dn n USING (doc_id) WHERE n.nrm > 0
), cr_btb AS (
  SELECT qnum,
    CAST(('0x' || substr(md5('hashemb|' || tok), 1, 8)) AS UBIGINT)
      % 256 AS b,
    CASE WHEN (strpos('0123456789abcdef',
                      substr(md5('hashemb|' || tok), 9, 1)) - 1) % 2 = 0
         THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT qnum, unnest(bt) AS tok FROM cr_bt)
), cr_bv AS (SELECT qnum, b, sum(s) AS v FROM cr_btb GROUP BY qnum, b),
cr_bn AS (SELECT qnum, sqrt(sum(v * v)) AS nrm FROM cr_bv GROUP BY qnum),
cr_bx AS (
  SELECT v.qnum, v.b, v.v / n.nrm AS x
  FROM cr_bv v JOIN cr_bn n USING (qnum) WHERE n.nrm > 0
), cr_cos AS (
  SELECT t.qnum, t.id, sum(d.x * b.x) AS cs
  FROM cr_top t
  JOIN cr_dx d ON d.doc_id = t.id
  JOIN cr_bx b ON b.qnum = t.qnum AND b.b = d.b
  GROUP BY t.qnum, t.id
)
SELECT
  min(abs(c.cs - 0.3)) AS thr_margin,
  min(CASE WHEN c.cs >= 0.3
      THEN 0.5 - abs(((c.cs * 1000000 + 0.5) % 1.0) - 0.5) END) AS edge,
  sum(CASE WHEN c.cs >= 0.3 THEN 1 ELSE 0 END) AS n_above,
  count(*) AS n_pairs,
  (SELECT sum(CASE WHEN g.hits > 0 THEN 1 ELSE 0 END)
   FROM cr_top t2 LEFT JOIN cr_dg g ON g.doc_id = t2.id) AS n_gram_hits
FROM cr_top t LEFT JOIN cr_cos c ON c.qnum = t.qnum AND c.id = t.id
"""


def main():
    ok = True
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '/root/testdata/{sf}/documents.parquet'"
        )
        thr, edge, n_above, n_pairs, n_gram = con.execute(SQL).fetchone()
        bad = (thr is not None and thr < 1e-9) or (
            edge is not None and edge < 1e-6
        )
        ok = ok and not bad
        print(
            f"{sf}: thr_margin={thr:.3e} edge={edge if edge is None else f'{edge:.3e}'} "
            f"(x1e-6 cos) above_threshold={n_above}/{n_pairs} "
            f"gram_hit_rows={n_gram}"
            + ("  << MARGIN TOO THIN" if bad else "")
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
