"""The DuckDB rendering of the ingest fold — shared SQL fragments for
every gate whose oracle replays classify-against-index → extend in SQL
(ID1's single-delta probe, IN1's two-batch fold, IN2's composed nightly
fold).  This module registers NO gates, so the import direction cannot
perturb the registry's rotation order (the lm_counts.BIGRAMS_EXPR
discipline: one rendering per shared contract, housed where importing it
is side-effect-free).

The fragments mirror plans/incremental.py's kernels exactly:
``_shingles`` / ``minhash_signature`` / ``band_buckets`` and
streaming/ingest.py's ``ingest_step`` — any drift between the Spark
kernel and this SQL is what the gates exist to catch.
"""

from __future__ import annotations

from oc_meta_spark.plans.incremental import NEAR_MIN_AGREE

ID1_SHINGLES = """
    SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
    FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM {src}))
"""

ID1_MINHASH = """
    SELECT doc_id, k, MIN(md5(s || '#' || CAST(k AS VARCHAR))) AS h
    FROM {sh} CROSS JOIN (SELECT unnest(range(8)) AS k)
    GROUP BY doc_id, k
"""

ID1_BANDS = """
    SELECT doc_id, k // 2 AS band, md5(string_agg(h, '|' ORDER BY k)) AS bucket
    FROM {mh} GROUP BY doc_id, k // 2
"""


def in_classify_block(n: int) -> str:
    """One batch's classification CTEs (mirrors ingest_step +
    dedup_against_index over ``b{n}`` vs ``corpus{n}``)."""
    return f"""
    h{n} AS (
      SELECT doc_id, text, md5(text) AS h,
             MIN(doc_id) OVER (PARTITION BY md5(text)) AS holder_id
      FROM b{n}
    ),
    hold{n} AS (SELECT doc_id, text, h FROM h{n} WHERE doc_id = holder_id),
    eidx{n} AS (SELECT md5(text) AS h, MIN(doc_id) AS idx_id FROM corpus{n} GROUP BY 1),
    bsh{n} AS ({ID1_SHINGLES.format(src=f"hold{n}")}),
    ish{n} AS ({ID1_SHINGLES.format(src=f"corpus{n}")}),
    bmh{n} AS ({ID1_MINHASH.format(sh=f"bsh{n}")}),
    imh{n} AS ({ID1_MINHASH.format(sh=f"ish{n}")}),
    bband{n} AS ({ID1_BANDS.format(mh=f"bmh{n}")}),
    iband{n} AS ({ID1_BANDS.format(mh=f"imh{n}")}),
    cand{n} AS (
      SELECT DISTINCT b.doc_id AS b_id, i.doc_id AS i_id
      FROM bband{n} b JOIN iband{n} i ON b.band = i.band AND b.bucket = i.bucket
    ),
    agree{n} AS (
      SELECT c.b_id, c.i_id, COUNT(*) AS n_match
      FROM cand{n} c
      JOIN bmh{n} bm ON bm.doc_id = c.b_id
      JOIN imh{n} im ON im.doc_id = c.i_id AND im.k = bm.k AND im.h = bm.h
      GROUP BY c.b_id, c.i_id
    ),
    near{n} AS (
      SELECT b_id, MIN(i_id) AS near_id FROM agree{n}
      WHERE n_match >= {NEAR_MIN_AGREE} GROUP BY b_id
    ),
    cls{n} AS (
      SELECT hd.doc_id,
             CASE WHEN e.idx_id IS NOT NULL THEN 'exact_dup'
                  WHEN nr.near_id IS NOT NULL THEN 'near_dup'
                  ELSE 'unique' END AS verdict,
             CAST(COALESCE(e.idx_id, nr.near_id) AS BIGINT) AS matched_existing
      FROM hold{n} hd
      LEFT JOIN eidx{n} e ON e.h = hd.h
      LEFT JOIN near{n} nr ON nr.b_id = hd.doc_id
    ),
    dups{n} AS (
      SELECT x.doc_id, 'exact_dup' AS verdict,
             CAST(COALESCE(c.matched_existing, x.holder_id) AS BIGINT) AS matched_existing
      FROM h{n} x JOIN cls{n} c ON c.doc_id = x.holder_id
      WHERE x.doc_id <> x.holder_id
    ),
    ver{n} AS (
      SELECT u.doc_id, u.verdict, u.matched_existing, CAST({n} AS BIGINT) AS batch
      FROM (SELECT * FROM cls{n} UNION ALL SELECT * FROM dups{n}) u
    ),
    surv{n} AS (
      SELECT hd.doc_id, hd.text FROM hold{n} hd
      JOIN cls{n} c ON c.doc_id = hd.doc_id AND c.verdict = 'unique'
    )"""


# the full two-batch fold: IN1's planted batches b0/b1 over the base
# corpus, classified and folded (batch 1's corpus includes batch 0's
# survivors).  Ends at surv1 — IN1 selects the verdicts; IN2 continues
# with corpus_final and the per-store components.
IN_FOLD_CTES = f"""b0p AS (
      SELECT m.doc_id,
             CASE WHEN m.doc_id % 50 = 0 AND d.text IS NOT NULL THEN d.text
                  WHEN m.doc_id % 30 = 0 AND d.text IS NOT NULL THEN d.text || ' zzz'
                  ELSE m.text END AS text
      FROM documents m LEFT JOIN documents d ON d.doc_id = m.doc_id + 2
      WHERE m.doc_id % 10 = 0
    ),
    b0 AS (
      SELECT p.doc_id,
             CASE WHEN p.doc_id % 110 = 0 AND q.text IS NOT NULL THEN q.text
                  ELSE p.text END AS text
      FROM b0p p LEFT JOIN b0p q ON q.doc_id = p.doc_id - 10
    ),
    corpus0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 NOT IN (0, 1)),
    {in_classify_block(0)},
    b1p AS (
      SELECT m.doc_id,
             CASE WHEN m.doc_id % 50 = 1 AND d.text IS NOT NULL THEN d.text
                  WHEN m.doc_id % 30 = 1 AND d.text IS NOT NULL THEN d.text || ' zzz'
                  WHEN m.doc_id % 70 = 1 AND x.text IS NOT NULL THEN x.text
                  ELSE m.text END AS text
      FROM documents m
      LEFT JOIN documents d ON d.doc_id = m.doc_id + 1
      LEFT JOIN b0 x ON x.doc_id = m.doc_id - 1
      WHERE m.doc_id % 10 = 1
    ),
    b1 AS (
      SELECT p.doc_id,
             CASE WHEN p.doc_id % 110 = 1 AND q.text IS NOT NULL THEN q.text
                  ELSE p.text END AS text
      FROM b1p p LEFT JOIN b1p q ON q.doc_id = p.doc_id - 10
    ),
    corpus1 AS (
      SELECT doc_id, text FROM corpus0
      UNION ALL SELECT doc_id, text FROM surv0
    ),
    {in_classify_block(1)}"""
