"""Similarity-search plans over the embedding table (training-data pipeline
extension; SURVEY §7.2 M6): brute-force cosine top-k as the correctness
baseline, sign-bit LSH bucketing as the scale path.

Engine-exact float math: every dot product / norm is a *sequential left
fold* over the vector — ``F.aggregate`` in Spark, ``list_reduce`` in DuckDB —
with each float32 cast to double first.  IEEE addition in identical order ⇒
bitwise-identical cosines, so even threshold predicates agree exactly.

Scale notes: brute-force is O(Q·N·d) and only sane for small Q (broadcast
the queries).  The bucketed variant is the 100 TB shape: hash every vector
into a sign-bit bucket (one narrow map), then self-join per bucket — the
shuffle keys on the bucket id, and candidate generation never leaves the
bucket.  More bits ⇒ smaller buckets ⇒ higher recall loss; this is the
standard LSH trade, tested here with 4 bits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# DuckDB fragments ----------------------------------------------------------
_DOT = (
    "list_reduce(list_transform(range(1, 65), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)
_NORM = "sqrt(" + _DOT.format(a="{a}", b="{a}") + ")"
# Sign-bit bucket over ``bits`` coordinates starting at 1-based ``start``.
# The DEFAULT ANN configuration is 16 bits × 2 tables (disjoint coordinate
# blocks): bucket count scales as 2^bits, so the per-bucket self-join stays
# bounded as N grows — the 4-bit single-table variant survives only as a
# test configuration (kept for X4's exhaustive near-dup gate where recall,
# not candidate pruning, is the point at test scale).
LSH_BITS = 16
LSH_TABLES = 2


def _bucket_sql(a: str, bits: int, start: int = 1) -> str:
    terms = [
        f"CASE WHEN CAST({a}[{start + i}] AS DOUBLE) > 0 THEN {1 << i} ELSE 0 END"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


_BUCKET = _bucket_sql("{a}", 4)


# Spark fragments -----------------------------------------------------------
# the fold kernels moved to functions/vectors.py (round 9) so the
# persisted IVF index shares the exact same float contract; the local
# names stay for the gate bodies below
from oc_meta_spark.functions.vectors import dot as _dot  # noqa: E402
from oc_meta_spark.functions.vectors import norm as _norm  # noqa: E402


def _bucket(a: str, bits: int = 4, start: int = 0) -> Column:
    c = F.col(a)
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(c.getItem(start + i).cast("double") > 0, 2**i).otherwise(0)
    return out


# ---------------------------------------------------------------------------
# X1 — vector norms (sanity + the shared normalization stage).
# ---------------------------------------------------------------------------
@register(
    "X1_vector_norms",
    f"""
    SELECT vec_id, label, {_NORM.format(a='embedding')} AS norm, len(embedding) AS dim
    FROM embeddings ORDER BY vec_id
    """,
    doc="L2 norms via sequential fold — engine-exact float math (similarity base).",
)
def x1_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.select(
        "vec_id", "label", _norm("embedding").alias("norm"), F.size("embedding").cast("bigint").alias("dim")
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# X2 — brute-force cosine top-k: query set broadcast against all vectors
# (the correctness baseline for ANN; deterministic (cos desc, vec_id) rank).
# ---------------------------------------------------------------------------
@register(
    "X2_cosine_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT q.qid, e.vec_id,
             {_DOT.format(a='q.qe', b='e.embedding')}
               / ({_NORM.format(a='q.qe')} * {_NORM.format(a='e.embedding')}) AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.qid
    )
    SELECT qid, vec_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
      FROM pairs
    ) WHERE rank <= 10
    ORDER BY qid, rank
    """,
    doc="Brute-force cosine top-k with broadcast query side (similarity baseline).",
)
def x2_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    pairs = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (_dot("qe", "embedding") / (_norm("qe") * _norm("embedding"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "vec_id", "cosine", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# X3 — multi-table sign-bit LSH nearest neighbor: per-vector top-1 among
# candidates sharing a 16-bit bucket in EITHER table (the 100 TB ANN shape:
# bucket ids are the shuffle keys; 2^16 buckets per table keeps the
# per-bucket self-join bounded as N grows, and the second table recovers
# recall lost to the finer buckets — the VERDICT-flagged 4-bit variant
# degenerated toward O(N²/16)).
# ---------------------------------------------------------------------------
_B1 = _bucket_sql("{a}", LSH_BITS, 1)
_B2 = _bucket_sql("{a}", LSH_BITS, 1 + LSH_BITS)


@register(
    "X3_lsh_bucketed_nn",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_B1.format(a='embedding')} AS b1,
             {_B2.format(a='embedding')} AS b2
      FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id, x.vec_id AS nn
      FROM b a JOIN b x ON a.b1 = x.b1 AND a.vec_id <> x.vec_id
      UNION
      SELECT a.vec_id, x.vec_id AS nn
      FROM b a JOIN b x ON a.b2 = x.b2 AND a.vec_id <> x.vec_id
    ),
    pairs AS (
      SELECT c.vec_id, c.nn,
             {_DOT.format(a='a.embedding', b='x.embedding')}
               / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='x.embedding')}) AS cosine
      FROM cand c
      JOIN b a ON a.vec_id = c.vec_id
      JOIN b x ON x.vec_id = c.nn
    )
    SELECT vec_id, nn, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nn) AS rn FROM pairs
    ) WHERE rn = 1
    ORDER BY vec_id
    """,
    doc="Multi-table 16-bit sign LSH ANN: top-1 among either-table bucket mates (scale path).",
)
def x3_lsh_bucketed_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    b = emb.select(
        "vec_id",
        "embedding",
        _bucket("embedding", LSH_BITS, 0).alias("b1"),
        _bucket("embedding", LSH_BITS, LSH_BITS).alias("b2"),
    )
    a = b.select(F.col("vec_id").alias("vid"), F.col("b1").alias("a1"), F.col("b2").alias("a2"))
    x = b.select(F.col("vec_id").alias("nn"), F.col("b1").alias("x1"), F.col("b2").alias("x2"))
    cand = (
        a.join(x, (F.col("a1") == F.col("x1")) & (F.col("vid") != F.col("nn"))).select("vid", "nn")
        .unionByName(
            a.join(x, (F.col("a2") == F.col("x2")) & (F.col("vid") != F.col("nn"))).select("vid", "nn")
        )
        .dropDuplicates()
    )
    ea = b.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ea"))
    ex = b.select(F.col("vec_id").alias("nn"), F.col("embedding").alias("ex"))
    pairs = cand.join(ea, "vid").join(ex, "nn").select(
        F.col("vid").alias("vec_id"),
        "nn",
        (_dot("ea", "ex") / (_norm("ea") * _norm("ex"))).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("nn"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nn", "cosine")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# X4 — embedding-cosine near-duplicate pairs above a threshold.  Candidate
# generation uses the SAME multi-table 16-bit sign-LSH blocking as X3 (2^16
# buckets per table, two disjoint coordinate blocks): candidates are pairs
# sharing a bucket in EITHER table, then an exact cosine verify applies the
# threshold.  Round 1 flagged this structure on X3 and round 2 flagged it
# here: a fixed 16-bucket blocking degenerates toward O(N²/16) at 100 TB,
# while 2^16-bucket tables keep the per-bucket self-join bounded as N grows
# (bucket occupancy ~N/65536 per table).  Threshold membership is stable
# because cosines are bitwise identical across engines (sequential-fold
# contract at module top).  The legacy 4-bit blocking survives only as a
# recall-test configuration (``x4_neardup_4bit`` below, not registered).
# ---------------------------------------------------------------------------
_X4_THRESH = 0.3


@register(
    "X4_embedding_neardup_pairs",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_B1.format(a='embedding')} AS b1,
             {_B2.format(a='embedding')} AS b2
      FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, x.vec_id AS vec_b
      FROM b a JOIN b x ON a.b1 = x.b1 AND a.vec_id < x.vec_id
      UNION
      SELECT a.vec_id AS vec_a, x.vec_id AS vec_b
      FROM b a JOIN b x ON a.b2 = x.b2 AND a.vec_id < x.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           {_DOT.format(a='a.embedding', b='x.embedding')}
             / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='x.embedding')}) AS cosine
    FROM cand c
    JOIN b a ON a.vec_id = c.vec_a
    JOIN b x ON x.vec_id = c.vec_b
    WHERE {_DOT.format(a='a.embedding', b='x.embedding')}
             / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='x.embedding')}) > {_X4_THRESH}
    ORDER BY vec_a, vec_b
    """,
    doc="Embedding near-dup pairs: multi-table 16-bit sign-LSH blocking + exact cosine-threshold verify.",
)
def x4_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    b = emb.select(
        "vec_id",
        "embedding",
        _bucket("embedding", LSH_BITS, 0).alias("b1"),
        _bucket("embedding", LSH_BITS, LSH_BITS).alias("b2"),
    )
    a = b.select(F.col("vec_id").alias("vec_a"), F.col("b1").alias("a1"), F.col("b2").alias("a2"))
    x = b.select(F.col("vec_id").alias("vec_b"), F.col("b1").alias("x1"), F.col("b2").alias("x2"))
    cand = (
        a.join(x, (F.col("a1") == F.col("x1")) & (F.col("vec_a") < F.col("vec_b"))).select("vec_a", "vec_b")
        .unionByName(
            a.join(x, (F.col("a2") == F.col("x2")) & (F.col("vec_a") < F.col("vec_b"))).select("vec_a", "vec_b")
        )
        .dropDuplicates()
    )
    ea = b.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    ex = b.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("ex"))
    cos = _dot("ea", "ex") / (_norm("ea") * _norm("ex"))
    return (
        cand.join(ea, "vec_a")
        .join(ex, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") > _X4_THRESH)
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# X6 — the same near-dup plan as X4 run over a corpus that CONTAINS planted
# near-duplicates, so the oracle-checked result is non-trivial.  The synthetic
# embeddings are near-random (max pairwise cosine < 0.5 at every SF), which
# is the honest negative case for X4 — its 100-TB-safe blocking correctly
# returns (almost) nothing there.  This gate augments the table inside the
# query with perturbed copies of the first 40 vectors: coordinates 33..64
# (outside BOTH sign-bit blocks) get x·0.9 + 0.01, giving cosine ≈ 0.99
# pairs that share b1 and b2 by construction.  The perturbation is float→
# double→float IEEE arithmetic, bitwise identical in both engines, so the
# full pipeline — augmentation, blocking, exact verify — is hash-checked.
# ---------------------------------------------------------------------------
_X6_PLANT = 40
# Planted copies get ids shifted by this offset.  The oracle SQL bakes the
# constant in, so it cannot scale with the data: if a real vec_id ever
# reaches the offset, planted ids would silently collide with real rows and
# corrupt the X6/X7 gate semantics with no failure signal.  The builders
# therefore assert max(vec_id) < offset at run time (one narrow max-agg over
# a tiny gate table) and fail loudly instead.  sf0.1 max vec_id is 1999.
_PLANT_OFFSET = 100000
_PERTURB_SQL = (
    "list_concat(embedding[1:32], "
    "list_transform(embedding[33:64], x -> CAST(CAST(x AS DOUBLE) * 0.9 + 0.01 AS FLOAT)))"
)


def _check_offset_value(mx, id_col: str, offset: int, gate: str) -> None:
    """The pure guard: raise if an observed max id reaches the offset."""
    if mx is not None and mx >= offset:
        raise ValueError(
            f"{gate}: max({id_col})={mx} >= planted-id offset {offset}; "
            "planted rows would collide with real ids and silently corrupt "
            "the oracle — raise the offset constant (in BOTH the builder "
            "and the oracle SQL) before running at this scale factor"
        )


def assert_planted_offset_safe(
    df: DataFrame, id_col: str, offset: int, gate: str
) -> None:
    """Fail loudly if real ids reach the planted-id offset (see
    _PLANT_OFFSET note).  Cost: one max-agg job over a single narrow
    column of a gate-scale table.  Builders that already run a stats
    action over the same table should instead fold max(id) into that
    job and call _check_offset_value (X7 does)."""
    mx = df.agg(F.max(id_col).alias("mx")).first()["mx"]
    _check_offset_value(mx, id_col, offset, gate)


def _augmented_corpus(emb: DataFrame, gate: str, skip_guard: bool = False) -> DataFrame:
    """The X6/X7 planted corpus: the base embeddings plus perturbed copies
    of the first _X6_PLANT vectors at vec_id + _PLANT_OFFSET (cos ≈ 0.99
    to their originals; float→double→float IEEE arithmetic, bitwise
    identical in Spark and DuckDB)."""
    if not skip_guard:
        assert_planted_offset_safe(emb, "vec_id", _PLANT_OFFSET, gate)
    planted = emb.filter(F.col("vec_id") < _X6_PLANT).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 32),
            F.transform(
                F.slice("embedding", 33, 32),
                lambda x: (x.cast("double") * 0.9 + 0.01).cast("float"),
            ),
        ).alias("embedding"),
    )
    return emb.unionByName(planted)


@register(
    "X6_embedding_neardup_planted",
    f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {_PLANT_OFFSET} AS vec_id, {_PERTURB_SQL} AS embedding
      FROM embeddings WHERE vec_id < {_X6_PLANT}
    ),
    b AS (
      SELECT vec_id, embedding,
             {_B1.format(a='embedding')} AS b1,
             {_B2.format(a='embedding')} AS b2
      FROM aug
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, x.vec_id AS vec_b
      FROM b a JOIN b x ON a.b1 = x.b1 AND a.vec_id < x.vec_id
      UNION
      SELECT a.vec_id AS vec_a, x.vec_id AS vec_b
      FROM b a JOIN b x ON a.b2 = x.b2 AND a.vec_id < x.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           {_DOT.format(a='a.embedding', b='x.embedding')}
             / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='x.embedding')}) AS cosine
    FROM cand c
    JOIN b a ON a.vec_id = c.vec_a
    JOIN b x ON x.vec_id = c.vec_b
    WHERE {_DOT.format(a='a.embedding', b='x.embedding')}
             / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='x.embedding')}) > {_X4_THRESH}
    ORDER BY vec_a, vec_b
    """,
    doc="X4's near-dup plan over a corpus with planted perturbed copies — non-trivial oracle check of blocking + verify.",
)
def x6_embedding_neardup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    aug = _augmented_corpus(emb, "X6_embedding_neardup_planted")
    b = aug.select(
        "vec_id",
        "embedding",
        _bucket("embedding", LSH_BITS, 0).alias("b1"),
        _bucket("embedding", LSH_BITS, LSH_BITS).alias("b2"),
    )
    a = b.select(F.col("vec_id").alias("vec_a"), F.col("b1").alias("a1"), F.col("b2").alias("a2"))
    x = b.select(F.col("vec_id").alias("vec_b"), F.col("b1").alias("x1"), F.col("b2").alias("x2"))
    cand = (
        a.join(x, (F.col("a1") == F.col("x1")) & (F.col("vec_a") < F.col("vec_b"))).select("vec_a", "vec_b")
        .unionByName(
            a.join(x, (F.col("a2") == F.col("x2")) & (F.col("vec_a") < F.col("vec_b"))).select("vec_a", "vec_b")
        )
        .dropDuplicates()
    )
    ea = b.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    ex = b.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("ex"))
    cos = _dot("ea", "ex") / (_norm("ea") * _norm("ex"))
    return (
        cand.join(ea, "vec_a")
        .join(ex, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") > _X4_THRESH)
        .orderBy("vec_a", "vec_b")
    )


def x4_neardup_4bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy 4-bit/16-bucket blocking — recall-comparison test config only
    (NOT registered; the coarse buckets over-generate candidates, so its
    pair set is a superset used to pin the 16-bit variant's recall)."""
    emb = load_table(spark, "embeddings", sf_dir)
    b = emb.select("vec_id", "embedding", _bucket("embedding").alias("bucket"))
    a = b.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket")
    x = b.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("ex"), F.col("bucket").alias("bx"))
    cos = _dot("ea", "ex") / (_norm("ea") * _norm("ex"))
    return (
        a.join(x, (F.col("bucket") == F.col("bx")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") > _X4_THRESH)
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# X5 — IVF-style ANN (inverted-file index: Sivic & Zisserman ICCV'03 /
# the FAISS IVF layout — public techniques).  Deterministic end-to-end so
# the full approximate pipeline is oracle-checkable: centroids are the 16
# vectors with the smallest md5(vec_id) (a seedless pseudo-random draw
# both engines compute identically), every vector joins its argmax-cosine
# cell, and a query probes only its 4 best cells.  The scale shape: the
# centroid table broadcasts (k rows), assignment is one narrow N×k map,
# and search shuffles on cell ids — candidates never leave the probed
# cells, so cost is Q·(N·nprobe/k) instead of Q·N.
# ---------------------------------------------------------------------------
IVF_K = 16
IVF_NPROBE = 4


@register(
    "X5_ivf_ann",
    f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_K}
    ),
    assign AS (
      SELECT vec_id, embedding, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
               {_DOT.format(a='embedding', b='ce')}
                 / ({_NORM.format(a='embedding')} * {_NORM.format(a='ce')}) DESC, cid) AS rn
      FROM embeddings CROSS JOIN c
    ),
    cells AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    probe AS (
      SELECT qid, qe, cid FROM (
        SELECT qid, qe, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                 {_DOT.format(a='qe', b='ce')}
                   / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}) DESC, cid) AS pr
        FROM q CROSS JOIN c
      ) WHERE pr <= {IVF_NPROBE}
    ),
    scored AS (
      SELECT p.qid, m.vec_id,
             {_DOT.format(a='p.qe', b='m.embedding')}
               / ({_NORM.format(a='p.qe')} * {_NORM.format(a='m.embedding')}) AS cosine
      FROM probe p JOIN cells m ON m.cid = p.cid AND m.vec_id <> p.qid
    )
    SELECT qid, vec_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    ORDER BY qid, rank
    """,
    doc="IVF ANN: deterministic centroids, argmax-cosine cells, nprobe-cell search (scale path #2).",
)
def x5_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the draw/assign/search kernels are shared with the persisted IVF
    # index (plans/ivf_index.py) — one implementation, both gates
    from oc_meta_spark.plans.ivf_index import build_ivf_index, search_ivf_index

    emb = load_table(spark, "embeddings", sf_dir)
    index = build_ivf_index(emb, IVF_K)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return search_ivf_index(q, index, IVF_NPROBE, 10).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# X8 — persisted/incremental IVF ANN: the nightly shape of X5 (FAISS's
# train-once / add-many discipline).  Centroids are drawn ONCE from the
# founding corpus (vec_id % 10 != 0) and FROZEN; the nightly delta
# (vec_id % 10 == 0) is assigned against the frozen centroids and
# appended via extend_ivf_index — which is exactly equivalent to
# rebuilding assignments for the full corpus against the same centroids,
# because each vector's cell depends only on the centroids.  The oracle
# exploits precisely that equivalence: it re-derives the founding-corpus
# centroid draw and assigns ALL vectors in one pass — so a gate match
# proves extend ≡ rebuild on real data (persistence + config-guard are
# pinned in tests/test_ivf_index.py, like the signature index).
#
# Scale notes (100 TB): centroids broadcast (k rows); the delta
# assignment is one narrow N_delta × k map; search semi-prefilters the
# persisted cid-partitioned inverted lists on the probed cids — the
# corpus-sized assignments are partition-pruned and never shuffled.
# ---------------------------------------------------------------------------
@register(
    "X8_incremental_ivf_ann",
    f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      WHERE vec_id % 10 <> 0
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_K}
    ),
    assign AS (
      SELECT vec_id, embedding, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
               {_DOT.format(a='embedding', b='ce')}
                 / ({_NORM.format(a='embedding')} * {_NORM.format(a='ce')}) DESC, cid) AS rn
      FROM embeddings CROSS JOIN c
    ),
    cells AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    probe AS (
      SELECT qid, qe, cid FROM (
        SELECT qid, qe, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                 {_DOT.format(a='qe', b='ce')}
                   / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}) DESC, cid) AS pr
        FROM q CROSS JOIN c
      ) WHERE pr <= {IVF_NPROBE}
    ),
    scored AS (
      SELECT p.qid, m.vec_id,
             {_DOT.format(a='p.qe', b='m.embedding')}
               / ({_NORM.format(a='p.qe')} * {_NORM.format(a='m.embedding')}) AS cosine
      FROM probe p JOIN cells m ON m.cid = p.cid AND m.vec_id <> p.qid
    )
    SELECT qid, vec_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    ORDER BY qid, rank
    """,
    doc="Persisted IVF ANN: frozen founding-corpus centroids, delta appended via extend_ivf_index (extend ≡ rebuild), probe-pruned search.",
)
def x8_incremental_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.ivf_index import (
        build_ivf_index,
        extend_ivf_index,
        search_ivf_index,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    founding = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    index = extend_ivf_index(build_ivf_index(founding, IVF_K), delta)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return search_ivf_index(q, index, IVF_NPROBE, 10).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# X7 — SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication" — public paper): cluster the
# corpus by embedding (X5's deterministic k-centroid assignment), then
# within each cluster drop every vector that has an eps-cosine semantic
# duplicate with a smaller id (min-id survivor per dup group).  Run over
# the X6 planted corpus so the oracle-checked result is non-trivial: the
# planted perturbed copies (cos ≈ 0.99 to their originals) land in the
# original's cell and are removed; the near-random base corpus survives.
#
# Scale shape: the centroid table broadcasts (k rows), assignment is one
# narrow N×k map, and the eps self-join keys on the cell id — candidates
# never cross cells.  Production k grows with N (SemDeDup uses ~100k
# clusters at web scale) so cells stay bounded; round-5: k is now
# parametrized by corpus size (x7_cluster_count: ceil(N/128) with an IVF_K
# floor), identically in builder and oracle.
# ---------------------------------------------------------------------------
# Production k grows with N: SemDeDup bounds the within-cell eps self-join
# by keeping cell populations near a constant (~_X7_TARGET_CELL vectors per
# cell; the paper uses ~100k clusters at web scale).  k is a pure integer
# function of the augmented corpus size, computed identically in the Spark
# builder (driver-side count) and the DuckDB oracle (scalar subquery with
# the same ceil-division arithmetic), so the two engines always pick the
# same centroid set.  The IVF_K floor keeps the gate config stable at test
# scale (k = 16 for every shipped sf; growth kicks in above ~2048 vectors).
_X7_TARGET_CELL = 128


def x7_cluster_count(n_corpus: int) -> int:
    """SemDeDup cell count for an n_corpus-vector corpus: ceil(n/128)
    with an IVF_K floor — linear in N so cells stay bounded."""
    return max(IVF_K, -(-n_corpus // _X7_TARGET_CELL))


_X7_EPS = 0.9


@register(
    "X7_semantic_dedup",
    f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {_PLANT_OFFSET} AS vec_id, {_PERTURB_SQL} AS embedding
      FROM embeddings WHERE vec_id < {_X6_PLANT}
    ),
    c AS (
      SELECT cid, ce FROM (
        SELECT vec_id AS cid, embedding AS ce,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS crn
        FROM embeddings
      ) WHERE crn <= GREATEST({IVF_K},
          ((SELECT COUNT(*) FROM aug) + {_X7_TARGET_CELL - 1}) // {_X7_TARGET_CELL})
    ),
    assign AS (
      SELECT vec_id, embedding, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
               {_DOT.format(a='embedding', b='ce')}
                 / ({_NORM.format(a='embedding')} * {_NORM.format(a='ce')}) DESC, cid) AS rn
      FROM aug CROSS JOIN c
    ),
    cells AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_DOT.format(a='a.embedding', b='b.embedding')}
              / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='b.embedding')}) > {_X7_EPS}
    )
    SELECT c.vec_id, c.cid, (d.vec_id IS NULL) AS kept
    FROM cells c LEFT JOIN dup d ON d.vec_id = c.vec_id
    ORDER BY c.vec_id
    """,
    doc="SemDeDup: k-centroid clustering + within-cluster eps-cosine dedup (min-id survivor), over the planted corpus.",
)
def x7_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    # ONE stats job covers both the offset guard's max and the corpus
    # counts x7_cluster_count needs (round-6: previously a .first() guard
    # job followed by aug.count() — two sequential full scans)
    stats = emb.agg(
        F.max("vec_id").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("vec_id") < _X6_PLANT, 1)).alias("n_plant"),
    ).first()
    _check_offset_value(stats["mx"], "vec_id", _PLANT_OFFSET, "X7_semantic_dedup")
    aug = _augmented_corpus(emb, "X7_semantic_dedup", skip_guard=True)
    k = x7_cluster_count(stats["n"] + stats["n_plant"])
    # Centroid draw: deterministic md5 order, NOT k-means (decision recorded
    # in SCALING.md round-6): the dedup contract and cell boundedness hold
    # for any centroid set, and a Lloyd refinement takes float-vector means
    # whose summation order Spark and DuckDB cannot replicate bitwise.  At
    # web scale swap this builder for k-means|| seeding (quality knob only).
    cents = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    )
    cos_vc = _dot("embedding", "ce") / (_norm("embedding") * _norm("ce"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("cid"))
    cells = (
        aug.join(F.broadcast(cents))
        .withColumn("_cos", cos_vc)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )
    a = cells.select(F.col("cid"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = cells.select(F.col("cid"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    cos_ab = _dot("ea", "eb") / (_norm("ea") * _norm("eb"))
    dup = (
        a.join(b, ["cid"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos_ab > _X7_EPS)
        .select(F.col("id_b").alias("vec_id"))
        .dropDuplicates()
        .withColumn("_dup", F.lit(True))
    )
    return (
        cells.join(dup, "vec_id", "left")
        .select("vec_id", "cid", F.col("_dup").isNull().alias("kept"))
        .orderBy("vec_id")
    )
