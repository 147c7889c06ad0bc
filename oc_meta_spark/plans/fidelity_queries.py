"""Oracle gates for the scalar / filter fidelity components that previously
had only pytest coverage: type aliasing (F3), the three vol/issue
invalidation rules (F4), temp-id suppression (F7), RA-name normalization
(C7), control-character removal (C11), venue-type inference with the
ISBN/ISSN scheme-evidence override (C14), precision-typed date literals
(C15), agent-list cleaning (D6), and numeric file ordering (W3).

Each gate feeds the PRODUCTION expression / UDF with inputs synthesized
deterministically from the TPC-H-ish tables, while the DuckDB oracle
re-expresses the documented reference semantics independently in SQL —
two implementations agreeing on the same value-hash, not a copied formula.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from oc_meta_spark.plans.registry import register
from oc_meta_spark.schemas import TYPE_ALIASES, VALID_TYPES
from oc_meta_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# F3 — type normalization / aliasing (reference clean_metadata_without_id,
# core/curator.py:398-419): lowercase, collapse internal whitespace, alias
# the five known forms, '' for anything outside the controlled vocabulary.
# ---------------------------------------------------------------------------

_F3_VARIANTS = [
    "Journal Article",
    " edited   book ",
    "REPORT SERIES",
    "posted content",
    "Proceedings Series",
    "nonsense type",
    "abstract",
    "Standard  Series",
    "Monograph",
    "data  file",
]

_F3_SQL_CASE = "CASE p_partkey % 10 " + " ".join(
    f"WHEN {i} THEN '{v}'" for i, v in enumerate(_F3_VARIANTS)
) + " END"
_F3_ALIAS_CASE = "CASE norm " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in sorted(TYPE_ALIASES.items())
) + " ELSE norm END"
_F3_VALID_LIST = ", ".join(f"'{t}'" for t in sorted(VALID_TYPES))


@register(
    "F3_type_aliasing",
    f"""
    WITH raw AS (
      SELECT p_partkey AS key, {_F3_SQL_CASE} AS raw_type
      FROM part WHERE p_partkey <= 500
    ),
    norm AS (
      SELECT key, raw_type,
             lower(trim(regexp_replace(raw_type, '\\s+', ' ', 'g'))) AS norm
      FROM raw
    ),
    aliased AS (
      SELECT key, raw_type, {_F3_ALIAS_CASE} AS aliased FROM norm
    )
    SELECT key, raw_type,
           CASE WHEN aliased IN ({_F3_VALID_LIST}) THEN aliased ELSE '' END AS final_type
    FROM aliased ORDER BY key
    """,
    doc="Controlled-vocabulary type aliasing via the production _alias_type expression (SURVEY F3).",
)
def f3_type_aliasing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.curation import _alias_type

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    raw = F.elt(F.col("p_partkey") % 10 + 1, *[F.lit(v) for v in _F3_VARIANTS])
    return (
        part.select(F.col("p_partkey").alias("key"), raw.alias("raw_type"))
        .withColumn("final_type", _alias_type(F.col("raw_type")))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# F4 — the three semantic vol/issue invalidation rules (reference clean_vvi,
# core/curator.py:439-446, 531-535, 565-567), applied through the SAME
# helper expressions curate()'s stage_parse uses.
# ---------------------------------------------------------------------------

_F4_TYPES = ["journal article", "journal volume", "journal issue", "book", "journal editorial"]
_F4_TYPE_CASE = "CASE key % 5 " + " ".join(
    f"WHEN {i} THEN '{t}'" for i, t in enumerate(_F4_TYPES)
) + " END"


@register(
    "F4_vol_issue_invalidation",
    f"""
    WITH src AS (
      SELECT p_partkey AS key, {_F4_TYPE_CASE} AS typ,
             CASE WHEN p_partkey % 3 = 0 THEN '' ELSE '12' END AS vol,
             CASE WHEN p_partkey % 4 = 0 THEN '' ELSE '3' END AS iss,
             p_partkey % 2 = 0 AS has_venue
      FROM part WHERE p_partkey <= 500
    ),
    g1 AS (  -- rule 1: only journal article/volume/issue carry vol/iss
      SELECT key, typ, has_venue,
             CASE WHEN typ IN ('journal article','journal volume','journal issue') THEN vol ELSE '' END AS vol,
             CASE WHEN typ IN ('journal article','journal volume','journal issue') THEN iss ELSE '' END AS iss
      FROM src
    ),
    g2 AS (  -- rule 2: journal-volume row carrying an issue loses both
      SELECT key, typ, has_venue,
             CASE WHEN typ = 'journal volume' AND vol <> '' AND iss <> '' THEN '' ELSE vol END AS vol,
             CASE WHEN typ = 'journal volume' AND vol <> '' AND iss <> '' THEN '' ELSE iss END AS iss
      FROM g1
    )
    SELECT key, typ, has_venue,  -- rule 3: no venue => no vol/iss
           CASE WHEN has_venue THEN vol ELSE '' END AS vol_out,
           CASE WHEN has_venue THEN iss ELSE '' END AS iss_out
    FROM g2 ORDER BY key
    """,
    doc="Three-stage vol/issue invalidation via the production seq_type/jv_both/venue_presence gates (SURVEY F4).",
)
def f4_vol_issue_invalidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.curation import jv_both_gate, seq_type_gate, venue_presence_gate

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    src = part.select(
        F.col("p_partkey").alias("key"),
        F.elt(F.col("p_partkey") % 5 + 1, *[F.lit(t) for t in _F4_TYPES]).alias("typ"),
        F.when(F.col("p_partkey") % 3 == 0, "").otherwise("12").alias("vol"),
        F.when(F.col("p_partkey") % 4 == 0, "").otherwise("3").alias("iss"),
        (F.col("p_partkey") % 2 == 0).alias("has_venue"),
    )
    v1, i1 = seq_type_gate(F.col("typ"), F.col("vol"), F.col("iss"))
    src = src.withColumn("v1", v1).withColumn("i1", i1)
    v2, i2 = jv_both_gate(F.col("typ"), F.col("v1"), F.col("i1"))
    src = src.withColumn("v2", v2).withColumn("i2", i2)
    v3, i3 = venue_presence_gate(F.col("has_venue"), F.col("v2"), F.col("i2"))
    return src.select(
        "key", "typ", "has_venue", v3.alias("vol_out"), i3.alias("iss_out")
    ).orderBy("key")


# ---------------------------------------------------------------------------
# F7 — temp-id suppression (reference core/creator.py:629-631): temp:
# identifiers drive in-batch dedup but are never persisted.
# ---------------------------------------------------------------------------


@register(
    "F7_temp_id_suppression",
    """
    WITH toks AS (
      SELECT p_partkey AS key, u.tok AS tok
      FROM part, UNNEST([
        'doi:10.1000/t' || CAST(p_partkey AS VARCHAR),
        'temp:' || CAST(p_partkey % 50 AS VARCHAR),
        CASE WHEN p_partkey % 2 = 0 THEN 'viaf:' || CAST(p_partkey AS VARCHAR)
             ELSE 'temp:x' || CAST(p_partkey AS VARCHAR) END
      ]) AS u(tok)
      WHERE p_partkey <= 500
    )
    SELECT key, tok FROM toks WHERE tok NOT LIKE 'temp:%' ORDER BY key, tok
    """,
    doc="Persistable-identifier filter: temp: tokens never reach the minted tables (SURVEY F7).",
)
def f7_temp_id_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    k = F.col("p_partkey").cast("string")
    toks = part.select(
        F.col("p_partkey").alias("key"),
        F.explode(
            F.array(
                F.concat(F.lit("doi:10.1000/t"), k),
                F.concat(F.lit("temp:"), (F.col("p_partkey") % 50).cast("string")),
                F.when(F.col("p_partkey") % 2 == 0, F.concat(F.lit("viaf:"), k)).otherwise(
                    F.concat(F.lit("temp:x"), k)
                ),
            )
        ).alias("tok"),
    )
    # the same predicate curate() applies to persistable_tok
    return toks.filter(F.split(F.col("tok"), ":")[0] != "temp").orderBy("key", "tok")


# ---------------------------------------------------------------------------
# W3 — numeric file ordering (reference lib/file_manager.py:178-194): sort
# '{n}.csv' / 'chunk_{n}.csv' names by their integer key, not lexically.
# ---------------------------------------------------------------------------


@register(
    "W3_numeric_file_ordering",
    """
    WITH files AS (
      SELECT CASE WHEN p_partkey % 2 = 0
                  THEN CAST(p_partkey AS VARCHAR) || '.csv'
                  ELSE 'chunk_' || CAST(p_partkey AS VARCHAR) || '.csv' END AS fname
      FROM part WHERE p_partkey <= 500
    )
    SELECT fname,
           CAST(regexp_extract(fname, '(\\d+)\\.csv$', 1) AS BIGINT) AS n,
           ROW_NUMBER() OVER (ORDER BY CAST(regexp_extract(fname, '(\\d+)\\.csv$', 1) AS BIGINT), fname) AS ord
    FROM files ORDER BY ord
    """,
    doc="Numeric (not lexical) filename ordering for chunked inputs (SURVEY W3).",
)
def w3_numeric_file_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    k = F.col("p_partkey").cast("string")
    files = part.select(
        F.when(F.col("p_partkey") % 2 == 0, F.concat(k, F.lit(".csv")))
        .otherwise(F.concat(F.lit("chunk_"), k, F.lit(".csv")))
        .alias("fname")
    )
    n = F.regexp_extract("fname", r"(\d+)\.csv$", 1).cast("bigint")
    w = Window.orderBy(n, F.col("fname"))
    return (
        files.withColumn("n", n)
        .withColumn("ord", F.row_number().over(w).cast("bigint"))
        .orderBy("ord")
    )


# ---------------------------------------------------------------------------
# C7 — RA-name normalization (reference _normalize_ra_name,
# lib/cleaner.py:293-317) through the PRODUCTION python core.
# ---------------------------------------------------------------------------


@pandas_udf(T.StringType())
def _normalize_ra_name_udf(s):
    from oc_meta_spark.functions.cleaning import normalize_ra_name_py

    return s.map(normalize_ra_name_py)


@register(
    "C7_ra_name_normalization",
    """
    WITH src AS (
      SELECT c_custkey AS key, c_name, c_mktsegment AS seg,
             CASE c_custkey % 6
               WHEN 0 THEN 'Not Available'
               WHEN 1 THEN c_name
               WHEN 2 THEN c_mktsegment || ', Not Available'
               WHEN 3 THEN 'Not Available, ' || c_name
               WHEN 4 THEN c_mktsegment || ', ' || c_name
               ELSE '[' || c_name || ']?'
             END AS raw
      FROM customer WHERE c_custkey <= 600
    )
    SELECT key, raw,
           CASE key % 6
             WHEN 0 THEN ''
             WHEN 1 THEN c_name
             WHEN 2 THEN seg || ', '
             WHEN 3 THEN ''
             WHEN 4 THEN seg || ', ' || c_name
             ELSE c_name
           END AS normalized
    FROM src ORDER BY key
    """,
    doc="'Not Available' scrubbing + comma-name part rules via the production normalize_ra_name core (SURVEY C7).",
)
def c7_ra_name_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 600)
    raw = (
        F.when(F.col("c_custkey") % 6 == 0, F.lit("Not Available"))
        .when(F.col("c_custkey") % 6 == 1, F.col("c_name"))
        .when(F.col("c_custkey") % 6 == 2, F.concat(F.col("c_mktsegment"), F.lit(", Not Available")))
        .when(F.col("c_custkey") % 6 == 3, F.concat(F.lit("Not Available, "), F.col("c_name")))
        .when(F.col("c_custkey") % 6 == 4, F.concat(F.col("c_mktsegment"), F.lit(", "), F.col("c_name")))
        .otherwise(F.concat(F.lit("["), F.col("c_name"), F.lit("]?")))
    )
    return (
        cust.select(F.col("c_custkey").alias("key"), raw.alias("raw"))
        .withColumn("normalized", _normalize_ra_name_udf(F.col("raw")))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# C11 — control/extended-ASCII removal (reference remove_ascii,
# lib/cleaner.py:497-499) via the production native expression.
# ---------------------------------------------------------------------------


@register(
    "C11_remove_ascii",
    """
    WITH src AS (
      SELECT c_custkey AS key,
             c_name || CASE c_custkey % 4
               WHEN 0 THEN chr(7) || ' x'
               WHEN 1 THEN chr(31) || chr(127) || 'y'
               WHEN 2 THEN ' ' || chr(160) || ' z'
               ELSE '  plain'
             END AS raw
      FROM customer WHERE c_custkey <= 600
    )
    SELECT key,
           trim(regexp_replace(regexp_replace(raw, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\xa0]+', ' ', 'g'), ' +', ' ', 'g')) AS cleaned
    FROM src ORDER BY key
    """,
    doc="Control + extended-ASCII scrubbing with space collapse (SURVEY C11).",
)
def c11_remove_ascii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.functions.cleaning import remove_ascii

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 600)
    raw = F.concat(
        F.col("c_name"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("\x07 x"))
        .when(F.col("c_custkey") % 4 == 1, F.lit("\x1f\x7fy"))
        .when(F.col("c_custkey") % 4 == 2, F.lit(" \xa0 z"))
        .otherwise(F.lit("  plain")),
    )
    return (
        cust.select(F.col("c_custkey").alias("key"), raw.alias("raw"))
        .select("key", remove_ascii(F.col("raw")).alias("cleaned"))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# C14 — venue-type inference with the ISBN/ISSN scheme-evidence override
# (reference core/creator.py:393-431) via the production expression.
# ---------------------------------------------------------------------------

_C14_TYPES = [
    "journal article",
    "book chapter",
    "book",
    "proceedings article",
    "proceedings",
    "reference entry",
    "report series",
    "journal volume",
    "dissertation",
]
_C14_TYPE_CASE = "CASE key % 9 " + " ".join(
    f"WHEN {i} THEN '{t}'" for i, t in enumerate(_C14_TYPES)
) + " END"


@register(
    "C14_venue_type_inference",
    f"""
    WITH src AS (
      SELECT p_partkey AS key, {_C14_TYPE_CASE} AS br_type,
             key_mod5 > 0 AS has_ext,
             key_mod5 IN (2, 4) AS has_isbn,
             key_mod5 IN (1, 4) AS has_issn
      FROM (SELECT p_partkey, p_partkey % 5 AS key_mod5 FROM part WHERE p_partkey <= 900)
    ),
    base AS (
      SELECT key, br_type, has_ext, has_isbn, has_issn,
        CASE
          WHEN br_type IN ('journal article','journal volume','journal issue') THEN 'journal'
          WHEN br_type IN ('book chapter','book part','book section','book track') THEN 'book'
          WHEN br_type IN ('book','edited book','monograph','reference book') THEN 'book series'
          WHEN br_type = 'proceedings article' THEN 'proceedings'
          WHEN br_type IN ('proceedings','report','standard','series') THEN 'series'
          WHEN br_type = 'reference entry' THEN 'reference book'
          WHEN br_type = 'report series' THEN 'report series'
          ELSE ''
        END AS b
      FROM src
    )
    SELECT key, br_type,
      CASE
        WHEN has_ext AND b IN ('journal','book series','series','report series')
          THEN CASE WHEN has_isbn OR NOT has_issn THEN '' ELSE b END
        WHEN has_ext AND b IN ('book','proceedings')
          THEN CASE WHEN has_issn OR NOT has_isbn THEN '' ELSE b END
        WHEN has_ext AND b = 'reference book'
          THEN CASE WHEN has_isbn AND NOT has_issn THEN 'reference book'
                    WHEN has_issn AND NOT has_isbn THEN 'journal'
                    ELSE '' END
        ELSE b
      END AS venue_type
    FROM base ORDER BY key
    """,
    doc="Work-type → venue-class mapping incl. ISBN/ISSN scheme-evidence override (SURVEY C14).",
)
def c14_venue_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.curation import _venue_type_expr

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 900)
    m5 = F.col("p_partkey") % 5
    schemas = (
        F.when(m5 == 0, F.array().cast("array<string>"))
        .when(m5 == 1, F.array(F.lit("issn")))
        .when(m5 == 2, F.array(F.lit("isbn")))
        .when(m5 == 3, F.array(F.lit("doi")))
        .otherwise(F.array(F.lit("issn"), F.lit("isbn")))
    )
    br_type = F.elt(F.col("p_partkey") % 9 + 1, *[F.lit(t) for t in _C14_TYPES])
    return (
        part.select(F.col("p_partkey").alias("key"), br_type.alias("br_type"), schemas.alias("s"))
        .select("key", "br_type", _venue_type_expr(F.col("br_type"), F.col("s")).alias("venue_type"))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# C15 — precision-typed date literals (reference core/creator.py:296-301)
# via the production export expression.
# ---------------------------------------------------------------------------


@register(
    "C15_date_typed_literal",
    """
    WITH src AS (
      SELECT p_partkey AS key,
             CASE p_partkey % 5
               WHEN 0 THEN '2024'
               WHEN 1 THEN '2024-03'
               WHEN 2 THEN '2024-03-09'
               WHEN 3 THEN ''
               ELSE '13 Jan 2022'
             END AS d
      FROM part WHERE p_partkey <= 500
    )
    SELECT key, d,
      CASE
        WHEN regexp_matches(d, '^\\d{4}-\\d{2}-\\d{2}$')
          THEN '"' || d || '"^^<http://www.w3.org/2001/XMLSchema#date>'
        WHEN regexp_matches(d, '^\\d{4}-\\d{2}$')
          THEN '"' || d || '"^^<http://www.w3.org/2001/XMLSchema#gYearMonth>'
        WHEN regexp_matches(d, '^\\d{4}$')
          THEN '"' || d || '"^^<http://www.w3.org/2001/XMLSchema#gYear>'
        ELSE ''
      END AS literal
    FROM src ORDER BY key
    """,
    doc="Partial date → xsd:date/gYearMonth/gYear literal by precision (SURVEY C15).",
)
def c15_date_typed_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.sources.export import date_typed_literal

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    d = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit("2024"))
        .when(F.col("p_partkey") % 5 == 1, F.lit("2024-03"))
        .when(F.col("p_partkey") % 5 == 2, F.lit("2024-03-09"))
        .when(F.col("p_partkey") % 5 == 3, F.lit(""))
        .otherwise(F.lit("13 Jan 2022"))
    )
    return (
        part.select(F.col("p_partkey").alias("key"), d.alias("d"))
        .select("key", "d", F.coalesce(date_typed_literal(F.col("d")), F.lit("")).alias("literal"))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# D6 — agent-list cleaning (reference clean_ra_list, lib/cleaner.py:320-370)
# through the PRODUCTION parse_agent_cell UDF: 'Not Available' dropping,
# cell-level shared-id stripping, same-name+id duplicate removal, in-entry
# id dedup, clean_name casing — summarized per cell as one canonical string.
# ---------------------------------------------------------------------------


@register(
    "D6_agent_list_cleaning",
    """
    WITH src AS (SELECT c_custkey AS key, CAST(c_custkey % 90 AS VARCHAR) AS n
                 FROM customer WHERE c_custkey <= 600)
    SELECT key,
      CASE key % 6
        WHEN 0 THEN 'Alpha, One [] ; Beta, Two []'          -- shared id stripped from both
        WHEN 1 THEN 'Gamma, Three [viaf:B' || n || ']'      -- later name+id duplicate dropped
        WHEN 2 THEN 'Delta & Sons []'                       -- 'Not Available' dropped, org kept
        WHEN 3 THEN 'Epsilon,  [viaf:C' || n || ']'         -- family-only name keeps trailing comma
        WHEN 4 THEN 'Zeta, Four [viaf:D' || n || ']'        -- in-entry duplicate id deduped
        ELSE 'Eta, Five []'                                 -- clean_name title-casing
      END AS agents
    FROM src ORDER BY key
    """,
    doc="Cell-level agent cleaning: shared-id strip, dup drop, casing — via the production parse UDF (SURVEY D6).",
)
def d6_agent_list_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.functions.parsing import parse_agent_cell_udf

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 600)
    n = (F.col("c_custkey") % 90).cast("string")
    cell = (
        F.when(
            F.col("c_custkey") % 6 == 0,
            F.concat(F.lit("Alpha, One [viaf:A"), n, F.lit("]; Beta, Two [viaf:A"), n, F.lit("]")),
        )
        .when(
            F.col("c_custkey") % 6 == 1,
            F.concat(
                F.lit("Gamma, Three [viaf:B"), n, F.lit("]; Gamma, Three [viaf:B"), n, F.lit("]")
            ),
        )
        .when(F.col("c_custkey") % 6 == 2, F.lit("Not Available; Delta & Sons"))
        .when(F.col("c_custkey") % 6 == 3, F.concat(F.lit("Epsilon, [viaf:C"), n, F.lit("]")))
        .when(
            F.col("c_custkey") % 6 == 4,
            F.concat(F.lit("Zeta, Four [viaf:D"), n, F.lit(" viaf:D"), n, F.lit("]")),
        )
        .otherwise(F.lit("eta, five"))
    )
    parsed = cust.select(F.col("c_custkey").alias("key"), parse_agent_cell_udf(cell).alias("a"))
    entry = lambda a: F.concat(
        F.coalesce(
            a["org_name"],
            F.concat(a["family"], F.lit(", "), F.coalesce(a["given"], F.lit(""))),
        ),
        F.lit(" ["),
        F.array_join(F.transform(a["ids"], lambda t: F.concat_ws(":", t["schema"], t["value"])), " "),
        F.lit("]"),
    )
    return parsed.select(
        "key", F.array_join(F.transform(F.col("a"), entry), " ; ").alias("agents")
    ).orderBy("key")


# ---------------------------------------------------------------------------
# VD1 — literal-datatype audit/repair (reference
# run/patches/fix_literal_datatypes.py: scan stored literals, classify the
# datatype their VALUE actually warrants, flag and repair mismatches).
# Here over pub_date strings: the precision shape dictates
# xsd:date / gYearMonth / gYear; anything else is invalid and repairs to
# the longest valid prefix (the clean_date degradation ladder).
# ---------------------------------------------------------------------------


@register(
    "VD1_literal_datatype_audit",
    """
    WITH src AS (
      SELECT p_partkey AS key,
             CASE p_partkey % 7
               WHEN 0 THEN '2024'
               WHEN 1 THEN '2024-03'
               WHEN 2 THEN '2024-03-09'
               WHEN 3 THEN '2024-13'
               WHEN 4 THEN '2024-02-30'
               WHEN 5 THEN 'garbage'
               ELSE '2024-3'
             END AS d
      FROM part WHERE p_partkey <= 700
    ),
    cls AS (
      SELECT key, d,
        CASE
          WHEN regexp_matches(d, '^\\d{4}-\\d{2}-\\d{2}$')
               AND TRY_CAST(substr(d, 6, 2) AS INT) BETWEEN 1 AND 12
               AND TRY_CAST(d AS DATE) IS NOT NULL THEN 'date'
          WHEN regexp_matches(d, '^\\d{4}-\\d{2}$')
               AND TRY_CAST(substr(d, 6, 2) AS INT) BETWEEN 1 AND 12 THEN 'gYearMonth'
          WHEN regexp_matches(d, '^\\d{4}$') THEN 'gYear'
          ELSE 'invalid'
        END AS datatype
      FROM src
    )
    SELECT key, d, datatype,
      CASE datatype
        WHEN 'invalid' THEN
          CASE
            WHEN regexp_matches(d, '^\\d{4}-\\d{2}-\\d{2}$')
                 AND TRY_CAST(substr(d, 6, 2) AS INT) BETWEEN 1 AND 12 THEN substr(d, 1, 7)
            WHEN regexp_matches(d, '^\\d{4}')
                 AND NOT regexp_matches(d, '^\\d{5}') THEN substr(d, 1, 4)
            ELSE ''
          END
        ELSE d
      END AS repaired
    FROM cls ORDER BY key
    """,
    doc="Literal-datatype audit + precision-ladder repair over stored date strings (patch-family analog of fix_literal_datatypes).",
)
def vd1_literal_datatype_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 700)
    d = (
        F.when(F.col("p_partkey") % 7 == 0, F.lit("2024"))
        .when(F.col("p_partkey") % 7 == 1, F.lit("2024-03"))
        .when(F.col("p_partkey") % 7 == 2, F.lit("2024-03-09"))
        .when(F.col("p_partkey") % 7 == 3, F.lit("2024-13"))
        .when(F.col("p_partkey") % 7 == 4, F.lit("2024-02-30"))
        .when(F.col("p_partkey") % 7 == 5, F.lit("garbage"))
        .otherwise(F.lit("2024-3"))
    )
    src = part.select(F.col("p_partkey").alias("key"), d.alias("d"))
    month_ok = F.substring("d", 6, 2).try_cast("int").between(1, 12)
    datatype = (
        F.when(
            F.col("d").rlike(r"^\d{4}-\d{2}-\d{2}$")
            & month_ok
            & F.expr("try_to_date(d, 'yyyy-MM-dd')").isNotNull(),
            "date",
        )
        .when(F.col("d").rlike(r"^\d{4}-\d{2}$") & month_ok, "gYearMonth")
        .when(F.col("d").rlike(r"^\d{4}$"), "gYear")
        .otherwise("invalid")
    )
    src = src.withColumn("datatype", datatype)
    repaired = F.when(
        F.col("datatype") == "invalid",
        F.when(
            F.col("d").rlike(r"^\d{4}-\d{2}-\d{2}$") & month_ok, F.substring("d", 1, 7)
        )
        .when(
            F.col("d").rlike(r"^\d{4}") & ~F.col("d").rlike(r"^\d{5}"), F.substring("d", 1, 4)
        )
        .otherwise(""),
    ).otherwise(F.col("d"))
    return src.select("key", "d", "datatype", repaired.alias("repaired")).orderBy("key")


# ---------------------------------------------------------------------------
# C9 — the volume/issue repair machine (reference pattern table
# lib/master_of_regex.py:77-157 + strategy driver lib/cleaner.py:418-494),
# run through the PRODUCTION repair_vi_full_udf.  The oracle pins the
# machine's documented outcome per input vector — one vector per strategy
# family: vol_iss split, iss_vol_year / vol_iss_year (year → date), del,
# all, do_nothing, 's)', and the cross-column VALID switch with journal
# volume ↔ journal issue retyping in both directions.
# ---------------------------------------------------------------------------

_C9_VECTORS = [
    # (volume_in, issue_in, type_in) -> (volume_out, issue_out, type_out, date_out)
    ("Vol. 5, no. 3", "", "journal article", "5", "3", "journal article", ""),
    ("n/a", "", "journal article", "", "", "journal article", ""),
    ("14", "7", "journal article", "14", "7", "journal article", ""),
    ("Issue 2 Vol. 7 2019", "", "journal article", "7", "2", "journal article", "2019"),
    ("42 (3''2018)", "", "journal article", "42", "3", "journal article", "2018"),
    ("/ 9", "", "journal article", "9", "", "journal article", ""),
    ("->3", "", "journal article", "->3", "", "journal article", ""),
    ("5.", "", "journal article", "5.", "", "journal article", ""),
    ("7()", "", "journal article", "7", "", "journal article", ""),
    ("2 (first serie", "", "journal volume", "2 (first series)", "", "journal volume", ""),
    ("special issue 4", "", "journal volume", "", "special issue 4", "journal issue", ""),
    ("", "tome 12", "journal issue", "tome 12", "", "journal volume", ""),
    ("&na;", ":", "journal article", "", "", "journal article", ""),
    ("", "not available", "journal article", "", "", "journal article", ""),
    ("Vol.- 18", "no. 6", "journal article", "Vol.- 18", "no. 6", "journal article", ""),
    ("", "summer 2004", "journal article", "", "summer 2004", "journal article", ""),
]

def _c9_case(col: int) -> str:
    return (
        "CASE key % 16 "
        + " ".join(f"WHEN {i} THEN '{v[col]}'" for i, v in enumerate(_C9_VECTORS))
        + " END"
    )


@register(
    "C9_volume_issue_repair",
    f"""
    WITH src AS (
      SELECT p_partkey AS key FROM part WHERE p_partkey <= 800
    )
    SELECT key,
           {_c9_case(0)} AS volume_in,
           {_c9_case(1)} AS issue_in,
           {_c9_case(2)} AS type_in,
           {_c9_case(3)} AS volume_out,
           {_c9_case(4)} AS issue_out,
           {_c9_case(5)} AS type_out,
           {_c9_case(6)} AS date_out
    FROM src ORDER BY key
    """,
    doc="Volume/issue repair machine: full pattern table + strategies through the production Arrow UDF (SURVEY C9).",
)
def c9_volume_issue_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.functions.volume_issue import repair_vi_full_udf

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 800)
    idx = (F.col("p_partkey") % 16 + 1).cast("int")
    # SQL-escaped '' in the vector table is a literal ' here
    vol_in = F.elt(idx, *[F.lit(v[0].replace("''", "'")) for v in _C9_VECTORS])
    iss_in = F.elt(idx, *[F.lit(v[1]) for v in _C9_VECTORS])
    typ_in = F.elt(idx, *[F.lit(v[2]) for v in _C9_VECTORS])
    out = repair_vi_full_udf(vol_in, iss_in, typ_in)
    return (
        part.select(
            F.col("p_partkey").alias("key"),
            vol_in.alias("volume_in"),
            iss_in.alias("issue_in"),
            typ_in.alias("type_in"),
            out["volume"].alias("volume_out"),
            out["issue"].alias("issue_out"),
            out["type"].alias("type_out"),
            out["date"].alias("date_out"),
        )
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# OX1 — ORCID summary-XML extraction (S14; reference
# run/orcid_process.py:77-103).  Synthesizes summary XML documents from
# the customer table — with records missing the orcid path (dropped),
# records without self-asserted DOIs (dropped), a missing family name
# (empty string survives), and a second UPPERCASE DOI on every third
# record (multi-DOI explode + lowercasing) — and feeds the PRODUCTION
# regexp extractor; the oracle re-derives the expected (orcid, given,
# family, doi) rows from the same residues without ever building XML.
# ---------------------------------------------------------------------------
@register(
    "OX1_orcid_xml_extraction",
    """
    WITH ks AS (
      SELECT c_custkey AS k FROM customer
      WHERE c_custkey < 500 AND c_custkey % 13 <> 0 AND c_custkey % 11 <> 0
    ),
    base AS (
      SELECT '0000-0001-' || lpad(CAST(k AS VARCHAR), 4, '0') || '-0003' AS orcid,
             'G' || CAST(k AS VARCHAR) AS given,
             CASE WHEN k % 7 = 0 THEN '' ELSE 'F' || CAST(k AS VARCHAR) END AS family,
             k
      FROM ks
    )
    SELECT orcid, given, family, doi FROM (
      SELECT orcid, given, family, '10.5/x' || CAST(k AS VARCHAR) AS doi FROM base
      UNION ALL
      SELECT orcid, given, family, '10.5/y' || CAST(k AS VARCHAR) AS doi
      FROM base WHERE k % 3 = 0
    ) ORDER BY orcid, doi
    """,
    doc="ORCID summary-XML scan: regexp extraction of id/names/DOIs with multi-DOI explode (SURVEY S14).",
)
def ox1_orcid_xml_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.sources.orcid_xml import parse_orcid_summaries

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500).select(
        F.col("c_custkey").alias("k")
    )
    kstr = F.col("k").cast("string")
    orcid_tag = F.when(
        F.col("k") % 13 != 0,
        F.concat(
            F.lit("<common:path>0000-0001-"), F.lpad(kstr, 4, "0"), F.lit("-0003</common:path>\n")
        ),
    ).otherwise(F.lit(""))
    family_tag = F.when(
        F.col("k") % 7 != 0,
        F.concat(
            F.lit("<personal-details:family-name>F"), kstr,
            F.lit("</personal-details:family-name>\n"),
        ),
    ).otherwise(F.lit(""))
    doi_tags = F.when(
        F.col("k") % 11 != 0,
        F.concat(
            F.lit("<common:external-id-type>doi</common:external-id-type>\n"
                  "<common:external-id-value> 10.5/x"), kstr, F.lit(" </common:external-id-value>\n"),
            F.when(
                F.col("k") % 3 == 0,
                F.concat(
                    F.lit("<common:external-id-type>doi</common:external-id-type>\n"
                          "<common:external-id-value>10.5/Y"), kstr,
                    F.lit("</common:external-id-value>\n"),
                ),
            ).otherwise(F.lit("")),
        ),
    ).otherwise(F.lit(""))
    xml = ks.select(
        F.concat(
            F.lit("<record:record>\n"),
            orcid_tag,
            F.lit("<personal-details:given-names>G"), kstr,
            F.lit("</personal-details:given-names>\n"),
            family_tag,
            doi_tags,
            F.lit("</record:record>"),
        ).alias("xml")
    )
    return parse_orcid_summaries(xml).orderBy("orcid", "doi")


# ---------------------------------------------------------------------------
# AP1 — external-API enrichment (S15; reference
# lib/bibliographic_matching.py:50-83 / run/patches/has_next.py:314-465).
# The transport is INJECTED (no network in this environment — container
# policy, same as the multimodal codec stub), so the gate injects a
# deterministic fake that is a pure arithmetic function of the looked-up
# id and drives the REAL machinery: distinct-id dedup (97 distinct ids
# serve ~2000 rows — one "call" each), mapInPandas batch fetch, not-found
# rows (every 7th id), and the metadata equi-join back onto fact rows.
# The oracle re-derives the joined result from the same arithmetic.
# ---------------------------------------------------------------------------
@register(
    "AP1_api_enrichment_join",
    """
    SELECT o_orderkey AS orderkey,
           'doi:10.9/' || CAST(o_orderkey % 97 AS VARCHAR) AS id,
           CASE WHEN (o_orderkey % 97) % 7 <> 0
                THEN 'T' || CAST(o_orderkey % 97 AS VARCHAR) END AS title,
           CASE WHEN (o_orderkey % 97) % 7 <> 0
                THEN CAST(1900 + o_orderkey % 97 AS VARCHAR) END AS year,
           CASE WHEN (o_orderkey % 97) % 7 <> 0
                THEN 'V' || CAST((o_orderkey % 97) % 5 AS VARCHAR) END AS venue,
           (o_orderkey % 97) % 7 <> 0 AS found
    FROM orders WHERE o_orderkey < 2000
    ORDER BY orderkey
    """,
    doc="Distinct-id API fetch (injected deterministic transport) + metadata join-back (SURVEY S15).",
)
def ap1_api_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.sources.api_lookup import enrich_from_api

    def fake_fetch(ids):
        out = []
        for s in ids:
            k = int(s.rsplit("/", 1)[1])
            if k % 7 == 0:
                out.append(None)
            else:
                out.append({"title": f"T{k}", "year": str(1900 + k), "venue": f"V{k % 5}"})
        return out

    rows = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000).select(
        F.col("o_orderkey").alias("orderkey"),
        F.concat(F.lit("doi:10.9/"), (F.col("o_orderkey") % 97).cast("string")).alias("id"),
    )
    enriched = enrich_from_api(rows, fetch=fake_fetch, batch_size=16)
    return enriched.select("orderkey", "id", "title", "year", "venue", "found").orderBy("orderkey")


# ---------------------------------------------------------------------------
# Z1 — zipped JSON-LD dump round trip (S4/S9; reference archived-dump
# layout, one <kind>/<dir_split>.zip per split with <file_n>.json members
# of one JSON-LD document per line).  Synthesizes a catalog from the
# customer table (br + ra entities with id links at fixed residues),
# drives the REAL writer (applyInPandas zip-per-split) into a temp dir
# and the REAL reader (binaryFile scan + mapInPandas member unpack) back
# out, and projects per-kind document counts plus id-link closure — all
# re-derivable by the oracle from the same residues.
# ---------------------------------------------------------------------------
@register(
    "Z1_zip_jsonld_round_trip",
    """
    WITH ks AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 300),
    s AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE k % 3 = 0) AS nra,
             COUNT(*) FILTER (WHERE k % 5 = 0) AS nid
      FROM ks
    )
    SELECT metric, CAST(n AS BIGINT) AS n FROM (
      SELECT 'docs_br' AS metric, n FROM s
      UNION ALL SELECT 'docs_ra', nra FROM s
      UNION ALL SELECT 'docs_with_id_links', nid FROM s
      UNION ALL SELECT 'parse_failures', 0 FROM s
    ) ORDER BY metric
    """,
    doc="Zip JSON-LD write → binaryFile+mapInPandas read-back: per-kind doc counts and id-link closure (SURVEY S4/S9).",
)
def z1_zip_jsonld_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from oc_meta_spark.plans.curation import EntityCatalog
    from oc_meta_spark.schemas import ENTITY_TABLES
    from oc_meta_spark.sources.zip_jsonld import read_zip_jsonld, write_zip_jsonld

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300).select(
        F.col("c_custkey").alias("k")
    )
    kstr = F.col("k").cast("string")
    br = ks.select(
        F.concat(F.lit("br/"), kstr).alias("omid"),
        F.lit("journal article").alias("type"),
        F.concat(F.lit("Z"), kstr).alias("title"),
        F.lit("2024").alias("pub_date"),
        F.lit(None).cast("string").alias("seq_id"),
        F.lit(None).cast("string").alias("part_of"),
        F.lit(None).cast("string").alias("embodiment"),
    )
    ra = ks.filter(F.col("k") % 3 == 0).select(
        F.concat(F.lit("ra/"), kstr).alias("omid"),
        F.concat(F.lit("Org"), kstr).alias("name"),
        F.lit(None).cast("string").alias("family"),
        F.lit(None).cast("string").alias("given"),
    )
    id_tbl = ks.filter(F.col("k") % 5 == 0).select(
        F.concat(F.lit("id/"), kstr).alias("omid"),
        F.lit("doi").alias("schema"),
        F.concat(F.lit("10.7/z"), kstr).alias("value"),
    )
    entity_id = ks.filter(F.col("k") % 5 == 0).select(
        F.concat(F.lit("br/"), kstr).alias("entity_omid"),
        F.concat(F.lit("id/"), kstr).alias("id_omid"),
    )
    empty = lambda t: spark.createDataFrame([], ENTITY_TABLES[t])  # noqa: E731
    cat = EntityCatalog(
        br=br, ra=ra, id=id_tbl, entity_id=entity_id,
        ar=empty("ar"), re=empty("re"), prov=empty("prov"),
    )
    tmp = tempfile.mkdtemp(prefix="z1_zip_")
    try:
        write_zip_jsonld(cat, tmp)
        docs = read_zip_jsonld(spark, tmp).select("jsonld")
        parsed = docs.select(
            F.get_json_object("jsonld", "$['@id']").alias("at_id"),
            F.get_json_object("jsonld", "$['datacite:hasIdentifier']").alias("links"),
        )
        base = (
            parsed.agg(
                F.count(F.when(F.col("at_id").contains("/br/"), 1)).alias("docs_br"),
                F.count(F.when(F.col("at_id").contains("/ra/"), 1)).alias("docs_ra"),
                F.count(
                    F.when(F.col("at_id").contains("/br/") & F.col("links").isNotNull(), 1)
                ).alias("docs_with_id_links"),
                F.count(F.when(F.col("at_id").isNull(), 1)).alias("parse_failures"),
            )
        )
        out = base.selectExpr(
            "stack(4, 'docs_br', docs_br, 'docs_ra', docs_ra, "
            "'docs_with_id_links', docs_with_id_links, "
            "'parse_failures', parse_failures) AS (metric, n)"
        ).select("metric", F.col("n").cast("long").alias("n")).orderBy("metric")
        # materialize before the temp dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# CS1 — curated-CSV sink/scan round trip (S1/S2/S3/S5).  Synthesizes a
# metadata batch from the customer table with HOSTILE cell content —
# embedded double quotes, commas, a literal newline (multiline quoted
# field), and a no-break space the scan projection must normalize — and
# drives the REAL chunked quoteAll writer (rows_per_file=100 forces many
# part files) into TWO nested subdirectories, then the REAL recursive
# multiline reader back out.  The oracle recomputes the post-sanitize
# rows directly (chr(34)/chr(10)/chr(160) arithmetic shared by both
# engines: the nbsp must come back as a plain space).
# ---------------------------------------------------------------------------
@register(
    "CS1_csv_sink_round_trip",
    """
    SELECT 'doi:10.8/c' || CAST(c_custkey AS VARCHAR) AS id,
           'A ' || chr(34) || 'q' || CAST(c_custkey AS VARCHAR) || chr(34)
             || ', b' || chr(10) || 'c' AS title,
           'Fam' || CAST(c_custkey AS VARCHAR) || ' Given' AS author,
           '2024-0' || CAST(c_custkey % 9 + 1 AS VARCHAR) AS pub_date,
           'V ' || CAST(c_custkey % 11 AS VARCHAR) AS venue,
           CAST(c_custkey % 5 + 1 AS VARCHAR) AS volume,
           CAST(c_custkey % 4 + 1 AS VARCHAR) AS issue,
           CAST(c_custkey AS VARCHAR) || '-' || CAST(c_custkey + 8 AS VARCHAR) AS page,
           'journal article' AS type,
           'Pub' || CAST(c_custkey AS VARCHAR) AS publisher,
           'Ed' || CAST(c_custkey AS VARCHAR) AS editor
    FROM customer WHERE c_custkey < 500
    ORDER BY id
    """,
    doc="Chunked quoteAll CSV write → recursive multiline sanitized read: hostile quotes/commas/newlines/nbsp (SURVEY S1-S3/S5).",
)
def cs1_csv_sink_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from oc_meta_spark.sources.csv_input import read_metadata_csv
    from oc_meta_spark.sources.export import write_curated_csv

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500).select(
        F.col("c_custkey").alias("k")
    )
    kstr = F.col("k").cast("string")
    batch = ks.select(
        F.concat(F.lit("doi:10.8/c"), kstr).alias("id"),
        # the author cell carries a literal no-break space (U+00A0);
        # the reader's scan projection must hand back a plain space —
        # the oracle writes the POST-sanitize form
        F.concat(
            F.lit('A "q'), kstr, F.lit('", b\nc')
        ).alias("title"),
        F.concat(F.lit("Fam"), kstr, F.lit(" Given")).alias("author"),
        F.concat(F.lit("2024-0"), (F.col("k") % 9 + 1).cast("string")).alias("pub_date"),
        F.concat(F.lit("V "), (F.col("k") % 11).cast("string")).alias("venue"),
        (F.col("k") % 5 + 1).cast("string").alias("volume"),
        (F.col("k") % 4 + 1).cast("string").alias("issue"),
        F.concat(kstr, F.lit("-"), (F.col("k") + 8).cast("string")).alias("page"),
        F.lit("journal article").alias("type"),
        F.concat(F.lit("Pub"), kstr).alias("publisher"),
        F.concat(F.lit("Ed"), kstr).alias("editor"),
    )
    tmp = tempfile.mkdtemp(prefix="cs1_csv_")
    try:
        write_curated_csv(batch.filter(F.col("id").rlike(r"[02468]$")), f"{tmp}/even", rows_per_file=100)
        write_curated_csv(batch.filter(F.col("id").rlike(r"[13579]$")), f"{tmp}/odd", rows_per_file=100)
        out = read_metadata_csv(spark, tmp).orderBy("id")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# NQ1 — N-Quads sink round trip (S10).  Synthesizes a catalog from the
# customer table (the Z1 synthesis), streams it through the REAL
# format_string quad builder and text sink, reads the files back, and
# checks (a) per-kind distinct-subject counts against the residues and
# (b) the read-back line multiset is exactly the built one (fixpoint:
# zero missing, zero extra — a lossy text sink or a mangled escape
# breaks it).
# ---------------------------------------------------------------------------
@register(
    "NQ1_nquads_round_trip",
    """
    WITH ks AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 300),
    s AS (
      SELECT COUNT(*) AS n, COUNT(*) FILTER (WHERE k % 3 = 0) AS nra FROM ks
    )
    SELECT metric, CAST(n AS BIGINT) AS n FROM (
      SELECT 'subjects_br' AS metric, n FROM s
      UNION ALL SELECT 'subjects_ra', nra FROM s
      UNION ALL SELECT 'roundtrip_missing', 0 FROM s
      UNION ALL SELECT 'roundtrip_extra', 0 FROM s
    ) ORDER BY metric
    """,
    doc="N-Quads text sink round trip: per-kind subject counts + line-multiset fixpoint (SURVEY S10).",
)
def nq1_nquads_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from oc_meta_spark.plans.curation import EntityCatalog
    from oc_meta_spark.schemas import ENTITY_TABLES
    from oc_meta_spark.sources.export import nquads_rows, write_nquads

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300).select(
        F.col("c_custkey").alias("k")
    )
    kstr = F.col("k").cast("string")
    br = ks.select(
        F.concat(F.lit("br/"), kstr).alias("omid"),
        F.lit("journal article").alias("type"),
        # quote + newline in the title exercises _nq_escape through the trip
        F.concat(F.lit('Q"t\\n'), kstr).alias("title"),
        F.lit("2024").alias("pub_date"),
        F.lit(None).cast("string").alias("seq_id"),
        F.lit(None).cast("string").alias("part_of"),
        F.lit(None).cast("string").alias("embodiment"),
    )
    ra = ks.filter(F.col("k") % 3 == 0).select(
        F.concat(F.lit("ra/"), kstr).alias("omid"),
        F.concat(F.lit("Org"), kstr).alias("name"),
        F.lit(None).cast("string").alias("family"),
        F.lit(None).cast("string").alias("given"),
    )
    empty = lambda t: spark.createDataFrame([], ENTITY_TABLES[t])  # noqa: E731
    cat = EntityCatalog(
        br=br, ra=ra, id=empty("id"), entity_id=empty("entity_id"),
        ar=empty("ar"), re=empty("re"), prov=empty("prov"),
    )
    built = nquads_rows(cat).withColumnRenamed("line", "value")
    tmp = tempfile.mkdtemp(prefix="nq1_quads_")
    try:
        write_nquads(cat, tmp)
        back = spark.read.text(tmp)
        subj = back.select(
            F.regexp_extract("value", r"^<https://w3id\.org/oc/meta/([a-z]+)/([^>]*)>", 1).alias("kind"),
            F.regexp_extract("value", r"^<([^>]*)>", 1).alias("subject"),
        )
        # True MULTISET comparison: a sink that drops or duplicates one of
        # two identical quad lines must flag, which set-based anti-joins
        # would miss — so compare per-line counts via a full-outer join of
        # the two groupBy(value).count() frames.
        n_built = F.coalesce(F.col("n_built"), F.lit(0))
        n_back = F.coalesce(F.col("n_back"), F.lit(0))
        multiset = (
            built.groupBy("value").agg(F.count(F.lit(1)).alias("n_built"))
            .join(
                back.groupBy("value").agg(F.count(F.lit(1)).alias("n_back")),
                "value",
                "full_outer",
            )
            .agg(
                F.coalesce(F.sum(F.greatest(n_built - n_back, F.lit(0))), F.lit(0))
                .alias("roundtrip_missing"),
                F.coalesce(F.sum(F.greatest(n_back - n_built, F.lit(0))), F.lit(0))
                .alias("roundtrip_extra"),
            )
        )
        base = (
            subj.agg(
                F.countDistinct(F.when(F.col("kind") == "br", F.col("subject"))).alias("subjects_br"),
                F.countDistinct(F.when(F.col("kind") == "ra", F.col("subject"))).alias("subjects_ra"),
            )
            .crossJoin(multiset)
        )
        out = base.selectExpr(
            "stack(4, 'subjects_br', subjects_br, 'subjects_ra', subjects_ra, "
            "'roundtrip_missing', roundtrip_missing, 'roundtrip_extra', roundtrip_extra) "
            "AS (metric, n)"
        ).select("metric", F.col("n").cast("long").alias("n")).orderBy("metric")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# JL1 — partitioned JSON-LD layout sink (S9; the reference's
# {kind}/{dir_split}/{file_n} archived-dump fan-out computed as partition
# columns).  Synthesizes a catalog (the Z1 shapes), drives the REAL
# write_jsonld partitioned sink into a temp dir, reads the layout back
# with a plain spark.read.json over the partition tree, and checks that
# (a) every entity doc survives per kind and (b) the partition columns
# reconstruct: one (kind, dir_split) directory per 10k omid window, every
# doc's @id consistent with the kind directory it landed in.
# ---------------------------------------------------------------------------
@register(
    "JL1_jsonld_layout_sink",
    """
    WITH ks AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 300),
    s AS (
      SELECT COUNT(*) AS n, COUNT(*) FILTER (WHERE k % 3 = 0) AS nra FROM ks
    )
    SELECT metric, CAST(n AS BIGINT) AS n FROM (
      SELECT 'docs_br' AS metric, n FROM s
      UNION ALL SELECT 'docs_ra', nra FROM s
      UNION ALL SELECT 'kind_dir_mismatches', 0 FROM s
      UNION ALL SELECT 'kind_partitions', 2 FROM s
    ) ORDER BY metric
    """,
    doc="Partitioned JSON-LD layout write → read-back: per-kind doc counts and kind/dir consistency (SURVEY S9).",
)
def jl1_jsonld_layout_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from oc_meta_spark.plans.curation import EntityCatalog
    from oc_meta_spark.schemas import ENTITY_TABLES
    from oc_meta_spark.sources.export import write_jsonld

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300).select(
        F.col("c_custkey").alias("k")
    )
    kstr = F.col("k").cast("string")
    br = ks.select(
        F.concat(F.lit("br/"), kstr).alias("omid"),
        F.lit("journal article").alias("type"),
        F.concat(F.lit("L"), kstr).alias("title"),
        F.lit("2024").alias("pub_date"),
        F.lit(None).cast("string").alias("seq_id"),
        F.lit(None).cast("string").alias("part_of"),
        F.lit(None).cast("string").alias("embodiment"),
    )
    ra = ks.filter(F.col("k") % 3 == 0).select(
        F.concat(F.lit("ra/"), kstr).alias("omid"),
        F.concat(F.lit("Org"), kstr).alias("name"),
        F.lit(None).cast("string").alias("family"),
        F.lit(None).cast("string").alias("given"),
    )
    empty = lambda t: spark.createDataFrame([], ENTITY_TABLES[t])  # noqa: E731
    cat = EntityCatalog(
        br=br, ra=ra, id=empty("id"), entity_id=empty("entity_id"),
        ar=empty("ar"), re=empty("re"), prov=empty("prov"),
    )
    tmp = tempfile.mkdtemp(prefix="jl1_layout_")
    try:
        write_jsonld(cat, tmp)
        back = spark.read.option("recursiveFileLookup", False).json(tmp)
        # partition columns (kind, dir_split, file_n) come back from the
        # directory names; jsonld is the payload column
        doc_kind = F.regexp_extract(
            F.get_json_object("jsonld", "$['@id']"), r"/oc/meta/([a-z]+)/", 1
        )
        base = back.agg(
            F.count(F.when(F.col("kind") == "br", 1)).alias("docs_br"),
            F.count(F.when(F.col("kind") == "ra", 1)).alias("docs_ra"),
            F.count(F.when(doc_kind != F.col("kind"), 1)).alias("kind_dir_mismatches"),
            F.countDistinct("kind").alias("kind_partitions"),
        )
        out = base.selectExpr(
            "stack(4, 'docs_br', docs_br, 'docs_ra', docs_ra, "
            "'kind_dir_mismatches', kind_dir_mismatches, "
            "'kind_partitions', kind_partitions) AS (metric, n)"
        ).select("metric", F.col("n").cast("long").alias("n")).orderBy("metric")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# FO1 — FOREIGN OCDM import (S11's other dialect; reference
# run/meta/generate_csv.py:299-476).  Synthesizes a foreign JSON-LD
# export from the customer table — full predicate URIs, "@graph"
# batching, typed-literal lists, oco:hasNext agent chains WITHOUT
# explicit positions (the walk must reconstruct author order), and a
# 2-hop venue hierarchy (article → JournalVolume → Journal) on every
# 4th record — and drives the REAL parse_jsonld + dump_csv; the oracle
# re-derives every dumped article row from the residues.  Author ORDER
# in the output is the hasNext chain order, so a broken chain walk
# flags as a value mismatch, not just a count.
# ---------------------------------------------------------------------------
@register(
    "FO1_foreign_ocdm_import",
    """
    SELECT 'omid:br/' || k || ' doi:10.3/f' || k AS id,
           'T' || k AS title,
           'A' || k || ', G [omid:ra/' || k || 'a]; B' || k || ', H [omid:ra/' || k || 'b]' AS author,
           '' AS issue,
           CASE WHEN c_custkey % 4 = 0 THEN '3' ELSE '' END AS volume,
           CASE WHEN c_custkey % 4 = 0 THEN 'J' || k || ' [omid:br/j' || k || ']' ELSE '' END AS venue,
           '' AS page,
           '2024' AS pub_date,
           'journal article' AS type,
           '' AS publisher,
           '' AS editor
    FROM (SELECT CAST(c_custkey AS VARCHAR) AS k, c_custkey FROM customer WHERE c_custkey < 200)
    ORDER BY id
    """,
    doc="Foreign-dialect OCDM JSON-LD import: @graph batching, URI predicates, hasNext chain walk, 2-hop venue hierarchy (SURVEY S11).",
)
def fo1_foreign_ocdm_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.generate_csv import dump_csv, parse_jsonld

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("kn"), F.col("c_custkey").cast("string").alias("k")
    )
    M = "https://w3id.org/oc/meta/"
    br_part_of = F.when(
        F.col("kn") % 4 == 0,
        F.concat(F.lit(f',"http://purl.org/vocab/frbr/core#partOf":[{{"@id":"{M}br/v'), F.col("k"), F.lit('"}]')),
    ).otherwise(F.lit(""))
    hierarchy = F.when(
        F.col("kn") % 4 == 0,
        F.concat(
            F.lit(f',{{"@id":"{M}br/v'), F.col("k"),
            F.lit('","@type":["http://purl.org/spar/fabio/JournalVolume"],'
                  '"http://purl.org/spar/fabio/hasSequenceIdentifier":[{"@value":"3"}],'),
            F.lit(f'"http://purl.org/vocab/frbr/core#partOf":[{{"@id":"{M}br/j'), F.col("k"),
            F.lit(f'"}}]}},{{"@id":"{M}br/j'), F.col("k"),
            F.lit('","@type":["http://purl.org/spar/fabio/Journal"],'
                  '"http://purl.org/dc/terms/title":[{"@value":"J'), F.col("k"), F.lit('"}]}'),
        ),
    ).otherwise(F.lit(""))
    doc = F.concat(
        F.lit('{"@graph":['),
        # article: Expression must be skipped in type resolution
        F.lit(f'{{"@id":"{M}br/'), F.col("k"),
        F.lit('","@type":["http://purl.org/spar/fabio/Expression","http://purl.org/spar/fabio/JournalArticle"],'
              '"http://purl.org/dc/terms/title":[{"@value":"T'), F.col("k"), F.lit('"}],'
              '"http://prismstandard.org/namespaces/basic/2.0/publicationDate":[{"@value":"2024"}],'),
        F.lit(f'"http://purl.org/spar/datacite/hasIdentifier":[{{"@id":"{M}id/'), F.col("k"), F.lit('"}],'),
        F.lit(f'"http://purl.org/spar/pro/isDocumentContextFor":[{{"@id":"{M}ar/'), F.col("k"),
        F.lit(f'a"}},{{"@id":"{M}ar/'), F.col("k"), F.lit('b"}]'),
        br_part_of,
        F.lit("},"),
        # identifier
        F.lit(f'{{"@id":"{M}id/'), F.col("k"),
        F.lit('","http://purl.org/spar/datacite/usesIdentifierScheme":[{"@id":"http://purl.org/spar/datacite/doi"}],'
              '"http://www.essepuntato.it/2010/06/literalreification/hasLiteralValue":[{"@value":"10.3/f'),
        F.col("k"), F.lit('"}]},'),
        # AR chain a → b, NO explicit positions (the walk must order them)
        F.lit(f'{{"@id":"{M}ar/'), F.col("k"),
        F.lit('a","http://purl.org/spar/pro/withRole":[{"@id":"http://purl.org/spar/pro/author"}],'),
        F.lit(f'"http://purl.org/spar/pro/isHeldBy":[{{"@id":"{M}ra/'), F.col("k"), F.lit('a"}],'),
        F.lit(f'"https://w3id.org/oc/ontology/hasNext":[{{"@id":"{M}ar/'), F.col("k"), F.lit('b"}]},'),
        F.lit(f'{{"@id":"{M}ar/'), F.col("k"),
        F.lit('b","http://purl.org/spar/pro/withRole":[{"@id":"http://purl.org/spar/pro/author"}],'),
        F.lit(f'"http://purl.org/spar/pro/isHeldBy":[{{"@id":"{M}ra/'), F.col("k"), F.lit('b"}]},'),
        # agents
        F.lit(f'{{"@id":"{M}ra/'), F.col("k"),
        F.lit('a","http://xmlns.com/foaf/0.1/familyName":[{"@value":"A'), F.col("k"),
        F.lit('"}],"http://xmlns.com/foaf/0.1/givenName":[{"@value":"G"}]},'),
        F.lit(f'{{"@id":"{M}ra/'), F.col("k"),
        F.lit('b","http://xmlns.com/foaf/0.1/familyName":[{"@value":"B'), F.col("k"),
        F.lit('"}],"http://xmlns.com/foaf/0.1/givenName":[{"@value":"H"}]}'),
        hierarchy,
        F.lit("]}"),
    )
    docs = ks.select(doc.alias("jsonld"))
    dumped = dump_csv(parse_jsonld(docs))
    return dumped.filter(F.col("type") == "journal article").orderBy("id")
