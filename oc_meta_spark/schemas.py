"""Schemas: the 11-column metadata CSV input and the normalized entity
tables that replace the reference's RDF triplestore.

Reference data model (SURVEY §1): five entity kinds — BR (bibliographic
resource), RA (responsible agent), ID (identifier), AR (agent role),
RE (resource embodiment) — plus provenance snapshots.  The reference stores
them as RDF (oc_meta/core/creator.py via oc_ocdm; read back in
oc_meta/lib/finder.py); here they are normalized columnar tables:

- ``oco:hasNext`` AR linked lists → explicit ``pos`` integers;
- reified identifiers stay a table keyed (schema, value) — the join target
  for resolution (the reference's PO→S index, lib/finder.py:98, becomes a
  partition/sort key choice);
- partial dates stay **strings** (Spark DateType cannot hold YYYY / YYYY-MM
  precision — SURVEY hard part §7.4.3);
- provenance is an append-only SCD2 snapshot table (CDF-style).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- input ----------------------------------------------------------------

META_INPUT_COLUMNS = [
    "id",
    "title",
    "author",
    "pub_date",
    "venue",
    "volume",
    "issue",
    "page",
    "type",
    "publisher",
    "editor",
]

META_INPUT_SCHEMA = T.StructType([T.StructField(c, T.StringType()) for c in META_INPUT_COLUMNS])

# Parsed (post cell-grammar) representation — SURVEY §1.1 "Spark mapping".
ID_TOKEN = T.StructType(
    [T.StructField("schema", T.StringType()), T.StructField("value", T.StringType())]
)
AGENT = T.StructType(
    [
        T.StructField("family", T.StringType()),
        T.StructField("given", T.StringType()),
        T.StructField("org_name", T.StringType()),
        T.StructField("ids", T.ArrayType(ID_TOKEN)),
        T.StructField("pos", T.IntegerType()),
    ]
)

# --- entity tables --------------------------------------------------------

BR_SCHEMA = T.StructType(
    [
        T.StructField("omid", T.StringType(), False),  # e.g. br/0601
        T.StructField("type", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("pub_date", T.StringType()),  # partial ISO, string!
        T.StructField("seq_id", T.StringType()),  # volume/issue number
        T.StructField("part_of", T.StringType()),  # parent br omid
        T.StructField("embodiment", T.StringType()),  # re omid
    ]
)

RA_SCHEMA = T.StructType(
    [
        T.StructField("omid", T.StringType(), False),
        T.StructField("name", T.StringType()),  # org name
        T.StructField("family", T.StringType()),
        T.StructField("given", T.StringType()),
    ]
)

ID_SCHEMA = T.StructType(
    [
        T.StructField("omid", T.StringType(), False),  # id/0601
        T.StructField("schema", T.StringType(), False),  # doi, issn, orcid, ...
        T.StructField("value", T.StringType(), False),
    ]
)

ENTITY_ID_SCHEMA = T.StructType(
    [
        T.StructField("entity_omid", T.StringType(), False),
        T.StructField("id_omid", T.StringType(), False),
    ]
)

AR_SCHEMA = T.StructType(
    [
        T.StructField("omid", T.StringType(), False),
        T.StructField("br_omid", T.StringType(), False),
        T.StructField("role", T.StringType(), False),  # author|editor|publisher
        T.StructField("ra_omid", T.StringType(), False),
        T.StructField("pos", T.IntegerType(), False),  # replaces oco:hasNext
    ]
)

RE_SCHEMA = T.StructType(
    [
        T.StructField("omid", T.StringType(), False),
        T.StructField("start_page", T.StringType()),
        T.StructField("end_page", T.StringType()),
    ]
)

PROV_SCHEMA = T.StructType(
    [
        T.StructField("entity_omid", T.StringType(), False),
        T.StructField("snapshot", T.IntegerType(), False),  # contiguous from 1
        T.StructField("generated_at", T.StringType(), False),
        T.StructField("invalidated_at", T.StringType()),
        T.StructField("derived_from", T.ArrayType(T.StringType())),  # ≥2 ⇒ merge
        T.StructField("resp_agent", T.StringType()),
        T.StructField("primary_source", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("update_query", T.StringType()),
    ]
)

ENTITY_TABLES = {
    "br": BR_SCHEMA,
    "ra": RA_SCHEMA,
    "id": ID_SCHEMA,
    "entity_id": ENTITY_ID_SCHEMA,
    "ar": AR_SCHEMA,
    "re": RE_SCHEMA,
    "prov": PROV_SCHEMA,
}

# Controlled type vocabulary + aliases — reference-exact:
# VALID_ENTITY_TYPES oc_meta/constants.py:69-109; aliasing in
# core/curator.py clean_metadata_without_id (curator.py:398-419).
VALID_TYPES = {
    "abstract",
    "archival document",
    "audio document",
    "book",
    "book chapter",
    "book part",
    "book section",
    "book series",
    "book set",
    "computer program",
    "data file",
    "data management plan",
    "dataset",
    "dissertation",
    "editorial",
    "journal",
    "journal article",
    "journal editorial",
    "journal issue",
    "journal volume",
    "newspaper",
    "newspaper article",
    "newspaper editorial",
    "newspaper issue",
    "peer review",
    "preprint",
    "presentation",
    "proceedings",
    "proceedings article",
    "proceedings series",
    "reference book",
    "reference entry",
    "retraction notice",
    "series",
    "report",
    "standard",
    "web content",
}

# The reference aliases exactly these five forms (curator.py:405-415);
# the three '* series' forms collapse to 'series'.
TYPE_ALIASES = {
    "edited book": "book",
    "monograph": "book",
    "report series": "series",
    "standard series": "series",
    "proceedings series": "series",
    "posted content": "web content",
}

# Types whose editor attaches to the container BR (reference:
# CONTAINER_EDITOR_TYPES, oc_meta/constants.py:60-68 — includes
# 'proceedings article').
CONTAINER_EDITOR_TYPES = {
    "book chapter",
    "book part",
    "book section",
    "book track",
    "component",
    "proceedings article",
    "reference entry",
}

# BR types that can act as containers (reference VENUES constants.py:42-59,
# hyphenated forms mapped to the space vocabulary).  Used to restrict
# catalog-side venue resolution.
VENUE_TYPES = {
    "archival document",
    "book",
    "book part",
    "book section",
    "book series",
    "book set",
    "journal",
    "journal volume",
    "journal issue",
    "proceedings series",
    "proceedings",
    "reference book",
    "report series",
    "standard series",
    "series",
}

FORBIDDEN_IDS = {"issn:0000-0000"}

# Persisted per-kind mint counters — replaces the reference's
# FilesystemCounterHandler (run/meta_process.py:162-168).  One row per
# entity kind; updated with each batch delta so curation never scans the
# full catalog to find the next omid number.
# Per (kind, supplier-prefix) mint counters — the reference's
# FilesystemCounterHandler keys its counter files by supplier prefix
# (run/meta_process.py:162-168), so two prefixes sharing one store keep
# independent number spaces.
COUNTER_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("prefix", T.StringType(), False),
        T.StructField("max_n", T.LongType(), False),
    ]
)
