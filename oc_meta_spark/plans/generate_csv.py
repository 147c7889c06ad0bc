"""RDF→CSV dump — the inverse ETL (reference run/meta/generate_csv.py).

Reads a JSON-LD entity dump — either this engine's own export layout
(sources/export.py, compact keys + explicit AR positions) or a FOREIGN
OCDM export (full predicate URIs, ``@graph`` batching, ``oco:hasNext``
agent-role linked lists) — and reconstructs the 11-column metadata CSV:

- bibliographic resources drive the output; JournalVolume / JournalIssue
  entities are skipped as rows (reference generate_csv.py:383-390) and
  surface only as the volume/issue columns of their articles;
- the venue hierarchy is resolved relationally: article → (issue?) →
  (volume?) → venue via self-joins on ``partOf`` (reference
  process_hierarchical_venue, generate_csv.py:299-357 — recursion depth
  is ≤2 by OCDM construction, so two joins replace the walk);
- ``oco:hasNext`` chains become explicit positions with a per-(br, role)
  list-ranking pass (reference find_first_ar_by_role + the walk,
  generate_csv.py:359-381, 440-476): the head is the AR no other AR
  points to, and the chain is followed with cycle protection.  Chains are
  grouped per bibliographic resource, so the unit of work is a handful of
  rows — ``applyInPandas`` over (br, role) groups is the scale-safe shape
  (millions of small groups, never a long chain in one task);
- agent display strings are ``Name [omid:ra/... ids...]`` and the id
  column leads with the omid (reference process_responsible_agent /
  process_bibliographic_resource output shape — NB: the DUMP format puts
  the omid first, unlike the curator's curated CSV which appends it).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FIELDNAMES = [
    "id",
    "title",
    "author",
    "issue",
    "volume",
    "venue",
    "page",
    "pub_date",
    "type",
    "publisher",
    "editor",
]

# fabio/doco class URI → vocabulary label (reference URI_TYPE_DICT,
# generate_csv.py:40-78)
URI_TYPES = {
    "http://purl.org/spar/doco/Abstract": "abstract",
    "http://purl.org/spar/fabio/ArchivalDocument": "archival document",
    "http://purl.org/spar/fabio/AudioDocument": "audio document",
    "http://purl.org/spar/fabio/Book": "book",
    "http://purl.org/spar/fabio/BookChapter": "book chapter",
    "http://purl.org/spar/fabio/ExpressionCollection": "book section",
    "http://purl.org/spar/fabio/BookSeries": "book series",
    "http://purl.org/spar/fabio/BookSet": "book set",
    "http://purl.org/spar/fabio/ComputerProgram": "computer program",
    "http://purl.org/spar/doco/Part": "book part",
    "http://purl.org/spar/fabio/Expression": "",
    "http://purl.org/spar/fabio/DataFile": "dataset",
    "http://purl.org/spar/fabio/DataManagementPlan": "data management plan",
    "http://purl.org/spar/fabio/Thesis": "dissertation",
    "http://purl.org/spar/fabio/Editorial": "editorial",
    "http://purl.org/spar/fabio/Journal": "journal",
    "http://purl.org/spar/fabio/JournalArticle": "journal article",
    "http://purl.org/spar/fabio/JournalEditorial": "journal editorial",
    "http://purl.org/spar/fabio/JournalIssue": "journal issue",
    "http://purl.org/spar/fabio/JournalVolume": "journal volume",
    "http://purl.org/spar/fabio/Newspaper": "newspaper",
    "http://purl.org/spar/fabio/NewspaperArticle": "newspaper article",
    "http://purl.org/spar/fabio/NewspaperIssue": "newspaper issue",
    "http://purl.org/spar/fr/ReviewVersion": "peer review",
    "http://purl.org/spar/fabio/AcademicProceedings": "proceedings",
    "http://purl.org/spar/fabio/Preprint": "preprint",
    "http://purl.org/spar/fabio/Presentation": "presentation",
    "http://purl.org/spar/fabio/ProceedingsPaper": "proceedings article",
    "http://purl.org/spar/fabio/ReferenceBook": "reference book",
    "http://purl.org/spar/fabio/ReferenceEntry": "reference entry",
    "http://purl.org/spar/fabio/ReportDocument": "report",
    "http://purl.org/spar/fabio/RetractionNotice": "retraction notice",
    "http://purl.org/spar/fabio/Series": "series",
    "http://purl.org/spar/fabio/SpecificationDocument": "standard",
    "http://purl.org/spar/fabio/WebContent": "web content",
}

_META = "https://w3id.org/oc/meta/"

# normalized entity record — the union schema all dialects map into
ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("omid", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("pub_date", T.StringType()),
        T.StructField("seq_id", T.StringType()),
        T.StructField("part_of", T.StringType()),
        T.StructField("embodiment", T.StringType()),
        T.StructField("id_omids", T.ArrayType(T.StringType())),  # br/ra → id entities
        T.StructField("ar_omids", T.ArrayType(T.StringType())),  # br → its ARs
        T.StructField("role", T.StringType()),
        T.StructField("held_by", T.StringType()),
        T.StructField("has_next", T.StringType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("schema", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("given", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("start_page", T.StringType()),
        T.StructField("end_page", T.StringType()),
    ]
)

_COLS = [f.name for f in ENTITY_SCHEMA.fields]


def _short(uri: str | None) -> str | None:
    """'https://w3id.org/oc/meta/br/0601' → 'br/0601' (tolerates bare omids)."""
    if not uri:
        return None
    return uri.removeprefix(_META)


def _first(vals, key="@value"):
    if isinstance(vals, list) and vals:
        v = vals[0]
        if isinstance(v, dict):
            return v.get(key)
        return v
    if isinstance(vals, (str, int)):
        return vals
    return None


def _ids_of(vals):
    if not isinstance(vals, list):
        return None
    out = []
    for v in vals:
        if isinstance(v, dict) and v.get("@id"):
            out.append(_short(v["@id"]))
        elif isinstance(v, str):
            out.append(_short(v))
    return out


def _normalize_obj(obj: dict) -> dict | None:
    """One JSON-LD entity object (either dialect) → normalized record."""
    uri = obj.get("@id", "")
    omid = _short(uri)
    if not omid or "/" not in omid:
        return None
    kind = omid.split("/")[0]
    rec = dict.fromkeys(_COLS)
    rec["kind"] = kind
    rec["omid"] = omid
    if kind == "br":
        types = [t for t in obj.get("@type", []) if t != "http://purl.org/spar/fabio/Expression"]
        rec["type"] = (
            URI_TYPES.get(types[0], "") if types else obj.get("fabio:type") or ""
        )
        rec["title"] = _first(obj.get("http://purl.org/dc/terms/title")) or obj.get("dcterms:title")
        rec["pub_date"] = (
            _first(obj.get("http://prismstandard.org/namespaces/basic/2.0/publicationDate"))
            or obj.get("prism:publicationDate")
        )
        rec["seq_id"] = (
            _first(obj.get("http://purl.org/spar/fabio/hasSequenceIdentifier"))
            or obj.get("fabio:hasSequenceIdentifier")
        )
        rec["part_of"] = _short(
            _first(obj.get("http://purl.org/vocab/frbr/core#partOf"), "@id") or obj.get("frbr:partOf")
        )
        rec["embodiment"] = _short(
            _first(obj.get("http://purl.org/vocab/frbr/core#embodiment"), "@id")
            or obj.get("frbr:embodiment")
        )
        rec["id_omids"] = _ids_of(
            obj.get("http://purl.org/spar/datacite/hasIdentifier")
            or obj.get("datacite:hasIdentifier")
        )
        rec["ar_omids"] = _ids_of(obj.get("http://purl.org/spar/pro/isDocumentContextFor"))
    elif kind == "ra":
        rec["family"] = _first(obj.get("http://xmlns.com/foaf/0.1/familyName")) or obj.get("foaf:familyName")
        rec["given"] = _first(obj.get("http://xmlns.com/foaf/0.1/givenName")) or obj.get("foaf:givenName")
        rec["name"] = _first(obj.get("http://xmlns.com/foaf/0.1/name")) or obj.get("foaf:name")
        rec["id_omids"] = _ids_of(
            obj.get("http://purl.org/spar/datacite/hasIdentifier")
            or obj.get("datacite:hasIdentifier")
        )
    elif kind == "id":
        scheme = (
            _first(obj.get("http://purl.org/spar/datacite/usesIdentifierScheme"), "@id")
            or obj.get("datacite:usesIdentifierScheme")
            or ""
        )
        rec["schema"] = scheme.rsplit("/", 1)[-1] if "/" in scheme else scheme
        rec["value"] = (
            _first(obj.get("http://www.essepuntato.it/2010/06/literalreification/hasLiteralValue"))
            or obj.get("literal:hasLiteralValue")
        )
    elif kind == "ar":
        role = (
            _first(obj.get("http://purl.org/spar/pro/withRole"), "@id") or obj.get("pro:withRole") or ""
        )
        rec["role"] = role.rsplit("/", 1)[-1]
        rec["held_by"] = _short(
            _first(obj.get("http://purl.org/spar/pro/isHeldBy"), "@id") or obj.get("pro:isHeldBy")
        )
        rec["has_next"] = _short(
            _first(obj.get("https://w3id.org/oc/ontology/hasNext"), "@id") or obj.get("oco:hasNext")
        )
        # native exports carry the BR back-pointer + explicit position
        ctx = obj.get("pro:isDocumentContextFor")
        rec["part_of"] = _short(ctx) if isinstance(ctx, str) else None
        pos = obj.get("oc:position")
        rec["pos"] = int(pos) if pos is not None else None
    elif kind == "re":
        rec["start_page"] = (
            _first(obj.get("http://prismstandard.org/namespaces/basic/2.0/startingPage"))
            or obj.get("prism:startingPage")
        )
        rec["end_page"] = (
            _first(obj.get("http://prismstandard.org/namespaces/basic/2.0/endingPage"))
            or obj.get("prism:endingPage")
        )
    else:
        return None
    return rec


def parse_jsonld(docs: DataFrame, column: str = "jsonld") -> DataFrame:
    """JSON-LD documents → normalized entity records.

    Each input row holds one JSON text: a single entity object (native
    export) or a ``[{"@graph": [...]}]`` batch (foreign OCDM export).
    Runs as ``mapInPandas`` — Arrow-batched, one pass, emits 0..n records
    per document."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc in pdf[column]:
                if not doc:
                    continue
                try:
                    data = json.loads(doc)
                except (TypeError, ValueError):
                    continue
                # the engine's own export wraps each document in a
                # {"jsonld": "..."} row — unwrap before dispatch
                if isinstance(data, dict) and set(data) <= {"jsonld", "kind", "dir_split", "file_n"}:
                    try:
                        data = json.loads(data.get("jsonld") or "null")
                    except (TypeError, ValueError):
                        continue
                objs = []
                if isinstance(data, dict):
                    objs = data.get("@graph", [data])
                elif isinstance(data, list):
                    for g in data:
                        if isinstance(g, dict):
                            objs.extend(g.get("@graph", [g]))
                for obj in objs:
                    rec = _normalize_obj(obj) if isinstance(obj, dict) else None
                    if rec:
                        out.append(rec)
            yield pd.DataFrame(out, columns=_COLS) if out else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in _COLS}
            )

    return docs.mapInPandas(run, ENTITY_SCHEMA)


_CHAIN_SCHEMA = T.StructType(
    [
        T.StructField("br_omid", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("ar_omid", T.StringType()),
        T.StructField("ra_omid", T.StringType()),
        T.StructField("pos", T.IntegerType()),
    ]
)


def resolve_chains(ars: DataFrame) -> DataFrame:
    """(br, role, ar, held_by, has_next[, pos]) → explicit positions.

    Native rows with ``pos`` pass through; hasNext rows are ranked by
    walking from the head (the AR nothing points to) with cycle
    protection (reference generate_csv.py:359-381, 440-476).  The group
    key is (br, role): chains are author lists, so every group is tiny —
    applyInPandas never sees more than one chain."""

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["pos"].notna().all():
            out = pdf.sort_values("pos")
            return pd.DataFrame(
                {
                    "br_omid": out["br_omid"],
                    "role": out["role"],
                    "ar_omid": out["omid"],
                    "ra_omid": out["held_by"],
                    "pos": out["pos"].astype("int32"),
                }
            )
        nxt = {r["omid"]: r["has_next"] for _, r in pdf.iterrows()}
        held = {r["omid"]: r["held_by"] for _, r in pdf.iterrows()}
        members = set(nxt)
        referenced = {v for v in nxt.values() if v in members}
        heads = [m for m in sorted(members) if m not in referenced]
        start = heads[0] if heads else sorted(members)[0]
        order, seen = [], set()
        cur = start
        while cur in members and cur not in seen and len(order) < len(members):
            order.append(cur)
            seen.add(cur)
            cur = nxt.get(cur)
        for m in sorted(members - seen):  # disconnected tails still emit
            order.append(m)
        br = pdf["br_omid"].iloc[0]
        role = pdf["role"].iloc[0]
        return pd.DataFrame(
            {
                "br_omid": [br] * len(order),
                "role": [role] * len(order),
                "ar_omid": order,
                "ra_omid": [held[m] for m in order],
                "pos": list(range(1, len(order) + 1)),
            }
        )

    return ars.groupBy("br_omid", "role").applyInPandas(rank, _CHAIN_SCHEMA)


def dump_csv(entities: DataFrame) -> DataFrame:
    """Normalized entity records → the 11-column metadata CSV rows."""
    br = entities.filter(F.col("kind") == "br")
    ids = entities.filter(F.col("kind") == "id").select(
        F.col("omid").alias("id_omid"), F.concat_ws(":", "schema", "value").alias("token")
    )
    ras = entities.filter(F.col("kind") == "ra").select(
        F.col("omid").alias("ra_omid"),
        F.col("family").alias("r_family"),
        F.col("given").alias("r_given"),
        F.col("name").alias("r_name"),
        F.col("id_omids").alias("ra_id_omids"),
    )
    res = entities.filter(F.col("kind") == "re").select(
        F.col("omid").alias("re_omid"), "start_page", "end_page"
    )

    # AR rows: BR link either native (part_of back-pointer) or via the
    # br's isDocumentContextFor list (foreign exports)
    ar_raw = entities.filter(F.col("kind") == "ar").select(
        "omid", "role", "held_by", "has_next", "pos", F.col("part_of").alias("ctx_br")
    )
    br_ar = br.select("omid", F.explode_outer("ar_omids").alias("ar_ref")).select(
        F.col("ar_ref").alias("omid"), F.col("omid").alias("list_br")
    )
    ars = (
        ar_raw.join(br_ar, "omid", "left")
        .withColumn("br_omid", F.coalesce("ctx_br", "list_br"))
        .filter(F.col("br_omid").isNotNull())
        .select("br_omid", "role", "omid", "held_by", "has_next", "pos")
    )
    chains = resolve_chains(ars)

    # id tokens per entity: omid token FIRST (dump format), then literals
    def id_string(df, omid_col, ids_col):
        tok = df.select(F.col(omid_col).alias("e"), F.explode_outer(ids_col).alias("id_omid"))
        agg = (
            tok.join(ids, "id_omid", "left")
            .groupBy("e")
            .agg(F.array_sort(F.collect_list("token")).alias("toks"))
        )
        return agg.select(
            "e",
            # nullif: entities with no literal ids serialize as "omid:x"
            # without a trailing separator (concat_ws keeps the separator
            # for empty strings, only skips NULLs)
            F.concat_ws(
                " ",
                F.concat(F.lit("omid:"), F.col("e")),
                F.nullif(F.array_join("toks", " "), F.lit("")),
            ).alias("id_str"),
        )

    br_ids = id_string(br, "omid", "id_omids")
    ra_ids = id_string(ras, "ra_omid", "ra_id_omids")

    # agent display: "Family, Given [omid:ra/... ids]" (generate_csv.py:214-263)
    ra_disp = (
        ras.join(ra_ids.withColumnRenamed("e", "ra_omid"), "ra_omid", "left")
        .withColumn(
            "disp_name",
            F.when(
                (F.coalesce("r_family", F.lit("")) != "") | (F.coalesce("r_given", F.lit("")) != ""),
                F.concat(F.coalesce("r_family", F.lit("")), F.lit(", "), F.coalesce("r_given", F.lit(""))),
            ).otherwise(F.col("r_name")),
        )
        .filter(F.col("disp_name").isNotNull())
        .select("ra_omid", F.concat(F.col("disp_name"), F.lit(" ["), F.col("id_str"), F.lit("]")).alias("entry"))
    )
    role_str = (
        chains.join(ra_disp, "ra_omid", "left")
        .filter(F.col("entry").isNotNull())
        .groupBy("br_omid", "role")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "entry"))), lambda s: s["entry"]),
                "; ",
            ).alias("joined")
        )
        .groupBy("br_omid")
        .pivot("role", ["author", "editor", "publisher"])
        .agg(F.first("joined"))
    )

    # venue hierarchy: issue → volume → venue in ≤2 partOf hops
    anc1 = br.select(
        F.col("omid").alias("p1"),
        F.col("type").alias("p1_type"),
        F.col("seq_id").alias("p1_seq"),
        F.col("part_of").alias("p1_up"),
        F.col("title").alias("p1_title"),
        F.col("id_omids").alias("p1_ids"),
    )
    anc2 = anc1.select(
        F.col("p1").alias("p2"),
        F.col("p1_type").alias("p2_type"),
        F.col("p1_seq").alias("p2_seq"),
        F.col("p1_up").alias("p2_up"),
        F.col("p1_title").alias("p2_title"),
        F.col("p1_ids").alias("p2_ids"),
    )
    anc3 = anc1.select(
        F.col("p1").alias("p3"),
        F.col("p1_type").alias("p3_type"),
        F.col("p1_title").alias("p3_title"),
        F.col("p1_ids").alias("p3_ids"),
    )
    work = br.filter(~F.col("type").isin("journal volume", "journal issue"))
    h = (
        work.join(anc1, work.part_of == anc1.p1, "left")
        .join(anc2, F.col("p1_up") == anc2.p2, "left")
        .join(anc3, F.col("p2_up") == anc3.p3, "left")
    )
    issue = F.when(F.col("p1_type") == "journal issue", F.col("p1_seq"))
    volume = F.coalesce(
        F.when(F.col("p1_type") == "journal volume", F.col("p1_seq")),
        F.when(F.col("p2_type") == "journal volume", F.col("p2_seq")),
    )
    venue_omid = F.coalesce(
        F.when(~F.coalesce(F.col("p1_type"), F.lit("")).isin("journal volume", "journal issue"), F.col("p1")),
        F.when(~F.coalesce(F.col("p2_type"), F.lit("")).isin("journal volume", "journal issue"), F.col("p2")),
        F.col("p3"),
    )
    venue_title = F.coalesce(
        F.when(~F.coalesce(F.col("p1_type"), F.lit("")).isin("journal volume", "journal issue"), F.col("p1_title")),
        F.when(~F.coalesce(F.col("p2_type"), F.lit("")).isin("journal volume", "journal issue"), F.col("p2_title")),
        F.col("p3_title"),
    )
    venue_ids = F.coalesce(
        F.when(~F.coalesce(F.col("p1_type"), F.lit("")).isin("journal volume", "journal issue"), F.col("p1_ids")),
        F.when(~F.coalesce(F.col("p2_type"), F.lit("")).isin("journal volume", "journal issue"), F.col("p2_ids")),
        F.col("p3_ids"),
    )
    h = h.select(
        "omid", "title", "pub_date", "type", "embodiment",
        issue.alias("issue_v"), volume.alias("volume_v"),
        venue_omid.alias("venue_omid"), venue_title.alias("venue_title"),
        venue_ids.alias("venue_id_omids"),
    )
    ven_ids = id_string(
        h.filter(F.col("venue_omid").isNotNull()).select("venue_omid", "venue_id_omids").dropDuplicates(["venue_omid"]),
        "venue_omid",
        "venue_id_omids",
    )
    out = (
        h.join(br_ids.withColumnRenamed("e", "omid"), "omid", "left")
        .join(ven_ids.withColumnRenamed("e", "venue_omid").withColumnRenamed("id_str", "v_id_str"), "venue_omid", "left")
        .join(role_str.withColumnRenamed("br_omid", "omid"), "omid", "left")
        .join(res.withColumnRenamed("re_omid", "embodiment"), "embodiment", "left")
    )
    return out.select(
        F.coalesce("id_str", F.concat(F.lit("omid:"), F.col("omid"))).alias("id"),
        F.coalesce("title", F.lit("")).alias("title"),
        F.coalesce("author", F.lit("")).alias("author"),
        F.coalesce("issue_v", F.lit("")).alias("issue"),
        F.coalesce("volume_v", F.lit("")).alias("volume"),
        F.when(
            F.col("venue_omid").isNotNull(),
            F.concat(F.coalesce("venue_title", F.lit("")), F.lit(" ["), F.col("v_id_str"), F.lit("]")),
        ).otherwise("").alias("venue"),
        F.when(
            F.col("start_page").isNotNull(),
            F.concat_ws("-", "start_page", F.coalesce("end_page", "start_page")),
        ).otherwise("").alias("page"),
        F.coalesce("pub_date", F.lit("")).alias("pub_date"),
        F.coalesce("type", F.lit("")).alias("type"),
        F.coalesce("publisher", F.lit("")).alias("publisher"),
        F.coalesce("editor", F.lit("")).alias("editor"),
    )


def generate_csv_from_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON-LD dump directory (recursive) and emit CSV rows."""
    docs = spark.read.text(path, recursiveFileLookup=True).withColumnRenamed("value", "jsonld")
    return dump_csv(parse_jsonld(docs))
