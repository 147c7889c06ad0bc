"""Export sinks: curated CSV, JSON-LD entity export, N-Quads (SURVEY S2/S3/
S9/S10).

Reference sinks: quoted CSV writer (lib/file_manager.py:128-148), chunked
CSV every 3000 rows (run/meta/preprocess_input.py:196-242), JSON-LD files in
``{kind}/{prefix}/{dir_split}/{n}.zip`` layout (run/meta_process.py:290-330,
layout doc docs/02-configuration.md "File organization"), N-Quads stream
with 10M lines/file (run/migration/stream_nquads.py:37-131).

Spark-native: ``maxRecordsPerFile`` replaces hand-rolled chunking; the
dir-split layout becomes a computed partition column; N-Quads are built with
``format_string`` (JVM-side) and written with ``df.write.text``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oc_meta_spark.plans.curation import EntityCatalog

OCDM = {
    "br": "https://w3id.org/oc/meta/br/",
    "ra": "https://w3id.org/oc/meta/ra/",
    "id": "https://w3id.org/oc/meta/id/",
    "ar": "https://w3id.org/oc/meta/ar/",
    "re": "https://w3id.org/oc/meta/re/",
}


def write_curated_csv(df: DataFrame, path: str, rows_per_file: int = 3000) -> None:
    """Chunked, fully-quoted curated CSV (S2/S3).

    ``maxRecordsPerFile`` gives the reference's 3000-row chunking without a
    driver-side buffer; quoteAll mirrors QUOTE_NONNUMERIC on an all-string
    schema.
    """
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        # RFC-4180 doubled quotes, NOT Spark's default backslash escape:
        # the reference corpus is written by Python csv (doubled quotes)
        # and read_metadata_csv parses with escape='"' — without this a
        # title containing a double quote round-trips corrupted (caught
        # by the CS1 gate)
        .option("escape", '"')
        .option("maxRecordsPerFile", rows_per_file)
        .csv(path)
    )


def _uri(kind_col: F.Column, omid_col: F.Column) -> F.Column:
    # omid 'br/0601' → https://w3id.org/oc/meta/br/0601
    return F.concat(F.lit("https://w3id.org/oc/meta/"), omid_col)


def entity_jsonld_rows(catalog: EntityCatalog) -> DataFrame:
    """Entity tables → one JSON-LD row per entity (S9).

    The JSON document is assembled from nested structs with ``to_json`` —
    deterministic, JVM-side, no Python serialization.  File layout keys
    (kind, dir_split, file_n) are computed columns so a partitioned write
    reproduces the reference's ``{kind}/{dir_split}/{n}`` fan-out.
    BR and RA documents carry their ``datacite:hasIdentifier`` links so
    the export is closed under the inverse ETL (plans/generate_csv.py can
    reconstruct the id columns)."""
    id_links = catalog.entity_id.groupBy("entity_omid").agg(
        F.array_sort(F.collect_list(F.concat(F.lit("https://w3id.org/oc/meta/"), F.col("id_omid")))).alias(
            "__ids"
        )
    )
    br = catalog.br.join(id_links, catalog.br.omid == id_links.entity_omid, "left").select(
        F.col("omid"),
        F.to_json(
            F.struct(
                _uri(F.lit("br"), F.col("omid")).alias("@id"),
                F.col("type").alias("fabio:type"),
                F.col("title").alias("dcterms:title"),
                F.col("pub_date").alias("prism:publicationDate"),
                F.col("seq_id").alias("fabio:hasSequenceIdentifier"),
                F.when(F.col("part_of").isNotNull(), _uri(F.lit("br"), F.col("part_of"))).alias("frbr:partOf"),
                F.when(F.col("embodiment").isNotNull(), _uri(F.lit("re"), F.col("embodiment"))).alias(
                    "frbr:embodiment"
                ),
                F.col("__ids").alias("datacite:hasIdentifier"),
            ),
            options={"ignoreNullFields": "true"},
        ).alias("jsonld"),
    )
    ra = catalog.ra.join(id_links, catalog.ra.omid == id_links.entity_omid, "left").select(
        F.col("omid"),
        F.to_json(
            F.struct(
                _uri(F.lit("ra"), F.col("omid")).alias("@id"),
                F.col("name").alias("foaf:name"),
                F.col("family").alias("foaf:familyName"),
                F.col("given").alias("foaf:givenName"),
                F.col("__ids").alias("datacite:hasIdentifier"),
            ),
            options={"ignoreNullFields": "true"},
        ).alias("jsonld"),
    )
    id_rows = catalog.id.select(
        "omid",
        F.to_json(
            F.struct(
                _uri(F.lit("id"), F.col("omid")).alias("@id"),
                F.col("schema").alias("datacite:usesIdentifierScheme"),
                F.col("value").alias("literal:hasLiteralValue"),
            )
        ).alias("jsonld"),
    )
    ar = catalog.ar.select(
        "omid",
        F.to_json(
            F.struct(
                _uri(F.lit("ar"), F.col("omid")).alias("@id"),
                F.col("role").alias("pro:withRole"),
                _uri(F.lit("ra"), F.col("ra_omid")).alias("pro:isHeldBy"),
                _uri(F.lit("br"), F.col("br_omid")).alias("pro:isDocumentContextFor"),
                F.col("pos").alias("oc:position"),
            )
        ).alias("jsonld"),
    )
    re_rows = catalog.re.select(
        "omid",
        F.to_json(
            F.struct(
                _uri(F.lit("re"), F.col("omid")).alias("@id"),
                F.col("start_page").alias("prism:startingPage"),
                F.col("end_page").alias("prism:endingPage"),
            ),
            options={"ignoreNullFields": "true"},
        ).alias("jsonld"),
    )
    out = br.unionByName(ra).unionByName(id_rows).unionByName(ar).unionByName(re_rows)
    n = F.regexp_extract("omid", r"(\d+)$", 1).cast("long")
    return out.select(
        F.regexp_extract("omid", r"^([a-z]+)/", 1).alias("kind"),
        (F.floor((n - 1) / 10000) * 10000 + 10000).alias("dir_split"),
        (F.floor((n - 1) / 1000) * 1000 + 1000).alias("file_n"),
        "omid",
        "jsonld",
    )


def write_jsonld(catalog: EntityCatalog, path: str) -> None:
    """Partitioned JSON-LD export mirroring the reference dir layout
    (kind/dir_split/file_n — the computed-column replacement for
    dir_split_number/items_per_file)."""
    (
        entity_jsonld_rows(catalog)
        .select("kind", "dir_split", "file_n", "jsonld")
        .repartition("kind", "dir_split")
        .write.mode("overwrite")
        .partitionBy("kind", "dir_split", "file_n")
        .json(path)
    )


def date_typed_literal(col: F.Column) -> F.Column:
    """C15: partial date string → RDF literal typed to its precision
    (reference core/creator.py:296-301 via oc_ocdm support.create_date):
    YYYY-MM-DD ⇒ xsd:date, YYYY-MM ⇒ xsd:gYearMonth, YYYY ⇒ xsd:gYear.
    NULL for empty or non-ISO-shaped values (callers fall back to a plain
    string literal)."""
    dt = (
        F.when(col.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.lit("date"))
        .when(col.rlike(r"^\d{4}-\d{2}$"), F.lit("gYearMonth"))
        .when(col.rlike(r"^\d{4}$"), F.lit("gYear"))
    )
    return F.when(
        dt.isNotNull(),
        F.concat(
            F.lit('"'), col, F.lit('"^^<http://www.w3.org/2001/XMLSchema#'), dt, F.lit(">")
        ),
    )


def _nq_escape(col: F.Column) -> F.Column:
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), '"', r"\\\""), "\n", r"\\n"
    )


_DCTERMS = "http://purl.org/dc/terms/"
_PRISM = "http://prismstandard.org/namespaces/basic/2.0/"
_FRBR = "http://purl.org/vocab/frbr/core#"
_LITRE = "http://www.essepuntato.it/2010/06/literalreification/"
_FOAF = "http://xmlns.com/foaf/0.1/"
_PRO = "http://purl.org/spar/pro/"
_OCO = "https://w3id.org/oc/ontology/"
_FABIO = "http://purl.org/spar/fabio/"
_DATACITE = "http://purl.org/spar/datacite/"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def nquads_rows(catalog: EntityCatalog) -> DataFrame:
    """Entity tables → N-Quads lines, full OCDM predicate mapping (S10).

    Mirrors the reference's graph shape (oc_ocdm GraphEntity vocabulary —
    public SPAR/FRBR/FOAF ontologies; stream_nquads.py:37-131 is the
    reference's zip→nquads path): fabio work types + frbr:Expression,
    datacite identifier links and schemes, pro agent roles with
    ``oco:hasNext`` chains, frbr embodiment/part, prism pages.  The named
    graph of every quad is the subject's kind graph (…/br/, …/ra/, …), as
    in the reference's per-kind datasets.  All built JVM-side
    (format_string + unions — one codegen stage per family, no UDFs).
    """
    uri = lambda omid: F.concat(F.lit("<https://w3id.org/oc/meta/"), omid, F.lit(">"))
    kind_graph = lambda omid: F.concat(
        F.lit("<https://w3id.org/oc/meta/"), F.regexp_extract(omid, r"^([a-z]+)/", 1), F.lit("/>")
    )

    def triples(df: DataFrame, pred: str, obj: F.Column, subj: str = "omid") -> DataFrame:
        return df.filter(obj.isNotNull()).select(
            F.format_string(
                "%s <%s> %s %s .",
                uri(F.col(subj)),
                F.lit(pred),
                obj,
                kind_graph(F.col(subj)),
            ).alias("line")
        )

    lit = lambda c: F.concat(F.lit('"'), _nq_escape(c), F.lit('"'))
    nn = lambda c: F.when(F.nullif(c, F.lit("")).isNotNull(), c)
    # 'journal article' → fabio:JournalArticle — the camel-cased type label
    # is the fabio class for every type in the vocabulary
    fabio_cls = F.concat(
        F.lit(f"<{_FABIO}"), F.regexp_replace(F.initcap(F.col("type")), " ", ""), F.lit(">")
    )
    role_uri = F.concat(F.lit(f"<{_PRO}"), F.col("role"), F.lit(">"))

    ent_id = catalog.entity_id
    ar_next = catalog.ar.alias("a").join(
        catalog.ar.select(
            F.col("br_omid").alias("n_br"), F.col("role").alias("n_role"),
            (F.col("pos") - 1).alias("n_prev"), F.col("omid").alias("next_omid"),
        ).alias("b"),
        (F.col("a.br_omid") == F.col("n_br"))
        & (F.col("a.role") == F.col("n_role"))
        & (F.col("a.pos") == F.col("n_prev")),
    ).select(F.col("a.omid").alias("omid"), "next_omid")

    parts = [
        # --- br ---
        triples(catalog.br, _RDF_TYPE, F.lit(f"<{_FABIO}Expression>")),
        triples(catalog.br.filter(F.nullif("type", F.lit("")).isNotNull()), _RDF_TYPE, fabio_cls),
        triples(catalog.br, f"{_DCTERMS}title", nn(lit(F.col("title")))),
        triples(
            catalog.br,
            f"{_PRISM}publicationDate",
            F.coalesce(date_typed_literal(F.col("pub_date")), nn(lit(F.col("pub_date")))),
        ),
        triples(catalog.br, f"{_FRBR}partOf", F.when(F.col("part_of").isNotNull(), uri(F.col("part_of")))),
        triples(catalog.br, f"{_FABIO}hasSequenceIdentifier", nn(lit(F.col("seq_id")))),
        triples(catalog.br, f"{_FRBR}embodiment", F.when(F.col("embodiment").isNotNull(), uri(F.col("embodiment")))),
        # --- identifier links (any entity kind → id/) ---
        triples(ent_id.withColumnRenamed("entity_omid", "omid"), f"{_DATACITE}hasIdentifier", uri(F.col("id_omid"))),
        # --- id ---
        triples(catalog.id, _RDF_TYPE, F.lit(f"<{_DATACITE}Identifier>")),
        triples(catalog.id, f"{_DATACITE}usesIdentifierScheme", F.concat(F.lit(f"<{_DATACITE}"), F.col("schema"), F.lit(">"))),
        triples(catalog.id, f"{_LITRE}hasLiteralValue", lit(F.col("value"))),
        # --- ra ---
        triples(catalog.ra, _RDF_TYPE, F.lit(f"<{_FOAF}Agent>")),
        triples(catalog.ra, f"{_FOAF}name", nn(lit(F.col("name")))),
        triples(catalog.ra, f"{_FOAF}givenName", nn(lit(F.col("given")))),
        triples(catalog.ra, f"{_FOAF}familyName", nn(lit(F.col("family")))),
        # --- ar ---
        triples(catalog.ar, _RDF_TYPE, F.lit(f"<{_PRO}RoleInTime>")),
        triples(catalog.ar, f"{_PRO}withRole", role_uri),
        triples(catalog.ar, f"{_PRO}isHeldBy", uri(F.col("ra_omid"))),
        triples(catalog.ar.select(F.col("br_omid").alias("omid"), F.col("omid").alias("ar_omid")),
                f"{_PRO}isDocumentContextFor", uri(F.col("ar_omid"))),
        triples(ar_next, f"{_OCO}hasNext", uri(F.col("next_omid"))),
        # --- re ---
        triples(catalog.re, _RDF_TYPE, F.lit(f"<{_FABIO}Manifestation>")),
        triples(catalog.re, f"{_PRISM}startingPage", nn(lit(F.col("start_page")))),
        triples(catalog.re, f"{_PRISM}endingPage", nn(lit(F.col("end_page")))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_nquads(catalog: EntityCatalog, path: str, lines_per_file: int = 10_000_000) -> None:
    nquads_rows(catalog).write.mode("overwrite").option("maxRecordsPerFile", lines_per_file).text(path)
