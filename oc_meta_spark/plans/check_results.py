"""Post-run verification report (A6/J11 in domain form) — the Spark-native
``check_results`` (reference run/meta/check_results.py, FileResult counters
:65-84, group extraction :237-270, id→entity probe :131-199, omid/prov
existence :87-130).

One relational pass over (curated CSV rows, EntityCatalog) replaces the
reference's per-file loop + batched SPARQL VALUES probes:

- every bracketed id group in the five id-bearing columns is exploded
  into tokens and classified (omid / recognized / unverifiable /
  invalid — RECOGNIZED_SCHEMAS per reference constants.py:12-35);
- recognized ids join the catalog's id ⋈ entity_id tables — found /
  missing / entity-vs-claimed-omid mismatch per OCCURRENCE, exactly the
  reference's counting unit;
- CSV omids probe the entity tables (data graph existence) and the
  provenance table (snapshot existence);
- output: ONE counters row (the FileResult rollup) plus an ``errors``
  DataFrame (kind, row_id, column, detail) for the mismatch/missing
  lists the reference appends to ``FileResult.errors``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oc_meta_spark.functions.ids import normalize_id_udf
from oc_meta_spark.plans.curation import EntityCatalog, _cp

BR_ID_SCHEMAS = {
    "arxiv", "doi", "issn", "isbn", "jid", "openalex",
    "pmid", "pmcid", "url", "wikidata", "wikipedia",
}
RA_ID_SCHEMAS = {"crossref", "orcid", "viaf", "wikidata", "ror"}
RECOGNIZED_SCHEMAS = BR_ID_SCHEMAS | RA_ID_SCHEMAS

_ID_COLUMNS = ("id", "author", "editor", "publisher", "venue")
_SEMI_OUTSIDE_BRACKETS = r";(?![^\[\]]*\])"


@dataclass
class CheckReport:
    counters: DataFrame  # single row, one column per FileResult counter
    errors: DataFrame  # (kind, row_id, column, detail)


def _group_tokens(df: DataFrame) -> DataFrame:
    """(row_id, column, group_idx, token) for every id token in every
    bracket group: the 'id' column is ONE group; agent/venue columns are
    one group per bracketed entry (reference _extract_entity_groups)."""
    parts = []
    id_part = df.select(
        "row_id",
        F.lit("id").alias("column"),
        F.lit(0).alias("group_idx"),
        F.split(F.trim(F.coalesce(F.col("id"), F.lit(""))), r"\s+").alias("tokens"),
    )
    parts.append(id_part)
    for col in _ID_COLUMNS[1:]:
        entries = F.split(F.coalesce(F.col(col), F.lit("")), _SEMI_OUTSIDE_BRACKETS)
        exploded = df.select(
            "row_id", F.posexplode_outer(entries).alias("group_idx", "entry")
        )
        parts.append(
            exploded.select(
                "row_id",
                F.lit(col).alias("column"),
                "group_idx",
                F.split(
                    F.trim(F.regexp_extract(F.col("entry"), r"\[\s*([^\]]*?)\s*\]", 1)), r"\s+"
                ).alias("tokens"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.select("row_id", "column", "group_idx", F.explode("tokens").alias("token"))
        .filter(F.col("token").contains(":"))
        .withColumn("schema", F.lower(F.regexp_extract("token", r"^([^:]+):", 1)))
        .withColumn("value", F.regexp_extract("token", r"^[^:]+:(.*)$", 1))
        .filter(F.col("schema") != "")
    )


def check_results(curated: DataFrame, catalog: EntityCatalog) -> CheckReport:
    df = curated
    if "row_id" not in df.columns:
        df = df.withColumn("row_id", F.monotonically_increasing_id())
    tok = _group_tokens(df)
    # lineage cuts: the counters row cross-joins a dozen aggregates over
    # these frames — without cuts each reference re-embeds the whole
    # upstream tree and Catalyst analysis blows the driver heap
    tok = _cp(tok.withColumn(
        "klass",
        F.when(F.col("schema") == "omid", "omid")
        .when(F.col("schema").isin(*sorted(RECOGNIZED_SCHEMAS)), "recognized")
        .otherwise("unverifiable"),
    ))
    # validity of recognized tokens (checksum/syntax — reference normalize_id)
    rec = tok.filter(F.col("klass") == "recognized").withColumn(
        "normalized", normalize_id_udf(F.col("token"))
    )
    invalid = rec.filter(F.col("normalized").isNull())
    valid = rec.filter(F.col("normalized").isNotNull()).withColumn(
        "n_schema", F.regexp_extract("normalized", r"^([^:]+):", 1)
    ).withColumn("n_value", F.regexp_extract("normalized", r"^[^:]+:(.*)$", 1))

    # the group's claimed omid (if any) attaches to every token occurrence
    group_omid = (
        tok.filter(F.col("klass") == "omid")
        .select("row_id", "column", "group_idx", F.col("value").alias("claimed_omid"))
        .dropDuplicates(["row_id", "column", "group_idx"])
    )
    valid = valid.join(group_omid, ["row_id", "column", "group_idx"], "left")

    # store probe: normalized id → entity omids holding it
    cat_ids = (
        catalog.id.join(catalog.entity_id, catalog.id.omid == catalog.entity_id.id_omid)
        .select(
            F.col("schema").alias("n_schema"),
            F.col("value").alias("n_value"),
            F.col("entity_omid").alias("store_omid"),
        )
    )
    probed = valid.join(cat_ids, ["n_schema", "n_value"], "left")
    per_occurrence = probed.groupBy("row_id", "column", "group_idx", "token", "claimed_omid").agg(
        F.collect_set("store_omid").alias("store_omids")
    )
    per_occurrence = per_occurrence.withColumn("found", F.size("store_omids") > 0).withColumn(
        "mismatch",
        F.col("found")
        & F.col("claimed_omid").isNotNull()
        & ~F.array_contains(F.col("store_omids"), F.col("claimed_omid")),
    )
    per_occurrence = _cp(per_occurrence)

    # csv omids: data-graph + provenance existence
    all_entities = (
        catalog.br.select("omid")
        .unionByName(catalog.ra.select("omid"))
        .unionByName(catalog.ar.select("omid"))
        .unionByName(catalog.re.select("omid"))
        .unionByName(catalog.id.select("omid"))
    )
    csv_omids = (
        tok.filter(F.col("klass") == "omid")
        .select("row_id", "column", F.col("value").alias("omid"))
        .dropDuplicates(["omid"])
    )
    prov_entities = catalog.prov.select(F.col("entity_omid").alias("omid")).dropDuplicates()
    omid_probe = (
        csv_omids.join(all_entities.withColumn("__data", F.lit(True)).dropDuplicates(["omid"]), "omid", "left")
        .join(prov_entities.withColumn("__prov", F.lit(True)), "omid", "left")
        .withColumn("data_found", F.coalesce("__data", F.lit(False)))
        .withColumn("prov_found", F.coalesce("__prov", F.lit(False)))
    )
    omid_probe = _cp(omid_probe)
    # resolved store entities: do they have provenance?
    store_entity_prov = (
        per_occurrence.select(F.explode("store_omids").alias("omid"))
        .dropDuplicates()
        .join(prov_entities.withColumn("__prov", F.lit(True)), "omid", "left")
        .withColumn("prov_found", F.coalesce("__prov", F.lit(False)))
    )

    counters = (
        df.agg(F.count(F.lit(1)).alias("total_rows"))
        .crossJoin(
            tok.select("row_id").dropDuplicates().agg(F.count(F.lit(1)).alias("rows_with_ids"))
        )
        .crossJoin(tok.agg(F.count(F.lit(1)).alias("total_identifiers")))
        .crossJoin(
            tok.filter(F.col("klass") == "omid").agg(
                F.count(F.lit(1)).alias("omid_schema_identifiers")
            )
        )
        .crossJoin(invalid.agg(F.count(F.lit(1)).alias("identifiers_skipped_invalid")))
        .crossJoin(
            tok.filter(F.col("klass") == "unverifiable").agg(
                F.count(F.lit(1)).alias("identifiers_skipped_unverifiable")
            )
        )
        .crossJoin(
            per_occurrence.agg(
                F.sum(F.when(F.col("found") & ~F.col("mismatch"), 1).otherwise(0)).alias(
                    "identifiers_with_omids"
                ),
                F.sum(F.when(~F.col("found"), 1).otherwise(0)).alias("identifiers_without_omids"),
                F.sum(F.when(F.col("mismatch"), 1).otherwise(0)).alias(
                    "identifiers_with_omid_mismatch"
                ),
            )
        )
        .crossJoin(
            omid_probe.agg(
                F.sum(F.when(F.col("data_found"), 1).otherwise(0)).alias("data_graphs_found"),
                F.sum(F.when(~F.col("data_found"), 1).otherwise(0)).alias("data_graphs_missing"),
                F.sum(F.when(F.col("prov_found"), 1).otherwise(0)).alias("prov_graphs_found"),
                F.sum(F.when(~F.col("prov_found"), 1).otherwise(0)).alias("prov_graphs_missing"),
            )
        )
        .crossJoin(
            store_entity_prov.agg(
                F.sum(F.when(F.col("prov_found"), 1).otherwise(0)).alias("omids_with_provenance"),
                F.sum(F.when(~F.col("prov_found"), 1).otherwise(0)).alias(
                    "omids_without_provenance"
                ),
            )
        )
    )

    err = lambda kind, df_, detail: df_.select(
        F.lit(kind).alias("kind"),
        F.col("row_id").cast("long").alias("row_id"),
        F.col("column"),
        detail.alias("detail"),
    )
    errors = (
        err("id_without_omid", per_occurrence.filter(~F.col("found")), F.col("token"))
        .unionByName(
            err(
                "omid_mismatch",
                per_occurrence.filter(F.col("mismatch")),
                F.concat_ws(
                    " ",
                    F.col("token"),
                    F.lit("claimed"),
                    F.col("claimed_omid"),
                    F.lit("store"),
                    F.array_join("store_omids", ","),
                ),
            )
        )
        .unionByName(
            err(
                "data_graph_missing",
                omid_probe.filter(~F.col("data_found")),
                F.col("omid"),
            )
        )
        .unionByName(
            err(
                "prov_graph_missing",
                omid_probe.filter(F.col("data_found") & ~F.col("prov_found")),
                F.col("omid"),
            )
        )
    )
    return CheckReport(counters=counters, errors=errors)


def check_export_consistency(curated: DataFrame, dumped: DataFrame) -> DataFrame:
    """Offline export verification (reference run/meta/check_rdf_files.py:
    compare the produced RDF files against the curated CSV WITHOUT querying
    a store).  Both inputs are curated-CSV-shaped frames — ``curated`` from
    the pipeline, ``dumped`` from the RDF→CSV dump of the export
    (plans/generate_csv.py) — keyed by the entity omid embedded in the id
    column.  Returns a discrepancy frame (omid, kind, column, curated,
    dumped): ``missing_in_export`` / ``extra_in_export`` rows plus one
    ``value_mismatch`` row per differing column.  Empty result = consistent.

    Cells are compared under the reference's normalize_row_ids
    canonicalization (test/test_utils.py:159): id tokens are sorted inside
    each bracket group so two serializations of the same id set don't
    flag, while the "; "-separated entry order (author/editor sequence —
    the hasNext discipline) remains significant.  The canonicalization
    applies ONLY to the id-bearing columns the reference normalizes
    (author/venue/publisher/editor); every other shared column (title,
    page, pub_date, volume, issue, type) is compared exactly after a
    trim, so a dump that reorders bracketed tokens or collapses internal
    whitespace inside a title DOES flag.

    The ``id`` column itself is BOTH the join key (via its omid token) AND
    a compared value: it is canonicalized as a sorted token multiset — the
    reference's ``' '.join(sorted(id.split()))`` — so a dump that keeps
    the omid but LOSES or GAINS another id token (e.g. drops a DOI) flags
    as a ``value_mismatch`` on column ``id`` (round-7 ADVICE: previously
    the id cell was key-only and token loss passed silently).

    Rows whose id cell lacks an ``omid:br/...`` token cannot be keyed: they
    are reported as ``malformed_id`` discrepancies on their own side and
    EXCLUDED from the join (an empty-string extract would otherwise collapse
    every malformed row on both sides onto one key, fanning out bogus
    value_mismatch rows many-to-many)."""
    # [^\]\s] not \S: keeps the key clean even if an id cell ever embeds
    # the omid inside a bracket block (same hardening as the invariant
    # projection's extracts)
    omid = F.nullif(F.regexp_extract(F.col("id"), r"omid:(br/[^\]\s]+)", 1), F.lit(""))

    # The columns the reference's normalize_row_ids canonicalizes
    # (test/test_utils.py:159-165); all others compare exactly after trim.
    id_bearing = {"author", "venue", "publisher", "editor"}

    def cell(col_name: str) -> F.Column:
        if col_name not in id_bearing:
            return F.trim(F.coalesce(F.col(col_name), F.lit("")))
        # Per-GROUP canonicalization (the reference's normalize_row_ids,
        # test/test_utils.py:159-165): sort id tokens only INSIDE each
        # bracket block — "[issn:x omid:y]" and "[omid:y issn:x]" (curator
        # appends omids, the dump leads with them) canonicalize
        # identically — while the "; "-separated ENTRY order stays
        # significant, so a dump that reconstructed the agent chain in the
        # wrong order flags as a value_mismatch (hasNext/pos discipline is
        # part of the round-trip contract).
        raw = F.coalesce(F.col(col_name), F.lit(""))
        entries = F.split(raw, _SEMI_OUTSIDE_BRACKETS)

        def canon_entry(e: F.Column) -> F.Column:
            outside = F.regexp_replace(
                F.trim(F.regexp_replace(e, r"\[[^\]]*\]", "")), r"\s+", " "
            )
            inner = F.trim(F.regexp_extract(e, r"\[([^\]]*)\]", 1))
            bracket = F.when(
                e.rlike(r"\["),
                F.concat(
                    F.lit("["),
                    F.array_join(F.array_sort(F.split(inner, r"\s+")), " "),
                    F.lit("]"),
                ),
            )
            return F.concat_ws(" ", F.nullif(outside, F.lit("")), bracket)

        return F.array_join(F.transform(entries, canon_entry), "; ")

    # id cell as a sorted token multiset (reference normalize_row_ids:
    # ' '.join(sorted(id.split())) — duplicates preserved, order dropped)
    idset = F.array_join(
        F.array_sort(F.split(F.trim(F.coalesce(F.col("id"), F.lit(""))), r"\s+")), " "
    )

    cols = [c for c in curated.columns if c in set(dumped.columns) and c not in ("id", "row_id")]
    a = curated.select(omid.alias("omid"), F.col("id").alias("a_id"),
                       idset.alias("a_idset"),
                       *[cell(c).alias(f"a_{c}") for c in cols])
    b = dumped.select(omid.alias("omid"), F.col("id").alias("b_id"),
                      idset.alias("b_idset"),
                      *[cell(c).alias(f"b_{c}") for c in cols])

    malformed = (
        a.filter(F.col("omid").isNull()).select(
            "omid", F.lit("malformed_id_in_curated").alias("kind"),
            F.lit(None).cast("string").alias("column"),
            F.col("a_id").alias("curated"), F.lit(None).cast("string").alias("dumped"),
        )
        .unionByName(
            b.filter(F.col("omid").isNull()).select(
                "omid", F.lit("malformed_id_in_export").alias("kind"),
                F.lit(None).cast("string").alias("column"),
                F.lit(None).cast("string").alias("curated"), F.col("b_id").alias("dumped"),
            )
        )
    )
    a = a.filter(F.col("omid").isNotNull())
    b = b.filter(F.col("omid").isNotNull())

    joined = a.join(b, "omid", "full_outer")
    missing = joined.filter(F.col("b_id").isNull()).select(
        "omid", F.lit("missing_in_export").alias("kind"),
        F.lit(None).cast("string").alias("column"),
        F.col("a_id").alias("curated"), F.lit(None).cast("string").alias("dumped"),
    )
    extra = joined.filter(F.col("a_id").isNull()).select(
        "omid", F.lit("extra_in_export").alias("kind"),
        F.lit(None).cast("string").alias("column"),
        F.lit(None).cast("string").alias("curated"), F.col("b_id").alias("dumped"),
    )
    both = joined.filter(F.col("a_id").isNotNull() & F.col("b_id").isNotNull())
    # id-token-set drift (omid matched, but a DOI/ISSN token lost or gained)
    mismatches = both.filter(F.col("a_idset") != F.col("b_idset")).select(
        "omid", F.lit("value_mismatch").alias("kind"), F.lit("id").alias("column"),
        F.col("a_id").alias("curated"), F.col("b_id").alias("dumped"),
    )
    for c in cols:
        mismatches = mismatches.unionByName(
            both.filter(F.col(f"a_{c}") != F.col(f"b_{c}")).select(
                "omid", F.lit("value_mismatch").alias("kind"), F.lit(c).alias("column"),
                F.col(f"a_{c}").alias("curated"), F.col(f"b_{c}").alias("dumped"),
            )
        )
    return malformed.unionByName(missing).unionByName(extra).unionByName(mismatches)
