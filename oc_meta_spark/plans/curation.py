"""The curation pipeline — Spark-native equivalent of the reference Curator
(oc_meta/core/curator.py; lifecycle SURVEY §3.1).

One batch = one job:

    parse cells → clean/validate (F1-F4, C1-C9) → resolve ids against the
    catalog (J1/D2) → unify in-batch duplicates via connected components
    over the row↔id bipartite graph (D3/D4) → mint OMIDs deterministically
    (row_number + catalog counter offset) → equalize with catalog values
    (D5) → agent sequences with explicit pos (D6/D7/W1) → venue/volume/
    issue hierarchy (J3/J6) → entity-table deltas + curated CSV rows +
    index tables + provenance snapshots.

Design-for-scale notes:

- The catalog side of every resolution join is the big side; the batch is
  broadcast (the reference's VALUES-batched SPARQL, lib/finder.py:765-833,
  becomes one broadcast hash join).
- Connected components runs on the *batch's* row↔token bipartite graph —
  size O(batch), never O(catalog).
- Minting is the only serialized step: a deterministic row_number over the
  component canonicals plus a per-kind max-counter offset read from the
  catalog (reference FilesystemCounterHandler, run/meta_process.py:162-168).
  Single-writer per (kind, prefix) by construction.
- Partial dates are strings end-to-end (SURVEY hard part §7.4.3).

Deliberate simplifications vs the reference (documented, not hidden):
- C9 implements the repair-strategy cascade with a representative pattern
  subset, not all ~40 reference regexes;
- the streaming store applies RA updates by parquet rewrite — a production
  deployment would use a Delta MERGE.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.functions.cleaning import clean_date_udf, clean_title_udf
from oc_meta_spark.functions.ids import clean_id_cell_udf
from oc_meta_spark.functions.parsing import (
    build_name_ids_string,
    parse_agent_cell,
    parse_id_cell,
    split_name_and_ids,
)
from oc_meta_spark.functions.volume_issue import repair_vi_udf
from oc_meta_spark.operators.cc import connected_components
from oc_meta_spark.operators.minting import mint_omids
from oc_meta_spark.schemas import (
    CONTAINER_EDITOR_TYPES,
    ENTITY_TABLES,
    TYPE_ALIASES,
    VALID_TYPES,
)

SEQ_TYPES = {"journal article", "journal issue", "journal volume", "journal editorial"}
ROLES = ("author", "editor", "publisher")


@dataclass
class EntityCatalog:
    """The normalized entity store (replaces the triplestore)."""

    br: DataFrame
    ra: DataFrame
    id: DataFrame
    entity_id: DataFrame
    ar: DataFrame
    re: DataFrame
    prov: DataFrame

    @classmethod
    def empty(cls, spark: SparkSession) -> "EntityCatalog":
        return cls(**{f.name: spark.createDataFrame([], ENTITY_TABLES[f.name]) for f in fields(cls)})

    def union(self, delta: "CurationResult") -> "EntityCatalog":
        """Catalog after applying a batch's deltas (append-only tables)."""
        upd = delta.ra_updates.withColumnRenamed("omid", "u_omid").withColumnRenamed("given", "u_given")
        ra = (
            self.ra.join(upd, self.ra.omid == upd.u_omid, "left")
            .withColumn("given", F.coalesce(F.nullif("given", F.lit("")), "u_given"))
            .drop("u_omid", "u_given")
        )
        return EntityCatalog(
            br=self.br.unionByName(delta.br_new),
            ra=ra.unionByName(delta.ra_new),
            id=self.id.unionByName(delta.id_new),
            entity_id=self.entity_id.unionByName(delta.entity_id_new),
            ar=self.ar.unionByName(delta.ar_new),
            re=self.re.unionByName(delta.re_new),
            prov=self.prov.unionByName(delta.prov_new),
        )


@dataclass
class CurationResult:
    curated: DataFrame
    br_new: DataFrame
    ra_new: DataFrame
    ra_updates: DataFrame  # (omid, given) — given-name enrichment of existing RAs
    id_new: DataFrame
    entity_id_new: DataFrame
    ar_new: DataFrame
    re_new: DataFrame
    prov_new: DataFrame
    index_id_br: DataFrame
    index_id_ra: DataFrame
    index_ar: DataFrame
    index_re: DataFrame


# ---------------------------------------------------------------------------
# Stage 1 — parse + clean + validate
# ---------------------------------------------------------------------------


def with_row_ids(df: DataFrame) -> DataFrame:
    """Deterministic per-batch row ids (the reference's file order).

    Stable because the window orders by every input column; ties (exact
    duplicate rows) are interchangeable by definition.
    """
    w = Window.orderBy(*[F.col(c) for c in df.columns])
    return df.withColumn("row_id", F.row_number().over(w).cast("long"))


def _alias_type(col: F.Column) -> F.Column:
    t = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    expr = t
    for alias, target in TYPE_ALIASES.items():
        expr = F.when(t == alias, target).otherwise(expr)
    return F.when(expr.isin(*sorted(VALID_TYPES)), expr).otherwise(F.lit(None))


def stage_parse(input_df: DataFrame) -> DataFrame:
    """11 string columns → typed nested columns, cleaned + validated.

    Implements F1-F4 (validity predicates, type aliasing, semantic
    invalidation) and C1-C10 (normalizers) as one declarative projection.
    """
    from oc_meta_spark.session import ensure_worker_imports

    ensure_worker_imports(input_df.sparkSession)
    df = input_df
    if "row_id" not in df.columns:
        df = with_row_ids(df)

    # D1: in-cell id dedup + validation (drops bad checksums).  The whole
    # cell goes through one Arrow-batched pandas UDF (a Python UDF cannot
    # appear inside a higher-order lambda), then tokens are structified
    # natively.
    ids = F.transform(
        clean_id_cell_udf(F.coalesce(F.col("id"), F.lit(""))),
        lambda t: F.struct(
            F.regexp_extract(t, r"^([^:]*):", 1).alias("schema"),
            F.regexp_extract(t, r"^[^:]*:(.*)$", 1).alias("value"),
        ),
    )

    vi = repair_vi_udf(F.coalesce(F.col("volume"), F.lit("")), F.coalesce(F.col("issue"), F.lit("")))

    df = (
        df.withColumn("ids", ids)
        .withColumn("title_clean", clean_title_udf(F.coalesce(F.col("title"), F.lit(""))))
        .withColumn("pub_date_clean", clean_date_udf(F.coalesce(F.col("pub_date"), F.lit(""))))
        .withColumn("type_clean", _alias_type(F.coalesce(F.col("type"), F.lit(""))))
        .withColumn("venue_parsed", split_name_and_ids(F.coalesce(F.col("venue"), F.lit(""))))
        .withColumn("vi", vi)
        .withColumn("authors", parse_agent_cell(F.coalesce(F.col("author"), F.lit(""))))
        .withColumn("editors", parse_agent_cell(F.coalesce(F.col("editor"), F.lit(""))))
        .withColumn("publishers", parse_agent_cell(F.coalesce(F.col("publisher"), F.lit(""))))
    )

    # F2: default type when ids are present; F4: vol/issue only for journal
    # content with a venue (otherwise cleared).
    has_ids = F.size("ids") > 0
    df = df.withColumn(
        "type_clean",
        F.when(F.col("type_clean").isNull() & has_ids, "journal article").otherwise(F.col("type_clean")),
    )
    journal_content = F.col("type_clean").isin(*sorted(SEQ_TYPES))
    has_venue = F.col("venue_parsed")["name"] != ""
    df = (
        df.withColumn("volume_clean", F.when(journal_content & has_venue, F.col("vi")["volume"]).otherwise(F.lit("")))
        .withColumn("issue_clean", F.when(journal_content & has_venue, F.col("vi")["issue"]).otherwise(F.lit("")))
    )

    # F1: validity — with ids: vol/issue types need venue; without ids:
    # a title (or venue + seq number for volume/issue rows) is required.
    is_vi_type = F.col("type_clean").isin("journal volume", "journal issue")
    valid = F.when(
        has_ids,
        ~(is_vi_type & ~has_venue),
    ).otherwise(
        (F.col("title_clean") != "")
        | (is_vi_type & has_venue & ((F.col("vi")["volume"] != "") | (F.col("vi")["issue"] != "")))
    )
    return df.withColumn("valid", valid).filter(F.col("valid"))


# ---------------------------------------------------------------------------
# Stage 2 — resolution + in-batch dedup (the id_worker / wannabe machinery)
# ---------------------------------------------------------------------------


def _mint(order_col: str, kind: str, prefix: str, offset_df: DataFrame) -> F.Column:
    """omid = kind/prefix{offset + row_number over deterministic order}."""
    w = Window.orderBy(order_col)
    return F.concat(
        F.lit(f"{kind}/{prefix}"),
        (F.row_number().over(w) + F.coalesce(F.broadcast(offset_df).first()["max_n"], F.lit(0))).cast("string"),
    )


def _max_counter(cat_df: DataFrame, kind: str, prefix: str) -> int:
    """Max minted counter for a kind under a prefix (the counter table)."""
    row = (
        cat_df.select(
            F.regexp_extract("omid", rf"^{kind}/{prefix}(\d+)$", 1).cast("long").alias("n")
        )
        .agg(F.max("n").alias("max_n"))
        .first()
    )
    return int(row["max_n"] or 0)


def resolve_brs(staged: DataFrame, catalog: EntityCatalog, prefix: str, small: bool = False) -> DataFrame:
    """Per row: decide existing / new / conflict and assign a br omid.

    Returns (row_id, br_omid, is_new, component, decision).

    - explicit ``omid:br/...`` tokens win when present in the catalog
      (reference priority: explicit OMID > matches, curator id_worker);
    - otherwise (schema, value) joins against id ⋈ entity_id pick matches;
    - rows sharing any id token unify transitively (CC over the bipartite
      row↔token graph — the reference's wannabe union-find, D3);
    - a component matching >1 distinct catalog entity is a conflict ⇒ a
    	new entity is minted holding the ids (curator.py `conflict`).
    """
    spark = staged.sparkSession
    tok = staged.select(
        "row_id", F.explode_outer("ids").alias("t")
    ).select(
        "row_id",
        F.col("t")["schema"].alias("schema"),
        F.col("t")["value"].alias("value"),
    )

    # Explicit OMIDs verified against the catalog.
    explicit = (
        tok.filter((F.col("schema") == "omid") & F.col("value").startswith("br/"))
        .join(catalog.br.select(F.col("omid").alias("value")), "value", "left_semi")
        .select("row_id", F.col("value").alias("cand"))
    )

    # (schema, value) → catalog entity (only br entities).
    ext = tok.filter((F.col("schema") != "omid") & F.col("schema").isNotNull())
    cat_ids = catalog.id.join(
        catalog.entity_id, catalog.id.omid == catalog.entity_id.id_omid
    ).select("schema", "value", "entity_omid")
    matched = (
        ext.join(cat_ids.filter(F.col("entity_omid").startswith("br/")), ["schema", "value"])
        .select("row_id", F.col("entity_omid").alias("cand"))
    )

    # CC over the row↔token bipartite graph (omid tokens included: two rows
    # naming the same explicit omid also unify).
    edges = (
        tok.filter(F.col("schema").isNotNull())
        .select(
            F.concat(F.lit("r:"), F.lpad(F.col("row_id").cast("string"), 12, "0")).alias("src"),
            F.concat(F.lit("t:"), F.col("schema"), F.lit(":"), F.col("value")).alias("dst"),
        )
    )
    comp = connected_components(edges, "src", "dst")
    row_comp = (
        comp.filter(F.col("node").startswith("r:"))
        .select(
            F.regexp_extract("node", r"^r:0*(\d+)$", 1).cast("long").alias("row_id"),
            F.col("comp").alias("component"),
        )
    )
    # Rows with no ids form singleton components.
    all_rows = staged.select("row_id")
    row_comp = all_rows.join(row_comp, "row_id", "left").withColumn(
        "component",
        F.coalesce(F.col("component"), F.concat(F.lit("solo:"), F.col("row_id").cast("string"))),
    )

    # Candidates per component; explicit omids take priority.
    cands = explicit.withColumn("prio", F.lit(0)).unionByName(matched.withColumn("prio", F.lit(1)))
    comp_cands = (
        row_comp.join(cands, "row_id", "left")
        .groupBy("component")
        .agg(
            F.countDistinct("cand").alias("n_cand"),
            F.min(F.when(F.col("prio") == 0, F.col("cand"))).alias("explicit_cand"),
            F.min("cand").alias("any_cand"),
        )
        .withColumn(
            "decision",
            F.when(F.col("n_cand") == 0, "new")
            .when(F.col("explicit_cand").isNotNull(), "existing")
            .when(F.col("n_cand") == 1, "existing")
            .otherwise("conflict"),
        )
        .withColumn(
            "resolved",
            F.when(F.col("decision") == "existing", F.coalesce("explicit_cand", "any_cand")),
        )
    )

    # Mint new omids for new/conflict components, ordered by min row_id.
    comp_order = row_comp.groupBy("component").agg(F.min("row_id").alias("first_row"))
    need_mint = comp_cands.filter(F.col("decision") != "existing").join(comp_order, "component")
    offset = _max_counter(catalog.br, "br", prefix)
    minted = mint_omids(need_mint, ["first_row"], "br", prefix, offset, "minted_omid", small=small).select(
        "component", "minted_omid"
    )

    decisions = (
        comp_cands.join(minted, "component", "left")
        .select(
            "component",
            "decision",
            F.coalesce("resolved", "minted_omid").alias("br_omid"),
            (F.col("decision") != "existing").alias("is_new"),
        )
    )
    return row_comp.join(decisions, "component")


# ---------------------------------------------------------------------------
# Stage 3 — full batch curation
# ---------------------------------------------------------------------------


def curate(
    input_df: DataFrame,
    catalog: EntityCatalog | None = None,
    prefix: str = "060",
    resp_agent: str = "oc_meta_spark",
    batch_ts: str = "1970-01-01T00:00:00Z",
    silencer: bool = False,
) -> CurationResult:
    """Run the full curation batch.  ``batch_ts`` is injected (never wall
    clock) so results are reproducible — the reference's counters give it
    the same property.
    """
    spark = input_df.sparkSession
    if catalog is None:
        catalog = EntityCatalog.empty(spark)

    staged = stage_parse(input_df).localCheckpoint(eager=True)
    # Physical-plan switch: micro-batches mint via a zero-extra-job window;
    # big batches use the fully-distributed rank assignment.  Same omids
    # either way (operators/minting.py).
    small = staged.count() <= 200_000
    resolution = resolve_brs(staged, catalog, prefix, small).localCheckpoint(eager=True)
    rows = staged.join(resolution.select("row_id", "br_omid", "is_new", "decision"), "row_id")

    # --- D4/W5: propagate canonical values within each entity group -------
    wg = Window.partitionBy("br_omid").orderBy("row_id")
    first_nonempty = lambda c: F.first(F.when(F.col(c) != "", F.col(c)), ignorenulls=True).over(
        wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rows = (
        rows.withColumn("title_g", F.coalesce(first_nonempty("title_clean"), F.lit("")))
        .withColumn("date_g", F.coalesce(first_nonempty("pub_date_clean"), F.lit("")))
        .withColumn("rn_in_entity", F.row_number().over(wg))
    )

    # One output row per entity (last-wins dedup by id, curator.py:333).
    entity_rows = rows.filter(F.col("rn_in_entity") == 1).drop("rn_in_entity")

    # --- D5 equalizer: catalog values take precedence ---------------------
    cat_br = catalog.br.select(
        F.col("omid").alias("br_omid"),
        F.col("title").alias("cat_title"),
        F.col("pub_date").alias("cat_date"),
        F.col("type").alias("cat_type"),
        F.col("embodiment").alias("cat_embodiment"),
    )
    entity_rows = (
        entity_rows.join(F.broadcast(cat_br), "br_omid", "left")
        .withColumn("title_f", F.coalesce(F.nullif("cat_title", F.lit("")), F.nullif("title_g", F.lit("")), F.lit("")))
        .withColumn("date_f", F.coalesce(F.nullif("cat_date", F.lit("")), F.nullif("date_g", F.lit("")), F.lit("")))
        .withColumn("type_f", F.coalesce(F.nullif("cat_type", F.lit("")), F.col("type_clean")))
    ).localCheckpoint(eager=True)

    # --- identifier entities: mint id/ omids for tokens new to the catalog
    toks = (
        staged.select("row_id", F.explode("ids").alias("t"))
        .join(resolution.select("row_id", "br_omid"), "row_id")
        .select(F.col("t")["schema"].alias("schema"), F.col("t")["value"].alias("value"), "br_omid")
        .filter(F.col("schema") != "omid")
        .dropDuplicates(["schema", "value", "br_omid"])
    )
    id_offset = _max_counter(catalog.id, "id", prefix)
    new_tokens = mint_omids(
        toks.select("schema", "value")
        .dropDuplicates()
        .join(catalog.id.select("schema", "value"), ["schema", "value"], "left_anti"),
        ["schema", "value"],
        "id",
        prefix,
        id_offset,
        "id_omid",
        small=small,
    ).localCheckpoint(eager=True)
    id_new = new_tokens.select(F.col("id_omid").alias("omid"), "schema", "value")
    all_id_omids = catalog.id.unionByName(id_new)

    entity_id_new = (
        toks.join(all_id_omids.withColumnRenamed("omid", "id_omid"), ["schema", "value"])
        .select(F.col("br_omid").alias("entity_omid"), "id_omid")
        .join(catalog.entity_id, ["entity_omid", "id_omid"], "left_anti")
        .dropDuplicates()
    )

    # --- venue / volume / issue hierarchy (J3) ----------------------------
    venues = (
        entity_rows.filter(F.col("venue_parsed")["name"] != "")
        .select(
            "br_omid",
            F.col("venue_parsed")["name"].alias("v_name"),
            F.col("venue_parsed")["ids"].alias("v_ids"),
            "volume_clean",
            "issue_clean",
            # C14 venue-type inference: journal-content rows imply a journal
            # container, chapter-like rows a book (reference creator.py
            # venue-class dispatch, core/creator.py:393-431).
            F.when(
                F.col("type_f").isin(*sorted(SEQ_TYPES)), "journal"
            ).otherwise("book").alias("v_type_hint"),
        )
    )
    v_tok = venues.select("br_omid", F.explode_outer("v_ids").alias("t")).select(
        "br_omid", F.col("t")["schema"].alias("schema"), F.col("t")["value"].alias("value")
    )
    cat_ids_all = catalog.id.join(catalog.entity_id, catalog.id.omid == catalog.entity_id.id_omid).select(
        "schema", "value", "entity_omid"
    )
    v_match = (
        v_tok.join(cat_ids_all, ["schema", "value"])
        .join(
            catalog.br.filter(F.col("type").isin("journal", "book")).select(F.col("omid").alias("entity_omid")),
            "entity_omid",
            "left_semi",
        )
        .groupBy("br_omid")
        .agg(F.min("entity_omid").alias("venue_existing"))
    )
    venues = venues.join(v_match, "br_omid", "left")
    # unresolved venues dedup by lowercase name within the batch
    new_venues = (
        venues.filter(F.col("venue_existing").isNull())
        .select(F.lower("v_name").alias("v_key"), F.col("v_name"), F.col("v_type_hint"))
        .groupBy("v_key")
        .agg(F.min("v_name").alias("v_name"), F.max("v_type_hint").alias("v_type"))
    )
    br_offset_2 = _max_counter(catalog.br, "br", prefix) + resolve_count(resolution)
    new_venues = mint_omids(new_venues, ["v_key"], "br", prefix, br_offset_2, "venue_omid", small=small).localCheckpoint(
        eager=True
    )
    venues = (
        venues.withColumn("v_key", F.lower("v_name"))
        .join(new_venues.select("v_key", "venue_omid"), "v_key", "left")
        .withColumn("venue_omid", F.coalesce("venue_existing", "venue_omid"))
    ).localCheckpoint(eager=True)

    # volumes / issues as child BRs keyed (venue, seq).  Existing children
    # come from the catalog (part_of + seq_id); the rest are minted.
    def _resolve_children(parent_col: str, seq_col: str, kind_type: str, offset: int, src: DataFrame) -> DataFrame:
        need = src.filter(F.col(seq_col) != "").select(parent_col, seq_col).dropDuplicates()
        cat_children = catalog.br.filter(F.col("type") == kind_type).select(
            F.col("part_of").alias(parent_col), F.col("seq_id").alias(seq_col), F.col("omid").alias("child_omid")
        )
        resolved = need.join(cat_children, [parent_col, seq_col], "left")
        new = mint_omids(
            resolved.filter(F.col("child_omid").isNull()).drop("child_omid"),
            [parent_col, seq_col],
            "br",
            prefix,
            offset,
            "child_omid",
            small=small,
        )
        return resolved.filter(F.col("child_omid").isNotNull()).unionByName(new).localCheckpoint(eager=True)

    vol_src = venues.filter(F.col("volume_clean") != "").select(
        F.col("venue_omid").alias("parent"), F.col("volume_clean").alias("seq")
    )
    n_new_venues = new_venues.count()
    volumes = _resolve_children("parent", "seq", "journal volume", br_offset_2 + n_new_venues, vol_src)
    n_new_vols = volumes.join(
        catalog.br.select(F.col("omid").alias("child_omid")), "child_omid", "left_anti"
    ).count()

    iss_parent = (
        venues.filter(F.col("issue_clean") != "")
        .join(
            volumes.withColumnRenamed("parent", "venue_omid").withColumnRenamed("seq", "volume_clean"),
            ["venue_omid", "volume_clean"],
            "left",
        )
        .select(
            "br_omid",
            F.coalesce(F.col("child_omid"), F.col("venue_omid")).alias("parent"),
            F.col("issue_clean").alias("seq"),
        )
    )
    issues = _resolve_children(
        "parent", "seq", "journal issue", br_offset_2 + n_new_venues + n_new_vols, iss_parent.select("parent", "seq")
    )

    # article's container: issue > volume > venue
    vol_of_row = venues.select(
        "br_omid", "venue_omid", "volume_clean", "issue_clean"
    ).join(
        volumes.select(F.col("parent").alias("venue_omid"), F.col("seq").alias("volume_clean"), F.col("child_omid").alias("vol_omid")),
        ["venue_omid", "volume_clean"],
        "left",
    )
    iss_of_row = iss_parent.select("br_omid", "parent", "seq").join(
        issues.withColumnRenamed("child_omid", "iss_omid"), ["parent", "seq"], "left"
    ).select("br_omid", "iss_omid")
    container = (
        vol_of_row.join(iss_of_row, "br_omid", "left")
        .select(
            "br_omid",
            F.coalesce("iss_omid", "vol_omid", "venue_omid").alias("part_of"),
            "venue_omid",
            "vol_omid",
            "iss_omid",
        )
    ).localCheckpoint(eager=True)

    # --- RE (pages) -------------------------------------------------------
    pages = entity_rows.filter(
        (F.coalesce(F.col("page"), F.lit("")) != "") & F.col("cat_embodiment").isNull()
    ).select(
        "br_omid",
        F.regexp_extract(F.translate(F.col("page"), "‐‑‒–—―−﹘﹣－", "----------"), r"^\s*([^-\s]+)\s*(?:-\s*([^-\s]+))?\s*$", 1).alias("start_page"),
        F.regexp_extract(F.translate(F.col("page"), "‐‑‒–—―−﹘﹣－", "----------"), r"^\s*([^-\s]+)\s*(?:-\s*([^-\s]+))?\s*$", 2).alias("end_page"),
    )
    re_offset = _max_counter(catalog.re, "re", prefix)
    re_new = mint_omids(pages, ["br_omid"], "re", prefix, re_offset, small=small).localCheckpoint(eager=True)

    # --- agents (D6/D7): RA resolution + AR chains with pos ---------------
    agents = None
    for role, col in (("author", "authors"), ("editor", "editors"), ("publisher", "publishers")):
        # display_br = the input row's entity (curated-CSV attribution);
        # br_omid may be retargeted to the container for the GRAPH (ARs).
        part = entity_rows.select(
            "br_omid", "type_f", F.lit(role).alias("role"), F.explode(col).alias("a")
        ).withColumn("display_br", F.col("br_omid"))
        if role == "editor":
            # Editors of chapter-like types belong to the CONTAINER BR
            # (reference get_edited_br_metaid, core/curator.py:1538-1546;
            # CONTAINER_EDITOR_TYPES constants.py:60-68).
            part = (
                part.join(container.select("br_omid", "venue_omid"), "br_omid", "left")
                .withColumn(
                    "br_omid",
                    F.when(
                        F.col("type_f").isin(*sorted(CONTAINER_EDITOR_TYPES))
                        & F.col("venue_omid").isNotNull(),
                        F.col("venue_omid"),
                    ).otherwise(F.col("br_omid")),
                )
                .drop("venue_omid")
            )
        part = part.drop("type_f")
        agents = part if agents is None else agents.unionByName(part)
    agents = (
        agents.select(
            "br_omid",
            "display_br",
            "role",
            F.col("a")["family"].alias("family"),
            F.col("a")["given"].alias("given"),
            F.col("a")["org_name"].alias("org_name"),
            F.col("a")["ids"].alias("a_ids"),
            F.col("a")["pos"].alias("pos"),
        )
        # C7: drop Not Available agents
        .filter(
            F.lower(F.coalesce(F.col("family"), F.col("org_name"), F.lit(""))) != "not available"
        )
        .withColumn("agent_key", F.concat_ws("|", "br_omid", "role", F.col("pos").cast("string")))
    ).localCheckpoint(eager=True)

    # D6: ids appearing under >1 agent of the same (br, role) are dropped.
    a_tok = agents.select("agent_key", "br_omid", "role", F.explode_outer("a_ids").alias("t")).select(
        "agent_key",
        "br_omid",
        "role",
        F.col("t")["schema"].alias("schema"),
        F.col("t")["value"].alias("value"),
    )
    shared = (
        a_tok.filter(F.col("schema").isNotNull())
        .groupBy("br_omid", "role", "schema", "value")
        .agg(F.countDistinct("agent_key").alias("n_agents"))
        .filter(F.col("n_agents") > 1)
        .select("br_omid", "role", "schema", "value")
    )
    a_tok_clean = a_tok.join(shared, ["br_omid", "role", "schema", "value"], "left_anti").filter(
        F.col("schema").isNotNull()
    )

    # RA resolution via ids (catalog) + in-batch unification via shared ids.
    ra_match = (
        a_tok_clean.filter(F.col("schema") != "omid")
        .join(cat_ids_all.filter(F.col("entity_omid").startswith("ra/")), ["schema", "value"])
        .groupBy("agent_key")
        .agg(F.min("entity_omid").alias("ra_existing"))
    )

    # D7 name fallback: agents without an id match resolve by exact name
    # against the BR's EXISTING agent chain (reference clean_ra,
    # oc_meta/core/curator.py:575-742 — chain-scoped, not catalog-wide).
    chain = catalog.ar.select(
        F.col("br_omid").alias("c_br"), F.col("role").alias("c_role"), F.col("ra_omid").alias("c_ra")
    ).join(
        catalog.ra.select(
            F.col("omid").alias("c_ra"),
            F.col("name").alias("c_name"),
            F.col("family").alias("c_family"),
            F.col("given").alias("c_given"),
        ),
        "c_ra",
    )
    name_match = (
        agents.join(
            chain,
            (F.col("br_omid") == F.col("c_br"))
            & (F.col("role") == F.col("c_role"))
            & F.col("family").eqNullSafe(F.col("c_family"))
            & F.col("given").eqNullSafe(F.col("c_given"))
            & F.col("org_name").eqNullSafe(F.col("c_name")),
        )
        .groupBy("agent_key")
        .agg(F.min("c_ra").alias("ra_name_match"))
    )
    a_edges = a_tok_clean.select(
        F.concat(F.lit("a:"), F.col("agent_key")).alias("src"),
        F.concat(F.lit("t:"), F.col("schema"), F.lit(":"), F.col("value")).alias("dst"),
    )
    a_comp = connected_components(a_edges, "src", "dst")
    agent_comp = a_comp.filter(F.col("node").startswith("a:")).select(
        F.expr("substring(node, 3)").alias("agent_key"), F.col("comp").alias("a_component")
    )
    agents = (
        agents.join(agent_comp, "agent_key", "left")
        .withColumn("a_component", F.coalesce("a_component", F.concat(F.lit("solo:"), F.col("agent_key"))))
        .join(ra_match, "agent_key", "left")
        .join(name_match, "agent_key", "left")
    )
    # Priority per unified component: id match > chain name match > new RA.
    comp_ra = agents.groupBy("a_component").agg(
        F.coalesce(F.min("ra_existing"), F.min("ra_name_match")).alias("comp_ra_existing")
    )
    agents = agents.join(comp_ra, "a_component")
    ra_offset = _max_counter(catalog.ra, "ra", prefix)
    new_ra_comps = (
        agents.filter(F.col("comp_ra_existing").isNull())
        .groupBy("a_component")
        .agg(
            F.min("agent_key").alias("first_key"),
            F.min("family").alias("family"),
            F.min("given").alias("given"),
            F.min("org_name").alias("org_name"),
        )
    )
    new_ra_comps = mint_omids(new_ra_comps, ["first_key"], "ra", prefix, ra_offset, "ra_omid", small=small).localCheckpoint(
        eager=True
    )
    agents = (
        agents.join(new_ra_comps.select("a_component", "ra_omid"), "a_component", "left")
        .withColumn("ra_omid", F.coalesce("comp_ra_existing", "ra_omid"))
    ).localCheckpoint(eager=True)

    # Given-name enrichment (reference name_check, core/curator.py:1013-1022):
    # an id-matched agent supplying a given name fills a catalog RA that has
    # only 'Family,'.
    cat_ra_names = catalog.ra.select(
        F.col("omid").alias("ra_omid"),
        F.col("family").alias("cat_family"),
        F.col("given").alias("cat_given"),
    )
    ra_updates = (
        agents.filter(F.col("given").isNotNull() & (F.col("given") != ""))
        .join(cat_ra_names, "ra_omid")
        .filter(F.col("cat_given").isNull() | (F.col("cat_given") == ""))
        .filter(F.col("cat_family").isNotNull() & (F.col("cat_family") == F.col("family")))
        .groupBy("ra_omid")
        .agg(F.min("given").alias("given"))
        .select(F.col("ra_omid").alias("omid"), "given")
    ).localCheckpoint(eager=True)

    ra_new = new_ra_comps.select(
        F.col("ra_omid").alias("omid"),
        F.col("org_name").alias("name"),
        "family",
        "given",
    )

    # AR rows: positions continue any existing chain (max pos per br+role).
    # Agents resolving to an RA already present in the BR's chain get NO new
    # AR (the reference keeps the survivor chain; re-curation is a no-op).
    existing_max = catalog.ar.groupBy(F.col("br_omid"), F.col("role")).agg(F.max("pos").alias("base_pos"))
    ar_offset = _max_counter(catalog.ar, "ar", prefix)
    new_ar_agents = agents.join(
        catalog.ar.select("br_omid", "role", "ra_omid"), ["br_omid", "role", "ra_omid"], "left_anti"
    )
    if silencer:
        # Silencer mode (reference run/meta_process.py:127-159): suppress
        # agent-role ADDITIONS on preexisting entities — modifications of
        # other fields still apply; new entities get their chains normally.
        preexisting = catalog.br.select("omid").withColumnRenamed("omid", "br_omid")
        new_ar_agents = new_ar_agents.join(preexisting, "br_omid", "left_anti")
    w_newpos = Window.partitionBy("br_omid", "role").orderBy("pos")
    ar_new = (
        new_ar_agents.join(existing_max, ["br_omid", "role"], "left")
        # chain continues contiguously: rank among NEW agents only, so
        # agents that matched existing chain slots leave no position gaps
        .withColumn(
            "pos_final",
            (F.coalesce(F.col("base_pos"), F.lit(0)) + F.row_number().over(w_newpos)).cast("int"),
        )
    )
    ar_new = (
        mint_omids(ar_new, ["br_omid", "role", "pos_final"], "ar", prefix, ar_offset, small=small)
        .select("omid", "br_omid", "role", "ra_omid", F.col("pos_final").alias("pos"))
    ).localCheckpoint(eager=True)

    # RA identifier links.
    ra_tok = (
        a_tok_clean.filter(F.col("schema") != "omid")
        .join(agents.select("agent_key", "ra_omid"), "agent_key")
        .select("schema", "value", F.col("ra_omid").alias("entity_omid"))
        .dropDuplicates()
    )
    ra_id_new_tokens = (
        ra_tok.select("schema", "value")
        .dropDuplicates()
        .join(all_id_omids.select("schema", "value"), ["schema", "value"], "left_anti")
    )
    ra_id_new_tokens = (
        mint_omids(ra_id_new_tokens, ["schema", "value"], "id", prefix, id_offset + id_new.count(), small=small)
        .select("omid", "schema", "value")
    ).localCheckpoint(eager=True)
    id_new = id_new.unionByName(ra_id_new_tokens)
    all_id_omids = all_id_omids.unionByName(ra_id_new_tokens)
    entity_id_new = entity_id_new.unionByName(
        ra_tok.join(all_id_omids.withColumnRenamed("omid", "id_omid"), ["schema", "value"])
        .select("entity_omid", "id_omid")
        .join(catalog.entity_id, ["entity_omid", "id_omid"], "left_anti")
        .dropDuplicates()
    )

    # Venue identifier links: minted venue entities carry the issn/etc ids
    # that named them (closes the resolution loop for future batches).
    ven_tok = (
        v_tok.filter(F.col("schema").isNotNull() & (F.col("schema") != "omid"))
        .join(venues.select("br_omid", "venue_omid"), "br_omid")
        .filter(F.col("venue_omid").isNotNull())
        .select("schema", "value", F.col("venue_omid").alias("entity_omid"))
        .dropDuplicates()
    )
    ven_new_tokens = (
        mint_omids(
            ven_tok.select("schema", "value")
            .dropDuplicates()
            .join(all_id_omids.select("schema", "value"), ["schema", "value"], "left_anti"),
            ["schema", "value"],
            "id",
            prefix,
            id_offset + id_new.count(),
            small=small,
        )
        .select("omid", "schema", "value")
    ).localCheckpoint(eager=True)
    id_new = id_new.unionByName(ven_new_tokens)
    all_id_omids = all_id_omids.unionByName(ven_new_tokens)
    entity_id_new = entity_id_new.unionByName(
        ven_tok.join(all_id_omids.withColumnRenamed("omid", "id_omid"), ["schema", "value"])
        .select("entity_omid", "id_omid")
        .join(catalog.entity_id, ["entity_omid", "id_omid"], "left_anti")
        .dropDuplicates()
    )

    # --- entity deltas ----------------------------------------------------
    new_work_rows = entity_rows.filter(F.col("is_new")).join(container, "br_omid", "left").join(
        re_new.select("br_omid", F.col("omid").alias("re_omid")), "br_omid", "left"
    )
    br_new = new_work_rows.select(
        F.col("br_omid").alias("omid"),
        F.col("type_f").alias("type"),
        F.col("title_f").alias("title"),
        F.col("date_f").alias("pub_date"),
        F.lit(None).cast("string").alias("seq_id"),
        F.col("part_of"),
        F.col("re_omid").alias("embodiment"),
    )
    br_new = br_new.unionByName(
        new_venues.select(
            F.col("venue_omid").alias("omid"),
            F.col("v_type").alias("type"),
            F.col("v_name").alias("title"),
            F.lit(None).cast("string").alias("pub_date"),
            F.lit(None).cast("string").alias("seq_id"),
            F.lit(None).cast("string").alias("part_of"),
            F.lit(None).cast("string").alias("embodiment"),
        )
    )
    for child_df, child_type in ((volumes, "journal volume"), (issues, "journal issue")):
        new_children = child_df.join(
            catalog.br.select(F.col("omid").alias("child_omid")), "child_omid", "left_anti"
        )
        br_new = br_new.unionByName(
            new_children.select(
                F.col("child_omid").alias("omid"),
                F.lit(child_type).alias("type"),
                F.lit(None).cast("string").alias("title"),
                F.lit(None).cast("string").alias("pub_date"),
                F.col("seq").alias("seq_id"),
                F.col("parent").alias("part_of"),
                F.lit(None).cast("string").alias("embodiment"),
            )
        )

    re_out = re_new.select("omid", "start_page", F.nullif("end_page", F.lit("")).alias("end_page"))

    # --- provenance snapshots (creation for every minted entity) ----------
    created = (
        br_new.select("omid")
        .unionByName(ra_new.select("omid"))
        .unionByName(id_new.select("omid"))
        .unionByName(ar_new.select("omid"))
        .unionByName(re_out.select("omid"))
    )
    prov_new = created.select(
        F.col("omid").alias("entity_omid"),
        F.lit(1).alias("snapshot"),
        F.lit(batch_ts).alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array().cast("array<string>").alias("derived_from"),
        F.lit(resp_agent).alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity created").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    # Modification snapshots for existing entities that gained identifiers.
    prev_max = catalog.prov.groupBy(F.col("entity_omid")).agg(F.max("snapshot").alias("prev_n"))
    modified = (
        entity_id_new.select("entity_omid")
        .dropDuplicates()
        .join(created.withColumnRenamed("omid", "entity_omid"), "entity_omid", "left_anti")
    )
    modified = modified.unionByName(ra_updates.select(F.col("omid").alias("entity_omid")))
    prov_new = prov_new.unionByName(
        modified.join(prev_max, "entity_omid", "left")
        .select(
            "entity_omid",
            (F.coalesce("prev_n", F.lit(0)) + 1).cast("int").alias("snapshot"),
            F.lit(batch_ts).alias("generated_at"),
            F.lit(None).cast("string").alias("invalidated_at"),
            F.array(F.col("entity_omid")).cast("array<string>").alias("derived_from"),
            F.lit(resp_agent).alias("resp_agent"),
            F.lit(None).cast("string").alias("primary_source"),
            F.lit("entity modified").alias("description"),
            F.lit(None).cast("string").alias("update_query"),
        )
    )

    # --- curated output rows + indexes ------------------------------------
    ext_ids_per_br = (
        toks.groupBy("br_omid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("schema", "value"))),
                    lambda s: F.concat_ws(":", s["schema"], s["value"]),
                ),
                " ",
            ).alias("ext_ids")
        )
    )
    agents_str = (
        agents.withColumn(
            "display",
            F.when(
                F.col("org_name").isNotNull(), F.col("org_name")
            ).otherwise(F.concat_ws(", ", F.col("family"), F.col("given"))),
        )
        .withColumn(
            "ids_str",
            F.concat(F.lit("omid:"), F.col("ra_omid")),
        )
        .withColumn("entry", F.concat(F.col("display"), F.lit(" ["), F.col("ids_str"), F.lit("]")))
        .groupBy(F.col("display_br").alias("br_omid"), F.col("role"))
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "entry"))), lambda s: s["entry"]),
                "; ",
            ).alias("agents_joined")
        )
    )
    agent_cols = {}
    for role in ROLES:
        agent_cols[role] = agents_str.filter(F.col("role") == role).select(
            "br_omid", F.col("agents_joined").alias(f"{role}_str")
        )

    curated = (
        entity_rows.join(ext_ids_per_br, "br_omid", "left")
        .join(container.select("br_omid", "venue_omid"), "br_omid", "left")
        .join(venues.select("br_omid", "v_name"), "br_omid", "left")
        .join(agent_cols["author"], "br_omid", "left")
        .join(agent_cols["editor"], "br_omid", "left")
        .join(agent_cols["publisher"], "br_omid", "left")
        .select(
            F.col("row_id"),
            F.concat_ws(
                " ", F.nullif(F.coalesce("ext_ids", F.lit("")), F.lit("")), F.concat(F.lit("omid:"), F.col("br_omid"))
            ).alias("id"),
            F.col("title_f").alias("title"),
            F.coalesce("author_str", F.lit("")).alias("author"),
            F.col("date_f").alias("pub_date"),
            F.when(
                F.col("v_name").isNotNull(),
                F.concat(F.col("v_name"), F.lit(" [omid:"), F.col("venue_omid"), F.lit("]")),
            ).otherwise("").alias("venue"),
            F.col("volume_clean").alias("volume"),
            F.col("issue_clean").alias("issue"),
            F.translate(F.coalesce("page", F.lit("")), "\u2010\u2011\u2012\u2013\u2014\u2015\u2212\ufe58\ufe63\uff0d", "----------").alias("page"),
            F.col("type_f").alias("type"),
            F.coalesce("publisher_str", F.lit("")).alias("publisher"),
            F.coalesce("editor_str", F.lit("")).alias("editor"),
        )
        .orderBy("row_id")
    )

    index_id_br = (
        toks.join(all_id_omids.withColumnRenamed("omid", "id_omid"), ["schema", "value"])
        .select(F.concat_ws(":", "schema", "value").alias("id"), F.col("id_omid").alias("meta"))
        .dropDuplicates()
    )
    index_id_ra = (
        ra_tok.join(all_id_omids.withColumnRenamed("omid", "id_omid"), ["schema", "value"])
        .select(F.concat_ws(":", "schema", "value").alias("id"), F.col("id_omid").alias("meta"))
        .dropDuplicates()
    )
    index_ar = (
        ar_new.withColumn("pair", F.concat_ws(", ", "omid", "ra_omid"))
        .groupBy("br_omid", "role")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "pair"))), lambda s: s["pair"]),
                "; ",
            ).alias("chain")
        )
        .groupBy("br_omid")
        .pivot("role", list(ROLES))
        .agg(F.first("chain"))
        .select(
            F.col("br_omid").alias("meta"),
            F.coalesce("author", F.lit("")).alias("author"),
            F.coalesce("editor", F.lit("")).alias("editor"),
            F.coalesce("publisher", F.lit("")).alias("publisher"),
        )
    )
    index_re = re_out.join(
        re_new.select("br_omid", F.col("omid").alias("re_omid")), re_out.omid == F.col("re_omid")
    ).select(F.col("br_omid").alias("br"), F.col("re_omid").alias("re"))

    return CurationResult(
        curated=curated,
        br_new=br_new,
        ra_new=ra_new,
        ra_updates=ra_updates,
        id_new=id_new,
        entity_id_new=entity_id_new,
        ar_new=ar_new,
        re_new=re_out,
        prov_new=prov_new,
        index_id_br=index_id_br,
        index_id_ra=index_id_ra,
        index_ar=index_ar,
        index_re=index_re,
    )


def resolve_count(resolution: DataFrame) -> int:
    """Number of newly-minted BR components in a resolution DataFrame."""
    return (
        resolution.filter(F.col("is_new"))
        .select("component")
        .dropDuplicates()
        .count()
    )
