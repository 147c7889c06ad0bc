"""The curation pipeline — Spark-native equivalent of the reference Curator
(oc_meta/core/curator.py; lifecycle SURVEY §3.1).

One batch = one job, staged exactly like the reference's phases
(curator.py:253-333):

    pre-pass + validity (curator.py:130-140, 1468-1535) → parse + clean
    (C1-C11) → resolve ids against the catalog (clean_id / id_worker,
    curator.py:344-397, 1167-1304) → equalize resolved rows with catalog
    values (equalizer, curator.py:1402-1449) → collapse in-batch duplicate
    rows (merge_duplicate_entities, curator.py:1355-1389 + the final
    last-wins dedup curator.py:333) → venue/volume/issue graph (clean_vvi,
    curator.py:420-567) → agent chains (clean_ra, curator.py:575-742) →
    mint OMIDs → entity-table deltas + curated CSV rows + index tables +
    provenance snapshots (meta_maker/enrich/indexer, curator.py:904-1101).

Design-for-scale notes:

- The catalog side of every resolution join is the big side; no broadcast
  hints are placed on catalog tables — AQE picks the strategy, and the
  batch side is the naturally-small probe (the reference's VALUES-batched
  SPARQL, lib/finder.py:765-833, becomes a hash join).
- Connected components runs on the *batch's* mention↔token bipartite
  graph — size O(batch), never O(catalog).
- All new entities of a kind are minted in ONE contiguous-rank pass
  (operators/minting.py) with a kind-priority sort key — works, venues,
  volumes and issues share a single br counter read; no per-stage counts.
- Counters come from the persisted ``counters`` table (one collect of
  ≤5 rows — the reference's FilesystemCounterHandler,
  run/meta_process.py:162-168); a full-catalog scan happens only as a
  fallback for hand-built catalogs with no counter table.
- Checkpoints are LAZY (``localCheckpoint(eager=False)``): they cut
  lineage and guarantee single evaluation of shared stages without
  serializing the batch into a chain of blocking driver jobs.
- Partial dates are strings end-to-end (SURVEY hard part §7.4.3).

Deliberate simplifications vs the reference (documented, not hidden):
- rows merged into an entity via the (venue, seq) volume/issue path do
  not receive equalizer field overrides (the reference skips them too —
  equalizer runs only for id-resolved rows);
- orphan wannabe entities (duplicate-row venue mentions that the
  reference numbers but never materializes) are not minted, so raw
  counter values can differ from the reference by the orphan count —
  OMID-normalized comparisons are unaffected.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.functions.cleaning import (
    clean_date_udf,
    clean_title_udf,
    normalize_hyphens,
)
from oc_meta_spark.functions.ids import clean_id_cell_udf
from oc_meta_spark.functions.prov_deltas import (
    append_snapshots,
    kind_graph as _pd_kind_graph,
    sparql_update as _pd_sparql_update,
    triple as _pd_triple,
    uri as _pd_uri,
)
from oc_meta_spark.functions.parsing import parse_agent_cell_udf
from oc_meta_spark.functions.volume_issue import repair_vi_full_udf
from oc_meta_spark.operators.cc import connected_components
from oc_meta_spark.operators.minting import mint_omids
from oc_meta_spark.schemas import (
    CONTAINER_EDITOR_TYPES,
    COUNTER_SCHEMA,
    ENTITY_TABLES,
    TYPE_ALIASES,
    VALID_TYPES,
    VENUE_TYPES,
)

# F4: only journal content carries volume/issue (reference clean_vvi,
# curator.py:439-446 — 'journal editorial' is NOT in this set).
SEQ_TYPES = {"journal article", "journal issue", "journal volume"}
ROLES = ("author", "editor", "publisher")
# AR minting order follows the reference's per-row clean_ra call order:
# author, publisher, editor (curator.py:310-314).
ROLE_RANK = {"author": 0, "publisher": 1, "editor": 2}

SMALL_BATCH_ROWS = 200_000


import os
import time as _time

_CP_MODE = os.environ.get("OCMS_CP_MODE", "eager")
_DBG = bool(os.environ.get("OCMS_CURATE_DEBUG"))
_T0 = [0.0]


def _mark(label: str) -> None:
    if _DBG:
        now = _time.time()
        print(f"CURATE[{label}] +{now - _T0[0]:.1f}s", flush=True)
        _T0[0] = now


_CP_LEVEL = int(os.environ.get("OCMS_CP_LEVEL", "2"))


def _cp_opt(df: DataFrame) -> DataFrame:
    """Optional lineage cut (lvl=2): helps only when the surrounding plan
    is pathological; skipped at OCMS_CP_LEVEL=1 to save an optimizer pass
    per site on micro-batches."""
    return _cp(df, lvl=2)


def _cp(df: DataFrame, lvl: int = 1) -> DataFrame:
    """Lineage cut at stage boundaries.

    ``localCheckpoint`` alone is NOT enough: it carries the child plan's
    size-in-bytes estimate forward as the new LogicalRDD's origin stats.
    Join-size estimates MULTIPLY, so across checkpoint generations the
    BigInt digit count compounds geometrically and Catalyst ends up doing
    Toom-Cook multiplications on numbers with millions of digits (minutes
    of driver CPU per plan).  Rebuilding the frame as a fresh LogicalRDD
    over the already-checkpointed InternalRow RDD resets the stats to the
    bounded default; AQE still sees the REAL sizes at runtime, so join
    strategy selection is unaffected."""
    if _CP_MODE == "none" or lvl > _CP_LEVEL:
        return df
    t0 = _time.time() if _DBG else 0.0
    if _CP_MODE == "local":
        # micro-batch path: materialize to a LocalRelation so Catalyst sees
        # TRUE sizes — empty frames prune joins outright, small frames
        # broadcast statically instead of shuffling until AQE intervenes.
        out = df.sparkSession.createDataFrame(df.collect(), df.schema)
        if _DBG:
            print(f"CURATE[_cp-local] {_time.time() - t0:.2f}s", flush=True)
        return out
    cp = df.localCheckpoint(eager=_CP_MODE == "eager")
    if _DBG:
        import traceback

        site = next(
            (f.lineno for f in reversed(traceback.extract_stack()) if f.name == "curate"), 0
        )
        print(f"CURATE[_cp@{site}] {_time.time() - t0:.2f}s", flush=True)
    try:
        return _strip_stats(cp)
    except Exception:
        # fall back on any internal-API drift: the checkpointed frame is
        # correct either way, only the compounding-stats mitigation is
        # lost (slower Catalyst analysis on very deep pipelines).
        # tests/test_curation.py::test_cp_fallback_path_equivalent forces
        # this branch and pins output equality, so a Spark upgrade that
        # removes the private API fails loudly into a verified path.
        return cp


def _strip_stats(cp: DataFrame) -> DataFrame:
    """Rebuild a checkpointed frame as a fresh LogicalRDD over its
    already-materialized InternalRow RDD, resetting the inherited
    size-in-bytes stats (see _cp docstring).  Uses the PRIVATE
    ``internalCreateDataFrame`` JVM API — version-pin risk, which is why
    callers must treat any exception as "keep the plain checkpoint"."""
    spark = cp.sparkSession
    jdf = spark._jsparkSession.internalCreateDataFrame(
        cp._jdf.queryExecution().toRdd(), cp._jdf.schema(), False
    )
    return DataFrame(jdf, spark)


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
    counters: DataFrame | None = None

    @classmethod
    def empty(cls, spark: SparkSession) -> "EntityCatalog":
        kwargs = {
            f.name: spark.createDataFrame([], ENTITY_TABLES[f.name])
            for f in fields(cls)
            if f.name != "counters"
        }
        kwargs["counters"] = spark.createDataFrame([], COUNTER_SCHEMA)
        return cls(**kwargs)

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
            prov=append_snapshots(self.prov, delta.prov_new),
            counters=delta.counters_new,
        )


def _plan_is_leaf(df: DataFrame) -> bool:
    """True when the logical plan is a single relation (parquet scan,
    LocalRelation, checkpointed RDD) — cutting those would only cost."""
    try:
        name = df._jdf.queryExecution().logical().getClass().getSimpleName()
    except Exception:  # pragma: no cover — any classic/connect drift
        return False
    return name in {"LogicalRelation", "LogicalRDD", "LocalRelation", "Range"}


def _normalize_catalog(catalog: EntityCatalog) -> EntityCatalog:
    """Cut non-leaf catalog plans ONCE per batch.

    curate() references every catalog table many times; when the catalog
    is an in-session union chain (tests, EntityCatalog.union across
    micro-batches) each reference re-embeds the whole lineage and Catalyst
    analysis goes quadratic.  A leaf relation (the production case — a
    parquet table) is left untouched so filter/column pushdown still
    reaches the scan."""
    kwargs = {}
    for f in fields(EntityCatalog):
        df = getattr(catalog, f.name)
        if df is not None and not _plan_is_leaf(df):
            df = _cp(df)
        kwargs[f.name] = df
    return EntityCatalog(**kwargs)



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
    counters_new: DataFrame  # post-batch (kind, max_n) — persist with the catalog


# ---------------------------------------------------------------------------
# Counters
# ---------------------------------------------------------------------------

_KINDS = ("br", "ra", "id", "ar", "re")


def _read_counters(catalog: EntityCatalog, prefix: str) -> dict[str, int]:
    """Per-kind mint offsets for THIS supplier prefix.  Primary source:
    the persisted counters table (a few rows, one tiny collect) — rows of
    other prefixes are ignored (independent number spaces, like the
    reference's per-prefix counter files).  Fallback for hand-built
    catalogs without counters: ONE unioned scan over the five omid
    columns (not five)."""
    if catalog.counters is not None:
        rows = catalog.counters.collect()
        if rows:
            got = {r["kind"]: int(r["max_n"]) for r in rows if r["prefix"] == prefix}
            return {k: got.get(k, 0) for k in _KINDS}
    pat = rf"^[a-z_]+/{prefix}(\d+)$"
    scans = []
    for kind, df in (
        ("br", catalog.br),
        ("ra", catalog.ra),
        ("id", catalog.id),
        ("ar", catalog.ar),
        ("re", catalog.re),
    ):
        scans.append(
            df.select(
                F.lit(kind).alias("kind"),
                F.regexp_extract("omid", pat, 1).cast("long").alias("n"),
            )
        )
    unioned = scans[0]
    for s in scans[1:]:
        unioned = unioned.unionByName(s)
    got = {
        r["kind"]: int(r["max_n"] or 0)
        for r in unioned.groupBy("kind").agg(F.max("n").alias("max_n")).collect()
    }
    return {k: got.get(k, 0) for k in _KINDS}


def _counters_new(
    spark: SparkSession,
    offsets: dict[str, int],
    minted: dict[str, DataFrame],
    prefix: str,
    prev_counters: DataFrame | None = None,
) -> DataFrame:
    """Lazy post-batch counter rows: offset + number minted per kind for
    THIS prefix, with other prefixes' rows carried through unchanged."""
    parts = []
    for kind in _KINDS:
        df = minted.get(kind)
        base = offsets[kind]
        if df is None:
            parts.append(
                spark.createDataFrame([(kind, prefix, base)], COUNTER_SCHEMA)
            )
        else:
            n = F.regexp_extract("minted_omid", rf"^[a-z_]+/{prefix}(\d+)$", 1).cast("long")
            parts.append(
                df.select(n.alias("n")).agg(
                    F.lit(kind).alias("kind"),
                    F.lit(prefix).alias("prefix"),
                    F.coalesce(F.max("n"), F.lit(base)).cast("long").alias("max_n"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if prev_counters is not None:
        out = out.unionByName(prev_counters.filter(F.col("prefix") != prefix))
    return out


# ---------------------------------------------------------------------------
# Stage 0 — row ids
# ---------------------------------------------------------------------------


def with_row_ids(df: DataFrame, small: bool = True) -> DataFrame:
    """Deterministic per-batch row ids (the reference's file order when the
    caller provides none).  Small batches use a plain window (zero extra
    jobs); big batches use the distributed contiguous-rank assignment so no
    single task ever holds the whole input (operators/minting.py)."""
    if "row_id" in df.columns:
        return df
    cols = [F.col(c) for c in df.columns]
    if small:
        from oc_meta_spark.operators.minting import const_partition_key

        w = Window.partitionBy(const_partition_key()).orderBy(*cols)
        return df.withColumn("row_id", F.row_number().over(w).cast("long"))
    from oc_meta_spark.operators.minting import assign_contiguous_ranks

    return assign_contiguous_ranks(df, df.columns, "row_id")


# ---------------------------------------------------------------------------
# Stage 1 — pre-pass, validity, parse, clean (curator.py:130-140, 398-419,
# 420-470, 1468-1535; cleaner.py C1-C11)
# ---------------------------------------------------------------------------


def _alias_type(col: F.Column) -> F.Column:
    """lower + collapse spaces, alias the five known forms, '' if invalid
    (reference clean_metadata_without_id, curator.py:398-419)."""
    t = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    expr = t
    for alias, target in TYPE_ALIASES.items():
        expr = F.when(t == alias, target).otherwise(expr)
    return F.when(expr.isin(*sorted(VALID_TYPES)), expr).otherwise(F.lit(""))


_GROUP_A = {
    "",
    "book",
    "data file",
    "dataset",
    "dissertation",
    "edited book",
    "journal article",
    "monograph",
    "other",
    "peer review",
    "posted content",
    "web content",
    "proceedings article",
    "report",
    "reference book",
}
_GROUP_B = {"book chapter", "book part", "book section", "book track", "component", "reference entry"}
_GROUP_C = {
    "book series",
    "book set",
    "journal",
    "proceedings",
    "proceedings series",
    "report series",
    "standard",
    "standard series",
}


def seq_type_gate(type_alias: F.Column, vol: F.Column, iss: F.Column) -> tuple[F.Column, F.Column]:
    """F4 rule 1 (reference clean_vvi, curator.py:439-446): only journal
    content — journal article / volume / issue — carries volume/issue."""
    keep = type_alias.isin(*sorted(SEQ_TYPES))
    return F.when(keep, vol).otherwise(F.lit("")), F.when(keep, iss).otherwise(F.lit(""))


def jv_both_gate(type_row: F.Column, vol: F.Column, iss: F.Column) -> tuple[F.Column, F.Column]:
    """F4 rule 2 (curator.py:531-535): a journal-volume row that also
    carries an issue has BOTH invalidated."""
    both = (type_row == "journal volume") & (vol != "") & (iss != "")
    return F.when(both, "").otherwise(vol), F.when(both, "").otherwise(iss)


def venue_presence_gate(
    venue_present: F.Column, vol: F.Column, iss: F.Column
) -> tuple[F.Column, F.Column]:
    """F4 rule 3 (clean_vvi else-branch, curator.py:565-567): no venue ⇒
    no volume/issue."""
    return F.when(venue_present, vol).otherwise(F.lit("")), F.when(venue_present, iss).otherwise(
        F.lit("")
    )


def stage_parse(input_df: DataFrame) -> DataFrame:
    """11 string columns → typed nested columns, cleaned + validated.

    Implements the reference's pre-pass (curator.py:130-140), the full
    per-type validity tables (is_a_valid_row, curator.py:1468-1535), type
    aliasing, the complete C9 vol/issue repair machine (with its type
    retyping and year extraction), and the agent-cell grammar with
    clean_ra_list semantics — as one declarative projection.
    """
    from oc_meta_spark.session import ensure_worker_imports

    ensure_worker_imports(input_df.sparkSession)
    df = input_df
    c = lambda name: F.coalesce(F.col(name), F.lit(""))

    # --- pre-pass (raw values, before any cleaning) ----------------------
    has_id = c("id") != ""
    raw_vi = (c("volume") != "") | (c("issue") != "")
    no_venue = c("venue") == ""
    df = (
        df.withColumn("volume0", F.when(has_id & raw_vi & no_venue, "").otherwise(c("volume")))
        .withColumn("issue0", F.when(has_id & raw_vi & no_venue, "").otherwise(c("issue")))
        .withColumn(
            "type0",
            F.when(has_id & raw_vi & (c("type") == ""), "journal article").otherwise(c("type")),
        )
    )

    # --- F1: per-type validity tables (on pre-pass, unstripped values) ---
    t_low = F.lower(F.regexp_replace(F.trim(F.col("type0")), r"\s+", " "))
    vi0 = (F.col("volume0") != "") | (F.col("issue0") != "")
    all_empty = (
        (c("id") == "") & (c("title") == "") & (c("author") == "") & (c("pub_date") == "")
        & (c("venue") == "") & (F.col("volume0") == "") & (F.col("issue0") == "")
        & (c("page") == "") & (F.col("type0") == "") & (c("publisher") == "") & (c("editor") == "")
    )
    has_title = c("title") != ""
    has_venue_raw = c("venue") != ""
    has_ae = (c("author") != "") | (c("editor") != "")
    has_date = c("pub_date") != ""
    valid = F.when(
        has_id, ~(vi0 & ((t_low == "") | ~has_venue_raw))
    ).otherwise(
        F.when(all_empty, F.lit(False))
        .when(t_low.isin(*sorted(_GROUP_A)), has_title & has_date & has_ae)
        .when(t_low.isin(*sorted(_GROUP_B)), has_title & has_venue_raw)
        .when(t_low.isin(*sorted(_GROUP_C)), has_title)
        .when(t_low == "journal volume", has_venue_raw & ((F.col("volume0") != "") | has_title))
        .when(t_low == "journal issue", has_venue_raw & ((F.col("issue0") != "") | has_title))
        .otherwise(F.lit(False))
    )
    df = df.filter(valid)

    # --- strip + clean ----------------------------------------------------
    ids = F.transform(
        clean_id_cell_udf(F.trim(c("id"))),
        lambda t: F.struct(
            F.regexp_extract(t, r"^([^:]*):", 1).alias("schema"),
            F.regexp_extract(t, r"^[^:]*:(.*)$", 1).alias("value"),
        ),
    )
    venue_trim = F.trim(c("venue"))
    v_name_raw = F.trim(F.regexp_extract(venue_trim, r"^\s*(.*?)\s*(?:\[\s*(.*?)\s*\])?\s*$", 1))
    v_ids_str = F.regexp_extract(venue_trim, r"^\s*(.*?)\s*(?:\[\s*(.*?)\s*\])?\s*$", 2)

    df = (
        df.withColumn("ids", ids)
        .withColumn("title_clean", clean_title_udf(F.trim(c("title"))))
        .withColumn("date_clean", clean_date_udf(F.trim(c("pub_date"))))
        .withColumn("type_alias", _alias_type(F.col("type0")))
        .withColumn("venue_present_raw", venue_trim != "")
        .withColumn("v_name", clean_title_udf(v_name_raw))
        .withColumn(
            "v_ids",
            F.transform(
                clean_id_cell_udf(v_ids_str),
                lambda t: F.struct(
                    F.regexp_extract(t, r"^([^:]*):", 1).alias("schema"),
                    F.regexp_extract(t, r"^[^:]*:(.*)$", 1).alias("value"),
                ),
            ),
        )
        .withColumn("page_clean", normalize_hyphens(F.trim(c("page"))))
        .withColumn("authors", parse_agent_cell_udf(F.trim(c("author"))))
        .withColumn("editors", parse_agent_cell_udf(F.trim(c("editor"))))
        .withColumn("publishers", parse_agent_cell_udf(F.trim(c("publisher"))))
    )

    # --- F4 + C9: vol/issue gate, then the full repair machine -----------
    vol1, iss1 = seq_type_gate(
        F.col("type_alias"), F.trim(F.col("volume0")), F.trim(F.col("issue0"))
    )
    df = df.withColumn("vi", repair_vi_full_udf(vol1, iss1, F.col("type_alias")))
    df = (
        df.withColumn("type_row", F.col("vi")["type"])
        .withColumn(
            "date_row",
            F.when(F.col("date_clean") == "", F.coalesce(F.col("vi")["date"], F.lit(""))).otherwise(
                F.col("date_clean")
            ),
        )
    )
    vol2, iss2 = jv_both_gate(F.col("type_row"), F.col("vi")["volume"], F.col("vi")["issue"])
    df = df.withColumn("vol2", vol2).withColumn("iss2", iss2)
    vol3, iss3 = venue_presence_gate(F.col("venue_present_raw"), F.col("vol2"), F.col("iss2"))
    df = (
        df.withColumn("volume_clean", vol3)
        .withColumn("issue_clean", iss3)
        .drop("vi", "vol2", "iss2", "volume0", "issue0", "type0")
    )
    return df


# ---------------------------------------------------------------------------
# Stage 2 — BR resolution (clean_id / id_worker / wannabe CC)
# ---------------------------------------------------------------------------


def resolve_rows(staged: DataFrame, catalog: EntityCatalog) -> DataFrame:
    """Per row: (row_id, component, decision, resolved, first_row).

    - verified explicit ``omid:br/...`` tokens win (id_worker metaval
      branch, curator.py:1179-1205); unverified ones are dropped and do
      NOT unify rows (clean_id_list discards a dangling metaval);
    - (schema, value) joins against id ⋈ entity_id pick matches;
    - rows sharing any external id token unify transitively (CC over the
      row↔token bipartite graph — the wannabe union-find, D3);
    - a component matching >1 distinct catalog entity is a conflict ⇒ a
      new entity is minted holding the ids (curator.py conflict).
    """
    tok = staged.select("row_id", F.explode_outer("ids").alias("t")).select(
        "row_id",
        F.col("t")["schema"].alias("schema"),
        F.col("t")["value"].alias("value"),
    )

    exp_tok = tok.filter(
        (F.col("schema") == "omid") & F.col("value").startswith("br/")
    ).select("row_id", "value")
    br_omids = catalog.br.select(F.col("omid").alias("value"))
    alive = exp_tok.join(br_omids, "value", "left_semi")
    # Dangling explicit omids replay through merge history to the surviving
    # entity (reference retrieve_metaid_from_merged_entity,
    # curator.py:1199-1205).  The pointer-jumping chain resolution is
    # driver-looped, so it only runs when a dangling token actually exists
    # — the common batch pays one tiny probe job, nothing else.
    dangling = _cp(exp_tok.join(br_omids, "value", "left_anti"))
    if dangling.limit(1).count() > 0:
        from oc_meta_spark.plans.merge import merge_history

        hop = merge_history(catalog.prov)
        hopped = (
            dangling.join(hop, dangling.value == hop.merged_entity)
            .select("row_id", F.col("final_survivor").alias("value"))
            .join(br_omids, "value", "left_semi")
        )
        alive = alive.unionByName(hopped)
    explicit = alive.select("row_id", F.col("value").alias("cand"))

    ext = tok.filter((F.col("schema") != "omid") & F.col("schema").isNotNull())
    cat_ids = catalog.id.join(
        catalog.entity_id, catalog.id.omid == catalog.entity_id.id_omid
    ).select("schema", "value", "entity_omid")
    matched = (
        ext.join(cat_ids.filter(F.col("entity_omid").startswith("br/")), ["schema", "value"])
        .select("row_id", F.col("entity_omid").alias("cand"))
    )

    # CC over EXTERNAL tokens only: dangling omids must not unify rows.
    edges = ext.select(
        F.concat(F.lit("r:"), F.lpad(F.col("row_id").cast("string"), 12, "0")).alias("src"),
        F.concat(F.lit("t:"), F.col("schema"), F.lit(":"), F.col("value")).alias("dst"),
    )
    comp = connected_components(edges, "src", "dst")
    row_comp = comp.filter(F.col("node").startswith("r:")).select(
        F.regexp_extract("node", r"^r:0*(\d+)$", 1).cast("long").alias("row_id"),
        F.col("comp").alias("component"),
    )
    all_rows = staged.select("row_id")
    row_comp = all_rows.join(row_comp, "row_id", "left").withColumn(
        "component",
        F.coalesce(F.col("component"), F.concat(F.lit("solo:"), F.col("row_id").cast("string"))),
    )

    cands = explicit.withColumn("prio", F.lit(0)).unionByName(matched.withColumn("prio", F.lit(1)))
    comp_cands = (
        row_comp.join(cands, "row_id", "left")
        .groupBy("component")
        .agg(
            F.countDistinct("cand").alias("n_cand"),
            F.min(F.when(F.col("prio") == 0, F.col("cand"))).alias("explicit_cand"),
            F.min("cand").alias("any_cand"),
            F.min("row_id").alias("first_row"),
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
    return row_comp.join(comp_cands, "component")


# ---------------------------------------------------------------------------
# Aggregation helpers (hash aggregates — no windows)
# ---------------------------------------------------------------------------


def _first_nonempty(col: str) -> F.Column:
    """First non-empty value in row_id order, '' if none."""
    return F.coalesce(
        F.min(
            F.when(
                (F.col(col).isNotNull()) & (F.col(col) != ""),
                F.struct(F.col("row_id").alias("r"), F.col(col).alias("v")),
            )
        )["v"],
        F.lit(""),
    )


def _last_value(col: str) -> F.Column:
    """Value carried by the last row (max row_id), even if empty."""
    return F.coalesce(
        F.max(F.struct(F.col("row_id").alias("r"), F.col(col).alias("v")))["v"], F.lit("")
    )


def _venue_type_expr(br_type: F.Column, schemas: F.Column) -> F.Column:
    """get_venue_type with the ISBN/ISSN scheme-evidence override
    (reference core/creator.py:393-431).  ``schemas`` is the array of
    non-omid id schemas on the venue mention."""
    base = (
        F.when(br_type.isin("journal article", "journal volume", "journal issue"), "journal")
        .when(br_type.isin("book chapter", "book part", "book section", "book track"), "book")
        .when(br_type.isin("book", "edited book", "monograph", "reference book"), "book series")
        .when(br_type == "proceedings article", "proceedings")
        .when(br_type.isin("proceedings", "report", "standard", "series"), "series")
        .when(br_type == "reference entry", "reference book")
        .when(br_type == "report series", "report series")
        .otherwise("")
    )
    has_ext = F.size(schemas) > 0
    has_isbn = F.array_contains(schemas, "isbn")
    has_issn = F.array_contains(schemas, "issn")
    return (
        F.when(
            has_ext & base.isin("journal", "book series", "series", "report series"),
            F.when(has_isbn | ~has_issn, "").otherwise(base),
        )
        .when(
            has_ext & base.isin("book", "proceedings"),
            F.when(has_issn | ~has_isbn, "").otherwise(base),
        )
        .when(
            has_ext & (base == "reference book"),
            F.when(has_isbn & ~has_issn, "reference book")
            .when(has_issn & ~has_isbn, "journal")
            .otherwise(""),
        )
        .otherwise(base)
    )


_TOK_STR = lambda t: F.concat_ws(":", t["schema"], t["value"])


def _mint_map(
    df: DataFrame, order_cols: list, kind: str, prefix: str, offset: int, small: bool
) -> DataFrame:
    """(key → minted_omid) map; one contiguous-rank pass per kind.  The
    big path cuts lineage (the rank assignment already materialized); the
    small path is a window over checkpointed inputs — recomputing it is
    cheaper than another job."""
    minted = mint_omids(df, order_cols, kind, prefix, offset, "minted_omid", small=small)
    # the map is referenced by several downstream frames (entity tables,
    # index tables, chain assembly) — cut it in BOTH modes or each use
    # re-executes the ranking window
    return _cp(minted)


# ---------------------------------------------------------------------------
# Stage 3 — full batch curation
# ---------------------------------------------------------------------------


def curate(
    input_df: DataFrame,
    catalog: EntityCatalog | None = None,
    prefix: str = "060",
    resp_agent: str = "oc_meta_spark",
    batch_ts: str = "1970-01-01T00:00:00Z",
    silencer=False,
) -> CurationResult:
    """Run the full curation batch.  ``batch_ts`` is injected (never wall
    clock) so results are reproducible.  ``silencer`` mirrors the
    reference's list-of-roles switch (run/meta_process.py:127-159 +
    curator.py:663-664): True ⇒ all roles; an iterable ⇒ those roles;
    a silenced role adds NO new agent-role rows wherever a chain already
    exists (catalog chain, or an earlier row of the same batch entity).
    """
    spark = input_df.sparkSession
    try:
        # sessions not built by session.get_spark (tests, the driver's
        # verify harness): keep literal window-partition keys foldproof
        # (see operators/minting.py::const_partition_key).  APPEND to any
        # exclusions the session owner already set — never clobber them.
        rule = "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"
        current = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
        if rule not in current.split(","):
            spark.conf.set(
                "spark.sql.optimizer.excludedRules",
                f"{current},{rule}" if current else rule,
            )
    except Exception:  # pragma: no cover — conf may be immutable on connect
        pass
    if catalog is None:
        catalog = EntityCatalog.empty(spark)
    catalog = _normalize_catalog(catalog)
    silenced_roles = set(ROLES) if silencer is True else set(silencer or ())
    counters = _read_counters(catalog, prefix)

    _mark("start")
    n_input = input_df.count()
    small = n_input <= SMALL_BATCH_ROWS
    staged = _cp(stage_parse(with_row_ids(input_df, small)))
    _mark("staged")
    res = _cp(resolve_rows(staged, catalog))

    _mark("resolve")
    rows = staged.join(res.select("row_id", "component", "decision", "resolved"), "row_id")
    rows = rows.withColumn(
        "ekey0", F.coalesce(F.col("resolved"), F.concat(F.lit("NB:"), F.col("component")))
    )

    # --- equalizer store lookups (id-resolved entities only) --------------
    resolved_set = res.filter(F.col("resolved").isNotNull()).select(
        F.col("resolved").alias("omid")
    ).dropDuplicates()
    cat_br_info = _cp(
        catalog.br.join(resolved_set, "omid", "left_semi").select(
            F.col("omid").alias("ekey0"),
            F.col("title").alias("cat_title"),
            F.col("pub_date").alias("cat_date"),
            F.col("type").alias("cat_type"),
            F.col("seq_id").alias("cat_seq"),
            F.col("part_of").alias("cat_part_of"),
            F.col("embodiment").alias("cat_embodiment"),
        )
    )
    # container chain of resolved works: up to venue through issue/volume
    # (finder retrieve_br_info_from_meta — volume/issue seq + venue).
    anc = catalog.br.select(
        F.col("omid").alias("a_omid"),
        F.col("type").alias("a_type"),
        F.col("seq_id").alias("a_seq"),
        F.col("part_of").alias("a_part_of"),
    )
    chain1 = cat_br_info.join(anc, cat_br_info.cat_part_of == anc.a_omid, "left")
    # the resolved entity's OWN seq feeds volume/issue when it is itself a
    # journal volume/issue (finder.py:487-493); container seqs override.
    chain1 = chain1.select(
        "ekey0",
        F.coalesce(
            F.when(F.col("a_type") == "journal issue", F.col("a_seq")),
            F.when(F.col("cat_type") == "journal issue", F.col("cat_seq")),
        ).alias("s_iss"),
        F.coalesce(
            F.when(F.col("a_type") == "journal volume", F.col("a_seq")),
            F.when(F.col("cat_type") == "journal volume", F.col("cat_seq")),
        ).alias("s_vol1"),
        F.when(~F.col("a_type").isin("journal issue", "journal volume"), F.col("a_omid")).alias(
            "s_venue1"
        ),
        F.when(F.col("a_type").isin("journal issue", "journal volume"), F.col("a_part_of")).alias(
            "up1"
        ),
    )
    anc2 = anc.select(
        F.col("a_omid").alias("b_omid"),
        F.col("a_type").alias("b_type"),
        F.col("a_seq").alias("b_seq"),
        F.col("a_part_of").alias("b_part_of"),
    )
    chain2 = chain1.join(anc2, chain1.up1 == anc2.b_omid, "left").select(
        "ekey0",
        "s_iss",
        F.coalesce(
            "s_vol1", F.when(F.col("b_type") == "journal volume", F.col("b_seq"))
        ).alias("s_vol"),
        F.coalesce(
            "s_venue1",
            F.when(~F.coalesce(F.col("b_type"), F.lit("")).isin("journal issue", "journal volume"), F.col("b_omid")),
        ).alias("s_venue2"),
        F.when(F.col("b_type") == "journal volume", F.col("b_part_of")).alias("up2"),
    )
    store_chain = _cp(
        chain2.withColumn("s_venue", F.coalesce("s_venue2", "up2"))
        .select("ekey0", "s_iss", "s_vol", "s_venue")
    )
    # store venue name + ids
    cat_ids_all = catalog.id.join(
        catalog.entity_id, catalog.id.omid == catalog.entity_id.id_omid
    ).select("schema", "value", "entity_omid")
    sv_ids = (
        store_chain.select(F.col("s_venue").alias("entity_omid"))
        .dropDuplicates()
        .join(cat_ids_all, "entity_omid")
        .groupBy("entity_omid")
        .agg(F.collect_list(F.struct("schema", "value")).alias("sv_ids"))
    )
    sv = (
        store_chain.select("ekey0", "s_venue")
        .join(
            catalog.br.select(F.col("omid").alias("s_venue"), F.col("title").alias("sv_name")),
            "s_venue",
            "left",
        )
        .join(sv_ids.withColumnRenamed("entity_omid", "s_venue"), "s_venue", "left")
        .withColumn("sv_ids", F.coalesce("sv_ids", F.array().cast("array<struct<schema:string,value:string>>")))
    )
    # store page (existing RE) of resolved works
    cat_page = cat_br_info.filter(F.col("cat_embodiment").isNotNull()).join(
        catalog.re.select(
            F.col("omid").alias("cat_embodiment"),
            F.col("start_page"),
            F.col("end_page"),
        ),
        "cat_embodiment",
    ).select(
        "ekey0",
        F.col("cat_embodiment").alias("cat_re"),
        F.concat_ws("-", F.col("start_page"), F.col("end_page")).alias("cat_page"),
    )

    # --- row-level equalized venue (equalizer venue rule, curator:1424-1447)
    rows = (
        rows.join(sv.select("ekey0", "s_venue", "sv_name", "sv_ids"), "ekey0", "left")
    )
    sv_tokens = F.when(
        F.col("s_venue").isNotNull(),
        F.array_union(
            F.transform(F.col("sv_ids"), _TOK_STR),
            F.array(F.concat(F.lit("omid:"), F.col("s_venue"))),
        ),
    )
    row_tokens = F.transform(F.col("v_ids"), _TOK_STR)
    overlap = F.size(F.array_intersect(row_tokens, sv_tokens)) > 0
    sv_id_structs = F.array_union(
        F.col("sv_ids"),
        F.array(F.struct(F.lit("omid").alias("schema"), F.col("s_venue").alias("value"))),
    )
    rows = (
        rows.withColumn(
            "v_name_eq",
            F.when(F.col("s_venue").isNotNull(), F.col("sv_name")).otherwise(F.col("v_name")),
        )
        .withColumn(
            "v_ids_eq",
            F.when(
                F.col("s_venue").isNotNull() & F.col("venue_present_raw") & overlap,
                F.array_union(F.col("v_ids"), sv_id_structs),
            )
            .when(F.col("s_venue").isNotNull(), sv_id_structs)
            .otherwise(F.col("v_ids")),
        )
        .withColumn(
            "venue_present",
            F.col("venue_present_raw") | F.col("s_venue").isNotNull(),
        )
        .drop("s_venue", "sv_name", "sv_ids")
    )
    rows = _cp(rows)

    _mark("row-equalize")
    # --- entity-level field selection, pre-alias (ekey0) ------------------
    # Resolved entities: store value wins, else first non-empty row value
    # (equalizer overwrite + merge_duplicate_entities propagation).  New
    # entities: the LAST row's value survives (the reference's final
    # last-wins dict dedup, curator.py:333).
    ent0 = rows.groupBy("ekey0").agg(
        F.min("row_id").alias("first_row"),
        F.max("row_id").alias("last_row"),
        F.max(F.col("decision") == "existing").alias("is_resolved"),
        _first_nonempty("title_clean").alias("title_first"),
        _first_nonempty("date_row").alias("date_first"),
        _last_value("date_row").alias("date_last"),
        _first_nonempty("type_row").alias("type_first"),
        _last_value("type_row").alias("type_last"),
        _first_nonempty("volume_clean").alias("vol_first"),
        _last_value("volume_clean").alias("vol_last"),
        _first_nonempty("issue_clean").alias("iss_first"),
        _last_value("issue_clean").alias("iss_last"),
        _first_nonempty("page_clean").alias("page_first"),
        _last_value("page_clean").alias("page_last"),
        # venue: first non-empty mention for resolved, last row for new
        F.min(
            F.when(
                F.col("venue_present"),
                F.struct(
                    F.col("row_id").alias("r"),
                    F.col("v_name_eq").alias("n"),
                    F.col("v_ids_eq").alias("i"),
                ),
            )
        ).alias("ven_first"),
        F.max(
            F.struct(
                F.col("row_id").alias("r"),
                F.col("venue_present").alias("p"),
                F.col("v_name_eq").alias("n"),
                F.col("v_ids_eq").alias("i"),
            )
        ).alias("ven_last"),
    )
    ent0 = (
        ent0.join(cat_br_info.select("ekey0", "cat_title", "cat_date", "cat_type"), "ekey0", "left")
        .join(store_chain, "ekey0", "left")
        .join(cat_page, "ekey0", "left")
    )
    nz = lambda col: F.nullif(col, F.lit(""))
    pick = lambda store, first, last: F.coalesce(
        F.when(F.col("is_resolved"), F.coalesce(nz(store), nz(first))).otherwise(nz(last)),
        F.lit(""),
    )
    ent0 = (
        ent0.withColumn("title_e", F.coalesce(nz(F.col("cat_title")), nz(F.col("title_first")), F.lit("")))
        .withColumn("date_e", pick(F.col("cat_date"), F.col("date_first"), F.col("date_last")))
        .withColumn("type_e", pick(F.col("cat_type"), F.col("type_first"), F.col("type_last")))
        .withColumn("vol_e", pick(F.col("s_vol"), F.col("vol_first"), F.col("vol_last")))
        .withColumn("iss_e", pick(F.col("s_iss"), F.col("iss_first"), F.col("iss_last")))
        .withColumn(
            "page_e",
            F.coalesce(nz(F.col("cat_page")), nz(F.col("page_first")), F.lit("")),
        )
        .withColumn(
            "ven_name",
            F.when(F.col("is_resolved"), F.col("ven_first")["n"]).otherwise(
                F.when(F.col("ven_last")["p"], F.col("ven_last")["n"])
            ),
        )
        .withColumn(
            "ven_ids",
            F.when(F.col("is_resolved"), F.col("ven_first")["i"]).otherwise(
                F.when(F.col("ven_last")["p"], F.col("ven_last")["i"])
            ),
        )
        .withColumn(
            "has_venue",
            F.when(F.col("is_resolved"), F.col("ven_first").isNotNull()).otherwise(
                F.coalesce(F.col("ven_last")["p"], F.lit(False))
            ),
        )
    )
    ent0 = _cp(
        ent0.select(
            "ekey0", "first_row", "last_row", "is_resolved",
            "title_e", "date_e", "type_e", "vol_e", "iss_e", "page_e",
            "ven_name", "ven_ids", "has_venue", "cat_re",
        )
    )

    _mark("ent0")
    # --- venue resolution (id_worker with vvi_ent; CC over venue tokens) --
    mentions = _cp(
        ent0.filter(F.col("has_venue")).select(
            "ekey0", "first_row", "type_e", "ven_name",
            F.coalesce(F.col("ven_ids"), F.array().cast("array<struct<schema:string,value:string>>")).alias("ven_ids"),
        )
    )
    v_tok = mentions.select(
        "ekey0", F.explode_outer("ven_ids").alias("t")
    ).select(
        "ekey0", F.col("t")["schema"].alias("schema"), F.col("t")["value"].alias("value")
    )
    v_tok = _cp_opt(v_tok)
    v_explicit = (
        v_tok.filter((F.col("schema") == "omid") & F.col("value").startswith("br/"))
        .join(catalog.br.select(F.col("omid").alias("value")), "value", "left_semi")
        .select("ekey0", F.col("value").alias("cand"))
    )
    v_ext = v_tok.filter((F.col("schema") != "omid") & F.col("schema").isNotNull())
    # batch row entities share the br id space: a venue naming a work's id
    # IS that work (the reference's id_worker _local_match over wannabes —
    # exercised by golden cases 10/11, test/curator_test.py:2079-2096)
    row_tok_keys = (
        rows.select("ekey0", F.explode("ids").alias("t"))
        .filter(F.col("t")["schema"] != "omid")
        .select(
            F.col("t")["schema"].alias("schema"),
            F.col("t")["value"].alias("value"),
            F.col("ekey0").alias("cand"),
        )
        .dropDuplicates()
    )
    v_batch_matched = v_ext.join(
        row_tok_keys.withColumnRenamed("cand", "__bc"), ["schema", "value"]
    ).select("ekey0", F.col("__bc").alias("cand"))
    v_matched = (
        v_ext.join(
            cat_ids_all.join(
                catalog.br.filter(F.col("type").isin(*sorted(VENUE_TYPES)))
                .select(F.col("omid").alias("entity_omid")),
                "entity_omid",
                "left_semi",
            ),
            ["schema", "value"],
        )
        .select("ekey0", F.col("entity_omid").alias("cand"))
    )
    v_edges = v_ext.select(
        F.concat(F.lit("v:"), F.col("ekey0")).alias("src"),
        F.concat(F.lit("t:"), F.col("schema"), F.lit(":"), F.col("value")).alias("dst"),
    )
    v_comp_raw = connected_components(v_edges, "src", "dst")
    v_comp = v_comp_raw.filter(F.col("node").startswith("v:")).select(
        F.expr("substring(node, 3)").alias("ekey0"), F.col("comp").alias("v_component")
    )
    mentions = mentions.join(v_comp, "ekey0", "left").withColumn(
        "v_component", F.coalesce("v_component", F.concat(F.lit("vsolo:"), F.col("ekey0")))
    )
    v_cands = (
        v_explicit.withColumn("prio", F.lit(0))
        .unionByName(v_batch_matched.withColumn("prio", F.lit(1)))
        .unionByName(v_matched.withColumn("prio", F.lit(2)))
    )
    v_decision = (
        mentions.select("ekey0", "v_component")
        .join(v_cands, "ekey0", "left")
        .groupBy("v_component")
        .agg(
            F.min(F.when(F.col("prio") == 0, F.col("cand"))).alias("explicit_cand"),
            F.countDistinct(F.when(F.col("prio") == 1, F.col("cand"))).alias("n_batch"),
            F.min(F.when(F.col("prio") == 1, F.col("cand"))).alias("batch_cand"),
            F.countDistinct(F.when(F.col("prio") == 2, F.col("cand"))).alias("n_cat"),
            F.min(F.when(F.col("prio") == 2, F.col("cand"))).alias("cat_cand"),
        )
        .withColumn(
            "v_resolved",
            F.when(F.col("explicit_cand").isNotNull(), F.col("explicit_cand"))
            .when(F.col("n_batch") == 1, F.col("batch_cand"))
            .when((F.col("n_batch") == 0) & (F.col("n_cat") == 1), F.col("cat_cand")),
        )
    )
    mentions = mentions.join(v_decision.select("v_component", "v_resolved"), "v_component")
    mentions = _cp(
        mentions.withColumn(
            "vkey", F.coalesce(F.col("v_resolved"), F.concat(F.lit("NV:"), F.col("v_component")))
        )
    )

    # new venue components: name/type from the first mention
    new_venues = (
        mentions.filter(F.col("v_resolved").isNull())
        .withColumn(
            "schemas",
            F.array_distinct(
                F.transform(
                    F.filter(F.col("ven_ids"), lambda t: t["schema"] != "omid"),
                    lambda t: t["schema"],
                )
            ),
        )
        .withColumn("vtype", _venue_type_expr(F.col("type_e"), F.col("schemas")))
        .groupBy("vkey")
        .agg(
            F.min("first_row").alias("v_first_row"),
            F.min(
                F.struct(F.col("first_row").alias("r"), F.col("ven_name").alias("n"), F.col("vtype").alias("t"))
            ).alias("pick"),
        )
        .select(
            "vkey",
            "v_first_row",
            F.col("pick")["n"].alias("v_name_new"),
            F.col("pick")["t"].alias("v_type_new"),
        )
    )

    work_venue = mentions.select("ekey0", "vkey")

    _mark("venues")
    # --- volume/issue (venue, seq) space (clean_vvi + volume_issue,
    # curator.py:500-567, 1312-1353) ---------------------------------------
    # Rows typed 'journal volume'/'journal issue' ARE the volume/issue
    # entity: they claim the (venue, seq) slot; articles and issue rows
    # demand slots; unclaimed demanded slots become anonymous children.
    vv = _cp_opt(
        ent0.select(
            "ekey0", "first_row", "is_resolved", "type_e", "vol_e", "iss_e"
        ).join(work_venue, "ekey0")
    )
    _mark("vvi:vv")
    vol_claims = vv.filter((F.col("type_e") == "journal volume") & (F.col("vol_e") != "")).select(
        "vkey", F.col("vol_e").alias("seq"), "ekey0", "is_resolved", "first_row"
    )
    vol_demands = vv.filter(
        F.col("type_e").isin("journal article", "journal issue") & (F.col("vol_e") != "")
    ).select("vkey", F.col("vol_e").alias("seq"), "first_row")
    vol_keys = (
        vol_claims.select("vkey", "seq", "first_row")
        .unionByName(vol_demands)
        .groupBy("vkey", "seq")
        .agg(F.min("first_row").alias("k_first_row"))
    )
    cat_vol = catalog.br.filter(F.col("type") == "journal volume").select(
        F.col("part_of").alias("vkey"), F.col("seq_id").alias("seq"), F.col("omid").alias("cat_child")
    )
    claim_pick = (
        vol_claims.groupBy("vkey", "seq")
        .agg(
            F.min(F.when(F.col("is_resolved"), F.struct(F.col("first_row").alias("r"), F.col("ekey0").alias("k"))))["k"].alias("res_claim"),
            F.min(F.when(~F.col("is_resolved"), F.struct(F.col("first_row").alias("r"), F.col("ekey0").alias("k"))))["k"].alias("new_claim"),
        )
    )
    _mark("vvi:volkeys")
    vol_targets = _cp_opt(
        vol_keys.join(cat_vol, ["vkey", "seq"], "left")
        .join(claim_pick, ["vkey", "seq"], "left")
        .withColumn(
            "target",
            F.coalesce(
                "cat_child",
                "res_claim",
                "new_claim",
                F.concat(F.lit("NVOL:"), F.col("vkey"), F.lit("|"), F.col("seq")),
            ),
        )
        .select("vkey", "seq", "target", "k_first_row")
    )
    _mark("vvi:voltargets")
    vol_alias = (
        vol_claims.filter(~F.col("is_resolved"))
        .join(vol_targets, ["vkey", "seq"])
        .filter(F.col("ekey0") != F.col("target"))
        .select("ekey0", F.col("target").alias("ekey_alias"))
    )

    # issues: parent = volume target when the row carries a volume, else venue
    _mark("vvi:volalias")
    iss_src = vv.filter(
        F.col("type_e").isin("journal article", "journal issue") & (F.col("iss_e") != "")
    ).join(
        vol_targets.select("vkey", F.col("seq").alias("vol_e"), F.col("target").alias("vol_target")),
        ["vkey", "vol_e"],
        "left",
    ).withColumn("parent_key", F.coalesce("vol_target", "vkey"))
    iss_src = _cp_opt(iss_src)
    iss_claims = iss_src.filter(F.col("type_e") == "journal issue").select(
        "parent_key", F.col("iss_e").alias("seq"), "ekey0", "is_resolved", "first_row"
    )
    iss_demands = iss_src.filter(F.col("type_e") == "journal article").select(
        "parent_key", F.col("iss_e").alias("seq"), "first_row"
    )
    iss_keys = (
        iss_claims.select("parent_key", "seq", "first_row")
        .unionByName(iss_demands)
        .groupBy("parent_key", "seq")
        .agg(F.min("first_row").alias("k_first_row"))
    )
    cat_iss = catalog.br.filter(F.col("type") == "journal issue").select(
        F.col("part_of").alias("parent_key"), F.col("seq_id").alias("seq"), F.col("omid").alias("cat_child")
    )
    iss_claim_pick = (
        iss_claims.groupBy("parent_key", "seq")
        .agg(
            F.min(F.when(F.col("is_resolved"), F.struct(F.col("first_row").alias("r"), F.col("ekey0").alias("k"))))["k"].alias("res_claim"),
            F.min(F.when(~F.col("is_resolved"), F.struct(F.col("first_row").alias("r"), F.col("ekey0").alias("k"))))["k"].alias("new_claim"),
        )
    )
    _mark("vvi:isskeys")
    iss_targets = _cp_opt(
        iss_keys.join(cat_iss, ["parent_key", "seq"], "left")
        .join(iss_claim_pick, ["parent_key", "seq"], "left")
        .withColumn(
            "target",
            F.coalesce(
                "cat_child",
                "res_claim",
                "new_claim",
                F.concat(F.lit("NISS:"), F.col("parent_key"), F.lit("|"), F.col("seq")),
            ),
        )
        .select("parent_key", "seq", "target", "k_first_row")
    )
    _mark("vvi:isstargets")
    iss_alias = (
        iss_claims.filter(~F.col("is_resolved"))
        .join(iss_targets, ["parent_key", "seq"])
        .filter(F.col("ekey0") != F.col("target"))
        .select("ekey0", F.col("target").alias("ekey_alias"))
    )
    _mark("vvi:issalias")
    alias = _cp_opt(vol_alias.unionByName(iss_alias).dropDuplicates(["ekey0"]))

    _mark("vvi-targets")
    # --- final entity keys + collapse -------------------------------------
    rows = _cp(
        rows.join(alias, "ekey0", "left").withColumn(
            "ekey", F.coalesce("ekey_alias", "ekey0")
        ).drop("ekey_alias")
    )
    _mark("clp:rowsrekey")
    ekey_venue = (
        work_venue.join(alias, "ekey0", "left")
        .withColumn("ekey", F.coalesce("ekey_alias", "ekey0"))
        .groupBy("ekey")
        .agg(F.min("vkey").alias("vkey"))
    )

    _mark("clp:ekeyvenue")
    ent = rows.groupBy("ekey").agg(
        F.min("row_id").alias("first_row"),
        F.max("row_id").alias("last_row"),
        F.max(F.col("decision") == "existing").alias("is_resolved"),
        _first_nonempty("title_clean").alias("title_first"),
        _first_nonempty("date_row").alias("date_first"),
        _last_value("date_row").alias("date_last"),
        _first_nonempty("type_row").alias("type_first"),
        _last_value("type_row").alias("type_last"),
        _first_nonempty("volume_clean").alias("vol_first"),
        _last_value("volume_clean").alias("vol_last"),
        _first_nonempty("issue_clean").alias("iss_first"),
        _last_value("issue_clean").alias("iss_last"),
        _first_nonempty("page_clean").alias("page_first"),
        _last_value("page_clean").alias("page_last"),
        F.min(
            F.when(
                F.col("venue_present"),
                F.struct(
                    F.col("row_id").alias("r"),
                    F.col("v_name_eq").alias("n"),
                    F.col("v_ids_eq").alias("i"),
                ),
            )
        ).alias("ven_first"),
        F.max(
            F.struct(
                F.col("row_id").alias("r"),
                F.col("venue_present").alias("p"),
                F.col("v_name_eq").alias("n"),
                F.col("v_ids_eq").alias("i"),
            )
        ).alias("ven_last"),
        F.max(F.size(F.coalesce(F.col("authors"), F.array())) > 0).alias("any_author"),
    )
    _mark("clp:entagg")
    # store lookups keyed on ALL existing final keys (id-resolved ∪ alias
    # targets that are catalog omids)
    final_existing = ent.filter(~F.col("ekey").startswith("NB:")).select(
        F.col("ekey").alias("omid")
    ).dropDuplicates()
    cat_fin = (
        catalog.br.join(final_existing, "omid", "left_semi").select(
            F.col("omid").alias("ekey"),
            F.col("title").alias("cat_title"),
            F.col("pub_date").alias("cat_date"),
            F.col("type").alias("cat_type"),
            F.col("embodiment").alias("cat_embodiment"),
        )
    )
    _mark("clp:catfin")
    ent = (
        ent.join(cat_fin, "ekey", "left")
        .join(store_chain.withColumnRenamed("ekey0", "ekey"), "ekey", "left")
        .join(cat_page.withColumnRenamed("ekey0", "ekey"), "ekey", "left")
        .join(ekey_venue, "ekey", "left")
    )
    _mark("clp:entjoin")
    ent = (
        ent.withColumn("title_f", F.coalesce(nz(F.col("cat_title")), nz(F.col("title_first")), F.lit("")))
        .withColumn("date_f", pick(F.col("cat_date"), F.col("date_first"), F.col("date_last")))
        .withColumn("type_f", pick(F.col("cat_type"), F.col("type_first"), F.col("type_last")))
        .withColumn("vol_f", pick(F.col("s_vol"), F.col("vol_first"), F.col("vol_last")))
        .withColumn("iss_f", pick(F.col("s_iss"), F.col("iss_first"), F.col("iss_last")))
        .withColumn(
            "page_f",
            F.coalesce(nz(F.col("cat_page")), nz(F.col("page_first")), F.lit("")),
        )
        .withColumn(
            "ven_name",
            F.when(F.col("is_resolved"), F.col("ven_first")["n"]).otherwise(
                F.when(F.col("ven_last")["p"], F.col("ven_last")["n"])
            ),
        )
        .withColumn(
            "ven_ids",
            F.when(F.col("is_resolved"), F.col("ven_first")["i"]).otherwise(
                F.when(F.col("ven_last")["p"], F.col("ven_last")["i"])
            ),
        )
        .withColumn(
            "has_venue",
            F.when(F.col("is_resolved"), F.col("ven_first").isNotNull()).otherwise(
                F.coalesce(F.col("ven_last")["p"], F.lit(False))
            ),
        )
        .withColumn("is_new", F.col("ekey").startswith("NB:"))
    )
    _mark("clp:entsel")
    ent = (
        ent.select(
            "ekey", "vkey", "first_row", "last_row", "is_resolved", "is_new",
            "title_f", "date_f", "type_f", "vol_f", "iss_f", "page_f",
            "ven_name", "ven_ids", "has_venue", "cat_re", "cat_embodiment", "any_author",
        )
    )

    _mark("clp:entcp")
    _mark("collapse")
    # --- ONE br mint pass: works → venues → volumes → issues --------------
    # (meta_maker wannabe numbering, curator.py:904-918, phase-ordered like
    # the reference's clean_id → clean_vvi stage order)
    empty_key = F.lit(None).cast("string")
    mint_src = (
        ent.filter(F.col("is_new"))
        .select(
            F.col("ekey").alias("key"),
            F.lit(0).alias("kind_rank"),
            F.col("first_row").alias("ord_row"),
        )
        .unionByName(
            new_venues.select(
                F.col("vkey").alias("key"),
                F.lit(1).alias("kind_rank"),
                F.col("v_first_row").alias("ord_row"),
            )
        )
        .unionByName(
            vol_targets.filter(F.col("target").startswith("NVOL:")).select(
                F.col("target").alias("key"),
                F.lit(2).alias("kind_rank"),
                F.col("k_first_row").alias("ord_row"),
            )
        )
        .unionByName(
            iss_targets.filter(F.col("target").startswith("NISS:")).select(
                F.col("target").alias("key"),
                F.lit(3).alias("kind_rank"),
                F.col("k_first_row").alias("ord_row"),
            )
        )
    )
    br_map = _mint_map(mint_src, ["kind_rank", "ord_row", "key"], "br", prefix, counters["br"], small)

    def _to_omid(df: DataFrame, keycol: str, outcol: str) -> DataFrame:
        """key → final omid: catalog omids pass through, N* keys map."""
        m = br_map.select(F.col("key").alias(keycol), F.col("minted_omid").alias("__m"))
        return (
            df.join(m, keycol, "left")
            .withColumn(outcol, F.coalesce("__m", F.col(keycol)))
            .drop("__m")
        )

    ent = _cp(_to_omid(ent, "ekey", "br_omid"))
    venue_omids = _cp(
        _to_omid(
            ent.filter(F.col("vkey").isNotNull()).select("vkey").dropDuplicates(), "vkey", "venue_omid"
        )
    )
    vol_t = _to_omid(vol_targets, "target", "vol_omid")
    iss_t = _to_omid(iss_targets, "target", "iss_omid")

    # container pointer per entity: issue > volume > venue for articles;
    # venue for volume rows; volume-or-venue for issue rows
    # (creator.py vvi_action nesting).
    ent_c = (
        ent.filter(F.col("has_venue"))
        .join(venue_omids, "vkey", "left")
        .join(
            vol_t.select("vkey", F.col("seq").alias("vol_f"), "vol_omid"),
            ["vkey", "vol_f"],
            "left",
        )
        .withColumn("iss_parent_key", F.coalesce(F.col("vol_omid"), F.col("venue_omid")))
    )
    iss_by_parent = iss_t.select(
        F.col("parent_key").alias("iss_parent_key0"), F.col("seq").alias("iss_f"), "iss_omid"
    )
    # issue targets are keyed by raw parent KEY (pre-mint); map ent's parent
    # key space the same way: vol target key (pre-mint) else vkey
    ent_c = (
        ent_c.join(
            vol_targets.select("vkey", F.col("seq").alias("vol_f"), F.col("target").alias("vol_key")),
            ["vkey", "vol_f"],
            "left",
        )
        .withColumn("iss_parent_raw", F.coalesce(F.col("vol_key"), F.col("vkey")))
        .join(
            iss_by_parent.withColumnRenamed("iss_parent_key0", "iss_parent_raw"),
            ["iss_parent_raw", "iss_f"],
            "left",
        )
    )
    container = (
        ent_c.select(
            "ekey",
            "br_omid",
            "venue_omid",
            "vol_omid",
            "iss_omid",
            F.when(F.col("type_f") == "journal volume", F.col("venue_omid"))
            .when(
                F.col("type_f") == "journal issue",
                F.coalesce(F.col("vol_omid"), F.col("venue_omid")),
            )
            .otherwise(F.coalesce(F.col("iss_omid"), F.col("vol_omid"), F.col("venue_omid")))
            .alias("part_of"),
        )
    )

    _mark("br-mint")
    # --- RE (pages): existing embodiment wins, else mint ------------------
    need_re = ent.filter((F.col("page_f") != "") & F.col("cat_re").isNull() & F.col("cat_embodiment").isNull())
    re_map = _mint_map(
        need_re.select("ekey", F.col("first_row").alias("ord_row")),
        ["ord_row", "ekey"],
        "re",
        prefix,
        counters["re"],
        small,
    )
    page_re = re_map.select("ekey", F.col("minted_omid").alias("re_omid")).unionByName(
        ent.filter(F.col("cat_re").isNotNull()).select("ekey", F.col("cat_re").alias("re_omid"))
    )
    _page_start = F.regexp_extract(F.col("page_f"), r"^\s*([^-\s]+)\s*(?:-\s*([^-\s]+))?\s*$", 1)
    _page_end = F.regexp_extract(F.col("page_f"), r"^\s*([^-\s]+)\s*(?:-\s*([^-\s]+))?\s*$", 2)
    re_new = (
        need_re.join(re_map.select("ekey", "minted_omid"), "ekey").select(
            F.col("minted_omid").alias("omid"),
            _page_start.alias("start_page"),
            F.nullif(_page_end, F.lit("")).alias("end_page"),
        )
    )
    index_re = ent.filter(F.col("page_f") != "").join(page_re, "ekey", "left").select(
        F.col("br_omid").alias("br"), F.col("re_omid").alias("re")
    )

    _mark("re")
    # --- br_new delta ------------------------------------------------------
    new_rows_br = (
        ent.filter(F.col("is_new"))
        .join(container.select("ekey", "part_of"), "ekey", "left")
        .join(re_map.select("ekey", F.col("minted_omid").alias("re_omid")), "ekey", "left")
        .select(
            F.col("br_omid").alias("omid"),
            F.nullif("type_f", F.lit("")).alias("type"),
            F.nullif("title_f", F.lit("")).alias("title"),
            F.nullif("date_f", F.lit("")).alias("pub_date"),
            F.when(F.col("type_f") == "journal volume", F.nullif("vol_f", F.lit("")))
            .when(F.col("type_f") == "journal issue", F.nullif("iss_f", F.lit("")))
            .alias("seq_id"),
            F.col("part_of"),
            F.col("re_omid").alias("embodiment"),
        )
    )
    new_venue_br = (
        _to_omid(new_venues, "vkey", "omid")
        .select(
            "omid",
            F.nullif("v_type_new", F.lit("")).alias("type"),
            F.nullif("v_name_new", F.lit("")).alias("title"),
            F.lit(None).cast("string").alias("pub_date"),
            F.lit(None).cast("string").alias("seq_id"),
            F.lit(None).cast("string").alias("part_of"),
            F.lit(None).cast("string").alias("embodiment"),
        )
    )
    anon_vol_br = (
        vol_t.filter(F.col("target").startswith("NVOL:"))
        .join(venue_omids, "vkey", "left")
        .select(
            F.col("vol_omid").alias("omid"),
            F.lit("journal volume").alias("type"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("pub_date"),
            F.col("seq").alias("seq_id"),
            F.col("venue_omid").alias("part_of"),
            F.lit(None).cast("string").alias("embodiment"),
        )
    )
    parent_omids = _to_omid(
        iss_t.select(F.col("parent_key")).dropDuplicates(), "parent_key", "parent_omid"
    )
    anon_iss_br = (
        iss_t.filter(F.col("target").startswith("NISS:"))
        .join(parent_omids, "parent_key", "left")
        .select(
            F.col("iss_omid").alias("omid"),
            F.lit("journal issue").alias("type"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("pub_date"),
            F.col("seq").alias("seq_id"),
            F.col("parent_omid").alias("part_of"),
            F.lit(None).cast("string").alias("embodiment"),
        )
    )
    br_new = new_rows_br.unionByName(new_venue_br).unionByName(anon_vol_br).unionByName(anon_iss_br)

    _mark("br_new")
    # --- agents (clean_ra, curator.py:575-788) ----------------------------
    # Editors of container-edited types attach to the VENUE entity when the
    # row has authors + venue (get_edited_br_metaid, curator.py:1538-1546).
    ent_graph = (
        ent.join(container.select("ekey", "venue_omid"), "ekey", "left")
        .withColumn(
            "editor_graph",
            F.when(
                F.col("any_author")
                & F.col("has_venue")
                & F.col("type_f").isin(*sorted(CONTAINER_EDITOR_TYPES))
                & F.col("venue_omid").isNotNull(),
                F.col("venue_omid"),
            ).otherwise(F.col("br_omid")),
        )
        .select("ekey", "br_omid", "editor_graph")
    )
    parts = None
    for role, col in (("author", "authors"), ("editor", "editors"), ("publisher", "publishers")):
        p = rows.select("ekey", "row_id", F.lit(role).alias("role"), F.explode(col).alias("a"))
        parts = p if parts is None else parts.unionByName(p)
    men = (
        parts.join(ent_graph, "ekey")
        .withColumn(
            "graph", F.when(F.col("role") == "editor", F.col("editor_graph")).otherwise(F.col("br_omid"))
        )
        .select(
            "ekey",
            "row_id",
            "role",
            "graph",
            F.col("a")["family"].alias("family"),
            F.col("a")["given"].alias("given"),
            F.col("a")["org_name"].alias("org_name"),
            F.col("a")["ids"].alias("a_ids"),
            F.col("a")["pos"].alias("pos"),
        )
        .withColumn(
            "mkey",
            F.concat_ws(":", F.col("row_id").cast("string"), F.col("role"), F.col("pos").cast("string")),
        )
        .withColumn(
            "display",
            F.when(F.col("org_name").isNotNull(), F.col("org_name")).when(
                F.col("family").isNotNull(),
                F.concat(F.col("family"), F.lit(", "), F.coalesce(F.col("given"), F.lit(""))),
            ),
        )
        .withColumn("has_ids", F.size(F.coalesce(F.col("a_ids"), F.array())) > 0)
    )

    # silencer: a silenced role adds nothing where a chain already exists —
    # catalog chain ⇒ drop all mentions; in-batch ⇒ only the first
    # contributing row's mentions survive (curator.py:663-664).
    if silenced_roles:
        cat_chain_keys = catalog.ar.select(
            F.col("br_omid").alias("graph"), F.col("role")
        ).dropDuplicates()
        sil = F.col("role").isin(*sorted(silenced_roles))
        men = men.join(
            cat_chain_keys.withColumn("__has_chain", F.lit(True)), ["graph", "role"], "left"
        )
        first_contrib = men.groupBy("graph", "role").agg(F.min("row_id").alias("__first_contrib"))
        men = (
            men.join(first_contrib, ["graph", "role"])
            .filter(
                ~sil
                | (F.col("__has_chain").isNull() & (F.col("row_id") == F.col("__first_contrib")))
            )
            .drop("__has_chain", "__first_contrib")
        )
    men = _cp(men)

    a_tok = men.select("mkey", "graph", "role", F.explode("a_ids").alias("t")).select(
        "mkey",
        "graph",
        "role",
        F.col("t")["schema"].alias("schema"),
        F.col("t")["value"].alias("value"),
    )
    a_ext = a_tok.filter(F.col("schema") != "omid")
    a_explicit = (
        a_tok.filter((F.col("schema") == "omid") & F.col("value").startswith("ra/"))
        .join(catalog.ra.select(F.col("omid").alias("value")), "value", "left_semi")
        .select("mkey", F.col("value").alias("cand"))
    )
    a_edges = a_ext.select(
        F.concat(F.lit("a:"), F.col("mkey")).alias("src"),
        F.concat(F.lit("t:"), F.col("schema"), F.lit(":"), F.col("value")).alias("dst"),
    )
    a_comp_raw = connected_components(a_edges, "src", "dst")
    a_comp = a_comp_raw.filter(F.col("node").startswith("a:")).select(
        F.expr("substring(node, 3)").alias("mkey"), F.col("comp").alias("id_comp")
    )
    men = men.join(a_comp, "mkey", "left")

    # name adoption: an id-less mention joins the FIRST same-named mention
    # of its (graph, role) bucket (process_individual_ra, curator.py:640-650)
    bucket_first = (
        men.filter(F.col("display").isNotNull())
        .groupBy("graph", "role", "display")
        .agg(
            F.min(F.struct(F.col("row_id").alias("r"), F.col("pos").alias("p"), F.col("mkey").alias("k")))[
                "k"
            ].alias("canon_mkey")
        )
    )
    men = (
        men.join(bucket_first, ["graph", "role", "display"], "left")
        .withColumn(
            "anchor_mkey",
            F.when(~F.col("has_ids") & F.col("canon_mkey").isNotNull(), F.col("canon_mkey")).otherwise(
                F.col("mkey")
            ),
        )
    )
    anchor_comp = men.select(
        F.col("mkey").alias("anchor_mkey"),
        F.coalesce(F.col("id_comp"), F.concat(F.lit("asolo:"), F.col("mkey"))).alias("anchor_comp"),
    )
    men = _cp(
        men.join(anchor_comp, "anchor_mkey", "left").withColumn(
            "a_component", F.col("anchor_comp")
        ).drop("anchor_comp")
    )

    # candidates: verified explicit ra omid > catalog id match > chain name
    cat_ra_ids = cat_ids_all.filter(F.col("entity_omid").startswith("ra/"))
    a_matched = a_ext.join(cat_ra_ids, ["schema", "value"]).select(
        "mkey", F.col("entity_omid").alias("cand")
    )
    # chains surface for EVERY final entity (equalizer fills empty agent
    # cells from the store — curator.py:1419-1421), not just for entities
    # the batch mentioned agents on
    graphs = (
        men.select("graph")
        .unionByName(ent_graph.select(F.col("br_omid").alias("graph")))
        .unionByName(ent_graph.select(F.col("editor_graph").alias("graph")))
        .dropDuplicates()
    )
    cat_chain = _cp(
        catalog.ar.join(graphs, catalog.ar.br_omid == graphs.graph, "left_semi")
        .select(
            F.col("br_omid").alias("graph"),
            F.col("role"),
            F.col("ra_omid").alias("c_ra"),
            F.col("pos").alias("c_pos"),
        )
        .join(
            catalog.ra.select(
                F.col("omid").alias("c_ra"),
                F.col("name").alias("c_name"),
                F.col("family").alias("c_family"),
                F.col("given").alias("c_given"),
            ),
            "c_ra",
        )
        .withColumn(
            "c_display",
            F.when(F.col("c_name").isNotNull(), F.col("c_name")).when(
                F.col("c_family").isNotNull(),
                F.concat(F.col("c_family"), F.lit(", "), F.coalesce(F.col("c_given"), F.lit(""))),
            ),
        )
    )
    # id-bearing mentions whose ids resolve nowhere ALSO name-match against
    # the chain (curator.py:688-700: ar_ra by get_title equality, then the
    # mention's ids are added to the matched RA via id_worker) — so no
    # has_ids filter here; candidate priority keeps id matches above this.
    name_match = (
        men.filter(F.col("display").isNotNull())
        .join(
            cat_chain.select("graph", "role", F.col("c_display").alias("display"), "c_ra", "c_pos"),
            ["graph", "role", "display"],
        )
        .groupBy("mkey")
        .agg(F.min(F.struct(F.col("c_pos").alias("p"), F.col("c_ra").alias("k")))["k"].alias("cand"))
    )
    a_cands = (
        men.select("mkey", "a_component")
        .join(
            a_explicit.withColumn("prio", F.lit(0))
            .unionByName(a_matched.withColumn("prio", F.lit(1)))
            .unionByName(name_match.select("mkey", "cand").withColumn("prio", F.lit(2))),
            "mkey",
            "left",
        )
        .groupBy("a_component")
        .agg(
            F.min(F.when(F.col("prio") == 0, F.col("cand"))).alias("c0"),
            F.min(F.when(F.col("prio") == 1, F.col("cand"))).alias("c1"),
            F.min(F.when(F.col("prio") == 2, F.col("cand"))).alias("c2"),
        )
        .withColumn("ra_existing", F.coalesce("c0", "c1", "c2"))
    )
    men = men.join(a_cands.select("a_component", "ra_existing"), "a_component")

    # new RA components: first mention names the agent; a later mention's
    # given fills a 'Family, ' first mention (name_check, curator.py:1013-22)
    rr = (
        F.when(F.col("role") == "author", 0).when(F.col("role") == "publisher", 1).otherwise(2)
    )
    comp_first = (
        men.withColumn("role_rank", rr)
        .groupBy("a_component")
        .agg(
            F.min(
                F.struct(
                    F.col("row_id").alias("r"),
                    F.col("role_rank").alias("rr"),
                    F.col("pos").alias("p"),
                    F.col("family").alias("family"),
                    F.col("given").alias("given"),
                    F.col("org_name").alias("org_name"),
                )
            ).alias("pick"),
        )
        .select(
            "a_component",
            F.col("pick")["r"].alias("ord_row"),
            F.col("pick")["rr"].alias("ord_role"),
            F.col("pick")["p"].alias("ord_pos"),
            F.col("pick")["family"].alias("family"),
            F.col("pick")["given"].alias("given"),
            F.col("pick")["org_name"].alias("org_name"),
        )
    )
    given_fill = (
        men.filter(F.col("given").isNotNull() & (F.col("given") != ""))
        .groupBy(
            F.col("a_component").alias("__gc"), F.col("family").alias("__gf")
        )
        .agg(
            F.min(F.struct(F.col("row_id").alias("r"), F.col("pos").alias("p"), F.col("given").alias("g")))[
                "g"
            ].alias("fill_given")
        )
    )
    comp_first = comp_first.join(
        given_fill,
        (F.col("a_component") == F.col("__gc")) & F.col("family").eqNullSafe(F.col("__gf")),
        "left",
    ).drop("__gc", "__gf")
    comp_first = comp_first.withColumn(
        "given",
        F.when(
            (F.coalesce(F.col("given"), F.lit("")) == "") & F.col("family").isNotNull(),
            F.coalesce(F.col("fill_given"), F.col("given")),
        ).otherwise(F.col("given")),
    ).drop("fill_given")

    new_ra_comps = comp_first.join(
        men.filter(F.col("ra_existing").isNotNull()).select("a_component").dropDuplicates(),
        "a_component",
        "left_anti",
    )
    ra_map = _mint_map(
        new_ra_comps.select(
            "a_component", "ord_row", "ord_role", "ord_pos", "family", "given", "org_name"
        ),
        ["ord_row", "ord_role", "ord_pos"],
        "ra",
        prefix,
        counters["ra"],
        small,
    )
    men = _cp(
        men.join(ra_map.select("a_component", F.col("minted_omid").alias("ra_minted")), "a_component", "left")
        .withColumn("ra_omid", F.coalesce("ra_existing", "ra_minted"))
    )
    ra_new = ra_map.select(
        F.col("minted_omid").alias("omid"),
        F.col("org_name").alias("name"),
        "family",
        "given",
    )

    # given-name enrichment of EXISTING RAs (name_check against catalog)
    cat_ra_names = catalog.ra.select(
        F.col("omid").alias("ra_omid"),
        F.col("family").alias("cat_family"),
        F.col("given").alias("cat_given"),
    )
    # reference condition (curator.py:725-735): non-publisher role, both
    # names in 'Family, Given' form, store given empty, batch given present
    # — the store FAMILY is kept even when spelled differently (the batch
    # family is not compared); first mention in scan order wins.
    ra_updates = _cp_opt(
        men.filter(
            F.col("given").isNotNull()
            & (F.col("given") != "")
            & F.col("family").isNotNull()
            & (F.col("role") != "publisher")
            & F.col("ra_existing").isNotNull()
        )
        .join(cat_ra_names, "ra_omid")
        .filter(F.col("cat_given").isNull() | (F.col("cat_given") == ""))
        .filter(F.col("cat_family").isNotNull())
        .groupBy("ra_omid")
        .agg(
            F.min(
                F.struct(F.col("row_id").alias("r"), F.col("pos").alias("p"), F.col("given").alias("g"))
            )["g"].alias("given")
        )
        .select(F.col("ra_omid").alias("omid"), "given")
    )

    _mark("agents-ra")
    # --- AR rows: chains continue after the existing max pos --------------
    ar_agents = (
        men.groupBy("graph", "role", "ra_omid")
        .agg(
            F.min(F.struct(F.col("row_id").alias("r"), F.col("pos").alias("p")))["r"].alias("ord_row"),
            F.min(F.struct(F.col("row_id").alias("r"), F.col("pos").alias("p")))["p"].alias("ord_pos"),
        )
        .join(
            cat_chain.select("graph", "role", F.col("c_ra").alias("ra_omid")).dropDuplicates(),
            ["graph", "role", "ra_omid"],
            "left_anti",
        )
    )
    existing_max = cat_chain.groupBy("graph", "role").agg(F.max("c_pos").alias("base_pos"))
    w_newpos = Window.partitionBy("graph", "role").orderBy("ord_row", "ord_pos")
    ar_ranked = (
        ar_agents.join(existing_max, ["graph", "role"], "left")
        .withColumn(
            "pos_final",
            (F.coalesce(F.col("base_pos"), F.lit(0)) + F.row_number().over(w_newpos)).cast("int"),
        )
        .withColumn(
            "role_rank",
            F.when(F.col("role") == "author", 0).when(F.col("role") == "publisher", 1).otherwise(2),
        )
    )
    ar_map = _mint_map(
        ar_ranked,
        ["ord_row", "role_rank", "ord_pos"],
        "ar",
        prefix,
        counters["ar"],
        small,
    )
    ar_new = _cp(
        ar_map.select(
            F.col("minted_omid").alias("omid"),
            F.col("graph").alias("br_omid"),
            "role",
            "ra_omid",
            F.col("pos_final").alias("pos"),
        )
    )

    _mark("ar")
    # --- identifier entities (id/ omids) — one mint pass ------------------
    br_tok = (
        rows.select("ekey", "row_id", F.posexplode_outer("ids").alias("cpos", "t"))
        .filter(F.col("t").isNotNull() & (F.col("t")["schema"] != "omid"))
        .join(ent.select("ekey", "br_omid"), "ekey")
        .select(
            F.col("br_omid").alias("entity_omid"),
            F.col("t")["schema"].alias("schema"),
            F.col("t")["value"].alias("value"),
            "row_id",
            "cpos",
        )
    )
    ven_tok = (
        mentions.select("vkey", "first_row", F.posexplode_outer("ven_ids").alias("cpos", "t"))
        .filter(F.col("t").isNotNull() & (F.col("t")["schema"] != "omid"))
        .join(_to_omid(mentions.select("vkey").dropDuplicates(), "vkey", "venue_omid"), "vkey")
        .select(
            F.col("venue_omid").alias("entity_omid"),
            F.col("t")["schema"].alias("schema"),
            F.col("t")["value"].alias("value"),
            F.col("first_row").alias("row_id"),
            "cpos",
        )
    )
    ra_tok = (
        a_ext.join(men.select("mkey", "row_id", "ra_omid"), "mkey")
        .select(
            F.col("ra_omid").alias("entity_omid"),
            "schema",
            "value",
            "row_id",
            F.lit(0).alias("cpos"),
        )
    )
    all_tok = _cp(br_tok.unionByName(ven_tok).unionByName(ra_tok))
    # F7: temp: identifiers drive in-batch unification but are NEVER
    # persisted as identifier entities (reference core/creator.py:629-631,
    # meta_process_test.py test_temporary_identifiers) — the curated CSV
    # still carries them (the reference creator skips them when reading
    # that CSV back), so the filter applies only to the minted tables.
    persistable_tok = all_tok.filter(F.col("schema") != "temp")
    id_map = _mint_map(
        persistable_tok.select("schema", "value")
        .dropDuplicates()
        .join(catalog.id.select("schema", "value"), ["schema", "value"], "left_anti"),
        ["schema", "value"],
        "id",
        prefix,
        counters["id"],
        small,
    )
    id_new = id_map.select(F.col("minted_omid").alias("omid"), "schema", "value")
    all_id_omids = catalog.id.select("omid", "schema", "value").unionByName(id_new)
    entity_id_new = _cp_opt(
        persistable_tok.select("entity_omid", "schema", "value")
        .dropDuplicates()
        .join(all_id_omids.withColumnRenamed("omid", "id_omid"), ["schema", "value"])
        .select("entity_omid", "id_omid")
        .join(catalog.entity_id, ["entity_omid", "id_omid"], "left_anti")
    )

    _mark("ids")
    # --- provenance snapshots ---------------------------------------------
    created = (
        br_new.select("omid")
        .unionByName(ra_new.select("omid"))
        .unionByName(id_new.select("omid"))
        .unionByName(ar_new.select("omid"))
        .unionByName(re_new.select("omid"))
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
    prev_max = catalog.prov.groupBy(F.col("entity_omid")).agg(F.max("snapshot").alias("prev_n"))
    modified = (
        entity_id_new.select("entity_omid")
        .join(created.withColumnRenamed("omid", "entity_omid"), "entity_omid", "left_anti")
        .unionByName(ra_updates.select(F.col("omid").alias("entity_omid")))
        # an entity can be modified through BOTH paths (new id + name
        # enrichment) — one snapshot per entity per batch
        .dropDuplicates()
    )
    # SPARQL-update delta per modified entity (reference ProvSet,
    # run/meta_process.py:280-288; rendering functions/prov_deltas.py):
    # curation modifies an existing entity in exactly two ways — a new
    # identifier link, or a given-name enrichment — both pure INSERTs.
    ins_triples = (
        entity_id_new.select(
            "entity_omid",
            F.concat(
                _pd_uri(F.col("entity_omid")),
                F.lit(" <http://purl.org/spar/datacite/hasIdentifier> "),
                _pd_uri(F.col("id_omid")),
            ).alias("t"),
        )
        .unionByName(
            ra_updates.select(
                F.col("omid").alias("entity_omid"),
                _pd_triple(F.col("omid"), "given", F.col("given")).alias("t"),
            ).filter(F.col("t").isNotNull())
        )
        .groupBy("entity_omid")
        .agg(F.sort_array(F.collect_set("t")).alias("ins_ts"))
    )
    prov_new = prov_new.unionByName(
        modified.join(prev_max, "entity_omid", "left")
        .join(ins_triples, "entity_omid", "left")
        .select(
            "entity_omid",
            (F.coalesce("prev_n", F.lit(0)) + 1).cast("int").alias("snapshot"),
            F.lit(batch_ts).alias("generated_at"),
            F.lit(None).cast("string").alias("invalidated_at"),
            F.array(F.col("entity_omid")).cast("array<string>").alias("derived_from"),
            F.lit(resp_agent).alias("resp_agent"),
            F.lit(None).cast("string").alias("primary_source"),
            F.lit("entity modified").alias("description"),
            _pd_sparql_update(
                _pd_kind_graph(F.col("entity_omid")),
                F.array().cast("array<string>"),
                F.coalesce(F.col("ins_ts"), F.array().cast("array<string>")),
            ).alias("update_query"),
        )
    )

    _mark("prov")
    # --- curated CSV rows (enrich, curator.py:969-1011) -------------------
    # id column: batch tokens in first-occurrence order, then catalog-only
    # ids (sorted), then the omid last.
    # single consumer (the final `curated` join) — no _cp: materializing
    # it separately paid a full extra pass + job for a frame nothing else
    # references (r13 site audit)
    cat_ids_of = (
        final_existing.join(
            cat_ids_all, final_existing.omid == cat_ids_all.entity_omid, "inner"
        )
        .groupBy("entity_omid")
        .agg(F.array_sort(F.collect_set(F.concat_ws(":", "schema", "value"))).alias("cat_toks"))
        .withColumnRenamed("entity_omid", "br_omid")
    )
    # first-occurrence-ordered batch tokens per ENTITY (works and venues
    # alike — a venue cell's extra ids flow into the entity's id column,
    # the reference's merge_entities_in_csv behavior)
    # two-level agg: FIRST occurrence per distinct token, THEN the ordered
    # array.  A single collect_set of (row_id, cpos, token) structs keeps
    # one struct per MENTION — an entity referenced by N rows would carry
    # an N-element array on every joined row (O(N²) at scale).
    batch_toks_of = (
        all_tok.groupBy("entity_omid", F.concat_ws(":", "schema", "value").alias("t"))
        .agg(F.min(F.struct(F.col("row_id").alias("r"), F.col("cpos").alias("c"))).alias("o"))
        .groupBy("entity_omid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("o")["r"].alias("r"), F.col("o")["c"].alias("c"), F.col("t").alias("t")))
                ),
                lambda s: s["t"],
            ).alias("batch_toks")
        )
        .withColumnRenamed("entity_omid", "br_omid")
    )
    batch_toks_of = _cp(batch_toks_of)
    arr_empty = F.array().cast("array<string>")
    # nullif: a row with no persistable ids (empty id cell, or temp-only
    # after F7 suppression upstream) must serialize as "omid:br/x", not
    # " omid:br/x" — the concat_ws empty-string pitfall again
    id_string = F.concat_ws(
        " ",
        F.nullif(
            F.array_join(
                F.concat(
                    F.array_distinct(F.coalesce(F.col("batch_toks"), arr_empty)),
                    F.array_except(
                        F.coalesce(F.col("cat_toks"), arr_empty),
                        F.coalesce(F.col("batch_toks"), arr_empty),
                    ),
                ),
                " ",
            ),
            F.lit(""),
        ),
        F.concat(F.lit("omid:"), F.col("br_omid")),
    )

    # venue string: title + (batch ∪ catalog) ids + omid
    ven_cat_ids = (
        venue_omids.join(
            cat_ids_all, venue_omids.venue_omid == cat_ids_all.entity_omid, "inner"
        )
        .groupBy("venue_omid")
        .agg(F.array_sort(F.collect_set(F.concat_ws(":", "schema", "value"))).alias("v_cat_toks"))
    )
    ven_title = venue_omids.join(
        catalog.br.select(F.col("omid").alias("venue_omid"), F.col("title").alias("v_cat_title")),
        "venue_omid",
        "left",
    )
    # venue title: catalog title > the venue ENTITY's own batch title (a
    # venue resolved to a batch work shows that work's title — golden
    # cases 10/11) > the mention's cleaned name
    ven_batch_title = ent.select(
        F.col("br_omid").alias("venue_omid"), F.col("title_f").alias("v_ent_title")
    )
    ven_batch_toks = batch_toks_of.select(
        F.col("br_omid").alias("venue_omid"), F.col("batch_toks").alias("v_ent_toks")
    )
    ent_v = (
        ent.join(venue_omids, "vkey", "left")
        .join(ven_cat_ids, "venue_omid", "left")
        .join(ven_title.select("venue_omid", "v_cat_title").dropDuplicates(), "venue_omid", "left")
        .join(ven_batch_title.dropDuplicates(["venue_omid"]), "venue_omid", "left")
        .join(ven_batch_toks.dropDuplicates(["venue_omid"]), "venue_omid", "left")
    )
    # single consumer (the final `curated` join) — no _cp (r13 site audit)
    v_batch_toks = F.coalesce(F.col("v_ent_toks"), arr_empty)
    venue_string = F.when(
        F.col("has_venue") & F.col("venue_omid").isNotNull(),
        F.concat(
            F.coalesce(
                F.nullif(
                    F.coalesce(F.col("v_cat_title"), F.nullif("v_ent_title", F.lit("")), F.col("ven_name")),
                    F.lit(""),
                ),
                F.lit(""),
            ),
            F.lit(" ["),
            # nullif: no stray space when the venue has no external ids yet
            # (same concat_ws empty-string pitfall as a_ids_str)
            F.concat_ws(
                " ",
                F.nullif(
                    F.array_join(
                        F.concat(
                            F.array_distinct(v_batch_toks),
                            F.array_except(F.coalesce(F.col("v_cat_toks"), arr_empty), v_batch_toks),
                        ),
                        " ",
                    ),
                    F.lit(""),
                ),
                F.concat(F.lit("omid:"), F.col("venue_omid")),
            ),
            F.lit("]"),
        ),
    ).otherwise("")

    # agent chain strings: full chain (catalog + new) per (graph, role)
    ra_batch_ids = (
        ra_tok.groupBy("entity_omid")
        .agg(F.array_sort(F.collect_set(F.concat_ws(":", "schema", "value"))).alias("ra_b_toks"))
        .withColumnRenamed("entity_omid", "ra_omid")
    )
    chain_ras = (
        cat_chain.select("graph", "role", F.col("c_ra").alias("ra_omid"), F.col("c_pos").alias("pos"))
        .unionByName(ar_new.select(F.col("br_omid").alias("graph"), "role", "ra_omid", "pos"))
    )
    ra_names = (
        catalog.ra.join(ra_updates.withColumnRenamed("omid", "u_omid").withColumnRenamed("given", "u_given"),
                        catalog.ra.omid == F.col("u_omid"), "left")
        .select(
            F.col("omid").alias("ra_omid"),
            F.col("name").alias("r_name"),
            F.col("family").alias("r_family"),
            F.coalesce(F.nullif(F.col("given"), F.lit("")), F.col("u_given")).alias("r_given"),
        )
        .unionByName(
            ra_new.select(
                F.col("omid").alias("ra_omid"),
                F.col("name").alias("r_name"),
                F.col("family").alias("r_family"),
                F.col("given").alias("r_given"),
            )
        )
    )
    ra_cat_ids = (
        chain_ras.select("ra_omid")
        .dropDuplicates()
        .join(cat_ids_all, F.col("ra_omid") == cat_ids_all.entity_omid, "inner")
        .groupBy("ra_omid")
        .agg(F.array_sort(F.collect_set(F.concat_ws(":", "schema", "value"))).alias("ra_c_toks"))
    )
    chain_fmt = (
        chain_ras.join(ra_names, "ra_omid", "left")
        .join(ra_batch_ids, "ra_omid", "left")
        .join(ra_cat_ids, "ra_omid", "left")
        .withColumn(
            "a_display",
            F.when(F.col("r_name").isNotNull(), F.col("r_name")).when(
                F.col("r_family").isNotNull(),
                F.concat(F.col("r_family"), F.lit(", "), F.coalesce(F.col("r_given"), F.lit(""))),
            ),
        )
        .withColumn(
            "a_ids_str",
            # nullif: an id-less agent must serialize as "[omid:ra/x]", not
            # "[ omid:ra/x]" — concat_ws skips NULL parts but keeps the
            # separator for empty strings (reference format, e.g.
            # test/testcases: "Name [omid:ra/0614]")
            F.concat_ws(
                " ",
                F.nullif(
                    F.array_join(
                        F.concat(
                            F.array_distinct(F.coalesce(F.col("ra_b_toks"), arr_empty)),
                            F.array_except(
                                F.coalesce(F.col("ra_c_toks"), arr_empty),
                                F.coalesce(F.col("ra_b_toks"), arr_empty),
                            ),
                        ),
                        " ",
                    ),
                    F.lit(""),
                ),
                F.concat(F.lit("omid:"), F.col("ra_omid")),
            ),
        )
        .withColumn(
            "entry",
            F.when(
                F.col("a_display").isNotNull(),
                F.concat(F.col("a_display"), F.lit(" ["), F.col("a_ids_str"), F.lit("]")),
            ).otherwise(F.concat(F.lit("["), F.col("a_ids_str"), F.lit("]"))),
        )
    )
    chain_str = (
        chain_fmt.groupBy("graph", "role")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "entry"))), lambda s: s["entry"]
                ),
                "; ",
            ).alias("chain")
        )
    )
    # referenced three times (one role_chain per role) — cut once
    chain_str = _cp(chain_str)
    role_chain = {}
    for role in ROLES:
        role_chain[role] = chain_str.filter(F.col("role") == role).select(
            F.col("graph"), F.col("chain").alias(f"{role}_chain")
        )

    curated = (
        ent.join(ent_graph.select("ekey", "editor_graph"), "ekey", "left")
        .join(batch_toks_of, "br_omid", "left")
        .join(cat_ids_of, "br_omid", "left")
        .join(
            ent_v.select("ekey", "venue_omid", "v_cat_title", "v_ent_title", "v_ent_toks", "v_cat_toks"),
            "ekey",
            "left",
        )
        .join(role_chain["author"].withColumnRenamed("graph", "br_omid"), "br_omid", "left")
        .join(role_chain["publisher"].withColumnRenamed("graph", "br_omid"), "br_omid", "left")
        .join(role_chain["editor"].withColumnRenamed("graph", "editor_graph"), "editor_graph", "left")
        .select(
            # order = FIRST occurrence (the reference's dict-key insertion
            # order, curator.py:333); content = last row's values.
            F.col("first_row").alias("row_id"),
            id_string.alias("id"),
            F.col("title_f").alias("title"),
            F.coalesce("author_chain", F.lit("")).alias("author"),
            F.col("date_f").alias("pub_date"),
            venue_string.alias("venue"),
            F.col("vol_f").alias("volume"),
            F.col("iss_f").alias("issue"),
            F.col("page_f").alias("page"),
            F.col("type_f").alias("type"),
            F.coalesce("publisher_chain", F.lit("")).alias("publisher"),
            F.coalesce("editor_chain", F.lit("")).alias("editor"),
        )
        .orderBy("row_id")
    )

    _mark("curated")
    # --- index tables (indexer, curator.py:1045-1097) ---------------------
    id_lookup = all_id_omids.withColumnRenamed("omid", "id_omid")
    br_touched_ids = (
        all_tok.filter(~F.col("entity_omid").startswith("ra/"))
        .select("schema", "value")
        .unionByName(
            final_existing.join(cat_ids_all, final_existing.omid == cat_ids_all.entity_omid)
            .select("schema", "value")
        )
        .unionByName(
            venue_omids.join(cat_ids_all, venue_omids.venue_omid == cat_ids_all.entity_omid)
            .select("schema", "value")
        )
        .dropDuplicates()
    )
    index_id_br = br_touched_ids.join(id_lookup, ["schema", "value"]).select(
        F.concat_ws(":", "schema", "value").alias("id"), F.col("id_omid").alias("meta")
    )
    ra_touched_ids = (
        ra_tok.select("schema", "value")
        .unionByName(
            chain_ras.select("ra_omid").dropDuplicates()
            .join(cat_ids_all, F.col("ra_omid") == cat_ids_all.entity_omid)
            .select("schema", "value")
        )
        .dropDuplicates()
    )
    index_id_ra = ra_touched_ids.join(id_lookup, ["schema", "value"]).select(
        F.concat_ws(":", "schema", "value").alias("id"), F.col("id_omid").alias("meta")
    )
    cat_ar_omids = catalog.ar.select(
        F.col("br_omid").alias("graph"), "role", "ra_omid", "pos", F.col("omid").alias("cat_ar")
    )
    ar_all = (
        chain_ras.join(cat_ar_omids, ["graph", "role", "ra_omid", "pos"], "left")
        .join(
            ar_new.select(
                F.col("br_omid").alias("graph"), "role", "ra_omid", "pos", F.col("omid").alias("new_ar")
            ),
            ["graph", "role", "ra_omid", "pos"],
            "left",
        )
        .withColumn("ar_omid", F.coalesce("cat_ar", "new_ar"))
    )
    index_ar = (
        ar_all.withColumn("pair", F.concat_ws(", ", "ar_omid", "ra_omid"))
        .groupBy("graph", "role")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "pair"))), lambda s: s["pair"]),
                "; ",
            ).alias("chain")
        )
        .groupBy("graph")
        .pivot("role", list(ROLES))
        .agg(F.first("chain"))
        .select(
            F.col("graph").alias("meta"),
            F.coalesce("author", F.lit("")).alias("author"),
            F.coalesce("editor", F.lit("")).alias("editor"),
            F.coalesce("publisher", F.lit("")).alias("publisher"),
        )
    )

    _mark("indexes")
    counters_new = _counters_new(
        spark,
        counters,
        {"br": br_map, "ra": ra_map, "id": id_map, "ar": ar_map, "re": re_map},
        prefix,
        prev_counters=catalog.counters,
    )

    return CurationResult(
        curated=curated,
        br_new=br_new,
        ra_new=ra_new,
        ra_updates=ra_updates,
        id_new=id_new,
        entity_id_new=entity_id_new,
        ar_new=ar_new,
        re_new=re_new,
        prov_new=prov_new,
        index_id_br=index_id_br,
        index_id_ra=index_id_ra,
        index_ar=index_ar,
        index_re=index_re,
        counters_new=counters_new,
    )
