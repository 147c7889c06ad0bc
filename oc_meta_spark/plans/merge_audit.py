"""Post-merge integrity audit — the ``run/merge/check_merged_*_results``
family re-expressed as relational predicates over the columnar store.

Reference behavior (file:line):
- ``run/merge/check_merged_brs_results.py:37-86`` BR constraints (type,
  identifier presence, ≤1 title/partOf/date/sequence-id, sequence id only
  on volumes/issues), ``:89-126`` existence + dangling-reference probes
  (merged must be gone and unreferenced, surviving must exist);
- ``run/merge/check_merged_ras_results.py:35-69`` agent constraints
  (identifier presence, at least one of name/givenName/familyName);
- ``run/merge/check_merged_ids_results.py:33-130`` provenance-chain
  invariants (≥2 snapshots, contiguous numbering, generation times,
  non-last snapshots invalidated, surviving's last NOT invalidated,
  merged's last invalidated, first snapshot underived, merge snapshots
  multi-derived, others derived from the previous snapshot).

The reference audits one entity at a time (zip + JSON-LD parse + SPARQL
ASK per entity, multiprocessing over files).  Here every check is a set
operation over the whole store — anti-joins and one window over the prov
table — so the audit is a handful of shuffles regardless of entity count.

Cardinality constraints (≤1 title / partOf / date / sequence id) are
enforced by the columnar schema itself (one column per property); the
audit checks what the schema cannot: presence, references to dead
entities, type-conditional properties, and prov-chain discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oc_meta_spark.plans.curation import EntityCatalog
from oc_meta_spark.plans.merge import resolve_chains

# br types allowed to carry fabio:hasSequenceIdentifier
# (check_merged_brs_results.py:75-85)
_SEQ_OK = ("journal volume", "journal issue")


def _issues(df: DataFrame, role: str, issue: str) -> DataFrame:
    return df.select(
        F.col("omid"),
        F.lit(role).alias("role"),
        F.lit(issue).alias("issue"),
    )


def audit_merges(catalog: EntityCatalog, instructions: DataFrame) -> DataFrame:
    """Audit a store AFTER ``apply_merges`` ran for ``instructions``
    (surviving_entity, merged_entity).  Returns (omid, role, issue) — one
    row per violated invariant; an empty result is a clean merge."""
    mapping = resolve_chains(
        instructions.select(
            F.col("merged_entity").alias("old"), F.col("surviving_entity").alias("new")
        )
    ).select(F.col("old").alias("m"), F.col("final").alias("s"))
    merged = mapping.select(F.col("m").alias("omid")).distinct()
    surviving = mapping.select(F.col("s").alias("omid")).distinct()

    live = None
    for t in (catalog.br, catalog.ra, catalog.id, catalog.ar, catalog.re):
        sel = t.select("omid")
        live = sel if live is None else live.unionByName(sel)
    live = live.distinct()

    # -- existence (brs:89-110) --------------------------------------------
    still_exists = _issues(
        merged.join(live, "omid", "left_semi"), "merged", "merged entity still exists"
    )
    gone_survivor = _issues(
        surviving.join(live, "omid", "left_anti"),
        "surviving",
        "surviving entity does not exist",
    )

    # -- dangling references (brs:112-126) ---------------------------------
    refs = None
    for src, col in (
        (catalog.br, "part_of"),
        (catalog.br, "embodiment"),
        (catalog.ar, "br_omid"),
        (catalog.ar, "ra_omid"),
        (catalog.entity_id, "entity_omid"),
        (catalog.entity_id, "id_omid"),
    ):
        sel = src.select(F.col(col).alias("omid")).filter(
            F.nullif(F.col(col), F.lit("")).isNotNull()
        )
        refs = sel if refs is None else refs.unionByName(sel)
    dangling = _issues(
        merged.join(refs.distinct(), "omid", "left_semi"),
        "merged",
        "merged entity still referenced",
    )

    # -- surviving BR constraints (brs:37-86) ------------------------------
    s_br = catalog.br.join(surviving, "omid", "left_semi")
    br_no_id = _issues(
        s_br.join(
            catalog.entity_id.select(F.col("entity_omid").alias("omid")),
            "omid",
            "left_anti",
        ),
        "surviving",
        "br has no identifier",
    )
    br_bad_seq = _issues(
        s_br.filter(
            F.nullif(F.col("seq_id"), F.lit("")).isNotNull()
            & ~F.col("type").isin(*_SEQ_OK)
        ),
        "surviving",
        "sequence identifier on non-volume/issue",
    )

    # -- surviving RA constraints (ras:35-69) ------------------------------
    s_ra = catalog.ra.join(surviving, "omid", "left_semi")
    ra_no_id = _issues(
        s_ra.join(
            catalog.entity_id.select(F.col("entity_omid").alias("omid")),
            "omid",
            "left_anti",
        ),
        "surviving",
        "agent has no identifier",
    )
    empty = lambda c: F.nullif(F.col(c), F.lit("")).isNull()  # noqa: E731
    ra_no_name = _issues(
        s_ra.filter(empty("name") & empty("given") & empty("family")),
        "surviving",
        "agent has no name properties",
    )

    # -- surviving ID constraints (ids: literal/schema presence) -----------
    s_id = catalog.id.join(surviving, "omid", "left_semi")
    id_malformed = _issues(
        s_id.filter(empty("schema") | empty("value")),
        "surviving",
        "identifier missing schema or value",
    )
    id_orphan = _issues(
        s_id.join(
            catalog.entity_id.select(F.col("id_omid").alias("omid")), "omid", "left_anti"
        ),
        "surviving",
        "identifier not linked from any entity",
    )

    # -- provenance chain (ids:33-130) -------------------------------------
    participants = merged.select("omid", F.lit("merged").alias("role")).unionByName(
        surviving.select("omid", F.lit("surviving").alias("role"))
    )
    p = catalog.prov.join(
        participants.withColumnRenamed("omid", "entity_omid"), "entity_omid"
    )
    w = Window.partitionBy("entity_omid")
    stats = p.select(
        "entity_omid",
        "role",
        "snapshot",
        "invalidated_at",
        "generated_at",
        "derived_from",
        "description",
        F.count(F.lit(1)).over(w).alias("n"),
        F.max("snapshot").over(w).alias("mx"),
        F.min("snapshot").over(w).alias("mn"),
        F.size(F.collect_set("snapshot").over(w)).alias("nd"),
    )

    def prov_issue(cond, issue: str, role_filter: str | None = None) -> DataFrame:
        df = stats.filter(cond)
        if role_filter is not None:
            df = df.filter(F.col("role") == role_filter)
        return df.select(
            F.col("entity_omid").alias("omid"), "role", F.lit(issue).alias("issue")
        ).distinct()

    too_few = prov_issue(F.col("n") < 2, "fewer than two snapshots")
    non_contig = prov_issue(
        (F.col("mn") != 1) | (F.col("mx") != F.col("n")) | (F.col("nd") != F.col("n")),
        "non-contiguous snapshot numbers",
    )
    no_gen = prov_issue(
        F.nullif(F.col("generated_at"), F.lit("")).isNull(),
        "snapshot has no generation time",
    )
    mid_live = prov_issue(
        (F.col("snapshot") < F.col("mx"))
        & F.nullif(F.col("invalidated_at"), F.lit("")).isNull(),
        "non-last snapshot not invalidated",
    )
    surv_dead = prov_issue(
        (F.col("snapshot") == F.col("mx"))
        & F.nullif(F.col("invalidated_at"), F.lit("")).isNotNull(),
        "surviving last snapshot invalidated",
        role_filter="surviving",
    )
    merged_live = prov_issue(
        (F.col("snapshot") == F.col("mx"))
        & F.nullif(F.col("invalidated_at"), F.lit("")).isNull(),
        "merged entity not invalidated",
        role_filter="merged",
    )
    first_derived = prov_issue(
        (F.col("snapshot") == 1) & (F.size("derived_from") > 0),
        "first snapshot has derivation",
    )
    later_underived = prov_issue(
        (F.col("snapshot") > 1)
        & (
            (F.size("derived_from") == 0)
            | (F.col("derived_from")[0] != F.col("entity_omid"))
        ),
        "snapshot not derived from own chain",
    )
    # Merge snapshots must be MULTI-derived (survivor chain + ≥1 merged
    # entity): the reference treats ≥2 wasDerivedFrom as the merge marker
    # (run/find/merged_entities.py:23-65), so a merge-described snapshot
    # deriving only from itself is a broken merge record even though its
    # derived_from[0] is its own chain.
    merge_underived = prov_issue(
        (F.col("description") == "entities merged")
        & (F.size("derived_from") < 2),
        "merge snapshot not multi-derived",
    )
    # entities in the merge list with no provenance at all
    no_prov = (
        participants.join(
            catalog.prov.select(F.col("entity_omid").alias("omid")).distinct(),
            "omid",
            "left_anti",
        )
        .select("omid", "role", F.lit("entity has no provenance").alias("issue"))
    )

    out = still_exists
    for part in (
        gone_survivor,
        dangling,
        br_no_id,
        br_bad_seq,
        ra_no_id,
        ra_no_name,
        id_malformed,
        id_orphan,
        too_few,
        non_contig,
        no_gen,
        mid_live,
        surv_dead,
        merged_live,
        first_derived,
        later_underived,
        merge_underived,
        no_prov,
    ):
        out = out.unionByName(part)
    return out.distinct()
