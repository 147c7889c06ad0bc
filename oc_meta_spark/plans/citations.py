"""Citation-identifier resolution (SURVEY J8; reference
oc_meta/run/meta/convert_citations.py:33-108).

Input: citation rows (citing_id, cited_id) in any known identifier scheme.
Both ends are mapped to OMIDs through the identifier tables; rows with an
unresolvable end are dropped and counted (anti-join orphan report) — the
reference writes them to a 'non_mapped' file.

The mapping join is the engine's bread-and-butter broadcast lookup: the
citation batch keys on lowercase ``schema:value`` and joins id ⋈ entity_id
twice (citing, cited).  At 100 TB the citations table is the big side and
the *id mapping* may be too; both joins are plain shuffled hash joins on
the same key, so co-partitioning the two passes reuses the exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oc_meta_spark.plans.curation import EntityCatalog


@dataclass
class CitationConversion:
    resolved: DataFrame  # citing_omid, cited_omid
    orphans: DataFrame  # side ('citing'|'cited'), id


def id_to_omid_mapping(catalog: EntityCatalog) -> DataFrame:
    """schema:value (lowercased) → entity omid, BR entities only."""
    return (
        catalog.id.join(catalog.entity_id, catalog.id.omid == catalog.entity_id.id_omid)
        .filter(F.col("entity_omid").startswith("br/"))
        .select(
            F.lower(F.concat_ws(":", "schema", "value")).alias("id_key"),
            "entity_omid",
        )
        .dropDuplicates(["id_key"])  # multi-OMID ids resolve to min deterministically
    )


def convert_citations(citations: DataFrame, catalog: EntityCatalog) -> CitationConversion:
    """Map (citing_id, cited_id) → (citing_omid, cited_omid); report orphans."""
    mapping = id_to_omid_mapping(catalog)
    c = citations.select(
        F.lower(F.trim("citing_id")).alias("citing_key"),
        F.lower(F.trim("cited_id")).alias("cited_key"),
    )
    m1 = mapping.select(F.col("id_key").alias("citing_key"), F.col("entity_omid").alias("citing_omid"))
    m2 = mapping.select(F.col("id_key").alias("cited_key"), F.col("entity_omid").alias("cited_omid"))
    joined = c.join(m1, "citing_key", "left").join(m2, "cited_key", "left")
    resolved = (
        joined.filter(F.col("citing_omid").isNotNull() & F.col("cited_omid").isNotNull())
        .select("citing_omid", "cited_omid")
        .dropDuplicates()
    )
    orphans = (
        joined.filter(F.col("citing_omid").isNull())
        .select(F.lit("citing").alias("side"), F.col("citing_key").alias("id"))
        .unionByName(
            joined.filter(F.col("cited_omid").isNull()).select(
                F.lit("cited").alias("side"), F.col("cited_key").alias("id")
            )
        )
        .dropDuplicates()
    )
    return CitationConversion(resolved=resolved, orphans=orphans)
