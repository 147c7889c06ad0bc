"""Cell micro-grammar parsing (SURVEY §1.1, C10/C12).

The reference parses cells on demand with regexes (RE_NAME_AND_IDS /
split_name_and_ids, oc_meta/lib/master_of_regex.py:35-63;
RE_SEMICOLON_IN_PEOPLE_FIELD :8,27 — split on ';' outside brackets).
Here the grammar is parsed **once** into nested columns — native Spark
expressions only, no UDFs:

- id cells:   ``doi:10/x pmid:123``           → array<struct<schema,value>>
- name cells: ``Name [id id]``                → struct<name, ids>
- agent lists: ``A, B [x]; ACME [y]; C, D``   → array of agent structs with
  explicit ``pos`` (the engine's replacement for oco:hasNext chains).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# ';' outside brackets — the reference's RE_SEMICOLON_IN_PEOPLE_FIELD.
_SEMI_OUTSIDE_BRACKETS = r";(?![^\[\]]*\])"
_NAME_AND_IDS = r"^\s*(.*?)\s*(?:\[\s*(.*?)\s*\])?\s*$"


def parse_id_cell(col: Column) -> Column:
    """Space-separated ``schema:value`` tokens → array<struct<schema,value>>."""
    tokens = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")
    return F.transform(
        tokens,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, r"^([^:]*):", 1)).alias("schema"),
            F.regexp_extract(t, r"^[^:]*:(.*)$", 1).alias("value"),
        ),
    )


def split_name_and_ids(col: Column) -> Column:
    """``Name [id id ...]`` → struct<name string, ids array<struct>>.

    Never fails: bracketless cells yield (name, []) — the reference regex
    "matches everything" by design.
    """
    name = F.trim(F.regexp_extract(col, _NAME_AND_IDS, 1))
    ids_str = F.regexp_extract(col, _NAME_AND_IDS, 2)
    return F.struct(name.alias("name"), parse_id_cell(ids_str).alias("ids"))


def build_name_ids_string(name: Column, ids: Column) -> Column:
    """Inverse of split_name_and_ids for export (SURVEY C12)."""
    ids_str = F.array_join(F.transform(ids, lambda i: F.concat_ws(":", i["schema"], i["value"])), " ")
    return F.when(ids_str == "", name).otherwise(F.concat(name, F.lit(" ["), ids_str, F.lit("]")))


def parse_agent_cell(col: Column) -> Column:
    """Agent-list cell → array<struct<family,given,org_name,ids,pos>>.

    Grammar per docs/30-csv-format.md "Name parsing": entries split on ';'
    outside brackets; an entry with a comma is a person (``Family, Given``),
    without is an organization.  ``pos`` is the 1-based list position — the
    explicit ordering column that replaces the hasNext linked list.
    """
    entries = F.filter(
        F.transform(F.split(col, _SEMI_OUTSIDE_BRACKETS), lambda e: F.trim(e)),
        lambda e: e != "",
    )

    def entry_to_agent(e: Column, i: Column) -> Column:
        name = F.trim(F.regexp_extract(e, _NAME_AND_IDS, 1))
        ids = parse_id_cell(F.regexp_extract(e, _NAME_AND_IDS, 2))
        is_person = name.contains(",")
        family = F.when(is_person, F.trim(F.regexp_extract(name, r"^([^,]*),", 1))).otherwise(F.lit(None))
        given = F.when(is_person, F.trim(F.regexp_extract(name, r",(.*)$", 1))).otherwise(F.lit(None))
        org = F.when(~is_person, name).otherwise(F.lit(None))
        return F.struct(
            family.alias("family"),
            F.when(given == "", None).otherwise(given).alias("given"),
            org.alias("org_name"),
            ids.alias("ids"),
            (i + 1).cast("int").alias("pos"),
        )

    # transform with (element, index) lambda gives deterministic positions.
    return F.transform(entries, entry_to_agent)
