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

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------------
# Python-core agent-cell parser (the curation path).  Implements the FULL
# reference cell semantics — clean_ra_list (lib/cleaner.py:320-372):
# 'Not Available' dropping, cell-level shared-id stripping, same-name+id
# duplicate dropping — then clean_name casing and id validation per entry
# (core/curator.py clean_ra process_individual_ra + clean_id_list).
# One Arrow batch per ~10k cells; cells are tiny, so this stays cheap.
# ---------------------------------------------------------------------------

_SEMI_SPLIT = re.compile(r"\s*;\s*(?=[^\]]*(?:\[|$))")
_ID_TOKEN_RE = r"[^\s\[\]]+:[^\s\[\]]+"
_NAME_IDS_RE = re.compile(
    rf"\s*(?P<name>.*?)(?:\s*\[\s*(?P<ids>(?:{_ID_TOKEN_RE})?(?:\s+{_ID_TOKEN_RE})*)\s*\]|\s*\Z)"
)


def split_name_and_ids_py(text: str) -> tuple[str, str]:
    m = _NAME_IDS_RE.match(text or "")
    if m is None:  # the pattern matches any input by construction
        return (text or "").strip(), ""
    return m["name"], m["ids"] or ""


def clean_ra_list_py(entries: list[str]) -> list[tuple[str, list[str]]]:
    """Reference clean_ra_list: returns [(normalized_name, raw_ids)] in
    input order with 'Not Available' entries dropped, ids shared between
    cell entries stripped, and same-name duplicates sharing an id removed."""
    from oc_meta_spark.functions.cleaning import normalize_ra_name_py

    parsed: list[tuple[str, str, list[str]]] = []
    agents_ids: dict[str, dict[str, None]] = {}
    for ra in entries:
        raw_name, ids_str = split_name_and_ids_py(ra)
        name = normalize_ra_name_py(raw_name)
        ids = ids_str.split()
        if not name and not ids:
            continue
        key = name or ra
        parsed.append((key, name, ids))
        if ids:
            agents_ids.setdefault(key, {}).update(dict.fromkeys(ids))

    occurrences: dict[str, int] = {}
    for bucket in agents_ids.values():
        for identifier in bucket:
            occurrences[identifier] = occurrences.get(identifier, 0) + 1
    shared = {i for i, n in occurrences.items() if n > 1}

    out: list[tuple[str, list[str]]] = []
    seen_by_name: dict[str, set[str]] = {}
    for _key, name, ids in parsed:
        kept = [i for i in ids if i not in shared]
        if not name:
            out.append(("", kept))
            continue
        kept_set = set(kept)
        if name in seen_by_name and seen_by_name[name] & kept_set:
            continue
        seen_by_name.setdefault(name, set()).update(kept_set)
        out.append((name, kept))
    return out


def parse_agent_cell_py(cell: str | None) -> list[dict]:
    """Full agent-cell grammar → list of agent dicts (family, given,
    org_name, ids, pos).  Names are clean_name-cased; ids are validated
    and deduped (omid tokens pass through with schema 'omid')."""
    from oc_meta_spark.functions.cleaning import clean_name_py
    from oc_meta_spark.functions.ids import normalize_id_token

    if not cell:
        return []
    raw_entries = [e for e in (s.strip() for s in _SEMI_SPLIT.split(cell)) if e]
    agents: list[dict] = []
    for name, raw_ids in clean_ra_list_py(raw_entries):
        tokens: list[dict] = []
        seen: set[str] = set()
        for tok in raw_ids:
            norm = normalize_id_token(tok)
            if norm is None or norm in seen:
                continue
            seen.add(norm)
            schema, _, value = norm.partition(":")
            tokens.append({"schema": schema, "value": value})
        cased = clean_name_py(name) if name else ""
        if not cased and not tokens:
            continue
        if "," in cased:
            family, _, given = cased.partition(",")
            agent = {"family": family.strip(), "given": given.strip(), "org_name": None}
        elif cased:
            agent = {"family": None, "given": None, "org_name": cased}
        else:
            agent = {"family": None, "given": None, "org_name": None}
        agent["ids"] = tokens
        agent["pos"] = len(agents) + 1
        agents.append(agent)
    return agents


_AGENT_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("family", T.StringType()),
            T.StructField("given", T.StringType()),
            T.StructField("org_name", T.StringType()),
            T.StructField(
                "ids",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("schema", T.StringType()), T.StructField("value", T.StringType())]
                    )
                ),
            ),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


@pandas_udf(_AGENT_STRUCT)
def parse_agent_cell_udf(s: pd.Series) -> pd.Series:
    return s.map(parse_agent_cell_py)
