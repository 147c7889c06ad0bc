"""OCDM Turtle → EntityCatalog import (S11: foreign-RDF ingestion).

Parses the OCDM Turtle subset the reference emits and tests with
(test/testcases/ts/*.ttl): prefix declarations, subject blocks with
``;``-chained predicates and ``,``-separated object lists, URI and quoted
literal objects.  The triples map onto the normalized entity tables the
same way the JSON-LD dialect does (plans/generate_csv.py), with
``oco:hasNext`` agent-role chains ranked into explicit positions via
``resolve_chains`` — W1 on import.

Scale note: parsing here is a driver-side routine sized for fixtures and
store bootstraps; bulk foreign-RDF loads go through the JSON-LD reader
(spark.read.text + mapInPandas in plans/generate_csv.py), which is the
partition-parallel path.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from oc_meta_spark.plans.curation import EntityCatalog
from oc_meta_spark.plans.generate_csv import URI_TYPES, resolve_chains
from oc_meta_spark.schemas import COUNTER_SCHEMA, ENTITY_TABLES

_PREFIX = re.compile(r"@prefix\s+(\S+):\s+<([^>]+)>\s*\.")
_META = "https://w3id.org/oc/meta/"


def _tokenize(text: str):
    """Minimal Turtle tokens: URIs, prefixed names, literals, punctuation."""
    pos = 0
    token_re = re.compile(r"<[^>]*>|\"(?:[^\"\\]|\\.)*\"(?:\^\^\S+)?|[;,.]|\ba\b|[^\s;,.]+")
    for m in token_re.finditer(text):
        yield m.group(0)


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    """Turtle subset → (subject, predicate, object) triples with expanded
    URIs and raw literal strings."""
    prefixes = dict(_PREFIX.findall(text))
    body = _PREFIX.sub("", text)
    # strip comments
    body = "\n".join(l for l in body.splitlines() if not l.strip().startswith("#"))

    def expand(tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok.startswith('"'):
            lit = tok.rsplit('"', 1)[0][1:] if tok.count('"') >= 2 else tok.strip('"')
            m = re.match(r'"((?:[^"\\]|\\.)*)"', tok)
            return "LIT:" + (m.group(1) if m else lit)
        if ":" in tok:
            pfx, _, local = tok.partition(":")
            if pfx in prefixes:
                return prefixes[pfx] + local
        return tok

    triples: list[tuple[str, str, str]] = []
    subject = pred = None
    for tok in _tokenize(body):
        if tok == ".":
            subject = pred = None
        elif tok == ";":
            pred = None
        elif tok == ",":
            pass  # same subject+pred, next object
        elif subject is None:
            subject = expand(tok)
        elif pred is None:
            pred = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" if tok == "a" else expand(tok)
        else:
            triples.append((subject, pred, expand(tok)))
    return triples


def _short(uri: str) -> str:
    return uri.removeprefix(_META)


# Driver-side parsing budget: fixtures and store bootstraps only.  A real
# dump must go through the partition-parallel JSON-LD reader (module
# docstring) — fail loudly rather than quietly serialize a bulk load.
_MAX_TURTLE_BYTES = 64 * 1024 * 1024


def catalog_from_turtle(spark: SparkSession, text: str) -> EntityCatalog:
    """OCDM Turtle → EntityCatalog (the curate()-ready store shape)."""
    if len(text) > _MAX_TURTLE_BYTES:
        raise ValueError(
            f"catalog_from_turtle is a driver-side fixture loader (got "
            f"{len(text) / 1e6:.0f} MB > {_MAX_TURTLE_BYTES / 1e6:.0f} MB); "
            "bulk RDF loads must use the JSON-LD reader "
            "(plans/generate_csv.py), which parses partition-parallel."
        )
    triples = parse_turtle(text)
    by_subject: dict[str, dict[str, list[str]]] = {}
    for s, p, o in triples:
        by_subject.setdefault(s, {}).setdefault(p, []).append(o)

    brs, ras, ids, links, res, ars_raw = [], [], [], [], [], []
    ar_to_br: dict[str, str] = {}

    def lit(props, pred):
        vals = props.get(pred, [])
        return vals[0][4:] if vals and vals[0].startswith("LIT:") else None

    def obj(props, pred):
        vals = [v for v in props.get(pred, []) if not v.startswith("LIT:")]
        return _short(vals[0]) if vals else None

    for s, props in by_subject.items():
        if not s.startswith(_META):
            continue
        omid = _short(s)
        kind = omid.split("/")[0]
        types = props.get("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", [])
        if kind == "br":
            label = ""
            for t in types:
                if t in URI_TYPES and URI_TYPES[t]:
                    label = URI_TYPES[t]
                    break
            brs.append(
                (
                    omid,
                    label or None,
                    lit(props, "http://purl.org/dc/terms/title"),
                    lit(props, "http://prismstandard.org/namespaces/basic/2.0/publicationDate"),
                    lit(props, "http://purl.org/spar/fabio/hasSequenceIdentifier"),
                    obj(props, "http://purl.org/vocab/frbr/core#partOf"),
                    obj(props, "http://purl.org/vocab/frbr/core#embodiment"),
                )
            )
            for ar_uri in props.get("http://purl.org/spar/pro/isDocumentContextFor", []):
                ar_to_br[_short(ar_uri)] = omid
        elif kind == "ra":
            ras.append(
                (
                    omid,
                    lit(props, "http://xmlns.com/foaf/0.1/name"),
                    lit(props, "http://xmlns.com/foaf/0.1/familyName"),
                    lit(props, "http://xmlns.com/foaf/0.1/givenName"),
                )
            )
        elif kind == "id":
            scheme_uri = props.get("http://purl.org/spar/datacite/usesIdentifierScheme", [""])[0]
            ids.append(
                (
                    omid,
                    scheme_uri.rsplit("/", 1)[-1],
                    lit(props, "http://www.essepuntato.it/2010/06/literalreification/hasLiteralValue") or "",
                )
            )
        elif kind == "ar":
            role_uri = props.get("http://purl.org/spar/pro/withRole", [""])[0]
            ars_raw.append(
                {
                    "omid": omid,
                    "role": role_uri.rsplit("/", 1)[-1],
                    "held_by": obj(props, "http://purl.org/spar/pro/isHeldBy"),
                    "has_next": obj(props, "https://w3id.org/oc/ontology/hasNext"),
                }
            )
        elif kind == "re":
            res.append(
                (
                    omid,
                    lit(props, "http://prismstandard.org/namespaces/basic/2.0/startingPage"),
                    lit(props, "http://prismstandard.org/namespaces/basic/2.0/endingPage"),
                )
            )
        for id_uri in props.get("http://purl.org/spar/datacite/hasIdentifier", []):
            if kind in ("br", "ra"):
                links.append((omid, _short(id_uri)))

    import pyspark.sql.functions as F

    cat = EntityCatalog.empty(spark)
    mk = lambda rows, kind: (
        spark.createDataFrame(rows, ENTITY_TABLES[kind]) if rows else getattr(cat, kind)
    )
    ar_df = None
    if ars_raw:
        raw = spark.createDataFrame(
            [
                (ar_to_br.get(a["omid"]), a["role"], a["omid"], a["held_by"], a["has_next"], None)
                for a in ars_raw
                if ar_to_br.get(a["omid"])
            ],
            "br_omid string, role string, omid string, held_by string, has_next string, pos int",
        )
        # hasNext chains → explicit positions (W1 on import)
        ar_df = resolve_chains(raw).select(
            F.col("ar_omid").alias("omid"),
            "br_omid",
            "role",
            F.col("ra_omid"),
            F.col("pos"),
        )
    return EntityCatalog(
        br=mk(brs, "br"),
        ra=mk(ras, "ra"),
        id=mk(ids, "id"),
        entity_id=mk(links, "entity_id"),
        ar=ar_df if ar_df is not None else cat.ar,
        re=mk(res, "re"),
        prov=cat.prov,
        counters=spark.createDataFrame([], COUNTER_SCHEMA),
    )
