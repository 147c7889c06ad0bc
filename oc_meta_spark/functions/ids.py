"""Identifier validation & normalization (SURVEY C8).

Reimplemented from the documented validation rules
(/root/reference/docs/30-csv-format.md "Validation"; dispatch at
oc_meta/lib/cleaner.py:373-415; forbidden ids oc_meta/constants.py:10):

- DOI: strip URL prefixes, lowercase, syntax ``10.<4-9 digits>/<suffix>``;
- ISBN: hyphen/space-insensitive, ISBN-10 mod-11 (X check) or ISBN-13
  EAN mod-10;
- ISSN: normalize to ``NNNN-NNNC``, mod-11 weighted checksum, reject
  0000-0000;
- ORCID: ISO 7064 MOD 11-2 over 16 digits, canonical dashed form;
- other schemas pass through lowercased-schema with trimmed value.

Pure-Python cores (checksums are textbook formulas) + a pandas UDF applying
the schema dispatch to ``schema:value`` token columns.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

_DOI_PREFIXES = re.compile(
    r"^(?:https?://(?:dx\.)?doi\.org/|doi\.org/|https?://doi:|doi:\s*)", re.I
)
# Reference syntax (docs/30-csv-format.md:189): besides the registrar
# 4-9-digit form, ANY dot-separated non-slash prefix is accepted
# (e.g. the test fixtures' 'doi:10.001/b-1').
_DOI_RE = re.compile(r"^10\.(?:\d{4,9}|[^\s/]+(?:\.[^\s/]+)*)/\S+$")


def normalize_doi(value: str) -> str | None:
    v = _DOI_PREFIXES.sub("", value.strip()).lower()
    return v if _DOI_RE.match(v) else None


def _isbn10_valid(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(digits):
        if ch == "X" and i == 9:
            d = 10
        elif ch.isdigit():
            d = int(ch)
        else:
            return False
        total += (10 - i) * d
    return total % 11 == 0


def _isbn13_valid(digits: str) -> bool:
    if not digits.isdigit():
        return False
    total = sum(int(d) * (1 if i % 2 == 0 else 3) for i, d in enumerate(digits))
    return total % 10 == 0


def normalize_isbn(value: str) -> str | None:
    v = re.sub(r"[\s-]", "", value.strip()).upper()
    if len(v) == 10 and _isbn10_valid(v):
        return v
    if len(v) == 13 and _isbn13_valid(v):
        return v
    return None


def normalize_issn(value: str) -> str | None:
    v = re.sub(r"[\s-]", "", value.strip()).upper()
    if not re.match(r"^\d{7}[\dX]$", v):
        return None
    total = sum((8 - i) * int(d) for i, d in enumerate(v[:7]))
    check = (11 - total % 11) % 11
    expected = "X" if check == 10 else str(check)
    if v[7] != expected:
        return None
    out = f"{v[:4]}-{v[4:]}"
    return None if out == "0000-0000" else out


def normalize_orcid(value: str) -> str | None:
    v = re.sub(r"^(?:https?://orcid\.org/|orcid:\s*)", "", value.strip(), flags=re.I)
    v = re.sub(r"[\s-]", "", v).upper()
    if not re.match(r"^\d{15}[\dX]$", v):
        return None
    # ISO 7064 MOD 11-2 over the first 15 digits.
    total = 0
    for ch in v[:15]:
        total = (total + int(ch)) * 2
    check = (12 - total % 11) % 11
    expected = "X" if check == 10 else str(check)
    if v[15] != expected:
        return None
    return f"{v[0:4]}-{v[4:8]}-{v[8:12]}-{v[12:16]}"


_VALIDATORS = {
    "doi": normalize_doi,
    "isbn": normalize_isbn,
    "issn": normalize_issn,
    "orcid": normalize_orcid,
}


def normalize_id_token(token: str) -> str | None:
    """Normalize one ``schema:value`` token; None if invalid.

    Unknown schemas pass through with lowercased schema and trimmed value
    (the reference validates only the known families).
    """
    if token is None:
        return None
    token = token.strip()
    if ":" not in token:
        return None
    schema, _, value = token.partition(":")
    schema = schema.strip().lower()
    if not value.strip():
        return None
    fn = _VALIDATORS.get(schema)
    if fn is None:
        return f"{schema}:{value.strip()}"
    norm = fn(value)
    return None if norm is None else f"{schema}:{norm}"


@pandas_udf(T.StringType())
def normalize_id_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_id_token)


def normalize_id(col: Column) -> Column:
    return normalize_id_udf(col)


_COLON_SPACES = re.compile(r"\s*:\s*")


def clean_id_field(cell: str | None) -> list[str]:
    """Whole-cell D1: collapse spaces around ':' (the reference's
    RE_COLON_AND_SPACES pre-pass — 'vIAF : 123' is one token), split on
    spaces, validate/normalize each, drop invalid, dedup preserving first
    occurrence (reference clean_id_list, oc_meta/core/curator.py:744-780).
    """
    out: list[str] = []
    seen: set[str] = set()
    for tok in _COLON_SPACES.sub(":", cell or "").split():
        n = normalize_id_token(tok)
        if n is not None and n not in seen:
            seen.add(n)
            out.append(n)
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def clean_id_cell_udf(s: pd.Series) -> pd.Series:
    return s.map(clean_id_field)
