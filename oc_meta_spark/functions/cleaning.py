"""String/date normalization semantics (SURVEY §2.8 C1-C7, C11).

Reimplemented from the reference's documented behavior
(oc_meta/lib/cleaner.py — hyphen table :30-45, space table :47-57,
clean_title :162-180, clean_date :183-239, clean_name :242-265,
clean_agent_name :268-290, remove_ascii :497-499).  These functions are the
correctness surface of the curation pipeline; each has a pure-Python core
(unit-testable, reused inside pandas UDFs) and, where the semantics allow,
a native column-expression twin (JVM-side, preferred in the hot path).
"""

from __future__ import annotations

import calendar
import html
import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

# --- C1/C2: unicode hyphen / space normalization (translate tables) -------

HYPHENS = "-­‐‑‒–—―−﹘﹣－"
SPACES = "         　"


def normalize_hyphens_py(s: str) -> str:
    return s.translate({ord(c): "-" for c in HYPHENS})


def normalize_spaces_py(s: str) -> str:
    s = s.replace("&nbsp;", " ")
    return s.translate({ord(c): " " for c in SPACES})


def normalize_hyphens(col: Column) -> Column:
    """Native twin: 12 unicode dash variants → '-' (SURVEY C1)."""
    return F.translate(col, HYPHENS, "-" * len(HYPHENS))


def normalize_spaces(col: Column) -> Column:
    """Native twin: unicode space variants + &nbsp; → ' ' (SURVEY C2)."""
    return F.translate(F.replace(col, F.lit("&nbsp;"), F.lit(" ")), SPACES, " " * len(SPACES))


# --- C11: control/extended-ascii removal ----------------------------------

_ASCII_BAD = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\xa0]+")


def remove_ascii_py(s: str) -> str:
    return re.sub(r" +", " ", _ASCII_BAD.sub(" ", s)).strip()


def remove_ascii(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.regexp_replace(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\xa0]+", " "), r" +", " "))


# --- C3: title cleaning (acronym-preserving title case) -------------------


def clean_title_py(title: str) -> str:
    """ALL-CAPS titles are lowercased first; then every word is title-cased
    unless it carries an inner capital (acronym preservation).
    """
    title = title.strip()
    if not title:
        return ""
    if title.isupper():
        title = title.lower()
    words = title.split()
    out = []
    for w in words:
        if any(c.isupper() for c in w[1:]):
            out.append(w)  # FaBiO, CiTO, mRNA — keep as-is
        else:
            out.append(w[0].upper() + w[1:] if w else w)
    return " ".join(out)


@pandas_udf(T.StringType())
def clean_title_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(clean_title_py)


def clean_title(col: Column) -> Column:
    return clean_title_udf(col)


# --- C4: partial-precision date cleaning ----------------------------------

_DATE_RE = re.compile(r"^\s*(\d{1,4})(?:-(\d{1,2}))?(?:-(\d{1,2}))?\s*$")


def clean_date_py(date: str) -> str:
    """Parse YYYY[-MM[-DD]] keeping only the components that are present and
    valid: invalid day degrades to YYYY-MM, invalid month to YYYY,
    unparsable to '' (reference clean_date, oc_meta/lib/cleaner.py:183-239).
    """
    if date is None:
        return ""
    m = _DATE_RE.match(normalize_hyphens_py(str(date)))
    if not m:
        return ""
    y, mo, d = m.group(1), m.group(2), m.group(3)
    year = int(y)
    if year <= 0:
        return ""
    out = f"{year:04d}"
    if mo is None:
        return out
    month = int(mo)
    if not 1 <= month <= 12:
        return out
    out += f"-{month:02d}"
    if d is None:
        return out
    day = int(d)
    _, last = calendar.monthrange(year, month)
    if not 1 <= day <= last:
        return out
    return out + f"-{day:02d}"


@pandas_udf(T.StringType())
def clean_date_udf(s: pd.Series) -> pd.Series:
    return s.map(clean_date_py)


def clean_date(col: Column) -> Column:
    return clean_date_udf(col)


# --- C5: person-name cleaning ---------------------------------------------


def clean_name_py(name: str) -> str:
    """'family, given' → title-case both parts; no comma ⇒ org-style name
    cleaned only; empty family ⇒ '' (reference clean_name,
    oc_meta/lib/cleaner.py:242-265).
    """
    if name is None:
        return ""
    name = re.sub(r"\s+", " ", name).strip()
    if "," not in name:
        return clean_agent_name_py(name)
    family, _, given = name.partition(",")
    family = family.strip()
    given = given.strip()
    if not family:
        return ""
    family = " ".join(_title_word(w) for w in family.split())
    if given:
        given = " ".join(_title_word(w) for w in given.split())
        return f"{family}, {given}"
    return f"{family},"


def _title_word(w: str) -> str:
    # Preserve inner capitals (McDonald, O'Brien keeps O'); plain words
    # are capitalized.
    if any(c.isupper() for c in w[1:]):
        return w[0].upper() + w[1:] if w else w
    return w.capitalize()


# --- C6: agent-name cleaning ----------------------------------------------


def clean_agent_name_py(name: str) -> str:
    """Strip [];? chars, keep dots only after letters, html-unescape,
    hyphen-normalize (reference clean_agent_name, lib/cleaner.py:268-290).
    """
    if name is None:
        return ""
    name = html.unescape(name)
    name = normalize_hyphens_py(normalize_spaces_py(name))
    name = re.sub(r"[\[\];?]", "", name)
    name = re.sub(r"(?<![A-Za-z])\.", "", name)  # dots not after a letter
    return re.sub(r"\s+", " ", name).strip()


# --- C7: RA-name normalization --------------------------------------------

_NOT_AVAILABLE = re.compile(r"^\s*not\s+available\s*$", re.I)


def normalize_ra_name_py(name: str) -> str:
    if name is None or _NOT_AVAILABLE.match(name):
        return ""
    return clean_name_py(name)


@pandas_udf(T.StringType())
def clean_name_udf(s: pd.Series) -> pd.Series:
    return s.map(clean_name_py)


def clean_name(col: Column) -> Column:
    return clean_name_udf(col)
