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
    (``str.title``) unless it carries ANY capital (acronym preservation).

    Matches reference clean_title (oc_meta/lib/cleaner.py:162-180) exactly:
    the acronym check looks at the whole word (not just the tail) and the
    re-case uses ``str.title()`` (so "don't" → "Don'T", as the reference
    does).
    """
    title = title.strip()
    if not title:
        return ""
    if title.isupper():
        title = title.lower()
    words = title.split()
    out = []
    for w in words:
        if any(c.isupper() for c in w):
            out.append(w)  # FaBiO, CiTO, mRNA — keep as-is
        else:
            out.append(w.title())
    return " ".join(out)


@pandas_udf(T.StringType())
def clean_title_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(clean_title_py)


def clean_title(col: Column) -> Column:
    return clean_title_udf(col)


# --- C4: partial-precision date cleaning ----------------------------------

_DATE_RE = re.compile(r"^\s*(\d{1,4})(?:-(\d{1,2}))?(?:-(\d{1,2}))?\s*$")

try:  # python-dateutil ships with pandas; gate the import anyway
    from dateutil.parser import parse as _dateutil_parse
    from datetime import datetime as _dt

    def _parse_free_form(date: str) -> str:
        """Reference _date_parse_hack (oc_meta/lib/cleaner.py:183-195):
        parse twice with different defaults — components that CHANGE were
        defaulted (absent), so the output precision keeps only the
        components the string actually specifies."""
        a = _dateutil_parse(date, default=_dt(2001, 1, 1))
        b = _dateutil_parse(date, default=_dt(2002, 2, 2))
        if (a.year, a.month, a.day) == (b.year, b.month, b.day):
            return a.strftime("%Y-%m-%d")
        if (a.year, a.month) == (b.year, b.month):
            return a.strftime("%Y-%m")
        if a.year == b.year:
            return a.strftime("%Y")
        return ""

except ImportError:  # pragma: no cover
    _parse_free_form = None


def clean_date_py(date: str) -> str:
    """Free-form date → partial ISO string, with per-component degradation:
    invalid day degrades to YYYY-MM, invalid month to YYYY, unparsable to ''
    (reference clean_date, oc_meta/lib/cleaner.py:198-239 — dateutil parse
    with the two-defaults trick, then suffix-trim retries).
    """
    if date is None:
        return ""
    date = normalize_hyphens_py(str(date)).strip()
    if not date:
        return ""
    if _parse_free_form is not None:
        try:
            return _parse_free_form(date)
        except (ValueError, OverflowError):
            # Reference retry ladder: ISO-shaped strings with an invalid
            # day (len 10) retry as YYYY-MM then YYYY; YYYY-MM (len 7)
            # retries as YYYY; anything else is discarded.
            try:
                if len(date) == 10:
                    try:
                        return _parse_free_form(date[:-3])
                    except (ValueError, OverflowError):
                        try:
                            return _parse_free_form(date[:-6])
                        except (ValueError, OverflowError):
                            return ""
                elif len(date) == 7:
                    try:
                        return _parse_free_form(date[:-3])
                    except (ValueError, OverflowError):
                        return ""
                return ""
            except (ValueError, OverflowError):
                return ""
    return _clean_date_numeric(date)


def _clean_date_numeric(date: str) -> str:
    """Numeric-only fallback used when dateutil is unavailable."""
    m = _DATE_RE.match(date)
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
    """'family, given' → clean_title each word of both parts; no comma ⇒
    word-wise clean_title; empty family ⇒ '' (reference clean_name,
    oc_meta/lib/cleaner.py:242-265 — note the reference splits on EVERY
    comma and keeps only the first two parts, and a family-only name
    yields 'Family, ' with a trailing space).
    """
    if name is None:
        return ""
    if "," in name:
        parts = re.split(r"\s*,\s*", name)
        given = " ".join(clean_title_py(w) for w in parts[1].split())
        family = " ".join(clean_title_py(w) for w in parts[0].split())
        if family:
            return f"{family}, {given}"
        return ""
    return " ".join(clean_title_py(w) for w in name.split())


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
    """Reference _normalize_ra_name (oc_meta/lib/cleaner.py:293-317):
    '' for absent / 'Not Available' names; 'Last, First' / 'Last, ' for
    comma names ('Not Available' parts dropped, missing surname ⇒ '');
    bare names run through clean_agent_name."""
    if name is None:
        return ""
    name = name.strip()
    if not name:
        return ""
    if "," in name:
        last, _, first = name.partition(",")
        last = last.strip()
        first = first.strip()
        if last.lower() == "not available":
            last = ""
        if first.lower() == "not available":
            first = ""
        if not last:
            return ""
        return f"{last}, {first}" if first else f"{last}, "
    cleaned = clean_agent_name_py(name)
    if cleaned.lower() == "not available":
        return ""
    return cleaned


@pandas_udf(T.StringType())
def clean_name_udf(s: pd.Series) -> pd.Series:
    return s.map(clean_name_py)


def clean_name(col: Column) -> Column:
    return clean_name_udf(col)
