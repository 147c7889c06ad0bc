"""Volume/issue repair machine (SURVEY C9) — full pattern table.

Faithful re-expression of the reference's vol/issue classifier+repairer:
pattern table oc_meta/lib/master_of_regex.py:77-157 and strategy driver
clean_volume_and_issue + _fix_invalid_vi oc_meta/lib/cleaner.py:418-494.

The machine, per (volume, issue, type, pub_date) row:

1. each field is hyphen/space-normalized + html-unescaped, then matched
   against the INVALID table (full match, case-insensitive).  Strategies:
     del          — clear the field (junk: 'n/a', lone punctuation, ...)
     do_nothing   — keep as-is (trailing '.', '+', leading '->' forms)
     s)           — append 's)' (truncated '(first serie' label)
     all          — group 1 is the cleaned value (strip stray punctuation)
     sep          — groups 1+2 joined with '-' (mojibake separator)
     vol_iss / vol_iss_year / iss_vol_year — the field held BOTH a volume
       and an issue (and maybe a year): split into the proper columns;
       the year lands in pub_date when pub_date is empty.
2. extracted volume/issue fill their columns only where empty.
3. the VALID-volume / VALID-issue pattern lists detect values sitting in
   the wrong column and swap them, retyping 'journal volume' ↔
   'journal issue' rows when the swap flips the row's own kind.

Applied as one Arrow-batched pandas UDF over (volume, issue, type)
returning struct(volume, issue, type, date) — regex-per-row is the slow
path, so the cascade runs on Arrow batches (SURVEY §2.10.3).
"""

from __future__ import annotations

import html
import re
import unicodedata as _ud

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from oc_meta_spark.functions.cleaning import normalize_hyphens_py, normalize_spaces_py

# --- pattern fragments (master_of_regex.py:77-99) --------------------------

_GOOD_SEP = r"\-"
_BAD_SEP = r"&\/_,\.:+;\(\[\|"
_SEPS = _GOOD_SEP + _BAD_SEP
_ALPHA = r"a-zà-öø-ÿа-яΑ-ω"  # latin, latin-1 suppl., cyrillic, greek
_VI = (
    rf"((?:[{_ALPHA}]*\d[{_ALPHA}\d]*|[ivxlcdm]+)"
    rf"(?:\s?(?:[{_SEPS}]|and|\()\s?[{_ALPHA}\d]+\)?)*?)"
)
_NUMERO = r"(?:№|no?(?!v)\.?|n[º°]\.?|n[uú]m(?:[eé]ro)?|number)"
_YEAR = r"(\d{4})"

# --- the INVALID table: pattern → repair strategy (master_of_regex:140-157)

_INVALID = [
    (
        rf".*?(?:vol\.?(?:ume)?|tome)(?:[{_SEPS}]?\s?){_VI}"
        rf"[\-&\/_,\.:+;\(\)\[\]|\s]*(?:{_NUMERO}|issues?)[{_SEPS}|\s]*"
        rf"(?:sp[eé]cial\s)?{_VI}",
        "vol_iss",
    ),
    (rf"{_VI},\s?{_NUMERO}\s?{_VI}", "vol_iss"),
    # NB: the reference source stores these Vietnamese literals in NFD
    # (decomposed) form, so precomposed input never matches — replicated
    # bug-for-bug via an explicit NFD normalization of the literals.
    (
        rf"{_ud.normalize('NFD', 'tập')}\s?{_VI},?\s?{_ud.normalize('NFD', 'số')}\s?{_VI}",
        "vol_iss",
    ),
    (rf"issues?\s{_VI}\svol\.?(?:ume)?\s{_VI}(?:.*?{_YEAR}.*?)?", "iss_vol_year"),
    (rf"{_VI}\s?\({_VI}'{_YEAR}\)", "vol_iss_year"),
    (
        rf"cilt[{_SEPS}\s]\s?{_VI}[{_SEPS}\s]sayı[{_SEPS}\s]\s?{_VI}"
        rf"(?:[{_SEPS}\s]\s?temmuz\s{_YEAR})?",
        "vol_iss_year",
    ),
    (r"&na;|n\/a|not\savailable", "del"),
    (r"[\:\-\.`ё/]", "del"),
    (rf"\${{[{_ALPHA}]+(\.[{_ALPHA}]+)?}}", "del"),
    (rf"[&\/_,:+;\|`'#]\s*{_VI}", "all"),
    (rf"[\->+]{_VI}", "do_nothing"),
    (rf"{_VI}[\.+]", "do_nothing"),
    (rf"{_NUMERO}?[{_SEPS}]?\s?{_VI}[&\/_,:;\|`'\(\[\{{]", "all"),
    (rf"{_VI}\(\)", "all"),
    (rf"n[�?]+{_VI}", "all"),
    (rf"{_VI}(?:â\x80[\x92\x93\x94]|�+|â|\?+){_VI}", "sep"),
    (rf"{_VI}\s?\(first\sserie", "s)"),
]
_RE_INVALID = [(re.compile(f"^{p}$", re.IGNORECASE), s) for p, s in _INVALID]

# --- VALID per-column markers, used only for cross-column switching
# (master_of_regex.py:118-139; driver cleaner.py:447-471) ------------------

_VOLUMES_VALID = [
    r"original\sseries,\svolume\s\d+",
    rf"(vol(ume)?|tome|cilt)\s?[{_SEPS}]?\s?{_VI}",
]
_ISSUES_VALID = [
    rf"issue[\.,]?\s{_VI}",
    rf'({_VI}\s)?e?sp?e?(ecial)?[\s_\-\.](issue)?(_number_)?[\s_-]?({_VI})?(["“][{_ALPHA}\s]+?["”])?',
    rf"ö(zel)?(\ss(ayı)?|\(special\))?(\s?{_VI})?",
    rf"({_NUMERO}[{_SEPS}\s]?)?hors[{_SEPS}\s]série[{_SEPS}\s]{_VI}",
    "특별호",
    rf"([{_ALPHA}]+\s{_YEAR}\s)?\(?(jan(uary)?|feb(ruary)?|mar(ch)?|apr(il)?|may|"
    rf"jun(e)?|jul(y)?|aug(ust)?|sep(tember)?|oct(ober)?|(nov|dec)(ember)?|"
    rf"spring|summer|autumn|winter)(\s{_YEAR})?\)?",
    rf"{_VI},\spart\s{_VI}\sof\s{_VI}",
    rf"sayı[{_SEPS}\s]\s?{_VI}",
    rf"issues?\s{_VI},\s(supplement|part)\s{_VI}",
    rf"issues?\s{_VI}\.?\spp\.\s[a-z\d]+[^a-z\d]+[a-z\d]+",
]
_RE_VOLUMES_VALID = [re.compile(f"^{p}$", re.IGNORECASE) for p in _VOLUMES_VALID]
_RE_ISSUES_VALID = [re.compile(f"^{p}$", re.IGNORECASE) for p in _ISSUES_VALID]


def _fix_invalid_vi(m: re.Match, strategy: str):
    """Reference _fix_invalid_vi (cleaner.py:477-494): pick (whatever,
    volume, issue, pub_date) out of the capture groups by strategy name."""
    vol_group = 1 if "vol_iss" in strategy else 2
    iss_group = 1 if "iss_vol" in strategy else 2
    whatever = volume = issue = pub_date = None
    if "vol" in strategy and "iss" in strategy:
        volume = m.group(vol_group)
        issue = m.group(iss_group)
        if "year" in strategy:
            pub_date = m.group(3)
    elif strategy == "all":
        whatever = m.group(1)
    elif strategy == "sep":
        whatever = f"{m.group(1)}-{m.group(2)}"
    return whatever, volume, issue, pub_date


def clean_volume_and_issue(volume: str | None, issue: str | None, br_type: str | None,
                           pub_date: str | None = "") -> tuple[str, str, str, str]:
    """The full C9 machine on one row.  Returns (volume, issue, type, date)
    — ``date`` is non-empty only when a year was extracted AND the row's
    own pub_date was empty (reference cleaner.py:418-446)."""
    row = {"volume": volume or "", "issue": issue or ""}
    out = {"volume": "", "issue": "", "pub_date": ""}
    typ = br_type or ""
    date = pub_date or ""

    for field in ("volume", "issue"):
        vi = row[field]
        vi = normalize_hyphens_py(vi)
        vi = " ".join(normalize_spaces_py(vi).split())
        vi = html.unescape(vi)
        for pattern, strategy in _RE_INVALID:
            m = pattern.search(vi)
            if m:
                if strategy == "del":
                    row[field] = ""
                elif strategy == "do_nothing":
                    row[field] = vi
                elif strategy == "s)":
                    row[field] = f"{vi}s)"
                else:
                    row[field] = ""
                    whatever, vol_x, iss_x, date_x = _fix_invalid_vi(m, strategy)
                    row[field] = whatever if whatever else row[field]
                    out["volume"] = vol_x or ""
                    out["issue"] = iss_x or ""
                    out["pub_date"] = date_x or ""
    row["volume"] = out["volume"] if not row["volume"] else row["volume"]
    row["issue"] = out["issue"] if not row["issue"] else row["issue"]
    date = out["pub_date"] if not date else date

    # cross-column switch: a VALID-volume form in the issue column (or vice
    # versa) moves over, retyping journal volume ↔ journal issue rows when
    # their own kind flips (cleaner.py:447-471).
    switch = {"volume": "", "issue": ""}
    for field in ("volume", "issue"):
        vi = row[field]
        if any(p.search(vi) for p in _RE_VOLUMES_VALID):
            if field == "issue":
                switch["volume"] = vi
        if any(p.search(vi) for p in _RE_ISSUES_VALID):
            if field == "volume":
                switch["issue"] = vi
    if switch["volume"] and switch["issue"]:
        row["volume"] = switch["volume"]
        row["issue"] = switch["issue"]
    elif switch["volume"] and not row["volume"]:
        row["volume"] = switch["volume"]
        row["issue"] = ""
        typ = "journal volume" if typ == "journal issue" else typ
    elif switch["issue"] and not row["issue"]:
        row["issue"] = switch["issue"]
        row["volume"] = ""
        typ = "journal issue" if typ == "journal volume" else typ

    return row["volume"], row["issue"], typ, date


def repair_vi_pair(volume: str | None, issue: str | None) -> tuple[str, str]:
    """Back-compat two-field view of the machine (no type/date effects)."""
    v, i, _t, _d = clean_volume_and_issue(volume, issue, "journal article", "x")
    return v, i


_VI_STRUCT = T.StructType(
    [
        T.StructField("volume", T.StringType()),
        T.StructField("issue", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("date", T.StringType()),
    ]
)


@pandas_udf(_VI_STRUCT)
def repair_vi_full_udf(volume: pd.Series, issue: pd.Series, br_type: pd.Series) -> pd.DataFrame:
    rows = [clean_volume_and_issue(v, i, t) for v, i, t in zip(volume, issue, br_type)]
    return pd.DataFrame(rows, columns=["volume", "issue", "type", "date"])


@pandas_udf(T.StructType([T.StructField("volume", T.StringType()), T.StructField("issue", T.StringType())]))
def repair_vi_udf(volume: pd.Series, issue: pd.Series) -> pd.DataFrame:
    pairs = [repair_vi_pair(v, i) for v, i in zip(volume, issue)]
    return pd.DataFrame(pairs, columns=["volume", "issue"])


def repair_volume_issue(volume: Column, issue: Column) -> Column:
    """Struct column (volume, issue) with the repaired values."""
    return repair_vi_udf(volume, issue)
