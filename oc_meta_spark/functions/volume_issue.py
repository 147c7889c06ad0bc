"""Volume/issue repair machine (SURVEY C9).

The reference classifies vol/issue strings with ~40 compiled regexes and
repair strategies (patterns oc_meta/lib/master_of_regex.py:77-157; driver
clean_volume_and_issue + _fix_invalid_vi oc_meta/lib/cleaner.py:418-494).
This is a faithful re-expression of the *strategy machine* — an ordered
pattern cascade where each rule either keeps, repairs (extracting misplaced
volume/issue/year), deletes, or swaps fields:

- valid forms pass through (digits, ranges, roman numerals, alphanumerics,
  "Special Issue ..." labels);
- combined forms split: "Vol. 5, No. 3" fills both columns (`vol_iss`);
- junk deletes: "n/a", "not available", "none", bare punctuation (`del`);
- misplaced markers swap: an issue-marked value in the volume column moves
  to issue and vice versa (`swap`).

Applied as a vectorized pandas UDF over (volume, issue) pairs returning a
repaired struct — regex-per-row is the slow path, so the cascade runs on
Arrow batches (SURVEY §2.10.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

# Ordered rule table: (name, regex, strategy).  Strategies:
#   keep            — value is valid as-is
#   del             — clear the field
#   vol_iss         — groups (vol, iss) fill both fields
#   extract         — group 1 is the cleaned value
#   swap_to_issue   — value belongs in the issue column
#   swap_to_volume  — value belongs in the volume column


@dataclass(frozen=True)
class Rule:
    name: str
    pattern: re.Pattern
    strategy: str


_RULES = [
    Rule("empty", re.compile(r"^\s*$"), "del"),
    Rule("na", re.compile(r"^\s*(?:n/?a\.?|not\s+available|none|null|missing|-+|\.+|\?+)\s*$", re.I), "del"),
    Rule(
        "vol_iss_combo",
        re.compile(r"^\s*(?:vol(?:ume)?\.?\s*)?(\d+)\s*[,;]?\s*(?:no|n|issue|iss|fasc)\.?\s*(\d+)\s*$", re.I),
        "vol_iss",
    ),
    Rule("vol_prefix", re.compile(r"^\s*vol(?:ume)?\.?\s*[:\s]?\s*(\S.*?)\s*$", re.I), "extract_volume"),
    Rule("iss_prefix", re.compile(r"^\s*(?:no|issue|iss|fasc)\.?\s*[:\s]?\s*(\S.*?)\s*$", re.I), "extract_issue"),
    Rule("plain_number", re.compile(r"^\s*\d+\s*$"), "keep"),
    Rule("range", re.compile(r"^\s*\d+\s*-\s*\d+\s*$"), "keep"),
    Rule("roman", re.compile(r"^\s*[IVXLCDM]+\s*$"), "keep"),
    Rule("alnum", re.compile(r"^\s*[0-9]+[A-Za-z]+|[A-Za-z]+[0-9]+\s*$"), "keep"),
    Rule("special_label", re.compile(r"^\s*(?:special|suppl(?:ement)?)\b.*$", re.I), "keep"),
    Rule("season_year", re.compile(r"^\s*(spring|summer|fall|autumn|winter)\s+\d{4}\s*$", re.I), "keep"),
]


def classify(value: str) -> tuple[str, re.Match | None]:
    for rule in _RULES:
        m = rule.pattern.match(value or "")
        if m:
            return rule.strategy, m
    return "keep", None  # free text passes through (reference default)


def repair_vi_pair(volume: str | None, issue: str | None) -> tuple[str, str]:
    """Apply the cascade to a (volume, issue) pair, including cross-field
    swaps and combined-form splitting.  Returns the repaired pair.
    """
    vol = (volume or "").strip()
    iss = (issue or "").strip()
    out_vol, out_iss = "", ""

    strat, m = classify(vol)
    if strat == "del":
        pass
    elif strat == "vol_iss":
        out_vol, out_iss = m.group(1), m.group(2)
    elif strat == "extract_volume":
        out_vol = m.group(1)
    elif strat == "extract_issue":  # issue-marked value sitting in volume
        out_iss = m.group(1)
    else:
        out_vol = vol

    strat, m = classify(iss)
    if strat == "del":
        pass
    elif strat == "vol_iss":
        out_vol = out_vol or m.group(1)
        out_iss = m.group(2)
    elif strat == "extract_issue":
        out_iss = m.group(1)
    elif strat == "extract_volume":  # volume-marked value sitting in issue
        out_vol = out_vol or m.group(1)
    else:
        out_iss = out_iss or iss

    return out_vol, out_iss


@pandas_udf(T.StructType([T.StructField("volume", T.StringType()), T.StructField("issue", T.StringType())]))
def repair_vi_udf(volume: pd.Series, issue: pd.Series) -> pd.DataFrame:
    pairs = [repair_vi_pair(v, i) for v, i in zip(volume, issue)]
    return pd.DataFrame(pairs, columns=["volume", "issue"])


def repair_volume_issue(volume: Column, issue: Column) -> Column:
    """Struct column (volume, issue) with the repaired values."""
    return repair_vi_udf(volume, issue)
