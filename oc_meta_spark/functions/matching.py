"""Bibliographic matching score — faithful re-expression of the reference's
``compute_matching_score`` (oc_meta/lib/bibliographic_matching.py:185-259)
as a single native Column expression (JVM levenshtein, no UDF):

    score = 7·first_author + 14·title + 5·source + 14·other

- first_author: 0.8·(1 − lev(family_a, family_b)/max_len) + 0.2 if the
  given-name initials match (case-insensitive); 0 when either family is
  empty (:203-214);
- title: 1 − lev/max_len, 0 when either title is empty (:217-222);
- source: 1.0 on exact ISSN equality, else a length-difference-adjusted
  venue similarity max(1 − (lev − |Δlen|)/min_len, 0) (:225-236);
- other: +0.1 same year, +0.2 same volume, +0.1 same issue, +0.3 same
  start page, +0.3 same end page — each only when both sides are
  non-empty (:239-259).

The network half of the reference module (Crossref / triplestore metadata
fetchers) is a data SOURCE, out of engine scope; this is the scoring
kernel those tools feed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _nz(c: Column) -> Column:
    return F.coalesce(c, F.lit(""))


def first_author_score(
    family_a: Column, family_b: Column, given_a: Column, given_b: Column
) -> Column:
    fa, fb = _nz(family_a), _nz(family_b)
    lev = F.levenshtein(fa, fb).cast("double")
    max_len = F.greatest(F.length(fa), F.length(fb)).cast("double")
    family_sim = F.lit(0.8) * (F.lit(1.0) - lev / max_len)
    ia = F.lower(F.substring(_nz(given_a), 1, 1))
    ib = F.lower(F.substring(_nz(given_b), 1, 1))
    initial = F.when((ia != "") & (ib != "") & (ia == ib), 0.2).otherwise(0.0)
    return F.when((fa == "") | (fb == ""), 0.0).otherwise(family_sim + initial)


def title_score(title_a: Column, title_b: Column) -> Column:
    ta, tb = _nz(title_a), _nz(title_b)
    lev = F.levenshtein(ta, tb).cast("double")
    max_len = F.greatest(F.length(ta), F.length(tb)).cast("double")
    return F.when((ta == "") | (tb == ""), 0.0).otherwise(F.lit(1.0) - lev / max_len)


def source_score(
    venue_a: Column, venue_b: Column, issn_a: Column, issn_b: Column
) -> Column:
    va, vb = _nz(venue_a), _nz(venue_b)
    ia, ib = _nz(issn_a), _nz(issn_b)
    lev = F.levenshtein(va, vb).cast("double")
    min_len = F.least(F.length(va), F.length(vb)).cast("double")
    len_diff = F.abs(F.length(va) - F.length(vb)).cast("double")
    sim = F.greatest(F.lit(1.0) - (lev - len_diff) / min_len, F.lit(0.0))
    return (
        F.when((ia != "") & (ia == ib), 1.0)
        .when((va == "") | (vb == ""), 0.0)
        .otherwise(sim)
    )


def other_score(
    year_a: Column, year_b: Column,
    volume_a: Column, volume_b: Column,
    issue_a: Column, issue_b: Column,
    start_a: Column, start_b: Column,
    end_a: Column, end_b: Column,
) -> Column:
    def part(a: Column, b: Column, w: float) -> Column:
        a, b = _nz(a), _nz(b)
        return F.when((a != "") & (a == b), w).otherwise(0.0)

    return (
        part(year_a, year_b, 0.1)
        + part(volume_a, volume_b, 0.2)
        + part(issue_a, issue_b, 0.1)
        + part(start_a, start_b, 0.3)
        + part(end_a, end_b, 0.3)
    )


def matching_score(a: dict[str, Column], b: dict[str, Column]) -> Column:
    """The full 7/14/5/14 weighted score; ``a``/``b`` map the field names
    family, given, title, venue, issn, year, volume, issue, start_page,
    end_page to columns."""
    return (
        F.lit(7.0) * first_author_score(a["family"], b["family"], a["given"], b["given"])
        + F.lit(14.0) * title_score(a["title"], b["title"])
        + F.lit(5.0) * source_score(a["venue"], b["venue"], a["issn"], b["issn"])
        + F.lit(14.0)
        * other_score(
            a["year"], b["year"], a["volume"], b["volume"], a["issue"], b["issue"],
            a["start_page"], b["start_page"], a["end_page"], b["end_page"],
        )
    )
