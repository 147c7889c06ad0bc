"""Golden testcases ported from the reference's own correctness surface.

The reference's curator tests (test/curator_test.py:1975-2105) feed row
slices of test/manual_data.csv through the Curator against an EMPTY store
and compare the curated CSV plus the four index files against
test/testcases/testcase_data/*.  This harness replays cases 01-12 (the
empty-store cases — 13.x+ need a preloaded triplestore fixture) through
``curate()`` and compares the same artifacts.

Comparison semantics:
- bracketed id lists are canonicalized (external tokens sorted, omid
  last) — the reference test's normalize_row_ids sorts them too
  (test/test_utils.py:159-165);
- OMIDs are matched through a BIJECTION built in a deterministic scan
  order rather than literal equality: the engine's minting order is
  deterministic but not digit-for-digit identical to the reference's
  wannabe numbering (the reference numbers orphan wannabes that never
  reach any output — see plans/curation.py module docstring).
"""

from __future__ import annotations

import csv
import os
import re

import pytest

from oc_meta_spark.plans.curation import curate
from oc_meta_spark.schemas import META_INPUT_COLUMNS

REF = "/root/reference/test"
MANUAL = os.path.join(REF, "manual_data.csv")
CASES_DIR = os.path.join(REF, "testcases", "testcase_data")

# Row selections per case (reference curator_test.py:1975-2270).
CASE_ROWS = {
    "01": [0, 5],
    "02": [1, 3],
    "03": [2, 4],
    "04": [6, 7],
    "05": [8],
    "06": list(range(9, 33)),
    "07": list(range(34, 40)),
    "08": list(range(40, 43)),
    "09": list(range(43, 45)),
    "10": list(range(45, 49)),
    "11": list(range(49, 52)),
    "12": [52],
}

# cases >12 run against the preloaded triplestore fixture
# (testcases/ts/testcase_ts-13.ttl), imported via sources/rdf_import.py
TS_CASE_ROWS = {
    "13.1": list(range(53, 56)),
    "13.2": [56],
    "14.1": [58],
    "14.2": [59],
    "14.3": [60],
    "14.4": list(range(61, 64)),
    "15.1": [64],
    "15.2": [65],
    "15.3": [66],
    "15.4": [67],
    "15.5": [71],
    "15.6": [72],
    "15.7": [73],
    "15.8": [74],
    "16.1": [75],
    "16.2": [76],
    "16.3": [77],
}
TS_TTL = os.path.join(REF, "testcases", "ts", "testcase_ts-13.ttl")

_OMID = re.compile(r"\b(?:omid:)?((?:br|ra|ar|re|id)/06\d+)\b")


def _read_csv(path):
    with open(path, encoding="utf-8-sig") as f:
        return list(csv.DictReader(f))


def _canon_brackets(cell: str) -> str:
    """Sort external tokens inside every [..] block; omid tokens last."""

    def fix(m):
        toks = m.group(1).split()
        ext = sorted(t for t in toks if not t.startswith("omid:"))
        omid = [t for t in toks if t.startswith("omid:")]
        return "[" + " ".join(ext + omid) + "]"

    return re.sub(r"\[\s*([^\]]*?)\s*\]", fix, cell)


def _canon_id_cell(cell: str) -> str:
    toks = cell.split()
    ext = sorted(t for t in toks if not t.startswith("omid:"))
    omid = [t for t in toks if t.startswith("omid:")]
    return " ".join(ext + omid)


def _canon_row(row: dict) -> list[str]:
    out = []
    for col in META_INPUT_COLUMNS:
        v = (row.get(col) or "").strip()
        if col == "id":
            v = _canon_id_cell(v)
        elif col in ("author", "editor", "publisher", "venue"):
            v = _canon_brackets(v)
        out.append(v)
    return out


class Bijection:
    """OMID ↔ OMID matching between expected and got artifacts."""

    def __init__(self):
        self.fwd: dict[str, str] = {}
        self.rev: dict[str, str] = {}

    def bind(self, exp: str, got: str, ctx: str):
        assert exp.split("/")[0] == got.split("/")[0], f"kind mismatch {exp} vs {got} in {ctx}"
        if exp in self.fwd:
            assert self.fwd[exp] == got, f"{ctx}: {exp} bound to {self.fwd[exp]}, saw {got}"
        elif got in self.rev:
            assert self.rev[got] == exp, f"{ctx}: {got} bound to {self.rev[got]}, saw {exp}"
        else:
            self.fwd[exp] = got
            self.rev[got] = exp

    def bind_strings(self, exp: str, got: str, ctx: str):
        """Texts must be equal after omid erasure; omids bind pairwise."""
        e_ids = _OMID.findall(exp)
        g_ids = _OMID.findall(got)
        assert _OMID.sub("@", exp) == _OMID.sub("@", got), f"{ctx}:\n  exp: {exp}\n  got: {got}"
        assert len(e_ids) == len(g_ids), f"{ctx}: omid count {e_ids} vs {g_ids}"
        for e, g in zip(e_ids, g_ids):
            self.bind(e, g, ctx)


def _curated_rows(result):
    rows = result.curated.orderBy("row_id").collect()
    return [{c: r[c] or "" for c in META_INPUT_COLUMNS} for r in rows]


def _build_result(spark, rows: list[int], with_store: bool):
    data = _read_csv(MANUAL)
    catalog = None
    if with_store:
        from oc_meta_spark.sources.rdf_import import catalog_from_turtle

        with open(TS_TTL, encoding="utf-8") as f:
            catalog = catalog_from_turtle(spark, f.read())
    picked = [data[i] for i in rows]
    # explicit row_id = FILE ORDER (the reference processes rows in file
    # order; stage_parse honors a caller-provided row_id column)
    tuples = [
        tuple([n + 1] + [(r.get(c) or "") for c in META_INPUT_COLUMNS])
        for n, r in enumerate(picked)
    ]
    df = spark.createDataFrame(tuples, ["row_id"] + META_INPUT_COLUMNS)
    return curate(df, catalog, prefix="060")


def _check_case(result, name: str):
    expected = _read_csv(os.path.join(CASES_DIR, f"testcase_{name}_data.csv"))
    got = _curated_rows(result)
    assert len(got) == len(expected), f"row count {len(got)} vs {len(expected)}"
    bij = Bijection()
    for i, (e, g) in enumerate(zip(expected, got)):
        ec, gc = _canon_row(e), _canon_row(g)
        for col, ev, gv in zip(META_INPUT_COLUMNS, ec, gc):
            bij.bind_strings(ev, gv, f"row {i} col {col}")

    idx_dir = os.path.join(CASES_DIR, "indices", name)

    # id → id-omid indexes: match by literal, bind the id omids.
    for fname, df_idx in (
        (f"index_id_br_{name}.csv", result.index_id_br),
        (f"index_id_ra_{name}.csv", result.index_id_ra),
    ):
        exp_rows = [r for r in _read_csv(os.path.join(idx_dir, fname)) if r.get("id")]
        got_rows = {r["id"]: r["meta"] for r in df_idx.collect()}
        for r in exp_rows:
            assert r["id"] in got_rows, f"{fname}: missing literal {r['id']}"
            bij.bind(r["meta"], got_rows[r["id"]], fname)
        assert len(exp_rows) == len(got_rows), (
            f"{fname}: {sorted(got_rows)} vs {sorted(r['id'] for r in exp_rows)}"
        )

    # agent-role chains per BR.
    exp_ar = [r for r in _read_csv(os.path.join(idx_dir, f"index_ar_{name}.csv")) if r.get("meta")]
    got_ar = {r["meta"]: r for r in result.index_ar.collect()}
    assert len(exp_ar) == len(got_ar), f"index_ar: {len(got_ar)} rows vs {len(exp_ar)}"
    for r in exp_ar:
        meta = bij.fwd.get(r["meta"])
        assert meta in got_ar, f"index_ar: no row for {r['meta']} (→{meta})"
        g = got_ar[meta]
        for role in ("author", "editor", "publisher"):
            bij.bind_strings(r.get(role) or "", g[role] or "", f"index_ar {r['meta']} {role}")

    # br → re map.
    exp_re = [r for r in _read_csv(os.path.join(idx_dir, f"index_re_{name}.csv")) if r.get("br")]
    got_re = {r["br"]: r["re"] for r in result.index_re.collect()}
    assert len(exp_re) == len(got_re), f"index_re: {len(got_re)} vs {len(exp_re)}"
    for r in exp_re:
        br = bij.fwd.get(r["br"])
        assert br in got_re, f"index_re: no row for {r['br']} (→{br})"
        bij.bind(r["re"], got_re[br], "index_re")


def _run_case(spark, name: str):
    rows = CASE_ROWS.get(name) or TS_CASE_ROWS[name]
    result = _build_result(spark, rows, with_store=name in TS_CASE_ROWS)
    _check_case(result, name)


@pytest.mark.parametrize("name", sorted(CASE_ROWS))
def test_golden(spark, name):
    _run_case(spark, name)


@pytest.mark.parametrize("name", sorted(TS_CASE_ROWS))
def test_golden_with_store(spark, name):
    _run_case(spark, name)


def test_golden_conflict_either_meta(spark):
    """Testcase 13.3/13.31 (reference curator_test.py:2126-2135): a row
    whose id is shared by TWO store entities may resolve to either; the
    reference accepts both expected outputs, so we do too."""
    result = _build_result(spark, [57], with_store=True)
    try:
        _check_case(result, "13.3")
    except AssertionError:
        _check_case(result, "13.31")


def test_golden_14_3_either_ra(spark):
    """Testcase 14.3 ships two sanctioned outputs (testcase_14.31_data.csv
    differs only in which store RA the two-id author resolves to:
    ra/060101 vs ra/0601).  The reference's current test3
    (curator_test.py:2155-2161) checks 14.3 alone, but the 14.31 fixture
    remains in the suite — accept either, as for 13.3/13.31."""
    result = _build_result(spark, TS_CASE_ROWS["14.3"], with_store=True)
    try:
        _check_case(result, "14.3")
    except AssertionError:
        _check_case(result, "14.31")
