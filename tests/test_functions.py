"""Unit tests for the scalar normalization semantics (SURVEY §2.8) —
modeled on the reference's cleaner/curator unit-test strategy (SURVEY §5)
but written fresh against the documented behavior.
"""

from __future__ import annotations

import pytest

from oc_meta_spark.functions.cleaning import (
    clean_date_py,
    clean_name_py,
    clean_title_py,
    clean_agent_name_py,
    normalize_hyphens_py,
    normalize_ra_name_py,
    normalize_spaces_py,
    remove_ascii_py,
)
from oc_meta_spark.functions.ids import (
    normalize_doi,
    normalize_id_token,
    normalize_isbn,
    normalize_issn,
    normalize_orcid,
)
from oc_meta_spark.functions.volume_issue import repair_vi_pair


class TestCleaning:
    def test_hyphens(self):
        assert normalize_hyphens_py("50–75") == "50-75"
        assert normalize_hyphens_py("a‐b−c") == "a-b-c"

    def test_spaces(self):
        assert normalize_spaces_py("a b&nbsp;c d") == "a b c d"

    def test_title_all_caps(self):
        assert clean_title_py("THE IMPACT OF MACHINE LEARNING") == "The Impact Of Machine Learning"

    def test_title_acronyms_preserved(self):
        assert clean_title_py("FaBiO and CiTO ontologies") == "FaBiO And CiTO Ontologies"

    def test_title_empty(self):
        assert clean_title_py("  ") == ""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("2024-01-22", "2024-01-22"),
            ("2024-01", "2024-01"),
            ("2024", "2024"),
            ("2020-02-30", "2020-02"),  # invalid day degrades
            ("2020-27-12", "2020"),  # invalid month degrades
            ("garbage", ""),
            ("", ""),
            ("2024-1-2", "2024-01-02"),  # single digits zero-padded
            ("2020–02–10", "2020-02-10"),  # unicode dashes
        ],
    )
    def test_clean_date(self, raw, expected):
        assert clean_date_py(raw) == expected

    def test_clean_name(self):
        assert clean_name_py("smith, john") == "Smith, John"
        assert clean_name_py("smith,") == "Smith, "  # reference keeps the trailing space
        assert clean_name_py(", john") == ""
        assert clean_name_py("McDonald, ronald") == "McDonald, Ronald"

    def test_agent_name(self):
        assert clean_agent_name_py("ACME [Corp]; ?") == "ACME Corp"
        assert clean_agent_name_py("A&amp;B Labs") == "A&B Labs"

    def test_ra_name_not_available(self):
        assert normalize_ra_name_py("Not Available") == ""
        assert normalize_ra_name_py("not  available") == ""

    def test_remove_ascii(self):
        assert remove_ascii_py("a\x00b\x1fc") == "a b c"


class TestIds:
    def test_doi(self):
        assert normalize_doi("https://doi.org/10.1162/QSS_a_00292") == "10.1162/qss_a_00292"
        assert normalize_doi("10.1162/qss_a_00292") == "10.1162/qss_a_00292"
        assert normalize_doi("11.1234/x") is None
        # short registrant segments are accepted (reference syntax,
        # docs/30-csv-format.md:189 — golden fixtures use doi:10.001/...)
        assert normalize_doi("10.12/x") == "10.12/x"
        assert normalize_doi("10./x") is None

    def test_issn(self):
        assert normalize_issn("0028-0836") == "0028-0836"  # Nature
        assert normalize_issn("00280836") == "0028-0836"
        assert normalize_issn("0028-0837") is None  # bad checksum
        assert normalize_issn("0000-0000") is None  # forbidden
        assert normalize_issn("2049-3630") == "2049-3630"

    def test_isbn(self):
        assert normalize_isbn("0-306-40615-2") == "0306406152"
        assert normalize_isbn("978-0-306-40615-7") == "9780306406157"
        assert normalize_isbn("978-0-306-40615-8") is None

    def test_orcid(self):
        assert normalize_orcid("0000-0002-1825-0097") == "0000-0002-1825-0097"
        assert normalize_orcid("https://orcid.org/0000-0002-1825-0097") == "0000-0002-1825-0097"
        assert normalize_orcid("0000-0002-1825-0098") is None

    def test_token_dispatch(self):
        assert normalize_id_token("doi:10.1162/qss_a_00292") == "doi:10.1162/qss_a_00292"
        assert normalize_id_token("DOI:https://doi.org/10.1162/QSS_a_00292") == "doi:10.1162/qss_a_00292"
        assert normalize_id_token("issn:0028-0837") is None
        assert normalize_id_token("wikidata:Q123") == "wikidata:Q123"
        assert normalize_id_token("omid:br/0601") == "omid:br/0601"
        assert normalize_id_token("junk") is None


class TestVolumeIssue:
    @pytest.mark.parametrize(
        "vol,iss,expected",
        [
            # Expectations verified against the reference's own
            # clean_volume_and_issue (lib/cleaner.py:418-476) — the full
            # pattern table keeps valid per-column marker forms AS-IS
            # ('Volume 7' stays), splits combined forms, and SWITCHES
            # values sitting in the wrong column without rewriting them.
            ("5", "3", ("5", "3")),
            ("Vol. 5, No. 3", "", ("5", "3")),
            ("n/a", "2", ("", "2")),
            ("Volume 7", "Issue 2", ("Volume 7", "Issue 2")),
            ("No. 4", "", ("No. 4", "")),
            ("", "Vol. 9", ("Vol. 9", "")),  # volume-marked value switches columns
            ("IV", "Special Issue \"AI\"", ("IV", "Special Issue \"AI\"")),
            ("-", "...", ("", "...")),  # lone '-' deleted; '...' is not a del form
            ("12-14", "", ("12-14", "")),
            ("Spring 2020", "", ("", "Spring 2020")),  # season is an ISSUE form
        ],
    )
    def test_repair(self, vol, iss, expected):
        assert repair_vi_pair(vol, iss) == expected


class TestParsingSpark:
    def test_parse_cells(self, spark):
        from oc_meta_spark.functions.parsing import (
            build_name_ids_string,
            parse_agent_cell,
            parse_id_cell,
            split_name_and_ids,
        )
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [
                (
                    "doi:10.1/x pmid:123",
                    "Nature [issn:0028-0836]",
                    "Smith, John [orcid:0000-0002-1825-0097]; ACME Collaboration; Doe,",
                )
            ],
            ["ids", "venue", "authors"],
        )
        row = df.select(
            parse_id_cell(F.col("ids")).alias("ids"),
            split_name_and_ids(F.col("venue")).alias("venue"),
            parse_agent_cell(F.col("authors")).alias("agents"),
        ).first()
        assert [(t["schema"], t["value"]) for t in row["ids"]] == [("doi", "10.1/x"), ("pmid", "123")]
        assert row["venue"]["name"] == "Nature"
        assert [(t["schema"], t["value"]) for t in row["venue"]["ids"]] == [("issn", "0028-0836")]
        agents = row["agents"]
        assert len(agents) == 3
        assert agents[0]["family"] == "Smith" and agents[0]["given"] == "John" and agents[0]["pos"] == 1
        assert agents[0]["ids"][0]["value"] == "0000-0002-1825-0097"
        assert agents[1]["org_name"] == "ACME Collaboration" and agents[1]["pos"] == 2
        assert agents[2]["family"] == "Doe" and agents[2]["given"] is None

        # round-trip C12
        out = df.select(
            build_name_ids_string(
                split_name_and_ids(F.col("venue"))["name"],
                split_name_and_ids(F.col("venue"))["ids"],
            ).alias("s")
        ).first()
        assert out["s"] == "Nature [issn:0028-0836]"

    def test_vi_udf(self, spark):
        from oc_meta_spark.functions.volume_issue import repair_volume_issue
        import pyspark.sql.functions as F

        df = spark.createDataFrame([("Vol. 5, No. 3", "n/a")], ["volume", "issue"])
        row = df.select(repair_volume_issue(F.col("volume"), F.col("issue")).alias("vi")).first()
        assert row["vi"]["volume"] == "5" and row["vi"]["issue"] == "3"

    def test_cleaning_udfs(self, spark):
        import pyspark.sql.functions as F
        from oc_meta_spark.functions.cleaning import clean_date, clean_title

        df = spark.createDataFrame([("2020-02-30", "FaBiO and CiTO")], ["d", "t"])
        row = df.select(clean_date(F.col("d")).alias("d"), clean_title(F.col("t")).alias("t")).first()
        assert row["d"] == "2020-02"
        assert row["t"] == "FaBiO And CiTO"

    def test_normalize_id_udf(self, spark):
        import pyspark.sql.functions as F
        from oc_meta_spark.functions.ids import normalize_id

        df = spark.createDataFrame([("issn:0028-0836",), ("issn:0028-0837",)], ["tok"])
        rows = df.select(normalize_id(F.col("tok")).alias("n")).collect()
        assert rows[0]["n"] == "issn:0028-0836"
        assert rows[1]["n"] is None


class TestMatchingScore:
    """functions/matching.py vs an independent python re-computation of the
    reference formula (lib/bibliographic_matching.py:185-259)."""

    CASES = [
        # (a, b) field dicts
        (
            dict(family="Smith", given="John", title="On Testing", venue="J Test",
                 issn="1234-5679", year="2020", volume="4", issue="2",
                 start_page="10", end_page="20"),
            dict(family="Smith", given="Jane", title="On Testing", venue="J Test",
                 issn="1234-5679", year="2020", volume="4", issue="2",
                 start_page="10", end_page="20"),
        ),
        (
            dict(family="Smith", given="", title="", venue="Journal of Tests",
                 issn="", year="2020", volume="", issue="3",
                 start_page="10", end_page=""),
            dict(family="Smyth", given="K", title="Anything", venue="J of Tests",
                 issn="9999-0000", year="2021", volume="", issue="3",
                 start_page="11", end_page=""),
        ),
        (
            dict(family="", given="X", title="Same", venue="", issn="", year="",
                 volume="", issue="", start_page="", end_page=""),
            dict(family="Doe", given="X", title="Same", venue="V", issn="", year="",
                 volume="", issue="", start_page="", end_page=""),
        ),
    ]

    @staticmethod
    def _py_score(a, b):
        import Levenshtein  # python-Levenshtein unavailable → fallback

        def lev(x, y):
            return Levenshtein.distance(x, y)

        def first_author():
            if not a["family"] or not b["family"]:
                return 0.0
            fam = 0.8 * (1.0 - lev(a["family"], b["family"]) / max(len(a["family"]), len(b["family"])))
            ia = a["given"][0].lower() if a["given"] else ""
            ib = b["given"][0].lower() if b["given"] else ""
            return fam + (0.2 if ia and ib and ia == ib else 0.0)

        def title():
            if not a["title"] or not b["title"]:
                return 0.0
            return 1.0 - lev(a["title"], b["title"]) / max(len(a["title"]), len(b["title"]))

        def source():
            if a["issn"] and b["issn"] and a["issn"] == b["issn"]:
                return 1.0
            if not a["venue"] or not b["venue"]:
                return 0.0
            min_len = min(len(a["venue"]), len(b["venue"]))
            d = lev(a["venue"], b["venue"]) - abs(len(a["venue"]) - len(b["venue"]))
            return max(1.0 - d / min_len, 0.0)

        def other():
            s = 0.0
            for k, w in (("year", 0.1), ("volume", 0.2), ("issue", 0.1),
                         ("start_page", 0.3), ("end_page", 0.3)):
                if a[k] and b[k] and a[k] == b[k]:
                    s += w
            return s

        return 7 * first_author() + 14 * title() + 5 * source() + 14 * other()

    def test_matches_reference_formula(self, spark):
        try:
            import Levenshtein  # noqa: F401
        except ImportError:
            import pytest

            pytest.skip("python-Levenshtein not installed in this container")
        self._run(spark)

    def test_matches_pure_python_fallback(self, spark):
        # same expectation computed WITHOUT the Levenshtein package
        import pyspark.sql.functions as F

        from oc_meta_spark.functions.matching import matching_score

        rows = []
        for a, b in self.CASES:
            rows.append(tuple(a[k] for k in sorted(a)) + tuple(b[k] for k in sorted(b)))
        cols_a = [f"a_{k}" for k in sorted(self.CASES[0][0])]
        cols_b = [f"b_{k}" for k in sorted(self.CASES[0][1])]
        df = spark.createDataFrame(rows, cols_a + cols_b)
        a_map = {k: F.col(f"a_{k}") for k in self.CASES[0][0]}
        b_map = {k: F.col(f"b_{k}") for k in self.CASES[0][1]}
        got = [r[0] for r in df.select(matching_score(a_map, b_map)).collect()]

        def lev(x, y):
            # classic DP — independent of both the engine and any package
            m, n = len(x), len(y)
            prev = list(range(n + 1))
            for i in range(1, m + 1):
                cur = [i] + [0] * n
                for j in range(1, n + 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                                 prev[j - 1] + (x[i - 1] != y[j - 1]))
                prev = cur
            return prev[n]

        import types

        fake = types.ModuleType("Levenshtein")
        fake.distance = lev
        import sys as _sys

        _sys.modules.setdefault("Levenshtein", fake)
        try:
            for (a, b), g in zip(self.CASES, got):
                exp = self._py_score(a, b)
                assert abs(g - exp) < 1e-9, (a, b, g, exp)
        finally:
            if _sys.modules.get("Levenshtein") is fake:
                del _sys.modules["Levenshtein"]

    def _run(self, spark):
        self.test_matches_pure_python_fallback(spark)
