"""ORCID summary-XML extraction (SURVEY S14; reference
IndexOrcidDoi._process_file, oc_meta/run/orcid_process.py:77-103 — pulls the
ORCID iD, names, and self-asserted DOIs out of ORCID summary files to build
the DOI→ORCID index used for agent enrichment).

spark-xml is not in this environment, and the extraction needs exactly four
leaf fields from a fixed schema — ``regexp_extract`` over the raw text is
the Spark-native shape (JVM regex, no XML DOM, columnar throughout).  The
multi-DOI case uses ``regexp_extract_all`` + explode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_ORCID_RE = r"<common:path>\s*(\d{4}-\d{4}-\d{4}-\d{3}[\dX])\s*</common:path>"
_GIVEN_RE = r"<personal-details:given-names>\s*(.*?)\s*</personal-details:given-names>"
_FAMILY_RE = r"<personal-details:family-name>\s*(.*?)\s*</personal-details:family-name>"
_DOI_RE = (
    r'<common:external-id-type>doi</common:external-id-type>\s*'
    r"<common:external-id-value>\s*(\S+?)\s*</common:external-id-value>"
)


def parse_orcid_summaries(xml_rows: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(file rows with an XML string column) → (orcid, given, family, doi).

    One output row per self-asserted DOI; records without DOIs are dropped
    (matching the reference's DOI-index purpose).
    """
    base = xml_rows.select(
        F.regexp_extract(xml_col, _ORCID_RE, 1).alias("orcid"),
        F.regexp_extract(xml_col, _GIVEN_RE, 1).alias("given"),
        F.regexp_extract(xml_col, _FAMILY_RE, 1).alias("family"),
        F.regexp_extract_all(F.col(xml_col), F.lit(_DOI_RE), F.lit(1)).alias("dois"),
    ).filter(F.col("orcid") != "")
    return (
        base.select("orcid", "given", "family", F.explode("dois").alias("doi"))
        .withColumn("doi", F.lower("doi"))
        .dropDuplicates()
    )
