#!/usr/bin/env python
"""Capture .explain("formatted") for named gates into plans/r13/<name>_<tag>.txt.

Usage: python plans/r13/capture_plans.py <tag> [gate ...]
With no gates listed, captures the default expensive set.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT = [
    "CUR1_curation_end_to_end",
    "IN2_composed_nightly_fold",
    "IN3_nightly_decontam_fold",
    "RL1_corpus_release",
    "D18_jaccard_similarity_join",
    "HS3_composed_holdout_growth",
    "X7_semantic_dedup",
    "ID1_incremental_corpus_dedup",
    "G1_connected_components",
    "D16_minhash_lsh_near_dup",
    "PX2_perplexity_tertile_split",
    "PX3_incremental_lm_scoring",
    "D23_cross_doc_span_dedup",
    "CH1_token_window_chunking",
    "X8_incremental_ivf_ann",
    "X5_ivf_ann",
    "J6_hierarchy_revenue",
    "DR2_incremental_domain_reputation",
    "QB1_token_budget_selection",
    "J8_citation_resolution",
    "A1_pricing_summary",
    "MX3_mixture_epoch_upsampling",
    "PX1_lm_bits_per_token_filter",
    "X3_lsh_bucketed_nn",
]


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__.strip())
        raise SystemExit(2)
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from oc_meta_spark.plans.registry import load_all
    from oc_meta_spark.session import get_spark

    spark = get_spark("plan-capture")
    queries = load_all()
    for n in names:
        if n not in queries:
            print(f"skip {n}: not registered")
            continue
        try:
            df = queries[n].builder(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building {n}: {exc!r}"
        out = os.path.join(HERE, f"{n}_{tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
