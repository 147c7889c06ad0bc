"""Aggregate-then-refine rank kernels: QB1's boundary-bucket pattern
(plans/quality_queries.py::budget_select) extracted as the ONE shared
answer to per-stratum rank windows over corpus rows.

The problem class: ``row_number() OVER (PARTITION BY stratum ORDER BY
key)`` where the stratum is a data-skewed key (source, language — English
is roughly half of a web crawl).  One window partition = one task sorting
tens of TB at 100× scale.  The fix is never a bigger task — it is to
decompose the ordering:

1.  pick a CLASS column (or columns) that is a *prefix of the sort key* —
    the score itself when its resolution is bounded (milli_bits, n_chars
    in permille-ish ranges), the leading 2 hex chars of the sort key when
    the key is a uniform hash (ordering by ``substr(k,1,2), k`` IS
    ordering by ``k``: prefix decomposition), or :func:`range_class` over
    an arbitrary numeric key (min/max-anchored, so it spreads for ANY id
    distribution);
2.  roll the corpus up to one row per (stratum, class) and run the
    cumulative count over THAT rollup — a window over a dimension-sized
    table (score resolution, or 256 hash buckets), never corpus rows
    (:func:`class_cumsum`);
3.  pay a row-level window only *inside* a class — partitioned by
    (stratum, class), i.e. salted 256-ways or score-class-bounded — and
    add the rollup's running offset to recover the EXACT global rank
    (:func:`bucketed_rank`).

Rank thresholds (quotas, quantile boundaries, tertile cuts) then resolve
almost entirely at the rollup: a class whose running span [cum_before,
cum] sits wholly on one side of a threshold classifies as a whole; only
the one straddling class needs row ranks at all — and a pure value-at-rank
lookup (QT1's quantiles) needs NO row window whatsoever, because the
answer is the straddling class's own value.

Consumers: MX4's within-stratum quota draw, PX2's per-language perplexity
tertiles, QT1's exact group quantiles (all three replaced their corpus
rank windows with this module — the round-9 ``weak`` finding), and QB1's
score rollup.  Equivalence to the naive global window is pinned per
consumer by the unchanged DuckDB oracles and by tests/test_quality.py /
tests/test_sampling.py; plan shapes by tests/test_plan_shapes.py.

PRECONDITION (all helpers): partition keys and class columns must be
NON-NULL.  The refinement reattaches rollup offsets to rows with an inner
equi-join, and SQL's NULL ≠ NULL means a null-keyed row never matches its
own rollup row — it would be silently DROPPED, where a naive row_number
window would have kept it (nulls sort first).  Every current caller
derives its keys from non-null columns (source/lang strata, range_class
over a non-null numeric, md5 prefixes); a new caller with nullable keys
must coalesce them to a sentinel first.  Likewise ``max_rank_df``: a
stratum absent from the threshold table is pruned wholesale (inner join),
which is exactly right for quota draws — a stratum with no quota
contributes nothing — but is a semantic choice, not an accident.

Reference analog: the chunked external-aggregation discipline of
oc_meta/run/find/duplicated_ids.py:95-141 — never hold one group's whole
extent in one place.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def range_class(
    df: DataFrame, col: str, n: int = 256, class_col: str = "rb"
) -> DataFrame:
    """Append an order-preserving class column for a bigint sort key:
    ``class = (key − min) div ceil((max − min + 1) / n)`` with min/max
    taken from ``df`` itself (one broadcast 1-row aggregate).  Any
    nondecreasing step function of the key is a valid rank-decomposition
    prefix (ordering by (class, key) == ordering by key), and anchoring
    at the OBSERVED min/max guarantees the classes actually spread: a
    fixed-width rendering (leading hex chars of a 64-bit id, ``id div
    K`` for a guessed K) degenerates to one bucket whenever the ids
    cluster far below the type's range — sequential ids, offset ids, a
    tenant prefix — which silently turns the salt back into the
    single-task sort it exists to prevent (the round-10 review finding).
    At most ``n`` classes, at least 1; empty input stays empty."""
    mm = df.agg(
        F.min(F.col(col)).cast("long").alias("_rc_mn"),
        F.max(F.col(col)).cast("long").alias("_rc_mx"),
    )
    return (
        df.join(F.broadcast(mm))
        .withColumn(
            class_col,
            F.expr(f"({col} - _rc_mn) div ((_rc_mx - _rc_mn + {n}) div {n})"),
        )
        .drop("_rc_mn", "_rc_mx")
    )


def class_cumsum(
    df: DataFrame,
    part_keys: Sequence[str],
    class_cols: Sequence[str],
    weight_col: str | None = None,
    ascending: bool = True,
) -> DataFrame:
    """The bounded rollup with running totals: one row per (part, class)
    carrying ``cnt`` (row count, or the sum of ``weight_col``), ``cum``
    (running total through this class in class order) and ``cum_before``
    (= cum − cnt: the number/weight of rows strictly before the class).

    The cumulative window runs over the ROLLUP — bounded by class
    resolution (score values, 256 hash buckets), never corpus rows; it is
    partitioned by the strata, so even the rollup sort is per-stratum."""
    agg = (F.sum(weight_col) if weight_col else F.count(F.lit(1))).alias("cnt")
    rollup = df.groupBy(*part_keys, *class_cols).agg(agg)
    order = [F.col(c) if ascending else F.col(c).desc() for c in class_cols]
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rollup.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )


def bucketed_rank(
    df: DataFrame,
    part_keys: Sequence[str],
    class_cols: Sequence[str],
    order_cols: Sequence[str],
    rank_col: str = "r",
    max_rank_df: DataFrame | None = None,
    max_rank: int | None = None,
) -> DataFrame:
    """Exact ``row_number() OVER (PARTITION BY part ORDER BY class,
    order)`` without a per-part corpus window: rank = the class's rollup
    offset (``cum_before`` from :func:`class_cumsum`) + row_number within
    the class.  The only window touching ``df``'s rows is partitioned by
    (part, *class*) — 1/|classes| of a stratum per task.

    REQUIRES ``class_cols`` to be a prefix of the intended sort key
    (ordering by class then order_cols == ordering by the full key) —
    hash-key prefixes and :func:`range_class` qualify by construction —
    and, like every helper here, NON-NULL part/class keys (see the module
    docstring: a null key never equi-joins its own rollup row and the row
    would silently drop).

    ``max_rank_df`` ((part_keys…, max_rank) — a bounded per-stratum
    threshold table, e.g. MX4's quotas) prunes classes whose
    ``cum_before >= max_rank`` BEFORE any row is ranked: they cannot
    contain a row with rank <= max_rank, so at a selective threshold the
    row window never even reads the corpus tail.  The threshold column is
    kept on the output for the caller's final ``rank <= max_rank``
    filter.  ``max_rank`` is the scalar form of the same prune for a
    LITERAL threshold (e.g. UF1's per-domain cap) — no join at all, the
    class filter folds into the rollup scan."""
    if max_rank_df is not None and max_rank is not None:
        raise ValueError("pass max_rank_df or max_rank, not both")
    offsets = class_cumsum(df, part_keys, class_cols)
    keep = [*part_keys, *class_cols, "cum_before"]
    if max_rank is not None:
        offsets = offsets.filter(F.col("cum_before") < F.lit(max_rank))
    if max_rank_df is not None:
        offsets = (
            offsets.join(F.broadcast(max_rank_df), list(part_keys))
            .filter(F.col("cum_before") < F.col("max_rank"))
        )
        keep.append("max_rank")
    keys = [*part_keys, *class_cols]
    # the offsets side is class-resolution-sized (bounded) — deliberately
    # UNHINTED: AQE broadcasts it at realistic stratum vocabularies and
    # falls back to a keyed shuffle if strata × classes ever outgrow the
    # driver (the round-5 lesson: never force-broadcast a side whose size
    # the data controls)
    pruned = df.join(offsets.select(*keep), keys)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return pruned.withColumn(
        rank_col, (F.col("cum_before") + F.row_number().over(w)).cast("long")
    ).drop("cum_before")


def bucketed_running_sum(
    df: DataFrame,
    part_keys: Sequence[str],
    class_cols: Sequence[str],
    order_cols: Sequence[str],
    weight_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Exact ``SUM(weight) OVER (PARTITION BY part ORDER BY class, order
    ROWS UNBOUNDED PRECEDING)`` without a per-part corpus window — the
    WEIGHTED form of :func:`bucketed_rank` (a rank is the running sum of
    ones; prefix sums decompose identically): class offsets come from the
    weighted rollup cumsum, the in-class running sum is partitioned by
    (part, class), and their sum is the exact per-part running total.
    Same class-prefix requirement as bucketed_rank."""
    offsets = class_cumsum(df, part_keys, class_cols, weight_col=weight_col)
    keys = [*part_keys, *class_cols]
    # bounded offsets side, deliberately unhinted (see bucketed_rank)
    pruned = df.join(offsets.select(*keys, "cum_before"), keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return pruned.withColumn(
        out_col, F.col("cum_before") + F.sum(weight_col).over(w)
    ).drop("cum_before")
