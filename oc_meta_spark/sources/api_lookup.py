"""External-API metadata lookup (SURVEY S15 — the
``lib/bibliographic_matching.py:50-83`` ``fetch_crossref_metadata`` /
``run/patches/has_next.py:314-465`` family), Spark-first.

The reference fetches one DOI at a time from the driver with a dict cache
and a global ``time.sleep(1/rate)``.  Re-expressed for a cluster:

- the dict cache becomes a DISTINCT on the id column — each id is fetched
  exactly once corpus-wide, however many rows carry it;
- the per-call loop becomes ``mapInPandas`` over the distinct-id frame:
  each partition issues BATCHED calls through an injected
  ``fetch(ids) -> list[dict | None]`` transport, sleeping between batches;
- the global rate limit becomes a per-partition one — with K fetch
  partitions the cluster-wide rate is K x ``rate_limit_per_sec``, so size
  ``num_partitions`` to your API contract (the polite-pool equivalent);
- the result is a metadata TABLE joined back to the fact rows, so the
  network cost is O(distinct ids) and the join is an ordinary equi-join
  (broadcast when the id set is small).

This container has no network access, so there is NO default transport:
``fetch=None`` raises ``NotImplementedError`` at the injection point (the
same policy as the multimodal codec stub, ``operators/multimodal.py``).
Tests inject a deterministic fake; a production deployment injects a
``requests``-based transport with its own retry/backoff.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

# the reference's parsed-metadata dict shape (bibliographic_matching.py:69-81)
API_META_FIELDS = [
    "title",
    "first_author_family",
    "first_author_given",
    "year",
    "venue",
    "issn",
    "volume",
    "issue",
    "start_page",
    "end_page",
]

API_META_SCHEMA = T.StructType(
    [T.StructField("lookup_id", T.StringType(), False)]
    + [T.StructField(f, T.StringType()) for f in API_META_FIELDS]
    + [T.StructField("found", T.BooleanType(), False)]
)

Fetch = Callable[[list[str]], list[dict | None]]


def fetch_metadata_table(
    ids: DataFrame,
    fetch: Fetch | None = None,
    id_col: str = "id",
    batch_size: int = 50,
    rate_limit_per_sec: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distinct-id metadata fetch: one row per distinct id, fetched in
    ``batch_size`` chunks per partition through the injected transport."""
    if fetch is None:
        raise NotImplementedError(
            "No API transport in this environment — inject fetch(ids) -> "
            "list[dict | None] (a requests-based Crossref/DataCite client "
            "in production, a deterministic fake in tests)."
        )
    distinct = ids.select(F.col(id_col).cast("string").alias("lookup_id")).filter(
        F.col("lookup_id").isNotNull()
    ).distinct()
    if num_partitions is not None:
        distinct = distinct.repartition(num_partitions)

    sleep_s = (batch_size / rate_limit_per_sec) if rate_limit_per_sec else 0.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in batches:
            vals = pdf["lookup_id"].tolist()
            for i in range(0, len(vals), batch_size):
                chunk = vals[i : i + batch_size]
                if not first and sleep_s:
                    time.sleep(sleep_s)
                first = False
                metas = fetch(chunk)
                out = {
                    "lookup_id": chunk,
                    "found": [m is not None for m in metas],
                }
                for f in API_META_FIELDS:
                    out[f] = [(m or {}).get(f) for m in metas]
                yield pd.DataFrame(out)[[c.name for c in API_META_SCHEMA]]

    return distinct.mapInPandas(run, API_META_SCHEMA)


def enrich_from_api(
    df: DataFrame,
    fetch: Fetch | None = None,
    id_col: str = "id",
    broadcast_lookup: bool = False,
    **kwargs,
) -> DataFrame:
    """Join API metadata onto fact rows: distinct-fetch then equi-join
    (duplicated ids cost one call, not one per row).

    ``broadcast_lookup`` defaults to False: the lookup table has one row
    per distinct id, which at corpus scale (10^8 distinct DOIs) would OOM
    executors under a forced broadcast.  AQE still broadcasts it at
    runtime when it is actually small; pass True only when the caller
    KNOWS the id set is bounded."""
    lookup = fetch_metadata_table(df, fetch=fetch, id_col=id_col, **kwargs)
    if broadcast_lookup:
        lookup = F.broadcast(lookup)
    return df.join(lookup, df[id_col] == lookup["lookup_id"], "left").drop("lookup_id")
