"""S15 external-API lookup plumbing: distinct-fetch semantics, batching
contract, stub policy, and the enrich join — transport injected as a
deterministic fake (this container has no network)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from oc_meta_spark.sources.api_lookup import enrich_from_api, fetch_metadata_table


def _fake_fetch(max_batch: int):
    def fetch(ids):
        assert len(ids) <= max_batch, f"batch of {len(ids)} exceeds {max_batch}"
        out = []
        for i in ids:
            n = int(i.rsplit("/", 1)[-1])
            if n % 7 == 3:
                out.append(None)  # API miss
            else:
                out.append(
                    {
                        "title": f"work {n}",
                        "first_author_family": f"fam{n % 5}",
                        "first_author_given": "A.",
                        "year": str(2000 + n % 20),
                        "venue": f"venue {n % 3}",
                        "issn": "1234-5678",
                        "volume": str(n % 9),
                        "issue": "",
                        "start_page": str(10 * n),
                        "end_page": str(10 * n + 9),
                    }
                )
        return out

    return fetch


def test_fetch_is_per_distinct_id(spark):
    # 300 rows over 100 distinct DOIs → 100 lookup rows (the cache analog)
    rows = [(f"10.1/{k % 100}",) for k in range(300)]
    df = spark.createDataFrame(rows, "id string")
    lookup = fetch_metadata_table(df, fetch=_fake_fetch(50), batch_size=50)
    got = lookup.collect()
    assert len(got) == 100
    by_id = {r.lookup_id: r for r in got}
    assert by_id["10.1/4"].title == "work 4" and by_id["10.1/4"].found
    assert by_id["10.1/3"].title is None and not by_id["10.1/3"].found


def test_batch_size_contract(spark):
    # the fake asserts no batch exceeds the limit — a violation fails here
    df = spark.createDataFrame([(f"10.1/{k}",) for k in range(137)], "id string")
    out = fetch_metadata_table(df, fetch=_fake_fetch(10), batch_size=10, num_partitions=2)
    assert out.count() == 137


def test_enrich_joins_back_to_every_row(spark):
    rows = [(k, f"10.1/{k % 20}") for k in range(60)]
    df = spark.createDataFrame(rows, "row_id long, id string")
    got = enrich_from_api(df, fetch=_fake_fetch(50)).collect()
    assert len(got) == 60
    for r in got:
        n = int(r.id.rsplit("/", 1)[-1])
        if n % 7 == 3:
            assert not r.found and r.title is None
        else:
            assert r.found and r.title == f"work {n}"


def test_missing_transport_raises(spark):
    df = spark.createDataFrame([("10.1/1",)], "id string")
    with pytest.raises(NotImplementedError, match="transport"):
        fetch_metadata_table(df)
