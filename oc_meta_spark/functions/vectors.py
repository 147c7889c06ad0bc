"""Engine-exact vector math over ``array<float>`` embedding columns.

Every dot product / norm is a *sequential left fold* over the vector with
each float32 cast to double first — ``F.aggregate`` here, ``list_reduce``
in the DuckDB oracles (similarity_queries._DOT).  IEEE addition in
identical order ⇒ bitwise-identical cosines in both engines, so even
threshold predicates agree exactly.  Shared by the similarity gates
(plans/similarity_queries.py) and the persisted IVF index
(plans/ivf_index.py) — one fold definition, every consumer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
