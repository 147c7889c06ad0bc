from oc_meta_spark.functions.cleaning import (
    clean_date,
    clean_name,
    clean_title,
    normalize_hyphens,
    normalize_spaces,
)
from oc_meta_spark.functions.ids import normalize_id

__all__ = [
    "clean_date",
    "clean_name",
    "clean_title",
    "normalize_hyphens",
    "normalize_spaces",
    "normalize_id",
]
