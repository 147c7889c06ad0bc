"""oc_meta_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of opencitations/oc_meta.

The reference (read-only at /root/reference) is a single-node Python
bibliographic-metadata curation pipeline built around an RDF triplestore,
per-batch SPARQL lookups and in-memory union-find indexes.  This package
re-expresses every operator Spark-first:

- normalized DataFrame entity tables (``br``, ``ra``, ``id``, ``ar``, ``re``,
  ``prov``) instead of a triplestore (see :mod:`oc_meta_spark.schemas`);
- identifier resolution as batched broadcast equi-joins
  (:mod:`oc_meta_spark.operators.resolution`);
- dedup as window functions + connected components
  (:mod:`oc_meta_spark.operators.dedup`, :mod:`oc_meta_spark.operators.cc`);
- ``oco:hasNext`` linked lists as explicit ``pos`` columns
  (:mod:`oc_meta_spark.operators.sequences`);
- provenance as an append-only SCD2 snapshot table
  (:mod:`oc_meta_spark.plans.provenance`);
- the reference's string/date/identifier normalization semantics as native
  column expressions where possible, pandas UDFs otherwise
  (:mod:`oc_meta_spark.functions`).

Plus the large-scale training-data-pipeline extensions (MinHash/SimHash/
n-gram dedup, similarity search, text analysis, multimodal plumbing) under
:mod:`oc_meta_spark.operators`.
"""

__version__ = "0.1.0"
