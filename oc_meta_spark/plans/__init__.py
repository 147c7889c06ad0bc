from oc_meta_spark.plans.registry import QUERIES, OracleQuery, register

__all__ = ["QUERIES", "OracleQuery", "register"]
