"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``sparkval/``; this module recasts its operators
onto the driver's parquet tables (TPC-H-ish star schema + documents +
embeddings) so each implemented operator from SURVEY.md §2 gets a
DuckDB-checkable (spark query, oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Constraint operators (sparkval.constraints) recast onto driver tables
# ---------------------------------------------------------------------------

def q_uniqueness_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness check (SURVEY §2.4 engine-only): duplicate natural keys.

    groupBy(key).count().filter(>1) — one shuffle with map-side partial
    aggregation; scales linearly in distinct keys.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def q_referential_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential integrity (SURVEY §2.4): orphan count via LEFT ANTI join."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orphans = orders.join(
        F.broadcast(customer),
        orders["o_custkey"] == customer["c_custkey"],
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


def q_referential_lineitem_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey")
    orphans = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


def q_null_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-count column stats (SURVEY §2.5 engine-only column stats)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
        F.sum((F.length("text") != F.col("n_chars")).cast("long")).alias("len_mismatch"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "uniqueness_lineitem": q_uniqueness_lineitem,
    "referential_orders_customer": q_referential_orders_customer,
    "referential_lineitem_part": q_referential_lineitem_part,
    "null_stats_documents": q_null_stats_documents,
}

ORACLE_SQL: dict[str, str] = {
    "uniqueness_lineitem": """
        SELECT l_orderkey, l_linenumber, count(*) AS dup_count
        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
    """,
    "referential_orders_customer": """
        SELECT count(*) AS n_orphans FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    "referential_lineitem_part": """
        SELECT count(*) AS n_orphans FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    """,
    "null_stats_documents": """
        SELECT count(*) AS n_rows,
               sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS null_text,
               sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS null_lang,
               sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS len_mismatch
        FROM documents
    """,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: uniqueness violations on lineitem's natural key at sf0.001."""
    return q_uniqueness_lineitem(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
