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


# ---------------------------------------------------------------------------
# Column-stats operators (sparkval.stats)
# ---------------------------------------------------------------------------

def q_column_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang length stats (SURVEY §2.5): one shuffle, partial+final agg."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.length("text")).alias("len_min"),
        F.max(F.length("text")).alias("len_max"),
        F.round(F.avg(F.length("text")), 4).alias("len_avg"),
        F.count_distinct("source").alias("n_sources"),
    )


def q_lang_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the lang mix per source (SURVEY §2.5 entropy
    stat) — two-level agg, all built-ins."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
    p = counts.join(tot, "source").select(
        "source", (F.col("c") / F.col("n")).alias("p")
    )
    ent = p.groupBy("source").agg(
        F.round((-F.sum(F.col("p") * F.log2("p"))), 6).alias("lang_entropy")
    )
    return ent


def q_score_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation reduction family (SURVEY §2.5: fused max + p-norm,
    diff.rs:485-548) recast onto a numeric column: max + 3/6/12-norm
    of o_totalprice per order priority."""
    orders = _t(spark, sf_dir, "orders")
    x = F.col("o_totalprice") / F.lit(100000.0)
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.max(x), 6).alias("max_norm"),
        F.round(F.pow(F.avg(F.pow(x, 3)), 1.0 / 3.0), 6).alias("pnorm_3"),
        F.round(F.pow(F.avg(F.pow(x, 6)), 1.0 / 6.0), 6).alias("pnorm_6"),
        F.round(F.pow(F.avg(F.pow(x, 12)), 1.0 / 12.0), 6).alias("pnorm_12"),
    )


# ---------------------------------------------------------------------------
# Text-analysis operators (sparkval.pipeline.text)
# ---------------------------------------------------------------------------

def q_token_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkval.pipeline.text import with_token_count

    docs = _t(spark, sf_dir, "documents")
    return with_token_count(docs).select("doc_id", "n_tokens")


def q_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkval.pipeline.text import with_fingerprint

    docs = _t(spark, sf_dir, "documents")
    return with_fingerprint(docs).select("doc_id", "fp_exact", "fp_normalized")


def q_exact_dup_groups_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy). The driver's documents table has no
    byte-identical texts, so this asserts the EMPTY result matches."""
    from sparkval.pipeline.dedup import exact_duplicates

    docs = _t(spark, sf_dir, "documents")
    return exact_duplicates(docs).select("fp", "n_dups")


def q_lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language ID counts per (true lang, predicted)."""
    from sparkval.pipeline.text import with_lang_id

    docs = _t(spark, sf_dir, "documents")
    return (
        with_lang_id(docs)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Similarity search (sparkval.pipeline.similarity)
# ---------------------------------------------------------------------------

_ANN_QUERY_IDS = [0, 7, 42]


def q_ann_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for three fixed query vectors."""
    from sparkval.pipeline.similarity import brute_force_topk

    embs = _t(spark, sf_dir, "embeddings")
    qrows = embs.filter(F.col("vec_id").isin(_ANN_QUERY_IDS)).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    out = brute_force_topk(embs, queries, k=5)
    return out.select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_cosine_near_dups_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs verified by exact cosine >= 0.9."""
    from sparkval.pipeline.similarity import near_duplicates_cosine

    embs = _t(spark, sf_dir, "embeddings")
    out = near_duplicates_cosine(embs, threshold=0.9, n_planes=6)
    return out.select("a", "b", F.round("cosine", 6).alias("cosine"))


# ---------------------------------------------------------------------------
# Drift check (sparkval.drift) — non-SQL-expressible; rows-only oracle
# ---------------------------------------------------------------------------

def q_verdict_set_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-comparison operator (SURVEY §2.8: exceptAll both directions
    = the exact-match rate check): two independent formulations of the
    duplicate-key set must agree exactly — symmetric difference empty."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    a = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber")
    b = (
        li.withColumn("dup_count", F.count(F.lit(1)).over(w))
        .filter(F.col("dup_count") > 1)
        .select("l_orderkey", "l_linenumber", "dup_count")
        .distinct()
    )
    diff = a.exceptAll(b).unionByName(b.exceptAll(a))
    return diff.agg(F.count(F.lit(1)).alias("n_mismatched"))


def _docs_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def q_drift_identity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity drift check over documents-as-corpus: all partitions
    must PASS with score 0 (short-circuit, diff.rs:766-772)."""
    from sparkval import ValidationConfig, ValidationEngine

    corpus = _docs_as_corpus(spark, sf_dir)
    eng = ValidationEngine(ValidationConfig())
    base = eng.build_baseline(corpus)
    v = eng.validate(corpus, base)["verdicts"]
    return v.select("repo_bucket", "lang", "n_files_snap", "score", "verdict")


def q_drift_shifted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift check against a byte-shifted snapshot: distribution drift
    must be flagged per partition (the butteraugli compare recast)."""
    from sparkval import ValidationConfig, ValidationEngine

    corpus = _docs_as_corpus(spark, sf_dir)
    shifted = corpus.withColumn("content", F.translate("content", "aeiou", "xqzvw"))
    eng = ValidationEngine(ValidationConfig())
    base = eng.build_baseline(corpus)
    v = eng.validate(shifted, base)["verdicts"]
    return v.select(
        "repo_bucket", "lang", "n_files_snap", F.round("score", 6).alias("score"), "verdict"
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "uniqueness_lineitem": q_uniqueness_lineitem,
    "referential_orders_customer": q_referential_orders_customer,
    "referential_lineitem_part": q_referential_lineitem_part,
    "null_stats_documents": q_null_stats_documents,
    "column_stats_documents": q_column_stats_documents,
    "lang_entropy_by_source": q_lang_entropy_by_source,
    "score_stats_orders": q_score_stats_orders,
    "token_counts_documents": q_token_counts_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "exact_dup_groups_documents": q_exact_dup_groups_documents,
    "lang_id_documents": q_lang_id_documents,
    "verdict_set_compare": q_verdict_set_compare,
    "ann_topk_embeddings": q_ann_topk_embeddings,
    "cosine_near_dups_embeddings": q_cosine_near_dups_embeddings,
    "drift_identity_documents": q_drift_identity_documents,
    "drift_shifted_documents": q_drift_shifted_documents,
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
    "column_stats_documents": """
        SELECT lang,
               count(*) AS n_rows,
               min(length(text)) AS len_min,
               max(length(text)) AS len_max,
               round(avg(length(text)), 4) AS len_avg,
               count(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
    """,
    "lang_entropy_by_source": """
        SELECT source, round(entropy(lang), 6) AS lang_entropy
        FROM documents GROUP BY source
    """,
    "score_stats_orders": """
        SELECT o_orderpriority,
               round(max(o_totalprice / 100000.0), 6) AS max_norm,
               round(pow(avg(pow(o_totalprice / 100000.0, 3)), 1.0/3.0), 6) AS pnorm_3,
               round(pow(avg(pow(o_totalprice / 100000.0, 6)), 1.0/6.0), 6) AS pnorm_6,
               round(pow(avg(pow(o_totalprice / 100000.0, 12)), 1.0/12.0), 6) AS pnorm_12
        FROM orders GROUP BY o_orderpriority
    """,
    "token_counts_documents": """
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
        FROM documents
    """,
    "fingerprint_documents": """
        SELECT doc_id,
               md5(text) AS fp_exact,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_normalized
        FROM documents
    """,
    "exact_dup_groups_documents": """
        SELECT sha256(text) AS fp, count(*) AS n_dups
        FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
    "verdict_set_compare": """
        WITH a AS (
            SELECT l_orderkey, l_linenumber, count(*) AS dup_count
            FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
        ), b AS (
            SELECT DISTINCT l_orderkey, l_linenumber, dup_count FROM (
                SELECT l_orderkey, l_linenumber,
                       count(*) OVER (PARTITION BY l_orderkey, l_linenumber) AS dup_count
                FROM lineitem
            ) WHERE dup_count > 1
        )
        SELECT count(*) AS n_mismatched FROM (
            (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
            UNION ALL
            (SELECT * FROM b EXCEPT ALL SELECT * FROM a)
        )
    """,
    "ann_topk_embeddings": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id IN (0, 7, 42)
        ), scored AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos_raw
            FROM q CROSS JOIN embeddings e
        ), ranked AS (
            SELECT query_id, vec_id, cos_raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, vec_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, round(cos_raw, 6) AS cosine, rank
        FROM ranked WHERE rank <= 5
    """,
    # lang_id_documents, cosine_near_dups_embeddings, drift_*: custom
    # vectorized/LSH/multi-scale operators — not SQL-expressible;
    # driver records rows-only checks for them.
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: uniqueness violations on lineitem's natural key at sf0.001."""
    return q_uniqueness_lineitem(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
