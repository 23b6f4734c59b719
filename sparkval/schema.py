"""Schemas for the validation engine's tables.

The corpus table shape comes from BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string).
Schema enforcement is the engine's first check class — the analog of
the reference's hard dimension checks (lib.rs:707-743: equal dims,
finite values, minimum size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# The input corpus table (Iceberg-style; plain parquet in the sandbox).
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Referential parent: valid (repo, commit) pairs.
COMMITS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
    ]
)

# Violation rows — one per failed row-level constraint, keyed by the
# natural key plus sha256(content) (the per-row invariant vs the
# reference, BASELINE.json input_hint).
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("check", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

# Per-partition verdict rows (the analog of ButteraugliResult,
# lib.rs:589-602: score + pnorm_3 + optional diffmap).
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("repo_bucket", T.IntegerType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("n_files", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("pnorm_3", T.DoubleType(), False),
        T.StructField("verdict", T.StringType(), False),
        T.StructField("driftmap", T.ArrayType(T.DoubleType()), True),
    ]
)


class SchemaError(ValueError):
    pass


def check_corpus_schema(df: DataFrame) -> None:
    """Assert the corpus table has the expected columns and types.

    Analog of the reference's dimension equality check
    (lib.rs:718-719) — fail fast, before any work is scheduled.
    """
    expected = {f.name: f.dataType for f in CORPUS_SCHEMA.fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = sorted(set(expected) - set(actual))
    if missing:
        raise SchemaError(f"corpus table missing columns: {missing}")
    for name, dtype in expected.items():
        if actual[name] != dtype:
            raise SchemaError(
                f"corpus column {name!r}: expected {dtype.simpleString()}, "
                f"got {actual[name].simpleString()}"
            )


def schema_diff(
    actual: T.StructType,
    expected: T.StructType,
) -> list[dict]:
    """Schema conformance as a REPORT instead of a raise: one record
    per column in either schema with status ``ok`` /
    ``type_mismatch`` / ``nullability`` (expected NOT NULL, actual
    nullable) / ``missing`` (expected, absent) / ``extra`` (present,
    unexpected). The report form is what a validation run persists
    next to its metrics — and diffing two SNAPSHOTS' schemas (pass
    the old one as ``expected``) is schema-drift detection with the
    same three verdict classes.

    Purely driver-side metadata — no job, no scan; safe to run
    against a 100 TB table's catalog entry. ``check_corpus_schema``
    remains the fail-fast form of the same comparison.
    """
    exp = {f.name: f for f in expected.fields}
    act = {f.name: f for f in actual.fields}
    out = []
    for name in sorted(set(exp) | set(act)):
        e, a = exp.get(name), act.get(name)
        if e is None:
            status = "extra"
        elif a is None:
            status = "missing"
        elif e.dataType != a.dataType:
            status = "type_mismatch"
        elif (not e.nullable) and a.nullable:
            status = "nullability"
        else:
            status = "ok"
        out.append(
            {
                "column": name,
                "status": status,
                "expected_type": e.dataType.simpleString() if e else None,
                "actual_type": a.dataType.simpleString() if a else None,
            }
        )
    return out


def schema_diff_df(spark, actual: T.StructType, expected: T.StructType):
    """``schema_diff`` as a DataFrame (column, status, expected_type,
    actual_type) for report sinks."""
    rows = schema_diff(actual, expected)
    out_schema = T.StructType(
        [
            T.StructField("column", T.StringType(), False),
            T.StructField("status", T.StringType(), False),
            T.StructField("expected_type", T.StringType(), True),
            T.StructField("actual_type", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, out_schema)
