"""Text-analysis operators: token counts, quality scores, language ID,
document fingerprints. Pure Column expressions (JVM, codegen) so they
run at scan speed — these are per-row projections with no shuffle at
all; Catalyst pushes the column prune down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Distinctive high-frequency markers per language (public-knowledge
# stopword heuristics). Kept tiny on purpose: language ID here is a
# scan-speed heuristic, not a model.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["que", "los", "las", "una", "por"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["les", "des", "une", "est", "dans"],
    "zh": ["的", "是", "了", "在", "我"],
}

_WORD_SPLIT = r"\s+"


def with_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (~chars/4 bounded below by word count), as columns."""
    words = F.size(F.split(F.trim(F.col(col)), _WORD_SPLIT))
    words = F.when(F.length(F.trim(F.col(col))) == 0, F.lit(0)).otherwise(words)
    bpe_est = F.greatest(words, F.ceil(F.length(col) / F.lit(4)).cast("int"))
    return df.withColumn("n_tokens", words).withColumn("n_tokens_bpe_est", bpe_est)


def with_quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: length band + alpha ratio + mean
    word length band. Deterministic, expression-only."""
    n_chars = F.length(col)
    words = F.size(F.split(F.trim(F.col(col)), _WORD_SPLIT))
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-zÀ-ɏ一-鿿]", ""))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    mean_wlen = n_chars / F.greatest(words, F.lit(1))
    len_ok = (n_chars >= 20) & (n_chars <= 100000)
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 15.0)
    score = (
        len_ok.cast("double") * 0.4
        + wlen_ok.cast("double") * 0.2
        + F.least(alpha_ratio * F.lit(2.0), F.lit(1.0)) * 0.4
    )
    return df.withColumn("quality_score", F.round(score, 6))


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-hit language ID: argmax over per-language marker counts.

    Implemented as a greatest-of-structs trick so the whole thing is
    one codegen'd expression (no UDF): tag each language's hit count,
    take the struct-max (count, then language for tie-break stability).
    """
    # materialize the token array once so codegen doesn't inline the
    # split into every per-language count expression
    tokenized = df.withColumn("_toks", F.split(F.lower(F.col(col)), _WORD_SPLIT))
    scored = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        if lang == "zh":
            # zh markers are single chars: ONE translate() strips them
            # all, the length delta is the total hit count
            cnt = F.length(col) - F.length(F.translate(F.col(col), "".join(markers), ""))
        else:
            arr = F.array(*[F.lit(m) for m in markers])
            cnt = F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(arr, t)))
        scored.append(F.struct(cnt.cast("long").alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*scored)
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    return tokenized.withColumn("lang_pred", pred).drop("_toks")


def with_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Content fingerprints: exact (md5) and a shift-tolerant one over
    the whitespace-normalized text (rolling-hash analog: collapse
    whitespace, lowercase, then hash — robust to reflow)."""
    normalized = F.regexp_replace(F.lower(F.col(col)), r"\s+", " ")
    return df.withColumn("fp_exact", F.md5(F.col(col).cast("binary"))).withColumn(
        "fp_normalized", F.md5(F.trim(normalized).cast("binary"))
    )


def with_repetition_stats(df: DataFrame, col: str = "text",
                          dup_line_frac_max: float = 0.30,
                          dup_char_frac_max: float = 0.20) -> DataFrame:
    """Intra-document repetition stats + flag — the Gopher-style
    duplicate-line quality rule (docs dominated by repeated lines are
    boilerplate/spam and poison training mixes): per doc, the fraction
    of non-blank lines that occur more than once and the fraction of
    characters living in such lines; ``is_repetitive`` ORs the two
    thresholds (defaults are the published 0.30 / 0.20 style cutoffs).

    Pure Column expressions, no shuffle. The duplicate test is the
    nested higher-order filter (for each line, count equal lines) —
    O(lines^2) per document inside codegen, fine for real documents
    (hundreds of lines); a corpus of pathological million-line docs
    would use an explode+groupBy variant instead."""
    lines = F.filter(
        F.split(F.coalesce(F.col(col), F.lit("")), "\n"),
        lambda x: F.trim(x) != "",
    )
    n_lines = F.size(lines)
    dup_lines = F.filter(
        lines,
        lambda x: F.size(F.filter(lines, lambda y: y == x)) >= 2,
    )
    n_dup = F.size(dup_lines)
    chars_total = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    chars_dup = F.aggregate(
        dup_lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_line_frac = F.when(n_lines > 0, n_dup / n_lines).otherwise(F.lit(0.0))
    dup_char_frac = F.when(chars_total > 0, chars_dup / chars_total).otherwise(
        F.lit(0.0)
    )
    return (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("dup_line_frac", dup_line_frac.cast("double"))
        .withColumn("dup_char_frac", dup_char_frac.cast("double"))
        .withColumn(
            "is_repetitive",
            (dup_line_frac > dup_line_frac_max)
            | (dup_char_frac > dup_char_frac_max),
        )
    )
