"""Text analysis operators for training-data pipelines: quality scoring,
token counting, language-ID heuristic, document fingerprinting.

All pure JVM expression work (split/regexp/aggregate) — these run inside
whole-stage codegen on a 100 TB documents table with zero Python overhead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from corintick_spark.operators.dedup import tokenize

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")

# BPE-ish token pattern: letter runs, digit runs, single other non-space chars.
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Tiny per-language marker-word lists for the n-gram/stopword language-ID
# heuristic (fastText-style frequency voting, radically reduced).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "und", "ist", "mit"),
    "es": ("el", "la", "que", "es", "con"),
    "fr": ("le", "la", "et", "est", "avec"),
    "zh": ("的", "是", "和", "在", "了"),
}


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Length / word / stopword-ratio features + a composite quality score.

    Heuristics follow the common LLM-corpus filters (C4/Gopher-style rules):
    very short docs, low stopword density, and extreme word lengths are
    penalized. Exact arithmetic only (mirrorable in ANSI SQL).
    """
    d = tokenize(df, text, "_w")
    n_words = F.size("_w").cast("bigint")
    n_chars = F.length(text).cast("bigint")
    n_alpha = F.length(F.regexp_replace(F.col(text), "[^a-zA-Z]", "")).cast("bigint")
    stop_arr = ",".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(_w, x -> x IN ({stop_arr})))").cast("bigint")
    # NULLIF guards: ANSI mode makes x/0 throw (not NULL); a whitespace-only
    # or empty document must yield NULL ratios, matching the SQL mirror
    nw = F.nullif(n_words, F.lit(0))
    nc = F.nullif(n_chars, F.lit(0))
    stop_ratio = n_stop / nw
    alpha_ratio = n_alpha / nc
    avg_wlen = F.length(F.replace(F.col(text), F.lit(" "), F.lit(""))) / nw
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + alpha_ratio * 0.3
    )
    return d.select(
        *df.columns,
        n_words.alias("n_words"),
        n_chars.alias("n_chars_calc"),
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        avg_wlen.alias("avg_word_len"),
        score.alias("quality_score"),
    )


def token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """BPE-ish token count via regexp extraction (proxy for tokenizer cost)."""
    return df.withColumn(
        "n_tokens",
        F.size(F.regexp_extract_all(F.col(text), F.lit(TOKEN_PATTERN), 0)).cast("bigint"),
    )


def fingerprint(df: DataFrame, text: str = "text", mod: int = 1_000_000_007) -> Column:
    """Order-sensitive document fingerprint: sum of (pos+1)*len(token) mod M
    over whitespace tokens — cheap, deterministic, ANSI-SQL mirrorable.
    (For collision-grade fingerprints use exact_dedup's sha256 instead.)

    Token-less documents fingerprint to 0 (the zip over an empty token list
    pads with nulls — and sequence(1, 0) DESCENDS in Spark — making the
    fold null; the coalesce pins the empty-doc semantics both engines
    mirror)."""
    return F.expr(
        f"""coalesce(
            aggregate(zip_with(filter(split({text}, ' '), x -> x != ''),
                               sequence(1, size(filter(split({text}, ' '), x -> x != ''))),
                               (w, i) -> CAST(i AS BIGINT) * length(w)),
                      0L, (a, x) -> a + x) % {mod}, 0L)"""
    )


def repetition_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style repetition statistics: duplicate-word fraction, top-word
    dominance, and duplicate-bigram fraction.

    All computed row-locally with array higher-order functions (whole-stage
    codegen; per-document cost is O(words * distinct_words) which is bounded
    by document length, so the operator is embarrassingly parallel and
    shuffle-free at any corpus scale). NULLIF guards keep ANSI mode from
    throwing on empty documents.
    """
    d = tokenize(df, text, "_w")
    n = F.size("_w").cast("bigint")
    n_distinct = F.expr("size(array_distinct(_w))").cast("bigint")
    nn = F.nullif(n, F.lit(0))
    # Highest single-word occupancy: max over distinct words of its count.
    top_cnt = F.expr(
        "array_max(transform(array_distinct(_w), w -> size(filter(_w, x -> x = w))))"
    ).cast("bigint")
    d = d.withColumn(
        "_bg",
        F.expr(
            "CASE WHEN size(_w) < 2 THEN array() ELSE "
            "zip_with(slice(_w, 1, size(_w) - 1), slice(_w, 2, size(_w) - 1), "
            "(a, b) -> concat(a, ' ', b)) END"
        ),
    )
    nbg = F.nullif(F.size("_bg").cast("bigint"), F.lit(0))
    return d.select(
        *df.columns,
        n.alias("n_words"),
        (F.lit(1.0) - n_distinct / nn).alias("dup_word_frac"),
        (top_cnt / nn).alias("top_word_frac"),
        (
            F.lit(1.0)
            - F.expr("size(array_distinct(_bg))").cast("bigint") / nbg
        ).alias("dup_bigram_frac"),
    )


# PII patterns — common subset of Java regex (Spark) and RE2 (DuckDB):
# char classes, bounded quantifiers, \b word boundaries. No lookaround.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(df: DataFrame, text: str = "text") -> DataFrame:
    """Detect-and-redact PII (emails, phone numbers, IPv4 addresses) with
    pure regexp expressions — the standard pre-training scrub pass.

    Emits per-document match counts and the redacted text. Row-local,
    shuffle-free, codegen'd; at 100 TB this is a map-only pass over the
    corpus. Patterns are deliberately in the Java-regex ∩ RE2 common subset
    so the DuckDB oracle applies the identical semantics.
    """
    c = F.col(text)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0))).cast("bigint")
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), F.lit(0))).cast("bigint")
    n_ips = F.size(F.regexp_extract_all(c, F.lit(PII_IP), F.lit(0))).cast("bigint")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ),
        PII_IP,
        "[IP]",
    )
    return df.select(
        *df.columns,
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


def chunk_tokens(
    df: DataFrame, text: str = "text", size: int = 32, stride: int = 24
) -> DataFrame:
    """Split each document into overlapping token windows (training-example
    chunking): chunk i covers tokens [1 + i*stride, 1 + i*stride + size).

    sequence()+explode generates the chunk starts row-locally, so the
    operator is a flatMap with no shuffle; downstream repartition decides
    chunk placement. Empty documents yield one empty chunk (deterministic).
    """
    d = tokenize(df, text, "_w")
    d = d.withColumn(
        "_start", F.explode(F.expr(f"sequence(1, greatest(size(_w), 1), {stride})"))
    )
    chunk = F.expr(f"slice(_w, _start, {size})")
    return d.select(
        *df.columns,
        F.expr(f"CAST((_start - 1) DIV {stride} AS BIGINT)").alias("chunk_idx"),
        F.col("_start").cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
        # coalesce: a NULL-text doc still emits its single chunk row (the
        # greatest() keeps one start slot) — its text is '' in both engines
        F.coalesce(F.array_join(chunk, " "), F.lit("")).alias("chunk_text"),
    )


def lang_id(df: DataFrame, text: str = "text", out: str = "lang_guess") -> DataFrame:
    """Marker-word-voting language ID: score each language by marker hits in
    the token set, pick the argmax (ties → lexicographically first lang).
    On synthetic corpora with shared vocab this degenerates gracefully to
    the first language — the operator contract (deterministic argmax over
    per-language scores) is what matters for the pipeline."""
    d = tokenize(df, text, "_w")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = ",".join(f"'{m}'" for m in markers)
        # coalesce: NULL text tokenizes to a NULL array whose size is NULL —
        # all-NULL scores make the argmax engine-dependent; zero scores tie
        # deterministically to the first language instead
        scores.append(
            F.expr(f"coalesce(size(filter(_w, x -> x IN ({arr}))), 0)").alias(
                f"_s_{lang}"
            )
        )
    d = d.select(*df.columns, *scores)
    langs = sorted(LANG_MARKERS)
    # array_max compares struct fields in order: score first, then -index so
    # ties resolve to the lexicographically-first language.
    struct_arr = F.array(
        *[
            F.struct(
                F.col(f"_s_{l}").alias("s"),
                F.lit(-i).alias("neg_rank"),
                F.lit(l).alias("lang"),
            )
            for i, l in enumerate(langs)
        ]
    )
    best = F.array_max(struct_arr)["lang"]
    return d.withColumn(out, best).drop(*[f"_s_{l}" for l in langs])
