"""Text-analysis expressions for the LLM-pipeline surface (SURVEY §2.12).

All pure Column builders — tokenization, shingling, fingerprinting and
quality scoring run inside whole-stage codegen; outputs are exact integers
(counts / ppm / modular hashes) so cross-engine value-hash comparison can
never be skewed by float summation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import h60, PRIME31

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams (array<string>); whole text when < k words.

    Built from ``sequence`` + ``transform`` + 0-based ``get`` — no explode,
    so shingling never multiplies row count before hashing.
    """
    words = F.split(text, " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", *[F.get(words, i + j) for j in range(k)]),
    )
    return F.array_distinct(F.when(n < k, F.array(text)).otherwise(grams))


def token_split(text: Column) -> Column:
    """BPE-ish tokens: ``regexp_extract_all`` with :data:`TOKEN_REGEX`
    (letter runs / digit runs / single punctuation marks)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))


def rolling_fingerprint(text: Column, base: int = 31) -> Column:
    """Order-sensitive document fingerprint: left fold of
    ``acc*base + h60(word) mod P`` over the word sequence (a Rabin-Karp-style
    polynomial hash).  Two docs with the same words in different order get
    different fingerprints — the complement of the order-insensitive MinHash.

    Operand bound: acc < 2^31, *31 < 2^36, + 2^31 — no int64 wrap.
    """
    words = F.split(text, " ")
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * base + h60(w) % PRIME31) % PRIME31,
    )


def quality_score_ppm(text: Column, stopwords: list[str]) -> Column:
    """Composite doc-quality score in exact ppm: mean of three ratio signals
    (stopword density, alpha-token share, distinct-word share), each capped
    to [0, 1e6].  Mirrors the length/punct/stopword heuristics used for
    pretraining-corpus filtering."""
    words = F.split(text, " ")
    n_words = F.size(words)
    stop = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    tokens = F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))
    n_alpha = F.size(F.filter(tokens, lambda t: t.rlike("^[a-z]+$")))
    n_tok = F.size(tokens)
    stop_ppm = F.least(F.lit(1000000), F.floor(5000000.0 * n_stop / n_words))
    alpha_ppm = F.floor(1000000.0 * n_alpha / F.greatest(n_tok, F.lit(1)))
    distinct_ppm = F.floor(
        1000000.0 * F.size(F.array_distinct(words)) / n_words
    )
    return (
        F.floor((stop_ppm + alpha_ppm + distinct_ppm) / 3).cast("long")
    )


def exploded_shingles(
    df,
    id_col: str,
    text_col: str,
    k: int,
    short_doc_fallback: bool = True,
    carry_cols: tuple[str, ...] = (),
):
    """Word k-gram OCCURRENCES as rows ``(id_col, *carry_cols, gram)`` via
    posexplode + window ``lead`` — the codegen shape (higher-order array
    lambdas run interpreted with no CSE; the lead-window formulation
    measured ~20x faster at corpus scale, see minhash_sketch).  One
    shuffle on ``(id_col, *carry_cols)`` for the lead window.

    ``carry_cols`` ride along per row (constant within a doc, e.g. a
    blocking key) so downstream per-doc aggregations need no join back to
    the source; they join the window partition key, which is still
    per-doc partitioning, and a following groupBy on the same columns
    reuses the exchange.

    ``short_doc_fallback=True`` mirrors :func:`word_shingles`: a doc with
    fewer than ``k`` words contributes its whole text as its single gram
    (the pos==0 row).  With ``False`` such docs contribute nothing.
    Apply ``.distinct()`` for per-doc set semantics.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col, *carry_cols).orderBy("pos")
    ex = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col(text_col).alias("_text"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    parts = [F.col("w")] + [F.lead("w", j).over(w) for j in range(1, k)]
    tail = F.lead("w", k - 1).over(w)
    g = ex.withColumn("gram", F.concat_ws(" ", *parts)).withColumn(
        "_tail", tail
    )
    if short_doc_fallback:
        g = g.where(
            F.col("_tail").isNotNull() | (F.col("pos") == 0)
        ).withColumn(
            "gram",
            F.when(F.col("_tail").isNull(), F.col("_text")).otherwise(
                F.col("gram")
            ),
        )
    else:
        g = g.where(F.col("_tail").isNotNull())
    return g.select(
        F.col(id_col), *[F.col(c) for c in carry_cols], F.col("gram")
    )


# PII patterns shared by the pii_scrub query and the curation pipeline.
# RE2-safe subset (no backrefs/lookaround) so Spark's Java regex and any
# RE2-based oracle engine agree byte-for-byte.
PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]"
PII_PHONE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def scrub_pii(text: Column) -> Column:
    """Replace emails / phone numbers / IPv4 addresses with typed
    placeholders — three JVM ``regexp_replace`` calls in one codegen
    stage, no shuffle, no Python."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )


def chunk_starts(words: Column, stride: int) -> Column:
    """0-based start offsets of overlapping word-window chunks.

    One start per ``stride`` words, always at least one (covering the
    head of the document); pure ``sequence`` column math so the fan-out
    is declared in-plan (``size == ceil(n / stride)``), never data-driven
    Python.  The explicit step guards Spark's sequence() default, which
    flips to -1 when start > stop.
    """
    n = F.size(words)
    return F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )


def chunk_text(words: Column, start: Column, width: int) -> Column:
    """The chunk at ``start``: up to ``width`` words re-joined by spaces."""
    return F.concat_ws(" ", F.slice(words, start + 1, width))
