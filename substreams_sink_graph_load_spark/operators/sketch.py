"""Frequency-sketch operators: exact heavy hitters with a Misra-Gries
bounded candidate pass (SURVEY §2.12 — the boilerplate/hot-key detector a
training-data pipeline runs before dedup and mixing).

The naive heavy-hitter plan — ``groupBy(term).count().filter(freq > n/k)``
— shuffles one partial-count row **per distinct term per map task**.  At
100 TB of text the term vocabulary is billions of n-grams, so the shuffle
is dominated by the long tail that can never qualify.  The classical fix
is a two-pass exact algorithm:

1. **Candidate pass** (this module's Misra-Gries summary): every map
   partition maintains at most ``capacity`` counters and emits only the
   survivors.  The Misra-Gries guarantee — a stored count undercounts the
   partition-local true count by at most ``n_i / (capacity+1)`` — gives
   the superset property by averaging: if a term's GLOBAL frequency
   exceeds ``n / (capacity+1)`` then on at least one partition its local
   frequency exceeds ``n_i / (capacity+1)``, so it survives that
   partition's summary.  The union of partition summaries (at most
   ``capacity × partitions`` rows, independent of vocabulary size) is
   therefore a superset of every global heavy hitter.
2. **Exact recount pass**: the occurrence stream is semi-joined against
   the broadcast candidate set *before* the count aggregation, so the
   shuffle carries partial counts for candidate terms only, and the final
   strict filter ``freq * k > n`` (integer cross-multiplication — no
   division, bit-identical in any engine) makes the output EXACT: the
   candidate pass can only over-approximate, and the recount trims it to
   precisely ``{term : freq > n/k}``.

The composition is partitioning-invariant (any true heavy hitter survives
*some* partition regardless of how rows are split — property-tested), so
the result is deterministic even though each summary is not.

This module is pure composition + one Arrow-batched candidate generator;
there is no reference counterpart (the reference has no query surface) —
the algorithm is Misra-Gries (1982) / Agarwal et al., "Mergeable
Summaries" (PODS 2012).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, col: str, capacity: int = 2000
) -> DataFrame:
    """Per-partition Misra-Gries summaries over the occurrence stream.

    Input: a DataFrame whose ``col`` column is one row per occurrence.
    Output: ``(col, est_count)`` — at most ``capacity`` rows per input
    partition; the union over partitions is a superset of every term with
    global frequency > n/(capacity+1).

    NULL occurrences are ignored (``value_counts`` drops them) — and the
    recount pass can't resurrect them either, since NULL never
    equi-joins the candidate set — so a NULL term cannot be reported
    heavy.  Feed non-null occurrence streams (the registry query's gram
    explode guarantees this by construction; a SQL oracle whose GROUP BY
    would produce a NULL group would diverge otherwise).

    Per Arrow batch the occurrences are counted exactly (vectorized
    ``value_counts``) and merged into the running summary; the summary is
    then pruned back to ``capacity`` by subtracting the (capacity+1)-th
    largest count from every counter and dropping the non-positive ones —
    the standard mergeable-summaries merge, which preserves the
    ``undercount <= n_i/(capacity+1)`` invariant (each prune round
    subtracts its decrement from at least capacity+1 counters, so total
    decrement <= n_i/(capacity+1)).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf[col].value_counts().items():
                counts[term] = counts.get(term, 0) + int(c)
            if len(counts) > capacity:
                # (capacity+1)-th largest stored value; subtracting it
                # zeroes at least one counter, so the dict shrinks to
                # <= capacity survivors.
                cut = sorted(counts.values(), reverse=True)[capacity]
                counts = {t: c - cut for t, c in counts.items() if c > cut}
        yield pd.DataFrame(
            {col: list(counts), "est_count": list(counts.values())}
        )

    return df.select(col).mapInPandas(
        summarize, f"{col} string, est_count long"
    )


def heavy_hitters_text_grams(
    df: DataFrame,
    text_col: str,
    k_gram: int,
    k: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact heavy-hitter word ``k_gram``-grams over a text column:
    ``{gram : freq * k > n}`` with n = total gram occurrences.

    The text specialization of :func:`heavy_hitters_exact` (r9): gram
    generation folds INTO the two passes, so the exploded occurrence
    stream never exists as a relation — no lead-window exchange over
    every word of the corpus, no persisted occurrence materialization
    traversed three times.  Pass 1 streams each doc's grams (built
    doc-locally) straight into the per-partition Misra-Gries summary;
    the candidate union (<= capacity x partitions rows — independent of
    vocabulary AND corpus size, the same bound the broadcast join in
    heavy_hitters_exact relies on) is collected and closed over; pass 2
    recounts ONLY candidate grams per partition, shuffling one
    (gram, count) partial per candidate per partition.  The exact total
    n is a plain codegen aggregate over word counts — no explode.
    Docs with < k_gram words contribute nothing (short_doc_fallback
    semantics of the registry query); NULL text contributes nothing.

    EAGER-EVALUATION CONTRACT (unlike the lazy
    :func:`heavy_hitters_exact` this specializes): the total-count
    aggregate and the candidate pass run as two Spark jobs AT
    CONSTRUCTION TIME — calling this function executes both passes even
    if the returned DataFrame is never acted on (plan_of/explain tooling
    included), and freezes ``n`` and the candidate set against any later
    change to ``df``'s input files.  The candidate broadcast stays alive
    as long as the returned plan is reachable (the recount closure holds
    it); Spark's ContextCleaner reclaims it once the DataFrame is
    garbage-collected — if you construct many of these in one session,
    drop the references (or collect and move on) rather than holding
    them.
    """
    if capacity is None:
        capacity = k
    if capacity < k:
        raise ValueError(
            f"capacity {capacity} < k {k}: the Misra-Gries superset "
            "guarantee only covers terms with freq > n/(capacity+1)"
        )
    import pyarrow as pa

    src = df.select(F.col(text_col).alias("t")).where(
        F.col(text_col).isNotNull()
    )
    from .ann import narrower_than_cores

    cores = df.sparkSession.sparkContext.defaultParallelism
    if narrower_than_cores(src):
        src = src.repartition(cores)

    # exact total occurrences: one whole-stage-codegen aggregate
    n_total = src.agg(
        F.sum(
            F.greatest(
                F.size(F.split(F.col("t"), " ")) - (k_gram - 1), F.lit(0)
            )
        ).alias("n")
    ).collect()[0]["n"] or 0

    def doc_grams(t: str):
        ws = t.split(" ")
        return (
            " ".join(ws[j : j + k_gram]) for j in range(len(ws) - k_gram + 1)
        )

    def summarize(batches):
        counts: dict[str, int] = {}
        for batch in batches:
            for t in batch.column(0).to_pylist():
                for g in doc_grams(t):
                    counts[g] = counts.get(g, 0) + 1
                if len(counts) > 4 * capacity:
                    cut = sorted(counts.values(), reverse=True)[capacity]
                    counts = {
                        x: c - cut for x, c in counts.items() if c > cut
                    }
        if len(counts) > capacity:
            cut = sorted(counts.values(), reverse=True)[capacity]
            counts = {x: c - cut for x, c in counts.items() if c > cut}
        yield pa.record_batch(
            [pa.array(list(counts), type=pa.string())], names=["gram"]
        )

    # bounded driver read: <= capacity x partitions candidate grams;
    # shipped once per executor as a real broadcast (a closure capture
    # would re-serialize the set with every task at cluster scale)
    cand = df.sparkSession.sparkContext.broadcast(
        frozenset(
            r["gram"]
            for r in src.mapInArrow(summarize, "gram string").collect()
        )
    )

    def recount(batches):
        # count only candidates actually SEEN in this partition (frozenset
        # membership + plain dict): per-task memory is bounded by the
        # candidates present locally, not pre-zeroed capacity x
        # total-partition-count entries in every task
        cset = cand.value
        hits: dict[str, int] = {}
        for batch in batches:
            for t in batch.column(0).to_pylist():
                for g in doc_grams(t):
                    if g in cset:
                        hits[g] = hits.get(g, 0) + 1
            # candidate partials only — nothing grows with the corpus
        yield pa.record_batch(
            [
                pa.array(list(hits), type=pa.string()),
                pa.array(list(hits.values()), type=pa.int64()),
            ],
            names=["gram", "freq"],
        )

    return (
        src.mapInArrow(recount, "gram string, freq long")
        .groupBy("gram")
        .agg(F.sum("freq").alias("freq"))
        .where(F.col("freq") * F.lit(k) > F.lit(int(n_total)))
        .select("gram", "freq")
    )


def heavy_hitters_exact(
    occurrences: DataFrame, col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact ``{term : freq * k > n}`` via MG candidates + recount.

    ``occurrences`` is one row per term occurrence; it is traversed three
    times (candidate pass, total count, recount) — persist it at the call
    site when it is the product of an expensive explode.

    ``capacity`` defaults to ``k`` (the smallest summary that still
    guarantees the superset: threshold n/k > n/(capacity+1) needs
    capacity >= k).  Output: ``(col, freq)``, exact.
    """
    if capacity is None:
        capacity = k
    if capacity < k:
        raise ValueError(
            f"capacity {capacity} < k {k}: the Misra-Gries superset "
            "guarantee only covers terms with freq > n/(capacity+1)"
        )
    candidates = misra_gries_candidates(occurrences, col, capacity).select(
        col
    ).distinct()
    total = occurrences.agg(F.count("*").alias("_n"))
    return (
        occurrences.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(total))
        # strict integer cross-multiplication, not freq > n/k: no
        # division semantics to reconcile across engines.
        .where(F.col("freq") * F.lit(k) > F.col("_n"))
        .select(col, "freq")
    )
