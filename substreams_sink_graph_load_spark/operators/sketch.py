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
