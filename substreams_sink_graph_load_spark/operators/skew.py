"""Skew-mitigation operators: salted two-phase aggregation and salted
broadcast-side replication for hot keys.

AQE's skew-join splitting (on in session defaults) handles most runtime
skew; these are the explicit tools for the cases AQE can't see — a single
aggregation key holding 1% of a 100 TB input (the classic boilerplate-
document / null-key hazard), or a shuffled join against a side AQE won't
split.

Both transforms are algebraic rewrites of built-ins — no UDFs, no state:

- ``salted_agg``: groupBy(key, salt) partial -> groupBy(key) final.  The
  extra exchange carries #salts rows per hot key instead of every row of
  the hot key through one reducer.
- ``salted_join``: the skewed fact side picks a random salt, the compact
  dim side replicates across all salts (explode), turning one hot
  partition into ``salts`` even ones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt stage.

    ``aggs`` maps output column -> (fn, input column) with fn in
    sum/count/min/max (the self-mergeable aggregates; count re-merges as
    sum).  Semantically identical to ``df.groupBy(keys).agg(...)``; the
    salt bounds any single reducer's share of a hot key to ~1/salts.
    """
    bad = {fn for fn, _ in aggs.values()} - _MERGEABLE
    if bad:
        raise ValueError(f"non-mergeable aggregate(s): {sorted(bad)}")
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salts).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy(*keys).agg(
        *[
            merge[fn](out).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )
    return final


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salting: fact rows scatter over ``salts`` sub-keys,
    dim rows replicate across all of them.  Use when the dim side is too
    big to broadcast but small enough to replicate ``salts``-fold, and one
    fact key dominates."""
    f = fact.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = f.join(d, [*on, "_salt"], how)
    return out.drop("_salt")
