"""Salted join for skewed keys (SURVEY.md §7.1 'hard parts'; companion
to queries/extended_ops.skew_salted_agg).

A shuffle join on a skewed key sends every row of the hot key to ONE
reducer — at 100TB a single task gets 100GB while its peers idle. AQE's
skew-join split handles sort-merge cases; this operator is the explicit
form that also works when AQE can't (e.g. joins feeding a stateful op,
or a build side too big to split but small enough to replicate
per-salt):

    left (big, skewed):  salt = pmod(hash(whole row), S)  — rows fan
                         out over S sub-keys
    right (small-ish):   replicated S times, one copy per salt value
    join on (key, salt)  — hot key now spreads across S reducers

Result is row-identical to the unsalted join (the salt is a partition
refinement, never a filter). Replication multiplies the right side by
S, so pick S ~ (hot-key rows / target-partition rows) and keep the
replicated side the smaller one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the left side's
    hot keys spread over ``n_salts`` sub-partitions. Output columns
    match ``left.join(right, on, how)``."""
    on = list(on)
    lt = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    rt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lt.join(rt, on + ["__salt"], how).drop("__salt")
