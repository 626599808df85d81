"""Recursive EWMA — the engine's one true custom kernel (SURVEY.md §2.10).

Reference semantics (crunch.rs:243-270; spec variant calcs.md:48-66):

    fm[i] = (1 - alpha) * fm[i-1] + alpha * (-dev[i])     seed fm[-1] = 0,
                                                          reset per key

The seed-0 start means pandas' ``ewm(adjust=False)`` (which seeds with
x[0]) does NOT match; the recurrence is applied explicitly.

Execution model: grouped-map Pandas UDF (applyInPandas). Each key's
series must be contiguous and ordered — Spark shuffles by key and we
sort within the group. At scale:

  * many keys (the normal case — one per DUID/region/user): each key is
    one task; the shuffle is the only data movement and parallelism is
    |keys|, which is exactly how the reference parallelizes (rayon per
    region).
  * few keys × very long series: split each key's series into day
    chunks, run the recurrence per chunk seeded with the closed-form
    carry-in fm_carry = sum_j a*(1-a)^(n-1-j)*x[j] of the previous
    chunk (a segmented-scan stitch); the operator exposes the plain
    version — the stitch composes from it because the recurrence is a
    linear map. Not needed at the reference's scale (5 regions × 21.6k
    rows/day).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _ewma_series(x: np.ndarray, alpha: float) -> np.ndarray:
    """Apply fm[i] = (1-alpha)*fm[i-1] + alpha*x[i], fm[-1] = 0."""
    out = np.empty(len(x), dtype=np.float64)
    prev = 0.0
    one_minus = 1.0 - alpha
    for i, v in enumerate(x):
        prev = one_minus * prev + alpha * v
        out[i] = prev
    return out


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    negate: bool = False,
    out_col: str = "ewma",
) -> DataFrame:
    """Append ``out_col`` = recursive EWMA of ``value_col`` per key.

    ``negate`` mirrors the reference's fm update over -freq_deviation
    (crunch.rs:254: alpha * -dev).
    """
    from pyspark.sql import types as T

    key_cols = list(key_cols)
    order_cols = list(order_cols)
    # build a fresh StructType — StructType.add would mutate df's schema
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    # NOTE: the closure must be self-contained (no references to this
    # module's globals): cloudpickle serializes module-level names by
    # reference, and the engine package isn't importable on executor
    # python workers when the hosting driver runs from another cwd.
    def apply_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        if negate:
            x = -x
        out = np.empty(len(x), dtype=np.float64)
        prev = 0.0
        one_minus = 1.0 - alpha
        for i, v in enumerate(x):
            prev = one_minus * prev + alpha * v
            out[i] = prev
        pdf[out_col] = out
        return pdf

    return df.groupBy(*key_cols).applyInPandas(apply_group, schema=out_schema)
