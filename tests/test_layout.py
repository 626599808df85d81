"""Clustered layout (plans/layout.py): the parquet footers must show
tight, mostly-disjoint per-file min-max ranges on the cluster key —
the property row-group pruning depends on — and a selective filter
must still return exactly the right rows."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from nemscraper_spark.plans.layout import clustered_write
from nemscraper_spark.queries.common import load_table


def _ranges(path, col):
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        ci = names.index(col)
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            s = meta.row_group(rg).column(ci).statistics
            mins.append(s.min)
            maxs.append(s.max)
        out.append((min(mins), max(maxs)))
    return out


def _overlap_pairs(ranges):
    n = 0
    for i, (lo, hi) in enumerate(ranges):
        for lo2, hi2 in ranges[i + 1 :]:
            if lo <= hi2 and lo2 <= hi:
                n += 1
    return n


def test_clustered_layout_enables_skipping(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    clustered = str(tmp_path / "clustered")
    unsorted_ = str(tmp_path / "unsorted")

    clustered_write(ev, clustered, ["user_id"], n_files=8)
    # control: same data, hash-shuffled — every file spans ~all keys
    ev.repartition(8).write.mode("overwrite").parquet(unsorted_)

    cr = _ranges(clustered, "user_id")
    ur = _ranges(unsorted_, "user_id")
    assert len(cr) >= 4
    # clustered: range-partitioned files overlap at most at boundaries;
    # unsorted: everything overlaps everything
    assert _overlap_pairs(cr) <= len(cr)  # ~boundary touches only
    assert _overlap_pairs(ur) == len(ur) * (len(ur) - 1) // 2

    # correctness under the layout: selective filter returns the same
    # rows as from the unsorted copy
    a = spark.read.parquet(clustered).filter("user_id = 7").count()
    b = spark.read.parquet(unsorted_).filter("user_id = 7").count()
    assert a == b and a > 0
