"""Property-based conservation check for the NEM-CSV splitter
(sources/nemcsv.py): for ARBITRARY block layouts — multiple tables,
repeated I-headers, quoted/empty/numeric/timestamp cells — every
generated D row must land in exactly one output parquet row of the
right table (the reference's verify.rs invariant, driven by random
inputs instead of one fixture)."""

from __future__ import annotations

import os
import zipfile
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nemscraper_spark.sources.nemcsv import ingest

TABLES = ("UNIT_MW", "REGION_FREQ_MEASURE", "CONSTRAINT_X")
# per-table fixed column names (same table name -> same header shape,
# matching real NEM feeds; intra-file schema drift is a separate case)
HEADERS = {
    "UNIT_MW": ["TS", "UNITID", "MW"],
    "REGION_FREQ_MEASURE": ["TS", "REGIONID", "HZ", "FLAG"],
    "CONSTRAINT_X": ["CID", "VAL"],
}
CELLS = [
    "1.5",
    "-3",
    "abc",
    "",
    '"quoted"',
    "  padded  ",
    "2025/06/01 00:00:04",
    "1e3",
    "NSW1",
]

_block = st.tuples(
    st.sampled_from(TABLES),
    st.lists(st.lists(st.sampled_from(CELLS), min_size=1, max_size=6), max_size=5),
)


def _render(blocks):
    lines = ["C,NEMP.WORLD,DISPATCHIS,AEMO,PUBLIC,2022/07/20,18:00:00,0001,,"]
    d_counts: Counter[str] = Counter()
    for table, rows in blocks:
        cols = HEADERS[table]
        lines.append(f"I,FPP,{table},1," + ",".join(cols))
        key = f"FPP---{table}---1"
        for row in rows:
            cells = (row + [""] * len(cols))[: len(cols)]
            lines.append(f"D,FPP,{table},1," + ",".join(cells))
            d_counts[key] += 1
    lines.append('C,"END OF REPORT",99')
    return "\r\n".join(lines), d_counts


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(blocks=st.lists(_block, min_size=1, max_size=6))
def test_splitter_conserves_d_rows(spark, tmp_path_factory, blocks):
    tmp = tmp_path_factory.mktemp("prop_ingest")
    landing, out = str(tmp / "landing"), str(tmp / "out")
    os.makedirs(landing)
    csv, d_counts = _render(blocks)
    with zipfile.ZipFile(
        os.path.join(landing, "PUBLIC_DISPATCHIS_20220720_0001.zip"), "w"
    ) as zf:
        zf.writestr("PUBLIC_DISPATCHIS_202207201800.CSV", csv)

    counts = ingest(spark, landing, out)

    assert {k: v for k, v in counts.items() if v} == {
        k: v for k, v in d_counts.items() if v
    }
    for key, want in d_counts.items():
        if want:
            got = spark.read.parquet(os.path.join(out, key)).count()
            assert got == want, (key, got, want)
