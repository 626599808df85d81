"""Property tests for the object-store mirror (sources/sync.py):
for ANY source tree and ANY pre-existing destination state, one
mirror pass makes the destination equal the source's syncable subset,
a second pass copies nothing, and excluded files never ship.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from nemscraper_spark.sources.sync import mirror_tree

_SEG = st.sampled_from(["a", "b", "c", "d1", ".hid", "part-0"])
_NAME = st.sampled_from(
    ["x.parquet", "y.parquet", "_SUCCESS", "z.tmp", "w.bin"]
)


@st.composite
def _tree(draw):
    n = draw(st.integers(0, 6))
    files = {}
    for _ in range(n):
        depth = draw(st.integers(0, 2))
        parts = [draw(_SEG) for _ in range(depth)] + [draw(_NAME)]
        rel = "/".join(parts)
        files[rel] = draw(st.binary(min_size=0, max_size=32))
    return files


def _write_tree(root: str, files: dict[str, bytes], backdate: bool = False) -> None:
    for rel, data in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)
        if backdate:
            # stale destination state: older than any source write, so
            # the rsync quick check (size + newer-mtime) must replace
            # it whenever content could differ
            os.utime(p, (1000, 1000))


def _read_tree(root: str) -> dict[str, bytes]:
    out = {}
    for dirpath, _dirs, names in os.walk(root):
        for name in names:
            p = os.path.join(dirpath, name)
            out[os.path.relpath(p, root)] = open(p, "rb").read()
    return out


def _syncable(files: dict[str, bytes]) -> dict[str, bytes]:
    return {
        rel: data
        for rel, data in files.items()
        if not rel.endswith(".tmp")
        and not any(part.startswith(".") for part in rel.split("/"))
    }


@settings(max_examples=25, deadline=None)
@given(src_files=_tree(), dst_files=_tree())
def test_mirror_converges_from_any_destination_state(src_files, dst_files):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        dst = os.path.join(tmp, "dst")
        os.makedirs(src)
        os.makedirs(dst)
        _write_tree(src, src_files)
        _write_tree(dst, dst_files, backdate=True)

        mirror_tree(src, dst)
        want = _syncable(src_files)
        got = _syncable(_read_tree(dst))
        assert got == want
        # destination's own excluded files are untouched (never deleted)
        for rel, data in dst_files.items():
            if rel in _syncable(dst_files) or rel in want:
                continue
            assert _read_tree(dst).get(rel) == data

        # fixpoint: a second pass moves nothing
        s2 = mirror_tree(src, dst)
        assert s2["copied"] == 0 and s2["deleted"] == 0
