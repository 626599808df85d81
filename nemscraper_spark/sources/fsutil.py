"""Filesystem access for maintenance plans (compaction, conservation).

The reference deploys against GCS (scripts/gcloud-sync.sh:22-41); its
compactor walks and renames files directly. Spark reads/writes any
Hadoop-visible URI already, but our driver-side file ops (partition
discovery, the compaction swap, footer row counts) used glob/os/shutil
and therefore only worked on POSIX paths. This module routes those ops
through pyarrow.fs so the same code runs on ``file://``, ``s3://``,
``gs://`` (pyarrow resolves the scheme; bare paths mean the local fs).

Every helper takes/returns FULL paths in the caller's original notation
(scheme prefix preserved) so results can be handed straight back to
Spark readers.
"""

from __future__ import annotations

import posixpath

import pyarrow.fs as pafs


def get_fs(path: str) -> tuple[pafs.FileSystem, str, str]:
    """Resolve ``path`` to (filesystem, fs-local path, scheme prefix).

    ``prefix + local_path`` reconstructs a Spark-readable URI. Bare
    POSIX paths get the local filesystem and an empty prefix.
    """
    if "://" in path:
        fs, local = pafs.FileSystem.from_uri(path)
        scheme = path.split("://", 1)[0]
        if scheme == "file":
            prefix = "file://"
        else:
            # from_uri strips "scheme://" and keeps "bucket/key"
            prefix = f"{scheme}://"
        return fs, local, prefix
    return pafs.LocalFileSystem(), path, ""


def list_files(path: str, suffix: str = "", recursive: bool = False) -> list[str]:
    """Full paths of regular files under ``path`` (sorted), optionally
    filtered by suffix. Missing dirs yield []."""
    fs, local, prefix = get_fs(path)
    sel = pafs.FileSelector(local, recursive=recursive, allow_not_found=True)
    out = [
        prefix + info.path
        for info in fs.get_file_info(sel)
        if info.type == pafs.FileType.File and info.path.endswith(suffix)
    ]
    return sorted(out)


def list_dirs(path: str, name_prefix: str = "") -> list[str]:
    """Full paths of immediate subdirectories (sorted), optionally
    filtered by basename prefix."""
    fs, local, prefix = get_fs(path)
    sel = pafs.FileSelector(local, recursive=False, allow_not_found=True)
    out = [
        prefix + info.path
        for info in fs.get_file_info(sel)
        if info.type == pafs.FileType.Directory
        and posixpath.basename(info.path).startswith(name_prefix)
    ]
    return sorted(out)


def exists(path: str) -> bool:
    fs, local, _ = get_fs(path)
    return fs.get_file_info(local).type != pafs.FileType.NotFound


def delete_file(path: str, missing_ok: bool = True) -> None:
    fs, local, _ = get_fs(path)
    if missing_ok and fs.get_file_info(local).type == pafs.FileType.NotFound:
        return
    fs.delete_file(local)


def delete_dir(path: str, missing_ok: bool = True) -> None:
    fs, local, _ = get_fs(path)
    if missing_ok and fs.get_file_info(local).type == pafs.FileType.NotFound:
        return
    fs.delete_dir(local)


def move(src: str, dst: str) -> None:
    """Rename within one filesystem. Atomic on POSIX; object stores do
    copy+delete (the manifest protocol in plans/compact.py keeps the
    swap correct regardless)."""
    fs, src_local, _ = get_fs(src)
    _, dst_local, _ = get_fs(dst)
    fs.move(src_local, dst_local)


def write_text(path: str, text: str) -> None:
    """Write a small text file via stage + rename so readers never see
    a torn write (single-file atomicity on POSIX/HDFS)."""
    fs, local, _ = get_fs(path)
    tmp = local + ".tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(text.encode("utf-8"))
    fs.move(tmp, local)


def read_text(path: str) -> str:
    fs, local, _ = get_fs(path)
    with fs.open_input_stream(local) as f:
        return f.read().decode("utf-8")


def open_input(path: str):
    """Random-access input file handle (for parquet footer reads)."""
    fs, local, _ = get_fs(path)
    return fs.open_input_file(local)


def parquet_rows(root: str) -> int:
    """Total rows of every parquet file under ``root`` from footers
    only (driver-side metadata reads, no Spark job) — works on any
    pyarrow-visible filesystem. Conservation-check kernel
    (verify.rs:56-133 counts the same way)."""
    import pyarrow.parquet as pq

    total = 0
    for f in list_files(root, suffix=".parquet", recursive=True):
        with open_input(f) as fh:
            total += pq.ParquetFile(fh).metadata.num_rows
    return total
