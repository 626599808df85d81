"""S15 — object-store sink: mirror the compacted tree to a bucket URI.

The reference ships its compacted parquet to GCS with a 30 s
`gcloud storage rsync --checksums-only
--delete-unmatched-destination-objects --exclude='.*\\.tmp$'` loop
(scripts/gcloud-sync.sh:22-41). This module is that sync as engine
code, URI-generic through pyarrow.fs (sources/fsutil.py): the same
mirror runs against ``file://`` (how the tests drive it), ``gs://`` or
``s3://`` — pyarrow resolves the scheme, no SDK-specific code here.

Semantics match the reference flags:
  * incremental — a file is copied when missing at the destination,
    of different size, or with a source mtime NEWER than the
    destination's (rsync's quick check: a same-size rewrite is caught
    because the destination's mtime is the time of OUR last copy; the
    reference uses checksums, but GCS exposes those as metadata while
    generic stores don't — size+mtime is the portable variant, and a
    same-size, not-newer, different-content file is undetectable by
    construction, exactly as with rsync without --checksum);
  * ``--delete-unmatched-destination-objects`` — destination files
    with no source counterpart are removed (compaction replaced them);
  * ``--exclude tmp/staging`` — ``*.tmp`` files and dot-prefixed
    staging dirs (the compactor's manifest-guarded swap area,
    plans/compact.py) never leave the machine;
  * copies stage to ``<name>.tmp`` then rename, so a concurrent reader
    of the destination never sees a torn object (and an interrupted
    sync leaves only ``.tmp`` litter that the next pass excludes and
    overwrites).

Driver-side by design: the mirror moves files, not rows — Spark jobs
are never involved, exactly like the reference's sidecar container.
Per-file work is independent, so a deployment that outgrows one
driver thread shards the relative-path list across a thread pool; the
protocol needs no coordination beyond the stage+rename.
"""

from __future__ import annotations

import posixpath

from nemscraper_spark.sources import fsutil

_COPY_CHUNK = 8 * 1024 * 1024


def _rel_files(root: str) -> dict[str, tuple]:
    """{relative path: (size, mtime)} for regular files under root,
    excluding *.tmp files and any path component that starts with a
    dot (hidden/staging dirs). mtime is None where the filesystem
    doesn't report one."""
    fs, local, _ = fsutil.get_fs(root)
    import pyarrow.fs as pafs

    sel = pafs.FileSelector(local, recursive=True, allow_not_found=True)
    out: dict[str, tuple] = {}
    base = local.rstrip("/")
    for info in fs.get_file_info(sel):
        if info.type != pafs.FileType.File:
            continue
        rel = posixpath.relpath(info.path, base)
        if rel.endswith(".tmp"):
            continue
        if any(part.startswith(".") for part in rel.split("/")):
            continue
        out[rel] = (info.size, info.mtime)
    return out


def _needs_copy(src_meta: tuple, dst_meta: tuple | None) -> bool:
    if dst_meta is None:
        return True
    s_size, s_mtime = src_meta
    d_size, d_mtime = dst_meta
    if s_size != d_size:
        return True
    # same size: recopy only when the source is strictly newer than our
    # last copy of it (rsync quick-check semantics)
    if s_mtime is not None and d_mtime is not None and s_mtime > d_mtime:
        return True
    return False


def _copy_file(src_root: str, dst_root: str, rel: str) -> None:
    sfs, slocal, _ = fsutil.get_fs(src_root)
    dfs, dlocal, _ = fsutil.get_fs(dst_root)
    src = posixpath.join(slocal.rstrip("/"), rel)
    dst = posixpath.join(dlocal.rstrip("/"), rel)
    parent = posixpath.dirname(dst)
    if parent:
        dfs.create_dir(parent, recursive=True)
    tmp = dst + ".tmp"
    with sfs.open_input_stream(src) as fin, dfs.open_output_stream(tmp) as fout:
        while True:
            chunk = fin.read(_COPY_CHUNK)
            if not chunk:
                break
            fout.write(chunk)
    dfs.move(tmp, dst)


def mirror_tree(
    src_root: str,
    dst_root: str,
    delete_unmatched: bool = True,
) -> dict[str, int]:
    """One rsync pass src → dst. Returns counts:
    {"copied": n, "skipped": n, "deleted": n}."""
    src_files = _rel_files(src_root)
    dst_files = _rel_files(dst_root)

    copied = skipped = deleted = 0
    for rel, meta in sorted(src_files.items()):
        if not _needs_copy(meta, dst_files.get(rel)):
            skipped += 1
            continue
        _copy_file(src_root, dst_root, rel)
        copied += 1
    if delete_unmatched:
        dfs, dlocal, _ = fsutil.get_fs(dst_root)
        for rel in sorted(set(dst_files) - set(src_files)):
            dfs.delete_file(posixpath.join(dlocal.rstrip("/"), rel))
            deleted += 1
    return {"copied": copied, "skipped": skipped, "deleted": deleted}
