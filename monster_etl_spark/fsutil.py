"""Filesystem listing/metadata over the Hadoop FileSystem API.

Every path-manipulating helper in this repo (manifest harvest, TSV glob
expansion, partition listing, compaction swaps) routes through this module
so the SAME code path works on ``file:/``, ``hdfs://``, ``s3a://`` and
``gs://`` — the reference's world is object storage (``gs://`` paths in
``V2FUtilsSpec.scala:196``), and ``glob.glob``/``os.path`` silently see an
empty local directory there.

The Hadoop FS API is reached through the live ``SparkSession``'s JVM
gateway (no extra dependency — it is the machinery ``spark.read`` itself
uses). When no JVM is reachable, or the pattern needs ``**`` recursion
(which Hadoop globs lack), local ``glob``/``os`` is the fallback — so
driver-side unit code keeps working without a session.

Only file METADATA crosses the gateway (names, sizes, mtimes — one RPC per
listing), plus at most ``max_bytes`` for ``read_head``; data planes stay in
Spark jobs.
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

_GLOB_CHARS = "*?[{"


@dataclass(frozen=True)
class FileStat:
    """One listed file: path (local-scheme-stripped), size in bytes,
    modification time in epoch millis. ``(size, mtime)`` is the rewrite
    detector used by ``update_manifest`` — a part file rewritten in place
    under the same name changes at least one of them."""

    path: str
    size: int
    mtime: int


def strip_local_scheme(uri: str) -> str:
    """``file:/p`` / ``file:///p`` -> ``/p``; other schemes unchanged.

    Local consumers (pyarrow footer reads, ``open()``) want bare paths;
    remote URIs must stay fully qualified."""
    if uri.startswith("file:"):
        rest = uri[len("file:") :]
        return "/" + rest.lstrip("/")
    return uri


def _is_remote(path: str) -> bool:
    return "://" in path and not path.startswith("file://")


def _local_list(path: str, pattern: str | None) -> list[FileStat]:
    if os.path.isdir(path):
        matches = _glob.glob(os.path.join(path, pattern or "*"))
    else:
        matches = _glob.glob(path, recursive=True)
    out = [
        FileStat(f, os.path.getsize(f), int(os.path.getmtime(f) * 1000))
        for f in matches
        if os.path.isfile(f)
    ]
    return sorted(out, key=lambda s: s.path)


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def list_files(spark, path: str, pattern: str | None = None) -> list[FileStat]:
    """List data files at ``path`` on whatever filesystem its scheme names.

    - directory ``path``: children matching ``pattern`` (default all);
    - glob ``path``: expanded (empty match -> empty list);
    - literal file ``path``: that one file; missing literal -> empty list
      (existence policy belongs to callers — see ``sources/tsv.py``).

    Falls back to local ``glob`` when ``spark`` is None or the pattern
    needs ``**`` recursion on a local path.
    """
    has_recursive = "**" in path or (pattern is not None and "**" in pattern)
    if spark is None or (not _is_remote(path) and has_recursive):
        return _local_list(strip_local_scheme(path), pattern)

    fs, jpath, jvm = _hadoop_fs(spark, path)
    has_glob = any(ch in path for ch in _GLOB_CHARS)
    if has_glob:
        statuses = fs.globStatus(jpath)
    elif fs.exists(jpath) and fs.getFileStatus(jpath).isDirectory():
        child = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + (pattern or "*"))
        statuses = fs.globStatus(child)
    elif fs.exists(jpath):
        statuses = [fs.getFileStatus(jpath)]
    else:
        statuses = None
    out = [
        FileStat(
            strip_local_scheme(st.getPath().toString()),
            st.getLen(),
            st.getModificationTime(),
        )
        for st in (statuses or [])
        if not st.isDirectory()
    ]
    return sorted(out, key=lambda s: s.path)


def list_dirs(spark, path: str, pattern: str | None = None) -> list[str]:
    """Immediate child DIRECTORIES of ``path`` matching ``pattern`` —
    Hive partition discovery (``col=value`` layout) on any filesystem."""
    if spark is None or not _is_remote(path):
        base = strip_local_scheme(path)
        return sorted(
            d for d in _glob.glob(os.path.join(base, pattern or "*")) if os.path.isdir(d)
        )
    fs, _, jvm = _hadoop_fs(spark, path)
    child = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + (pattern or "*"))
    statuses = fs.globStatus(child)
    return sorted(
        strip_local_scheme(st.getPath().toString())
        for st in (statuses or [])
        if st.isDirectory()
    )


def read_head(spark, path: str, max_bytes: int = 65536) -> bytes:
    """First ``max_bytes`` of a file on any filesystem — enough for header
    sniffing (TSV header row, magic bytes) without shipping the file.

    The bytes come back over the py4j gateway in ONE call
    (``IOUtils.toByteArray`` returns ``byte[]``, which py4j transfers as a
    Python ``bytes`` value) — never per-byte round trips."""
    if spark is None or not _is_remote(path):
        with open(strip_local_scheme(path), "rb") as fh:
            return fh.read(max_bytes)
    fs, jpath, jvm = _hadoop_fs(spark, path)
    n = min(int(fs.getFileStatus(jpath).getLen()), max_bytes)
    stream = fs.open(jpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n))
    finally:
        stream.close()


def delete(spark, path: str, recursive: bool = True) -> bool:
    """Remove a file/dir tree on any filesystem (False if absent)."""
    if spark is None or not _is_remote(path):
        import shutil

        p = strip_local_scheme(path)
        if os.path.isdir(p):
            shutil.rmtree(p)
            return True
        if os.path.isfile(p):
            os.remove(p)
            return True
        return False
    fs, jpath, _ = _hadoop_fs(spark, path)
    return bool(fs.delete(jpath, recursive))


def rename(spark, src: str, dst: str) -> bool:
    """Atomic-ish rename on the filesystem's own terms (a real rename on
    HDFS/local; a copy-manifest operation on object stores — which is why
    ``compact()`` documents that a table format is the real fix there)."""
    if spark is None or (not _is_remote(src) and not _is_remote(dst)):
        os.replace(strip_local_scheme(src), strip_local_scheme(dst))
        return True
    fs, jsrc, jvm = _hadoop_fs(spark, src)
    return bool(fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)))
