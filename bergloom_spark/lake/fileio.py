"""FileIO: the storage seam under the lake's metadata/commit path.

The reference ships pluggable object-store FileIO (S3 + GCS feature
gates in ``core/Cargo.toml:16-19``; all metadata and commit I/O flows
through ``iceberg-rs``'s ``FileIO`` trait). This module is the Spark
rebuild's equivalent: every metadata read/write and the optimistic
commit CAS go through a small interface with two implementations —

- :class:`LocalFileIO` — plain ``os``-level I/O; the CAS is
  ``os.link`` onto the target (EEXIST = lost the race), exactly the
  semantics the lake has used since round 1.
- :class:`HadoopFileIO` — routes through the JVM's
  ``org.apache.hadoop.fs.FileSystem`` resolved from the path URI, so
  any scheme the cluster's Hadoop configuration supports (``file://``,
  ``hdfs://``, ``s3a://``, ``gs://`` ...) works without new Python
  code; the CAS is create-no-overwrite on the target (atomic on HDFS;
  the standard approximation object stores provide).

Contract note (the only primitive commits need): ``publish_if_absent``
must atomically either materialize the full content at ``dst`` or
raise :class:`FileExistsError` — losers of a version race must never
observe a torn file and never overwrite the winner. Everything else
(list/read/delete/exists/mkdirs) is plain and idempotent.

Scheme routing: :func:`io_for` returns :class:`LocalFileIO` for bare
paths and :class:`HadoopFileIO` for any ``scheme://`` path (requires
an active SparkSession for the JVM gateway). ``file://`` deliberately
routes through Hadoop so the JVM path is exercised by ordinary local
tests — the same code path an ``s3a://`` root would take when the
jars exist.
"""

from __future__ import annotations

import os
import re
import time

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def path_scheme(path: str) -> str:
    """URI scheme of ``path``, or "" for a bare filesystem path.
    Windows drive letters never match (scheme must be ≥2 chars +
    '://')."""
    m = _SCHEME_RE.match(path)
    return m.group(0)[:-3].lower() if m else ""


def strip_local_scheme(path: str) -> str:
    """``file://``-scheme URI → plain local path (other paths pass
    through). The DATA side of the lake (glob discovery, pyarrow
    footer harvest) operates on locally-mountable paths; this is the
    boundary where a local-scheme table root becomes one."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        # file:///abs/path and file:/abs/path both normalize to
        # /abs/path. A NON-EMPTY authority (file://host/path) names a
        # remote host; silently folding it into the local path would
        # point reads at /host/path (ADVICE r12) — fail loudly unless
        # it's the localhost spelling.
        if not rest.startswith("/"):
            authority, sep, tail = rest.partition("/")
            if authority.lower() not in ("", "localhost"):
                raise ValueError(
                    f"file:// URI has non-local authority "
                    f"{authority!r}: {path}"
                )
            rest = sep + tail
        return rest if rest.startswith("/") else "/" + rest
    if path.startswith("file:/"):
        return path[len("file:"):]
    return path


class FileIO:
    """Interface; see module docstring for the CAS contract."""

    def list_names(self, directory: str) -> list[str]:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        raise NotImplementedError

    def write_bytes(self, path: str, blob: bytes) -> None:
        raise NotImplementedError

    def publish_if_absent(self, src: str, dst: str) -> None:
        """Atomically claim ``dst`` with the content at ``src``;
        raise FileExistsError when ``dst`` is already taken."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def mkdirs(self, directory: str) -> None:
        raise NotImplementedError

    def new_tmp_path(self, directory: str) -> str:
        """Collision-free scratch path inside ``directory`` for the
        write-then-publish pattern."""
        return os.path.join(
            directory, f".tmp-{os.getpid()}-{time.monotonic_ns()}.json"
        )


class LocalFileIO(FileIO):
    """``os``-level I/O. Accepts bare paths AND ``file://`` URIs
    (stripped on entry) so it can serve as the no-JVM fallback for
    local-scheme roots inside Python workers, where no SparkSession
    exists for :class:`HadoopFileIO`."""

    def list_names(self, directory: str) -> list[str]:
        return os.listdir(strip_local_scheme(directory))

    def read_text(self, path: str) -> str:
        with open(strip_local_scheme(path)) as fh:
            return fh.read()

    def read_bytes(self, path: str) -> bytes:
        with open(strip_local_scheme(path), "rb") as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        with open(strip_local_scheme(path), "w") as fh:
            fh.write(text)

    def write_bytes(self, path: str, blob: bytes) -> None:
        with open(strip_local_scheme(path), "wb") as fh:
            fh.write(blob)

    def publish_if_absent(self, src: str, dst: str) -> None:
        # hard-link CAS: link(2) fails with EEXIST when dst exists —
        # atomic on every POSIX filesystem, and the published file is
        # complete by construction (src was fully written first)
        os.link(strip_local_scheme(src), strip_local_scheme(dst))

    def delete(self, path: str) -> None:
        os.unlink(strip_local_scheme(path))

    def exists(self, path: str) -> bool:
        return os.path.exists(strip_local_scheme(path))

    def mkdirs(self, directory: str) -> None:
        os.makedirs(strip_local_scheme(directory), exist_ok=True)


class HadoopFileIO(FileIO):
    """JVM ``org.apache.hadoop.fs.FileSystem`` bridge.

    Driver-side only (metadata files are KB-sized JSON — never a
    data-plane concern), resolved per-path so one instance serves
    mixed schemes. Requires an active SparkSession for the py4j
    gateway; raises a clear error otherwise.
    """

    def __init__(self, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "HadoopFileIO needs an active SparkSession for the "
                "JVM FileSystem gateway — create the session first "
                "or pass one explicitly"
            )
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(self._conf), jpath

    def list_names(self, directory: str) -> list[str]:
        fs, jpath = self._fs_path(directory)
        if not fs.exists(jpath):
            raise FileNotFoundError(directory)
        return [st.getPath().getName() for st in fs.listStatus(jpath)]

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def read_bytes(self, path: str) -> bytes:
        fs, jpath = self._fs_path(path)
        if not fs.exists(jpath):
            raise FileNotFoundError(path)
        stream = fs.open(jpath)
        try:
            util = self._jvm.org.apache.commons.io.IOUtils
            return bytes(util.toByteArray(stream))
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        self.write_bytes(path, text.encode("utf-8"))

    def write_bytes(self, path: str, blob: bytes) -> None:
        fs, jpath = self._fs_path(path)
        out = fs.create(jpath, True)
        try:
            out.write(bytearray(blob))
        finally:
            out.close()

    def publish_if_absent(self, src: str, dst: str) -> None:
        if path_scheme(dst) in ("", "file"):
            # RawLocalFileSystem.rename maps to POSIX rename(2),
            # which OVERWRITES an existing destination — not a CAS.
            # For local schemes the kernel gives a real one: link(2)
            # fails with EEXIST. Remote schemes below keep the
            # Hadoop primitives (HDFS rejects rename-onto-existing
            # atomically server-side).
            os.link(strip_local_scheme(src), strip_local_scheme(dst))
            return
        fs, jdst = self._fs_path(dst)
        _, jsrc = self._fs_path(src)
        # rename-no-overwrite: HDFS enforces destination-must-not-
        # exist atomically server-side; the exists() pre-check is a
        # fast path only. The src file is already fully written, so
        # the winner's publish is all-or-nothing.
        if fs.exists(jdst):
            raise FileExistsError(dst)
        if not fs.rename(jsrc, jdst):
            # rename() returning false is ambiguous: destination
            # already present (a genuine version race, retryable) OR
            # a permanent storage problem (missing parent, missing
            # src, object-store quirk). Only the former may surface
            # as FileExistsError — write_version converts that to
            # CommitConflict and retries; masking a permanent error
            # as a race would spin the committer (ADVICE r12).
            if fs.exists(jdst):
                raise FileExistsError(dst)
            raise IOError(
                f"rename {src} -> {dst} failed but destination does "
                f"not exist (src exists: {bool(fs.exists(jsrc))})"
            )

    def delete(self, path: str) -> None:
        fs, jpath = self._fs_path(path)
        fs.delete(jpath, False)

    def exists(self, path: str) -> bool:
        fs, jpath = self._fs_path(path)
        return bool(fs.exists(jpath))

    def mkdirs(self, directory: str) -> None:
        fs, jpath = self._fs_path(directory)
        fs.mkdirs(jpath)


def io_for(path: str) -> FileIO:
    """FileIO implementation for ``path``'s scheme: bare paths →
    :class:`LocalFileIO`; any URI scheme → :class:`HadoopFileIO`
    (``file://`` included, so the JVM path is test-exercised
    locally). A ``file://`` path WITHOUT an active SparkSession —
    e.g. a lakestream partition reading table metadata inside a
    Python worker — falls back to :class:`LocalFileIO`, which strips
    the scheme itself; local means local on every host that can see
    the path."""
    scheme = path_scheme(path)
    if scheme == "":
        return LocalFileIO()
    if scheme == "file":
        from pyspark.sql import SparkSession

        if SparkSession.getActiveSession() is None:
            return LocalFileIO()
    return HadoopFileIO()
