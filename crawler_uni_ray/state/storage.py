"""Checkpoint / side-write storage seam (durability backend).

The crawl engine's level-commit protocol (pipelines/crawl.py) needs exactly
four durable primitives; everything else composes them:

1. ``write_part(dir, name, table)`` — durably publish ONE parquet part
   under a caller-chosen deterministic name.  Atomic (a reader never sees
   a torn file) and idempotent (a retried task re-publishes the same bytes
   under the same name).  Used by the in-stream side-writes: results
   blocks, deferred schedule partials, next-frontier host counts.
2. ``begin_dir(final)`` / ``commit_dir(final)`` — stage a whole artifact
   directory (a ``Dataset.write_parquet`` whose part names are NOT
   deterministic) and atomically publish it.  A crashed writer leaves only
   invisible staging litter, never a half-committed artifact.
3. ``list_parts(final)`` — enumerate a COMMITTED artifact's parquet parts
   (readers resolve through the commit record, so staged/orphaned files
   are invisible).  ``list_files(dir, pattern)`` is the weaker
   prefix-listing for side-write dirs whose durability is per-part.
4. ``write_json(path, obj)`` — atomically publish a small commit record
   (the level ``manifest.json``).

Two implementations of the seam:

* :class:`PosixStorage` (default) — assumes ONE filesystem shared by the
  driver and every worker (single node, or NFS-like on a multi-node
  cluster).  Commit is ``os.rename`` — atomic on POSIX — and listing is a
  directory glob.
* :class:`ManifestStorage` — the object-store protocol: S3-style stores
  have atomic single-object PUT but NO atomic directory rename, so each
  staging attempt writes under a unique ``_attempt-*`` prefix and commit
  is the atomic publication of a tiny ``_MANIFEST.json`` naming the
  winning attempt and its files.  Readers resolve through the manifest;
  parts from failed/duplicate attempts are unreachable (GC'able litter,
  never wrong data).  Per-file publication here still emulates atomic PUT
  with tmp→``os.rename`` because the sandbox only has a local disk — a
  real S3/GCS backend would subclass and replace ``_put_bytes`` /
  ``write_part`` / ``list_files`` with PUT + LIST calls; the crawl
  engine's protocol above this seam is already rename-free.

Select with ``CrawlConfig(storage="posix" | "manifest")``.  Both backends
run the full conformance + resume + side-write suites
(tests/test_storage_backends.py).
"""

from __future__ import annotations

import fnmatch
import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


class PosixStorage:
    """Shared-POSIX-filesystem backend: rename is the commit primitive."""

    # ---------------------------------------------------------- side parts
    def prepare_side_dir(self, d: str) -> None:
        """Driver-side: start a side-write dir from empty."""
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    def write_part(
        self, d: str, name: str, tbl: pa.Table, compression: str = "zstd"
    ) -> None:
        """Atomic + idempotent single-part publish (distributed tasks).

        Deterministic ``name`` is the caller's contract: a Ray task retry
        re-publishes identical bytes under the same name, so replays are
        invisible (tests/test_sidewrites.py)."""
        final = os.path.join(d, name)
        if os.path.exists(final):  # an earlier attempt already published it
            return
        tmp = f"{final}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        pq.write_table(tbl, tmp, compression=compression)
        os.rename(tmp, final)  # POSIX atomic publish (≈ object-store PUT)

    def list_files(self, d: str, pattern: str = "*.parquet") -> list[str]:
        """Prefix listing of per-part-durable side-write dirs.  Valid on
        UNcommitted dirs: each listed file is individually complete."""
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if fnmatch.fnmatch(f, pattern) and not f.endswith(".tmp")
        ]

    # ------------------------------------------------------ staged commits
    def begin_dir(self, final: str) -> str:
        """Start a fresh staging area for ``final``; returns the dir that
        the (driver- or task-side) writer should write parts into."""
        staged = final + ".tmp"
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(staged, exist_ok=True)
        return staged

    def commit_dir(self, final: str, staged: str) -> None:
        """Atomically publish the staged artifact as ``final``."""
        os.rename(staged, final)

    def remove_dir(self, final: str) -> None:
        shutil.rmtree(final, ignore_errors=True)

    # -------------------------------------------------------------- reads
    def list_parts(self, final: str) -> list[str]:
        """Parquet parts of a COMMITTED artifact dir (empty if absent)."""
        return self.list_files(final, "*.parquet")

    def count_rows(self, final: str) -> int:
        return sum(
            pq.ParquetFile(f).metadata.num_rows for f in self.list_parts(final)
        )

    def read_table(self, final: str, schema: pa.Schema, columns=None) -> pa.Table:
        files = self.list_parts(final)
        if not files:
            t = schema.empty_table()
            return t.select(columns) if columns else t
        return pa.concat_tables(pq.read_table(f, columns=columns) for f in files)

    # ----------------------------------------------------- commit records
    def write_json(self, path: str, obj) -> None:
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.rename(tmp, path)


class ManifestStorage(PosixStorage):
    """Object-store-protocol backend: write-then-manifest, never a
    directory rename.  See the module docstring for the deployment story;
    part publication and prefix listing are inherited (they map 1:1 onto
    object-store PUT / LIST-by-prefix)."""

    MANIFEST = "_MANIFEST.json"

    def begin_dir(self, final: str) -> str:
        # no clearing: concurrent/failed attempts coexist as unreachable
        # prefixes; only the manifest decides what a reader sees
        staged = os.path.join(final, f"_attempt-{uuid.uuid4().hex[:12]}")
        os.makedirs(staged, exist_ok=True)
        return staged

    def commit_dir(self, final: str, staged: str) -> None:
        files = sorted(
            f for f in os.listdir(staged) if f.endswith(".parquet")
        )
        self.write_json(
            os.path.join(final, self.MANIFEST),
            {"attempt": os.path.basename(staged), "files": files},
        )

    def list_parts(self, final: str) -> list[str]:
        mpath = os.path.join(final, self.MANIFEST)
        if os.path.isfile(mpath):
            with open(mpath) as f:
                m = json.load(f)
            att = os.path.join(final, m["attempt"])
            return [os.path.join(att, name) for name in m["files"]]
        # no manifest → a flat per-part-durable dir (side-writes); attempt
        # subdirs of UNcommitted staged artifacts are invisible to this
        return self.list_files(final, "*.parquet")


def make_storage(kind: str) -> PosixStorage:
    if kind == "posix":
        return PosixStorage()
    if kind == "manifest":
        return ManifestStorage()
    raise ValueError(f"unknown storage backend {kind!r} (posix|manifest)")
