"""Catalog meta-pointer backends (r9, VERDICT r8 directive #6).

``TableCatalog``'s one piece of mutable shared state is the per-table
``_meta.json`` pointer — everything else (parquet data dirs) is
immutable once published. This module extracts the pointer's
read-check-swap into a small backend contract so the same catalog
logic can run against:

- a local filesystem (``LocalFSMetaBackend``): atomic ``os.replace``
  publishes + an ``fcntl.flock`` advisory lock serializing same-host
  writers (the r8 meta lock, moved here verbatim);
- an object store (future S3/GCS backend): conditional PUT
  (``If-Match`` / generation preconditions) makes ``put_if`` truly
  atomic WITHOUT any lock — pure read-modify-put callers go through
  ``TableCatalog.update_meta``'s optimistic retry loop, which needs
  only ``get``/``put_if``;
- the injected-race fake in ``tests/test_metastore.py``, which proves
  the ``update_meta`` contract holds with NO lock at all (lock() is a
  no-op there and every interleaving is driven through ``put_if``).

Contract notes:

- ``get`` returns ``(meta | None, token)``; the token identifies the
  exact state read (file identity locally, ETag/generation remotely).
- ``put_if`` swaps iff the store still holds ``expected_token``,
  raising ``ConcurrentWriteError`` otherwise. ``put`` is the
  unconditional variant for callers already inside ``lock``.
- ``lock`` is the advisory serializer for COMPOUND critical sections
  that hold exclusivity across non-meta work (a restore leg's
  create+stamp+verify, announce_schema's terminal locked rewrite).
  A conditional-PUT backend that cannot lock must document those two
  call sites as requiring operational quiesce — every pure meta
  mutation already routes through ``update_meta`` and needs no lock.

Reference parity: the reference delegates this problem to the target
store's admin API (Kudu master / HBase meta, ``CDCTableUtil.java:49-64``);
a filesystem/object-store catalog needs the explicit contract above.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from contextlib import contextmanager

try:  # POSIX only; the fallback degrades to best-effort CAS
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX
    fcntl = None

_META = "_meta.json"


class ConcurrentWriteError(RuntimeError):
    """Another writer published after this write's state was read:
    committing would silently drop that writer's change (the mutation
    was computed from a stale snapshot). Safe to retry — nothing was
    published (data files without a meta pointer are invisible)."""


class MetaBackend:
    """Abstract meta-pointer store; see module docstring for the
    contract each method must honor."""

    def get(self, table_id: str) -> tuple[dict | None, object]:
        raise NotImplementedError

    def put(self, table_id: str, meta: dict) -> None:
        raise NotImplementedError

    def put_if(self, table_id: str, meta: dict, expected_token: object) -> None:
        raise NotImplementedError

    def remove(self, table_id: str) -> None:
        raise NotImplementedError

    def list_tables(self) -> list[str]:
        raise NotImplementedError

    @contextmanager
    def lock(self, table_id: str):
        raise NotImplementedError
        yield  # pragma: no cover


class LocalFSMetaBackend(MetaBackend):
    """Filesystem backend: ``root/<table>/_meta.json`` pointer files
    with crash-durable publishes (content fsync BEFORE the atomic
    rename, then a parent-dir fsync so the entry swap itself is
    durable), plus the per-table advisory flock at
    ``root/.locks/<table>.lock`` — OUTSIDE the table dir and never
    unlinked (r9: an in-dir lock file was rmtree'd by drop_table under
    blocked waiters, orphaning the held inode and re-opening the CAS
    window across a drop/recreate cycle). Reentrant per
    (thread, table); the kernel releases flocks when a holder dies."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._locks_dir = os.path.join(root, ".locks")
        os.makedirs(self._locks_dir, exist_ok=True)
        self._lock_state = threading.local()

    # -- paths -------------------------------------------------------
    def _meta_path(self, table_id: str) -> str:
        return os.path.join(self.root, table_id, _META)

    # -- contract ----------------------------------------------------
    def get(self, table_id: str) -> tuple[dict | None, object]:
        path = self._meta_path(table_id)
        try:
            with open(path) as f:
                st = os.fstat(f.fileno())
                # the token is the FILE IDENTITY of the state read:
                # every put os.replace's a fresh inode, so (ino, mtime)
                # changes on every publish — the local ETag
                return json.load(f), (st.st_ino, st.st_mtime_ns)
        except FileNotFoundError:
            return None, None

    def put(self, table_id: str, meta: dict) -> None:
        tdir = os.path.join(self.root, table_id)
        os.makedirs(tdir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".meta.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
            # fsync BEFORE the atomic rename: os.replace alone is
            # atomic against concurrent readers but not against power
            # loss — an unsynced rename can publish a truncated
            # pointer file, bricking the table.
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._meta_path(table_id))
        # The rename itself must also be durable: the directory entry
        # swap lives in the parent dir's metadata — without a dir
        # fsync a power loss can roll the pointer back to the previous
        # meta (stale-but-consistent, which the crash matrix allows)
        # or, on some filesystems, lose a first-ever meta.
        dfd = os.open(tdir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def put_if(self, table_id: str, meta: dict, expected_token: object) -> None:
        # Best-effort without the lock (stat-compare-swap); exact
        # under lock() — which is how update_meta always calls it
        # here. An object-store backend implements this leg with a
        # true conditional PUT instead.
        path = self._meta_path(table_id)
        try:
            st = os.stat(path)
            token = (st.st_ino, st.st_mtime_ns)
        except FileNotFoundError:
            token = None
        if token != expected_token:
            raise ConcurrentWriteError(
                f"{table_id}: meta changed since read (token {expected_token!r}"
                f" -> {token!r})"
            )
        self.put(table_id, meta)

    def remove(self, table_id: str) -> None:
        path = self._meta_path(table_id)
        if os.path.exists(path):
            os.remove(path)

    def list_tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.exists(self._meta_path(d))
        )

    @contextmanager
    def lock(self, table_id: str):
        held = getattr(self._lock_state, "held", None)
        if held is None:
            held = self._lock_state.held = {}
        if table_id in held:
            fd, depth = held[table_id]
            held[table_id] = (fd, depth + 1)
            try:
                yield
            finally:
                fd, depth = held[table_id]
                held[table_id] = (fd, depth - 1)
            return
        if fcntl is None:  # pragma: no cover - non-POSIX fallback
            yield
            return
        os.makedirs(self._locks_dir, exist_ok=True)
        fd = os.open(
            os.path.join(self._locks_dir, f"{table_id}.lock"),
            os.O_CREAT | os.O_RDWR,
            0o644,
        )
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            held[table_id] = (fd, 1)
            try:
                yield
            finally:
                held.pop(table_id, None)
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)
