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
- ``GenerationFSMetaBackend`` (r10): a CONCRETE conditional-PUT-only
  backend — dense generation files claimed atomically with
  ``os.link`` — that runs the apply/announce/maintenance suites and
  the concurrency hammers with ``lock()`` a no-op, proving the
  lock-free deployment story end-to-end, not just at the fake's
  update_meta grain;
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
  On a backend that cannot lock (``supports_locks`` False) those two
  call sites raise ``QuiesceRequiredError`` — machine-checked, r10 —
  instead of silently racing; every other path is put_if-exact:
  pure meta mutations route through ``update_meta``, the data-publish
  commit and the announce legs carry their read tokens into ``put_if``
  and replan on ``ConcurrentWriteError``.

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


class QuiesceRequiredError(RuntimeError):
    """The operation is a COMPOUND critical section that must hold
    exclusivity across non-meta work (a restore leg's
    create+stamp+verify, announce_schema's terminal locked rewrite),
    and the catalog's backend cannot lock (``supports_locks`` False —
    conditional-PUT-only object stores). Refusing loudly is the
    contract: running it anyway would silently race concurrent
    writers. Quiesce the table's writers operationally and re-run, or
    point the operation at a lock-capable catalog."""


class MetaBackend:
    """Abstract meta-pointer store; see module docstring for the
    contract each method must honor.

    ``supports_locks``: True when ``lock()`` is a REAL mutual-exclusion
    serializer (the flock backend). Conditional-PUT-only backends set
    it False and implement ``lock()`` as a no-op yield — pure meta
    mutations then ride ``update_meta``'s optimistic put_if loop, the
    data-publish commit rides ``put_if`` directly, and the two
    compound critical sections that genuinely need held exclusivity
    (restore leg, terminal locked rewrite) raise
    ``QuiesceRequiredError`` instead of silently racing."""

    supports_locks = True

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
        # The stat-compare-swap is exact only while the per-table lock
        # is held, so take it HERE (r10, closing the r9 watch item:
        # nothing machine-checked that no future caller used bare
        # put_if expecting atomicity). The lock is reentrant per
        # (thread, table), so update_meta's outer hold costs one depth
        # bump. An object-store backend implements this leg with a
        # true conditional PUT instead and needs no lock.
        with self.lock(table_id):
            path = self._meta_path(table_id)
            try:
                st = os.stat(path)
                token = (st.st_ino, st.st_mtime_ns)
            except FileNotFoundError:
                token = None
            if token != expected_token:
                raise ConcurrentWriteError(
                    f"{table_id}: meta changed since read (token "
                    f"{expected_token!r} -> {token!r})"
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


class GenerationFSMetaBackend(MetaBackend):
    """Conditional-PUT-ONLY backend — the second concrete proof of the
    lock-free contract (r10, VERDICT r9 directive #3): ``lock()`` is a
    no-op yield (``supports_locks`` False), exactly like S3/GCS, and
    every swap is a true atomic conditional PUT emulated with the one
    primitive POSIX gives for atomic claim-by-name: ``os.link``.

    Layout: ``root/<table>/_meta.g%012d.json`` generation files; the
    CURRENT meta is the highest generation and the generation number
    IS the token (the local stand-in for an ETag / GCS generation).
    Generations are DENSE by construction — every successful ``put_if``
    creates exactly ``expected + 1`` — so "expected is stale" and
    "expected + 1 already exists" are the same event, and the
    exclusive link claim decides every race atomically in the
    filesystem, with no read-check-swap window at all.

    Torn-write safety: content is written to a tmp file and fsync'd
    BEFORE the link claims the generation name, so a reader can never
    observe a half-written CURRENT generation (the same
    content-before-pointer discipline as ``LocalFSMetaBackend.put``).

    Superseded generations are retired opportunistically by
    TRUNCATING them to zero bytes — the claim NAME is kept forever, so
    ``os.link`` collides for every generation that was EVER published
    and a deeply-stale writer (token older than the retired tail, e.g.
    a delayed create-leg holding ``None`` against a table that has
    advanced past the tail) can never false-succeed into an invisible
    lost update (r10 hardening; the unlink-based retirement had
    exactly that hole). The zero-byte markers are the local stand-in
    for a versioned bucket's tombstones: one dirent per update, listed
    in O(updates) — fine at meta-update rates; a real object-store
    backend has true ETags and needs none of this. ``remove`` is NOT
    race-safe against concurrent writers (neither is an object-store
    DELETE) — ``drop_table`` is already documented as a quiesce-class
    operation, and it discards the marker history with the table.
    """

    supports_locks = False

    _FMT = "_meta.g%012d.json"
    _KEEP_GENERATIONS = 4

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- helpers ------------------------------------------------------
    def _tdir(self, table_id: str) -> str:
        return os.path.join(self.root, table_id)

    def _gens(self, table_id: str) -> list[int]:
        try:
            names = os.listdir(self._tdir(table_id))
        except (FileNotFoundError, NotADirectoryError):
            # a missing table dir or a stray regular file at the root
            # (a torn tmp) is "no generations", not a crash
            return []
        out = []
        for n in names:
            if n.startswith("_meta.g") and n.endswith(".json"):
                try:
                    out.append(int(n[len("_meta.g"):-len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def _gen_path(self, table_id: str, gen: int) -> str:
        return os.path.join(self._tdir(table_id), self._FMT % gen)

    # -- contract -----------------------------------------------------
    def get(self, table_id: str) -> tuple[dict | None, object]:
        # The highest generation is never retired at publish time
        # (retirement keeps the last _KEEP_GENERATIONS), so reading it
        # races retirement only when >= _KEEP_GENERATIONS publishes
        # land between our listdir and our open. Retry through that
        # window — the re-list always finds a newer live maximum.
        for _ in range(8):
            gens = self._gens(table_id)
            if not gens:
                return None, None
            gen = gens[-1]
            try:
                with open(self._gen_path(table_id, gen)) as f:
                    text = f.read()
                if not text:  # truncated marker: a newer gen exists
                    continue
                return json.loads(text), gen
            except (FileNotFoundError, ValueError):
                continue
        raise ConcurrentWriteError(
            f"{table_id}: could not read a stable current generation "
            "(concurrent publishes outran 8 read retries)"
        )

    def put_if(self, table_id: str, meta: dict, expected_token: object) -> None:
        tdir = self._tdir(table_id)
        os.makedirs(tdir, exist_ok=True)
        target = int(expected_token or 0) + 1
        # Fast-path staleness check with a precise message; the link
        # below remains the atomic decider (markers are kept for every
        # generation ever published, so a retired target still
        # collides — this precheck is never load-bearing).
        gens = self._gens(table_id)
        if (gens[-1] if gens else 0) != target - 1:
            raise ConcurrentWriteError(
                f"{table_id}: token {expected_token!r} is stale (current "
                f"generation is {gens[-1] if gens else None})"
            )
        fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".gen.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(meta, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                # THE conditional PUT: link() claims the generation
                # name atomically; exactly one writer per generation
                # wins, content already durable before the claim
                os.link(tmp, self._gen_path(table_id, target))
            except FileExistsError:
                raise ConcurrentWriteError(
                    f"{table_id}: generation {expected_token!r} is stale "
                    f"(generation {target} already published)"
                )
        finally:
            os.unlink(tmp)
        dfd = os.open(tdir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        # retire the deep tail — TRUNCATE, never unlink: the kept name
        # is the claim marker that makes a deeply-stale writer's link
        # collide instead of false-succeeding (see class docstring)
        for g in self._gens(table_id)[: -self._KEEP_GENERATIONS]:
            p = self._gen_path(table_id, g)
            try:
                if os.path.getsize(p):
                    os.truncate(p, 0)
            except (FileNotFoundError, OSError):
                pass

    def put(self, table_id: str, meta: dict) -> None:
        # blind PUT = optimistic conditional PUT against whatever is
        # current, retried (the caller accepts last-writer-wins)
        while True:
            _, tok = self.get(table_id)
            try:
                self.put_if(table_id, meta, tok)
                return
            except ConcurrentWriteError:
                continue

    def remove(self, table_id: str) -> None:
        for g in self._gens(table_id):
            try:
                os.unlink(self._gen_path(table_id, g))
            except FileNotFoundError:
                pass

    def list_tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(d for d in os.listdir(self.root) if self._gens(d))

    @contextmanager
    def lock(self, table_id: str):
        # no lock exists on this backend — callers that genuinely need
        # held exclusivity must check supports_locks and refuse
        # (QuiesceRequiredError); pure meta mutations ride update_meta
        yield
