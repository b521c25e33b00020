"""CommitBackend — the storage seam of the table format's commit protocol.

The whole optimistic-concurrency design of :mod:`data_sync_spark.lake.table`
rests on exactly TWO storage primitives beyond plain reads:

1. **conditional put** of an immutable manifest object keyed by version
   (two writers claiming the same version: exactly one wins, the loser gets
   :class:`~data_sync_spark.lake.table.CommitConflict`), and
2. **atomic pointer swap** of ``LATEST`` to a committed version (readers
   see the old or the new snapshot, never a torn state).

On POSIX those are ``O_CREAT|O_EXCL`` and ``os.replace``
(:class:`LocalFSBackend`). On an object store they are a conditional PUT
(S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``) plus a catalog or
CAS pointer — which is precisely the contract an Iceberg catalog provides.
:class:`InMemoryBackend` is the conditional-put fake proving the protocol
depends on nothing POSIX-specific: ``tests/test_concurrent.py`` runs the
concurrent-writer scenarios against both.

Data files (parquet) are NOT behind this seam — they are immutable,
uniquely named, and invisible until a manifest references them, so plain
eventually-visible object writes suffice for them on any store.
"""

from __future__ import annotations

import json
import os
import threading
import uuid

_MANIFEST_DIR = "_manifests"
_LATEST = "LATEST"


class BackendCommitConflict(RuntimeError):
    """A manifest object for this version already exists (another writer
    won the conditional put). Translated to ``CommitConflict`` by the
    table layer."""


class LocalFSBackend:
    """POSIX implementation: O_EXCL conditional create + os.replace swap."""

    def _mdir(self, table_path: str) -> str:
        return os.path.join(table_path, _MANIFEST_DIR)

    def _mpath(self, table_path: str, version: int) -> str:
        return os.path.join(self._mdir(table_path), f"v{version:08d}.json")

    def init_table(self, table_path: str) -> None:
        os.makedirs(self._mdir(table_path), exist_ok=True)
        if os.path.exists(os.path.join(self._mdir(table_path), _LATEST)):
            raise FileExistsError(f"table already exists at {table_path}")

    def exists(self, table_path: str) -> bool:
        return os.path.exists(os.path.join(table_path, _MANIFEST_DIR, _LATEST))

    def read_pointer(self, table_path: str) -> int:
        with open(os.path.join(self._mdir(table_path), _LATEST)) as f:
            return int(f.read().strip())

    def read_manifest(self, table_path: str, version: int) -> dict | None:
        try:
            with open(self._mpath(table_path, version)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None  # expired or never committed

    def put_manifest_exclusive(
        self, table_path: str, version: int, manifest: dict
    ) -> None:
        try:
            fd = os.open(
                self._mpath(table_path, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError as e:
            raise BackendCommitConflict(
                f"version {version} already committed"
            ) from e
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())

    def swap_pointer(self, table_path: str, version: int) -> None:
        tmp = os.path.join(self._mdir(table_path), f".latest.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self._mdir(table_path), _LATEST))

    def list_versions(self, table_path: str) -> list[int]:
        out = []
        try:
            entries = os.listdir(self._mdir(table_path))
        except FileNotFoundError:
            return []
        for entry in entries:
            if entry.startswith("v") and entry.endswith(".json"):
                out.append(int(entry[1:].split(".")[0]))
        return sorted(out)

    def delete_manifest(self, table_path: str, version: int) -> None:
        try:
            os.unlink(self._mpath(table_path, version))
        except FileNotFoundError:
            pass  # concurrent expire


class InMemoryBackend:
    """Conditional-put fake of an object-store catalog: manifests live in a
    process-wide dict guarded by one lock; ``put_manifest_exclusive`` is an
    atomic insert-if-absent (S3 ``If-None-Match: *`` semantics) and
    ``swap_pointer`` an atomic assignment. Shared across instances so rival
    writers in one process (threads) contend on the same 'store'."""

    _stores: dict[str, dict] = {}
    _lock = threading.Lock()

    def _store(self, table_path: str) -> dict:
        with self._lock:
            return self._stores.setdefault(
                os.path.abspath(table_path), {"manifests": {}, "pointer": None}
            )

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._stores.clear()

    def init_table(self, table_path: str) -> None:
        s = self._store(table_path)
        with self._lock:
            if s["pointer"] is not None:
                raise FileExistsError(f"table already exists at {table_path}")

    def exists(self, table_path: str) -> bool:
        return self._store(table_path)["pointer"] is not None

    def read_pointer(self, table_path: str) -> int:
        p = self._store(table_path)["pointer"]
        if p is None:
            raise FileNotFoundError(f"no LATEST pointer for {table_path}")
        return p

    def read_manifest(self, table_path: str, version: int) -> dict | None:
        m = self._store(table_path)["manifests"].get(version)
        return None if m is None else json.loads(m)

    def put_manifest_exclusive(
        self, table_path: str, version: int, manifest: dict
    ) -> None:
        s = self._store(table_path)
        with self._lock:
            if version in s["manifests"]:
                raise BackendCommitConflict(f"version {version} already committed")
            s["manifests"][version] = json.dumps(manifest)

    def swap_pointer(self, table_path: str, version: int) -> None:
        s = self._store(table_path)
        with self._lock:
            s["pointer"] = version

    def list_versions(self, table_path: str) -> list[int]:
        with self._lock:
            return sorted(self._store(table_path)["manifests"])

    def delete_manifest(self, table_path: str, version: int) -> None:
        s = self._store(table_path)
        with self._lock:
            s["manifests"].pop(version, None)
