"""Namespace catalog over LakeTable paths (SURVEY §2 K5).

The reference routes each datatype to a named output table in a dataset
namespace (table naming / dataset routing,
/root/reference/etl/globals.go:205-259 — datatype → <project>.<dataset>.
<table>); this module is the lake-directory analog: a catalog rooted at
one directory maps ``namespace.table`` identifiers to LakeTable paths,
with the namespace list persisted in a single JSON file so discovery
(`list_tables`) never scans data directories.

Layout::

    <root>/catalog.json                      {"ns": {"table": {...props}}}
    <root>/<ns>/<table>/                     LakeTable root

The catalog file is tiny driver-side metadata (same durability model as
the per-table manifest: atomic tmp+rename swap). Data-plane reads/writes
go straight to the LakeTable — the catalog adds zero per-batch overhead.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import types as T

from etl_spark.lake.table import LakeTable, _atomic_write

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class TableNotFoundError(KeyError):
    pass


class LakeCatalog:
    """Directory-rooted namespace catalog of LakeTables."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _cat_path(self) -> str:
        return os.path.join(self.root, "catalog.json")

    def _load(self) -> dict:
        try:
            with open(self._cat_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _save(self, cat: dict) -> None:
        _atomic_write(self._cat_path, json.dumps(cat, indent=1, sort_keys=True))

    @staticmethod
    def _split(ident: str) -> tuple[str, str]:
        parts = ident.split(".")
        if len(parts) != 2 or not all(_IDENT.match(p) for p in parts):
            raise ValueError(
                f"table identifier must be 'namespace.table' (identifiers "
                f"[A-Za-z0-9_], not starting with a digit): {ident!r}"
            )
        return parts[0], parts[1]

    def table_path(self, ident: str) -> str:
        ns, name = self._split(ident)
        return os.path.join(self.root, ns, name)

    # --- namespaces ---------------------------------------------------
    def create_namespace(self, ns: str) -> None:
        if not _IDENT.match(ns):
            raise ValueError(f"bad namespace: {ns!r}")
        cat = self._load()
        cat.setdefault(ns, {})
        self._save(cat)

    def list_namespaces(self) -> list[str]:
        return sorted(self._load())

    # --- tables -------------------------------------------------------
    def create_table(
        self, ident: str, schema: T.StructType, n_buckets: int = 16
    ) -> LakeTable:
        ns, name = self._split(ident)
        cat = self._load()
        if name in cat.get(ns, {}):
            raise FileExistsError(f"table exists: {ident}")
        table = LakeTable.create(self.table_path(ident), schema, n_buckets=n_buckets)
        cat.setdefault(ns, {})[name] = {"n_buckets": n_buckets}
        self._save(cat)
        return table

    def load_table(self, ident: str) -> LakeTable:
        ns, name = self._split(ident)
        if name not in self._load().get(ns, {}):
            raise TableNotFoundError(ident)
        return LakeTable(self.table_path(ident))

    def create_if_not_exists(
        self, ident: str, schema: T.StructType, n_buckets: int = 16
    ) -> LakeTable:
        try:
            return self.load_table(ident)
        except TableNotFoundError:
            return self.create_table(ident, schema, n_buckets=n_buckets)

    def list_tables(self, ns: str | None = None) -> list[str]:
        cat = self._load()
        spaces = [ns] if ns is not None else sorted(cat)
        return [f"{s}.{t}" for s in spaces for t in sorted(cat.get(s, {}))]

    def snapshot(self, ns: str | None = None) -> dict[str, int]:
        """Consistent multi-table read point: the current committed
        version of every table (one namespace or all). Because each
        table's commit is an atomic pointer swap and versions are
        monotonic, pinning {table: version} AND READING THROUGH IT later
        yields the same cross-table state regardless of concurrent
        writers — the poor-man's multi-table transaction ISOLATION level
        (writers still commit per-table; this gives readers a stable
        joint view, the part downstream joins actually need). Caveat: the
        pin loop itself is not atomic ACROSS tables — a writer committing
        mid-loop can land table A's pin before its commit and table B's
        after; pin during a quiesced window (or re-pin until two
        consecutive snapshots agree) when strict cross-table atomicity
        matters."""
        return {
            ident: self.load_table(ident).current_version()
            for ident in self.list_tables(ns)
        }

    def read_at(self, spark, ident: str, snapshot: dict[str, int]):
        """Time-travel read of one table under a pinned catalog snapshot."""
        if ident not in snapshot:
            raise TableNotFoundError(f"{ident} not in snapshot")
        return self.load_table(ident).read(spark, version=snapshot[ident])

    # --- multi-table transactions (lake/txn.py) ------------------------
    @property
    def _pins_path(self) -> str:
        return os.path.join(self.root, "pins.json")

    def pins(self) -> dict[str, int]:
        """Transactionally-committed version per pin-governed table —
        the catalog's single atomic visibility root (see lake/txn.py)."""
        try:
            with open(self._pins_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _swap_pins(
        self, updates: dict[str, int], remove: list[str] | None = None
    ) -> None:
        """ONE atomic write moving every updated pin together — the
        cross-table commit point of a transaction. The read-modify-write
        is flock-guarded: two transactions over DISJOINT table sets may
        commit concurrently (per-table single-writer covers overlapping
        sets), and without the lock the second writer would clobber the
        first's pins. On an object store the equivalent is a conditional
        put (ETag/if-match) on pins.json."""
        import fcntl

        lock_path = os.path.join(self.root, "pins.lock")
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                pins = self.pins()
                pins.update(updates)
                for ident in remove or []:
                    # un-pin (txn rollback of a base pin the commit added):
                    # the table reverts to the 'never written through a
                    # transaction -> current head' visibility contract
                    pins.pop(ident, None)
                _atomic_write(self._pins_path, json.dumps(pins, sort_keys=True))
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def begin(self):
        """Start a multi-table transaction (see lake/txn.py)."""
        from etl_spark.lake.txn import CatalogTransaction

        return CatalogTransaction(self)

    def recover_txns(self) -> dict[str, str]:
        """Heal crash-interrupted transactions; call at startup."""
        from etl_spark.lake.txn import recover_txns

        return recover_txns(self)

    def read_committed(self, spark, ident: str):
        """Read a table at its transactionally-committed pin (tables
        never written through a transaction read their current head).
        This is the read path that sees multi-table commits atomically."""
        v = self.pins().get(ident)
        return self.load_table(ident).read(spark, version=v)

    def committed_snapshot(self, ns: str | None = None) -> dict[str, int]:
        """Like :meth:`snapshot`, but pin-governed tables resolve to
        their transactional pin — a cross-table-ATOMIC read point for
        every table that participates in transactions."""
        pins = self.pins()
        return {
            ident: pins.get(ident, self.load_table(ident).current_version())
            for ident in self.list_tables(ns)
        }

    def drop_table(self, ident: str, purge: bool = False) -> None:
        """Unregister; ``purge=True`` also deletes the table directory."""
        ns, name = self._split(ident)
        cat = self._load()
        if name not in cat.get(ns, {}):
            raise TableNotFoundError(ident)
        del cat[ns][name]
        self._save(cat)
        if purge:
            import shutil

            shutil.rmtree(self.table_path(ident), ignore_errors=True)
