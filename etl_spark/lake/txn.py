"""Multi-table transactions over a LakeCatalog.

The reference pipeline writes each datatype to its own warehouse table
and relies on the downstream joiner to reconcile them; a standalone
lake needs the thing that actually makes "ingest the same archive
batch into N tables" safe — an all-or-nothing publish across tables.

No filesystem gives an atomic swap of N independent pointer files, so
this module uses the construction real lakehouses use: make the
CATALOG the root of visibility. Each per-table write stages on a WAP
branch (the proven write-audit-publish machinery of lake/table.py);
commit publishes every branch, then performs ONE atomic write of the
catalog's ``pins.json`` — the cross-table commit point. Readers that
go through :meth:`LakeCatalog.read_committed` (or
``committed_snapshot``) see either none or all of a transaction's
tables move. Readers that bypass the catalog and read a table path
directly get per-table atomicity only — same contract as reading an
Iceberg table's files without its catalog.

Crash story (write-ahead log in ``<root>/_txns/<id>.json``):

* crash while OPEN — branches are garbage; ``recover_txns`` drops
  them (per-table ``expire_snapshots`` collects the staged files).
* crash during COMMIT, before the pins swap — the WAL is in state
  ``committing``; ``recover_txns`` rolls FORWARD: finishes the
  remaining publishes, swaps the pins, marks committed. If a foreign
  writer made a remaining publish impossible (non-fast-forward), it
  rolls BACK instead: already-published tables are ``rollback()``-ed
  to their recorded base (content-exact undo; pins never moved, so
  catalog readers never saw the partial state), branches dropped,
  WAL marked aborted.
* crash after the pins swap — the transaction IS committed;
  ``recover_txns`` just finalizes the WAL.

Single-writer contract per table within a transaction's lifetime, the
same assumption every optimistic lakehouse commit makes — a foreign
commit to a member table aborts the transaction (tested), it never
corrupts it. Because branch snapshots share the table's version space,
that conflict surfaces as a CommitConflictError at STAGE time (whoever
writes the next snapshot second loses); a publish-time non-fast-forward
only arises from an expire/repair moving CURRENT under an open branch,
and triggers the full rollback path below.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from etl_spark.lake.table import CommitConflictError, LakeTable, _atomic_write

__all__ = ["CatalogTransaction", "TxnAbortedError", "TxnStateError"]


class TxnAbortedError(RuntimeError):
    """The transaction could not publish atomically and was rolled back."""


class TxnStateError(RuntimeError):
    """Operation illegal for the transaction's current state."""


class CatalogTransaction:
    """All-or-nothing write across several catalog tables.

    Usage::

        txn = catalog.begin()
        apply_batch(spark, txn.table("raw.events"), batch, "b1")
        apply_batch(spark, txn.table("raw.sessions"), other, "b1")
        txn.commit()          # or txn.abort()

    ``table()`` hands out WAP branch views — every engine write path
    (merge, apply_batch, delete_where, maintenance) works on them
    unchanged and stays invisible until commit.
    """

    def __init__(self, catalog, txn_id: str | None = None):
        self.catalog = catalog
        self.txn_id = txn_id or uuid.uuid4().hex[:12]
        self.state = "open"
        self._tables: dict[str, dict[str, Any]] = {}  # ident -> {base, view}

    # ------------------------------------------------------------- plumbing
    @property
    def _branch(self) -> str:
        return f"txn-{self.txn_id}"

    @property
    def _wal_path(self) -> str:
        d = os.path.join(self.catalog.root, "_txns")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{self.txn_id}.json")

    def _write_wal(
        self,
        state: str,
        staged: dict[str, int] | None = None,
        added_pins: list[str] | None = None,
    ) -> None:
        _atomic_write(
            self._wal_path,
            json.dumps(
                {
                    "txn_id": self.txn_id,
                    "state": state,
                    "branch": self._branch,
                    "added_pins": added_pins or [],
                    "tables": {
                        ident: {
                            "base": rec["base"],
                            "staged": (staged or {}).get(ident),
                        }
                        for ident, rec in self._tables.items()
                    },
                },
                sort_keys=True,
            ),
        )

    def _require(self, state: str) -> None:
        if self.state != state:
            raise TxnStateError(
                f"transaction {self.txn_id} is {self.state}, not {state}"
            )

    # ------------------------------------------------------------------ API
    def table(self, ident: str) -> LakeTable:
        """Branch view of ``ident`` staged under this transaction (created
        at the published head on first access, cached after)."""
        self._require("open")
        if ident not in self._tables:
            published = self.catalog.load_table(ident)
            view = published.create_branch(self._branch)
            self._tables[ident] = {
                "base": published.current_version(),
                "view": view,
            }
            # WAL records the txn as OPEN from the first staged table on:
            # a crash here leaves orphaned txn-* branches (and the staged
            # files their heads reference) that recover_txns can only
            # collect if it knows the transaction existed — commit()'s
            # first WAL write would be too late
            self._write_wal("open")
        return self._tables[ident]["view"]

    def abort(self) -> None:
        self._require("open")
        for ident in self._tables:
            t = self.catalog.load_table(ident)
            try:
                t.drop_branch(self._branch)
            except ValueError:
                pass
        self.state = "aborted"
        if self._tables:
            self._write_wal("aborted")

    def commit(self, _crash_before_pin_swap: bool = False) -> dict[str, int]:
        """Publish every staged branch, then swap the catalog pins in one
        atomic write (the cross-table commit point). Returns
        {ident: published_version}. A non-fast-forward publish (foreign
        commit to a member table) rolls back every already-published
        member to its base and raises :class:`TxnAbortedError`.

        ``_crash_before_pin_swap`` is a failpoint for crash-recovery
        tests: stop after the publishes, before the commit point."""
        self._require("open")
        if not self._tables:
            self.state = "committed"
            return {}
        staged = {
            ident: rec["view"].manifest().version
            for ident, rec in self._tables.items()
        }
        # pin-at-base first: a member table that was never pin-governed
        # would otherwise fall back to its CURRENT head in read_committed,
        # exposing partial state between the publishes and the pin swap
        # (or after a crash in that window). Pinning it at base is a
        # no-op for what readers see right now, and makes the final swap
        # the only visibility change. The WAL records which pins WE
        # added, so both the abort path below and crash recovery can
        # remove them (an aborted txn must not leave never-committed
        # tables pin-governed forever).
        have = self.catalog.pins()
        base_pins = {
            ident: rec["base"]
            for ident, rec in self._tables.items()
            if ident not in have
        }
        self._write_wal("committing", staged, added_pins=sorted(base_pins))
        if base_pins:
            self.catalog._swap_pins(base_pins)
        published: list[str] = []
        for ident, rec in self._tables.items():
            t = self.catalog.load_table(ident)
            try:
                m = t.publish_branch(self._branch)
                staged[ident] = m.version  # no-op branches publish as base
                published.append(ident)
            except (CommitConflictError, ValueError) as e:
                # ValueError: the branch itself is gone (external cleanup)
                # roll back: content-exact undo of our published members;
                # pins never moved, catalog readers never saw partials
                for done in published:
                    self.catalog.load_table(done).rollback(
                        self._tables[done]["base"]
                    )
                for ident2 in self._tables:
                    if ident2 not in published:
                        try:
                            self.catalog.load_table(ident2).drop_branch(self._branch)
                        except ValueError:
                            pass
                if base_pins:
                    # restore the 'never transactionally written -> reads
                    # follow current head' contract for tables this commit
                    # pinned at base and then failed to publish
                    self.catalog._swap_pins({}, remove=sorted(base_pins))
                self.state = "aborted"
                self._write_wal("aborted")
                raise TxnAbortedError(
                    f"transaction {self.txn_id}: publish of {ident} lost to "
                    f"a concurrent commit ({e}); all members rolled back"
                ) from None
        if _crash_before_pin_swap:
            return staged  # WAL left in 'committing' — recover_txns finishes
        self.catalog._swap_pins(staged)  # the commit point
        self.state = "committed"
        self._write_wal("committed", staged)
        return staged


def recover_txns(catalog) -> dict[str, str]:
    """Heal transactions interrupted by a crash: roll ``committing`` WALs
    forward (finish publishes, swap pins) or back (rollback published
    members, drop branches) — see the module docstring for the decision
    rule. Returns {txn_id: outcome}. Idempotent; call at startup."""
    out: dict[str, str] = {}
    d = os.path.join(catalog.root, "_txns")
    if not os.path.isdir(d):
        return out
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(d, fn)) as f:
            wal = json.load(f)
        txn_id, branch = wal["txn_id"], wal["branch"]
        tables: dict[str, dict] = wal["tables"]
        if wal["state"] == "open":
            # crash while staging: drop the orphaned txn branches (each
            # table's expire_snapshots collects the staged files). Only
            # safe at startup — recover_txns' documented contract — when
            # no transaction of this catalog can still be live.
            for ident in tables:
                t = catalog.load_table(ident)
                try:
                    t.drop_branch(branch)
                except ValueError:
                    pass
            wal["state"] = "aborted"
            out[txn_id] = "dropped_open"
            _atomic_write(os.path.join(d, fn), json.dumps(wal, sort_keys=True))
            continue
        if wal["state"] != "committing":
            continue
        # close the unpinned-member window first (see commit())
        have = catalog.pins()
        base_pins = {
            ident: rec["base"] for ident, rec in tables.items()
            if ident not in have
        }
        if base_pins:
            catalog._swap_pins(base_pins)
        # try roll-forward: publish whatever is still on a branch
        staged: dict[str, int] = {}
        failed = None
        for ident, rec in tables.items():
            t = catalog.load_table(ident)
            if branch in t.list_branches():
                try:
                    m = t.publish_branch(branch)
                    staged[ident] = m.version
                except CommitConflictError:
                    failed = ident
                    break
            else:
                # already published before the crash (or staged nothing)
                staged[ident] = (
                    rec["staged"]
                    if rec["staged"] is not None
                    else t.current_version()
                )
        if failed is None:
            catalog._swap_pins(staged)
            wal["state"] = "committed"
            out[txn_id] = "rolled_forward"
        else:
            for ident, rec in tables.items():
                t = catalog.load_table(ident)
                if branch in t.list_branches():
                    t.drop_branch(branch)
                elif t.current_version() != rec["base"]:
                    t.rollback(rec["base"])
            added = wal.get("added_pins") or []
            if added:
                catalog._swap_pins({}, remove=added)
            wal["state"] = "aborted"
            out[txn_id] = "rolled_back"
        _atomic_write(os.path.join(d, fn), json.dumps(wal, sort_keys=True))
    return out
