"""Catalog-level multi-table transactions over WAP branches.

The reference commits one stream at a time (BufferedStreamConsumer flushes
per-stream buffers independently), which leaves a multi-stream sync
observable in a half-written state between stream flushes. Iceberg's
answer — and this module's model — is the REST-catalog *multi-table
commit*: stage every table's writes invisibly, then make one catalog-level
decision that either publishes all of them or none.

Mapping onto this lake format:

  stage    each table in the transaction gets a WAP branch named
           `txn-<id>` (format.py create_branch — CAS mkdir, so two
           transactions can never share a branch). All writes go through
           the branch handles; main readers see nothing.
  lock     at commit, per-table lock dirs are acquired in sorted-path
           order (deadlock-free total order) so concurrent transactions
           serialize; CAS mkdir again.
  check    every branch must still fast-forward (main unchanged since the
           fork). Any conflict → abort BEFORE the decision record: drop
           all branches, release locks, raise. Nothing published.
  decide   one O_EXCL write of `<log_dir>/txn-<id>.json` listing every
           (table path, branch, base version). This is the commit point:
           before it exists the transaction never happened; after, it is
           guaranteed to complete.
  publish  fast-forward each table (format.py publish_branch — per-table
           CAS), then mark the decision record done and release locks.

Crash anywhere after `decide` is repaired by `recover(log_dir)`: it
re-reads undone decision records and rolls the remaining publishes
forward. Publishes are idempotent under recovery — the manifest at
base+1 carrying `publish-branch:txn-<id>` proves adoption even if main
has advanced further since. Crash before `decide` never published
anything; `recover(log_dir, table_paths)` scavenges the dead owner's
locks and staged branches so the tables become transactable again.

Single-node note: the lock/log directory plays the role the REST catalog
service plays in deployment — the one component that can order decisions.
The protocol (stage → validate under lock → logged decision → idempotent
roll-forward) is the same one a real catalog runs.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from airbyte_spark.lake.format import CommitConflict, LakeTable


class TransactionAborted(Exception):
    """Commit-time validation failed; nothing was published."""


def _lock_dir(table_path: str) -> str:
    return os.path.join(table_path, "_lake", "txn.lock")


def _acquire(table_path: str, txn_id: str) -> None:
    d = _lock_dir(table_path)
    os.makedirs(d)  # CAS; FileExistsError = held by another transaction
    with open(os.path.join(d, "owner"), "w") as fh:
        fh.write(txn_id)


def _release(table_path: str, txn_id: str) -> None:
    d = _lock_dir(table_path)
    try:
        with open(os.path.join(d, "owner")) as fh:
            if fh.read().strip() != txn_id:
                return  # not ours — never break someone else's lock
    except FileNotFoundError:
        return
    shutil.rmtree(d, ignore_errors=True)


@dataclass
class CatalogTransaction:
    spark: SparkSession
    log_dir: str
    txn_id: str
    tables: dict[str, str] = field(default_factory=dict)  # name -> path
    _branches: dict[str, LakeTable] = field(default_factory=dict)
    _done: bool = False

    # ---- lifecycle ----

    @staticmethod
    def begin(
        spark: SparkSession, log_dir: str, tables: dict[str, str]
    ) -> "CatalogTransaction":
        """Open a transaction over named tables ({name: table path})."""
        os.makedirs(log_dir, exist_ok=True)
        txn = CatalogTransaction(
            spark, log_dir, txn_id=uuid.uuid4().hex[:12], tables=dict(tables)
        )
        for name, path in tables.items():
            txn._branches[name] = LakeTable.load(spark, path).create_branch(
                txn._branch_name
            )
        return txn

    @property
    def _branch_name(self) -> str:
        return f"txn-{self.txn_id}"

    def table(self, name: str) -> LakeTable:
        """Branch handle — every write through it is staged, not visible."""
        if self._done:
            raise ValueError("transaction already finished")
        return self._branches[name]

    # ---- terminal ops ----

    def abort(self) -> None:
        if self._done:
            return
        for name, path in self.tables.items():
            LakeTable.load(self.spark, path).drop_branch(self._branch_name)
        self._done = True

    def commit(self) -> dict[str, int]:
        """All-or-nothing publish. Returns {table name: new main version}."""
        if self._done:
            raise ValueError("transaction already finished")
        ordered = sorted(self.tables.items(), key=lambda kv: kv[1])
        held: list[str] = []
        try:
            for _, path in ordered:
                try:
                    _acquire(path, self.txn_id)
                except FileExistsError:
                    raise TransactionAborted(
                        f"table {path} is locked by another transaction"
                    )
                held.append(path)
            # validate every fast-forward BEFORE deciding anything
            entries = []
            for name, path in ordered:
                bm = self._branches[name].manifest()
                main_v = LakeTable.load(self.spark, path).current_version()
                if main_v != bm.get("branch_base"):
                    raise TransactionAborted(
                        f"table {path}: main advanced to v{main_v} since "
                        f"branch base v{bm.get('branch_base')}"
                    )
                entries.append({"name": name, "path": path, "base": main_v})
        except TransactionAborted:
            for p in held:
                _release(p, self.txn_id)
            self.abort()
            raise
        # the commit point: one atomic record for the whole catalog change
        record = {
            "txn_id": self.txn_id,
            "branch": self._branch_name,
            "tables": entries,
            "status": "committed",
        }
        rec_path = os.path.join(self.log_dir, f"txn-{self.txn_id}.json")
        with open(rec_path + ".tmp", "w") as fh:
            json.dump(record, fh)
        os.rename(rec_path + ".tmp", rec_path)
        try:
            versions = _roll_forward(self.spark, record, rec_path)
        except Exception:
            # the decision stands — recover() will complete the publish —
            # but locks must not outlive this process (a held lock with a
            # dead owner blocks every future transaction on these tables)
            for p in held:
                _release(p, self.txn_id)
            self._done = True
            raise
        self._done = True
        return versions


def _roll_forward(spark: SparkSession, record: dict, rec_path: str) -> dict[str, int]:
    """Complete a decided transaction; safe to re-run any number of times."""
    branch = record["branch"]
    versions: dict[str, int] = {}
    for ent in record["tables"]:
        t = LakeTable.load(spark, ent["path"])
        if branch in t.branches():
            versions[ent["name"]] = t.publish_branch(branch)
            continue
        # branch gone: either this entry already published (the manifest
        # at base+1 carries our publish marker — regular commits may have
        # advanced main PAST it since, which must not defeat idempotency)
        # or something external broke the protocol.
        published_v = ent["base"] + 1
        try:
            pm = t.manifest(published_v)
        except FileNotFoundError:
            pm = None
        if pm is not None and pm.get("operation") == f"publish-branch:{branch}":
            versions[ent["name"]] = published_v
        elif t.current_version() == ent["base"]:
            raise CommitConflict(
                f"decided txn {record['txn_id']}: branch {branch} missing on "
                f"{ent['path']} and main never adopted it"
            )
        else:
            raise CommitConflict(
                f"decided txn {record['txn_id']}: {ent['path']} advanced past "
                f"v{ent['base']} without publish-branch:{branch}"
            )
    done = dict(record)
    done["status"] = "done"
    done["versions"] = versions
    with open(rec_path + ".tmp", "w") as fh:
        json.dump(done, fh)
    os.rename(rec_path + ".tmp", rec_path)
    for ent in record["tables"]:
        _release(ent["path"], record["txn_id"])
    return versions


def consistent_versions(log_dir: str) -> dict[str, tuple[str, int]]:
    """The last completed transaction's published version per table:
    {table name: (path, version)}. A reader that pins table reads to these
    versions sees the catalog exactly as some transaction left it — never
    a mix of one table's newer state with another's older state, even
    while writers keep committing.

    (≡ Iceberg REST catalog's consistent multi-table snapshot / a
    cross-table read timestamp. Tables without any transactional commit
    are absent — read them at HEAD.)"""
    out: dict[str, tuple[str, int]] = {}
    if not os.path.isdir(log_dir):
        return out
    for fn in sorted(os.listdir(log_dir)):
        if not (fn.startswith("txn-") and fn.endswith(".json")):
            continue
        with open(os.path.join(log_dir, fn)) as fh:
            record = json.load(fh)
        if record.get("status") != "done":
            continue
        for ent in record["tables"]:
            name = ent["name"]
            v = record["versions"][name]
            # later transactions win per table (files sort by txn id, but
            # versions are monotone per table — keep the max)
            if name not in out or v > out[name][1]:
                out[name] = (ent["path"], v)
    return out


def read_consistent(
    spark: SparkSession, log_dir: str, name: str
) -> "DataFrame":  # noqa: F821 (DataFrame via LakeTable.read)
    """Read one table pinned at the catalog's last transactional snapshot."""
    versions = consistent_versions(log_dir)
    if name not in versions:
        raise KeyError(f"no completed transaction published table '{name}'")
    path, v = versions[name]
    return LakeTable.load(spark, path).read(version=v)


def recover(
    spark: SparkSession, log_dir: str, table_paths: "list[str] | None" = None
) -> dict[str, dict[str, int]]:
    """Repair after a crash: roll every decided-but-undone transaction
    forward, and — for the given table paths — scavenge the debris of
    transactions that died BEFORE their decision record existed (those
    never happened: their lock is released and their staged branch
    dropped, so the tables become transactable again).

    Only run while no transaction is in flight (the crash-recovery
    context): the scavenger cannot distinguish a dead undecided owner
    from a live one mid-validation — the same single-operator assumption
    a real catalog's lease-expiry encodes as a timeout.

    Returns {txn_id: {table name: version}} for rolled-forward ones."""
    out: dict[str, dict[str, int]] = {}
    if os.path.isdir(log_dir):
        for fn in sorted(os.listdir(log_dir)):
            if not (fn.startswith("txn-") and fn.endswith(".json")):
                continue
            rec_path = os.path.join(log_dir, fn)
            with open(rec_path) as fh:
                record = json.load(fh)
            if record.get("status") == "committed":
                out[record["txn_id"]] = _roll_forward(spark, record, rec_path)
    for path in table_paths or []:
        d = _lock_dir(path)
        if not os.path.isdir(d):
            continue
        try:
            with open(os.path.join(d, "owner")) as fh:
                owner = fh.read().strip()
        except FileNotFoundError:
            # crashed between mkdir and owner write: nobody can ever
            # release this lock through the API — remove it directly
            shutil.rmtree(d, ignore_errors=True)
            continue
        rec = os.path.join(log_dir, f"txn-{owner}.json")
        if os.path.exists(rec):
            with open(rec) as fh:
                status = json.load(fh).get("status")
            if status == "done":
                _release(path, owner)  # crashed after publish, pre-release
            # "committed" was rolled forward above (which releases)
            continue
        # owner never reached its decision: the transaction never
        # happened — drop its staged branch and free the table
        LakeTable.load(spark, path).drop_branch(f"txn-{owner}")
        _release(path, owner)
    return out
