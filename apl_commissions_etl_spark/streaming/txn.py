"""Multi-table transactional publish: one version-SET manifest.

Every maintained output in ``sinks.py`` publishes through its OWN
versioned pointer, so a reader between two pointer flips can observe
GL at v(N+1) while traceability is still at v(N) — inconsistent
lineage across tables that the reference's monolithic rebuild can
never produce (sql/calc/run-calculation.sql:35-45 truncates and
reloads every output inside one run; all-or-nothing by construction).
The incremental engine earns that property back with a MANIFEST:

1. **Data writes first** — each table of the commit is written to its
   own fresh versioned directory ``<root>/<table>/c<commit>``. These
   directories are invisible until the flip: no manifest entry
   references them, so a crash at ANY point during the data writes
   leaves readers on the previous committed set (the directories are
   reclaimable orphans).
2. **One atomic flip** — a single ``os.replace`` of the manifest file
   records {table -> directory} for EVERY table of the commit and
   advances the current-commit pointer. Readers resolve every table
   through the manifest, so they see the old set or the new set,
   never a mix.
3. **Replay guard** — committed ids are recorded in the manifest; a
   re-delivered commit (foreachBatch replay, retried job) is skipped,
   which also makes committed directories IMMUTABLE: a directory can
   only be (re)written while it is still an unreferenced orphan, so
   path equality of two resolved sets proves data equality.

At 100 TB this layer is the catalog's multi-table transaction (an
Iceberg REST-catalog multi-table commit / Delta's coordinated commit):
data writes are table-format appends or copy-on-write rewrites, and
the flip is O(1) metadata regardless of data volume. Time travel
falls out of the same structure — every committed set stays resolvable
by commit id until ``txn_vacuum`` retires it (keep-last-K retention,
the table format's VACUUM with a snapshot-retention policy).

SCHEMA CONTRACT — schema evolution is per-commit snapshot isolation:
a committed directory is immutable and carries its own schema, so an
as-of read returns EXACTLY the columns that commit wrote (old commits
are never retroactively null-filled with later columns, and a dropped
column stays visible in the commits that had it). The replay guard
and ``txn_vacuum`` are path-based and schema-agnostic, so version
sets whose tables evolved mid-history survive both — the contract
``tests/test_txn.py::test_schema_evolution_across_commits`` pins. A
reader wanting one unified frame across commits merges schemas at
read time (``spark.read.option("mergeSchema", ...)`` over resolved
paths), which stays a reader-side choice, not a log rewrite.

WRITER CONTRACT — one driver owns a root (same contract as
``sinks.py``'s state file): the per-root ``threading.Lock`` serializes
committers only WITHIN this process, which is the real writer set
because foreachBatch callbacks and batch committers all run on the
driver. Two processes committing to the same root would race the
manifest's load-modify-store and one commit's entry could be lost
despite the atomic ``os.replace`` — on a real deployment this is the
slot a catalog service / commit coordinator fills (Iceberg REST
catalog, Delta coordinated commits); a manifest CAS loop is the
single-node equivalent if multi-process commit is ever needed.
"""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession

_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()


def _lock(root: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _LOCKS.setdefault(os.path.abspath(root), threading.Lock())


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_txn_manifest.json")


def _load(root: str) -> dict:
    p = _manifest_path(root)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {"commits": {}, "order": [], "current": None}


def _store(root: str, manifest: dict) -> None:
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(root))  # the atomic flip


class TxnAborted(RuntimeError):
    """Injected crash between table data writes (testing the crash
    window: the manifest MUST still resolve the previous set)."""


def txn_commit(
    tables: dict[str, DataFrame],
    root: str,
    commit_id: int,
    fail_after: int | None = None,
) -> bool:
    """Commit ``tables`` as ONE atomic version set.

    Writes every table to ``<root>/<name>/c<commit_id>`` (deterministic
    name order), then flips the manifest in one ``os.replace``. Returns
    False when ``commit_id`` is already committed (replay — skipped
    without touching data, so committed directories stay immutable).

    ``fail_after=k`` simulates a crash after k table data writes and
    BEFORE the manifest flip (raises :class:`TxnAborted`): the commit
    is not recorded, readers stay on the previous set, and the k
    written directories are unreferenced orphans a replay simply
    overwrites (and ``txn_vacuum`` reclaims).
    """
    os.makedirs(root, exist_ok=True)
    with _lock(root):
        manifest = _load(root)
        if str(commit_id) in manifest["commits"]:
            return False  # replayed commit: already visible, skip
        entry: dict[str, str] = {}
        for k, name in enumerate(sorted(tables)):
            if fail_after is not None and k >= fail_after:
                raise TxnAborted(
                    f"injected crash before table {name!r} "
                    f"(commit {commit_id}, {k} tables written)"
                )
            rel = os.path.join(name, f"c{commit_id:06d}")
            tables[name].write.mode("overwrite").parquet(
                os.path.join(root, rel)
            )
            entry[name] = rel
        manifest["commits"][str(commit_id)] = entry
        manifest["order"].append(commit_id)
        manifest["current"] = commit_id
        _store(root, manifest)  # one flip publishes ALL tables
        return True


def txn_current(root: str) -> int | None:
    """The current committed id, or None before the first commit."""
    return _load(root)["current"]


def txn_resolved_paths(root: str, as_of: int | None = None) -> dict[str, str]:
    """{table -> relative directory} of the committed set ``as_of``
    (default: current). Because committed directories are immutable,
    equality of two resolved-path dicts proves byte-level equality of
    the two reads — the cheap in-query form of the crash-window check.
    """
    manifest = _load(root)
    cid = manifest["current"] if as_of is None else as_of
    if cid is None:
        return {}
    entry = manifest["commits"].get(str(cid))
    if entry is None:
        raise KeyError(
            f"commit {cid} is not in the manifest "
            f"(committed: {manifest['order']})"
        )
    return dict(entry)


def txn_table(
    spark: SparkSession, root: str, name: str, as_of: int | None = None
) -> DataFrame:
    """Read one table of the committed set ``as_of`` (default current)
    through the manifest — the only sanctioned read path."""
    paths = txn_resolved_paths(root, as_of)
    if name not in paths:
        raise KeyError(f"table {name!r} not in committed set: {sorted(paths)}")
    return spark.read.parquet(os.path.join(root, paths[name]))


def txn_vacuum(root: str, keep_last: int = 1) -> int:
    """Retire old committed sets, keeping the newest ``keep_last``
    commits readable (time-travel retention), and reclaim every
    unreferenced directory — crashed-commit orphans included. Returns
    the number of directories removed.

    The manifest defines liveness (exactly like the sink state file in
    ``sinks.vacuum_journal``): a directory is live iff a RETAINED
    commit references it. Tables may share directories across commits
    in a future incarnation (unchanged table re-referenced), so
    liveness is computed over the retained set, not per commit.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1: the current set stays")
    removed = 0
    with _lock(root):
        manifest = _load(root)
        keep = manifest["order"][-keep_last:]
        retained = {
            cid: manifest["commits"][str(cid)]
            for cid in keep
            if str(cid) in manifest["commits"]
        }
        live = {rel for entry in retained.values() for rel in entry.values()}
        for table_dir in sorted(os.listdir(root)):
            tpath = os.path.join(root, table_dir)
            if not os.path.isdir(tpath):
                continue
            for vdir in sorted(os.listdir(tpath)):
                rel = os.path.join(table_dir, vdir)
                if rel not in live:
                    shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
                    removed += 1
        manifest["commits"] = {str(c): e for c, e in retained.items()}
        manifest["order"] = keep
        _store(root, manifest)
    return removed
