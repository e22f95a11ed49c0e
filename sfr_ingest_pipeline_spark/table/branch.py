"""Staging branches: the write-audit-publish (WAP) workflow on the
transcript table (Iceberg branch / fast-forward analog — the operational
pattern where risky writes land on an isolated ref, get audited, and only
then become visible to readers of main).

Design: a branch IS a full table root nested at
``<root>/metadata/branches/<name>/`` with

* ``data``                -> symlink to the main table's data dir, and
* ``metadata/manifests``  -> symlink to the main manifest dir,

so every existing surface — ``apply_batch``, streaming replay, DML,
``changes_between``, ``verify_against_binlog``, time travel — works on the
branch root UNMODIFIED: relative data paths resolve through the symlink,
branch commits CAS their snapshot files into the branch's own metadata
namespace (invisible to main readers), and the manifests they write land
in the shared manifest namespace where a later publish can adopt them
without copying anything.

Publish is Iceberg's ``fast_forward``: ONE CAS commit on main that adopts
the branch head's manifests/schema/properties (including the batch-id
marker — the staged CDC batches become durably applied-on-main in the
same atomic step that makes their rows visible). Strictly fast-forward:
if main advanced past the branch's fork point the publish raises
``CommitConflictError`` — re-stage against the new head rather than
silently interleaving unaudited history. The publish commits at
``fork_id + 1`` — the SAME snapshot-id slot every concurrent main writer
must CAS — so a publish/ingest race always collides on one file and
exactly one side wins (a publish at a jumped-ahead id would let a
concurrent ``fork_id + 1`` commit land un-contested and be silently
orphaned when readers roll forward to the higher publish id). Stamp
uniqueness for the LWW commit-recency tie-break is preserved separately:
the published snapshot records a ``commit_seq_floor`` past every
data-dir stamp the branch wrote, so post-publish commits stamp strictly
above the staged files (``TranscriptTable.next_commit_seq``).

Abort is ``drop_branch``: the staged snapshots vanish with the branch
directory and the staged data files become unreferenced — the next
``expire_snapshots`` run GCs them. While a branch LIVES, expire retains
everything the branch references (maintenance.py gathers branch refs),
so audit can take as long as it needs.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from sfr_ingest_pipeline_spark.table.transcript_table import (
    CommitConflictError,
    Snapshot,
    TranscriptTable,
    _atomic_create_json,
    _atomic_write_json,
)

_BRANCH_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,99}$")
_BRANCHES_REL = os.path.join("metadata", "branches")


def branch_root(root: str, name: str) -> str:
    return os.path.join(root, _BRANCHES_REL, name)


def is_branch_root(path: str) -> bool:
    """True when ``path`` is a branch staging root (its data dir is the
    symlink into a parent table). Maintenance that deletes files must
    refuse to run here — the 'unreferenced' files it would compute belong
    to the parent table's namespace."""
    return os.path.islink(os.path.join(path, "data"))


def create_branch(
    root: str, name: str, from_snapshot_id: int | None = None
) -> str:
    """Create staging branch ``name`` forked at ``from_snapshot_id``
    (default: current head). Returns the branch root — a full table root
    every engine surface accepts. Creation is atomic (mkdir is the lock);
    an existing branch name raises FileExistsError."""
    if not _BRANCH_NAME_RE.match(name or ""):
        raise ValueError(f"invalid branch name {name!r}")
    fork = TranscriptTable.load(root, from_snapshot_id)
    broot = branch_root(root, name)
    os.makedirs(os.path.dirname(broot), exist_ok=True)
    os.mkdir(broot)  # atomic claim of the name
    # share the parent's data + manifest namespaces via relative symlinks
    # (branch root sits 3 levels under the table root)
    os.makedirs(os.path.join(root, "metadata", "manifests"), exist_ok=True)
    os.symlink(os.path.join("..", "..", "..", "data"),
               os.path.join(broot, "data"))
    os.makedirs(os.path.join(broot, "metadata"))
    os.symlink(os.path.join("..", "..", "..", "manifests"),
               os.path.join(broot, "metadata", "manifests"))
    _atomic_create_json(
        TranscriptTable._snap_path(broot, fork.snapshot.snapshot_id),
        fork.snapshot.to_json(),
    )
    _atomic_write_json(os.path.join(broot, "branch.json"), {
        "name": name,
        "fork_snapshot_id": fork.snapshot.snapshot_id,
        "created_us": int(time.time() * 1e6),
    })
    with open(os.path.join(broot, "metadata", "version-hint.text"), "w",
              encoding="utf-8") as f:
        f.write(str(fork.snapshot.snapshot_id))
    return broot


def list_branches(root: str) -> dict[str, dict]:
    """name -> {fork_snapshot_id, head_snapshot_id, created_us}."""
    bdir = os.path.join(root, _BRANCHES_REL)
    out: dict[str, dict] = {}
    if not os.path.isdir(bdir):
        return out
    for name in sorted(os.listdir(bdir)):
        broot = os.path.join(bdir, name)
        info_path = os.path.join(broot, "branch.json")
        if not os.path.isfile(info_path):
            continue
        with open(info_path, encoding="utf-8") as f:
            info = json.load(f)
        try:
            info["head_snapshot_id"] = (
                TranscriptTable.load(broot).snapshot.snapshot_id
            )
        except FileNotFoundError:
            info["head_snapshot_id"] = None
        out[name] = info
    return out


def publish_branch(root: str, name: str, drop: bool = False) -> TranscriptTable:
    """Fast-forward main to the branch head (the WAP promote): one CAS
    commit adopting the branch head's manifests, schema, and properties —
    batch-id marker included, so the staged CDC batches count as applied
    on main atomically with their rows becoming visible.

    Raises :class:`CommitConflictError` when main advanced past the fork
    point (strict fast-forward), and ValueError when the branch head's
    batch marker regressed below the fork's (a branch-local rollback —
    publishing it would make main double-apply replayed batches)."""
    broot = branch_root(root, name)
    with open(os.path.join(broot, "branch.json"), encoding="utf-8") as f:
        info = json.load(f)
    bt = TranscriptTable.load(broot)
    mt = TranscriptTable.load(root)
    fork_id = int(info["fork_snapshot_id"])
    if mt.snapshot.snapshot_id != fork_id:
        raise CommitConflictError(
            f"main advanced past branch {name!r}'s fork point "
            f"({fork_id} -> {mt.snapshot.snapshot_id}); re-stage against "
            "the current head"
        )
    if bt.snapshot.snapshot_id == fork_id:
        return mt  # nothing staged — publish is a no-op
    fork_marker = mt.last_batch_id
    head_marker = bt.last_batch_id
    if (fork_marker is not None
            and (head_marker is None or head_marker < fork_marker)):
        raise ValueError(
            f"branch {name!r} head batch marker ({head_marker}) regressed "
            f"below the fork's ({fork_marker}); a branch rollback cannot "
            "be published — drop the branch and re-stage"
        )
    props = dict(bt.snapshot.properties)
    props["publish"] = {
        "branch": name,
        "branch_head": bt.snapshot.snapshot_id,
        "fork_snapshot_id": fork_id,
    }
    # Stamp floor: bt.next_commit_seq - 1 is the highest data-dir stamp the
    # branch's history ever wrote into the shared data namespace; recording
    # it makes main's next stamp strictly greater (LWW commit recency must
    # order post-publish writes newer than the staged files).
    floor = bt.next_commit_seq - 1
    if floor > fork_id + 1:
        props["commit_seq_floor"] = floor
    else:
        props.pop("commit_seq_floor", None)
    snap = Snapshot(
        # fork_id + 1: the SAME id slot any concurrent main commit must
        # CAS-create, so publish/ingest races collide on one file and
        # exactly one wins (see module docstring)
        snapshot_id=fork_id + 1,
        parent_id=mt.snapshot.snapshot_id,
        created_us=int(time.time() * 1e6),
        schema_id=bt.snapshot.schema_id,
        schema_json=bt.snapshot.schema_json,
        n_buckets=bt.snapshot.n_buckets,
        manifests=dict(bt.snapshot.manifests),
        properties=props,
        key_cols=list(bt.snapshot.key_cols),
        order_cols=list(bt.snapshot.order_cols),
    )
    try:
        _atomic_create_json(
            TranscriptTable._snap_path(root, snap.snapshot_id), snap.to_json()
        )
    except FileExistsError:
        raise CommitConflictError(
            f"publish of branch {name!r} lost the commit race; reload and "
            "retry deliberately"
        ) from None
    mt._advance_hint(snap.snapshot_id)
    out = TranscriptTable(root, snap)
    if drop:
        drop_branch(root, name)
    return out


def drop_branch(root: str, name: str) -> None:
    """Abort/retire a branch: its staged snapshots disappear with the
    directory; staged data files become unreferenced and the next
    ``expire_snapshots`` GCs them.

    Before removing the metadata, the branch's full referenced set is
    recorded in a released-files tombstone (``metadata/released-*.json``).
    expire_snapshots distinguishes committed-history files (delete now)
    from never-committed paths that may belong to an IN-FLIGHT writer
    (deleted only past an mtime grace window); without the tombstone a
    dropped branch's staged files would look like the latter and linger
    for the grace period instead of being released by the explicit drop."""
    broot = branch_root(root, name)
    if not os.path.isdir(broot):
        raise FileNotFoundError(f"no branch {name!r}")
    bt = TranscriptTable.load(broot)
    files: set[str] = set()
    manifests: set[str] = set()
    for snap in bt.history():
        view = TranscriptTable(broot, snap)
        files |= {f.path for f in view.files}
        manifests |= view.referenced_manifests()
    rel = os.path.join(root, "metadata", f"released-{name}-{uuid.uuid4().hex[:8]}.json")
    tmp = rel + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"files": sorted(files), "manifests": sorted(manifests)}, f)
    os.replace(tmp, rel)
    shutil.rmtree(broot)


def released_refs(root: str) -> tuple[set[str], set[str], list[str]]:
    """Union of every released-files tombstone: (data paths, manifest
    paths, tombstone file paths). Consumed — and then deleted — by
    ``expire_snapshots``."""
    files: set[str] = set()
    manifests: set[str] = set()
    paths: list[str] = []
    mdir = os.path.join(root, "metadata")
    if os.path.isdir(mdir):
        for fn in sorted(os.listdir(mdir)):
            if fn.startswith("released-") and fn.endswith(".json"):
                full = os.path.join(mdir, fn)
                try:
                    with open(full, encoding="utf-8") as f:
                        raw = json.load(f)
                except (OSError, ValueError):
                    continue
                files |= set(raw.get("files", []))
                manifests |= set(raw.get("manifests", []))
                paths.append(full)
    return files, manifests, paths


def branch_referenced(root: str) -> tuple[set[str], set[str]]:
    """(data file paths, manifest paths) referenced by ANY snapshot of any
    live branch — the retention extension ``expire_snapshots`` unions in
    so a long audit never loses its staged (or shared-history) files."""
    files: set[str] = set()
    manifests: set[str] = set()
    for name in list_branches(root):
        broot = branch_root(root, name)
        bt = TranscriptTable.load(broot)
        for snap in bt.history():
            view = TranscriptTable(broot, snap)
            files |= {f.path for f in view.files}
            manifests |= view.referenced_manifests()
    return files, manifests
