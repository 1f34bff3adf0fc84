"""Epoch manifests + atomic checkpoint: the exactly-once commit protocol.

Ray gives at-least-once task execution (retries, lineage
reconstruction), so correctness must live in the sink protocol — the
distributed generalization of the reference's idempotence-by-design
(``ON CONFLICT DO NOTHING``, reference transform/dynamodb.py:186-195,
CHANGES.md rationale: "events are relayed redundantly from retries").

Layout (one lake = one directory, shared storage on a real cluster):

    lake/
      epochs/epoch-00000012/part-0007.parquet   # full partition state as of epoch 12
      epochs/epoch-00000012/manifest.json       # lineage for epoch 12
      dead_letters/epoch-00000012/*.parquet     # undecodable envelopes
      CHECKPOINT.json                           # THE commit pointer (atomic replace)

Protocol per epoch:
  1. appliers write ``part-{pid}.parquet`` into the epoch dir via
     tmp-file + ``os.replace`` (a retried task rewrites identical bytes —
     apply is deterministic given base state + the epoch's full op set);
  2. the driver writes ``manifest.json`` (offset range → files → row
     counts → max lsn per partition + registry snapshot + metrics);
  3. the driver atomically replaces ``CHECKPOINT.json`` pointing every
     partition at its newest file. **Step 3 is the commit point.**

Crash before 3 → the epoch is uncommitted; resume re-runs it from the
previous checkpoint and overwrites the staging files. Crash after 3 →
resume skips it. Partitions untouched by an epoch keep their previous
file (no rewrite), so an epoch's write cost is O(touched partitions).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

CHECKPOINT = "CHECKPOINT.json"


def entry_files(entry) -> tuple[str | None, list[str]]:
    """A checkpoint partition entry is either a plain path (full
    partition file, rewrite sink) or ``{"base": path|None, "deltas":
    [paths]}`` (delta sink). Returns (base, deltas)."""
    if entry is None:
        return None, []
    if isinstance(entry, str):
        return entry, []
    return entry.get("base"), list(entry.get("deltas", []))


def fold_entry(prev, path: str, kind: str):
    """Next checkpoint entry after committing a file of ``kind``
    ('full' replaces everything; 'delta' appends)."""
    if kind == "delta":
        base, deltas = entry_files(prev)
        return {"base": base, "deltas": deltas + [path]}
    return path


@dataclass
class Checkpoint:
    last_epoch: int = -1
    # partition id (str for JSON) → lake-relative parquet path
    partitions: dict[str, str] = field(default_factory=dict)
    registry_json: str = "{}"
    # per-source resume offset: first unapplied offset
    next_offset: int = 0

    def to_dict(self) -> dict[str, Any]:
        return {
            "last_epoch": self.last_epoch,
            "partitions": self.partitions,
            "registry_json": self.registry_json,
            "next_offset": self.next_offset,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Checkpoint":
        return cls(
            last_epoch=d.get("last_epoch", -1),
            partitions=d.get("partitions", {}),
            registry_json=d.get("registry_json", "{}"),
            next_offset=d.get("next_offset", 0),
        )


class LakeManifestStore:
    def __init__(self, lake_dir: str | Path):
        self.root = Path(lake_dir)

    # -- paths --------------------------------------------------------------
    def epoch_dir(self, epoch: int) -> Path:
        return self.root / "epochs" / f"epoch-{epoch:08d}"

    def dead_letter_dir(self, epoch: int) -> Path:
        return self.root / "dead_letters" / f"epoch-{epoch:08d}"

    def partition_file(self, epoch: int, pid: int) -> Path:
        return self.epoch_dir(epoch) / f"part-{pid:04d}.parquet"

    def ensure_dirs(self, epoch: int) -> None:
        self.epoch_dir(epoch).mkdir(parents=True, exist_ok=True)

    # -- checkpoint (atomic) ------------------------------------------------
    def read_checkpoint(self) -> Checkpoint:
        p = self.root / CHECKPOINT
        if not p.exists():
            return Checkpoint()
        return Checkpoint.from_dict(json.loads(p.read_text()))

    def _atomic_write(self, path: Path, payload: str) -> None:
        tmp = path.with_suffix(path.suffix + f".tmp-{os.getpid()}")
        tmp.write_text(payload)
        os.replace(tmp, path)  # atomic on POSIX — the commit point

    def write_checkpoint(self, ckpt: Checkpoint) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        self._atomic_write(self.root / CHECKPOINT, json.dumps(ckpt.to_dict(), indent=1))

    # -- manifests ----------------------------------------------------------
    def write_manifest(self, epoch: int, manifest: dict[str, Any]) -> None:
        manifest = dict(manifest, epoch=epoch, committed_at=time.time())
        self._atomic_write(self.epoch_dir(epoch) / "manifest.json", json.dumps(manifest, indent=1))

    def read_manifest(self, epoch: int) -> dict[str, Any]:
        return json.loads((self.epoch_dir(epoch) / "manifest.json").read_text())

    def commit_epoch(
        self,
        epoch: int,
        lineage: list[dict[str, Any]],
        offset_range: tuple[int, int],
        registry_json: str,
        metrics: dict[str, Any],
    ) -> Checkpoint:
        """Steps 2+3: manifest write, then atomic checkpoint swap."""
        prev = self.read_checkpoint()
        if epoch <= prev.last_epoch:
            return prev  # already committed (idempotent re-commit)
        files = {
            f"{r.get('table', 'transcripts')}#{r['partition_id']}": {
                "path": r["path"],
                "rows": int(r["rows"]),
                "max_lsn": int(r["max_lsn"]),
                "kind": r.get("kind", "full"),
            }
            for r in lineage
        }
        self.write_manifest(
            epoch,
            {
                "offset_range": list(offset_range),
                "files": files,
                "registry": json.loads(registry_json),
                "metrics": metrics,
            },
        )
        partitions = dict(prev.partitions)
        for pid, info in files.items():
            partitions[pid] = fold_entry(partitions.get(pid), info["path"], info["kind"])
        ckpt = Checkpoint(
            last_epoch=epoch,
            partitions=partitions,
            registry_json=registry_json,
            next_offset=offset_range[1],
        )
        self.write_checkpoint(ckpt)
        return ckpt

    def current_files(self) -> list[str]:
        ckpt = self.read_checkpoint()
        out = []
        for entry in ckpt.partitions.values():
            base, deltas = entry_files(entry)
            if base:
                out.append(str(self.root / base))
            out.extend(str(self.root / d) for d in deltas)
        return out
