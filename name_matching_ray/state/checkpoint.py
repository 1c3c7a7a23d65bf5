"""Per-partition checkpointing with lineage + metrics (SURVEY.md §4).

The reference's only resume mechanism is a manual row-offset cursor
(coname.py:196-210).  Here the scoring shuffle is partitioned into *waves* by
``hash(block_key) % n_waves``; each wave writes its matched pairs to its own
parquet directory and records a manifest entry
``{wave, input_lineage, config, metrics, completed}``.  A rerun loads the
manifest and skips completed waves — resume-mid-shuffle with per-partition
lineage, as BASELINE.json:14 requires.  Writes are atomic: a wave directory
is written under ``_tmp-`` and renamed on success.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path


class Manifest:
    def __init__(self, out_dir: str | os.PathLike):
        self.dir = Path(out_dir)
        self.path = self.dir / "manifest.json"
        self.dir.mkdir(parents=True, exist_ok=True)
        if self.path.exists():
            self.data = json.loads(self.path.read_text())
        else:
            self.data = {"partitions": {}, "created_at": time.time()}

    def is_complete(self, pid: str) -> bool:
        e = self.data["partitions"].get(pid)
        return bool(e and e.get("completed"))

    def mark_complete(self, pid: str, lineage: dict, metrics: dict):
        self.data["partitions"][pid] = {
            "completed": True,
            "lineage": lineage,
            "metrics": metrics,
            "finished_at": time.time(),
        }
        self._save()

    def completed_partitions(self) -> list[str]:
        return [p for p in self.data["partitions"] if self.is_complete(p)]

    def _save(self):
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self.data, indent=1, sort_keys=True))
        tmp.replace(self.path)


def atomic_dir_write(final_dir: str | os.PathLike, write_fn):
    """write_fn(tmp_path) -> rename tmp to final on success."""
    final = Path(final_dir)
    tmp = final.parent / f"_tmp-{final.name}"
    if tmp.exists():
        shutil.rmtree(tmp)
    if final.exists():
        shutil.rmtree(final)
    tmp.mkdir(parents=True)
    write_fn(str(tmp))
    tmp.replace(final)
