"""Per-partition completion manifests — the resumable-run state.

Redesign of the reference's append-only checkpoint log
(`load_checkpoint`/append, video/frame_pipeline.py:169-208,350-363;
tesseract/pipeline.py:124-161,270-277) with the flaws SURVEY.md flags
fixed:

* one atomic JSON file per completed partition instead of an
  append-only text log with unflushed writes (and the reference's
  literal-``"\\n"`` separator bug, frame_pipeline.py:356);
* each manifest row carries lineage: the partition's input files, an
  input fingerprint (path+size), row/byte counts and wall time, so a
  changed input invalidates the row instead of being silently skipped;
* planning a restart is the same anti-join the reference does
  (discovered MINUS checkpointed, frame_pipeline.py:241-247) but over
  partition ids, with stale/invalid manifest rows dropped — the
  semi-join validation of frame_pipeline.py:226-239.

Data is written to ``<out>/part={pid:05d}/`` via a temp dir + atomic
rename *before* the manifest row is written, so a crash between the two
re-does at most one partition (at-least-once, idempotent overwrite —
the reference's exact delivery model, SURVEY.md §2.8 D1).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


def input_fingerprint(files: list[str]) -> str:
    """Stable fingerprint of a partition's input file set (path+size)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for f in sorted(files):
        h.update(f.encode())
        h.update(str(os.path.getsize(f)).encode())
        h.update(b"\x00")
    return h.hexdigest()


class RunManifest:
    """Manifest directory for one pipeline run rooted at ``out_dir``."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def partition_dir(self, pid: int) -> str:
        return os.path.join(self.out_dir, f"part={pid:05d}")

    def _row_path(self, pid: int) -> str:
        return os.path.join(self.manifest_dir, f"part-{pid:05d}.json")

    # -- read side ---------------------------------------------------------
    def completed(self) -> dict[int, dict]:
        out: dict[int, dict] = {}
        for name in sorted(os.listdir(self.manifest_dir)):
            if not (name.startswith("part-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.manifest_dir, name)) as f:
                    row = json.load(f)
                out[int(row["partition_id"])] = row
            except (json.JSONDecodeError, KeyError, ValueError):
                continue  # malformed row -> treated as not-done (sanitize, S7)
        return out

    def pending(self, partitions: dict[int, list[str]]) -> list[int]:
        """Anti-join: planned partitions minus validly-completed ones.

        A completed row is stale (and re-planned) when its input
        fingerprint no longer matches or its data directory is missing.
        """
        done = self.completed()
        todo = []
        for pid, files in sorted(partitions.items()):
            row = done.get(pid)
            if (
                row is None
                or row.get("input_fingerprint") != input_fingerprint(files)
                or not os.path.isdir(self.partition_dir(pid))
            ):
                todo.append(pid)
        return todo

    # -- write side --------------------------------------------------------
    def publish_partition(
        self,
        pid: int,
        tmp_data_dir: str,
        input_files: list[str],
        rows: int,
        data_bytes: int,
        wall_s: float,
        extra: dict | None = None,
    ) -> None:
        """Atomically promote ``tmp_data_dir`` to the partition dir, then
        commit the manifest row (data-before-manifest ordering)."""
        final = self.partition_dir(pid)
        if os.path.isdir(final):
            shutil.rmtree(final)  # idempotent overwrite of a torn write
        os.replace(tmp_data_dir, final)
        row = {
            "partition_id": pid,
            "input_files": sorted(input_files),
            "input_fingerprint": input_fingerprint(input_files),
            "rows": rows,
            "bytes": data_bytes,
            "wall_s": round(wall_s, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if extra:
            row.update(extra)
        tmp_row = self._row_path(pid) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp_row, "w") as f:
            json.dump(row, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_row, self._row_path(pid))

    def metrics(self) -> dict:
        """Aggregate lineage metrics across committed partitions (G2/G3)."""
        rows = self.completed().values()
        return {
            "partitions": len(rows),
            "rows": sum(r.get("rows", 0) for r in rows),
            "bytes": sum(r.get("bytes", 0) for r in rows),
            "wall_s": round(sum(r.get("wall_s", 0.0) for r in rows), 3),
        }


def shard_files(files: list[str], num_partitions: int) -> dict[int, list[str]]:
    """Deterministic round-robin sharding of input files into partitions."""
    parts: dict[int, list[str]] = {p: [] for p in range(num_partitions)}
    for i, f in enumerate(sorted(files)):
        parts[i % num_partitions].append(f)
    return {p: fs for p, fs in parts.items() if fs}
