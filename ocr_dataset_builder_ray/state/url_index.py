"""Sharded seen-url index — the one shared MUTABLE state in the engine.

Incremental ingestion (daemon passes) needs cross-pass memory: a url
ingested in pass 1 must not be re-emitted when a later crawl file
recaptures it (first-seen-wins ingest — the semantics of the
reference's checkpoint set, frame_pipeline.py:241-247, at URL rather
than directory granularity). A per-url membership set is exactly the
"shared mutable index" case the Dataset API cannot express, so it
lives on raw Ray actors (SURVEY.md §7 escape hatch (c)) — one actor
per url-hash shard:

* routing: shard = url_hash % n_shards — the SAME url-hash key the
  rest of the engine partitions on, so a shard's actor is the single
  writer for its key range (no cross-actor coordination);
* reads (``check``) are side-effect free; mutation (``add``) happens
  only AFTER a partition's manifest commit, preserving at-least-once
  delivery: a crash between extraction and commit re-processes the
  partition, never loses urls;
* persistence: each shard snapshots its set as a uint64 parquet next
  to the manifests; a stale/missing snapshot is rebuilt exactly from
  the committed partitions' ``url_hash`` column (the manifests remain
  the source of truth — the index is a cache of them).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


@ray.remote(num_cpus=0)
class UrlIndexShard:
    """One shard's membership set. Single-writer per key range."""

    def __init__(self) -> None:
        self._seen: set[int] = set()

    def check(self, hashes: list[int]) -> list[bool]:
        """True where the url is NEW (not yet ingested). Read-only."""
        seen = self._seen
        return [h not in seen for h in hashes]

    def add(self, hashes: list[int]) -> int:
        self._seen.update(hashes)
        return len(self._seen)

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self._seen, dtype=np.uint64, count=len(self._seen))

    def load(self, hashes: np.ndarray) -> int:
        self._seen.update(int(h) for h in hashes)
        return len(self._seen)


class UrlIndex:
    """Driver-side handle to the shard actors."""

    def __init__(self, n_shards: int = 8) -> None:
        self.n_shards = n_shards
        self._shards = [UrlIndexShard.remote() for _ in range(n_shards)]
        # partition ids whose url_hash columns this index has absorbed —
        # persisted with the snapshot so a resume can reconcile against
        # the manifest (see resume_from_run)
        self.covered: set[int] = set()

    def mark_covered(self, pid: int) -> None:
        self.covered.add(int(pid))

    # -- routing -----------------------------------------------------------
    def _route(self, hashes: np.ndarray) -> list[np.ndarray]:
        shard_of = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        return [hashes[shard_of == s] for s in range(self.n_shards)]

    def check_new(self, hashes: np.ndarray) -> np.ndarray:
        """bool[n] aligned with ``hashes``: True = first time seen."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        shard_of = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        futures = {}
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futures[s] = (idx, self._shards[s].check.remote(hashes[idx].tolist()))
        out = np.zeros(len(hashes), dtype=bool)
        for s, (idx, fut) in futures.items():
            out[idx] = ray.get(fut)
        return out

    def add(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.uint64)
        parts = self._route(hashes)
        ray.get(
            [
                self._shards[s].add.remote(parts[s].tolist())
                for s in range(self.n_shards)
                if len(parts[s])
            ]
        )

    # -- persistence -------------------------------------------------------
    def save(self, index_dir: str) -> None:
        import json

        os.makedirs(index_dir, exist_ok=True)
        snaps = ray.get([sh.snapshot.remote() for sh in self._shards])
        for s, snap in enumerate(snaps):
            tmp = os.path.join(index_dir, f".tmp-shard-{s:03d}.parquet")
            pq.write_table(pa.table({"url_hash": pa.array(snap, pa.uint64())}), tmp)
            os.replace(tmp, os.path.join(index_dir, f"shard-{s:03d}.parquet"))
        tmp = os.path.join(index_dir, ".tmp-covered.json")
        with open(tmp, "w") as f:
            json.dump({"n_shards": self.n_shards, "covered": sorted(self.covered)}, f)
        os.replace(tmp, os.path.join(index_dir, "covered.json"))

    def load(self, index_dir: str) -> bool:
        """Restore from a snapshot. ``save`` writes exactly one file per
        shard, so the file count IS the writer's shard count; when it
        differs from ours, filename-index routing would drop or misroute
        hashes (``check_new`` routes by ``h % n_shards``) — replay every
        file through ``add`` instead, which routes correctly for any
        shard count."""
        files = sorted(glob.glob(os.path.join(index_dir, "shard-*.parquet")))
        if not files:
            return False
        if len(files) == self.n_shards:
            futs = []
            for f in files:
                s = int(os.path.basename(f)[6:9])
                arr = pq.read_table(f)["url_hash"].to_numpy(zero_copy_only=False)
                futs.append(self._shards[s].load.remote(arr))
            ray.get(futs)
        else:
            for f in files:
                self.add(pq.read_table(f)["url_hash"].to_numpy(zero_copy_only=False))
        covered_path = os.path.join(index_dir, "covered.json")
        if os.path.exists(covered_path):
            import json

            with open(covered_path) as f:
                self.covered = set(json.load(f).get("covered", []))
        return True

    def resume_from_run(self, out_dir: str, index_dir: str | None = None) -> int:
        """Crash-safe resume: snapshot (if any) + manifest reconciliation.

        A crash between a partition's manifest commit and the index
        add/save leaves a snapshot that is BEHIND the manifests; simply
        trusting ``load`` would re-ingest that partition's urls on a
        later recapture (first-seen-wins violation). The manifests are
        the source of truth, so after loading the snapshot we top up
        every committed partition the snapshot doesn't cover —
        ``add`` is idempotent, replaying is always safe. Returns the
        number of partitions replayed.
        """
        from .manifest import RunManifest

        index_dir = index_dir or os.path.join(out_dir, "_url_index")
        self.load(index_dir)
        committed = set(RunManifest(out_dir).completed())
        missing = sorted(committed - self.covered)
        for pid in missing:
            for f in sorted(
                glob.glob(os.path.join(out_dir, f"part={pid:05d}", "*.parquet"))
            ):
                self.add(
                    pq.read_table(f, columns=["url_hash"])["url_hash"].to_numpy(
                        zero_copy_only=False
                    )
                )
            self.mark_covered(pid)
        if missing:
            self.save(index_dir)
        return len(missing)

    def rebuild_from_run(self, out_dir: str) -> int:
        """Exact rebuild from committed partitions (source of truth) —
        used when the snapshot is missing or behind the manifests."""
        files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
        n = 0
        for f in files:
            hashes = pq.read_table(f, columns=["url_hash"])["url_hash"].to_numpy(
                zero_copy_only=False
            )
            self.add(hashes)
            part = os.path.basename(os.path.dirname(f))
            self.mark_covered(int(part.split("=")[1]))
            n += len(hashes)
        return n
