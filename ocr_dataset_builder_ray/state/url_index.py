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
        os.makedirs(index_dir, exist_ok=True)
        snaps = ray.get([sh.snapshot.remote() for sh in self._shards])
        for s, snap in enumerate(snaps):
            tmp = os.path.join(index_dir, f".tmp-shard-{s:03d}.parquet")
            pq.write_table(pa.table({"url_hash": pa.array(snap, pa.uint64())}), tmp)
            os.replace(tmp, os.path.join(index_dir, f"shard-{s:03d}.parquet"))

    def load(self, index_dir: str) -> bool:
        files = sorted(glob.glob(os.path.join(index_dir, "shard-*.parquet")))
        if not files:
            return False
        futs = []
        for f in files:
            s = int(os.path.basename(f)[6:9])
            if s < self.n_shards:
                arr = pq.read_table(f)["url_hash"].to_numpy(zero_copy_only=False)
                futs.append(self._shards[s].load.remote(arr))
        ray.get(futs)
        return True

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
            n += len(hashes)
        return n
