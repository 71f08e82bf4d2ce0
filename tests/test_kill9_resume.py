"""Hard-kill resume: a separate driver process is SIGKILLed mid-run;
a fresh run resumes from the manifests and the final output equals an
uninterrupted run (the real-world form of FIXTURES.md §4)."""

import os
import subprocess
import sys
import textwrap
import time

import pytest

DRIVER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from ocr_dataset_builder_ray.pipelines.extraction import run_partitioned_extraction

    def tick(pid):
        print(f"PARTITION_DONE {{pid}}", flush=True)

    run_partitioned_extraction({corpus!r}, {out!r}, num_partitions=8,
                               on_partition_done=tick)
    print("ALL_DONE", flush=True)
    """
)


def test_sigkill_mid_run_then_resume(ray_session, pages_corpus, tmp_path):
    out = str(tmp_path / "killed")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = DRIVER.format(repo=repo, corpus=pages_corpus, out=out)

    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    # SIGKILL the whole driver as soon as 2 partitions have committed
    seen = 0
    deadline = time.time() + 240
    for line in proc.stdout:
        if line.startswith("PARTITION_DONE"):
            seen += 1
            if seen >= 2:
                proc.kill()  # SIGKILL — no cleanup, no atexit
                break
        if time.time() > deadline:
            proc.kill()
            pytest.fail("driver did not commit 2 partitions in time")
    proc.wait(timeout=60)

    from ocr_dataset_builder_ray.pipelines.extraction import (
        read_extracted,
        run_partitioned_extraction,
    )
    from ocr_dataset_builder_ray.state.manifest import RunManifest

    committed = len(RunManifest(out).completed())
    assert committed >= 2  # the kill may land after another commit

    summary = run_partitioned_extraction(pages_corpus, out, num_partitions=8)
    assert summary["ran_partitions"] == 8 - committed
    assert summary["partitions"] == 8

    # byte-identical to an uninterrupted run
    clean = str(tmp_path / "clean")
    run_partitioned_extraction(pages_corpus, clean, num_partitions=8)

    def rows(d):
        ds = read_extracted(d)
        return sorted(
            (r["url"], r["extracted_text"], r["content_hash"])
            for r in ds.select_columns(["url", "extracted_text", "content_hash"]).take_all()
        )

    assert rows(out) == rows(clean)
