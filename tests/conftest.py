import os

import pytest

import ray


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (local, 4 CPUs)."""
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_corpus(tmp_path_factory) -> str:
    """Small deterministic pages corpus (covers all fixed edge rows)."""
    from ocr_dataset_builder_ray.sources.pages import generate_pages_corpus

    out = str(tmp_path_factory.mktemp("pages") / "corpus")
    generate_pages_corpus(out, n_rows=200, rows_per_file=25, use_ray=False)
    return out


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
