"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_corpus():
    """The deterministic FIXTURES.md §1 corpus (generated once per session)."""
    from doppel_ray import synth

    return synth.generate()


@pytest.fixture(scope="session")
def pages_ds(synth_corpus):
    import ray.data as rd

    return rd.from_arrow(synth_corpus.pages)
