import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus(ray_session):
    """Cached deterministic 1k-image corpus (FIXTURES.md t1 tier)."""
    from gdal_ray.fixtures.generate import generate_corpus

    n = int(os.environ.get("GDAL_RAY_TEST_IMAGES", "1000"))
    return generate_corpus(n)
