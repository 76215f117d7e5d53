import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session per pytest run (SURVEY.md §5 / driver contract)."""
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
def pages_small(tmp_path_factory):
    """Deterministic 1000-row pages fixture (FIXTURES.md §B), cached in
    /tmp across test runs."""
    from fixtures.gen_pages import generate

    out = "/tmp/crawtext_ray_fixtures"
    os.makedirs(out, exist_ok=True)
    return generate(out, "small")


@pytest.fixture(scope="session")
def truth_small(pages_small):
    import pyarrow.dataset as pds

    truth_dir = pages_small.replace("pages_", "truth_")
    return pds.dataset(truth_dir).to_table().to_pandas()
