import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (required by the driver)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    import ray.data
    # progress bars cost ~0.3-0.7 s setup/teardown per executed pipeline
    ray.data.DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()
