import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver instruction)."""
    import ray

    if not ray.is_initialized():
        # workers must import raylink even when pytest runs from another
        # cwd — they inherit the driver's environment, so extending
        # PYTHONPATH before init covers every task/actor in the session
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        if repo not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{repo}{os.pathsep}{existing}" if existing else repo
            )
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_lists():
    """The reference's canonical 6x3 fixture (tests/utils.py:1-4)."""
    from_list = ["apple", "apples", "appl", "recal", "house", "similarity"]
    to_list = ["apple", "apples", "mouse"]
    return from_list, to_list
