import pytest


@pytest.fixture(scope="session")
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    """Small deterministic pages table shared across the session."""
    from textpipe_ray.sources.pages import write_pages

    out = tmp_path_factory.mktemp("pages")
    write_pages(out, 300, num_files=4)
    return str(out)
