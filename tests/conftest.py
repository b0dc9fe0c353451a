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
def pages_500(tmp_path_factory):
    """The 500-row deterministic fixture corpus (FIXTURES.md §1)."""
    from valere_ocr_ray.sources.synth import synth_pages

    out = str(tmp_path_factory.mktemp("pages") / "sf0.001")
    synth_pages(out, 500)
    return out
