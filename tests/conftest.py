import pytest


@pytest.fixture(scope="session", autouse=True)
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

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # pandas conversion of uniform list<float> columns otherwise trips
    # Ray's TensorArray auto-cast on batches with null rows
    ctx.enable_tensor_extension_casting = False
    yield
    ray.shutdown()
