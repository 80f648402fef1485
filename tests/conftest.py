import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_fixture():
    from nise_ray.fixtures import gen_corpus
    return gen_corpus(seed=42, n_base=80, max_lines=120)
