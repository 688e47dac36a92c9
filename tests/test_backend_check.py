import jax
def test_backend():
    print("BACKEND:", jax.default_backend(), jax.devices())
    assert jax.default_backend() == "cpu"
