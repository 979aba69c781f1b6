import jax
def test_cpu_8_devices():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
