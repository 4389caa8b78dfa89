import jax


def test_cpu_devices():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
