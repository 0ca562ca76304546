import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.utils.debug import assert_all_finite, checked, disable_jit


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # nan for negative input

    with pytest.raises(Exception):
        checked(bad)(jnp.array([-1.0]))


def test_checked_passes_clean():
    out = checked(lambda x: x * 2)(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)}, "params")
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite({"a": jnp.array([1.0, np.nan])}, "params")


def test_disable_jit_context():
    with disable_jit():
        out = jnp.sum(jnp.ones(4))
    assert float(out) == 4.0
