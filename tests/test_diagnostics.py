"""Diagnostics utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from upgpt_tpu.utils.diagnostics import PhaseTimer, count_params, nan_guard


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2 and "a" in t.summary()


def test_nan_guard():
    ok = {"x": jnp.ones((3,)), "i": jnp.zeros((2,), jnp.int32)}
    assert bool(nan_guard(ok))
    bad = {"x": jnp.asarray([1.0, float("nan")])}
    with pytest.raises(FloatingPointError):
        nan_guard(bad, "bad")


def test_count_params():
    tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros((4,))}}
    assert count_params(tree) == 10
