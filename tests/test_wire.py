"""Packed single-buffer device placement (utils/wire.py)."""

import jax
import numpy as np
import pytest

from linearham_tpu.utils.wire import device_put_packed


def test_roundtrip_mixed_dtypes():
    rng = np.random.default_rng(0)
    tree = {
        "a": rng.random((3, 5)),
        "b": rng.random((7,)).astype(np.float32),
        "c": rng.integers(0, 100, (4, 4)).astype(np.int16),
        "d": rng.integers(0, 2, (2, 3)).astype(bool),
        "e": np.int32(7),
        "nested": {"f": rng.integers(0, 9, (6,)).astype(np.int32),
                   "g": rng.random((2, 2, 2)).astype(np.float32)},
        "empty": np.empty((0, 3), np.float32),
    }
    out = device_put_packed(tree)
    la, ta = jax.tree.flatten(tree)
    lb, tb = jax.tree.flatten(out)
    assert ta == tb
    for va, vb in zip(la, lb):
        assert np.asarray(va).dtype == np.asarray(vb).dtype
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_empty_tree():
    assert device_put_packed({}) == {}


def test_single_leaf():
    x = np.arange(12, dtype=np.float64).reshape(3, 4)
    out = device_put_packed(x)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_device_resident_leaves_pass_through():
    """A jax.Array leaf must NOT round-trip through host (that would pay
    the device->host read the module exists to avoid); it is returned
    as-is while numpy leaves still pack."""
    import jax.numpy as jnp

    dev = jnp.arange(6.0).reshape(2, 3)
    tree = {"host": np.ones((3,), np.int16), "dev": dev,
            "host2": np.full((2, 2), 2.5)}
    out = device_put_packed(tree)
    assert out["dev"] is dev
    np.testing.assert_array_equal(np.asarray(out["host"]), tree["host"])
    np.testing.assert_array_equal(np.asarray(out["host2"]), tree["host2"])
    assert np.asarray(out["host"]).dtype == np.int16
