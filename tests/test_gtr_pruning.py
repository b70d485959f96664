"""Unit tests for the GTR/gamma machinery and the Newick parser."""

import jax.numpy as jnp
import numpy as np
import pytest

from linearham_tpu.io.newick import batch_trees, parse_newick
from linearham_tpu.ops.gtr import (
    gamma_category_rates,
    gtr_eigen,
    transition_matrices,
)


def test_gamma_rates_mean_one():
    for alpha in (0.3, 1.0, 2.5):
        rates = gamma_category_rates(alpha, 4)
        assert rates.shape == (4,)
        assert np.all(np.diff(rates) > 0)
        assert rates.mean() == pytest.approx(1.0, rel=1e-10)
    np.testing.assert_allclose(gamma_category_rates(1.7, 1), [1.0])


def test_gtr_transition_matrix_properties():
    er = jnp.asarray([1.2, 2.0, 0.7, 1.1, 3.0, 0.5], jnp.float64)
    pi = jnp.asarray([0.17, 0.19, 0.25, 0.39], jnp.float64)
    eig = gtr_eigen(er, pi)
    P = transition_matrices(eig, jnp.asarray([0.0, 0.1, 2.0]))
    # Rows sum to 1; P(0) = I; stationarity pi P = pi.
    np.testing.assert_allclose(np.asarray(P).sum(-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(P[0]), np.eye(4), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pi) @ np.asarray(P[2]),
                               np.asarray(pi), atol=1e-12)
    # Expected substitutions per unit time is 1 (normalized Q).
    dt = 1e-6
    Pdt = np.asarray(transition_matrices(eig, jnp.asarray([dt]))[0])
    rate = -(np.asarray(pi) * np.log(np.diag(Pdt))).sum() / dt
    assert rate == pytest.approx(1.0, rel=1e-4)


def test_newick_parse_trifurcating():
    t = parse_newick("((0:0.2, 1:0.4):0.6, naive:0.3, 2:0.5);")
    assert t.tip_labels == ["0", "1", "naive", "2"]
    assert t.n_internal == 2
    np.testing.assert_allclose(t.tip_length, [0.2, 0.4, 0.3, 0.5])
    # Tips 0,1 hang off internal 0; naive and 2 off the root (internal 1).
    np.testing.assert_array_equal(t.tip_parent, [0, 0, 1, 1])
    np.testing.assert_array_equal(t.edge_child, [0])
    np.testing.assert_array_equal(t.edge_parent, [1])
    np.testing.assert_allclose(t.edge_length, [0.6])


def test_newick_missing_lengths_and_comments():
    t = parse_newick("((a,b[&index=3]:0.5):1e-2,c);")
    assert t.tip_labels == ["a", "b", "c"]
    np.testing.assert_allclose(t.tip_length, [1e-6, 0.5, 1e-6])
    np.testing.assert_allclose(t.edge_length, [1e-2])


def test_newick_rejects_garbage():
    with pytest.raises(ValueError):
        parse_newick("((a,b)")  # no semicolon
    with pytest.raises(ValueError):
        parse_newick("")


def test_batch_trees_padding():
    t1 = parse_newick("((a:1,b:2):3,(c:4,d:5):6);")
    t2 = parse_newick("(a:1,b:2,c:3,d:4);")
    tb = batch_trees([t1, t2], ["naive", "a", "b", "c", "d"][1:])
    assert tb.n_trees == 2
    assert tb.n_slots == 4        # 3 internal slots (t1) + sink
    # t2 has no internal edges: all padded to the sink with length 0.
    assert (tb.edge_child[1] == tb.n_slots - 1).all()
    np.testing.assert_allclose(tb.edge_length[1], 0.0)
    with pytest.raises(ValueError):
        batch_trees([t1], ["a", "b", "c"])       # wrong tip count
    with pytest.raises(ValueError):
        batch_trees([t1], ["a", "b", "c", "x"])  # unknown label
