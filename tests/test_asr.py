"""ASR kernel tests: exact-marginal conformance + structural checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linearham_tpu.io.newick import parse_newick
from linearham_tpu.ops.asr import sample_ancestral_states
from linearham_tpu.ops.gtr import gamma_category_rates, gtr_eigen
from linearham_tpu.ops.pruning import compute_partials, per_rate_root_loglik

PI = np.array([0.17, 0.19, 0.25, 0.39])
ER = np.array([1.3, 2.2, 0.6, 1.0, 3.1, 0.8])


def _setup(seqs, newick, alpha=1.0, n_rates=4):
    tree = parse_newick(newick)
    lut = {c: i for i, c in enumerate("ACGT")}
    tips = np.array(
        [[lut.get(c, 4) for c in seqs[lab]] for lab in tree.tip_labels],
        np.int32)
    eig = gtr_eigen(ER, PI)
    eig = jax.tree.map(jnp.asarray, eig)
    rates = jnp.asarray(gamma_category_rates(alpha, n_rates))
    args = (
        eig, jnp.asarray(PI), rates, jnp.asarray(tips),
        jnp.asarray(tree.tip_parent), jnp.asarray(tree.tip_length),
        jnp.asarray(tree.edge_child), jnp.asarray(tree.edge_parent),
        jnp.asarray(tree.edge_length),
        jnp.asarray(tree.n_internal - 1), tree.n_internal + 1,
    )
    return tree, args


def test_asr_fixes_observed_tips_and_resolves_ambiguity():
    seqs = {"a": "ACGTN", "b": "ACGGA", "naive": "ANGTA"}
    tree, args = _setup(seqs, "((a:0.1,b:0.3):0.2,naive:0.15);")
    sample = sample_ancestral_states(jax.random.PRNGKey(0), *args)
    tips = np.asarray(sample.tip_states)
    labels = tree.tip_labels
    # Observed bases must be reproduced exactly; N sites get real bases.
    lut = {c: i for i, c in enumerate("ACGT")}
    for i, lab in enumerate(labels):
        for site, c in enumerate(seqs[lab]):
            if c in lut:
                assert tips[i, site] == lut[c], (lab, site)
            else:
                assert 0 <= tips[i, site] <= 3


def test_asr_root_marginal_matches_exact_posterior():
    """Empirical root-state frequencies vs the exact rate-mixed marginal."""
    seqs = {"a": "ACGTA", "b": "ACGGA", "naive": "AAGTA"}
    tree, args = _setup(seqs, "((a:0.4,b:0.6):0.3,naive:0.5);")
    (eig, pi, rates, tips, tip_parent, tip_length,
     edge_child, edge_parent, edge_length, root_slot, n_slots) = args

    partials, scale = compute_partials(
        eig, rates, tips, tip_parent, tip_length, edge_child, edge_parent,
        edge_length, n_slots)
    # Exact joint (rate, root state) weights per site.
    root = np.asarray(partials)[int(root_slot)]           # [R, 4, X]
    w = PI[None, :, None] * root * np.exp(np.asarray(scale))[:, None, :]
    marg = w.sum(0) / w.sum((0, 1))                       # [4, X]

    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    samp = jax.jit(jax.vmap(
        lambda k: sample_ancestral_states(k, *args).internal_states
    ))(keys)
    root_states = np.asarray(samp)[:, int(root_slot), :]  # [n, X]
    for site in range(root_states.shape[1]):
        emp = np.bincount(root_states[:, site], minlength=4) / n
        se = np.sqrt(marg[:, site] * (1 - marg[:, site]) / n)
        assert np.all(np.abs(emp - marg[:, site]) < 5 * se + 0.01), site


def test_asr_rate_marginal_matches_exact_posterior():
    seqs = {"a": "AG", "b": "AT", "naive": "AC"}
    tree, args = _setup(seqs, "((a:0.4,b:0.6):0.3,naive:0.5);", alpha=0.5)
    (eig, pi, rates, tips, tip_parent, tip_length,
     edge_child, edge_parent, edge_length, root_slot, n_slots) = args
    partials, scale = compute_partials(
        eig, rates, tips, tip_parent, tip_length, edge_child, edge_parent,
        edge_length, n_slots)
    per_rate = np.asarray(per_rate_root_loglik(
        partials, scale, pi, root_slot))                  # [R, X]
    exact = np.exp(per_rate - per_rate.max(0))
    exact /= exact.sum(0)

    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    ridx = np.asarray(jax.jit(jax.vmap(
        lambda k: sample_ancestral_states(k, *args).rate_idx))(keys))
    for site in range(ridx.shape[1]):
        emp = np.bincount(ridx[:, site], minlength=4) / n
        se = np.sqrt(exact[:, site] * (1 - exact[:, site]) / n)
        assert np.all(np.abs(emp - exact[:, site]) < 5 * se + 0.01), site
