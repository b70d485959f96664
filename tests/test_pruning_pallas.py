"""Pallas pruning kernel vs the jnp reference path (interpret mode on CPU).

The kernel itself runs compiled only on TPU (exercised by bench.py and the
driver's compile checks); here it runs under the Pallas interpreter against
``ops.pruning.site_log_likelihoods`` on a synthetic tree ensemble, so the
numerics contract (treatAmbiguousAsGap N handling, padded sink edges,
per-slot renormalization, rate mixing) is pinned on every platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linearham_tpu.models.phylo_hmm import PhyloHMM
from linearham_tpu.ops.pruning import site_log_likelihoods
from linearham_tpu.ops.pruning_pallas import site_log_likelihoods_pallas
from linearham_tpu.pipeline.run import prepare_ensemble
from linearham_tpu.utils.synth import make_family, make_tree_samples


@pytest.fixture(scope="module")
def ensemble():
    fam = make_family(n_seqs=5, seed=3)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, 9, seed=3)   # odd T: exercises padding
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig = jax.tree.map(to_dev, eig)
    return hmm, tree, eig, to_dev(samples.pi), to_dev(rates), n_slots


def test_kernel_matches_jnp_path(ensemble):
    hmm, tree, eig, pi, rates, n_slots = ensemble

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = jax.vmap(per_tree)(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])

    got = site_log_likelihoods_pallas(
        eig, pi, rates, hmm._xmsa_rows, tree["tip_perm"],
        tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"], n_slots=n_slots, trees_per_block=8,
        interpret=True)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_handles_ambiguous_tips(ensemble):
    """A tip row of all-N must contribute exactly nothing (msg == 1)."""
    hmm, tree, eig, pi, rates, n_slots = ensemble
    # Point every tree's tip 0 at a new all-N xMSA row.
    n_rows = hmm._xmsa_rows.shape[0]
    rows_n = jnp.concatenate(
        [hmm._xmsa_rows, jnp.full((1, hmm._xmsa_rows.shape[1]), 4,
                                  hmm._xmsa_rows.dtype)], axis=0)
    perm_n = tree["tip_perm"].at[:, 0].set(n_rows)
    all_n = jnp.take(rows_n, perm_n, axis=0)

    def per_tree(eig_t, pi_t, rates_t, tips, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, tips, tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = jax.vmap(per_tree)(
        eig, pi, rates, all_n, tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"])
    got = site_log_likelihoods_pallas(
        eig, pi, rates, rows_n, perm_n, tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"], n_slots=n_slots,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_blocked_paths_match(monkeypatch):
    """Deep trees: site blocking, SMEM tree-chunking, and the fori-loop
    body (non-unrolled) must agree with the jnp path."""
    import linearham_tpu.ops.pruning_pallas as pp

    fam = make_family(n_seqs=40, seed=7)   # tips+E > 64 -> fori path
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, 5, seed=7)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 2)

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig = jax.tree.map(to_dev, eig)
    pi, rates = to_dev(samples.pi), to_dev(rates)

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = jax.vmap(per_tree)(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])

    # Force several site blocks and several tree chunks.
    monkeypatch.setattr(pp, "_SCRATCH_BYTES", 2 * 1024 * 1024)
    monkeypatch.setattr(pp, "_SMEM_BYTES", 4 * 1024)
    got = pp.site_log_likelihoods_pallas.__wrapped__(   # skip jit cache
        eig, pi, rates, hmm._xmsa_rows, tree["tip_perm"],
        tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"], n_slots=n_slots, trees_per_block=8,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_kernel_deep_tree_production_width():
    """A 300+-tip family at production xMSA width through the interpreter:
    pins the site-blocking / SMEM tree-chunking math at the shapes the Liao
    CH103 dataset produces (VERDICT round-1 item 9)."""
    fam = make_family(n_seqs=300, seed=13, mutation_rate=0.03)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, 1, seed=13)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)
    assert n_slots >= 300 and hmm.xmsa.n_cols >= 700

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig = jax.tree.map(to_dev, eig)
    pi, rates = to_dev(samples.pi), to_dev(rates)

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = jax.vmap(per_tree)(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])
    got = site_log_likelihoods_pallas(
        eig, pi, rates, hmm._xmsa_rows, tree["tip_perm"],
        tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"], n_slots=n_slots, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU (LINEARHAM_TEST_TPU=1)")
def test_kernel_compiled_on_tpu_matches_xla():
    """The COMPILED Mosaic kernel vs the XLA path on device -- catches
    Mosaic regressions the interpreter cannot see."""
    fam = make_family(n_seqs=8, seed=5)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, 16, seed=5)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig = jax.tree.map(to_dev, eig)
    pi, rates = to_dev(samples.pi), to_dev(rates)

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = jax.jit(jax.vmap(per_tree))(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])
    got = site_log_likelihoods_pallas(   # compiled: no interpret flag
        eig, pi, rates, hmm._xmsa_rows, tree["tip_perm"],
        tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"], n_slots=n_slots)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_kernel_single_rate_and_zero_branches():
    """R=1 shapes and t=0 edges with conflicting tips (-inf sites) must
    agree with the jnp path."""
    fam = make_family(n_seqs=4, seed=11)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, 3, seed=11)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 1)

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    # Zero every branch: identity transitions, so any site where two tips
    # under a cherry disagree has exactly zero likelihood.
    tree["tip_length"] = jnp.zeros_like(tree["tip_length"])
    tree["edge_length"] = jnp.zeros_like(tree["edge_length"])
    eig = jax.tree.map(to_dev, eig)
    pi, rates = to_dev(samples.pi), to_dev(rates)

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = np.asarray(jax.vmap(per_tree)(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"]))

    got = np.asarray(site_log_likelihoods_pallas(
        eig, pi, rates, hmm._xmsa_rows, tree["tip_perm"],
        tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"], n_slots=n_slots, interpret=True))

    assert np.isneginf(want).any()          # the scenario actually fires
    # Whether an impossible site lands at exactly -inf or at log of the
    # ~1e-7 eigenbasis round-trip residual (~-30) is f32 implementation
    # noise; the contract is: no NaNs, impossible sites hugely negative,
    # possible sites matching.
    assert not np.isnan(got).any()
    impossible = want < -15
    assert (got[impossible] < -15).all()
    ok = ~impossible
    np.testing.assert_allclose(got[ok], want[ok], rtol=2e-4, atol=2e-4)


def test_kernel_tree_chunks_are_equal_shape(monkeypatch):
    """When the tree batch exceeds the SMEM budget it splits into
    EQUAL-size chunks (one compiled kernel shape), and the chunked result
    matches the jnp path including the ragged final chunk."""
    import linearham_tpu.ops.pruning_pallas as pp

    fam = make_family(n_seqs=6, seed=5)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    T = 21  # pads to 24; with Tc forced to 8 -> 3 equal chunks
    samples = make_tree_samples(fam, T, seed=5)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 2)

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig = jax.tree.map(to_dev, eig)
    pi, rates = to_dev(samples.pi), to_dev(rates)

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = jax.vmap(per_tree)(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])

    # Force Tc down to the trees_per_block floor (8) so Tp=24 -> 3 chunks.
    monkeypatch.setattr(pp, "_SMEM_BYTES", 1)
    calls = []
    orig = pp._pruning_chunk

    def spy(topo_c, lengths_c, codes, u_c, *args, **kw):
        # Record each chunk's (tree, site) output shape; the pallas_call
        # itself now sits behind a module-level jit (traced once per
        # shape), so the chunk boundary is the observable.
        calls.append((u_c.shape[0], codes.shape[2]))
        return orig(topo_c, lengths_c, codes, u_c, *args, **kw)

    monkeypatch.setattr(pp, "_pruning_chunk", spy)
    got = pp.site_log_likelihoods_pallas.__wrapped__(   # skip jit cache
        eig, pi, rates, hmm._xmsa_rows, tree["tip_perm"],
        tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"], n_slots=n_slots, trees_per_block=8,
        interpret=True)
    assert len(calls) == 3
    assert len(set(calls)) == 1, f"chunk shapes differ: {calls}"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU (LINEARHAM_TEST_TPU=1)")
def test_kernel_compiled_on_tpu_single_rate():
    """COMPILED R=1: Mosaic rejects the [1,1,1]->[1,4,4] broadcast the
    kernel's pmat needs at a single rate category (interpret mode never
    sees this); the kernel duplicates the category — an exact identity
    under the final mean-over-categories mix — and must match the XLA
    path on device."""
    fam = make_family(n_seqs=6, seed=21)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, 8, seed=21)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 1)

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig = jax.tree.map(to_dev, eig)
    pi, rates = to_dev(samples.pi), to_dev(rates)
    assert rates.shape[1] == 1

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want = jax.jit(jax.vmap(per_tree))(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])
    got = site_log_likelihoods_pallas(   # compiled: no interpret flag
        eig, pi, rates, hmm._xmsa_rows, tree["tip_perm"],
        tree["tip_parent"], tree["tip_length"],
        tree["edge_child"], tree["edge_parent"], tree["edge_length"],
        tree["root_slot"], n_slots=n_slots)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
