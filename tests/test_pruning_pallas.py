"""Pallas pruning kernel vs the jnp reference path (interpret mode on CPU).

The kernel itself runs compiled only on TPU (exercised by bench.py and the
driver's compile checks); here it runs under the Pallas interpreter against
``ops.pruning.site_log_likelihoods`` on a synthetic tree ensemble, so the
numerics contract (treatAmbiguousAsGap N handling, slot-reuse schedules
with first-write flags and sink padding, strided renormalization, rate
mixing) is pinned on every platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linearham_tpu.io.schedule import build_schedule
from linearham_tpu.models.phylo_hmm import PhyloHMM
from linearham_tpu.ops.pruning import site_log_likelihoods
from linearham_tpu.ops.pruning_pallas import site_log_likelihoods_pallas
from linearham_tpu.utils.synth import make_family, make_tree_samples


def _build(seed, n_seqs, T, num_rates=4, **kw):
    """(hmm, tree dict, sched args, eig, pi, rates, n_slots) on CPU f32."""
    fam = make_family(n_seqs=n_seqs, seed=seed, **kw)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, T, seed=seed)
    # Build BOTH encodings explicitly (prepare_ensemble picks one per
    # backend): TreeBatch arrays feed the jnp reference path, the
    # slot-reuse schedule feeds the kernel.
    from linearham_tpu.io.native import parse_newicks_batch
    from linearham_tpu.io.newick import batch_trees, parse_newick
    from linearham_tpu.ops.gtr import (gamma_category_rates_batch,
                                       gtr_eigen)

    tb = parse_newicks_batch(samples.newicks, hmm.xmsa.labels)
    if tb is None:
        tb = batch_trees([parse_newick(nw) for nw in samples.newicks],
                         hmm.xmsa.labels)
    n_slots = tb.n_slots
    ta = {
        "tip_perm": tb.tip_perm,
        "tip_parent": tb.tip_parent,
        "tip_length": np.asarray(tb.tip_length, np.float64),
        "edge_child": tb.edge_child,
        "edge_parent": tb.edge_parent,
        "edge_length": np.asarray(tb.edge_length, np.float64),
        "root_slot": tb.root_slot,
    }
    rates = gamma_category_rates_batch(samples.alpha, num_rates)
    eig = gtr_eigen(samples.er, samples.pi)
    sched = build_schedule(tb)

    def to_dev(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in ta.items()}
    sched_args = (to_dev(sched.src), to_dev(sched.penc),
                  to_dev(sched.length), to_dev(sched.root))
    eig = jax.tree.map(to_dev, eig)
    return (hmm, tree, sched_args, eig, to_dev(samples.pi),
            to_dev(rates), n_slots, sched.n_slots)


def _want(hmm, tree, eig, pi, rates, n_slots, rows=None):
    rows_arr = hmm._xmsa_rows if rows is None else rows

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, rows_arr[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    return jax.vmap(per_tree)(
        eig, pi, rates, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])


@pytest.fixture(scope="module")
def ensemble():
    return _build(3, 5, 9)   # odd T: exercises tree padding


def test_kernel_matches_jnp_path(ensemble):
    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = ensemble
    want = _want(hmm, tree, eig, pi, rates, n_slots)
    got = site_log_likelihoods_pallas(
        eig, pi, rates, hmm._xmsa_rows, *sched_args, n_slots=s_slots,
        trees_per_block=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_handles_ambiguous_tips(ensemble):
    """A tip row of all-N must contribute exactly nothing (msg == 1)."""
    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = ensemble
    # Point every tree's tip slot 0 at a new all-N xMSA row.  In the
    # schedule encoding tip rows live in sched_src (is_tip entries); remap
    # every reference to the original row of tip slot 0.
    n_rows = hmm._xmsa_rows.shape[0]
    rows_n = jnp.concatenate(
        [hmm._xmsa_rows, jnp.full((1, hmm._xmsa_rows.shape[1]), 4,
                                  hmm._xmsa_rows.dtype)], axis=0)
    src, penc, length, root = sched_args
    target = tree["tip_perm"][:, 0:1]                     # [T, 1]
    is_tip = (penc & 1) == 1
    src_n = jnp.where(is_tip & (src == target), n_rows, src)

    perm_n = tree["tip_perm"].at[:, 0].set(n_rows)
    tree_n = dict(tree, tip_perm=perm_n)
    want = _want(hmm, tree_n, eig, pi, rates, n_slots, rows=rows_n)
    got = site_log_likelihoods_pallas(
        eig, pi, rates, rows_n, src_n, penc, length, root,
        n_slots=s_slots, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_blocked_paths_match(monkeypatch):
    """Deep trees: site blocking, SMEM tree-chunking, and the fori-loop
    body (non-unrolled) must agree with the jnp path."""
    import linearham_tpu.ops.pruning_pallas as pp

    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = _build(
        7, 40, 5, num_rates=2)
    want = _want(hmm, tree, eig, pi, rates, n_slots)

    # Force several site blocks and several tree chunks.
    monkeypatch.setattr(pp, "_SCRATCH_BYTES", 1024 * 1024)
    monkeypatch.setattr(pp, "_SMEM_BYTES", 4 * 1024)
    got = pp.site_log_likelihoods_pallas.__wrapped__(   # skip jit cache
        eig, pi, rates, hmm._xmsa_rows, *sched_args, n_slots=s_slots,
        trees_per_block=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_kernel_deep_tree_production_width():
    """A 300+-tip family at production xMSA width through the interpreter:
    pins the schedule-driven kernel at the shapes the Liao CH103 dataset
    produces.  With slot reuse the partials scratch is ~8 slots, so the
    site block covers the whole xMSA in one pass."""
    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = _build(
        13, 300, 1, mutation_rate=0.03)
    assert n_slots >= 300 and hmm.xmsa.n_cols >= 700
    assert s_slots <= 16      # the collapse this kernel design is built on
    want = _want(hmm, tree, eig, pi, rates, n_slots)
    got = site_log_likelihoods_pallas(
        eig, pi, rates, hmm._xmsa_rows, *sched_args, n_slots=s_slots,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU (LINEARHAM_TEST_TPU=1)")
def test_kernel_compiled_on_tpu_matches_xla():
    """The COMPILED Mosaic kernel vs the XLA path on device -- catches
    Mosaic regressions the interpreter cannot see."""
    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = _build(
        5, 8, 16)
    want = jax.jit(
        lambda *a: _want(hmm, tree, eig, pi, rates, n_slots))()
    got = site_log_likelihoods_pallas(   # compiled: no interpret flag
        eig, pi, rates, hmm._xmsa_rows, *sched_args, n_slots=s_slots)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_kernel_single_rate_and_zero_branches():
    """R=1 shapes and t=0 edges with conflicting tips (-inf sites) must
    agree with the jnp path."""
    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = _build(
        11, 4, 3, num_rates=1)
    # Zero every branch: identity transitions, so any site where two tips
    # under a cherry disagree has exactly zero likelihood.
    tree = dict(tree,
                tip_length=jnp.zeros_like(tree["tip_length"]),
                edge_length=jnp.zeros_like(tree["edge_length"]))
    src, penc, length, root = sched_args
    sched_args = (src, penc, jnp.zeros_like(length), root)

    want = np.asarray(_want(hmm, tree, eig, pi, rates, n_slots))
    got = np.asarray(site_log_likelihoods_pallas(
        eig, pi, rates, hmm._xmsa_rows, *sched_args, n_slots=s_slots,
        interpret=True))

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

    # T=21 pads to 24; with Tc forced to 8 -> 3 equal chunks.
    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = _build(
        5, 6, 21, num_rates=2)
    want = _want(hmm, tree, eig, pi, rates, n_slots)

    monkeypatch.setattr(pp, "_SMEM_BYTES", 1)
    calls = []
    orig = pp._pruning_chunk

    def spy(topo_c, lengths_c, codes, u_c, *args, **kw):
        calls.append((u_c.shape[0], codes.shape[2]))
        return orig(topo_c, lengths_c, codes, u_c, *args, **kw)

    monkeypatch.setattr(pp, "_pruning_chunk", spy)
    got = pp.site_log_likelihoods_pallas.__wrapped__(   # skip jit cache
        eig, pi, rates, hmm._xmsa_rows, *sched_args, n_slots=s_slots,
        trees_per_block=8, interpret=True)
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
    hmm, tree, sched_args, eig, pi, rates, n_slots, s_slots = _build(
        21, 6, 8, num_rates=1)
    assert rates.shape[1] == 1
    want = jax.jit(
        lambda: _want(hmm, tree, eig, pi, rates, n_slots))()
    got = site_log_likelihoods_pallas(   # compiled: no interpret flag
        eig, pi, rates, hmm._xmsa_rows, *sched_args, n_slots=s_slots)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
