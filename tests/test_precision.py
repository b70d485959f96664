"""Production-precision plumbing: f32 vs f64 pipeline agreement.

The reference runs everything in f64 (+2^256 block scaling); production
TPU runs here use f32 so the Pallas pruning kernel engages.  This pins the
f32 pipeline log-likelihoods to the f64 conformance path within a
documented tolerance (VERDICT round-1 item 3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from linearham_tpu.models.phylo_hmm import PhyloHMM
from linearham_tpu.pipeline.run import run_pipeline_arrays
from linearham_tpu.utils.runtime import resolve_dtype
from linearham_tpu.utils.synth import make_family, make_tree_samples

# Documented tolerance: ~370-site family, ~860 xMSA columns, 4 rate cats.
# f32 pruning accumulates O(1e-5) relative error per site partial; the
# summed log-likelihood (magnitude ~1.3e3) stays within this bound.
F32_LOGLIK_ATOL = 0.05


@pytest.fixture(scope="module")
def family():
    return make_family(n_seqs=6, seed=3)


def _pipeline_logliks(family, dtype, n_trees=16):
    hmm = PhyloHMM.from_parts(
        family.locus, family.flexbounds, family.relpos, family.genes,
        family.msa, family.unique_ids, family.n_sites, seed=0, dtype=dtype,
    )
    samples = make_tree_samples(family, n_trees, seed=7)
    result = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0)
    return result.lh_loglik


def test_f32_pipeline_matches_f64(family):
    ll64 = _pipeline_logliks(family, jnp.float64)
    ll32 = _pipeline_logliks(family, jnp.float32)
    assert np.all(np.isfinite(ll64)) and np.all(np.isfinite(ll32))
    np.testing.assert_allclose(ll32, ll64, rtol=0, atol=F32_LOGLIK_ATOL)


def test_f32_kernel_deep_tree_error_bound():
    """f32 error at 120+ tips, where per-slot renormalization round-off
    compounds most (ops/pruning_pallas.py's in-kernel rescaling): the
    interpret-mode f32 Pallas kernel's site log-likelihoods vs the f64
    XLA path, bounded per site AND as a summed (total-loglik) error
    (VERDICT round-2 item 7; extends the 6-seq bound above to depth)."""
    import jax

    from linearham_tpu.ops.pruning import site_log_likelihoods
    from linearham_tpu.ops.pruning_pallas import site_log_likelihoods_pallas
    from linearham_tpu.pipeline.run import prepare_ensemble

    fam = make_family(n_seqs=120, seed=17, mutation_rate=0.04)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32,
    )
    samples = make_tree_samples(fam, 2, seed=17)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)
    assert n_slots >= 120 and hmm.xmsa.n_cols >= 700

    def to_dtype(dt):
        def conv(a):
            a = np.asarray(a)
            if np.issubdtype(a.dtype, np.floating):
                return jnp.asarray(a, dt)
            return jnp.asarray(a)
        return conv

    t64 = {k: to_dtype(jnp.float64)(v) for k, v in tree_arrays.items()}
    eig64 = jax.tree.map(to_dtype(jnp.float64), eig)
    pi64 = to_dtype(jnp.float64)(samples.pi)
    rates64 = to_dtype(jnp.float64)(rates)

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, hmm._xmsa_rows[perm], tparent, tlen,
            echild, eparent, elen, root, n_slots)

    want64 = np.asarray(jax.vmap(per_tree)(
        eig64, pi64, rates64, t64["tip_perm"], t64["tip_parent"],
        t64["tip_length"], t64["edge_child"], t64["edge_parent"],
        t64["edge_length"], t64["root_slot"]))

    from linearham_tpu.io.newick import TreeBatch
    from linearham_tpu.io.schedule import build_schedule

    sched = build_schedule(TreeBatch(
        tip_perm=np.asarray(tree_arrays["tip_perm"]),
        tip_parent=np.asarray(tree_arrays["tip_parent"]),
        tip_length=np.asarray(tree_arrays["tip_length"]),
        edge_child=np.asarray(tree_arrays["edge_child"]),
        edge_parent=np.asarray(tree_arrays["edge_parent"]),
        edge_length=np.asarray(tree_arrays["edge_length"]),
        root_slot=np.asarray(tree_arrays["root_slot"]),
        n_slots=n_slots,
    ))
    got32 = np.asarray(site_log_likelihoods_pallas(
        jax.tree.map(to_dtype(jnp.float32), eig),
        to_dtype(jnp.float32)(samples.pi), to_dtype(jnp.float32)(rates),
        hmm._xmsa_rows, jnp.asarray(sched.src), jnp.asarray(sched.penc),
        to_dtype(jnp.float32)(sched.length), jnp.asarray(sched.root),
        n_slots=sched.n_slots, interpret=True))

    diff = np.abs(got32 - want64)
    # Documented deep-tree bounds: per-site partials stay within 2e-3 in
    # log space at 120 tips; the summed per-tree error (the quantity that
    # reaches the reported log-likelihood) stays within the same 0.05
    # budget the 6-seq pipeline bound above pins.
    assert diff.max() < 2e-3, diff.max()
    assert np.abs((got32 - want64).sum(axis=1)).max() < 0.05


def test_resolve_dtype_explicit():
    assert resolve_dtype("f32") == jnp.float32
    assert resolve_dtype("f64") == jnp.float64
    # auto on the CPU test backend -> conformance precision
    assert resolve_dtype(None) == jnp.float64
    with pytest.raises(ValueError):
        resolve_dtype("bf16")


def test_emission_matmuls_use_highest_precision():
    """Regression guard for the round-5 importance-weight fix: the
    region-emission contractions sum hundreds of ~-26-magnitude site
    log-likelihoods, and TPU DEFAULT matmul precision rounds f32
    operands to bf16 — measured to random-walk per-tree loglik error to
    several nats at 312-seq depth, directly distorting the softmax
    importance weights (PERF_r05_f32_weights.json: centered std 2.37
    before, 0.12 after).  Every dot in region_emissions (and the naive
    pi-correction) must therefore carry Precision.HIGHEST."""
    import jax

    from linearham_tpu.models.phylo_hmm import region_emissions
    from linearham_tpu.models.phylo_hmm import _gather_consts

    fam = make_family(n_seqs=4, seed=2)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32)

    def f(site_ll):
        return region_emissions(site_ll, hmm._consts_np, heavy=True)

    jaxpr = jax.make_jaxpr(f)(
        jnp.zeros((3, hmm.xmsa.n_cols), jnp.float32))

    def dots(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "dot_general":
                yield eqn
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    yield from dots(sub.jaxpr)

    found = list(dots(jaxpr.jaxpr))
    assert found, "no dot_general in region_emissions?"
    for eqn in found:
        prec = eqn.params.get("precision")
        assert prec is not None and all(
            p == jax.lax.Precision.HIGHEST
            for p in (prec if isinstance(prec, tuple) else (prec,))), (
            f"emission dot without HIGHEST precision: {eqn}")
