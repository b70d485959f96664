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


def test_resolve_dtype_explicit():
    assert resolve_dtype("f32") == jnp.float32
    assert resolve_dtype("f64") == jnp.float64
    # auto on the CPU test backend -> conformance precision
    assert resolve_dtype(None) == jnp.float64
    with pytest.raises(ValueError):
        resolve_dtype("bf16")
