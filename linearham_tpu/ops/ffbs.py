"""Forward-filtering backward-sampling (FFBS) of hidden V(D)J paths.

Draws posterior hidden-state paths (not Viterbi) from the cached forward
vectors: the J germline state is drawn from the final forward vector, then
junction rows are walked backwards, each draw a categorical over
transition-column x forward-row, then the preceding germline state, and so
on down to V (reference semantics: src/HMM.cpp:358-431, 1180-1353).

Batched over trees: one path per tree per call.  RNG is JAX's counter-based
PRNG, so sampled paths are reproducible but deliberately NOT bit-identical
to the reference's std::mt19937 stream; conformance is distributional (see
test_ffbs_samples_true_posterior in tests/test_simple_hmm.py).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from linearham_tpu.ops.forward import ForwardCache


class SampledPath(NamedTuple):
    vgerm_idx: jnp.ndarray            # [T]
    vd_idx: jnp.ndarray               # [T, R1]
    dgerm_idx: Optional[jnp.ndarray]  # [T] (igh only)
    dj_idx: Optional[jnp.ndarray]     # [T, R2] (igh only)
    jgerm_idx: jnp.ndarray            # [T]


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(jnp.maximum(x, 0.0))


def _sample_junction_backward(
    key: jnp.ndarray,
    exit_cols: jnp.ndarray,     # [T, S] column of junction->germ for the
                                #        already-sampled downstream state
    junction: jnp.ndarray,      # [S, S]
    rows_u: jnp.ndarray,        # [R, T, S] forward rows
) -> jnp.ndarray:
    """Walk junction rows last-to-first; returns indices [T, R]."""
    n_rows = rows_u.shape[0]

    def step(carry, inp):
        col_logits = carry            # [T, S] log transition into downstream
        row_u, subkey = inp
        logits = col_logits + _safe_log(row_u)
        idx = jax.random.categorical(subkey, logits, axis=-1)  # [T]
        next_col = _safe_log(junction[:, idx].T)               # [T, S]
        return next_col, idx

    keys = jax.random.split(key, n_rows)
    _, idx_rev = jax.lax.scan(
        step,
        _safe_log(exit_cols),
        (rows_u[::-1], keys),
    )
    return idx_rev[::-1].T  # [T, R]


def _sample_germline(
    key: jnp.ndarray,
    germ_junction: jnp.ndarray,   # [G, S] germline -> junction transition
    first_junction_idx: jnp.ndarray,  # [T]
    germ_u: jnp.ndarray,          # [T, G]
) -> jnp.ndarray:
    logits = _safe_log(germ_junction[:, first_junction_idx].T) \
        + _safe_log(germ_u)
    return jax.random.categorical(key, logits, axis=-1)


def sample_path(
    key: jnp.ndarray,
    trans: Dict[str, jnp.ndarray],
    cache: ForwardCache,
    heavy: bool,
) -> SampledPath:
    """Draw one posterior hidden path per tree."""
    k_j, k_dj, k_dg, k_vd, k_vg = jax.random.split(key, 5)

    jgerm_idx = jax.random.categorical(
        k_j, _safe_log(cache.jgerm_u), axis=-1)

    if heavy:
        dj_idx = _sample_junction_backward(
            k_dj, trans["dj_jgerm"][:, jgerm_idx].T,
            trans["dj"], cache.dj_u,
        )
        dgerm_idx = _sample_germline(
            k_dg, trans["dgerm_dj"], dj_idx[:, 0], cache.dgerm_u)
        vd_idx = _sample_junction_backward(
            k_vd, trans["vd_dgerm"][:, dgerm_idx].T,
            trans["vd"], cache.vd_u,
        )
    else:
        dj_idx = dgerm_idx = None
        vd_idx = _sample_junction_backward(
            k_vd, trans["vd_dgerm"][:, jgerm_idx].T,
            trans["vd"], cache.vd_u,
        )

    vgerm_idx = _sample_germline(
        k_vg, trans["vgerm_vd"], vd_idx[:, 0], cache.vgerm_u)

    return SampledPath(
        vgerm_idx=vgerm_idx,
        vd_idx=vd_idx,
        dgerm_idx=dgerm_idx,
        dj_idx=dj_idx,
        jgerm_idx=jgerm_idx,
    )


@functools.partial(jax.jit, static_argnames=("heavy",))
def sample_paths_batch(keys, trans: Dict, cache: ForwardCache, heavy: bool):
    """n independent FFBS draws vmapped over keys (one compiled program).

    Module-level and jitted once so repeated ``sample_annotations`` calls
    hit the compilation cache instead of retracing a fresh closure.
    """
    return jax.vmap(lambda k: sample_path(k, trans, cache, heavy))(keys)
