"""Batched Felsenstein pruning over xMSA columns (the phylo hot kernel).

Computes per-site phylogenetic log-likelihoods for every xMSA column under
GTR+Gamma, vectorized over sites and rate categories and vmapped over the
posterior tree batch.  This replaces libpll's TraversalUpdate/LogLikelihood
(reference boundary: src/PhyloHMM.cpp:220-238).

Encoding (see io.newick.TreeBatch): every tip has exactly one parent edge,
so tip contributions are a single batched gather + segment-product; the
remaining internal edges are walked with lax.scan in post-order, each step
one [X, 4] x [4, 4] contraction per rate, with per-site renormalization
feeding an explicit log-scale accumulator (no 2^256 tricks).

Ambiguity: tip code >= 4 (N) means an all-ones partial, i.e. the gap
semantics the reference uses (treatAmbiguousAsGap; note rows of P(t) sum
to 1 so an N-tip contributes exactly 1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from linearham_tpu.ops.gtr import GTREigen, transition_matrices


def _tip_contrib(P: jnp.ndarray, states: jnp.ndarray) -> jnp.ndarray:
    """Per-tip partial-product contribution at its parent.

    P: [n_tips, R, 4, 4]; states: [n_tips, X] codes with 4 == ambiguous.
    Returns [n_tips, R, X, 4]: column `states[x]` of P, or ones for N.
    """
    clamped = jnp.minimum(states, 3)
    cols = jnp.take_along_axis(
        P[:, :, None, :, :],                        # [tips, R, 1, 4i, 4j]
        clamped[:, None, :, None, None].astype(jnp.int32), axis=-1,
    )[..., 0]                                       # [tips, R, X, 4i]
    return jnp.where((states < 4)[:, None, :, None], cols, 1.0)


def site_log_likelihoods(
    eig: GTREigen,
    pi: jnp.ndarray,          # [4]
    rates: jnp.ndarray,       # [R]
    tip_states: jnp.ndarray,  # [n_tips, X] xMSA codes permuted to tip slots
    tip_parent: jnp.ndarray,  # [n_tips] internal slot ids
    tip_length: jnp.ndarray,  # [n_tips]
    edge_child: jnp.ndarray,  # [E] internal slots (post-order)
    edge_parent: jnp.ndarray, # [E]
    edge_length: jnp.ndarray, # [E]
    root_slot: jnp.ndarray,   # [] int
    n_slots: int,             # static: internal slots incl. sink
) -> jnp.ndarray:
    """Per-site log-likelihood [X] for one tree (vmap over a batch)."""
    R = rates.shape[0]
    X = tip_states.shape[1]
    dtype = eig.u.dtype

    # --- tips: one gather + segment-product ------------------------------
    P_tip = transition_matrices(eig, tip_length[:, None] * rates[None, :])
    contrib = _tip_contrib(P_tip, tip_states)       # [tips, R, X, 4]
    partials = jax.ops.segment_prod(
        contrib, tip_parent, num_segments=n_slots)   # [slots, R, X, 4]
    # Sink/untouched slots must be 1, and segment_prod fills empties with 1.

    norm = jnp.max(partials, axis=-1, keepdims=True)
    norm = jnp.where(norm > 0, norm, 1.0)
    partials = partials / norm
    scale = jnp.sum(jnp.log(norm[..., 0]), axis=0)   # [R, X]

    # --- internal edges: post-order scan ---------------------------------
    P_edge = transition_matrices(eig, edge_length[:, None] * rates[None, :])

    def step(carry, inp):
        partials, scale = carry
        child, parent, P = inp                       # P: [R, 4, 4]
        msg = jnp.einsum("rxj,rij->rxi", partials[child], P)
        upd = partials[parent] * msg
        m = jnp.max(upd, axis=-1, keepdims=True)
        m = jnp.where(m > 0, m, 1.0)
        partials = partials.at[parent].set(upd / m)
        scale = scale + jnp.log(m[..., 0])
        return (partials, scale), None

    (partials, scale), _ = jax.lax.scan(
        step, (partials, scale), (edge_child, edge_parent, P_edge)
    )

    root = partials[root_slot]                       # [R, X, 4]
    per_rate = jnp.log(jnp.einsum("rxi,i->rx", root, pi)) + scale
    return jax.scipy.special.logsumexp(per_rate, axis=0) - jnp.log(
        jnp.asarray(R, dtype))
