"""Viterbi (MAP) hidden-path decoding.

Same chain structure as the forward pass but with max-product semantics
and argmax backtrace, batched over trees.  The reference exposes only
posterior sampling; the MAP annotation is a cheap, deterministic summary
worth having next to it (same tensors, same decode vocabulary).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from linearham_tpu.ops.ffbs import SampledPath


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(jnp.maximum(x, 0.0))


def _junction_max(
    germ_log: jnp.ndarray,        # [T, G] entry log scores
    germ_junction: jnp.ndarray,   # [G, S]
    junction: jnp.ndarray,        # [S, S]
    emis_log: jnp.ndarray,        # [T, R, S]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Max-product over junction rows.

    Returns (score [T, S] at the last row, germ backpointer rows
    [T, S] for row 0, junction backpointers [R-1, T, S]).
    """
    scores0 = germ_log[:, :, None] + _safe_log(germ_junction)[None]
    bp0 = jnp.argmax(scores0, axis=1)                       # [T, S]
    v0 = jnp.max(scores0, axis=1) + emis_log[:, 0]

    log_tr = _safe_log(junction)

    def step(v, e_row):
        scores = v[:, :, None] + log_tr[None]               # [T, S, S]
        bp = jnp.argmax(scores, axis=1)
        v_next = jnp.max(scores, axis=1) + e_row
        return v_next, bp

    v_last, bps = jax.lax.scan(
        step, v0, jnp.moveaxis(emis_log[:, 1:], 0, 1))
    return v_last, bp0, bps


def _backtrace(last_idx, bps, bp0):
    """Walk junction backpointers; returns (row indices [T, R], germ idx)."""

    def step(idx, bp):
        prev = jnp.take_along_axis(bp, idx[:, None], axis=1)[:, 0]
        return prev, prev

    first_idx, rows_rev = jax.lax.scan(
        step, last_idx, bps[::-1])
    rows = jnp.concatenate(
        [rows_rev[::-1], last_idx[None]], axis=0).T        # [T, R]
    germ_idx = jnp.take_along_axis(bp0, first_idx[:, None], axis=1)[:, 0]
    return rows, germ_idx


def viterbi(
    trans: Dict[str, jnp.ndarray],
    emis: Dict[str, jnp.ndarray],
    heavy: bool,
) -> Tuple[jnp.ndarray, SampledPath]:
    """MAP path and its joint log-probability per tree.

    Same inputs as ops.forward.forward; returns (score [T], path).
    """
    vgerm_log = (
        trans["vgerm_static_log"][None] + emis["vpadding"] + emis["vgerm"])

    vd_last, vd_bp0, vd_bps = _junction_max(
        vgerm_log, trans["vgerm_vd"], trans["vd"], emis["vd_junction"])

    if heavy:
        d_scores = vd_last[:, :, None] + _safe_log(trans["vd_dgerm"])[None]
        d_bp = jnp.argmax(d_scores, axis=1)
        dgerm_log = jnp.max(d_scores, axis=1) + emis["dgerm"]

        dj_last, dj_bp0, dj_bps = _junction_max(
            dgerm_log, trans["dgerm_dj"], trans["dj"], emis["dj_junction"])
        j_scores = dj_last[:, :, None] + _safe_log(trans["dj_jgerm"])[None]
        j_bp = jnp.argmax(j_scores, axis=1)
        jgerm_log = (jnp.max(j_scores, axis=1)
                     + trans["jpadding_log"][None]
                     + emis["jgerm"] + emis["jpadding"])
    else:
        j_scores = vd_last[:, :, None] + _safe_log(trans["vd_dgerm"])[None]
        j_bp = jnp.argmax(j_scores, axis=1)
        jgerm_log = (jnp.max(j_scores, axis=1)
                     + trans["jpadding_log"][None]
                     + emis["jgerm"] + emis["jpadding"])

    score = jnp.max(jgerm_log, axis=1)
    jgerm_idx = jnp.argmax(jgerm_log, axis=1)

    if heavy:
        dj_last_idx = jnp.take_along_axis(
            j_bp, jgerm_idx[:, None], axis=1)[:, 0]
        dj_rows, dgerm_idx = _backtrace(dj_last_idx, dj_bps, dj_bp0)
        vd_last_idx = jnp.take_along_axis(
            d_bp, dgerm_idx[:, None], axis=1)[:, 0]
        vd_rows, vgerm_idx = _backtrace(vd_last_idx, vd_bps, vd_bp0)
        path = SampledPath(
            vgerm_idx=vgerm_idx, vd_idx=vd_rows,
            dgerm_idx=dgerm_idx, dj_idx=dj_rows, jgerm_idx=jgerm_idx)
    else:
        vd_last_idx = jnp.take_along_axis(
            j_bp, jgerm_idx[:, None], axis=1)[:, 0]
        vd_rows, vgerm_idx = _backtrace(vd_last_idx, vd_bps, vd_bp0)
        path = SampledPath(
            vgerm_idx=vgerm_idx, vd_idx=vd_rows,
            dgerm_idx=None, dj_idx=None, jgerm_idx=jgerm_idx)

    return score, path
