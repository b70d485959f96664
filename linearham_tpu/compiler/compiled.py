"""Bundling a compiled family into device-ready tensors."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp
import numpy as np

from linearham_tpu.compiler.state_space import GermlineRegion, StateSpace
from linearham_tpu.compiler.transitions import TransitionSet, build_transitions
from linearham_tpu.io.germline import GermlineGene


def _within_region_log(region: GermlineRegion,
                       genes: Dict[str, GermlineGene]) -> np.ndarray:
    """Log product of within-gene transitions across each germline run."""
    out = np.zeros(len(region.ggene_ranges))
    for i, (gname, (start, end)) in enumerate(region.ggene_ranges.items()):
        if end - start > 1:
            g0 = region.germ_inds[start]
            out[i] = np.log(
                genes[gname].transition[g0:g0 + (end - start - 1)]
            ).sum()
    return out


@dataclass
class CompiledFamily:
    """State space + transition tensors of one family, host resident."""

    space: StateSpace
    genes: Dict[str, GermlineGene]
    trans: TransitionSet

    def device_transitions(self, dtype=jnp.float64) -> Dict[str, jnp.ndarray]:
        """The transition pytree consumed by ops.forward.forward."""
        space, genes, trans = self.space, self.genes, self.trans
        with np.errstate(divide="ignore"):
            gene_prob_log = np.log([
                genes[g].gene_prob for g in space.vgerm.ggene_ranges
            ])
            vgerm_static_log = (
                gene_prob_log
                + np.log(trans.vpadding)
                + _within_region_log(space.vgerm, genes)
            )
            jpadding_log = np.log(trans.jpadding)

        out = {
            "vgerm_static_log": jnp.asarray(vgerm_static_log, dtype),
            "vgerm_vd": jnp.asarray(trans.vgerm_vd, dtype),
            "vd": jnp.asarray(trans.vd, dtype),
            "vd_dgerm": jnp.asarray(trans.vd_dgerm, dtype),
            "jpadding_log": jnp.asarray(jpadding_log, dtype),
        }
        if self.space.is_heavy:
            out["dgerm_dj"] = jnp.asarray(trans.dgerm_dj, dtype)
            out["dj"] = jnp.asarray(trans.dj, dtype)
            out["dj_jgerm"] = jnp.asarray(trans.dj_jgerm, dtype)
        return out


def compile_family(space: StateSpace,
                   genes: Dict[str, GermlineGene]) -> CompiledFamily:
    return CompiledFamily(
        space=space, genes=genes, trans=build_transitions(space, genes)
    )
