"""SimpleHMM: the star-tree phylo-HMM (emission = independent sequences).

The star-tree model treats each observed sequence as an independent draw
given the naive base, matching partis' assumptions.  It exists mainly as a
CPU-runnable conformance target (reference: src/SimpleHMM.cpp); PhyloHMM is
the production model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from linearham_tpu.compiler.compiled import CompiledFamily, compile_family
from linearham_tpu.compiler.emissions import star_emissions
from linearham_tpu.compiler.state_space import build_state_space
from linearham_tpu.io.germline import load_gene_map
from linearham_tpu.io.partis import ClusterData, load_cluster
from linearham_tpu.models.decode import Annotation, decode_path
from linearham_tpu.ops.ffbs import sample_path, sample_paths_batch
from linearham_tpu.ops.forward import forward


class SimpleHMM:
    """Star-tree HMM over one clonal family.

    API mirrors the reference binary's semantics: construct from a partis
    output file + HMM parameter directory, then query ``log_likelihood()``
    and draw ``sample_naive_sequence()`` annotations.
    """

    def __init__(self, yaml_path: str, cluster_ind: int,
                 hmm_param_dir: str, seed: int = 0,
                 dtype=jnp.float64):
        self.cluster: ClusterData = load_cluster(yaml_path, cluster_ind)
        self.genes = load_gene_map(hmm_param_dir)
        self.space = build_state_space(
            self.cluster.locus, self.cluster.flexbounds,
            self.cluster.relpos, self.genes,
        )
        self.family: CompiledFamily = compile_family(self.space, self.genes)
        self.msa = self.cluster.msa_codes(self.space.alphabet)
        self._dtype = dtype
        self._key = jax.random.PRNGKey(seed)

        self._trans = self.family.device_transitions(dtype)
        emis_np = star_emissions(self.space, self.genes, self.msa)
        # Add the T=1 tree batch axis the forward kernel expects.
        self._emis = {
            k: jnp.asarray(v, dtype)[None] for k, v in emis_np.items()
        }
        self._loglik = None
        self._cache = None

    def _run_forward(self):
        if self._loglik is None:
            loglik, cache = jax.jit(
                forward, static_argnames=("heavy",)
            )(self._trans, self._emis, heavy=self.space.is_heavy)
            self._loglik = float(loglik[0])
            self._cache = cache
        return self._loglik, self._cache

    def log_likelihood(self) -> float:
        return self._run_forward()[0]

    def sample_naive_sequence(self) -> Annotation:
        """Draw one posterior V(D)J path and decode it."""
        return self.sample_annotations(1)[0]

    def map_annotation(self) -> Annotation:
        """The MAP (Viterbi) V(D)J annotation."""
        from linearham_tpu.ops.viterbi import viterbi

        score, path = jax.jit(
            viterbi, static_argnames=("heavy",)
        )(self._trans, self._emis, heavy=self.space.is_heavy)
        self.map_score = float(np.asarray(score)[0])
        path = jax.tree.map(np.asarray, path)
        heavy = self.space.is_heavy
        return decode_path(
            self.space,
            vgerm_idx=int(path.vgerm_idx[0]),
            vd_idx=path.vd_idx[0],
            dgerm_idx=int(path.dgerm_idx[0]) if heavy else None,
            dj_idx=path.dj_idx[0] if heavy else None,
            jgerm_idx=int(path.jgerm_idx[0]),
            n_sites=self.cluster.n_sites,
        )

    def sample_annotations(self, n: int) -> list:
        """Draw ``n`` posterior paths in one batched device call."""
        _, cache = self._run_forward()
        self._key, subkey = jax.random.split(self._key)
        keys = jax.random.split(subkey, n)
        paths = sample_paths_batch(
            keys, self._trans, cache, self.space.is_heavy)
        paths = jax.tree.map(np.asarray, paths)
        heavy = self.space.is_heavy
        return [
            decode_path(
                self.space,
                vgerm_idx=int(paths.vgerm_idx[i, 0]),
                vd_idx=paths.vd_idx[i, 0],
                dgerm_idx=int(paths.dgerm_idx[i, 0]) if heavy else None,
                dj_idx=paths.dj_idx[i, 0] if heavy else None,
                jgerm_idx=int(paths.jgerm_idx[i, 0]),
                n_sites=self.cluster.n_sites,
            )
            for i in range(n)
        ]
