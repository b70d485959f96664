"""Device-mesh sharding for repertoire-scale runs.

The model is tiny (germline parameter pytrees, KB-scale); all scaling is
data parallelism over two structural axes:

  fam    clonal families, padded into identical-shape buckets and stacked
         on a leading axis (the repertoire axis; spans hosts in production)
  trees  posterior tree samples within each family

Both are embarrassingly parallel; XLA's GSPMD partitioner handles the
layout from NamedSharding annotations alone -- no hand-written collectives
are needed in the hot path, and cross-device reductions (e.g. pooled
naive-sequence tallies) are jnp ops over sharded arrays.  The reference has
no distributed execution at all (SURVEY.md section 2g); this module is the
TPU-native replacement for its one-scons-invocation-per-family process
parallelism.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from linearham_tpu.models.phylo_hmm import phylo_step


def make_mesh(n_fam: int, n_trees: int, devices=None) -> Mesh:
    """A (fam, trees) mesh over the first n_fam*n_trees devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size < n_fam * n_trees:
        raise ValueError(
            f"need {n_fam * n_trees} devices, have {devices.size}")
    grid = devices[: n_fam * n_trees].reshape(n_fam, n_trees)
    return Mesh(grid, ("fam", "trees"))


def multi_family_step(trans, consts, xmsa_rows, naive_bases, tree, eig, pi,
                      rates, keys, heavy: bool, n_slots: int):
    """vmap of the fused pipeline step over a stacked family axis.

    Every array carries a leading [F] axis; tree/GTR arrays carry [F, T].
    Returns (loglik [F, T], sampled paths with [F, T] leading axes).
    """

    def one_family(trans_f, consts_f, rows_f, naive_f, tree_f, eig_f, pi_f,
                   rates_f, key_f):
        loglik, _, path = phylo_step(
            trans_f, consts_f, rows_f, naive_f, tree_f, eig_f, pi_f,
            rates_f, key_f, heavy=heavy, n_slots=n_slots,
        )
        return loglik, path

    return jax.vmap(one_family)(
        trans, consts, xmsa_rows, naive_bases, tree, eig, pi, rates, keys)


def shard_family_batch(mesh: Mesh, trans, consts, xmsa_rows, naive_bases,
                       tree, eig, pi, rates, keys):
    """device_put the stacked inputs with (fam, trees) shardings.

    Family-constant tensors shard over 'fam' only; per-tree tensors shard
    over ('fam', 'trees') on their first two axes.
    """
    fam = NamedSharding(mesh, P("fam"))
    fam_trees = NamedSharding(mesh, P("fam", "trees"))

    put_fam = partial(jax.tree.map, lambda a: jax.device_put(a, fam))
    put_ft = partial(jax.tree.map, lambda a: jax.device_put(a, fam_trees))
    return (
        put_fam(trans), put_fam(consts), put_fam(xmsa_rows),
        put_fam(naive_bases), put_ft(tree), put_ft(eig), put_ft(pi),
        put_ft(rates), put_fam(keys),
    )


def sharded_pipeline(mesh: Mesh, heavy: bool, n_slots: int):
    """jit multi_family_step with (fam, trees)-sharded outputs."""
    out_spec = NamedSharding(mesh, P("fam", "trees"))
    step = partial(multi_family_step, heavy=heavy, n_slots=n_slots)
    return jax.jit(step, out_shardings=(out_spec, None))
