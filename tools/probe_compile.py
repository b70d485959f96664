#!/usr/bin/env python3
"""Instrumentation probe: where do build_hmm and warm 'compile_and_first_step'
actually spend their time at the official bench shape?

Run on the TPU. Prints a stage-by-stage breakdown:
  build:   load_cluster / load_gene_map / state_space / compile_family /
           xmsa / consts / device_put
  step:    trace / lower / first_call (warm-cache compile+load+dispatch) /
           sync_read / second_call
"""
import os
import sys
import time
import tempfile

import numpy as np


def t(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    out[label] = round(dt, 3)
    print(f"#   {label}: {dt:.3f}s", file=sys.stderr, flush=True)
    return r


def main():
    from linearham_tpu.utils.runtime import enable_persistent_cache
    enable_persistent_cache()
    n_seqs = int(os.environ.get("BENCH_SEQS", "100"))
    chunk = int(os.environ.get("BENCH_CHUNK", "4096"))

    import jax
    import jax.numpy as jnp
    from linearham_tpu.io.germline import write_gene_dir, load_gene_map
    from linearham_tpu.io.partis import load_cluster
    from linearham_tpu.utils.synth import (make_family, make_tree_samples,
                                           write_partis_yaml)
    from linearham_tpu.compiler.state_space import build_state_space
    from linearham_tpu.compiler.compiled import compile_family
    from linearham_tpu.compiler.xmsa import build_xmsa
    from linearham_tpu.models.phylo_hmm import (PhyloHMM, _gather_consts,
                                                phylo_step_packed_jit)

    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        fam = make_family(n_seqs=n_seqs, seed=0)
        gene_dir = os.path.join(tmp, "hmm_params")
        write_gene_dir(fam.genes, gene_dir)
        yaml_path = os.path.join(tmp, "partis_run.yaml")
        write_partis_yaml(fam, yaml_path, seed=0)

        print("# build_hmm breakdown:", file=sys.stderr, flush=True)
        cluster = t("load_cluster", lambda: load_cluster(yaml_path, 0), out)
        genes = t("load_gene_map", lambda: load_gene_map(gene_dir), out)
        space = t("state_space", lambda: build_state_space(
            cluster.locus, cluster.flexbounds, cluster.relpos, genes), out)
        family = t("compile_family", lambda: compile_family(space, genes),
                   out)
        msa = cluster.msa_codes(next(iter(genes.values())).alphabet + "N")
        xmsa = t("xmsa", lambda: build_xmsa(space, msa, cluster.unique_ids),
                 out)
        dtype = jnp.float32
        consts_np = t("consts", lambda: _gather_consts(space, xmsa, dtype),
                      out)
        trans_np = t("host_transitions",
                     lambda: family.host_transitions(np.float32), out)
        # sizes
        import jax.tree_util as jtu
        nbytes = sum(np.asarray(l).nbytes for l in
                     jax.tree.leaves((trans_np, consts_np)))
        print(f"#   const bytes: {nbytes/1e6:.1f} MB", file=sys.stderr)
        t("device_put", lambda: jax.block_until_ready(jax.device_put(
            (trans_np, consts_np))), out)

        # Full PhyloHMM for the step probe
        hmm = t("full_build_hmm", lambda: PhyloHMM(
            yaml_path, 0, gene_dir, seed=0, dtype=dtype), out)

        samples = make_tree_samples(fam, chunk, seed=0)
        from linearham_tpu.pipeline.run import prepare_ensemble
        tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)

        def to_dev(a):
            a = np.asarray(a)
            return jnp.asarray(a, dtype) \
                if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a)

        tree_dev = {k: to_dev(v) for k, v in tree_arrays.items()}
        eig_dev = jax.tree.map(to_dev, eig)
        pi_dev, rates_dev = to_dev(samples.pi), to_dev(rates)
        key = jax.random.PRNGKey(0)

        # flush transfers
        leaves = [l for l in jax.tree.leaves(
            (hmm._trans, hmm._consts, hmm._xmsa_rows, hmm._naive_bases,
             tree_dev, eig_dev, pi_dev, rates_dev))
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)]
        total = jax.jit(
            lambda ls: sum(l.astype(jnp.float32).sum() for l in ls))(leaves)
        t("flush_transfers", lambda: float(total), out)

        args = (hmm._trans, hmm._consts, hmm._xmsa_rows, hmm._naive_bases,
                tree_dev, eig_dev, pi_dev, rates_dev, key)
        kw = dict(heavy=hmm.space.is_heavy, n_slots=n_slots)

        print("# step breakdown:", file=sys.stderr, flush=True)
        traced = t("trace", lambda: phylo_step_packed_jit.trace(
            *args, **kw), out)
        lowered = t("lower", lambda: traced.lower(), out)
        print(f"#   stablehlo bytes: "
              f"{len(lowered.as_text())/1e6:.1f} MB text", file=sys.stderr)

        r = t("first_call", lambda: phylo_step_packed_jit(*args, **kw), out)
        t("sync_read", lambda: np.asarray(r), out)
        key2 = jax.random.PRNGKey(1)
        args2 = args[:-1] + (key2,)
        r2 = t("second_call", lambda: phylo_step_packed_jit(*args2, **kw),
               out)
        t("second_sync", lambda: np.asarray(r2), out)

        if os.environ.get("PROBE_AOT") == "1":
            # Explicit executable serialization round trip
            from jax.experimental import serialize_executable as se
            compiled = t("aot_compile", lambda: lowered.compile(), out)
            blob = t("serialize", lambda: se.serialize(compiled), out)
            payload, _, _ = blob
            print(f"#   serialized exec: {len(payload)/1e6:.1f} MB",
                  file=sys.stderr)
            loaded = t("deserialize_and_load",
                       lambda: se.deserialize_and_load(*blob), out)
            r3 = t("aot_call", lambda: loaded(*[a for a in args]), out)
            t("aot_sync", lambda: jax.block_until_ready(r3), out)

    import json
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
