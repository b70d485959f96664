#!/usr/bin/env python3
"""Sweep pruning-kernel tuning knobs at production depth on the chip.

VERDICT r03 item 7: the 101-slot step costs ~148.6 ms / 2048 trees with
trees_per_block=8, renorm_stride=4; try other block sizes and strides.
Kernel-only measurement (site_log_likelihoods_pallas), K-dispatch chain
with one host read (axon tunnel sync pattern).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    from linearham_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from linearham_tpu.models.phylo_hmm import PhyloHMM
    from linearham_tpu.ops.pruning_pallas import site_log_likelihoods_pallas
    from linearham_tpu.pipeline.run import prepare_ensemble
    from linearham_tpu.utils.synth import make_family, make_tree_samples

    n_seqs = int(os.environ.get("SWEEP_SEQS", "100"))
    T = int(os.environ.get("SWEEP_TREES", "2048"))
    K = int(os.environ.get("SWEEP_CHAIN", "8"))
    reps = int(os.environ.get("SWEEP_REPS", "3"))

    fam = make_family(n_seqs=n_seqs, seed=0)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=jnp.float32)
    samples = make_tree_samples(fam, T, seed=0)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)

    def to_dev(a):
        a = np.asarray(a)
        return jnp.asarray(a, jnp.float32) \
            if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig_d = jax.tree.map(to_dev, eig)
    pi, rates_d = to_dev(samples.pi), to_dev(rates)

    # prepare_ensemble on TPU yields the slot-reuse schedule encoding.
    assert "sched_src" in tree, list(tree)
    # Slightly perturbed branch lengths per chain step so XLA cannot CSE
    # the chained dispatches.
    els = [to_dev(np.asarray(tree_arrays["sched_len"]) * (1 + 1e-6 * k))
           for k in range(K)]

    configs = json.loads(os.environ.get(
        "SWEEP_CONFIGS",
        '[[8,4],[8,8],[16,4],[16,8],[4,4],[32,4]]'))
    results = {}
    baseline = None
    for TB, stride in configs:
        def call(el):
            return site_log_likelihoods_pallas(
                eig_d, pi, rates_d, hmm._xmsa_rows, tree["sched_src"],
                tree["sched_penc"], el, tree["sched_root"],
                n_slots=n_slots, trees_per_block=TB,
                renorm_stride=stride)

        t0 = time.perf_counter()
        out = call(els[0])
        s0 = float(out.sum())
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for k in range(K):
                out = call(els[k])
            float(out.sum())
            times.append((time.perf_counter() - t0) / K)
        times.sort()
        med = times[len(times) // 2]
        if baseline is None:
            baseline = s0
        results[f"TB{TB}_s{stride}"] = {
            "median_ms": round(med * 1e3, 1),
            "trees_per_sec": round(T / med, 1),
            "compile_s": round(compile_s, 1),
            "sum_delta_vs_first": float(abs(s0 - baseline)),
        }
        print(f"# TB={TB} stride={stride}: {med*1e3:.1f} ms "
              f"({T/med:.0f} trees/s, compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
    print(json.dumps({"n_seqs": n_seqs, "n_trees": T, "n_slots": n_slots,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
