#!/usr/bin/env python3
"""312-sequence (reference CI depth, test.sh:2-3) on-device benchmark.

Produces PERF_r04_312seq.json with:
  - f32 TPU Pallas kernel vs f64 CPU XLA reference bounds at 312 tips
    (per-site and end-to-end log-likelihood), on REAL hardware (the
    depth previously ran only in interpret/CPU mode).
  - fused-step throughput at 312-seq depth on the chip.
  - end-to-end pipeline throughput at that depth.

Phase "ref" runs in a CPU subprocess (f64 needs x64 mode, which must not
leak into the TPU process).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

FAMILY_KW = dict(n_seqs=312, n_v=4, n_d=5, n_j=3, v_len=296, d_len=26,
                 j_len=52, mutation_rate=0.04, ambig_rate=0.005, seed=19)
N_TREES_BOUND = 8
OUT_NPZ = "/tmp/bench312_ref.npz"


def build_inputs(dtype):
    import jax
    import jax.numpy as jnp

    from linearham_tpu.models.phylo_hmm import PhyloHMM
    from linearham_tpu.pipeline.run import prepare_ensemble
    from linearham_tpu.utils.synth import make_family, make_tree_samples

    fam = make_family(**FAMILY_KW)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=dtype)
    samples = make_tree_samples(fam, N_TREES_BOUND, seed=19)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)
    return fam, hmm, samples, tree_arrays, eig, rates, n_slots


def ref_phase():
    """CPU f64 reference: per-site log-liks + forward logliks."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # CPU compiles of the fused step take minutes; share the test cache.
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/linearham_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from linearham_tpu.models.phylo_hmm import phylo_step_jit
    from linearham_tpu.ops.pruning import site_log_likelihoods

    fam, hmm, samples, tree_arrays, eig, rates, n_slots = build_inputs(
        jnp.float64)

    def per_tree(eig_t, pi_t, rates_t, perm, tparent, tlen, echild,
                 eparent, elen, root):
        tips = hmm._xmsa_rows[perm]
        return site_log_likelihoods(
            eig_t, pi_t, rates_t, tips, tparent, tlen, echild, eparent,
            elen, root, n_slots)

    def to_dev(a):
        a = np.asarray(a)
        return jnp.asarray(a, jnp.float64) \
            if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig_d = jax.tree.map(to_dev, eig)
    pi, rates_d = to_dev(samples.pi), to_dev(rates)
    site_ll = jax.vmap(per_tree)(
        eig_d, pi, rates_d, tree["tip_perm"], tree["tip_parent"],
        tree["tip_length"], tree["edge_child"], tree["edge_parent"],
        tree["edge_length"], tree["root_slot"])
    loglik, _, _ = phylo_step_jit(
        hmm._trans, hmm._consts, hmm._xmsa_rows, hmm._naive_bases,
        tree, eig_d, pi, rates_d, None, heavy=True, n_slots=n_slots)
    np.savez(OUT_NPZ, site_ll=np.asarray(site_ll),
             loglik=np.asarray(loglik))
    print(f"# ref phase done: site_ll {site_ll.shape} "
          f"loglik mean {float(np.mean(loglik)):.3f}", file=sys.stderr)


def tpu_phase():
    from linearham_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from linearham_tpu.models.phylo_hmm import phylo_step_jit
    from linearham_tpu.ops.pruning_pallas import site_log_likelihoods_pallas

    out = {"family": {k: v for k, v in FAMILY_KW.items()}}
    fam, hmm, samples, tree_arrays, eig, rates, n_slots = build_inputs(
        jnp.float32)
    out["n_sites"] = fam.n_sites
    out["xmsa_cols"] = hmm.xmsa.n_cols
    out["n_slots"] = n_slots

    def to_dev(a):
        a = np.asarray(a)
        return jnp.asarray(a, jnp.float32) \
            if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a)

    tree = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig_d = jax.tree.map(to_dev, eig)
    pi, rates_d = to_dev(samples.pi), to_dev(rates)

    # --- f32 on-chip vs f64 CPU bound --------------------------------
    # prepare_ensemble on TPU yields the slot-reuse schedule encoding.
    assert "sched_src" in tree, list(tree)
    t0 = time.perf_counter()
    site_ll32 = np.asarray(site_log_likelihoods_pallas(
        eig_d, pi, rates_d, hmm._xmsa_rows, tree["sched_src"],
        tree["sched_penc"], tree["sched_len"], tree["sched_root"],
        n_slots=n_slots))
    out["kernel_compile_plus_first_s"] = round(time.perf_counter() - t0, 2)
    loglik32, _, _ = phylo_step_jit(
        hmm._trans, hmm._consts, hmm._xmsa_rows, hmm._naive_bases,
        tree, eig_d, pi, rates_d, None, heavy=True, n_slots=n_slots)
    loglik32 = np.asarray(loglik32)

    ref = np.load(OUT_NPZ)
    finite = np.isfinite(ref["site_ll"]) & np.isfinite(site_ll32)
    assert np.isfinite(ref["site_ll"]).all() == np.isfinite(site_ll32).all()
    site_abs = np.abs(site_ll32 - ref["site_ll"])[finite]
    ll_abs = np.abs(loglik32 - ref["loglik"])
    ll_rel = ll_abs / np.abs(ref["loglik"])
    out["bound"] = {
        "n_trees": N_TREES_BOUND,
        "site_abs_max": float(site_abs.max()),
        "site_abs_p99": float(np.percentile(site_abs, 99)),
        "loglik_abs_max": float(ll_abs.max()),
        "loglik_rel_max": float(ll_rel.max()),
        "ref_loglik_mean": float(ref["loglik"].mean()),
    }
    print(f"# bound: {out['bound']}", file=sys.stderr)

    # --- fused-step throughput at depth ------------------------------
    T = int(os.environ.get("BENCH_TREES", "512"))
    K = int(os.environ.get("BENCH_CHAIN", "4"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    from linearham_tpu.pipeline.run import prepare_ensemble
    from linearham_tpu.utils.synth import make_tree_samples

    big = make_tree_samples(fam, T, seed=20)
    tree_arrays, eig, rates, n_slots2 = prepare_ensemble(hmm, big, 4)
    tree_b = {k: to_dev(v) for k, v in tree_arrays.items()}
    eig_b = jax.tree.map(to_dev, eig)
    pi_b, rates_b = to_dev(big.pi), to_dev(rates)
    keys = jax.random.split(jax.random.PRNGKey(0), K)

    def step(k):
        return phylo_step_jit(
            hmm._trans, hmm._consts, hmm._xmsa_rows, hmm._naive_bases,
            tree_b, eig_b, pi_b, rates_b, k, heavy=True, n_slots=n_slots2)

    t0 = time.perf_counter()
    ll, _, path = step(keys[0])
    float(ll.sum() + path.jgerm_idx.sum())
    out["step_compile_s"] = round(time.perf_counter() - t0, 2)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for k in range(K):
            ll, _, path = step(keys[k])
        float(ll.sum() + path.jgerm_idx.sum())
        times.append((time.perf_counter() - t0) / K)
    times.sort()
    med = times[len(times) // 2]
    out["step"] = {
        "n_trees": T, "median_ms": round(med * 1e3, 1),
        "trees_per_sec": round(T / med, 1),
        "times_ms": [round(t * 1e3, 1) for t in times],
    }
    print(f"# step: {out['step']}", file=sys.stderr)
    return out


def pipeline_phase(out):
    """End-to-end pipeline at 312-seq depth (file to file)."""
    import tempfile

    from linearham_tpu.io.germline import write_gene_dir
    from linearham_tpu.pipeline.run import run_pipeline
    from linearham_tpu.utils.synth import (make_family, make_tree_samples,
                                           write_partis_yaml,
                                           write_trees_tsv)

    T = int(os.environ.get("BENCH_PIPE_TREES", "1024"))
    chunk = int(os.environ.get("BENCH_PIPE_CHUNK", "512"))
    with tempfile.TemporaryDirectory() as tmp:
        fam = make_family(**FAMILY_KW)
        gene_dir = os.path.join(tmp, "hmm_params")
        write_gene_dir(fam.genes, gene_dir)
        yaml_path = os.path.join(tmp, "partis_run.yaml")
        write_partis_yaml(fam, yaml_path, seed=19)
        trees_path = os.path.join(tmp, "rb.trees")
        write_trees_tsv(make_tree_samples(fam, T, seed=21), trees_path)
        out_tsv = os.path.join(tmp, "lh.trees")
        t0 = time.perf_counter()
        result = run_pipeline(yaml_path, 0, gene_dir, trees_path, out_tsv,
                              num_rates=4, seed=0, chunk_size=chunk)
        wall = time.perf_counter() - t0
        n_rows = sum(1 for _ in open(out_tsv)) - 1
    assert n_rows == T
    out["pipeline"] = {
        "n_trees": T, "chunk": chunk, "wall_s": round(wall, 2),
        "trees_per_sec": round(T / wall, 1),
        "stages": {k: round(v, 3) for k, v in result.timings.items()},
    }
    print(f"# pipeline: {out['pipeline']}", file=sys.stderr)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "ref":
        ref_phase()
        return 0
    if not os.path.exists(OUT_NPZ) or os.environ.get("FORCE_REF") == "1":
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "ref"],
            check=True, env=env, timeout=1200)
    out = tpu_phase()
    out = pipeline_phase(out)
    with open("PERF_r05_312seq.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"metric": "312seq_step_trees_per_sec",
                      "value": out["step"]["trees_per_sec"],
                      "unit": "trees/s",
                      "loglik_rel_max": out["bound"]["loglik_rel_max"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
