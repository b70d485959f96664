#!/usr/bin/env python3
"""f32-on-TPU importance-weight distortion at the reference CI depth.

VERDICT r04 item 2: the reference computes everything in double
(src/PhyloHMM.cpp, Eigen doubles) and its LogWeight column feeds a
softmax importance-weighted bootstrap + ESS
(scripts/run_bootstrap_asr_ess.R:29-40).  The repo's production TPU path
is f32; its absolute log-likelihood error at 312-seq depth is a few
units, which COULD distort a single tree's unnormalized weight by e^|d|.
What the downstream statistics actually consume, though, is the
SOFTMAX over per-tree logweights — any error component common to all
trees cancels exactly.  This tool measures what matters:

  - per-tree |d| = |loglik_f32 - loglik_f64| and its CENTERED spread
    (after removing the tree-ensemble mean, the component softmax sees),
  - ESS of softmax(logweight) under f32 vs f64,
  - overlap of the importance-weighted bootstrap subsample
    (run_bootstrap_asr_ess.R:29-32 semantics: weighted sampling WITHOUT
    replacement, subsampfrac=0.05, same RNG stream for both),
  - L1 distance between the weighted naive-sequence posteriors (same
    per-tree sampled annotations, weights swapped).

Writes PERF_r05_f32_weights.json.  Phase "ref" (f64) runs in a CPU
subprocess so x64 never leaks into the TPU process.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

FAMILY_KW = dict(n_seqs=312, n_v=4, n_d=5, n_j=3, v_len=296, d_len=26,
                 j_len=52, mutation_rate=0.04, ambig_rate=0.005, seed=19)
N_TREES = int(os.environ.get("BENCH_WTREES", "1024"))
TREE_SEED = 23
OUT_NPZ = "/tmp/bench_f32w_ref.npz"
SUBSAMP_FRAC = 0.05   # the reference default (SConstruct:78-124)


def build_inputs(dtype):
    import jax.numpy as jnp  # noqa: F401

    from linearham_tpu.models.phylo_hmm import PhyloHMM
    from linearham_tpu.pipeline.run import prepare_ensemble
    from linearham_tpu.utils.synth import make_family, make_tree_samples

    fam = make_family(**FAMILY_KW)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0, dtype=dtype)
    samples = make_tree_samples(fam, N_TREES, seed=TREE_SEED)
    tree_arrays, eig, rates, n_slots = prepare_ensemble(hmm, samples, 4)
    return fam, hmm, samples, tree_arrays, eig, rates, n_slots


def _logliks(hmm, samples, tree_arrays, eig, rates, n_slots, dtype,
             chunk):
    import jax
    import jax.numpy as jnp

    from linearham_tpu.models.phylo_hmm import phylo_step_jit

    def to_dev(a):
        a = np.asarray(a)
        return jnp.asarray(a, dtype) \
            if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a)

    out = np.zeros(samples.n_samples)
    for s in range(0, samples.n_samples, chunk):
        sl = slice(s, s + chunk)
        tree = {k: to_dev(np.asarray(v)[sl]) for k, v in
                tree_arrays.items()}
        eig_c = jax.tree.map(
            lambda a: to_dev(np.asarray(a)[sl]), eig)
        ll, _, _ = phylo_step_jit(
            hmm._trans, hmm._consts, hmm._xmsa_rows, hmm._naive_bases,
            tree, eig_c, to_dev(samples.pi[sl]), to_dev(rates[sl]),
            None, heavy=True, n_slots=n_slots)
        out[sl] = np.asarray(ll)
    return out


def ref_phase():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/linearham_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    fam, hmm, samples, ta, eig, rates, n_slots = build_inputs(jnp.float64)
    t0 = time.time()
    ll = _logliks(hmm, samples, ta, eig, rates, n_slots, jnp.float64,
                  chunk=256)
    np.savez(OUT_NPZ, loglik=ll)
    print(f"# ref phase: {len(ll)} trees in {time.time() - t0:.1f}s "
          f"mean {ll.mean():.3f}", file=sys.stderr)


def softmax(lw):
    e = np.exp(lw - lw.max())
    return e / e.sum()


def ess(w):
    return float(w.sum() ** 2 / (w * w).sum())


def weighted_subsample_no_replacement(w, k, seed):
    """The R sample(prob=w, replace=FALSE) semantics: successive draws
    from the renormalized remaining weights."""
    rng = np.random.default_rng(seed)
    w = w.copy()
    out = []
    for _ in range(k):
        p = w / w.sum()
        i = rng.choice(len(w), p=p)
        out.append(i)
        w[i] = 0.0
    return np.asarray(out)


def tpu_phase():
    from linearham_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    fam, hmm, samples, ta, eig, rates, n_slots = build_inputs(jnp.float32)
    ll32 = _logliks(hmm, samples, ta, eig, rates, n_slots, jnp.float32,
                    chunk=512)
    ll64 = np.load(OUT_NPZ)["loglik"]
    assert ll64.shape == ll32.shape

    d = ll32 - ll64
    centered = d - d.mean()
    # The synthetic TSV's rb_loglik is unrelated to the HMM loglik, so
    # lw would span hundreds of nats and ESS degenerates to 1.0 in BOTH
    # precisions (nothing learned).  In the real workload RevBayes
    # evaluates (nearly) the same model on the same tree, so the
    # LogWeight spread across trees is a few nats; emulate that with
    # rb = loglik_f64 + N(0, 2), fixed seed — then ESS, subsample
    # overlap, and the posterior actually exercise the softmax.
    rng = np.random.default_rng(11)
    rb = ll64 + rng.normal(0.0, 2.0, size=ll64.shape)
    lw32 = ll32 - rb
    lw64 = ll64 - rb
    w32, w64 = softmax(lw32), softmax(lw64)

    k = max(1, int(round(SUBSAMP_FRAC * len(ll32))))
    sub32 = weighted_subsample_no_replacement(w32, k, seed=7)
    sub64 = weighted_subsample_no_replacement(w64, k, seed=7)
    overlap = len(set(sub32.tolist()) & set(sub64.tolist())) / k
    # Controls: (a) the subsample's own stochasticity — two f64 draws
    # with different RNG seeds (any overlap loss f32 adds must be read
    # against this floor); (b) the deterministic top-k-by-weight sets.
    sub64b = weighted_subsample_no_replacement(w64, k, seed=8)
    overlap_ctl = len(set(sub64.tolist()) & set(sub64b.tolist())) / k
    topk32 = set(np.argsort(w32)[-k:].tolist())
    topk64 = set(np.argsort(w64)[-k:].tolist())
    topk_overlap = len(topk32 & topk64) / k

    # Weighted naive-sequence posterior: same per-tree sampled
    # annotations (one FFBS draw per tree, f32 device), weights swapped —
    # isolates pure weight distortion on the quantity
    # tabulate_naive_probs.py reports.
    from linearham_tpu.pipeline.run import run_pipeline_arrays

    res = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0,
                              chunk_size=512)
    seqs = [a.naive_seq for a in res.annotations]
    post32, post64 = {}, {}
    for s, a, b in zip(seqs, w32, w64):
        post32[s] = post32.get(s, 0.0) + a
        post64[s] = post64.get(s, 0.0) + b
    keys = set(post32) | set(post64)
    l1 = sum(abs(post32.get(s, 0.0) - post64.get(s, 0.0)) for s in keys)

    out = {
        "unit": "f32-TPU vs f64-CPU importance weights, 312-seq family, "
                f"{len(ll32)} trees",
        "n_trees": len(ll32),
        "loglik_abs_diff": {
            "max": float(np.abs(d).max()),
            "mean": float(np.abs(d).mean()),
            "systematic_mean": float(d.mean()),
        },
        "centered_diff": {   # what softmax weights actually see
            "max": float(np.abs(centered).max()),
            "p99": float(np.percentile(np.abs(centered), 99)),
            "std": float(centered.std()),
        },
        "ess": {
            "f64": ess(w64), "f32": ess(w32),
            "ratio": ess(w32) / ess(w64),
        },
        "bootstrap_overlap_frac": overlap,
        "bootstrap_overlap_control_f64_seed_change": overlap_ctl,
        "topk_by_weight_overlap": topk_overlap,
        "bootstrap_k": k,
        "naive_posterior_l1": l1,
        "n_unique_naive": len(keys),
    }
    print(json.dumps(out, indent=1))
    with open("PERF_r05_f32_weights.json", "w") as fh:
        json.dump(out, fh, indent=1)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "ref":
        ref_phase()
        return 0
    if not os.path.exists(OUT_NPZ) or os.environ.get("FORCE_REF") == "1":
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "ref"],
            check=True, env=dict(os.environ), timeout=3600)
    tpu_phase()
    return 0


if __name__ == "__main__":
    sys.exit(main())
