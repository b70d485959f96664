"""The batched posterior-ensemble pipeline.

The reference walks the RevBayes TSV one tree at a time, rebuilding a libpll
partition per row (src/PhyloHMM.cpp:393-446).  Here the whole ensemble is
parsed up front, padded into fixed-shape chunks, and each chunk runs as ONE
jitted device computation (pruning + forward + FFBS for every tree at
once); annotations are decoded host-side and streamed to the output TSV.

Output columns match the reference contract exactly
(src/PhyloHMM.cpp:244-327).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, TextIO

import jax
import jax.numpy as jnp
import numpy as np

from linearham_tpu.io.newick import batch_trees, parse_newick
from linearham_tpu.io.trees_tsv import TreeSamples, load_tree_samples
from linearham_tpu.models.decode import Annotation
from linearham_tpu.models.phylo_hmm import PhyloHMM, phylo_step_jit
from linearham_tpu.ops.gtr import gamma_category_rates_batch, gtr_eigen

_COMMENT_RE = re.compile(r"\[[^\]]*\]")


@dataclass
class PipelineResult:
    """Per-sample pipeline outputs for one clonal family."""

    samples: TreeSamples
    rates: np.ndarray            # [T, R]
    lh_loglik: np.ndarray        # [T]
    logweight: np.ndarray        # [T]
    annotations: List[Annotation]
    timings: Optional[dict] = None  # stage -> seconds


def _chunk_pad(arrs, start, size, total):
    """Slice [start:start+size], padding past-the-end with the last row."""
    idx = np.minimum(np.arange(start, start + size), total - 1)
    return [a[idx] for a in arrs]


def prepare_ensemble(hmm: PhyloHMM, samples: TreeSamples, num_rates: int):
    """Host-side ensemble prep: parse/batch trees, gamma rates, GTR eigen.

    Returns (tree_arrays dict, eig (numpy GTREigen), rates [T,R], n_slots).
    Tree parsing uses the native C++ batch parser when available.
    """
    from linearham_tpu.io.native import parse_newicks_batch

    tb = parse_newicks_batch(samples.newicks, hmm.xmsa.labels)
    if tb is None:
        trees = [parse_newick(nw) for nw in samples.newicks]
        tb = batch_trees(trees, hmm.xmsa.labels)
    rates = gamma_category_rates_batch(samples.alpha, num_rates)
    tree_arrays = {
        "tip_perm": tb.tip_perm,
        "tip_parent": tb.tip_parent,
        "tip_length": tb.tip_length.astype(np.float64),
        "edge_child": tb.edge_child,
        "edge_parent": tb.edge_parent,
        "edge_length": tb.edge_length.astype(np.float64),
        "root_slot": tb.root_slot,
    }
    eig = gtr_eigen(samples.er, samples.pi)  # host numpy factors
    return tree_arrays, eig, rates, tb.n_slots


def _drain_chunk(hmm, timer, logliks, paths, start, n_valid, loglik_c,
                 path_c) -> None:
    """Block on one chunk's device outputs and decode its annotations."""
    with timer.stage("device_step"):
        loglik_np = np.asarray(loglik_c)   # blocks until the step is done
    logliks[start:start + n_valid] = loglik_np[:n_valid]
    with timer.stage("decode"):
        path_np = jax.tree.map(lambda a: np.asarray(a)[:n_valid], path_c)
        paths.extend(hmm._decode_batch(path_np))


def run_pipeline_arrays(
    hmm: PhyloHMM,
    samples: TreeSamples,
    num_rates: int,
    seed: int = 0,
    chunk_size: int = 256,
    trace_dir: Optional[str] = None,
) -> PipelineResult:
    """Run the full ensemble through the fused device step."""
    from linearham_tpu.utils.profiling import StageTimer, maybe_trace

    timer = StageTimer()
    T = samples.n_samples
    chunk_size = min(chunk_size, T)

    dtype = hmm._dtype
    with timer.stage("host_prepare"):
        dev_tree_full, eig_full, rates, n_slots = prepare_ensemble(
            hmm, samples, num_rates)

    step = phylo_step_jit
    key = jax.random.PRNGKey(seed)

    logliks = np.zeros(T)
    paths = []

    def stage_chunk(start):
        """Enqueue chunk ``start``'s host->device transfers (async)."""
        with timer.stage("device_transfer"):
            tree_c = {
                k: jnp.asarray(
                    _chunk_pad([v], start, chunk_size, T)[0],
                    dtype if np.issubdtype(v.dtype, np.floating)
                    else None)
                for k, v in dev_tree_full.items()
            }
            eig_c = jax.tree.map(
                lambda a: jnp.asarray(
                    _chunk_pad([np.asarray(a)], start, chunk_size, T)[0],
                    dtype),
                eig_full,
            )
            pi_c, rates_c = (
                jnp.asarray(x, dtype) for x in
                _chunk_pad([samples.pi, rates], start, chunk_size, T)
            )
        return tree_c, eig_c, pi_c, rates_c

    # Software pipeline over chunks: dispatch chunk k's device step
    # (async), THEN stage chunk k+1's transfers and decode chunk k-1's
    # paths while the device is busy, and only then block on chunk k.
    # Transfers and host decode thus overlap device compute instead of
    # serializing with it (the reference interleaves libpll work and TSV
    # output serially per tree, src/PhyloHMM.cpp:393-446).
    staged = stage_chunk(0)
    pending = None   # (start, n_valid, loglik_c, path_c) awaiting decode
    first_chunk = True
    with maybe_trace(trace_dir):
        for start in range(0, T, chunk_size):
            tree_c, eig_c, pi_c, rates_c = staged
            key, subkey = jax.random.split(key)
            stage = "compile_and_first_step" if first_chunk \
                else "device_step"
            with timer.stage(stage):
                loglik_c, _, path_c = step(
                    hmm._trans, hmm._consts, hmm._xmsa_rows,
                    hmm._naive_bases, tree_c, eig_c, pi_c, rates_c, subkey,
                    heavy=hmm.space.is_heavy, n_slots=n_slots,
                )
                if first_chunk:
                    # The first dispatch pays compile (unless the
                    # persistent cache hits); block here so --profile
                    # separates compile cost from steady-state time.
                    jax.block_until_ready(loglik_c)
            first_chunk = False
            if start + chunk_size < T:
                staged = stage_chunk(start + chunk_size)
            if pending is not None:
                _drain_chunk(hmm, timer, logliks, paths, *pending)
            pending = (start, min(chunk_size, T - start), loglik_c, path_c)
        if pending is not None:
            _drain_chunk(hmm, timer, logliks, paths, *pending)

    return PipelineResult(
        samples=samples,
        rates=rates,
        lh_loglik=logliks,
        logweight=logliks - samples.rb_loglik,
        annotations=paths,
        timings=timer.as_dict(),
    )


def write_output_tsv(result: PipelineResult, heavy: bool,
                     outfile: TextIO) -> None:
    """Write the reference-format pipeline TSV."""
    num_rates = result.rates.shape[1]
    cols = (
        ["Iteration", "RBLogLikelihood", "Prior", "alpha"]
        + [f"er[{i}]" for i in range(1, 7)]
        + [f"pi[{i}]" for i in range(1, 5)]
        + ["tree"]
        + [f"sr[{i}]" for i in range(1, num_rates + 1)]
        + ["LHLogLikelihood", "LogWeight", "NaiveSequence",
           "VGene", "V5pDel", "V3pDel", "VFwkInsertion"]
    )
    if heavy:
        cols += ["VDInsertion", "DGene", "D5pDel", "D3pDel", "DJInsertion"]
    else:
        cols += ["VJInsertion"]
    cols += ["JGene", "J5pDel", "J3pDel", "JFwkInsertion"]
    outfile.write("\t".join(cols) + "\n")

    s = result.samples
    for t in range(s.n_samples):
        ann = result.annotations[t]
        row = (
            [s.iteration[t], s.rb_loglik[t], s.prior[t], s.alpha[t]]
            + list(s.er[t]) + list(s.pi[t])
            + [_COMMENT_RE.sub("", s.newicks[t])]
            + list(result.rates[t])
            + [result.lh_loglik[t], result.logweight[t], ann.naive_seq,
               ann.vgerm_state, ann.v_5p_del, ann.v_3p_del,
               ann.v_fwk_insertion]
        )
        if heavy:
            row += [ann.vd_insertion, ann.dgerm_state, ann.d_5p_del,
                    ann.d_3p_del, ann.dj_insertion]
        else:
            row += [ann.vd_insertion]
        row += [ann.jgerm_state, ann.j_5p_del, ann.j_3p_del,
                ann.j_fwk_insertion]
        outfile.write("\t".join(str(v) for v in row) + "\n")


def run_pipeline(
    yaml_path: str,
    cluster_ind: int,
    hmm_param_dir: str,
    input_path: str,
    output_path: str,
    num_rates: int,
    seed: int = 0,
    chunk_size: int = 256,
    profile: bool = False,
    trace_dir: Optional[str] = None,
    precision: Optional[str] = None,
) -> PipelineResult:
    """End-to-end: partis YAML + RevBayes TSV -> linearham output TSV.

    ``precision``: f32 (production TPU; the Pallas pruning kernel engages),
    f64 (CPU conformance), or None/auto (f32 on TPU, f64 elsewhere).
    """
    from linearham_tpu.utils.runtime import enable_persistent_cache, \
        resolve_dtype

    import time as _time

    enable_persistent_cache()
    t0 = _time.perf_counter()
    hmm = PhyloHMM(yaml_path, cluster_ind, hmm_param_dir, seed=seed,
                   dtype=resolve_dtype(precision))
    build_s = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    samples = load_tree_samples(input_path)
    load_s = _time.perf_counter() - t0
    result = run_pipeline_arrays(hmm, samples, num_rates, seed=seed,
                                 chunk_size=chunk_size,
                                 trace_dir=trace_dir)
    if result.timings is not None:
        result.timings["build_hmm"] = build_s
        result.timings["load_trees_tsv"] = load_s

    t0 = _time.perf_counter()
    with open(output_path, "w") as fh:
        write_output_tsv(result, hmm.space.is_heavy, fh)
    if result.timings is not None:
        result.timings["write_tsv"] = _time.perf_counter() - t0
    if profile and result.timings:
        import sys

        total = sum(result.timings.values())
        print(f"# pipeline timings ({samples.n_samples} trees, "
              f"{total * 1e3:.0f}ms total):", file=sys.stderr)
        for k, v in result.timings.items():
            print(f"#   {k}: {v * 1e3:.1f}ms", file=sys.stderr)
    return result
