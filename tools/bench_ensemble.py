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


def single_family(tmp, n_trees, reps):
    from linearham_tpu.pipeline.run import run_pipeline

    gene_dir, yaml_path, trees_path = _family_files(tmp, 0, n_trees)
    runs = []
    for r in range(reps):
        out_tsv = os.path.join(tmp, f"lh_{n_trees}_{r}.trees")
        t0 = time.perf_counter()
        result = run_pipeline(yaml_path, 0, gene_dir, trees_path, out_tsv,
                              num_rates=4, seed=0,
                              chunk_size=min(n_trees, 4096))
        wall = time.perf_counter() - t0
        runs.append({
            "wall_s": round(wall, 2),
            "trees_per_sec": round(n_trees / wall, 1),
            "stages": {k: round(v, 3)
                       for k, v in (result.timings or {}).items()},
        })
        print(f"# single T={n_trees} rep{r}: {runs[-1]['trees_per_sec']}"
              f" trees/s", file=sys.stderr, flush=True)
    best = max(runs, key=lambda x: x["trees_per_sec"])
    return {"n_trees": n_trees, "best": best, "runs": runs}


def multi_family(tmp, n_fams, n_trees, reps):
    import io

    from linearham_tpu.cli import main as cli_main

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
    runs = []
    for r in range(reps):
        for o in outs:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(o)
        t0 = time.perf_counter()
        rc = cli_main([
            "repertoire", "--families", manifest,
            "--hmm-param-dir", os.path.join(tmp, "hmm_params_0"),
            "--num-rates", "4", "--seed", "0"])
        wall = time.perf_counter() - t0
        assert rc == 0
        total = n_fams * n_trees
        for o in outs:
            n_rows = sum(1 for _ in open(o)) - 1
            assert n_rows == n_trees, (o, n_rows)
        runs.append({"wall_s": round(wall, 2),
                     "trees_per_sec": round(total / wall, 1)})
        print(f"# repertoire {n_fams}x{n_trees} rep{r}: "
              f"{runs[-1]['trees_per_sec']} trees/s aggregate",
              file=sys.stderr, flush=True)
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
