"""Workflow runner: end-to-end over the fixtures with artifact resume."""

import os
import shutil
import time

import pytest

from linearham_tpu.workflow import run_family_workflow

from test_pipeline import _make_tsv


@pytest.fixture()
def outdir(fixtures_dir, tmp_path):
    out = tmp_path / "wf"
    out.mkdir()
    # The tree MCMC is an external engine; pre-place its artifact.
    _make_tsv(out / "revbayes_run.trees", n_rows=8, seed=1)
    return out


def _run(fixtures_dir, outdir):
    run_family_workflow(
        str(outdir),
        partis_yaml_file=str(fixtures_dir / "phylo_hmm_input.yaml"),
        hmm_param_dir=str(fixtures_dir / "hmm_params"),
        mcmc_iter=10, mcmc_thin=1, tune_iter=0, tune_thin=1,
        num_rates=4, burnin_frac=0.25, subsamp_frac=0.5, seed=0,
        lineage_unique_ids=["0"], pfilters=[0.0],
    )


def test_workflow_end_to_end_and_resume(fixtures_dir, outdir, capsys):
    _run(fixtures_dir, outdir)
    expected = [
        "cluster.yaml", "cluster_seqs.fasta", "revbayes_run.rev",
        "lh_revbayes_run.trees", "linearham_run.trees",
        "linearham_run.log", "linearham_run.ess",
        "linearham_annotations_best.yaml", "linearham_annotations_all.yaml",
        "aa_naive_seqs.fasta", "aa_naive_seqs.dnamap",
        "aa_lineage_seqs_0.fasta", "aa_lineage_seqs_0.dnamap",
    ]
    for name in expected:
        assert (outdir / name).exists(), name
    capsys.readouterr()

    # Second run: everything must be skipped as up to date.
    mtimes = {n: os.path.getmtime(outdir / n) for n in expected}
    _run(fixtures_dir, outdir)
    out = capsys.readouterr().out
    assert "running" not in out
    for n in expected:
        assert os.path.getmtime(outdir / n) == mtimes[n], n

    # Invalidate one intermediate: downstream steps rerun.
    time.sleep(0.02)
    os.utime(outdir / "lh_revbayes_run.trees")
    _run(fixtures_dir, outdir)
    out = capsys.readouterr().out
    assert "bootstrap-asr: running" in out
    assert "parse-cluster: up to date" in out


def test_workflow_missing_external_artifact(fixtures_dir, tmp_path):
    out = tmp_path / "wf2"
    out.mkdir()
    with pytest.raises(RuntimeError, match="RevBayes"):
        run_family_workflow(
            str(out),
            partis_yaml_file=str(fixtures_dir / "phylo_hmm_input.yaml"),
            hmm_param_dir=str(fixtures_dir / "hmm_params"),
        )


def test_workflow_grid_fanout(fixtures_dir, tmp_path):
    from linearham_tpu.workflow import run_workflow_grid
    base = tmp_path / "grid"
    for combo_dir in ("mcmc_iter_10/num_rates_2", "mcmc_iter_10/num_rates_4",
                      "mcmc_iter_20/num_rates_2", "mcmc_iter_20/num_rates_4"):
        d = base / combo_dir
        d.mkdir(parents=True)
        _make_tsv(d / "revbayes_run.trees", n_rows=4, seed=4)

    run_workflow_grid(
        str(base),
        grid={"mcmc_iter": [10, 20], "mcmc_thin": [1],
              "tune_iter": [0], "tune_thin": [1], "num_rates": [2, 4]},
        fixed=dict(
            partis_yaml_file=str(fixtures_dir / "phylo_hmm_input.yaml"),
            hmm_param_dir=str(fixtures_dir / "hmm_params"),
            burnin_frac=0.0, subsamp_frac=0.5, seed=0,
        ),
    )
    for combo_dir in ("mcmc_iter_10/num_rates_2", "mcmc_iter_20/num_rates_4"):
        assert (base / combo_dir / "linearham_run.trees").exists()
        # num_rates propagates into the pipeline TSV sr columns
        header = (base / combo_dir / "lh_revbayes_run.trees").read_text()\
            .split("\n")[0]
        n_sr = sum(1 for c in header.split("\t") if c.startswith("sr["))
        assert n_sr == int(combo_dir.rsplit("_", 1)[1])


def test_git_stamp(tmp_path):
    from linearham_tpu.workflow import write_git_stamp

    write_git_stamp(str(tmp_path))
    text = (tmp_path / "git.log").read_text().strip()
    assert text  # commit hash + describe (or package version fallback)


def test_grid_flat_layout(tmp_path, monkeypatch):
    import linearham_tpu.workflow as wf

    seen = []
    monkeypatch.setattr(wf, "run_family_workflow",
                        lambda sub, **kw: seen.append(sub))
    grid = {"mcmc_iter": [10, 20], "mcmc_thin": [1], "num_rates": [2, 4]}

    wf.run_workflow_grid(str(tmp_path), grid, {}, nestly_subdirs=True)
    assert seen == [
        str(tmp_path / "mcmc_iter_10" / "num_rates_2"),
        str(tmp_path / "mcmc_iter_10" / "num_rates_4"),
        str(tmp_path / "mcmc_iter_20" / "num_rates_2"),
        str(tmp_path / "mcmc_iter_20" / "num_rates_4"),
    ]

    seen.clear()
    wf.run_workflow_grid(str(tmp_path), grid, {}, nestly_subdirs=False)
    assert seen == [
        str(tmp_path / "mcmc_iter_10_num_rates_2"),
        str(tmp_path / "mcmc_iter_10_num_rates_4"),
        str(tmp_path / "mcmc_iter_20_num_rates_2"),
        str(tmp_path / "mcmc_iter_20_num_rates_4"),
    ]

    # single-combination grids write straight into the base directory
    seen.clear()
    wf.run_workflow_grid(str(tmp_path), {"mcmc_iter": [10]}, {})
    assert seen == [str(tmp_path)]


def test_repertoire_workflow_batches_pipeline(fixtures_dir, tmp_path,
                                              capsys):
    """--cluster-indices: several clusters' pre-steps run per subdir, the
    pipeline stage batches every stale cluster through ONE repertoire
    device workload, post-processing runs per cluster, and a second
    invocation is fully up to date (VERDICT r04 item 3's workflow-level
    auto-batching)."""
    import numpy as np

    from linearham_tpu.io.trees_tsv import load_tree_samples
    from linearham_tpu.models.phylo_hmm import PhyloHMM
    from linearham_tpu.pipeline.run import run_pipeline_arrays
    from linearham_tpu.workflow import run_repertoire_workflow

    import yaml as _yaml

    import re

    base = tmp_path / "multi"
    for i in range(2):
        d = base / f"cluster_{i}"
        d.mkdir(parents=True)
        tsv = d / "revbayes_run.trees"
        _make_tsv(tsv, n_rows=4 + i, seed=80 + i)
        if i == 1:
            # cluster 1's member ids carry a _b suffix (below); its tree
            # tip labels must match.
            txt = re.sub(r"([(,])([012]):", r"\1\2_b:", tsv.read_text())
            tsv.write_text(txt)

    # The fixture partis yaml has one event; duplicate it (with renamed
    # ids) plus a partition so the output genuinely contains TWO
    # clusters to select by index.
    doc = _yaml.safe_load(
        (fixtures_dir / "phylo_hmm_input.yaml").read_text())
    ev2 = dict(doc["events"][0])
    ev2["unique_ids"] = [f"{u}_b" for u in ev2["unique_ids"]]
    doc["events"] = [doc["events"][0], ev2]
    doc["partitions"] = [{
        "logprob": 0.0,
        "partition": [list(doc["events"][0]["unique_ids"]),
                      list(ev2["unique_ids"])],
    }]
    two_yaml = tmp_path / "partis_two_clusters.yaml"
    two_yaml.write_text(_yaml.safe_dump(doc))

    run_repertoire_workflow(
        str(base),
        partis_yaml_file=str(two_yaml),
        hmm_param_dir=str(fixtures_dir / "hmm_params"),
        cluster_indices=[0, 1],
        num_rates=4, seed=0,
    )
    out = capsys.readouterr().out
    assert "batching 2 clusters" in out

    for i in range(2):
        d = base / f"cluster_{i}"
        for name in ("cluster.yaml", "lh_revbayes_run.trees",
                     "linearham_run.trees", "linearham_run.ess",
                     "aa_naive_seqs.fasta",
                     "linearham_annotations_best.yaml"):
            assert (d / name).exists(), (i, name)
        # Batched pipeline rows == an independent single-family run.
        lines = (d / "lh_revbayes_run.trees").read_text().strip().split(
            "\n")
        header = lines[0].split("\t")
        ll_col = header.index("LHLogLikelihood")
        got = np.array([float(l.split("\t")[ll_col]) for l in lines[1:]])
        hmm = PhyloHMM(str(d / "cluster.yaml"), 0,
                       str(fixtures_dir / "hmm_params"), seed=0)
        ref = run_pipeline_arrays(
            hmm, load_tree_samples(str(d / "revbayes_run.trees")),
            num_rates=4, seed=0)
        np.testing.assert_allclose(got, ref.lh_loglik, rtol=1e-6)

    # Second invocation: nothing stale, nothing re-batched.
    run_repertoire_workflow(
        str(base),
        partis_yaml_file=str(two_yaml),
        hmm_param_dir=str(fixtures_dir / "hmm_params"),
        cluster_indices=[0, 1],
        num_rates=4, seed=0,
    )
    out = capsys.readouterr().out
    assert "batching" not in out
    assert "running" not in out
