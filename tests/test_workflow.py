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
