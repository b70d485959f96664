"""External-engine command-line contracts, pinned without the binaries.

partis and RevBayes are external engines here exactly as in the reference;
these tests pin the argv each step would execute against the reference's
command lines (SConstruct:296-311, 318-336, 419-426) using mocked or fake
executables, since the real binaries cannot exist in this environment.
"""

import os
import stat
import sys

import pytest

import linearham_tpu.workflow as wf

from test_pipeline import _make_tsv


class _Recorder:
    def __init__(self):
        self.calls = []

    def __call__(self, cmd, **kwargs):
        self.calls.append((list(cmd), kwargs))

        class R:
            returncode = 0
            stdout = ""
        return R()


def test_run_partis_partition_argv(tmp_path, monkeypatch):
    """Default mode: `partis partition ... --extra-annotation-columns
    linearham-info` with the outdir-cached parameter dir
    (SConstruct:296-311)."""
    rec = _Recorder()
    monkeypatch.setattr(wf.subprocess, "run", rec)
    out = wf.run_partis(str(tmp_path), "in.fasta", "/opt/partis/bin/partis")
    assert out == os.path.join(str(tmp_path), "partis_run.yaml")
    (cmd, kwargs), = rec.calls
    assert cmd == [
        "/opt/partis/bin/partis", "partition",
        "--infname", "in.fasta",
        "--parameter-dir", os.path.join(str(tmp_path), "parameter_dir"),
        "--locus", "igh",
        "--extra-annotation-columns", "linearham-info",
        "--outfname", os.path.join(str(tmp_path), "partis_run.yaml"),
    ]
    assert kwargs["check"] is True
    # stdout goes to partis_run.stdout.log (the reference's 2nd target)
    assert kwargs["stdout"].name == os.path.join(
        str(tmp_path), "partis_run.stdout.log")


def test_run_partis_annotate_argv(tmp_path, monkeypatch):
    """--all-clonal-seqs switches the mode to `annotate
    --all-seqs-simultaneous`, and an explicit parameter dir adds
    --refuse-to-cache-parameters (SConstruct:298-299)."""
    rec = _Recorder()
    monkeypatch.setattr(wf.subprocess, "run", rec)
    wf.run_partis(str(tmp_path), "x.fa", "partis", locus="igk",
                  parameter_dir="/params/", all_clonal_seqs=True)
    (cmd, _), = rec.calls
    assert cmd == [
        "partis", "annotate", "--all-seqs-simultaneous",
        "--infname", "x.fa",
        "--parameter-dir", "/params", "--refuse-to-cache-parameters",
        "--locus", "igk",
        "--extra-annotation-columns", "linearham-info",
        "--outfname", os.path.join(str(tmp_path), "partis_run.yaml"),
    ]


def test_run_get_linearham_info_argv(monkeypatch):
    """`partis get-linearham-info --outfname <existing yaml>
    --parameter-dir <dir> --linearham-info-fname <target>`
    (SConstruct:318-336)."""
    rec = _Recorder()
    monkeypatch.setattr(wf.subprocess, "run", rec)
    wf.run_get_linearham_info("run.yaml", "partis", "run.lh.yaml",
                              parameter_dir="/p/")
    (cmd, kwargs), = rec.calls
    assert cmd == [
        "partis", "get-linearham-info",
        "--outfname", "run.yaml",
        "--parameter-dir", "/p",
        "--linearham-info-fname", "run.lh.yaml",
    ]
    assert kwargs["check"] is True


def test_revbayes_invocation_via_fake_binary(fixtures_dir, tmp_path):
    """The revbayes step executes `<rb> <rev_file>` with cwd=outdir
    (SConstruct:419-426: `rb $SOURCE`); a fake rb records its argv/cwd
    and produces the trees artifact, and the workflow then completes."""
    out = tmp_path / "wf"
    out.mkdir()
    staged = tmp_path / "staged.trees"
    _make_tsv(staged, n_rows=6, seed=2)

    rb = tmp_path / "fake_rb"
    rb.write_text(
        "#!/bin/sh\n"
        f"echo \"$@\" > {tmp_path}/rb_argv.log\n"
        f"pwd > {tmp_path}/rb_cwd.log\n"
        f"cp {staged} revbayes_run.trees\n"
    )
    rb.chmod(rb.stat().st_mode | stat.S_IEXEC)

    wf.run_family_workflow(
        str(out),
        partis_yaml_file=str(fixtures_dir / "phylo_hmm_input.yaml"),
        hmm_param_dir=str(fixtures_dir / "hmm_params"),
        mcmc_iter=10, mcmc_thin=1, tune_iter=0, tune_thin=1,
        num_rates=4, burnin_frac=0.0, subsamp_frac=0.5, seed=0,
        rb_binary=str(rb),
    )
    assert (tmp_path / "rb_argv.log").read_text().split() == [
        str(out / "revbayes_run.rev")]
    assert (tmp_path / "rb_cwd.log").read_text().strip() == \
        os.path.realpath(out)
    assert (out / "linearham_run.trees").exists()


def test_workflow_cli_flag_names(tmp_path, monkeypatch):
    """The CLI keeps the reference SConstruct's flag spellings
    (SConstruct:48-160), including the multi-valued --rng-seed grid axis
    and --template-path."""
    seen = {}

    def fake_grid(base, grid, fixed, nestly_subdirs=True):
        seen.update(base=base, grid=grid, fixed=fixed,
                    nestly=nestly_subdirs)

    monkeypatch.setattr(wf, "run_workflow_grid", fake_grid)
    template = tmp_path / "t.rev"
    template.write_text("seed({{ seed }})\n")
    rc = wf.main([
        "--outdir", str(tmp_path / "o"),
        "--partis-yaml-file", "p.yaml",
        "--hmm-param-dir", "hmm",
        "--cluster-seed-unique-id", "seqA",
        "--rng-seed", "0,1",
        "--asr-pfilters", "0.1,0.05",
        "--template-path", str(template),
        "--no-nestly-subdirs",
    ])
    assert rc == 0
    assert seen["grid"]["seed"] == [0, 1]
    assert seen["fixed"]["seed_unique_id"] == "seqA"
    assert seen["fixed"]["pfilters"] == [0.1, 0.05]
    assert seen["fixed"]["template_path"] == str(template)
    assert seen["nestly"] is False


def test_template_path_rendering(tmp_path):
    """A user template's {{ var }} fields substitute exactly the
    variables the reference passes to jinja2
    (scripts/generate_revbayes_rev_file.py:42-52)."""
    from linearham_tpu.postprocess.revbayes_config import generate_rev_file

    template = tmp_path / "custom.rev"
    template.write_text(
        'seed({{ seed }})\ndata = "{{ fasta_path }}"\n'
        "mcmc({{ mcmc_iter }}, {{ mcmc_thin }}, {{ tune_iter }}, "
        "{{ tune_thin }})\nrates({{num_rates}})\n"
        'out = "{{ output_base }}.trees"\n')
    out = tmp_path / "run.rev"
    text = generate_rev_file(
        "seqs.fasta", str(out), 100, 2, 50, 5, 4, 7,
        template_path=str(template))
    assert text == (
        'seed(7)\ndata = "seqs.fasta"\nmcmc(100, 2, 50, 5)\nrates(4)\n'
        f'out = "{tmp_path / "run"}.trees"\n')
    assert out.read_text() == text

    bad = tmp_path / "bad.rev"
    bad.write_text("{{ not_a_var }}")
    with pytest.raises(KeyError, match="not_a_var"):
        generate_rev_file("s.fa", str(out), 1, 1, 1, 1, 1, 1,
                          template_path=str(bad))
