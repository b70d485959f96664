"""Pipeline + CLI tests: batched ensemble vs single-tree consistency."""

import io
import subprocess
import sys

import numpy as np
import pytest

from linearham_tpu.io.trees_tsv import load_tree_samples
from linearham_tpu.models.phylo_hmm import PhyloHMM
from linearham_tpu.pipeline.run import (
    run_pipeline_arrays,
    write_output_tsv,
)

PI = [0.17, 0.19, 0.25, 0.39]


def _make_tsv(path, n_rows=5, seed=0):
    """Synthesize a RevBayes-style posterior TSV over the fixture taxa."""
    rng = np.random.default_rng(seed)
    cols = (["Iteration", "Likelihood", "Prior", "alpha"]
            + [f"er[{i}]" for i in range(1, 7)]
            + [f"pi[{i}]" for i in range(1, 5)] + ["tree"])
    lines = ["\t".join(cols)]
    topologies = [
        "((0:{a},1:{b}):{c},naive:{d},2:{e});",
        "((0:{a},2:{b}):{c},naive:{d},1:{e});",
        "((1:{a},2:{b})[&index=7]:{c},naive:{d},0:{e});",
    ]
    for t in range(n_rows):
        bl = rng.uniform(0.05, 0.8, size=5)
        tree = topologies[t % 3].format(
            a=bl[0], b=bl[1], c=bl[2], d=bl[3], e=bl[4])
        er = rng.uniform(0.5, 2.0, size=6)
        pi = rng.dirichlet([5, 5, 5, 5])
        alpha = rng.uniform(0.4, 3.0)
        row = ([str(t * 10), f"{-100 - t:.4f}", "-12.0", f"{alpha:.6f}"]
               + [f"{x:.6f}" for x in er] + [f"{x:.6f}" for x in pi]
               + [tree])
        lines.append("\t".join(row))
    path.write_text("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def tsv(tmp_path_factory):
    p = tmp_path_factory.mktemp("pipeline") / "revbayes_run.trees"
    _make_tsv(p)
    return p


def test_pipeline_matches_single_tree(fixtures_dir, tsv, tmp_path):
    hmm = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                   str(fixtures_dir / "hmm_params"), seed=0)
    samples = load_tree_samples(str(tsv))
    result = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0,
                                 chunk_size=2)  # force padded final chunk

    assert result.lh_loglik.shape == (5,)
    np.testing.assert_allclose(
        result.logweight, result.lh_loglik - samples.rb_loglik)

    # Each batched log-likelihood must equal the single-tree path.
    for t in range(samples.n_samples):
        single = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                          str(fixtures_dir / "hmm_params"), seed=0)
        nw_file = tmp_path / f"t{t}.nwk"
        nw_file.write_text(samples.newicks[t] + "\n")
        single.init_phylo_parameters(
            str(nw_file), list(samples.er[t]), list(samples.pi[t]),
            float(samples.alpha[t]), 4)
        assert result.lh_loglik[t] == pytest.approx(
            single.log_likelihood(), rel=1e-9), f"tree {t}"

    # Output TSV round-trips with the expected column contract.
    buf = io.StringIO()
    write_output_tsv(result, heavy=True, outfile=buf)
    lines = buf.getvalue().rstrip("\n").split("\n")
    header = lines[0].split("\t")
    assert header[:4] == ["Iteration", "RBLogLikelihood", "Prior", "alpha"]
    assert "LHLogLikelihood" in header and "NaiveSequence" in header
    assert "VDInsertion" in header and "DJInsertion" in header
    assert len(lines) == 6
    for line in lines[1:]:
        assert len(line.split("\t")) == len(header)
        naive = line.split("\t")[header.index("NaiveSequence")]
        assert len(naive) == 15


def test_tsv_loader_rejects_missing_columns(tmp_path):
    p = tmp_path / "bad.trees"
    p.write_text("Iteration\ttree\n0\t(a,b);\n")
    with pytest.raises(ValueError, match="lacks required columns"):
        load_tree_samples(str(p))


def test_cli_compute_logl(fixtures_dir):
    cmd = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "from linearham_tpu.cli import main; import sys; sys.exit(main())",
        "--compute-logl",
        "--yaml-path", str(fixtures_dir / "phylo_hmm_input.yaml"),
        "--cluster-ind", "0",
        "--hmm-param-dir", str(fixtures_dir / "hmm_params"),
        "--newick-path", str(fixtures_dir / "newton.tree"),
        "--alpha", "1.0", "--num-rates", "4",
    ]
    for x in [1.0] * 6:
        cmd += ["--er", str(x)]
    for x in PI:
        cmd += ["--pi", str(x)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert float(out.stdout.strip()) == pytest.approx(-75.8136, abs=1e-3)


def test_streamed_tsv_matches_batch_write(fixtures_dir, tmp_path):
    """run_pipeline's chunk-streamed TSV must be byte-identical to the
    after-the-fact write_output_tsv of its returned result."""
    from linearham_tpu.pipeline.run import run_pipeline

    tsv = tmp_path / "in.tsv"
    _make_tsv(tsv, n_rows=7, seed=9)
    out = tmp_path / "out.tsv"
    result = run_pipeline(
        str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
        str(fixtures_dir / "hmm_params"), str(tsv), str(out),
        num_rates=4, seed=0, chunk_size=3, precision="f64",
    )
    buf = io.StringIO()
    write_output_tsv(result, heavy=True, outfile=buf)
    assert out.read_text() == buf.getvalue()


def test_crash_leaves_no_partial_output(fixtures_dir, tmp_path, monkeypatch):
    """A mid-run failure must not leave a truncated output TSV for the
    workflow's freshness check to mistake for a completed artifact."""
    import linearham_tpu.pipeline.run as run_mod
    from linearham_tpu.pipeline.run import run_pipeline

    tsv = tmp_path / "in.tsv"
    _make_tsv(tsv, n_rows=6, seed=12)
    out = tmp_path / "out.tsv"

    def boom(*a, **k):
        raise RuntimeError("device died")

    monkeypatch.setattr(run_mod, "run_pipeline_arrays", boom)
    with pytest.raises(RuntimeError, match="device died"):
        run_pipeline(
            str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
            str(fixtures_dir / "hmm_params"), str(tsv), str(out),
            num_rates=4, seed=0, precision="f64",
        )
    assert not out.exists()
    assert not (tmp_path / "out.tsv.partial").exists()


def test_mid_stream_deeper_tree_single_shape(fixtures_dir, tmp_path):
    """A later tree with MORE edges than chunk 0's trees must still be
    computed correctly — and without a second compiled step shape.

    Chunk 0 sees only multifurcating trees (4 edges); tree 3 is fully
    binary (6 edges).  The whole-ensemble pre-parse pins one
    (n_slots, e_max) before the first dispatch, so there is exactly one
    step signature for the run (VERDICT r03 item 5: the per-chunk shape
    growth used to retrace silently mid-stream)."""
    import numpy as np

    from linearham_tpu.utils import exec_cache

    rng = np.random.default_rng(3)
    cols = (["Iteration", "Likelihood", "Prior", "alpha"]
            + [f"er[{i}]" for i in range(1, 7)]
            + [f"pi[{i}]" for i in range(1, 5)] + ["tree"])
    flat = "(0:{a},1:{b},naive:{c},2:{d});"              # 4 edges
    deep = "((0:{a},1:{b}):{c},(naive:{d},2:{e}):{f});"  # 6 edges
    lines = ["\t".join(cols)]
    topo = [flat, flat, flat, deep, flat]
    for t, shape in enumerate(topo):
        bl = rng.uniform(0.05, 0.8, size=6)
        tree = shape.format(a=bl[0], b=bl[1], c=bl[2], d=bl[3], e=bl[4],
                            f=bl[5])
        er = rng.uniform(0.5, 2.0, size=6)
        pi = rng.dirichlet([5, 5, 5, 5])
        row = ([str(t), f"{-90 - t:.4f}", "-8.0", "1.2"]
               + [f"{x:.6f}" for x in er] + [f"{x:.6f}" for x in pi]
               + [tree])
        lines.append("\t".join(row))
    p = tmp_path / "mixed.trees"
    p.write_text("\n".join(lines) + "\n")

    hmm = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                   str(fixtures_dir / "hmm_params"), seed=0)
    samples = load_tree_samples(str(p))

    signatures = []
    orig = exec_cache._signature

    def spy(name, statics, args):
        sig = orig(name, statics, args)
        if name == "phylo_step_packed":
            signatures.append(sig)
        return sig

    exec_cache._signature = spy
    try:
        result = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0,
                                     chunk_size=2)
    finally:
        exec_cache._signature = orig

    # One signature across all 3 chunks: no mid-stream shape growth.
    assert len(set(signatures)) == 1 and len(signatures) == 3

    for t in range(samples.n_samples):
        single = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                          str(fixtures_dir / "hmm_params"), seed=0)
        nw_file = tmp_path / f"mixed_t{t}.nwk"
        nw_file.write_text(samples.newicks[t] + "\n")
        single.init_phylo_parameters(
            str(nw_file), list(samples.er[t]), list(samples.pi[t]),
            float(samples.alpha[t]), 4)
        assert result.lh_loglik[t] == pytest.approx(
            single.log_likelihood(), rel=1e-9), f"tree {t}"


def test_cli_warmup(fixtures_dir, tsv, tmp_path, monkeypatch):
    """`warmup` executes exactly one chunk against full-ensemble shapes
    and leaves the family cache populated for the later pipeline run."""
    import subprocess

    from linearham_tpu.cli import main

    monkeypatch.setenv("LINEARHAM_FAMILY_CACHE", str(tmp_path / "fam"))
    monkeypatch.setenv("LINEARHAM_EXEC_CACHE", "off")
    rc = main(["warmup", "--yaml-path",
               str(fixtures_dir / "phylo_hmm_input.yaml"),
               "--cluster-ind", "0", "--hmm-param-dir",
               str(fixtures_dir / "hmm_params"),
               "--input-path", str(tsv), "--num-rates", "4",
               "--chunk-size", "2", "--precision", "f64"])
    assert rc in (0, None)
    assert any(p.suffix == ".pkl" for p in (tmp_path / "fam").iterdir())


def test_max_chunks_partial_results(fixtures_dir, tsv):
    hmm = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                   str(fixtures_dir / "hmm_params"), seed=0)
    samples = load_tree_samples(str(tsv))
    partial = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0,
                                  chunk_size=2, max_chunks=1)
    full = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0,
                               chunk_size=2)
    assert len(partial.annotations) == 2
    np.testing.assert_allclose(partial.lh_loglik[:2], full.lh_loglik[:2],
                               rtol=1e-12)


def test_cli_repertoire(fixtures_dir, tmp_path, capsys):
    """One-command multi-family path (VERDICT r04 item 3): a manifest of
    families runs as one batched repertoire workload; per-family TSVs
    must match independent run_pipeline_arrays results row-for-row in
    log-likelihood."""
    from linearham_tpu.cli import main

    yaml_path = str(fixtures_dir / "phylo_hmm_input.yaml")
    gene_dir = str(fixtures_dir / "hmm_params")
    manifest = tmp_path / "families.tsv"
    rows = []
    for i in range(3):
        tsv_in = tmp_path / f"fam{i}.trees"
        _make_tsv(tsv_in, n_rows=3 + i, seed=40 + i)
        out = tmp_path / f"lh_fam{i}.trees"
        rows.append(f"{yaml_path}\t0\t{tsv_in}\t{out}")
    manifest.write_text("# comment line\n" + "\n".join(rows) + "\n")

    rc = main(["repertoire", "--families", str(manifest),
               "--hmm-param-dir", gene_dir, "--num-rates", "4",
               "--seed", "0"])
    assert rc == 0
    assert "3 families" in capsys.readouterr().out

    for i in range(3):
        out = tmp_path / f"lh_fam{i}.trees"
        lines = out.read_text().strip().split("\n")
        header = lines[0].split("\t")
        assert lines[1:], "no data rows"
        assert len(lines) - 1 == 3 + i
        ll_col = header.index("LHLogLikelihood")
        got = np.array([float(l.split("\t")[ll_col]) for l in lines[1:]])
        hmm = PhyloHMM(yaml_path, 0, gene_dir, seed=0)
        ref = run_pipeline_arrays(
            hmm, load_tree_samples(str(tmp_path / f"fam{i}.trees")),
            num_rates=4, seed=0)
        np.testing.assert_allclose(got, ref.lh_loglik, rtol=1e-6)


def test_cli_serve(fixtures_dir, tmp_path):
    """The long-lived server: two JSON requests through one process,
    each output TSV matching an independent run; a malformed request
    must not kill the server."""
    import json
    import subprocess

    yaml_path = str(fixtures_dir / "phylo_hmm_input.yaml")
    gene_dir = str(fixtures_dir / "hmm_params")
    reqs = []
    for i in range(2):
        tsv_in = tmp_path / f"srv{i}.trees"
        _make_tsv(tsv_in, n_rows=3, seed=70 + i)
        reqs.append({
            "yaml_path": yaml_path, "cluster_ind": 0,
            "hmm_param_dir": gene_dir, "input_path": str(tsv_in),
            "output_path": str(tmp_path / f"srv_out{i}.trees"),
            "num_rates": 4, "seed": 0,
        })
    stdin = "not json\n" + "\n".join(json.dumps(r) for r in reqs) + "\nquit\n"
    # Pin the server subprocess to CPU/f64 in-process (the container's
    # sitecustomize overrides JAX_PLATFORMS, same dance as conftest).
    wrapper = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; from linearham_tpu.cli import main; "
        "sys.exit(main(['serve']))")
    proc = subprocess.run(
        [sys.executable, "-c", wrapper],
        input=stdin, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    assert lines[0]["ok"] is False          # bad request reported, not fatal
    assert [l["ok"] for l in lines[1:]] == [True, True]
    for i, req in enumerate(reqs):
        out = tmp_path / f"srv_out{i}.trees"
        lines_out = out.read_text().strip().split("\n")
        assert len(lines_out) - 1 == 3
        header = lines_out[0].split("\t")
        ll_col = header.index("LHLogLikelihood")
        got = np.array([float(l.split("\t")[ll_col])
                        for l in lines_out[1:]])
        hmm = PhyloHMM(yaml_path, 0, gene_dir, seed=0)
        ref = run_pipeline_arrays(
            hmm, load_tree_samples(req["input_path"]), num_rates=4, seed=0)
        np.testing.assert_allclose(got, ref.lh_loglik, rtol=1e-6)
