"""Post-processing stage tests: bootstrap/ESS/ASR, tabulations,
annotations, and the workflow runner with file-artifact resume."""

import os

import numpy as np
import pytest

from linearham_tpu.io.partis import load_cluster
from linearham_tpu.io.trees_tsv import load_tree_samples
from linearham_tpu.models.phylo_hmm import PhyloHMM
from linearham_tpu.pipeline.run import run_pipeline_arrays, write_output_tsv
from linearham_tpu.postprocess.annotations import write_lh_annotations
from linearham_tpu.postprocess.bootstrap_asr import run_bootstrap_asr
from linearham_tpu.postprocess.lineage_probs import tabulate_lineage_probs
from linearham_tpu.postprocess.naive_probs import (
    read_naive_seqs,
    tabulate_naive_probs,
)
from linearham_tpu.utils.seqs import read_fasta, translate, write_fasta
from linearham_tpu.utils.stats import effective_sample_size

from test_pipeline import _make_tsv


def test_effective_sample_size():
    rng = np.random.default_rng(0)
    iid = rng.normal(size=4000)
    ess = effective_sample_size(iid)
    assert 3000 < ess < 5200
    # AR(1): ess ~= N (1-phi)/(1+phi)
    phi = 0.9
    x = np.zeros(8000)
    for i in range(1, len(x)):
        x[i] = phi * x[i - 1] + rng.normal()
    expected = len(x) * (1 - phi) / (1 + phi)
    assert effective_sample_size(x) == pytest.approx(expected, rel=0.5)
    assert effective_sample_size(np.ones(100)) == 0.0


@pytest.fixture(scope="module")
def pipeline_out(fixtures_dir, tmp_path_factory):
    """A pipeline output TSV + cluster FASTA over the phylo fixture."""
    tmp = tmp_path_factory.mktemp("post")
    tsv_in = tmp / "revbayes_run.trees"
    _make_tsv(tsv_in, n_rows=12, seed=3)

    hmm = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                   str(fixtures_dir / "hmm_params"), seed=0)
    samples = load_tree_samples(str(tsv_in))
    result = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0)
    out_tsv = tmp / "lh_revbayes_run.trees"
    with open(out_tsv, "w") as fh:
        write_output_tsv(result, heavy=True, outfile=fh)

    cluster = load_cluster(str(fixtures_dir / "phylo_hmm_input.yaml"), 0)
    fasta = tmp / "cluster_seqs.fasta"
    seqs = {"naive": cluster.naive_seq}
    seqs.update(dict(zip(cluster.unique_ids, cluster.seqs)))
    write_fasta(seqs, str(fasta))
    return tmp, out_tsv, fasta


def test_bootstrap_asr_end_to_end(pipeline_out):
    tmp, out_tsv, fasta = pipeline_out
    base = str(tmp / "linearham_run")
    result = run_bootstrap_asr(str(out_tsv), str(fasta),
                               burnin_frac=0.25, subsamp_frac=0.5,
                               seed=0, output_base=base)
    n_after_burnin = 12 - 3
    assert len(result.rows) == int(0.5 * n_after_burnin)
    assert len(result.annotated_trees) == len(result.rows)
    assert "LHLogLikelihood" in result.ess and "alpha" in result.ess

    # Every annotated tree must carry ancestral sequences on all nodes;
    # the naive tip keeps the sampled naive sequence verbatim and the
    # internal nodes carry fully resolved bases.
    naive_seqs = read_naive_seqs(base + ".trees")
    assert all(len(s) == 15 for s in naive_seqs)
    from linearham_tpu.io.annotated_newick import parse_annotated_newick
    for row, tree_line in zip(result.rows, result.annotated_trees):
        root = parse_annotated_newick(tree_line)
        assert root.find_tip("naive").annotations["ancestral"] == \
            row["NaiveSequence"]
        for node in root.walk():
            anc = node.annotations.get("ancestral")
            assert anc is not None and len(anc) == 15
            if not node.is_tip:
                assert set(anc) <= set("ACGT")
    assert os.path.exists(base + ".log")
    assert os.path.exists(base + ".ess")


def test_naive_and_lineage_tabulation(pipeline_out):
    tmp, out_tsv, fasta = pipeline_out
    base = str(tmp / "linearham_run")
    if not os.path.exists(base + ".trees"):
        run_bootstrap_asr(str(out_tsv), str(fasta), 0.25, 0.5, 0,
                          output_base=base)

    naive_base = str(tmp / "aa_naive_seqs")
    named = tabulate_naive_probs(base + ".trees", naive_base,
                                 make_png=False)
    fasta_back = read_fasta(naive_base + ".fasta")
    assert fasta_back == dict(named)
    probs = [float(name.split("_")[2]) for name in named]
    assert abs(sum(probs) - 1.0) < 1e-9
    assert probs == sorted(probs, reverse=True)

    lineage_base = str(tmp / "aa_lineage_seqs")
    out = tabulate_lineage_probs(base + ".trees", naive_base + ".fasta",
                                 seed_seq="0", pfilters=[0.0, 0.5],
                                 output_base=lineage_base)
    assert os.path.exists(lineage_base + ".fasta")
    assert os.path.exists(lineage_base + ".dnamap")
    assert os.path.exists(lineage_base + ".pfilter0.0.dot")
    assert "0" in out  # the seed sequence is present by name


def test_write_lh_annotations(pipeline_out, fixtures_dir):
    tmp, out_tsv, fasta = pipeline_out
    base = str(tmp / "linearham_run")
    if not os.path.exists(base + ".trees"):
        run_bootstrap_asr(str(out_tsv), str(fasta), 0.25, 0.5, 0,
                          output_base=base)
    ann_base = str(tmp / "linearham_annotations")
    out = write_lh_annotations(
        str(fixtures_dir / "phylo_hmm_input.yaml"),
        base + ".log", base + ".trees", ann_base,
    )
    assert sum(np.exp(e["logprob"]) for e in out) == pytest.approx(1.0)
    counts = [len(e["tree-info"]["linearham"]["trees"]) for e in out]
    assert counts == sorted(counts, reverse=True)

    import yaml
    with open(ann_base + "_best.yaml") as fh:
        best = yaml.safe_load(fh)
    ev = best["events"][0]
    assert ev["v_gene"] == "IGHV_ex*01"
    assert "naive_seq" in ev and "logprob" in ev
