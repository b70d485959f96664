"""Production-shape end-to-end smoke: synthetic family through the whole
workflow via real file contracts (the structural analogue of the
reference's test.sh CI run on the Liao dataset)."""

import json
import os

import numpy as np
import pytest

from linearham_tpu.io.germline import (
    load_gene_map,
    write_gene_dir,
)
from linearham_tpu.utils.synth import (
    make_family,
    make_tree_samples,
    random_newick,
)
from linearham_tpu.workflow import run_family_workflow


def test_gene_yaml_roundtrip(tmp_path):
    fam = make_family(n_seqs=3, n_v=2, n_d=2, n_j=2, v_len=20, d_len=10,
                      j_len=12, seed=7)
    out = tmp_path / "params"
    write_gene_dir(fam.genes, str(out))
    loaded = load_gene_map(str(out))
    assert sorted(loaded) == sorted(fam.genes)
    for name, orig in fam.genes.items():
        back = loaded[name]
        assert back.gtype == orig.gtype
        np.testing.assert_allclose(back.landing_in, orig.landing_in,
                                   atol=1e-12)
        np.testing.assert_allclose(back.landing_out, orig.landing_out,
                                   atol=1e-12)
        np.testing.assert_allclose(back.transition, orig.transition,
                                   atol=1e-12)
        np.testing.assert_allclose(back.emission, orig.emission, atol=1e-12)
        np.testing.assert_array_equal(back.bases, orig.bases)
        if orig.gtype in ("D", "J"):
            np.testing.assert_allclose(back.nti_landing_in,
                                       orig.nti_landing_in, atol=1e-12)
            np.testing.assert_allclose(back.nti_landing_out,
                                       orig.nti_landing_out, atol=1e-12)
            np.testing.assert_allclose(back.nti_transition,
                                       orig.nti_transition, atol=1e-12)
        if orig.gtype in ("V", "J"):
            assert back.n_transition == pytest.approx(orig.n_transition)


def _write_partis_yaml(fam, path):
    codes = "ACGT"
    seqs = ["".join("ACGTN"[b] for b in row) for row in fam.msa]
    naive = "".join("ACGTN"[b] for b in fam.naive_seq_codes)
    doc = {
        "germline-info": {"locus": fam.locus},
        "events": [{
            "input_seqs": seqs,
            "naive_seq": naive,
            "has_shm_indels": [False] * len(seqs),
            "unique_ids": fam.unique_ids,
            "linearham-info": {
                "relpos": fam.relpos,
                "flexbounds": {k: list(v)
                               for k, v in fam.flexbounds.items()},
            },
        }],
    }
    with open(path, "w") as fh:
        json.dump(doc, fh)


def _write_trees_tsv(fam, path, n_rows, seed):
    samples = make_tree_samples(fam, n_rows, seed=seed)
    cols = (["Iteration", "Likelihood", "Prior", "alpha"]
            + [f"er[{i}]" for i in range(1, 7)]
            + [f"pi[{i}]" for i in range(1, 5)] + ["tree"])
    with open(path, "w") as fh:
        fh.write("\t".join(cols) + "\n")
        for t in range(n_rows):
            row = ([str(samples.iteration[t]),
                    f"{samples.rb_loglik[t]:.4f}",
                    f"{samples.prior[t]:.4f}", f"{samples.alpha[t]:.6f}"]
                   + [f"{x:.6f}" for x in samples.er[t]]
                   + [f"{x:.6f}" for x in samples.pi[t]]
                   + [samples.newicks[t]])
            fh.write("\t".join(row) + "\n")


@pytest.mark.parametrize("n_seqs", [25])
def test_synthetic_family_full_workflow(tmp_path, n_seqs):
    fam = make_family(n_seqs=n_seqs, seed=5)
    params_dir = tmp_path / "hmm_params"
    write_gene_dir(fam.genes, str(params_dir))
    partis_yaml = tmp_path / "partis_run.yaml"
    _write_partis_yaml(fam, str(partis_yaml))

    outdir = tmp_path / "out"
    outdir.mkdir()
    _write_trees_tsv(fam, str(outdir / "revbayes_run.trees"), 6, seed=9)

    run_family_workflow(
        str(outdir),
        partis_yaml_file=str(partis_yaml),
        hmm_param_dir=str(params_dir),
        num_rates=4, burnin_frac=0.0, subsamp_frac=0.5, seed=0,
        lineage_unique_ids=["seq0"], pfilters=[0.0],
    )

    # The pipeline TSV has finite logliks over a 370-site family.
    with open(outdir / "lh_revbayes_run.trees") as fh:
        lines = fh.read().rstrip("\n").split("\n")
    header = lines[0].split("\t")
    ll_col = header.index("LHLogLikelihood")
    naive_col = header.index("NaiveSequence")
    assert len(lines) == 7
    for line in lines[1:]:
        fields = line.split("\t")
        assert np.isfinite(float(fields[ll_col]))
        assert len(fields[naive_col]) == fam.n_sites

    for name in ("linearham_run.trees", "linearham_run.ess",
                 "aa_naive_seqs.fasta", "aa_lineage_seqs_seq0.fasta",
                 "linearham_annotations_best.yaml"):
        assert (outdir / name).exists(), name
