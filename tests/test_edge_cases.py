"""Degenerate-input hardening (VERDICT round-1 item 7).

Malformed Smith-Waterman summaries fail with actionable messages in the
state-space compiler (reference validation style: src/HMM.cpp:34-43);
legal-but-extreme inputs -- zero-width germline match regions, a
single-sequence clonal family -- run through the full device path.
"""

import numpy as np
import pytest
import yaml

from linearham_tpu.compiler.state_space import build_state_space
from linearham_tpu.io.germline import load_gene_map
from linearham_tpu.models import SimpleHMM

BOUNDS = {"v_l": (0, 2), "v_r": (4, 6), "d_l": (7, 8),
          "d_r": (9, 10), "j_l": (11, 12), "j_r": (15, 15)}
RELPOS = {"IGHD_ex*01": 5, "IGHJ_ex*01": 10, "IGHV_ex*01": 1}


@pytest.fixture(scope="module")
def genes(fixtures_dir):
    return load_gene_map(str(fixtures_dir / "hmm_params"))


def _build(genes, **overrides):
    fb = dict(BOUNDS)
    fb.update(overrides)
    return build_state_space("igh", fb, RELPOS, genes)


def test_zero_width_junction_rejected(genes):
    with pytest.raises(ValueError, match="zero width"):
        _build(genes, v_r=(5, 5), d_l=(5, 5))


def test_missing_window_rejected(genes):
    fb = {k: v for k, v in BOUNDS.items() if k != "d_r"}
    with pytest.raises(ValueError, match="d_r"):
        build_state_space("igh", fb, RELPOS, genes)


def test_reversed_window_rejected(genes):
    with pytest.raises(ValueError, match="not a valid"):
        _build(genes, v_r=(6, 4))


def test_out_of_order_windows_rejected(genes):
    with pytest.raises(ValueError, match="out of order"):
        _build(genes, d_l=(2, 3))


def test_unknown_gene_rejected(genes):
    relpos = dict(RELPOS, **{"IGHV_missing*01": 1})
    with pytest.raises(ValueError, match="IGHV_missing"):
        build_state_space("igh", BOUNDS, relpos, genes)


def test_empty_d_germline_region_rejected(fixtures_dir, tmp_path):
    """Flexbounds that squeeze the whole D match into the junctions leave a
    zero-width D germline region.  The collapsed-region factorization (one
    state per gene per germline region) cannot represent position-resolved
    continuation through an empty region -- the reference's factorization
    has the same structural requirement -- so this is rejected with an
    actionable message instead of silently computing a wrong likelihood."""
    with open(fixtures_dir / "simple_hmm_input.yaml") as fh:
        root = yaml.safe_load(fh)
    fb = root["events"][0]["linearham-info"]["flexbounds"]
    fb["d_r"] = [8, 10]  # d germline width = d_r[0] - d_l[1] = 0
    path = tmp_path / "empty_dgerm.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(root, fh, sort_keys=False)

    with pytest.raises(ValueError, match="germline region.*zero width"):
        SimpleHMM(str(path), 0, str(fixtures_dir / "hmm_params"), seed=0)


def test_gene_not_spanning_window_rejected(genes):
    """A gene too short for its germline window fails with an actionable
    error instead of indexing past the gene body."""
    relpos = dict(RELPOS, **{"IGHJ_ex*01": 13})  # 5-long J starting at 13
    with pytest.raises(ValueError, match="does not span"):
        build_state_space("igh", BOUNDS, relpos, genes)


def test_single_sequence_family_full_phylo():
    """A one-sequence clonal family through the batched phylo pipeline."""
    from linearham_tpu.models.phylo_hmm import PhyloHMM
    from linearham_tpu.pipeline.run import run_pipeline_arrays
    from linearham_tpu.utils.synth import make_family, make_tree_samples

    fam = make_family(n_seqs=1, seed=4)
    hmm = PhyloHMM.from_parts(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes, fam.msa,
        fam.unique_ids, fam.n_sites, seed=0,
    )
    samples = make_tree_samples(fam, 4, seed=4)
    result = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0)
    assert np.isfinite(result.lh_loglik).all()
    assert len(result.annotations) == 4
    assert all(len(a.naive_seq) == fam.n_sites for a in result.annotations)
