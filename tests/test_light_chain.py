"""Light-chain (igk/igl) 5-region path: brute-force oracle + sampling.

The reference test suite only covers igh; here the V-J chain is validated
against an exhaustive path enumeration computed with plain Python loops.
"""

import itertools

import numpy as np
import pytest

from linearham_tpu.io.germline import load_gene_map
from linearham_tpu.models import SimpleHMM
from linearham_tpu.models.phylo_hmm import PhyloHMM
from linearham_tpu.pipeline.run import run_pipeline_arrays, write_output_tsv
from linearham_tpu.io.trees_tsv import load_tree_samples


def test_igk_gene_map_skips_d(fixtures_dir):
    genes = load_gene_map(str(fixtures_dir / "igk_hmm_params"))
    assert sorted(genes) == ["IGKJ_ex*01", "IGKV_ex*01"]


@pytest.fixture(scope="module")
def igk_hmm(fixtures_dir):
    return SimpleHMM(str(fixtures_dir / "simple_hmm_input_igk.yaml"), 0,
                     str(fixtures_dir / "igk_hmm_params"), seed=0)


def test_igk_state_space(igk_hmm):
    space = igk_hmm.space
    assert not space.is_heavy
    assert space.dgerm is None and space.dj_junction is None
    vj = space.vd_junction
    assert (vj.site_start, vj.site_end) == (4, 9)
    assert vj.state_strs == [
        "IGKJ_ex*01:N_A", "IGKJ_ex*01:N_C", "IGKJ_ex*01:N_G",
        "IGKJ_ex*01:N_T", "IGKJ_ex*01:0",
        "IGKV_ex*01:3", "IGKV_ex*01:4",
    ]
    assert space.jgerm.site_inds == [9, 10, 11, 12]
    assert space.jpadding.site_inds == [13, 14]


def test_igk_loglik_matches_brute_force(igk_hmm):
    """Exhaustive path enumeration over the 5-row V-J junction."""
    t = {k: np.asarray(v) for k, v in igk_hmm._trans.items()}
    e = {k: np.asarray(v)[0] for k, v in igk_hmm._emis.items()}
    n_rows, S = e["vd_junction"].shape
    Gv = t["vgerm_static_log"].shape[0]
    Gj = t["jpadding_log"].shape[0]

    with np.errstate(divide="ignore"):
        v_entry = np.exp(t["vgerm_static_log"] + e["vpadding"] + e["vgerm"])
        j_exit = np.exp(t["jpadding_log"] + e["jgerm"] + e["jpadding"])
        emis = np.exp(e["vd_junction"])

    total = 0.0
    for g in range(Gv):
        for path in itertools.product(range(S), repeat=n_rows):
            p = v_entry[g] * t["vgerm_vd"][g, path[0]] * emis[0, path[0]]
            for i in range(1, n_rows):
                p *= t["vd"][path[i - 1], path[i]] * emis[i, path[i]]
            for j in range(Gj):
                total += p * t["vd_dgerm"][path[-1], j] * j_exit[j]

    assert igk_hmm.log_likelihood() == pytest.approx(np.log(total),
                                                     rel=1e-10)


def test_igk_sampling_and_decode(igk_hmm):
    anns = igk_hmm.sample_annotations(50)
    for ann in anns:
        assert ann.dgerm_state is None and ann.dj_insertion is None
        assert ann.vgerm_state == "IGKV_ex*01"
        assert ann.jgerm_state == "IGKJ_ex*01"
        assert len(ann.naive_seq) == 15
        # VJ insertion decodes from NTI states (may be empty).
        assert set(ann.vd_insertion) <= set("ACGT")
        assert ann.v_5p_del == 0 and ann.j_3p_del == 0
        assert ann.j_fwk_insertion == "NN"


def test_igk_phylo_pipeline(fixtures_dir, tmp_path):
    import sys
    sys.path.insert(0, str(tmp_path.parent))
    from test_pipeline import _make_tsv

    hmm = PhyloHMM(str(fixtures_dir / "phylo_hmm_input_igk.yaml"), 0,
                   str(fixtures_dir / "igk_hmm_params"), seed=0)
    tsv = tmp_path / "rb.trees"
    _make_tsv(tsv, n_rows=4, seed=2)
    samples = load_tree_samples(str(tsv))
    result = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0)
    assert np.isfinite(result.lh_loglik).all()

    import io
    buf = io.StringIO()
    write_output_tsv(result, heavy=False, outfile=buf)
    header = buf.getvalue().split("\n")[0].split("\t")
    assert "VJInsertion" in header
    assert "DGene" not in header
