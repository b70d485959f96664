"""Viterbi decoding: MAP score/path conformance against joint probs."""

import numpy as np
import pytest

from linearham_tpu.models import SimpleHMM
from linearham_tpu.models.phylo_hmm import PhyloHMM

from test_simple_hmm import _joint_logprob


@pytest.fixture(scope="module")
def base_hmm(fixtures_dir):
    return SimpleHMM(str(fixtures_dir / "simple_hmm_input.yaml"), 0,
                     str(fixtures_dir / "hmm_params"), seed=0)


def test_map_score_is_its_path_joint_prob(base_hmm):
    ann = base_hmm.map_annotation()
    joint = _joint_logprob(base_hmm, ann.vgerm_idx, ann.vd_idx,
                           ann.dgerm_idx, ann.dj_idx, ann.jgerm_idx)
    assert base_hmm.map_score == pytest.approx(joint, rel=1e-12)
    # MAP score can never exceed the evidence.
    assert base_hmm.map_score <= base_hmm.log_likelihood()


def test_map_dominates_sampled_paths(base_hmm):
    anns = base_hmm.sample_annotations(300)
    best_sampled = max(
        _joint_logprob(base_hmm, a.vgerm_idx, a.vd_idx, a.dgerm_idx,
                       a.dj_idx, a.jgerm_idx)
        for a in anns
    )
    base_hmm.map_annotation()
    assert base_hmm.map_score >= best_sampled - 1e-9
    # On this concentrated fixture the sampler visits the MAP path.
    assert base_hmm.map_score == pytest.approx(best_sampled, rel=1e-9)


def test_map_annotation_extra_and_light(fixtures_dir):
    extra = SimpleHMM(str(fixtures_dir / "simple_hmm_input_extra.yaml"), 0,
                      str(fixtures_dir / "hmm_params"), seed=0)
    ann = extra.map_annotation()
    assert extra.map_score <= extra.log_likelihood()
    assert len(ann.naive_seq) == 15

    igk = SimpleHMM(str(fixtures_dir / "simple_hmm_input_igk.yaml"), 0,
                    str(fixtures_dir / "igk_hmm_params"), seed=0)
    ann = igk.map_annotation()
    assert igk.map_score <= igk.log_likelihood()
    assert ann.dgerm_state is None


def test_phylo_map(fixtures_dir):
    h = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                 str(fixtures_dir / "hmm_params"), seed=0)
    h.init_phylo_parameters(str(fixtures_dir / "newton.tree"),
                            [1.0] * 6, [0.17, 0.19, 0.25, 0.39], 1.0, 4)
    ann = h.map_annotation()
    assert h.map_score <= h.log_likelihood()
    assert len(ann.naive_seq) == 15
    assert ann.vgerm_state == "IGHV_ex*01"
