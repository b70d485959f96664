"""SimpleHMM conformance: golden log-likelihoods, decode, FFBS posterior.

Golden values come from the reference test suite (test/test.cpp:457,718 and
the seed-0 sampled-path annotations); sampled paths are checked
distributionally since RNG streams differ by design.
"""

import numpy as np
import pytest

from linearham_tpu.models import SimpleHMM
from linearham_tpu.models.decode import decode_path


@pytest.fixture(scope="module")
def base_hmm(fixtures_dir):
    return SimpleHMM(str(fixtures_dir / "simple_hmm_input.yaml"), 0,
                     str(fixtures_dir / "hmm_params"), seed=0)


@pytest.fixture(scope="module")
def extra_hmm(fixtures_dir):
    return SimpleHMM(str(fixtures_dir / "simple_hmm_input_extra.yaml"), 0,
                     str(fixtures_dir / "hmm_params"), seed=0)


def test_golden_loglik(base_hmm, extra_hmm):
    assert base_hmm.log_likelihood() == pytest.approx(-42.8027747544,
                                                      rel=1e-8)
    assert extra_hmm.log_likelihood() == pytest.approx(-37.1354672701,
                                                       rel=1e-8)


def test_decode_reference_path_base(base_hmm):
    """Decode the path the reference sampled at seed 0 (test.cpp:377-399)."""
    ann = decode_path(
        base_hmm.space,
        vgerm_idx=0, vd_idx=[7, 4, 5, 6], dgerm_idx=0, dj_idx=[4, 5, 6],
        jgerm_idx=0, n_sites=15,
    )
    assert ann.naive_seq == "NATGAGGTATATGCG"
    assert ann.vgerm_state == "IGHV_ex*01"
    assert (ann.v_5p_del, ann.v_3p_del) == (0, 1)
    assert ann.v_fwk_insertion == "N"
    assert ann.vd_states == ["IGHV_ex*01:3", "IGHD_ex*01:0", "IGHD_ex*01:1",
                             "IGHD_ex*01:2"]
    assert ann.vd_insertion == ""
    assert ann.dgerm_state == "IGHD_ex*01"
    assert (ann.d_5p_del, ann.d_3p_del) == (0, 1)
    assert ann.dj_states == ["IGHJ_ex*01:N_T", "IGHJ_ex*01:0",
                             "IGHJ_ex*01:1"]
    assert ann.dj_insertion == "T"
    assert ann.jgerm_state == "IGHJ_ex*01"
    assert (ann.j_5p_del, ann.j_3p_del) == (0, 0)
    assert ann.j_fwk_insertion == ""


def test_decode_reference_path_extra(extra_hmm):
    """Decode the path the reference sampled at seed 0 (test.cpp:640-660)."""
    ann = decode_path(
        extra_hmm.space,
        vgerm_idx=1, vd_idx=[13, 14], dgerm_idx=1, dj_idx=[5, 7],
        jgerm_idx=0, n_sites=15,
    )
    assert ann.naive_seq == "NCAGGACACTATGCG"
    assert ann.vgerm_state == "IGHV_ex*99"
    assert (ann.v_5p_del, ann.v_3p_del) == (0, 3)
    assert ann.vd_insertion == ""
    assert ann.dgerm_state == "IGHD_ex*99"
    assert (ann.d_5p_del, ann.d_3p_del) == (3, 2)
    assert ann.dj_insertion == "CT"
    assert ann.jgerm_state == "IGHJ_ex*01"
    assert (ann.j_5p_del, ann.j_3p_del) == (0, 0)
    assert ann.j_fwk_insertion == ""


def _joint_logprob(hmm, vgerm, vd, dgerm, dj, jgerm):
    """Independent arithmetic for one path's joint log-probability."""
    t = {k: np.asarray(v) for k, v in hmm._trans.items()}
    e = {k: np.asarray(v)[0] for k, v in hmm._emis.items()}
    with np.errstate(divide="ignore"):
        lp = t["vgerm_static_log"][vgerm] + e["vpadding"][vgerm] \
            + e["vgerm"][vgerm]
        lp += np.log(t["vgerm_vd"][vgerm, vd[0]])
        for i in range(1, len(vd)):
            lp += np.log(t["vd"][vd[i - 1], vd[i]])
        for i, s in enumerate(vd):
            lp += e["vd_junction"][i, s]
        lp += np.log(t["vd_dgerm"][vd[-1], dgerm]) + e["dgerm"][dgerm]
        lp += np.log(t["dgerm_dj"][dgerm, dj[0]])
        for i in range(1, len(dj)):
            lp += np.log(t["dj"][dj[i - 1], dj[i]])
        for i, s in enumerate(dj):
            lp += e["dj_junction"][i, s]
        lp += np.log(t["dj_jgerm"][dj[-1], jgerm]) \
            + t["jpadding_log"][jgerm] + e["jgerm"][jgerm] \
            + e["jpadding"][jgerm]
    return lp


def test_ffbs_samples_true_posterior(base_hmm):
    """Empirical path frequencies must match exact posterior probabilities.

    The exact posterior of a full path is exp(joint - evidence), with the
    joint recomputed here from the raw tensors (not via the sampler's own
    conditionals), so this catches any indexing/ordering bug in the FFBS
    scan.
    """
    n = 4000
    counts = {}
    for ann in base_hmm.sample_annotations(n):
        key = (ann.vgerm_idx, tuple(ann.vd_idx), ann.dgerm_idx,
               tuple(ann.dj_idx), ann.jgerm_idx)
        counts[key] = counts.get(key, 0) + 1

    loglik = base_hmm.log_likelihood()
    checked = 0
    for key, c in sorted(counts.items(), key=lambda kv: -kv[1])[:5]:
        vgerm, vd, dgerm, dj, jgerm = key
        p_exact = np.exp(
            _joint_logprob(base_hmm, vgerm, list(vd), dgerm, list(dj),
                           jgerm) - loglik
        )
        p_emp = c / n
        se = np.sqrt(p_exact * (1 - p_exact) / n)
        assert abs(p_emp - p_exact) < max(5 * se, 0.005), (
            f"path {key}: empirical {p_emp:.4f} vs exact {p_exact:.4f}"
        )
        checked += 1
    assert checked >= 3  # the fixture posterior has several visited paths
