"""Conformance tests for the state-space compiler and transition tensors.

Expected values mirror the reference's SimpleHMM state-space/transition
literals for both fixtures (reference test/test.cpp:245-470 and :485-745).
"""

import json

import numpy as np
import pytest

from linearham_tpu.compiler.state_space import build_state_space
from linearham_tpu.compiler.transitions import build_transitions
from linearham_tpu.io.germline import load_gene_map


def _space(fixtures_dir, input_name):
    with open(fixtures_dir / input_name) as fh:
        data = json.load(fh)
    ev = data["events"][0]
    genes = load_gene_map(str(fixtures_dir / "hmm_params"))
    space = build_state_space(
        data["germline-info"]["locus"],
        ev["linearham-info"]["flexbounds"],
        ev["linearham-info"]["relpos"],
        genes,
    )
    return space, genes


@pytest.fixture(scope="module")
def base(fixtures_dir):
    return _space(fixtures_dir, "simple_hmm_input.yaml")


@pytest.fixture(scope="module")
def extra(fixtures_dir):
    return _space(fixtures_dir, "simple_hmm_input_extra.yaml")


def test_base_regions(base):
    space, _ = _space_genes = base
    assert space.locus == "igh"
    assert space.alphabet == "ACGTN"

    assert space.vpadding.ggene_ranges == {"IGHV_ex*01": (0, 1)}
    assert space.vpadding.naive_bases == [4]
    assert space.vpadding.site_inds == [0]

    assert space.vgerm.state_strs == ["IGHV_ex*01"]
    assert space.vgerm.left_del == [0]
    assert space.vgerm.right_del == [2]
    assert space.vgerm.ggene_ranges == {"IGHV_ex*01": (0, 3)}
    assert space.vgerm.naive_bases == [0, 3, 2]
    assert space.vgerm.germ_inds == [0, 1, 2]
    assert space.vgerm.site_inds == [1, 2, 3]

    vd = space.vd_junction
    assert vd.state_strs == [
        "IGHD_ex*01:N_A", "IGHD_ex*01:N_C", "IGHD_ex*01:N_G",
        "IGHD_ex*01:N_T", "IGHD_ex*01:0", "IGHD_ex*01:1", "IGHD_ex*01:2",
        "IGHV_ex*01:3", "IGHV_ex*01:4",
    ]
    assert vd.deletions == [-1, -1, -1, -1, 0, 1, 2, 1, 0]
    assert vd.gtypes == ["D"] * 7 + ["V"] * 2
    assert vd.ggene_ranges == {"IGHD_ex*01": (0, 7), "IGHV_ex*01": (7, 9)}
    assert vd.naive_bases == [0, 1, 2, 3, 2, 2, 3, 0, 1]
    assert vd.germ_inds == [-1, -1, -1, -1, 0, 1, 2, 3, 4]
    assert vd.site_inds == [-1, -1, -1, -1, 5, 6, 7, 4, 5]
    assert (vd.site_start, vd.site_end) == (4, 8)

    assert space.dgerm.state_strs == ["IGHD_ex*01"]
    assert space.dgerm.left_del == [3]
    assert space.dgerm.right_del == [1]
    assert space.dgerm.ggene_ranges == {"IGHD_ex*01": (0, 1)}
    assert space.dgerm.naive_bases == [0]
    assert space.dgerm.germ_inds == [3]
    assert space.dgerm.site_inds == [8]

    dj = space.dj_junction
    assert dj.state_strs == [
        "IGHD_ex*01:4", "IGHJ_ex*01:N_A", "IGHJ_ex*01:N_C", "IGHJ_ex*01:N_G",
        "IGHJ_ex*01:N_T", "IGHJ_ex*01:0", "IGHJ_ex*01:1",
    ]
    assert dj.deletions == [0, -1, -1, -1, -1, 0, 1]
    assert dj.gtypes == ["D"] + ["J"] * 6
    assert dj.ggene_ranges == {"IGHD_ex*01": (0, 1), "IGHJ_ex*01": (1, 7)}
    assert dj.naive_bases == [1, 0, 1, 2, 3, 0, 3]
    assert dj.germ_inds == [4, -1, -1, -1, -1, 0, 1]
    assert dj.site_inds == [9, -1, -1, -1, -1, 10, 11]
    assert (dj.site_start, dj.site_end) == (9, 12)

    assert space.jgerm.state_strs == ["IGHJ_ex*01"]
    assert space.jgerm.left_del == [2]
    assert space.jgerm.right_del == [0]
    assert space.jgerm.ggene_ranges == {"IGHJ_ex*01": (0, 3)}
    assert space.jgerm.naive_bases == [2, 1, 2]
    assert space.jgerm.germ_inds == [2, 3, 4]
    assert space.jgerm.site_inds == [12, 13, 14]

    assert space.jpadding.ggene_ranges == {"IGHJ_ex*01": (0, 0)}
    assert space.jpadding.naive_bases == []
    assert space.jpadding.site_inds == []


def test_base_transitions(base):
    space, genes = base
    trans = build_transitions(space, genes)

    np.testing.assert_allclose(trans.vpadding, [0.34 * 0.66])
    np.testing.assert_allclose(
        trans.vgerm_vd,
        [[0.035 * 0.2 * 0.1, 0.035 * 0.2 * 0.2, 0.035 * 0.2 * 0.1,
          0.035 * 0.2 * 0.05, 0, 0, 0, 0.8, 0]],
    )
    expected_vd = np.array([
        [0.075, 0.175, 0.05, 0.025, 0.45, 0.125, 0.1, 0, 0],
        [0.075, 0.175, 0.05, 0.025, 0.45, 0.125, 0.1, 0, 0],
        [0.075, 0.175, 0.05, 0.025, 0.45, 0.125, 0.1, 0, 0],
        [0.075, 0.175, 0.05, 0.025, 0.45, 0.125, 0.1, 0, 0],
        [0, 0, 0, 0, 0, 0.98, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0.95, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0.035 * 0.5 * 0.1, 0.035 * 0.5 * 0.2, 0.035 * 0.5 * 0.1,
         0.035 * 0.5 * 0.05, 0.035 * 0.5 * 0.4, 0, 0, 0, 0.5],
        [0.035 * 1 * 0.1, 0.035 * 1 * 0.2, 0.035 * 1 * 0.1,
         0.035 * 1 * 0.05, 0, 0.035 * 1 * 0.1, 0, 0, 0],
    ])
    np.testing.assert_allclose(trans.vd, expected_vd)
    np.testing.assert_allclose(
        trans.vd_dgerm, [[0], [0], [0], [0], [0], [0], [0.6], [0], [0]]
    )
    np.testing.assert_allclose(
        trans.dgerm_dj,
        [[0.35, 0.015 * 0.65 * 0.1, 0.015 * 0.65 * 0.2, 0.015 * 0.65 * 0.2,
          0.015 * 0.65 * 0.2, 0, 0]],
    )
    expected_dj = np.array([
        [0, 0.015 * 0.1, 0.015 * 0.2, 0.015 * 0.2, 0.015 * 0.2,
         0.015 * 0.25, 0],
        [0, 0.05, 0.15, 0.075, 0.075, 0.4, 0.25],
        [0, 0.05, 0.15, 0.075, 0.075, 0.4, 0.25],
        [0, 0.05, 0.15, 0.075, 0.075, 0.4, 0.25],
        [0, 0.05, 0.15, 0.075, 0.075, 0.4, 0.25],
        [0, 0, 0, 0, 0, 0, 1],
        [0, 0, 0, 0, 0, 0, 0],
    ])
    np.testing.assert_allclose(trans.dj, expected_dj)
    np.testing.assert_allclose(
        trans.dj_jgerm, [[0], [0], [0], [0], [0], [0], [1]]
    )
    np.testing.assert_allclose(trans.jpadding, [0.04])


def test_extra_regions(extra):
    space, _ = extra
    assert space.vgerm.state_strs == ["IGHV_ex*01", "IGHV_ex*99"]
    assert space.vgerm.left_del == [0, 0]
    assert space.vgerm.right_del == [2, 5]
    assert space.vgerm.ggene_ranges == {
        "IGHV_ex*01": (0, 3), "IGHV_ex*99": (3, 6)}
    assert space.vgerm.naive_bases == [0, 3, 2, 1, 0, 2]
    assert space.vgerm.germ_inds == [0, 1, 2, 0, 1, 2]
    assert space.vgerm.site_inds == [1, 2, 3, 1, 2, 3]

    vd = space.vd_junction
    assert vd.state_strs == [
        "IGHD_ex*01:N_A", "IGHD_ex*01:N_C", "IGHD_ex*01:N_G",
        "IGHD_ex*01:N_T", "IGHD_ex*01:0", "IGHD_ex*99:N_A", "IGHD_ex*99:N_C",
        "IGHD_ex*99:N_G", "IGHD_ex*99:N_T", "IGHD_ex*99:1", "IGHD_ex*99:2",
        "IGHV_ex*01:3", "IGHV_ex*01:4", "IGHV_ex*99:3", "IGHV_ex*99:4",
    ]
    assert vd.deletions == [-1, -1, -1, -1, 0, -1, -1, -1, -1, 1, 2, 1, 0,
                            4, 3]
    assert vd.ggene_ranges == {
        "IGHD_ex*01": (0, 5), "IGHD_ex*99": (5, 11),
        "IGHV_ex*01": (11, 13), "IGHV_ex*99": (13, 15),
    }
    assert vd.naive_bases == [0, 1, 2, 3, 2, 0, 1, 2, 3, 2, 3, 0, 1, 2, 0]
    assert vd.germ_inds == [-1, -1, -1, -1, 0, -1, -1, -1, -1, 1, 2, 3, 4,
                            3, 4]
    assert vd.site_inds == [-1, -1, -1, -1, 5, -1, -1, -1, -1, 4, 5, 4, 5,
                            4, 5]

    assert space.dgerm.state_strs == ["IGHD_ex*01", "IGHD_ex*99"]
    assert space.dgerm.left_del == [1, 3]
    assert space.dgerm.right_del == [2, 2]
    assert space.dgerm.naive_bases == [2, 3, 1, 0]
    assert space.dgerm.germ_inds == [1, 2, 3, 4]
    assert space.dgerm.site_inds == [6, 7, 6, 7]

    dj = space.dj_junction
    assert dj.state_strs == [
        "IGHD_ex*01:3", "IGHD_ex*01:4", "IGHD_ex*99:5", "IGHD_ex*99:6",
        "IGHJ_ex*01:N_A", "IGHJ_ex*01:N_C", "IGHJ_ex*01:N_G",
        "IGHJ_ex*01:N_T", "IGHJ_ex*99:N_A", "IGHJ_ex*99:N_C",
        "IGHJ_ex*99:N_G", "IGHJ_ex*99:N_T", "IGHJ_ex*99:1", "IGHJ_ex*99:2",
    ]
    assert dj.deletions == [1, 0, 1, 0, -1, -1, -1, -1, -1, -1, -1, -1, 1, 2]
    assert dj.naive_bases == [0, 1, 0, 1, 0, 1, 2, 3, 0, 1, 2, 3, 3, 2]
    assert dj.germ_inds == [3, 4, 5, 6, -1, -1, -1, -1, -1, -1, -1, -1, 1, 2]
    assert dj.site_inds == [8, 9, 8, 9, -1, -1, -1, -1, -1, -1, -1, -1, 8, 9]

    assert space.jgerm.state_strs == ["IGHJ_ex*01", "IGHJ_ex*99"]
    assert space.jgerm.left_del == [0, 3]
    assert space.jgerm.right_del == [0, 0]
    assert space.jgerm.naive_bases == [0, 3, 2, 1, 2, 1, 0, 3, 1, 2]
    assert space.jgerm.germ_inds == [0, 1, 2, 3, 4, 3, 4, 5, 6, 7]
    assert space.jgerm.site_inds == [10, 11, 12, 13, 14, 10, 11, 12, 13, 14]

    assert space.jpadding.ggene_ranges == {
        "IGHJ_ex*01": (0, 0), "IGHJ_ex*99": (0, 0)}


def test_extra_transitions(extra):
    space, genes = extra
    trans = build_transitions(space, genes)

    np.testing.assert_allclose(trans.vpadding, [0.34 * 0.66, 0.34 * 0.66])

    expected_vgerm_vd = np.zeros((2, 15))
    expected_vgerm_vd[0, :5] = [0.2 * 0.035 * 0.1, 0.2 * 0.035 * 0.2,
                                0.2 * 0.035 * 0.1, 0.2 * 0.035 * 0.05, 0]
    expected_vgerm_vd[0, 5:11] = [0.2 * 0.086 * 0.1, 0.2 * 0.086 * 0.2,
                                  0.2 * 0.086 * 0.1, 0.2 * 0.086 * 0.1,
                                  0.2 * 0.086 * 0.15, 0]
    expected_vgerm_vd[0, 11] = 0.8
    expected_vgerm_vd[1, 13] = 1.0
    np.testing.assert_allclose(trans.vgerm_vd, expected_vgerm_vd)

    expected_vd = np.zeros((15, 15))
    expected_vd[0:4, 0:5] = [0.075, 0.175, 0.05, 0.025, 0.45]
    expected_vd[5:9, 5:11] = [0.16, 0.08, 0.08, 0.08, 0.15, 0.05]
    expected_vd[9, 10] = 0.95
    expected_vd[11, 0:5] = [0.5 * 0.035 * 0.1, 0.5 * 0.035 * 0.2,
                            0.5 * 0.035 * 0.1, 0.5 * 0.035 * 0.05,
                            0.5 * 0.035 * 0.4]
    expected_vd[11, 5:11] = [0.5 * 0.086 * 0.1, 0.5 * 0.086 * 0.2,
                             0.5 * 0.086 * 0.1, 0.5 * 0.086 * 0.1, 0,
                             0.5 * 0.086 * 0.025]
    expected_vd[11, 12] = 0.5
    expected_vd[12, 0:5] = [1 * 0.035 * 0.1, 1 * 0.035 * 0.2,
                            1 * 0.035 * 0.1, 1 * 0.035 * 0.05, 0]
    expected_vd[12, 5] = 1 * 0.086 * 0.1
    expected_vd[12, 6] = 1 * 0.086 * 0.2
    expected_vd[12, 7] = 1 * 0.086 * 0.1
    expected_vd[12, 8] = 1 * 0.086 * 0.1
    expected_vd[13, 14] = 1.0
    expected_vd[14, 0:4] = [0.25 * 0.035 * 0.1, 0.25 * 0.035 * 0.2,
                            0.25 * 0.035 * 0.1, 0.25 * 0.035 * 0.05]
    expected_vd[14, 5:9] = [0.25 * 0.086 * 0.1, 0.25 * 0.086 * 0.2,
                            0.25 * 0.086 * 0.1, 0.25 * 0.086 * 0.1]
    np.testing.assert_allclose(trans.vd, expected_vd)

    expected_vd_dgerm = np.zeros((15, 2))
    expected_vd_dgerm[0:4, 0] = 0.125 * 0.95
    expected_vd_dgerm[4, 0] = 0.98 * 0.95
    expected_vd_dgerm[5:9, 1] = 0.05 * 0.5
    expected_vd_dgerm[10, 1] = 0.6 * 0.5
    expected_vd_dgerm[12, 0] = 1 * 0.035 * 0.1 * 0.95
    expected_vd_dgerm[12, 1] = 1 * 0.086 * 0.025 * 0.5
    expected_vd_dgerm[14, 0] = 0.25 * 0.035 * 0.1 * 0.95
    expected_vd_dgerm[14, 1] = 0.25 * 0.086 * 0.025 * 0.5
    np.testing.assert_allclose(trans.vd_dgerm, expected_vd_dgerm)

    expected_dgerm_dj = np.zeros((2, 14))
    expected_dgerm_dj[0, 0] = 0.6
    expected_dgerm_dj[0, 4:8] = np.array([0.1, 0.2, 0.2, 0.2]) * 0.4 * 0.015
    expected_dgerm_dj[0, 8:13] = (
        np.array([0.1, 0.2, 0.2, 0.2, 0.05]) * 0.4 * 0.155)
    expected_dgerm_dj[1, 2] = 0.35
    expected_dgerm_dj[1, 4:8] = np.array([0.1, 0.2, 0.2, 0.2]) * 0.65 * 0.015
    expected_dgerm_dj[1, 8:13] = (
        np.array([0.1, 0.2, 0.2, 0.2, 0.05]) * 0.65 * 0.155)
    np.testing.assert_allclose(trans.dgerm_dj, expected_dgerm_dj)

    expected_dj = np.zeros((14, 14))
    expected_dj[0, 1] = 0.35
    expected_dj[0, 4:8] = np.array([0.1, 0.2, 0.2, 0.2]) * 0.65 * 0.015
    expected_dj[0, 8:12] = np.array([0.1, 0.2, 0.2, 0.2]) * 0.65 * 0.155
    expected_dj[1, 4:8] = np.array([0.1, 0.2, 0.2, 0.2]) * 1 * 0.015
    expected_dj[1, 8:12] = np.array([0.1, 0.2, 0.2, 0.2]) * 1 * 0.155
    expected_dj[2, 3] = 0.2
    expected_dj[2, 4:8] = np.array([0.1, 0.2, 0.2, 0.2]) * 0.8 * 0.015
    expected_dj[2, 8:12] = np.array([0.1, 0.2, 0.2, 0.2]) * 0.8 * 0.155
    expected_dj[3, 4:8] = np.array([0.1, 0.2, 0.2, 0.2]) * 1 * 0.015
    expected_dj[3, 8:12] = np.array([0.1, 0.2, 0.2, 0.2]) * 1 * 0.155
    expected_dj[4:8, 4:8] = [0.05, 0.15, 0.075, 0.075]
    expected_dj[8:12, 8:12] = [0.05, 0.15, 0.075, 0.075]
    expected_dj[8:12, 12] = 0.25
    expected_dj[12, 13] = 1.0
    np.testing.assert_allclose(trans.dj, expected_dj)

    expected_dj_jgerm = np.zeros((14, 2))
    expected_dj_jgerm[1, 0] = 1 * 0.015 * 0.25
    expected_dj_jgerm[3, 0] = 1 * 0.015 * 0.25
    expected_dj_jgerm[4:8, 0] = 0.4
    expected_dj_jgerm[13, 1] = 1.0
    np.testing.assert_allclose(trans.dj_jgerm, expected_dj_jgerm)

    np.testing.assert_allclose(trans.jpadding, [0.04, 0.04])
