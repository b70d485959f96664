"""Conformance tests for germline parameter ingestion.

Expected tensors mirror the reference test suite's Germline/NTInsertion/
NPadding literals (reference test/test.cpp:27-229).
"""

import numpy as np
import pytest

from linearham_tpu.io.germline import load_gene_map


@pytest.fixture(scope="module")
def genes(fixtures_dir):
    return load_gene_map(str(fixtures_dir / "hmm_params"))


def test_gene_map_contents(genes):
    assert sorted(genes) == [
        "IGHD_ex*01", "IGHD_ex*99", "IGHJ_ex*01",
        "IGHJ_ex*99", "IGHV_ex*01", "IGHV_ex*99",
    ]
    assert genes["IGHV_ex*01"].gtype == "V"
    assert genes["IGHD_ex*01"].gtype == "D"
    assert genes["IGHJ_ex*01"].gtype == "J"
    assert all(g.alphabet == "ACGT" for g in genes.values())


def test_v_gene(genes):
    v = genes["IGHV_ex*01"]
    np.testing.assert_array_equal(v.landing_in, [0.66, 0, 0, 0, 0])
    np.testing.assert_array_equal(v.landing_out, [0, 0, 0.2, 0.5, 1])
    np.testing.assert_array_equal(v.transition, [1, 1, 0.8, 0.5])
    assert v.gene_prob == 0.07
    assert v.length == 5
    expected_emission = np.array([
        [0.79, 0.1, 0.01, 0.55, 0.125],
        [0.07, 0.1, 0.01, 0.15, 0.625],
        [0.07, 0.1, 0.97, 0.15, 0.125],
        [0.07, 0.7, 0.01, 0.15, 0.125],
    ])
    np.testing.assert_allclose(v.emission, expected_emission, atol=1e-12)
    np.testing.assert_array_equal(v.bases, [0, 3, 2, 0, 1])
    # V genes carry N-padding but no NTI machinery.
    assert v.n_transition == 0.34
    np.testing.assert_array_equal(v.n_emission, [0.25] * 4)
    assert v.nti_landing_in is None


def test_d_gene(genes):
    d = genes["IGHD_ex*01"]
    np.testing.assert_array_equal(d.landing_in, [0.4, 0.1, 0.05, 0, 0])
    np.testing.assert_array_equal(d.landing_out, [0.02, 0.05, 0.4, 0.65, 1])
    np.testing.assert_array_equal(d.transition, [0.98, 0.95, 0.6, 0.35])
    assert d.gene_prob == 0.035
    np.testing.assert_array_equal(d.bases, [2, 2, 3, 0, 1])
    np.testing.assert_array_equal(d.nti_landing_in, [0.1, 0.2, 0.1, 0.05])
    np.testing.assert_array_equal(
        d.nti_landing_out,
        np.tile([[0.45, 0.125, 0.1, 0, 0]], (4, 1)),
    )
    np.testing.assert_array_equal(
        d.nti_transition,
        np.tile([[0.075, 0.175, 0.05, 0.025]], (4, 1)),
    )
    expected_nti_emission = np.array([
        [0.7, 0.05, 0.1, 0.1],
        [0.1, 0.75, 0.1, 0.1],
        [0.1, 0.1, 0.7, 0.0],
        [0.1, 0.1, 0.1, 0.8],
    ])
    np.testing.assert_allclose(d.nti_emission, expected_nti_emission,
                               atol=1e-12)
    # D genes have neither padding machinery.
    assert d.n_transition is None


def test_j_gene(genes):
    j = genes["IGHJ_ex*01"]
    np.testing.assert_array_equal(j.landing_in, [0.25, 0.05, 0, 0, 0])
    np.testing.assert_array_equal(j.landing_out, [0, 0, 0, 0, 0.04])
    np.testing.assert_array_equal(j.transition, [1, 1, 1, 1])
    assert j.gene_prob == 0.015
    np.testing.assert_array_equal(j.bases, [0, 3, 2, 1, 2])
    np.testing.assert_array_equal(j.nti_landing_in, [0.1, 0.2, 0.2, 0.2])
    np.testing.assert_array_equal(
        j.nti_landing_out,
        np.tile([[0.4, 0.25, 0, 0, 0]], (4, 1)),
    )
    np.testing.assert_array_equal(
        j.nti_transition,
        np.tile([[0.05, 0.15, 0.075, 0.075]], (4, 1)),
    )
    np.testing.assert_allclose(
        j.nti_emission,
        np.full((4, 4), 0.02) + np.eye(4) * 0.92,
        atol=1e-12,
    )
    # J genes pad on the right.
    assert j.n_transition == 0.96
    np.testing.assert_array_equal(j.n_emission, [0.25] * 4)
