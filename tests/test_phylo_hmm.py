"""PhyloHMM conformance: xMSA layout, xMSA emissions, golden log-liks.

Expected values mirror the reference's PhyloHMM test literals
(test/test.cpp:968,997-1053,1291) and the phylomd cross-implementation
golden (test.cpp:1398).
"""

import numpy as np
import pytest

from linearham_tpu.models.phylo_hmm import PhyloHMM

ER1 = [1.0] * 6
PI = [0.17, 0.19, 0.25, 0.39]


@pytest.fixture(scope="module")
def phylo(fixtures_dir):
    h = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                 str(fixtures_dir / "hmm_params"), seed=0)
    h.init_phylo_parameters(str(fixtures_dir / "newton.tree"),
                            ER1, PI, 1.0, 4)
    return h


def test_xmsa_layout(phylo):
    x = phylo.xmsa
    assert x.labels == ["naive", "0", "1", "2"]
    assert x.naive_row == 0
    expected = np.array([
        [4, 0, 3, 2, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 0, 1,
         0, 0, 0, 1, 1, 2, 2, 2, 3, 3, 3, 2, 1, 2],
        [3, 0, 0, 0, 0, 2, 0, 3, 0, 2, 0, 3, 0, 2, 0, 3, 0, 2, 0, 3, 1, 0,
         0, 0, 3, 0, 3, 0, 0, 3, 0, 0, 3, 3, 4, 4],
        [1, 0, 1, 0, 1, 2, 3, 3, 1, 2, 3, 3, 1, 2, 3, 3, 1, 2, 3, 3, 1, 2,
         2, 0, 2, 0, 2, 2, 0, 2, 2, 0, 2, 3, 4, 4],
        [1, 2, 3, 0, 2, 3, 0, 2, 2, 3, 0, 2, 2, 3, 0, 2, 2, 3, 0, 2, 2, 0,
         0, 1, 3, 1, 3, 0, 1, 3, 0, 1, 3, 1, 4, 4],
    ])
    np.testing.assert_array_equal(x.matrix, expected)

    np.testing.assert_array_equal(x.inds.vpadding, [0])
    np.testing.assert_array_equal(x.inds.vgerm, [1, 2, 3])
    np.testing.assert_array_equal(x.inds.vd_junction, [
        [4, 8, 12, 16, -1, -1, -1, 4, -1],
        [5, 9, 13, 17, 13, -1, -1, -1, 9],
        [6, 10, 14, 18, -1, 14, -1, -1, -1],
        [7, 11, 15, 19, -1, -1, 19, -1, -1],
    ])
    np.testing.assert_array_equal(x.inds.dgerm, [20])
    np.testing.assert_array_equal(x.inds.dj_junction, [
        [21, 22, 21, 27, 30, -1, -1],
        [-1, 23, 25, 28, 31, 23, -1],
        [-1, 24, 26, 29, 32, -1, 32],
    ])
    np.testing.assert_array_equal(x.inds.jgerm, [33, 34, 35])
    assert x.inds.jpadding.size == 0


def test_xmsa_emission_golden(phylo):
    expected = np.array([
        0.00734474, 0.0233122, 0.00563729, 0.0107866, 0.00342739,
        0.0177109, 0.0279823, 0.0215197, 0.00270654, 0.0177109,
        0.00399037, 0.0215197, 0.00437549, 0.0446185, 0.00399037,
        0.0609261, 0.00225322, 0.0406717, 0.00429863, 0.0400067,
        0.00783313, 0.00255793, 0.0179374, 0.0177172, 0.0118535,
        0.019866, 0.0118535, 0.00286619, 0.00514627, 0.0134759,
        0.00255793, 0.00514627, 0.0322063, 0.016355, 1, 1,
    ])
    np.testing.assert_allclose(phylo.xmsa_emission, expected, rtol=2e-5)


def test_golden_loglik(phylo):
    assert phylo.log_likelihood() == pytest.approx(-75.8136, abs=1e-4)


def test_golden_loglik_extra(fixtures_dir):
    h = PhyloHMM(str(fixtures_dir / "phylo_hmm_input_extra.yaml"), 0,
                 str(fixtures_dir / "hmm_params"), seed=0)
    h.init_phylo_parameters(str(fixtures_dir / "newton.tree"),
                            ER1, PI, 1.0, 4)
    assert h.log_likelihood() == pytest.approx(-75.1122515055, rel=1e-9)


def test_pure_phylo_likelihood_cross_check(fixtures_dir):
    """Flexbounds pin the alignment; the HMM reduces to a bare phylo
    likelihood, matching the independent R phylomd oracle -55.73483."""
    h = PhyloHMM(str(fixtures_dir / "phylo_likelihood_hmm_input.yaml"), 0,
                 str(fixtures_dir / "phylo_likelihood_hmm_params"), seed=0)
    h.init_phylo_parameters(str(fixtures_dir / "newton.tree"),
                            ER1, PI, 1.0, 1)
    assert h.log_likelihood() == pytest.approx(-55.73483, abs=1e-5)


def test_sampling(phylo):
    ann = phylo.sample_naive_sequence()
    assert len(ann.naive_seq) == 15
    assert ann.naive_seq[0] == "N"          # V padding site
    assert set(ann.naive_seq[1:13]) <= set("ACGT")
    assert ann.vgerm_state == "IGHV_ex*01"
    assert ann.jgerm_state == "IGHJ_ex*01"


def test_sample_annotations_batched(phylo):
    """n draws in one call: same marginal support as per-call sampling and
    a forward log-likelihood identical to log_likelihood()."""
    anns = phylo.sample_annotations(64)
    assert len(anns) == 64
    for ann in anns:
        assert len(ann.naive_seq) == 15
        assert ann.vgerm_state == "IGHV_ex*01"
    # distinct RNG keys actually produce distinct paths
    assert len({a.naive_seq for a in anns}) > 1
    assert phylo.log_likelihood() == pytest.approx(-75.8136, abs=2e-4)


def test_region_emissions_match_direct_gather(fixtures_dir):
    """The one-hot matmul emission assembly equals direct fancy-index
    gathers element-for-element, including -inf handling (impossible
    sites cap at _NEG_CAP; masked junction cells stay exactly -inf)."""
    import jax.numpy as jnp

    from linearham_tpu.compiler.xmsa import segment_matrix
    from linearham_tpu.models.phylo_hmm import (_NEG_CAP, region_emissions)

    hmm = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                   str(fixtures_dir / "hmm_params"), seed=0)
    space, xmsa = hmm.space, hmm.xmsa
    X = xmsa.n_cols
    rng = np.random.default_rng(0)
    site_ll = rng.normal(-3.0, 1.0, size=(5, X))
    site_ll[0, 2] = -np.inf  # an impossible site
    got = region_emissions(jnp.asarray(site_ll), hmm._consts,
                           heavy=space.is_heavy)

    def want_linear(region, inds):
        seg = segment_matrix(inds, region.ggene_ranges,
                             len(region.ggene_ranges))
        return np.maximum(site_ll, _NEG_CAP)[:, inds] @ seg

    for name, region, inds in (
            ("vpadding", space.vpadding, xmsa.inds.vpadding),
            ("vgerm", space.vgerm, xmsa.inds.vgerm),
            ("dgerm", space.dgerm, xmsa.inds.dgerm),
            ("jgerm", space.jgerm, xmsa.inds.jgerm),
            ("jpadding", space.jpadding, xmsa.inds.jpadding)):
        np.testing.assert_allclose(np.asarray(got[name]),
                                   want_linear(region, inds),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    for name, inds in (("vd_junction", xmsa.inds.vd_junction),
                       ("dj_junction", xmsa.inds.dj_junction)):
        want = np.where(
            inds >= 0,
            np.maximum(site_ll, _NEG_CAP)[:, np.maximum(inds, 0)],
            -np.inf)
        np.testing.assert_allclose(np.asarray(got[name]), want,
                                   rtol=1e-6, atol=1e-6, err_msg=name)
    # No NaNs anywhere despite the -inf input.
    for name, v in got.items():
        assert not np.isnan(np.asarray(v)).any(), name
