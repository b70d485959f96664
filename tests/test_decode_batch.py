"""Vectorized batch decode vs the scalar reference walk.

decode_paths_batch must reproduce decode_path field-for-field on random
paths; the scalar walk is itself pinned against the reference semantics
(src/HMM.cpp:322-431) by the conformance tests, so byte parity here makes
the vectorized path the production decoder.
"""

import numpy as np
import pytest

from linearham_tpu.compiler.state_space import build_state_space
from linearham_tpu.models import SimpleHMM
from linearham_tpu.models.decode import decode_path, decode_paths_batch
from linearham_tpu.utils.synth import make_family


def _random_paths(rng, space, n_paths):
    heavy = space.is_heavy
    T = n_paths
    vg = rng.integers(0, space.vgerm.n_states, T)
    vd = rng.integers(0, space.vd_junction.n_states,
                      (T, space.vd_junction.n_rows))
    jg = rng.integers(0, space.jgerm.n_states, T)
    if heavy:
        dg = rng.integers(0, space.dgerm.n_states, T)
        dj = rng.integers(0, space.dj_junction.n_states,
                          (T, space.dj_junction.n_rows))
    else:
        dg = dj = None
    return vg, vd, dg, dj, jg


def _assert_annotations_equal(a, b):
    for field in (
            "naive_seq", "vgerm_state", "vgerm_idx", "v_5p_del", "v_3p_del",
            "v_fwk_insertion", "vd_states", "vd_idx", "vd_insertion",
            "dgerm_state", "dgerm_idx", "d_5p_del", "d_3p_del", "dj_states",
            "dj_idx", "dj_insertion", "jgerm_state", "jgerm_idx",
            "j_5p_del", "j_3p_del", "j_fwk_insertion"):
        va, vb = getattr(a, field), getattr(b, field)
        assert va == vb, (field, va, vb)


def test_batch_decode_matches_scalar_heavy():
    fam = make_family(n_seqs=4, seed=9)
    space = build_state_space(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes)
    rng = np.random.default_rng(0)
    vg, vd, dg, dj, jg = _random_paths(rng, space, 200)
    batch = decode_paths_batch(space, vg, vd, dg, dj, jg, fam.n_sites)
    assert len(batch) == 200
    for t in range(200):
        scalar = decode_path(space, int(vg[t]), vd[t], int(dg[t]), dj[t],
                             int(jg[t]), fam.n_sites)
        _assert_annotations_equal(batch[t], scalar)


def test_batch_decode_matches_scalar_light(fixtures_dir):
    hmm = SimpleHMM(str(fixtures_dir / "simple_hmm_input_igk.yaml"), 0,
                    str(fixtures_dir / "igk_hmm_params"), seed=0)
    space = hmm.space
    n_sites = hmm.cluster.n_sites
    rng = np.random.default_rng(1)
    vg, vd, dg, dj, jg = _random_paths(rng, space, 100)
    batch = decode_paths_batch(space, vg, vd, dg, dj, jg, n_sites)
    for t in range(100):
        scalar = decode_path(space, int(vg[t]), vd[t], None, None,
                             int(jg[t]), n_sites)
        _assert_annotations_equal(batch[t], scalar)


def test_batch_decode_empty_batch():
    fam = make_family(n_seqs=3, seed=2)
    space = build_state_space(
        fam.locus, fam.flexbounds, fam.relpos, fam.genes)
    rng = np.random.default_rng(3)
    vg, vd, dg, dj, jg = _random_paths(rng, space, 0)
    assert decode_paths_batch(space, vg, vd, dg, dj, jg,
                              fam.n_sites) == []
