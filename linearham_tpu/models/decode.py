"""Decoding sampled hidden-state paths into V(D)J annotations (host side).

Turns the integer state paths drawn by ops.ffbs into the reference's
annotation vocabulary: naive sequence, per-segment gene choices, 5'/3'
deletion lengths, junction insertion strings, and framework (leading /
trailing N) insertions (reference semantics: src/HMM.cpp:322-431).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from linearham_tpu.compiler.state_space import (
    GermlineRegion,
    JunctionRegion,
    StateSpace,
)


@dataclass
class Annotation:
    naive_seq: str
    vgerm_state: str
    vgerm_idx: int
    v_5p_del: int
    v_3p_del: int
    v_fwk_insertion: str
    vd_states: List[str]
    vd_idx: List[int]
    vd_insertion: str             # VJ insertion for light chains
    dgerm_state: Optional[str]
    dgerm_idx: Optional[int]
    d_5p_del: Optional[int]
    d_3p_del: Optional[int]
    dj_states: Optional[List[str]]
    dj_idx: Optional[List[int]]
    dj_insertion: Optional[str]
    jgerm_state: str
    jgerm_idx: int
    j_5p_del: int
    j_3p_del: int
    j_fwk_insertion: str


def _fill_germline(naive: np.ndarray, region: GermlineRegion, idx: int,
                   alphabet: str) -> None:
    """One vectorized assignment per germline state.

    The (positions, characters) pair depends only on the gene state, so
    it is memoized on the region: decoding thousands of sampled paths per
    family would otherwise loop over every germline site in Python.
    """
    cache = getattr(region, "_fill_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(region, "_fill_cache", cache)
    pair = cache.get(idx)
    if pair is None:
        gname = region.state_strs[idx]
        start, end = region.ggene_ranges[gname]
        pos = np.asarray(region.site_inds[start:end], dtype=np.intp)
        chars = np.array(
            [alphabet[b] for b in region.naive_bases[start:end]],
            dtype="<U1")
        cache[idx] = pair = (pos, chars)
    naive[pair[0]] = pair[1]


def _walk_junction(
    naive: np.ndarray,
    junction: JunctionRegion,
    idx_row: Sequence[int],
    left_gtype: str,
    right_gtype: str,
    alphabet: str,
):
    """Decode one junction's sampled rows (walked right-to-left).

    Returns (right_gene_5p_del or None, insertion_str,
    left_gene_3p_del or None).
    """
    right_5p_del = None
    left_3p_del = None
    insertion = ""
    for i in range(len(idx_row) - 1, -1, -1):
        st = int(idx_row[i])
        base = alphabet[junction.naive_bases[st]]
        naive[junction.site_start + i] = base
        if junction.gtypes[st] == right_gtype:
            if junction.deletions[st] != -1:
                right_5p_del = junction.deletions[st]
            else:
                insertion = base + insertion
        elif junction.gtypes[st] == left_gtype and left_3p_del is None:
            left_3p_del = junction.deletions[st]
    return right_5p_del, insertion, left_3p_del


def decode_path(
    space: StateSpace,
    vgerm_idx: int,
    vd_idx: Sequence[int],
    dgerm_idx: Optional[int],
    dj_idx: Optional[Sequence[int]],
    jgerm_idx: int,
    n_sites: int,
) -> Annotation:
    """Decode one sampled path into a full annotation."""
    alphabet = space.alphabet
    heavy = space.is_heavy
    naive = np.full(n_sites, "N", dtype="<U1")

    jgerm_idx = int(jgerm_idx)
    j_5p_del = space.jgerm.left_del[jgerm_idx]
    j_3p_del = space.jgerm.right_del[jgerm_idx]
    _fill_germline(naive, space.jgerm, jgerm_idx, alphabet)

    if heavy:
        dj_right_5p, dj_insertion, d_3p_del = _walk_junction(
            naive, space.dj_junction, dj_idx, "D", "J", alphabet)
        if dj_right_5p is not None:
            j_5p_del = dj_right_5p

        dgerm_idx = int(dgerm_idx)
        d_5p_del = space.dgerm.left_del[dgerm_idx]
        if d_3p_del is None:
            d_3p_del = space.dgerm.right_del[dgerm_idx]
        _fill_germline(naive, space.dgerm, dgerm_idx, alphabet)

        vd_right_5p, vd_insertion, v_3p_del = _walk_junction(
            naive, space.vd_junction, vd_idx, "V", "D", alphabet)
        if vd_right_5p is not None:
            d_5p_del = vd_right_5p
    else:
        vd_right_5p, vd_insertion, v_3p_del = _walk_junction(
            naive, space.vd_junction, vd_idx, "V", "J", alphabet)
        if vd_right_5p is not None:
            j_5p_del = vd_right_5p
        d_5p_del = d_3p_del = dj_insertion = None
        dgerm_idx = None

    vgerm_idx = int(vgerm_idx)
    v_5p_del = space.vgerm.left_del[vgerm_idx]
    if v_3p_del is None:
        v_3p_del = space.vgerm.right_del[vgerm_idx]
    _fill_germline(naive, space.vgerm, vgerm_idx, alphabet)

    naive_seq = "".join(naive.tolist())
    m = re.match(r"^(N*)[" + alphabet[:-1] + r"]+(N*)$", naive_seq)
    v_fwk, j_fwk = (m.group(1), m.group(2)) if m else ("", "")

    return Annotation(
        naive_seq=naive_seq,
        vgerm_state=space.vgerm.state_strs[vgerm_idx],
        vgerm_idx=vgerm_idx,
        v_5p_del=v_5p_del,
        v_3p_del=v_3p_del,
        v_fwk_insertion=v_fwk,
        vd_states=[space.vd_junction.state_strs[int(i)] for i in vd_idx],
        vd_idx=[int(i) for i in vd_idx],
        vd_insertion=vd_insertion,
        dgerm_state=(space.dgerm.state_strs[dgerm_idx]
                     if dgerm_idx is not None else None),
        dgerm_idx=dgerm_idx,
        d_5p_del=d_5p_del,
        d_3p_del=d_3p_del,
        dj_states=([space.dj_junction.state_strs[int(i)] for i in dj_idx]
                   if heavy else None),
        dj_idx=[int(i) for i in dj_idx] if heavy else None,
        dj_insertion=dj_insertion,
        jgerm_state=space.jgerm.state_strs[jgerm_idx],
        jgerm_idx=jgerm_idx,
        j_5p_del=j_5p_del,
        j_3p_del=j_3p_del,
        j_fwk_insertion=j_fwk,
    )
