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


def _region_fill_tables(region, n_sites: int, alphabet: str):
    """Padded per-state (positions, ASCII base codes) fill tables.

    ``pos[g]`` / ``base[g]`` give gene state g's naive-site scatter; rows
    are padded to the longest gene with a scratch column (``n_sites``) so
    a whole batch of sampled states fills in ONE fancy-index assignment.
    Cached on the region (same reasoning as ``_fill_cache``).
    """
    cached = getattr(region, "_batch_fill_tables", None)
    if cached is not None and cached[0] == n_sites:
        return cached[1], cached[2]
    per_state = []
    for name in region.state_strs:
        start, end = region.ggene_ranges[name]
        pos = np.asarray(region.site_inds[start:end], dtype=np.intp)
        base = np.array(
            [ord(alphabet[b]) for b in region.naive_bases[start:end]],
            dtype=np.uint8)
        per_state.append((pos, base))
    l_max = max((len(p) for p, _ in per_state), default=0)
    G = len(per_state)
    pos_pad = np.full((G, max(l_max, 1)), n_sites, dtype=np.intp)
    base_pad = np.full((G, max(l_max, 1)), ord("N"), dtype=np.uint8)
    for g, (pos, base) in enumerate(per_state):
        pos_pad[g, : len(pos)] = pos
        base_pad[g, : len(base)] = base
    object.__setattr__(region, "_batch_fill_tables",
                       (n_sites, pos_pad, base_pad))
    return pos_pad, base_pad


def _junction_tables(junction: JunctionRegion, alphabet: str,
                     left_gtype: str, right_gtype: str):
    """Per-state lookup arrays for the vectorized junction walk (cached)."""
    key = (left_gtype, right_gtype)
    cache = getattr(junction, "_batch_walk_tables", None)
    if cache is None:
        cache = {}
        object.__setattr__(junction, "_batch_walk_tables", cache)
    tables = cache.get(key)
    if tables is None:
        base = np.array(
            [ord(alphabet[b]) for b in junction.naive_bases],
            dtype=np.uint8)
        dels = np.asarray(junction.deletions, dtype=np.int64)
        gt = np.asarray(junction.gtypes)
        cache[key] = tables = (
            base, dels, gt == left_gtype, gt == right_gtype)
    return tables


def _batch_fill_germline(buf: np.ndarray, region: GermlineRegion,
                         idx: np.ndarray, n_sites: int,
                         alphabet: str) -> None:
    """Fill every path's germline sites for this region in one scatter.

    ``buf`` is [T, n_sites+1] ASCII codes; the extra scratch column
    absorbs the padding writes.
    """
    pos_pad, base_pad = _region_fill_tables(region, n_sites, alphabet)
    T = idx.shape[0]
    buf[np.arange(T)[:, None], pos_pad[idx]] = base_pad[idx]


def _batch_walk_junction(
    buf: np.ndarray,
    junction: JunctionRegion,
    idx: np.ndarray,              # [T, R] sampled junction states
    left_gtype: str,
    right_gtype: str,
    alphabet: str,
):
    """Vectorized equivalent of ``_walk_junction`` over T paths at once.

    Returns (right_5p_del [T], has_right [T], insertions List[str],
    left_3p_del [T], has_left [T]).  The scalar walk runs right-to-left and
    keeps overwriting ``right_5p_del`` (so the final value is the LEFTMOST
    right-germline row) while taking only the FIRST ``left_3p_del`` (the
    RIGHTMOST left-germline row); argmax over boolean masks reproduces
    both extremes without the Python loop.
    """
    base, dels, is_left, is_right = _junction_tables(
        junction, alphabet, left_gtype, right_gtype)
    T, R = idx.shape
    if R == 0:
        zeros = np.zeros(T, dtype=np.int64)
        falses = np.zeros(T, dtype=bool)
        return zeros, falses, [""] * T, zeros, falses
    buf[:, junction.site_start: junction.site_start + R] = base[idx]

    d = dels[idx]                               # [T, R]
    t_ids = np.arange(T)

    right_germ = is_right[idx] & (d != -1)
    has_right = right_germ.any(axis=1)
    right_5p = d[t_ids, np.argmax(right_germ, axis=1)]

    left_m = is_left[idx]
    has_left = left_m.any(axis=1)
    left_3p = d[t_ids, R - 1 - np.argmax(left_m[:, ::-1], axis=1)]

    nti = is_right[idx] & (d == -1)
    chars = base[idx].view("S1")                # [T, R] one-byte strings
    masked = np.where(nti, chars, b"")
    insertions = [b"".join(row).decode() for row in masked.tolist()]
    return right_5p, has_right, insertions, left_3p, has_left


def decode_paths_batch(
    space: StateSpace,
    vgerm_idx: np.ndarray,                 # [T]
    vd_idx: np.ndarray,                    # [T, R1]
    dgerm_idx: Optional[np.ndarray],       # [T] (igh only)
    dj_idx: Optional[np.ndarray],          # [T, R2] (igh only)
    jgerm_idx: np.ndarray,                 # [T]
    n_sites: int,
) -> List["Annotation"]:
    """Decode T sampled paths at once (vectorized ``decode_path``).

    The reference decodes each sampled path with per-site C++ loops
    (src/HMM.cpp:322-431); the per-tree Python port of that walk was the
    pipeline's host bottleneck at production tree counts, so all naive
    fills, junction walks, and deletion resolutions here are single numpy
    array ops over the whole batch.  Region fill order matches
    ``decode_path`` exactly (J, DJ, D, VD, V — later stages overwrite).
    """
    alphabet = space.alphabet
    heavy = space.is_heavy
    vgerm_idx = np.asarray(vgerm_idx, dtype=np.intp).reshape(-1)
    jgerm_idx = np.asarray(jgerm_idx, dtype=np.intp).reshape(-1)
    vd_idx = np.asarray(vd_idx, dtype=np.intp)
    T = vgerm_idx.shape[0]
    buf = np.full((T, n_sites + 1), ord("N"), dtype=np.uint8)

    jl = np.asarray(space.jgerm.left_del)
    jr = np.asarray(space.jgerm.right_del)
    j_5p = jl[jgerm_idx]
    j_3p = jr[jgerm_idx]
    _batch_fill_germline(buf, space.jgerm, jgerm_idx, n_sites, alphabet)

    if heavy:
        dgerm_idx = np.asarray(dgerm_idx, dtype=np.intp).reshape(-1)
        dj_idx = np.asarray(dj_idx, dtype=np.intp)
        r5, has_r5, dj_ins, l3, has_l3 = _batch_walk_junction(
            buf, space.dj_junction, dj_idx, "D", "J", alphabet)
        j_5p = np.where(has_r5, r5, j_5p)
        dl = np.asarray(space.dgerm.left_del)
        dr = np.asarray(space.dgerm.right_del)
        d_5p = dl[dgerm_idx]
        d_3p = np.where(has_l3, l3, dr[dgerm_idx])
        _batch_fill_germline(buf, space.dgerm, dgerm_idx, n_sites, alphabet)

        r5, has_r5, vd_ins, l3, has_l3 = _batch_walk_junction(
            buf, space.vd_junction, vd_idx, "V", "D", alphabet)
        d_5p = np.where(has_r5, r5, d_5p)
    else:
        r5, has_r5, vd_ins, l3, has_l3 = _batch_walk_junction(
            buf, space.vd_junction, vd_idx, "V", "J", alphabet)
        j_5p = np.where(has_r5, r5, j_5p)

    vl = np.asarray(space.vgerm.left_del)
    vr = np.asarray(space.vgerm.right_del)
    v_5p = vl[vgerm_idx]
    v_3p = np.where(has_l3, l3, vr[vgerm_idx])
    _batch_fill_germline(buf, space.vgerm, vgerm_idx, n_sites, alphabet)

    codes = np.ascontiguousarray(buf[:, :n_sites])
    naive_seqs = [
        s.decode() for s in codes.view(f"S{n_sites}").ravel().tolist()
    ] if n_sites else [""] * T

    # Framework insertions: leading/trailing N runs, but only when the
    # interior is N-free (decode_path's ^(N*)[ACGT]+(N*)$ regex).
    if n_sites:
        non_n = codes != ord("N")
        any_non = non_n.any(axis=1)
        first = np.argmax(non_n, axis=1)
        last = n_sites - 1 - np.argmax(non_n[:, ::-1], axis=1)
        clean = any_non & (non_n.sum(axis=1) == last - first + 1)
        v_fwk = ["N" * int(f) if c else ""
                 for c, f in zip(clean.tolist(), first.tolist())]
        j_fwk = ["N" * int(n_sites - 1 - l) if c else ""
                 for c, l in zip(clean.tolist(), last.tolist())]
    else:  # zero-site degenerate input: the regex never matches
        v_fwk = j_fwk = [""] * T

    v_strs = np.asarray(space.vgerm.state_strs, dtype=object)
    j_strs = np.asarray(space.jgerm.state_strs, dtype=object)
    vd_strs = np.asarray(space.vd_junction.state_strs, dtype=object)
    vgerm_states = v_strs[vgerm_idx].tolist()
    jgerm_states = j_strs[jgerm_idx].tolist()
    vd_states = vd_strs[vd_idx].tolist()
    vd_lists = vd_idx.tolist()
    if heavy:
        d_strs = np.asarray(space.dgerm.state_strs, dtype=object)
        dj_strs = np.asarray(space.dj_junction.state_strs, dtype=object)
        dgerm_states = d_strs[dgerm_idx].tolist()
        dj_states = dj_strs[dj_idx].tolist()
        dj_lists = dj_idx.tolist()

    out = []
    for t in range(T):
        out.append(Annotation(
            naive_seq=naive_seqs[t],
            vgerm_state=vgerm_states[t],
            vgerm_idx=int(vgerm_idx[t]),
            v_5p_del=int(v_5p[t]),
            v_3p_del=int(v_3p[t]),
            v_fwk_insertion=v_fwk[t],
            vd_states=vd_states[t],
            vd_idx=vd_lists[t],
            vd_insertion=vd_ins[t],
            dgerm_state=dgerm_states[t] if heavy else None,
            dgerm_idx=int(dgerm_idx[t]) if heavy else None,
            d_5p_del=int(d_5p[t]) if heavy else None,
            d_3p_del=int(d_3p[t]) if heavy else None,
            dj_states=dj_states[t] if heavy else None,
            dj_idx=dj_lists[t] if heavy else None,
            dj_insertion=dj_ins[t] if heavy else None,
            jgerm_state=jgerm_states[t],
            jgerm_idx=int(jgerm_idx[t]),
            j_5p_del=int(j_5p[t]),
            j_3p_del=int(j_3p[t]),
            j_fwk_insertion=j_fwk[t],
        ))
    return out


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
