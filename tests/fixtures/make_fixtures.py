#!/usr/bin/env python3
"""Generate the conformance-test fixture files.

These fixtures reproduce, in data, the tiny synthetic clonal-family setups
that the reference test suite (reference test/test.cpp and reference data/)
uses as oracles: six 5-8 base germline genes, two clonal-family inputs with
known golden log-likelihoods, and a pure-phylo-likelihood variant whose
flexbounds pin the alignment.  Regenerating them from these tables (instead
of shipping opaque files) documents the partis data contract explicitly.

Run:  python tests/fixtures/make_fixtures.py  (writes into tests/fixtures/)
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def e(main_base, p_main, **overrides):
    """Emission dict: main base gets p_main, the rest share the remainder."""
    rest = round((1.0 - p_main) / 3.0, 10)
    probs = {b: rest for b in "ACGT"}
    probs[main_base] = p_main
    probs.update(overrides)
    return probs


FLAT = {"A": 0.25, "C": 0.25, "G": 0.25, "T": 0.25}

# Germline position rows: (germline_base, emission_probs, p_continue)
# p_continue is the i -> i+1 transition; (1 - p_continue) goes to "end"
# (or, for the last J position, to insert_right_N).
GENES = {
    "IGHV_ex_star_01": {
        "type": "V",
        "gene_prob": 0.07,
        "n_self": 0.34,
        "germline": [
            ("A", e("A", 0.79), 1.0),
            ("T", e("T", 0.7), 1.0),
            ("G", e("G", 0.97), 0.8),
            ("A", e("A", 0.55), 0.5),
            ("C", {"A": 0.125, "C": 0.625, "G": 0.125, "T": 0.125}, 0.0),
        ],
    },
    "IGHV_ex_star_99": {
        "type": "V",
        "gene_prob": 0.17,
        "n_self": 0.34,
        "germline": [
            ("C", e("C", 0.85), 1.0),
            ("A", e("A", 0.7), 1.0),
            ("G", e("G", 0.97), 1.0),
            ("G", e("G", 0.55), 1.0),
            ("A", e("A", 0.55), 0.75),
            ("T", e("T", 0.7), 0.5),
            ("C", e("C", 0.55), 0.5),
            ("C", {"A": 0.125, "C": 0.625, "G": 0.125, "T": 0.125}, 0.0),
        ],
    },
    "IGHD_ex_star_01": {
        "type": "D",
        "gene_prob": 0.035,
        "init": {"0": 0.4, "1": 0.1, "2": 0.05,
                 "A": 0.1, "C": 0.2, "G": 0.1, "T": 0.05},
        "nti_out": {"0": 0.45, "1": 0.125, "2": 0.1,
                    "A": 0.075, "C": 0.175, "G": 0.05, "T": 0.025},
        "nti_emission": {
            "A": e("A", 0.7), "C": {"A": 0.05, "C": 0.75, "G": 0.1, "T": 0.1},
            "G": e("G", 0.7), "T": {"A": 0.1, "C": 0.1, "G": 0.0, "T": 0.8},
        },
        "germline": [
            ("G", {"A": 0.12, "C": 0.12, "G": 0.64, "T": 0.12}, 0.98),
            ("G", e("G", 0.79), 0.95),
            ("T", e("T", 0.85), 0.6),
            ("A", e("A", 0.55), 0.35),
            ("C", e("C", 0.97), 0.0),
        ],
    },
    "IGHD_ex_star_99": {
        "type": "D",
        "gene_prob": 0.086,
        "init": {"0": 0.3, "1": 0.15, "2": 0.025, "3": 0.025,
                 "A": 0.1, "C": 0.2, "G": 0.1, "T": 0.1},
        "nti_out": {"0": 0.35, "1": 0.15, "2": 0.05, "3": 0.05,
                    "A": 0.16, "C": 0.08, "G": 0.08, "T": 0.08},
        "nti_emission": {
            "A": e("A", 0.7), "C": {"A": 0.05, "C": 0.75, "G": 0.1, "T": 0.1},
            "G": e("G", 0.7), "T": e("T", 0.85),
        },
        "germline": [
            ("G", {"A": 0.12, "C": 0.12, "G": 0.64, "T": 0.12}, 0.98),
            ("G", e("G", 0.79), 0.95),
            ("T", e("T", 0.85), 0.6),
            ("C", e("C", 0.7), 0.5),
            ("A", e("A", 0.55), 0.35),
            ("A", e("A", 0.88), 0.2),
            ("C", e("C", 0.97), 0.0),
        ],
    },
    "IGHJ_ex_star_01": {
        "type": "J",
        "gene_prob": 0.015,
        "n_self": 0.96,
        "init": {"0": 0.25, "1": 0.05,
                 "A": 0.1, "C": 0.2, "G": 0.2, "T": 0.2},
        "nti_out": {"0": 0.4, "1": 0.25,
                    "A": 0.05, "C": 0.15, "G": 0.075, "T": 0.075},
        "nti_emission": {
            "A": e("A", 0.94), "C": e("C", 0.94),
            "G": e("G", 0.94), "T": e("T", 0.94),
        },
        "germline": [
            ("A", e("A", 0.91), 1.0),
            ("T", e("T", 0.7), 1.0),
            ("G", e("G", 0.82), 1.0),
            ("C", e("C", 0.97), 1.0),
            ("G", {"A": 0.08, "C": 0.08, "G": 0.76, "T": 0.08}, 0.0),
        ],
    },
    "IGHJ_ex_star_99": {
        "type": "J",
        "gene_prob": 0.155,
        "n_self": 0.96,
        "init": {"0": 0.25, "1": 0.05,
                 "A": 0.1, "C": 0.2, "G": 0.2, "T": 0.2},
        "nti_out": {"0": 0.4, "1": 0.25,
                    "A": 0.05, "C": 0.15, "G": 0.075, "T": 0.075},
        "nti_emission": {
            "A": e("A", 0.94), "C": e("C", 0.94),
            "G": e("G", 0.94), "T": e("T", 0.94),
        },
        "germline": [
            ("A", e("A", 0.91), 1.0),
            ("T", e("T", 0.7), 1.0),
            ("G", e("G", 0.82), 1.0),
            ("C", e("C", 0.97), 1.0),
            ("A", e("A", 0.55), 1.0),
            ("T", {"A": 0.06, "C": 0.06, "G": 0.06, "T": 0.82}, 1.0),
            ("C", {"A": 0.08, "C": 0.76, "G": 0.08, "T": 0.08}, 1.0),
            ("G", {"A": 0.08, "C": 0.08, "G": 0.76, "T": 0.08}, 0.0),
        ],
    },
}


def fmt_probs(d):
    return "{" + ", ".join(f"{k}: {v}" for k, v in d.items()) + "}"


def gene_yaml(name, spec):
    """Render one germline gene parameter file as YAML text."""
    gtype = spec["type"]
    n_positions = len(spec["germline"])

    def tkey(k):
        # 'A'..'T' -> insert_left_X; digits -> germline state names
        return f"insert_left_{k}" if k in "ACGT" else f"{name}_{k}"

    lines = [f"extras: {{gene_prob: {spec['gene_prob']}}}", f"name: {name}",
             "states:"]

    def state(sname, emissions, transitions, germline_sym=None, ambig=False):
        lines.append("- emissions:" if emissions else "- emissions: null")
        if emissions:
            lines.append(f"    probs: {fmt_probs(emissions)}")
            lines.append("    track: nukes")
        if germline_sym is None:
            lines.append("  extras: {}")
        elif ambig:
            lines.append(
                "  extras: {ambiguous_emission_prob: 0.25, germline: N}")
        else:
            lines.append(f"  extras: {{germline: {germline_sym}}}")
        lines.append(f"  name: {sname}")
        lines.append(f"  transitions: {fmt_probs(transitions)}")

    if gtype == "V":
        init_t = {f"{name}_0": round(1.0 - spec["n_self"], 10),
                  "insert_left_N": spec["n_self"]}
        state("init", None, init_t)
        state("insert_left_N", FLAT, init_t, "N", ambig=True)
    else:
        init_t = {tkey(k): v for k, v in spec["init"].items()}
        state("init", None, init_t)
        nti_t = {tkey(k): v for k, v in spec["nti_out"].items()}
        for b in "ACGT":
            state(f"insert_left_{b}", spec["nti_emission"][b], nti_t, b)

    for i, (gbase, probs, p_cont) in enumerate(spec["germline"]):
        last = i == n_positions - 1
        if not last:
            trans = {f"{name}_{i + 1}": p_cont}
            if p_cont < 1.0:
                trans["end"] = round(1.0 - p_cont, 10)
        elif gtype == "J":
            trans = {"end": round(1.0 - spec["n_self"], 10),
                     "insert_right_N": spec["n_self"]}
        else:
            trans = {"end": 1.0}
        state(f"{name}_{i}", probs, trans, gbase)

    if gtype == "J":
        trans = {"end": round(1.0 - spec["n_self"], 10),
                 "insert_right_N": spec["n_self"]}
        state("insert_right_N", FLAT, trans, "N", ambig=True)

    lines.append("tracks:")
    lines.append("  nukes: [A, C, G, T]")
    return "\n".join(lines) + "\n"


def pure_phylo_variant(name, spec):
    """Variant with all stochastic V(D)J choices pinned to probability 1.

    With gene_prob=1, no padding/NTI entry, and no internal exits, the HMM
    contributes nothing and the model reduces to a bare phylogenetic
    likelihood (used for the cross-implementation oracle).
    """
    import copy

    spec = copy.deepcopy(spec)
    spec["gene_prob"] = 1
    gtype = spec["type"]
    if gtype == "V":
        spec["n_self"] = 0
    else:
        for key in ("init", "nti_out"):
            spec[key] = {k: (1 if k == "0" else 0) for k in spec[key]}
    rows = []
    for i, (gbase, probs, p_cont) in enumerate(spec["germline"]):
        last = i == len(spec["germline"]) - 1
        rows.append((gbase, probs, 0.0 if last else 1.0))
    spec["germline"] = rows
    if gtype == "J":
        spec["n_self"] = 0
    return gene_yaml(name, spec)


def cluster_input(relpos, flexbounds, input_seqs, naive_seq, ids):
    ev = {
        "input_seqs": input_seqs,
        "naive_seq": naive_seq,
        "has_shm_indels": [False] * len(input_seqs),
        "linearham-info": {"relpos": relpos, "flexbounds": flexbounds},
        "unique_ids": ids,
    }
    return json.dumps(
        {"germline-info": {"locus": "igh"}, "events": [ev]}, indent=1
    ) + "\n"


SEQ1 = "ACAGTACCCTGTTNN"
SEQ3 = ["TAAAAGATCAATTNN", "CACACGTTCGAGTNN", "CGTAGTAGGACTCNN"]
NAIVE = "AGGACATACGTCTNN"

BOUNDS_BASE = {"v_l": [0, 2], "v_r": [4, 6], "d_l": [7, 8],
               "d_r": [9, 10], "j_l": [11, 12], "j_r": [15, 15]}
BOUNDS_EXTRA = {"v_l": [0, 2], "v_r": [4, 6], "d_l": [4, 6],
                "d_r": [8, 10], "j_l": [8, 10], "j_r": [15, 15]}
BOUNDS_PINNED = {"v_l": [0, 0], "v_r": [5, 5], "d_l": [6, 6],
                 "d_r": [10, 10], "j_l": [11, 11], "j_r": [15, 15]}

RELPOS_BASE = {"IGHD_ex*01": 5, "IGHJ_ex*01": 10, "IGHV_ex*01": 1}
RELPOS_EXTRA = {"IGHD_ex*01": 5, "IGHJ_ex*01": 10, "IGHV_ex*01": 1,
                "IGHV_ex*99": 1, "IGHD_ex*99": 3, "IGHJ_ex*99": 7}
RELPOS_PINNED = {"IGHD_ex*01": 5, "IGHJ_ex*01": 10, "IGHV_ex*01": 0}


def _igk_cluster(seqs=None, ids=None):
    """A 5-region (V-J, no D) light-chain clonal family."""
    return json.dumps({
        "germline-info": {"locus": "igk"},
        "events": [{
            "input_seqs": seqs or [SEQ1],
            "naive_seq": NAIVE,
            "has_shm_indels": [False] * len(seqs or [SEQ1]),
            "linearham-info": {
                "relpos": {"IGKV_ex*01": 1, "IGKJ_ex*01": 8},
                "flexbounds": {
                    "v_l": [0, 2], "v_r": [4, 6],
                    "j_l": [7, 9], "j_r": [13, 15],
                },
            },
            "unique_ids": ids or ["read1"],
        }],
    }, indent=1) + "\n"


def main():
    params_dir = os.path.join(HERE, "hmm_params")
    os.makedirs(params_dir, exist_ok=True)
    for name, spec in GENES.items():
        with open(os.path.join(params_dir, name + ".yaml"), "w") as fh:
            fh.write(gene_yaml(name, spec))

    # Light-chain (igk) parameter dir: V and J reuse the igh shapes under
    # IGK names; the IGKD file exists only to exercise the loader's
    # light-chain-D skip rule.
    igk_dir = os.path.join(HERE, "igk_hmm_params")
    os.makedirs(igk_dir, exist_ok=True)
    for src, dst in (("IGHV_ex_star_01", "IGKV_ex_star_01"),
                     ("IGHJ_ex_star_01", "IGKJ_ex_star_01"),
                     ("IGHD_ex_star_01", "IGKD_ex_star_01")):
        text = gene_yaml(src, GENES[src]).replace(src, dst)
        with open(os.path.join(igk_dir, dst + ".yaml"), "w") as fh:
            fh.write(text)

    pure_dir = os.path.join(HERE, "phylo_likelihood_hmm_params")
    os.makedirs(pure_dir, exist_ok=True)
    for name in ("IGHV_ex_star_01", "IGHD_ex_star_01", "IGHJ_ex_star_01"):
        with open(os.path.join(pure_dir, name + ".yaml"), "w") as fh:
            fh.write(pure_phylo_variant(name, GENES[name]))

    files = {
        "simple_hmm_input.yaml":
            cluster_input(RELPOS_BASE, BOUNDS_BASE, [SEQ1], NAIVE, ["read1"]),
        "simple_hmm_input_extra.yaml":
            cluster_input(RELPOS_EXTRA, BOUNDS_EXTRA, [SEQ1], NAIVE,
                          ["read1"]),
        "phylo_hmm_input.yaml":
            cluster_input(RELPOS_BASE, BOUNDS_BASE, SEQ3, NAIVE,
                          ["0", "1", "2"]),
        "phylo_hmm_input_extra.yaml":
            cluster_input(RELPOS_EXTRA, BOUNDS_EXTRA, SEQ3, NAIVE,
                          ["0", "1", "2"]),
        "phylo_likelihood_hmm_input.yaml":
            cluster_input(RELPOS_PINNED, BOUNDS_PINNED, SEQ3, NAIVE,
                          ["0", "1", "2"]),
        "newton.tree": "((0:0.2, 1:0.4):0.6, naive:0.3, 2:0.5);\n",
        "simple_hmm_input_igk.yaml": _igk_cluster(),
        "phylo_hmm_input_igk.yaml": _igk_cluster(SEQ3, ["0", "1", "2"]),
    }
    for fname, text in files.items():
        with open(os.path.join(HERE, fname), "w") as fh:
            fh.write(text)
    print(f"wrote fixtures into {HERE}")


if __name__ == "__main__":
    main()
