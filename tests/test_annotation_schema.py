"""Strict schema validation of linearham_annotations_{best,all}.yaml.

Vendors the partis annotation-line key/type contract that the reference's
write_lh_annotations.py produces through partis' utils.add_implicit_info
(reference: scripts/write_lh_annotations.py:57-101), and fails if any
derived field is dropped or mistyped — heavy AND light chains.
"""

import math

import numpy as np
import pytest
import yaml

from linearham_tpu.workflow import run_family_workflow
from linearham_tpu.io.germline import write_gene_dir
from linearham_tpu.utils.synth import (make_family, make_light_family,
                                       make_tree_samples, write_partis_yaml,
                                       write_trees_tsv)

# Explicit annotation keys (partis vocabulary; bool is NOT an int here,
# so type checks are exact).
_COMMON = {
    "naive_seq": str, "v_gene": str, "j_gene": str,
    "v_5p_del": int, "v_3p_del": int,
    "j_5p_del": int, "j_3p_del": int,
    "fv_insertion": str, "jf_insertion": str,
    "logprob": float,
}
_HEAVY = {"d_gene": str, "d_5p_del": int, "d_3p_del": int,
          "vd_insertion": str, "dj_insertion": str}
_LIGHT = {"vj_insertion": str}
# Implicit fields partis derives via utils.add_implicit_info; each maps
# to (container type, per-element type or None).
_IMPLICIT_LISTS = {
    "cdr3_seqs": str, "in_frames": bool, "stops": bool,
    "mutated_invariants": bool, "n_mutations": int, "mut_freqs": float,
}
# Keys carried over from the base partis event.
_BASE = {"unique_ids": list, "input_seqs": list, "duplicates": list}


def _check_type(val, typ, key):
    assert type(val) is typ, (key, type(val), typ)


def _validate_line(ev: dict, heavy: bool, n_seqs: int) -> None:
    for key, typ in {**_COMMON, **(_HEAVY if heavy else _LIGHT),
                     **_BASE}.items():
        assert key in ev, f"missing {key}"
        _check_type(ev[key], typ, key)
    assert ev["logprob"] <= 0.0

    regions = {"v", "d", "j"} if heavy else {"v", "j"}
    rb = ev["regional_bounds"]
    assert set(rb) == regions, rb
    for r, pair in rb.items():
        assert len(pair) == 2 and all(type(x) is int for x in pair), (r,
                                                                      pair)
        assert 0 <= pair[0] <= pair[1] <= len(ev["naive_seq"])
    lengths = ev["lengths"]
    assert set(lengths) == regions
    for r in regions:
        assert lengths[r] == rb[r][1] - rb[r][0]

    cp = ev["codon_positions"]
    assert set(cp) == {"v", "j"} and all(type(v) is int for v in cp.values())
    _check_type(ev["cdr3_length"], int, "cdr3_length")
    assert ev["cdr3_length"] == cp["j"] - cp["v"] + 3 > 0

    for key, elem_t in _IMPLICIT_LISTS.items():
        assert key in ev, f"missing implicit {key}"
        vals = ev[key]
        assert type(vals) is list and len(vals) == n_seqs, (key, vals)
        for v in vals:
            _check_type(v, elem_t, key)

    ti = ev["tree-info"]
    trees = ti["linearham"]["trees"]
    assert type(trees) is list and trees
    for t in trees:
        assert type(t) is str and t.rstrip().endswith(";")

    assert len(ev["unique_ids"]) == n_seqs
    assert all(type(u) is str for u in ev["unique_ids"])


def _run_chain(tmp_path, family, n_trees, seed):
    out = tmp_path / "wf"
    out.mkdir()
    gene_dir = tmp_path / "hmm_params"
    write_gene_dir(family.genes, str(gene_dir))
    yaml_path = tmp_path / "partis_run.yaml"
    write_partis_yaml(family, str(yaml_path), seed=seed)
    samples = make_tree_samples(family, n_trees, seed=seed)
    write_trees_tsv(samples, str(out / "revbayes_run.trees"))
    run_family_workflow(
        str(out),
        partis_yaml_file=str(yaml_path),
        hmm_param_dir=str(gene_dir),
        mcmc_iter=10, mcmc_thin=1, tune_iter=0, tune_thin=1,
        num_rates=4, burnin_frac=0.0, subsamp_frac=0.5, seed=seed,
        precision="f64",
    )
    return out


def _validate_outputs(out, heavy, n_seqs):
    with open(out / "linearham_annotations_best.yaml") as fh:
        best = yaml.safe_load(fh)
    with open(out / "linearham_annotations_all.yaml") as fh:
        alldoc = yaml.safe_load(fh)
    for doc in (best, alldoc):
        assert set(doc) >= {"germline-info", "events"}
        gi = doc["germline-info"]
        assert set(gi["seqs"]) >= ({"v", "j"})
    assert len(best["events"]) == 1

    for ev in alldoc["events"]:
        _validate_line(ev, heavy, n_seqs)
    _validate_line(best["events"][0], heavy, n_seqs)

    # best is the mode; probabilities over unique annotations sum to 1
    probs = [math.exp(e["logprob"]) for e in alldoc["events"]]
    assert best["events"][0]["logprob"] == max(
        e["logprob"] for e in alldoc["events"])
    assert np.isclose(sum(probs), 1.0)


def test_annotation_schema_heavy(tmp_path):
    family = make_family(n_seqs=6, seed=21)
    out = _run_chain(tmp_path, family, n_trees=24, seed=21)
    _validate_outputs(out, heavy=True, n_seqs=6)


def test_annotation_schema_light(tmp_path):
    family = make_light_family(n_seqs=5, seed=22)
    out = _run_chain(tmp_path, family, n_trees=16, seed=22)
    _validate_outputs(out, heavy=False, n_seqs=5)
