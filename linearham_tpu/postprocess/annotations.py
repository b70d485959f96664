"""Collapse sampled annotations into posterior-weighted partis-style output.

Reads the pipeline TSV (one sampled V(D)J annotation per posterior tree)
plus the annotated trees, collapses duplicate annotations, assigns
``logprob = log(count / N)``, attaches the contributing trees under
``tree-info.linearham.trees``, and writes ``<base>_best.yaml`` /
``<base>_all.yaml`` (reference contract: scripts/write_lh_annotations.py).

The reference rebuilds full partis annotation lines via partis' own
libraries; that package is an external dependency by design, so here the
output carries the linearham annotation fields plus the original partis
event verbatim -- everything downstream partis tooling needs to
re-derive its implicit fields.
"""

from __future__ import annotations

import csv
import math
from typing import Dict, List, Optional

import yaml

from linearham_tpu.io.annotated_newick import parse_annotated_newick

ANNOTATION_KEYS = [
    "NaiveSequence", "VGene", "V5pDel", "V3pDel", "VFwkInsertion",
    "VDInsertion", "DGene", "D5pDel", "D3pDel", "DJInsertion",
    "VJInsertion", "JGene", "J5pDel", "J3pDel", "JFwkInsertion",
]


def _naive_from_tree(tree_line: str) -> str:
    tip = parse_annotated_newick(tree_line).find_tip("naive")
    if tip is None or "ancestral" not in tip.annotations:
        raise ValueError("tree lacks an annotated naive tip")
    return tip.annotations["ancestral"]


def _partis_style(row: dict, heavy: bool) -> dict:
    """Map pipeline TSV columns onto partis annotation vocabulary."""
    ann = {
        "naive_seq": row["NaiveSequence"],
        "v_gene": row["VGene"],
        "j_gene": row["JGene"],
        "v_5p_del": int(row["V5pDel"]),
        "v_3p_del": int(row["V3pDel"]),
        "j_5p_del": int(row["J5pDel"]),
        "j_3p_del": int(row["J3pDel"]),
        "fv_insertion": row.get("VFwkInsertion", ""),
        "jf_insertion": row.get("JFwkInsertion", ""),
    }
    if heavy:
        ann.update({
            "d_gene": row["DGene"],
            "d_5p_del": int(row["D5pDel"]),
            "d_3p_del": int(row["D3pDel"]),
            "vd_insertion": row.get("VDInsertion", ""),
            "dj_insertion": row.get("DJInsertion", ""),
        })
    else:
        ann["vj_insertion"] = row.get("VJInsertion", "")
    return ann


def write_lh_annotations(
    partis_yaml_path: str,
    log_path: str,
    trees_path: str,
    output_base: str,
    collapse_by: Optional[List[str]] = None,
) -> List[dict]:
    """Collapse + rank annotations; returns the sorted unique list."""
    with open(log_path, newline="") as fh:
        rows = list(csv.DictReader(fh, delimiter="\t"))
    with open(trees_path) as fh:
        trees = [l.strip() for l in fh if l.strip()]
    if len(rows) != len(trees):
        raise ValueError(
            f"annotation rows ({len(rows)}) and trees ({len(trees)}) differ")

    heavy = "DGene" in rows[0]
    # The .log drops NaiveSequence (reference behavior); recover each
    # sample's naive sequence from its annotated tree.
    for row, tree in zip(rows, trees):
        row.setdefault("NaiveSequence", _naive_from_tree(tree))
    keys = collapse_by or [k for k in ANNOTATION_KEYS if k in rows[0]]

    uniq: List[dict] = []
    for row, tree in zip(rows, trees):
        for entry in uniq:
            if all(entry["row"][k] == row[k] for k in keys):
                entry["count"] += 1
                entry["trees"].append(tree)
                break
        else:
            uniq.append({"row": row, "count": 1, "trees": [tree]})

    n = len(rows)
    with open(partis_yaml_path) as fh:
        partis_root = yaml.safe_load(fh)
    base_event = partis_root["events"][0]

    out = []
    for entry in sorted(uniq, key=lambda e: -e["count"]):
        ann = dict(base_event)
        ann.update(_partis_style(entry["row"], heavy))
        ann["logprob"] = math.log(entry["count"] / n)
        ann["tree-info"] = {"linearham": {"trees": entry["trees"]}}
        out.append(ann)

    def write(path: str, events: List[dict]) -> None:
        doc = {
            "germline-info": partis_root.get("germline-info", {}),
            "events": events,
        }
        with open(path, "w") as fh:
            yaml.safe_dump(doc, fh, sort_keys=False, width=10 ** 6)

    write(output_base + "_best.yaml", [out[0]])
    write(output_base + "_all.yaml", out)
    return out
