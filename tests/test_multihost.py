"""Two-process multihost execution on CPU (VERDICT r03 item 6).

Launches 2 real processes with jax.distributed (local coordinator), runs
initialize() + process_slice + per-host run_repertoire in each, and
asserts disjoint/complete coverage with finite log-likelihoods that match
a single-process reference run.  Also constructs global_family_mesh under
the multi-process CPU backend.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from linearham_tpu.parallel import multihost

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
outdir = sys.argv[4]; fixtures = sys.argv[5]

multihost.initialize(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid

# global mesh over every process's devices
mesh = multihost.global_family_mesh(1)
n_total = len(jax.devices())

# per-host independent execution over this process's slice
from linearham_tpu.io.trees_tsv import load_tree_samples
from linearham_tpu.models.phylo_hmm import PhyloHMM
from linearham_tpu.parallel.repertoire import FamilyTask, run_repertoire

specs = json.load(open(os.path.join(outdir, "specs.json")))
mine = multihost.process_slice(list(range(len(specs))))
tasks = []
for i in mine:
    tsv, seed = specs[i]
    hmm = PhyloHMM(os.path.join(fixtures, "phylo_hmm_input.yaml"), 0,
                   os.path.join(fixtures, "hmm_params"), seed=0)
    tasks.append(FamilyTask(hmm=hmm, samples=load_tree_samples(tsv)))
results = run_repertoire(tasks, num_rates=4, seed=0)

# Cross-process pooled reduction: every process contributes ITS families'
# scalars; the allgather crosses the process boundary, and both workers
# must report the identical repertoire-wide summary.
pooled = multihost.pooled_repertoire_summary_multiprocess(
    [r.loglik for r in results],
    [t.samples.rb_loglik for t in tasks])

out = {
    "pid": pid,
    "mine": mine,
    "n_global_devices": n_total,
    "mesh_shape": dict(mesh.shape),
    "pooled": pooled,
    "logliks": {str(i): list(map(float, r.loglik))
                for i, r in zip(mine, results)},
}
with open(os.path.join(outdir, f"worker_{pid}.json"), "w") as fh:
    json.dump(out, fh)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_cpu(fixtures_dir, tmp_path):
    sys.path.insert(0, str(REPO / "tests"))
    from test_pipeline import _make_tsv

    specs = []
    for i in range(3):
        tsv = tmp_path / f"mh_{i}.trees"
        _make_tsv(tsv, n_rows=3, seed=60 + i)
        specs.append([str(tsv), 60 + i])
    (tmp_path / "specs.json").write_text(json.dumps(specs))

    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("__REPO__", repr(str(REPO))))
    coord = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", coord,
             str(tmp_path), str(fixtures_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"

    reports = [json.load(open(tmp_path / f"worker_{pid}.json"))
               for pid in range(2)]
    # Disjoint, complete coverage of the family list.
    slices = [set(r["mine"]) for r in reports]
    assert slices[0] & slices[1] == set()
    assert slices[0] | slices[1] == {0, 1, 2}
    # Both processes saw the global 4-device world and built the mesh.
    for r in reports:
        assert r["n_global_devices"] == 4
        assert r["mesh_shape"] == {"fam": 4, "trees": 1}

    # Logliks are finite and match a single-process reference run.
    from linearham_tpu.io.trees_tsv import load_tree_samples
    from linearham_tpu.models.phylo_hmm import PhyloHMM
    from linearham_tpu.pipeline.run import run_pipeline_arrays

    merged = {}
    for r in reports:
        merged.update({int(k): v for k, v in r["logliks"].items()})
    assert set(merged) == {0, 1, 2}
    ref_ll, ref_rb = [], []
    for i, (tsv, _) in enumerate(specs):
        got = np.asarray(merged[i])
        assert np.isfinite(got).all()
        hmm = PhyloHMM(str(fixtures_dir / "phylo_hmm_input.yaml"), 0,
                       str(fixtures_dir / "hmm_params"), seed=0)
        samples = load_tree_samples(tsv)
        ref = run_pipeline_arrays(hmm, samples, num_rates=4, seed=0)
        np.testing.assert_allclose(got, ref.lh_loglik, rtol=1e-9)
        ref_ll.append(ref.lh_loglik)
        ref_rb.append(samples.rb_loglik)

    # Cross-process pooled reduction (VERDICT r04 item 4): the 2-process
    # pooled summary — whose partials actually crossed the process
    # boundary via process_allgather — must equal the single-process
    # value computed over ALL families, identically on both workers, and
    # sit at a non-trivial ESS.
    from linearham_tpu.parallel.multihost import \
        pooled_repertoire_summary_multiprocess

    single = pooled_repertoire_summary_multiprocess(ref_ll, ref_rb)
    for r in reports:
        for k, v in single.items():
            assert r["pooled"][k] == pytest.approx(v, rel=1e-9), (
                k, r["pooled"], single)
    assert single["n_trees"] == 9.0
    assert single["mean_family_ess"] > 1.0
