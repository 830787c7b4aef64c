"""Multi-process drive of the SLURM-replacement scheduling stack.

The reference scales out via SLURM array tasks (render_templates.py:41-43,
dino_inference.py:52-54, eval_calc_errors.py:232-239); this framework's
equivalents are `parallel.scheduler` (work sharding) and
`parallel.mesh.maybe_initialize_distributed` (jax.distributed env init).
These tests actually LAUNCH two local processes against a real coordinator
(no mocks), and drive a real CLI's per-shard rerun idempotence.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(extra):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no tunneled TPU in subprocesses
    env.pop("SLURM_ARRAY_TASK_ID", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env.update(extra)
    return env


WORKER = textwrap.dedent(
    """
    import json, os, sys
    from freepose_tpu.parallel.mesh import maybe_initialize_distributed
    from freepose_tpu.parallel.scheduler import current_shard, shard_items

    maybe_initialize_distributed()
    import jax

    # The coordination handshake is the proof of initialization: process_count
    # only reports 2 when both workers registered with the coordinator.
    assert jax.process_count() == 2, jax.process_count()
    shard = current_shard()
    assert shard.count == 2, shard
    assert shard.index == jax.process_index()

    items = list(range(7))
    out = sys.argv[1]
    for i in shard_items(items, shard):
        path = os.path.join(out, f"item_{i:02d}.json")
        if os.path.exists(path):  # per-shard rerun idempotence
            continue
        with open(path, "w") as f:
            json.dump({"item": i, "writer": shard.index}, f)
    print("worker", shard.index, "done")
    """
)


def test_two_process_distributed_scheduler(tmp_path):
    """Two real processes + a real coordinator: maybe_initialize_distributed
    wires jax.distributed from the FREEPOSE_* env, current_shard picks up
    jax.process_index, and the strided split covers every item exactly once
    with no double-writers."""
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    out = tmp_path / "out"
    out.mkdir()
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(out)],
                env=_env({
                    "FREEPOSE_COORDINATOR": f"127.0.0.1:{port}",
                    "FREEPOSE_NUM_PROCESSES": "2",
                    "FREEPOSE_PROCESS_ID": str(pid),
                }),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    import json

    files = sorted(out.glob("item_*.json"))
    assert [f.name for f in files] == [f"item_{i:02d}.json" for i in range(7)]
    writers = {}
    for f in files:
        d = json.loads(f.read_text())
        writers[d["item"]] = d["writer"]
    # Strided split: worker 0 gets evens, worker 1 odds — disjoint coverage.
    assert writers == {i: i % 2 for i in range(7)}


def _write_tiny_obj(path: Path) -> None:
    vs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    fs = [(1, 3, 5), (3, 2, 5), (2, 4, 5), (4, 1, 5),
          (3, 1, 6), (2, 3, 6), (4, 2, 6), (1, 4, 6)]
    lines = [f"v {a} {b} {c}" for a, b, c in vs]
    lines += [f"f {a} {b} {c}" for a, b, c in fs]
    path.write_text("\n".join(lines) + "\n")


def test_render_templates_shard_rerun_idempotent(tmp_path):
    """The real render_templates CLI under FREEPOSE_SHARD_* env (the
    reference's SLURM-array rerun flow, render_templates.py:41-43): two
    shards cover the filelist; rerunning a shard skips existing outputs
    byte-for-byte (mtime unchanged)."""
    meshes = tmp_path / "meshes"
    names = ["meshaaa", "meshbbb"]
    for n in names:
        (meshes / n).mkdir(parents=True)
        _write_tiny_obj(meshes / n / f"{n}.obj")
    (tmp_path / "filelist.txt").write_text("\n".join(names) + "\n")
    out = tmp_path / "shards"

    def run(idx, count):
        return subprocess.run(
            [sys.executable, "-m", "scripts.render_templates",
             "--mesh-dir", str(meshes), "--filelist", str(tmp_path / "filelist.txt"),
             "--out", str(out), "--n-poses", "2", "--resolution", "32"],
            env=_env({
                "FREEPOSE_SHARD_INDEX": str(idx),
                "FREEPOSE_SHARD_COUNT": str(count),
            }),
            capture_output=True, text=True, cwd=REPO, timeout=300,
        )

    for idx in range(2):
        r = run(idx, 2)
        assert r.returncode == 0, r.stdout + r.stderr
    tars = sorted(out.glob("shard-*.tar"))
    assert tars, "no shard written"
    stamps = {t.name: t.stat().st_mtime_ns for t in tars}

    r = run(0, 2)  # rerun the shard-0 task (SLURM requeue semantics)
    assert r.returncode == 0, r.stdout + r.stderr
    for t in sorted(out.glob("shard-*.tar")):
        assert t.stat().st_mtime_ns == stamps[t.name], "rerun rewrote a shard"
