"""Multi-host (DCN) data parallelism dryrun (parallel/multihost.py; VERDICT round-3
item #9): the SAME jitted GSPMD train step, run from two coordinated processes over one
global 8-device mesh (2 hosts x 4 virtual CPU devices, gloo collectives), must reproduce
the single-process 8-device result — proving the mesh code is host-count-agnostic, as
parallel/mesh.py claims. Beyond the reference's single-node surface (reference
src/main.py:26-44 is single-node DDP)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(process_id: int, num_processes: int, port: int, outdir: Path,
           local_devices: int) -> subprocess.Popen:
    env = {k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={local_devices}",
    })
    return subprocess.Popen(
        [sys.executable, "-m", "diamond_tpu.parallel.multihost",
         str(process_id), str(num_processes), str(port), str(outdir)],
        env=env, cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def _run_group(num_processes: int, local_devices: int, outdir: Path) -> list:
    outdir.mkdir(parents=True, exist_ok=True)
    port = _free_port()
    procs = [_spawn(i, num_processes, port, outdir, local_devices)
             for i in range(num_processes)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so[-2000:]}\n{se[-3000:]}"
    return [json.loads((outdir / f"dryrun_p{i}.json").read_text())
            for i in range(num_processes)]


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    # 2 hosts x 4 devices: one global 8-device mesh across processes
    two = _run_group(2, 4, tmp_path / "two")
    assert all(r["global_devices"] == 8 for r in two)
    assert all(r["step"] == 2 for r in two)
    # both processes computed the same GLOBAL loss (replicated output of one program)
    assert two[0]["loss"] == two[1]["loss"]
    assert two[0]["grad_norm"] == two[1]["grad_norm"]
    # AC/imagination step (replicated pool pointer + death prefix-sum in the rollout)
    assert two[0]["ac_loss"] == two[1]["ac_loss"]
    # the replicated pool pointer (advanced by initial_state + per-death refills inside
    # the rollout's prefix-sum) is a single global scalar both processes agree on
    assert two[0]["ac_pool_ptr"] == two[1]["ac_pool_ptr"] >= 8

    # 1 host x 8 devices: the same worker, same global batch, single process
    one = _run_group(1, 8, tmp_path / "one")
    assert one[0]["global_devices"] == 8
    # host-count-agnostic: same global math (tolerance = cross-topology reduction order)
    np.testing.assert_allclose(two[0]["loss"], one[0]["loss"], rtol=1e-5)
    np.testing.assert_allclose(two[0]["grad_norm"], one[0]["grad_norm"], rtol=1e-4)
    np.testing.assert_allclose(two[0]["ac_loss"], one[0]["ac_loss"], rtol=1e-4)
    np.testing.assert_allclose(two[0]["ac_grad_norm"], one[0]["ac_grad_norm"], rtol=1e-3)
    # identical death pattern -> identical pointer advance across topologies
    assert one[0]["ac_pool_ptr"] == two[0]["ac_pool_ptr"]
