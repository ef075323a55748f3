"""Multi-process distributed training test: two processes form one global
mesh via ``jax.distributed`` and run the same sharded step — the
single-machine stand-in for multi-host pod-slice training (the real thing
differs only in transport: ICI/DCN instead of localhost gRPC)."""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)

    losses = {}
    for out in outs:
        m = re.search(r"WORKER (\d+) LOSS ([0-9.]+)", out)
        assert m, f"worker output missing loss:\n{out[-2000:]}"
        losses[int(m.group(1))] = float(m.group(2))

    assert all(p.returncode == 0 for p in procs), (
        f"worker failed:\n{outs[0][-1500:]}\n---\n{outs[1][-1500:]}"
    )
    assert len(losses) == 2
    # both processes computed the same global step
    assert abs(losses[0] - losses[1]) < 1e-6, losses


def test_two_process_cli_train(tmp_path):
    """The same 2-process bring-up driven entirely through the public CLI
    (``nerf-tpu train --coordinator_address ... --num_processes 2
    --process_id N``): both hosts train on one global 8-device mesh, agree
    on the loss, and process 0 writes the checkpoint."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = str(tmp_path / "ckpt")

    def env_for() -> dict:
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["NERF_TPU_PLATFORM"] = "cpu"
        env["PYTHONPATH"] = (
            repo + os.pathsep + env["PYTHONPATH"]
            if env.get("PYTHONPATH") else repo
        )
        return env

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "nerf_tpu.cli.main", "train",
             "--data_dir", str(tmp_path / "nonexistent"),  # procedural scene
             "--image_size", "16", "--streaming_steps", "4",
             "--n_rays", "64",
             "--checkpoint_dir", ckpt_dir,
             "--output_dir", str(tmp_path / "out"),
             "--coordinator_address", coord,
             "--num_processes", "2", "--process_id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env_for(), cwd=repo,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), (
        f"CLI worker failed:\n{outs[0][-1500:]}\n---\n{outs[1][-1500:]}"
    )
    losses = {}
    for out in outs:
        m = re.search(r"PROC (\d+) FINAL LOSS ([0-9.]+)", out)
        assert m, f"missing final loss:\n{out[-2000:]}"
        losses[int(m.group(1))] = float(m.group(2))
    assert len(losses) == 2
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    assert os.path.exists(os.path.join(ckpt_dir, "final_model.npz"))
