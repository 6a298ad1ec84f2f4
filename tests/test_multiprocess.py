"""Real multi-process distributed execution (SURVEY.md §2.8 "Multi-host
execution" — the one rung the round-2 VERDICT found unproven).

Spawns TWO OS processes that each call
``jax.distributed.initialize("localhost:<port>", num_processes=2,
process_id=i)`` with 4 virtual CPU devices apiece (global mesh = 8
devices, gloo collectives), build a dp-sharded global env state via
``parallel.distributed.make_global_env_state`` (each process constructs
only its local shard), run one sharded PPO train iteration, and dump the
resulting (replicated) parameters.

Asserts:
  (a) both processes end with identical parameters, and
  (b) they are bitwise-equal to the same program run single-process on an
      8-device mesh — "the same program runs 1-host and N-host".
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(args, timeout=600):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    return subprocess.run(
        [sys.executable, WORKER, *map(str, args)],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(WORKER))))


def test_two_process_ppo_iteration_bitwise_equals_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    out0, out1 = tmp_path / "p0.npz", tmp_path / "p1.npz"
    outs = tmp_path / "single.npz"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(i), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(WORKER))))
        for i, out in enumerate((out0, out1))
    ]
    for i, p in enumerate(procs):
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, (
            f"process {i} failed\nstdout:\n{stdout}\nstderr:\n{stderr[-4000:]}")

    single = _run(["none", 1, 0, outs])
    assert single.returncode == 0, single.stderr[-4000:]

    a, b, c = np.load(out0), np.load(out1), np.load(outs)
    assert set(a.files) == set(b.files) == set(c.files)
    for k in a.files:
        np.testing.assert_array_equal(
            a[k], b[k], err_msg=f"{k}: process 0 vs process 1")
        np.testing.assert_array_equal(
            a[k], c[k], err_msg=f"{k}: 2-process vs single-process")
    assert np.isfinite(a["loss"])
