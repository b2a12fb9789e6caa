"""2-process jax.distributed test on CPU (VERDICT round-2 item 3).

Launches two subprocesses that form a real distributed JAX cluster
(coordinator + worker, 4 virtual CPU devices each = 8 global), run the
all_to_all sharded rasterizer across the process boundary, compare against
the single-chip render, and run the full dryrun_multichip contract."""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    port = _free_port()
    env_base = dict(os.environ)
    env_base["EOGS2_COORDINATOR"] = f"127.0.0.1:{port}"
    env_base["EOGS2_NUM_PROCESSES"] = "2"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the worker processes claim no TPU tunnel
    env_base["PALLAS_AXON_POOL_IPS"] = ""

    procs = []
    logs = []
    for pid in range(2):
        env = dict(env_base)
        env["EOGS2_PROCESS_ID"] = str(pid)
        log = open(tmp_path / f"proc{pid}.log", "w")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(ROOT, "tests",
                                              "multihost_worker.py"),
                 str(tmp_path)],
                env=env, cwd=ROOT, stdout=log, stderr=subprocess.STDOUT,
            )
        )
    rcs = [p.wait(timeout=840) for p in procs]
    for log in logs:
        log.close()
    if any(rcs):
        for pid in range(2):
            print(f"--- proc{pid} log ---")
            print((tmp_path / f"proc{pid}.log").read_text()[-4000:])
    assert rcs == [0, 0], rcs
    assert (tmp_path / "ok0").exists() and (tmp_path / "ok1").exists()
