"""2-process jax.distributed formation + sharded search + reshard (VERDICT
round-1 item #3: prove the multi-host/DCN path actually executes).

Spawns two OS processes, each with 4 virtual CPU devices; they form one
8-device global mesh via jax.distributed.initialize and run a sharded
search whose all_gather crosses the process boundary, then a failover-style
reshard onto a permuted mesh (cross-process bulk transfer).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_search():
    worker = Path(__file__).parent / "multihost_worker.py"
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    # the sandbox's sitecustomize registers the axon PJRT plugin at
    # interpreter start (initializing the backend, which breaks
    # jax.distributed.initialize); CPU-only workers don't want it
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out


def test_kill_a_host_failure_drill(tmp_path):
    """ROADMAP #8: SIGKILL one process of a live 2-host group, survivor
    detects the loss (TCP heartbeat = monitor_node analogue), and a fresh
    half-size group restores the cooperative snapshot with topology
    resharding (8 shards -> 4-device mesh) at full search parity."""
    import signal
    import time

    worker = Path(__file__).parent / "multihost_failover_worker.py"
    coord = f"127.0.0.1:{_free_port()}"
    hb_port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)

    def spawn(role, *args):
        return subprocess.Popen(
            [sys.executable, str(worker), role, *args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )

    survivor = spawn("survivor", coord, str(hb_port), str(tmp_path))
    victim = spawn("victim", coord, str(hb_port), str(tmp_path))
    try:
        # wait until the survivor has snapshotted + started monitoring
        ready_deadline = time.time() + 180
        out_lines = []
        while time.time() < ready_deadline:
            line = survivor.stdout.readline()
            if not line:
                break
            out_lines.append(line)
            if "READY" in line:
                break
        else:
            pytest.fail("survivor never became READY")
        assert any("READY" in l for l in out_lines), out_lines

        victim.send_signal(signal.SIGKILL)   # the host "fails"

        out, _ = survivor.communicate(timeout=90)
        assert survivor.returncode == 0, out
        assert "PEER_LOSS_DETECTED" in out, out
        # the survivor itself resharded onto its local devices and kept
        # answering the same queries with FULL data (post-kill correctness)
        assert "SURVIVOR_RESHARDED_OK" in out, out
    finally:
        for p in (survivor, victim):
            if p.poll() is None:
                p.kill()

    # recovery: fresh half-size group restores the snapshot
    restorer = spawn("restore", str(tmp_path))
    out, _ = restorer.communicate(timeout=180)
    assert restorer.returncode == 0, out
    assert "RESTORED_OK" in out, out
