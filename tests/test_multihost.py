"""Multi-process (DCN) mesh path: 2 localhost processes x 4 virtual CPU
devices each join one jax.distributed cluster and execute a globally-sharded
program (SURVEY §5's multi-host story; parallel/mesh.init_distributed_from_env).

Spawned as subprocesses — the test process itself must NOT initialize the
distributed runtime (it would poison the in-process JAX backend for the rest
of the suite)."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_group(repo, script, port):
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("AUDSEP_NO_MALLOC_DEBUG", None)
        env.update({
            "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "AUDSEP_COORDINATOR": f"127.0.0.1:{port}",
            "AUDSEP_NUM_PROCESSES": "2",
            "AUDSEP_PROCESS_ID": str(pid),
            "AUDSEP_DRYRUN_TP": "2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, script], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    return procs


def test_two_process_mesh_executes_sharded_program(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tools", "dcn_dryrun.py")

    # The localhost gloo rendezvous hangs intermittently under load (both
    # ranks connect, then a collective stalls — observed ~1/10 on this
    # 1-vCPU host). One retry on a fresh port keeps the test meaningful
    # without flaking the suite; a genuine wiring bug fails both attempts.
    results = []
    for attempt in range(2):
        procs = _launch_group(repo, script, _free_port())
        try:
            outs = [p.communicate(timeout=120) for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            if attempt == 0:
                continue
            raise
        results = []
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err}"
            line = [l for l in out.splitlines() if l.startswith("{")][-1]
            results.append(json.loads(line))
        break

    for r in results:
        assert r["ok"] is True
        assert r["joined_cluster"] is True
        assert r["num_processes"] == 2
        assert r["devices_global"] == 8
        assert r["devices_local"] == 4
        assert r["mesh"] == {"data": 4, "model": 2}
    assert {r["process"] for r in results} == {0, 1}
