"""True multi-process jax.distributed simulation on CPU.

The round-1 gap: ``parallel/mesh.initialize_distributed`` (the reference's
``--hostfile`` multi-node equivalent, scripts/llama_13b.sh) had never
executed.  Here two OS processes each own 2 virtual CPU devices, form one
4-device global mesh via a gloo coordinator, and run a sharded KD train
step whose collectives cross the process boundary — the TPU-native answer
to "test multi-node without a cluster" (SURVEY.md §4).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(280)
def test_two_process_distributed_kd_step():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon PJRT plugin breaks
    #   jax.distributed on the CPU backend (hangs in init)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", coord,
             "--num-processes", "2", "--process-id", str(pid),
             "--local-devices", "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "MP_OK" in out, (out, err[-1000:])
    # both ranks computed the same global loss
    losses = {o.split("loss=")[1].split()[0]
              for _, o, _ in outs}
    assert len(losses) == 1, losses
    assert all("global=4 local=2" in o for _, o, _ in outs)
