"""Two-process distributed smoke: real cross-process collectives on CPU.

The reference's multi-node story is only ever exercised by the real SLURM +
mpirun launch (``run.sh:20-63``); round 1 likewise never ran
``jax.distributed.initialize``. This test launches TWO actual OS processes
(2 simulated CPU devices each), bootstraps them through
``parallel.mesh.initialize_distributed``, shards a deterministic dataset
with ``local_data_shard`` (the ``hvd.rank()`` split), and runs one
data-parallel residual-flow training step over the global 4-device mesh —
gradients pmean'd across the process boundary via Gloo. Worker:
``tests/_mp_worker.py``.
"""

import os

import pytest
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_flow_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The workers force their own platform/device-count; drop this process's
    # 8-device flag so each worker gets exactly 2 local devices.
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # Generous bound: a cold compile cache on a loaded 1-vCPU host
            # can take several minutes (observed flake at 420).
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert f"MP_OK {rank}" in out, (out, err)

    # pmean makes the replicated loss identical across ranks.
    losses = {out.split("loss ")[1].strip()
              for _, out, _ in outs if "loss " in out}
    assert len(losses) == 1, outs
