"""Two-process jax.distributed integration (VERDICT r4 #4): the only layer
of the multi-host path not covered by unit tests — real cross-process
initialization through parallel/mesh.py:init_distributed_from_env (the
reference's env-bootstrap, training/distributed.py:43-99) plus one genuine
multi-controller train step.

Spawns 2 CPU processes (2 virtual devices each -> a global 4-device mesh)
with a localhost coordinator, torchrun-style env (RANK/WORLD_SIZE/
MASTER_ADDR/MASTER_PORT). Each rank feeds DIFFERENT local rows; the
pmean'd update must leave both ranks with bit-identical params — the DDP
replica invariant the reference gets from torch.distributed."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # two fresh XLA:CPU processes + gRPC mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "workers", "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step_identical_params(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for rank in range(2):
        out = tmp_path / f"digest_{rank}.json"
        outs.append(out)
        env = dict(
            os.environ,
            RANK=str(rank),
            LOCAL_RANK="0",
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
        )
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    errs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            errs.append(stderr[-3000:])
    assert not errs, "\n---\n".join(errs)

    digests = [json.loads(out.read_text()) for out in outs]
    assert {d["rank"] for d in digests} == {0, 1}
    for d in digests:
        assert d["world"] == 2
        assert d["dist_world"] == 4  # 2 hosts x 2 local devices
    assert digests[0]["dist_process"] == 0 and digests[1]["dist_process"] == 1

    # both controllers saw the SAME global loss (pmean across the full mesh)
    assert digests[0]["loss"] == pytest.approx(digests[1]["loss"], abs=1e-6)
    # and ended the step with identical replicated params
    assert digests[0]["param_sum"] == pytest.approx(digests[1]["param_sum"], abs=1e-7)
    np.testing.assert_allclose(
        digests[0]["first_kernel"], digests[1]["first_kernel"], rtol=0, atol=0)
