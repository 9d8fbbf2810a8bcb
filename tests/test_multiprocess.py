"""Multi-process data parallelism: 2 processes x 4 CPU devices must produce
bit-identical losses to 1 process x 8 devices on the same global batch.

This is the test the reference never has (its DDP correctness is delegated to
Lightning; SURVEY.md §2.4): here every process computes the same plan, loads
its S-slice, and `make_global_batch` + pjit must reconstruct exactly the
single-controller semantics.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker(proc_id, n_proc, port, n_local):
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(proc_id), str(n_proc), str(port), str(n_local)],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _result(stdout: str, stderr: str):
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line.\nstdout:\n{stdout}\nstderr:\n{stderr}")


def _losses(stdout: str, stderr: str):
    return _result(stdout, stderr)["losses"]


@pytest.mark.slow
def test_two_process_matches_single_process():
    port = _free_port()
    # 2-process x 4-device run
    procs = [_run_worker(i, 2, port, 4) for i in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    r0 = _result(*outs[0])
    r1 = _result(*outs[1])
    l0, l1 = r0["losses"], r1["losses"]
    # both controllers observe the same global loss
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)

    # cross-host metric reduce handled divergent key sets: both processes
    # see the union with correct per-dataset means and sample bookkeeping
    for r in (r0, r1):
        m = r["meter"]
        assert m["dsA_shared"] == 2.0          # (1+3)/2, host 0 only
        assert m["dsB_shared"] == 7.0          # host 1 only
        assert m["dsA_only0"] == 5.0
        assert m["dsB_only1"] == 9.0
        assert m["overall_shared"] == (1 + 3 + 7) / 3
        assert m["samples"] == {"dsA": 2, "dsB": 1}
        assert m["part_ranges"] == {"dsA": [2, 3], "dsB": [4, 4]}

    # single-process x 8-device reference
    ref = _run_worker(0, 1, _free_port(), 8)
    so, se = ref.communicate(timeout=900)
    assert ref.returncode == 0, f"single-process worker failed:\n{so}\n{se}"
    lref = _losses(so, se)
    # cross-process collective reduction order differs slightly from the
    # single-controller one — bitwise equality is not expected here
    np.testing.assert_allclose(l0, lref, rtol=2e-4, atol=1e-5)


class TestAutoDetectGating:
    """SLURM/OpenMPI auto-detect must require >1 task: in a single-task
    allocation jax.distributed.initialize() blocks at the coordinator
    barrier (a hang, not a catchable error)."""

    def _run(self, monkeypatch, env):
        import jax

        from rap_tpu.parallel import distributed as D

        for var in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                    "SLURM_JOB_ID", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE",
                    "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda *a, **kw: called.append((a, kw)),
        )
        idx, cnt = D.initialize()
        return called, idx, cnt

    def test_single_task_slurm_does_not_initialize(self, monkeypatch):
        called, idx, cnt = self._run(
            monkeypatch, {"SLURM_JOB_ID": "123", "SLURM_NTASKS": "1"}
        )
        assert called == []
        assert (idx, cnt) == (0, 1)

    def test_multi_task_slurm_initializes(self, monkeypatch):
        called, _, _ = self._run(
            monkeypatch, {"SLURM_JOB_ID": "123", "SLURM_NTASKS": "4"}
        )
        assert len(called) == 1

    def test_single_rank_openmpi_does_not_initialize(self, monkeypatch):
        called, _, _ = self._run(
            monkeypatch, {"OMPI_COMM_WORLD_SIZE": "1"}
        )
        assert called == []
