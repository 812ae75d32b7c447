"""Multi-host (two-process) data-parallel training test.

Spawns TWO separate JAX processes (CPU backend, 2 virtual devices each,
gloo collectives) that each hold only their host-local half of a global
batch. shard_batch must assemble the halves into global arrays
(jax.make_array_from_process_local_data) and the jitted DP train step must
produce the SAME loss and updated parameters as a single-process run of the
full batch — proving the multi-host input path end to end
(SURVEY §2.2 comm-backend row; reference latent gap: train.py:99).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_train_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = {}
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.txt") as f:
            loss, checksum = map(float, f.read().split())
        results[pid] = (loss, checksum)
    # both hosts see the same global loss + params
    assert results[0] == pytest.approx(results[1], rel=1e-6)

    # single-process reference on the full batch
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import mp_train_worker as w

    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import Trainer

    cfg = w.tiny_cfg()
    trainer = Trainer(
        config=cfg,
        params=init_params(cfg),
        output_dir=str(tmp_path),
        steps_per_epoch=10,
    )
    state, aux = w.run_step(trainer, w.global_batch(cfg))
    import jax

    ref_loss = float(aux["loss"])
    ref_checksum = float(
        sum(abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(state.params))
    )
    assert results[0][0] == pytest.approx(ref_loss, rel=2e-5)
    assert results[0][1] == pytest.approx(ref_checksum, rel=2e-5)
