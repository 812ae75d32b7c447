"""Worker for the two-process CPU multi-host test (test_multiprocess.py).

Each process holds only its HOST-LOCAL half of the global batch; shard_batch
must assemble the halves into one global array over the 2-host x 2-device
mesh (jax.make_array_from_process_local_data) and the jitted DP train step
must run and agree with a single-process run of the full batch.
Mirrors a real multi-host launch (SURVEY §2.2 comm-backend row; the
reference's latent DDP is commented out, reference: train.py:99).
"""

import os
import sys


def tiny_cfg():
    from sam_road_tpu.config import load_config

    return load_config(
        overrides=dict(
            SAM_VERSION="vit_t",
            PATCH_SIZE=32,
            COMPUTE_DTYPE="float32",
            TOPO_SAMPLE_NUM=4,
            MAX_NEIGHBOR_QUERIES=4,
            BATCH_SIZE=8,
            BASE_LR=1e-3,
        )
    )


def global_batch(cfg, batch=8, n_pts=8):
    import numpy as np

    rng = np.random.default_rng(0)
    s, p = cfg.TOPO_SAMPLE_NUM, cfg.MAX_NEIGHBOR_QUERIES
    sz = cfg.PATCH_SIZE
    return {
        "rgb": rng.uniform(0, 255, (batch, sz, sz, 3)).astype(np.float32),
        "keypoint_mask": (rng.random((batch, sz, sz)) > 0.9).astype(np.float32),
        "road_mask": (rng.random((batch, sz, sz)) > 0.7).astype(np.float32),
        "graph_points": rng.uniform(0, sz, (batch, n_pts, 2)).astype(np.float32),
        "pairs": rng.integers(0, n_pts, (batch, s, p, 2)).astype(np.int32),
        "connected": rng.random((batch, s, p)) > 0.5,
        "valid": rng.random((batch, s, p)) > 0.2,
    }


def run_step(trainer, batch):
    import jax

    from sam_road_tpu.parallel.mesh import shard_batch

    sb = shard_batch(trainer.mesh, batch)
    assert sb["rgb"].shape[0] == 8, f"global batch axis is {sb['rgb'].shape[0]}"
    state, aux = trainer._train_step(trainer.state, sb, jax.random.PRNGKey(7))
    return state, aux


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc

    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import Trainer

    cfg = tiny_cfg()
    params = init_params(cfg)
    trainer = Trainer(
        config=cfg, params=params, output_dir=outdir, steps_per_epoch=10
    )
    full = global_batch(cfg)
    lo = pid * 4
    local = {k: v[lo : lo + 4] for k, v in full.items()}
    state, aux = run_step(trainer, local)
    # Fetch the (replicated) loss and updated-param checksum on every host —
    # params are fully replicated, so device_get is host-local.
    loss = float(aux["loss"])
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(abs(jax.device_get(l)).sum() for l in leaves))
    with open(os.path.join(outdir, f"result_{pid}.txt"), "w") as f:
        f.write(f"{loss:.10f} {checksum:.6f}\n")
    print(f"RESULT {pid} {loss:.10f} {checksum:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
