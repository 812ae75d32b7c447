"""Training CLI (reference: train.py).

samroad-train --config configs/toponet_vitb_512_cityscale.yaml
  [--resume CKPT] [--dev_run] [--fast_dev_run] [--data_root DIR]
  [--output_dir DIR] [--sam_ckpt PATH]

Unlike the reference, --resume is actually wired (the reference parses it but
never passes it to trainer.fit, reference: train.py:26-28,104).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", default=None, help="orbax checkpoint dir")
    parser.add_argument("--sam_ckpt", default=None,
                        help="override SAM_CKPT_PATH (torch .pth)")
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("--dev_run", action="store_true")
    parser.add_argument("--data_root", default=".")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--wandb", action="store_true",
                        help="also log to wandb if installed")
    parser.add_argument("--steps_per_epoch", type=int, default=0,
                        help="override the virtual epoch length")
    args = parser.parse_args(argv)

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from sam_road_tpu.config import create_output_dir_and_save_config, load_config
    from sam_road_tpu.data.dataset import BatchLoader, SatMapDataset
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import Trainer, load_checkpoint

    config = load_config(args.config)
    dev_run = args.dev_run or args.fast_dev_run
    output_dir = create_output_dir_and_save_config(
        "./save/train", config, specified_dir=args.output_dir
    )

    print("initializing params...", flush=True)
    params = init_params(config)
    sam_ckpt = args.sam_ckpt or config.SAM_CKPT_PATH
    if args.resume:
        pass  # full state restored after the Trainer is built
    elif not config.NO_SAM and sam_ckpt and os.path.exists(sam_ckpt):
        from sam_road_tpu.models.convert import load_and_convert

        params, matched, mismatched = load_and_convert(sam_ckpt, config)
        print("###### Matched params ######")
        print("\n".join(matched[:20] + [f"... {len(matched)} total"]))
        print("###### Mismatched params ######")
        print("\n".join(mismatched))
    elif (config.NO_SAM and config.MAE_CKPT_PATH
          and os.path.exists(config.MAE_CKPT_PATH)):
        # Reference ablation init: IN1k-MAE ViT-B trunk, no SA-1B
        # (reference: vitdet.py:43-110; pos_embed/rel_pos/neck stay init).
        from sam_road_tpu.models.convert import load_mae_encoder_params

        params, matched, mismatched = load_mae_encoder_params(
            config.MAE_CKPT_PATH, config)
        print("###### Matched params (MAE init) ######")
        print("\n".join(matched[:20] + [f"... {len(matched)} total"]))
        print(f"({len(mismatched)} params stay at random init)")
    else:
        print("training from random init (no SAM checkpoint found)")

    train_ds = SatMapDataset(config, is_train=True, dev_run=dev_run,
                             data_root=args.data_root)
    val_ds = SatMapDataset(config, is_train=False, dev_run=dev_run,
                           data_root=args.data_root)

    batch_size = int(config.BATCH_SIZE)
    steps_per_epoch = max(1, len(train_ds) // batch_size)
    if args.steps_per_epoch:
        steps_per_epoch = args.steps_per_epoch
    if args.fast_dev_run:
        steps_per_epoch = 2
    workers = max(1, int(config.DATA_WORKER_NUM or 1))
    # multi-host meshes: each host produces only its own chips' share of the
    # global batch (disjoint random streams for train, strided eval slices;
    # assembling host-local arrays into global ones is the runtime's job —
    # on a single-controller host pcnt == 1 and this is a no-op)
    import jax

    pidx, pcnt = jax.process_index(), jax.process_count()
    assert batch_size % pcnt == 0, (
        f"BATCH_SIZE {batch_size} must divide across {pcnt} hosts"
    )
    local_bs = batch_size // pcnt
    train_loader = BatchLoader(train_ds, local_bs, seed=args.seed,
                               num_batches=steps_per_epoch,
                               num_workers=workers,
                               process_index=pidx, process_count=pcnt)
    # no explicit num_batches: the loader covers exactly this host's strided
    # eval slice (a global count here would defeat the per-host split)
    val_loader = BatchLoader(val_ds, local_bs, seed=args.seed,
                             process_index=pidx, process_count=pcnt)

    from sam_road_tpu.utils.logging import MetricsLogger
    from sam_road_tpu.utils.profiling import maybe_trace

    logger = MetricsLogger(output_dir, config=config,
                           use_wandb=args.wandb, disabled=dev_run)
    trainer = Trainer(
        config=config, params=params, output_dir=output_dir,
        steps_per_epoch=steps_per_epoch, logger=logger,
    )
    start_epoch = 0
    if args.resume:
        start_epoch = trainer.restore(args.resume)
        print(f"resumed full train state from {args.resume}; "
              f"continuing at epoch {start_epoch}")
    epochs = 1 if args.fast_dev_run else int(config.TRAIN_EPOCHS)
    for epoch in range(start_epoch, epochs):
        with maybe_trace(config.TRACE_DIR or None):
            trainer.train_epoch(train_loader, epoch)
        metrics = trainer.validate(
            val_loader, epoch=epoch,
            viz_count=int(config.VAL_VIZ_COUNT or 4),
        )
        printable = {k: v for k, v in metrics.items() if not k.startswith("_")}
        print(f"epoch {epoch} val: {printable}", flush=True)
        ckpt = trainer.save_checkpoint(epoch)
        logger.log({"epoch": epoch, **printable})
        print(f"saved {ckpt}", flush=True)
    logger.finish()


if __name__ == "__main__":
    main()
