"""Threshold-calibration CLI (reference: test.py + model.py:602-634).

Runs the eval patch grid through the model, accumulates PR histograms, and
prints the best-F1 threshold per head — the numbers that fill the
ITSC/ROAD/TOPO_THRESHOLD config keys.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="orbax dir or torch .ckpt/.pth")
    parser.add_argument("--dev_run", action="store_true")
    parser.add_argument("--data_root", default=".")
    parser.add_argument("--output_json", default=None)
    args = parser.parse_args(argv)

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from sam_road_tpu.config import load_config
    from sam_road_tpu.data.dataset import BatchLoader, SatMapDataset
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.ops.metrics import find_best_threshold
    from sam_road_tpu.training.harness import load_checkpoint, run_validation

    config = load_config(args.config)
    params = init_params(config)
    if os.path.isdir(args.checkpoint):
        params = load_checkpoint(args.checkpoint, params)
    else:
        from sam_road_tpu.models.convert import load_and_convert

        params, _, mismatched = load_and_convert(args.checkpoint, config)
        if mismatched:
            print(f"warning: {len(mismatched)} params not in checkpoint")

    ds = SatMapDataset(config, is_train=False, dev_run=args.dev_run,
                       data_root=args.data_root)
    loader = BatchLoader(ds, int(config.BATCH_SIZE),
                         num_batches=max(1, len(ds) // int(config.BATCH_SIZE)))
    metrics = run_validation(config, params, loader)
    results = {}
    print("======= Finding best thresholds ======")
    for category, hists in metrics["_pr_histograms"].items():
        best = find_best_threshold(hists[0], hists[1])
        results[category] = best
        print(f"======= {category} ======")
        print(
            f"Best threshold {best['threshold']}, P={best['precision']} "
            f"R={best['recall']} F1={best['f1']}"
        )
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
