"""Debug visualizer for GraphLabelGenerator output
(reference: dataset.py:234-284, test_graph_label_generator): renders sampled
topology labels (source/target points, connectivity lines) over rotated RGB
patches to <out>/viz_*.png for eyeballing label correctness.

samroad-debug-labels --config cfg.yaml --data_root . [--tile 0] [--num 16]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--data_root", default=".")
    parser.add_argument("--out", default="debug")
    parser.add_argument("--tile", type=int, default=0,
                        help="tile index within the train split")
    parser.add_argument("--num", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import cv2

    from sam_road_tpu.config import load_config
    from sam_road_tpu.data.dataset import SatMapDataset

    config = load_config(args.config)
    ds = SatMapDataset(config, is_train=True, data_root=args.data_root)
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    gen = ds.graph_label_generators[args.tile]
    rgb = ds.rgbs[args.tile]
    patch_size = int(config.PATCH_SIZE)
    lo, hi = ds.sample_min, ds.sample_max

    for i in range(args.num):
        x0 = int(rng.integers(lo, hi + 1))
        y0 = int(rng.integers(lo, hi + 1))
        rot_index = int(rng.integers(0, 4))
        patch = ((x0, y0), (x0 + patch_size, y0 + patch_size))
        points, samples = gen.sample_patch(patch, rot_index, rng)

        rgb_patch = rgb[y0 : y0 + patch_size, x0 : x0 + patch_size, ::-1].copy()
        rgb_patch = np.rot90(rgb_patch, rot_index, (0, 1)).copy()
        for pairs, shall_connect, valid in samples:
            color = tuple(int(c) for c in rng.integers(0, 256, size=3))
            for (src, tgt), connected, is_valid in zip(pairs, shall_connect, valid):
                if not is_valid:
                    continue
                p0, p1 = points[src], points[tgt]
                cv2.circle(rgb_patch, p0.astype(np.int32), 4, color, -1)
                cv2.circle(rgb_patch, p1.astype(np.int32), 2, color, -1)
                if connected:
                    cv2.line(
                        rgb_patch,
                        (int(p0[0]), int(p0[1])),
                        (int(p1[0]), int(p1[1])),
                        (255, 255, 255),
                        1,
                    )
        cv2.imwrite(os.path.join(args.out, f"viz_{i}.png"), rgb_patch)
    print(f"wrote {args.num} label visualizations to {args.out}/")


if __name__ == "__main__":
    main()
