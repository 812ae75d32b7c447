"""Offline label-mask preparation CLI (reference: the run-once
`cityscale/generate_labels.py` / `spacenet/generate_labels.py` scripts,
lines 75-102 / 76-108).

    samroad-prepare --dataset cityscale --data_root .

rasterizes each tile's GT graph into keypoint/road mask PNGs under
<data_root>/<dataset>/processed/, which SatMapDataset expects at load time.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=["cityscale", "spacenet"])
    parser.add_argument("--data_root", default=".")
    args = parser.parse_args(argv)

    from sam_road_tpu.data.label_gen import (
        generate_cityscale_labels,
        generate_spacenet_labels,
    )

    root = os.path.join(args.data_root, args.dataset)
    if args.dataset == "cityscale":
        generate_cityscale_labels(root)
    else:
        generate_spacenet_labels(root)
    out = os.path.join(root, "processed")
    n = len(os.listdir(out)) if os.path.isdir(out) else 0
    print(f"wrote {n} mask PNGs to {out}")


if __name__ == "__main__":
    main()
