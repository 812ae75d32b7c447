"""Triage CLI (reference: triage.py:84-111): rank inference results by score
and render worst-case pred-vs-GT side-by-side images."""

from __future__ import annotations

import argparse
import os
import pickle
import random


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", default="inference_results.pickle")
    parser.add_argument("--output_dir", default="triage/below_average")
    parser.add_argument("--sample_num", type=int, default=200)
    parser.add_argument("--smd_threshold", type=float, default=0.05)
    args = parser.parse_args(argv)

    import cv2

    from sam_road_tpu.utils.viz import visualize_pred_gt_pair

    with open(args.results, "rb") as f:
        inference_results = pickle.load(f)

    os.makedirs(args.output_dir, exist_ok=True)
    selected = [x for x in inference_results if x["smd"] > args.smd_threshold]
    sampled = random.sample(selected, min(args.sample_num, len(selected)))
    sampled = sorted(sampled, key=lambda x: -x["smd"])
    for x in sampled:
        pair_img = visualize_pred_gt_pair(x)
        img_name = os.path.basename(x["img_path"])
        cv2.imwrite(
            os.path.join(args.output_dir, f"smd_{x['smd']:.6f}_{img_name}"), pair_img
        )


if __name__ == "__main__":
    main()
