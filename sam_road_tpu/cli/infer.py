"""Region-inference CLI (reference: inferencer.py:239-349).

Per test tile: run the tiled inference engine, save fused masks, a graph
overlay visualization, the pickled sat2graph-format graph (the metric suite's
input), and inference_time.txt.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--data_root", default=".")
    parser.add_argument("--max_tiles", type=int, default=0,
                        help="limit tile count (0 = all)")
    args = parser.parse_args(argv)

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from sam_road_tpu.config import create_output_dir_and_save_config, load_config
    from sam_road_tpu.data.dataset import read_rgb_img
    from sam_road_tpu.data.partitions import (
        cityscale_data_partition,
        spacenet_data_partition,
    )
    from sam_road_tpu.graph.convert import convert_to_sat2graph_format
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import load_checkpoint
    from sam_road_tpu.utils.viz import visualize_image_and_graph

    config = load_config(args.config)
    params = init_params(config)
    if os.path.isdir(args.checkpoint):
        params = load_checkpoint(args.checkpoint, params)
    else:
        from sam_road_tpu.models.convert import load_and_convert

        params, _, mismatched = load_and_convert(args.checkpoint, config)
        if mismatched:
            print(f"warning: {len(mismatched)} params not found in checkpoint")

    if config.DATASET == "cityscale":
        _, _, test_img_indices = cityscale_data_partition()
        rgb_pattern = os.path.join(args.data_root, "cityscale/20cities/region_{}_sat.png")
    else:
        _, _, test_img_indices = spacenet_data_partition(
            os.path.join(args.data_root, "spacenet/data_split.json")
        )
        rgb_pattern = os.path.join(args.data_root, "spacenet/RGB_1.0_meter/{}__rgb.png")
    if args.max_tiles:
        test_img_indices = test_img_indices[: args.max_tiles]

    output_dir = create_output_dir_and_save_config(
        "./save/infer", config, specified_dir=(
            f"./save/{args.output_dir}" if args.output_dir else None
        ),
    )
    for sub in ("mask", "viz", "graph"):
        os.makedirs(os.path.join(output_dir, sub), exist_ok=True)

    # Multi-chip region inference: DP_SHARDS > 1 spreads each tile's patch
    # grid over a 'dp' mesh (spatial row bands, bit-identical masks — see
    # inference/engine.py). Same config key the Trainer uses.
    mesh = None
    n_shards = int(config.DP_SHARDS or 0)
    sp_shards = int(config.SP_SHARDS or 0)
    assert not (n_shards > 1 and sp_shards > 1), (
        "DP_SHARDS and SP_SHARDS are mutually exclusive (spatial patch "
        "banding vs token-row sharding of one patch)")
    want = max(n_shards, sp_shards)
    # sp_shards == 1 is the SP-overhead measurement mode: a 1-device mesh
    # runs the sequence-parallel machinery with identity collectives.
    if want > 1 or sp_shards == 1:
        import jax

        from sam_road_tpu.parallel.mesh import make_mesh

        avail = len(jax.devices())
        if avail >= want:
            mesh = make_mesh(want)
            kind = ("patch grid" if n_shards > 1
                    else "encoder token grid (sequence parallel)")
            print(f"sharding the {kind} over {want} devices")
        else:
            print(
                f"{'DP' if n_shards > 1 else 'SP'}_SHARDS={want} requested "
                f"but only {avail} device(s) visible; running single-device"
            )
    engine = TiledInferenceEngine(config, params, mesh=mesh)
    import cv2

    # Preload tiles (the reference reads lazily, inferencer.py:276, but
    # pipelined inference wants the next tile available at dispatch time).
    imgs = [read_rgb_img(rgb_pattern.format(i)) for i in test_img_indices]

    total_inference_seconds = 0.0
    loop_start = time.time()
    for img_id, img, result in zip(
        test_img_indices, imgs, engine.infer_tiles(imgs)
    ):
        print(f"Processing {img_id}", flush=True)
        pred_nodes, pred_edges, itsc_mask, road_mask = result
        total_inference_seconds = time.time() - loop_start

        cv2.imwrite(os.path.join(output_dir, "mask", f"{img_id}_road.png"), road_mask)
        cv2.imwrite(os.path.join(output_dir, "mask", f"{img_id}_itsc.png"), itsc_mask)

        img_size = img.shape[0]
        viz_img = visualize_image_and_graph(
            np.copy(img), pred_nodes / img_size, pred_edges, img_size
        )
        cv2.imwrite(os.path.join(output_dir, "viz", f"{img_id}.png"), viz_img)

        if config.DATASET == "spacenet":
            # (r, c) -> spacenet GT frame (reference: inferencer.py:332-334;
            # 400 there == tile size, generalized for IMAGE_SIZE overrides)
            pred_nodes = np.stack(
                [img_size - pred_nodes[:, 0], pred_nodes[:, 1]], axis=1
            )
        large_map = convert_to_sat2graph_format(pred_nodes, pred_edges)
        with open(os.path.join(output_dir, "graph", f"{img_id}.p"), "wb") as f:
            pickle.dump(large_map, f)
        print(f"Done for {img_id}. timings={engine.last_timings}", flush=True)

    time_txt = (
        f"Inference completed for {args.config} in {total_inference_seconds} seconds."
    )
    print(time_txt)
    with open(os.path.join(output_dir, "inference_time.txt"), "w") as f:
        f.write(time_txt)


if __name__ == "__main__":
    main()
