"""SatMapDataset + batch loader: tiles in RAM, random train patches with
rot90 augmentation, deterministic eval patch grid.

Port of the reference dataset (reference: dataset.py:306-445) minus torch:
samples are numpy dicts; collation pads the ragged graph_points to a bucketed
size (multiples of `point_bucket`) instead of the exact batch max, so the
jitted train step compiles a handful of shapes rather than one per batch.
A background thread prefetches batches to keep the TPU fed.
"""

from __future__ import annotations

import math
import os
import pickle
import queue
import threading

import numpy as np

from sam_road_tpu.data.graph_labels import GraphLabelGenerator
from sam_road_tpu.data.partitions import (
    cityscale_data_partition,
    get_patch_info_one_img,
    spacenet_data_partition,
)


def read_rgb_img(path):
    import cv2

    bgr = cv2.imread(path)
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


class SatMapDataset:
    """Loads every tile (rgb + masks + a GraphLabelGenerator) into memory
    (reference: dataset.py:350-378)."""

    def __init__(self, config, is_train: bool, dev_run: bool = False,
                 data_root: str = "."):
        self.config = config
        assert config.DATASET in {"cityscale", "spacenet"}
        if config.DATASET == "cityscale":
            self.IMAGE_SIZE = 2048
            self.SAMPLE_MARGIN = 64
            # framework addition: IMAGE_SIZE override for synthetic fixtures
            if config.IMAGE_SIZE:
                self.IMAGE_SIZE = int(config.IMAGE_SIZE)
            rgb_pattern = os.path.join(data_root, "cityscale/20cities/region_{}_sat.png")
            keypoint_mask_pattern = os.path.join(
                data_root, "cityscale/processed/keypoint_mask_{}.png"
            )
            road_mask_pattern = os.path.join(
                data_root, "cityscale/processed/road_mask_{}.png"
            )
            gt_graph_pattern = os.path.join(
                data_root, "cityscale/20cities/region_{}_refine_gt_graph.p"
            )
            train, val, test = cityscale_data_partition()
            coord_transform = lambda v: v[:, ::-1]  # (r, c) -> (x, y)
        else:
            self.IMAGE_SIZE = 400
            self.SAMPLE_MARGIN = 0
            if config.IMAGE_SIZE:
                self.IMAGE_SIZE = int(config.IMAGE_SIZE)
            rgb_pattern = os.path.join(data_root, "spacenet/RGB_1.0_meter/{}__rgb.png")
            keypoint_mask_pattern = os.path.join(
                data_root, "spacenet/processed/keypoint_mask_{}.png"
            )
            road_mask_pattern = os.path.join(
                data_root, "spacenet/processed/road_mask_{}.png"
            )
            gt_graph_pattern = os.path.join(
                data_root, "spacenet/RGB_1.0_meter/{}__gt_graph.p"
            )
            train, val, test = spacenet_data_partition(
                os.path.join(data_root, "spacenet/data_split.json")
            )
            # (r?, c?) GT frame -> image (x, y) (reference: dataset.py:340;
            # 400 there == tile size, generalized for IMAGE_SIZE overrides)
            size = self.IMAGE_SIZE
            coord_transform = lambda v: np.stack([v[:, 1], size - v[:, 0]], axis=1)

        self.is_train = is_train
        tile_indices = (train + val) if is_train else test
        if dev_run:
            tile_indices = tile_indices[:4]
        self.tile_indices = tile_indices

        import cv2

        self.rgbs, self.keypoint_masks, self.road_masks = [], [], []
        self.graph_label_generators = []
        for tile_idx in tile_indices:
            gt_graph_adj = pickle.load(open(gt_graph_pattern.format(tile_idx), "rb"))
            if len(gt_graph_adj) == 0:
                print(f"===== skipped empty tile {tile_idx} =====")
                continue
            self.rgbs.append(read_rgb_img(rgb_pattern.format(tile_idx)))
            self.road_masks.append(
                cv2.imread(road_mask_pattern.format(tile_idx), cv2.IMREAD_GRAYSCALE)
            )
            self.keypoint_masks.append(
                cv2.imread(keypoint_mask_pattern.format(tile_idx), cv2.IMREAD_GRAYSCALE)
            )
            self.graph_label_generators.append(
                GraphLabelGenerator(config, gt_graph_adj, coord_transform)
            )

        self.sample_min = self.SAMPLE_MARGIN
        self.sample_max = self.IMAGE_SIZE - (config.PATCH_SIZE + self.SAMPLE_MARGIN)

        if not is_train:
            eval_patches_per_edge = math.ceil(
                (self.IMAGE_SIZE - 2 * self.SAMPLE_MARGIN) / config.PATCH_SIZE
            )
            self.eval_patches = []
            for i in range(len(self.rgbs)):
                self.eval_patches += get_patch_info_one_img(
                    i, self.IMAGE_SIZE, self.SAMPLE_MARGIN, config.PATCH_SIZE,
                    eval_patches_per_edge,
                )

    def __len__(self):
        if self.is_train:
            # Virtual epoch ~17x total train pixels (reference: dataset.py:392-398)
            if self.config.DATASET == "cityscale":
                return max(1, int(self.IMAGE_SIZE / self.config.PATCH_SIZE)) ** 2 * 2500
            return 84667
        return len(self.eval_patches)

    def sample(self, idx: int, rng: np.random.Generator | None = None) -> dict:
        """One training/eval example as a dict of numpy arrays
        (reference: dataset.py:402-445)."""
        if rng is None:
            rng = np.random.default_rng()
        cfg = self.config
        if self.is_train:
            img_idx = int(rng.integers(0, len(self.rgbs)))
            begin_x = int(rng.integers(self.sample_min, self.sample_max + 1))
            begin_y = int(rng.integers(self.sample_min, self.sample_max + 1))
        else:
            img_idx, (begin_x, begin_y), _ = self.eval_patches[idx]
        end_x = begin_x + cfg.PATCH_SIZE
        end_y = begin_y + cfg.PATCH_SIZE

        rgb_patch = self.rgbs[img_idx][begin_y:end_y, begin_x:end_x, :]
        kp_patch = self.keypoint_masks[img_idx][begin_y:end_y, begin_x:end_x]
        road_patch = self.road_masks[img_idx][begin_y:end_y, begin_x:end_x]

        rot_index = 0
        if self.is_train:
            rot_index = int(rng.integers(0, 4))
            rgb_patch = np.rot90(rgb_patch, rot_index, (0, 1)).copy()
            kp_patch = np.rot90(kp_patch, rot_index, (0, 1)).copy()
            road_patch = np.rot90(road_patch, rot_index, (0, 1)).copy()

        patch = ((begin_x, begin_y), (end_x, end_y))
        graph_points, topo_samples = self.graph_label_generators[img_idx].sample_patch(
            patch, rot_index, rng
        )
        pairs, connected, valid = zip(*topo_samples)
        return {
            "rgb": rgb_patch.astype(np.float32),
            "keypoint_mask": kp_patch.astype(np.float32) / 255.0,
            "road_mask": road_patch.astype(np.float32) / 255.0,
            "graph_points": np.asarray(graph_points, np.float32),
            "pairs": np.asarray(pairs, np.int32),
            "connected": np.asarray(connected, bool),
            "valid": np.asarray(valid, bool),
        }


def collate_batch(samples, point_bucket: int = 128) -> dict:
    """Pad ragged graph_points to a bucketed max and stack
    (reference: dataset.py:287-302, with bucketing for XLA shape reuse).

    rgb and masks ship as uint8 — an EXACT encoding (rgb values are integer
    0-255; masks are binary PNGs sampled as v/255) that cuts host->device
    batch bytes 4x vs fp32 (~85 MB -> ~21 MB at B=16/512px, which is the
    difference between a fed and a starved chip on a ~100 MB/s host link).
    The jitted train/eval steps rematerialize floats on device."""
    max_pts = max(s["graph_points"].shape[0] for s in samples)
    padded_len = max(point_bucket, ((max_pts + point_bucket - 1) // point_bucket) * point_bucket)
    out = {}
    for key in samples[0]:
        if key == "graph_points":
            arrs = []
            for s in samples:
                x = s[key]
                pad = padded_len - x.shape[0]
                arrs.append(np.pad(x, ((0, pad), (0, 0))))
            out[key] = np.stack(arrs, axis=0)
        elif key == "rgb":
            out[key] = np.stack([s[key] for s in samples], axis=0).astype(np.uint8)
        elif key in ("keypoint_mask", "road_mask"):
            out[key] = np.stack(
                [np.round(s[key] * 255.0) for s in samples], axis=0
            ).astype(np.uint8)
        else:
            out[key] = np.stack([s[key] for s in samples], axis=0)
    return out


class BatchLoader:
    """Thread-prefetched batch iterator over a SatMapDataset.

    Training uses `num_workers` producer threads (label generation is
    numpy-dominated, so threads scale despite the GIL); evaluation keeps a
    single producer so the deterministic patch order is preserved."""

    def __init__(self, dataset: SatMapDataset, batch_size: int, seed: int = 0,
                 point_bucket: int = 128, prefetch: int = 4,
                 num_batches: int | None = None, num_workers: int = 2,
                 process_index: int = 0, process_count: int = 1):
        """process_index/process_count shard the input pipeline across hosts
        (multi-host DCN data loading, SURVEY §5: each host feeds its own
        chips; no cross-host traffic). Training hosts draw independent
        random streams (disjoint seeds); evaluation hosts take a strided,
        disjoint slice of the deterministic patch order."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed + 7919 * process_index
        self.point_bucket = point_bucket
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers) if dataset.is_train else 1
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))
        # this host's share of the deterministic eval order (train sampling
        # is random, so the slice concept applies to eval only)
        self._eval_slice_len = len(
            range(self.process_index, len(dataset), self.process_count)
        )
        if num_batches is None:
            if dataset.is_train:
                num_batches = len(dataset) // batch_size
            else:
                # cover exactly this host's slice (ceil), so hosts stay
                # disjoint — a global count ceil-divided by hosts would wrap
                # short slices back to their first patches
                num_batches = max(
                    1, (self._eval_slice_len + batch_size - 1) // batch_size
                )
        self.num_batches = num_batches

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        batch_counter = iter(range(self.num_batches))
        counter_lock = threading.Lock()

        order = None
        if not self.dataset.is_train:
            # strided host shard of the deterministic eval order: host p
            # evaluates patches p, p+P, p+2P, ... (disjoint, union-complete)
            order = np.arange(len(self.dataset))[
                self.process_index :: self.process_count
            ]

        def worker(wid: int):
            rng = np.random.default_rng(self.seed + 1000003 * wid)
            try:
                while not stop.is_set():
                    with counter_lock:
                        bi = next(batch_counter, None)
                    if bi is None:
                        q.put(None)
                        return
                    samples = []
                    weights = np.ones((self.batch_size,), np.float32)
                    for i in range(self.batch_size):
                        if order is None:
                            idx = 0
                        else:
                            g = bi * self.batch_size + i
                            if g < len(order):
                                idx = int(order[g])
                            else:
                                # ragged final batch: pad by REPEATING the
                                # last patch at weight 0 so the jitted eval
                                # step keeps its shape but each patch is
                                # counted exactly once (the reference's grid
                                # is exact, reference: dataset.py:384-390)
                                idx = int(order[-1])
                                weights[i] = 0.0
                        samples.append(self.dataset.sample(idx, rng))
                    batch = collate_batch(samples, self.point_bucket)
                    if order is not None:
                        batch["sample_weight"] = weights
                    q.put(batch)
            except BaseException as e:  # propagate instead of hanging the consumer
                q.put(e)

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        finished = 0
        produced = 0
        try:
            while finished < self.num_workers and produced < self.num_batches:
                batch = q.get()
                if batch is None:
                    finished += 1
                    continue
                if isinstance(batch, BaseException):
                    # a producer died — fail loudly, don't block forever
                    raise batch
                produced += 1
                yield batch
        finally:
            stop.set()
