"""Training harness: parameter-group optimizer, jitted DP train step,
validation metrics, orbax checkpointing.

Replaces the reference's Lightning wiring (reference: train.py:84-104,
model.py:511-685) with: one jitted train step (loss + grads + Adam update in
a single XLA program, bf16 activations / fp32 params+opt), data-parallel
sharding over a 'dp' mesh, streaming device-side metrics, and working resume
(the reference parses --resume but never wires it, reference: train.py:26-28
vs 104 — fixed here).

Optimizer grouping mirrors reference configure_optimizers (model.py:637-685):
  encoder params      BASE_LR * ENCODER_LR_FACTOR (or frozen / LoRA-only)
  decoder + toponet   BASE_LR
  LR schedule         MultiStepLR(milestones=[9 epochs], gamma=0.1)
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sam_road_tpu.models.sam_road import SAMRoad, build_model
from sam_road_tpu.ops.losses import bce_with_logits, masked_topo_loss, sigmoid_focal_loss
from sam_road_tpu.ops.metrics import (
    binary_f1_counts,
    binary_iou_counts,
    pr_histogram,
)
from sam_road_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _param_group(path_tuple) -> str:
    """Map a param path to its optimizer group."""
    top = path_tuple[0]
    if top == "image_encoder":
        if any("linear_a_" in p or "linear_b_" in p for p in path_tuple):
            return "encoder_lora"
        return "encoder"
    if top in ("map_decoder", "sam_decoder"):
        return "decoder"
    if top == "topo_net":
        return "toponet"
    return "decoder"


def build_optimizer(config, params, steps_per_epoch: int):
    """Adam with per-group LR + MultiStepLR(milestones=[9], gamma=0.1)."""
    base_lr = float(config.BASE_LR)
    boundary = 9 * int(steps_per_epoch)

    def schedule(lr):
        return optax.piecewise_constant_schedule(lr, {boundary: 0.1})

    freeze_encoder = bool(config.FREEZE_ENCODER) or bool(config.ENCODER_LORA)
    group_tx = {
        "encoder": (
            optax.set_to_zero()
            if freeze_encoder
            else optax.adam(schedule(base_lr * float(config.ENCODER_LR_FACTOR)))
        ),
        "encoder_lora": (
            optax.adam(schedule(base_lr))
            if config.ENCODER_LORA
            else optax.set_to_zero()
        ),
        "decoder": optax.adam(schedule(base_lr)),
        "toponet": optax.adam(schedule(base_lr)),
    }
    labels = _label_tree(params)
    return optax.multi_transform(group_tx, labels)


def _label_tree(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels_flat = []
    for path, _ in flat:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        labels_flat.append(_param_group(keys))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels_flat)



def _materialize_batch(batch):
    """Device-side decode of the loader's compact batch encoding: rgb uint8
    -> f32 0-255, masks uint8 -> f32 0-1 (collate_batch ships uint8 to cut
    host-link bytes 4x; float batches pass through unchanged so synthetic
    callers keep working)."""
    b = dict(batch)
    if batch["rgb"].dtype == jnp.uint8:
        b["rgb"] = batch["rgb"].astype(jnp.float32)
    for k in ("keypoint_mask", "road_mask"):
        if batch[k].dtype == jnp.uint8:
            b[k] = batch[k].astype(jnp.float32) / 255.0
    return b


def _fused_forward(spec, params, rgb, graph_points, pairs, valid,
                   dropout_rng, remat=True, deterministic=False):
    """SAMRoad.__call__ with the encoder routed through the differentiable
    fused-kernel forward (models/fast_encoder.py, custom_vjp ops): identical
    math to the flax module — grad parity tested in tests/test_fused_train.py
    — at fewer HBM round-trips per block. The decoder and TopoNet stay flax
    applies on their param subtrees (they are a tiny share of step time)."""
    from sam_road_tpu.models.decoder import MapDecoder
    from sam_road_tpu.models.fast_encoder import encoder_forward_fused
    from sam_road_tpu.models.sam_road import PIXEL_MEAN, PIXEL_STD
    from sam_road_tpu.models.toponet import TopoNet
    from sam_road_tpu.ops.sampling import bilinear_sample_points

    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(PIXEL_STD, jnp.float32)
    x = ((rgb.astype(jnp.float32) - mean) / std).astype(spec.dtype)
    emb = encoder_forward_fused(
        params["image_encoder"], x, sam_version=spec.sam_version,
        img_size=spec.patch_size, dtype=spec.dtype,
        differentiable=True, remat=remat,
    )
    mask_logits = MapDecoder(dtype=spec.dtype).apply(
        {"params": params["map_decoder"]}, emb
    )
    mask_scores = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    point_features = bilinear_sample_points(emb, graph_points, spec.patch_size)
    topo_logits, topo_scores = TopoNet(
        feature_dim=256, version=spec.toponet_version, dtype=spec.dtype,
    ).apply(
        {"params": params["topo_net"]}, graph_points, point_features, pairs,
        valid, deterministic=deterministic,
        rngs=None if deterministic else {"dropout": dropout_rng},
    )
    return (mask_logits.astype(jnp.float32), mask_scores,
            topo_logits.astype(jnp.float32), topo_scores)


def make_train_step(config) -> Callable:
    """One jitted optimization step: forward, losses, grads, Adam update.

    Non-finite guard: the reference drops into pdb when the loss goes NaN
    (reference: model.py:526-533); a jitted TPU loop can't stop the program
    mid-step, so instead any step with a non-finite loss or gradient leaves
    params/opt-state untouched and reports aux["skipped"]=1 for the host loop
    to count. Optional gradient clipping via config.GRAD_CLIP_NORM (off when
    0/unset — the reference has no clipping)."""
    model = build_model(config)
    use_focal = bool(config.FOCAL_LOSS)
    clip_norm = float(config.GRAD_CLIP_NORM or 0.0)
    fused_train = bool(config.FUSED_ENCODER_TRAIN)
    if fused_train:
        if model.spec.use_sam_decoder:
            raise ValueError("FUSED_ENCODER_TRAIN requires the naive map "
                             "decoder (USE_SAM_DECODER must be off)")
        if model.spec.lora_rank:
            raise ValueError("FUSED_ENCODER_TRAIN does not support "
                             "ENCODER_LORA (the fused forward consumes the "
                             "plain SAM param tree)")
        forward = partial(_fused_forward, model.spec,
                          remat=bool(config.REMAT_ENCODER))

    def loss_fn(params, batch, dropout_rng):
        batch = _materialize_batch(batch)
        if fused_train:
            mask_logits, mask_scores, topo_logits, topo_scores = forward(
                params, batch["rgb"], batch["graph_points"], batch["pairs"],
                batch["valid"], dropout_rng,
            )
        else:
            mask_logits, mask_scores, topo_logits, topo_scores = model.apply(
                {"params": params},
                batch["rgb"],
                batch["graph_points"],
                batch["pairs"],
                batch["valid"],
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
        gt_masks = jnp.stack([batch["keypoint_mask"], batch["road_mask"]], axis=3)
        if use_focal:
            mask_loss = sigmoid_focal_loss(mask_logits, gt_masks)
        else:
            mask_loss = bce_with_logits(mask_logits, gt_masks)
        topo_loss = masked_topo_loss(topo_logits, batch["connected"], batch["valid"])
        loss = mask_loss + topo_loss
        return loss, {"mask_loss": mask_loss, "topo_loss": topo_loss, "loss": loss}

    def train_step(state: TrainState, batch, dropout_rng, tx):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, batch, dropout_rng)
        grad_norm = optax.global_norm(grads)
        if clip_norm > 0.0:
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(grad_norm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        finite = jnp.isfinite(aux["loss"]) & jnp.isfinite(grad_norm)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # select old vs new wholesale: NaN grads poison opt moments too
        new_params = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params
        )
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_opt_state, state.opt_state
        )
        aux = dict(aux)
        aux["grad_norm"] = grad_norm
        aux["skipped"] = 1.0 - finite.astype(jnp.float32)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
            aux,
        )

    return train_step


def make_eval_step(config) -> Callable:
    """Jitted validation step returning loss + streaming metric counts
    (reference: model.py:547-600)."""
    model = build_model(config)
    use_focal = bool(config.FOCAL_LOSS)

    @jax.jit
    def eval_step(params, batch):
        batch = _materialize_batch(batch)
        # Per-sample validity weights: ragged final eval batches arrive
        # padded with repeated samples at weight 0 (data/dataset.py), so
        # every patch contributes to the streaming sums exactly once — the
        # reference evaluates an exact deterministic grid (reference:
        # dataset.py:384-390) and never double-counts.
        w = batch.get("sample_weight")
        if w is None:
            w = jnp.ones((batch["rgb"].shape[0],), jnp.float32)
        w = w.astype(jnp.float32)
        w_pix = w[:, None, None, None]
        mask_logits, mask_scores, topo_logits, topo_scores = model.apply(
            {"params": params},
            batch["rgb"],
            batch["graph_points"],
            batch["pairs"],
            batch["valid"],
            deterministic=True,
        )
        gt_masks = jnp.stack([batch["keypoint_mask"], batch["road_mask"]], axis=3)
        if use_focal:
            mask_el = sigmoid_focal_loss(mask_logits, gt_masks, reduction="none")
        else:
            mask_el = bce_with_logits(mask_logits, gt_masks, reduction="none")
        per_sample_el = float(np.prod(mask_el.shape[1:]))
        mask_loss = (mask_el * w_pix).sum() / jnp.maximum(
            w.sum() * per_sample_el, 1.0
        )
        topo_valid = jnp.logical_and(batch["valid"], (w > 0.0)[:, None, None])
        topo_loss = masked_topo_loss(topo_logits, batch["connected"], topo_valid)

        kp_i, kp_u = binary_iou_counts(
            mask_scores[..., 0], batch["keypoint_mask"], weights=w_pix[..., 0]
        )
        rd_i, rd_u = binary_iou_counts(
            mask_scores[..., 1], batch["road_mask"], weights=w_pix[..., 0]
        )
        valid_i = topo_valid.astype(jnp.int32)
        topo_gt = (1 - valid_i) * -1 + valid_i * batch["connected"].astype(jnp.int32)
        tp, fp, fn = binary_f1_counts(topo_scores[..., 0], topo_gt)
        # PR histograms for threshold calibration (reference: model.py:602-617)
        kp_pos, kp_neg = pr_histogram(
            mask_scores[..., 0], (batch["keypoint_mask"] >= 0.5).astype(jnp.int32),
            weights=w_pix[..., 0],
        )
        rd_pos, rd_neg = pr_histogram(
            mask_scores[..., 1], (batch["road_mask"] >= 0.5).astype(jnp.int32),
            weights=w_pix[..., 0],
        )
        tp_pos, tp_neg = pr_histogram(topo_scores[..., 0], topo_gt)
        return {
            "mask_loss": mask_loss,
            "topo_loss": topo_loss,
            "loss": mask_loss + topo_loss,
            "weight": w.sum(),
            "kp_iou": jnp.stack([kp_i, kp_u]),
            "road_iou": jnp.stack([rd_i, rd_u]),
            "topo_f1": jnp.stack([tp, fp, fn]),
            "kp_pr": jnp.stack([kp_pos, kp_neg]),
            "road_pr": jnp.stack([rd_pos, rd_neg]),
            "topo_pr": jnp.stack([tp_pos, tp_neg]),
        }

    return eval_step


@dataclasses.dataclass
class Trainer:
    """Epoch loop + checkpoints + logging. Single-controller JAX: params are
    replicated over the dp mesh, batches shard on the leading axis."""

    config: Any
    params: Any
    output_dir: str
    steps_per_epoch: int
    log_every: int = 50
    mesh: Any = None
    logger: Any = None  # MetricsLogger-compatible (optional)

    def __post_init__(self):
        cfg = self.config
        self.mesh = self.mesh or make_mesh(int(cfg.DP_SHARDS or 0))
        self.tx = build_optimizer(cfg, self.params, self.steps_per_epoch)
        rep = replicated_sharding(self.mesh)
        self.params = jax.device_put(self.params, rep)
        opt_state = jax.device_put(self.tx.init(self.params), rep)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=self.params, opt_state=opt_state
        )
        raw_step = make_train_step(cfg)
        self._train_step = jax.jit(
            partial(raw_step, tx=self.tx), donate_argnums=(0,)
        )
        self._eval_step = make_eval_step(cfg)
        self._rng = jax.random.PRNGKey(0)
        self.history: list = []

    def train_epoch(self, loader, epoch: int):
        logs = []
        for i, batch in enumerate(loader):
            batch = shard_batch(self.mesh, batch)
            self._rng, dropout_rng = jax.random.split(self._rng)
            self.state, aux = self._train_step(self.state, batch, dropout_rng)
            if i % self.log_every == 0:
                aux = {k: float(v) for k, v in aux.items()}
                aux.update(epoch=epoch, batch=i)
                logs.append(aux)
                if self.logger is not None:
                    self.logger.log(
                        {f"train_{k}": v for k, v in aux.items()},
                        step=int(self.state.step),
                    )
                print(
                    f"epoch {epoch} step {i}/{len(loader)} "
                    f"loss {aux['loss']:.4f} mask {aux['mask_loss']:.4f} "
                    f"topo {aux['topo_loss']:.4f}",
                    flush=True,
                )
        self.history.extend(logs)
        return logs

    def validate(self, loader, epoch: int | None = None, viz_count: int = 0):
        """Streaming validation metrics; with viz_count > 0, also writes
        pred-vs-GT mask panels for the first batch into
        <output_dir>/val_viz (reference: model.py:571-581 logs wandb image
        tables per val epoch)."""
        total = None
        n = 0
        for batch in loader:
            batch = shard_batch(self.mesh, batch)
            out = self._eval_step(self.state.params, batch)
            out = jax.tree.map(np.asarray, out)
            if n == 0 and viz_count > 0:
                self._save_val_viz(batch, epoch or 0, viz_count)
            total = _accumulate_eval(total, out)
            n += 1
        if total is None:
            return {}
        return _finish_eval_metrics(total)

    def _save_val_viz(self, batch, epoch: int, count: int):
        from sam_road_tpu.models.sam_road import SAMRoad
        from sam_road_tpu.utils.viz import save_val_visualizations

        if not hasattr(self, "_mask_scores_fn"):
            model = build_model(self.config)
            self._mask_scores_fn = jax.jit(
                lambda p, rgb: model.apply(
                    {"params": p}, rgb, method=SAMRoad.infer_masks_and_features
                )[0]
            )
        scores = self._mask_scores_fn(
            self.state.params, jnp.asarray(batch["rgb"], jnp.float32)
        )
        paths = save_val_visualizations(
            os.path.join(self.output_dir, "val_viz"), epoch, batch, scores,
            count=count,
        )
        if self.logger is not None:
            self.logger.log_images("val_masks", paths, step=int(self.state.step))
        return paths

    def save_checkpoint(self, epoch: int):
        """Save the FULL train state (params + optimizer moments + step) so
        --resume continues exactly (the reference parses --resume but never
        wires it, reference: train.py:26-28,104)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.output_dir, f"ckpt_epoch_{epoch}"))
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "epoch": epoch,
        }
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        return path

    def restore(self, path: str) -> int:
        """Restore a full train state; returns the next epoch to run.

        Restores against the live state as the target pytree so optax's
        named-tuple opt-state structures are reconstituted by orbax itself
        (leaf-order unflattening would silently mispair leaves if optax ever
        reorders its state)."""
        import orbax.checkpoint as ocp

        target = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
            "epoch": 0,
        }
        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path), target)
        rep = replicated_sharding(self.mesh)
        self.state = TrainState(
            step=jnp.asarray(int(restored["step"]), jnp.int32),
            params=jax.device_put(restored["params"], rep),
            opt_state=jax.device_put(restored["opt_state"], rep),
        )
        return int(restored["epoch"]) + 1


def _accumulate_eval(total, out):
    """Fold one eval_step result into the streaming totals: losses are
    weighted by the batch's valid-sample count so padded final batches do
    not bias the averages; count tensors add directly."""
    w = float(out["weight"])
    out = dict(out)
    for key in ("loss", "mask_loss", "topo_loss"):
        out[key] = np.asarray(float(out[key]) * w)
    if total is None:
        return out
    return jax.tree.map(np.add, total, out)


def _finish_eval_metrics(total):
    """Totals -> metric dict, summing across hosts first on multi-process
    runs (each host evaluates a disjoint slice of the patch grid, so the
    global metric is the sum of per-host streaming counts)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(total)
        total = jax.tree.map(lambda x: np.sum(x, axis=0), gathered)
    w = max(float(total["weight"]), 1.0)
    metrics = {
        "val_loss": float(total["loss"]) / w,
        "val_mask_loss": float(total["mask_loss"]) / w,
        "val_topo_loss": float(total["topo_loss"]) / w,
        "keypoint_iou": float(total["kp_iou"][0] / max(total["kp_iou"][1], 1)),
        "road_iou": float(total["road_iou"][0] / max(total["road_iou"][1], 1)),
        "val_samples": w,
    }
    tp, fp, fn = total["topo_f1"]
    metrics["topo_f1"] = float(2 * tp / max(2 * tp + fp + fn, 1))
    metrics["_pr_histograms"] = {
        "keypoint": total["kp_pr"],
        "road": total["road_pr"],
        "topo": total["topo_pr"],
    }
    return metrics


def run_validation(config, params, loader):
    """Standalone validation/calibration pass (no optimizer state) — the
    test CLI path (reference: test.py) only needs the eval step."""
    eval_step = make_eval_step(config)
    params = jax.device_put(params)
    total = None
    for batch in loader:
        out = eval_step(params, {k: jnp.asarray(v) for k, v in batch.items()})
        out = jax.tree.map(np.asarray, out)
        total = _accumulate_eval(total, out)
    if total is None:
        return {}
    return _finish_eval_metrics(total)


def load_checkpoint(path: str, init_params=None):
    """Restore params from a Trainer checkpoint (full-state or legacy
    params-only layout). When init_params is given, the restored tree is
    validated against the model's parameter structure so a wrong-model
    checkpoint fails here with a clear error instead of at first apply."""
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    if isinstance(restored, dict) and "params" in restored and "step" in restored:
        restored = restored["params"]
    if init_params is not None:
        want = jax.tree_util.tree_structure(init_params)
        got = jax.tree_util.tree_structure(restored)
        if want != got:
            raise ValueError(
                f"checkpoint at {path} does not match the model's parameter "
                f"tree (checkpoint: {got}, model: {want})"
            )
    return restored
