"""Detector: backbone -> FPN -> heads wiring, loss, and prediction.

TPU-native counterpart of the reference's ``src/detector.py`` (SURVEY.md §2
"Detector (core)" row). The reference's class builds a TF-1 graph; here the
model is a pure flax module and ``Detector`` is a thin functional wrapper:

  * ``model.apply(variables, images)`` -> ``(class_logits (N, A, C),
    box_deltas (N, A, 4))`` — raw per-anchor outputs;
  * ``Detector.loss`` builds matched targets + focal/smooth-L1 losses;
  * ``Detector.predict`` decodes, clips, and runs class-wise NMS, returning
    the reference's public contract
    ``{boxes, scores, labels, num_boxes}`` at static shapes.

Everything is jit-compatible; anchors are a trace-time constant per
(image_size, anchor config).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import Config
from ssd_tpu.models.fpn import FPN, RetinaHead
from ssd_tpu.models.layers import space_to_depth
from ssd_tpu.models.mobilenet import MobileNetV1
from ssd_tpu.models.resnet import ResNet50
from ssd_tpu.models.shufflenet import ShuffleNetV2
from ssd_tpu.ops import losses
from ssd_tpu.ops.nms import Detections
from ssd_tpu.ops.targets import create_targets

# ImageNet normalization (images arrive as uint8 RGB). Owned by
# constants.py so stems can fold the affine into their first conv
# (models/mobilenet._FoldedS2DConv); re-exported here for compatibility.
from ssd_tpu.constants import MEAN_RGB, STD_RGB  # noqa: E402,F401


def normalize_images(images_uint8: jnp.ndarray,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 NHWC -> normalized compute-dtype NHWC.

    Runs on-device so the host ships 1 byte/pixel (4x less PCIe/DMA traffic
    than feeding float32), per SURVEY.md §7 "Input" design note.
    """
    x = images_uint8.astype(jnp.float32)
    x = (x - MEAN_RGB) / STD_RGB
    return x.astype(compute_dtype)


def build_backbone(cfg: Config, fold_normalize: bool = False) -> nn.Module:
    m = cfg.model
    if fold_normalize and m.stem_schedule != "dense4":
        raise ValueError("fold_normalize is a dense4-stem lowering")
    if (m.compute_dtype == "int8" and m.backbone != "mobilenet"
            and not m.int8_neck):
        raise ValueError(
            "uncalibrated int8 relies on ReLU6-bounded activations; only "
            "the mobilenet backbone supports it. Other backbones need a "
            "calibrated artifact: set model.int8_neck=true and run "
            "python -m ssd_tpu.quant")
    stem_stride = 1 if m.stem_space_to_depth else 2
    if m.stem_schedule != "reference" and m.backbone != "mobilenet":
        raise ValueError(
            f"stem_schedule={m.stem_schedule!r} is mobilenet-v1 only")
    if m.stem_schedule == "dense4" and m.stem_space_to_depth:
        raise ValueError(
            "stem_schedule='dense4' already space-to-depth-packs the stem; "
            "stem_space_to_depth must stay False")
    if m.backbone == "mobilenet":
        return MobileNetV1(m.width_multiplier, m.compute_dtype,
                           m.bn_momentum, m.norm, stem_stride,
                           remat_early=m.remat_early,
                           stem_schedule=m.stem_schedule,
                           stem_fold_normalize=fold_normalize,
                           name="backbone")
    if m.backbone == "mobilenet_v2":
        from ssd_tpu.models.mobilenet_v2 import MobileNetV2
        return MobileNetV2(m.width_multiplier, m.compute_dtype,
                           m.bn_momentum, m.norm, stem_stride,
                           name="backbone")
    if m.backbone == "efficientnet_lite":
        from ssd_tpu.models.efficientnet import EfficientNetLite
        return EfficientNetLite(m.width_multiplier, m.compute_dtype,
                                m.bn_momentum, m.norm, stem_stride,
                                name="backbone")
    if m.backbone == "shufflenet":
        return ShuffleNetV2(m.width_multiplier, m.compute_dtype,
                            m.bn_momentum, m.norm, stem_stride,
                            name="backbone")
    if m.backbone == "resnet50":
        return ResNet50(m.compute_dtype, m.bn_momentum, m.norm, stem_stride,
                        name="backbone")
    raise ValueError(f"unknown backbone: {m.backbone}")




class SSDModel(nn.Module):
    """backbone + FPN + shared subnets. Input: normalized NHWC images."""

    cfg: Config

    @nn.compact
    def __call__(self, images, train: bool = False, flatten: bool = True,
                 trunk_only: bool = False, raw_input: bool = False):
        cfg = self.cfg
        # raw_input: ``images`` is the raw uint8 batch and normalization is
        # this model's job. With the dense4 stem (bf16/f32) the affine is
        # folded into the stem conv's weights so the full-resolution
        # normalized image never materializes (saved a ~0.6 ms relayout
        # copy + halved the stem conv's input bytes at b32/640, round-4
        # trace); every other path normalizes inline, same as callers that
        # pre-normalize.
        fold = raw_input and cfg.model.stem_schedule == "dense4"
        if raw_input and not fold:
            # Always bf16, matching the historical pre-raw_input behavior
            # (callers normalized with the default dtype): f32 models still
            # get bf16-rounded pixels — their convs upcast — keeping
            # DP-vs-TP numerics unchanged (test_channel_tp_matches_replicated
            # is calibrated to that input rounding).
            images = normalize_images(images)
        if cfg.model.stem_space_to_depth:
            # The backbone's stride-2 stem then sees a (S/2, S/2, 12)
            # input and runs stride 1 — same receptive field, MXU-dense.
            images = space_to_depth(images, 2)
        # dense4 (cfg.model.stem_schedule) takes the RAW normalized image:
        # its space-to-depth(4) packing is folded into the stem conv's
        # lowering inside the backbone (models/mobilenet.Dense4Stem), so
        # no full-image reshape/transpose chain ever materializes.
        feats = build_backbone(cfg, fold_normalize=fold)(images, train)
        # int8 without int8_neck is backbone-only: FPN/head activations
        # are unbounded sums, so absent calibrated scales they run bf16.
        # With int8_neck (calibrated artifact, ssd_tpu/quant.py) the whole
        # serve path is quantized — the head is where the FLOPs are.
        neck_dtype = cfg.model.compute_dtype
        if cfg.model.compute_dtype == "int8" and not cfg.model.int8_neck:
            neck_dtype = "bfloat16"
        pyramid = FPN(cfg.model.fpn_channels, neck_dtype,
                      name="fpn")(feats, train)
        head_channels = cfg.model.head_channels or cfg.model.fpn_channels
        return RetinaHead(
            num_classes=cfg.num_classes,
            anchors_per_cell=cfg.anchors.num_anchors_per_cell,
            depth=cfg.model.head_depth,
            channels=head_channels,
            compute_dtype=neck_dtype,
            final_kernel=cfg.model.head_final_kernel,
            name="head",
        )(pyramid, flatten=flatten, trunk_only=trunk_only, train=train)


class Detector:
    """Functional front-end bundling config, model, and anchors."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.model = SSDModel(cfg)
        from ssd_tpu.ops.anchors import generate_anchors
        self.anchors = jnp.asarray(generate_anchors(cfg.image_size, cfg.anchors))
        assert self.anchors.shape[0] == cfg.num_anchors()

    # ------------------------------------------------------------------ init

    def init(self, rng: jax.Array) -> dict:
        ih, iw = self.cfg.image_hw()
        images = jnp.zeros((1, ih, iw, 3), jnp.bfloat16)
        return self.model.init(rng, images, train=False)

    # ------------------------------------------------------------- forward

    def apply(self, variables: dict, images: jnp.ndarray, train: bool = False,
              mutable: Any = False):
        return self.model.apply(variables, images, train=train, mutable=mutable)

    # ---------------------------------------------------------------- loss

    def loss(self, variables: dict, batch: dict, train: bool = True,
             teacher=None):
        """Full training loss for a batch.

        ``batch``: ``images`` uint8 (N, S, S, 3); ``boxes`` (N, M, 4);
        ``labels`` (N, M) int32; ``num_boxes`` (N,) int32.
        ``teacher``: optional ``(model, variables)`` of a trained teacher
        with identical head geometry — adds the distillation term
        (ops/distill.py) scaled by ``cfg.train.distill_weight``.
        Returns ``(loss, (metrics, new_model_state))``.
        """
        cfg = self.cfg
        images = batch["images"]
        # OHEM ranks per-anchor losses, which the per-level path never
        # materializes — it falls back to the flat (N, A, C) loss.
        per_level = cfg.losses.per_level and not cfg.losses.use_ohem
        if train:
            raw, new_state = self.model.apply(
                variables, images, train=True, mutable=["batch_stats"],
                flatten=not per_level, raw_input=True,
            )
        else:
            raw = self.model.apply(variables, images, train=False,
                                   flatten=not per_level, raw_input=True)
            new_state = {}

        targets = create_targets(
            self.anchors, batch["boxes"], batch["labels"], batch["num_boxes"],
            cfg.num_classes, cfg.matcher, class_onehot=not per_level,
        )
        if per_level:
            ld = losses.detection_loss_levels(
                raw, targets, cfg.num_classes, cfg.losses,
                anchors=self.anchors,
            )
        else:
            logits, deltas = raw
            ld = losses.detection_loss(logits, deltas, targets, cfg.losses,
                                       anchors=self.anchors)
        reg = losses.l2_regularization(
            variables["params"], cfg.losses.weight_decay
        )
        total = ld.total + reg
        metrics = {
            "loss": total,
            "classification_loss": ld.classification,
            "localization_loss": ld.localization,
            "regularization_loss": reg,
            "num_positives": ld.num_positives,
        }
        if teacher is not None:
            from ssd_tpu.ops.distill import distillation_loss
            t_model, t_vars = teacher
            t_raw = t_model.apply(t_vars, images, train=False,
                                  flatten=not per_level, raw_input=True)
            dd = distillation_loss(
                raw, t_raw, cfg.num_classes,
                temperature=cfg.train.distill_temperature,
                box_weight=cfg.train.distill_box_weight,
            )
            total = total + cfg.train.distill_weight * dd.total
            metrics["loss"] = total
            metrics["distill_loss"] = dd.total
        return total, (metrics, new_state)

    # ------------------------------------------------------------- predict

    def predict(self, variables: dict, images_uint8: jnp.ndarray,
                mesh=None) -> Detections:
        """uint8 images -> NMS'd detections (the reference's public contract).

        ``mesh``: optional ``jax.sharding.Mesh`` of the serving mesh (static;
        close over it, don't trace it). With a mesh and the Pallas NMS
        enabled, suppression runs under ``shard_map`` over the data axis so
        multi-device DP serving keeps the kernel (see
        NMSConfig.use_pallas).

        Note: a per-level postprocess variant exists
        (``ops.postprocess.postprocess_pyramid`` with ``flatten=False``
        outputs) that avoids materializing the (N, A, C) logits; measured
        SLOWER on v5e at 640/80-class (930 vs 1019 img/s — XLA handles the
        relayout better than 5 masked per-level gathers), so the flat path
        stays the default.
        """
        cfg = self.cfg
        images = images_uint8
        use_pallas = nms_use_pallas(cfg.nms, mesh)
        if cfg.model.head_final_kernel == 1:
            # fused head: logits never materialize (ops/fused_head.py)
            from ssd_tpu.ops.fused_head import fused_head_detections
            cls_trunk, box_trunk = self.model.apply(
                variables, images, train=False, trunk_only=True,
                raw_input=True,
            )
            return fused_head_detections(
                cls_trunk, box_trunk, variables["params"]["head"],
                self.anchors, cfg.num_classes,
                cfg.anchors.num_anchors_per_cell, cfg.nms,
                use_pallas_nms=use_pallas,
                interpret=not _on_tpu(), mesh=mesh,
            )
        if cfg.nms.select == "cells":
            # layout-native cell-major selection: the (N, A, C) logits are
            # never materialized (see ops/postprocess.select_candidates_cells)
            from ssd_tpu.ops.postprocess import postprocess_cells
            raw = self.model.apply(variables, images, train=False,
                                   flatten=False, raw_input=True)
            return postprocess_cells(
                raw, self.anchors, cfg.num_classes, cfg.nms,
                use_pallas=use_pallas,
                interpret=not _on_tpu(), mesh=mesh,
            )
        logits, deltas = self.model.apply(variables, images, train=False,
                                          raw_input=True)
        return self.postprocess(logits, deltas, mesh=mesh)

    def postprocess(self, logits: jnp.ndarray, deltas: jnp.ndarray,
                    mesh=None) -> Detections:
        from ssd_tpu.ops.postprocess import postprocess_detections
        return postprocess_detections(
            logits, deltas, self.anchors, self.cfg.nms,
            use_pallas=nms_use_pallas(self.cfg.nms, mesh),
            interpret=not _on_tpu(), mesh=mesh,
        )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def nms_use_pallas(nms_cfg, mesh=None) -> bool:
    """Resolve NMSConfig.use_pallas ("auto" | bool) to a concrete choice.

    Mirrors the matcher's gate (ops/targets.create_targets): a Pallas call
    is an unpartitioned custom call under GSPMD, so "auto" only enables the
    kernel where that cannot replicate work — a single device, or a
    caller-provided mesh (the kernel then runs under shard_map over the
    data axis, ops/nms_pallas.batched_nms_pallas_sharded)."""
    up = getattr(nms_cfg, "use_pallas", "auto")
    if not _on_tpu():
        return False
    if up == "auto":
        return jax.device_count() == 1 or mesh is not None
    return bool(up)
