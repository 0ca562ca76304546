"""Declarative configuration for the whole framework.

The reference drives everything from a single ``config.json`` passed to
``tf.estimator`` as ``params`` (SURVEY.md §2 "Config" row). We keep the same
single-source-of-truth shape, but as typed dataclasses: every static shape in
the compiled program (image size, anchor count, padded ground-truth count,
NMS output size) is a pure function of one ``Config`` instance, so each
(resolution, batch) pair compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Sequence


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """RetinaNet-style dense anchor grid over FPN levels.

    Per level ``l`` (stride ``2**l``), anchors at every cell:
    ``scales_per_octave`` octave scales x ``aspect_ratios``, with base size
    ``anchor_scale * stride``.
    """

    min_level: int = 3
    max_level: int = 7
    anchor_scale: float = 4.0
    scales_per_octave: int = 3
    aspect_ratios: Sequence[float] = (1.0, 2.0, 0.5)

    @property
    def num_anchors_per_cell(self) -> int:
        return self.scales_per_octave * len(self.aspect_ratios)

    @property
    def strides(self) -> tuple[int, ...]:
        return tuple(2 ** l for l in range(self.min_level, self.max_level + 1))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    backbone: str = "mobilenet"  # mobilenet | mobilenet_v2 | efficientnet_lite
    #                            # | shufflenet | resnet50
    width_multiplier: float = 1.0  # for mobilenet/shufflenet
    fpn_channels: int = 128
    head_depth: int = 4  # number of 3x3 convs in each subnet
    head_channels: int = 0  # 0 -> same as fpn_channels
    # Final prediction-conv kernel size. 3 = RetinaNet standard. 1 makes the
    # prediction a pure per-cell matmul, enabling the fused Pallas
    # logits+max head at inference (ops/fused_head.py) — the (N, A, C)
    # logits are never materialized.
    head_final_kernel: int = 3
    # Conv compute dtype: bfloat16 | float32 | int8.
    # int8 alone quantizes the BACKBONE's dense convs (calibration-free:
    # ReLU6 bounds every activation). Combined with ``int8_neck`` it
    # quantizes the FPN + head too — where the FLOPs are — using
    # calibrated activation scales (python -m ssd_tpu.quant). Training
    # always runs bf16 regardless; int8 is an inference lowering of the
    # same f32 parameter tree.
    compute_dtype: str = "bfloat16"
    # Quantize the FPN and head subnets as well (requires a CALIBRATED
    # artifact: their conv inputs are unbounded sums, so static bounds
    # don't apply — see ssd_tpu/quant.py and the round-4 BENCHMARKS entry).
    int8_neck: bool = False
    norm: str = "batch"  # batch | group
    bn_momentum: float = 0.997  # lower (e.g. 0.9) for short runs/tests
    # Space-to-depth stem: rearrange the 2x2-strided stem conv input as a
    # depth-16 tensor so the first conv runs dense on the MXU instead of
    # spatially-strided on a 3-channel input (classic TPU detection trick).
    stem_space_to_depth: bool = False
    # Remat the early (high-res, narrow, lane-padded) backbone stack in
    # training: "none" | "blocks" | "stack" (mobilenet-v1 only; see
    # models/mobilenet.py and BENCHMARKS.md round-3 measurement).
    remat_early: str = "none"
    # Early-backbone schedule (mobilenet-v1 only):
    #   "reference" — the standard MobileNet table: stem s2 -> 32ch @ /2,
    #                 ds1 -> 64ch @ /2, ds2 s2 -> 128ch @ /4. On TPU the
    #                 32/64-channel high-resolution activations are stored
    #                 lane-padded to 128 (2-4x HBM inflation) — a measured
    #                 ~34 ms/step tax at b32/640 that remat cannot remove
    #                 (it is traffic, not residency; BENCHMARKS.md round 3).
    #   "dense4"    — TPU-native: space-to-depth(4) packs the image to
    #                 (H/4, W/4, 48), then one dense 3x3 conv goes straight
    #                 to 128 lane-aligned channels at stride 4. No <=64-ch
    #                 activation ever exists above stride 4; the /2 features
    #                 were never consumed (FPN starts at stride 8). A
    #                 different architecture (not a reference-parity mode):
    #                 checkpoints are incompatible with "reference".
    stem_schedule: str = "reference"


@dataclasses.dataclass(frozen=True)
class LossConfig:
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_delta: float = 1.0
    # localization loss: smooth_l1 (reference recipe, encoded-delta space)
    # | giou | diou | ciou (decoded-box geometric losses)
    box_loss: str = "smooth_l1"
    localization_weight: float = 1.0
    classification_weight: float = 1.0
    weight_decay: float = 1e-4
    # Optional online hard example mining (the reference carries an OHEM
    # variant alongside focal loss; focal is the default).
    use_ohem: bool = False
    ohem_neg_ratio: float = 3.0
    ohem_min_negatives: int = 16
    # Compute the loss per pyramid level in the head's conv-native layout
    # (losses.detection_loss_levels) instead of over the concatenated
    # (N, A, C) logits: same loss, but skips ~11 ms/step of concat/relayout
    # glue at b32/640 (BENCHMARKS.md round-2 training trace).
    per_level: bool = True


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    matching_threshold: float = 0.5
    negative_threshold: float = 0.4
    force_match_for_each_gt: bool = True
    # Matching backend: the single-pass Pallas kernel (IoU computed once
    # for both argmax directions — ops/matching_pallas.py) vs the jnp
    # matcher (XLA recomputes the (N, A, M) IoU inside both reduction
    # fusions). The transposed (lane-aligned-output) kernel wins the full
    # train step on a single chip (+3.6% at b32/640, BENCHMARKS.md round
    # 3); under a multi-device mesh it is an unpartitioned custom call, so
    # "auto" (default) enables it only on TPU with ONE device and falls
    # back to the jnp matcher everywhere else. True forces it on TPU of
    # any device count; False always uses the jnp matcher.
    use_pallas: bool | str = "auto"


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    score_threshold: float = 0.05
    iou_threshold: float = 0.5
    max_boxes: int = 100  # final padded detections per image
    # Global top-Q anchors kept before class-wise NMS. The dense-scene
    # stress benchmark (30-80 objects/image — tools/crowded_validation.py;
    # BENCHMARKS.md round-3 table) showed that with select="cells" the
    # recall limit is Q/K CELLS, not Q anchors: single-stage q=1024 (114
    # cells at 640px) loses 0.027 mAP on crowded scenes. The default is
    # q=1024 with cell_overprovision=2.0 (below): oracle-parity mAP
    # (-0.0004) at 1256 img/s b32/640 — the best point on the measured
    # speed/accuracy frontier (single-stage q=2048 ties it at 1258 with
    # half the cell recall headroom; q=1024 single-stage is +6% faster
    # and safe only for known-sparse scenes).
    num_candidates: int = 1024
    pre_nms_top_k: int = 128  # per-class candidates entering suppression
    # NMS backend, same semantics as MatcherConfig.use_pallas: the Pallas
    # suppression kernel is an unpartitioned custom call under GSPMD, so
    # "auto" (default) enables it on TPU with ONE device — or on any device
    # count when the caller provides a mesh (Detector.predict(mesh=...)),
    # where it runs under shard_map over the data axis and DP serving keeps
    # the kernel (ops/nms_pallas.batched_nms_pallas_sharded). True forces
    # the kernel on TPU even meshless-multi-device (it then REPLICATES the
    # full-batch NMS on every device); False always uses the jnp path.
    use_pallas: bool | str = "auto"
    # Suppression method: "hard" (greedy NMS, reference parity, Pallas
    # kernel available) | "soft_linear" | "soft_gaussian" (Soft-NMS score
    # decay — better recall on crowded scenes at slightly more compute;
    # always runs the jnp path).
    method: str = "hard"
    soft_sigma: float = 0.5  # gaussian decay width (soft_gaussian only)
    # Candidate selection strategy:
    #   "anchors" — flatten to (N, A, C) logits, approximate top-Q anchors;
    #   "cells"   — cell-major selection in the conv-native layout (no
    #               (N, A, C) relayout, exact cell top-k); see
    #               ops/postprocess.select_candidates_cells.
    select: str = "cells"
    # Per-class candidate top-k inside the Pallas NMS path: approx_max_k
    # (recall ~0.95; TPU PartialReduce, measured 2.6 ms faster than the
    # exact top_k's full sort at b64/80c) vs exact. On CPU approx lowers
    # to the exact path, so oracle tests are unaffected.
    approx_class_topk: bool = True
    # Two-stage cell selection (select="cells" only): prefilter
    # ceil(num_candidates * cell_overprovision / K) cells, then refine to
    # the exact top-num_candidates ANCHORS among them, so NMS cost stays
    # at num_candidates while the recall limit moves from Q/K cells to
    # ~overprovision*Q/K cells (the dense-scene cliff in BENCHMARKS.md
    # round 3). 1.0 disables refinement (single-stage, all K anchors of
    # Q/K cells).
    cell_overprovision: float = 2.0
    # Cell prefilter top-k (select="cells" only): approx_max_k at recall
    # 0.99 (TPU PartialReduce) vs the exact top_k, whose (N, cells)
    # key-value sort costs 0.29 ms at b32/640 (round-5 int8 trace). The
    # refine stage re-ranks anchors exactly, and overprovision x2 means a
    # dropped cell must beat ~2x the needed field to have mattered; the
    # crowded-scene A/B row lives in the tools/crowded_validation sweep
    # (accuracy deltas per round: BENCHMARKS.md). On CPU approx lowers to
    # the exact path (oracle tests unaffected).
    approx_cell_topk: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64  # global batch over the data mesh
    num_steps: int = 90_000
    optimizer: str = "momentum"  # momentum | adam
    momentum: float = 0.9
    learning_rate: float = 0.08
    lr_schedule: str = "cosine"  # cosine | piecewise
    lr_boundaries: Sequence[int] = (60_000, 80_000)
    lr_rates: Sequence[float] = (1.0, 0.1, 0.01)  # multipliers for piecewise
    warmup_steps: int = 500
    gradient_clip_norm: float = 10.0
    checkpoint_every: int = 1000
    keep_checkpoints: int = 5
    log_every: int = 100
    eval_every: int = 5000
    seed: int = 0
    # Exponential moving average of weights: 0 = off; typical 0.999-0.9999.
    # When on, periodic eval, best-mAP selection, and the exported artifact
    # all use the EMA weights.
    ema_decay: float = 0.0
    # Warm-start: path to an inference artifact (export dir) whose matching
    # parameter subtrees (typically the backbone) seed the new run.
    init_from: str = ""
    # Fine-tuning: comma-separated top-level modules whose parameters are
    # FROZEN (gradients zeroed before the optimizer; params bit-identical
    # across steps). E.g. "backbone" or "backbone,fpn". BN running stats
    # keep tracking the new data.
    freeze: str = ""
    # Knowledge distillation: path to a TEACHER inference artifact (any
    # backbone trained in this framework with the same anchor config and
    # class count — e.g. resnet50 teaching mobilenet-0.5). The teacher
    # runs gradient-free inside the compiled train step at the student's
    # resolution; its temperature-scaled class probabilities and box
    # deltas supervise the student alongside the ground-truth loss
    # (ops/distill.py). Empty = off.
    distill_from: str = ""
    distill_weight: float = 1.0  # scale of the distillation term
    distill_temperature: float = 2.0
    distill_box_weight: float = 1.0  # box term inside the distill loss
    # Gradient accumulation: >1 splits each global batch into this many
    # sequential microbatches inside the jitted step (lax.scan), averaging
    # gradients before ONE optimizer update — large effective batches on
    # small device counts at ~1/accum activation memory. Standard
    # accumulation semantics: each microbatch computes the detection loss
    # with its OWN num_positives normalization and its own BN batch
    # statistics; the averaged gradient equals the full-batch gradient
    # exactly when those normalizers agree (and bitwise-tested so in
    # test_train_step for a norm="group" model).
    grad_accum_steps: int = 1
    # Parameter/optimizer-state placement over the mesh:
    #   "replicated" — every chip holds full params (pure DP);
    #   "fsdp"       — ZeRO-3-style: large leaves shard over the DATA
    #                  axis; GSPMD all-gathers params on use and
    #                  reduce-scatters gradients into the sharded
    #                  optimizer update, cutting per-chip param+optimizer
    #                  memory ~1/data-axis. Composes with channel-TP
    #                  (different axes). See parallel/mesh.fsdp_sharded.
    param_sharding: str = "replicated"
    # Multi-scale training: cycle the TRAIN resolution through these square
    # sizes every `multiscale_every` steps (empty = off; include the base
    # image_size if it should be part of the cycle). Each size is one
    # compiled step program sharing the same parameters (convs are
    # resolution-agnostic; anchors are per-size trace constants). The
    # schedule is a pure function of the batch ordinal, so the stream —
    # including scales — replays exactly on resume. Eval/serving keep
    # the base image_size.
    multiscale: Sequence[int] = ()
    multiscale_every: int = 10


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_file_pattern: str = "data/train-*.tfrecords"
    val_file_pattern: str = "data/val-*.tfrecords"
    max_gt_boxes: int = 100  # padded ground-truth boxes per image
    num_workers: int = 8  # decode threads in the native loader
    # SSD-style augmentation knobs
    crop_min_ious: Sequence[float] = (0.1, 0.3, 0.5, 0.7, 0.9)
    crop_probability: float = 0.85
    flip_probability: float = 0.5
    color_jitter_probability: float = 0.5
    # 4-image mosaic composite before the crop/flip/color chain (opt-in;
    # multiplies object density and small-object exposure per step)
    mosaic_probability: float = 0.0


@dataclasses.dataclass(frozen=True)
class Config:
    num_classes: int = 80  # foreground classes (no background class; sigmoid heads)
    # Input resolution: a square int (the reference's convention) or an
    # explicit (height, width) pair for rectangular inputs.
    image_size: int | Sequence[int] = 640
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    anchors: AnchorConfig = dataclasses.field(default_factory=AnchorConfig)
    losses: LossConfig = dataclasses.field(default_factory=LossConfig)
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    nms: NMSConfig = dataclasses.field(default_factory=NMSConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)

    def __post_init__(self):
        if not isinstance(self.image_size, int):
            object.__setattr__(
                self, "image_size",
                tuple(int(s) for s in self.image_size))

    def image_hw(self) -> tuple[int, int]:
        """Input resolution as (height, width), square or not."""
        if isinstance(self.image_size, int):
            return (self.image_size, self.image_size)
        h, w = self.image_size
        return (h, w)

    def feature_map_sizes(self) -> tuple[tuple[int, int], ...]:
        """Spatial size of each FPN level for this image size (static)."""
        ih, iw = self.image_hw()
        sizes = []
        for stride in self.anchors.strides:
            sizes.append((-(-ih // stride), -(-iw // stride)))  # ceil div
        return tuple(sizes)

    def num_anchors(self) -> int:
        """Total number of anchors A for this image size (static)."""
        k = self.anchors.num_anchors_per_cell
        return sum(h * w * k for h, w in self.feature_map_sizes())

    # ---------------------------------------------------------------- JSON io

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(dataclasses.asdict(self), indent=indent)

    @classmethod
    def from_dict(cls, d: dict[str, Any], strict: bool = True) -> "Config":
        """``strict=True`` rejects unknown keys (catches typos in
        user-authored configs); ``strict=False`` skips them with a warning
        (forward-compat when loading artifacts written by older/newer
        versions whose config schema differs)."""
        def build(dc_cls, sub):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for key, value in sub.items():
                if key not in fields:
                    if not strict:
                        import warnings
                        warnings.warn(
                            f"ignoring unknown config key "
                            f"{dc_cls.__name__}.{key}"
                        )
                        continue
                    raise KeyError(f"Unknown config key: {dc_cls.__name__}.{key}")
                f = fields[key]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "model", "anchors", "losses", "matcher", "nms", "train", "data",
                ):
                    sub_cls = {
                        "model": ModelConfig, "anchors": AnchorConfig,
                        "losses": LossConfig, "matcher": MatcherConfig,
                        "nms": NMSConfig, "train": TrainConfig, "data": DataConfig,
                    }[f.name]
                    kwargs[key] = build(sub_cls, value)
                elif isinstance(value, list):
                    kwargs[key] = tuple(value)
                else:
                    kwargs[key] = value
            return dc_cls(**kwargs)

        return build(cls, d)

    @classmethod
    def from_json(cls, text: str, strict: bool = True) -> "Config":
        return cls.from_dict(json.loads(text), strict=strict)

    @classmethod
    def load(cls, path: str, strict: bool = True) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read(), strict=strict)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())
