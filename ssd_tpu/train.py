"""Training driver — the reference's ``train.py`` re-imagined (SURVEY.md §3.1).

The reference wires ``tf.estimator.train_and_evaluate``; here the loop is
explicit and the whole step is one compiled XLA program over the mesh:

    python -m ssd_tpu.train --config configs/coco_mobilenet_640.json \
        --workdir /tmp/run1

Subsystems wired in (SURVEY.md §5): deterministic resumable input pipeline,
orbax async checkpointing with iterator state, SIGTERM preemption handler
(final sync checkpoint before the TPU VM goes away), JSONL/stdout metrics
with step-vs-data timing, periodic COCO-mAP evaluation, optional profiler
trace capture.
"""

from __future__ import annotations

import argparse
import os
import signal

import jax
import numpy as np

from ssd_tpu.config import Config
from ssd_tpu.eval.coco_map import DetectionEvaluator
from ssd_tpu.models.detector import Detector
from ssd_tpu.parallel import (
    create_mesh, create_train_state, jit_train_step, make_optimizer,
    make_train_step, replicated, shard_batch,
)
from ssd_tpu.utils.checkpoint import TrainCheckpointer, abstract_train_state
from ssd_tpu.utils.logging import MetricLogger


def evaluate(detector: Detector, state, cfg: Config, host_id: int,
             num_hosts: int, max_batches: int | None = None,
             mesh=None) -> dict:
    """COCO-style mAP over the validation set with the jitted predict.

    With a mesh, inference is data-parallel: the eval batch is sharded over
    the ``data`` axis like training batches (per-host streams are already
    disjoint via the pipeline's host sharding). Multi-host runs gather the
    small per-class (score, tp, num_gt) stats across processes before the
    PR computation, so every host reports the identical GLOBAL mAP; the
    padded tail rows of the final batch are masked out via the pipeline's
    ``valid`` mask, so every val example counts exactly once.
    """
    from ssd_tpu.data.pipeline import Pipeline

    if mesh is not None:
        from ssd_tpu.parallel import batch_sharding, replicated
        from ssd_tpu.parallel.mesh import local_rows, shard_batch
        # Outputs stay batch-sharded: every host reads back exactly ITS
        # rows (local_rows) — no all-gather of detections, and the pairing
        # with host-local ground truth is positional and exact.
        predict = jax.jit(
            lambda variables, images: detector.predict(variables, images),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )

        def run(variables, images):
            # multi-host: the local batch becomes this process's slice of
            # the GLOBAL array (make_array_from_process_local_data via
            # shard_batch) — a raw numpy feed would target non-addressable
            # devices and fail with process_count > 1
            images = shard_batch(mesh, {"images": images})["images"]
            out = predict(variables, images)
            return {"boxes": local_rows(out.boxes),
                    "scores": local_rows(out.scores),
                    "labels": local_rows(out.labels),
                    "num_boxes": local_rows(out.num_boxes)}
    else:
        predict = jax.jit(
            lambda variables, images: detector.predict(variables, images)
        )

        def run(variables, images):
            out = predict(variables, images)
            return {"boxes": np.asarray(out.boxes),
                    "scores": np.asarray(out.scores),
                    "labels": np.asarray(out.labels),
                    "num_boxes": np.asarray(out.num_boxes)}
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    evaluator = DetectionEvaluator(cfg.num_classes)
    pipeline = Pipeline(
        cfg.data.val_file_pattern, cfg, is_training=False,
        batch_size=max(cfg.train.batch_size // num_hosts, 1),
        host_id=host_id, num_hosts=num_hosts,
    )
    for i, batch in enumerate(pipeline):
        if max_batches is not None and i >= max_batches:
            break
        evaluator.add_batch(
            run(variables, batch["images"]),
            batch["boxes"], batch["labels"], batch["num_boxes"],
            valid=batch.get("valid"),
            gt_is_crowd=batch.get("is_crowd"),
            orig_hw=batch.get("orig_hw"),
        )
    return evaluator.gather().result()


def warm_start(state, artifact_path: str):
    """Seed a fresh TrainState from an inference artifact (transfer
    learning / pretrained-backbone loading): every parameter and BN-stat
    leaf whose path AND shape match is copied; mismatches (e.g. a different
    class count in the heads) keep their fresh initialization."""
    from ssd_tpu.export import load_inference_artifact

    _, donor = load_inference_artifact(artifact_path)

    def merge(fresh_tree, donor_tree, kind):
        fresh_flat = jax.tree_util.tree_flatten_with_path(fresh_tree)[0]
        donor_flat = dict(jax.tree_util.tree_flatten_with_path(donor_tree)[0])
        copied = 0
        out = {}
        for path, leaf in fresh_flat:
            d = donor_flat.get(path)
            if d is not None and d.shape == leaf.shape and d.dtype == leaf.dtype:
                out[path] = d
                copied += 1
            else:
                out[path] = leaf
        print(f"warm_start: copied {copied}/{len(fresh_flat)} {kind} leaves "
              f"from {artifact_path}", flush=True)
        treedef = jax.tree_util.tree_structure(fresh_tree)
        return jax.tree_util.tree_unflatten(
            treedef, [out[p] for p, _ in fresh_flat]
        )

    state = state.replace(params=merge(state.params, donor["params"], "param"))
    if donor.get("batch_stats"):
        state = state.replace(
            batch_stats=merge(state.batch_stats, donor["batch_stats"], "bn")
        )
    if state.ema_params is not None:
        # Re-seed the EMA from the warm-started params — it was initialized
        # as a copy of the RANDOM init, and with a slow decay (0.999+) that
        # pollution would dominate eval/export for thousands of steps.
        state = state.replace(
            ema_params=jax.tree_util.tree_map(
                lambda p: p.copy(), state.params)
        )
    return state


def train(cfg: Config, workdir: str, resume: bool = True,
          max_steps: int | None = None, profile_steps: int = 0) -> dict:
    """Run the training loop; returns final metrics.

    ``profile_steps > 0`` captures a profiler trace of that many steady-state
    steps (starting at the 10th step of this run) into ``workdir/profile`` —
    one command for input-vs-step time attribution (open with XProf/
    TensorBoard)."""
    from ssd_tpu.data.pipeline import Pipeline

    host_id = jax.process_index()
    num_hosts = jax.process_count()

    mesh = create_mesh()
    detector = Detector(cfg)
    tx = make_optimizer(cfg)
    from ssd_tpu.parallel import make_lr_schedule
    lr_fn = make_lr_schedule(cfg)
    # step_fn is jitted after the state exists (shardings need its shapes)
    accum = max(cfg.train.grad_accum_steps, 1)
    if cfg.train.batch_size % accum:
        raise ValueError(
            f"train.batch_size ({cfg.train.batch_size}) must divide by "
            f"grad_accum_steps ({accum})")
    data_axis = mesh.shape["data"]
    if accum > 1 and (cfg.train.batch_size // accum) % data_axis:
        # A microbatch smaller than the data axis leaves the batch dim
        # only partially shardable, and XLA SPMD then miscomputes the
        # depthwise-conv backward (measured: grads off by O(1) at
        # micro=2 over 8 devices, exact at micro>=devices). Refuse the
        # degenerate configuration instead of silently training wrong.
        raise ValueError(
            f"microbatch ({cfg.train.batch_size}//{accum}) must divide by "
            f"the data axis ({data_axis}) for grad accumulation")

    # Load + validate the distillation teacher BEFORE touching data or
    # checkpoints: a bad teacher path/geometry should fail fast.
    teacher_cfg = teacher_vars = None
    if cfg.train.distill_from:
        from ssd_tpu.export import load_inference_artifact
        teacher_cfg, teacher_vars = load_inference_artifact(
            cfg.train.distill_from)
        if teacher_cfg.num_classes != cfg.num_classes:
            raise ValueError(
                f"distill teacher has {teacher_cfg.num_classes} classes, "
                f"student {cfg.num_classes}")
        if teacher_cfg.anchors != cfg.anchors:
            raise ValueError(
                "distill teacher's anchor config differs from the "
                "student's — head geometries must match")
        print(f"distillation: teacher {teacher_cfg.model.backbone} "
              f"(w={teacher_cfg.model.width_multiplier}) from "
              f"{cfg.train.distill_from}", flush=True)

    ckpt = TrainCheckpointer(
        os.path.join(workdir, "checkpoints"), keep=cfg.train.keep_checkpoints
    )
    logger = MetricLogger(workdir if host_id == 0 else None)

    pipeline = Pipeline(
        cfg.data.train_file_pattern, cfg, is_training=True,
        batch_size=cfg.train.batch_size // num_hosts,
        host_id=host_id, num_hosts=num_hosts, seed=cfg.train.seed,
    )

    # ----- init or resume -------------------------------------------------
    latest = ckpt.latest_step() if resume else None
    if latest is not None:
        abstract = abstract_train_state(detector, tx, cfg.train.ema_decay)
        state, it_state = ckpt.restore(abstract)
        if it_state:
            pipeline.restore(it_state)
        print(f"resumed from step {latest}", flush=True)
    else:
        state = create_train_state(
            detector, jax.random.PRNGKey(cfg.train.seed), tx,
            cfg.train.ema_decay,
        )
        if cfg.train.init_from:
            state = warm_start(state, cfg.train.init_from)
    if cfg.train.param_sharding == "fsdp":
        from ssd_tpu.parallel.mesh import fsdp_sharded
        state_shardings = fsdp_sharded(mesh, state)
    elif cfg.train.param_sharding == "replicated":
        state_shardings = replicated(mesh)
    else:
        raise ValueError(
            f"unknown train.param_sharding: {cfg.train.param_sharding!r}")
    state = jax.device_put(state, state_shardings)

    def _teacher_for(det):
        """Teacher (model, vars) at this student Detector's resolution."""
        if teacher_vars is None:
            return None
        import dataclasses as _dc
        t_det = Detector(_dc.replace(
            teacher_cfg, image_size=det.cfg.image_size))
        return (t_det.model, teacher_vars)

    def _build_step(det):
        return jit_train_step(
            make_train_step(det, tx, cfg.train.ema_decay,
                            cfg.train.grad_accum_steps,
                            teacher=_teacher_for(det)),
            mesh, state_shardings if cfg.train.param_sharding != "replicated"
            else None)

    # Multi-scale: one compiled step per train resolution, all sharing the
    # same TrainState (convs are resolution-agnostic; only the anchor
    # constants differ). Batch shape selects the program.
    step_fns = {tuple(cfg.image_hw()): _build_step(detector)}

    def step_fn_for(batch):
        hw = tuple(int(v) for v in batch["images"].shape[1:3])
        if hw not in step_fns:
            import dataclasses as _dc
            step_fns[hw] = _build_step(Detector(
                _dc.replace(cfg, image_size=list(hw))))
        return step_fns[hw]

    # ----- preemption handler --------------------------------------------
    preempted = {"flag": False}

    def _sigterm(signum, frame):
        preempted["flag"] = True

    signal.signal(signal.SIGTERM, _sigterm)

    def _eval_view(s):
        """Evaluate with EMA weights when tracked (what will be served)."""
        return s.replace(params=s.ema_params) if s.ema_params is not None else s

    # ----- loop -----------------------------------------------------------
    num_steps = max_steps or cfg.train.num_steps
    metrics = {}
    best_map = -1.0
    data_iter = iter(pipeline)
    logger.reset_clock()
    # Track the step on host: fetching state.step each iteration would
    # force a device sync per step and serialize host against device.
    step = int(jax.device_get(state.step))
    profile_start = step + 10 if profile_steps > 0 else -1
    profiling = False
    try:
        while step < num_steps:
            if step == profile_start and host_id == 0:
                from ssd_tpu.utils import profiling as prof
                jax.block_until_ready(state)  # trace only steady-state work
                prof_dir = os.path.join(workdir, "profile")
                prof.start_trace(prof_dir)
                profiling = True
                print(f"profiler: tracing {profile_steps} steps -> "
                      f"{prof_dir}", flush=True)
            batch = next(data_iter)
            logger.tick_data()
            state, metrics = step_fn_for(batch)(
                state, shard_batch(mesh, batch))
            step += 1
            logger.tick_step()
            if profiling and step >= profile_start + profile_steps:
                from ssd_tpu.utils import profiling as prof
                jax.block_until_ready(state)
                prof.stop_trace()
                profiling = False

            if step % cfg.train.log_every == 0 and host_id == 0:
                logger.log(step, metrics,
                           extra={"learning_rate": float(lr_fn(step))})
            if step % cfg.train.checkpoint_every == 0 or preempted["flag"]:
                ckpt.save(state, pipeline.state(), force=preempted["flag"])
            if preempted["flag"]:
                print("SIGTERM received: final checkpoint written, exiting",
                      flush=True)
                break
            if cfg.train.eval_every and step % cfg.train.eval_every == 0:
                try:
                    result = evaluate(detector, _eval_view(state), cfg,
                                      host_id, num_hosts, mesh=mesh)
                    if host_id == 0:
                        logger.log(step, {}, extra={
                            "mAP": result["mAP"], "AP50": result["AP50"],
                        })
                    # orbax saves are COLLECTIVE: every process must enter
                    # (orbax's primary host does the writing). The gathered
                    # result is identical on all hosts, so the branch is
                    # taken in lockstep.
                    if result["mAP"] > best_map:
                        best_map = result["mAP"]
                        from ssd_tpu.export import save_inference_artifact
                        from ssd_tpu.parallel.train_step import (
                            inference_variables)
                        save_inference_artifact(
                            os.path.join(workdir, "best"), cfg,
                            inference_variables(state),
                        )
                except FileNotFoundError:
                    pass  # no val set configured
    except Exception:
        # crash-path checkpoint: preserve progress before propagating
        # (estimator-style restartability, SURVEY.md §5 failure row)
        ckpt.save(state, pipeline.state(), force=True)
        ckpt.wait()
        raise
    finally:
        if profiling:  # loop ended inside the trace window
            from ssd_tpu.utils import profiling as prof
            prof.stop_trace()

    ckpt.save(state, pipeline.state(), force=True)
    ckpt.wait()
    ckpt.close()
    logger.close()

    if not preempted["flag"]:
        # inference artifact alongside the training checkpoints — the
        # reference's save.py step, folded into the driver (SURVEY.md §3.3).
        # All hosts call: the orbax save is a collective (primary host
        # writes); the label-map lookup reads shared storage identically.
        from ssd_tpu.export import save_inference_artifact
        label_map = None
        import glob as globlib
        import json
        pattern_dir = os.path.dirname(cfg.data.train_file_pattern) or "."
        maps = globlib.glob(os.path.join(pattern_dir, "*label_map.json"))
        if maps:
            with open(maps[0]) as f:
                label_map = json.load(f)
        from ssd_tpu.parallel.train_step import inference_variables
        save_inference_artifact(
            os.path.join(workdir, "export"), cfg,
            inference_variables(state),
            label_map=label_map,
        )
    return {k: float(jax.device_get(v)) for k, v in metrics.items()}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="path to config JSON")
    p.add_argument("--workdir", required=True)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a profiler trace of N steady-state steps "
                        "into WORKDIR/profile")
    args = p.parse_args()

    if not os.path.exists(args.config):
        p.error(f"config file not found: {args.config}")
    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    cfg = Config.load(args.config)
    os.makedirs(args.workdir, exist_ok=True)
    cfg.save(os.path.join(args.workdir, "config.json"))
    train(cfg, args.workdir, resume=not args.no_resume,
          max_steps=args.max_steps, profile_steps=args.profile)


if __name__ == "__main__":
    main()
