"""Inference artifact export/load — the reference's ``save.py`` equivalent.

The reference freezes a SavedModel (SURVEY.md §3.3); the TPU-native artifact
is simply {config.json + orbax params checkpoint}: ``predict`` is re-jitted
(and AOT-compilable) from those, which is both smaller and
resolution-retargetable. Keeps the reference's two-artifact split: training
checkpoints (full TrainState, see utils/checkpoint.py) vs this
inference-only export.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from ssd_tpu.config import Config


def save_inference_artifact(path: str, cfg: Config, variables: dict,
                            label_map: dict | None = None) -> None:
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    cfg.save(os.path.join(path, "config.json"))
    if label_map:
        import json
        with open(os.path.join(path, "label_map.json"), "w") as f:
            json.dump({str(k): v for k, v in label_map.items()}, f, indent=2)
    ckpt = ocp.StandardCheckpointer()
    target = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    if "quant" in variables:
        # calibrated int8 activation scales (ssd_tpu/quant.py)
        target["quant"] = variables["quant"]
    elif getattr(cfg.model, "int8_neck", False):
        raise ValueError(
            "cfg.model.int8_neck is set but the variables carry no 'quant' "
            "collection — calibrate first (ssd_tpu.quant.calibrate or "
            "python -m ssd_tpu.quant)")
    ckpt.save(os.path.join(path, "variables"), target, force=True)
    ckpt.wait_until_finished()


def export_stablehlo(path: str, cfg: Config, variables: dict,
                     batch_size: int = 1) -> str:
    """Serialize the full predict program (weights baked in) as StableHLO.

    The TPU-native analog of the reference's frozen-graph export
    (SURVEY.md §3.3): one self-contained artifact, loadable with
    :func:`load_stablehlo` and runnable WITHOUT the model code or config —
    only jax. Compiled per (resolution, batch) like everything else.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ssd_tpu.models.detector import Detector

    det = Detector(cfg)

    def predict(images):
        out = det.predict(variables, images)
        return {"boxes": out.boxes, "scores": out.scores,
                "labels": out.labels, "num_boxes": out.num_boxes}

    spec = jax.ShapeDtypeStruct(
        (batch_size,) + cfg.image_hw() + (3,), jnp.uint8
    )
    exported = jexport.export(jax.jit(predict))(spec)
    os.makedirs(path, exist_ok=True)
    out_file = os.path.join(
        path,
        "predict_b{}_{}x{}.stablehlo".format(batch_size, *cfg.image_hw())
    )
    with open(out_file, "wb") as f:
        f.write(exported.serialize())
    return out_file


def export_savedmodel(path: str, cfg: Config, variables: dict,
                      batch_size: int = 1,
                      platforms: tuple[str, ...] | None = None) -> str:
    """Export the predict program as a TensorFlow SavedModel.

    This is the reference's LITERAL artifact: its ``save.py`` freezes a
    SavedModel with signature ``images (N,H,W,3) uint8 -> {boxes, scores,
    labels, num_boxes}`` (SURVEY.md §3.3/§1 L7). The jax2tf bridge bakes
    the weights in as constants (same as the reference's frozen graph), so
    a reference user can drop this directory into TF Serving / the
    ``tf.saved_model.load`` workflow they already run, with the identical
    signature — no jax on the serving host.

    ``platforms``: native-serialization targets (default: current backend).
    Pass ``("cpu",)`` to guarantee the artifact runs on CPU TF Serving
    regardless of where the export happened.
    """
    import dataclasses

    import tensorflow as tf
    from jax.experimental import jax2tf

    from ssd_tpu.models.detector import Detector

    # The Pallas NMS gate reads the HOST backend at trace time
    # (detector._on_tpu), not the jax2tf lowering platform: exporting on a
    # TPU host with non-TPU target platforms would otherwise trace Mosaic
    # TPU custom calls into a CPU-targeted serialization. Force the
    # platform-neutral jnp NMS whenever any requested target is not TPU
    # (the default platforms=None serializes for the host backend, where
    # the host gate is correct by construction).
    if platforms is not None and any(
            str(p).lower() not in ("tpu",) for p in platforms):
        cfg = dataclasses.replace(
            cfg, nms=dataclasses.replace(cfg.nms, use_pallas=False))

    det = Detector(cfg)

    def predict(images):
        out = det.predict(variables, images)
        return {"boxes": out.boxes, "scores": out.scores,
                "labels": out.labels, "num_boxes": out.num_boxes}

    tf_fn = jax2tf.convert(
        predict,
        native_serialization=True,
        native_serialization_platforms=platforms,
    )
    module = tf.Module()
    spec = tf.TensorSpec((batch_size,) + cfg.image_hw() + (3,), tf.uint8,
                         name="images")
    module.predict = tf.function(tf_fn, input_signature=[spec],
                                 autograph=False)
    out_dir = os.path.join(
        path, "savedmodel_b{}_{}x{}".format(batch_size, *cfg.image_hw())
    )
    tf.saved_model.save(
        module, out_dir,
        signatures={"serving_default": module.predict},
    )
    return out_dir


def load_stablehlo(file_path: str):
    """Load a serialized predict program. Returns ``fn(images) -> dict``."""
    from jax import export as jexport

    with open(file_path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def main() -> None:
    """CLI: training checkpoint -> inference artifact (the reference's
    ``save.py`` step, SURVEY.md §3.3).

    Usage:
        python -m ssd_tpu.export --workdir runs/r1 [--step N]
            [--output runs/r1/export] [--stablehlo --batch-size 1]
    """
    import argparse

    import jax

    from ssd_tpu.models.detector import Detector
    from ssd_tpu.parallel import make_optimizer
    from ssd_tpu.utils.checkpoint import TrainCheckpointer, abstract_train_state

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--workdir", required=True,
                   help="training workdir (contains config.json, checkpoints/)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--output", default=None,
                   help="artifact dir (default: <workdir>/export)")
    p.add_argument("--stablehlo", action="store_true",
                   help="also serialize a self-contained predict program")
    p.add_argument("--savedmodel", action="store_true",
                   help="also export a frozen TF SavedModel (the "
                        "reference's save.py artifact) via jax2tf")
    p.add_argument("--savedmodel-platforms", default=None,
                   help="comma-separated jax2tf targets (e.g. 'cpu' to "
                        "guarantee a CPU-servable artifact); default: "
                        "current backend")
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args()

    cfg = Config.load(os.path.join(args.workdir, "config.json"))
    detector = Detector(cfg)
    tx = make_optimizer(cfg)
    ckpt = TrainCheckpointer(os.path.join(args.workdir, "checkpoints"))
    state, _ = ckpt.restore(
        abstract_train_state(detector, tx, cfg.train.ema_decay),
        step=args.step)
    ckpt.close()

    out = args.output or os.path.join(args.workdir, "export")
    from ssd_tpu.parallel.train_step import inference_variables
    variables = inference_variables(state)
    save_inference_artifact(out, cfg, variables)
    print(f"wrote inference artifact (step {int(jax.device_get(state.step))}) "
          f"to {out}")
    if args.stablehlo:
        f = export_stablehlo(out, cfg, variables, batch_size=args.batch_size)
        print(f"wrote serialized predict program to {f}")
    if args.savedmodel:
        platforms = (tuple(args.savedmodel_platforms.split(","))
                     if args.savedmodel_platforms else None)
        d = export_savedmodel(out, cfg, variables,
                              batch_size=args.batch_size,
                              platforms=platforms)
        print(f"wrote TF SavedModel to {d}")


def load_inference_artifact(path: str) -> tuple[Config, dict]:
    path = os.path.abspath(path)
    # lenient: artifacts written by other framework versions may carry
    # config keys this version dropped (or lack ones it added)
    cfg = Config.load(os.path.join(path, "config.json"), strict=False)

    # Restore with an abstract target so dtypes/shapes come from the model.
    # Pin a concrete sharding (replicated-on-one-device): the artifact must
    # restore on any topology, not just the one that saved it.
    from jax.sharding import SingleDeviceSharding

    from ssd_tpu.models.detector import Detector
    det = Detector(cfg)
    abstract = jax.eval_shape(lambda: det.init(jax.random.PRNGKey(0)))
    sharding = SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
        abstract,
    )
    target = {
        "params": abstract["params"],
        "batch_stats": abstract.get("batch_stats", {}),
    }
    if getattr(cfg.model, "int8_neck", False):
        # calibrated int8 artifact: the scale-tree STRUCTURE is a pure
        # function of (cfg, image size), so eval_shape of one calibration
        # step reconstructs the abstract target the artifact saved.
        from ssd_tpu.quant import abstract_quant_tree
        target["quant"] = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=sharding),
            abstract_quant_tree(det),
        )
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.join(path, "variables"), target)
    return cfg, restored


if __name__ == "__main__":
    main()
