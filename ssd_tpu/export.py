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
        (batch_size, cfg.image_size, cfg.image_size, 3), jnp.uint8
    )
    exported = jexport.export(jax.jit(predict))(spec)
    os.makedirs(path, exist_ok=True)
    out_file = os.path.join(
        path, f"predict_b{batch_size}_{cfg.image_size}.stablehlo"
    )
    with open(out_file, "wb") as f:
        f.write(exported.serialize())
    return out_file


def load_stablehlo(file_path: str):
    """Load a serialized predict program. Returns ``fn(images) -> dict``."""
    from jax import export as jexport

    with open(file_path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def load_inference_artifact(path: str) -> tuple[Config, dict]:
    path = os.path.abspath(path)
    cfg = Config.load(os.path.join(path, "config.json"))

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
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.join(path, "variables"), target)
    return cfg, restored
