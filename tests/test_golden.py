"""Golden-parity tests (SURVEY.md §4): fixed seed + fixed input -> stored
outputs. Catches silent numeric drift in the geometry/model/postprocess
stack across refactors. Goldens are generated ON CPU in float32; regenerate
deliberately with:  python tests/test_golden.py regen
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.models.detector import Detector

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "predict_v1.npz")
GOLDEN_CELLS = os.path.join(os.path.dirname(__file__), "goldens",
                            "predict_cells_v1.npz")

# predict_v1.npz was generated with the anchor-level selection path; pin it
# so the golden keeps guarding that path (+ the geometry/model core) after
# cell-level selection became the serving default. The cells default has
# its own golden below — with random-weight logits clustered at the prior,
# the two approximate top-k granularities legitimately keep different
# near-tie candidates.
CFG = Config(
    num_classes=5,
    image_size=96,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
    nms=NMSConfig(score_threshold=0.01, max_boxes=20, num_candidates=128,
                  pre_nms_top_k=64, select="anchors"),
)


def _compute(cfg=CFG):
    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(42))
    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, (2, 96, 96, 3)).astype(np.uint8)
    logits, deltas = det.apply(
        variables,
        jnp.asarray(
            (images.astype(np.float32) - 127.5) / 64.0, jnp.float32
        ),
    )
    out = jax.jit(det.predict)(variables, jnp.asarray(images))
    return {
        "logits_slice": np.asarray(logits)[:, :64],
        "deltas_slice": np.asarray(deltas)[:, :64],
        "boxes": np.asarray(out.boxes),
        "scores": np.asarray(out.scores),
        "labels": np.asarray(out.labels).astype(np.int32),
        "num_boxes": np.asarray(out.num_boxes).astype(np.int32),
        "anchors_head": np.asarray(det.anchors)[:64],
    }


def _check_against(got, golden_path):
    if not os.path.exists(golden_path):  # first run: write and pass
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.savez_compressed(golden_path, **got)
    want = np.load(golden_path)

    # raw tensors: strict elementwise comparison
    for key in ("logits_slice", "deltas_slice", "anchors_head"):
        np.testing.assert_allclose(
            got[key], want[key], atol=2e-4, rtol=2e-3, err_msg=key
        )
    np.testing.assert_array_equal(got["num_boxes"], want["num_boxes"])

    # detections: order-insensitive matching. Random-weight logits cluster
    # near the prior, so float jitter from a different compiler build (the
    # TPU relay's remote compile vs local XLA) can flip near-tie ORDER —
    # the detection SET must still correspond one-to-one.
    for i in range(len(want["num_boxes"])):
        nb = int(want["num_boxes"][i])
        used = set()
        for j in range(nb):
            found = None
            for q in range(nb):
                if q in used:
                    continue
                if (got["labels"][i, q] == want["labels"][i, j]
                        and abs(got["scores"][i, q] - want["scores"][i, j]) < 1e-3
                        and np.abs(got["boxes"][i, q] - want["boxes"][i, j]).max() < 1e-2):
                    found = q
                    break
            assert found is not None, (
                f"image {i}: golden detection {j} "
                f"(label={want['labels'][i, j]}, "
                f"score={want['scores'][i, j]:.4f}) has no match"
            )
            used.add(found)


def test_predict_matches_golden():
    _check_against(_compute(), GOLDEN)


def test_predict_cells_matches_golden():
    """Same guard for the cell-level selection serving default."""
    import dataclasses
    cfg = dataclasses.replace(
        CFG, nms=dataclasses.replace(CFG.nms, select="cells")
    )
    _check_against(_compute(cfg), GOLDEN_CELLS)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import dataclasses
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **_compute())
        cfg = dataclasses.replace(
            CFG, nms=dataclasses.replace(CFG.nms, select="cells")
        )
        np.savez_compressed(GOLDEN_CELLS, **_compute(cfg))
        print(f"regenerated {GOLDEN} and {GOLDEN_CELLS}")
