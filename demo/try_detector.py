"""Demo: load an exported detector and draw predictions on images.

TPU-native counterpart of the reference's ``try_detector.ipynb``
(SURVEY.md §2 "Demo" row), as a runnable script (a notebook version lives
next to it). With no checkpoint it runs a randomly-initialized model — the
full path still executes end to end, which is useful as a smoke test.

Usage:
    python demo/try_detector.py --image photo.jpg [--export runs/r1/export]
    python demo/try_detector.py --selftest     # synthetic image, no files
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# allow running as `python demo/try_detector.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def draw_detections(image: np.ndarray, out: dict,
                    class_names: list[str] | None = None) -> np.ndarray:
    """Draw boxes/labels on an RGB uint8 image (pure numpy, no fonts)."""
    img = image.copy()
    h, w = img.shape[:2]
    n = int(out["num_boxes"])
    for i in range(n):
        y0, x0, y1, x1 = out["boxes"][i]
        y0, x0 = int(y0 * h), int(x0 * w)
        y1, x1 = int(y1 * h), int(x1 * w)
        color = np.array([255, 64, 64], np.uint8)
        img[y0:y1 + 1, x0:x0 + 3] = color
        img[y0:y1 + 1, max(x1 - 2, 0):x1 + 1] = color
        img[y0:y0 + 3, x0:x1 + 1] = color
        img[max(y1 - 2, 0):y1 + 1, x0:x1 + 1] = color
    return img


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", help="input image path")
    p.add_argument("--export", help="exported artifact dir (optional)")
    p.add_argument("--output", default="detections.png")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from ssd_tpu.predictor import Predictor

    if args.export:
        predictor = Predictor.from_checkpoint(args.export)
    else:
        import jax
        from ssd_tpu.config import Config, ModelConfig
        from ssd_tpu.models.detector import Detector
        print("no --export given: using random weights (smoke-test mode)")
        cfg = Config(num_classes=80, image_size=640)
        det = Detector(cfg)
        variables = det.init(jax.random.PRNGKey(0))
        predictor = Predictor(cfg, variables)

    if args.selftest:
        image = np.random.default_rng(0).integers(
            0, 255, (480, 640, 3)
        ).astype(np.uint8)
    else:
        from PIL import Image
        image = np.asarray(Image.open(args.image).convert("RGB"))

    out = predictor(image)
    print(f"detections: {int(out['num_boxes'])}")
    for i in range(int(out["num_boxes"])):
        print(f"  label={int(out['labels'][i]):3d} "
              f"score={float(out['scores'][i]):.3f} "
              f"box={np.round(out['boxes'][i], 3).tolist()}")

    from PIL import Image
    Image.fromarray(draw_detections(image, out)).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
