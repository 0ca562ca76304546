"""Train + commit the tiny sanity artifact behind ``bench.py sanity_map``.

One-time tool (re-run only if eval/sanity.py's task definition changes):
trains the flagship-shaped tiny detector (dense4 MobileNet, 8 classes,
128 px) on fixed-seed synthetic crowded scenes and saves an inference
artifact at ``bench_assets/sanity_artifact/``. bench.py then re-derives
the held-out scenes from their seed each round and scores the committed
weights, so the ``sanity_map`` field in BENCH_r*.json moves only when the
framework's numerics/postprocess move — the drift-detection contract
(VERDICT r4 #6).

    python -m ssd_tpu.tools.make_bench_artifact [--steps 600]
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--pool", type=int, default=32,
                   help="distinct seed-derived training batches to cycle")
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax

    from ssd_tpu.eval.sanity import (ARTIFACT_DIR, SANITY_SEED_TRAIN,
                                     evaluate_artifact_map, sanity_batches,
                                     sanity_config)
    from ssd_tpu.export import save_inference_artifact
    from ssd_tpu.models.detector import Detector
    from ssd_tpu.parallel import (create_train_state, make_optimizer,
                                  make_train_step)
    from ssd_tpu.parallel.train_step import inference_variables

    out = args.out or ARTIFACT_DIR
    cfg = sanity_config()
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(det, tx), donate_argnums=0)

    # cycle a fixed pool of seed-derived training scenes
    batches = []
    for i in range(args.pool):
        imgs, boxes, labels, nb, _ = next(sanity_batches(
            cfg.train.batch_size, SANITY_SEED_TRAIN + i,
            batch=cfg.train.batch_size))
        batches.append({"images": imgs, "boxes": boxes,
                        "labels": labels.astype(np.int32), "num_boxes": nb})

    for i in range(args.steps):
        state, metrics = step(state, batches[i % len(batches)])
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(metrics['loss']):.4f}")

    save_inference_artifact(out, cfg, inference_variables(state))
    print(f"saved -> {out}")
    print(f"sanity_map(bf16) = {evaluate_artifact_map():.4f}")


if __name__ == "__main__":
    main()
