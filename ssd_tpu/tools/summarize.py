"""Model cost summary: parameters, FLOPs, bytes, and a v5e roofline sketch.

The planning companion to the measurement tools (`bench_serve` /
`bench_train` measure; this predicts): XLA's own cost analysis of the
compiled predict and train-step programs gives FLOPs and HBM bytes, from
which the roofline model ("How to Scale Your Model": time =
max(FLOPs/peak, bytes/bandwidth)) bounds the per-batch step time and
says whether a config is compute- or bandwidth-bound BEFORE burning chip
time on it. Compilation happens on the ambient platform (CPU works —
FLOP counts are platform-independent; bytes shift somewhat with layout
choices, so treat them as estimates).

Usage::

    python -m ssd_tpu.tools.summarize --config cfg.json [--batch 32]
        [--train] [--json out.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import Config

# TPU v5e (1 chip) peaks — the bench target in BASELINE.md.
_PEAK_BF16_FLOPS = 197e12
_HBM_GBPS = 819e9


def _tree_bytes(tree) -> tuple[int, int]:
    leaves = jax.tree_util.tree_leaves(tree)
    n = sum(int(np.prod(x.shape)) for x in leaves)
    b = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in leaves)
    return n, b


def _cost(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    mem = compiled.memory_analysis()
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
        "temp_bytes": int(getattr(mem, "temp_size_in_bytes", 0)),
        "arg_bytes": int(getattr(mem, "argument_size_in_bytes", 0)),
    }


def _roofline(cost: dict, batch: int) -> dict:
    t_compute = cost["flops"] / _PEAK_BF16_FLOPS
    t_memory = cost["bytes"] / _HBM_GBPS
    bound = "compute" if t_compute >= t_memory else "bandwidth"
    t = max(t_compute, t_memory)
    return {
        "arithmetic_intensity": round(
            cost["flops"] / max(cost["bytes"], 1.0), 1),
        "bound": bound,
        "roofline_ms": round(t * 1e3, 3),
        "roofline_img_per_s": round(batch / t, 1) if t else None,
    }


def summarize(cfg: Config, batch: int = 32, train: bool = False) -> dict:
    from ssd_tpu.models.detector import Detector

    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    ih, iw = cfg.image_hw()

    report: dict = {"image_size": [ih, iw], "batch": batch}

    # ---- parameters, by top-level module
    per_module = {}
    for mod, sub in variables["params"].items():
        n, b = _tree_bytes(sub)
        per_module[mod] = {"params": n, "mb": round(b / 2**20, 2)}
    n_total, b_total = _tree_bytes(variables["params"])
    report["params"] = {"total": n_total,
                        "mb": round(b_total / 2**20, 2),
                        "by_module": per_module}

    # ---- serve program
    images = jnp.zeros((batch, ih, iw, 3), jnp.uint8)

    def predict(imgs):
        return det.predict(variables, imgs)

    c = jax.jit(predict).lower(images).compile()
    serve = _cost(c)
    serve.update(_roofline(serve, batch))
    serve["flops_per_image_g"] = round(serve["flops"] / batch / 1e9, 2)
    report["serve"] = serve

    # ---- train step (optional: compiles the full fwd+bwd+opt program)
    if train:
        from ssd_tpu.parallel import (create_train_state, make_optimizer,
                                      make_train_step)
        from ssd_tpu.tools.bench_train import synthetic_batch

        state = create_train_state(det, jax.random.PRNGKey(0),
                                   make_optimizer(cfg))
        step = make_train_step(det, make_optimizer(cfg),
                               ema_decay=cfg.train.ema_decay,
                               grad_accum_steps=cfg.train.grad_accum_steps)
        batch_np = synthetic_batch(
            dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, batch_size=batch)),
            batch)
        c = jax.jit(step).lower(state, batch_np).compile()
        tr = _cost(c)
        tr.update(_roofline(tr, batch))
        tr["flops_per_image_g"] = round(tr["flops"] / batch / 1e9, 2)
        report["train"] = tr

    return report


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--train", action="store_true",
                   help="also compile + analyze the train step")
    p.add_argument("--json", default="")
    args = p.parse_args(argv)

    cfg = Config.load(args.config)
    r = summarize(cfg, args.batch, args.train)
    r["analysis_platform"] = jax.default_backend()

    pm = r["params"]
    mods = "  ".join(f"{k}:{v['params']/1e6:.2f}M" for k, v in
                     pm["by_module"].items())
    print(f"params: {pm['total']/1e6:.2f}M ({pm['mb']} MB f32)  [{mods}]")
    for name in ("serve", "train"):
        if name not in r:
            continue
        s = r[name]
        print(f"{name} @b{r['batch']}: {s['flops_per_image_g']} GFLOP/img, "
              f"AI {s['arithmetic_intensity']} flop/byte ({s['bound']}-bound)"
              f" -> v5e roofline {s['roofline_ms']} ms/batch"
              f" = {s['roofline_img_per_s']} img/s")
    if r["analysis_platform"] != "tpu":
        print(f"(bytes estimated from the {r['analysis_platform']} "
              "compilation — TPU fusions move fewer bytes, so a "
              "bandwidth-bound roofline here is a LOWER bound on img/s)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(r, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
