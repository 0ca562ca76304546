"""Headline benchmark: the full BASELINE.json metric row on one chip.

Prints ONE JSON line. The driver contract fields are
``{"metric", "value", "unit", "vs_baseline"}`` (value = images/sec/chip at
640x640 b32 on the flagship MobileNet-FPN dense4 in its SHIPPED SERVING
configuration: full-path int8 PTQ — measured -0.0009 mAP vs bf16 on the
crowded-scene soak, BENCHMARKS.md round 4; ``bf16_images_per_sec`` carries
the bf16 path for cross-round comparability); the remaining fields carry
the rest of the BASELINE metric row ("images/sec/chip; p50 NMS latency;
COCO mAP parity" plus MFU):

  * ``p50_batch_ms`` / ``p99_batch_ms`` — sustained per-batch latency over
    pipelined WINDOW-deep dispatch windows (per-call host blocking would
    measure the host<->device round trip — ~30 ms through a tunnel — not
    the chip).
  * ``p50_postprocess_ms`` — the candidate-selection + class-wise NMS
    sub-program (everything after the raw head maps), timed standalone;
    includes re-reading the raw head maps from HBM, which the fused
    predict program avoids, so this upper-bounds the in-situ cost.
  * ``mfu`` — measured FLOPs (XLA cost analysis of the compiled predict)
    / measured time / 197e12 (v5e bf16 peak).
  * ``dispatch`` — "plain" (one device call per b32 batch) or "scan4"
    (one lax.scan-of-4-microbatches call, the serve daemon's
    ``--scan-depth`` throughput mode): headlined when faster because the
    relay's per-dispatch overhead is host-state, not chip cost;
    ``plain_images_per_sec``/``scan4_*`` always carry both measurements.

The reference publishes no numbers (BASELINE.json ``published: {}``); the
north-star target is >=10x the TF reference's images/sec on one chip.
Until the reference is measurable, ``vs_baseline`` is computed against a
measured stand-in: a faithful same-architecture forward pass on this
host's CPU via TF (see bench_reference.py), cached in
``reference_baseline.json``. If no cached reference number exists,
vs_baseline falls back to the conservative documented estimate (25 img/s,
a generous CPU figure for MobileNet-SSD at 640x640).
"""

from __future__ import annotations

import json
import os
import time

BATCH = 32
WARMUP = 3
WINDOW = 30         # dispatches per timing window (pipelined):
#   the one host block per window (~ms of host->device round trip; ~30 ms
#   through a tunnel) amortizes to noise at this depth
WINDOWS = 8         # timing windows for the latency distribution
REF_FILE = os.path.join(os.path.dirname(__file__), "reference_baseline.json")
FALLBACK_REFERENCE_IMG_PER_S = 25.0
PEAK_BF16_FLOPS = 197e12  # TPU v5e, one chip


def _percentile(sorted_vals, q: float) -> float:
    i = min(int(q * len(sorted_vals)), len(sorted_vals) - 1)
    return sorted_vals[i]


def _bench_config(cfg):
    """Build + time one serving config: pipelined windows on this device.

    Returns (images_per_sec, p50_ms, p99_ms, flops_per_batch, det,
    variables) — det/variables so the caller can reuse the bf16 model for
    the standalone postprocess measurement.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ssd_tpu.models.detector import Detector

    det = Detector(cfg)
    variables = det.init(jax.random.PRNGKey(0))
    if cfg.model.compute_dtype == "int8" and cfg.model.int8_neck:
        # throughput is calibration-scale-independent; one noise batch
        # builds the "quant" tree the int8 predict path requires
        from ssd_tpu.quant import calibrate
        noise = np.random.default_rng(0).integers(
            0, 255, (2, cfg.image_size, cfg.image_size, 3)).astype(np.uint8)
        variables, _ = calibrate(det, variables, [noise])

    def predict(variables, images):
        out = det.predict(variables, images)
        return out.boxes, out.scores, out.labels, out.num_boxes

    # Packed ingest for dense4 serving configs — the SAME feed
    # Predictor/StreamingDetector use (ops/ingest.py): the pipeline
    # delivers the space-to-depth(4)-packed s8 tensor, so the program
    # drops the pack conv + raw-image relayout copy (int8 ~1.2 ms at
    # b32/640 bit-identical; bf16 ~1.5 ms equal up to conv summation
    # order — round-5 traces).
    if cfg.model.stem_schedule == "dense4":
        from ssd_tpu.ops.ingest import pack_s2d
        images = jnp.asarray(pack_s2d(
            np.zeros((BATCH, cfg.image_size, cfg.image_size, 3), np.uint8)))
    else:
        images = jnp.zeros(
            (BATCH, cfg.image_size, cfg.image_size, 3), jnp.uint8)

    # Guarded AUTO input layout — the SAME helper the serving layer uses
    # (Predictor/StreamingDetector), so the headline measures the feed
    # deployments actually get; on fallback both measure the
    # default-layout program (relayout copy in-program). Rationale and the
    # observed silent-relayout failure: ssd_tpu/utils/layout.py.
    from ssd_tpu.utils.layout import compile_auto_layout
    auto_compiled, stage = compile_auto_layout(predict, variables, images)
    if auto_compiled is not None:
        compiled, images = auto_compiled, stage(images)
    else:  # pragma: no cover - older jax / no relayout support
        compiled = jax.jit(predict).lower(variables, images).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops_per_batch = float(ca.get("flops", 0.0))

    def device_ms(iters: int = 20):
        """Per-batch DEVICE time from an XProf trace — immune to the
        host<->device relay's dispatch overhead, which through a tunneled
        chip oscillates from ~1 ms to ~18 ms per call with the tunnel's
        load (observed round 5) and pollutes wall numbers. Reported
        alongside wall time so the artifact self-documents relay state."""
        import shutil
        import tempfile
        d = tempfile.mkdtemp(prefix="bench_trace_")
        try:
            with jax.profiler.trace(d):
                r = None
                for _ in range(iters):
                    r = compiled(variables, images)
                jax.block_until_ready(r)
            from ssd_tpu.utils.trace_tools import find_xplane, load_device_ops
            ops = load_device_ops(find_xplane(d))
            return sum(ps for _, _, ps in ops) / 1e12 * 1e3 / iters
        except Exception:  # pragma: no cover - non-TPU or no TF protos
            return None
        finally:
            shutil.rmtree(d, ignore_errors=True)

    for _ in range(WARMUP):
        jax.block_until_ready(compiled(variables, images))

    # Pipelined timing windows: queue WINDOW steps, block once — measures
    # sustained device throughput rather than host<->device round-trip
    # latency — and the window distribution gives p50/p99.
    window_ms = []
    t_all0 = time.perf_counter()
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        result = None
        for _ in range(WINDOW):
            result = compiled(variables, images)
        jax.block_until_ready(result)
        window_ms.append((time.perf_counter() - t0) / WINDOW * 1e3)
    dt = time.perf_counter() - t_all0

    images_per_sec = BATCH * WINDOW * WINDOWS / dt
    window_ms.sort()
    return (images_per_sec, _percentile(window_ms, 0.50),
            _percentile(window_ms, 0.99), flops_per_batch, det, variables,
            device_ms())


def _bench_scan(cfg, det, variables, k: int = 4):
    """Scan-K dispatch throughput: ONE device program runs ``k``
    back-to-back b32 microbatches via ``lax.scan`` (the daemon's
    ``--scan-depth`` mode, Predictor.predict_dispatch_group). The relay's
    per-dispatch overhead — which does NOT hide behind the ~9 ms device
    step because in-flight is capped through the tunnel — is paid once
    per ``k`` batches, so wall throughput approaches the device rate.
    Returns (images_per_sec, per_batch_ms) or (None, None) off-TPU."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    def predict_k(v, images_k):
        def body(c, imgs):
            out = det.predict(v, imgs)
            return c, (out.boxes, out.scores, out.labels, out.num_boxes)
        _, ys = jax.lax.scan(body, 0, images_k)
        return ys

    if cfg.model.stem_schedule == "dense4":
        from ssd_tpu.ops.ingest import pack_s2d
        base = pack_s2d(np.zeros(
            (k * BATCH, cfg.image_size, cfg.image_size, 3), np.uint8))
        images = jnp.asarray(base).reshape((k, BATCH) + base.shape[1:])
    else:
        images = jnp.zeros(
            (k, BATCH, cfg.image_size, cfg.image_size, 3), jnp.uint8)
    from ssd_tpu.utils.layout import compile_auto_layout
    compiled, stage = compile_auto_layout(predict_k, variables, images)
    if compiled is not None:
        images = stage(images)
    else:  # pragma: no cover - older jax / no relayout support
        compiled = jax.jit(predict_k).lower(variables, images).compile()

    for _ in range(WARMUP):
        jax.block_until_ready(compiled(variables, images))
    calls = max(WINDOW // k, 1)
    window_ms = []
    t0_all = time.perf_counter()
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        r = None
        for _ in range(calls):
            r = compiled(variables, images)
        jax.block_until_ready(r)
        window_ms.append((time.perf_counter() - t0) / (calls * k) * 1e3)
    dt = time.perf_counter() - t0_all
    window_ms.sort()
    return (BATCH * k * calls * WINDOWS / dt,
            _percentile(window_ms, 0.50))


def main() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ssd_tpu.config import Config
    from ssd_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    # The flagship configuration: MobileNet-v1-FPN 640 with the TPU-native
    # dense4 stem schedule — measured faster AND more accurate than the
    # reference stem (BENCHMARKS.md round 3: +21% serve, +55% train,
    # +0.038 mAP on the crowded-scene A/B).
    cfg = Config(num_classes=80, image_size=640)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem_schedule="dense4"))
    (bf16_img_s, bf16_p50, bf16_p99, flops_per_batch, det,
     variables, bf16_dev_ms) = _bench_config(cfg)
    mfu = flops_per_batch / (bf16_p50 * 1e-3) / PEAK_BF16_FLOPS

    # The shipped SERVING configuration: + full-path int8 PTQ (exact-integer
    # stem; BENCHMARKS.md round 4: -0.0009 mAP on the crowded soak).
    cfg8 = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, compute_dtype="int8", int8_neck=True))
    images_per_sec, p50, p99 = bf16_img_s, bf16_p50, bf16_p99
    mxu_util_int8 = int8_dev_ms = None
    serve_det, serve_vars, serve_cfg = det, variables, cfg
    try:
        (images_per_sec, p50, p99, flops8, serve_det, serve_vars,
         int8_dev_ms) = _bench_config(cfg8)
        serve_cfg = cfg8
        # int8 peak is 2x bf16 on v5e; cost analysis counts the same
        # MACs, so utilization is vs the 394 TOPS int8 roof
        mxu_util_int8 = flops8 / (p50 * 1e-3) / (2 * PEAK_BF16_FLOPS)
    except Exception:  # pragma: no cover - keep the headline robust
        pass

    # ---- postprocess (candidate selection + NMS) sub-program, standalone
    # (bf16 model: the int8 path shares the identical postprocess program).
    from ssd_tpu.ops.postprocess import postprocess_cells

    images = jnp.zeros((BATCH, cfg.image_size, cfg.image_size, 3), jnp.uint8)
    raw_levels = jax.block_until_ready(det.model.apply(
        variables, images, train=False, flatten=False, raw_input=True))

    from ssd_tpu.models.detector import nms_use_pallas

    def post(raw_levels):
        out = postprocess_cells(raw_levels, det.anchors, cfg.num_classes,
                                cfg.nms, use_pallas=nms_use_pallas(cfg.nms))
        return out.boxes, out.scores, out.labels, out.num_boxes

    post_c = jax.jit(post).lower(raw_levels).compile()
    for _ in range(WARMUP):
        jax.block_until_ready(post_c(raw_levels))
    post_ms = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        r = None
        for _ in range(WINDOW):
            r = post_c(raw_levels)
        jax.block_until_ready(r)
        post_ms.append((time.perf_counter() - t0) / WINDOW * 1e3)
    post_ms.sort()

    ref = FALLBACK_REFERENCE_IMG_PER_S
    if os.path.exists(REF_FILE):
        with open(REF_FILE) as f:
            ref = float(json.load(f)["images_per_sec"])

    # ---- scan-K dispatch (the serve daemon's --scan-depth throughput
    # mode): amortizes the relay's per-dispatch overhead over K batches;
    # headlined when faster, since it is a shipped serving path and the
    # plain-dispatch wall number is relay-state-dependent (see the
    # device-rate fields below). p50_batch_ms stays the PLAIN per-call
    # latency quantile; scan fields carry their own per-batch time.
    scan_ips = scan_ms = None
    try:
        scan_ips, scan_ms = _bench_scan(serve_cfg, serve_det, serve_vars)
    except Exception:  # pragma: no cover - keep the headline robust
        pass

    dispatch, plain_ips = "plain", images_per_sec
    if scan_ips is not None and scan_ips > images_per_sec:
        dispatch = "scan4"
        images_per_sec = scan_ips
        if mxu_util_int8 is not None:
            mxu_util_int8 = flops8 / (scan_ms * 1e-3) / (2 * PEAK_BF16_FLOPS)

    # ---- accuracy smoke (machine-captured mAP drift detector): the
    # committed tiny artifact scored on its seed-derived val scenes, bf16
    # AND through the real int8 calibration path (eval/sanity.py). The
    # absolute value is task-specific; only round-over-round drift on the
    # same protocol is meaningful.
    sanity_bf16 = sanity_int8 = None
    try:
        from ssd_tpu.eval.sanity import evaluate_artifact_map
        sanity_bf16 = evaluate_artifact_map()
        sanity_int8 = evaluate_artifact_map(int8=True)
    except Exception:  # pragma: no cover - keep the headline robust
        pass

    # Metric name carries the serving dtype (ADVICE r4): the headline is
    # the SHIPPED serving config (int8 when it built), and renaming keeps
    # the cross-round time series honest — int8 rows never masquerade as
    # the bf16 series (bf16_* fields carry that series alongside).
    metric = "images_per_sec_per_chip_640x640_b32_mobilenet_fpn"
    if mxu_util_int8 is not None:
        metric += "_int8"
    out = {
        "metric": metric,
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / ref, 2),
        "bf16_vs_baseline": round(bf16_img_s / ref, 2),
        "p50_batch_ms": round(p50, 3),
        "p99_batch_ms": round(p99, 3),
        "p50_postprocess_ms": round(_percentile(post_ms, 0.50), 3),
        "bf16_images_per_sec": round(bf16_img_s, 2),
        "bf16_p50_batch_ms": round(bf16_p50, 3),
        "mfu_bf16": round(mfu, 4),
        "gflops_per_image": round(flops_per_batch / BATCH / 1e9, 2),
        "batch": BATCH,
        "serving_dtype": "int8" if mxu_util_int8 is not None else "bfloat16",
        "dispatch": dispatch,
    }
    if scan_ips is not None:
        out["scan4_images_per_sec"] = round(scan_ips, 2)
        out["scan4_per_batch_ms"] = round(scan_ms, 3)
        out["plain_images_per_sec"] = round(plain_ips, 2)
    if mxu_util_int8 is not None:
        out["mxu_util_int8"] = round(mxu_util_int8, 4)
    # DEVICE time per batch (XProf-traced) + the implied device-rate
    # throughput: wall minus device is pure host->device dispatch
    # overhead, which through a tunneled chip oscillates ~1-18 ms/call
    # with tunnel load (round 5). Local deployments sit near the device
    # rate; the wall fields above are the conservative through-a-tunnel
    # measurement.
    if int8_dev_ms is not None:
        out["p50_device_ms"] = round(int8_dev_ms, 3)
        out["device_images_per_sec"] = round(BATCH / (int8_dev_ms * 1e-3), 2)
    if bf16_dev_ms is not None:
        out["bf16_p50_device_ms"] = round(bf16_dev_ms, 3)
    if sanity_bf16 is not None:
        out["sanity_map"] = round(sanity_bf16, 4)
    if sanity_int8 is not None:
        out["sanity_map_int8"] = round(sanity_int8, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
