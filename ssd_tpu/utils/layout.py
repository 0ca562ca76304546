"""Guarded AUTO input-layout feed — shared by bench.py and the serving
layer (Predictor, StreamingDetector).

AUTO input layout: XLA picks the image layout the stem conv wants, so no
relayout copy runs inside the program (~0.5 ms/batch at b32/640 — the
difference between the 2649 and 2518 img/s int8 states in BENCHMARKS.md
round 4); the one-time ``device_put`` writes that layout on transfer.

``device_put`` can SILENTLY produce a different layout when the runtime's
relayout path does not support the requested tiling (observed through the
tunneled device: asking for major_to_minor=(1,2,3,0)/(4,128) uint8
returned (0,3,1,2)/(8,128), and the subsequent call raised a
layout-mismatch ValueError), so this helper verifies the produced layout
and runs one guarded call before trusting the AUTO path; on any failure
the caller keeps the default-layout program (the relayout copy then runs
inside it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compile_auto_layout(predict, variables, images):
    """Compile ``predict(variables, images)`` with AUTO layout on images.

    Returns ``(compiled, stage)`` where ``stage(imgs)`` device_puts a host
    batch into the layout the compiled program wants — or ``(None, None)``
    when the AUTO path is unavailable (non-TPU backend, older jax, or a
    runtime that cannot materialize the requested tiling). The guarded
    verification call doubles as the warmup execution.
    """
    try:
        from jax.experimental.layout import Format, Layout
        jf = jax.jit(predict, in_shardings=(None, Format(Layout.AUTO)))
        compiled = jf.lower(variables, images).compile()
        want = compiled.input_formats[0][1]
        staged = jax.device_put(jnp.asarray(images), want)
        if staged.format.layout != want.layout:
            raise ValueError("runtime cannot materialize the AUTO layout")
        jax.block_until_ready(compiled(variables, staged))

        def stage(imgs):
            return jax.device_put(jnp.asarray(imgs), want)

        return compiled, stage
    except Exception:  # pragma: no cover - platform/runtime dependent
        return None, None


def want_auto_layout() -> bool:
    """Only TPU backends have a layout worth staging for."""
    return jax.default_backend() in ("tpu", "axon")
