"""High-resolution streaming inference (BASELINE config 5: 1024x1024).

The framework's "context scaling" story (SURVEY.md §5 long-context row):
resolution is the detector's scale axis. The static-shape pipeline compiles
once per (resolution, batch); this module adds the streaming runtime around
it for video-frame-rate serving:

  * a bounded in-flight window (default 2) of dispatched-but-unfetched
    steps — the host uploads frame N+1 and the device runs frame N
    concurrently (JAX dispatch is async; blocking only happens on result
    fetch), hiding host->device copy behind compute;
  * uint8 frames over PCIe (4x cheaper than float), normalize on-chip;
  * per-frame latency and throughput accounting.

Usage:
    s = StreamingDetector(cfg, variables)     # cfg.image_size = 1024
    for frame in video:                        # uint8 (H, W, 3)
        for det in s.push(frame): consume(det)
    for det in s.flush(): consume(det)
"""

from __future__ import annotations

import collections
import time

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config
from ssd_tpu.models.detector import Detector


class StreamingDetector:
    def __init__(self, cfg: Config, variables: dict, depth: int = 2,
                 mesh=None, spatial_shard: bool = False):
        """``mesh`` + ``spatial_shard=True``: shard each frame's HEIGHT
        axis over the mesh's ``model`` axis — beyond-HBM resolutions run
        with 1/model-axis activation memory per chip, GSPMD inserting the
        conv halo exchanges (SURVEY.md §5 long-context row). Frame height
        must divide by the model-axis size."""
        self.cfg = cfg
        self.detector = Detector(cfg)
        self.variables = variables
        self.depth = depth
        self.mesh = mesh
        if mesh is not None and spatial_shard:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ssd_tpu.parallel.mesh import MODEL_AXIS, replicated
            if cfg.image_hw()[0] % mesh.shape[MODEL_AXIS]:
                raise ValueError(
                    f"frame height {cfg.image_hw()[0]} not divisible by "
                    f"model axis {mesh.shape[MODEL_AXIS]}")
            self.variables = jax.device_put(variables, replicated(mesh))
            self._predict = jax.jit(
                lambda v, im: self.detector.predict(v, im[None]),
                in_shardings=(replicated(mesh),
                              NamedSharding(mesh, P(MODEL_AXIS))),
                out_shardings=replicated(mesh),
            )
        else:
            self._predict = jax.jit(
                lambda v, im: self.detector.predict(v, im[None])
            )
        self._stage = jnp.asarray
        # Packed ingest (ops/ingest.py): dense4 frames are space-to-
        # depth(4)-packed s8 on host (native C++ kernel), so the
        # per-frame program skips the pack conv + raw-frame relayout copy
        # (same auto rule as Predictor; int8 bit-identical, bf16 equal up
        # to conv summation order).
        self._packed = (cfg.model.stem_schedule == "dense4"
                        and not cfg.model.stem_space_to_depth
                        and not (mesh is not None and spatial_shard))
        self._inflight: collections.deque = collections.deque()
        self._lat = collections.deque(maxlen=256)
        self._done_t = collections.deque(maxlen=256)  # result-fetch times

    def _ingest(self, frame: np.ndarray) -> np.ndarray:
        if self._packed:
            from ssd_tpu.data.native import pack_s2d
            return pack_s2d(frame[None])[0]
        return frame

    def warmup(self) -> None:
        ih, iw = self.cfg.image_hw()
        if self._packed:
            from ssd_tpu.ops.ingest import packed_shape
            dummy = jnp.zeros(packed_shape((ih, iw)), jnp.int8)
        else:
            dummy = jnp.zeros((ih, iw, 3), jnp.uint8)
        if self.mesh is None:
            # guarded AUTO-layout feed (utils/layout.py): stage each frame
            # in the stem conv's preferred layout so no relayout copy runs
            # inside the per-frame program
            from ssd_tpu.utils.layout import (compile_auto_layout,
                                              want_auto_layout)
            if want_auto_layout():
                compiled, stage = compile_auto_layout(
                    lambda v, im: self.detector.predict(v, im[None]),
                    self.variables, dummy)
                if compiled is not None:
                    self._predict, self._stage = compiled, stage
                    return
        out = self._predict(self.variables, dummy)
        jax.block_until_ready(out)

    def _fetch_one(self) -> dict:
        t0, out = self._inflight.popleft()
        out = jax.device_get(out)
        now = time.perf_counter()
        self._lat.append(now - t0)
        self._done_t.append(now)
        return {
            "boxes": np.asarray(out.boxes)[0],
            "scores": np.asarray(out.scores)[0],
            "labels": np.asarray(out.labels)[0],
            "num_boxes": int(np.asarray(out.num_boxes)[0]),
        }

    def push(self, frame: np.ndarray):
        """Submit one uint8 frame; yields any completed detections."""
        ih, iw = self.cfg.image_hw()
        if frame.shape[:2] != (ih, iw):
            from ssd_tpu.data import native
            frame = native.resize(np.ascontiguousarray(frame), ih, iw)
        out = self._predict(self.variables, self._stage(self._ingest(frame)))
        # Queue the device->host copy NOW (it runs as soon as the step
        # finishes) so _fetch_one's device_get finds the data already on
        # host instead of paying a blocking round trip per frame — through
        # a tunneled/remote device that round trip dominated the measured
        # frame rate (round-1: 10 fps RPC-bound at 1024px).
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except AttributeError:  # non-array leaf / older jax
                pass
        self._inflight.append((time.perf_counter(), out))
        while len(self._inflight) > self.depth:
            yield self._fetch_one()

    def flush(self):
        while self._inflight:
            yield self._fetch_one()

    def stats(self) -> dict:
        lat = sorted(self._lat)
        if not lat:
            return {}
        out = {
            "p50_latency_s": lat[len(lat) // 2],
            "p95_latency_s": lat[int(len(lat) * 0.95)],
        }
        if len(self._done_t) >= 2:
            # measured completion rate over the recent window (frames
            # fetched per wall-second), not a latency/depth heuristic
            span = self._done_t[-1] - self._done_t[0]
            out["fps"] = (len(self._done_t) - 1) / max(span, 1e-9)
        return out
