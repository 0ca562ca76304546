"""Inference front-end: the reference's public ``predict`` contract.

TPU-native counterpart of the reference's export + notebook path (SURVEY.md
§3.2/§3.3, L6/L7): instead of a frozen SavedModel, "export" is an orbax
params checkpoint + the config JSON; ``Predictor`` loads them and serves a
jit-compiled ``predict`` whose signature matches the reference:

    predict(images uint8 (N, H, W, 3)) ->
        {boxes (N, max_boxes, 4), scores (N, max_boxes),
         labels (N, max_boxes), num_boxes (N,)}

Host-side resize to the static model resolution is done here (uint8 in,
uint8 out — 1 byte/px over PCIe); normalization runs on-device. Each
(resolution, batch) pair compiles exactly once and is cached.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config
from ssd_tpu.data import native
from ssd_tpu.models.detector import Detector


def _as_hw(size) -> tuple[int, int]:
    return (size, size) if isinstance(size, int) else tuple(size)


def resize_image(image: np.ndarray, size_hw) -> np.ndarray:
    """Bilinear uint8 resize on host, matching the train/eval decode path
    (native C++ kernel, PIL fallback) — a nearest-neighbor serve-time resize
    would be a parity gap vs the bilinear the model was trained on.
    ``size_hw``: square int or (height, width)."""
    th, tw = _as_hw(size_hw)
    return native.resize(np.ascontiguousarray(image), th, tw)


def letterbox_image(image: np.ndarray,
                    size_hw: tuple[int, int]) -> tuple[np.ndarray, float, float]:
    """Aspect-preserving bilinear resize onto a (possibly rectangular)
    canvas (zero padding at the bottom/right). Returns
    (canvas, valid_h_frac, valid_w_frac)."""
    h, w = image.shape[:2]
    th, tw = _as_hw(size_hw)
    scale = min(th / h, tw / w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    nh, nw = min(nh, th), min(nw, tw)
    canvas = np.zeros((th, tw, 3), np.uint8)
    canvas[:nh, :nw] = native.resize(np.ascontiguousarray(image), nh, nw)
    return canvas, nh / th, nw / tw


class Predictor:
    """Loads a detector + params and serves batched inference.

    ``preserve_aspect=True`` letterboxes inputs (no distortion; the
    reference's square resize distorts) and maps output boxes back to the
    original image frame.
    """

    def __init__(self, cfg: Config, variables: dict,
                 label_map: dict[int, str] | None = None,
                 preserve_aspect: bool = False,
                 mesh=None, spatial_shard: bool = False,
                 packed_ingest: bool | None = None):
        """``mesh``: an optional ``jax.sharding.Mesh`` (or True to build
        one over all visible devices) for DATA-PARALLEL serving: batches
        shard over the ``data`` axis, params replicate, and XLA runs one
        SPMD predict across the slice — the multi-chip serving analog of
        the DP train step.

        ``spatial_shard``: additionally shard the image HEIGHT axis over
        the mesh's ``model`` axis — the framework's beyond-HBM resolution
        story (SURVEY.md §5 long-context row): when a single chip cannot
        hold a resolution's activations, GSPMD splits every conv spatially
        (halo exchanges over ICI are inserted by XLA) so per-chip
        activation memory scales 1/model-axis. H must be divisible by the
        model-axis size. Detections are bitwise-equivalent to replicated
        execution up to float reduction order (equality-tested on the
        virtual mesh)."""
        self.cfg = cfg
        self.detector = Detector(cfg)
        self.variables = variables
        self.label_map = label_map
        self.preserve_aspect = preserve_aspect
        # Packed ingest (ops/ingest.py): for dense4 serving configs the
        # feed delivers the space-to-depth(4)-packed s8 tensor the stem
        # consumes directly — the serve program drops the pack conv + the
        # raw image's relayout copy (int8: ~1.2 ms at b32/640, bit-
        # identical; bf16/f32: ~1.5 ms, same values up to conv summation
        # order — the -128 shift moves into the border correction map).
        # The host pack runs in the native C++ loader.
        # ``packed_ingest=None`` -> auto; False forces the raw uint8 feed.
        if packed_ingest is None:
            packed_ingest = (cfg.model.stem_schedule == "dense4"
                             and not cfg.model.stem_space_to_depth
                             and not spatial_shard)
        self._packed = bool(packed_ingest)
        self._jitted = {}
        if mesh is True:
            from ssd_tpu.parallel import create_mesh
            mesh = create_mesh()
        self.mesh = mesh
        self.spatial_shard = spatial_shard
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ssd_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                               batch_sharding, replicated)
            if spatial_shard:
                if cfg.image_hw()[0] % mesh.shape[MODEL_AXIS]:
                    raise ValueError(
                        f"image height {cfg.image_hw()[0]} not divisible by "
                        f"model axis {mesh.shape[MODEL_AXIS]}")
                self._batch_sharding = NamedSharding(
                    mesh, P(DATA_AXIS, MODEL_AXIS))
            else:
                self._batch_sharding = batch_sharding(mesh)
            self.variables = jax.device_put(variables, replicated(mesh))
        elif spatial_shard:
            raise ValueError("spatial_shard requires a mesh")

    # -------------------------------------------------------------- factory

    @classmethod
    def from_checkpoint(cls, path: str) -> "Predictor":
        import json
        import os

        from ssd_tpu.export import load_inference_artifact
        cfg, variables = load_inference_artifact(path)
        label_map = None
        map_path = os.path.join(path, "label_map.json")
        if os.path.exists(map_path):
            with open(map_path) as f:
                label_map = {int(k): v for k, v in json.load(f).items()}
        return cls(cfg, variables, label_map)

    # -------------------------------------------------------------- serving

    def _fn_for_batch(self, n: int):
        """-> (callable, stage) for a batch bucket; ``stage`` puts host
        images in the input layout the compiled program wants (the guarded
        AUTO-layout feed — utils/layout.py; ~0.5 ms/batch at b32/640)."""
        if n not in self._jitted:
            if self.mesh is None:
                fn, stage = jax.jit(self.detector.predict), jnp.asarray
                from ssd_tpu.utils.layout import (compile_auto_layout,
                                                  want_auto_layout)
                if want_auto_layout():
                    dummy = jnp.zeros(self._feed_shape(n), self._feed_dtype())
                    compiled, st = compile_auto_layout(
                        self.detector.predict, self.variables, dummy)
                    if compiled is not None:
                        fn, stage = compiled, st
                self._jitted[n] = (fn, stage)
            else:
                from ssd_tpu.parallel.mesh import replicated
                mesh = self.mesh  # static: the NMS kernel shard_maps over
                #                   the data axis (NMSConfig.use_pallas)
                fn = jax.jit(
                    lambda v, im: self.detector.predict(v, im, mesh=mesh),
                    in_shardings=(replicated(self.mesh),
                                  self._batch_sharding),
                    out_shardings=replicated(self.mesh),
                )
                self._jitted[n] = (fn, jnp.asarray)
        return self._jitted[n]

    def _feed_shape(self, n: int) -> tuple:
        """Static device-feed shape for a bucket: packed or raw."""
        if self._packed:
            from ssd_tpu.ops.ingest import packed_shape
            return packed_shape(self.cfg.image_hw(), n)
        return (n,) + self.cfg.image_hw() + (3,)

    def _feed_dtype(self):
        return jnp.int8 if self._packed else jnp.uint8

    def _feed(self, images: np.ndarray) -> np.ndarray:
        """Host-side ingest transform: raw uint8 batch -> device feed."""
        if self._packed:
            from ssd_tpu.data.native import pack_s2d
            return pack_s2d(images)
        return images

    def _min_bucket(self) -> int:
        """Buckets must be divisible by the data-axis size when sharded."""
        if self.mesh is None:
            return 1
        from ssd_tpu.parallel.mesh import DATA_AXIS
        return int(self.mesh.shape[DATA_AXIS])

    def _bucket_for(self, n: int) -> int:
        """Compilation bucket for a batch of n: next power of two, rounded
        up to a multiple of the data-axis size (a pow2 alone isn't divisible
        by e.g. a 6-device axis)."""
        bucket = 1 << (max(n, 1) - 1).bit_length()
        m = self._min_bucket()
        return -(-bucket // m) * m

    def __call__(self, images) -> dict:
        return self.predict(images)

    def predict(self, images) -> dict:
        """images: uint8 array (H, W, 3) or (N, H, W, 3) — or a LIST of
        (H, W, 3) arrays with per-image resolutions (each is resized/
        letterboxed to the model resolution, then the whole set runs as ONE
        batched call).

        Arbitrary batch sizes are padded up to the next power of two so the
        number of distinct compilations stays logarithmic in serving batch
        variety (one compile per bucket, not per size).
        """
        return self.predict_collect(self.predict_dispatch(images))

    def predict_dispatch(self, images) -> dict:
        """First half of ``predict``: preprocess + issue the device call
        WITHOUT waiting for the result (jax dispatch is async). Returns an
        opaque handle for ``predict_collect``. Splitting the two lets a
        serving loop pipeline the device: dispatch batch k+1 while batch k
        computes, and take result readback off the dispatch thread."""
        if isinstance(images, (list, tuple)):
            single = False
            image_list = [np.asarray(im) for im in images]
        else:
            images = np.asarray(images)
            single = images.ndim == 3
            image_list = [images] if single else list(images)
        hw = self.cfg.image_hw()

        # Pre-packed fast path: an upstream ingest tier (e.g. the serve
        # daemon's handler threads, which pack per image right after the
        # native decode so the cost overlaps across requests) may hand us
        # already-packed (H/4, W/4, 48) s8 tensors — stack, pad, dispatch.
        if self._packed and image_list and all(
                im.ndim == 3 and im.dtype == np.int8
                and im.shape == self._feed_shape(1)[1:]
                for im in image_list):
            packed = np.stack(image_list)
            n = packed.shape[0]
            bucket = self._bucket_for(n)
            if bucket != n:
                packed = np.concatenate([packed, np.zeros(
                    (bucket - n,) + packed.shape[1:], np.int8)])
            fn, stage = self._fn_for_batch(bucket)
            out = fn(self.variables, stage(packed))
            return {"out": out, "n": n, "valid_frac": None, "single": single}
        valid_frac = None
        if self.preserve_aspect:
            canvases, fracs = [], []
            for im in image_list:
                canvas, fh, fw = letterbox_image(im, hw)
                canvases.append(canvas)
                fracs.append((fh, fw))
            images = np.stack(canvases)
            valid_frac = np.asarray(fracs, np.float32)  # (N, 2)
        else:
            images = np.stack([
                im if im.shape[:2] == hw else resize_image(im, hw)
                for im in image_list
            ])
        images = images.astype(np.uint8)

        n = images.shape[0]
        bucket = self._bucket_for(n)
        if bucket != n:
            images = np.concatenate(
                [images, np.zeros((bucket - n,) + images.shape[1:], np.uint8)]
            )

        fn, stage = self._fn_for_batch(bucket)
        out = fn(self.variables, stage(self._feed(images)))
        return {"out": out, "n": n, "valid_frac": valid_frac,
                "single": single}

    # ------------------------------------------------- scan-group dispatch

    def _fn_for_scan(self, n: int, k: int):
        """Compiled scan-of-``k``-microbatches predict for bucket ``n``.

        One device program runs ``k`` back-to-back microbatches via
        ``lax.scan`` (the body compiles once), so the host pays ONE
        dispatch for ``k`` batches. Through a relay/tunnel whose
        per-dispatch overhead does not hide behind an ~9 ms device step
        (in-flight is capped), this recovers the device-rate throughput
        in wall time — see BENCHMARKS.md round 5. Single-device only
        (meshed serving keeps per-batch dispatch).
        """
        key = (n, "scan", k)
        if key not in self._jitted:
            if self.mesh is not None:
                raise ValueError("scan dispatch is single-device only")

            def predict_k(v, images_k):
                def body(c, imgs):
                    out = self.detector.predict(v, imgs)
                    return c, (out.boxes, out.scores, out.labels,
                               out.num_boxes)
                _, ys = jax.lax.scan(body, 0, images_k)
                return ys

            fn, stage = jax.jit(predict_k), jnp.asarray
            from ssd_tpu.utils.layout import (compile_auto_layout,
                                              want_auto_layout)
            if want_auto_layout():
                dummy = jnp.zeros((k,) + self._feed_shape(n),
                                  self._feed_dtype())
                compiled, st = compile_auto_layout(
                    predict_k, self.variables, dummy)
                if compiled is not None:
                    fn, stage = compiled, st
            self._jitted[key] = (fn, stage)
        return self._jitted[key]

    def predict_dispatch_group(self, batches: list) -> dict:
        """Dispatch SEVERAL independent batches as one scan-K device call.

        ``batches``: list of image lists (raw uint8 HxWx3 or pre-packed s8
        — the same per-image forms ``predict_dispatch`` accepts, minus
        letterboxing). All batches are padded to one common bucket.
        Returns a handle for ``predict_collect_group``. With a single
        batch this degenerates to ``predict_dispatch``.
        """
        if len(batches) == 1:
            return {"group": [self.predict_dispatch(batches[0])]}
        hw = self.cfg.image_hw()
        bucket = max(self._bucket_for(max(len(b), 1)) for b in batches)
        feed_shape = self._feed_shape(bucket)
        feeds, ns = [], []
        for batch in batches:
            image_list = [np.asarray(im) for im in batch]
            if self._packed and image_list and all(
                    im.ndim == 3 and im.dtype == np.int8
                    and im.shape == feed_shape[1:] for im in image_list):
                feed = np.stack(image_list)
            else:
                imgs = np.stack([
                    im if im.shape[:2] == hw else resize_image(im, hw)
                    for im in image_list
                ]).astype(np.uint8)
                if imgs.shape[0] != bucket:
                    imgs = np.concatenate([imgs, np.zeros(
                        (bucket - imgs.shape[0],) + imgs.shape[1:],
                        np.uint8)])
                feed = self._feed(imgs)
            if feed.shape[0] != bucket:
                feed = np.concatenate([feed, np.zeros(
                    (bucket - feed.shape[0],) + feed.shape[1:],
                    feed.dtype)])
            feeds.append(feed)
            ns.append(len(batch))
        fn, stage = self._fn_for_scan(bucket, len(batches))
        ys = fn(self.variables, stage(np.stack(feeds)))
        return {"scan": ys, "ns": ns}

    def predict_collect_group(self, handle: dict) -> list[dict]:
        """Block on a ``predict_dispatch_group`` handle -> one result dict
        per batch (same contract as ``predict_collect``)."""
        if "group" in handle:
            return [self.predict_collect(h) for h in handle["group"]]
        boxes, scores, labels, num_boxes = (np.asarray(a)
                                            for a in handle["scan"])
        out = []
        for i, n in enumerate(handle["ns"]):
            out.append({
                "boxes": boxes[i, :n],
                "scores": scores[i, :n],
                "labels": labels[i, :n],
                "num_boxes": num_boxes[i, :n],
            })
            if self.label_map is not None:
                out[-1]["names"] = np.array([
                    [self.label_map.get(int(l), str(int(l))) for l in row]
                    for row in out[-1]["labels"]
                ])
        return out

    def predict_collect(self, handle: dict) -> dict:
        """Second half of ``predict``: block on the device result from
        ``predict_dispatch`` and convert to the public numpy contract."""
        out, n = handle["out"], handle["n"]
        valid_frac, single = handle["valid_frac"], handle["single"]
        boxes = np.asarray(out.boxes)[:n]
        if valid_frac is not None:
            # map letterboxed coords back to the original image frame
            fh = valid_frac[:, 0][:, None, None]
            fw = valid_frac[:, 1][:, None, None]
            boxes = boxes.copy()
            boxes[..., 0::2] = np.clip(boxes[..., 0::2] / fh, 0.0, 1.0)
            boxes[..., 1::2] = np.clip(boxes[..., 1::2] / fw, 0.0, 1.0)
        result = {
            "boxes": boxes,
            "scores": np.asarray(out.scores)[:n],
            "labels": np.asarray(out.labels)[:n],
            "num_boxes": np.asarray(out.num_boxes)[:n],
        }
        if self.label_map is not None:
            result["names"] = np.array([
                [self.label_map.get(int(l), str(int(l))) for l in row]
                for row in result["labels"]
            ])
        if single:
            result = {k: v[0] for k, v in result.items()}
        return result

    def warmup(self, batch_size: int = 1) -> None:
        """Pre-compile for a batch size's bucket (avoids first-call latency)."""
        bucket = self._bucket_for(batch_size)
        dummy = jnp.zeros(self._feed_shape(bucket), self._feed_dtype())
        fn, stage = self._fn_for_batch(bucket)
        jax.block_until_ready(fn(self.variables, stage(dummy)))


def _main() -> None:
    """Batch-predict CLI: images in, JSON detections out.

    python -m ssd_tpu.predictor --export runs/r1/export \
        --images a.jpg b.jpg [--out dets.json] [--batch-size 8] \
        [--score-threshold 0.3] [--letterbox] [--mesh] \
        [--tiled [--tile-overlap 0.25] [--edge-penalty 0.5]]
    """
    import argparse
    import json
    import sys

    from PIL import Image

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("--export", required=True, help="inference artifact dir")
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--out", default=None, help="JSON output (default stdout)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--letterbox", action="store_true",
                   help="preserve aspect ratio (zero-pad) instead of stretch")
    p.add_argument("--mesh", action="store_true",
                   help="shard batches over all visible devices (DP serving)")
    p.add_argument("--tiled", action="store_true",
                   help="native-resolution tiled inference for images far "
                        "above the model resolution (ssd_tpu.tiling)")
    p.add_argument("--tile-overlap", type=float, default=0.25)
    p.add_argument("--edge-penalty", type=float, default=0.5)
    p.add_argument("--tta", action="store_true",
                   help="flip test-time augmentation with weighted box "
                        "fusion (ssd_tpu.tta)")
    args = p.parse_args()
    if args.tta and args.tiled:
        p.error("--tta and --tiled are mutually exclusive")

    from ssd_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    predictor = Predictor.from_checkpoint(args.export)
    predictor.preserve_aspect = args.letterbox
    if args.mesh:
        predictor = Predictor(predictor.cfg, predictor.variables,
                              predictor.label_map, args.letterbox, mesh=True)

    def rows(out, j):
        keep = [i for i in range(int(out["num_boxes"][j]))
                if float(out["scores"][j][i]) >= args.score_threshold]
        return [{
            "box_yxyx": [round(float(v), 4) for v in out["boxes"][j][i]],
            "score": round(float(out["scores"][j][i]), 4),
            "label": int(out["labels"][j][i]),
            **({"name": str(out["names"][j][i])} if "names" in out else {}),
        } for i in keep]

    if args.tta:
        from ssd_tpu.tta import TTAPredictor
        predictor = TTAPredictor(predictor)

    results = []
    if args.tiled:
        from ssd_tpu.tiling import TiledPredictor
        tiler = TiledPredictor(predictor, overlap=args.tile_overlap,
                               edge_penalty=args.edge_penalty)
        # tiles are the batch axis: one device call per image
        for path in args.images:
            out = tiler.predict(np.asarray(Image.open(path).convert("RGB")))
            out = {k: [v] for k, v in out.items()}  # single-image -> batch-1
            results.append({"image": path, "detections": rows(out, 0)})
    else:
        for lo in range(0, len(args.images), args.batch_size):
            chunk = args.images[lo:lo + args.batch_size]
            # ONE batched predict per chunk: each image is resized/
            # letterboxed to the model resolution first, so mixed input
            # sizes are fine — this is the pipelined path the framework is
            # built around, not RPC-bound single-image latency.
            imgs = [np.asarray(Image.open(p).convert("RGB")) for p in chunk]
            out = predictor.predict(imgs)
            for j, path in enumerate(chunk):
                results.append({"image": path, "detections": rows(out, j)})

    text = json.dumps(results, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {sum(len(r['detections']) for r in results)} detections "
              f"for {len(results)} images to {args.out}")
    else:
        sys.stdout.write(text + "\n")


if __name__ == "__main__":
    _main()
