"""Host-side input pipeline: tfrecords -> batched device-ready arrays.

TPU-native counterpart of the reference's ``src/input_pipeline/pipeline.py``
(SURVEY.md §2 "Input pipeline" row). The reference builds a ``tf.data``
graph; here the pipeline is an explicit, deterministic, exactly-resumable
host loader feeding static-shape uint8 batches:

  * an offset index over all shards enables random access; each epoch is a
    seeded permutation of example indices — iterator state is just
    ``(epoch, position)``, checkpointed alongside the train state so resume
    replays the exact example sequence (SURVEY.md §5 checkpoint/resume);
  * jpeg decode runs in the native C++ thread pool
    (ssd_tpu/data/native.py); SSD crop/flip/color augmentation in numpy;
    resize in C++; images ship to device as uint8 (normalize on-chip);
  * multi-host sharding: host ``i`` of ``k`` owns example indices with
    ``idx %% k == i`` — per-host disjoint streams with no coordination;
  * a background prefetch thread double-buffers the next batch so device
    step time and host data time overlap.

Batch contract: ``images (B, S, S, 3) uint8``, ``boxes (B, M, 4) float32``
(zero-padded), ``labels (B, M) int32``, ``num_boxes (B,) int32``; eval
batches additionally carry ``valid (B,) bool`` — the tail batch is padded
to the static batch size (never dropped, never duplicated) and ``valid``
marks the real rows.
"""

from __future__ import annotations

import glob as globlib
import queue
import threading

import numpy as np

from ssd_tpu.config import Config
from ssd_tpu.data import native
from ssd_tpu.data.augment import augment_example
from ssd_tpu.data.tfrecord import decode_detection_record, record_offsets


class ShardIndex:
    """Random-access index over a set of tfrecord shards."""

    def __init__(self, files: list[str]):
        if not files:
            raise FileNotFoundError("no tfrecord files given")
        self.files = sorted(files)
        self._handles: dict[int, object] = {}
        self.entries: list[tuple[int, int, int]] = []  # (file_idx, offset, len)
        for fi, path in enumerate(self.files):
            # C++ walker (GIL-free, header-CRC-checked) with Python fallback
            entries = native.tfrecord_index(path)
            if entries is None:
                entries = record_offsets(path)
            for off, length in entries:
                self.entries.append((fi, off, length))

    def __len__(self) -> int:
        return len(self.entries)

    def read(self, idx: int) -> bytes:
        fi, off, length = self.entries[idx]
        handle = self._handles.get(fi)
        if handle is None:
            handle = open(self.files[fi], "rb")
            self._handles[fi] = handle
        handle.seek(off)
        return handle.read(length)


class Pipeline:
    """Deterministic, resumable batched loader."""

    def __init__(
        self,
        file_pattern: str | list[str],
        cfg: Config,
        is_training: bool = True,
        batch_size: int | None = None,
        host_id: int = 0,
        num_hosts: int = 1,
        seed: int = 0,
        prefetch: int = 2,
    ):
        files = (
            sorted(globlib.glob(file_pattern))
            if isinstance(file_pattern, str) else list(file_pattern)
        )
        self.index = ShardIndex(files)
        self.cfg = cfg
        self.is_training = is_training
        self.batch_size = batch_size or cfg.train.batch_size
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0      # production cursor (prefetch thread)
        self.position = 0
        self.consumed = 0   # batches actually handed to the consumer
        # host-local example ids
        self._local = np.arange(len(self.index))[host_id::num_hosts]
        if self.is_training and len(self._local) < self.batch_size:
            # tiny datasets: repeat to fill one batch
            reps = -(-self.batch_size // max(len(self._local), 1))
            self._local = np.tile(self._local, reps)
        if not self.is_training:
            # Eval must cover every example exactly once: the final partial
            # batch is PADDED (``valid`` mask carries which rows are real),
            # never dropped, and examples are never duplicated. All hosts
            # run the same number of batches (padding with invalid rows) so
            # multi-host lockstep eval cannot deadlock on unequal tails.
            largest_host = -(-len(self.index) // num_hosts)
            self._eval_batches = -(-largest_host // self.batch_size)

    # ------------------------------------------------------------ state

    def state(self) -> dict:
        """Exact-resume state, derived from CONSUMED batches (the prefetch
        thread's production cursor runs ahead; checkpointing that would skip
        prefetched-but-unconsumed batches on resume)."""
        nb = max(self.batches_per_epoch(), 1)
        return {"epoch": self.consumed // nb, "position": self.consumed % nb,
                "seed": self.seed}

    def restore(self, state: dict) -> None:
        self.seed = int(state["seed"])
        nb = max(self.batches_per_epoch(), 1)
        self.consumed = int(state["epoch"]) * nb + int(state["position"])
        self.epoch = self.consumed // nb
        self.position = self.consumed % nb

    # ------------------------------------------------------------ epochs

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = self._local
        if self.is_training:
            rng = np.random.default_rng((self.seed, epoch))
            order = rng.permutation(order)
        return order

    def batches_per_epoch(self) -> int:
        if not self.is_training:
            return self._eval_batches
        return len(self._local) // self.batch_size

    # ------------------------------------------------------------ build

    def _scale_for(self, ordinal: int) -> tuple[int, int]:
        """Train resolution for the batch with this global ordinal.

        Pure function of the ordinal (epoch * batches_per_epoch + position),
        so the multi-scale schedule replays exactly on resume and is safe
        to evaluate inside the prefetch thread."""
        ms = self.cfg.train.multiscale
        if not self.is_training or not ms:
            return self.cfg.image_hw()
        s = ms[(ordinal // max(self.cfg.train.multiscale_every, 1)) % len(ms)]
        return (s, s)

    def _make_batch(self, example_ids: np.ndarray, epoch: int,
                    image_hw: tuple[int, int] | None = None) -> dict:
        cfg = self.cfg
        ih, iw = image_hw or cfg.image_hw()
        m = cfg.data.max_gt_boxes
        # Eval pads short (tail) batches to the static batch size; ``valid``
        # marks the real rows. Training ids always fill the batch.
        n_real = len(example_ids)
        b = n_real if self.is_training else self.batch_size

        payloads = [self.index.read(i) for i in example_ids]
        decoded = [decode_detection_record(p) for p in payloads]
        jpegs = [d["jpeg"] for d in decoded]

        images_out = np.zeros((b, ih, iw, 3), np.uint8)
        boxes_out = np.zeros((b, m, 4), np.float32)
        labels_out = np.zeros((b, m), np.int32)
        num_out = np.zeros((b,), np.int32)

        if self.is_training:
            # full-size decode -> augment (crop/flip/color) -> resize.
            # Thread-parallel: the native decode/resize calls release the
            # GIL, and each example's RNG is seeded by its id, so results
            # are identical regardless of thread scheduling.
            import concurrent.futures

            # Mosaic partners are chosen and read serially up front (the
            # draw rides the same (seed, epoch, id) determinism, so the
            # stream replays exactly on resume); workers only decode.
            mosaic_extra = [None] * b
            if cfg.data.mosaic_probability > 0.0:
                for j in range(n_real):
                    mrng = np.random.default_rng(
                        (self.seed, epoch, int(example_ids[j]), 0x90A51C))
                    if mrng.random() < cfg.data.mosaic_probability:
                        ids = self._local[
                            mrng.integers(0, len(self._local), 3)]
                        mosaic_extra[j] = [
                            decode_detection_record(self.index.read(int(i)))
                            for i in ids]

            def _clean(d):
                # crowd annotations never become training targets (the
                # reference drops them at dataset creation; we keep them
                # in the records for eval-time ignore regions)
                keep = d["is_crowd"] == 0
                if keep.all():
                    return d["boxes"], d["labels"]
                return d["boxes"][keep], d["labels"][keep]

            def one(j):
                d = decoded[j]
                boxes, labels = _clean(d)
                img = native.decode_jpeg(d["jpeg"])
                rng = np.random.default_rng(
                    (self.seed, epoch, int(example_ids[j]))
                )
                if mosaic_extra[j] is not None:
                    from ssd_tpu.data.augment import mosaic_example
                    parts = [(img, boxes, labels)]
                    for ex in mosaic_extra[j]:
                        eb, el = _clean(ex)
                        parts.append((native.decode_jpeg(ex["jpeg"]), eb, el))
                    img, boxes, labels = mosaic_example(
                        [p[0] for p in parts], [p[1] for p in parts],
                        [p[2] for p in parts], rng, (ih, iw))
                img, boxes, labels = augment_example(
                    img, boxes, labels, rng, cfg.data
                )
                images_out[j] = native.resize(img, ih, iw)
                k = min(len(boxes), m)
                if k:
                    boxes_out[j, :k] = np.clip(boxes[:k], 0.0, 1.0)
                    labels_out[j, :k] = labels[:k]
                num_out[j] = k

            workers = max(1, min(cfg.data.num_workers, b))
            if workers == 1:
                for j in range(b):
                    one(j)
            else:
                with concurrent.futures.ThreadPoolExecutor(workers) as pool:
                    list(pool.map(one, range(b)))
        else:
            if jpegs:
                images_out[:n_real] = native.decode_jpeg_batch(
                    jpegs, ih, iw, n_threads=cfg.data.num_workers
                )
            crowd_out = np.zeros((b, m), bool)
            for j, d in enumerate(decoded):
                boxes, labels = d["boxes"], d["labels"]
                k = min(len(boxes), m)
                if k:
                    boxes_out[j, :k] = np.clip(boxes[:k], 0.0, 1.0)
                    labels_out[j, :k] = labels[:k]
                    crowd_out[j, :k] = d["is_crowd"][:k] != 0
                num_out[j] = k

        batch = {
            "images": images_out,
            "boxes": boxes_out,
            "labels": labels_out,
            "num_boxes": num_out,
        }
        if not self.is_training:
            valid = np.zeros((b,), bool)
            valid[:n_real] = True
            batch["valid"] = valid
            # crowd flags ride along for the evaluator's ignore handling
            batch["is_crowd"] = crowd_out
            # identity passthrough for COCO-results interop: the original
            # dataset image id (image/source_id, falling back to the local
            # example index) and the pre-resize image dimensions
            sids = np.full((b,), -1, np.int64)
            ohw = np.zeros((b, 2), np.int32)
            for j, d in enumerate(decoded):
                sid = d["source_id"]
                sids[j] = int(example_ids[j]) if sid is None else sid
                if d["height"] is not None and d["width"] is not None:
                    ohw[j] = (d["height"], d["width"])
                else:
                    # older records don't carry dims: jpeg header read
                    import io as _io

                    from PIL import Image as _Image
                    with _Image.open(_io.BytesIO(jpegs[j])) as im:
                        ohw[j] = (im.size[1], im.size[0])  # (h, w)
            batch["source_ids"] = sids
            batch["orig_hw"] = ohw
        return batch

    # --------------------------------------------------------- iterate

    def _generate(self):
        while True:
            order = self._epoch_order(self.epoch)
            nb = self.batches_per_epoch()
            while self.position < nb:
                pos = self.position
                ids = order[
                    pos * self.batch_size:(pos + 1) * self.batch_size
                ]
                # advance BEFORE yielding: a handed-out batch counts as
                # consumed, so checkpointed state never replays it
                self.position = pos + 1
                yield self._make_batch(
                    ids, self.epoch,
                    image_hw=self._scale_for(self.epoch * nb + pos))
            if not self.is_training:
                return
            self.epoch += 1
            self.position = 0

    def __iter__(self):
        """Prefetching iterator (daemon thread keeps the device fed)."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # An error in the prefetch thread must surface in the consumer
            # (a silently-dead producer looks like a clean end-of-data —
            # eval would report nan mAP over zero batches instead of the
            # real traceback).
            try:
                for batch in self._generate():
                    if stop.is_set():
                        return
                    q.put(batch)
                q.put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                self.consumed += 1
                yield batch
        finally:
            stop.set()
