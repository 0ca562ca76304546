"""Tiled inference: grid coverage, coordinate mapping, duplicate fusion.

The tiling layer (ssd_tpu/tiling.py) is pure geometry + one jitted merge
NMS around the standard Predictor, so most tests drive it with a fake
predictor that "detects" bright rectangles deterministically — isolating
the tiling logic from model quality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config, ModelConfig, NMSConfig
from ssd_tpu.tiling import TileGrid, TiledPredictor, tile_origins, _merge_nms


# --------------------------------------------------------------- grid math

@pytest.mark.parametrize("dim,tile,overlap", [
    (640, 256, 0.25), (1000, 256, 0.25), (256, 256, 0.25),
    (100, 256, 0.5), (2555, 640, 0.2), (641, 640, 0.0),
])
def test_tile_origins_cover_everything(dim, tile, overlap):
    origins = tile_origins(dim, tile, overlap)
    covered = np.zeros(dim, bool)
    for o in origins:
        assert 0 <= o and (o + tile >= dim or o + tile <= dim)
        covered[o:o + tile] = True
    assert covered.all()
    if dim > tile:
        assert origins[-1] + tile == dim  # flush to the edge
        stride = np.diff(origins)
        assert (stride <= int(round(tile * (1 - overlap)))).all()


def test_grid_crops_and_padding():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (300, 500, 3)).astype(np.uint8)
    grid = TileGrid.build((300, 500), (256, 256), 0.25)
    crops = grid.crops(img)
    assert crops.shape == (len(grid.origins), 256, 256, 3)
    for i, (y0, x0) in enumerate(grid.origins):
        h = min(256, 300 - y0)
        w = min(256, 500 - x0)
        np.testing.assert_array_equal(crops[i, :h, :w],
                                      img[y0:y0 + h, x0:x0 + w])
        assert (crops[i, h:] == 0).all() and (crops[i, :, w:] == 0).all()


def test_to_global_roundtrip():
    grid = TileGrid.build((1000, 800), (250, 200), 0.2)
    # a box occupying tile-normalized [0.2, 0.3, 0.6, 0.9] of tile i
    for i, (y0, x0) in enumerate(grid.origins):
        g = grid.to_global(i, np.array([[0.2, 0.3, 0.6, 0.9]], np.float32))
        np.testing.assert_allclose(
            g[0],
            [(y0 + 0.2 * 250) / 1000, (x0 + 0.3 * 200) / 800,
             (y0 + 0.6 * 250) / 1000, (x0 + 0.9 * 200) / 800],
            atol=1e-6)


def test_interior_edge_mask():
    """Only borders interior to the IMAGE count: the frame boundary is a
    legitimate box edge, a tile seam is evidence of clipping."""
    grid = TileGrid.build((128, 128), (64, 64), 0.0)  # 2x2, no overlap
    b = np.array([
        [0.0, 0.5, 0.5, 1.0],    # touches top + right of the tile
        [0.2, 0.2, 0.8, 0.8],    # interior of the tile
    ], np.float32)
    # tile 0 = origin (0, 0): its top/left are the image frame, its
    # bottom/right are seams — box 0 touches top(frame)+right(seam)
    assert grid.interior_edge_mask(0, b).tolist() == [True, False]
    # tile 3 = origin (64, 64): top/left are seams, bottom/right frame
    b2 = np.array([
        [0.0, 0.5, 0.5, 1.0],    # touches top(seam) -> clipped
        [0.5, 0.5, 1.0, 1.0],    # touches bottom/right (frame only)
    ], np.float32)
    assert grid.interior_edge_mask(3, b2).tolist() == [True, False]


# ------------------------------------------------------------ merge NMS

def _merge(boxes, scores, labels, iou=0.5, max_boxes=10):
    return _merge_nms(jnp.asarray(boxes, jnp.float32),
                      jnp.asarray(scores, jnp.float32),
                      jnp.asarray(labels, jnp.int32),
                      jnp.float32(iou), jnp.zeros((max_boxes,), jnp.float32))


def test_merge_fuses_same_class_duplicates():
    boxes = np.array([[0.1, 0.1, 0.5, 0.5],
                      [0.11, 0.1, 0.5, 0.51],   # near-duplicate
                      [0.6, 0.6, 0.9, 0.9]], np.float32)
    b, s, l, n = _merge(boxes, [0.9, 0.8, 0.7], [3, 3, 3])
    assert int(n) == 2
    np.testing.assert_allclose(np.asarray(s)[:2], [0.9, 0.7])


def test_merge_keeps_cross_class_overlaps():
    boxes = np.array([[0.1, 0.1, 0.5, 0.5],
                      [0.1, 0.1, 0.5, 0.5]], np.float32)
    b, s, l, n = _merge(boxes, [0.9, 0.8], [1, 2])
    assert int(n) == 2  # identical boxes, different labels: both survive
    assert sorted(np.asarray(l)[:2].tolist()) == [1, 2]


def test_merge_ios_suppresses_contained_fragment():
    """A clipped fragment (IoU 0.5 with the whole box, IoS 1.0) must be
    suppressed under the default ios metric but survive under iou."""
    whole = [0.1, 0.1, 0.5, 0.5]
    frag = [0.1, 0.1, 0.5, 0.26]  # left 40%: IoU = 0.4, IoS = 1.0
    boxes = np.array([whole, frag], np.float32)
    _, _, _, n_ios = _merge(boxes, [0.9, 0.6], [1, 1], iou=0.5)
    assert int(n_ios) == 1
    out = _merge_nms(jnp.asarray(boxes), jnp.asarray([0.9, 0.6], jnp.float32),
                     jnp.asarray([1, 1], jnp.int32), jnp.float32(0.5),
                     jnp.zeros((10,), jnp.float32), metric="iou")
    assert int(out[3]) == 2


def test_merge_ignores_padding_slots():
    boxes = np.zeros((8, 4), np.float32)
    boxes[0] = [0.2, 0.2, 0.4, 0.4]
    scores = np.zeros(8, np.float32)
    scores[0] = 0.5
    labels = np.full(8, -1, np.int32)
    labels[0] = 2
    b, s, l, n = _merge(boxes, scores, labels)
    assert int(n) == 1
    assert int(np.asarray(l)[0]) == 2
    assert (np.asarray(l)[1:] == -1).all()
    assert (np.asarray(s)[1:] == 0).all()


# ------------------------------------------- tiling around a fake predictor

class FakePredictor:
    """Duck-typed Predictor: 'detects' bright rectangles (label = channel
    argmax) in each (H, W, 3) pass deterministically with numpy."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.label_map = None

    def predict(self, images):
        out = {"boxes": [], "scores": [], "labels": [], "num_boxes": []}
        m = self.cfg.nms.max_boxes
        for im in images:
            mask = im.max(axis=-1) > 127
            boxes = np.zeros((m, 4), np.float32)
            scores = np.zeros(m, np.float32)
            labels = np.full(m, -1, np.int32)
            k = 0
            if mask.any():
                ys, xs = np.nonzero(mask)
                h, w = im.shape[:2]
                boxes[0] = [ys.min() / h, xs.min() / w,
                            (ys.max() + 1) / h, (xs.max() + 1) / w]
                # area-proportional confidence: a tile-clipped FRAGMENT
                # scores below the whole object, like a real model
                scores[0] = min(0.95, 0.3 + 10.0 * mask.mean())
                labels[0] = int(im[mask].mean(axis=0).argmax())
                k = 1
            out["boxes"].append(boxes)
            out["scores"].append(scores)
            out["labels"].append(labels)
            out["num_boxes"].append(k)
        return {key: np.stack(v) for key, v in out.items()}


FAKE_CFG = Config(num_classes=3, image_size=64,
                  model=ModelConfig(width_multiplier=0.25, fpn_channels=32,
                                    head_depth=1, compute_dtype="float32"),
                  nms=NMSConfig(max_boxes=8, iou_threshold=0.5))


def test_tiled_predict_maps_to_global_coords():
    """One small bright object far from the origin: the tile that sees it
    must report it at the correct GLOBAL position."""
    img = np.zeros((256, 256, 3), np.uint8)
    img[130:140, 200:216, 0] = 255  # red, 10x16 px
    tp = TiledPredictor(FakePredictor(FAKE_CFG), overlap=0.25,
                        full_image_pass=False)
    res = tp.predict(img)
    assert res["num_boxes"] == 1
    np.testing.assert_allclose(
        res["boxes"][0], [130 / 256, 200 / 256, 140 / 256, 216 / 256],
        atol=2e-2)
    assert res["labels"][0] == 0


def test_tiled_predict_fuses_overlap_duplicates():
    """An object inside the overlap band is seen by several tiles; the
    merge must emit exactly one detection."""
    img = np.zeros((128, 128, 3), np.uint8)
    # centered on the seam of a 64px grid with 0.5 overlap
    img[56:72, 56:72, 1] = 255
    tp = TiledPredictor(FakePredictor(FAKE_CFG), overlap=0.5,
                        full_image_pass=False)
    grid = tp.grid_for((128, 128))
    seen = sum(1 for i in range(len(grid.origins))
               if FakePredictor(FAKE_CFG).predict(
                   [grid.crops(img)[i]])["num_boxes"][0])
    assert seen >= 2  # the test premise: multiple tiles saw it
    res = tp.predict(img)
    assert res["num_boxes"] == 1
    assert res["labels"][0] == 1


def test_full_image_pass_catches_tile_sized_objects():
    """An object larger than one tile is only whole in the full-image
    pass (each tile sees a clipped fragment; fragments either fuse into
    the full box or are suppressed by it)."""
    img = np.zeros((256, 256, 3), np.uint8)
    img[40:220, 30:230, 2] = 255  # spans ~3 tiles each way at 64px tiles
    tp = TiledPredictor(FakePredictor(FAKE_CFG), overlap=0.25,
                        full_image_pass=True)
    res = tp.predict(img)
    full = [40 / 256, 30 / 256, 220 / 256, 230 / 256]
    got = res["boxes"][:res["num_boxes"]]
    best = min(np.abs(np.asarray(got) - full).max(axis=1))
    assert best < 0.02  # some detection matches the WHOLE object


def test_rejects_batched_input():
    tp = TiledPredictor(FakePredictor(FAKE_CFG))
    with pytest.raises(ValueError, match="one"):
        tp.predict(np.zeros((2, 128, 128, 3), np.uint8))


def test_overlap_validation():
    with pytest.raises(ValueError, match="overlap"):
        TiledPredictor(FakePredictor(FAKE_CFG), overlap=1.0)


# ------------------------------------------------------- real predictor e2e

def test_tiled_with_real_predictor_contract():
    """Shapes/contract smoke: a real (random-weight) Predictor behind the
    tiler on a 3x-model-size image — tile batch rides the pow2 buckets,
    output obeys the public contract."""
    from ssd_tpu.models.detector import Detector
    from ssd_tpu.predictor import Predictor

    det = Detector(FAKE_CFG)
    p = Predictor(FAKE_CFG, det.init(jax.random.PRNGKey(0)),
                  label_map={0: "a", 1: "b", 2: "c"})
    tp = TiledPredictor(p, overlap=0.2, max_boxes=20)
    res = tp.predict(np.zeros((200, 150, 3), np.uint8))
    assert res["boxes"].shape == (20, 4)
    assert res["scores"].shape == (20,)
    assert res["labels"].shape == (20,)
    assert 0 <= res["num_boxes"] <= 20
    assert (res["boxes"] >= 0).all() and (res["boxes"] <= 1).all()
    assert "names" in res
