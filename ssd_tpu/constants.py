"""Framework-wide constants.

Mirrors the role of the reference's ``src/constants.py`` (reference mount was
empty at build time; values follow SURVEY.md §2 "Constants" row and the
standard SSD/RetinaNet recipe the reference implements):

* ``SCALE_FACTORS``: Faster-RCNN box-encoding divisors ``[10, 10, 5, 5]``.
* ``MATCHING_THRESHOLD`` / ``NEGATIVE_THRESHOLD``: IoU-argmax matcher bands
  (positive >= 0.5, negative < 0.4, ignore in between).

All box coordinates in this framework are ``(ymin, xmin, ymax, xmax)``,
normalized to ``[0, 1]`` relative to the image, matching the reference's
tfrecord and public-API convention.
"""

# Box encoding scale factors for (ty, tx, th, tw).
SCALE_FACTORS = (10.0, 10.0, 5.0, 5.0)

# Anchor-matching IoU thresholds.
MATCHING_THRESHOLD = 0.5   # IoU >= this -> positive anchor
NEGATIVE_THRESHOLD = 0.4   # IoU < this -> negative anchor; in between -> ignored

# Match-tensor sentinel values (per-anchor ground-truth index).
IGNORE_MATCH = -2
NEGATIVE_MATCH = -1

# Focal loss defaults (RetinaNet).
FOCAL_ALPHA = 0.25
FOCAL_GAMMA = 2.0

# RetinaNet class-head prior probability for bias init.
CLASS_PRIOR = 0.01

# Batch-norm defaults.
BATCH_NORM_MOMENTUM = 0.997
BATCH_NORM_EPSILON = 1e-3

# Numerical epsilon for box geometry.
EPSILON = 1e-8

# ImageNet per-channel normalization (images arrive as uint8 RGB).
# Owned here (not in models/detector.py) so backbone stems can fold the
# affine into their first conv's lowering without a circular import.
import numpy as _np  # noqa: E402  (kept at bottom: constants-only module)

MEAN_RGB = _np.array([0.485, 0.456, 0.406], _np.float32) * 255.0
STD_RGB = _np.array([0.229, 0.224, 0.225], _np.float32) * 255.0
