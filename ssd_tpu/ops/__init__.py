from ssd_tpu.ops import anchors, box_utils, losses, matching, nms, targets  # noqa: F401
