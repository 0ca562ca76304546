from ssd_tpu.eval.coco_map import DetectionEvaluator  # noqa: F401
