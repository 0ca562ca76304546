from ssd_tpu.models.detector import Detector, SSDModel, normalize_images  # noqa: F401
