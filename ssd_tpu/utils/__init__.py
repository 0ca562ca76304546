from ssd_tpu.utils.logging import MetricLogger  # noqa: F401
