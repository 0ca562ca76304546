from ssd_tpu.data.pipeline import Pipeline, ShardIndex  # noqa: F401
