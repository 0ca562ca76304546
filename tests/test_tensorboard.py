"""tfevents writer: wire-format round-trip and MetricLogger integration."""

import glob
import os
import struct

from ssd_tpu.utils.tensorboard import SummaryWriter, read_scalars


def test_scalar_round_trip(tmp_path):
    logdir = str(tmp_path / "tb")
    with SummaryWriter(logdir) as w:
        w.add_scalar("loss", 1.5, step=10)
        w.add_scalars({"loss": 0.75, "lr": 1e-3}, step=20)
    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_scalars(files[0])  # verify_crc=True inside
    assert (10, "loss", 1.5) in rows
    by_step = {(s, t): v for s, t, v in rows}
    assert by_step[(20, "loss")] == 0.75
    assert abs(by_step[(20, "lr")] - 1e-3) < 1e-9


def test_file_version_header(tmp_path):
    """First record is the brain.Event:2 version event TensorBoard expects."""
    from ssd_tpu.data.tfrecord import read_records

    logdir = str(tmp_path / "tb")
    with SummaryWriter(logdir) as w:
        w.add_scalar("x", 1.0, step=0)
    (path,) = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    first = next(iter(read_records(path, verify_crc=True)))
    assert b"brain.Event:2" in first
    # wall_time is a fixed64 double at field 1
    assert first[0] == (1 << 3) | 1
    (wall_time,) = struct.unpack("<d", first[1:9])
    assert wall_time > 1.6e9  # sane unix seconds


def test_metric_logger_writes_events(tmp_path, capsys):
    from ssd_tpu.utils.logging import MetricLogger

    log_dir = str(tmp_path / "run")
    logger = MetricLogger(log_dir)
    logger.log(100, {"loss": 2.5, "num_positives": 7.0})
    logger.close()
    (path,) = glob.glob(os.path.join(log_dir, "tb", "events.out.tfevents.*"))
    rows = read_scalars(path)
    assert (100, "loss", 2.5) in rows
    assert (100, "num_positives", 7.0) in rows
    # jsonl output unaffected
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
