"""Train-step tests: sharded execution on the 8-device CPU mesh, and the
classic overfit-a-tiny-dataset correctness probe (SURVEY.md §7 stage 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.config import Config, ModelConfig, TrainConfig
from ssd_tpu.models.detector import Detector
from ssd_tpu.parallel import (
    create_mesh, create_train_state, jit_train_step, make_optimizer,
    make_train_step, shard_batch,
)

TINY = Config(
    num_classes=3,
    image_size=64,
    model=ModelConfig(backbone="mobilenet", width_multiplier=0.25,
                      fpn_channels=32, head_depth=1, compute_dtype="float32"),
    train=TrainConfig(batch_size=8, num_steps=100, learning_rate=0.01,
                      warmup_steps=0, lr_schedule="cosine"),
)


def _tiny_batch(rng, n=8, size=64, max_gt=4):
    images = rng.integers(0, 255, (n, size, size, 3)).astype(np.uint8)
    boxes = np.zeros((n, max_gt, 4), np.float32)
    labels = np.zeros((n, max_gt), np.int32)
    num = np.ones((n,), np.int32)
    for i in range(n):
        boxes[i, 0] = [0.2, 0.2, 0.7, 0.7]
        labels[i, 0] = i % 3
    return {"images": images, "boxes": boxes, "labels": labels, "num_boxes": num}


def test_train_step_runs_on_8_device_mesh(rng):
    assert len(jax.devices()) == 8
    mesh = create_mesh()
    det = Detector(TINY)
    tx = make_optimizer(TINY)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = jit_train_step(make_train_step(det, tx), mesh)

    batch = shard_batch(mesh, _tiny_batch(rng))
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_positives"]) >= 8  # one gt per image


def test_gradients_are_synced_across_shards(rng):
    # After one step from a replicated init, params must remain identical
    # on every device (psum'd grads) — catches missing all-reduce.
    mesh = create_mesh()
    det = Detector(TINY)
    tx = make_optimizer(TINY)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = jit_train_step(make_train_step(det, tx), mesh)
    batch = shard_batch(mesh, _tiny_batch(rng))
    state, _ = step(state, batch)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.slow
def test_overfit_tiny_dataset(rng):
    # Loss on a fixed single batch must drop substantially within 60 steps.
    cfg = TINY
    mesh = create_mesh()
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = jit_train_step(make_train_step(det, tx), mesh)
    batch = shard_batch(mesh, _tiny_batch(rng))

    first = None
    for _ in range(60):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)


def test_compile_discipline():
    # Exactly one compilation for repeated same-shape calls (SURVEY.md §4),
    # given the state is committed to the mesh up front (as train.py does).
    from ssd_tpu.parallel import replicated
    mesh = create_mesh()
    det = Detector(TINY)
    tx = make_optimizer(TINY)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    state = jax.device_put(state, replicated(mesh))
    step = jit_train_step(make_train_step(det, tx), mesh)
    r = np.random.default_rng(1)
    for _ in range(3):
        batch = shard_batch(mesh, _tiny_batch(r))
        state, _ = step(state, batch)
    assert step._cache_size() == 1


def test_sharded_evaluate(tmp_path, rng):
    """DP evaluation over the 8-device mesh produces the same mAP as
    single-device evaluation."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e import write_synth_dataset, make_cfg
    from ssd_tpu.train import evaluate

    write_synth_dataset(tmp_path / "train.tfrecords", 16, seed=0)
    write_synth_dataset(tmp_path / "val.tfrecords", 16, seed=1)
    cfg = make_cfg(tmp_path)
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    mesh = create_mesh()
    r_plain = evaluate(det, state, cfg, 0, 1)
    r_mesh = evaluate(det, state, cfg, 0, 1, mesh=mesh)
    assert abs(r_plain["mAP"] - r_mesh["mAP"]) < 1e-6 or (
        np.isnan(r_plain["mAP"]) and np.isnan(r_mesh["mAP"])
    )


def test_multihost_eval_merge_equals_single_stream(tmp_path, rng):
    """Simulated 2-host eval: each host's disjoint shard evaluated on its
    own DetectionEvaluator, then merged (the same reduction the multi-host
    ``gather()`` performs over processes) == the single-host number.

    Exercises the host-sharded eval pipelines + padded tail batches +
    per-class stat merge — everything in the real multi-host eval except
    the wire transport (which test_eval's pack/load roundtrip covers).
    """
    import sys
    sys.path.insert(0, "tests")
    from test_e2e import write_synth_dataset, make_cfg

    from ssd_tpu.data.pipeline import Pipeline
    from ssd_tpu.eval.coco_map import DetectionEvaluator

    write_synth_dataset(tmp_path / "train.tfrecords", 16, seed=0)
    write_synth_dataset(tmp_path / "val.tfrecords", 17, seed=1)  # odd tail
    cfg = make_cfg(tmp_path)
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = jax.jit(lambda v, im: det.predict(v, im))

    def run(host_id, num_hosts):
        ev = DetectionEvaluator(cfg.num_classes)
        pipe = Pipeline(cfg.data.val_file_pattern, cfg, is_training=False,
                        batch_size=4, host_id=host_id, num_hosts=num_hosts)
        for batch in pipe:
            out = predict(variables, batch["images"])
            ev.add_batch(
                {"boxes": np.asarray(out.boxes),
                 "scores": np.asarray(out.scores),
                 "labels": np.asarray(out.labels),
                 "num_boxes": np.asarray(out.num_boxes)},
                batch["boxes"], batch["labels"], batch["num_boxes"],
                valid=batch.get("valid"),
            )
        return ev

    single = run(0, 1).result()
    h0, h1 = run(0, 2), run(1, 2)
    h0.merge(h1)
    merged = h0.result()
    for key in ("mAP", "AP50"):
        a, b = single[key], merged[key]
        assert (np.isnan(a) and np.isnan(b)) or abs(a - b) < 1e-9, (key, a, b)


def test_channel_tp_matches_replicated(rng):
    """One train step with conv kernels channel-sharded over the model
    axis (2-D (4, 2) mesh, the dryrun_multichip placement) produces the
    same loss and the same updated params as pure replicated DP."""
    from ssd_tpu.parallel import model_sharded

    det = Detector(TINY)
    tx = make_optimizer(TINY)
    batch_np = _tiny_batch(rng)

    def run(model_parallelism):
        mesh = create_mesh(model_parallelism=model_parallelism)
        state = create_train_state(det, jax.random.PRNGKey(0), tx)
        shardings = model_sharded(mesh, state)
        state = jax.device_put(state, shardings)
        if model_parallelism > 1:
            n_tp = sum(
                1 for s in jax.tree_util.tree_leaves(shardings)
                if s.spec != jax.sharding.PartitionSpec()
            )
            assert n_tp > 0  # something really is sharded on the model axis
        step = jit_train_step(make_train_step(det, tx), mesh, shardings)
        state, metrics = step(state, shard_batch(mesh, batch_np))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_dp, params_dp = run(1)
    loss_tp, params_tp = run(2)
    assert abs(loss_dp - loss_tp) < 1e-5, (loss_dp, loss_tp)
    for a, b in zip(jax.tree_util.tree_leaves(params_dp),
                    jax.tree_util.tree_leaves(params_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accum_matches_full_batch(rng):
    """grad_accum_steps=4 must produce the SAME updated params as one
    full-batch step for a batch-stat-free model (norm="group") when every
    microbatch has the same loss normalizer — _tiny_batch gives each image
    exactly one identical gt, so per-microbatch num_positives agree.

    The microbatch (32/4 = 8) must span the full 8-device data axis: XLA
    SPMD miscomputes depthwise-conv backwards for partially-shardable
    microbatches, which train.py refuses (see its grad-accum guard)."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY.model, norm="group"))
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    batch_np = _tiny_batch(rng, n=32)
    mesh = create_mesh()

    def run(accum):
        state = create_train_state(det, jax.random.PRNGKey(0), tx)
        step = jit_train_step(
            make_train_step(det, tx, grad_accum_steps=accum), mesh)
        state, metrics = step(state, shard_batch(mesh, batch_np))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_full, params_full = run(1)
    loss_acc, params_acc = run(4)
    assert abs(loss_full - loss_acc) < 1e-5, (loss_full, loss_acc)
    for a, b in zip(jax.tree_util.tree_leaves(params_full),
                    jax.tree_util.tree_leaves(params_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accum_with_bn_trains(rng):
    """With BatchNorm, accumulation uses per-microbatch statistics: the
    step must run, update the running stats, and keep params finite."""
    det = Detector(TINY)
    tx = make_optimizer(TINY)
    mesh = create_mesh()
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    bn0 = jax.device_get(jax.tree_util.tree_leaves(state.batch_stats)[0])
    step = jit_train_step(
        make_train_step(det, tx, grad_accum_steps=2), mesh)
    state, metrics = step(state, shard_batch(mesh, _tiny_batch(rng)))
    assert np.isfinite(float(metrics["loss"]))
    bn1 = jax.device_get(jax.tree_util.tree_leaves(state.batch_stats)[0])
    assert not np.allclose(bn0, bn1)  # stats really updated
    for leaf in jax.tree_util.tree_leaves(jax.device_get(state.params)):
        assert np.all(np.isfinite(leaf))


def test_fsdp_matches_replicated(rng):
    """One train step with ZeRO-3-style param sharding over the data axis
    produces the same loss and updated params as replicated DP, while
    actually sharding the large leaves (per-device shard < full leaf)."""
    from ssd_tpu.parallel import fsdp_sharded

    det = Detector(TINY)
    tx = make_optimizer(TINY)
    batch_np = _tiny_batch(rng)

    def run(fsdp):
        mesh = create_mesh()
        state = create_train_state(det, jax.random.PRNGKey(0), tx)
        if fsdp:
            shardings = fsdp_sharded(mesh, state)
            n_sharded = sum(
                1 for s in jax.tree_util.tree_leaves(shardings)
                if s.spec != jax.sharding.PartitionSpec()
            )
            assert n_sharded > 0
        else:
            from ssd_tpu.parallel import replicated
            shardings = replicated(mesh)
        state = jax.device_put(state, shardings)
        if fsdp:
            # the biggest param leaf really lives sharded: local shard is
            # a fraction of the global leaf
            leaves = sorted(jax.tree_util.tree_leaves(state.params),
                            key=lambda x: -x.size)
            big = leaves[0]
            local = big.addressable_shards[0].data.size
            assert local < big.size
        step = jit_train_step(
            make_train_step(det, tx), mesh,
            shardings if fsdp else None)
        state, metrics = step(state, shard_batch(mesh, batch_np))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_dp, params_dp = run(False)
    loss_fs, params_fs = run(True)
    assert abs(loss_dp - loss_fs) < 1e-5, (loss_dp, loss_fs)
    for a, b in zip(jax.tree_util.tree_leaves(params_dp),
                    jax.tree_util.tree_leaves(params_fs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_ema_tracks_weighted_average(rng):
    """EMA params follow e' = d*e + (1-d)*p exactly, start from the init
    params, and are what inference_variables serves."""
    import dataclasses

    from ssd_tpu.parallel.train_step import inference_variables

    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, ema_decay=0.5))
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx,
                               cfg.train.ema_decay)
    assert state.ema_params is not None
    p0 = jax.device_get(state.params)
    e0 = jax.device_get(state.ema_params)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(p0)[0], jax.tree_util.tree_leaves(e0)[0])

    mesh = create_mesh()
    step = jit_train_step(
        make_train_step(det, tx, cfg.train.ema_decay), mesh)
    batch = shard_batch(mesh, _tiny_batch(rng))
    state, _ = step(state, batch)
    p1 = jax.device_get(state.params)
    e1 = jax.device_get(state.ema_params)
    want = jax.tree_util.tree_map(lambda e, p: 0.5 * e + 0.5 * p, e0, p1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        e1, want)

    iv = inference_variables(state)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(iv["params"])[0],
        jax.tree_util.tree_leaves(e1)[0])

    # default (ema off): field is None and inference serves raw params
    state_off = create_train_state(det, jax.random.PRNGKey(0), tx)
    assert state_off.ema_params is None
    iv_off = inference_variables(state_off)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(iv_off["params"])[0],
        jax.tree_util.tree_leaves(jax.device_get(state_off.params))[0])


def test_warm_start_reseeds_ema(tmp_path):
    """warm_start must reset ema_params to the warm-started params — an EMA
    seeded from the random init would pollute eval/export for ~1/(1-d)
    steps (ADVICE r2)."""
    import dataclasses

    from ssd_tpu.export import save_inference_artifact
    from ssd_tpu.train import warm_start

    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, ema_decay=0.999))
    det = Detector(cfg)
    tx = make_optimizer(cfg)

    donor = create_train_state(det, jax.random.PRNGKey(7), tx)
    art = str(tmp_path / "donor")
    save_inference_artifact(
        art, cfg, {"params": donor.params, "batch_stats": donor.batch_stats})

    fresh = create_train_state(det, jax.random.PRNGKey(0), tx,
                               cfg.train.ema_decay)
    warmed = warm_start(fresh, art)

    for w, e in zip(jax.tree_util.tree_leaves(jax.device_get(warmed.params)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(warmed.ema_params))):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(e))


def test_checkpoint_restore_tolerates_ema_toggle(tmp_path):
    """A checkpoint written with one train.ema_decay setting restores under
    the other: saved-with-EMA -> restored-without drops the subtree;
    saved-without -> restored-with re-seeds EMA from params (ADVICE r2)."""
    from ssd_tpu.utils.checkpoint import (TrainCheckpointer,
                                          abstract_train_state)

    det = Detector(TINY)
    tx = make_optimizer(TINY)

    # saved WITHOUT ema, restored WITH
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    c = TrainCheckpointer(str(tmp_path / "a"))
    c.save(state, {"epoch": 0, "position": 0, "seed": 0}, force=True)
    c.wait()
    restored, it = c.restore(abstract_train_state(det, tx, ema_decay=0.999))
    c.close()
    assert restored.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]))
    assert it["seed"] == 0

    # saved WITH ema, restored WITHOUT
    state2 = create_train_state(det, jax.random.PRNGKey(1), tx,
                                ema_decay=0.999)
    c2 = TrainCheckpointer(str(tmp_path / "b"))
    c2.save(state2, {"epoch": 0, "position": 0, "seed": 0}, force=True)
    c2.wait()
    restored2, _ = c2.restore(abstract_train_state(det, tx))
    c2.close()
    assert restored2.ema_params is None
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(
            jax.device_get(state2.params))[0]))


def test_freeze_backbone(rng):
    """freeze="backbone": backbone params bit-identical after steps, the
    head still learns, and optimizer moments never accumulate for frozen
    leaves."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, freeze="backbone"))
    mesh = create_mesh()
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = jit_train_step(make_train_step(det, tx), mesh)

    before = jax.tree_util.tree_map(np.asarray, state.params)
    batch = shard_batch(mesh, _tiny_batch(rng))
    for _ in range(3):
        state, metrics = step(state, batch)

    after = jax.tree_util.tree_map(np.asarray, state.params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(after["backbone"])[0],
            jax.tree_util.tree_flatten_with_path(before["backbone"])[0]):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))

    head_changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(after["head"]),
                        jax.tree_util.tree_leaves(before["head"])))
    assert head_changed
    assert np.isfinite(float(metrics["loss"]))
