"""Test harness: force an 8-device virtual CPU mesh before jax imports.

SURVEY.md §4 "Distributed tests without a cluster": all tests run on CPU with
``xla_force_host_platform_device_count=8`` so pjit/sharding paths are
exercised in plain pytest without TPU hardware.
"""

import os

# Force-override: the environment may pre-set JAX_PLATFORMS=axon (real TPU
# tunnel); tests must run on the virtual CPU mesh. Set SSD_TPU_TEST_REAL=1
# to run the @pytest.mark.tpu tests against the real chip instead.
if not os.environ.get("SSD_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: the suite compiles dozens of small CPU
# programs; caching them across runs cuts wall time several-fold.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ssd_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# REPLACE (not append) XLA_FLAGS: the ambient environment may carry
# numerics-affecting flags (e.g. --xla_allow_excess_precision from the TPU
# relay) that flip near-tie detection orderings and break golden tests.
if not os.environ.get("SSD_TPU_TEST_REAL"):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

# The TPU-relay sitecustomize imports jax at interpreter startup, BEFORE
# this file runs — env vars alone are then too late (jax snapshots them at
# import). Force the platform through the live config object as well.
if not os.environ.get("SSD_TPU_TEST_REAL"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- test tiers
#
# The default run (`pytest tests/ -x -q`, pytest.ini addopts) skips the
# `heavy` tier: long cross-variant equivalence soaks and secondary-coverage
# tests whose subsystems keep a faster representative in the default tier.
# Full coverage: `pytest tests/ -m "not tpu"`; heavy only: `-m heavy`.
# Centralized here (not per-file decorators) so the tier is one auditable
# list; durations from the round-4 full run (/tmp-host, 1 core).
HEAVY_TESTS = {
    "test_losses.py::test_per_level_loss_matches_flat",        # 97s; ops-level variant stays
    "test_losses.py::test_giou_per_level_matches_flat",        # 158s; ops-level variant stays
    "test_import_tf.py::test_tf_checkpoint_with_name_map",     # 28s; keras-CLI + serve paths stay
    "test_model.py::test_int8_backbone_agrees_with_f32",       # 80s
    "test_train_step.py::test_grad_accum_matches_full_batch",  # 75s
    "test_distill.py::test_train_step_with_teacher",           # 63s
    "test_train_step.py::test_fsdp_matches_replicated",        # 60s; dryrun_multichip also covers
    "test_train_step.py::test_channel_tp_matches_replicated",  # 58s; dryrun_multichip also covers
    "test_distill.py::test_train_cli_with_distillation",       # 54s
    "test_train_step.py::test_freeze_backbone",                # 52s
    "test_model.py::test_efficientnet_lite_schedule",          # 47s; backbones_forward stays
    "test_train_step.py::test_grad_accum_with_bn_trains",      # 45s
    "test_model.py::test_groupnorm_backbone_trains_without_batch_stats",  # 38s
    "test_summarize.py::test_report_physics",                  # 37s
    "test_robustness.py::test_nms_fuzz_vs_oracle",             # 36s; oracle parity stays in test_nms*
    "test_distill.py::test_zero_when_teacher_equals_student",  # 35s
    "test_rectangular.py::test_rectangular_loss_per_level_matches_flat",  # 28s
    "test_postprocess.py::test_cells_refine_full_overprovision_equals_exact_flat",  # 27s; cells-vs-flat stays
    "test_eval.py::test_evaluator_coco_scale_timing",          # 24s timing soak
    "test_serve.py::test_daemon_serves_tta_predictor",         # 21s; basic daemon stays
    "test_serve.py::test_warmup_compiles_every_reachable_bucket",  # 20s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("tests/")[-1]
        # strip parametrization: tiers are per-test, not per-param
        base = name.split("[")[0]
        if name in HEAVY_TESTS or base in HEAVY_TESTS:
            item.add_marker(pytest.mark.heavy)
