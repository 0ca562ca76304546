"""Worker process for tests/test_distributed.py — NOT a pytest module.

Runs one of two real JAX processes (``jax.distributed.initialize`` with a
localhost coordinator, CPU backend, Gloo collectives): trains a few steps
with in-train periodic eval over the global 2-process mesh — the exact
device-feed path that is unreachable from any single-process test — then
runs one standalone mesh evaluation and prints the global mAP it computed.

Invoked as:  python distributed_worker.py <pid> <port> <data_dir>
(env must set JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=<n> BEFORE the process starts).
"""

import dataclasses
import os
import pathlib
import sys


def main() -> None:
    pid, port, data_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, "distributed bring-up failed"

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)                    # tests/ (test_e2e helpers)
    sys.path.insert(0, os.path.dirname(here))   # repo root (ssd_tpu)
    from test_e2e import make_cfg

    from ssd_tpu.models.detector import Detector
    from ssd_tpu.parallel import create_mesh, create_train_state, make_optimizer
    from ssd_tpu.train import evaluate, train

    cfg = make_cfg(pathlib.Path(data_dir))
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=16, eval_every=2, checkpoint_every=1000,
        log_every=1))

    # train-with-periodic-eval: step 2 runs the in-train evaluate() over
    # the global mesh (both processes participate in the jit)
    train(cfg, os.path.join(data_dir, "run"), resume=False, max_steps=2)

    # standalone mesh eval of the DRIVER-TRAINED weights (nontrivial mAP —
    # an all-zero score would vacuously "agree"): every process must report
    # the identical GLOBAL mAP (stat gather), matching the single-process
    # reference the pytest driver computes from the same artifact
    from ssd_tpu.export import load_inference_artifact
    _, donor = load_inference_artifact(os.path.join(data_dir, "pretrained"))
    det = Detector(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    state = state.replace(params=donor["params"],
                          batch_stats=donor["batch_stats"])
    mesh = create_mesh()
    res = evaluate(det, state, cfg, jax.process_index(), jax.process_count(),
                   mesh=mesh)
    print(f"EVAL_RESULT {pid} {res['mAP']:.10f} {res['AP50']:.10f}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
