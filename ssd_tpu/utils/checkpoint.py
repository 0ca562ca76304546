"""Training checkpoint/resume via orbax (SURVEY.md §5 "Checkpoint / resume").

The reference relies on ``tf.estimator`` auto-checkpoints; here a
``CheckpointManager`` saves the full ``TrainState`` (params, opt state, BN
stats, step, RNG key) PLUS the data-iterator state asynchronously every N
steps, so resume is exact: the restored run consumes the same examples the
crashed run would have. Preemption handling: call ``save(..., force=True)``
from a SIGTERM handler (see train.py) for a final synchronous checkpoint.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from ssd_tpu.parallel.train_step import TrainState


class TrainCheckpointer:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, state: TrainState, iterator_state: dict | None = None,
             force: bool = False) -> None:
        step = int(jax.device_get(state.step))
        if step in (self.manager.all_steps() or []):
            return  # already checkpointed (e.g. final save == periodic save)
        payload = {"state": ocp.args.StandardSave(state)}
        if iterator_state is not None:
            payload["iterator"] = ocp.args.JsonSave(iterator_state)
        self.manager.save(step, args=ocp.args.Composite(**payload), force=force)

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, abstract_state: TrainState,
                step: int | None = None) -> tuple[TrainState, dict | None]:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")

        def _restore(abstract):
            restored = self.manager.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract),
                    iterator=ocp.args.JsonRestore(),
                ),
            )
            return restored["state"], restored.get("iterator")

        try:
            return _restore(abstract_state)
        except Exception as first_err:  # tree-structure mismatch candidates
            # ``train.ema_decay`` toggled between the run that wrote the
            # checkpoint and this one: the TrainState skeleton gains/loses
            # the ema_params subtree. Retry with the alternate skeleton and
            # adapt, instead of surfacing orbax's opaque structure error.
            if abstract_state.ema_params is None:
                alt = abstract_state.replace(
                    ema_params=jax.tree_util.tree_map(
                        lambda x: x, abstract_state.params))
                try:
                    state, it = _restore(alt)
                except Exception:
                    raise first_err
                print("checkpoint: dropping saved ema_params "
                      "(train.ema_decay is now 0)", flush=True)
                return state.replace(ema_params=None), it
            alt = abstract_state.replace(ema_params=None)
            try:
                state, it = _restore(alt)
            except Exception:
                raise first_err
            print("checkpoint: no saved ema_params (checkpoint written with "
                  "train.ema_decay=0); re-seeding EMA from params", flush=True)
            return state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda p: p.copy(), state.params)
            ), it

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


def abstract_train_state(detector, tx, ema_decay: float = 0.0) -> TrainState:
    """Shape/dtype skeleton of TrainState for orbax restore."""
    from ssd_tpu.parallel.train_step import create_train_state
    return jax.eval_shape(
        lambda: create_train_state(detector, jax.random.PRNGKey(0), tx,
                                   ema_decay)
    )
