"""Debug-mode numerics checking (SURVEY.md §5 "Race detection / sanitizers").

The reference has nothing here; the TPU-native equivalents are:
  * ``checked(fn)`` — wrap a jitted step with ``jax.experimental.checkify``
    to surface NaN/Inf and out-of-bounds indexing as host errors;
  * ``assert_all_finite(tree)`` — host-side post-step sweep over a metrics
    or parameter pytree (cheap, call every N steps in debug runs);
  * ``disable_jit()`` — context manager for pdb-able eager execution.

Donated-buffer discipline note: the train step donates its ``TrainState``
(parallel/train_step.py ``donate_argnums``) — after calling it, the previous
state's buffers are invalid; keep no references. This is the framework's one
aliasing rule.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np
from jax.experimental import checkify


def checked(fn):
    """Wrap ``fn`` so float errors/OOB raise on host. Debug only (slower)."""
    errs = checkify.float_checks | checkify.index_checks

    def wrapper(*args, **kwargs):
        err, out = checkify.checkify(fn, errors=errs)(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_all_finite(tree, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{key}: "
                f"{np.sum(~np.isfinite(arr))} bad of {arr.size}"
            )


@contextlib.contextmanager
def disable_jit():
    """Eager-mode execution for step-through debugging."""
    with jax.disable_jit():
        yield
