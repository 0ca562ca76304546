"""Import TF/Keras detector weights into an ssd_tpu inference artifact.

Migration path for users of the TF reference (SURVEY.md §6 "pretrained
checkpoints"): the reference ships TF checkpoints; this tool maps their
variables onto the flax parameter tree and writes a standard inference
artifact, which `train.init_from` (warm start / transfer learning),
`Predictor.from_checkpoint`, and `python -m ssd_tpu.eval` all consume.

Two sources:

* **Keras model / H5 weights** — layers named like the flax tree paths
  (``backbone.ds3.pointwise.conv`` …), the convention of the in-repo
  mirror (tests/test_tf_parity.py:build_keras_mirror). This direction is
  fully validated offline by the round-trip test: flax -> mirror ->
  import -> bit-identical flax tree.
* **TF checkpoint** — variables resolved as ``<layer>/<suffix>`` with the
  standard Keras suffixes (kernel / depthwise_kernel / bias / gamma /
  beta / moving_mean / moving_variance). Real-world checkpoints use
  different scopes; pass ``--name-map map.json`` ({our layer name ->
  checkpoint scope prefix}) to bridge them. The actual reference's scope
  names could never be read in this environment (the mount has been
  empty every round — SURVEY.md §⚠️), so no default map for them is
  shipped; the machinery + strict coverage checking is.

The importer is strict: every expected parameter must resolve with the
right shape, and the run fails listing anything missing — a silent
partial import would train from half-random weights.

CLI::

    python -m ssd_tpu.tools.import_tf --config cfg.json \
        --keras-model mirror.keras --output /path/artifact
    python -m ssd_tpu.tools.import_tf --config cfg.json \
        --tf-ckpt /ckpts/model.ckpt-123 --name-map map.json \
        --output /path/artifact [--dry-run]
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable

import jax
import numpy as np

from ssd_tpu.config import Config

# flax leaf name -> Keras/TF variable suffix, per layer kind
_CONV_SUFFIX = {"kernel": "kernel", "bias": "bias"}
_DW_SUFFIX = {"kernel": "depthwise_kernel", "bias": "bias"}
_BN_SUFFIX = {"scale": "gamma", "bias": "beta",
              "mean": "moving_mean", "var": "moving_variance"}


@dataclasses.dataclass
class _Entry:
    collection: str          # "params" | "batch_stats"
    path: tuple[str, ...]    # flax tree path, e.g. (backbone, ds1, bn, scale)
    layer: str               # dotted layer name, e.g. backbone.ds1.bn
    suffix: str              # TF variable suffix, e.g. gamma
    depthwise: bool          # kernel needs the (k,k,C,1)<->(k,k,1,C) swap
    shape: tuple[int, ...]   # expected flax shape


def _abstract_variables(cfg: Config) -> dict:
    from ssd_tpu.models.detector import Detector

    det = Detector(cfg)
    return jax.eval_shape(
        lambda: det.init(jax.random.PRNGKey(0)))


def parameter_spec(cfg: Config) -> list[_Entry]:
    """Every importable leaf of the detector's variable tree.

    Derived mechanically from the flax tree: the dotted path up to the
    module is the layer name (matching the in-repo Keras mirror), the
    leaf name picks the TF suffix. Depthwise convs are recognized by
    kernel shape ``(k, k, 1, C)``.
    """
    if cfg.model.stem_schedule != "reference":
        raise ValueError(
            "import_tf: only stem_schedule='reference' trees map onto TF "
            f"checkpoints (got {cfg.model.stem_schedule!r}; dense4 is a "
            "TPU-native architecture with no TF counterpart)")
    if cfg.model.norm != "batch":
        raise ValueError("import_tf: requires norm='batch'")

    variables = _abstract_variables(cfg)
    entries: list[_Entry] = []
    for collection in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(
            variables.get(collection, {}))[0]
        for path, leaf in flat:
            keys = tuple(p.key for p in path)
            *layer_parts, leaf_name = keys
            layer = ".".join(layer_parts)
            if collection == "batch_stats":
                suffix = _BN_SUFFIX[leaf_name]
                depthwise = False
            elif layer_parts[-1] == "bn":
                suffix = _BN_SUFFIX[leaf_name]
                depthwise = False
            else:
                depthwise = (leaf_name == "kernel" and len(leaf.shape) == 4
                             and leaf.shape[2] == 1 and leaf.shape[3] > 1)
                suffix = (_DW_SUFFIX if depthwise else _CONV_SUFFIX)[leaf_name]
            entries.append(_Entry(collection, keys, layer, suffix,
                                  depthwise, tuple(leaf.shape)))
    return entries


# ------------------------------------------------------------------ readers

def _layer_candidates(layer: str) -> list[str]:
    """Names to try for a flax layer path.

    flax wraps a bare conv in a submodule (``fpn.lateral3.conv``); Keras
    graphs name that single layer ``fpn.lateral3``. Try the exact path
    first, then the path with a trailing ``.conv`` stripped (never for
    ConvBN blocks, whose conv has a ``bn`` sibling and keeps the suffix
    in both worlds).
    """
    cands = [layer]
    if layer.endswith(".conv"):
        cands.append(layer[: -len(".conv")])
    return cands


def keras_reader(kmodel) -> Callable[[_Entry], np.ndarray | None]:
    """Read from a live Keras model with mirror-convention layer names."""
    def read(e: _Entry) -> np.ndarray | None:
        layer = None
        for name in _layer_candidates(e.layer):
            try:
                layer = kmodel.get_layer(name)
                break
            except ValueError:
                continue
        if layer is None:
            return None
        by_suffix = {}
        for v, w in zip(layer.weights, layer.get_weights()):
            by_suffix[v.name.split("/")[-1].split(":")[0]] = w
        w = by_suffix.get(e.suffix)
        if w is None and e.suffix == "depthwise_kernel":
            w = by_suffix.get("kernel")  # Keras 3 names it plain "kernel"
        return w
    return read


def checkpoint_reader(ckpt_path: str,
                      name_map: dict[str, str] | None = None
                      ) -> Callable[[_Entry], np.ndarray | None]:
    """Read from a TF checkpoint; ``name_map`` rewrites layer scopes."""
    import tensorflow as tf  # local: heavyweight, CLI/test only

    reader = tf.train.load_checkpoint(ckpt_path)
    names = set(reader.get_variable_to_shape_map())

    def read(e: _Entry) -> np.ndarray | None:
        mapped = (name_map or {}).get(e.layer)
        scopes = [mapped] if mapped else _layer_candidates(e.layer)
        suffixes = [e.suffix]
        if e.suffix == "depthwise_kernel":
            suffixes.append("kernel")  # Keras-3-written checkpoints
        for scope in scopes:
            for suffix in suffixes:
                if f"{scope}/{suffix}" in names:
                    return reader.get_tensor(f"{scope}/{suffix}")
        return None
    return read


# ------------------------------------------------------------------- import

def import_weights(cfg: Config,
                   read: Callable[[_Entry], np.ndarray | None],
                   ) -> dict:
    """Resolve every expected leaf through ``read``; strict on coverage."""
    entries = parameter_spec(cfg)
    out: dict = {"params": {}, "batch_stats": {}}
    missing, bad_shape = [], []
    for e in entries:
        w = read(e)
        if w is None:
            missing.append(f"{e.layer}/{e.suffix}")
            continue
        w = np.asarray(w)
        if e.depthwise:  # keras (k, k, C, 1) -> flax (k, k, 1, C)
            w = w.transpose(0, 1, 3, 2)
        if tuple(w.shape) != e.shape:
            bad_shape.append(
                f"{e.layer}/{e.suffix}: got {tuple(w.shape)}, want {e.shape}")
            continue
        node = out[e.collection]
        for k in e.path[:-1]:
            node = node.setdefault(k, {})
        node[e.path[-1]] = w.astype(np.float32)
    if missing or bad_shape:
        raise ValueError(
            "import_tf: incomplete import —\n  missing: "
            + (", ".join(missing) or "none")
            + "\n  shape mismatches: " + ("; ".join(bad_shape) or "none"))
    return out


def main(argv: list[str] | None = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--keras-model", help="saved Keras model (.keras/.h5, "
                     "architecture included) with mirror-convention layer "
                     "names")
    src.add_argument("--tf-ckpt", help="TF checkpoint prefix")
    p.add_argument("--name-map", default="",
                   help="JSON {our layer name: checkpoint scope}")
    p.add_argument("--output",
                   help="inference-artifact directory to write "
                        "(required unless --dry-run)")
    p.add_argument("--dry-run", action="store_true",
                   help="print the resolved mapping and exit")
    args = p.parse_args(argv)
    if not args.dry_run and not args.output:
        p.error("--output is required unless --dry-run")

    cfg = Config.load(args.config)
    if args.dry_run:
        name_map = json.load(open(args.name_map)) if args.name_map else {}
        for e in parameter_spec(cfg):
            scope = name_map.get(e.layer, e.layer)
            print(f"{e.collection:11s} {'.'.join(e.path):55s} "
                  f"<- {scope}/{e.suffix} {e.shape}")
        return

    if args.keras_model:
        import tensorflow as tf

        kmodel = tf.keras.models.load_model(args.keras_model, compile=False)
        read = keras_reader(kmodel)
    else:
        name_map = json.load(open(args.name_map)) if args.name_map else None
        read = checkpoint_reader(args.tf_ckpt, name_map)

    variables = import_weights(cfg, read)
    from ssd_tpu.export import save_inference_artifact

    save_inference_artifact(args.output, cfg, variables)
    n = len(jax.tree_util.tree_leaves(variables))
    print(f"imported {n} arrays -> {args.output}")


if __name__ == "__main__":
    main()
