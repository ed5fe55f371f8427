"""Torch ``.pth`` checkpoint importer / exporter.

Maps the reference's released checkpoints onto our flax param trees:

  * Handles the ``module.`` DataParallel prefix (both directions appear in
    the reference: strip at inference_benchmark.py:141-147, reside_model.py:40)
    and the SENet ``se_`` → ``se_module.`` rewrite (reside_model.py:42-43).
  * Handles both checkpoint formats: raw ``state_dict`` (Hu2018 models,
    ReSIDE/train.py:158) and the MidasNet self-describing dict
    {encoder, decoder, input_size, output_size, adversarial_training,
    weights, version} (lasinger2019.py:372-415).
  * Transposes conv weights OIHW → HWIO (depthwise included) once at load.

Key translation: our flax submodule names mirror torch attribute paths, so
joining a flax path with '.' *is* the torch key for Hu/backbone models. The
MiDaS ``Encoder`` and Hu ``E_efficientnet``/``E_senet`` wrappers re-index
children through ``nn.Sequential`` (lasinger2019.py:76-120,
modules.py:108-200), which the translators below reproduce.

torch (CPU) is used only here, as a host-side parser; nothing on the compute
path depends on it.
"""

from __future__ import annotations

import io
import os
from typing import Any, Callable, Mapping

import jax
import numpy as np

from efficientdepthestimation_tpu import MIDAS_CHECKPOINT_VERSION
from efficientdepthestimation_tpu.models.efficientnet import (
    efficientnet_stage_splits,
)
from efficientdepthestimation_tpu.models.midas import MidasNet
from efficientdepthestimation_tpu.models.registry import build_model

__all__ = [
    "load_torch_state_dict",
    "variables_from_state_dict",
    "state_dict_from_variables",
    "import_pth",
]


# ---------------------------------------------------------------------------
# raw .pth parsing (host side, torch-CPU)
# ---------------------------------------------------------------------------


def load_torch_state_dict(path_or_file) -> dict[str, Any]:
    """Load a .pth file → {key: np.ndarray} plus any metadata entries."""
    import torch

    state = torch.load(path_or_file, map_location="cpu", weights_only=False)
    return state


def _fix_keys(state_dict: Mapping[str, Any], senet: bool = False) -> dict[str, Any]:
    out = {}
    for key, value in state_dict.items():
        key = key.replace("module.", "")
        if senet:
            # reside_model.py:42-43 — old checkpoints store 'se_fc1' style keys
            key = key.replace("se_", "se_module.")
            key = key.replace("se_module.module.", "se_module.")
        out[key] = value
    return out


def _to_numpy(value) -> np.ndarray:
    if isinstance(value, np.ndarray):
        return value
    return value.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# flax path <-> torch key translation
# ---------------------------------------------------------------------------


_LEAF_TO_TORCH = {
    ("params", "kernel"): "weight",
    ("params", "scale"): "weight",
    ("params", "bias"): "bias",
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}


def _identity_translator(parts: tuple[str, ...]) -> str:
    return ".".join(parts)


def _efficientnet_blocks_translator(variant: str, prefix: str):
    """torch keys for an efficientnet encoder wrapped in Sequential blocks.

    blocks.0 = Sequential(_conv_stem@0, _bn0@1, MBConv@2..) and blocks.g =
    Sequential(MBConv@0..) for g ≥ 1 (modules.py:185-196, lasinger2019.py:76-88).
    """
    splits = efficientnet_stage_splits(variant)

    def translate(parts: tuple[str, ...]) -> str:
        head, rest = parts[0], parts[1:]
        if head == "_conv_stem":
            return ".".join((f"{prefix}.0.0",) + rest)
        if head == "_bn0":
            return ".".join((f"{prefix}.0.1",) + rest)
        if head.startswith("_blocks."):
            j = int(head.split(".")[1])
            if j < splits[1]:
                return ".".join((f"{prefix}.0.{2 + j}",) + rest)
            for g in range(1, 4):
                if splits[g] <= j < splits[g + 1]:
                    return ".".join((f"{prefix}.{g}.{j - splits[g]}",) + rest)
        raise KeyError(f"Unmapped efficientnet path {parts}")

    return translate


def _resnet_midas_translator(parts: tuple[str, ...]) -> str:
    """MiDaS resnet encoder: blocks.0 = Sequential(conv1@0, bn1@1, relu, maxpool,
    layer1@4); blocks.g = Sequential(layer{g+1}) for g ≥ 1 (lasinger2019.py:107-111)."""
    head, rest = parts[0], parts[1:]
    if head == "conv1":
        return ".".join(("blocks.0.0",) + rest)
    if head == "bn1":
        return ".".join(("blocks.0.1",) + rest)
    if head.startswith("layer"):
        layer, idx = head.split(".")
        k = int(layer[len("layer"):])
        if k == 1:
            return ".".join((f"blocks.0.4.{idx}",) + rest)
        return ".".join((f"blocks.{k - 1}.0.{idx}",) + rest)
    raise KeyError(f"Unmapped resnet-midas path {parts}")


def _senet_hu_translator(parts: tuple[str, ...]) -> str:
    """Hu E_senet: base = Sequential(layer0@0, layer1@1, ... layer4@4)
    (modules.py:108-121)."""
    head, rest = parts[0], parts[1:]
    if head.startswith("layer0."):
        return ".".join(("base.0." + head[len("layer0."):],) + rest)
    if head.startswith("layer"):
        layer, idx = head.split(".")
        k = int(layer[len("layer"):])
        return ".".join((f"base.{k}.{idx}",) + rest)
    raise KeyError(f"Unmapped senet path {parts}")


def _encoder_translator(model, for_midas: bool) -> Callable:
    """Pick the encoder-path translator from the model's encoder factory."""
    factory = model.encoder_factory
    keywords = getattr(factory, "keywords", {}) or {}
    variant = keywords.get("variant", "")
    func = getattr(factory, "func", factory)
    name = getattr(func, "__name__", str(func))
    if "EfficientNet" in name:
        prefix = "blocks"
        return _efficientnet_blocks_translator(variant, prefix)
    if "SENet" in name and not for_midas:
        return _senet_hu_translator
    if "ResNet" in name and for_midas:
        return _resnet_midas_translator
    return _identity_translator


def _torch_key(parts: tuple[str, ...], collection: str, model) -> str | None:
    """Translate a flax variable path (without collection) to its torch key."""
    *mods, leaf = parts
    torch_leaf = _LEAF_TO_TORCH.get((collection, leaf))
    if torch_leaf is None:
        return None
    mods = tuple(mods)
    is_midas = isinstance(model, MidasNet)
    root = mods[0] if mods else ""
    if root in ("E", "encoder") and len(mods) > 1:
        translate = _encoder_translator(model, for_midas=is_midas)
        inner = translate(mods[1:] + (torch_leaf,))
        return f"{root}.{inner}"
    return ".".join(mods + (torch_leaf,))


def _iter_leaf_paths(tree, prefix=()):
    if isinstance(tree, Mapping):
        for key in tree:
            yield from _iter_leaf_paths(tree[key], prefix + (key,))
    else:
        yield prefix, tree


def variables_from_state_dict(model, variables, state_dict: Mapping[str, Any],
                              strict: bool = True):
    """Fill a flax ``variables`` template with torch ``state_dict`` weights."""
    state = {k: _to_numpy(v) for k, v in state_dict.items()
             if not k.endswith("num_batches_tracked")}
    used = set()
    new_vars = {}
    for collection, tree in variables.items():
        leaves = {}
        for path, template in _iter_leaf_paths(tree):
            key = _torch_key(path, collection, model)
            if key is None or key not in state:
                if strict:
                    raise KeyError(
                        f"No torch key for {collection}/{'/'.join(path)} "
                        f"(expected '{key}')"
                    )
                leaves[path] = template
                continue
            value = state[key]
            used.add(key)
            if collection == "params" and path[-1] == "kernel" and value.ndim == 4:
                value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            if value.shape != template.shape:
                raise ValueError(
                    f"Shape mismatch for {key}: torch {value.shape} vs "
                    f"flax {template.shape}"
                )
            leaves[path] = value.astype(np.asarray(template).dtype)
        new_vars[collection] = _unflatten(leaves)
    unused = set(state) - used
    if strict and unused:
        # Classifier heads etc. are expected leftovers only for backbone-only
        # imports; full-model checkpoints must be fully consumed.
        raise KeyError(f"Unused torch keys: {sorted(unused)[:8]}{'...' if len(unused) > 8 else ''}")
    return jax.tree_util.tree_map(np.asarray, new_vars)


def _unflatten(leaves: dict[tuple, Any]):
    root: dict = {}
    for path, value in leaves.items():
        node = root
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
    return root


def state_dict_from_variables(model, variables) -> dict[str, np.ndarray]:
    """Inverse mapping: flax variables → torch-convention state dict."""
    out = {}
    for collection, tree in variables.items():
        for path, value in _iter_leaf_paths(tree):
            key = _torch_key(path, collection, model)
            if key is None:
                continue
            value = np.asarray(value)
            if collection == "params" and path[-1] == "kernel" and value.ndim == 4:
                value = value.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            out[key] = value
    return out


# ---------------------------------------------------------------------------
# top-level import
# ---------------------------------------------------------------------------


def import_pth(path: str, model=None, example_input_hw: tuple[int, int] = (228, 304)):
    """Load a reference checkpoint → (model, variables).

    Dispatches on content: a self-describing MidasNet dict rebuilds the
    architecture from its stored hyperparameters (lasinger2019.py:396-415);
    a raw state dict requires ``model`` or a parseable filename.
    """
    import warnings

    import jax.numpy as jnp

    from efficientdepthestimation_tpu.models.registry import (
        model_from_checkpoint_name,
    )

    state = load_torch_state_dict(path)

    if isinstance(state, Mapping) and "weights" in state and "encoder" in state:
        version = state.get("version")
        if version != MIDAS_CHECKPOINT_VERSION:
            warnings.warn(
                f"Version mismatch: checkpoint {version} vs "
                f"{MIDAS_CHECKPOINT_VERSION}; loading may fail."
            )
        if model is None:
            enc_cfg = state["encoder"]
            dec_cfg = state["decoder"]
            w_in, h_in = state.get("input_size") or state["output_size"]
            w_out, h_out = state["output_size"]
            model = build_model(
                enc_cfg["name"], "lasinger2019",
                output_size=(h_out, w_out), input_size=(h_in, w_in),
                num_features=dec_cfg.get("num_features", "auto"),
                non_negative=dec_cfg.get("non_negative", False),
            )
        state_dict = state["weights"]
        senet = False
    else:
        if model is None:
            model = model_from_checkpoint_name(path)
        state_dict = state
        senet = "senet" in str(model).lower() or _has_senet(model)

    state_dict = _fix_keys(state_dict, senet=senet)

    x = jnp.zeros((1, *example_input_hw, 3), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x)
    )
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template
    )
    variables = variables_from_state_dict(model, template, state_dict)
    return model, variables


def _has_senet(model) -> bool:
    factory = getattr(model, "encoder_factory", None)
    if factory is None:
        return False
    func = getattr(factory, "func", factory)
    return "SENet" in getattr(func, "__name__", "")
