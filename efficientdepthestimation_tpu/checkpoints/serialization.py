"""Native self-describing checkpoints (msgpack via flax.serialization).

TPU-native replacement for the reference's two checkpoint formats
(SURVEY.md §5 checkpoint/resume):

  * Hu2018 models: raw state-dict files (``torch.save(model.state_dict())``,
    ReSIDE/train.py:158) → here a msgpack file holding the flax variables
    plus a small architecture header.
  * MidasNet: self-describing dict with architecture hyperparameters,
    WH-ordered sizes and a version field (lasinger2019.py:372-415) → the
    same schema, serialized with msgpack instead of pickle.

``save_midas``/``load_midas`` preserve the reference schema field-for-field
(encoder{name,freeze_weights}, decoder{num_features,non_negative},
input_size/output_size in WH, adversarial_training, version) so round-trips
through the ``.pth`` exporter stay lossless.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Any

import jax
import numpy as np
from flax import serialization as flax_serialization

from efficientdepthestimation_tpu import MIDAS_CHECKPOINT_VERSION
from efficientdepthestimation_tpu.models.midas import MidasNet
from efficientdepthestimation_tpu.models.registry import build_model

__all__ = ["save_checkpoint", "load_checkpoint", "save_midas", "load_midas"]

_MAGIC = b"EDE1"


def _write(path_or_file, header: dict, variables) -> None:
    payload = flax_serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, variables)
    )
    header_bytes = json.dumps(header).encode()
    own = isinstance(path_or_file, (str, os.PathLike))
    f = open(path_or_file, "wb") if own else path_or_file
    try:
        f.write(_MAGIC)
        f.write(len(header_bytes).to_bytes(8, "little"))
        f.write(header_bytes)
        f.write(payload)
    finally:
        if own:
            f.close()


def _read(path_or_file) -> tuple[dict, Any]:
    own = isinstance(path_or_file, (str, os.PathLike))
    f = open(path_or_file, "rb") if own else path_or_file
    try:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"Not an EDE checkpoint (magic {magic!r})")
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode())
        variables = flax_serialization.msgpack_restore(f.read())
    finally:
        if own:
            f.close()
    return header, variables


def save_checkpoint(path_or_file, variables, *, encoder: str, decoder: str,
                    extra: dict | None = None) -> None:
    """Save variables with an architecture header (Hu-style checkpoints)."""
    header = {
        "format": "hu2018-state",
        "encoder": encoder,
        "decoder": decoder,
        "version": MIDAS_CHECKPOINT_VERSION,
        **(extra or {}),
    }
    _write(path_or_file, header, variables)


def load_checkpoint(path_or_file):
    """Load any native checkpoint → (model, variables, header)."""
    header, variables = _read(path_or_file)
    if header.get("format") == "midas-self-describing":
        w_in, h_in = header.get("input_size") or header["output_size"]
        w_out, h_out = header["output_size"]
        if header.get("version") != MIDAS_CHECKPOINT_VERSION:
            warnings.warn(
                f"Version mismatch: checkpoint {header.get('version')} vs "
                f"{MIDAS_CHECKPOINT_VERSION}."
            )
        model = build_model(
            header["encoder"]["name"], "lasinger2019",
            output_size=(h_out, w_out), input_size=(h_in, w_in),
            num_features=header["decoder"].get("num_features", "auto"),
            non_negative=header["decoder"].get("non_negative", False),
        )
    else:
        model = build_model(header["encoder"], header.get("decoder", "hu2018"))
    return model, variables, header


def save_midas(path_or_file, model: MidasNet, variables) -> None:
    """Save a MidasNet with the reference's self-describing schema (WH)."""
    decoder_features = model.num_features
    if decoder_features == "auto":
        decoder_features = int(model.encoder_block_channels[0])
    h_out, w_out = model.output_size
    h_in, w_in = model.input_size or model.output_size
    header = {
        "format": "midas-self-describing",
        "encoder": {
            "name": _encoder_name(model),
            "freeze_weights": False,
        },
        "decoder": {
            "num_features": int(decoder_features),
            "non_negative": bool(model.non_negative),
        },
        "input_size": (w_in, h_in),
        "output_size": (w_out, h_out),
        "adversarial_training": bool(model.adversarial_training),
        "version": MIDAS_CHECKPOINT_VERSION,
    }
    _write(path_or_file, header, variables)


def load_midas(path_or_file):
    model, variables, header = load_checkpoint(path_or_file)
    if header.get("format") != "midas-self-describing":
        raise ValueError("Not a MidasNet checkpoint")
    return model, variables


def save_train_state(path_or_file, state, *, encoder: str, decoder: str,
                     epoch: int, step_in_epoch=None) -> None:
    """Full training-state checkpoint (params + BN stats + optimizer + step)
    for exact resume — richer than the reference's weights-only restart
    (``--start-epoch`` + manual reload, SURVEY §5 checkpoint/resume).

    ``step_in_epoch``: set for a *mid-epoch* (preemption/--save-every) save —
    the number of batches of ``epoch`` already applied. Resume then replays
    the rest of that epoch (deterministic shuffle + step-keyed rng make the
    continuation bit-identical to an uninterrupted run). ``None`` means the
    epoch completed and resume starts at ``epoch + 1``.
    """
    header = {
        "format": "train-state",
        "encoder": encoder,
        "decoder": decoder,
        "epoch": int(epoch),
        "step": int(state.step),
        "version": MIDAS_CHECKPOINT_VERSION,
    }
    if step_in_epoch is not None:
        header["step_in_epoch"] = int(step_in_epoch)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        # optax states are namedtuple pytrees; to_state_dict flattens them
        # into msgpack-able nested dicts (inverted by from_state_dict on load)
        "opt_state": flax_serialization.to_state_dict(state.opt_state),
    }
    _write(path_or_file, header, jax.device_get(payload))


def load_train_state(path_or_file, state):
    """Restore a train-state checkpoint into a freshly-built ``state``
    (same model + optimizer). Returns (state, header)."""
    import jax.numpy as jnp
    from flax import serialization as fs

    header, payload = _read(path_or_file)
    if header.get("format") != "train-state":
        raise ValueError("Not a train-state checkpoint")
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = fs.from_state_dict(template, payload)
    state = state.replace(
        step=jnp.asarray(header["step"], jnp.int32),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return state, header


def save_discriminator(path_or_file, model, variables) -> None:
    """Discriminator schema {'weights','options','version'}
    (lasinger2019.py:457-472)."""
    header = {
        "format": "discriminator",
        "options": {
            "in_channels": int(model.in_channels),
            "adversarial_training": bool(model.adversarial_training),
        },
        "version": MIDAS_CHECKPOINT_VERSION,
    }
    _write(path_or_file, header, variables)


def load_discriminator(path_or_file):
    from efficientdepthestimation_tpu.models.midas import Discriminator

    header, variables = _read(path_or_file)
    if header.get("format") != "discriminator":
        raise ValueError("Not a Discriminator checkpoint")
    if header.get("version") != MIDAS_CHECKPOINT_VERSION:
        warnings.warn(
            f"Version mismatch: checkpoint {header.get('version')} vs "
            f"{MIDAS_CHECKPOINT_VERSION}.")
    return Discriminator(**header["options"]), variables


def _encoder_name(model) -> str:
    factory = model.encoder_factory
    keywords = getattr(factory, "keywords", {}) or {}
    if "variant" in keywords:
        return keywords["variant"]
    func = getattr(factory, "func", factory)
    name = getattr(func, "__name__", "")
    return {"SENetFeatures": "senet154"}.get(name, name)
