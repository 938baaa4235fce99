"""Shared CLI plumbing: model construction + checkpoint loading."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.configs import Config
from tpuseg.models import ReSeg


def build_model(cfg: Config, dtype=None) -> ReSeg:
    return ReSeg(cfg=cfg, dtype=dtype, extract_loop=cfg.decoder.extract_loop)


def init_variables(cfg: Config, model: ReSeg, seed: int = 0):
    """Abstract-init then materialise — cheap, shape-driven."""
    rng = jax.random.PRNGKey(seed)
    b = 1
    images = jnp.zeros(
        (b, cfg.data.image_height, cfg.data.image_width, cfg.data.n_channels),
        jnp.float32,
    )
    sem = jnp.zeros(
        (b, cfg.data.image_height, cfg.data.image_width, cfg.data.n_classes),
        jnp.float32,
    )
    ins = jnp.zeros(
        (b, cfg.data.image_height, cfg.data.image_width, cfg.data.max_n_objects),
        jnp.float32,
    )
    n = jnp.ones((b,), jnp.int32)
    return jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": rng, "glimpse": rng, "dropout": rng},
        images, sem, ins, n, train=True, mode="loss",
    )


def _merge_restore(init_tree, stored_tree, path=""):
    """Reference-style non-strict state-dict merge (model.py:62-79):
    overlay every stored leaf whose path AND shape match the freshly
    initialised tree; keep the init value (and warn) otherwise.  Makes
    old checkpoints load into models that grew new heads or changed a
    submodule's width."""
    if not isinstance(init_tree, dict):
        stored = jnp.asarray(stored_tree)
        init = jnp.asarray(init_tree)
        if stored.shape != init.shape:
            print(
                f"  [load] shape mismatch at {path}: "
                f"ckpt {stored.shape} vs model {init.shape} — keeping init"
            )
            return init
        return stored.astype(init.dtype)
    out = {}
    for k, v in init_tree.items():
        if isinstance(stored_tree, dict) and k in stored_tree:
            out[k] = _merge_restore(v, stored_tree[k], f"{path}/{k}")
        else:
            print(f"  [load] missing in ckpt: {path}/{k} — keeping init")
            out[k] = v
    return out


def adapt_cfg_to_checkpoint(cfg: Config, model_path: str) -> Config:
    """Disable heads the checkpoint never trained.

    A fresh-init count head emits a constant arbitrary count that would cap
    extraction (the budget is ``argmax(count_logits)``), so inference must
    only trust it when the checkpoint actually contains it."""
    if not (
        cfg.model.use_count_head
        and model_path
        and model_path.endswith(".msgpack")
        and os.path.isfile(model_path)
    ):
        return cfg
    import dataclasses

    import flax.serialization

    with open(model_path, "rb") as f:
        stored = flax.serialization.msgpack_restore(f.read())
    if "count_head" not in stored.get("params", {}):
        print("  [load] checkpoint has no count_head — head disabled")
        return dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, use_count_head=False)
        )
    return cfg


def load_variables(cfg: Config, model: ReSeg, model_path: str = "", seed: int = 0):
    """Init and (optionally, non-strictly) restore from an orbax ckpt dir —
    the reference's merge-style load (model.py:62-79)."""
    variables = init_variables(cfg, model, seed)
    if model_path and model_path.endswith(".msgpack"):
        import flax.serialization

        print(f"Loading model from {model_path}")
        with open(model_path, "rb") as f:
            stored = flax.serialization.msgpack_restore(f.read())
        return _merge_restore(dict(variables), stored)
    if model_path:
        from tpuseg.runtime.checkpoint import restore_params_only

        assert os.path.isdir(model_path) or os.path.isdir(
            os.path.abspath(model_path)
        ), f"Model : {model_path} does not exists!"
        print(f"Loading model from {model_path}")
        restored = restore_params_only(model_path, variables["params"])
        variables = dict(variables)
        variables["params"] = restored
        # also restore batch stats / decoder state when present
        try:
            import orbax.checkpoint as ocp

            full = ocp.StandardCheckpointer().restore(os.path.abspath(model_path))
            if "batch_stats" in full:
                variables["batch_stats"] = jax.tree.map(
                    jnp.asarray, full["batch_stats"]
                )
            if "decoder_state" in full:
                variables["decoder_state"] = jax.tree.map(
                    jnp.asarray, full["decoder_state"]
                )
        except Exception:
            pass
    return variables


def spectral_colors(n: int) -> np.ndarray:
    """plt.cm.Spectral colour table (pred_list.py:77-82)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pylab as plt

    if n <= 0:
        return np.zeros((0, 3), np.uint8)
    cols = [plt.cm.Spectral(x) for x in np.linspace(0, 1, n)]
    return (np.array(cols)[:, :3] * 255).astype(np.uint8)


def colorize_instances(ins_mask: np.ndarray) -> np.ndarray:
    """Reference colouring loop (pred_list.py:76-82), vectorised."""
    ids = sorted(set(np.unique(ins_mask)) - {0})
    colors = spectral_colors(len(ids))
    out = np.zeros((*ins_mask.shape, 3), np.uint8)
    for i, idx in enumerate(ids):
        out[ins_mask == idx] = colors[i]
    return out
