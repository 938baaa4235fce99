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


_STORED_CACHE: dict = {}


def _read_stored(model_path: str):
    """Load a checkpoint's raw tree (msgpack file or orbax dir), cached by
    (path, mtime) so adapt_cfg_to_checkpoint + load_variables parse the
    ~20 MB blob once per CLI run."""
    apath = os.path.abspath(model_path)
    mtime = os.path.getmtime(apath)
    key = (apath, mtime)
    if key in _STORED_CACHE:
        return _STORED_CACHE[key]
    if model_path.endswith(".msgpack"):
        import flax.serialization

        with open(apath, "rb") as f:
            stored = flax.serialization.msgpack_restore(f.read())
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            stored = ckptr.restore(apath)
        except Exception:
            # the checkpoint records device shardings from the machine
            # that wrote it (e.g. a TPU); restore device-agnostically via
            # an abstract target built from the stored metadata
            meta = ckptr.metadata(apath).item_metadata
            tree = meta.tree if hasattr(meta, "tree") else meta
            sharding = jax.sharding.SingleDeviceSharding(
                jax.local_devices()[0]
            )
            target = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(
                    m.shape, m.dtype, sharding=sharding
                ),
                tree,
            )
            stored = ckptr.restore(apath, target)
    _STORED_CACHE.clear()  # keep at most one checkpoint in memory
    _STORED_CACHE[key] = stored
    return stored


def adapt_cfg_to_checkpoint(cfg: Config, model_path: str) -> Config:
    """Disable heads the checkpoint never trained.

    A fresh-init count/density head emits an arbitrary count that would
    cap extraction (the budget comes from the head), so inference must
    only trust heads the checkpoint actually contains.  Works on .msgpack
    files and orbax checkpoint dirs."""
    if not (
        (cfg.model.use_count_head or cfg.model.use_density_head)
        and model_path
        and os.path.exists(model_path)
    ):
        return cfg
    import dataclasses

    try:
        stored = _read_stored(model_path)
    except Exception as e:
        print(f"  [load] could not inspect {model_path}: {e!r}")
        return cfg
    params = stored.get("params", {}) if isinstance(stored, dict) else {}
    updates = {}
    if cfg.model.use_count_head and "count_head" not in params:
        print("  [load] checkpoint has no count_head — head disabled")
        updates["use_count_head"] = False
    if cfg.model.use_density_head and "density_head" not in params:
        print("  [load] checkpoint has no density_head — head disabled")
        updates["use_density_head"] = False
    if updates:
        return dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **updates)
        )
    return cfg


def load_variables(cfg: Config, model: ReSeg, model_path: str = "", seed: int = 0):
    """Init and non-strictly restore from a .msgpack file or an orbax
    checkpoint dir — the reference's merge-style load (model.py:62-79):
    stored leaves overlay the init tree where path+shape match; anything
    else (new heads, changed widths) keeps its fresh init."""
    variables = init_variables(cfg, model, seed)
    if not model_path:
        return variables
    assert os.path.exists(model_path), (
        f"Model : {model_path} does not exists!"
    )
    print(f"Loading model from {model_path}")
    stored = _read_stored(model_path)
    return _merge_restore(dict(variables), stored)


def load_stop_params(path: str = "") -> Optional[Tuple]:
    """Calibrated extraction stopping rule, if tools/calibrate_stopping.py
    has produced one (assets/stop_params.json next to the repo root).
    Returns (min_remaining_frac, max_extract_misses), extended
    positionally with peak_suppress_factor (r3 suppression calibration)
    and stop_remaining_frac (r3 stop/min-size split) when the file
    carries them."""
    import json

    if not path:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), os.pardir,
            os.pardir, "assets", "stop_params.json",
        )
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as f:
            d = json.load(f)
        base = (
            float(d["min_remaining_frac"]), int(d["max_extract_misses"])
        )
        if "peak_suppress_factor" in d:
            out = base + (float(d["peak_suppress_factor"]),)
            if "stop_remaining_frac" in d:
                out = out + (float(d["stop_remaining_frac"]),)
            return out
        return base
    except (ValueError, KeyError, OSError):
        return None


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
