"""Epoch fit loop — the ``Model.fit`` equivalent (reference
``code/lib/model.py:358-464``).

Per epoch: train minibatches -> aggregate metrics -> validation pass ->
plateau LR step on the validation cost -> best-val checkpoint keyed on
``ins_dice_loss`` (model.py:426-439) -> CSV/jsonl logging.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from tpuseg.configs import Config
from tpuseg.parallel import pad_to_multiple, replicate, shard_batch
from tpuseg.runtime.checkpoint import save_checkpoint
from tpuseg.runtime.metrics_log import MetricLogger
from tpuseg.runtime.state import TrainState
from tpuseg.runtime.train import (
    make_debug_step,
    make_eval_step,
    make_train_step,
)


def _aggregate(metric_list) -> Dict[str, float]:
    out: Dict[str, float] = {}
    if not metric_list:
        return out
    keys = metric_list[0].keys()
    for k in keys:
        out[k] = float(np.mean([float(m[k]) for m in metric_list]))
    return out


def _dump_debug(debug_step, state, batch, out_dir: str) -> None:
    """Run the single-glimpse debug forward and write the reference's
    artifact kinds (p_f / pred_f / target_f / pro / proall / mas jpgs,
    lib/utils.py:154-174) for batch sample 0."""
    from tpuseg.utils.debug_images import dump_pyramid_debug

    dbg = debug_step(state, batch)
    dump_pyramid_debug(
        out_dir,
        [np.asarray(p, np.float32) for p in dbg["preds"]],
        [np.asarray(t, np.float32) for t in dbg["targets"]],
        np.asarray(dbg["pro"], np.float32),
        np.asarray(dbg["sem_mask"], np.float32),
        alpha=np.asarray(dbg["alpha"], np.float32),
        point=int(np.asarray(dbg["point"])[0]),
    )


def fit(
    cfg: Config,
    model,
    state: TrainState,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[int], Iterable],
    run_dir: str,
    n_epochs: Optional[int] = None,
    rng=None,
    log_every: int = 0,
    mesh=None,
    live: bool = False,
    tensorboard: bool = False,
    debug_dir: Optional[str] = None,
    debug_every: int = 40,
    device_aug: bool = False,
) -> TrainState:
    """train_batches/val_batches: callables epoch -> iterable of batch dicts
    (host numpy or device arrays, fixed shapes).

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), runs data-parallel: the
    state is replicated, each batch is sharded on its leading axis, and
    XLA's automatic SPMD partitioner emits the ICI collectives for the
    gradient/metric means (SURVEY.md §5.8) — the same jitted step functions
    serve both the single-chip and the multi-chip path.
    """
    n_epochs = n_epochs or cfg.train.n_epochs
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.train.seed)
    train_step = make_train_step(cfg, model, train_cnn=cfg.train.train_cnn,
                                 device_aug=device_aug)
    eval_step = make_eval_step(cfg, model)
    # periodic debug-image dumps (reference attenet2.py:247-251 dumps
    # every 40 decoder iterations unconditionally into the CWD; here an
    # explicit directory + cadence, deterministic filenames)
    debug_step = make_debug_step(cfg, model) if debug_dir else None
    logger = MetricLogger(run_dir, live=live, tensorboard=tensorboard)

    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if mesh is not None:
        state = replicate(state, mesh)

    def _prepare(batch):
        if mesh is None:
            return batch
        # pad short batches by repeating sample 0, duplicates included in
        # grads/metrics — the reference's own padding semantics
        # (dataset.py:330-333, preserved quirk; ARCHITECTURE.md).  The
        # standard loader already pads to the configured batch size, so
        # this only triggers for batch sizes not divisible by the mesh.
        batch = {k: pad_to_multiple(np.asarray(v), n_dev)[0]
                 for k, v in batch.items()}
        return shard_batch(batch, mesh)
    best_val = np.inf
    val_key = "ins_dice_loss" if cfg.model.use_instance_segmentation else (
        "dice_cost" if cfg.train.criterion in ("Dice", "Multi") else "ce_cost"
    )

    for epoch in range(n_epochs):
        t0 = time.time()
        train_metrics = []
        for batch in train_batches(epoch):
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, _prepare(batch), sub)
            train_metrics.append(m)
            it = len(train_metrics)
            if debug_step is not None and (it - 1) % debug_every == 0:
                _dump_debug(
                    debug_step, state, _prepare(batch),
                    os.path.join(debug_dir, f"ep{epoch:03d}_it{it:05d}"),
                )
            if log_every and len(train_metrics) % log_every == 0:
                print(
                    f"epoch {epoch} it {len(train_metrics)}: "
                    f"cost={float(m['cost']):.4f}"
                )
        agg_train = _aggregate(train_metrics)
        logger.log("train", epoch, agg_train, cost_key=val_key)

        val_metrics = []
        for batch in val_batches(epoch):
            rng, sub = jax.random.split(rng)
            val_metrics.append(eval_step(state, _prepare(batch), sub))
        agg_val = _aggregate(val_metrics)
        logger.log("val", epoch, agg_val, cost_key=val_key)

        val_cost = agg_val.get(val_key, agg_val.get("cost", 0.0))
        state = state.replace(plateau=state.plateau.step(val_cost))

        dur = time.time() - t0
        print(
            f"Epoch [{epoch}/{n_epochs}] {dur:.1f}s "
            f"train={ {k: round(v, 4) for k, v in agg_train.items()} } "
            f"val={ {k: round(v, 4) for k, v in agg_val.items()} } "
            f"lr={float(state.plateau.lr):.4g}"
        )

        if val_cost <= best_val:
            best_val = val_cost
            ckpt_path = os.path.join(
                os.path.abspath(run_dir),
                f"model_{epoch}_{val_cost:.8f}_{float(state.plateau.lr):.4g}",
            )
            save_checkpoint(
                ckpt_path, state,
                metadata={"epoch": epoch, "val_cost": float(val_cost)},
            )
    logger.close()
    return state
