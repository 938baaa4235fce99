"""Training state: params + mutable collections + optimizer + LR plateau.

Replaces the reference ``Model`` runtime (``code/lib/model.py:23-199``):
  * optimizer zoo RMSprop/Adam/Adadelta/SGD (model.py:145-162) -> optax,
    with the reference's effective choice Adadelta(lr=1, wd=1e-3)
    (training_settings.py:27-32) as default;
  * grad clipping by global norm 10.0 (model.py:275-277) -> optax chain;
  * ReduceLROnPlateau(factor=0.5, patience=25) (model.py:164-166) ->
    ``PlateauState`` stepped once per epoch with the validation cost;
  * mutable BN stats and the decoder REINFORCE baseline live in the state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tpuseg.configs import Config


@flax.struct.dataclass
class PlateauState:
    """torch ReduceLROnPlateau(mode=min) semantics."""

    lr: jnp.ndarray
    best: jnp.ndarray
    num_bad: jnp.ndarray
    factor: float = flax.struct.field(pytree_node=False, default=0.5)
    patience: int = flax.struct.field(pytree_node=False, default=25)
    threshold: float = flax.struct.field(pytree_node=False, default=1e-4)

    @classmethod
    def create(cls, lr: float, factor: float, patience: int) -> "PlateauState":
        return cls(
            lr=jnp.asarray(lr, jnp.float32),
            best=jnp.asarray(jnp.inf, jnp.float32),
            num_bad=jnp.asarray(0, jnp.int32),
            factor=factor,
            patience=patience,
        )

    def step(self, metric) -> "PlateauState":
        metric = jnp.asarray(metric, jnp.float32)
        # torch ReduceLROnPlateau default threshold=1e-4, threshold_mode
        # 'rel': improvement means metric < best * (1 - 1e-4), and `best`
        # only moves on improvement.
        improved = metric < self.best * (1.0 - self.threshold)
        num_bad = jnp.where(improved, 0, self.num_bad + 1)
        drop = num_bad > self.patience
        lr = jnp.where(drop, self.lr * self.factor, self.lr)
        num_bad = jnp.where(drop, 0, num_bad)
        return self.replace(
            lr=lr, best=jnp.where(improved, metric, self.best), num_bad=num_bad
        )


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    decoder_state: Any
    opt_state: optax.OptState
    plateau: PlateauState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, **updates) -> "TrainState":
        updates_tx, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        # plateau LR scale (base lr already folded into adadelta's lr=1.0;
        # the plateau factor rescales the step).
        scale = self.plateau.lr
        updates_tx = jax.tree.map(lambda u: u * scale, updates_tx)
        new_params = optax.apply_updates(self.params, updates_tx)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **updates,
        )

    @property
    def model_variables(self) -> Dict[str, Any]:
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "decoder_state": self.decoder_state,
        }


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """clip(10) -> {adadelta|adam|rmsprop|sgd}(lr, wd)."""
    t = cfg.train
    name = t.optimizer.lower()
    if name == "adadelta":
        # torch defaults rho=0.9, eps=1e-6 (model.py:153-155)
        opt = optax.adadelta(
            learning_rate=1.0, rho=0.9, eps=1e-6, weight_decay=t.weight_decay
        )
    elif name == "adam":
        opt = optax.chain(
            optax.add_decayed_weights(t.weight_decay), optax.adam(1.0)
        )
    elif name == "rmsprop":
        opt = optax.chain(
            optax.add_decayed_weights(t.weight_decay), optax.rmsprop(1.0)
        )
    elif name == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(t.weight_decay),
            optax.sgd(1.0, momentum=0.9),
        )
    else:
        raise ValueError(t.optimizer)
    chain = [opt]
    if t.clip_grad_norm:
        chain.insert(0, optax.clip_by_global_norm(t.clip_grad_norm))
        # Pre-clip the density head's own gradient to the same bound
        # BEFORE the global clip: the map-regression loss produces
        # gradients orders of magnitude above the decoder/semantic terms
        # at init, and an unshielded global clip would rescale every
        # OTHER gradient to ~nothing (observed grad_norm ~2e6 on a fresh
        # head).  The head is stop_gradient-isolated, so this only
        # affects its own learning rate, never the backbone's.
        def _density_mask(params):
            return {k: jax.tree.map(lambda _: k == "density_head", v)
                    for k, v in params.items()}

        chain.insert(0, optax.masked(
            optax.clip_by_global_norm(t.clip_grad_norm), _density_mask
        ))
    if not t.train_cnn:
        # Freeze the UNet backbone ('base' subtree) the way the reference's
        # requires_grad=False does (model.py:199-201): the frozen subtree
        # receives NO update at all — including weight decay, which plain
        # grad-zeroing would still apply.
        def _frozen_mask(params):
            return {k: jax.tree.map(lambda _: k == "base", v)
                    for k, v in params.items()}

        chain.append(optax.masked(optax.set_to_zero(), _frozen_mask))
    return optax.chain(*chain)


def create_train_state(cfg: Config, variables: Dict[str, Any]) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        decoder_state=variables.get("decoder_state", {}),
        opt_state=tx.init(variables["params"]),
        plateau=PlateauState.create(
            cfg.train.learning_rate, cfg.train.lr_drop_factor,
            cfg.train.lr_drop_patience,
        ),
        tx=tx,
    )
