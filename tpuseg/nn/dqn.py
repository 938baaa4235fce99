"""DQN instance selector (dormant capability).

Reference: ``code/lib/archs/modules/dqn.py`` — ``RLSelect`` dueling-DQN
conv Q-net over the feature map (:15-95), ``ReplayBuffer`` (:97-115),
``DQNSelecter`` with target network, double-DQN TD loss and 100-frame
target sync (:117-204).  The reference imports it in ``model.py`` but
never instantiates it (model.py:280,447 commented) — kept here as a
tested library capability.

JAX redesign: the Q-net is a flax module; the selector is functional —
params/target-params/opt-state live in a small dataclass, the TD update is
one jitted step, epsilon-greedy action selection runs on device with
masked argmax / masked categorical.
"""

from __future__ import annotations

import dataclasses
import random as _random
from collections import deque
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpuseg.nn.blocks import _BN, relu6

_NEG = -1e30


class RLSelect(nn.Module):
    """Conv Q-network over (B, H, W, C) features -> (B, H*W) Q-values.

    Matches the reference stack: 3 depthwise-separable blocks
    (C->8->12->6) with the mask re-applied before each, then a 1x1 head
    (dqn.py:24-47,64-69)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feature, mask, train: bool = False):
        b, h, w, _ = feature.shape
        m = mask.reshape(b, h, w, 1).astype(feature.dtype)
        for oup in (8, 12, 6):
            feature = feature * m
            inp = feature.shape[-1]
            feature = nn.Conv(
                inp, (3, 3), padding=1, feature_group_count=inp,
                use_bias=False, dtype=self.dtype,
            )(feature)
            feature = _BN(dtype=self.dtype)(feature, train)
            feature = relu6(feature)
            feature = nn.Conv(oup, (1, 1), use_bias=False, dtype=self.dtype)(
                feature
            )
            feature = _BN(dtype=self.dtype)(feature, train)
            feature = relu6(feature)
        q = nn.Conv(1, (1, 1), dtype=self.dtype)(feature)
        return q.reshape(b, h * w)


class ReplayBuffer:
    """Reference ``ReplayBuffer`` (dqn.py:97-115)."""

    def __init__(self, capacity: int):
        self.buffer = deque(maxlen=capacity)

    def push(self, transitions):
        """transitions: iterable of per-field sequences (state, action,
        reward, mask, next_mask, done) — zipped like the reference."""
        self.buffer += list(zip(*transitions))

    def sample(self, batch_size: int):
        batch = _random.sample(self.buffer, batch_size)
        return tuple(map(np.stack, zip(*batch)))

    def __len__(self):
        return len(self.buffer)


@dataclasses.dataclass
class DQNSelecter:
    """Functional double-DQN trainer (reference ``DQNSelecter``,
    dqn.py:117-204)."""

    params: Any
    target_params: Any
    batch_stats: Any
    opt_state: Any
    gamma: float = 0.99
    epsilon_start: float = 1.0
    epsilon_end: float = 0.01
    epsilon_decay: float = 500.0
    frame: int = 0
    buffer_capacity: int = 60
    buffer_start: int = 20
    dqn_batch_size: int = 4
    net: RLSelect = dataclasses.field(default_factory=RLSelect)
    tx: optax.GradientTransformation = dataclasses.field(
        default_factory=lambda: optax.adam(1e-3)
    )
    buffer: ReplayBuffer = dataclasses.field(
        default_factory=lambda: ReplayBuffer(60)
    )

    @classmethod
    def create(cls, channels: int, h: int, w: int, seed: int = 0, **kw):
        net = RLSelect()
        x = jnp.zeros((1, h, w, channels))
        m = jnp.ones((1, h * w))
        variables = net.init(jax.random.PRNGKey(seed), x, m, True)
        tx = optax.adam(1e-3)
        return cls(
            params=variables["params"],
            target_params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            net=net,
            tx=tx,
            **kw,
        )

    @property
    def epsilon(self) -> float:
        return self.epsilon_end + (self.epsilon_start - self.epsilon_end) * float(
            np.exp(-1.0 * self.frame / self.epsilon_decay)
        )

    def q_values(self, state, mask, params=None):
        return self.net.apply(
            {
                "params": params if params is not None else self.params,
                "batch_stats": self.batch_stats,
            },
            state, mask, False,
        )

    def act(self, key, state, mask):
        """Epsilon-greedy masked action (reference dqn.py:71-95), on device.

        state: (B, H, W, C); mask: (B, HW) {0,1}. Returns (B,) flat pixel
        actions."""
        self.frame += 1
        q = self.q_values(state, mask)
        masked_q = jnp.where(mask > 0, q, _NEG)
        greedy = jnp.argmax(masked_q, axis=1)
        logits = jnp.where(mask > 0, 0.0, _NEG)
        k1, k2 = jax.random.split(key)
        rand_act = jax.random.categorical(k1, logits, axis=1)
        explore = jax.random.uniform(k2, (q.shape[0],)) < self.epsilon
        return jnp.where(explore, rand_act, greedy)

    def td_loss(self, params, batch):
        state, action, reward, mask, next_mask, done = batch
        q_values = self.q_values(state, mask, params)
        q_value = jnp.take_along_axis(q_values, action[:, None], axis=1)[:, 0]
        next_q = self.q_values(state, next_mask, params)
        next_q_target = self.q_values(state, next_mask, self.target_params)
        next_best = jnp.argmax(
            jnp.where(next_mask > 0, next_q, _NEG), axis=1
        )
        next_q_value = jnp.take_along_axis(
            next_q_target, next_best[:, None], axis=1
        )[:, 0]
        expected = reward + self.gamma * next_q_value * (1.0 - done)
        return jnp.mean((q_value - jax.lax.stop_gradient(expected)) ** 2)

    def update(self):
        """One buffered TD step + periodic target sync (dqn.py:174-181)."""
        if len(self.buffer) >= self.buffer_start:
            batch = [jnp.asarray(b) for b in self.buffer.sample(self.dqn_batch_size)]
            grads = jax.grad(self.td_loss)(self.params, batch)
            updates, self.opt_state = self.tx.update(
                grads, self.opt_state, self.params
            )
            self.params = optax.apply_updates(self.params, updates)
        if self.frame % 100 == 0:
            self.target_params = self.params
