"""Recurrent Hourglass (Payer et al. 2018) — NHWC flax port.

Reference: ``code/lib/archs/modules/recurrent_hourglass.py:8-125``:
n_levels of pre-conv + ConvGRU unrolling, then a reverse pass of post
convs with additive skip connections.  (The ``StackedRecurrentHourglass``
architecture that consumed it is missing from the reference repo —
SURVEY.md quirk #1 — so the cell is the capability.)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.nn.conv_gru import ConvGRUCell
from tpuseg.nn.coord_conv import CoordConv


class RecurrentHourglass(nn.Module):
    hidden_n_filters: int
    kernel_size: int
    n_levels: int
    embedding_size: int
    use_coordinates: bool = False
    dtype: Optional[jnp.dtype] = None

    def _conv(self, features, name):
        pad = self.kernel_size // 2
        if self.use_coordinates:
            return CoordConv(
                features, self.kernel_size, padding=pad, with_r=True,
                dtype=self.dtype, name=name,
            )
        return nn.Conv(
            features, (self.kernel_size, self.kernel_size), padding=pad,
            dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(self, x):
        assert self.n_levels >= 1
        gru = ConvGRUCell(
            self.hidden_n_filters, self.kernel_size, self.use_coordinates,
            dtype=self.dtype, name="convgru_cell",
        )
        outputs = []
        hidden = None
        for i in range(self.n_levels):
            x = nn.relu(self._conv(self.hidden_n_filters, f"pre_conv{i}")(x))
            hidden = gru(x, hidden)
            outputs.append(hidden)
        post = nn.relu(
            self._conv(
                self.embedding_size
                if self.n_levels == 1
                else self.hidden_n_filters,
                f"post_conv{self.n_levels - 1}",
            )(outputs[-1])
        )
        for i in range(self.n_levels - 2, -1, -1):
            post = post + outputs[i]
            feats = self.embedding_size if i == 0 else self.hidden_n_filters
            post = nn.relu(self._conv(feats, f"post_conv{i}")(post))
        return post


class StackedRecurrentHourglass(nn.Module):
    """Stack of RecurrentHourglass modules with a semantic and an
    embedding head.

    The reference names this architecture (``archs/__init__.py:1``,
    ``model.py:40``) but ships no implementation — the file is missing
    (SURVEY.md quirk #1).  This is a working reconstruction of the
    published design (Payer et al. 2018): N chained hourglasses over the
    input, then 1x1 heads for n_classes semantic logits and an
    embedding map for the discriminative loss.
    """

    n_stacks: int = 2
    hidden_n_filters: int = 64
    kernel_size: int = 3
    n_levels: int = 4
    embedding_size: int = 32
    n_classes: int = 2
    use_coordinates: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        feats = x
        for s in range(self.n_stacks):
            feats = RecurrentHourglass(
                hidden_n_filters=self.hidden_n_filters,
                kernel_size=self.kernel_size,
                n_levels=self.n_levels,
                embedding_size=self.embedding_size,
                use_coordinates=self.use_coordinates,
                dtype=self.dtype,
                name=f"hourglass{s}",
            )(feats)
        sem = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                      name="sem_head")(feats)
        emb = nn.Conv(self.embedding_size, (1, 1), dtype=self.dtype,
                      name="emb_head")(feats)
        return sem, emb
