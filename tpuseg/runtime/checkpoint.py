"""Atomic checkpointing with orbax.

Replaces the reference's ``torch.save(state_dict)`` best-val checkpoints
named ``model_{epoch}_{val_cost}_{lr}.pth`` (``code/lib/model.py:441-446``)
and its merge-style non-strict restore (model.py:62-79).  Improvements that
the reference lacks (SURVEY.md §5.4): optimizer/scheduler state and step
are checkpointed too, so resume continues the schedule instead of
restarting it.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from tpuseg.runtime.state import TrainState


def save_checkpoint(
    path: str, state: TrainState, metadata: Optional[Dict[str, Any]] = None
) -> None:
    """Save the full train state atomically under ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "decoder_state": state.decoder_state,
        "opt_state": state.opt_state,
        "plateau": {
            "lr": state.plateau.lr,
            "best": state.plateau.best,
            "num_bad": state.plateau.num_bad,
        },
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if metadata:
        with open(os.path.join(path, "tpuseg_meta.json"), "w") as f:
            json.dump(metadata, f)


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an existing (template) state; non-strict like the
    reference's state-dict merge: missing keys keep template values."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "decoder_state": state.decoder_state,
        "opt_state": state.opt_state,
        "plateau": {
            "lr": state.plateau.lr,
            "best": state.plateau.best,
            "num_bad": state.plateau.num_bad,
        },
    }
    restored = ckptr.restore(path, template)
    plateau = state.plateau.replace(
        lr=restored["plateau"]["lr"],
        best=restored["plateau"]["best"],
        num_bad=restored["plateau"]["num_bad"],
    )
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        decoder_state=restored["decoder_state"],
        opt_state=restored["opt_state"],
        plateau=plateau,
    )


def restore_params_only(path: str, params_template: Any) -> Any:
    """Load just params (for inference CLIs pointing at a train ckpt)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    # restore with a partial template: orbax standard restore of the full
    # tree, then take params.
    restored = ckptr.restore(path)
    return jax.tree.map(np.asarray, restored["params"])
