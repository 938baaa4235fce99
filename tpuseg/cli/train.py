"""Training CLI — reference ``code/train.py`` contract.

Same flags (--model --usegpu --nepochs --batchsize --debug --nworkers
--dataset) plus explicit data paths.  Creates a timestamped run dir
(reference ``generate_run_id``, train.py:46), snapshots the effective
config (instead of copying the source tree, train.py:66-71), seeds
everything from TrainingSettings.SEED=23, and runs the fit loop.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import getpass
import json
import os
import random

import jax
import numpy as np

from tpuseg.cli.common import build_model, init_variables
from tpuseg.data.dataset import AlignCollate
from tpuseg.data.loader import PrefetchLoader
from tpuseg.data.records import open_dataset
from tpuseg.runtime.checkpoint import restore_checkpoint
from tpuseg.runtime.loop import fit
from tpuseg.runtime.state import create_train_state
from tpuseg.settings import default_data_paths, get_config


def generate_run_id() -> str:
    """Reference train.py:46-56 format: date_time_user_random."""
    username = getpass.getuser()
    now = datetime.datetime.now()
    date = f"{now.year}-{now.month}-{now.day}"
    coarse = now.time().replace(microsecond=0).isoformat().replace(":", "-")[:5]
    fine = now.time().replace(microsecond=0).isoformat().replace(":", "-")[3:]
    return f"{date}_{coarse}_{username}_{fine}-{random.randint(0, 10000)}"


def main(argv=None):
    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()  # warm starts: reuse compiled executables
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="",
                        help="Path to a checkpoint to resume from")
    parser.add_argument("--usegpu", action="store_true",
                        help="kept for CLI parity; accelerator use is automatic")
    parser.add_argument("--nepochs", type=int, default=600)
    parser.add_argument("--batchsize", type=int, default=2)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--nworkers", type=int, default=2)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--train_data", default="",
                        help="packed-record prefix (or LMDB dir) for training")
    parser.add_argument("--val_data", default="")
    parser.add_argument("--runs_dir", default="models")
    parser.add_argument("--ndevices", type=int, default=1,
                        help="data-parallel devices (0 = all available; "
                             "batch is sharded over a 1-D mesh)")
    parser.add_argument("--live", action="store_true",
                        help="terminal sparkline live plots per metric "
                             "(the reference's visdom plots, serverless)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute for the train step "
                             "(params/optimizer stay float32)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="write TensorBoard scalars under <run_dir>/tb")
    parser.add_argument("--device_aug", action="store_true",
                        help="apply the static-shape augmentation subset "
                             "on device inside the jitted train step "
                             "(D4 + color jitter/gamma/channel swap/"
                             "grayscale); host collate then skips PIL")
    opt = parser.parse_args(argv)

    cfg = get_config(opt.dataset)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=opt.batchsize, n_epochs=opt.nepochs
        ),
    )

    run_dir = os.path.join(opt.runs_dir, opt.dataset, generate_run_id())
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    print(f"run dir: {run_dir}")

    # seed everything (reference train.py:78-80, SEED=23)
    random.seed(cfg.train.seed)
    np.random.seed(cfg.train.seed)

    train_path, val_path = default_data_paths(cfg, opt.dataset)
    train_ds = open_dataset(opt.train_data or train_path)
    val_ds = open_dataset(opt.val_data or val_path)
    print(f"train: {len(train_ds)} samples, val: {len(val_ds)} samples")

    # --device_aug: the jitted train step applies the static-shape
    # augmentation subset on device (tpuseg/data/device_aug.py) so a
    # low-core host can't starve the chip; the host collate runs a
    # hybrid mode that keeps ONLY the dynamic-shape transforms the
    # device cannot express (ADVICE r4: previously these were silently
    # dropped even when the config enabled them)
    if opt.device_aug:
        d = cfg.data
        host_kept = [n for n, on in [("resolution", d.resolution),
                                     ("rotation", d.rotation),
                                     ("center_cut", d.center_cut)] if on]
        train_collate = AlignCollate(
            "training_host_only", cfg.data, cfg.train.batch_size
        )
        print("--device_aug: D4 + photometric run on device; host collate "
              f"keeps {host_kept or 'no'} dynamic-shape transform(s)")
    else:
        train_collate = AlignCollate("training", cfg.data, cfg.train.batch_size)
    val_collate = AlignCollate("test", cfg.data, cfg.train.batch_size)
    train_loader = PrefetchLoader(
        train_ds, train_collate, cfg.train.batch_size, shuffle=True,
        seed=cfg.train.seed, n_workers=opt.nworkers,
    )
    val_loader = PrefetchLoader(
        val_ds, val_collate, cfg.train.batch_size, shuffle=False,
        seed=cfg.train.seed, n_workers=opt.nworkers,
    )

    def train_batches(epoch):
        return train_loader.epoch(epoch)

    def val_batches(epoch):
        return val_loader.epoch(epoch)

    model = build_model(
        cfg, dtype=jax.numpy.bfloat16 if opt.bf16 else None
    )
    variables = init_variables(cfg, model, seed=cfg.train.seed)
    state = create_train_state(cfg, variables)
    if opt.model:
        state = restore_checkpoint(opt.model, state)
        print(f"resumed from {opt.model} at step {int(state.step)}")

    mesh = None
    n_dev = opt.ndevices if opt.ndevices else len(jax.devices())
    if n_dev > 1:
        from tpuseg.parallel import make_mesh

        mesh = make_mesh(n_dev)
        print(f"data-parallel mesh over {n_dev} devices: {mesh.shape}")

    fit(
        cfg, model, state, train_batches, val_batches, run_dir,
        n_epochs=opt.nepochs, rng=jax.random.PRNGKey(cfg.train.seed),
        log_every=10 if opt.debug else 0, mesh=mesh,
        live=opt.live, tensorboard=opt.tensorboard,
        # the reference dumps p_*/pred_*/target_*/pro/mas jpgs every 40
        # decoder iterations unconditionally into the CWD
        # (attenet2.py:247-251); here behind --debug, under the run dir
        debug_dir=os.path.join(run_dir, "debug") if opt.debug else None,
        device_aug=opt.device_aug,
    )


if __name__ == "__main__":
    main()
