"""Single typed configuration tree.

Replaces the reference's three overlapping mechanisms — the global
``config.py`` module (reference ``code/lib/archs/modules/config.py:1-67``),
the ``DataSettings -> ModelSettings -> TrainingSettings`` class hierarchy
(``code/settings/CVPPP/*.py``) and per-CLI argparse defaults — with one
frozen dataclass tree.  Hyperparameter values mirror the reference's
*effective* values (e.g. ``max_iter=2`` — the reference defines it twice,
32 then 2, ``config.py:8,56``; the effective value is 2).

Deliberate deviations from reference accidents (documented per field):
  * ``entropy_clamp_hi`` is ``1 - 1e-7``; the reference writes
    ``clamp(1e-7, 1. - 1e7)`` (``attenet2.py:77``) which is a sign typo.
  * no hardcoded absolute paths (reference ``config.py:5`` etc.).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset contracts. Reference: settings/CVPPP/data_settings.py:3-19."""

    dataset: str = "CVPPP"
    base_path: str = "data"
    n_classes: int = 2
    max_n_objects: int = 32
    image_height: int = 256  # reference config.py:1, model_settings.py:20
    image_width: int = 256
    # Per-channel mean/std of the raw RGB dataset
    # (reference model_settings.py:12-13). Kept for the normalizer capability;
    # the live pipeline uses the 21-channel standardizer instead
    # (lib/utils.py:82-83).
    mean: Tuple[float, float, float] = (
        0.521697844321, 0.389775426267, 0.206216114391
    )
    std: Tuple[float, float, float] = (
        0.212398291819, 0.151755427041, 0.113022107204
    )
    class_weights: Optional[Tuple[float, ...]] = None
    # Augmentation switches (reference training_settings.py:37-46).
    hflip: bool = True
    vflip: bool = True
    transpose: bool = True
    rot90: bool = True
    rotation: bool = True
    color_jitter: bool = False
    grayscale: bool = False
    channel_swap: bool = False
    gamma: bool = False
    resolution: bool = False
    center_cut: bool = True  # training_settings.py:52
    n_channels: int = 21  # RGB+LAB+HSV+YUV+YCbCr+HED+YIQ (lib/utils.py:100-110)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Instance decoder dims and loss weights.

    Reference: config.py:15-26,45-51,56-67 and attenet2.py.
    """

    d_model: int = 24
    d_k: int = 12
    d_v: int = 12
    d_inner: int = 40
    d_h: int = 20
    n_head: int = 2
    # The reference constructs its live SpatialAttentionLayer as
    # ``SpatialAttentionLayer(config.d_model, config.d_h)`` (attenet2.py:29)
    # — d_h lands in the ``reduction`` positional slot, so the reference's
    # effective bottleneck is ``d_model // 20 == 1`` channel.  That is an
    # accident of positional args, not intent; the live tpuseg default
    # keeps the round-1 12-channel bottleneck (reduction=2), a strictly
    # more expressive layer at negligible cost.  Parity tooling
    # (tests/test_forward_parity.py, tools/convert_reference_weights.py)
    # pins sp_reduction=20 explicitly to mirror the reference bit-for-bit.
    sp_reduction: int = 2
    num_layers: int = 1  # config.py:20 decoer_num_layers
    focal_gamma: float = 2.0  # config.py:16
    ce_weight: float = 10.0  # config.py:18
    lov_weight: float = 10.0  # config.py:19
    lambda_l: float = 0.5  # config.py:45
    lambda_r: float = 2.0  # config.py:46
    lambda_e: float = 5.0  # config.py:47
    lambda_pn: float = 0.01  # config.py:48
    lambda_ins: float = 1.0  # config.py:49
    pyramid_weights: Tuple[float, ...] = (16.0, 8.0, 4.0, 2.0, 1.0)  # config.py:51
    max_iter: int = 2  # effective value, config.py:56 (overrides 32 @ :8)
    use_mask: bool = True  # config.py:58
    use_encode: bool = True  # config.py:59
    use_pyramid: bool = True  # config.py:60
    drop_rate: float = 0.5  # config.py:64
    position_type: int = 1  # config.py:67
    baseline_momentum: float = 0.9  # attenet2.py:266 EMA of -eval_dice
    # Intended value of the reference's entropy clamp (attenet2.py:77 typo).
    entropy_clamp_lo: float = 1e-7
    entropy_clamp_hi: float = 1.0 - 1e-7
    # Reference AlphaEntropy scales by ``(config.H / 256) ** 0.5`` when fed
    # a flattened alpha (attenet2.py:71-77: the 2-D branch hardcodes
    # h=256).  1.0 at the native 256 config; parity runs at other
    # resolutions set ``(H / 256) ** 0.5`` to mirror it.
    entropy_normal: float = 1.0
    # Instance-extraction inference (new working path; the reference's
    # instance inference crashes, see SURVEY.md quirk #2): stop emitting
    # instances once the remaining foreground fraction drops below this.
    min_remaining_frac: float = 0.003
    # Remaining-foreground STOP threshold as a fraction of the initial
    # foreground, decoupled from ``min_remaining_frac`` (which keeps its
    # role as the minimum-instance-size floor and miss-carve radius).
    # <= 0 means "follow min_remaining_frac" (pre-split behavior).
    # Measured (CALIBRATION.md, hard64@256): at the calibrated operating
    # point (misses=5, suppress=1.3, density-head budgets) this threshold
    # never binds — extraction ends via the miss counter or the budget
    # cap in every swept config, so all stop values score identically.
    # Kept as a decoupled runtime scalar because it CAN bind at other
    # operating points (higher miss budgets, no count head), and the
    # tuple-padding plumbing generalizes to future stop scalars.
    stop_remaining_frac: float = -1.0
    # Peak-selection suppression radius as a fraction of the estimated
    # instance radius sqrt(fg_px / budget / pi).  0 = legacy behavior
    # (radius sqrt(min_pixels)): measured on the bench workload the tiny
    # legacy disk lets 2 of the 4 glimpses of a round land on the SAME
    # leaf, so rounds emit ~2 instances instead of 4 and extraction drags
    # to 6-7 rounds.  The miss-carve disk keeps the small radius (progress
    # guarantee).  Runtime-overridable via stop_params like the stopping
    # rule (tools/calibrate_stopping.py).
    peak_suppress_factor: float = 0.0
    # consecutive degenerate glimpses tolerated before a sample's
    # extraction stops (each miss suppresses a small disk and retries)
    max_extract_misses: int = 3
    # Inference extraction loop. "scan" (default): fixed-length round
    # scan. "while": round-granular early exit — measured on this TPU
    # stack it is NO faster (480 vs 476 ms/batch at B=32) and compiles
    # 6x slower through the remote tunnel: neither lax.cond-in-scan
    # (predicated: a 1-active-round scan times the same as 8, probe in
    # PERF.md) nor lax.while_loop turns data-dependent idleness into
    # wall-clock savings here, so the static scan with the count-head
    # budget is the production choice.  "unroll1" = single round.
    extract_loop: str = "scan"
    # Glimpses decoded per extraction round, folded into the batch dim of
    # one pyramid decode.  The pyramid decode is latency-bound at small
    # batch (measured on v5e: 1.42 ms/sample at B=32 vs 0.43 ms/sample at
    # B=128), so decoding G peaks per round cuts the sequential depth of
    # the extraction scan by ~G at near-constant round cost.
    extract_group: int = 4
    # Windowed finest-level decode (eval extraction only, PERF.md round-5
    # lever): decode the finest TWO pyramid levels in a per-glimpse
    # square window of this size (full-resolution pixels) instead of the
    # whole canvas — an instance is local to its glimpse, and the finest
    # IR chains are ~150 of the 355 ms device batch.  Window origins are
    # quantised to a stride = window/2 grid so every crop/paste is a
    # static-slice select (no TPU scatter/gather, which forces layout
    # copies — PERF.md dead ends).  0 disables (decode the full canvas).
    # Masks further than (window - stride)/2 from their glimpse peak get
    # truncated.  Frozen-eval A/B (PERF.md round-5): window 192 is
    # QUALITY-NEUTRAL (SBD 0.81270 vs 0.81272 full decode, |DiC| equal)
    # at +14% throughput (130.4 vs 114.1 img/s), so it is the default;
    # window 128 gives 168 img/s at -0.0096 SBD (opt-in via
    # `pred_list --window 128`).  0 disables (full-canvas decode).
    extract_window: int = 192
    # Origin-grid stride for the windowed decode (0 = window/2).  A
    # denser grid (e.g. 32 at window 128) centers the glimpse at least
    # (window-stride)/2 px from every window edge at IDENTICAL decode
    # compute — only the static-slice one-hot selects grow (~0.5
    # ms/round) — recovering the truncation-induced SBD loss of the
    # coarse grid.  Must divide (H - window) and be a multiple of 4.
    extract_window_stride: int = 64
    # Use the Pallas fused masked-softmax kernel for the per-instance
    # hard-attention distributions (tpuseg/kernels/masked_softmax.py).
    use_pallas_softmax: bool = False
    # Parity-experiment knobs (tools/parity_run.py): replace the stochastic
    # glimpse (multinomial sample + shuffled instance order) with argmax +
    # identity order so a reference run patched the same way is
    # step-for-step comparable.  Never on in production.
    deterministic_glimpse: bool = False
    # Expose the per-glimpse REINFORCE terms (loss1/loss2/entropy, the
    # quantities the reference prints per iteration, attenet2.py:289) in
    # the loss dict — parity diagnostics only.
    debug_loss_terms: bool = False
    # Rematerialise the pyramid decode in the training glimpse loop:
    # trades ~30% recompute for several-fold less activation memory
    # (jax.checkpoint), enabling larger batches at 256^2.
    remat: bool = True
    # Hoist the glimpse-independent skip-feature transforms OUT of the
    # training glimpse scan (the reference recomputes them every glimpse,
    # attenet2.py:377 -> utils.py:977-991; they depend only on the UNet
    # feats).  Saves max_iter-1 forward evaluations plus their remat
    # recomputes per step.  Exact up to two documented deviations: the
    # transform BN running stats get ONE update with an exact momentum^K
    # fix-up applied outside the module (runtime/train.py) instead of K
    # identical updates — bitwise-equivalent when drop_rate == 0 — and
    # with dropout active the transform mask is drawn once per step and
    # shared across the K glimpses instead of redrawn per glimpse.
    hoist_skips_train: bool = True
    smooth: float = 1.0  # dice smooth (attenet2.py:39-44)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Backbone/heads. Reference: reseg.py + unet_model.py."""

    name: str = "ReSeg"
    n_filters: int = 32  # unet_model.py:21
    use_instance_segmentation: bool = True  # model_settings.py:17
    use_coordinates: bool = False  # model_settings.py:18
    use_wae: bool = False  # training_settings.py:54
    # Learned instance-count head (the reference docstring promises one,
    # reseg.py:21-22,40, but hardcodes 16 at model.py:496): trained with CE
    # against the GT count and used as the per-sample extraction budget.
    use_count_head: bool = True
    # Count classes 0..count_classes-1.  Fixed (NOT tied to
    # data.max_n_objects) so checkpoints transfer across resolutions and
    # instance caps, like the conv weights do.
    count_classes: int = 33
    # Density-regression counting head (the strong counting architecture
    # for leaf counting: predict a per-pixel density whose integral is
    # the instance count; each GT instance contributes unit mass).  When
    # present it supersedes the classifier head as the extraction-budget
    # source; disabled automatically for checkpoints that never trained
    # it (cli/common.adapt_cfg_to_checkpoint).
    use_density_head: bool = True
    # Discriminative-loss capability knobs (model_settings.py:23-25).
    delta_var: float = 0.5
    delta_dist: float = 1.5
    norm: int = 2


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule. Reference: training_settings.py:27-34, train.py."""

    batch_size: int = 2  # config.py:4
    n_epochs: int = 600
    optimizer: str = "Adadelta"  # training_settings.py:27
    learning_rate: float = 1.0  # training_settings.py:29
    lr_drop_factor: float = 0.5  # training_settings.py:30
    lr_drop_patience: int = 25  # training_settings.py:31
    weight_decay: float = 0.001  # training_settings.py:32
    clip_grad_norm: float = 10.0  # training_settings.py:34
    criterion: str = "Multi"  # training_settings.py:48
    optimize_bg: bool = False
    # weight of the count-head CE term (new capability, no reference analogue)
    lambda_count: float = 1.0
    # weight of the density-head loss (scaled MSE + count consistency).
    # Small by design: the head is isolated behind stop_gradient but its
    # loss still shares the global grad-norm clip with the decoder terms;
    # the dedicated head trainer (tools/train_density.py) uses its own
    # unscaled objective.
    lambda_density: float = 0.02
    train_cnn: bool = True
    seed: int = 23  # training_settings.py:53
    n_workers: int = 2


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    dice_smooth_eps: float = 0.0  # evaluate.py uses raw ratio (no smooth)


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def cvppp_config(**overrides) -> Config:
    """The CVPPP configuration matching the reference's effective settings."""
    cfg = Config()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg
