"""Iterative hard-attention instance decoder.

Reference: ``DecoderLayer`` (``code/lib/archs/modules/attenet2.py:17-407``).
Per batch: spatial attention over the instance features, a per-instance
hard-attention distribution, then an iterative glimpse loop — sample a
point from the attention distribution of one (randomly ordered) instance,
decode that instance's mask through the 5-level pyramid, and accumulate
pyramid focal+dice losses plus a REINFORCE term with an EMA baseline and an
entropy regulariser.

TPU redesign (SURVEY.md §7 "hard parts"):
  * the data-dependent ``while iter < maxIter`` loop (attenet2.py:377-399)
    becomes ``nn.scan`` over a *static* number of glimpse slots with
    per-iteration validity weights ``k < maxIter``;
  * the CPU ``torch.multinomial`` round-trip (attenet2.py:304-332) becomes
    on-device ``jax.random.categorical``;
  * the python ``random.shuffle`` instance order (attenet2.py:349-355)
    becomes a masked argsort of uniform keys;
  * the REINFORCE EMA baseline (attenet2.py:262-269) is a mutable
    ``decoder_state`` variable threaded through the scan carry;
  * the entropy clamp uses the reference's *intended* bound ``1 - 1e-7``
    (the reference writes ``1. - 1e7``, attenet2.py:77 — a sign typo).

It also provides ``extract`` — a working batched instance-extraction
inference path (the reference's instance inference path crashes; SURVEY.md
quirk #2): repeatedly glimpse the most attended remaining-foreground point,
decode its mask, carve it out of the remaining foreground, and stop when
the foreground is exhausted.  This yields the per-pixel instance id map and
the instance count that ``pred_list.py`` artifacts need.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.configs import DecoderConfig
from tpuseg.decoder.pyramid import AttenDecoder, skip_transform_shapes
from tpuseg.losses.dice import dice_loss
from tpuseg.losses.focal import focal_loss, softmax_cross_entropy
from tpuseg.nn.attention import HardAttention, SpatialAttention

_NEG_INF = -1e30


# --------------------------------------------------------------------------
# loss pieces (pure functions of cfg + arrays)
# --------------------------------------------------------------------------


def mask_loss(
    cfg: DecoderConfig, pred_logits: jnp.ndarray, target01: jnp.ndarray,
    alpha: float = 0.0, map_weight=0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level CEWeight*focal + dice(time=1) (reference ``Maskloss``,
    attenet2.py:86-109). Returns ((B,) multi loss, (B,) dice loss)."""
    b = pred_logits.shape[0]
    t = target01.astype(pred_logits.dtype)
    target2 = jnp.concatenate([1.0 - t, t], axis=-1)
    d = dice_loss(
        pred_logits, target2, optimize_bg=False, smooth=cfg.smooth,
        reduce=False, time=1, map_weight=map_weight,
    )
    ce = focal_loss(
        pred_logits.reshape(-1, 2), t.reshape(-1), gamma=cfg.focal_gamma,
        alpha=alpha, map_weight=map_weight,
    )
    ce = jnp.mean(ce.reshape(b, -1), axis=1)
    return cfg.ce_weight * ce + d, d


def pred_loss(
    cfg: DecoderConfig, preds, targets
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramid-weighted mask loss (reference ``Predloss``, attenet2.py:130-141).
    Returns ((B,) total, (B,) dice of the finest level)."""
    total = 0.0
    d_last = None
    for p, t, w in zip(preds, targets, cfg.pyramid_weights):
        multi, d_last = mask_loss(cfg, p, t)
        total = total + multi * w
    return total, d_last


def alpha_entropy(
    cfg: DecoderConfig, alpha: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Entropy regulariser over the glimpse distribution restricted to the
    instance's fg pixels (reference ``AlphaEntropy``, attenet2.py:71-84,
    with the intended clamp bounds)."""
    a = jnp.clip(alpha, cfg.entropy_clamp_lo, cfg.entropy_clamp_hi)
    h = -a * jnp.log(a) * cfg.entropy_normal
    return jnp.sum(h * mask)


def evaluate_masks(
    pred_last: jnp.ndarray, target_last: jnp.ndarray, time: int = 1,
    smooth: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval CE + per-sample dice of the finest level (reference
    ``evaluate``, attenet2.py:204-211). Caller stop-gradients as needed."""
    t = target_last.astype(pred_last.dtype)
    ce = softmax_cross_entropy(
        pred_last.reshape(-1, 2), target_last.reshape(-1).astype(jnp.int32)
    )
    target2 = jnp.concatenate([1.0 - t, t], axis=-1)
    d = dice_loss(
        pred_last, target2, optimize_bg=False, smooth=smooth, reduce=False,
        time=time,
    )
    return ce, d


# --------------------------------------------------------------------------
# glimpse scan step
# --------------------------------------------------------------------------


class _GlimpseStep(nn.Module):
    """One glimpse iteration, scanned over K static slots.

    mode="prep" exposes the glimpse-independent half (the skip-feature
    transforms) as its own program for the staged inference dispatch —
    instantiated unscanned under the SAME module name as the scan
    ("glimpse"), so its params resolve to the scan's broadcast params.
    """

    cfg: DecoderConfig
    train: bool
    mode: str = "loss"  # "loss" | "extract" | "prep"
    dtype: Optional[jnp.dtype] = None
    n_filters: Optional[int] = None  # required when const has no feats

    @nn.compact
    def __call__(self, carry, const, xs):
        cfg = self.cfg
        n_filters = (
            self.n_filters
            if const.get("feats") is None
            else const["feats"][0].shape[-1]
        )
        bone_cls = AttenDecoder
        if self.mode == "loss" and self.train and cfg.remat:
            # remat the pyramid decode: the backward pass recomputes level
            # activations instead of keeping them live across the glimpse
            # scan (arg 0 is the module; arg 6 is the static `train` flag)
            bone_cls = nn.remat(AttenDecoder, static_argnums=(6,))
        bone = bone_cls(
            cfg=cfg, n_filters=n_filters, dtype=self.dtype, name="bone"
        )
        if self.mode == "prep":
            skips_t = tuple(bone.transform_skips(const["feats"], self.train))
            sem = const.get("sem_mask")
            if sem is None:
                return skips_t
            return tuple(bone.conv1_partials(skips_t, sem))
        if self.mode == "debug":
            # single-glimpse forward for the periodic debug-image dumps
            # (reference attenet2.py:143-179): one pyramid decode of the
            # given point, per-level logits + pooled targets returned raw
            skips_t = list(bone.transform_skips(const["feats"], False))
            t_all, p_all = bone.decode(
                xs["s"], skips_t, const["sem_mask"], const["gold"],
                None, False,
            )
            return tuple(t_all), tuple(p_all)
        if self.mode == "loss":
            return self._loss_step(bone, carry, const, xs)
        return self._extract_step(bone, carry, const, xs)

    # ---------------- training / eval-loss ----------------

    def _loss_step(self, bone, carry, const, xs):
        cfg = self.cfg
        target = const["target"]          # (B, H, W, N)
        pro_split = const["pro_split"]    # (B, H, W, N)
        pro_merge = const["pro_merge"]    # (B, H, W, 1)
        sem_mask = const["sem_mask"]      # (B, H, W, 1)
        feats = const["feats"]
        maxiter = const["maxiter"]        # scalar int32
        idx = xs["idx"]                   # (B,)
        k = xs["k"]                       # scalar
        b, h, w, _ = sem_mask.shape
        hw = h * w

        valid = (k < maxiter).astype(jnp.float32)

        # getDistribution (attenet2.py:334-347)
        gold = jnp.take_along_axis(target, idx[:, None, None, None], axis=-1)
        gold = gold.astype(jnp.float32)
        alpha_map = jnp.take_along_axis(
            pro_split, idx[:, None, None, None], axis=-1
        )
        alpha = alpha_map.reshape(b, hw)

        # sample (attenet2.py:304-332): multinomial when training, argmax
        # at eval, on device, under stop-gradient.
        alpha_sg = jax.lax.stop_gradient(alpha)
        if self.train and not cfg.deterministic_glimpse:
            key = self.make_rng("glimpse")
            logits = jnp.where(alpha_sg > 0, jnp.log(alpha_sg + 1e-30), _NEG_INF)
            any_valid = jnp.sum(alpha_sg, axis=1, keepdims=True) > 0
            logits = jnp.where(any_valid, logits, 0.0)
            s = jax.random.categorical(key, logits, axis=1)
        else:
            s = jnp.argmax(alpha_sg, axis=1)

        if self.train:
            # const["skips_t"] is the hoisted skip-transform output
            # (cfg.hoist_skips_train) — computed ONCE per step outside the
            # scan; None falls back to the per-glimpse recompute the
            # reference does (attenet2.py:377)
            targets_all, preds_all = bone(
                s, feats, sem_mask, gold,
                jax.lax.stop_gradient(pro_merge), self.train,
                const.get("skips_t"),
            )
            skips_t = carry.get("skips_t")
        else:
            # eval-loss: hoist the glimpse-independent skip transforms —
            # compute once at k==0, carry, and decode per glimpse
            # (eval-only: reads, no variable creation/mutation in branches)
            def _compute_skips(_):
                return tuple(bone.transform_skips(feats, False))

            def _reuse_skips(_):
                return carry["skips_t"]

            if self.is_initializing():
                skips_t = _compute_skips(None)
            else:
                skips_t = jax.lax.cond(
                    k == 0, _compute_skips, _reuse_skips, None
                )

            # skip the decode entirely for glimpse slots beyond maxiter
            # (their loss contribution is masked to 0 anyway)
            def _decode(_):
                t_all, p_all = bone.decode(
                    s, list(skips_t), sem_mask, gold, None, False
                )
                return tuple(t_all), tuple(p_all)

            def _skip_decode(_):
                t_all, p_all = [], []
                for st in skips_t:
                    hh, ww = st.shape[1], st.shape[2]
                    t_all.append(jnp.zeros((b, hh, ww, 1), jnp.float32))
                    p_all.append(
                        jnp.zeros((b, hh, ww, 2), skips_t[0].dtype)
                    )
                return tuple(t_all), tuple(p_all)

            if self.is_initializing():
                targets_all, preds_all = _decode(None)
            else:
                targets_all, preds_all = jax.lax.cond(
                    k < maxiter, _decode, _skip_decode, None
                )

        pred_last, target_last = preds_all[-1], targets_all[-1]
        eval_ce, eval_dice = evaluate_masks(
            pred_last, target_last, time=1, smooth=cfg.smooth
        )
        eval_ce = jax.lax.stop_gradient(eval_ce)
        eval_dice = jax.lax.stop_gradient(eval_dice)

        if self.train:
            loss_pred, dice_l = pred_loss(cfg, preds_all, targets_all)
            ce_loss = jax.lax.stop_gradient(
                softmax_cross_entropy(
                    pred_last.reshape(-1, 2),
                    target_last.reshape(-1).astype(jnp.int32),
                )
            )
            # REINFORCE with EMA baseline (attenet2.py:262-269)
            log_p_y = -eval_dice
            m = cfg.baseline_momentum
            baseline_new = m * carry["baseline"] + (1.0 - m) * jnp.mean(log_p_y)
            baseline_new = jnp.where(valid > 0, baseline_new, carry["baseline"])
            log_p_s_a = jnp.take_along_axis(alpha, s[:, None], axis=1)[:, 0]
            loss_2 = -(log_p_y - baseline_new) * jnp.log(log_p_s_a + 1e-30)
            criterion = ce_loss + jax.lax.stop_gradient(jnp.sum(dice_l))
            hent = alpha_entropy(
                cfg, alpha, target_last.reshape(b, -1).astype(jnp.float32)
            )
            loss_vec = cfg.lambda_l * loss_pred + cfg.lambda_r * loss_2
            loss = cfg.lambda_ins * (jnp.sum(loss_vec) - cfg.lambda_e * hent) / b
            dice_metric = jnp.mean(dice_l)
        else:
            _, eval_dice2 = evaluate_masks(
                pred_last, target_last, time=2, smooth=cfg.smooth
            )
            baseline_new = carry["baseline"]
            loss = jnp.mean(eval_dice2)
            criterion = eval_ce + jnp.mean(eval_dice)
            ce_loss = eval_ce
            dice_metric = jnp.mean(eval_dice)

        new_carry = {
            "loss": carry["loss"] + valid * loss,
            "criterion": carry["criterion"] + valid * criterion,
            "ce": carry["ce"] + valid * ce_loss,
            "dice": carry["dice"] + valid * dice_metric,
            "baseline": baseline_new,
        }
        if not self.train:
            new_carry["skips_t"] = tuple(skips_t)
        ys = None
        if cfg.debug_loss_terms:
            # the reference's per-iteration print terms (attenet2.py:289)
            b_ = sem_mask.shape[0]
            if self.train:
                ys = {
                    "loss1": cfg.lambda_l * loss_pred,
                    "loss2": cfg.lambda_r * loss_2,
                    "hent": cfg.lambda_e * hent,
                }
            else:
                ys = {
                    "loss1": jnp.zeros((b_,), jnp.float32),
                    "loss2": jnp.zeros((b_,), jnp.float32),
                    "hent": jnp.zeros((), jnp.float32),
                }
        return new_carry, ys

    # ---------------- inference extraction ----------------

    @staticmethod
    def _disk(s, h, w, radius):
        """(B, H, W, 1) disk of ``radius`` (B,) around flat points s (B,)."""
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        pr = (s // w)[:, None, None]
        pc = (s % w)[:, None, None]
        r = radius[:, None, None]
        return (
            ((yy[None] - pr) ** 2 + (xx[None] - pc) ** 2)
            <= (r**2).astype(jnp.int32)
        ).astype(jnp.float32)[..., None]

    def _extract_step(self, bone, carry, const, xs):
        """One extraction ROUND: pick G attention peaks (disk-suppressed
        non-max selection, no decode in between), decode all G instance
        masks in ONE pyramid pass with the glimpses folded into the batch
        dim, then resolve them in peak order (earlier peak wins overlaps).

        The pyramid decode is latency-bound at small batch (v5e: 1.4
        ms/sample at B=32 vs 0.43 at B=128), so folding G glimpses cuts the
        sequential depth ~G times at roughly constant round cost — the
        TPU answer to the reference's one-instance-at-a-time loop.
        """
        cfg = self.cfg
        G = max(int(cfg.extract_group), 1)
        score = const["score"]        # (B, H, W, 1) merged attention map
        sem_mask = const["sem_mask"]  # (B, H, W, 1) predicted fg
        feats = const["feats"]
        min_pixels = const["min_pixels"]    # (B,) min-instance-size floor
        stop_pixels = const["stop_pixels"]  # (B,) remaining-fg stop point
        max_count = const["max_count"]      # (B,) per-sample instance budget
        # scalar consecutive-miss cutoff — a runtime input (not a baked
        # constant) so stopping-rule calibration sweeps reuse the program
        max_misses = const["max_misses"]
        k = xs["k"]
        b, h, w, _ = sem_mask.shape

        remaining = carry["remaining"]          # (B, H, W, 1)
        active = jnp.logical_not(carry["done"])  # (B,)
        radius = jnp.maximum(jnp.sqrt(min_pixels), 3.0)
        # Peak-SELECTION suppression radius: a fraction of the estimated
        # instance radius sqrt(fg/budget/pi), so the G peaks of a round
        # land on G DIFFERENT instances (the tiny miss-carve radius lets
        # two glimpses claim the same leaf — measured ~2 of 4 glimpses
        # wasted per round on the bench workload).  suppress==0 keeps the
        # legacy radius.  Clipped: a wrong budget must not blank the image.
        suppress = const["suppress"]
        est_r = jnp.sqrt(
            const["fg_px"]
            / jnp.maximum(max_count.astype(jnp.float32), 1.0)
            / jnp.pi
        )
        sel_radius = jnp.where(
            suppress > 0,
            jnp.clip(suppress * est_r, radius, min(h, w) / 6.0),
            radius,
        )

        # The skip-feature transforms are glimpse-independent: compute them
        # once at k==0 and carry the result through the scan (extract is
        # eval-only, so closing over the bound module inside lax.cond
        # branches is safe — reads only, no creation/mutation).
        def _compute_skips(_):
            return tuple(bone.transform_skips(feats, False))

        def _reuse_skips(_):
            return carry["skips_t"]

        if feats is None:
            # extract_rounds path: the skip transforms arrive pre-folded
            # into per-level conv1 partials (const["partials"], batch B)
            # as loop-invariant consts; k >= 1 by construction and the
            # carry holds no skips
            skips_t = None
        elif self.is_initializing():
            skips_t = _compute_skips(None)
        else:
            skips_t = jax.lax.cond(k == 0, _compute_skips, _reuse_skips, None)

        def _round(op):
            """Full round: peak selection + batch-folded decode + resolve.
            Runs under one ``lax.cond`` so rounds after every sample is
            done cost nothing at all (not just a skipped decode)."""
            remaining, idmap, count, misses, done = op

            # -- pick G peaks, suppressing a disk around each before the next
            flat_score = score.reshape(b, -1)
            sup = remaining.reshape(b, -1)
            points, peak_ok = [], []
            for g in range(G):
                s_g = jnp.argmax(
                    jnp.where(sup > 0, flat_score, _NEG_INF), axis=1
                )
                points.append(s_g)
                peak_ok.append(
                    jnp.take_along_axis(sup, s_g[:, None], axis=1)[:, 0] > 0
                )
                if g + 1 < G:
                    sup = sup * (
                        1.0 - self._disk(s_g, h, w, sel_radius).reshape(b, -1)
                    )

            # -- decode all G glimpses in one pyramid pass (B*G batch)
            pts = jnp.stack(points, axis=1).reshape(b * G)  # (B*G,)
            if const.get("partials") is not None:
                # fg_mask=remaining (mass-seeking origins,
                # pyramid.window_origin_fg) measured WORSE on the frozen
                # eval: pooled fg drags windows toward the plant clump,
                # away from the target leaf (SBD 0.786/0.808 vs the
                # point-centered 0.803/0.813 at windows 128/192) — keep
                # the point-centered grid.
                preds_all = bone.decode_split(
                    pts, list(const["partials"]), G,
                    window=int(cfg.extract_window),
                    window_stride=int(cfg.extract_window_stride),
                )
            else:
                skips_rep = [jnp.repeat(st, G, axis=0) for st in skips_t]
                sem_rep = jnp.repeat(sem_mask, G, axis=0)
                _, preds_all = bone.decode(
                    pts, skips_rep, sem_rep, gold=None, train=False
                )
            p = preds_all[-1]
            m_all = (
                (p[..., 1:2] > p[..., 0:1]).astype(jnp.float32)
                .reshape(b, G, h, w, 1)
            )

            # -- resolve the G masks in peak order (earlier peak wins)
            for g in range(G):
                s_g = points[g]
                avail = (
                    jnp.logical_not(done) & peak_ok[g] & (count < max_count)
                )
                # peak still unclaimed after earlier glimpses this round?
                still = (
                    jnp.take_along_axis(
                        remaining.reshape(b, -1), s_g[:, None], axis=1
                    )[:, 0]
                    > 0
                )
                live = avail & still
                # the decoded instance lives inside the remaining
                # foreground; always include the glimpse pixel so progress
                # is guaranteed.
                point_plane = (
                    jax.lax.broadcasted_iota(jnp.int32, (b, h * w), 1)
                    == s_g[:, None]
                ).astype(jnp.float32).reshape(b, h, w, 1)
                m_g = jnp.clip(
                    m_all[:, g] * remaining + point_plane * remaining,
                    0.0, 1.0,
                )
                m_px = jnp.sum(m_g.reshape(b, -1), axis=1)
                valid_inst = m_px >= min_pixels
                emit = live & valid_inst
                # a degenerate extraction (mask below the minimum instance
                # size) means this attention peak found no real instance:
                # carve a small disk around it and retry elsewhere; stop
                # the sample after `max_extract_misses` consecutive misses.
                miss = live & jnp.logical_not(valid_inst)

                inst_id = (count + 1).astype(jnp.int32)
                take = (
                    emit[:, None, None, None]
                    & (m_g > 0)
                    & (idmap[..., None] == 0)
                )
                idmap = jnp.where(
                    take[..., 0], inst_id[:, None, None], idmap
                )
                count = count + emit.astype(jnp.int32)

                disk = self._disk(s_g, h, w, radius)
                carve = jnp.where(
                    emit[:, None, None, None], m_g,
                    jnp.where(miss[:, None, None, None], disk, 0.0),
                )
                remaining = remaining * (1.0 - carve)
                misses = jnp.where(emit, 0, misses + miss.astype(jnp.int32))
                rem_px = jnp.sum(remaining.reshape(b, -1), axis=1)
                done = (
                    done
                    | (rem_px <= stop_pixels)
                    | (misses >= max_misses)
                    | (count >= max_count)
                )
            return remaining, idmap, count, misses, done

        op = (
            remaining, carry["idmap"], carry["count"], carry["misses"],
            carry["done"],
        )
        if self.is_initializing():
            op = _round(op)
        else:
            # measured on TPU (bench A/B): this cond DOES skip whole
            # rounds once every sample is done — 82.8 -> 64.3 img/s
            # without it — despite the small-probe predication finding
            # in PERF.md (predication applies to small bodies only)
            op = jax.lax.cond(jnp.any(active), _round, lambda o: o, op)
        remaining, idmap, count, misses, done = op

        new_carry = {
            "remaining": remaining,
            "idmap": idmap,
            "count": count,
            "misses": misses,
            "done": done,
        }
        if skips_t is not None:
            new_carry["skips_t"] = tuple(skips_t)
        return new_carry, None


# --------------------------------------------------------------------------
# the decoder module
# --------------------------------------------------------------------------


def _scanned(step_kwargs, length, carry_stats: bool, need_rngs: bool):
    return nn.scan(
        _GlimpseStep,
        variable_broadcast=("params",) if carry_stats else ("params", "batch_stats"),
        variable_carry=("batch_stats",) if carry_stats else (),
        split_rngs=(
            {"params": False, "glimpse": True, "dropout": True}
            if need_rngs
            else {"params": False}
        ),
        in_axes=(nn.broadcast, 0),
        out_axes=0,
        length=length,
    )(**step_kwargs)


class InstanceDecoder(nn.Module):
    """Reference ``DecoderLayer`` (attenet2.py:17) rebuilt for TPU."""

    cfg: DecoderConfig
    max_n_objects: int = 32
    dtype: Optional[jnp.dtype] = None
    extract_loop: str = "scan"  # "scan" (rounds of G glimpses) | "unroll1"

    def _attend(self, encode, sem_mask, target, train):
        s_sp = SpatialAttention(
            d_model=self.cfg.d_model, reduction=self.cfg.sp_reduction,
            dtype=self.dtype, name="s_sp",
        )(encode, sem_mask, train=train)
        pro_split, pro_merge = HardAttention(
            d_k=self.cfg.d_k, use_pallas=self.cfg.use_pallas_softmax,
            dtype=self.dtype, name="attend",
        )(s_sp, sem_mask, target, train=train)
        return pro_split, pro_merge

    @nn.compact
    def __call__(
        self,
        encode,
        sem_mask,
        target=None,
        n_ins=None,
        feats=None,
        train: bool = False,
        mode: str = "loss",
        max_instances: Optional[int] = None,
        count_budget=None,
        score=None,
        skips_t=None,
        n_rounds: Optional[int] = None,
        n_filters: Optional[int] = None,
        carry_in=None,
        stop_params=None,
    ):
        """mode='loss': glimpse-loop loss; mode='extract': instance inference.

        Both modes share every parameter (same submodule paths).
        ``count_budget`` (B,) optionally caps the number of instances each
        sample may emit during extraction (the learned count head).
        ``stop_params`` optionally overrides the extraction stopping rule
        at RUNTIME as ``(min_remaining_frac, max_extract_misses)`` device
        scalars — calibration sweeps reuse one compiled program instead
        of recompiling per config (tools/calibrate_stopping.py).

        Staged-dispatch pair (each its own jitted program; the host reads
        only the tiny count vector between them, so the round scan can be
        compiled for the rounds a batch actually needs instead of the
        static worst case — see runtime/predict.py):
          * mode='prep': attention + skip transforms + their conv1
            partials once per batch -> (score, partials);
          * mode='extract_rounds': ``n_rounds`` (static) extraction rounds
            from prepped inputs; resumable via ``carry_in`` ->
            (idmap, count, carry_out).
        """
        if mode == "extract":
            return self._extract(
                encode, sem_mask, feats, max_instances, count_budget,
                stop_params,
            )
        if mode == "prep":
            return self._prep(encode, sem_mask, feats)
        if mode == "skips":
            # train-hoist stage A (cfg.hoist_skips_train): ONLY the
            # glimpse-independent skip transforms, run once per step in
            # train mode (BN batch stats, dropout); the scan consumes the
            # result via ``skips_t``.  Instantiated under the scan's
            # module name so params/stats resolve to the same tree.
            step = _GlimpseStep(
                cfg=self.cfg, train=train, mode="prep", dtype=self.dtype,
                name="glimpse",
            )
            return step(None, {"feats": feats}, None)
        if mode == "debug":
            return self._debug(encode, sem_mask, target, feats)
        if mode == "extract_rounds":
            return self._extract_rounds(
                sem_mask, score, skips_t, max_instances, count_budget,
                n_rounds, n_filters, carry_in, stop_params,
            )
        return self._loss(
            encode, sem_mask, target, n_ins, feats, train, skips_t
        )

    def _debug(self, encode, sem_mask, target, feats):
        """Single-glimpse debug forward for the reference's periodic image
        dumps (attenet2.py:143-179,247-251): attend, take instance slot 0's
        argmax glimpse, decode one pyramid pass.  Returns the per-level
        logits/targets plus the attention tensors the writers consume
        (tpuseg/utils/debug_images.py)."""
        b = encode.shape[0]
        pro_split, pro_merge = self._attend(encode, sem_mask, target, False)
        idx = jnp.zeros((b,), jnp.int32)
        gold = jnp.take_along_axis(
            target, idx[:, None, None, None], axis=-1
        ).astype(jnp.float32)
        alpha = jnp.take_along_axis(
            pro_split, idx[:, None, None, None], axis=-1
        ).reshape(b, -1)
        s = jnp.argmax(jax.lax.stop_gradient(alpha), axis=1)
        step = _GlimpseStep(
            cfg=self.cfg, train=False, mode="debug", dtype=self.dtype,
            name="glimpse",
        )
        t_all, p_all = step(
            None,
            {"feats": feats, "sem_mask": sem_mask, "gold": gold},
            {"s": s},
        )
        return {
            "preds": p_all,
            "targets": t_all,
            "alpha": alpha,
            "pro": pro_merge,
            "point": s,
        }

    def _prep(self, encode, sem_mask, feats):
        """Glimpse-independent half of extraction: merged attention score
        + the per-level conv1 partials of the transformed skip features
        (the 'attend + skip transforms' fixed cost in PERF.md, paid once
        per batch).  The partials fold the skip pyramid AND the semantic
        mask channels of every level's conv1 into one (B, h, w, out_ch)
        tensor per level — the extraction rounds then convolve only the
        per-glimpse channels (pyramid.py ``call_split``), so the skip
        pyramid is never repeated to the B*G decode batch at all."""
        dummy_target = sem_mask
        _, pro_merge = self._attend(encode, sem_mask, dummy_target, False)
        step = _GlimpseStep(
            cfg=self.cfg, train=False, mode="prep", dtype=self.dtype,
            name="glimpse",
        )
        partials = step(None, {"feats": feats, "sem_mask": sem_mask}, None)
        return pro_merge, partials

    @staticmethod
    def _stop_scalars(cfg, stop_params):
        """(min_remaining_frac, max_extract_misses, peak_suppress_factor,
        stop_remaining_frac) as device scalars — from the runtime override
        or the config defaults.  Shorter overrides (2-tuple pre-r3 /
        3-tuple pre-stop-split stop_params.json) keep the config defaults
        for the trailing scalars.  A non-positive stop fraction resolves
        to ``min_remaining_frac`` (the pre-split coupled behavior)."""
        defaults = (
            cfg.min_remaining_frac, cfg.max_extract_misses,
            cfg.peak_suppress_factor, cfg.stop_remaining_frac,
        )
        if stop_params is None:
            vals = defaults
        else:
            vals = tuple(stop_params) + defaults[len(stop_params):]
        min_frac, max_misses, suppress, stop_frac = vals
        min_frac = jnp.asarray(min_frac, jnp.float32)
        stop_frac = jnp.asarray(stop_frac, jnp.float32)
        stop_frac = jnp.where(stop_frac > 0, stop_frac, min_frac)
        return (
            min_frac,
            jnp.asarray(max_misses, jnp.int32),
            jnp.asarray(suppress, jnp.float32),
            stop_frac,
        )

    def _extract_rounds(
        self, sem_mask, score, skips_t, max_instances, count_budget,
        n_rounds: int, n_filters: int, carry_in=None, stop_params=None,
    ):
        """``n_rounds`` extraction rounds from prepped (score, skips_t).

        Identical round math to ``_extract``'s scan (same scanned module,
        same param paths) minus the k==0 skip-transform branch — the
        transforms arrive precomputed, so ``k`` starts at 1.  Passing the
        returned ``carry_out`` back as ``carry_in`` continues extraction
        exactly where it stopped, enabling the host-level round stepping
        PERF.md sketches: dispatch a few rounds, read the tiny ``done``
        vector, continue only if some sample still has budget left.
        """
        cfg = self.cfg
        b, h, w, _ = sem_mask.shape
        k_static = max_instances or self.max_n_objects
        G = max(int(cfg.extract_group), 1)

        min_frac, max_misses, suppress, stop_frac = self._stop_scalars(
            cfg, stop_params
        )
        fg_px = jnp.sum(sem_mask.reshape(b, -1), axis=1)
        min_pixels = jnp.maximum(fg_px * min_frac, 1.0)
        stop_pixels = jnp.maximum(fg_px * stop_frac, 1.0)

        if carry_in is None:
            carry0 = {
                "remaining": sem_mask.astype(jnp.float32),
                "idmap": jnp.zeros((b, h, w), jnp.int32),
                "count": jnp.zeros((b,), jnp.int32),
                "done": fg_px <= stop_pixels,
                "misses": jnp.zeros((b,), jnp.int32),
            }
        else:
            carry0 = {
                k: v for k, v in carry_in.items() if k != "skips_t"
            }

        if count_budget is None:
            max_count = jnp.full((b,), k_static, jnp.int32)
        else:
            max_count = jnp.minimum(count_budget.astype(jnp.int32), k_static)
        # glimpse-folded decode inputs are ROUND-invariant conv1 partials
        # (pyramid.py ``conv1_partials``) at batch B — the rounds convolve
        # only the per-glimpse channels and broadcast-add the partials
        # over the G glimpses, so no repeated skip pyramid (and none of
        # its per-round layout copies) ever materialises in the loop
        const = {
            "score": score,
            "sem_mask": sem_mask.astype(jnp.float32),
            "feats": None,
            "partials": tuple(skips_t),
            "min_pixels": min_pixels,
            "stop_pixels": stop_pixels,
            "max_count": max_count,
            "max_misses": max_misses,
            "fg_px": fg_px,
            "suppress": suppress,
        }
        step_kwargs = dict(
            cfg=cfg, train=False, mode="extract", dtype=self.dtype,
            n_filters=n_filters, name="glimpse",
        )
        # k >= 1 always: the scanned step's k==0 branch (compute skip
        # transforms) never fires — they are inputs here.
        xs = {"k": jnp.arange(1, n_rounds + 1, dtype=jnp.int32)}
        scan = _scanned(
            step_kwargs, length=n_rounds, carry_stats=False, need_rngs=False,
        )
        carry, _ = scan(carry0, const, xs)
        carry_out = {
            k: v for k, v in carry.items() if k != "skips_t"
        }
        return carry["idmap"], carry["count"], carry_out

    def _loss(
        self, encode, sem_mask, target, n_ins, feats, train: bool,
        skips_t=None,
    ) -> Dict[str, jnp.ndarray]:
        """Glimpse-loop loss (reference forward, attenet2.py:357-407).

        Args:
          encode: (B, H, W, d_model) instance features.
          sem_mask: (B, H, W, 1) semantic fg mask (GT-argmax in training,
            predicted at eval — reseg.py:117-120).
          target: (B, H, W, N) padded instance masks.
          n_ins: (B,) valid instance counts.
          feats: UNet skips (x1..x5).

        Returns dict(loss, criterion, ins_ce_loss, ins_dice_loss).
        """
        cfg = self.cfg
        b = encode.shape[0]
        n = target.shape[-1]
        pro_split, pro_merge = self._attend(encode, sem_mask, target, train)

        n_min = jnp.maximum(jnp.min(n_ins), 1)
        if train:
            k_static = cfg.max_iter
            maxiter = jnp.minimum(jnp.asarray(cfg.max_iter, jnp.int32), n_min)
        else:
            k_static = self.max_n_objects
            maxiter = n_min

        # random instance order (reference getRandomIdx, attenet2.py:349-355):
        # uniform keys, invalid slots pushed to the end.
        if cfg.deterministic_glimpse:
            perm = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None, :], (b, n)
            )
        else:
            key = self.make_rng("glimpse")
            scores = jax.random.uniform(key, (b, n))
            scores = scores + (jnp.arange(n)[None, :] >= n_ins[:, None]) * 1e9
            perm = jnp.argsort(scores, axis=1).astype(jnp.int32)

        baseline = self.variable(
            "decoder_state", "baseline", lambda: jnp.zeros((), jnp.float32)
        )
        carry0 = {
            "loss": jnp.zeros((), jnp.float32),
            "criterion": jnp.zeros((), jnp.float32),
            "ce": jnp.zeros((), jnp.float32),
            "dice": jnp.zeros((), jnp.float32),
            "baseline": baseline.value,
        }
        if not train:
            # hoisted skip transforms carried through the eval scan
            b_, h_, w_ = sem_mask.shape[0], sem_mask.shape[1], sem_mask.shape[2]
            skip_dtype = self.dtype or jnp.float32
            carry0["skips_t"] = tuple(
                jnp.zeros(s, skip_dtype)
                for s in skip_transform_shapes(
                    b_, h_, w_, n_filters=feats[0].shape[-1],
                    use_mask=cfg.use_mask, position_type=cfg.position_type,
                )
            )
        const = {
            "target": target,
            "pro_split": pro_split,
            "pro_merge": pro_merge,
            "sem_mask": sem_mask,
            "feats": feats,
            "maxiter": maxiter,
        }
        if train and skips_t is not None:
            const["skips_t"] = tuple(skips_t)
        xs = {
            "idx": perm[:, :k_static].T,          # (K, B)
            "k": jnp.arange(k_static, dtype=jnp.int32),
        }
        # batch_stats are carried (mutated per glimpse) in training; at init
        # they do not exist yet, so they are broadcast for creation.
        scan = _scanned(
            dict(cfg=cfg, train=train, mode="loss", dtype=self.dtype,
                 name="glimpse"),
            length=k_static,
            carry_stats=train and not self.is_initializing(),
            need_rngs=train,
        )
        carry, ys = scan(carry0, const, xs)
        if train and not self.is_initializing():
            baseline.value = carry["baseline"]

        denom = maxiter.astype(jnp.float32)
        out = {
            "loss": carry["loss"] / denom,
            "criterion": carry["criterion"] / denom,
            "ins_ce_loss": carry["ce"] / denom,
            "ins_dice_loss": carry["dice"] / denom,
        }
        if cfg.debug_loss_terms and ys is not None:
            out.update({f"debug_{k}": v for k, v in ys.items()})
        return out

    def _extract(
        self, encode, sem_mask, feats, max_instances: Optional[int] = None,
        count_budget=None, stop_params=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched instance extraction at inference (new working path).

        Scans over rounds of ``cfg.extract_group`` glimpses: each round
        picks G disk-suppressed attention peaks in the remaining
        foreground, decodes all G masks in one batch-folded pyramid pass,
        and carves them out in peak order; stops per sample when the
        remaining foreground drops below ``cfg.min_remaining_frac`` of the
        initial foreground (or after ``max_extract_misses`` degenerate
        glimpses).

        Returns (idmap (B, H, W) int32 with 0 = background,
                 n_objects (B,) int32).
        """
        cfg = self.cfg
        b, h, w, _ = sem_mask.shape
        k_static = max_instances or self.max_n_objects
        G = max(int(cfg.extract_group), 1)
        n_rounds = -(-k_static // G)  # ceil: G glimpses per round
        # share attention params with the loss path: same submodule names.
        dummy_target = sem_mask  # (B,H,W,1) — per-instance softmax over fg
        pro_split, pro_merge = self._attend(encode, sem_mask, dummy_target, False)
        del pro_split

        min_frac, max_misses, suppress, stop_frac = self._stop_scalars(
            cfg, stop_params
        )
        fg_px = jnp.sum(sem_mask.reshape(b, -1), axis=1)
        min_pixels = jnp.maximum(fg_px * min_frac, 1.0)
        stop_pixels = jnp.maximum(fg_px * stop_frac, 1.0)

        skip_dtype = self.dtype or jnp.float32
        carry0 = {
            "remaining": sem_mask.astype(jnp.float32),
            "idmap": jnp.zeros((b, h, w), jnp.int32),
            "count": jnp.zeros((b,), jnp.int32),
            "done": fg_px <= stop_pixels,
            "misses": jnp.zeros((b,), jnp.int32),
            "skips_t": tuple(
                jnp.zeros(s, skip_dtype)
                for s in skip_transform_shapes(
                    b, h, w, n_filters=feats[0].shape[-1],
                    use_mask=cfg.use_mask, position_type=cfg.position_type,
                )
            ),
            "k": jnp.zeros((), jnp.int32),
        }
        if count_budget is None:
            max_count = jnp.full((b,), k_static, jnp.int32)
        else:
            max_count = jnp.minimum(
                count_budget.astype(jnp.int32), k_static
            )
        const = {
            "score": pro_merge,
            "sem_mask": sem_mask.astype(jnp.float32),
            "feats": feats,
            "min_pixels": min_pixels,
            "stop_pixels": stop_pixels,
            "max_count": max_count,
            "max_misses": max_misses,
            "fg_px": fg_px,
            "suppress": suppress,
        }
        step_kwargs = dict(
            cfg=cfg, train=False, mode="extract", dtype=self.dtype,
            name="glimpse",
        )
        if self.is_initializing() or self.extract_loop == "unroll1":
            # create params once; the loops below only read them
            step = _GlimpseStep(**step_kwargs)
            carry, _ = step(carry0, const, {"k": carry0["k"]})
            return carry["idmap"], carry["count"]

        if self.extract_loop == "while":
            # ROUND-granular early exit: measured on this TPU stack,
            # lax.cond inside a scan executes both branches (a 1-active-
            # round scan times the same as 8, tools probe), so a fixed
            # scan pays for every round regardless of `done`.  A while
            # loop over ROUNDS (not single glimpses — the round-1
            # per-glimpse variant had ~32 tiny iterations and compiled
            # pathologically through the remote tunnel) gives the real
            # data-dependent trip count: extraction stops as soon as every
            # sample's budget/foreground is exhausted.
            step = _GlimpseStep(**step_kwargs)

            def cond_fn(mdl, c):
                return jnp.logical_and(
                    c["k"] < n_rounds,
                    jnp.any(jnp.logical_not(c["done"])),
                )

            def body_fn(mdl, c):
                k = c["k"]
                new, _ = mdl(
                    {key: v for key, v in c.items() if key != "k"},
                    const, {"k": k},
                )
                new["k"] = k + 1
                return new

            carry = nn.while_loop(cond_fn, body_fn, step, carry0)
            return carry["idmap"], carry["count"]

        # default: fixed-length scan over rounds of G glimpses (done
        # samples carry through unchanged; a lax.cond wraps each round but
        # on this backend it is predicated, not skipped — see "while")
        del carry0["k"]
        xs = {"k": jnp.arange(n_rounds, dtype=jnp.int32)}
        scan = _scanned(
            step_kwargs, length=n_rounds, carry_stats=False, need_rngs=False,
        )
        carry, _ = scan(carry0, const, xs)
        return carry["idmap"], carry["count"]
