"""Batched inference pipeline.

Replaces the reference ``Prediction`` + serial ``pred_list.py`` loop
(``code/lib/prediction.py``, ``code/pred_list.py:63-99``): images are
loaded and bilinear-resized on host, then processed in fixed-size batches
through one jitted program that fuses the 21-channel expansion, the UNet
forward, and the iterative instance extraction.  The per-image KMeans over
embeddings (prediction.py:52-85, the discriminative-loss lineage) is kept
as an on-device capability in ``tpuseg.runtime.cluster``.

Outputs match the reference artifact semantics: foreground mask (argmax),
per-pixel instance id mask, instance count, nearest-neighbour upsampled to
each image's native resolution (prediction.py:47-50).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tpuseg.configs import Config
from tpuseg.data import augment as A
from tpuseg.data.colorspace import image_ex_standardize
from tpuseg.parallel import make_mesh, shard_batch


def pack_masks(fg: jnp.ndarray, idmap: jnp.ndarray) -> jnp.ndarray:
    """Fuse the {0,1} foreground mask and the instance id map (ids < 128)
    into ONE uint8 plane: ``idmap | fg << 7``.  The host link through the
    tunnelled backend moves ~60 MB/s, so halving the per-batch mask
    traffic is ~1 ms/img at 256²; the host unpacks with two numpy ops."""
    return (
        idmap.astype(jnp.uint8) | (fg.astype(jnp.uint8) << 7)
    )


def unpack_masks(packed: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of :func:`pack_masks`."""
    return (packed >> 7).astype(np.uint8), (packed & 0x7F).astype(np.uint8)


class Predictor:
    def __init__(
        self,
        cfg: Config,
        model,
        variables,
        batch_size: int = 8,
        use_mesh: bool = False,
        n_devices: Optional[int] = None,
        max_instances: Optional[int] = None,
        staged: bool = False,
        stop_params: Optional[Tuple[float, int]] = None,
        staged_margin: int = 1,
    ):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.mesh = make_mesh(n_devices) if use_mesh else None
        if self.mesh is not None:
            from tpuseg.parallel import replicate

            n = self.mesh.devices.size
            self.batch_size = max(batch_size // n, 1) * n
            self.variables = replicate(variables, self.mesh)
        self.max_instances = max_instances
        self.staged = staged
        self.staged_margin = staged_margin
        # stopping-rule override (tools/calibrate_stopping.py writes the
        # calibrated values to assets/stop_params.json); None = config
        # defaults.  Baked into the traced programs as constants.
        self.stop_params = stop_params
        self._rounds_cache: Dict[int, Any] = {}

        dec = self._decoder_module()
        G = max(int(cfg.decoder.extract_group), 1)
        k_static = max_instances or cfg.data.max_n_objects
        max_rounds = -(-k_static // G)
        n_filters = cfg.model.n_filters

        def _infer_full(variables, images_u8):
            """Monolithic inference as ONE jitted program, structured as
            prep + extraction rounds (two ``apply`` calls in one trace).
            Tracing the halves separately lets the round scan consume the
            repeated skip pyramid as a loop-invariant const instead of
            re-materialising it inside every round (~20% of the k=32 cost;
            see PERF.md), while keeping a single host dispatch."""
            x = image_ex_standardize(images_u8)
            sem_probs, sem_mask, budget, score, skips_t = model.apply(
                variables, x, mode="infer_prep", max_instances=max_instances,
            )
            dec_vars = {
                col: tree["decoder"]
                for col, tree in variables.items()
                if "decoder" in tree
            }
            idmap, counts, _ = dec.apply(
                dec_vars, None, sem_mask, mode="extract_rounds",
                score=score, skips_t=skips_t,
                max_instances=max_instances, count_budget=budget,
                n_rounds=max_rounds, n_filters=n_filters,
                stop_params=stop_params,
            )
            return sem_probs, idmap, counts

        @jax.jit
        def _infer(variables, images_u8):
            """Compact outputs: host transfer through the device link is
            the pipeline bottleneck (~60 MB/s on the tunnelled backend), so
            masks travel as uint8 and the semantic probabilities stay on
            device unless explicitly requested."""
            sem_probs, idmap, counts = _infer_full(variables, images_u8)
            fg = jnp.argmax(sem_probs, axis=-1).astype(jnp.uint8)
            return fg, idmap.astype(jnp.uint8), counts.astype(jnp.int32)

        self._infer = _infer

        @jax.jit
        def _infer_packed(variables, images_u8):
            """One-plane output: fg and idmap packed into a single uint8
            transfer (pack_masks) — the host link is the bottleneck."""
            sem_probs, idmap, counts = _infer_full(variables, images_u8)
            fg = jnp.argmax(sem_probs, axis=-1)
            return pack_masks(fg, idmap), counts.astype(jnp.int32)

        self._infer_packed = _infer_packed
        self._pack = jax.jit(pack_masks)

        @jax.jit
        def _infer_with_probs(variables, images_u8):
            sem_probs, idmap, counts = _infer_full(variables, images_u8)
            fg = jnp.argmax(sem_probs, axis=-1).astype(jnp.uint8)
            return sem_probs, fg, idmap.astype(jnp.int32), counts

        self._infer_with_probs = _infer_with_probs

        @jax.jit
        def _infer_semantic(variables, images_u8):
            x = image_ex_standardize(images_u8)
            return model.apply(variables, x, mode="semantic")

        self._infer_semantic = _infer_semantic

        @jax.jit
        def _infer_prep(variables, images_u8):
            """Stage A of the staged dispatch: everything up to (and
            including) the glimpse-independent attention + skip
            transforms, plus the count-head budget vector — the ONLY
            value the host reads between stages."""
            x = image_ex_standardize(images_u8)
            sem_probs, sem_mask, budget, score, skips_t = model.apply(
                variables, x, mode="infer_prep",
                max_instances=max_instances,
            )
            fg = jnp.argmax(sem_probs, axis=-1).astype(jnp.uint8)
            return fg, sem_mask, budget, score, skips_t

        self._infer_prep = _infer_prep

    # ---------------------- staged extraction -------------------------

    def _decoder_module(self):
        from tpuseg.decoder.instance import InstanceDecoder

        return InstanceDecoder(
            cfg=self.cfg.decoder,
            max_n_objects=self.cfg.data.max_n_objects,
            dtype=getattr(self.model, "dtype", None),
        )

    def _decoder_variables(self):
        return {
            col: tree["decoder"]
            for col, tree in self.variables.items()
            if "decoder" in tree
        }

    def _rounds_fn(self, n_rounds: int):
        """Jitted stage-B program running exactly ``n_rounds`` extraction
        rounds (one executable per distinct n, cached)."""
        if n_rounds in self._rounds_cache:
            return self._rounds_cache[n_rounds]
        dec = self._decoder_module()
        max_instances = self.max_instances
        n_filters = self.cfg.model.n_filters
        default_sp = self.stop_params  # baked constants when set

        @jax.jit
        def f(dec_vars, sem_mask, score, skips_t, budget, carry_in,
              stop_params=None):
            idmap, counts, carry = dec.apply(
                dec_vars, None, sem_mask, mode="extract_rounds",
                score=score, skips_t=skips_t,
                max_instances=max_instances, count_budget=budget,
                n_rounds=n_rounds, n_filters=n_filters,
                carry_in=carry_in,
                stop_params=(
                    stop_params if stop_params is not None else default_sp
                ),
            )
            return idmap.astype(jnp.uint8), counts.astype(jnp.int32), carry

        self._rounds_cache[n_rounds] = f
        return f

    def _infer_staged(self, variables, x):
        """Staged dispatch: prep once, read the tiny per-sample budget
        vector, then run only the extraction rounds the batch needs —
        the static path always pays ceil(max_instances/G) rounds (PERF.md:
        15.41 ms/img at the k=32 cap vs 8.60 at k=16 purely from wasted
        rounds), while typical batches need ceil(max_count/G).

        A continuation loop (2-round steps, device-resident carry, one
        tiny ``done`` readback each) covers miss-heavy samples, so the
        result is EXACTLY the static path's: extraction stops when every
        sample is done or the static round budget is exhausted
        (tests/test_staged_extraction.py asserts idmap equality)."""
        return self._extract_from_prep(self._infer_prep(variables, x))

    def _extract_from_prep(self, prep_out):
        """Stage B driver from a stage-A output (separate so pipelines can
        dispatch every batch's prep before the first budget readback)."""
        cfg = self.cfg
        G = max(int(cfg.decoder.extract_group), 1)
        k_static = self.max_instances or cfg.data.max_n_objects
        max_rounds = -(-k_static // G)
        cont_rounds = 2

        fg, sem_mask, budget, score, skips_t = prep_out
        need = int(np.asarray(jnp.max(budget)))  # the one host readback
        n = min(max(-(-need // G), 1), max_rounds)
        dec_vars = self._decoder_variables()

        carry = None
        idmap = counts = None
        used = 0
        while used < max_rounds:
            step_n = min(n, max_rounds - used)
            idmap, counts, carry = self._rounds_fn(step_n)(
                dec_vars, sem_mask, score, skips_t, budget, carry
            )
            used += step_n
            if used >= max_rounds or bool(np.asarray(carry["done"]).all()):
                break
            n = cont_rounds
        return fg, idmap, counts

    def predict_batches_staged(
        self, xs: Sequence[jnp.ndarray], packed: bool = False
    ):
        """Pipelined staged dispatch over a WINDOW of batches.

        The per-batch staged driver (``_extract_from_prep``) blocks twice
        per batch on tiny readbacks (budget, done); through the tunnelled
        backend each blocking sync costs ~0.1 s, which is why staged lost
        to the monolithic program per batch (PERF.md).  Here every
        readback is ONE concatenated transfer for the whole window:

          1. dispatch prep for every batch (async)
          2. one sync: the stacked budget vectors -> per-batch round count
          3. dispatch every batch's rounds program (async)
          4. one sync: the stacked all-done flags; batches that still have
             live samples get device-resident continuation chunks
          5. caller drains the outputs

        Typical 256-sq batches need ceil(max_count/G)=3 rounds vs the
        static path's ceil(32/4)=8, so the extraction compute drops ~2.5x
        while the sync cost is paid per window.  Results are EXACTLY the
        static path's (same rounds program + carry as _extract_from_prep;
        tests/test_staged_extraction.py).

        Returns a list of (fg, idmap, counts) device-array triples; with
        ``packed=True`` a list of (packed_u8, counts) pairs instead (one
        mask transfer per batch, see pack_masks)."""
        cfg = self.cfg
        G = max(int(cfg.decoder.extract_group), 1)
        k_static = self.max_instances or cfg.data.max_n_objects
        max_rounds = -(-k_static // G)
        cont_rounds = 2
        dec_vars = self._decoder_variables()

        preps = [self._infer_prep(self.variables, x) for x in xs]
        # one host readback for the whole window (budgets share (B,))
        budgets = np.asarray(jnp.stack([pr[2] for pr in preps]))
        states = []
        for pr, bud in zip(preps, budgets):
            need = int(bud.max())
            states.append({
                "prep": pr, "carry": None, "used": 0, "out": None,
                # +margin extra rounds in the first chunk: cheaper than a
                # near-certain continuation round-trip when a couple of
                # glimpses miss
                "n": min(max(-(-need // G) + int(self.staged_margin), 1),
                         max_rounds),
            })
        live = list(range(len(states)))
        while live:
            for i in live:
                st = states[i]
                fg, sem_mask, budget, score, skips_t = st["prep"]
                step_n = min(st["n"], max_rounds - st["used"])
                idmap, counts, carry = self._rounds_fn(step_n)(
                    dec_vars, sem_mask, score, skips_t, budget, st["carry"]
                )
                st["out"] = (fg, idmap, counts)
                st["carry"] = carry
                st["used"] += step_n
                st["n"] = cont_rounds
            still = [i for i in live if states[i]["used"] < max_rounds]
            if not still:
                break
            # one sync for every batch's all-done flag
            dones = np.asarray(jnp.stack(
                [jnp.all(states[i]["carry"]["done"]) for i in still]
            ))
            live = [i for i, d in zip(still, dones) if not bool(d)]
        if packed:
            return [
                (self._pack(st["out"][0], st["out"][1]), st["out"][2])
                for st in states
            ]
        return [st["out"] for st in states]

    # ------------------------------------------------------------------
    def _load(self, path: str) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
        img = Image.open(path).convert("RGB")
        w, h = img.size
        resized = np.array(
            A.resize(img, self.cfg.data.image_height, self.cfg.data.image_width)
        )
        return np.array(img), resized.astype(np.uint8), (h, w)

    @staticmethod
    def _upsample_nearest(arr: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
        """cv2.INTER_NEAREST equivalent via PIL (prediction.py:47-50)."""
        return np.array(
            Image.fromarray(arr).resize((hw[1], hw[0]), A.NEAREST)
        )

    # ------------------------------------------------------------------
    def predict_batch_arrays(self, images_u8: np.ndarray, with_probs: bool = True):
        """images_u8: (B, H, W, 3). Returns (sem_probs, fg, idmap, counts)
        device arrays (sem_probs is None when with_probs=False — the
        fast path that avoids the large f32 host transfer)."""
        x = jnp.asarray(images_u8)
        if self.mesh is not None:
            x = shard_batch(x, self.mesh)
        if with_probs:
            return self._infer_with_probs(self.variables, x)
        if self.staged:
            fg, idmap, counts = self._infer_staged(self.variables, x)
        else:
            fg, idmap, counts = self._infer(self.variables, x)
        return None, fg, idmap, counts

    def predict_batch_packed(self, images_u8: np.ndarray):
        """(packed_u8, counts) device arrays — ONE mask plane per batch
        (pack_masks) for transfer-bound pipelines; host side splits with
        unpack_masks."""
        x = jnp.asarray(images_u8)
        if self.mesh is not None:
            x = shard_batch(x, self.mesh)
        if self.staged:
            fg, idmap, counts = self._infer_staged(self.variables, x)
            return self._pack(fg, idmap), counts
        return self._infer_packed(self.variables, x)

    def predict_paths(
        self, paths: Sequence[str], window: int = 8
    ) -> Iterator[Dict]:
        """Yields per image: dict(image, fg_mask (native res, {0,1} uint8),
        ins_mask (native res, int ids), n_objects).

        Staged mode processes ``window`` batches per pipelined dispatch
        (predict_batches_staged) so the tunnel syncs amortize over the
        window; monolithic mode keeps the one-program-per-batch path."""
        n = len(paths)
        bs = self.batch_size
        starts = list(range(0, n, bs))
        win = window if (self.staged and self.mesh is None) else 1
        for ws in range(0, len(starts), win):
            metas, xs = [], []
            for start in starts[ws : ws + win]:
                chunk = list(paths[start : start + bs])
                n_valid = len(chunk)
                while len(chunk) < bs:
                    chunk.append(chunk[-1])
                raws, resized, sizes = zip(*[self._load(p) for p in chunk])
                metas.append((chunk, raws, sizes, n_valid))
                xs.append(jnp.asarray(np.stack(resized)))
            if win > 1:
                outs = self.predict_batches_staged(xs, packed=True)
            else:
                outs = [self.predict_batch_packed(x) for x in xs]
            for (chunk, raws, sizes, n_valid), (packed, counts) in zip(
                metas, outs
            ):
                fg, idmap = unpack_masks(np.asarray(packed))
                counts = np.asarray(counts)
                for i in range(n_valid):
                    yield {
                        "path": chunk[i],
                        "image": raws[i],
                        "fg_mask": self._upsample_nearest(fg[i], sizes[i]),
                        "ins_mask": self._upsample_nearest(
                            idmap[i].astype(np.int32), sizes[i]
                        ).astype(np.uint8),
                        "n_objects": int(counts[i]),
                    }

    # ---------------- mixed-resolution bucketed inference ----------------

    @staticmethod
    def _bucket_shape(h: int, w: int, multiple: int = 64,
                      cap: int = 1024) -> Tuple[int, int]:
        """Round a native resolution up to the bucket grid: multiples of
        ``multiple`` (the UNet downsamples 16x; 64 keeps the bucket count
        small so at most a handful of programs compile), capped so a
        single huge input cannot OOM the chip."""
        bh = min(int(-(-h // multiple)) * multiple, cap)
        bw = min(int(-(-w // multiple)) * multiple, cap)
        return max(bh, multiple), max(bw, multiple)

    def predict_paths_bucketed(
        self, paths: Sequence[str], multiple: int = 64, cap: int = 1024
    ) -> Iterator[Dict]:
        """BASELINE.md stretch config: mixed-resolution inference without
        the fixed 256x256 resize.  Images are grouped into shape buckets
        (native resolution rounded up to ``multiple``), zero-padded onto
        the bucket canvas, and each bucket runs through one jitted program
        at its own static shape — XLA caches one executable per bucket.
        Outputs are cropped back to the native resolution, so masks are
        PIXEL-ALIGNED with the input (the fixed-res path nearest-upsamples
        instead, reference prediction.py:47-50).

        Yields results in the original ``paths`` order."""
        items = []
        for i, p in enumerate(paths):
            img = np.array(Image.open(p).convert("RGB"))
            h, w = img.shape[:2]
            items.append((i, p, img, (h, w), self._bucket_shape(h, w,
                                                                multiple,
                                                                cap)))
        buckets: Dict[Tuple[int, int], List] = {}
        for it in items:
            buckets.setdefault(it[4], []).append(it)

        results: List[Optional[Dict]] = [None] * len(items)
        for (bh, bw), group in buckets.items():
            bs = self.batch_size  # fixed batch dim: one executable/bucket
            for start in range(0, len(group), bs):
                chunk = group[start : start + bs]
                canvas = np.zeros((bs, bh, bw, 3), np.uint8)
                for j, (_, _, img, (h, w), _) in enumerate(chunk):
                    sh, sw = min(h, bh), min(w, bw)
                    if h > bh or w > bw:
                        # capped bucket: DOWNSCALE onto the canvas (never
                        # crop — a crop would predict on a corner and
                        # stretch its masks over the full image)
                        img = np.array(
                            Image.fromarray(img).resize((sw, sh),
                                                        Image.BILINEAR)
                        )
                    canvas[j, :sh, :sw] = img[:sh, :sw]
                packed, counts = self.predict_batch_packed(canvas)
                fg, idmap = unpack_masks(np.asarray(packed))
                counts = np.asarray(counts)
                for j, (i, p, img, (h, w), _) in enumerate(chunk):
                    fg_j = fg[j, : min(h, bh), : min(w, bw)]
                    id_j = idmap[j, : min(h, bh), : min(w, bw)]
                    if fg_j.shape != (h, w):  # capped bucket: upsample back
                        fg_j = self._upsample_nearest(fg_j, (h, w))
                        id_j = self._upsample_nearest(
                            id_j.astype(np.int32), (h, w)
                        ).astype(np.uint8)
                    results[i] = {
                        "path": p,
                        "image": img,
                        "fg_mask": fg_j,
                        "ins_mask": id_j,
                        "n_objects": int(counts[j]),
                    }
        for r in results:
            yield r

    def predict_attend(self, path: str) -> Dict:
        """Legacy ``Prediction.predict_attend`` (prediction.py:157-182):
        the attention decoder's own masks, no clustering — in tpuseg that
        IS the production extraction path, exposed single-image."""
        return next(iter(self.predict_paths([path])))

    def predict_cluster(self, path: str, seed: int = 0) -> Dict:
        """Legacy ``Prediction.predict``/``predict_wae`` clustering path
        (prediction.py:87-155): per-pixel instance embeddings restricted
        to predicted-foreground pixels, KMeans'd into ``n`` clusters — on
        device (runtime/cluster.py), not sklearn.  ``n`` comes from the
        count head when present (the reference hardcodes 16 at
        model.py:496).  Optionally augments embeddings with coordinate
        planes (prediction.py:28-30,61-62)."""
        from tpuseg.runtime.cluster import kmeans_cluster

        raw, resized, size = self._load(path)

        if not hasattr(self, "_infer_embed"):
            @jax.jit
            def _embed(variables, images_u8):
                x = image_ex_standardize(images_u8)
                return self.model.apply(variables, x, mode="embed")

            self._infer_embed = _embed

        sem_probs, emb, n_est = self._infer_embed(
            self.variables, jnp.asarray(resized[None])
        )
        fg = jnp.argmax(sem_probs[0], axis=-1)
        emb0 = emb[0].astype(jnp.float32)
        if self.cfg.model.use_coordinates:
            from tpuseg.nn.coord_conv import add_coordinates

            emb0 = add_coordinates(emb0[None], with_r=True)[0]
        n = jnp.clip(n_est[0], 1, self.cfg.data.max_n_objects)
        ids, _ = kmeans_cluster(
            emb0, fg, n, jax.random.PRNGKey(seed),
            max_clusters=self.cfg.data.max_n_objects,
        )
        return {
            "path": path,
            "image": raw,
            "fg_mask": self._upsample_nearest(
                np.asarray(fg).astype(np.uint8), size
            ),
            "ins_mask": self._upsample_nearest(
                np.asarray(ids).astype(np.int32), size
            ).astype(np.uint8),
            "n_objects": int(n),
        }

    def predict_semantic(self, path: str) -> Dict:
        """Semantic-only single-image path (reference pred.py __main__,
        pred.py:110-123): returns the fg probability map at native res."""
        raw, resized, size = self._load(path)
        probs = np.asarray(
            self._infer_semantic(self.variables, jnp.asarray(resized[None]))
        )[0]
        fg_prob = probs[..., 1]
        up = np.array(
            Image.fromarray(fg_prob.astype(np.float32)).resize(
                (size[1], size[0]), A.NEAREST
            )
        )
        return {"image": raw, "fg_prob": up}
