"""Spatial (sequence-parallel) sharding — SURVEY §5.7.

The input batch is sharded over HEIGHT across the faked 8-device mesh;
XLA's SPMD partitioner splits every convolution spatially and inserts the
halo collectives itself.  The tests prove (a) numerical equality with the
single-device forward — for the semantic path AND the full instance
inference (extraction + pyramid decode) at 512², (b) that outputs stay
H-sharded (no silent full-gather), and (c) that comms are halo
collective-permutes plus only small reductions — never a full-resolution
activation gather."""

import dataclasses
import re

import jax
import numpy as np
import pytest

from tpuseg.cli.common import build_model, init_variables
from tpuseg.configs import cvppp_config
from tpuseg.parallel import make_mesh
from tpuseg.parallel.spatial import (
    make_infer_spatial,
    make_semantic_spatial,
    shard_spatial,
)


def test_semantic_spatial_matches_single_device():
    assert jax.device_count() >= 8
    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            # H=128 -> 16 rows per device on the 8-mesh
            cfg.data, image_height=128, image_width=64, max_n_objects=4
        ),
        model=dataclasses.replace(cfg.model, n_filters=8),
    )
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=0)

    rng = np.random.RandomState(0)
    images = (rng.rand(2, 128, 64, 3) * 255).astype(np.uint8)

    # single-device reference
    from tpuseg.data.colorspace import image_ex_standardize
    import jax.numpy as jnp

    ref = jax.jit(
        lambda v, x: model.apply(
            v, image_ex_standardize(x), mode="semantic"
        )
    )(variables, jnp.asarray(images))

    mesh = make_mesh(8)
    fn = make_semantic_spatial(model, mesh)
    x_sharded = shard_spatial(images, mesh)
    out = fn(variables, x_sharded)

    # the output stays H-sharded: more than one device holds a shard
    assert len({d for s in out.addressable_shards for d in [s.device]}) == 8
    shard_h = out.addressable_shards[0].data.shape[1]
    assert shard_h == 128 // 8

    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-5
    )

    # the compiled module moves HALOS, not whole tensors: XLA's spatial
    # partitioning emits collective-permutes for the conv overlaps and no
    # all-gather anywhere (observed: 108 permutes, 0 gathers)
    hlo = fn.lower(variables, x_sharded).compile().as_text()
    assert hlo.count("collective-permute") > 0
    assert hlo.count("all-gather") == 0


def _all_gather_shapes(hlo: str):
    """Output shapes of every all-gather op in an HLO dump."""
    shapes = []
    for line in hlo.splitlines():
        m = re.search(r"=\s*(\w+)\[([\d,]*)\][^ ]*\s+all-gather", line)
        if m:
            dims = [int(d) for d in m.group(2).split(",") if d]
            shapes.append((m.group(1), dims))
    return shapes


@pytest.mark.slow
def test_infer_spatial_512_matches_single_device():
    """Full instance inference (extraction + pyramid decode) H-sharded at
    512×512 — larger than the reference's 256² ceiling — matches the
    single-device idmap exactly, with halo-only heavy comms.

    The reference cannot process any field of view above one GPU's 256²
    training resolution (/root/reference/code/lib/model.py pins cropsize);
    here the glimpse argmax / stopping rules reduce per-shard partials and
    only coarse (≤¼-resolution, 2-channel) pyramid maps ever gather.
    """
    assert jax.device_count() >= 8
    H = W = 512
    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=H, image_width=W, max_n_objects=4
        ),
        model=dataclasses.replace(cfg.model, n_filters=8),
    )
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=0)

    rng = np.random.RandomState(0)
    images = (rng.rand(1, H, W, 3) * 255).astype(np.uint8)

    from tpuseg.data.colorspace import image_ex_standardize
    import jax.numpy as jnp

    ref_sem, ref_idmap, ref_counts = [
        np.asarray(r)
        for r in jax.jit(
            lambda v, x: model.apply(
                v, image_ex_standardize(x), mode="infer", max_instances=4
            )
        )(variables, jnp.asarray(images))
    ]

    mesh = make_mesh(8)
    fn = make_infer_spatial(model, mesh, max_instances=4)
    x_sharded = shard_spatial(images, mesh)

    hlo = fn.lower(variables, x_sharded).compile().as_text()
    # heavy comms are conv-halo collective-permutes
    assert hlo.count("collective-permute") > 0
    # every all-gather is either a per-shard scalar partial (B, ndev) or a
    # coarse pyramid map: no gathered tensor has a full-resolution spatial
    # dim, and each is at most 1/8 of the 21-channel input activation
    input_activation_elems = H * W * 21
    for dtype, dims in _all_gather_shapes(hlo):
        elems = int(np.prod(dims)) if dims else 1
        assert elems * 8 <= input_activation_elems, (dtype, dims)
        assert max(dims, default=0) < H, (dtype, dims)

    sem, idmap, counts = fn(variables, x_sharded)
    # outputs stay H-sharded across all 8 devices
    assert len({s.device for s in idmap.addressable_shards}) == 8
    assert idmap.addressable_shards[0].data.shape[1] == H // 8

    np.testing.assert_allclose(
        ref_sem, np.asarray(sem), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(ref_idmap, np.asarray(idmap))
    np.testing.assert_array_equal(ref_counts, np.asarray(counts))
