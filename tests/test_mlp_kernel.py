"""Differential tests: fused Pallas MLP kernel vs the unfused reference.

Interpret mode on CPU; the same code path runs compiled on TPU inside the
ViT (models/vit.py Block) and is exercised by the TPU benches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.ops.mlp_kernel import (
    ROW_BLOCK,
    _mlp_reference,
    fused_mlp,
)


def make_case(rows, w=128, ratio=4, dtype=jnp.float32, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    x = jax.random.normal(ks[0], (rows, w), dtype)
    w1 = jax.random.normal(ks[1], (w, w * ratio), dtype) * 0.05
    b1 = jax.random.normal(ks[2], (w * ratio,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (w * ratio, w), dtype) * 0.05
    b2 = jax.random.normal(ks[4], (w,), jnp.float32) * 0.1
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("rows", [ROW_BLOCK, 3 * ROW_BLOCK])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_mlp_matches_reference(rows, dtype):
    args = make_case(rows, dtype=dtype)
    got = fused_mlp(*args, True)                      # interpret mode
    want = _mlp_reference(*args)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-5)


def test_untiled_rows_fall_back():
    args = make_case(ROW_BLOCK + 8)
    got = fused_mlp(*args, True)
    want = _mlp_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_fused_mlp_vjp_matches_reference():
    args = make_case(ROW_BLOCK)
    out, vjp = jax.vjp(lambda *a: fused_mlp(*a, True), *args)
    out_r, vjp_r = jax.vjp(_mlp_reference, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    g = jnp.ones_like(out)
    for got, want in zip(vjp(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_vit_block_uses_fused_path():
    """ViT fwd with fused_mlp on == off (rows below ROW_BLOCK fall back,
    so force a tiled row count)."""
    from vit_marl_tpu.models.vit import ViTConfig, ViTEncoder

    B = ROW_BLOCK  # rows = B * (levels+1); levels=7 -> 8 tokens -> tiled
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 7, 3, 2))
    cfg_on = ViTConfig(width=64, depth=2, heads=2, compute_dtype="float32",
                       fused_mlp=True)
    cfg_off = ViTConfig(width=64, depth=2, heads=2, compute_dtype="float32",
                        fused_mlp=False)
    net_on = ViTEncoder(cfg_on)
    params = net_on.init(jax.random.PRNGKey(1), img)
    out_on = net_on.apply(params, img)
    # rename fused params to the Dense layout for the unfused module
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    ren = {}
    for k, v in flat.items():
        k = list(k)
        for i, part in enumerate(k):
            if part.startswith("mlp") and "_" in part:
                mod, leaf = part.split("_")
                k = k[:i] + [mod, leaf]
                break
        ren[tuple(k)] = v
    params_off = {"params": flax.traverse_util.unflatten_dict(ren)}
    out_off = ViTEncoder(cfg_off).apply(params_off, img)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-5, atol=2e-5)
