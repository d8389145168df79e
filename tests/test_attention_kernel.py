"""Fused short-seq attention kernel vs the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.models.vit import VIT_PRESETS, ViTEncoder, attention_nhd
from vit_marl_tpu.ops.attention_kernel import (
    attention_ok,
    fused_short_attention,
)

KEY = jax.random.PRNGKey(0)


def _ref_from_flat(qkv_flat, n_tokens, heads, dtype=jnp.float32):
    rows, w3 = qkv_flat.shape
    W = w3 // 3
    qkv5 = qkv_flat.reshape(rows // n_tokens, n_tokens, 3, heads, W // heads)
    return attention_nhd(qkv5, dtype).reshape(rows, W)


@pytest.mark.parametrize("B,N,H,D,eb", [
    (128, 11, 6, 64, 64),      # ViT-Small book image
    (64, 11, 3, 64, 64),       # tiny preset heads
    (128, 5, 2, 32, 64),       # generic small-N
])
def test_kernel_matches_xla(B, N, H, D, eb):
    qkv = jax.random.normal(KEY, (B * N, 3 * H * D), jnp.float32)
    ref = _ref_from_flat(qkv, N, H)
    got = fused_short_attention(qkv, N, H, env_block=eb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_inputs():
    B, N, H, D = 128, 11, 6, 64
    qkv = jax.random.normal(KEY, (B * N, 3 * H * D)).astype(jnp.bfloat16)
    got = fused_short_attention(qkv, N, H, interpret=True)
    ref = _ref_from_flat(qkv.astype(jnp.float32), N, H)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_backward_matches_reference_grad():
    B, N, H, D = 64, 11, 2, 16
    qkv = jax.random.normal(KEY, (B * N, 3 * H * D), jnp.float32)

    def loss_kernel(x):
        return jnp.sum(fused_short_attention(x, N, H, env_block=64,
                                             interpret=True) ** 2)

    def loss_ref(x):
        return jnp.sum(_ref_from_flat(x, N, H) ** 2)

    g_kernel = jax.grad(loss_kernel)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("B,N,H,D", [
    (128, 11, 6, 64),          # ViT-Small book image
    (64, 11, 3, 64),
    (128, 5, 2, 32),
])
def test_bwd_kernel_matches_xla_vjp(B, N, H, D):
    """The Pallas backward kernel's dqkv vs the vjp of the XLA reference,
    at an arbitrary (non-symmetric) output cotangent."""
    from vit_marl_tpu.ops.attention_kernel import _bwd_kernel_call

    qkv = jax.random.normal(KEY, (B * N, 3 * H * D), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(9), (B * N, H * D),
                          jnp.float32)
    _, vjp = jax.vjp(lambda x: _ref_from_flat(x, N, H), qkv)
    d_ref, = vjp(g)
    d_got = _bwd_kernel_call(qkv, g, N, H, 64, True)
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                               rtol=2e-5, atol=2e-5)


def test_bwd_kernel_toggle_and_dtype():
    """bwd_kernel=False reproduces the XLA-vjp gradients exactly (the
    pre-round-4 behaviour) and the kernel path agrees within f32
    reassociation tolerance; bf16 qkv keeps a bf16 cotangent."""
    B, N, H, D = 64, 11, 2, 16
    qkv = jax.random.normal(KEY, (B * N, 3 * H * D), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(9), (B * N, H * D),
                          jnp.float32)

    def grad_with(bwd_kernel, x):
        f = lambda t: jnp.vdot(
            fused_short_attention(t, N, H, 64, True, bwd_kernel), g)
        return jax.grad(f)(x)

    _, vjp = jax.vjp(lambda x: _ref_from_flat(x, N, H), qkv)
    d_ref, = vjp(g)
    np.testing.assert_array_equal(np.asarray(grad_with(False, qkv)),
                                  np.asarray(d_ref))
    np.testing.assert_allclose(np.asarray(grad_with(True, qkv)),
                               np.asarray(d_ref), rtol=2e-5, atol=2e-5)

    d_bf16 = grad_with(True, qkv.astype(jnp.bfloat16))
    assert d_bf16.dtype == jnp.bfloat16


def test_attention_ok_tiling():
    assert attention_ok(64 * 11, 11)
    assert not attention_ok(63 * 11, 11)     # envs not a block multiple
    assert not attention_ok(64 * 11 + 1, 11)


def test_encoder_flag_same_outputs_and_params():
    """attn_kernel=True produces the same encoder outputs and the SAME
    param tree as the default path (checkpoints interchange); on CPU the
    call exercises the gating + internal XLA fallback."""
    import dataclasses

    cfg = dataclasses.replace(VIT_PRESETS["micro"], remat=False)
    cfg_k = dataclasses.replace(cfg, attn_kernel=True)
    img = jax.random.normal(KEY, (128, 10, 3, 2), jnp.float32)
    enc, enc_k = ViTEncoder(cfg), ViTEncoder(cfg_k)
    params = enc.init(KEY, img)
    params_k = enc_k.init(KEY, img)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_k))
    out = enc.apply(params, img)
    out_k = enc_k.apply(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_k),
                               rtol=2e-5, atol=2e-5)
