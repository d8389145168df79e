"""Fused block-half kernels vs their XLA reference math (interpret mode).

The kernels (ops/block_kernel.py) must match their reference functions to
f32 round-off at ROW_BLOCK-tiled shapes, fall back transparently at
untiled shapes, and carry VJPs equal to jax.vjp of the references.  The
flax Block with cfg.fused_block must match the unfused Block in float32.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.ops.block_kernel import (
    ROW_BLOCK,
    _full_block_reference,
    _ln_qkv_reference,
    _proj_mlp_reference,
    fused_block_full,
    fused_ln_qkv,
    fused_proj_mlp,
    full_block_ok,
)

KEY = jax.random.PRNGKey(0)
W = 128


def _ln_qkv_args(rows, dtype=jnp.float32):
    ks = jax.random.split(KEY, 5)
    return (jax.random.normal(ks[0], (rows, W), dtype),
            jax.random.normal(ks[1], (W,), jnp.float32) * 0.1 + 1.0,
            jax.random.normal(ks[2], (W,), jnp.float32) * 0.1,
            (jax.random.normal(ks[3], (W, 3 * W), jnp.float32) * 0.05
             ).astype(dtype),
            jax.random.normal(ks[4], (3 * W,), jnp.float32) * 0.1)


def _proj_mlp_args(rows, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(7), 10)
    s = 0.05
    return (jax.random.normal(ks[0], (rows, W), dtype),
            jax.random.normal(ks[1], (rows, W), dtype),
            (jax.random.normal(ks[2], (W, W)) * s).astype(dtype),
            jax.random.normal(ks[3], (W,)) * 0.1,
            jax.random.normal(ks[4], (W,)) * 0.1 + 1.0,
            jax.random.normal(ks[5], (W,)) * 0.1,
            (jax.random.normal(ks[6], (W, 4 * W)) * s).astype(dtype),
            jax.random.normal(ks[7], (4 * W,)) * 0.1,
            (jax.random.normal(ks[8], (4 * W, W)) * s).astype(dtype),
            jax.random.normal(ks[9], (W,)) * 0.1)


def test_ln_qkv_matches_reference_tiled():
    args = _ln_qkv_args(2 * ROW_BLOCK)
    got = fused_ln_qkv(*args, True)          # interpret-mode pallas
    want = _ln_qkv_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_ln_qkv_fallback_untiled():
    args = _ln_qkv_args(ROW_BLOCK + 8)       # not a ROW_BLOCK multiple
    got = fused_ln_qkv(*args, True)
    want = _ln_qkv_reference(*args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_proj_mlp_matches_reference_tiled():
    args = _proj_mlp_args(ROW_BLOCK)
    got = fused_proj_mlp(*args, True)
    want = _proj_mlp_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_proj_mlp_bf16_close_to_f32():
    args32 = _proj_mlp_args(ROW_BLOCK, jnp.float32)
    args16 = tuple(a.astype(jnp.bfloat16) if a.dtype == jnp.float32
                   and a.ndim == 2 else a for a in args32)
    got16 = fused_proj_mlp(*args16, True).astype(jnp.float32)
    want = _proj_mlp_reference(*args32)
    err = np.abs(np.asarray(got16) - np.asarray(want)).max()
    assert err / np.abs(np.asarray(want)).max() < 0.05


@pytest.mark.parametrize("fn,ref,mk", [
    (fused_ln_qkv, _ln_qkv_reference, _ln_qkv_args),
    (fused_proj_mlp, _proj_mlp_reference, _proj_mlp_args),
])
def test_vjp_matches_reference(fn, ref, mk):
    args = mk(ROW_BLOCK)
    out, vjp = jax.vjp(lambda *a: fn(*a, True), *args)
    out_r, vjp_r = jax.vjp(ref, *args)
    g = jax.random.normal(jax.random.PRNGKey(1), out.shape, out.dtype)
    for got, want in zip(vjp(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


N_TOK, HEADS = 11, 4


def _full_block_args(envs, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(3), 13)
    s = 0.05
    return (jax.random.normal(ks[0], (envs * N_TOK, W), dtype),
            jax.random.normal(ks[1], (W,)) * 0.1 + 1.0,
            jax.random.normal(ks[2], (W,)) * 0.1,
            (jax.random.normal(ks[3], (W, 3 * W)) * s).astype(dtype),
            jax.random.normal(ks[4], (3 * W,)) * 0.1,
            (jax.random.normal(ks[5], (W, W)) * s).astype(dtype),
            jax.random.normal(ks[6], (W,)) * 0.1,
            jax.random.normal(ks[7], (W,)) * 0.1 + 1.0,
            jax.random.normal(ks[8], (W,)) * 0.1,
            (jax.random.normal(ks[9], (W, 4 * W)) * s).astype(dtype),
            jax.random.normal(ks[10], (4 * W,)) * 0.1,
            (jax.random.normal(ks[11], (4 * W, W)) * s).astype(dtype),
            jax.random.normal(ks[12], (W,)) * 0.1)


def test_full_block_matches_composed_reference_tiled():
    """Interpret-mode kernel == the composition of the three tested
    references (two grid steps of env_block=8)."""
    args = _full_block_args(16)
    got = fused_block_full(*args, N_TOK, HEADS, 8, True)
    want = _full_block_reference(*args, N_TOK, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_full_block_fallback_unaligned():
    args = _full_block_args(9)               # 9 envs % env_block=8 != 0
    got = fused_block_full(*args, N_TOK, HEADS, 8, True)
    want = _full_block_reference(*args, N_TOK, HEADS)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_full_block_vjp_matches_reference():
    args = _full_block_args(8)
    out, vjp = jax.vjp(
        lambda *a: fused_block_full(*a, N_TOK, HEADS, 8, True), *args)
    out_r, vjp_r = jax.vjp(
        lambda *a: _full_block_reference(*a, N_TOK, HEADS), *args)
    g = jax.random.normal(jax.random.PRNGKey(1), out.shape, out.dtype)
    for got, want in zip(vjp(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_full_block_ok_predicate():
    assert full_block_ok(64 * N_TOK, N_TOK, 384, 6, 1536)
    assert not full_block_ok(63 * N_TOK, N_TOK, 384, 6, 1536)   # env tiling
    assert not full_block_ok(64 * N_TOK, N_TOK, 768, 12, 3072)  # ViT-Base VMEM


def test_flax_block_fused_full_matches_half_fused():
    """cfg.fused_block_full shares the param tree with cfg.fused_block and
    (on CPU, where both fall back to their XLA references) matches it."""
    from vit_marl_tpu.models.vit import Block, ViTConfig

    cfg = ViTConfig(width=64, depth=1, heads=2, compute_dtype="float32",
                    remat=False, fused_block=True)
    x = jax.random.normal(KEY, (8, 11, 64), jnp.float32)
    halves = Block(cfg)
    ph = halves.init(KEY, x)
    full = Block(dataclasses.replace(cfg, fused_block=False,
                                     fused_block_full=True))
    pf = full.init(jax.random.PRNGKey(1), x)
    assert (jax.tree.structure(ph) == jax.tree.structure(pf)
            and [v.shape for v in jax.tree.leaves(ph)]
            == [v.shape for v in jax.tree.leaves(pf)])
    got = full.apply(ph, x)
    want = halves.apply(ph, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_convert_vit_params_roundtrip_and_equivalence():
    """convert_vit_params transplants a trained unfused encoder into the
    fused layout (same outputs), round-trips exactly, and refuses a
    double conversion."""
    from vit_marl_tpu.models.convert import convert_vit_params
    from vit_marl_tpu.models.vit import ViTConfig, ViTEncoder

    cfg = ViTConfig(width=64, depth=2, heads=2, compute_dtype="float32",
                    remat=False)
    img = jax.random.normal(KEY, (4, 10, 3, 2))
    enc = ViTEncoder(cfg)
    pu = enc.init(KEY, img)

    pf = convert_vit_params(pu, to_fused=True)
    fused = ViTEncoder(dataclasses.replace(cfg, fused_block_full=True))
    # the converted tree must BE the fused init tree structurally
    ref_struct = jax.tree.structure(fused.init(jax.random.PRNGKey(1), img))
    assert jax.tree.structure(pf) == ref_struct

    got = fused.apply(pf, img)
    want = enc.apply(pu, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    back = convert_vit_params(pf, to_fused=False)
    assert jax.tree.structure(back) == jax.tree.structure(pu)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(pu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(KeyError):
        convert_vit_params(pf, to_fused=True)   # already fused


def test_convert_vit_params_full_policy_tree():
    """Blocks nested under the actor-critic's `vit` module convert in
    place; every non-block leaf (GRU, heads, embeddings) is untouched."""
    from vit_marl_tpu.models import ViTActorCriticRNN
    from vit_marl_tpu.models.convert import convert_vit_params
    from vit_marl_tpu.models.rnn import ScannedGRU
    from vit_marl_tpu.models.vit import ViTConfig

    cfg = ViTConfig(width=64, depth=1, heads=2, compute_dtype="float32",
                    remat=False)
    net = ViTActorCriticRNN(action_dim=3, vit=cfg, continuous=False)
    obs = {"obs": jnp.ones((1, 4, 28)),
           "vision_obs": jnp.ones((1, 4, 10, 3, 2))}
    dones = jnp.zeros((1, 4))
    h = ScannedGRU.initialize_carry(4, 64)
    pu = net.init(KEY, h, (obs, dones))

    pf = convert_vit_params(pu, to_fused=True)
    fused_net = ViTActorCriticRNN(
        action_dim=3, vit=dataclasses.replace(cfg, fused_block_full=True),
        continuous=False)
    _, pi_u, vu = net.apply(pu, h, (obs, dones))
    _, pi_f, vf = fused_net.apply(pf, h, (obs, dones))
    np.testing.assert_allclose(np.asarray(vu), np.asarray(vf),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pi_u.logits),
                               np.asarray(pi_f.logits),
                               rtol=2e-5, atol=2e-5)


def test_encoder_trains_with_fused_block_full():
    from vit_marl_tpu.models.vit import ViTConfig, ViTEncoder

    cfg = ViTConfig(width=64, depth=2, heads=2, compute_dtype="float32",
                    remat=True, fused_block_full=True)
    enc = ViTEncoder(cfg)
    img = jax.random.normal(KEY, (4, 10, 3, 2))
    params = enc.init(KEY, img)

    def loss(p):
        return jnp.square(enc.apply(p, img)).mean()

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(v).max()) for v in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


def test_flax_block_fused_matches_unfused_f32():
    """cfg.fused_block == unfused Block in float32 (same math, different
    param layout — params are transplanted name-by-name)."""
    from vit_marl_tpu.models.vit import Block, ViTConfig

    cfg = ViTConfig(width=64, depth=1, heads=2, compute_dtype="float32",
                    remat=False)
    x = jax.random.normal(KEY, (4, 11, 64), jnp.float32)
    unfused = Block(cfg)
    pu = unfused.init(KEY, x)
    fused = Block(dataclasses.replace(cfg, fused_block=True))
    pf = fused.init(jax.random.PRNGKey(1), x)

    m = pu["params"]
    pf = {"params": {
        "ln1_scale": m["ln1"]["scale"], "ln1_bias": m["ln1"]["bias"],
        "qkv_kernel": m["attn"]["qkv"]["kernel"],
        "qkv_bias": m["attn"]["qkv"]["bias"],
        "proj_kernel": m["attn"]["proj"]["kernel"],
        "proj_bias": m["attn"]["proj"]["bias"],
        "ln2_scale": m["ln2"]["scale"], "ln2_bias": m["ln2"]["bias"],
        "mlp1_kernel": m["mlp1"]["kernel"], "mlp1_bias": m["mlp1"]["bias"],
        "mlp2_kernel": m["mlp2"]["kernel"], "mlp2_bias": m["mlp2"]["bias"],
    }}
    got = fused.apply(pf, x)
    want = unfused.apply(pu, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_encoder_trains_with_fused_block():
    """Gradient flows through the fused encoder (VJP path end to end)."""
    from vit_marl_tpu.models.vit import ViTConfig, ViTEncoder

    cfg = ViTConfig(width=64, depth=2, heads=2, compute_dtype="float32",
                    remat=False, fused_block=True)
    enc = ViTEncoder(cfg)
    img = jax.random.normal(KEY, (4, 10, 3, 2))
    params = enc.init(KEY, img)

    def loss(p):
        return jnp.square(enc.apply(p, img)).mean()

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(v).max()) for v in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


# ---------------------------------------------------------------------------
# LN1+QKV+attention fold (fused_ln_qkv_attn)
# ---------------------------------------------------------------------------

def _ln_qkv_attn_args(envs, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    return (jax.random.normal(ks[0], (envs * N_TOK, W), dtype),
            jax.random.normal(ks[1], (W,)) * 0.1 + 1.0,
            jax.random.normal(ks[2], (W,)) * 0.1,
            (jax.random.normal(ks[3], (W, 3 * W)) * 0.05).astype(dtype),
            jax.random.normal(ks[4], (3 * W,)) * 0.1)


def test_ln_qkv_attn_matches_composed_reference_tiled():
    """Interpret-mode kernel == LN+QKV reference into the attention
    reference (two grid steps of env_block=8)."""
    from vit_marl_tpu.ops.block_kernel import (
        _ln_qkv_attn_reference,
        fused_ln_qkv_attn,
    )

    args = _ln_qkv_attn_args(16)
    got = fused_ln_qkv_attn(*args, N_TOK, HEADS, 8, True)
    want = _ln_qkv_attn_reference(*args, N_TOK, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ln_qkv_attn_fallback_unaligned():
    from vit_marl_tpu.ops.block_kernel import (
        _ln_qkv_attn_reference,
        fused_ln_qkv_attn,
    )

    args = _ln_qkv_attn_args(9)               # 9 envs % env_block=8 != 0
    got = fused_ln_qkv_attn(*args, N_TOK, HEADS, 8, True)
    want = _ln_qkv_attn_reference(*args, N_TOK, HEADS)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("bwd_kernel", [True, False],
                         ids=["pallas-bwd", "xla-bwd"])
def test_ln_qkv_attn_vjp_matches_reference(bwd_kernel):
    """The custom VJP (XLA qkv recompute chained through the Pallas
    attention backward, or the full XLA vjp) == jax.vjp of the composed
    reference."""
    from vit_marl_tpu.ops.block_kernel import (
        _ln_qkv_attn_reference,
        fused_ln_qkv_attn,
    )

    args = _ln_qkv_attn_args(8)
    out, vjp = jax.vjp(
        lambda *a: fused_ln_qkv_attn(*a, N_TOK, HEADS, 8, True, bwd_kernel),
        *args)
    out_r, vjp_r = jax.vjp(
        lambda *a: _ln_qkv_attn_reference(*a, N_TOK, HEADS), *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    g = jax.random.normal(jax.random.PRNGKey(1), out.shape, out.dtype)
    for got, want in zip(vjp(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_flax_block_attn_ln_fold_matches_fused_tree():
    """cfg.attn_ln_fold shares the fused-family param tree and (on CPU,
    where all fused paths fall back to their XLA references) matches the
    fused_block output; cls_only returns the (B, W) CLS rows equal to
    slicing the full output."""
    from vit_marl_tpu.models.vit import Block, ViTConfig

    cfg = ViTConfig(width=64, depth=1, heads=2, compute_dtype="float32",
                    remat=False, attn_ln_fold=True)
    B, N = 8, 11
    x = jax.random.normal(KEY, (B * N, 64), jnp.float32)
    fold = Block(cfg)
    pf = fold.init(KEY, x, N)
    halves = Block(dataclasses.replace(cfg, attn_ln_fold=False,
                                       fused_block=True))
    ph = halves.init(jax.random.PRNGKey(1), x, N)
    assert (jax.tree.structure(pf) == jax.tree.structure(ph)
            and [v.shape for v in jax.tree.leaves(pf)]
            == [v.shape for v in jax.tree.leaves(ph)])
    got = fold.apply(pf, x, N)
    want = halves.apply(pf, x, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    cls = fold.apply(pf, x, N, True)
    assert cls.shape == (B, 64)
    np.testing.assert_allclose(
        np.asarray(cls),
        np.asarray(got.reshape(B, N, 64)[:, 0]), rtol=2e-5, atol=2e-5)


def test_encoder_trains_with_attn_ln_fold():
    """Gradients flow through the fold path's raw params (CPU reference
    fallback exercises the custom VJP wiring)."""
    from vit_marl_tpu.models.vit import ViTConfig, ViTEncoder

    cfg = ViTConfig(width=64, depth=2, heads=2, compute_dtype="float32",
                    remat=False, attn_ln_fold=True)
    img = jax.random.normal(KEY, (4, 10, 3, 2))
    enc = ViTEncoder(cfg)
    p = enc.init(KEY, img)
    g = jax.grad(lambda p_: jnp.sum(enc.apply(p_, img) ** 2))(p)
    gn = sum(float(np.abs(np.asarray(l)).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0
