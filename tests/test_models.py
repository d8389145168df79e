"""Tests for networks and distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.models import (
    ActorCriticRNN,
    Categorical,
    ScannedGRU,
    SquashedNormal,
    ViTActorCriticRNN,
    ViTEncoder,
    VisionAgentCNN,
    VIT_PRESETS,
)

KEY = jax.random.PRNGKey(0)


class TestDistributions:
    def test_categorical_matches_softmax(self):
        logits = jnp.array([[1.0, 2.0, 0.5], [0.0, 0.0, 0.0]])
        d = Categorical(logits)
        probs = jax.nn.softmax(logits)
        np.testing.assert_allclose(np.exp(d.log_prob(jnp.array([1, 2]))),
                                   np.array([probs[0, 1], probs[1, 2]]),
                                   rtol=1e-5)
        ent = -np.sum(np.asarray(probs) * np.log(np.asarray(probs)), axis=1)
        np.testing.assert_allclose(np.asarray(d.entropy()), ent, rtol=1e-5)

    def test_categorical_sampling_distribution(self):
        logits = jnp.log(jnp.array([0.7, 0.2, 0.1]))
        d = Categorical(jnp.tile(logits, (4000, 1)))
        s = np.asarray(d.sample(seed=KEY))
        freq = np.bincount(s, minlength=3) / len(s)
        np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.05)

    def test_squashed_normal_bounds_and_logprob(self):
        low = jnp.array([-1.0, 0.0, 0.0])
        high = jnp.array([3.0, 1.0, 1.0])
        d = SquashedNormal(jnp.zeros((128, 3)), jnp.zeros((3,)), low, high)
        s = np.asarray(d.sample(seed=KEY))
        assert (s >= np.asarray(low)).all() and (s <= np.asarray(high)).all()
        lp = d.log_prob(jnp.asarray(s))
        assert np.isfinite(np.asarray(lp)).all()
        # mode of zero-mean is the box midpoint
        np.testing.assert_allclose(np.asarray(d.mode())[0],
                                   np.asarray((low + high) / 2), atol=1e-5)


class TestRNN:
    def test_actor_critic_shapes_and_reset(self):
        net = ActorCriticRNN(action_dim=5, fc_dim=16, hidden_size=16)
        h = ScannedGRU.initialize_carry(4, 16)
        obs = jnp.ones((3, 4, 10))        # (time, batch, obs)
        dones = jnp.zeros((3, 4))
        params = net.init(KEY, h, (obs, dones))
        h2, pi, v = net.apply(params, h, (obs, dones))
        assert v.shape == (3, 4)
        assert pi.logits.shape == (3, 4, 5)
        # a done at t resets the carry before processing t
        dones_reset = dones.at[1].set(1.0)
        h3, pi3, v3 = net.apply(params, h, (obs, dones_reset))
        assert not np.allclose(np.asarray(v), np.asarray(v3))
        # t=0 outputs unaffected by later resets
        np.testing.assert_allclose(np.asarray(v[0]), np.asarray(v3[0]))


class TestViT:
    def test_encoder_shapes(self):
        enc = ViTEncoder(VIT_PRESETS["micro"])
        img = jnp.ones((5, 10, 3, 2))
        params = enc.init(KEY, img)
        out = enc.apply(params, img)
        assert out.shape == (5, 64)
        assert out.dtype == jnp.float32

    def test_encoder_leading_axes(self):
        enc = ViTEncoder(VIT_PRESETS["micro"])
        img = jax.random.normal(KEY, (2, 3, 10, 3, 2))
        params = enc.init(KEY, img)
        out = enc.apply(params, img)
        assert out.shape == (2, 3, 64)
        # batched == flat: encoder is pointwise over leading axes
        flat = enc.apply(params, img.reshape(6, 10, 3, 2)).reshape(2, 3, 64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(flat),
                                   rtol=2e-2, atol=2e-2)  # bf16 matmuls

    def test_encoder_rows_2d_matches_rank3(self):
        """The flat-row layout (rows_2d, TPU tiling win) is bit-identical
        to the rank-3 token layout and shares the same param tree."""
        import dataclasses

        from vit_marl_tpu.models.vit import ViTConfig
        cfg3 = ViTConfig(width=64, depth=2, heads=2, rows_2d=False)
        cfg2 = dataclasses.replace(cfg3, rows_2d=True)
        enc3, enc2 = ViTEncoder(cfg3), ViTEncoder(cfg2)
        img = jax.random.normal(KEY, (7, 10, 3, 2))
        params = enc3.init(KEY, img)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(enc2.init(KEY, img)))
        out3 = enc3.apply(params, img)
        out2 = enc2.apply(params, img)
        np.testing.assert_array_equal(np.asarray(out3), np.asarray(out2))
        # gradients flow through the remat'd 2-D blocks
        g = jax.grad(lambda p: float(0) + (enc2.apply(p, img) ** 2).sum())(
            params)
        total = sum(float(np.abs(np.asarray(l)).sum())
                    for l in jax.tree.leaves(g))
        assert total > 0

    def test_encoder_fp32_fidelity(self):
        """bf16 compute stays close to an fp32 reference forward pass."""
        from vit_marl_tpu.models.vit import ViTConfig
        img = jax.random.normal(KEY, (4, 10, 3, 2))
        cfg16 = ViTConfig(width=64, depth=2, heads=2, compute_dtype="bfloat16")
        cfg32 = ViTConfig(width=64, depth=2, heads=2, compute_dtype="float32")
        enc16, enc32 = ViTEncoder(cfg16), ViTEncoder(cfg32)
        params = enc32.init(KEY, img)
        out32 = enc32.apply(params, img)
        out16 = enc16.apply(params, img)
        err = np.abs(np.asarray(out32) - np.asarray(out16)).max()
        scale = np.abs(np.asarray(out32)).max()
        assert err / scale < 0.05

    def test_vit_actor_critic(self):
        net = ViTActorCriticRNN(action_dim=3, vit=VIT_PRESETS["micro"],
                                fc_dim=16, hidden_size=16, continuous=True,
                                action_low=jnp.array([-1.0, 0.0, 0.0]),
                                action_high=jnp.array([3.0, 1.0, 1.0]))
        h = ScannedGRU.initialize_carry(4, 16)
        obs = {"obs": jnp.ones((2, 4, 28)),
               "vision_obs": jnp.ones((2, 4, 10, 3, 2))}
        dones = jnp.zeros((2, 4))
        params = net.init(KEY, h, (obs, dones))
        h2, pi, v = net.apply(params, h, (obs, dones))
        assert v.shape == (2, 4)
        a = pi.sample(seed=KEY)
        assert a.shape == (2, 4, 3)
        assert np.isfinite(np.asarray(pi.log_prob(a))).all()


def test_cnn_vision_agent():
    net = VisionAgentCNN(features=32)
    img = jnp.ones((7, 10, 3, 2))
    params = net.init(KEY, img)
    out = net.apply(params, img)
    assert out.shape == (7, 32)


def test_attention_nhd_matches_einsum_reference():
    """The transpose-free short-seq attention equals the canonical
    (B, H, N, D) einsum attention (MXU path) in fp32."""
    import numpy as np
    from vit_marl_tpu.models.vit import attention_nhd, dot_product_attention

    key = jax.random.PRNGKey(3)
    B, N, H, D = 5, 11, 6, 16
    qkv = jax.random.normal(key, (B, N, 3, H, D), jnp.float32)
    got = attention_nhd(qkv, jnp.float32)            # (B, N, H, D)
    q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
    want = dot_product_attention(q, k, v, jnp.float32)  # (B, H, N, D)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(got, 2, 1)),
                               np.asarray(want), rtol=2e-5, atol=2e-5)


def test_block_cls_only_matches_full_compute():
    """The encoder's last block computes LN2+MLP on CLS rows only
    (models/vit.py Block.__call__ cls_only): everything after the final
    attention influences nothing but the CLS output, so the sliced path
    must equal slicing the full-compute output — in BOTH layouts."""
    import numpy as np
    from vit_marl_tpu.models.vit import Block, ViTConfig

    B, N, W = 6, 11, 64
    for rows_2d in (True, False):
        cfg = ViTConfig(width=W, depth=2, heads=2, rows_2d=rows_2d,
                        compute_dtype="float32", remat=False)
        blk = Block(cfg)
        key = jax.random.PRNGKey(9)
        x3 = jax.random.normal(key, (B, N, W), jnp.float32)
        x = x3.reshape(B * N, W) if rows_2d else x3
        params = blk.init(KEY, x, N)
        full = blk.apply(params, x, N, False)
        full_cls = (full.reshape(B, N, W) if rows_2d else full)[:, 0]
        short = blk.apply(params, x, N, True)
        assert short.shape == (B, W)
        np.testing.assert_array_equal(np.asarray(short),
                                      np.asarray(full_cls))
