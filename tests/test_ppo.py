"""IPPO trainer tests: losses finite, params update, vision path, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_marl_tpu.config import (
    ExecutionConfig,
    MarketMakingConfig,
    MultiAgentConfig,
    TrainConfig,
    WorldConfig,
)
from vit_marl_tpu.rl.ppo import make_train

KEY = jax.random.PRNGKey(0)


def tiny_ma(exec_kw=None, mm_kw=None):
    wcfg = WorldConfig(n_data_msg_per_step=10, ep_type="fixed_steps",
                       episode_time=8, start_resolution=5,
                       n_messages_per_synthetic_day=2_000)
    return MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(**(mm_kw or {})),
                ExecutionConfig(**(exec_kw or dict(
                    action_space="simplest_case",
                    observation_space="simplest_case",
                    reward_space="simplest_case")))),
        n_agents_per_type=(1, 1))


def tiny_train(n_updates=2, **kw):
    defaults = dict(num_envs=4, num_steps=8, num_minibatches=2,
                    update_epochs=2, log_backend="none")
    defaults["total_timesteps"] = 4 * 8 * n_updates
    defaults.update(kw)
    return TrainConfig(**defaults)


def leaves_allclose(a, b):
    return all(np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_training_updates_params_and_finite_losses():
    train = make_train(tiny_ma(), tiny_train(2))
    out = train(KEY)
    assert len(out["metrics"]) == 2
    for m in out["metrics"]:
        for k, v in m.items():
            assert np.isfinite(np.asarray(v)).all(), k
    ts = out["runner_state"][0]
    # params must have changed between init seeds is hard; instead check the
    # optimizer stepped as many times as epochs*minibatches*updates
    assert int(ts[0].step) == 2 * 2 * 2
    assert int(ts[1].step) == 2 * 2 * 2


def test_training_multi_instance():
    wcfg = WorldConfig(n_data_msg_per_step=10, ep_type="fixed_steps",
                       episode_time=8, start_resolution=5,
                       n_messages_per_synthetic_day=2_000)
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(), ExecutionConfig(
            action_space="simplest_case", observation_space="simplest_case",
            reward_space="simplest_case")),
        n_agents_per_type=(2, 2))
    train = make_train(ma, tiny_train(1))
    out = train(KEY)
    assert np.isfinite(
        np.asarray(out["metrics"][0]["MM/total_loss"])).all()


def test_training_vision_vit_continuous():
    ma = tiny_ma(exec_kw=dict(action_space="policy_blending",
                              observation_space="execution_policy",
                              reward_space="dual_ppo", use_vision_obs=True))
    tc = tiny_train(1, network=("gru", "vit_gru"), vit_preset="micro")
    out = make_train(ma, tc)(KEY)
    m = out["metrics"][0]
    assert np.isfinite(np.asarray(m["EXE/total_loss"])).all()
    assert float(m["EXE/entropy"]) != 0.0


def test_training_vision_cnn_learning_smoke():
    """The cnn_gru network (the reference's never-imported VisionAgent stub
    made trainable, ref: networks/vision_agent.py:6-40) trains end-to-end on
    dict observations and moves its parameters."""
    ma = tiny_ma(exec_kw=dict(action_space="policy_blending",
                              observation_space="execution_policy",
                              reward_space="dual_ppo", use_vision_obs=True))
    tc = tiny_train(2, network=("gru", "cnn_gru"))
    out = make_train(ma, tc)(KEY)
    for m in out["metrics"]:
        assert np.isfinite(np.asarray(m["EXE/total_loss"])).all()
    # the CNN is live in the policy: the value head's gradient reaches the
    # conv kernels (not just the flat-obs branch of the fusion gate)
    from vit_marl_tpu.env.world import WorldEnv
    from vit_marl_tpu.models.rnn import ScannedGRU
    from vit_marl_tpu.rl.ppo import make_network

    env = WorldEnv(ma)
    net = make_network(tc, 1, env.action_spaces[1],
                       env.observation_spaces[1])
    params = out["runner_state"][0][1].params
    sp = env.observation_spaces[1]
    obs = {k: jnp.ones((1, 4) + tuple(s.shape)) for k, s in sp.spaces.items()}
    h0 = ScannedGRU.initialize_carry(4, tc.hidden_size)

    def value_sum(p):
        _, _, v = net.apply(p, h0, (obs, jnp.zeros((1, 4), bool)))
        return v.sum()

    g = jax.grad(value_sum)(params)
    gnorm = sum(float(np.abs(np.asarray(l)).sum())
                for l in jax.tree.leaves(g["params"]["cnn"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_dict_obs_requires_vit_network():
    ma = tiny_ma(exec_kw=dict(use_vision_obs=True))
    with pytest.raises(ValueError, match="vit_gru"):
        make_train(ma, tiny_train(1))


def test_checkpointing(tmp_path):
    tc = tiny_train(2, checkpoint_dir=str(tmp_path / "ckpt"))
    out = make_train(tiny_ma(), tc)(KEY)
    from vit_marl_tpu.rl.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() == 1
    params = [ts.params for ts in out["runner_state"][0]]
    template = {"params": params,
                "metrics": out["metrics"][-1],
                "opt_leaves": [jax.tree.leaves(ts.opt_state)
                               for ts in out["runner_state"][0]],
                "step": [ts.step for ts in out["runner_state"][0]]}
    restored = mgr.restore(template=template)
    assert leaves_allclose(restored["params"], params)


def test_anneal_lr_off_runs():
    out = make_train(tiny_ma(), tiny_train(1, anneal_lr=False))(KEY)
    assert len(out["metrics"]) == 1


def test_rollout_loop_mode_matches_scan_mode():
    """Both rollout collection modes must produce identical updates."""
    ma = tiny_ma()
    out_scan = make_train(ma, tiny_train(1, rollout_mode="scan"))(KEY)
    out_loop = make_train(ma, tiny_train(1, rollout_mode="loop"))(KEY)
    for a, b in zip(jax.tree.leaves(out_scan["metrics"]),
                    jax.tree.leaves(out_loop["metrics"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_periodic_eval_rollout():
    ma = tiny_ma()
    tc = tiny_train(2, eval_every=1, eval_steps=3, eval_envs=4)
    out = make_train(ma, tc)(KEY)
    for m in out["metrics"]:
        assert "EXE/eval_mean_reward" in m
        assert np.isfinite(np.asarray(m["EXE/eval_mean_reward"]))


def test_observability_metrics():
    """Per-update observability parity with the reference's wandb callback
    (ref: ippo_rnn_JAXMARL.py:680-763): per-agent action-distribution
    percentages, info-field mean/std, world-info means, plus eval twins."""
    ma = tiny_ma()
    tc = tiny_train(1, eval_every=1, eval_steps=3, eval_envs=4)
    m = make_train(ma, tc)(KEY)["metrics"][-1]
    # discrete action distributions sum to 100% per agent type
    for name, sp in (("MM", 6), ("EXE", None)):
        pct = [float(np.asarray(v)) for k, v in m.items()
               if k.startswith(f"{name}/action_pct_")]
        assert pct and abs(sum(pct) - 100.0) < 1e-3
    # info stats: mean matches the independently-logged mean reward
    np.testing.assert_allclose(np.asarray(m["EXE/info_reward_mean"]),
                               np.asarray(m["EXE/mean_reward"]), rtol=1e-5)
    assert float(np.asarray(m["EXE/info_quant_left_std"])) >= 0
    assert "world/end_mid_price_mean" in m
    # eval twins exist and eval action pcts also sum to 100%
    ev_pct = [float(np.asarray(v)) for k, v in m.items()
              if k.startswith("eval_MM/action_pct_")]
    assert ev_pct and abs(sum(ev_pct) - 100.0) < 1e-3
    assert "eval_EXE/info_reward_mean" in m
    assert "eval_world/end_mid_price_mean" in m


def test_eval_in_sample_is_hard_error():
    """LOBSTER data + unset EVAL_TIME_PERIOD must refuse to build a silent
    in-sample eval env; EVAL_ALLOW_IN_SAMPLE=true opts back in."""
    from vit_marl_tpu.rl.ppo import _make_eval_env

    ma = tiny_ma()
    import dataclasses
    ma = dataclasses.replace(
        ma, world=dataclasses.replace(ma.world, data_path="/data/LOBSTER"))
    with pytest.raises(ValueError, match="EVAL_TIME_PERIOD"):
        _make_eval_env(ma, tiny_train(1, eval_every=1), None)
    sentinel = object()
    assert _make_eval_env(
        ma, tiny_train(1, eval_every=1, eval_allow_in_sample=True),
        sentinel) is sentinel


def test_observability_off_switch():
    """LOG_ENV_INFO=false drops every observability key (and with it the
    device-side reductions) from the metrics dict."""
    m = make_train(tiny_ma(), tiny_train(1, log_env_info=False))(KEY)[
        "metrics"][-1]
    assert not any("info_" in k or "action_pct" in k or "action_mean" in k
                   for k in m)


def test_checkpoint_restore_without_template_device_agnostic(tmp_path):
    """restore() with no template must not pin arrays to save-time devices
    (regression: a TPU-trained checkpoint refused to restore on CPU with
    'Device TPU v5 lite0 was not found in jax.local_devices()'); arrays
    come back as host numpy and match the saved values."""
    import numpy as np

    tc = tiny_train(2, checkpoint_dir=str(tmp_path / "ckpt"))
    out = make_train(tiny_ma(), tc)(KEY)
    from vit_marl_tpu.rl.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    restored = mgr.restore()  # no template: the evaluate.py CLI path
    params = [ts.params for ts in out["runner_state"][0]]
    assert all(isinstance(l, np.ndarray)
               for l in jax.tree.leaves(restored["params"]))
    assert leaves_allclose(restored["params"], params)


def test_resume_from_checkpoint(tmp_path):
    """RESUME=true continues a killed run: the update loop restarts at the
    saved update index and the optimizer state (Adam moments + step count,
    hence the LR schedule position) carries over instead of resetting.
    The reference has no mid-training resume (SURVEY.md section 5)."""
    ma = tiny_ma()
    ck = str(tmp_path / "ckpt")
    make_train(ma, tiny_train(2, checkpoint_dir=ck))(KEY)

    tc = tiny_train(4, checkpoint_dir=ck, resume=True)
    out = make_train(ma, tc)(KEY)
    assert len(out["metrics"]) == 2  # only the remaining 2 of 4 updates ran
    for ts in out["runner_state"][0]:
        # optimizer stepped updates*epochs*minibatches TOTAL across both
        # runs — a reset optimizer would show 2*2*2
        assert int(ts.step) == 4 * 2 * 2
    from vit_marl_tpu.rl.checkpoint import CheckpointManager
    mgr = CheckpointManager(ck)
    assert mgr.latest_step() == 3
    # the resumed checkpoints still carry opt state for the NEXT resume
    assert "opt_leaves" in mgr.restore()


def test_resume_without_checkpoint_starts_fresh(tmp_path):
    tc = tiny_train(1, checkpoint_dir=str(tmp_path / "empty"), resume=True)
    out = make_train(tiny_ma(), tc)(KEY)
    assert len(out["metrics"]) == 1


def test_global_done_alignment_env_major():
    """global_done must align with batchify's env-major actor layout:
    actor k belongs to env k // n, so the mask is a repeat, not the
    reference's tile (whose batchify is agent-major —
    ref: ippo_rnn_JAXMARL.py:96-101).  Misalignment would hand GAE the
    wrong episode-boundary masks whenever n_per_type > 1."""
    from vit_marl_tpu.rl.ppo import batchify, global_done_for_actors

    E, n = 5, 3
    done_all = jnp.asarray([True, False, True, False, False])
    got = global_done_for_actors(done_all, n)
    # ground truth: broadcast per-agent then batchify exactly like every
    # other per-actor tensor in the Transition
    want = batchify(jnp.broadcast_to(done_all[:, None], (E, n)), E * n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert not np.array_equal(np.asarray(got),
                              np.asarray(jnp.tile(done_all, n))), \
        "tile and repeat coincide — test shapes are degenerate"


def test_training_multi_agent_per_type():
    """n_per_type > 1 trains with finite losses and correctly-shaped
    per-actor tensors (regression scaffold for the global_done fix)."""
    ma = tiny_ma()
    import dataclasses
    ma = dataclasses.replace(ma, n_agents_per_type=(2, 1))
    out = make_train(ma, tiny_train(2))(KEY)
    for m in out["metrics"]:
        for k, v in m.items():
            assert np.isfinite(np.asarray(v)).all(), k
