"""Mesh data-parallel training on the virtual 8-device CPU mesh."""

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
from vit_marl_tpu.parallel import make_mesh, replicate, shard_batch
from vit_marl_tpu.rl.ppo import make_train

KEY = jax.random.PRNGKey(0)


def test_mesh_construction():
    mesh = make_mesh((8,), ("data",))
    assert mesh.shape == {"data": 8}


def test_shard_and_replicate():
    mesh = make_mesh((8,), ("data",))
    x = jnp.arange(16 * 4).reshape(16, 4)
    xs = shard_batch({"x": x}, mesh)["x"]
    assert xs.sharding.spec[0] == "data"
    xr = replicate({"x": x}, mesh)["x"]
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(x))


def test_sharded_training_step():
    """One IPPO update with the env batch sharded over 8 devices."""
    assert len(jax.devices()) >= 8
    wcfg = WorldConfig(n_data_msg_per_step=5, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=600)
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="simplest_case",
                                observation_space="simplest_case",
                                reward_space="simplest_case")),
        n_agents_per_type=(1, 1))
    tc = TrainConfig(num_envs=16, num_steps=4, num_minibatches=2,
                     update_epochs=1, total_timesteps=16 * 4,
                     log_backend="none", rollout_mode="scan")
    mesh = make_mesh((8,), ("data",))
    out = make_train(ma, tc, mesh=mesh)(KEY)
    m = out["metrics"][0]
    for k, v in m.items():
        assert np.isfinite(np.asarray(v)).all(), k

    # sharded result matches the unsharded run
    out2 = make_train(ma, tc)(KEY)
    for k in m:
        np.testing.assert_allclose(np.asarray(m[k]),
                                   np.asarray(out2["metrics"][0][k]),
                                   rtol=2e-4, atol=1e-5)


def test_train_cli_wires_mesh(tmp_path, monkeypatch, capsys):
    """`python -m vit_marl_tpu.train` with MESH_SHAPE in the YAML must build
    the mesh and pass it to make_train (VERDICT r2: MESH_SHAPE was parsed
    but silently unused, so the shipped mesh config trained single-device).
    Ref entry point: ippo_rnn_JAXMARL_pmap.py + PMAP_*_2player.yaml."""
    import sys
    cfg = tmp_path / "mesh_tiny.yaml"
    cfg.write_text(
        "NUM_ENVS: 16\nNUM_STEPS: 4\nNUM_MINIBATCHES: 2\n"
        "UPDATE_EPOCHS: 1\nTOTAL_TIMESTEPS: 64\nMESH_SHAPE: [8]\n"
        "MESH_AXES: [data]\nLOG_BACKEND: none\nROLLOUT_MODE: scan\n"
        "WORLD:\n  N_DATA_MSG_PER_STEP: 5\n  EP_TYPE: fixed_steps\n"
        "  EPISODE_TIME: 4\n  START_RESOLUTION: 4\n"
        "  N_MESSAGES_PER_SYNTHETIC_DAY: 600\n"
        "AGENT_CONFIGS:\n  MarketMaking: {}\n"
        "  Execution:\n    ACTION_SPACE: simplest_case\n"
        "    OBSERVATION_SPACE: simplest_case\n"
        "    REWARD_SPACE: simplest_case\n")
    monkeypatch.setattr(sys, "argv", ["train", "--config", str(cfg)])
    from vit_marl_tpu.train import main
    out = main()
    text = capsys.readouterr().out
    assert "mesh: {'data': 8}" in text
    assert len(out["metrics"]) == 1
    for k, v in out["metrics"][0].items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_train_cli_mesh_too_big_errors(tmp_path, monkeypatch):
    """Asking for more mesh devices than exist must fail loudly, not
    silently train single-device."""
    import sys
    cfg = tmp_path / "mesh_big.yaml"
    cfg.write_text("NUM_ENVS: 16\nNUM_STEPS: 4\nTOTAL_TIMESTEPS: 64\n"
                   "MESH_SHAPE: [64]\n")
    monkeypatch.setattr(sys, "argv", ["train", "--config", str(cfg)])
    from vit_marl_tpu.train import main
    with pytest.raises(SystemExit, match="MESH_SHAPE"):
        main()


def test_2d_mesh_data_model_parallel_training():
    """One IPPO update on a (2 data x 4 model) mesh with ViT weights
    tensor-parallel (shard_params Megatron heuristic) must match the
    single-device run numerically — GSPMD derives the TP collectives from
    the placements alone (scaling-book recipe)."""
    from vit_marl_tpu.parallel import shard_params  # noqa: F401 (export)
    wcfg = WorldConfig(n_data_msg_per_step=5, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=600)
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="policy_blending",
                                observation_space="execution_policy",
                                reward_space="dual_ppo",
                                use_vision_obs=True)),
        n_agents_per_type=(1, 1))
    tc = TrainConfig(num_envs=8, num_steps=4, num_minibatches=2,
                     update_epochs=1, total_timesteps=8 * 4,
                     network=("gru", "vit_gru"), vit_preset="micro",
                     log_backend="none", rollout_mode="scan")
    mesh = make_mesh((2, 4), ("data", "model"))
    out = make_train(ma, tc, mesh=mesh)(KEY)
    m = out["metrics"][0]
    for k, v in m.items():
        assert np.isfinite(np.asarray(v)).all(), k
    out2 = make_train(ma, tc)(KEY)
    for k in m:
        np.testing.assert_allclose(np.asarray(m[k]),
                                   np.asarray(out2["metrics"][0][k]),
                                   rtol=5e-4, atol=1e-5)


def test_resume_under_mesh(tmp_path):
    """Checkpoint resume with a sharded mesh: save from a sharded run,
    resume into a sharded run — restored leaves must be re-placed with the
    live shardings and the optimizer must continue, not reset."""
    wcfg = WorldConfig(n_data_msg_per_step=5, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=600)
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="simplest_case",
                                observation_space="simplest_case",
                                reward_space="simplest_case")),
        n_agents_per_type=(1, 1))
    ck = str(tmp_path / "ckpt")

    def tc(n_updates, **kw):
        return TrainConfig(num_envs=16, num_steps=4, num_minibatches=2,
                           update_epochs=1, total_timesteps=16 * 4 * n_updates,
                           log_backend="none", rollout_mode="scan",
                           checkpoint_dir=ck, **kw)

    mesh = make_mesh((8,), ("data",))
    make_train(ma, tc(1), mesh=mesh)(KEY)
    out = make_train(ma, tc(2, resume=True), mesh=mesh)(KEY)
    assert len(out["metrics"]) == 1  # only the remaining update ran
    for ts in out["runner_state"][0]:
        assert int(ts.step) == 2 * 1 * 2  # epochs*minibatches per update x 2
        # params stayed replicated over the mesh after resume
        leaf = jax.tree.leaves(ts.params)[0]
        assert len(leaf.sharding.device_set) == 8


def test_hybrid_mesh_single_host_degenerate():
    """make_hybrid_mesh with one process: size-1 leading DCN axis; the env
    batch shards over (dcn_data, data) jointly; training runs unchanged."""
    from vit_marl_tpu.parallel import make_hybrid_mesh, shard_batch

    mesh = make_hybrid_mesh((4,), ("data",))
    assert mesh.shape == {"dcn_data": 1, "data": 4}
    x = jnp.arange(8 * 3).reshape(8, 3)
    xs = shard_batch({"x": x}, mesh)["x"]
    # leading axis split over the product of both data axes
    assert xs.sharding.spec[0] == ("dcn_data", "data")
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))

    wcfg = WorldConfig(n_data_msg_per_step=5, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=600)
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="simplest_case",
                                observation_space="simplest_case",
                                reward_space="simplest_case")),
        n_agents_per_type=(1, 1))
    tc = TrainConfig(num_envs=8, num_steps=4, num_minibatches=2,
                     update_epochs=1, total_timesteps=8 * 4,
                     log_backend="none", rollout_mode="scan")
    out = make_train(ma, tc, mesh=mesh)(KEY)
    for k, v in out["metrics"][0].items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_initialize_distributed_single_process_noop():
    from vit_marl_tpu.parallel import initialize_distributed

    initialize_distributed()  # must not raise in a single-process run
    assert jax.process_count() == 1


def test_two_process_dcn_update(tmp_path):
    """True multi-host seam: TWO OS processes join via
    ``initialize_distributed`` over a localhost coordinator, build the
    hybrid ``(dcn_data=2, data=4)`` mesh with ``make_hybrid_mesh`` and run
    one sharded IPPO update; the updated params must match a
    single-process run on an identically-shaped ``(2, 4)`` mesh.

    This is the test the degenerate single-host cases can't provide: it
    fails if ``initialize_distributed`` stops forming the cluster, if
    ``make_hybrid_mesh`` mis-groups devices across processes, or if the
    cross-process gradient all-reduce regresses.
    """
    import os
    import socket
    import subprocess
    import sys

    # free port for the coordination service
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_"))}
    env.pop("TPU_WORKER_HOSTNAMES", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(repo, "tests", "dcn_worker.py")
    out_npz = str(tmp_path / "proc0.npz")

    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid), out_npz],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"worker {pid}: OK" in out

    # single-process golden on the same logical (2, 4) partitioning
    from vit_marl_tpu.config import MarketMakingConfig as MM

    wcfg = WorldConfig(n_data_msg_per_step=2, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=300)
    ma = MultiAgentConfig(world=wcfg, agents=(MM(),), n_agents_per_type=(1,))
    tc = TrainConfig(num_envs=8, num_steps=2, num_minibatches=1,
                     update_epochs=1, total_timesteps=16, network="gru",
                     hidden_size=32, fc_dim=32, log_backend="none",
                     rollout_mode="scan")
    mesh = make_mesh((2, 4), ("dcn_data", "data"))
    out = make_train(ma, tc, mesh=mesh)(KEY)
    golden = jax.tree.leaves(out["runner_state"][0][0].params)

    got = np.load(str(out_npz))
    assert len(golden) == len([k for k in got.files if k.startswith("p")])
    for i, g in enumerate(golden):
        np.testing.assert_allclose(
            got[f"p{i}"], np.asarray(jax.device_get(g)),
            rtol=2e-5, atol=1e-6,
            err_msg=f"param leaf {i} diverged between 2-process and "
                    f"single-process runs")
    assert np.isfinite(got["actor_loss"]).all()


def test_mesh_keeps_engine_pallas_via_shard_map():
    """GSPMD cannot partition pallas_call (it replicates the op across the
    mesh — all-gather + full batch per chip).  make_train with a multi-
    device mesh therefore routes the env step through the shard_map
    wrapper (engine kernel runs per shard; parallel/shard_step.py) and
    only the ViT attention kernel — which has no shard_map wrapper —
    falls back to the XLA path.  The engine must NOT be force-disabled."""
    from vit_marl_tpu.config import (ExecutionConfig, MultiAgentConfig,
                                     TrainConfig, WorldConfig)
    from vit_marl_tpu.env.world import WorldEnv
    from vit_marl_tpu.parallel import make_mesh
    from vit_marl_tpu.rl.ppo import make_train

    ma = MultiAgentConfig(
        world=WorldConfig(n_data_msg_per_step=2, ep_type="fixed_steps",
                          episode_time=4, start_resolution=4,
                          n_messages_per_synthetic_day=300),
        agents=(ExecutionConfig(action_space="simplest_case"),),
        n_agents_per_type=(1,))
    env = WorldEnv(ma)
    cfg = TrainConfig(num_envs=8, num_steps=2, num_minibatches=1,
                      update_epochs=1, total_timesteps=16,
                      log_backend="none")
    mesh = make_mesh((8,), ("data",))
    make_train(ma, cfg, env=env, mesh=mesh)
    assert not env._disable_pallas   # shard_map path keeps the kernel


def test_sharded_step_matches_unsharded():
    """make_sharded_step (shard_map over the env axis, per-env keys riding
    with their envs) must be bit-equal to the unsharded env.step_vec —
    the property that makes the Pallas-engine-per-shard pod design safe
    (parallel/shard_step.py)."""
    import numpy as np
    from vit_marl_tpu.config import (ExecutionConfig, MarketMakingConfig,
                                     MultiAgentConfig, WorldConfig)
    from vit_marl_tpu.env.world import WorldEnv
    from vit_marl_tpu.parallel import make_mesh
    from vit_marl_tpu.parallel.shard_step import make_sharded_step

    ma = MultiAgentConfig(
        world=WorldConfig(n_data_msg_per_step=8, ep_type="fixed_steps",
                          episode_time=6, start_resolution=6,
                          n_messages_per_synthetic_day=1_000),
        agents=(MarketMakingConfig(), ExecutionConfig()),
        n_agents_per_type=(1, 1))
    env = WorldEnv(ma)
    params = env.default_params
    E = 16                                   # 2 envs per device on the 8-mesh
    key = jax.random.PRNGKey(3)
    reset_keys = jax.random.split(jax.random.fold_in(key, 1), E)
    obs, states = jax.vmap(env.reset, in_axes=(0, None))(reset_keys, params)
    actions = [jnp.zeros((E,), jnp.int32),
               jnp.ones((E,), jnp.int32)]

    want = env.step_vec(key, states, actions, params)
    mesh = make_mesh((8,), ("data",))
    got = make_sharded_step(env, mesh)(key, states, actions, params)

    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_mesh_sharded_attention_matches_unsharded():
    """short_attention under an active mesh context: the kernel call is
    shard_mapped over the data axis and must be bit-equal to the
    unsharded call (attention is per-env math; fwd AND grad)."""
    import jax.numpy as jnp

    from vit_marl_tpu.ops.attention_kernel import (
        mesh_attention_ok,
        restore_attention_mesh,
        set_attention_mesh,
        short_attention,
    )

    mesh = make_mesh((8,), ("data",))
    N, H, D = 11, 2, 16
    B = 8 * 64                       # 64 envs per shard: kernel-eligible
    qkv = jax.random.normal(KEY, (B * N, 3 * H * D), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(5), (B * N, H * D),
                          jnp.float32)

    def loss(fn, x):
        return jnp.vdot(fn(x, N, H), g)

    base = short_attention(qkv, N, H)
    gbase = jax.grad(lambda x: loss(short_attention, x))(qkv)

    prev = set_attention_mesh(mesh)
    try:
        assert mesh_attention_ok(B * N, N)
        # per-shard tiling violated -> caller must fall back
        assert not mesh_attention_ok(63 * 8 * N, N)
        got = jax.jit(lambda x: short_attention(x, N, H))(qkv)
        ggot = jax.jit(jax.grad(lambda x: loss(short_attention, x)))(qkv)
    finally:
        restore_attention_mesh(prev)

    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gbase),
                               rtol=2e-5, atol=2e-5)


def test_mesh_training_keeps_attn_kernel_config():
    """make_train with a mesh no longer force-disables vit_attn_kernel:
    the mesh context + per-shard eligibility gate handles it (ineligible
    shapes fall back inside MHA).  One vision update on the 8-dev mesh
    must run and match the single-device run.

    vit_attn_env_block=2 makes the per-shard tiling gate PASS (16 envs /
    8 shards = 2 local envs), so this drives the shard_mapped
    short_attention wrapper through make_train — off-TPU the pallas_call
    inside it falls back to the XLA reference, so what this verifies is
    the wrapper's sharding/gating, while the kernel's compiled lowering
    is covered by bench --selfcheck on hardware."""
    wcfg = WorldConfig(n_data_msg_per_step=5, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=600)
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="policy_blending",
                                observation_space="execution_policy",
                                reward_space="dual_ppo",
                                use_vision_obs=True)),
        n_agents_per_type=(1, 1))
    tc = TrainConfig(num_envs=16, num_steps=4, num_minibatches=2,
                     update_epochs=1, total_timesteps=16 * 4,
                     log_backend="none", rollout_mode="scan",
                     network=("gru", "vit_gru"), vit_preset="micro",
                     vit_attn_kernel=True, vit_attn_env_block=2)
    mesh = make_mesh((8,), ("data",))
    out = make_train(ma, tc, mesh=mesh)(KEY)
    m = out["metrics"][0]
    for k, v in m.items():
        assert np.isfinite(np.asarray(v)).all(), k
    out2 = make_train(ma, tc)(KEY)
    for k in m:
        np.testing.assert_allclose(np.asarray(m[k]),
                                   np.asarray(out2["metrics"][0][k]),
                                   rtol=2e-4, atol=1e-5)


def test_mesh_sharded_ln_fold_matches_unsharded():
    """short_ln_qkv_attn under an active mesh context == the plain call,
    forward AND gradients — including the REPLICATED LN/QKV params, whose
    cotangents shard_map's transpose must psum across shards."""
    from vit_marl_tpu.ops.attention_kernel import (
        restore_attention_mesh,
        set_attention_mesh,
    )
    from vit_marl_tpu.ops.block_kernel import short_ln_qkv_attn

    N, H, W, E = 11, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    x = jax.random.normal(ks[0], (E * N, W))
    g1 = jax.random.normal(ks[1], (W,)) * 0.1 + 1.0
    b1 = jax.random.normal(ks[2], (W,)) * 0.1
    w = jax.random.normal(ks[3], (W, 3 * W)) * 0.05
    bias = jax.random.normal(ks[4], (3 * W,)) * 0.1

    def loss(call):
        return lambda *a: jnp.sum(call(*a, N, H, 2) ** 2)

    want = jax.grad(loss(short_ln_qkv_attn),
                    argnums=(0, 1, 2, 3, 4))(x, g1, b1, w, bias)
    want_f = short_ln_qkv_attn(x, g1, b1, w, bias, N, H, 2)

    mesh = make_mesh((8,), ("data",))
    prev = set_attention_mesh(mesh)
    try:
        got_f = short_ln_qkv_attn(x, g1, b1, w, bias, N, H, 2)
        got = jax.grad(loss(short_ln_qkv_attn),
                       argnums=(0, 1, 2, 3, 4))(x, g1, b1, w, bias)
    finally:
        restore_attention_mesh(prev)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=2e-6, atol=1e-7)
    # grads: the replicated params' cotangents are summed as 8 per-shard
    # partials + a psum instead of one row reduction — reassociation
    # noise of a few e-4 relative on near-zero entries is expected
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_mesh_training_with_attn_ln_fold():
    """One vision update with VIT_ATTN_LN_FOLD on the 8-dev mesh matches
    the single-device run (env_block=2 so the per-shard tiling engages
    the shard_mapped wrapper; off-TPU the kernel inside falls back to the
    XLA reference — this verifies the sharding/gating, the compiled
    lowering is covered by bench --selfcheck)."""
    wcfg = WorldConfig(n_data_msg_per_step=5, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=600)
    ma = MultiAgentConfig(
        world=wcfg,
        agents=(MarketMakingConfig(),
                ExecutionConfig(action_space="policy_blending",
                                observation_space="execution_policy",
                                reward_space="dual_ppo",
                                use_vision_obs=True)),
        n_agents_per_type=(1, 1))
    tc = TrainConfig(num_envs=16, num_steps=4, num_minibatches=2,
                     update_epochs=1, total_timesteps=16 * 4,
                     log_backend="none", rollout_mode="scan",
                     network=("gru", "vit_gru"), vit_preset="micro",
                     vit_attn_ln_fold=True, vit_attn_env_block=2)
    mesh = make_mesh((8,), ("data",))
    out = make_train(ma, tc, mesh=mesh)(KEY)
    m = out["metrics"][0]
    for k, v in m.items():
        assert np.isfinite(np.asarray(v)).all(), k
    out2 = make_train(ma, tc)(KEY)
    for k in m:
        np.testing.assert_allclose(np.asarray(m[k]),
                                   np.asarray(out2["metrics"][0][k]),
                                   rtol=2e-4, atol=1e-5)
