"""SRL subsystem: dataset generation, encoder training, model serving."""
import os

import jax
import numpy as np
import pytest

from srl_tpu.data.dataset_generator import generate_dataset
from srl_tpu.srl.episode_saver import load_dataset
from srl_tpu.srl.models import SRLEncodedEnv, getSRLDim, loadSRLModel
from srl_tpu.srl.registry import registered_srl
from srl_tpu.srl.trainer import SRLTrainer, fit_pca, save_pca


@pytest.fixture(scope="module")
def small_dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data"))
    folder = generate_dataset(
        "MobileRobotGymEnv-v0",
        num_episodes=6,
        save_path=path,
        name="mr_test",
        num_envs=4,
        max_steps=15,
        seed=0,
    )
    return load_dataset(folder), folder


@pytest.mark.fast
def test_registry_has_all_reference_models():
    # state_representation/registry.py:5-30 names.
    for name in [
        "raw_pixels", "ground_truth", "joints", "joints_position",
        "robotic_priors", "inverse", "forward", "multi_view_srl",
        "srl_combination", "supervised", "autoencoder", "autoencoder_inverse",
        "autoencoder_reward", "autoencoder_forward", "random",
        "random_inverse", "reward_inverse", "srl_splits", "srl_split_forward",
        "srl_3_splits", "reward", "vae", "dae", "pca",
    ]:
        assert name in registered_srl


@pytest.mark.fast
def test_dataset_generation_layout(small_dataset):
    data, folder = small_dataset
    n = len(data["rewards"])
    assert data["observations"].shape == (n, 224, 224, 3)
    assert data["observations"].dtype == np.uint8
    assert data["episode_starts"].sum() == 6
    assert data["ground_truth_states"].shape == (n, 2)
    assert data["target_positions"].shape == (6, 2)
    assert len(data["images_path"]) == n
    for f in ("dataset_config.json", "env_globals.json"):
        assert os.path.exists(os.path.join(folder, f))
    # Each episode records the reset frame + max_steps in-episode frames
    # (the final step's observation belongs to the next episode after
    # autoreset and is excluded).
    assert n == 6 * 16


# Only the cheapest loss combos stay in the --fast smoke tier (compile time
# dominates them); the rest run in the default tier.
@pytest.mark.parametrize(
    "losses",
    [
        ["autoencoder"],
        ["vae"],
        ["forward", "inverse"],
        pytest.param(["reward"], marks=pytest.mark.fast),
        pytest.param(["priors"], marks=pytest.mark.fast),
        pytest.param(["supervised"], marks=pytest.mark.fast),
        ["autoencoder", "inverse", "forward"],
        ["dae"],
    ],
)
def test_srl_training_smoke(small_dataset, losses, tmp_path):
    data, _ = small_dataset
    trainer = SRLTrainer(
        state_dim=3, losses=losses, obs_shape=(224, 224, 3), n_actions=4,
    )
    result = trainer.fit(data, epochs=1, batch_size=16)
    assert len(result["history"]) == 1
    assert np.isfinite(result["history"][0]["total"])
    states = trainer.encode(data["observations"][:8])
    assert states.shape == (8, 3)


def test_autoencoder_loss_decreases(small_dataset, tmp_path):
    data, _ = small_dataset
    trainer = SRLTrainer(state_dim=4, losses=["autoencoder"], obs_shape=(224, 224, 3))
    result = trainer.fit(data, epochs=4, batch_size=16)
    h = [e["reconstruction"] for e in result["history"]]
    assert h[-1] < h[0], f"reconstruction did not improve: {h}"

    # Save -> loadSRLModel roundtrip (state_representation/models.py parity).
    log_dir = str(tmp_path / "srl_ae")
    model_path = trainer.save(log_dir)
    assert getSRLDim(model_path) == 4
    model = loadSRLModel(model_path)
    s1 = model.getState(data["observations"][:4])
    s2 = trainer.encode(data["observations"][:4])
    np.testing.assert_allclose(np.asarray(s1), s2, atol=1e-5)
    # Single-observation path.
    single = model.getState(data["observations"][0])
    assert single.shape == (4,)


@pytest.mark.fast
def test_fit_images_trained_and_chunking_equivalence():
    """fit() reports the images actually trained (drop-last epoch
    truncation) and dispatch chunking is pure scheduling: the default
    epoch-fused mode and per-minibatch updates_per_call=1 run the same
    minibatches with the same keys (derived from the global minibatch
    index, not the chunk layout), so histories match."""
    rng = np.random.RandomState(0)
    n = 100
    data = {
        "observations": rng.randint(0, 255, (n, 8, 8, 3), np.uint8),
        "actions": rng.randint(0, 4, n).astype(np.int32),
        "rewards": rng.randn(n).astype(np.float32),
        "episode_starts": (np.arange(n) % 20 == 0),
        "ground_truth_states": rng.randn(n, 2).astype(np.float32),
    }
    # 100 frames, 5 episodes -> 95 transition pairs; batch 16 -> 5 full
    # minibatches of 16 per epoch, 15 pairs dropped.
    kw = dict(state_dim=2, losses=["autoencoder"], obs_shape=(8, 8, 3),
              n_actions=4)
    fused = SRLTrainer(**kw).fit(data, epochs=3, batch_size=16)
    assert fused["images_trained"] == 3 * 5 * 16
    per_mb = SRLTrainer(**kw).fit(data, epochs=3, batch_size=16,
                                  updates_per_call=1)
    assert per_mb["images_trained"] == fused["images_trained"]
    for a, b in zip(fused["history"], per_mb["history"]):
        for key in a:
            np.testing.assert_allclose(a[key], b[key], rtol=1e-5,
                                       err_msg=f"epoch log {key} diverged")


@pytest.mark.fast
def test_pca_baseline(small_dataset, tmp_path):
    data, _ = small_dataset
    pca = fit_pca(data["observations"][:64], state_dim=3)
    path = save_pca(pca, str(tmp_path / "baselines" / "pca"))
    model = loadSRLModel(path)
    states = model.getState(data["observations"][:10])
    assert np.asarray(states).shape == (10, 3)
    # Projections decorrelate: distinct observations get distinct codes.
    assert np.std(np.asarray(states)) > 1e-3


def test_srl_encoded_env_rl_smoke(small_dataset, tmp_path):
    """Full SRL->RL path: learned encoder feeding PPO2 (replaces the
    MultiprocessSRLModel pipe, rl_baselines/utils.py:162-191)."""
    data, _ = small_dataset
    trainer = SRLTrainer(state_dim=3, losses=["autoencoder"], obs_shape=(224, 224, 3))
    trainer.fit(data, epochs=1, batch_size=16)
    model_path = trainer.save(str(tmp_path / "srl"))
    model = loadSRLModel(model_path)

    from srl_tpu.agents.ppo import PPO2, PPOConfig
    from srl_tpu.envs import make_env

    env = make_env("MobileRobotGymEnv-v0", srl_model="raw_pixels", max_steps=15)
    wrapped = SRLEncodedEnv(env, model)
    assert wrapped.observation_space.shape == (3,)
    agent = PPO2(env=wrapped, num_envs=4, config=PPOConfig(n_steps=8))
    state = agent.learn(total_timesteps=8 * 4 * 2, seed=0)
    assert int(state.update_idx) == 2


def test_split_dimensions_semantics(small_dataset, tmp_path):
    """srl_splits trains a genuinely split encoder (SRLModulesSplit,
    state_representation/models.py:60-92): 'split-dimensions' is written to
    and read back from exp_config.json, and every head reads ONLY its own
    slice of the state vector."""
    import json

    import jax.numpy as jnp

    from srl_tpu.srl.nets import SRLModules

    data, _ = small_dataset
    entry = registered_srl["srl_splits"]
    assert entry["losses"] == ["autoencoder", "reward", "inverse"]
    trainer = SRLTrainer(
        state_dim=8,
        losses=entry["losses"],
        obs_shape=(224, 224, 3),
        n_actions=4,
        split_dimensions=entry["splits"],
    )
    # -1 resolves to the remaining dims, slices allocated in loss order.
    assert trainer.ranges == {
        "autoencoder": (0, 4),
        "reward": (4, 6),
        "inverse": (6, 8),
    }
    trainer.fit(data, epochs=1, batch_size=16)
    path = trainer.save(str(tmp_path / "splits"))

    cfg = json.load(
        open(os.path.join(os.path.dirname(path), "exp_config.json"))
    )
    assert cfg["split-dimensions"] == {"autoencoder": -1, "reward": 2,
                                       "inverse": 2}

    model = loadSRLModel(path)
    assert model.split_dimensions, "loader dropped split-dimensions"
    # Slice isolation: perturbing the autoencoder slice must not move the
    # inverse head; perturbing the inverse slice must.
    s0 = jnp.zeros((1, 8), jnp.float32)
    s_ae = s0.at[0, 0].set(5.0)
    s_inv = s0.at[0, 6].set(5.0)
    apply = lambda a, b: np.asarray(
        model.model.apply(model.params, a, b, method=SRLModules.predict_inverse)
    )
    np.testing.assert_allclose(apply(s0, s0), apply(s_ae, s_ae), atol=1e-6)
    assert not np.allclose(apply(s0, s0), apply(s_inv, s_inv))
    # Decoder reads only the autoencoder slice.
    dec = lambda s: np.asarray(
        model.model.apply(model.params, s, method=SRLModules.decode)
    )
    np.testing.assert_allclose(dec(s0), dec(s_inv), atol=1e-6)
    assert not np.allclose(dec(s0), dec(s_ae))

    # RL runs on the split encoder end-to-end.
    from srl_tpu.agents.ppo import PPO2, PPOConfig
    from srl_tpu.envs import make_env

    env = make_env("MobileRobotGymEnv-v0", srl_model="raw_pixels", max_steps=15)
    wrapped = SRLEncodedEnv(env, model)
    assert wrapped.observation_space.shape == (8,)
    agent = PPO2(env=wrapped, num_envs=4, config=PPOConfig(n_steps=8))
    state = agent.learn(total_timesteps=8 * 4 * 2, seed=0)
    assert int(state.update_idx) == 2


@pytest.mark.fast
def test_fusion_and_relative_pos(tmp_path):
    from srl_tpu.data.change_to_relative_pos import convert_to_relative
    from srl_tpu.data.dataset_fusioner import fuse_datasets

    p = str(tmp_path)
    f1 = generate_dataset(
        "MobileRobotGymEnv-v0", 2, save_path=p, name="d1", num_envs=2,
        max_steps=10, seed=1,
    )
    f2 = generate_dataset(
        "MobileRobotGymEnv-v0", 2, save_path=p, name="d2", num_envs=2,
        max_steps=10, seed=2,
    )
    merged = fuse_datasets(f1, f2, os.path.join(p, "merged"))
    assert not os.path.exists(f1) and not os.path.exists(f2)
    data = load_dataset(merged)
    assert data["episode_starts"].sum() == 4
    assert len(data["rewards"]) == 4 * 11  # reset frame + 10 steps each
    # Episode renumbering covers 0..3.
    eps = sorted({str(x).split("/")[1] for x in data["images_path"]})
    assert eps == [f"record_{i:03d}" for i in range(4)]

    states_before = data["ground_truth_states"].copy()
    convert_to_relative(merged)
    data2 = load_dataset(merged)
    ep_idx = np.cumsum(data2["episode_starts"]) - 1
    expected = states_before - data2["target_positions"][ep_idx]
    np.testing.assert_allclose(data2["ground_truth_states"], expected, atol=1e-6)


@pytest.mark.fast
def test_log_rl_states(tmp_path):
    """LogRLStates writes the reference's three-npz layout and flushes on
    episode end (state_representation/episode_saver.py:165-234)."""
    from srl_tpu.srl.episode_saver import LogRLStates

    log = LogRLStates(str(tmp_path))
    state = np.array([0.1, 0.2])
    log.reset(state / 2, state)
    for t in range(4):
        done = t == 3
        log.step(state / 2, state, action=1, reward=0.5, done=done)
    full = np.load(str(tmp_path / "log_srl" / "full_log.npz"))
    assert full["rewards"].shape == (4,)
    assert full["states"].shape == (4, 2)
    norm = np.load(str(tmp_path / "log_srl" / "normalized_states_rewards.npz"))
    np.testing.assert_allclose(norm["states"], full["normalized_states"])


def test_encoded_env_batched_path_encodes(small_dataset, tmp_path):
    """Regression: SRLEncodedEnv.observe_batched must encode — its
    __getattr__ used to forward VecEnv's observe_batched probe to the
    wrapped env, whose batched renderer (the Kuka Pallas path) returned
    RAW pixels and silently skipped the encoder."""
    import jax.numpy as jnp

    from srl_tpu.core.env import VecEnv
    from srl_tpu.envs import make_env

    data, _ = small_dataset
    trainer = SRLTrainer(state_dim=3, losses=["autoencoder"],
                         obs_shape=(224, 224, 3))
    trainer.fit(data, epochs=1, batch_size=16)
    model = loadSRLModel(trainer.save(str(tmp_path / "srl")))

    # Kuka DOES define observe_batched (the Pallas renderer hook).
    env = make_env("KukaButtonGymEnv-v0", srl_model="raw_pixels")
    wrapped = SRLEncodedEnv(env, model)
    vec = VecEnv(wrapped, 3)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 3)
    vstate, tr = jax.jit(vec.step)(vstate, jnp.zeros(3, jnp.int32))
    assert tr.obs.shape == (3, 3)
    assert np.all(np.isfinite(np.asarray(tr.obs)))


@pytest.mark.fast
def test_toward_target_per_step_proportion(tmp_path):
    """--toward-target-timesteps-proportion mixes the expert action per env
    per STEP inside the episode (reference dataset_generator.py:98-113), not
    as an all-or-nothing policy switch: at p the realized expert-agreement
    fraction is ~ p + (1-p)/n_actions."""

    def expert_agreement(p, seed):
        folder = generate_dataset(
            "MobileRobotGymEnv-v0", num_episodes=10,
            save_path=str(tmp_path), name=f"mix_{int(p * 100)}",
            num_envs=4, max_steps=20, seed=seed,
            policy="toward_target", toward_target_proportion=p,
        )
        d = load_dataset(folder)
        gt = np.asarray(d["ground_truth_states"])
        tgt = np.asarray(d["target_positions"])
        act = np.asarray(d["actions"])
        starts = np.asarray(d["episode_starts"])
        episode_idx = np.cumsum(starts) - 1  # target_positions: one row/episode
        agree, total = 0, 0
        for t in range(1, len(act)):
            if starts[t]:  # row t begins a new episode: no action taken
                continue
            # expert acted on the pre-step state toward this episode's target
            delta = tgt[episode_idx[t]] - gt[t - 1]
            if np.max(np.abs(delta)) < 1e-6:
                continue
            if np.argmax(np.abs(delta)) == 0:
                a = 1 if delta[0] > 0 else 0
            else:
                a = 3 if delta[1] > 0 else 2
            agree += int(act[t] == a)
            total += 1
        assert total > 100
        return agree / total

    frac_half = expert_agreement(0.5, seed=1)
    # p=0.5 over 4 actions: expected 0.5 + 0.5/4 = 0.625.
    assert 0.50 < frac_half < 0.75, frac_half
    frac_full = expert_agreement(1.0, seed=2)
    assert frac_full > 0.9, frac_full
