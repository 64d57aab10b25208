"""PPO1 — the reference's "MPI implementation" of PPO
(rl_baselines/rl_algorithm/ppo1.py), with stable-baselines PPO1 defaults:
256 steps per actor batch, clip 0.2, ent_coef 0.01, 4 optim epochs,
Adam 1e-3 (linear schedule), batch 64, gamma 0.99, lam 0.95.

The MPI gradient averaging becomes the same data-parallel mesh collectives
every agent here uses (the env batch axis sharded over `dp` — XLA inserts
the psum), so PPO1 is PPO2 machinery with PPO1 hyperparameters.
"""
from __future__ import annotations

from srl_tpu.agents.ppo import PPO2, PPOConfig


class PPO1(PPO2):
    name = "ppo1"

    def __init__(self, env=None, num_envs: int = 8, policy: str = "auto",
                 config: PPOConfig = None, normalize_obs=None):
        if config is None:
            config = PPOConfig(
                n_steps=256,
                nminibatches=4,  # optim_batchsize 64 at 256 steps
                noptepochs=4,
                cliprange=0.2,
                learning_rate=1e-3,
                lr_linear_decay=True,
                ent_coef=0.01,
                vf_coef=0.5,
                max_grad_norm=0.5,
                gamma=0.99,
                lam=0.95,
            )
        super().__init__(env=env, num_envs=num_envs, policy=policy,
                         config=config, normalize_obs=normalize_obs)

    @classmethod
    def getOptParam(cls):
        # ppo1.py getOptParam surface
        return {
            "lam": (float, (0, 1)),
            "gamma": (float, (0, 1)),
            "learning_rate": (float, (1e-2, 1e-5)),
            "ent_coef": (float, (0, 1)),
            "cliprange": (float, (0, 1)),
            "noptepochs": (int, (1, 10)),
            "n_steps": (int, (64, 2048)),
        }
