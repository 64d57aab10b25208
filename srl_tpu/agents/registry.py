"""RL algorithm registry.

Mirrors ``registered_rl`` (rl_baselines/registry.py:17-30):
name -> (agent class, AlgoType, allowed ActionTypes). Entries are appended as
algorithm families land; the reference's full set is the target surface.
"""
from __future__ import annotations

from srl_tpu.agents import ActionType, AlgoType
from srl_tpu.core.registry import Registry

registered_rl: Registry = Registry("rl algo")


def _register_all():
    from srl_tpu.agents.a2c import A2C
    from srl_tpu.agents.ars import ARS
    from srl_tpu.agents.dqn import DQN
    from srl_tpu.agents.ppo import PPO2
    from srl_tpu.agents.random_agent import RandomAgent

    both = [ActionType.DISCRETE, ActionType.CONTINUOUS]
    registered_rl.register(
        "a2c", (A2C, AlgoType.REINFORCEMENT_LEARNING, both)
    )
    registered_rl.register(
        "ars", (ARS, AlgoType.EVOLUTION_STRATEGIES, both)
    )
    registered_rl.register(
        "deepq", (DQN, AlgoType.REINFORCEMENT_LEARNING, [ActionType.DISCRETE])
    )
    registered_rl.register(
        "ppo2", (PPO2, AlgoType.REINFORCEMENT_LEARNING, both)
    )
    registered_rl.register(
        "random_agent", (RandomAgent, AlgoType.OTHER, both)
    )

    for name, modpath, cls_name, algo_type, actions in [
        ("cma-es", "srl_tpu.agents.cma_es", "CMAES", AlgoType.EVOLUTION_STRATEGIES, both),
        ("sac", "srl_tpu.agents.sac", "SAC", AlgoType.REINFORCEMENT_LEARNING,
         [ActionType.CONTINUOUS]),
        ("ddpg", "srl_tpu.agents.ddpg", "DDPG", AlgoType.REINFORCEMENT_LEARNING,
         [ActionType.CONTINUOUS]),
        ("ppo1", "srl_tpu.agents.ppo1", "PPO1", AlgoType.REINFORCEMENT_LEARNING, both),
        ("trpo", "srl_tpu.agents.trpo", "TRPO", AlgoType.REINFORCEMENT_LEARNING, both),
        ("acer", "srl_tpu.agents.acer", "ACER", AlgoType.REINFORCEMENT_LEARNING,
         [ActionType.DISCRETE]),
        ("acktr", "srl_tpu.agents.acktr", "ACKTR", AlgoType.REINFORCEMENT_LEARNING,
         [ActionType.DISCRETE]),
    ]:
        try:
            import importlib

            mod = importlib.import_module(modpath)
            registered_rl.register(name, (getattr(mod, cls_name), algo_type, actions))
        except ImportError:
            pass


_register_all()
