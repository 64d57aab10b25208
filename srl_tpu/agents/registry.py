"""RL algorithm registry.

Mirrors ``registered_rl`` (rl_baselines/registry.py:17-30):
name -> (agent class, AlgoType, allowed ActionTypes). Entries are appended as
algorithm families land; the reference's full set is the target surface.
"""
from __future__ import annotations

from srl_tpu.agents import ActionType, AlgoType
from srl_tpu.core.registry import Registry

registered_rl: Registry = Registry("rl algo")


def resolve_policy_class(algo: str, policy: str = "auto"):
    """Agent class for an (algo, policy) pair.

    The lstm/lnlstm/cnnlstm variants route to the Recurrent* implementations —
    the reference's policy selection in ``StableBaselinesRLObject.train``
    (rl_baselines/base_classes.py:227-246). Shared by the train CLI AND
    replay/enjoy so a run trained with ``--policy lstm`` reloads as the same
    class it trained as (enjoy_baselines.py:66-118 reconstructs the exact
    policy class from the pickled metadata)."""
    algo_class = registered_rl[algo][0]
    if "lstm" not in (policy or ""):
        return algo_class
    if algo == "ppo2":
        from srl_tpu.agents.recurrent_ppo import RecurrentPPO2

        return RecurrentPPO2
    if algo == "a2c":
        from srl_tpu.agents.a2c import RecurrentA2C

        return RecurrentA2C
    if algo == "acer":
        from srl_tpu.agents.acer import RecurrentACER

        return RecurrentACER
    if algo == "acktr":
        from srl_tpu.agents.acktr import RecurrentACKTR

        return RecurrentACKTR
    # TRPO/PPO1 genuinely have no recurrent policies upstream
    # (stable-baselines raises for LstmPolicy there too).
    raise AssertionError(
        "Error: recurrent policies are currently supported for "
        "ppo2, a2c, acer and acktr"
    )


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
