from enum import Enum


class AlgoType(Enum):  # rl_baselines/__init__.py:4-8
    REINFORCEMENT_LEARNING = 1
    EVOLUTION_STRATEGIES = 2
    OTHER = 3


class ActionType(Enum):  # rl_baselines/__init__.py:10-12
    DISCRETE = 1
    CONTINUOUS = 2
