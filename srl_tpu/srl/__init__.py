from enum import Enum


class SRLType(Enum):  # state_representation/__init__.py:4-6
    ENVIRONMENT = 1  # provided by the env itself (ground_truth, joints, pixels)
    SRL = 2  # learned encoder


from srl_tpu.srl.registry import registered_srl  # noqa: E402

__all__ = ["SRLType", "registered_srl"]
