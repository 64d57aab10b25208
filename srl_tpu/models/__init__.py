from srl_tpu.models.policies import ActorCritic, MlpTorso, NatureCnnTorso, make_policy

__all__ = ["ActorCritic", "MlpTorso", "NatureCnnTorso", "make_policy"]
