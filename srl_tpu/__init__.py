"""srl_tpu — a TPU-native State Representation Learning + robotics RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
araffin/robotics-rl-srl (the S-RL Toolbox): batched pure-functional robotics
environments (Kuka arm, mobile robot, omnirobot, racing car), on-device RL
algorithms (PPO, A2C, DQN, SAC, DDPG, ARS, CMA-ES, ...), a pluggable SRL
(state representation learning) encoder layer, and experiment infrastructure
(dataset generation, hyperparameter search, benchmark pipelines, replay).

Design stance (vs the reference's process/queue architecture):
  * every environment is a pure function  step(state, action) -> (state', obs,
    reward, done)  batched with vmap, rolled out with lax.scan, compiled with
    jit and sharded over a device mesh with shard_map/pjit;
  * the SRL encoder is applied in-batch on device (replacing the reference's
    MultiprocessSRLModel queue server, rl_baselines/utils.py:162-191);
  * the learner is an on-device actor-learner with psum gradient collectives
    (replacing MPI / multiprocess VecEnvs).
"""

__version__ = "0.1.0"
