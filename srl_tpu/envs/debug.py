"""Kuka IK sandbox — headless equivalent of the reference's PyBullet GUI
debug env (environments/debug/kuka_env.py).

The reference opens a PyBullet GUI with sliders to drive the arm's
end-effector through inverse kinematics. There is no GUI on a TPU host, so
the sandbox is a CLI/REPL: command a Cartesian end-effector target, the
damped-least-squares IK + joint servo kernels (ops/kinematics.py) track it,
and each command prints the joint vector and tip error and optionally dumps
a rendered PNG of the scene.

Usage:
    python -m srl_tpu.envs.debug --target 0.4 0.1 0.35 --steps 200 \
        --out /tmp/kuka_debug            # single shot + PNG
    python -m srl_tpu.envs.debug --interactive
        > 0.4 0.1 0.35                   # one target per line
        > q
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def track(q, target, steps: int = 200):
    """Servo the arm toward a Cartesian fingertip target; returns
    (q, tip, err). ``control_step`` drives the flange (the reference's IK
    link), which with the enforced down orientation sits TIP_OFFSET above
    the fingertip — compensate so the commanded point is the tip."""
    from srl_tpu.ops import kinematics as kin

    target = jnp.asarray(target, jnp.float32)
    flange_target = target + jnp.array([0.0, 0.0, kin.TIP_OFFSET], jnp.float32)

    def body(q, _):
        return kin.control_step(q, flange_target), None

    q, _ = jax.lax.scan(body, jnp.asarray(q, jnp.float32), None, length=steps)
    tip = kin.tip_position(q)
    return q, tip, float(jnp.linalg.norm(tip - target))


def render_frame(q, out_path: str):
    from srl_tpu.envs.kuka import KukaButtonEnv

    env = KukaButtonEnv(srl_model="raw_pixels")
    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    state = state.replace(q=jnp.asarray(q, jnp.float32))
    frame = np.asarray(env.render_pixels(state))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(out_path, frame)
        return out_path
    except ImportError:
        np.save(out_path + ".npy", frame)
        return out_path + ".npy"


def main(argv=None):
    from srl_tpu.ops import kinematics as kin
    from srl_tpu.utils.logging import printGreen, printYellow

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--target", nargs=3, type=float, default=None,
                        help="end-effector xyz target")
    parser.add_argument("--steps", type=int, default=200,
                        help="servo steps per command")
    parser.add_argument("--out", default=None,
                        help="directory for rendered PNG frames")
    parser.add_argument("--interactive", action="store_true",
                        help="read targets from stdin, one 'x y z' per line")
    args = parser.parse_args(argv)

    q = jnp.asarray(kin.settled_rest_q(), jnp.float32)
    tip = kin.tip_position(q)
    printGreen(f"rest pose tip: {np.round(np.asarray(tip), 4).tolist()}")

    frame_idx = 0

    def run(target):
        nonlocal q, frame_idx
        q, tip, err = track(q, target, steps=args.steps)
        printGreen(
            f"target {np.round(target, 3).tolist()} -> tip "
            f"{np.round(np.asarray(tip), 4).tolist()}  |err|={err:.4f}"
        )
        print("q:", np.round(np.asarray(q), 4).tolist())
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            path = render_frame(q, os.path.join(args.out, f"frame{frame_idx:03d}.png"))
            printGreen(f"wrote {path}")
            frame_idx += 1
        return err

    if args.target is not None:
        run(np.asarray(args.target, np.float32))
    if args.interactive:
        printYellow("enter 'x y z' targets, 'q' to quit")
        import sys

        for line in sys.stdin:
            line = line.strip()
            if line in ("q", "quit", "exit", ""):
                break
            try:
                run(np.asarray([float(v) for v in line.split()], np.float32))
            except ValueError:
                printYellow("expected: x y z")


if __name__ == "__main__":
    main()
