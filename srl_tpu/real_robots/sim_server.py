"""Protocol-compatible Omnirobot simulator server.

The reference fakes its ZMQ server with an in-process socket object
(real_robots/omnirobot_simulator_server.py:357-446); here the simulator is
the batched OmniRobotEnv kernel itself, served over a REAL ZMQ PAIR socket —
which also makes the remote-env client path testable end to end without
hardware or ROS.

Run:  python -m srl_tpu.real_robots.sim_server [--port 7777]
"""
from __future__ import annotations

import argparse

import numpy as np
import zmq

from srl_tpu.real_robots.transport import connect_pair, sendMatrix
from srl_tpu.utils.logging import printGreen


class OmniRobotSimServer:
    def __init__(self, port: int = 7777, seed: int = 0, noise: bool = True):
        import jax

        from srl_tpu.envs.omnirobot import OmniRobotEnv

        self.env = OmniRobotEnv(srl_model="raw_pixels", noise=noise)
        self._step = jax.jit(self.env.step)
        self._reset = jax.jit(self.env.reset)
        self._render = jax.jit(self.env.render_pixels)
        self.key = jax.random.PRNGKey(seed)
        self.state = None
        self.context, self.socket = connect_pair(port, server=True)
        printGreen(f"Omnirobot simulator server listening on port {port}")

    def _send_state(self, reward: float):
        self.socket.send_json(
            {
                "reward": float(reward),
                "position": np.asarray(self.state.robot_pos).tolist(),
                "target_pos": np.asarray(self.state.target_pos).tolist(),
            }
        )
        img = np.asarray(self._render(self.state))
        sendMatrix(self.socket, img)

    def serve_forever(self):
        import jax

        while True:
            msg = self.socket.recv_json()
            command = msg.get("command", "")
            if command == "reset":
                self.key, sub = jax.random.split(self.key)
                self.state = self._reset(sub)
                self._send_state(0.0)
            elif command == "action":
                if msg.get("is_discrete", True):
                    action = np.int32(msg["action"])
                else:
                    action = np.asarray(msg["action"], np.float32)
                self.state, reward, done = self._step(self.state, action)
                self._send_state(float(reward))
            elif command == "exit":
                printGreen("Received exit signal, quitting...")
                self.socket.close()
                return
            else:
                raise ValueError(f"Unknown command: {msg}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=7777)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-noise", action="store_true")
    args = parser.parse_args(argv)
    OmniRobotSimServer(args.port, args.seed, noise=not args.no_noise).serve_forever()


if __name__ == "__main__":
    main()
