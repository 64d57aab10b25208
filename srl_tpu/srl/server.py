"""SRL training server — the srl_zoo ZMQ training service, on-device.

Speaks the HELLO/LEARN/READY/ERROR/EXIT protocol of
state_representation/client.py against srl_tpu's own trainer.

Run:  python -m srl_tpu.srl.server [--port 7778]
"""
from __future__ import annotations

import argparse
import os
import traceback

from srl_tpu.real_robots.transport import connect_pair
from srl_tpu.srl.client import Command, SRL_SERVER_PORT
from srl_tpu.utils.logging import printGreen, printRed


def serve(port: int = SRL_SERVER_PORT):
    context, socket = connect_pair(port, server=True)
    printGreen(f"SRL training server listening on port {port}")
    while True:
        msg = socket.recv_json()
        command = Command(msg["command"])
        if command == Command.HELLO:
            socket.send_json({"command": Command.READY.value})
        elif command == Command.LEARN:
            try:
                from srl_tpu.experiments.train_srl import train_srl_model

                path = train_srl_model(
                    msg["data_folder"],
                    msg.get("srl_model", "autoencoder"),
                    state_dim=msg.get("state_dim", 3),
                    epochs=msg.get("epochs", 5),
                    log_dir=msg.get(
                        "log_dir",
                        os.path.join(msg["data_folder"], "srl_model"),
                    ),
                )
                socket.send_json(
                    {"command": Command.READY.value, "path": path}
                )
            except Exception as e:
                traceback.print_exc()
                socket.send_json(
                    {"command": Command.ERROR.value, "error": str(e)}
                )
        elif command == Command.EXIT:
            printGreen("SRL server exiting")
            socket.close()
            return
        else:
            printRed(f"Unknown command {msg}")
            socket.send_json({"command": Command.ERROR.value})


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=SRL_SERVER_PORT)
    args = parser.parse_args(argv)
    serve(args.port)


if __name__ == "__main__":
    main()
