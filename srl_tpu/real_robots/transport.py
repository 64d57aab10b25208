"""ZMQ transport for real-robot bridges — wire-compatible with the reference.

The same PAIR-socket protocol as real_robots/utils.py:12-36 (a JSON metadata
frame with dtype/shape followed by the raw buffer in a multipart message), so
this framework's clients talk to the reference's unmodified ROS servers and
vice versa. This layer lives strictly at the host boundary: on the training
path observations enter the device world as ordinary arrays.
"""
from __future__ import annotations

import numpy as np

try:
    import zmq
except ImportError:  # pragma: no cover - zmq is present in the target image
    zmq = None


def recvMatrix(socket) -> np.ndarray:
    """Receive a numpy array (JSON metadata + raw buffer)."""
    metadata = socket.recv_json()
    msg = socket.recv(copy=True, track=False)
    arr = np.frombuffer(memoryview(msg), dtype=metadata["dtype"])
    return arr.reshape(metadata["shape"])


def sendMatrix(socket, mat: np.ndarray):
    """Send a numpy array with metadata as a multipart message."""
    metadata = dict(dtype=str(mat.dtype), shape=mat.shape)
    socket.send_json(metadata, flags=zmq.SNDMORE)
    return socket.send(np.ascontiguousarray(mat), flags=0, copy=True, track=False)


def getActions(delta_pos: float, n_actions: int) -> np.ndarray:
    """Discrete (dx, dy, dz) action table (real_robots/utils.py:39-60):
    single-axis moves of +-delta_pos."""
    possible = [i * delta_pos for i in range(-1, 2)]
    actions = []
    for dx in possible:
        for dy in possible:
            for dz in possible:
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                if abs(dx) + abs(dy) + abs(dz) > delta_pos:
                    continue
                actions.append([dx, dy, dz])
    assert len(actions) == n_actions, f"Wrong number of actions: {len(actions)}"
    return np.array(actions)


def connect_pair(port: int, server: bool = False, hostname: str = "127.0.0.1"):
    """PAIR socket helper: bind (server) or connect (client)."""
    context = zmq.Context()
    socket = context.socket(zmq.PAIR)
    if server:
        socket.bind(f"tcp://*:{port}")
    else:
        socket.connect(f"tcp://{hostname}:{port}")
    return context, socket
