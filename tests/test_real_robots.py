"""ZMQ bridge tests: client <-> simulator-server over a real socket pair
(the reference's coverage model: ZMQ envs are tested via the in-process
Omnirobot simulator only)."""
import threading
import time

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.fast
def test_matrix_transport_roundtrip():
    from srl_tpu.real_robots.transport import connect_pair, recvMatrix, sendMatrix

    port = _free_port()
    ctx_s, server = connect_pair(port, server=True)
    ctx_c, client = connect_pair(port)
    mat = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    sendMatrix(server, mat)
    out = recvMatrix(client)
    np.testing.assert_array_equal(out, mat)
    server.close()
    client.close()


@pytest.mark.fast
def test_action_table():
    from srl_tpu.real_robots.transport import getActions

    actions = getActions(0.05, 6)
    assert actions.shape == (6, 3)
    # Single-axis moves only.
    assert (np.abs(actions).sum(axis=1) <= 0.05 + 1e-9).all()


@pytest.mark.fast
def test_omnirobot_sim_server_protocol():
    """Full client/server episode over ZMQ with the jitted env as backend."""
    from srl_tpu.real_robots.remote_env import OmniRobotRemoteEnv
    from srl_tpu.real_robots.sim_server import OmniRobotSimServer

    port = _free_port()
    server = OmniRobotSimServer(port=port, noise=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    env = OmniRobotRemoteEnv(port=port, srl_model="raw_pixels")
    obs = env.reset()
    assert obs.shape == (224, 224, 3) and obs.dtype == np.uint8
    total = 0.0
    for i in range(5):
        obs, reward, done, _ = env.step(i % 4)
        total += reward
        assert obs.shape == (224, 224, 3)
    assert np.isfinite(total)
    # Ground-truth mode goes through the same state message.
    gt = env.getGroundTruth()
    tgt = env.getTargetPos()
    assert gt.shape == (2,) and tgt.shape == (2,)
    env.close()
    thread.join(timeout=5)
    assert not thread.is_alive()


def test_srl_client_server_protocol(tmp_path):
    """HELLO/LEARN/READY protocol against the on-device SRL trainer."""
    from srl_tpu.data.dataset_generator import generate_dataset
    from srl_tpu.srl.client import SRLClient
    from srl_tpu.srl.server import serve

    folder = generate_dataset(
        "MobileRobotGymEnv-v0", 2, save_path=str(tmp_path), name="d",
        num_envs=2, max_steps=8,
    )
    port = _free_port()
    thread = threading.Thread(target=serve, args=(port,), daemon=True)
    thread.start()
    time.sleep(0.2)

    client = SRLClient(folder, port=port)
    client.sendLearnSignal("autoencoder", state_dim=2, epochs=1)
    ok, path = client.waitForSRLModel(timeout_s=300)
    assert ok and path is not None
    import os

    assert os.path.exists(path)
    client.close()
    thread.join(timeout=5)


@pytest.mark.fast
def test_ros_servers_importable_without_ros():
    from srl_tpu.real_robots import ros_servers

    assert not ros_servers._require_ros() or True  # import is the test
    assert hasattr(ros_servers, "OmnirobotServer")
    assert hasattr(ros_servers, "BaxterServer")
    assert hasattr(ros_servers, "RoboboServer")


@pytest.mark.fast
def test_remote_env_constants():
    from srl_tpu.real_robots import constants as C

    assert C.Omnirobot.MAX_STEPS == 250
    assert C.Omnirobot.DIST_TO_TARGET_THRESHOLD == 0.2
    assert C.RealBaxter.DELTA_POS == 0.02
    assert C.BaxterGazebo.MAX_DISTANCE == 0.35


# ---------------------------------------------------------------------------
# Marker finder (fiducial detection + planar pose)
# ---------------------------------------------------------------------------

def _make_tag(code, cell=10):
    """Render a 9x9-coded tag: dark cell where code==1, white otherwise."""
    img = np.where(np.kron(code, np.ones((cell, cell))) > 0, 0.0, 255.0)
    return img


def _demo_code():
    """Dark border ring + asymmetric interior (rotation-unambiguous)."""
    code = np.zeros((9, 9), np.uint8)
    code[0, :] = code[-1, :] = code[:, 0] = code[:, -1] = 1
    code[2, 2] = code[2, 3] = code[3, 2] = 1
    code[5, 4] = code[6, 6] = code[4, 6] = 1
    return code


def _project_tag(tag_img, K, R, t, length, out_shape=(480, 640)):
    """Paint the tag plane (z=0 object square, side `length`) into a white
    camera image via the exact pinhole projection."""
    from srl_tpu.real_robots.marker_finder import warp_perspective

    half = length / 2.0
    n = tag_img.shape[0]
    # tag pixel -> object plane -> camera pixel homography
    S = np.array([[length / n, 0, -half], [0, length / n, -half], [0, 0, 1.0]])
    P = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
    H = P @ S
    # pad the tag with a white margin so out-of-tag samples stay white
    pad = n // 3
    padded = np.full((n + 2 * pad, n + 2 * pad), 255.0)
    padded[pad:pad + n, pad:pad + n] = tag_img
    shift = np.array([[1, 0, pad], [0, 1, pad], [0, 0, 1.0]])
    return warp_perspective(padded, H @ np.linalg.inv(shift), out_shape)


def _rot(yaw, pitch):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    return Ry @ Rz


@pytest.mark.fast
def test_marker_finder_detects_pose():
    """Clean-room fiducial pipeline recovers the tag pose that rendered the
    image (reference: real_robots/omnirobot_utils/marker_finder.py)."""
    from srl_tpu.real_robots.marker_finder import MakerFinder

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    code = _demo_code()
    length = 0.2
    R = _rot(yaw=0.3, pitch=0.15)
    t = np.array([0.05, -0.03, 1.0])
    img = _project_tag(_make_tag(code), K, R, t, length)

    finder = MakerFinder({"camera_matrix": K})
    finder.setMarkerCode("robot", code, length)
    result = finder.findMarker(img, "robot")
    assert result is not None, "marker not detected"
    rot_vec, trans_vec, corners = result
    np.testing.assert_allclose(trans_vec, t, atol=0.02)
    # Rotation parity: compare recovered matrix action on the plane axes.
    theta = np.linalg.norm(rot_vec)
    k = rot_vec / (theta + 1e-12)
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R_rec = np.eye(3) + np.sin(theta) * Kx + (1 - np.cos(theta)) * Kx @ Kx
    assert np.linalg.norm(R_rec - R) < 0.15, np.linalg.norm(R_rec - R)
    # Detected corners sit on the true projected square corners.
    half = length / 2
    obj = np.array([[-half, -half, 0], [-half, half, 0],
                    [half, half, 0], [half, -half, 0]])
    proj = (K @ (R @ obj.T + t[:, None])).T
    proj = proj[:, :2] / proj[:, 2:3]
    err = np.abs(np.sort(corners, axis=0) - np.sort(proj, axis=0)).max()
    assert err < 3.0, err


@pytest.mark.fast
def test_marker_finder_rejects_unknown_code():
    from srl_tpu.real_robots.marker_finder import MakerFinder

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    code = _demo_code()
    other = _demo_code()
    other[2:7, 2:7] = 1 - other[2:7, 2:7]  # very different interior
    img = _project_tag(_make_tag(other), K, _rot(0.2, 0.1),
                       np.array([0.0, 0.0, 1.2]), 0.2)
    finder = MakerFinder({"camera_matrix": K})
    finder.setMarkerCode("robot", code, 0.2)
    assert finder.findMarker(img, "robot") is None


# ---------------------------------------------------------------------------
# Per-robot server fidelity (gazebo_server / real_baxter_server /
# real_robobo_server parity)
# ---------------------------------------------------------------------------

class _FakeRoboboRig:
    """Records actuation commands; yaw follows the target perfectly."""

    def __init__(self):
        self.commands = []
        self._yaw = 0.0

    def move(self, t, speed):
        self.commands.append(("move", round(t, 4), speed))

    def turn(self, t, speed):
        self.commands.append(("turn", round(t, 4), speed))
        self._yaw += 90.0 if speed < 0 else -90.0

    def stop(self):
        self.commands.append(("stop",))

    def yaw(self):
        return self._yaw

    def sleep(self, seconds):
        pass  # no real robot to wait for


@pytest.mark.fast
def test_robobo_motion_grid_and_timing():
    from srl_tpu.real_robots import constants as C
    from srl_tpu.real_robots.ros_servers import RoboboMotion

    rig = _FakeRoboboRig()
    m = RoboboMotion(rig)
    m.init_yaw_north()
    # Calibrated rotation time: (90 - 38)/50 + 1 = 2.04 s
    assert abs(m.compute_time("left") - 2.04) < 1e-9
    # FORWARD advances y by one cell via a single timed translation
    assert m.apply_move(0) is False
    assert m.position == [0, 1]
    assert ("move", 1.7, 10) in rig.commands
    # RIGHT = turn right, forward, turn back left; x += 1, heading restored
    rig.commands.clear()
    assert m.apply_move(3) is False
    assert m.position == [1, 1]
    kinds = [c[0] for c in rig.commands]
    assert kinds == ["turn", "move", "turn"]
    assert m.current_face_idx == 1  # facing north again
    # Boundary bump: walk x to MAX_X then once more
    m.position = [C.Robobo.MAX_X, 0]
    assert m.apply_move(3) is True  # bumped, position unchanged
    assert m.position == [C.Robobo.MAX_X, 0]
    # BACKWARD at MIN_Y bumps
    m.position = [0, C.Robobo.MIN_Y]
    assert m.apply_move(1) is True


def _target_image(size=64, blob=12):
    """RGB image with a saturated *red* blob. find_target reproduces the
    reference's BGR2HSV-on-RGB calibration quirk, under which pure red
    lands in the calibrated H in [120,135] window (a swapped-channel red
    is blue, whose true hue is 240 deg = OpenCV H 120)."""
    img = np.zeros((size, size, 3), np.uint8)
    img[..., :] = (40, 40, 40)
    img[10:10 + blob, 20:20 + blob] = (255, 0, 60)  # saturated red
    return img


@pytest.mark.fast
def test_find_target_centroid_and_area():
    from srl_tpu.real_robots.ros_servers import find_target

    cx, cy, area, error = find_target(_target_image())
    assert not error
    assert abs(cx - 25) <= 3 and abs(cy - 15) <= 3
    assert area > 0
    # No target -> error flag
    _, _, area0, error0 = find_target(np.zeros((64, 64, 3), np.uint8))
    assert error0 and area0 == 0.0


@pytest.mark.fast
def test_robobo_server_loopback():
    """Full episode against the RoboboServer over a real socket: the reward
    flips to +1 when the target area shrinks below the calibrated initial
    area by MIN_DELTA_AREA, and to -1 on a grid bump."""
    from srl_tpu.real_robots import constants as C
    from srl_tpu.real_robots.remote_env import RoboboEnv
    from srl_tpu.real_robots.ros_servers import RoboboServer, find_target

    full = _target_image(size=224, blob=80)
    img_holder = {"img": full}
    _, _, full_area, _ = find_target(full)
    # Calibrate the constant against the synthetic blob for this test.
    old_area = C.Robobo.TARGET_INITIAL_AREA
    C.Robobo.TARGET_INITIAL_AREA = full_area
    try:
        port = _free_port()
        server = RoboboServer(
            port, rig=_FakeRoboboRig(), get_image=lambda: img_holder["img"]
        )
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()

        env = RoboboEnv(port=port - 0, srl_model="raw_pixels")
        obs = env.reset()
        assert obs.shape == (224, 224, 3)
        # Target fully visible -> no reward
        obs, reward, done, _ = env.step(0)
        assert reward == 0
        np.testing.assert_array_equal(env.getGroundTruth(), [0, 1])
        # Cover most of the target -> area shrinks -> reward 1
        img_holder["img"] = _target_image(size=224, blob=20)
        obs, reward, done, _ = env.step(0)
        assert reward == 1
        # Drive into the wall -> reward -1
        server.motion.position = [0, C.Robobo.MAX_Y]
        obs, reward, done, _ = env.step(0)
        assert reward == -1
        env.close()
        thread.join(timeout=5)
        assert not thread.is_alive()
    finally:
        C.Robobo.TARGET_INITIAL_AREA = old_area


class _FakeBaxterRig:
    """IK succeeds only inside a workspace sphere; tracks the button."""

    def __init__(self, cfg, button_pressed=False):
        self.cfg = cfg
        self._ee = np.array(cfg.LEFT_ARM_INIT_POS, np.float64)
        self._pressed = button_pressed
        self.enabled = False

    def ee_position(self):
        return self._ee.copy()

    def ik_move(self, position):
        if np.linalg.norm(position) > 2.0:  # out of reach -> IK failure
            return False
        self._ee = np.asarray(position, np.float64)
        return True

    def init_pose(self):
        self._ee = np.array(self.cfg.LEFT_ARM_INIT_POS, np.float64)

    def enable(self):
        self.enabled = True

    def button_pressed(self):
        return self._pressed

    def button_position(self):
        return np.array([0.6, 0.3, -0.14])

    def base_pose(self):
        # Base slightly below the world origin (translation-only, so the
        # client's MAX_DISTANCE check stays within range).
        return np.array([0.0, 0.0, -0.1]), np.array([0.0, 0.0, 0.0, 1.0])

    def image(self):
        return np.zeros((224, 224, 3), np.uint8)


@pytest.mark.fast
def test_gazebo_vs_real_baxter_servers():
    """The two Baxter servers share the IK-step protocol but differ exactly
    where the reference's do: Gazebo reward = simulated button state with a
    base-relative button position; real reward = distance threshold against
    the calibrated BUTTON_POS, and reset enables the robot."""
    from srl_tpu.real_robots import constants as C
    from srl_tpu.real_robots.remote_env import BaxterEnv
    from srl_tpu.real_robots.ros_servers import (
        GazeboBaxterServer, RealBaxterServer, change_coordinate_system,
    )

    # Frame-change math: a 90-deg rotation about z maps +x to +y.
    s = np.sin(np.pi / 4)
    rel = change_coordinate_system(
        [1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, s, np.cos(np.pi / 4)]
    )
    np.testing.assert_allclose(rel, [0.0, -1.0, 0.0], atol=1e-12)

    # --- Gazebo ---
    port = _free_port()
    rig = _FakeBaxterRig(C.BaxterGazebo, button_pressed=True)
    server = GazeboBaxterServer(port, rig=rig)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    env = BaxterEnv(port=port, srl_model="raw_pixels", real=False)
    env.reset()
    obs, reward, done, _ = env.step(0)
    assert reward >= 1  # pressed button reported through the protocol
    # Button position arrives in the base frame, not world frame
    expected = change_coordinate_system(
        rig.button_position(), *rig.base_pose()
    )
    np.testing.assert_allclose(env.getTargetPos(), expected, atol=1e-6)
    env.close()
    thread.join(timeout=5)

    # --- Real ---
    port = _free_port()
    rig = _FakeBaxterRig(C.RealBaxter)
    server = RealBaxterServer(port, rig=rig)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    env = BaxterEnv(port=port, srl_model="raw_pixels", real=True)
    env.reset()
    assert rig.enabled  # real reset enables the robot first
    # Init pos is ~0.196 m from BUTTON_POS: no reward yet
    obs, reward, done, _ = env.step(0)
    # Teleport the rig next to the button: distance reward fires
    rig._ee = np.array(C.RealBaxter.BUTTON_POS) + 0.01
    obs, reward, done, _ = env.step(0)
    assert reward >= 1
    env.close()
    thread.join(timeout=5)


@pytest.mark.fast
def test_baxter_ik_failure_keeps_position():
    """An unreachable IK target leaves the end-effector where it was
    (gazebo_server.py:127-137 'returning previous one')."""
    from srl_tpu.real_robots import constants as C
    from srl_tpu.real_robots.ros_servers import GazeboBaxterServer

    class _Srv(GazeboBaxterServer):
        def __init__(self, rig):  # skip the socket
            self.rig = rig
            self.cfg = C.BaxterGazebo

    rig = _FakeBaxterRig(C.BaxterGazebo)
    srv = _Srv(rig)
    before = rig.ee_position()
    state, _ = srv.handle({"command": "action", "action": [100.0, 0, 0]})
    np.testing.assert_array_equal(rig.ee_position(), before)
    np.testing.assert_allclose(state["position"], before)
