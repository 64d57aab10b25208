"""ROS-side robot servers (protocol parity with the reference's
real_robots/{omnirobot_server,gazebo_server,real_baxter_server,
real_robobo_server}.py).

Each server binds the ZMQ PAIR socket, subscribes to the robot's ROS topics,
and answers the {"command": "reset"/"action"/"exit"} protocol with a state
JSON + camera frame. They require a ROS environment (rospy) at *runtime*
only — importing this module stays ROS-free so the rest of the framework is
usable without a robot.

Run (on the robot workstation):
  python -m srl_tpu.real_robots.ros_servers --robot omnirobot [--port 7777]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from srl_tpu.real_robots import constants as C
from srl_tpu.real_robots.transport import connect_pair, sendMatrix
from srl_tpu.utils.logging import printGreen, printRed


def _require_ros():
    try:
        import rospy  # noqa: F401
        from cv_bridge import CvBridge  # noqa: F401

        return True
    except ImportError:
        printRed(
            "Error: rospy/cv_bridge not available — ROS servers must run in "
            "a ROS environment on the robot workstation."
        )
        return False


class RobotServerBase:
    """Shared ZMQ loop; subclasses implement reset_robot/apply_action/
    get_state/get_image."""

    def __init__(self, port: int):
        self.context, self.socket = connect_pair(port, server=True)
        printGreen(f"{type(self).__name__} listening on port {port}")

    def serve_forever(self):
        while True:
            msg = self.socket.recv_json()
            command = msg.get("command", "")
            if command == "reset":
                self.reset_robot()
            elif command == "action":
                self.apply_action(msg)
            elif command == "exit":
                printGreen("Received exit signal, quitting...")
                self.socket.close()
                return
            else:
                raise ValueError(f"Unknown command: {msg}")
            self.socket.send_json(self.get_state())
            sendMatrix(self.socket, self.get_image())

    # -- to implement --
    def reset_robot(self):
        raise NotImplementedError

    def apply_action(self, msg):
        raise NotImplementedError

    def get_state(self) -> dict:
        raise NotImplementedError

    def get_image(self) -> np.ndarray:
        raise NotImplementedError


class OmnirobotServer(RobotServerBase):
    """Real Omnirobot: position/velocity commands via ROS topics, fiducial
    marker pose feedback (real_robots/omnirobot_server.py). Uses the same
    boundary-checked step logic as the simulator kernel."""

    def __init__(self, port: int):
        super().__init__(port)
        import rospy
        from cv_bridge import CvBridge
        from geometry_msgs.msg import Twist, Vector3
        from sensor_msgs.msg import Image

        self.rospy = rospy
        self.bridge = CvBridge()
        rospy.init_node("srl_tpu_omnirobot_server", anonymous=True)
        self.cmd_pub = rospy.Publisher("/cmd_vel", Twist, queue_size=1)
        self.pos_cmd_pub = rospy.Publisher(
            "/position_commands", Vector3, queue_size=1
        )
        self.image = np.zeros((224, 224, 3), np.uint8)
        self.robot_pos = np.zeros(2)
        self.target_pos = np.zeros(2)
        self.reward = 0
        rospy.Subscriber(C.Omnirobot.IMAGE_TOPIC, Image, self._image_cb)

    def _image_cb(self, msg):
        self.image = self.bridge.imgmsg_to_cv2(msg, "rgb8")

    def reset_robot(self):
        rng = np.random.RandomState()
        self.robot_pos = rng.uniform(
            C.Omnirobot.INIT_MIN_X, C.Omnirobot.INIT_MAX_X, 2
        )
        self._publish_position(self.robot_pos)
        self.reward = 0

    def _publish_position(self, pos):
        from geometry_msgs.msg import Vector3

        self.pos_cmd_pub.publish(Vector3(pos[0], pos[1], 0))
        time.sleep(1.0 / C.Omnirobot.RL_CONTROL_FREQ)

    def apply_action(self, msg):
        cfg = C.Omnirobot
        if msg.get("is_discrete", True):
            deltas = {0: (cfg.STEP_DISTANCE, 0), 1: (-cfg.STEP_DISTANCE, 0),
                      2: (0, cfg.STEP_DISTANCE), 3: (0, -cfg.STEP_DISTANCE),
                      4: (0, 0)}
            d = np.array(deltas[int(msg["action"])])
        else:
            d = np.asarray(msg["action"])
        new = self.robot_pos + d
        bumped = not (
            cfg.MIN_X < new[0] < cfg.MAX_X and cfg.MIN_Y < new[1] < cfg.MAX_Y
        )
        if not bumped:
            self.robot_pos = new
            self._publish_position(new)
        dist = np.linalg.norm(self.robot_pos - self.target_pos)
        if dist < cfg.DIST_TO_TARGET_THRESHOLD:
            self.reward = cfg.REWARD_TARGET_REACH
        elif bumped:
            self.reward = cfg.REWARD_BUMP_WALL
        else:
            self.reward = cfg.REWARD_NOTHING

    def get_state(self):
        return {"reward": int(self.reward),
                "position": self.robot_pos.tolist(),
                "target_pos": self.target_pos.tolist()}

    def get_image(self):
        return self.image


class BaxterServer(RobotServerBase):
    """Baxter via Gazebo or the real robot (gazebo_server.py /
    real_baxter_server.py): applies (dx, dy, dz) through the Baxter IK
    service and replies end-effector + button state."""

    def __init__(self, port: int, real: bool = False):
        super().__init__(port)
        import rospy
        from cv_bridge import CvBridge
        from sensor_msgs.msg import Image

        cfg = C.RealBaxter if real else C.BaxterGazebo
        self.cfg = cfg
        self.rospy = rospy
        self.bridge = CvBridge()
        rospy.init_node("srl_tpu_baxter_server", anonymous=True)
        import baxter_interface

        self.arm = baxter_interface.Limb("left")
        self.arm_pos = np.array(cfg.LEFT_ARM_INIT_POS)
        self.button_pos = np.array(
            getattr(cfg, "BUTTON_POS", [0.7, 0.1, cfg.Z_TABLE])
        )
        self.image = np.zeros((224, 224, 3), np.uint8)
        rospy.Subscriber(cfg.IMAGE_TOPIC, Image, self._image_cb)

    def _image_cb(self, msg):
        self.image = self.bridge.imgmsg_to_cv2(msg, "rgb8")

    def _move_to(self, pos):
        import baxter_interface  # noqa: F401
        from baxter_pykdl import baxter_kinematics

        kin = baxter_kinematics("left")
        joints = kin.inverse_kinematics(pos.tolist())
        if joints is not None:
            names = self.arm.joint_names()
            self.arm.move_to_joint_positions(dict(zip(names, joints)))
            self.arm_pos = pos

    def reset_robot(self):
        self._move_to(np.array(self.cfg.LEFT_ARM_INIT_POS))

    def apply_action(self, msg):
        delta = np.asarray(msg["action"])
        self._move_to(self.arm_pos + delta)

    def get_state(self):
        dist = np.linalg.norm(self.button_pos - self.arm_pos)
        reward = int(dist < getattr(self.cfg, "DIST_TO_TARGET_THRESHOLD", 0.05))
        return {"reward": reward, "position": self.arm_pos.tolist(),
                "button_pos": self.button_pos.tolist()}

    def get_image(self):
        return self.image


class RoboboServer(RobotServerBase):
    """Robobo: time-based open-loop motion + HSV-area target detection for
    the reward (real_robobo_server.py)."""

    def __init__(self, port: int):
        super().__init__(port)
        import rospy
        from cv_bridge import CvBridge
        from sensor_msgs.msg import Image
        from std_msgs.msg import Int8

        self.rospy = rospy
        self.bridge = CvBridge()
        rospy.init_node("srl_tpu_robobo_server", anonymous=True)
        self.move_pub = rospy.Publisher("/robobo/move", Int8, queue_size=1)
        self.image = np.zeros((224, 224, 3), np.uint8)
        self.position = np.zeros(2)
        rospy.Subscriber(C.Robobo.IMAGE_TOPIC, Image, self._image_cb)

    def _image_cb(self, msg):
        self.image = self.bridge.imgmsg_to_cv2(msg, "rgb8")

    def reset_robot(self):
        self.position = np.zeros(2)

    def apply_action(self, msg):
        from std_msgs.msg import Int8

        self.move_pub.publish(Int8(int(msg["action"])))
        time.sleep(1.0)  # open-loop motion settle

    def _target_reward(self) -> int:
        """HSV-area detection of the (red) target in view."""
        import cv2

        hsv = cv2.cvtColor(self.image, cv2.COLOR_RGB2HSV)
        mask = cv2.inRange(hsv, (0, 120, 70), (10, 255, 255))
        area = mask.sum() / 255.0
        return int(area > 0.05 * mask.size)

    def get_state(self):
        return {"reward": self._target_reward(),
                "position": self.position.tolist()}

    def get_image(self):
        return self.image


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--robot", type=str, required=True,
                        choices=["omnirobot", "baxter", "real_baxter", "robobo"])
    parser.add_argument("--port", type=int, default=C.SERVER_PORT)
    args = parser.parse_args(argv)
    if not _require_ros():
        raise SystemExit(1)
    if args.robot == "omnirobot":
        server = OmnirobotServer(args.port)
    elif args.robot in ("baxter", "real_baxter"):
        server = BaxterServer(args.port, real=args.robot == "real_baxter")
    else:
        server = RoboboServer(args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
