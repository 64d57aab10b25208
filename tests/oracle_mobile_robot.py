"""Numpy oracle replicating the reference MobileRobot dynamics exactly.

A direct float32 transliteration of the step logic in
/root/reference/environments/mobile_robot/mobile_robot_env.py:235-267,345-363
and the 1D/2-target/line-target variant overrides, used as the golden model
for bit-exact trajectory tests of the JAX kernels.
"""
import numpy as np

DELTA_POS = np.float32(0.1)
MAX_X = np.float32(4.0)
MAX_Y = np.float32(4.0)
ROBOT_WIDTH = np.float32(0.2)
ROBOT_LENGTH = np.float32(0.325 * 2)
COLLISION_MARGIN = np.float32(0.1)
REWARD_DIST_THRESHOLD = np.float32(0.4)
REWARD_DIST_THRESHOLD_LINE = np.float32(0.1)
ROBOT_OFFSET = np.float32(0.2)


class OracleMobileRobot:
    def __init__(self, dim=2, n_targets=1, line_target=False, is_discrete=True,
                 shape_reward=False, max_steps=250):
        self.dim = dim
        self.n_targets = n_targets
        self.line_target = line_target
        self.is_discrete = is_discrete
        self.shape_reward = shape_reward
        self.max_steps = max_steps
        self.reward_threshold = (
            REWARD_DIST_THRESHOLD_LINE if line_target else REWARD_DIST_THRESHOLD
        )

    def set_state(self, robot_pos, targets):
        self.robot_pos = np.asarray(robot_pos, np.float32).copy()
        self.targets = np.asarray(targets, np.float32).copy()
        self.current_target = 0
        self.step_count = 0

    def target_xy(self):
        return self.targets[self.current_target]

    def step(self, action):
        dv = DELTA_POS
        if self.is_discrete:
            if self.dim == 1:
                dx = np.float32([-dv, dv][action])
                delta = np.array([dx, 0], np.float32)
            else:
                dx = np.float32([-dv, dv, 0, 0][action])
                dy = np.float32([0, 0, -dv, dv][action])
                delta = np.array([dx, dy], np.float32)
        else:
            act = np.minimum(np.maximum(np.asarray(action, np.float32), -1), 1)
            delta = act * dv

        prev = self.robot_pos.copy()
        new = (prev + delta).astype(np.float32)
        has_bumped = False
        limits = [MAX_X, MAX_Y]
        dims = [ROBOT_LENGTH, ROBOT_WIDTH]
        for i in range(self.dim):
            margin = np.float32(COLLISION_MARGIN + dims[i] / 2)
            if new[i] < margin or new[i] > limits[i] - margin:
                has_bumped = True
                new = prev
                break
        self.robot_pos = new
        self.step_count += 1

        target = self.target_xy()
        if self.line_target:
            distance = np.abs(np.float32(target[0] - ROBOT_OFFSET) - self.robot_pos[0])
        elif self.dim == 1:
            distance = np.abs(target[0] - self.robot_pos[0])
        else:
            distance = np.linalg.norm(target - self.robot_pos).astype(np.float32)
        reward = np.float32(0.0)
        if distance <= self.reward_threshold:
            reward = np.float32(1.0)
            if self.n_targets > 1 and self.current_target < self.n_targets - 1:
                self.current_target += 1
        if has_bumped:
            reward = np.float32(-1.0)
        if self.shape_reward:
            reward = np.float32(-distance)
        done = self.step_count > self.max_steps
        return self.robot_pos.copy(), reward, done
