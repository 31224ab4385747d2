"""Scripted stand-in for the ``habitat_sim`` package (CPU, no assets).

Covers exactly the API surface ``dynam3d_tpu.runtime.habitat_feed`` drives
(the reference drives the same one through habitat-lab:
environments.py:46-243, nav.py:28-95), with habitat's conventions encoded
so the adapter's pose math is really exercised:

  - y-up, heading 0 faces -z, positive heading counter-clockwise;
    ``move_forward`` translates by ``amount * (-sin h, 0, -cos h)``;
  - rotations returned by ``get_state()`` are quaternion OBJECTS with
    ``.x/.y/.z/.w`` (as habitat's magnum bindings return), while
    ``set_state`` accepts the plain (x, y, z, w) arrays the adapter builds;
  - sliding collision: the world is an axis-aligned room with an interior
    wall segment; a blocked move clamps each axis independently (habitat's
    ``allow_sliding``), so grazing hits still make progress and
    perpendicular hits stop dead;
  - the pathfinder returns straight-line geodesics (exact in a convex
    room) and the renderer is a deterministic function of the pose, so
    pose-override rendering can be checked by equality.

Tests monkeypatch ``habitat_feed.habitat_sim`` with this module.
"""

from __future__ import annotations

import math
from types import SimpleNamespace

import numpy as np

# room interior: x in [0, ROOM], z in [-ROOM, 0] (in front of origin, -z
# facing), plus one interior wall strip blocking x in [WALL_X0, WALL_X1]
# at z <= WALL_Z (so walking -z down the middle hits it)
ROOM = 8.0
WALL_X0, WALL_X1, WALL_Z = 3.0, 5.0, -4.0


class SensorType:
    COLOR = "color"
    DEPTH = "depth"


class CameraSensorSpec:
    def __init__(self):
        self.uuid = ""
        self.sensor_type = None
        self.resolution = [0, 0]
        self.hfov = 90.0
        self.position = [0.0, 0.0, 0.0]


class SimulatorConfiguration:
    def __init__(self):
        self.scene_id = ""
        self.allow_sliding = True


class Configuration:
    def __init__(self, sim_cfg, agent_cfgs):
        self.sim_cfg = sim_cfg
        self.agents = agent_cfgs


class _Quat:
    """Quaternion object with .x/.y/.z/.w, like habitat's magnum binding."""

    def __init__(self, x, y, z, w):
        self.x, self.y, self.z, self.w = float(x), float(y), float(z), float(w)


class AgentState:
    def __init__(self):
        self.position = np.zeros(3, np.float32)
        self.rotation = _Quat(0.0, 0.0, 0.0, 1.0)


agent = SimpleNamespace(
    AgentConfiguration=lambda: SimpleNamespace(
        sensor_specifications=[], radius=0.1, action_space={}
    ),
    ActionSpec=lambda name, actuation: SimpleNamespace(
        name=name, actuation=actuation
    ),
    ActuationSpec=lambda amount: SimpleNamespace(amount=amount),
)


class ShortestPath:
    def __init__(self):
        self.requested_start = None
        self.requested_end = None
        self.geodesic_distance = math.inf


def _heading_of(rot) -> float:
    if hasattr(rot, "w"):
        return (2.0 * math.atan2(rot.y, rot.w)) % (2.0 * math.pi)
    r = np.asarray(rot, np.float64)
    return (2.0 * math.atan2(r[1], r[3])) % (2.0 * math.pi)


def _inside(p) -> bool:
    x, z = float(p[0]), float(p[2])
    if not (0.0 <= x <= ROOM and -ROOM <= z <= 0.0):
        return False
    if WALL_X0 <= x <= WALL_X1 and z <= WALL_Z:
        return False
    return True


class _Agent:
    def __init__(self, sim):
        self._sim = sim
        self._state = AgentState()

    def get_state(self):
        # habitat returns a fresh state snapshot each call
        st = AgentState()
        st.position = np.array(self._state.position, np.float32)
        r = self._state.rotation
        st.rotation = _Quat(r.x, r.y, r.z, r.w)
        return st

    def set_state(self, state, reset_sensors=True):
        st = AgentState()
        st.position = np.asarray(state.position, np.float32)
        rot = state.rotation
        if hasattr(rot, "w"):
            st.rotation = _Quat(rot.x, rot.y, rot.z, rot.w)
        else:  # plain (x, y, z, w) array, as the adapter builds
            r = np.asarray(rot, np.float64)
            st.rotation = _Quat(r[0], r[1], r[2], r[3])
        self._state = st


class Simulator:
    def __init__(self, configuration):
        self.config = configuration
        self._agents = [_Agent(self) for _ in configuration.agents]
        self._specs = {
            s.uuid: s for s in configuration.agents[0].sensor_specifications
        }
        self._amounts = {
            name: spec.actuation.amount
            for name, spec in configuration.agents[0].action_space.items()
        }
        self.pathfinder = _Pathfinder()
        self.closed = False

    def initialize_agent(self, idx):
        return self._agents[idx]

    def step(self, actions):
        for agent_idx, name in actions.items():
            ag = self._agents[agent_idx]
            amount = self._amounts[name]
            st = ag._state
            h = _heading_of(st.rotation)
            fwd = np.array([-math.sin(h), 0.0, -math.cos(h)], np.float64)
            target = np.asarray(st.position, np.float64) + amount * fwd
            # sliding: clamp each axis independently against the walls
            pos = np.asarray(st.position, np.float64)
            for axis in (0, 2):
                trial = pos.copy()
                trial[axis] = target[axis]
                if _inside(trial):
                    pos = trial
            st.position = pos.astype(np.float32)

    def get_sensor_observations(self):
        """Deterministic pose-function images (verifiable pose-override)."""
        st = self._agents[0]._state
        h = _heading_of(st.rotation)
        out = {}
        for uuid, spec in self._specs.items():
            hgt, wid = spec.resolution
            seed = np.float64(
                [st.position[0], st.position[1], st.position[2], h]
            )
            rng = np.random.default_rng(
                np.abs(seed * 1000).astype(np.int64).sum() % (2**31)
            )
            if spec.sensor_type == SensorType.COLOR:
                out[uuid] = rng.integers(
                    0, 255, (hgt, wid, 4), dtype=np.uint8
                )  # RGBA, as habitat renders
            else:
                out[uuid] = rng.uniform(0.0, 12.0, (hgt, wid)).astype(
                    np.float32
                )
        return out

    def close(self):
        self.closed = True


class _Pathfinder:
    def find_path(self, path) -> bool:
        a = np.asarray(path.requested_start, np.float64)
        b = np.asarray(path.requested_end, np.float64)
        if not (_inside(a) and _inside(b)):
            path.geodesic_distance = math.inf
            return False
        path.geodesic_distance = float(np.linalg.norm((a - b)[[0, 2]]))
        return True
