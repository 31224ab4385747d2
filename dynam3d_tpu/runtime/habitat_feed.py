"""Habitat-sim adapter for the Feed protocol.

Implements the host-simulator side of the reference's RLEnv RPC surface
(vlnce_baselines/common/environments.py:46-243) directly against
``habitat_sim.Simulator`` — the layer the reference's habitat-lab wrappers
ultimately drive:

  - ``step((angle, dist))``  — the MoveHighToLow semantics
    (habitat_extensions/nav.py:28-95): set the absolute heading to
    ``heading + angle``, then MOVE_FORWARD in 0.25 m increments with
    sliding collision, accumulating positions/collisions per step;
  - ``cand_dist_to_goal`` / ``get_cand_real_pos`` (environments.py:120-147,
    :180-202) — simulate the candidate move with ``step_without_obs``-style
    physics-only forward steps from a saved agent state, return the
    geodesic distance / resulting position, restore the state;
  - ``get_observation`` (environments.py:88-96 ``get_observation_at``) —
    render at an arbitrary pose without moving the agent (novel-view
    sampling for 3DFF pretraining);
  - ``oracle_distance`` — pathfinder geodesic to the episode goal
    (environments.py:166-171).

habitat-sim is NOT installed in the TPU image (it is host-side C++;
SURVEY.md §7.1 keeps simulators out of the device path), so the import is
gated: constructing :class:`HabitatFeed` without habitat_sim raises an
actionable error, and everything else in dynam3d_tpu is unaffected.  On a
host that has habitat-sim + the MP3D/HM3D scene assets, this feed slots
into EpisodeRunner / VLNTrainer / VectorFeedPool unchanged.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

from dynam3d_tpu.runtime.feed import Observation, STOP

try:  # host-side optional dependency
    import habitat_sim
except ImportError:  # pragma: no cover - exercised on habitat hosts only
    habitat_sim = None


def heading_to_quat(heading: float) -> np.ndarray:
    """Habitat rotation quaternion (x,y,z,w) for a ground-plane heading
    (radians counter-clockwise; 0 faces -z), matching
    environments.py:18-24 ``quat_from_heading``."""
    half = heading / 2.0
    return np.asarray([0.0, math.sin(half), 0.0, math.cos(half)], np.float64)


def quat_to_heading(rotation) -> float:
    """Inverse of :func:`heading_to_quat` for a y-axis rotation (the
    ``arctan2(imag[1], real) * 2`` convention of environments.py:132)."""
    y, w = float(rotation[1]), float(rotation[3])
    return (2.0 * math.atan2(y, w)) % (2.0 * math.pi)


class HabitatFeed:
    """One R2R-CE episode on a real habitat-sim scene.

    Args:
      scene_id: path to the scene asset (``.glb`` / ``.basis.glb``).
      episode: dict with ``start_position [3]``, ``start_rotation`` quat
        (x,y,z,w) or ``heading`` float, ``goals`` ([{"position": [3]}]),
        ``instruction`` ({"instruction_text": str} or str) — the CE episode
        schema written by tools/discrete_to_ce.py.
      rgb_size/depth_size/views/hfov_deg: sensor layout (VLN default: one
        336^2 RGB + 256^2 depth forward view; 12 views for the waypoint
        panorama).
      forward_amount/max_depth: MOVE_FORWARD actuation (0.25 m) and the
        depth normalization far plane (10 m), iter_train.yaml values.
    """

    def __init__(
        self,
        scene_id: str,
        episode: Dict,
        rgb_size: int = 336,
        depth_size: int = 256,
        views: int = 1,
        hfov_deg: float = 90.0,
        forward_amount: float = 0.25,
        max_depth: float = 10.0,
        agent_height: float = 1.25,
        agent_radius: float = 0.18,
    ):
        if habitat_sim is None:
            raise ImportError(
                "HabitatFeed needs habitat-sim (host-side; `pip install "
                "habitat-sim` on a simulator host) — inside the TPU image "
                "use SyntheticRoomFeed / FloorplanFeed / RecordedEpisodeFeed"
            )
        self.views = views
        self.max_depth = max_depth
        self.forward = forward_amount
        self.episode = episode
        goal = episode["goals"][0]["position"]
        self.goal = np.asarray(goal, np.float32)
        instr = episode.get("instruction", "")
        self.instruction = (
            instr["instruction_text"] if isinstance(instr, dict) else str(instr)
        )

        sim_cfg = habitat_sim.SimulatorConfiguration()
        sim_cfg.scene_id = scene_id
        sim_cfg.allow_sliding = True  # habitat VLN-CE default

        rgb_spec = habitat_sim.CameraSensorSpec()
        rgb_spec.uuid = "rgb"
        rgb_spec.sensor_type = habitat_sim.SensorType.COLOR
        rgb_spec.resolution = [rgb_size, rgb_size]
        rgb_spec.hfov = hfov_deg
        rgb_spec.position = [0.0, agent_height, 0.0]

        depth_spec = habitat_sim.CameraSensorSpec()
        depth_spec.uuid = "depth"
        depth_spec.sensor_type = habitat_sim.SensorType.DEPTH
        depth_spec.resolution = [depth_size, depth_size]
        depth_spec.hfov = hfov_deg
        depth_spec.position = [0.0, agent_height, 0.0]

        agent_cfg = habitat_sim.agent.AgentConfiguration()
        agent_cfg.sensor_specifications = [rgb_spec, depth_spec]
        agent_cfg.radius = agent_radius
        agent_cfg.action_space = {
            "move_forward": habitat_sim.agent.ActionSpec(
                "move_forward",
                habitat_sim.agent.ActuationSpec(amount=forward_amount),
            ),
        }
        self._sim = habitat_sim.Simulator(
            habitat_sim.Configuration(sim_cfg, [agent_cfg])
        )
        self._agent = self._sim.initialize_agent(0)

        self.positions: List[np.ndarray] = []
        self.headings: List[float] = []
        self.collisions = 0

    # --- state helpers ----------------------------------------------------
    def _get_state(self):
        return self._agent.get_state()

    def _set_pose(self, position, heading: float) -> None:
        st = habitat_sim.AgentState()
        st.position = np.asarray(position, np.float32)
        st.rotation = heading_to_quat(heading)
        self._agent.set_state(st, reset_sensors=False)

    @property
    def _heading(self) -> float:
        st = self._get_state()
        rot = st.rotation
        quat = np.asarray([rot.x, rot.y, rot.z, rot.w]) if hasattr(
            rot, "w"
        ) else np.asarray(rot)
        return quat_to_heading(quat)

    def _render(self) -> Observation:
        st = self._get_state()
        heading = self._heading
        rgbs, depths = [], []
        for v in range(self.views):
            if v:
                # pano convention: view v at heading + v*(-pi/6)
                # (observations_by_angles, environments.py:98-113)
                self._set_pose(st.position, heading + v * (-math.pi / 6.0))
            obs = self._sim.get_sensor_observations()
            rgbs.append(np.asarray(obs["rgb"])[..., :3])
            d = np.asarray(obs["depth"], np.float32)
            depths.append(np.clip(d / self.max_depth, 0.0, 1.0))
        if self.views > 1:
            self._agent.set_state(st, reset_sensors=False)
        return Observation(
            rgb=np.stack(rgbs).astype(np.uint8),
            depth=np.stack(depths),
            position=np.asarray(st.position, np.float32),
            heading=heading,
            instruction=self.instruction,
        )

    # --- Feed protocol ----------------------------------------------------
    def reset(self) -> Observation:
        ep = self.episode
        if "start_rotation" in ep:
            x, y, z, w = ep["start_rotation"]
            heading = (2.0 * math.atan2(y, w)) % (2.0 * math.pi)
        else:
            heading = float(ep.get("heading", 0.0))
        self._set_pose(ep["start_position"], heading)
        self.positions = [np.asarray(ep["start_position"], np.float32)]
        self.headings = [heading]
        self.collisions = 0
        return self._render()

    def _forward_ksteps(self, distance: float) -> bool:
        """MOVE_FORWARD ``int(distance // amount)`` times
        (environments.py:136-138); returns whether any step collided."""
        ksteps = int(distance // self.forward)
        hit = False
        for _ in range(ksteps):
            before = np.asarray(self._get_state().position)
            self._sim.step({0: "move_forward"})
            after = np.asarray(self._get_state().position)
            moved = float(np.linalg.norm(after - before))
            hit = hit or moved < self.forward * 0.5
        return hit

    def step(self, action):
        if action == STOP:
            return self._render(), True, self._info()
        angle, distance = action
        heading = (self._heading + angle) % (2.0 * math.pi)
        self._set_pose(self._get_state().position, heading)
        hit = self._forward_ksteps(distance)
        self.collisions += int(hit)
        st = self._get_state()
        self.positions.append(np.asarray(st.position, np.float32))
        self.headings.append(heading)
        return self._render(), False, self._info()

    def oracle_distance(self, position: Optional[np.ndarray] = None) -> float:
        p = (
            np.asarray(self._get_state().position)
            if position is None
            else np.asarray(position)
        )
        path = habitat_sim.ShortestPath()
        path.requested_start = p.astype(np.float32)
        path.requested_end = self.goal
        found = self._sim.pathfinder.find_path(path)
        return float(path.geodesic_distance) if found else 1e6

    def get_cand_real_pos(self, angle: float, forward: float) -> np.ndarray:
        saved = self._get_state()
        heading = (self._heading + angle) % (2.0 * math.pi)
        self._set_pose(saved.position, heading)
        self._forward_ksteps(forward)
        pos = np.asarray(self._get_state().position, np.float32)
        self._agent.set_state(saved, reset_sensors=False)
        return pos

    def cand_dist_to_goal(self, angle: float, forward: float) -> float:
        return self.oracle_distance(self.get_cand_real_pos(angle, forward))

    def get_observation(self, source_position, heading: float) -> Observation:
        saved = self._get_state()
        self._set_pose(np.asarray(source_position, np.float32), float(heading))
        obs = self._render()
        self._agent.set_state(saved, reset_sensors=False)
        return obs

    def _info(self) -> Dict:
        return {
            "position": [p.tolist() for p in self.positions],
            "heading": list(self.headings),
            "collisions": self.collisions,
            "distance_to_goal": self.oracle_distance(),
        }

    def close(self) -> None:
        self._sim.close()


def feeds_from_episode_file(
    path: str, scene_root: str, **feed_kwargs
) -> List[HabitatFeed]:
    """Build one HabitatFeed per episode of a CE episodes json[.gz] (the
    files tools/discrete_to_ce.py writes / runtime.datasets loads)."""
    from dynam3d_tpu.runtime.datasets import load_episodes

    out = []
    for ep in load_episodes(path):
        out.append(
            HabitatFeed(
                scene_id=f"{scene_root}/{ep.scene_id}",
                episode={
                    "start_position": ep.start_position,
                    "start_rotation": ep.start_rotation,
                    "goals": ep.goals,
                    "instruction": ep.instruction_text,
                },
                **feed_kwargs,
            )
        )
    return out
