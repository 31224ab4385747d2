"""Action-text codecs: gt-text generation and text->(angle, distance) parsing.

Host-side ports of Policy_Dynam3D_VLN.get_gt_text (":294-326") and
convert_text_to_action (":472-506").  Quantization: 15 deg / 0.25 m per step,
max 4 turn steps per action (SURVEY.md §2.4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union

from dynam3d_tpu.config import ActionConfig

STOP = -100  # sentinel, as in the reference


@dataclass
class EpisodeActionState:
    """Per-episode carry the reference keeps on Feature_Fields
    (``keep_target_waypoint``, ``history_actions``, feature_fields.py:182-183)."""

    keep_target_waypoint: Optional[Tuple[float, float]] = None
    history_actions: List[str] = field(default_factory=lambda: ["none\n"] * 4)

    def push_history(self, action_text: str) -> None:
        self.history_actions.pop(0)
        self.history_actions.append(action_text)


def gt_text(
    state: EpisodeActionState,
    target_angle: float,
    target_distance: float,
    stop_action: bool,
    cfg: ActionConfig = ActionConfig(),
) -> str:
    """Teacher action -> text label; splits >60-degree turns across steps.

    Port of get_gt_text (Policy_Dynam3D_VLN.py:294-326), incl. the
    ``keep_target_waypoint`` carry for split turns and the "error." label on
    3-fold repeated turn prefixes (data-quality abort, ":323-324").
    """
    aps = cfg.angle_per_step_deg
    dps = cfg.distance_per_step
    mts = cfg.max_turn_steps
    if stop_action:
        text = "stop.<|end|>"
    else:
        turn_angle = round(math.degrees(target_angle))
        move = target_distance
        turn_steps = round(turn_angle / aps)
        if mts <= turn_steps < 360 // aps:
            if turn_steps < 180 // aps:
                text = (
                    f"turn left {round(turn_angle / aps)} steps,"
                    f" move {round(move / dps)} steps.<|end|>"
                )
                state.keep_target_waypoint = (
                    (math.radians(turn_angle - mts * aps) + 2 * math.pi) % (2 * math.pi),
                    move,
                )
            else:
                text = (
                    f"turn right {round((360 - turn_angle) / aps)} steps,"
                    f" move {round(move / dps)} steps.<|end|>"
                )
                state.keep_target_waypoint = (
                    (math.radians(turn_angle + mts * aps) + 2 * math.pi) % (2 * math.pi),
                    move,
                )
        else:
            if turn_steps < mts:
                text = (
                    f"turn left {round(turn_angle / aps)} steps,"
                    f" move {round(move / dps)} steps.<|end|>"
                )
            else:
                text = (
                    f"turn right {round((360 - turn_angle) / aps)} steps,"
                    f" move {round(move / dps)} steps.<|end|>"
                )
            state.keep_target_waypoint = None

    # loop-detection: same turn prefix at history slots -2, -3, -4
    n = len("turn left 4 steps")
    h = state.history_actions
    if (
        h[-2][:n] == text[:n]
        and h[-4][:n] == text[:n]
        and h[-3][:n] == text[:n]
    ):
        text = "error.<|end|>"
    return text


def parse_action(
    text: str, cfg: ActionConfig = ActionConfig()
) -> Union[int, Tuple[float, float]]:
    """Generated text -> (angle_rad, distance_m) or STOP.

    Port of convert_text_to_action (Policy_Dynam3D_VLN.py:472-506): clamps to
    4 turn steps, returns STOP for stop/error/malformed text; the
    move-distance is only parsed when the turn-step count < max_turn_steps
    (reference ":498").
    """
    aps = cfg.angle_per_step_deg
    dps = cfg.distance_per_step
    mts = cfg.max_turn_steps
    angle = distance = 0.0
    if "stop" in text or "error" in text:
        return STOP
    start = end = -1
    steps = None
    if "left" in text:
        start = text.find("left") + len("left")
        end = text.find("steps,")
        if end == -1:
            return STOP
        steps = int(text[start:end])
        angle = math.radians(min(mts, steps) * aps)
    elif "right" in text:
        start = text.find("right") + len("right")
        end = text.find("steps,")
        if end == -1:
            return STOP
        steps = int(text[start:end])
        angle = 2.0 * math.pi - math.radians(min(mts, steps) * aps)

    if "move" in text and steps is not None and steps < mts:
        mstart = text.find("move") + len("move")
        mend = text.find("steps.")
        if mend != -1:
            distance = int(text[mstart:mend]) * dps
    return (angle, distance)


def teacher_targets(
    state: EpisodeActionState,
    cand_angles: Sequence[float],
    cand_distances: Sequence[float],
    oracle_idx: int,
) -> Tuple[float, float, bool]:
    """Resolve the teacher waypoint, honoring a held-over split turn.

    Mirrors ss_trainer_Dynam3D.py:653-667: oracle_idx == -100 means stop; a
    pending ``keep_target_waypoint`` overrides the oracle candidate.
    """
    if oracle_idx == STOP:
        return 0.0, 0.0, True
    if state.keep_target_waypoint is not None:
        a, d = state.keep_target_waypoint
        return a, d, False
    return cand_angles[oracle_idx], cand_distances[oracle_idx], False
