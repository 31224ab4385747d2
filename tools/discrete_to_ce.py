"""Offline converter: discrete (MatterSim-graph) VLN datasets -> continuous
Habitat-style episodes.

Port of the ``discrete_to_CE`` package (discrete_to_CE_navrag_train.py and
siblings, ~2081 LoC across REVERIE/NavRAG/ScaleVLN variants): each discrete
item carries a viewpoint path on a scene's connectivity graph; the converter
resolves viewpoint ids to metric positions, applies the MatterSim->Habitat
coordinate swap ``(x, y, z) -> (x, z, -y)`` (":294-296"), builds the start
rotation from heading/elevation, filters by geodesic distance and
instruction quality (":320-330"), and writes Habitat-CE ``episodes`` json +
``{split}_gt`` locations/actions records (":331-355").

Geometry providers are pluggable (the reference needs MatterSim C++ +
habitat-sim): a ``connectivity/*.json`` graph directory gives viewpoint
positions; geodesic distance defaults to graph shortest-path (exact on the
nav graph) with an optional simulator hook.  Batch-resumable via a cursor
file, mirroring the per-scene worker restart protocol
(discrete_to_CE/README.txt:1, ":380-440").
"""

from __future__ import annotations

import argparse
import gzip
import json
import math
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_connectivity(conn_dir: str, scan_id: str) -> Dict[str, np.ndarray]:
    """MatterSim connectivity graph: viewpoint id -> habitat position.

    Files: ``{scan}_connectivity.json`` with per-node 4x4 pose matrices
    (standard MatterSim layout: position at indices [3, 7, 11]).
    """
    path = os.path.join(conn_dir, f"{scan_id}_connectivity.json")
    with open(path) as f:
        nodes = json.load(f)
    out: Dict[str, np.ndarray] = {}
    for node in nodes:
        if not node.get("included", True):
            continue
        m = node["pose"]
        x, y, z = m[3], m[7], m[11]
        # MatterSim (x, y, z) -> habitat (x, z, -y)  (":294-296")
        out[node["image_id"]] = np.asarray([x, z, -y], np.float32)
    return out


def graph_edges(conn_dir: str, scan_id: str) -> Dict[str, List[str]]:
    path = os.path.join(conn_dir, f"{scan_id}_connectivity.json")
    with open(path) as f:
        nodes = json.load(f)
    ids = [n["image_id"] for n in nodes]
    out: Dict[str, List[str]] = {}
    for n in nodes:
        if not n.get("included", True):
            continue
        nbrs = [
            ids[j]
            for j, ok in enumerate(n.get("unobstructed", []))
            if ok and j < len(ids)
        ]
        out[n["image_id"]] = nbrs
    return out


def graph_geodesic(
    positions: Dict[str, np.ndarray],
    edges: Dict[str, List[str]],
    a: str,
    b: str,
) -> float:
    """Dijkstra over the nav graph (stand-in for habitat's navmesh geodesic)."""
    import heapq

    dist = {a: 0.0}
    heap = [(0.0, a)]
    while heap:
        d, u = heapq.heappop(heap)
        if u == b:
            return d
        if d > dist.get(u, math.inf):
            continue
        for v in edges.get(u, []):
            if v not in positions:
                continue
            nd = d + float(np.linalg.norm(positions[u] - positions[v]))
            if nd < dist.get(v, math.inf):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return math.inf


def heading_to_rotation(heading: float, elevation: float = 0.0) -> List[float]:
    """Habitat start rotation quaternion from MatterSim heading/elevation.

    ``R.from_rotvec([0, 2pi-h, 0]) * R.from_rotvec([e, 0, 0])`` (":298-303"),
    composed here without scipy.
    """
    hy = (2.0 * math.pi - heading) / 2.0
    ex = elevation / 2.0
    # quaternion (x,y,z,w) for rot-Y(2pi-h) then rot-X(e): q = qy * qx
    qy = (0.0, math.sin(hy), 0.0, math.cos(hy))
    qx = (math.sin(ex), 0.0, 0.0, math.cos(ex))

    def qmul(q1, q2):
        x1, y1, z1, w1 = q1
        x2, y2, z2, w2 = q2
        return [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]

    return qmul(qy, qx)


BANNED_WORDS = ("picture", "man", "person", "ceiling", "painting", "tight")


def convert_items(
    items: Sequence[Dict],
    conn_dir: str,
    scene_id_fmt: str = "hm3d/train/{scan}/{scan_tail}.basis.glb",
    max_instr_words: int = 25,
    max_geodesic: float = 15.0,
    geodesic_fn: Optional[Callable[[str, str, str], float]] = None,
    start_episode_id: int = 0,
) -> Tuple[List[Dict], Dict[str, Dict]]:
    """Convert discrete items -> (CE episodes, gt records).

    ``items``: dicts with ``scan``, ``path`` (viewpoint ids), ``heading``,
    ``instructions`` (+ optional ``instr_encodings``) — the NavRAG/REVERIE/
    ScaleVLN schema.  Filters mirror ":320-330"; gt records use the
    ``forward_steps = 6 * len(path)`` convention (":350-355").
    """
    episodes: List[Dict] = []
    gts: Dict[str, Dict] = {}
    episode_id = start_episode_id
    cache: Dict[str, Tuple[Dict, Dict]] = {}

    for item in items:
        scan = item["scan"]
        if scan not in cache:
            try:
                cache[scan] = (
                    load_connectivity(conn_dir, scan),
                    graph_edges(conn_dir, scan),
                )
            except FileNotFoundError:
                continue
        positions, edges = cache[scan]
        path_ids = item["path"]
        if any(v not in positions for v in path_ids):
            continue
        ref_path = [positions[v].tolist() for v in path_ids]

        if geodesic_fn is not None:
            geo = geodesic_fn(scan, path_ids[0], path_ids[-1])
        else:
            geo = graph_geodesic(positions, edges, path_ids[0], path_ids[-1])
        instr = item["instructions"][0]
        if (
            not math.isfinite(geo)
            or geo > max_geodesic
            or len(instr.split(" ")) > max_instr_words
            or any(w in instr for w in BANNED_WORDS)
        ):
            continue

        episode_id += 1
        scan_tail = scan[6:] if len(scan) > 6 else scan
        episodes.append(
            {
                "episode_id": episode_id,
                "trajectory_id": episode_id,
                "scene_id": scene_id_fmt.format(scan=scan, scan_tail=scan_tail),
                "start_position": ref_path[0],
                "start_rotation": heading_to_rotation(item.get("heading", 0.0)),
                "info": {"geodesic_distance": geo},
                "goals": [{"position": ref_path[-1], "radius": 3.0}],
                "instruction": {
                    "instruction_text": instr,
                    "instruction_tokens": (item.get("instr_encodings") or [None])[0],
                },
                "reference_path": ref_path,
            }
        )
        gts[str(episode_id)] = {
            "locations": ref_path,
            "forward_steps": len(ref_path) * 6,
            "actions": [1] * (len(ref_path) * 6),
        }
    return episodes, gts


def main(argv=None):
    p = argparse.ArgumentParser(description="discrete VLN -> Habitat-CE episodes")
    p.add_argument("--input", required=True, help="discrete dataset json")
    p.add_argument("--connectivity", required=True, help="connectivity dir")
    p.add_argument("--out", required=True, help="output episodes json.gz")
    p.add_argument("--out-gt", required=True, help="output gt json.gz")
    p.add_argument("--cursor", default=None,
                   help="resume cursor file (batch-restart protocol)")
    args = p.parse_args(argv)

    with open(args.input) as f:
        items = json.load(f)
    start = 0
    if args.cursor and os.path.exists(args.cursor):
        start = json.load(open(args.cursor))["item_id"]
    episodes, gts = convert_items(items[start:], args.connectivity)
    with gzip.open(args.out, "wt") as f:
        json.dump({"episodes": episodes}, f)
    with gzip.open(args.out_gt, "wt") as f:
        json.dump(gts, f)
    if args.cursor:
        json.dump({"item_id": len(items)}, open(args.cursor, "w"))


if __name__ == "__main__":
    main()
