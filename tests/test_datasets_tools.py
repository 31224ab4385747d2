"""Tests for episode datasets and the discrete->CE converter."""

import gzip
import json
import math
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dynam3d_tpu.runtime.datasets import (
    Episode,
    episodes_by_scene,
    filter_episodes,
    load_episodes,
    load_gt,
    sample_two_scene_files,
    write_episodes,
)
import discrete_to_ce as d2c


def _episode(i, scene="sceneA.basis.glb"):
    return {
        "episode_id": i,
        "trajectory_id": i,
        "scene_id": f"hm3d/train/{scene}",
        "start_position": [0, 0, 0],
        "start_rotation": [0, 0, 0, 1],
        "info": {"geodesic_distance": 5.0},
        "goals": [{"position": [1, 0, 1], "radius": 3.0}],
        "instruction": {"instruction_text": f"go {i}", "instruction_tokens": [1, 2]},
        "reference_path": [[0, 0, 0], [1, 0, 1]],
    }


def test_load_filter_group_roundtrip(tmp_path):
    path = str(tmp_path / "val.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"episodes": [_episode(1), _episode(2, "sceneB.glb")]}, f)
    eps = load_episodes(path)
    assert len(eps) == 2 and eps[0].instruction_text == "go 1"
    only1 = filter_episodes(eps, allowed_ids=["1"])
    assert [e.episode_id for e in only1] == ["1"]
    groups = episodes_by_scene(eps)
    assert set(groups) == {"sceneA", "sceneB"}
    out = str(tmp_path / "out.json.gz")
    write_episodes(out, eps)
    again = load_episodes(out)
    assert [e.episode_id for e in again] == ["1", "2"]


def test_load_gt(tmp_path):
    path = str(tmp_path / "val_gt.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"7": {"locations": [[0, 0, 0]], "actions": [1]}}, f)
    gt = load_gt(path)
    assert gt["7"]["actions"] == [1]


def test_sample_two_scene_files(tmp_path):
    for name in ("a.basis.json", "b.basis.json", "c.json"):
        (tmp_path / name).write_text("[]")
    rng = random.Random(0)
    files = sample_two_scene_files(str(tmp_path), rng)
    assert len(files) == 2


def _write_connectivity(tmp_path, scan="hm3d-xyzscene"):
    # 3 nodes in a line, 1m apart (MatterSim frame: pose matrix translation)
    nodes = []
    for i, (x, y, z) in enumerate([(0, 0, 1.5), (1, 0, 1.5), (2, 0, 1.5)]):
        pose = [0.0] * 16
        pose[3], pose[7], pose[11] = x, y, z
        nodes.append(
            {
                "image_id": f"vp{i}",
                "pose": pose,
                "included": True,
                "unobstructed": [abs(j - i) == 1 for j in range(3)],
            }
        )
    with open(tmp_path / f"{scan}_connectivity.json", "w") as f:
        json.dump(nodes, f)
    return scan


def test_convert_items(tmp_path):
    scan = _write_connectivity(tmp_path)
    items = [
        {
            "scan": scan,
            "path": ["vp0", "vp1", "vp2"],
            "heading": 0.5,
            "instructions": ["walk to the far end of the corridor"],
            "instr_encodings": [[1, 2, 3]],
        },
        {  # banned word -> filtered
            "scan": scan,
            "path": ["vp0", "vp1"],
            "heading": 0.0,
            "instructions": ["look at the painting"],
        },
        {  # too long -> filtered
            "scan": scan,
            "path": ["vp0", "vp1"],
            "heading": 0.0,
            "instructions": [" ".join(["word"] * 30)],
        },
    ]
    eps, gts = d2c.convert_items(items, str(tmp_path))
    assert len(eps) == 1 and len(gts) == 1
    e = eps[0]
    # MatterSim (x,y,z) -> habitat (x,z,-y)
    np.testing.assert_allclose(e["start_position"], [0.0, 1.5, 0.0])
    np.testing.assert_allclose(e["goals"][0]["position"], [2.0, 1.5, 0.0])
    assert abs(e["info"]["geodesic_distance"] - 2.0) < 1e-6
    assert gts[str(e["episode_id"])]["forward_steps"] == 18
    # rotation quaternion is unit-norm
    q = np.asarray(e["start_rotation"])
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-6)


def test_convert_items_dataset_specs(tmp_path):
    """Per-dataset rules of the five reference converters: REVERIE's 1.25 m
    camera-height subtraction + per-instruction expansion + mp3d scene ids,
    NavRAG-train's HM3D-only + scene cap, ScaleVLN's no-quality-filter, and
    disjoint episode-id bases."""
    scan = _write_connectivity(tmp_path)           # hm3d-style ("-" in id)
    mp3d_scan = _write_connectivity(tmp_path, "XcA2TqTSSAj")
    base_item = {
        "path": ["vp0", "vp1", "vp2"],
        "heading": 0.5,
        "instructions": ["walk to the far end", "second phrasing"],
        "instr_encodings": [[1, 2], [3, 4]],
    }

    # REVERIE: mp3d scene id, z-1.25, one episode PER instruction, base 50000
    eps, gts = d2c.convert_items(
        [dict(base_item, scan=mp3d_scan)], str(tmp_path),
        spec=d2c.DATASETS["reverie_train"],
    )
    assert len(eps) == 2 and eps[0]["episode_id"] == 50001
    assert eps[0]["scene_id"] == f"mp3d/{mp3d_scan}/{mp3d_scan}.glb"
    np.testing.assert_allclose(eps[0]["start_position"], [0.0, 1.5 - 1.25, 0.0])
    assert eps[1]["instruction"]["instruction_text"] == "second phrasing"
    assert eps[1]["instruction"]["instruction_tokens"] == [3, 4]

    # NavRAG train: skips MP3D scans entirely, first instruction only,
    # hm3d scene id, no height offset, base 500000, scene cap honored
    items = [dict(base_item, scan=mp3d_scan)] + [
        dict(base_item, scan=scan) for _ in range(4)
    ]
    spec = d2c.DATASETS["navrag_train"]
    eps, _ = d2c.convert_items(
        items, str(tmp_path),
        spec=d2c.DatasetSpec(**{
            **dataclasses_asdict(spec), "scene_cap": 2,
        }),
    )
    assert len(eps) == 2  # mp3d skipped, cap=2
    assert all(e["scene_id"].startswith("hm3d/train/") for e in eps)
    assert eps[0]["episode_id"] == 500001
    np.testing.assert_allclose(eps[0]["start_position"], [0.0, 1.5, 0.0])

    # ScaleVLN: same geometry as NavRAG but NO quality filter (a 30-word
    # instruction survives), base 100000
    long_item = dict(
        base_item, scan=scan, instructions=[" ".join(["w"] * 30)],
        instr_encodings=[[9]],
    )
    eps, _ = d2c.convert_items(
        [long_item], str(tmp_path), spec=d2c.DATASETS["scalevln_train"]
    )
    assert len(eps) == 1 and eps[0]["episode_id"] == 100001
    eps, _ = d2c.convert_items(
        [long_item], str(tmp_path), spec=d2c.DATASETS["navrag_train"]
    )
    assert len(eps) == 0  # filtered by the 25-word rule

    # per-scene output sharding for train specs
    eps, gts = d2c.convert_items(
        [dict(base_item, scan=mp3d_scan)], str(tmp_path),
        spec=d2c.DATASETS["reverie_train"],
    )
    out_dir = tmp_path / "shards"
    d2c.write_outputs(eps, gts, str(out_dir), str(tmp_path / "gt.json"), True)
    assert (out_dir / f"{mp3d_scan}.glb.json").exists()
    assert json.load(open(tmp_path / "gt.json"))


def dataclasses_asdict(spec):
    import dataclasses as _dc

    return _dc.asdict(spec)


def test_graph_geodesic_disconnected(tmp_path):
    scan = _write_connectivity(tmp_path)
    pos = d2c.load_connectivity(str(tmp_path), scan)
    edges = d2c.graph_edges(str(tmp_path), scan)
    edges["vp1"] = []  # cut the line
    edges["vp0"] = []
    assert math.isinf(d2c.graph_geodesic(pos, edges, "vp0", "vp2"))


def test_convert_items_snap_hook(tmp_path):
    """snap_fn plugs navmesh snapping in (the habitat hosts' path)."""
    scan = _write_connectivity(tmp_path)
    items = [{
        "scan": scan, "path": ["vp0", "vp1", "vp2"], "heading": 0.0,
        "instructions": ["go"], "instr_encodings": [[1]],
    }]
    eps, gts = d2c.convert_items(
        items, str(tmp_path), spec=d2c.DATASETS["scalevln_train"],
        snap_fn=lambda sc, p: [p[0], p[1] - 0.07, p[2]],  # fake snap: drop 7cm
    )
    assert len(eps) == 1
    np.testing.assert_allclose(eps[0]["start_position"][1], 1.5 - 0.07)
    np.testing.assert_allclose(gts[str(eps[0]["episode_id"])]["locations"][2][1], 1.43)
