"""Tests for misc/graph/obs-transform/visual utilities."""

import numpy as np

from dynam3d_tpu.utils.graph import FloydGraph, GraphMap
from dynam3d_tpu.utils.misc import (
    angle_feature,
    camera_orientations,
    decode_instruction,
    densify_path,
    encode_instruction,
    length2mask,
)
from dynam3d_tpu.utils.obs_transforms import (
    center_crop,
    cubemap_to_equirect,
    resize_nearest,
)
from dynam3d_tpu.utils.visual import TopDownMap, generate_video, navigator_video_frame


def test_instruction_codec_roundtrip():
    text = "turn left at the sofa, then stop."
    ids = encode_instruction(text, max_length=200)
    assert decode_instruction(ids) == text
    assert ids.shape == (200,)


def test_densify_path_spacing():
    p = np.asarray([[0, 0, 0], [1.0, 0, 0]], np.float32)
    out = densify_path(p, step=0.25)
    seg = np.linalg.norm(out[1:] - out[:-1], axis=1)
    assert (seg <= 0.25 + 1e-6).all()
    np.testing.assert_allclose(out[-1], [1, 0, 0])


def test_camera_orientations_and_angle_feature():
    ors = camera_orientations()
    assert len(ors) == 12
    np.testing.assert_allclose(ors[1][1], -np.pi / 6)
    af = angle_feature([0.0, np.pi / 2])
    np.testing.assert_allclose(af[0], [0, 1, 0, 1], atol=1e-7)
    np.testing.assert_allclose(af[1], [1, 0, 0, 1], atol=1e-7)


def test_length2mask():
    m = length2mask([2, 4], size=4)
    np.testing.assert_array_equal(
        m, [[False, False, True, True], [False, False, False, False]]
    )


def test_floyd_graph_shortest_path():
    g = FloydGraph()
    g.add_edge("a", "b", 1.0)
    g.add_edge("b", "c", 1.0)
    g.add_edge("a", "c", 5.0)
    for n in ("a", "b", "c"):
        g.update(n)
    assert abs(g.distance("a", "c") - 2.0) < 1e-9
    assert g.path("a", "c") == ["b", "c"]


def test_graph_map():
    gm = GraphMap(np.zeros(2))
    n1 = gm.add_node(np.asarray([1.0, 0.0]), connect_to=gm.start_id)
    gid = gm.add_ghost(np.asarray([2.0, 0.0]), n1)
    d, _ = gm.shortest_path(gm.start_id, gid)
    assert abs(d - 2.0) < 1e-9
    assert gm.localize([1.05, 0.0]) == n1
    gm.delete_ghost(gid)
    assert gid not in gm.ghost_pos


def test_center_crop_and_resize():
    img = np.arange(8 * 8 * 1).reshape(8, 8, 1)
    c = center_crop(img, (4, 4))
    assert c.shape == (4, 4, 1)
    assert c[0, 0, 0] == img[2, 2, 0]
    r = resize_nearest(img.astype(np.uint8), (4, 4))
    assert r.shape == (4, 4, 1)


def test_cubemap_to_equirect():
    faces = {
        k: np.full((8, 8, 3), i * 40, np.uint8)
        for i, k in enumerate(["F", "R", "B", "L", "U", "D"])
    }
    eq = cubemap_to_equirect(faces, (16, 32))
    assert eq.shape == (16, 32, 3)
    # front face dominates the center of the panorama
    assert eq[8, 16, 0] == 0
    # up face dominates the top
    assert eq[0, 16, 0] == 160


def test_topdown_map_and_video(tmp_path):
    frame = navigator_video_frame(
        rgb=np.zeros((64, 64, 3), np.uint8),
        pred_path=[[0, 0], [1, 1], [2, 1]],
        gt_path=[[0, 0], [2, 2]],
        goal_xz=[2, 2],
        heading=0.3,
    )
    assert frame.shape[0] == 64 and frame.shape[1] > 64
    out = generate_video([frame, frame], str(tmp_path / "vid"), fps=2)
    data = np.load(out)
    assert data["frames"].shape[0] == 2


def test_cli_parser_and_config_overrides():
    from dynam3d_tpu.run import build_parser
    from dynam3d_tpu.config import Dynam3DConfig, apply_opts

    p = build_parser()
    args = p.parse_args(
        ["--run-type", "eval", "--exp_name", "x", "train.lr=5e-7", "mesh.dp=4"]
    )
    assert args.run_type == "eval"
    cfg = apply_opts(Dynam3DConfig(), [o for o in args.opts if "=" in o])
    assert cfg.train.lr == 5e-7
    assert cfg.mesh.dp == 4 and cfg.mesh.num_devices == 4


def test_shortest_path_follower_reaches_goal():
    from dynam3d_tpu.utils.follower import ShortestPathFollower
    from dynam3d_tpu.runtime.feed import STOP, SyntheticRoomFeed

    feed = SyntheticRoomFeed(rgb_size=32, depth_size=16)
    feed.reset()
    follower = ShortestPathFollower()
    for _ in range(30):
        act = follower.next_action(feed)
        if act == STOP:
            break
        feed.step(act)
    assert feed.oracle_distance() < 1.5
    assert follower.discrete_action(feed) == 0
