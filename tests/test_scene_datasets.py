"""Posed-frame dataset loaders: format parsing + sample_scene contracts.

Builds tiny synthetic on-disk trees matching each dataset's real layout
(ScanNet frames_square, 3RScan sequence, ARKitScenes 3dod, Structured3D
2D_rendering) and checks the parsed cameras, depths, derived habitat poses
and SceneVerse supervision against hand-computed values.
"""

import json
import math
import os
import random

import numpy as np
import pytest

from dynam3d_tpu.runtime import scene_datasets as sd


def _write_png16(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint16)).save(path)


def _write_rgb(path, h=8, w=8, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def _write_mat(path, m):
    with open(path, "w") as f:
        for row in np.asarray(m):
            f.write(" ".join(str(float(v)) for v in row) + "\n")


# ---------------------------------------------------------------------------
# camera parsing helpers
# ---------------------------------------------------------------------------
def test_axis_angle_matches_cv2_rodrigues():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for _ in range(5):
        v = rng.normal(size=3)
        ours = sd.axis_angle_to_matrix(v)
        ref, _ = cv2.Rodrigues(v)
        np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_traj_line_inverts_world_to_cam():
    # zero rotation, translation (1,2,3): cam-to-world = inverse
    row = "0.0 0 0 0 1.0 2.0 3.0"
    ext = sd.traj_line_to_extrinsic(row)
    np.testing.assert_allclose(ext[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(ext[:3, 3], [-1, -2, -3], atol=1e-12)


def test_pincam_intrinsics(tmp_path):
    p = tmp_path / "f.pincam"
    p.write_text("256 192 211.5 211.5 128.0 96.0\n")
    k = sd.pincam_intrinsics(str(p))
    assert k[0, 0] == 211.5 and k[1, 2] == 96.0 and k[2, 2] == 1.0


def test_structured3d_camera_parse():
    # camera at (1000,2000,3000) mm looking along +x, up +z, fov 45 deg
    info = np.array(
        [1000, 2000, 3000, 1, 0, 0, 0, 0, 1, math.pi / 4, math.pi / 4],
        np.float64,
    )
    rot, trans, k = sd.parse_structured3d_camera(info, 720, 1280)
    np.testing.assert_allclose(trans, [1.0, 2.0, 3.0])
    # forward axis (row 2 of rot) is the lookat
    np.testing.assert_allclose(rot[2], [1, 0, 0], atol=1e-12)
    assert k[0, 2] == 640 and abs(k[0, 0] - 640.0) < 1e-9


def test_scannet_intrinsics_halved(tmp_path):
    m = np.eye(4)
    m[0, 0], m[1, 1], m[0, 2], m[1, 2] = 577.0, 578.0, 320.0, 240.0
    _write_mat(tmp_path / "intrinsic_depth.txt", m)
    k = sd.scannet_depth_intrinsics(str(tmp_path / "intrinsic_depth.txt"))
    assert k[0, 0] == 288.5 and k[1, 1] == 289.0
    assert k[0, 2] == 160.0 and k[1, 2] == 120.0


def test_rscan_info_intrinsics(tmp_path):
    lines = ["x"] * 9
    vals = list(range(16))
    lines.append("m_calibrationColorIntrinsic = " + " ".join(map(str, vals)))
    (tmp_path / "_info.txt").write_text("\n".join(lines) + "\n")
    k = sd.rscan_intrinsics_from_info(str(tmp_path / "_info.txt"))
    np.testing.assert_allclose(k, np.arange(16, dtype=np.float64).reshape(4, 4))


def test_pose_from_extrinsic_headings():
    # The reference derives the camera direction from the TRANSLATED forward
    # point: get_heading_angle(R @ [0,0,1] + T) (feature_fields.py:505-514) —
    # the translation is part of the angle, matching the same T-polluted
    # convention stored in patch directions (":915").
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    np.testing.assert_allclose(rot @ [0, 0, 1], [0, 1, 0], atol=1e-12)
    trans = np.array([1.0, 2.0, 0.5])
    pos, hd = sd.pose_from_extrinsic(rot, trans)
    fwd = rot @ [0, 0, 1] + trans  # [1, 3, 0.5]
    expect = -math.asin(fwd[0] / math.hypot(fwd[0], fwd[1]))
    assert abs(hd - expect) < 1e-6
    np.testing.assert_allclose(pos, [1.0, 2.0, 0.5])
    # at zero translation the quirk vanishes: looking along world -x gives
    # heading +pi/2 (left turn positive)
    rot2 = np.array([[0, 0, -1], [1, 0, 0], [0, -1, 0]], np.float64)
    np.testing.assert_allclose(rot2 @ [0, 0, 1], [-1, 0, 0], atol=1e-12)
    _, hd2 = sd.pose_from_extrinsic(rot2, np.zeros(3))
    assert abs(hd2 - math.pi / 2) < 1e-6


def test_world_habitat_round_trip():
    from dynam3d_tpu.geom.projection import habitat_to_world

    p_world = np.array([1.0, 2.0, 3.0], np.float32)
    p_hab = sd.world_to_habitat(p_world)
    back = np.asarray(habitat_to_world(p_hab))
    np.testing.assert_allclose(back, p_world, atol=1e-6)


# ---------------------------------------------------------------------------
# on-disk layouts
# ---------------------------------------------------------------------------
def _make_scannet(tmp_path, scene="scene0000_00", n=3):
    base = tmp_path / scene
    for sub in ("color", "depth", "pose"):
        os.makedirs(base / sub)
    m = np.eye(4)
    m[0, 0] = m[1, 1] = 500.0
    m[0, 2], m[1, 2] = 64.0, 48.0
    _write_mat(base / "intrinsic_depth.txt", m)
    for i in range(n):
        _write_rgb(base / "color" / f"{i}.jpg", seed=i)
        _write_png16(base / "depth" / f"{i}.png",
                     np.full((6, 6), 2000 + 500 * i))
        ext = np.eye(4)
        ext[:3, 3] = [i, 0.0, 1.0]
        _write_mat(base / "pose" / f"{i}.txt", ext)
    return str(tmp_path)


def test_scannet_scenes(tmp_path):
    root = _make_scannet(tmp_path)
    ds = sd.ScanNetScenes(root, frames=4, seed=1)
    s = ds.sample_scene()
    assert s["rgb"].shape == (4, 8, 8, 3)
    assert s["depth"].shape == (4, 6, 6)
    # 2000 mm -> 2 m -> 0.2 normalized at 10 m far plane
    assert {round(float(v), 4) for v in s["depth"][:, 0, 0]} <= {0.2, 0.25, 0.3}
    # frames_square halving applied
    assert s["intrinsics"][0][0, 0] == 250.0
    # identity rotation looks along world +z (camera z axis)
    assert s["position"].shape == (4, 3) and s["heading"].shape == (4,)
    assert s["world2cam"].shape == (4, 4, 4)
    # pose txt translation survives into trans
    assert set(np.asarray(s["trans"])[:, 2].tolist()) == {1.0}


def _make_rscan(tmp_path, scene="0a4b8ef6-a83a-21f2-8672-dce34dd0d7ca", n=2):
    seq = tmp_path / scene / "sequence"
    os.makedirs(seq)
    lines = ["h"] * 9
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 400.0
    lines.append(
        "m_calibrationColorIntrinsic = "
        + " ".join(str(float(v)) for v in k.reshape(-1))
    )
    (seq / "_info.txt").write_text("\n".join(lines) + "\n")
    for i in range(n):
        stem = f"frame-{i:06d}"
        _write_rgb(seq / f"{stem}.color.jpg", seed=i)
        from PIL import Image

        Image.fromarray(np.full((6, 6), 1500, np.uint16)).save(
            seq / f"{stem}.depth.pgm"
        )
        ext = np.eye(4)
        ext[:3, 3] = [0.0, float(i), 0.0]
        _write_mat(seq / f"{stem}.pose.txt", ext)
    return str(tmp_path)


def test_rscan_scenes(tmp_path):
    root = _make_rscan(tmp_path)
    ds = sd.RScanScenes(root, frames=3, seed=0)
    s = ds.sample_scene()
    assert s["rgb"].shape[0] == 3  # padded by repetition from 2 frames
    assert abs(float(s["depth"][0, 0, 0]) - 0.15) < 1e-6
    assert s["intrinsics"][0][0, 0] == 400.0


def _make_arkit(tmp_path, scene="41069042", n=2):
    frames = tmp_path / scene / f"{scene}_frames"
    for sub in ("lowres_wide", "lowres_depth", "lowres_wide_intrinsics"):
        os.makedirs(frames / sub)
    rows = []
    for i in range(n):
        name = f"{scene}_{i}.png"
        _write_rgb(frames / "lowres_wide" / name, seed=i)
        _write_png16(frames / "lowres_depth" / name, np.full((6, 6), 3000))
        (frames / "lowres_wide_intrinsics" / f"{scene}_{i}.pincam").write_text(
            "256 192 210.0 210.0 128.0 96.0\n"
        )
        rows.append(f"{i}.0 0 0 0 {float(i)} 0 0")
    (frames / "lowres_wide.traj").write_text("\n".join(rows) + "\n")
    return str(tmp_path)


def test_arkit_scenes(tmp_path):
    root = _make_arkit(tmp_path)
    ds = sd.ARKitScenes(root, frames=2, seed=0)
    s = ds.sample_scene()
    assert s["rgb"].shape == (2, 8, 8, 3)
    assert abs(float(s["depth"][0, 0, 0]) - 0.3) < 1e-6
    assert s["intrinsics"][0][0, 0] == 210.0
    # traj row i=1: w2c translation (1,0,0) -> cam-to-world trans (-1,0,0)
    assert {round(float(t), 5) for t in s["trans"][:, 0]} <= {0.0, -1.0}


def _make_structured3d(tmp_path, scene="scene_00000"):
    view = tmp_path / scene / "2D_rendering" / "485142" / "perspective" / "full" / "0"
    os.makedirs(view)
    _write_rgb(view / "rgb_rawlight.png", h=6, w=8)
    _write_png16(view / "depth.png", np.full((6, 8), 4000))
    info = [0, 0, 1600, 1, 0, 0, 0, 0, 1, math.pi / 4, math.pi / 4]
    (view / "camera_pose.txt").write_text(" ".join(map(str, info)) + "\n")
    return str(tmp_path)


def test_structured3d_scenes(tmp_path):
    root = _make_structured3d(tmp_path)
    ds = sd.Structured3DScenes(root, frames=2)
    s = ds.sample_scene()
    assert s["rgb"].shape == (2, 6, 8, 3)
    assert abs(float(s["depth"][0, 0, 0]) - 0.4) < 1e-6
    assert s["use_labels"] is False or s["use_labels"] == False  # noqa: E712
    np.testing.assert_allclose(s["trans"][0], [0, 0, 1.6], atol=1e-6)


# ---------------------------------------------------------------------------
# SceneVerse supervision
# ---------------------------------------------------------------------------
def test_sceneverse_blobs(tmp_path):
    torch = pytest.importorskip("torch")
    xyz = np.arange(12, dtype=np.float32).reshape(4, 3)
    lab = np.array([0, 1, 1, 2])
    torch.save((xyz, None, None, lab), tmp_path / "scene.pth")
    got_xyz, got_lab = sd.load_sceneverse_pcd([str(tmp_path / "scene.pth")], 3)
    np.testing.assert_allclose(got_xyz, xyz)
    np.testing.assert_array_equal(got_lab, lab)

    # align matrix: pure translation by (1,0,0); applied inverse
    align = np.eye(4)
    align[0, 3] = 1.0
    a_xyz, _ = sd.load_sceneverse_pcd(
        [str(tmp_path / "scene.pth")], 3, align_matrix=align
    )
    np.testing.assert_allclose(a_xyz[:, 0], xyz[:, 0] - 1.0, atol=1e-6)

    torch.save({3: "trash_can", 7: "sofa"}, tmp_path / "labels.pth")
    labels = sd.load_instance_labels([str(tmp_path / "labels.pth")])
    assert labels[3] == "trash_can"

    cat_dict = {"sofa": 0, "trash can": 1}
    emb = np.stack([np.ones(4), 2 * np.ones(4)]).astype(np.float32)
    torch.save([cat_dict, torch.tensor(emb)], tmp_path / "cat.pth")
    d, e = sd.load_category_embeddings(str(tmp_path / "cat.pth"))
    assert d == cat_dict
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-6)


def test_annotations_and_language_supervision(tmp_path):
    ann_path = tmp_path / "ann.json"
    json.dump(
        {"sceneA": {"1": [["sofa", "a red sofa by the wall"]]}},
        open(ann_path, "w"),
    )
    ann = sd.SceneVerseAnnotations(str(ann_path))
    assert "sceneA" in ann
    cat, text = ann.sample_caption("sceneA", 1, random.Random(0))
    assert cat == "sofa" and "sofa" in text
    assert ann.sample_caption("sceneA", 9, random.Random(0)) is None

    scene = {
        "scene_id": "sceneA",
        "gt_label": np.array([1, 1, 2, 5], np.int32),
    }
    cat_dict = {"sofa": 0, "table": 1}
    emb = np.eye(2, 8, dtype=np.float32)
    calls = []

    def encode_text(texts):
        calls.append(list(texts))
        return np.full((len(texts), 8), 0.5, np.float32)

    gtid_to_cat, fts, valid = sd.build_language_supervision(
        scene, ann, cat_dict, emb, encode_text,
        instance_labels={2: "table", 5: "lamp"}, max_gt_label=16,
    )
    # id 1: captioned -> CLIP-encoded features + category row
    assert gtid_to_cat[1] == 0 and valid[1]
    np.testing.assert_allclose(fts[1], 0.5)
    # id 2: no caption, category fallback
    assert gtid_to_cat[2] == 1 and valid[2]
    np.testing.assert_allclose(fts[2], emb[1])
    # id 5: unknown category -> invalid
    assert gtid_to_cat[5] == -1 and not valid[5]
    assert calls == [["a red sofa by the wall"]]


def test_frames_driver_integration(tmp_path):
    """A ScanNetScenes sample feeds PretrainRunner.build_batch unchanged."""
    jax = pytest.importorskip("jax")
    from dynam3d_tpu.config import (
        CLIPConfig,
        Dynam3DConfig,
        FieldsConfig,
        LLaVAConfig,
        Phi3Config,
        SegmenterConfig,
    )
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime.pretrain_loop import PretrainRunner

    root = _make_scannet(tmp_path, n=2)
    ds = sd.ScanNetScenes(root, frames=2, seed=0)
    scene = ds.sample_scene()
    scene["gt_xyz"] = np.zeros((8, 3), np.float32)
    scene["gt_label"] = np.zeros((8,), np.int32)
    scene["use_labels"] = True

    cfg = Dynam3DConfig(
        fields=FieldsConfig(
            input_height=4, input_width=4, fts_dim=64,
            patch_capacity=128, instance_capacity=32, zone_capacity=16,
            max_segments=8, max_members=16, max_zone_members=8,
            view_height=2, view_width=2,
        ),
        clip=CLIPConfig(
            image_size=56, patch_size=14, vision_width=64, vision_layers=2,
            vision_heads=2, embed_dim=64, text_context=16, text_width=32,
            text_layers=1, text_heads=2, vocab_size=64,
        ),
        llava=LLaVAConfig(
            phi3=Phi3Config(
                vocab_size=512, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=2, num_kv_heads=2, head_dim=32,
                pad_token_id=260, end_token_id=257,
            ),
            projector_hidden=64, prefill_bucket=64, max_new_tokens=8,
        ),
        segmenter=SegmenterConfig(provider="depth_plane"),
    )
    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    runner = PretrainRunner(params, cfg)
    batch = runner.build_batch(scene, params["clip"])
    assert batch.depth.shape == (2, 16)
    assert np.isfinite(np.asarray(batch.novel_gt_fts)).all()


def test_hm3d_semantic_index(tmp_path):
    torch = pytest.importorskip("torch")
    hm3d = tmp_path / "hm3d"
    d = hm3d / "00001-abcdefghijk"
    os.makedirs(d)
    xyz = np.arange(9, dtype=np.float32).reshape(3, 3)
    lab = np.array([4, 4, 2])
    torch.save((xyz, {4: "chair", 2: "rug"}, None, lab),
               d / "abcdefghijk.semantic.pth")
    mp3d = tmp_path / "mp3d"
    os.makedirs(mp3d / "sceneX")
    torch.save((xyz + 1, {1: "sofa"}, None, lab),
               mp3d / "sceneX" / "sceneX_semantic.pth")

    idx = sd.HM3DSemanticIndex(str(hm3d), str(mp3d))
    assert "abcdefghijk" in idx and "sceneX" in idx
    got_xyz, got_lab, types = idx.load("abcdefghijk")
    np.testing.assert_allclose(got_xyz, xyz)
    assert types[4] == "chair"
    # habitat scene-path normalization (ss_trainer_3DFF.py:775-778)
    assert sd.HM3DSemanticIndex.normalize_scene_id(
        "data/scene_datasets/hm3d/00001-abcdefghijk/abcdefghijk.basis.glb"
    ) == "abcdefghijk"
    assert sd.HM3DSemanticIndex.normalize_scene_id(
        "data/scene_datasets/mp3d/sceneX/sceneX.glb"
    ) == "sceneX"


def test_scannet_skips_nonfinite_poses(tmp_path):
    root = _make_scannet(tmp_path, n=3)
    # corrupt frame 1 with a tracking-lost pose (real ScanNet writes -inf)
    bad = np.full((4, 4), -np.inf)
    _write_mat(tmp_path / "scene0000_00" / "pose" / "1.txt", bad)
    ds = sd.ScanNetScenes(root, frames=4, seed=1)
    s = ds.sample_scene()
    assert np.isfinite(s["position"]).all()
    assert np.isfinite(s["world2cam"]).all()
    # frame 1's translation x=1.0 never appears; only frames 0 and 2 do
    assert set(np.asarray(s["trans"])[:, 0].tolist()) <= {0.0, 2.0}


def test_arkit_timestamp_pairing(tmp_path):
    """Lexicographic name order != chronological; pairing is by timestamp
    (including a 1 ms pincam filename offset) and a missing traj row skips
    only that frame."""
    scene = "41069042"
    frames = tmp_path / scene / f"{scene}_frames"
    for sub in ("lowres_wide", "lowres_depth", "lowres_wide_intrinsics"):
        os.makedirs(frames / sub)
    # timestamps 999.9 and 1000.2: sorted() reverses chronological order
    for ts, tx in [("999.9", 1.0), ("1000.2", 2.0)]:
        name = f"{scene}_{ts}.png"
        _write_rgb(frames / "lowres_wide" / name)
        _write_png16(frames / "lowres_depth" / name, np.full((6, 6), 3000))
    # pincam for 999.9 is named with a +0.001 offset (real-data quirk)
    (frames / "lowres_wide_intrinsics" / f"{scene}_999.901.pincam").write_text(
        "256 192 111.0 111.0 128.0 96.0\n")
    (frames / "lowres_wide_intrinsics" / f"{scene}_1000.2.pincam").write_text(
        "256 192 222.0 222.0 128.0 96.0\n")
    (frames / "lowres_wide.traj").write_text(
        "999.9 0 0 0 1.0 0 0\n1000.2 0 0 0 2.0 0 0\n")
    ds = sd.ARKitScenes(str(tmp_path), frames=2, seed=0)
    s = ds.sample_scene()
    # each frame got ITS OWN pose: w2c trans (1,0,0)->cam2world x=-1 pairs
    # with pincam fx=111; (2,0,0)->x=-2 pairs with fx=222
    got = {(round(float(t[0]), 3), float(k[0, 0]))
           for t, k in zip(s["trans"], s["intrinsics"])}
    assert got == {(-1.0, 111.0), (-2.0, 222.0)}

    # a frame whose traj row is missing is skipped, not shifted
    (frames / "lowres_wide.traj").write_text("1000.2 0 0 0 2.0 0 0\n")
    ds2 = sd.ARKitScenes(str(tmp_path), frames=2, seed=0)
    s2 = ds2.sample_scene()
    assert {round(float(t[0]), 3) for t in s2["trans"]} == {-2.0}


def test_normalize_scene_id_plain_glb():
    assert sd.HM3DSemanticIndex.normalize_scene_id(
        "data/hm3d/00001-abcdefghijk/abcdefghijk.glb"
    ) == "abcdefghijk"


def test_hm3d_index_skips_unannotated(tmp_path):
    hm3d = tmp_path / "hm3d"
    os.makedirs(hm3d / "00001-aaaaaaaaaaa")  # no .semantic.pth inside
    idx = sd.HM3DSemanticIndex(str(hm3d), None)
    assert "aaaaaaaaaaa" not in idx
