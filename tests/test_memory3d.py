"""Behavioral tests of the 3D memory state machine (tiny config, CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dynam3d_tpu.config import FieldsConfig
from dynam3d_tpu.models.memory3d import (
    delete_from_frustum,
    environment_features,
    init_field_params,
    init_state,
    update_view,
    update_views,
)
from dynam3d_tpu.models.memory3d.state import cell_center
from dynam3d_tpu.ops.transformer import encoder_stack, mlp2

CFG = FieldsConfig(
    input_height=4,
    input_width=4,
    fts_dim=64,
    patch_capacity=128,
    instance_capacity=32,
    zone_capacity=16,
    max_segments=8,
    max_members=32,
    max_zone_members=16,
)
HW = 16


def _params(force_merge=None):
    p = init_field_params(jax.random.PRNGKey(0), CFG)
    if force_merge is not None:
        bias = np.zeros(2, np.float32)
        bias[1 if force_merge else 0] = 100.0
        p["merge_disc"]["fc2"]["b"] = jnp.asarray(bias)
        p["merge_disc"]["fc2"]["w"] = jnp.zeros_like(p["merge_disc"]["fc2"]["w"])
    return p


def _view(seed=0, depth_val=2.0):
    rng = np.random.default_rng(seed)
    depth = jnp.full((HW,), depth_val, jnp.float32)
    grid = jnp.asarray(rng.normal(size=(HW, CFG.fts_dim)).astype(np.float32))
    segm = jnp.asarray(np.repeat(np.arange(4), 4).astype(np.int32))  # 4 segments
    return depth, grid, segm


def test_first_view_creates_instances_and_zones():
    params = _params(force_merge=False)
    state = init_state(CFG)
    depth, grid, segm = _view()
    state, aux = update_view(
        params, state, CFG, depth, grid, segm, jnp.zeros(3), jnp.asarray(0.0)
    )
    assert int(state.patch_valid.sum()) == HW
    assert int(state.inst_valid.sum()) == 4
    assert int(state.zone_valid.sum()) >= 1
    # all patches owned by a valid instance
    owners = np.asarray(state.patch_owner[np.asarray(state.patch_valid)])
    assert set(owners.tolist()) == {0, 1, 2, 3}
    # instance centers = mean of member patch positions
    all_owner = np.asarray(state.patch_owner)
    all_valid = np.asarray(state.patch_valid)
    for i in range(4):
        members = np.asarray(state.patch_pos)[all_valid & (all_owner == i)]
        np.testing.assert_allclose(
            np.asarray(state.inst_pos[i]), members.mean(0), rtol=1e-4, atol=1e-4
        )
    assert bool(jnp.all(aux.seg_active[:4])) and not bool(jnp.any(aux.seg_active[4:]))


def test_no_merge_second_view_allocates_new_ids():
    params = _params(force_merge=False)
    state = init_state(CFG)
    depth, grid, segm = _view()
    state, _ = update_view(params, state, CFG, depth, grid, segm, jnp.zeros(3), jnp.asarray(0.0))
    state, _ = update_view(params, state, CFG, depth, grid, segm, jnp.zeros(3), jnp.asarray(0.0))
    assert int(state.inst_valid.sum()) == 8
    assert int(state.patch_valid.sum()) == 2 * HW


def test_merge_keeps_instance_count_and_updates_position():
    params = _params(force_merge=True)
    state = init_state(CFG)
    depth, grid, segm = _view()
    state, _ = update_view(params, state, CFG, depth, grid, segm, jnp.zeros(3), jnp.asarray(0.0))
    pos0 = np.asarray(state.inst_pos[:4]).copy()
    # second view slightly displaced -> merges into nearest instances
    state, aux = update_view(
        params, state, CFG, depth, grid, segm, jnp.asarray([0.1, 0.0, 0.0]), jnp.asarray(0.0)
    )
    assert int(state.inst_valid.sum()) == 4
    assert bool(jnp.all(aux.is_merge[:4]))
    # positions moved: now the mean over BOTH views' member patches
    pos1 = np.asarray(state.inst_pos[:4])
    assert np.abs(pos1 - pos0).max() > 1e-3
    owners = np.asarray(state.patch_owner[np.asarray(state.patch_valid)])
    for i in range(4):
        members = np.asarray(state.patch_pos)[
            np.asarray(state.patch_valid) & (np.asarray(state.patch_owner) == i)
        ]
        np.testing.assert_allclose(pos1[i], members.mean(0), rtol=1e-4, atol=1e-4)


def test_delete_frustum_clears_everything_visible():
    params = _params(force_merge=False)
    state = init_state(CFG)
    depth, grid, segm = _view()
    pos = jnp.zeros(3)
    state, _ = update_view(params, state, CFG, depth, grid, segm, pos, jnp.asarray(0.0))
    dm = depth.reshape(4, 4)
    state = delete_from_frustum(state, CFG, dm, pos, jnp.asarray(0.0))
    assert int(state.patch_valid.sum()) == 0
    assert int(state.inst_valid.sum()) == 0
    assert int(state.zone_valid.sum()) == 0
    # tombstones
    assert float(state.patch_pos.max()) == -10000.0

    # slots are reused after deletion
    state, aux = update_view(params, state, CFG, depth, grid, segm, pos, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(aux.patch_slots), np.arange(HW))
    assert int(state.inst_valid.sum()) == 4


def test_block_diag_aggregation_matches_per_segment():
    """The fused block-diagonal attention must equal running the encoder on
    each segment separately (the reference's per-segment loop)."""
    import dataclasses

    params = _params()
    # the masking-equivalence property is dtype-independent; compare in f32
    # so the per-segment f32 recomputation below matches bit-closely
    cfg = dataclasses.replace(CFG, encoder_dtype="f32")
    state = init_state(cfg)
    depth, grid, segm = _view()
    state, aux = update_view(
        params, state, cfg, depth, grid, segm, jnp.zeros(3), jnp.asarray(0.0)
    )
    # recompute segment 2's feature the reference way
    from dynam3d_tpu.geom import unproject_depth_habitat
    from dynam3d_tpu.models.memory3d.update import _patch_pos_embedding_input

    rx, ry, rz, pdir, pscale = unproject_depth_habitat(
        depth, jnp.asarray(0.0), height=4, width=4
    )
    ppos = jnp.stack([rx, ry, rz], -1)
    sel = np.asarray(segm) == 2
    center = ppos[sel].mean(0)
    emb = _patch_pos_embedding_input(ppos[sel], center, pdir[sel], pscale[sel])
    tokens = grid[sel] + mlp2(params["patch_pos_mlp"], emb)
    tokens = jnp.concatenate([params["p2i_agg_token"], tokens], axis=0)
    want = encoder_stack(params["p2i_encoder"], tokens, 1)[0]
    np.testing.assert_allclose(
        np.asarray(aux.seg_fts[2]), np.asarray(want), rtol=2e-3, atol=2e-3
    )


def test_update_views_scan_and_env_features():
    params = _params(force_merge=False)
    state = init_state(CFG)
    depth, grid, segm = _view()
    V = 3
    headings = jnp.asarray([0.0, -np.pi / 6, -np.pi / 3], jnp.float32)
    state, aux = update_views(
        params,
        state,
        CFG,
        jnp.tile(depth[None], (V, 1)),
        jnp.tile(grid[None], (V, 1, 1)),
        jnp.tile(segm[None], (V, 1)),
        jnp.zeros(3),
        headings,
    )
    assert int(state.inst_valid.sum()) == 12
    env = environment_features(state, jnp.zeros(3), jnp.asarray(0.0), 5.0, 100.0)
    assert int(env.inst_mask.sum()) > 0
    assert int(env.zone_mask.sum()) == int(state.zone_valid.sum())
    # relative positions of instances within 5m should have small norms
    rel = np.asarray(env.inst_rel_pos)[np.asarray(env.inst_mask)]
    assert np.all(np.linalg.norm(rel, axis=-1) <= 5.0)


def test_zone_keys_unique_and_cells_correct():
    params = _params(force_merge=False)
    state = init_state(CFG)
    depth, grid, segm = _view()
    state, _ = update_view(params, state, CFG, depth, grid, segm, jnp.zeros(3), jnp.asarray(0.0))
    zk = np.asarray(state.zone_key)[np.asarray(state.zone_valid)]
    assert len({tuple(r) for r in zk.tolist()}) == len(zk)
    # every valid instance's cell is a valid zone key
    cells = np.asarray(cell_center(state.inst_pos, CFG))[np.asarray(state.inst_valid)]
    for c in cells:
        assert any(np.allclose(c, k) for k in zk)


def test_patch_overflow_evicts_oldest():
    """When the patch table is full, the oldest patches are evicted instead
    of colliding (bounded lifelong memory; the reference grows unboundedly)."""
    import dataclasses

    small = dataclasses.replace(CFG, patch_capacity=40)  # capacity 40 < 3*16
    params = _params(force_merge=False)
    state = init_state(small)
    depth, grid, segm = _view()
    pos = jnp.zeros(3)
    for t in range(3):
        state, aux = update_view(
            params, state, small, depth, grid, segm,
            pos + jnp.asarray([0.5 * t, 0.0, 0.0]), jnp.asarray(0.0),
        )
    # table stays exactly full, all slots unique per view
    assert int(state.patch_valid.sum()) == 40
    # newest stamp present on the last view's slots
    assert int(state.patch_step.max()) == 3
    # 8 step-1 patches were evicted (the only step with losses = the oldest)
    steps = np.asarray(state.patch_step)[np.asarray(state.patch_valid)]
    counts = {s: int((steps == s).sum()) for s in np.unique(steps)}
    assert counts == {1: 8, 2: 16, 3: 16}
