"""Tests for the 3DFF pretraining losses and step (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynam3d_tpu.config import Dynam3DConfig, FieldsConfig
from dynam3d_tpu.models.memory3d import init_field_params, init_state
from dynam3d_tpu.models.memory3d.pretrain import segment_gt_ids, update_view_pretrain
from dynam3d_tpu.models.render.nerf import init_render_params
from dynam3d_tpu.runtime import trainer_3dff
from dynam3d_tpu.runtime.losses_3dff import (
    balanced_merge_ce,
    contrastive_loss,
    cosine_loss,
    focal_loss,
)

FCFG = FieldsConfig(
    input_height=4, input_width=4, fts_dim=32,
    patch_capacity=256, instance_capacity=64, zone_capacity=32,
    max_segments=8, max_members=32, max_zone_members=8,
    view_height=4, view_width=4, n_samples=17, n_importance=4,
    search_num=2, mlp_net_width=32,
)
CFG = Dynam3DConfig(fields=FCFG)
HW = 16


def test_cosine_and_contrastive_masked():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    mask = jnp.asarray([True, True, True, False, False, False])
    # self-alignment: cosine loss 0, contrastive loss low
    assert float(cosine_loss(a, a, mask)) < 1e-5
    c_self = float(contrastive_loss(a * 3, a * 3, mask))
    b = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    c_rand = float(contrastive_loss(a, b, mask))
    assert c_self < c_rand
    # masked rows don't contribute
    a2 = a.at[4].set(1e6)
    np.testing.assert_allclose(
        float(cosine_loss(a, a, mask)), float(cosine_loss(a2, a, mask)), atol=1e-6
    )


def test_focal_loss_matches_reference_formula():
    rng = np.random.default_rng(1)
    N, C = 10, 7
    logits = rng.normal(size=(N, C)).astype(np.float32)
    targets = rng.integers(0, C, N)

    # reference: ce.mean() + topk(ce, max(int(0.1*N),1)).mean()
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ce = -np.log(p[np.arange(N), targets])
    k = max(int(0.1 * N), 1)
    want = ce.mean() + np.sort(ce)[::-1][:k].mean()
    got = float(
        focal_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.ones(N, bool))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_balanced_merge_ce():
    logit = jnp.asarray([10.0, -10.0, 10.0, -10.0])
    tgt = jnp.asarray([1, 0, 1, 0])
    ok = jnp.ones(4, bool)
    # perfectly separated -> ~0 loss
    assert float(balanced_merge_ce(logit, tgt, ok)) < 1e-3
    # inverted -> large
    assert float(balanced_merge_ce(-logit, tgt, ok)) > 5.0
    # all one class -> 0 (reference skips when a class is empty)
    assert float(balanced_merge_ce(logit, jnp.ones(4, jnp.int32), ok)) == 0.0


def test_segment_gt_ids_majority():
    segm = jnp.asarray([0] * 8 + [1] * 8, jnp.int32)
    pos = jnp.zeros((16, 3)).at[8:, 0].set(5.0)  # segment 1 at x=5
    gt_xyz = jnp.asarray([[0.0, 0, 0], [5.0, 0, 0]], jnp.float32)
    gt_label = jnp.asarray([7, 3], jnp.int32)
    ids = segment_gt_ids(segm, pos, gt_xyz, gt_label, jnp.ones(2, bool), 8, 16)
    assert int(ids[0]) == 7 and int(ids[1]) == 3
    assert (np.asarray(ids[2:]) == -1).all()


@pytest.fixture(scope="module")
def batch_and_params():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = {
        "fields": init_field_params(key, FCFG),
        "render": init_render_params(jax.random.fold_in(key, 1), FCFG),
    }
    V, G, Nv, C, L = 2, 64, 2, 16, 32
    R = FCFG.view_height * FCFG.view_width
    depth = jnp.asarray(rng.uniform(0.5, 5, (V, HW)).astype(np.float32))
    position = jnp.asarray(np.tile(np.float32([0, 0, 1.25]), (V, 1)))
    heading = jnp.asarray(np.float32([0.0, 0.5]))

    from dynam3d_tpu.geom.projection import unproject_depth_habitat

    def _geo(d, pos, hd):
        rx, ry, rz, pd_, ps_ = unproject_depth_habitat(
            d, hd, height=FCFG.input_height, width=FCFG.input_width,
            hfov_deg=FCFG.input_hfov, vfov_deg=FCFG.input_vfov,
        )
        return jnp.stack([rx, ry, rz], -1) + pos[None, :], pd_, ps_

    ppos, pdir, pscale = jax.vmap(_geo)(depth, position, heading)
    batch = trainer_3dff.PretrainBatch(
        depth=depth,
        grid_fts=jnp.asarray(rng.normal(size=(V, HW, 32)).astype(np.float32)),
        cls_fts=jnp.asarray(rng.normal(size=(V, 32)).astype(np.float32)),
        segm=jnp.asarray(np.tile(np.repeat(np.arange(4), 4), (V, 1)).astype(np.int32)),
        position=position,
        heading=heading,
        gt_xyz=jnp.asarray(rng.uniform(-4, 4, (G, 3)).astype(np.float32)),
        gt_label=jnp.asarray(rng.integers(1, L, G).astype(np.int32)),
        gt_valid=jnp.ones((G,), bool),
        novel_position=jnp.asarray(np.tile(np.float32([0, 0, 1.25]), (Nv, 1))),
        novel_heading=jnp.asarray(np.float32([0.3, 1.0])),
        novel_gt_fts=jnp.asarray(rng.normal(size=(Nv, R, 32)).astype(np.float32)),
        cat_embeddings=jnp.asarray(rng.normal(size=(C, 32)).astype(np.float32)),
        gtid_to_cat=jnp.asarray(rng.integers(-1, C, L).astype(np.int32)),
        gtid_text_fts=jnp.asarray(rng.normal(size=(L, 32)).astype(np.float32)),
        gtid_text_valid=jnp.asarray(rng.uniform(size=L) > 0.3),
        use_labels=jnp.asarray(True),
        ppos=ppos,
        pdir=pdir,
        pscale=pscale,
    )
    return params, batch


def test_pretrain_loss_finite_and_differentiable(batch_and_params):
    params, batch = batch_and_params
    state = init_state(FCFG)
    loss, new_state, metrics = trainer_3dff.pretrain_step_loss(
        params, CFG, state, batch, max_gt_label=32
    )
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.inst_valid.sum()) > 0
    # instances got gt ids recorded
    gtids = np.asarray(new_state.inst_gt_id)[np.asarray(new_state.inst_valid)]
    assert (gtids >= 0).any()

    g = jax.grad(
        lambda p: trainer_3dff.pretrain_step_loss(p, CFG, state, batch, 32)[0]
    )(params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gn) and gn > 0


def test_pretrain_train_step_updates(batch_and_params):
    params, batch = batch_and_params
    opt = trainer_3dff.make_pretrain_optimizer(CFG)
    opt_state = opt.init(params)
    step = jax.jit(trainer_3dff.make_pretrain_step(CFG, opt))
    state = init_state(FCFG)
    new_params, new_opt, new_state, metrics = step(params, opt_state, state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert not bool(metrics["skipped"])
    # params actually moved
    diff = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x[0] - x[1]).sum()),
        jax.tree_util.tree_map(lambda a, b: (a, b), new_params, params),
        0.0,
    )
    assert diff > 0


def test_dataset_id_draw_deterministic():
    ids = [trainer_3dff.draw_dataset_id(0, i) for i in range(20)]
    assert all(0 <= i < 5 for i in ids)
    assert len(set(ids)) > 1
    assert ids == [trainer_3dff.draw_dataset_id(0, i) for i in range(20)]
