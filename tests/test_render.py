"""Tests for the neural feature-field renderer (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynam3d_tpu.config import FieldsConfig
from dynam3d_tpu.models.memory3d import init_state
from dynam3d_tpu.models.render.nerf import (
    init_render_params,
    raw2feature,
    render_panorama,
    render_view,
)

CFG = FieldsConfig(
    fts_dim=32,
    patch_capacity=256,
    view_height=4,
    view_width=4,
    n_samples=33,
    n_importance=4,
    search_num=2,
    mlp_net_layers=4,
    mlp_net_width=32,
    far=10.0,
)


def _state_with_cloud(n=100, seed=0):
    state = init_state(CFG)
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    pos[:, 1] = np.abs(pos[:, 1]) + 1.0  # in front (world +y)
    fts = rng.normal(size=(n, CFG.fts_dim)).astype(np.float32)
    return state._replace(
        patch_pos=state.patch_pos.at[:n].set(jnp.asarray(pos, state.patch_pos.dtype)),
        patch_fts=state.patch_fts.at[:n].set(jnp.asarray(fts, state.patch_fts.dtype)),
        patch_dir=state.patch_dir.at[:n].set(0.3),
        patch_scale=state.patch_scale.at[:n].set(0.05),
        patch_valid=state.patch_valid.at[:n].set(True),
    )


def test_raw2feature_matches_reference_formula():
    """Numpy transcription of raw2feature (src_3dff feature_fields.py:446-474)."""
    rng = np.random.default_rng(0)
    R, NI, NS, D = 3, 4, 16, 8
    feat = rng.normal(size=(R, NI, D)).astype(np.float32)
    dens = rng.normal(size=(R, NI)).astype(np.float32)
    dist = np.sort(rng.uniform(0, 10, (R, NS)).astype(np.float32), axis=-1)
    top = np.stack([np.sort(rng.choice(NS, NI, replace=False)) for _ in range(R)])

    def ref():
        sd = np.log1p(np.exp(dens))  # softplus
        dd = np.abs(dist[..., 1:] - dist[..., :-1])
        dd = np.concatenate([dd, np.full_like(dd[..., :1], 1e10)], -1)
        density = np.zeros((R, NS), np.float32)
        np.put_along_axis(density, top, sd, axis=1)
        alpha = 1.0 - np.exp(-np.maximum(density, 0) * dd)
        trans = np.cumprod(
            np.concatenate([np.ones((R, 1)), 1 - alpha + 1e-10], -1), -1
        )[:, :-1]
        w = alpha * trans
        sw = np.take_along_axis(w, top, axis=1)
        fm = (sw[..., None] * feat).sum(-2)
        fm = fm / np.maximum(np.linalg.norm(fm, axis=-1, keepdims=True), 1e-7)
        dm = (w * dist).sum(-1) / np.maximum(w.sum(-1), 1e-7)
        return fm, dm

    fm, dm = raw2feature(
        jnp.asarray(feat), jnp.asarray(dens), jnp.asarray(dist), jnp.asarray(top)
    )
    rfm, rdm = ref()
    np.testing.assert_allclose(np.asarray(fm), rfm, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dm), rdm, rtol=1e-4, atol=1e-4)


def test_render_view_shapes_and_normalization():
    params = init_render_params(jax.random.PRNGKey(0), CFG)
    state = _state_with_cloud()
    out = render_view(params, CFG, state, jnp.zeros(3), jnp.asarray(0.0))
    assert out.features.shape == (4, 4, CFG.fts_dim)
    assert out.positions.shape == (4, 4, 3)
    f = np.asarray(out.features, np.float32)
    assert np.isfinite(f).all()
    norms = np.linalg.norm(f.reshape(-1, CFG.fts_dim), axis=-1)
    # rays that hit the cloud produce unit-norm features
    assert (np.abs(norms[norms > 0.5] - 1.0) < 0.05).all()
    assert norms.max() > 0.5  # at least some rays hit


def test_render_empty_field_gives_zero_features():
    params = init_render_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    out = render_view(params, CFG, state, jnp.zeros(3), jnp.asarray(0.0))
    # no valid patches -> all neighbors dead -> zero/finite output
    assert np.isfinite(np.asarray(out.features, np.float32)).all()


def test_render_panorama_shapes():
    params = init_render_params(jax.random.PRNGKey(0), CFG)
    state = _state_with_cloud()
    fts, pos = render_panorama(params, CFG, state, jnp.zeros(3), jnp.asarray(0.0))
    assert fts.shape == (4, 16, CFG.fts_dim)
    assert pos.shape == (4, 16, 3)


def test_render_is_differentiable():
    params = init_render_params(jax.random.PRNGKey(0), CFG)
    state = _state_with_cloud()

    def loss(p):
        out = render_view(p, CFG, state, jnp.zeros(3), jnp.asarray(0.0))
        return jnp.sum(out.features.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gn) and gn > 0
