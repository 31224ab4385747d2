"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynam3d_tpu.ops.knn import knn_brute
from dynam3d_tpu.ops.pallas_knn import pallas_knn
from dynam3d_tpu.ops.pallas_mlp import fused_nerf_mlp
from dynam3d_tpu.config import FieldsConfig
from dynam3d_tpu.models.render.nerf import init_render_params


def test_pallas_knn_matches_brute():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(1024, 3)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=1024) > 0.2)
    bd, bi = knn_brute(q, p, valid, 4)
    pd, pi = pallas_knn(q, p, valid, 4, tile_q=128, chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(bd), rtol=1e-4, atol=1e-4)
    # indices agree up to distance ties
    d_at = np.take_along_axis(
        np.asarray(
            ((np.asarray(q)[:, None] - np.asarray(p)[None]) ** 2).sum(-1)
        ),
        np.asarray(pi),
        axis=1,
    )
    np.testing.assert_allclose(d_at, np.asarray(bd), rtol=1e-4, atol=1e-4)


def test_pallas_knn_all_dead():
    q = jnp.zeros((8, 3))
    p = jnp.ones((256, 3))
    d, i = pallas_knn(q, p, jnp.zeros(256, bool), 2, tile_q=8, chunk=256, interpret=True)
    assert np.all(np.asarray(d) >= 1e9)


def test_fused_nerf_mlp_matches_reference_chain():
    cfg = FieldsConfig(fts_dim=128, mlp_net_width=128, mlp_net_layers=4)
    params = init_render_params(jax.random.PRNGKey(0), cfg)["mlp"]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(200, 128)).astype(np.float32))

    # jnp reference chain (the non-pallas branch of nerf_mlp)
    def ref(x):
        h = x.astype(jnp.bfloat16)
        for w in params["enc_hidden"]:
            h = jax.nn.leaky_relu(
                jnp.dot(h, w, preferred_element_type=jnp.float32), 0.01
            ).astype(jnp.bfloat16)
        eo = jax.nn.leaky_relu(
            jnp.dot(h, params["enc_out"], preferred_element_type=jnp.float32), 0.01
        )
        enc, dens = eo[..., :-1], eo[..., -1]
        h = (enc + x.astype(jnp.float32)).astype(jnp.bfloat16)
        for w in params["dec_hidden"]:
            h = jax.nn.leaky_relu(
                jnp.dot(h, w, preferred_element_type=jnp.float32), 0.01
            ).astype(jnp.bfloat16)
        return jnp.dot(h, params["dec_out"], preferred_element_type=jnp.float32), dens

    want_out, want_dens = ref(x)
    got_out, got_dens = fused_nerf_mlp(
        x, params["enc_hidden"][0], params["enc_hidden"][1], params["enc_out"],
        params["dec_hidden"][0], params["dec_hidden"][1], params["dec_out"],
        tile=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_out, np.float32), np.asarray(want_out, np.float32),
        rtol=0.05, atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(got_dens, np.float32), np.asarray(want_dens, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_pallas_int4_matmul_matches_dequant():
    """Unpack-in-VMEM int4 kernel (interpret mode) == XLA dequant fallback,
    and both track the fp matmul within the 4-bit budget."""
    from dynam3d_tpu.ops.pallas_int4 import (
        _pallas_int4_matmul,
        _xla_int4_matmul,
        pack_int4,
    )

    rng = np.random.default_rng(0)
    D, N, B = 640, 1100, 3   # deliberately unaligned: pads to 1024/2048
    w = rng.normal(size=(D, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(B, D)).astype(np.float32)
    pk = pack_int4(jnp.asarray(w))
    assert pk.q4.shape == (1024, 1024) and pk.s_lo.shape == (1, 1024)

    xp = jnp.pad(
        jnp.asarray(x, jnp.bfloat16), ((0, 16 - B), (0, pk.q4.shape[0] - D))
    )
    yk = _pallas_int4_matmul(xp, pk, interpret=True)
    yf = _xla_int4_matmul(xp, pk)
    np.testing.assert_allclose(
        np.asarray(yk), np.asarray(yf), rtol=2e-2, atol=2e-2
    )
    # padded region of the weight is exactly zero
    np.testing.assert_array_equal(np.asarray(yk[:, N:]), 0.0)
    # the 2D-grid accumulation variant computes the same result
    from dynam3d_tpu.ops.pallas_int4 import _pallas_int4_matmul2d

    y2 = _pallas_int4_matmul2d(xp, pk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(yf), rtol=2e-2, atol=2e-2
    )
    # quantization tracks fp (statistical: ~s/2 per element over D=640
    # accumulation terms; the tight correctness check is kernel==fallback)
    y_fp = x @ w
    err = np.abs(np.asarray(yf[:B, :N]) - y_fp).max()
    assert err < 0.2 * np.abs(y_fp).max(), err


def test_pallas_int4_fused_mlp_matches_unfused():
    """Fused SwiGLU MLP kernel (interpret mode) == unfused two-matmul path:
    the persistent-scratch phase handoff (gate/up -> h -> down) is exact."""
    from dynam3d_tpu.ops.pallas_int4 import (
        _pallas_int4_mlp,
        int4_matmul,
        pack_int4,
    )

    rng = np.random.default_rng(2)
    D, I, B = 1024, 1024, 2     # I % nblk == 0: the fused-path requirement
    w_gate = rng.normal(size=(D, I)).astype(np.float32) * 0.05
    w_up = rng.normal(size=(D, I)).astype(np.float32) * 0.05
    w_down = rng.normal(size=(I, D)).astype(np.float32) * 0.05
    gu = pack_int4(jnp.asarray(np.concatenate([w_gate, w_up], 1)))
    dn = pack_int4(jnp.asarray(w_down))
    assert gu.n == 2 * gu.q4.shape[1]  # no column padding: halves align

    x = rng.normal(size=(B, D)).astype(np.float32)
    xp = jnp.pad(jnp.asarray(x, jnp.bfloat16), ((0, 16 - B), (0, 0)))
    y_fused = _pallas_int4_mlp(xp, gu, dn, interpret=True)[:B, :D]

    h = int4_matmul(jnp.asarray(x), gu, out_dtype=jnp.float32)
    g, u = jnp.split(h, 2, axis=-1)
    hh = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    y_ref = int4_matmul(hh, dn, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=3e-2, atol=3e-2
    )


def test_full_step_fused_matches_two_phase():
    """full_step == perceive + generate run separately."""
    from dynam3d_tpu.models import policy as policy_mod
    from tests.test_e2e_slice import tiny_config

    cfg = tiny_config()
    params = policy_mod.init_policy_params(
        jax.random.PRNGKey(0), cfg, llm_dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    B, V = 1, 1
    rgb = jnp.asarray(rng.integers(0, 255, (B, V, 56, 56, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.uniform(0.05, 0.9, (B, V, 32, 32)).astype(np.float32))
    pos = jnp.asarray([[1.0, 1.25, 2.0]], jnp.float32)
    hd = jnp.zeros((B,), jnp.float32)
    state = policy_mod.batched_init_state(cfg, B)

    from dynam3d_tpu.models.vlm.tokenizer import ByteTokenizer, build_prompt

    tok = ByteTokenizer(512)
    n_mm = V * 16 + policy_mod.I_ENV + policy_mod.Z_ENV
    ids_l = tok.encode(build_prompt("go", ["none\n"] * 4, n_mm))
    T = 448
    ids = np.full((B, T), tok.pad_id, np.int32)
    val = np.zeros((B, T), bool)
    ids[0, : len(ids_l)] = ids_l
    val[0, : len(ids_l)] = True
    splice = ids_l.index(tok.image_id)

    out = policy_mod.perceive(params, cfg, state, rgb, depth, pos, hd)
    gen2 = policy_mod.generate_action_ids(
        params, cfg, jnp.asarray(ids), jnp.asarray(val),
        out.mm_tokens, out.mm_valid, splice,
    )
    _, gen1 = policy_mod.full_step(
        params, cfg, state, rgb, depth, pos, hd,
        jnp.asarray(ids), jnp.asarray(val), splice,
    )
    np.testing.assert_array_equal(np.asarray(gen1), np.asarray(gen2))
