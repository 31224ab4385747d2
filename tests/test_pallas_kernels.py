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


def test_fused_decode_attn_matches_reference():
    """Fused decode-layer attention kernel (interpret mode) == the unfused
    reference chain: rmsnorm -> dequant qkv matvec -> rope -> masked cached
    attention -> dequant o matvec -> residual."""
    import math

    from dynam3d_tpu.ops.pallas_decode import decode_attn_layer
    from dynam3d_tpu.ops.pallas_int4 import pack_int4, int4_matmul

    rng = np.random.default_rng(11)
    D, heads, hd = 256, 4, 64
    half = hd // 2
    L, tmax, li, pos = 3, 512, 1, 77
    eps = 1e-5

    wqkv = rng.normal(scale=0.05, size=(D, 3 * D)).astype(np.float32)
    wo = rng.normal(scale=0.05, size=(D, D)).astype(np.float32)
    qkv_p = pack_int4(jnp.asarray(wqkv), dblk=128, nblk=128)
    o_p = pack_int4(jnp.asarray(wo), dblk=128, nblk=128)
    ln_w = jnp.asarray(rng.normal(scale=0.2, size=(D,)) + 1.0, jnp.float32)

    x = jnp.asarray(rng.normal(size=(1, 1, D)), jnp.bfloat16)
    ck = jnp.zeros((L, 1, tmax, D), jnp.bfloat16)
    cv = jnp.zeros((L, 1, tmax, D), jnp.bfloat16)
    ck = ck.at[li, 0, :pos].set(
        jnp.asarray(rng.normal(size=(pos, D)), jnp.bfloat16)
    )
    cv = cv.at[li, 0, :pos].set(
        jnp.asarray(rng.normal(size=(pos, D)), jnp.bfloat16)
    )
    # mask: prompt rows 0..59 valid, 60..64 padding holes, 65..pos generated
    mask = np.zeros(tmax, np.float32)
    mask[:60] = 1.0
    mask[65:pos] = 1.0

    position = pos  # rope position of the current token
    freqs = 1e4 ** (-np.arange(half) / half)
    cos = jnp.asarray(np.cos(position * freqs), jnp.float32)
    sin = jnp.asarray(np.sin(position * freqs), jnp.float32)

    out, k_new, v_new = decode_attn_layer(
        x, ln_w, qkv_p, o_p, ck, cv, li, pos, jnp.asarray(mask), cos, sin,
        eps=eps, heads=heads, hd=hd, interpret=True,
    )

    # ---- unfused reference (same quantized weights) ----
    xf = np.asarray(x, np.float32).reshape(1, D)
    var = (xf * xf).mean(-1, keepdims=True)
    h = (xf / np.sqrt(var + eps) * np.asarray(ln_w)).astype(np.float32)
    h = jnp.asarray(h, jnp.bfloat16)
    y = np.asarray(int4_matmul(h, qkv_p, out_dtype=jnp.float32))

    def rope(v):
        vv = v.reshape(heads, hd).astype(np.float32)
        v1, v2 = vv[:, :half], vv[:, half:]
        c, s = np.cos(position * freqs), np.sin(position * freqs)
        return np.concatenate([v1 * c - v2 * s, v2 * c + v1 * s], -1)

    q_r = rope(y[0, :D].astype(np.float32)).astype(np.float32)
    k_r = rope(y[0, D : 2 * D]).astype(np.float32)
    v_r = y[0, 2 * D :].reshape(heads, hd).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(k_new, np.float32).reshape(heads, hd), k_r,
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(v_new, np.float32).reshape(heads, hd), v_r,
        rtol=2e-2, atol=2e-2,
    )

    kk = np.asarray(ck[li, 0], np.float32).reshape(tmax, heads, hd)
    vv = np.asarray(cv[li, 0], np.float32).reshape(tmax, heads, hd)
    kk[pos] = k_r
    vv[pos] = v_r
    att_mask = mask.astype(bool).copy()
    att_mask[pos] = True
    logits = np.einsum("hd,thd->ht", q_r, kk) / math.sqrt(hd)
    logits[:, ~att_mask] = -1e30
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ctx = np.einsum("ht,thd->hd", p, vv).reshape(1, D)
    o_out = np.asarray(
        int4_matmul(jnp.asarray(ctx, jnp.bfloat16), o_p, out_dtype=jnp.float32)
    )
    want = np.asarray(x, np.float32).reshape(1, D) + o_out

    np.testing.assert_allclose(
        np.asarray(out, np.float32).reshape(1, D), want,
        rtol=5e-2, atol=5e-2,
    )


def test_fused_decode_forward_matches_unfused(monkeypatch):
    """_decode_forward_fused (fused attention kernel per layer, interpret
    mode) == decode_forward on the XLA int4 path: same logits and same
    cache rows, at eligible dims with prompt-padding holes in the mask."""
    import functools

    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3
    from dynam3d_tpu.ops import pallas_decode
    from dynam3d_tpu.ops.pallas_int4 import pack_int4

    cfg = Phi3Config(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=64,
        pad_token_id=260, end_token_id=257,
    )
    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    qparams = phi3.quantize_phi3(params, bits=4)
    # repack qkv/o without padding (the eligibility the kernel requires);
    # the default nblk=512 pads 3*256=768 columns up to 1024
    for li in range(cfg.num_layers):
        lp = params["layers"][li]
        qlp = qparams["layers"][li]
        qlp["qkv"]["q4"] = pack_int4(
            lp["qkv"].astype(jnp.float32), dblk=128, nblk=128
        )
        qlp["o"]["q4"] = pack_int4(
            lp["o"].astype(jnp.float32), dblk=128, nblk=128
        )

    monkeypatch.setattr(
        phi3, "decode_attn_layer", None, raising=False
    )  # ensure the import inside _decode_forward_fused is used
    monkeypatch.setattr(
        pallas_decode, "decode_attn_layer",
        functools.partial(
            pallas_decode.decode_attn_layer.__wrapped__, interpret=True
        ),
    )

    rng = np.random.default_rng(2)
    B, T, D = 1, 40, cfg.hidden_size
    total = 512  # _ROWS-aligned
    cache = phi3.init_cache(cfg, B, total, dtype=jnp.bfloat16)
    # prefill a short prompt so the cache has real rows
    embeds = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
    av = np.ones((B, T), bool)
    av[0, 30:34] = False  # padding holes
    av = jnp.asarray(av)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    # one decode step at slot T
    valid = np.zeros((B, total), bool)
    valid[0, :T] = np.asarray(av)[0]
    valid[0, T] = True
    valid = jnp.asarray(valid)
    e = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.bfloat16)
    pos = (jnp.sum(valid, axis=1) - 1)[:, None]

    logits_u, cache_u = phi3.decode_forward(
        qparams, cfg, e, pos, cache, T, valid[:, None, :]
    )
    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, B, total, D),
        cache.v.reshape(cfg.num_layers, B, total, D),
    )
    logits_f, cache_f = phi3._decode_forward_fused(
        qparams, cfg, e, pos, flat, T, valid
    )

    np.testing.assert_allclose(
        np.asarray(logits_f, np.float32), np.asarray(logits_u, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    assert int(jnp.argmax(logits_f[0, 0])) == int(jnp.argmax(logits_u[0, 0]))
    np.testing.assert_allclose(
        np.asarray(cache_f.k[:, 0, T], np.float32),
        np.asarray(cache_u.k[:, 0, T].reshape(cfg.num_layers, D), np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_int4_mlp_block_matches_unfused():
    """int4_mlp_block (norm + SwiGLU + down + residual in one kernel,
    interpret mode) == the rmsnorm -> int4_mlp -> add chain."""
    from dynam3d_tpu.ops.pallas_int4 import (
        _pallas_int4_mlp_block, int4_mlp, pack_int4,
    )

    rng = np.random.default_rng(9)
    D, I = 256, 512
    eps = 1e-5
    wgu = rng.normal(scale=0.05, size=(D, 2 * I)).astype(np.float32)
    wdn = rng.normal(scale=0.05, size=(I, D)).astype(np.float32)
    gu = pack_int4(jnp.asarray(wgu), dblk=128, nblk=128)
    dn = pack_int4(jnp.asarray(wdn), dblk=128, nblk=128)
    lnw = jnp.asarray(rng.normal(scale=0.2, size=(1, D)) + 1.0, jnp.float32)

    x = rng.normal(size=(16, D)).astype(np.float32)
    xp = jnp.asarray(x, jnp.bfloat16)
    y = _pallas_int4_mlp_block(xp, lnw, gu, dn, eps, interpret=True)

    xf = np.asarray(xp, np.float32)
    var = (xf * xf).mean(-1, keepdims=True)
    h = jnp.asarray(
        xf / np.sqrt(var + eps) * np.asarray(lnw), jnp.bfloat16
    )
    want = xf + np.asarray(int4_mlp(h, gu, dn, out_dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(y), want, rtol=5e-2, atol=5e-2
    )


def test_blocked_layout_matches_flat():
    """Block-major int4 storage ([nb, Dp, nblk], contiguous DMA blocks) is
    numerically identical to the flat layout across the matvec, fused MLP,
    MLP-block, XLA fallback, and fused decode-attention kernels."""
    import functools

    from dynam3d_tpu.ops.pallas_decode import decode_attn_layer
    from dynam3d_tpu.ops.pallas_int4 import (
        _pallas_int4_matmul, _pallas_int4_mlp, _pallas_int4_mlp_block,
        _xla_int4_matmul, pack_int4, unblock_q4,
    )

    rng = np.random.default_rng(4)
    D, I = 256, 512
    w = jnp.asarray(rng.normal(scale=0.05, size=(D, 2 * I)), jnp.float32)
    flat = pack_int4(w, dblk=128, nblk=128)
    blk = pack_int4(w, dblk=128, nblk=128, blocked=True)
    np.testing.assert_array_equal(np.asarray(unblock_q4(blk)),
                                  np.asarray(flat.q4))

    xp = jnp.asarray(rng.normal(size=(16, D)), jnp.bfloat16)
    y_flat = _pallas_int4_matmul(xp, flat, interpret=True)
    y_blk = _pallas_int4_matmul(xp, blk, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_flat), np.asarray(y_blk))
    np.testing.assert_allclose(
        np.asarray(_xla_int4_matmul(xp, blk)),
        np.asarray(_xla_int4_matmul(xp, flat)), rtol=1e-6,
    )

    wdn = jnp.asarray(rng.normal(scale=0.05, size=(I, D)), jnp.float32)
    dn_flat = pack_int4(wdn, dblk=128, nblk=128)
    dn_blk = pack_int4(wdn, dblk=128, nblk=128, blocked=True)
    m_flat = _pallas_int4_mlp(xp, flat, dn_flat, interpret=True)
    m_blk = _pallas_int4_mlp(xp, blk, dn_blk, interpret=True)
    np.testing.assert_array_equal(np.asarray(m_flat), np.asarray(m_blk))

    lnw = jnp.ones((1, D), jnp.float32)
    b_flat = _pallas_int4_mlp_block(xp, lnw, flat, dn_flat, 1e-5,
                                    interpret=True)
    b_blk = _pallas_int4_mlp_block(xp, lnw, blk, dn_blk, 1e-5,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(b_flat), np.asarray(b_blk))

    # fused decode attention: blocked qkv/o
    heads, hd = 4, 64
    L, tmax, pos = 2, 512, 70
    wqkv = jnp.asarray(rng.normal(scale=0.05, size=(D, 3 * D)), jnp.float32)
    wo = jnp.asarray(rng.normal(scale=0.05, size=(D, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 1, D)), jnp.bfloat16)
    ck = jnp.asarray(rng.normal(scale=0.1, size=(L, 1, tmax, D)), jnp.bfloat16)
    cv = jnp.asarray(rng.normal(scale=0.1, size=(L, 1, tmax, D)), jnp.bfloat16)
    mask = np.zeros(tmax, np.float32)
    mask[:pos] = 1.0
    half = hd // 2
    freqs = 1e4 ** (-np.arange(half) / half)
    cos = jnp.asarray(np.cos(pos * freqs), jnp.float32)
    sin = jnp.asarray(np.sin(pos * freqs), jnp.float32)
    outs = []
    for blocked in (False, True):
        qkv_p = pack_int4(wqkv, dblk=128, nblk=128, blocked=blocked)
        o_p = pack_int4(wo, dblk=128, nblk=128, blocked=blocked)
        out, k_new, v_new = decode_attn_layer(
            x, jnp.ones(D, jnp.float32), qkv_p, o_p, ck, cv, 0, pos,
            jnp.asarray(mask), cos, sin,
            eps=1e-5, heads=heads, hd=hd, interpret=True,
        )
        outs.append((np.asarray(out), np.asarray(k_new), np.asarray(v_new)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)


def test_fused_decode_ring_matches_split(monkeypatch):
    """decode_layer_ring (whole-layer program: qkv + attention + o + MLP in
    one kernel, interpret mode) == the split fused path (attention program +
    int4_mlp_block), logits and cache rows, at eligible dims."""
    import functools

    from dynam3d_tpu import flags
    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3
    from dynam3d_tpu.ops import pallas_decode
    from dynam3d_tpu.ops.pallas_int4 import pack_int4

    cfg = Phi3Config(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=64,
        pad_token_id=260, end_token_id=257,
    )
    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    qparams = phi3.quantize_phi3(params, bits=4)
    # repack all four weight groups at matching small blocks (the whole-layer
    # kernel's eligibility: shared dblk/nblk, no packing padding)
    for li in range(cfg.num_layers):
        lp = params["layers"][li]
        qlp = qparams["layers"][li]
        for name in ("qkv", "o", "gate_up", "down"):
            qlp[name]["q4"] = pack_int4(
                lp[name].astype(jnp.float32), dblk=128, nblk=128
            )

    monkeypatch.setattr(
        pallas_decode, "decode_attn_layer",
        functools.partial(
            pallas_decode.decode_attn_layer.__wrapped__, interpret=True
        ),
    )
    # hold the (default-on) ring kernel back until its own block below
    monkeypatch.setattr(flags, "FUSED_DECODE_RING", False)

    rng = np.random.default_rng(5)
    B, T, D = 1, 40, cfg.hidden_size
    total = 512
    cache = phi3.init_cache(cfg, B, total, dtype=jnp.bfloat16)
    embeds = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
    av = np.ones((B, T), bool)
    av[0, 30:34] = False
    av = jnp.asarray(av)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    valid = np.zeros((B, total), bool)
    valid[0, :T] = np.asarray(av)[0]
    valid[0, T] = True
    valid = jnp.asarray(valid)
    e = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.bfloat16)
    pos = (jnp.sum(valid, axis=1) - 1)[:, None]
    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, B, total, D),
        cache.v.reshape(cfg.num_layers, B, total, D),
    )

    assert phi3._fused_layer_eligible(qparams, cfg)

    # manual-ring variant: one whole-layer program, deep-lookahead DMA ring
    monkeypatch.setattr(
        pallas_decode, "decode_layer_ring",
        functools.partial(
            pallas_decode.decode_layer_ring.__wrapped__, interpret=True
        ),
    )
    monkeypatch.setattr(flags, "FUSED_DECODE_RING", True)
    logits_r, cache_r = phi3._decode_forward_fused(
        qparams, cfg, e, pos, flat, T, valid
    )
    monkeypatch.setattr(flags, "FUSED_DECODE_RING", False)

    # with the ring flag off, dispatch falls back to the split path
    # (eligibility itself is structural and stays True)
    assert phi3._fused_layer_eligible(qparams, cfg)
    assert not phi3._ring_eligible(qparams, cfg)
    logits_s, cache_s = phi3._decode_forward_fused(
        qparams, cfg, e, pos, flat, T, valid
    )

    np.testing.assert_allclose(
        np.asarray(logits_r, np.float32), np.asarray(logits_s, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    assert int(jnp.argmax(logits_r[0, 0])) == int(jnp.argmax(logits_s[0, 0]))
    np.testing.assert_allclose(
        np.asarray(cache_r.k[:, 0, T], np.float32),
        np.asarray(cache_s.k[:, 0, T], np.float32),
        rtol=3e-2, atol=3e-2,
    )

    np.testing.assert_allclose(
        np.asarray(cache_r.v[:, 0, T], np.float32),
        np.asarray(cache_s.v[:, 0, T], np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_fused_decode_ring_batched_matches_unfused(monkeypatch):
    """decode_layer_ring at B=3 (per-row caches, positions, masks and rope;
    shared weight streams) == decode_forward on the XLA int4 path, logits
    and per-row cache writes, with different prompt lengths per row."""
    import functools

    from dynam3d_tpu import flags
    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3
    from dynam3d_tpu.ops import pallas_decode
    from dynam3d_tpu.ops.pallas_int4 import pack_int4

    cfg = Phi3Config(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=64,
        pad_token_id=260, end_token_id=257,
    )
    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    qparams = phi3.quantize_phi3(params, bits=4)
    for li in range(cfg.num_layers):
        lp = params["layers"][li]
        qlp = qparams["layers"][li]
        for name in ("qkv", "o", "gate_up", "down"):
            qlp[name]["q4"] = pack_int4(
                lp[name].astype(jnp.float32), dblk=128, nblk=128
            )

    monkeypatch.setattr(
        pallas_decode, "decode_layer_ring",
        functools.partial(
            pallas_decode.decode_layer_ring.__wrapped__, interpret=True
        ),
    )
    monkeypatch.setattr(flags, "FUSED_DECODE_RING", True)

    rng = np.random.default_rng(13)
    B, T, D = 3, 40, cfg.hidden_size
    total = 512
    cache = phi3.init_cache(cfg, B, total, dtype=jnp.bfloat16)
    embeds = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
    # rows with DIFFERENT valid prompt lengths (right padding)
    av = np.zeros((B, T), bool)
    av[0, :40] = True
    av[1, :25] = True
    av[2, :33] = True
    av[1, 10:13] = False  # plus a padding hole mid-prompt
    av = jnp.asarray(av)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    valid = np.zeros((B, total), bool)
    valid[:, :T] = np.asarray(av)
    valid[:, T] = True
    valid = jnp.asarray(valid)
    e = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.bfloat16)
    pos = (jnp.sum(valid, axis=1) - 1)[:, None]

    logits_u, cache_u = phi3.decode_forward(
        qparams, cfg, e, pos, cache, T, valid[:, None, :]
    )
    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, B, total, D),
        cache.v.reshape(cfg.num_layers, B, total, D),
    )
    assert phi3._ring_eligible(qparams, cfg)
    logits_r, cache_r = phi3._decode_forward_fused(
        qparams, cfg, e, pos, flat, T, valid
    )

    np.testing.assert_allclose(
        np.asarray(logits_r, np.float32), np.asarray(logits_u, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    for b in range(B):
        assert int(jnp.argmax(logits_r[b, 0])) == int(
            jnp.argmax(logits_u[b, 0])
        ), b
    np.testing.assert_allclose(
        np.asarray(cache_r.k[:, :, T], np.float32),
        np.asarray(
            cache_u.k[:, :, T].reshape(cfg.num_layers, B, D), np.float32
        ),
        rtol=3e-2, atol=3e-2,
    )


def test_fused_decode_ring_full_batch(monkeypatch):
    """decode_layer_ring at B=8 (= _BP, no padding rows) matches the
    unfused path — the top edge of the batched-serving range."""
    import functools

    from dynam3d_tpu import flags
    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3
    from dynam3d_tpu.ops import pallas_decode
    from dynam3d_tpu.ops.pallas_int4 import pack_int4

    cfg = Phi3Config(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=1, num_heads=4, num_kv_heads=4, head_dim=64,
        pad_token_id=260, end_token_id=257,
    )
    params = phi3.init_phi3_params(jax.random.PRNGKey(1), cfg)
    qparams = phi3.quantize_phi3(params, bits=4)
    lp, qlp = params["layers"][0], qparams["layers"][0]
    for name in ("qkv", "o", "gate_up", "down"):
        qlp[name]["q4"] = pack_int4(
            lp[name].astype(jnp.float32), dblk=128, nblk=128
        )

    monkeypatch.setattr(
        pallas_decode, "decode_layer_ring",
        functools.partial(
            pallas_decode.decode_layer_ring.__wrapped__, interpret=True
        ),
    )
    monkeypatch.setattr(flags, "FUSED_DECODE_RING", True)

    rng = np.random.default_rng(21)
    B, T, D = pallas_decode._BP, 16, cfg.hidden_size
    total = 512
    cache = phi3.init_cache(cfg, B, total, dtype=jnp.bfloat16)
    embeds = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
    av = np.ones((B, T), bool)
    for b in range(B):
        av[b, T - (b % 5) :] = (b % 5) == 0   # varied prompt lengths
    av = jnp.asarray(av)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    valid = np.zeros((B, total), bool)
    valid[:, :T] = np.asarray(av)
    valid[:, T] = True
    valid = jnp.asarray(valid)
    e = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.bfloat16)
    pos = (jnp.sum(valid, axis=1) - 1)[:, None]

    logits_u, _ = phi3.decode_forward(
        qparams, cfg, e, pos, cache, T, valid[:, None, :]
    )
    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, B, total, D),
        cache.v.reshape(cfg.num_layers, B, total, D),
    )
    logits_r, _ = phi3._decode_forward_fused(
        qparams, cfg, e, pos, flat, T, valid
    )
    np.testing.assert_allclose(
        np.asarray(logits_r, np.float32), np.asarray(logits_u, np.float32),
        rtol=5e-2, atol=5e-2,
    )
