"""Speculative greedy decode (n-gram prompt-lookup drafts): exactness vs
plain greedy_decode, acceptance machinery, and stop/clamp semantics.

The contract under test: greedy_decode_spec emits token-for-token the SAME
stream as greedy_decode (the reference's ``llava.generate(max_new_tokens=20,
do_sample=False)``, Policy_Dynam3D_VLN.py:463) — speculation only changes
how many forward passes it takes, never the tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynam3d_tpu.config import Phi3Config
from dynam3d_tpu.models.vlm import phi3


def _cfg():
    return Phi3Config(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        pad_token_id=260, end_token_id=257,
    )


def _prompt(cfg, seed, T=24, B=1):
    rng = np.random.default_rng(seed)
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(B, T, cfg.hidden_size)), jnp.bfloat16
    )
    valid = np.ones((B, T), bool)
    valid[0, 10:13] = False   # padding holes exercise the mask path
    return embeds, jnp.asarray(valid)


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_spec_matches_greedy_exact(seed):
    cfg = _cfg()
    params = phi3.init_phi3_params(jax.random.PRNGKey(seed), cfg)
    embeds, valid = _prompt(cfg, seed)
    n = 12

    ref = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=-1))(
            params, embeds, valid)
    )
    got, stats = jax.jit(
        lambda p, e, v: phi3.greedy_decode_spec(
            p, cfg, e, v, n, stop_token=-1, return_stats=True)
    )(params, embeds, valid)
    got = np.asarray(got)
    np.testing.assert_array_equal(got, ref)
    assert int(stats["tokens"]) == n
    assert 1 <= int(stats["passes"]) <= n


def test_spec_accepts_planted_continuation():
    """Plant the true greedy continuation in lookup_ids (the retrieval /
    templated-action regime): the draft should hit, so the pass count
    drops below the token count while the output stays EXACT."""
    cfg = _cfg()
    params = phi3.init_phi3_params(jax.random.PRNGKey(3), cfg)
    embeds, valid = _prompt(cfg, 3)
    n = 16

    ref = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=-1))(
            params, embeds, valid)
    )[0]
    # lookup contains the exact continuation, prefixed/suffixed with noise
    lookup = np.full((n + 8,), -1, np.int32)
    lookup[3 : 3 + n] = ref
    got, stats = jax.jit(
        lambda p, e, v, lk: phi3.greedy_decode_spec(
            p, cfg, e, v, n, stop_token=-1, lookup_ids=lk,
            return_stats=True)
    )(params, embeds, valid, jnp.asarray(lookup))
    np.testing.assert_array_equal(np.asarray(got)[0], ref)
    # with the continuation planted, acceptance must beat 1 token/pass
    assert int(stats["passes"]) < int(stats["tokens"])


def test_spec_stop_semantics_match():
    """Pick a stop token the model actually emits mid-stream: spec must
    stop at the same position and pad after, exactly like plain greedy."""
    cfg = _cfg()
    params = phi3.init_phi3_params(jax.random.PRNGKey(5), cfg)
    embeds, valid = _prompt(cfg, 5)
    n = 12

    free = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=-1))(
            params, embeds, valid)
    )[0]
    stop = int(free[4])   # force a stop 5 tokens in

    ref = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=stop))(
            params, embeds, valid)
    )
    got = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode_spec(
            p, cfg, e, v, n, stop_token=stop))(params, embeds, valid)
    )
    np.testing.assert_array_equal(got, ref)


def test_spec_short_budget_clamps():
    """max_new_tokens smaller than the draft window: the acceptance clamp
    must never write past the output buffer."""
    cfg = _cfg()
    params = phi3.init_phi3_params(jax.random.PRNGKey(2), cfg)
    embeds, valid = _prompt(cfg, 2)
    for n in (2, 3):
        ref = np.asarray(
            jax.jit(lambda p, e, v, n=n: phi3.greedy_decode(
                p, cfg, e, v, n, stop_token=-1))(params, embeds, valid)
        )
        got = np.asarray(
            jax.jit(lambda p, e, v, n=n: phi3.greedy_decode_spec(
                p, cfg, e, v, n, stop_token=-1, draft_len=4))(
                params, embeds, valid)
        )
        np.testing.assert_array_equal(got, ref)


def _quantized_eligible(cfg, seed=0):
    """Params quantized + repacked so the ring kernel (and therefore the
    shared-cache verify mode) is structurally eligible at tiny dims."""
    from dynam3d_tpu.ops.pallas_int4 import pack_int4

    params = phi3.init_phi3_params(jax.random.PRNGKey(seed), cfg)
    qparams = phi3.quantize_phi3(params, bits=4)
    for li in range(cfg.num_layers):
        lp = params["layers"][li]
        qlp = qparams["layers"][li]
        for name in ("qkv", "o", "gate_up", "down"):
            qlp[name]["q4"] = pack_int4(
                lp[name].astype(jnp.float32), dblk=64, nblk=64
            )
    return qparams


def _interpret_ring(monkeypatch):
    import functools

    from dynam3d_tpu import flags
    from dynam3d_tpu.ops import pallas_decode

    monkeypatch.setattr(
        pallas_decode, "decode_layer_ring",
        functools.partial(
            pallas_decode.decode_layer_ring.__wrapped__, interpret=True
        ),
    )
    monkeypatch.setattr(flags, "FUSED_DECODE_ATTN", True)
    monkeypatch.setattr(flags, "FUSED_DECODE_RING", True)
    # eligibility checks jax.default_backend() == "tpu"; bypass for the
    # interpret-mode run
    monkeypatch.setattr(
        phi3, "_fused_decode_eligible",
        lambda p, c, b: phi3._ring_eligible(p, c),
    )


def test_verify_forward_fused_matches_xla(monkeypatch):
    """The shared-cache ring verify pass == decode_forward with the
    per-row causal mask: logits close, argmax equal, cache rows equal."""
    cfg = _cfg()
    qparams = _quantized_eligible(cfg)
    _interpret_ring(monkeypatch)
    rng = np.random.default_rng(11)

    T, total, k = 24, 512, 4   # total must be a _ROWS multiple
    D = cfg.hidden_size
    embeds, av = _prompt(cfg, 11, T=T)
    cache = phi3.init_cache(cfg, 1, total, dtype=jnp.bfloat16)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    valid = np.zeros((1, total), bool)
    valid[0, :T] = np.asarray(av)[0]
    valid = jnp.asarray(valid)
    n_pos0 = int(np.asarray(av).sum())
    e = jnp.asarray(rng.normal(scale=0.5, size=(1, k, D)), jnp.bfloat16)

    # XLA reference: decode_forward with the row-causal mask
    kk = jnp.arange(k)
    t_iota = jnp.arange(total)
    row_extra = (t_iota[None] >= T) & (t_iota[None] <= T + kk[:, None])
    m = valid[:, None, :] | row_extra[None]
    pos = (n_pos0 + kk)[None]
    lg_ref, c_ref = phi3.decode_forward(
        qparams, cfg, e, pos, cache, T, m
    )

    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, 1, total, D),
        cache.v.reshape(cfg.num_layers, 1, total, D),
    )
    lg_f, c_f = phi3._verify_forward_fused(
        qparams, cfg, e, n_pos0, flat, T, valid
    )

    np.testing.assert_allclose(
        np.asarray(lg_f, np.float32), np.asarray(lg_ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(lg_f[0]), -1), np.argmax(np.asarray(lg_ref[0]), -1)
    )
    np.testing.assert_allclose(
        np.asarray(c_f.k[:, 0, T : T + k], np.float32),
        np.asarray(c_ref.k[:, 0, T : T + k], np.float32).reshape(
            cfg.num_layers, k, D),
        rtol=3e-2, atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(c_f.v[:, 0, T : T + k], np.float32),
        np.asarray(c_ref.v[:, 0, T : T + k], np.float32).reshape(
            cfg.num_layers, k, D),
        rtol=3e-2, atol=3e-2,
    )


def test_spec_fused_e2e_self_consistent(monkeypatch):
    """greedy_decode_spec over the fused shared-cache verify kernel: runs
    end-to-end, and planting its OWN output as lookup reproduces the
    stream exactly with fewer passes than tokens (acceptance works)."""
    cfg = _cfg()
    qparams = _quantized_eligible(cfg, seed=4)
    _interpret_ring(monkeypatch)
    embeds, valid = _prompt(cfg, 4)
    n = 12

    out1, st1 = phi3.greedy_decode_spec(
        qparams, cfg, embeds, valid, n, stop_token=-1, return_stats=True
    )
    out1 = np.asarray(out1)
    assert out1.shape == (1, n)
    assert int(st1["tokens"]) == n

    lk = np.full((n + 8,), -1, np.int32)
    lk[2 : 2 + n] = out1[0]
    out2, st2 = phi3.greedy_decode_spec(
        qparams, cfg, embeds, valid, n, stop_token=-1,
        lookup_ids=jnp.asarray(lk), return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(out2), out1)
    assert int(st2["passes"]) < int(st2["tokens"])


@pytest.mark.parametrize("k", [2, 3, 5, 8])
def test_verify_fused_k_sweep(monkeypatch, k):
    """Shared-cache verify at every draft width (odd k exercises the
    dead-row padding and non-lane-aligned row counts)."""
    cfg = _cfg()
    qparams = _quantized_eligible(cfg, seed=k)
    _interpret_ring(monkeypatch)
    rng = np.random.default_rng(20 + k)

    T, total = 30, 512
    D = cfg.hidden_size
    embeds, av = _prompt(cfg, 20 + k, T=T)
    cache = phi3.init_cache(cfg, 1, total, dtype=jnp.bfloat16)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    valid = np.zeros((1, total), bool)
    valid[0, :T] = np.asarray(av)[0]
    valid = jnp.asarray(valid)
    n_pos0 = int(np.asarray(av).sum())
    e = jnp.asarray(rng.normal(scale=0.5, size=(1, k, D)), jnp.bfloat16)

    kk = jnp.arange(k)
    t_iota = jnp.arange(total)
    row_extra = (t_iota[None] >= T) & (t_iota[None] <= T + kk[:, None])
    m = valid[:, None, :] | row_extra[None]
    pos = (n_pos0 + kk)[None]
    lg_ref, _ = phi3.decode_forward(qparams, cfg, e, pos, cache, T, m)

    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, 1, total, D),
        cache.v.reshape(cfg.num_layers, 1, total, D),
    )
    lg_f, _ = phi3._verify_forward_fused(
        qparams, cfg, e, n_pos0, flat, T, valid
    )
    np.testing.assert_allclose(
        np.asarray(lg_f, np.float32), np.asarray(lg_ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(lg_f[0]), -1),
        np.argmax(np.asarray(lg_ref[0]), -1),
    )


def test_verify_fused_across_block_boundary(monkeypatch):
    """Draft rows written across the _ROWS cache-block boundary (wslot just
    below 512 with k rows spilling into block 1) with a long prompt whose
    padding holes span the boundary region."""
    from dynam3d_tpu.ops.pallas_decode import _ROWS

    cfg = _cfg()
    qparams = _quantized_eligible(cfg, seed=9)
    _interpret_ring(monkeypatch)
    rng = np.random.default_rng(9)

    T, total, k = _ROWS - 3, 2 * _ROWS, 4   # rows 509..512: spans blocks
    D = cfg.hidden_size
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(1, T, D)), jnp.bfloat16
    )
    av = np.ones((1, T), bool)
    av[0, _ROWS - 20 : _ROWS - 10] = False   # holes near the boundary
    av = jnp.asarray(av)
    cache = phi3.init_cache(cfg, 1, total, dtype=jnp.bfloat16)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    valid = np.zeros((1, total), bool)
    valid[0, :T] = np.asarray(av)[0]
    valid = jnp.asarray(valid)
    n_pos0 = int(np.asarray(av).sum())
    e = jnp.asarray(rng.normal(scale=0.5, size=(1, k, D)), jnp.bfloat16)

    kk = jnp.arange(k)
    t_iota = jnp.arange(total)
    row_extra = (t_iota[None] >= T) & (t_iota[None] <= T + kk[:, None])
    m = valid[:, None, :] | row_extra[None]
    pos = (n_pos0 + kk)[None]
    lg_ref, _ = phi3.decode_forward(qparams, cfg, e, pos, cache, T, m)

    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, 1, total, D),
        cache.v.reshape(cfg.num_layers, 1, total, D),
    )
    lg_f, _ = phi3._verify_forward_fused(
        qparams, cfg, e, n_pos0, flat, T, valid
    )
    np.testing.assert_allclose(
        np.asarray(lg_f, np.float32), np.asarray(lg_ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(lg_f[0]), -1),
        np.argmax(np.asarray(lg_ref[0]), -1),
    )


@pytest.mark.parametrize("B", [2, 3, 4])
def test_spec_batched_matches_greedy_rowwise(B):
    """Grouped speculation at B episodes: every row's emitted stream must
    equal plain greedy_decode run on the whole batch (different prompt
    lengths per row; XLA verify path)."""
    cfg = _cfg()
    params = phi3.init_phi3_params(jax.random.PRNGKey(30 + B), cfg)
    rng = np.random.default_rng(30 + B)
    T, n = 24, 10
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(B, T, cfg.hidden_size)), jnp.bfloat16
    )
    valid = np.ones((B, T), bool)
    for b in range(B):
        valid[b, T - 3 * b - 2 : T - 3 * b] = False   # per-row holes
    valid = jnp.asarray(valid)

    ref = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=-1))(
            params, embeds, valid)
    )
    got, stats = jax.jit(
        lambda p, e, v: phi3.greedy_decode_spec_batched(
            p, cfg, e, v, n, stop_token=-1, return_stats=True)
    )(params, embeds, valid)
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert int(np.max(np.asarray(stats["tokens"]))) == n


def test_spec_batched_stop_per_row():
    """Rows stop independently: pick a stop token one row emits early and
    check row-wise padding semantics match plain greedy."""
    cfg = _cfg()
    params = phi3.init_phi3_params(jax.random.PRNGKey(33), cfg)
    rng = np.random.default_rng(33)
    B, T, n = 2, 24, 10
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(B, T, cfg.hidden_size)), jnp.bfloat16
    )
    valid = jnp.asarray(np.ones((B, T), bool))
    free = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=-1))(
            params, embeds, valid)
    )
    stop = int(free[0, 3])   # row 0 stops early; row 1 maybe not
    ref = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=stop))(
            params, embeds, valid)
    )
    got = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode_spec_batched(
            p, cfg, e, v, n, stop_token=stop))(params, embeds, valid)
    )
    np.testing.assert_array_equal(got, ref)


def test_verify_grouped_fused_matches_xla(monkeypatch):
    """decode_layer_ring(group_size=g) == the XLA grouped verify pass:
    B=2 episodes x g=3 drafts, per-episode caches/positions."""
    cfg = _cfg()
    qparams = _quantized_eligible(cfg, seed=13)
    _interpret_ring(monkeypatch)
    rng = np.random.default_rng(13)

    B, g, T, total = 2, 3, 24, 512
    D = cfg.hidden_size
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(B, T, D)), jnp.bfloat16
    )
    av = np.ones((B, T), bool)
    av[0, 10:12] = False
    av[1, 18:24] = False   # different prompt lengths per row
    av = jnp.asarray(av)
    cache = phi3.init_cache(cfg, B, total, dtype=jnp.bfloat16)
    positions = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
    mask = phi3.prefill_mask(av, total)
    _, cache = phi3.forward(qparams, cfg, embeds, positions, cache, 0, mask)

    valid = np.zeros((B, total), bool)
    valid[:, :T] = np.asarray(av)
    valid = jnp.asarray(valid)
    n_pos0 = jnp.sum(av.astype(jnp.int32), axis=1)
    wslot = jnp.asarray([T, T + 2], jnp.int32)   # rows at different slots
    e = jnp.asarray(rng.normal(scale=0.5, size=(B, g, D)), jnp.bfloat16)

    lg_ref, c_ref = phi3._verify_forward_grouped(
        qparams, cfg, e, n_pos0, cache, wslot, valid, use_fused=False
    )
    flat = phi3.KVCache(
        cache.k.reshape(cfg.num_layers, B, total, D),
        cache.v.reshape(cfg.num_layers, B, total, D),
    )
    lg_f, c_f = phi3._verify_forward_grouped(
        qparams, cfg, e, n_pos0, flat, wslot, valid, use_fused=True
    )
    np.testing.assert_allclose(
        np.asarray(lg_f, np.float32), np.asarray(lg_ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(lg_f), -1), np.argmax(np.asarray(lg_ref), -1)
    )
    for b, w in enumerate([T, T + 2]):
        np.testing.assert_allclose(
            np.asarray(c_f.k[:, b, w : w + g], np.float32),
            np.asarray(c_ref.k[:, b, w : w + g], np.float32).reshape(
                cfg.num_layers, g, D),
            rtol=3e-2, atol=3e-2,
        )


def test_spec_through_episode_runner(monkeypatch):
    """DYNAM3D_SPEC_DECODE through the full closed loop: EpisodeRunner
    builds lookup ids from the prompt (image span/pads masked to -1), the
    spec path decodes, the text parser still yields actions, and one
    episode runs end to end on the tiny config."""
    from dynam3d_tpu import flags
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime.episode import EpisodeRunner
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed
    from tests.test_e2e_slice import tiny_config

    monkeypatch.setattr(flags, "SPEC_DECODE", True)
    cfg = tiny_config()
    params = policy_mod.init_policy_params(
        jax.random.PRNGKey(0), cfg, llm_dtype=jnp.float32
    )
    runner = EpisodeRunner(params, cfg)
    feed = SyntheticRoomFeed(rgb_size=56, depth_size=32, views=1, seed=0)
    res = runner.run([feed], max_steps=2, ignore_stop=True)
    assert len(res) == 1
    assert res[0]["steps"] >= 1
    assert np.isfinite(res[0]["distance_to_goal"])


def test_ngram_draft_lookup():
    """Unit: 4-gram > trigram > bigram > unigram cascade; terminal
    occurrence and -1 holes never match."""
    hist = jnp.asarray([5, 9, 2, 7, -1, 9, 2, 4, 1, 9, 2], jnp.int32)
    n_hist = 11   # last = 2 at index 10, prev = 9, prev2 = 1

    def draft(p2, p1, last, k=3, p3=-1):
        return np.asarray(phi3._ngram_draft(
            hist, n_hist, jnp.int32(p3), jnp.int32(p2), jnp.int32(p1),
            jnp.int32(last), k))

    # bigram (9,2): matches at idx 1 and 5 (terminal idx 9 excluded);
    # trigram (1,9,2) has no earlier occurrence -> falls to the bigram
    np.testing.assert_array_equal(draft(1, 9, 2), [4, 1])
    # trigram hit beats a later bigram: (5,9,2) occurs at the START, the
    # bigram (9,2) also at idx 5 — the trigram tier must pick idx 1
    np.testing.assert_array_equal(draft(5, 9, 2), [7, -1])
    # no match -> all -1
    np.testing.assert_array_equal(draft(-1, 8, 8), [-1, -1])
    # unigram on last=2 when prev < 0
    np.testing.assert_array_equal(draft(-1, -1, 2), [4, 1])

    # 4-gram disambiguates where the trigram is ambiguous: (9,2,4) occurs
    # twice with different predecessors — the quad (7,9,2,4) must pick the
    # EARLY occurrence (continuation [8,8]) over the more recent trigram
    # match whose predecessor differs (continuation [3,5])
    hist2 = jnp.asarray(
        [7, 9, 2, 4, 8, 8, 1, 9, 2, 4, 3, 5, 7, 9, 2, 4], jnp.int32
    )

    def draft2(p3, p2, p1, last, k=3):
        return np.asarray(phi3._ngram_draft(
            hist2, 16, jnp.int32(p3), jnp.int32(p2), jnp.int32(p1),
            jnp.int32(last), k))

    np.testing.assert_array_equal(draft2(7, 9, 2, 4), [8, 8])
    # without the quad context the trigram picks the most recent match
    np.testing.assert_array_equal(draft2(-1, 9, 2, 4), [3, 5])


def test_prev_gen_priming_exact_and_fewer_passes(monkeypatch):
    """Draft-from-history priming (generate_action_ids prev_gen): feeding
    the previous step's generated ids into the lookup keeps the stream
    greedy-EXACT and, when the new step's greedy output repeats it (the
    'move 4 steps.' streak regime, Policy_Dynam3D_VLN.py:472-506), the
    pass count collapses toward ceil(n/k)."""
    cfg = _cfg()
    params = phi3.init_phi3_params(jax.random.PRNGKey(5), cfg)
    embeds, valid = _prompt(cfg, 5)
    n = 16

    ref = np.asarray(
        jax.jit(lambda p, e, v: phi3.greedy_decode(p, cfg, e, v, n,
                                                   stop_token=-1))(
            params, embeds, valid)
    )[0]
    # prev_gen == this step's own greedy output (identical-repeat regime),
    # wired exactly as policy.generate_action_ids does: prompt lookup ids
    # then the pad-masked previous generation, appended LAST
    prompt_lookup = np.full((8,), -1, np.int32)   # all-image prompt: no text
    prev = ref.copy()
    lookup = np.concatenate([prompt_lookup, prev])
    got, stats = jax.jit(
        lambda p, e, v, lk: phi3.greedy_decode_spec(
            p, cfg, e, v, n, stop_token=-1, lookup_ids=lk,
            return_stats=True)
    )(params, embeds, valid, jnp.asarray(lookup))
    np.testing.assert_array_equal(np.asarray(got)[0], ref)
    k = phi3.flags.SPEC_DRAFT_LEN
    assert int(stats["passes"]) <= -(-n // max(k - 1, 1)) + 1, (
        f"priming should collapse passes, got {int(stats['passes'])}"
    )

    # a STALE prev_gen (tokens the model never emits) must not corrupt the
    # stream — drafts get rejected, output stays exact
    stale = np.full((n,), 3, np.int32)
    got2 = jax.jit(
        lambda p, e, v, lk: phi3.greedy_decode_spec(
            p, cfg, e, v, n, stop_token=-1,
            lookup_ids=lk)
    )(params, embeds, valid,
      jnp.asarray(np.concatenate([prompt_lookup, stale])))
    np.testing.assert_array_equal(np.asarray(got2)[0], ref)


def test_generate_action_ids_prev_gen_plumbing():
    """Policy-layer plumbing: prev_gen changes pass economics only — the
    emitted ids are identical with None, never-match, and self-primed
    prev_gen (pads masked to -1 so pad ids are never drafted)."""
    from dynam3d_tpu.models import policy as policy_mod
    from tests.test_e2e_slice import tiny_config

    cfg = tiny_config()
    params = policy_mod.init_policy_params(
        jax.random.PRNGKey(1), cfg, llm_dtype=jnp.float32
    )
    p3 = cfg.llava.phi3
    HW = cfg.fields.input_height * cfg.fields.input_width
    n_mm = HW + policy_mod.I_ENV + policy_mod.Z_ENV
    T = 8 + n_mm
    rng = np.random.default_rng(2)
    ids = np.full((1, T), p3.pad_token_id, np.int32)
    ids[0, :4] = rng.integers(5, 50, 4)
    ids[0, 4 : 4 + n_mm] = p3.image_token_id
    ids[0, 4 + n_mm : 6 + n_mm] = rng.integers(5, 50, 2)
    tvalid = jnp.asarray(np.arange(T)[None] < 6 + n_mm)
    ids = jnp.asarray(ids)
    key = jax.random.PRNGKey(3)
    mm = jax.random.normal(key, (1, n_mm, p3.hidden_size), jnp.float32)
    mv = jnp.ones((1, n_mm), bool)

    base = np.asarray(policy_mod.generate_action_ids(
        params, cfg, ids, tvalid, mm, mv, splice_start=4))
    never = jnp.full((1, cfg.llava.max_new_tokens), -1, jnp.int32)
    got1 = np.asarray(policy_mod.generate_action_ids(
        params, cfg, ids, tvalid, mm, mv, splice_start=4, prev_gen=never))
    got2 = np.asarray(policy_mod.generate_action_ids(
        params, cfg, ids, tvalid, mm, mv, splice_start=4,
        prev_gen=jnp.asarray(base)))
    np.testing.assert_array_equal(got1, base)
    np.testing.assert_array_equal(got2, base)
