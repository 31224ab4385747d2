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


def test_ngram_draft_lookup():
    """Unit: bigram hit returns the continuation; terminal occurrence and
    -1 holes never match; unigram fallback when prev < 0."""
    hist = jnp.asarray([5, 9, 2, 7, -1, 9, 2, 4, 1, 9, 2], jnp.int32)
    n_hist = 11   # last = 2 at index 10, prev = 9
    # bigram (9,2): matches at idx 1 and 5 (terminal idx 9 excluded)
    d = np.asarray(phi3._ngram_draft(hist, n_hist, jnp.int32(9),
                                     jnp.int32(2), k=3))
    np.testing.assert_array_equal(d, [4, 1])   # continuation after idx 5
    # no match -> all -1
    d = np.asarray(phi3._ngram_draft(hist, n_hist, jnp.int32(8),
                                     jnp.int32(8), k=3))
    np.testing.assert_array_equal(d, [-1, -1])
    # unigram on last=2 when prev < 0
    d = np.asarray(phi3._ngram_draft(hist, n_hist, jnp.int32(-1),
                                     jnp.int32(2), k=3))
    np.testing.assert_array_equal(d, [4, 1])
