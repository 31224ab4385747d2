"""Weight-converter parity tests: real torch modules vs our JAX blocks.

These are the strongest parity checks available without the (undownloadable)
reference checkpoints: instantiate the same torch architectures, convert the
random weights through runtime/checkpoint.py, and require matching outputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from dynam3d_tpu.ops.transformer import encoder_stack, mlp2  # noqa: E402
from dynam3d_tpu.runtime import checkpoint as ckpt  # noqa: E402

D = 32
H = 4


def test_mlp2_matches_torch():
    m = nn.Sequential(nn.Linear(7, D), nn.LayerNorm(D), nn.GELU(), nn.Linear(D, D))
    m.eval()
    params = ckpt.mlp2_from_torch(m.state_dict(), "")
    # strip the leading "." produced by empty prefix
    params = {
        "fc1": ckpt.dense_from_torch(m.state_dict(), "0"),
        "ln": ckpt.ln_from_torch(m.state_dict(), "1"),
        "fc2": ckpt.dense_from_torch(m.state_dict(), "3"),
    }
    x = torch.randn(5, 7)
    want = m(x).detach().numpy()
    got = np.asarray(mlp2(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_transformer_encoder_matches_torch():
    layer = nn.TransformerEncoderLayer(
        d_model=D, nhead=H, dim_feedforward=4 * D, dropout=0.1,
        activation="gelu", batch_first=True,
    )
    enc = nn.TransformerEncoder(layer, num_layers=2, norm=nn.LayerNorm(D, eps=1e-12))
    enc.eval()
    sd = enc.state_dict()
    params = ckpt.encoder_stack_from_torch(sd, "", 2, "norm")
    # fix prefixes: keys are "layers.N...." already
    x = torch.randn(1, 9, D)
    with torch.no_grad():
        want = enc(x).numpy()[0]
    got = np.asarray(encoder_stack(params, jnp.asarray(x.numpy()[0]), H))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_phi3_matches_hf():
    from transformers import Phi3Config as HFPhi3Config
    from transformers import Phi3ForCausalLM

    hf_cfg = HFPhi3Config(
        vocab_size=128, hidden_size=D, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=H, num_key_value_heads=H,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        attention_dropout=0.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    model = Phi3ForCausalLM(hf_cfg).eval()
    sd = {k: v for k, v in model.state_dict().items()}

    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3 as jphi3

    cfg = Phi3Config(
        vocab_size=128, hidden_size=D, intermediate_size=64, num_layers=2,
        num_heads=H, num_kv_heads=H, head_dim=D // H,
        pad_token_id=0, end_token_id=1,
    )
    params = ckpt.phi3_params_from_torch(sd, 2, dtype=jnp.float32)

    ids = torch.randint(0, 128, (1, 10))
    with torch.no_grad():
        want = model(ids).logits.numpy()[0]

    emb = jphi3.embed(params, jnp.asarray(ids.numpy()))
    valid = jnp.ones((1, 10), bool)
    cache = jphi3.init_cache(cfg, 1, 10, dtype=jnp.float32)
    pos = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), 1) - 1, 0)
    mask = jphi3.prefill_mask(valid, 10)
    logits, _ = jphi3.forward(params, cfg, emb, pos, cache, 0, mask)
    got = np.asarray(logits[0], np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_clip_block_matches_torch():
    """Pre-norm residual attention block with QuickGELU (OpenAI CLIP)."""

    class QuickGELU(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(D, H, batch_first=True)
            self.ln_1 = nn.LayerNorm(D)
            self.mlp = nn.Sequential()
            self.mlp.add_module("c_fc", nn.Linear(D, 4 * D))
            self.mlp.add_module("gelu", QuickGELU())
            self.mlp.add_module("c_proj", nn.Linear(4 * D, D))
            self.ln_2 = nn.LayerNorm(D)

        def forward(self, x):
            a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x))
            x = x + a
            return x + self.mlp(self.ln_2(x))

    torch.manual_seed(1)
    blk = Block().eval()
    sd = {f"visual.transformer.resblocks.0.{k}": v for k, v in blk.state_dict().items()}
    params = ckpt._clip_block_from_torch(sd, "visual.transformer.resblocks.0")

    from dynam3d_tpu.models.encoders.clip import _block

    x = torch.randn(1, 6, D)
    with torch.no_grad():
        want = blk(x).numpy()[0]
    got = np.asarray(_block(params, jnp.asarray(x.numpy()[0]), H, None))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_field_params_from_torch_shapes():
    """Structural check for the Feature_Fields converter via synthetic dict."""
    d = 16
    sd = {}
    for name, i, o in [
        ("patch_to_instance_position_embedding.0", 7, d),
        ("patch_to_instance_position_embedding.3", d, d),
        ("instance_to_zone_position_embedding.0", 4, d),
        ("instance_to_zone_position_embedding.3", d, d),
        ("instance_merge_discriminator.0", 2 * d + 3, 4 * d),
        ("instance_merge_discriminator.3", 4 * d, 2),
    ]:
        sd[f"{name}.weight"] = np.random.randn(o, i).astype(np.float32)
        sd[f"{name}.bias"] = np.random.randn(o).astype(np.float32)
    for name, o in [
        ("patch_to_instance_position_embedding.1", d),
        ("instance_to_zone_position_embedding.1", 4 * d if False else d),
        ("instance_merge_discriminator.1", 4 * d),
    ]:
        sd[f"{name}.weight"] = np.ones(o, np.float32)
        sd[f"{name}.bias"] = np.zeros(o, np.float32)
    sd["aggregate_patch_to_instance_embedding"] = np.random.randn(1, d).astype(np.float32)
    sd["aggregate_instance_to_zone_embedding"] = np.random.randn(1, d).astype(np.float32)
    for enc in ("aggregate_patch_to_instance_encoder", "aggregate_instance_to_zone_encoder"):
        for i in range(2):
            p = f"{enc}.layers.{i}"
            sd[f"{p}.self_attn.in_proj_weight"] = np.random.randn(3 * d, d).astype(np.float32)
            sd[f"{p}.self_attn.in_proj_bias"] = np.random.randn(3 * d).astype(np.float32)
            sd[f"{p}.self_attn.out_proj.weight"] = np.random.randn(d, d).astype(np.float32)
            sd[f"{p}.self_attn.out_proj.bias"] = np.random.randn(d).astype(np.float32)
            sd[f"{p}.linear1.weight"] = np.random.randn(4 * d, d).astype(np.float32)
            sd[f"{p}.linear1.bias"] = np.random.randn(4 * d).astype(np.float32)
            sd[f"{p}.linear2.weight"] = np.random.randn(d, 4 * d).astype(np.float32)
            sd[f"{p}.linear2.bias"] = np.random.randn(d).astype(np.float32)
            for lnn in ("norm1", "norm2"):
                sd[f"{p}.{lnn}.weight"] = np.ones(d, np.float32)
                sd[f"{p}.{lnn}.bias"] = np.zeros(d, np.float32)
        sd[f"{enc}.norm.weight"] = np.ones(d, np.float32)
        sd[f"{enc}.norm.bias"] = np.zeros(d, np.float32)

    params = ckpt.field_params_from_torch(sd)
    assert params["p2i_agg_token"].shape == (1, d)
    assert params["merge_disc"]["fc1"]["w"].shape == (2 * d + 3, 4 * d)
    assert len(params["p2i_encoder"]["layers"]) == 2


def test_strip_prefix_convert_ckpt_semantics():
    sd = {
        "module.net.feature_fields.foo.weight": np.ones(2),
        "net.feature_fields.bar": np.zeros(3),
        "net.other.baz": np.ones(1),
    }
    out = ckpt.strip_prefix(sd, "net.feature_fields.")
    assert set(out) == {"foo.weight", "bar"}


def test_orbax_save_resume_roundtrip(tmp_path):
    import time

    payload = {"a": jnp.arange(5), "b": {"c": jnp.ones((2, 2))}}
    p1 = ckpt.save_checkpoint(str(tmp_path), 10, payload)
    time.sleep(0.05)
    p2 = ckpt.save_checkpoint(str(tmp_path), 20, payload)
    assert ckpt.newest_checkpoint(str(tmp_path)) == p2
    assert ckpt.checkpoint_step(p2) == 20
    restored = ckpt.load_checkpoint(p1, payload)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5))
