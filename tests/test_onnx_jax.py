"""ONNX parser + JAX executor parity vs torch, using real torch-exported
ONNX files (same exporter family that produced the UVR MDX .onnx models)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

# torch's legacy exporter needs the onnx package only for the onnxscript
# post-pass; bypass it (no custom onnxscript functions in plain CNN exports).
from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

from audio_separator_tpu.models.onnx_jax import onnx_to_jax


def _export(model, example, path, opset=17):
    model.eval()
    torch.onnx.export(model, example, path, input_names=["input"],
                      output_names=["output"], opset_version=opset, dynamo=False)


def _check(model, example, tmp_path, atol=2e-5, opset=17):
    path = str(tmp_path / "model.onnx")
    _export(model, example, path, opset=opset)
    fn, params, in_names, out_names = onnx_to_jax(path)
    with torch.no_grad():
        ref = model(example).numpy()
    got = np.asarray(fn(params, jnp.asarray(example.numpy()))[0])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol * max(1.0, np.abs(ref).max()), rtol=0)


class TFCTDFBlock(nn.Module):
    """UVR Conv-TDF style block: time-freq convs + time-distributed-freq linear."""

    def __init__(self, c, f, bn=4):
        super().__init__()
        self.tfc = nn.Sequential(
            nn.GroupNorm(2, c), nn.ReLU(),
            nn.Conv2d(c, c, 3, padding=1, bias=False),
            nn.GroupNorm(2, c), nn.ReLU(),
            nn.Conv2d(c, c, 3, padding=1, bias=False),
        )
        self.tdf = nn.Sequential(
            nn.GroupNorm(2, c), nn.ReLU(),
            nn.Linear(f, f // bn, bias=False),
            nn.GroupNorm(2, c), nn.ReLU(),
            nn.Linear(f // bn, f, bias=False),
        )

    def forward(self, x):
        x = self.tfc(x)
        return x + self.tdf(x.transpose(-1, -2)).transpose(-1, -2)


class MiniConvTDF(nn.Module):
    """Miniature Conv-TDF U-Net matching the UVR MDX-NET op inventory:
    Conv/ConvTranspose with stride-2 downscales, GroupNorm, BatchNorm, ReLU,
    TDF linear layers, skip adds."""

    def __init__(self, f=32):
        super().__init__()
        c = 8
        self.first = nn.Sequential(nn.Conv2d(4, c, 1), nn.BatchNorm2d(c), nn.ReLU())
        self.enc1 = TFCTDFBlock(c, f)
        self.down = nn.Sequential(nn.Conv2d(c, c * 2, 2, stride=2), nn.BatchNorm2d(c * 2), nn.ReLU())
        self.mid = TFCTDFBlock(c * 2, f // 2)
        self.up = nn.Sequential(nn.ConvTranspose2d(c * 2, c, 2, stride=2), nn.BatchNorm2d(c), nn.ReLU())
        self.dec1 = TFCTDFBlock(c, f)
        self.final = nn.Conv2d(c, 4, 1)

    def forward(self, x):
        x = self.first(x)
        e1 = self.enc1(x)
        m = self.up(self.mid(self.down(e1)))
        return self.final(self.dec1(m + e1))


def test_mini_convtdf_graph(tmp_path):
    torch.manual_seed(0)
    model = MiniConvTDF()
    x = torch.randn(1, 4, 32, 16)
    _check(model, x, tmp_path, atol=5e-5)


def test_conv_padding_strides(tmp_path):
    torch.manual_seed(1)
    model = nn.Sequential(
        nn.Conv2d(3, 6, (3, 5), stride=(2, 1), padding=(1, 2)),
        nn.ReLU(),
        nn.Conv2d(6, 6, 3, padding=1, groups=3),
    )
    _check(model, torch.randn(2, 3, 17, 19), tmp_path)


def test_conv_transpose_output_padding(tmp_path):
    torch.manual_seed(2)
    model = nn.ConvTranspose2d(4, 3, 3, stride=2, padding=1, output_padding=1)
    _check(model, torch.randn(1, 4, 9, 11), tmp_path)


def test_conv_transpose_groups(tmp_path):
    torch.manual_seed(3)
    model = nn.ConvTranspose2d(4, 4, 2, stride=2, groups=2)
    _check(model, torch.randn(1, 4, 8, 8), tmp_path)


def test_pools_and_activations(tmp_path):
    model = nn.Sequential(
        nn.Conv2d(2, 4, 3, padding=1), nn.MaxPool2d(2), nn.ELU(),
        nn.AvgPool2d(2), nn.Sigmoid(),
    )
    _check(model, torch.randn(1, 2, 16, 16), tmp_path)


def test_linear_and_reshape(tmp_path):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(24, 12)
            self.l2 = nn.Linear(12, 6)

        def forward(self, x):
            b = x.shape[0]
            x = x.reshape(b, -1)
            x = torch.tanh(self.l1(x))
            return self.l2(x).reshape(b, 2, 3)

    _check(M(), torch.randn(3, 4, 6), tmp_path)


def test_lstm_free_ops_opset11(tmp_path):
    # older opset (UVR-era exports)
    torch.manual_seed(4)
    model = nn.Sequential(nn.Conv2d(4, 8, 3, padding=1), nn.GroupNorm(4, 8), nn.ReLU())
    _check(model, torch.randn(1, 4, 12, 12), tmp_path, opset=11)


def test_concat_split_pad(tmp_path):
    class M(nn.Module):
        def forward(self, x):
            a, b = torch.split(x, 2, dim=1)
            y = torch.cat([a, b, a * b], dim=1)
            return nn.functional.pad(y, (1, 2, 3, 0))

    _check(M(), torch.randn(2, 4, 5, 6), tmp_path)
