"""Weight-converter tests: structural match against flax init, and numerical
parity of conv/FrozenBN against torch (cpu) with converted weights."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402
from flax import traverse_util  # noqa: E402

from object_detection_destr_tpu.models.convert import (  # noqa: E402
    resnet_params_from_torch,
    vgg16_params_from_torch,
)
from object_detection_destr_tpu.models.resnet import FrozenBatchNorm, ResNet  # noqa: E402
from object_detection_destr_tpu.models.ssd.model import VGG16Features  # noqa: E402


def _fake_torch_resnet_sd(stage_sizes, rng):
    """State dict with torchvision resnet key layout + correct shapes."""
    sd = {}
    sd["conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    for part in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{part}"] = rng.normal(size=(64,)).astype(np.float32)
    widths = (64, 128, 256, 512)
    in_ch = 64
    for stage, (blocks, width) in enumerate(zip(stage_sizes, widths), start=1):
        for i in range(blocks):
            tp = f"layer{stage}.{i}"
            c_in = in_ch if i == 0 else width * 4
            sd[f"{tp}.conv1.weight"] = rng.normal(size=(width, c_in, 1, 1)).astype(np.float32)
            sd[f"{tp}.conv2.weight"] = rng.normal(size=(width, width, 3, 3)).astype(np.float32)
            sd[f"{tp}.conv3.weight"] = rng.normal(size=(width * 4, width, 1, 1)).astype(np.float32)
            for j in (1, 2, 3):
                ch = width if j < 3 else width * 4
                for part in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{tp}.bn{j}.{part}"] = rng.normal(size=(ch,)).astype(np.float32)
            if i == 0:
                sd[f"{tp}.downsample.0.weight"] = rng.normal(
                    size=(width * 4, c_in, 1, 1)
                ).astype(np.float32)
                for part in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{tp}.downsample.1.{part}"] = rng.normal(size=(width * 4,)).astype(np.float32)
        in_ch = width * 4
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1000,)).astype(np.float32)
    return sd


def test_resnet_converter_structure_matches_flax_init():
    stage_sizes = (2, 2, 2, 2)
    rng = np.random.default_rng(0)
    sd = _fake_torch_resnet_sd(stage_sizes, rng)
    converted = resnet_params_from_torch(sd, stage_sizes)

    model = ResNet(stage_sizes=stage_sizes)
    init = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]

    flat_c = traverse_util.flatten_dict(converted)
    flat_i = traverse_util.flatten_dict(init)
    assert set(flat_c) == set(flat_i)
    for k in flat_i:
        assert flat_c[k].shape == flat_i[k].shape, k

    # converted params run
    out = model.apply({"params": converted}, jnp.zeros((1, 64, 64, 3)))
    assert out["layer4"].shape[-1] == 2048


def test_conv_kernel_layout_parity_with_torch():
    """HWIO-converted 7x7/2 pad-3 conv must equal torch's conv2d."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(8, 3, 7, 7)).astype(np.float32)  # OIHW
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)  # NCHW

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=3
    ).numpy()

    conv = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False)
    variables = conv.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    variables = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    got = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, ref, atol=2e-4)


def test_frozen_bn_parity_with_torch_eval_bn():
    rng = np.random.default_rng(2)
    c = 16
    weight = rng.normal(size=c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = np.abs(rng.normal(size=c)).astype(np.float32) + 0.5
    x = rng.normal(size=(2, c, 5, 5)).astype(np.float32)

    bn = torch.nn.BatchNorm2d(c, eps=1e-5)
    bn.weight.data = torch.from_numpy(weight)
    bn.bias.data = torch.from_numpy(bias)
    bn.running_mean = torch.from_numpy(mean)
    bn.running_var = torch.from_numpy(var)
    bn.eval()
    ref = bn(torch.from_numpy(x)).detach().numpy()

    fbn = FrozenBatchNorm(c)
    params = {
        "weight": jnp.asarray(weight),
        "bias": jnp.asarray(bias),
        "running_mean": jnp.asarray(mean),
        "running_var": jnp.asarray(var),
    }
    got = fbn.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_vgg16_converter_structure():
    rng = np.random.default_rng(3)
    cfg_out = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512)
    idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)
    in_ch = 3
    sd = {}
    for torch_i, out_ch in zip(idx, cfg_out):
        sd[f"features.{torch_i}.weight"] = rng.normal(
            size=(out_ch, in_ch, 3, 3)
        ).astype(np.float32)
        sd[f"features.{torch_i}.bias"] = rng.normal(size=(out_ch,)).astype(np.float32)
        in_ch = out_ch
    converted = vgg16_params_from_torch(sd)

    model = VGG16Features()
    init = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    flat_c = traverse_util.flatten_dict(converted)
    flat_i = traverse_util.flatten_dict(init)
    assert set(flat_c) == set(flat_i)
    for k in flat_i:
        assert flat_c[k].shape == flat_i[k].shape, k
    out = model.apply({"params": converted}, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 8, 8, 512)
