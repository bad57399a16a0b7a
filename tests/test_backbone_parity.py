"""Whole-backbone forward parity against hand-built plain-torch models.

The per-layer conv/FrozenBN checks in test_convert.py don't prove stride,
padding, and pool *placement* across all ~50 layers. Here the torchvision
topologies (the exact state-dict key layout of ``torchvision.models.resnet50
/ resnet101 / vgg16``, which the reference loads at backbone.py:135-138 and
model_ssd.py:141-148) are rebuilt in plain ``torch.nn`` with random weights,
converted via ``models/convert.py``, and every stage output is compared
tensor-to-tensor. Also exercises the pretrained-import -> ``--resume`` path
end to end (models/import_weights.py).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.models.convert import (  # noqa: E402
    resnet_params_from_torch,
    vgg16_params_from_torch,
)
from object_detection_destr_tpu.models.resnet import ResNet  # noqa: E402
from object_detection_destr_tpu.models.ssd.model import VGG16Features  # noqa: E402

import sys  # noqa: E402

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

nn = torch.nn


from tools.ref_torch_models import (  # noqa: E402
    TorchResNet as _TorchResNet,
    torch_vgg16_features as _torch_vgg16_features,
)


def _randomize_bn_stats(model, seed):
    """Give BN layers non-trivial (but well-conditioned) affine + stats so
    eval-mode BN actually exercises the folded FrozenBN math."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.weight.uniform_(0.5, 1.5, generator=g)
                mod.bias.normal_(0.0, 0.2, generator=g)
                mod.running_mean.normal_(0.0, 0.5, generator=g)
                mod.running_var.uniform_(0.5, 2.0, generator=g)


def _numpy_sd(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def _assert_stage_close(ours_nhwc, ref_nchw, name, rtol=2e-4):
    ref = ref_nchw.numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(ours_nhwc)
    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(ours - ref).max() / scale
    assert err < rtol, f"{name}: relative error {err:.2e} (scale {scale:.2e})"


@pytest.mark.parametrize(
    "stage_sizes,dilate,size",
    [
        ((3, 4, 6, 3), False, 64),
        ((3, 4, 6, 3), False, 97),  # odd size: stride/pad placement check
        ((3, 4, 6, 3), True, 64),  # dilated layer4 (--dilation config)
        ((3, 4, 23, 3), False, 64),  # resnet101
    ],
    ids=["r50-64", "r50-97", "r50-dilated", "r101-64"],
)
def test_resnet_whole_forward_parity(stage_sizes, dilate, size):
    torch.manual_seed(0)
    tm = _TorchResNet(stage_sizes, dilate_l4=dilate).eval()
    _randomize_bn_stats(tm, seed=1)

    params = resnet_params_from_torch(_numpy_sd(tm), stage_sizes)
    jm = ResNet(stage_sizes=stage_sizes, dilation=dilate)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for stage in ("layer1", "layer2", "layer3", "layer4"):
        assert ours[stage].shape == tuple(
            np.transpose(ref[stage].numpy(), (0, 2, 3, 1)).shape
        ), stage
        _assert_stage_close(ours[stage], ref[stage], stage)
    if dilate:  # dilation must preserve layer3's spatial resolution
        assert ours["layer4"].shape[1:3] == ours["layer3"].shape[1:3]


@pytest.mark.parametrize("size", [64, 75])  # 75: floor-mode pooling check
def test_vgg16_features_whole_forward_parity(size):
    torch.manual_seed(3)
    tm = _torch_vgg16_features().eval()

    params = vgg16_params_from_torch(_numpy_sd(tm))
    jm = VGG16Features()

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_stage_close(ours, ref, "conv4_3")


@pytest.mark.slow
def test_import_weights_then_resume_training(tmp_path):
    """The pretrained-start path end to end: export a torch ResNet-50 state
    dict -> ``import_weights`` CLI -> checkpoint carries the converted
    backbone exactly -> ``train --resume --resume_from`` runs on it."""
    from object_detection_destr_tpu.config import DestrConfig, TrainConfig
    from object_detection_destr_tpu.models import import_weights
    from object_detection_destr_tpu.models.destr.model import build_destr
    from object_detection_destr_tpu.train.checkpoint import restore_checkpoint
    from object_detection_destr_tpu.train.state import create_destr_state
    from object_detection_destr_tpu.train.train import main as train_main

    torch.manual_seed(5)
    tm = _TorchResNet((3, 4, 6, 3)).eval()
    _randomize_bn_stats(tm, seed=6)
    npz = tmp_path / "resnet50.npz"
    np.savez(npz, **_numpy_sd(tm))

    ckpt_dir = str(tmp_path / "ckpt")
    tiny = [
        "--hidden_dim", "32", "--num_heads", "4", "--ffn_dim", "64",
        "--num_encoder_blocks", "2", "--num_decoder_blocks", "2",
        "--top_k", "4", "--image_size", "64",
    ]
    import_weights.main(
        ["--model", "destr", "--weights", str(npz),
         "--checkpoint_dir", ckpt_dir, "--save_as", "pretrained"] + tiny
    )

    # the checkpoint's backbone must be exactly the converted torch weights
    cfg = DestrConfig(
        hidden_dim=32, num_heads=4, ffn_dim=64,
        num_encoder_blocks=2, num_decoder_blocks=2, top_k=4,
    )
    template, _ = create_destr_state(build_destr(cfg), TrainConfig(), image_size=64)
    restored = restore_checkpoint(ckpt_dir, "pretrained", template)
    converted = resnet_params_from_torch(_numpy_sd(tm), (3, 4, 6, 3))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored["state"].params["backbone"],
        converted,
    )

    # and a training run actually starts from it
    train_main(
        ["--epochs", "1", "--batch_size", "2", "--dataset", "synthetic",
         "--num_train_samples", "2", "--num_valid_samples", "2",
         "--augment_factor", "1", "--lr", "1e-3",
         "--checkpoint_dir", ckpt_dir, "--log_dir", str(tmp_path / "runs"),
         "--log_interval", "1", "--resume", "--resume_from", "pretrained",
         "--compute_dtype", "float32"] + tiny
    )
