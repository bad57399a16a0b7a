"""Training-stack tests: optimizer labels, train steps on tiny models, the
DESTR driver end-to-end on synthetic data, and checkpoint round-trip."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.config import (  # noqa: E402
    Config,
    DataConfig,
    DestrConfig,
    TrainConfig,
)
from object_detection_destr_tpu.models.destr.model import build_destr  # noqa: E402
from object_detection_destr_tpu.train.checkpoint import (  # noqa: E402
    restore_checkpoint,
    save_checkpoint,
)
from object_detection_destr_tpu.train.optim import param_labels  # noqa: E402
from object_detection_destr_tpu.train.state import create_destr_state  # noqa: E402
from object_detection_destr_tpu.train.steps import (  # noqa: E402
    make_destr_eval_step,
    make_destr_train_step,
)

TINY_DESTR = DestrConfig(
    hidden_dim=32,
    num_heads=4,
    num_encoder_blocks=2,
    num_decoder_blocks=2,
    top_k=4,
    ffn_dim=64,
    dropout=0.0,
)
TINY_TRAIN = TrainConfig(batch_size=2, image_size=64, lr=1e-3, lr_backbone=1e-3)


def _tiny_batch(rng, b=2, size=64, t=5):
    images = jnp.asarray(rng.normal(size=(b, size, size, 3)).astype(np.float32))
    boxes = np.stack(
        [
            rng.uniform(0.1, 0.4, size=(b, t)),
            rng.uniform(0.1, 0.4, size=(b, t)),
            rng.uniform(0.5, 0.9, size=(b, t)),
            rng.uniform(0.5, 0.9, size=(b, t)),
        ],
        -1,
    ).astype(np.float32)
    valid = np.ones((b, t), bool)
    valid[0, -1] = False
    return {
        "images": images,
        "boxes": jnp.asarray(boxes),
        "labels": jnp.zeros((b, t), jnp.int32),
        "valid": jnp.asarray(valid),
    }


@pytest.fixture(scope="module")
def _destr_setup_raw():
    model = build_destr(TINY_DESTR)
    state, tx = create_destr_state(model, TINY_TRAIN, image_size=64)
    return model, state, tx


@pytest.fixture()
def destr_setup(_destr_setup_raw):
    """Fresh state copy per test — the train step donates its input state."""
    model, state, tx = _destr_setup_raw
    return model, jax.tree.map(jnp.copy, state), tx


def test_param_labels_policy(destr_setup):
    _, state, _ = destr_setup
    labels = param_labels(state.params)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(labels)
    as_str = {"/".join(map(str, k)): v for k, v in flat.items()}
    # stem + layer1 frozen; layer2+ trains at backbone lr; FrozenBN frozen
    assert as_str["backbone/conv1/kernel"] == "frozen"
    assert any(
        v == "frozen" and "layer1_0" in k and "bn" in k for k, v in as_str.items()
    )
    assert any(
        v == "backbone" and k.startswith("backbone/layer2_0/conv1") for k, v in as_str.items()
    )
    assert any(
        v == "frozen" and "layer2_0/bn1" in k for k, v in as_str.items()
    )
    assert as_str["cls_embed/kernel"] == "main"


def test_destr_train_step_runs_and_updates(destr_setup):
    model, state, tx = destr_setup
    train_step = make_destr_train_step(model, tx, TINY_TRAIN)
    rng = np.random.default_rng(0)
    batch = _tiny_batch(rng)
    before = jax.device_get(state.params["cls_embed"]["kernel"])
    state2, metrics = train_step(state, batch)
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), f"{k} not finite"
    after = jax.device_get(state2.params["cls_embed"]["kernel"])
    assert not np.allclose(before, after)
    assert int(state2.step) == int(jax.device_get(state2.step))
    # frozen params untouched
    np.testing.assert_array_equal(
        jax.device_get(state2.params["backbone"]["bn1"]["running_mean"]),
        np.zeros_like(jax.device_get(state2.params["backbone"]["bn1"]["running_mean"])),
    )


def test_destr_eval_step_shapes(destr_setup):
    model, state, _ = destr_setup
    eval_step = make_destr_eval_step(model, TINY_TRAIN)
    rng = np.random.default_rng(1)
    batch = _tiny_batch(rng)
    outputs, metrics = eval_step(state, batch)
    assert outputs["pred_class"].shape == (2, 4, 2)
    assert outputs["pred_boxes"].shape == (2, 4, 4)
    for v in jax.device_get(metrics).values():
        assert np.isfinite(v)


def test_checkpoint_roundtrip(tmp_path, destr_setup):
    _, state, _ = destr_setup
    path = save_checkpoint(str(tmp_path), "w", state, {"epoch": 2, "step": 3}, 0.5)
    assert os.path.exists(path)
    restored = restore_checkpoint(str(tmp_path), "w", state)
    assert restored["loader"] == {"epoch": 2, "step": 3}
    assert float(restored["best_val"]) == 0.5
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state.params),
        restored["state"].params,
    )
    # overwrite (best checkpoint is rewritten every improvement)
    save_checkpoint(str(tmp_path), "w", state, {"epoch": 5, "step": 0}, 0.25)
    again = restore_checkpoint(str(tmp_path), "w", state)
    assert float(again["best_val"]) == 0.25


def test_checkpoint_kill_during_save_leaves_restorable(tmp_path, destr_setup, monkeypatch):
    """A crash at ANY point of the overwrite swap must leave a checkpoint
    that restore_checkpoint can find (VERDICT r1 weak #4: the window between
    the two renames used to leave nothing at ``path``)."""
    import os as _os

    from object_detection_destr_tpu.train import checkpoint as C

    _, state, _ = destr_setup
    save_checkpoint(str(tmp_path), "w", state, {"epoch": 1, "step": 1}, 1.0)

    # kill right after the first swap rename: path gone, .new/.old complete.
    # Only intercept the swap's own renames — orbax's internal commit
    # renames go through the same (shared) os module.
    base = _os.path.join(str(tmp_path), "w")
    real_rename = _os.rename

    def killing_rename(src_p, dst_p):
        real_rename(src_p, dst_p)
        if str(dst_p) == base + ".old":
            raise KeyboardInterrupt("simulated kill between renames")

    monkeypatch.setattr(C.os, "rename", killing_rename)
    with pytest.raises(KeyboardInterrupt):
        save_checkpoint(str(tmp_path), "w", state, {"epoch": 2, "step": 9}, 0.5)
    monkeypatch.setattr(C.os, "rename", real_rename)

    assert not _os.path.exists(base)  # the crash window is real
    restored = restore_checkpoint(str(tmp_path), "w", state)
    assert restored["loader"] == {"epoch": 2, "step": 9}  # .new preferred

    # and a subsequent save from the crashed state recovers cleanly
    _os.rename(base + ".new", base)
    save_checkpoint(str(tmp_path), "w", state, {"epoch": 3, "step": 0}, 0.25)
    assert float(restore_checkpoint(str(tmp_path), "w", state)["best_val"]) == 0.25


def test_destr_driver_end_to_end(tmp_path):
    from object_detection_destr_tpu.train.driver import train_destr

    config = Config(
        destr=TINY_DESTR,
        train=TrainConfig(
            batch_size=2,
            image_size=64,
            epochs=1,
            lr=1e-3,
            lr_backbone=0.0,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "runs"),
            log_interval=2,
        ),
        data=DataConfig(
            dataset="synthetic",
            image_size=80,
            num_train_samples=4,
            num_valid_samples=2,
            augment_factor=1,
            max_targets=8,
        ),
    )
    result = train_destr(config)
    assert np.isfinite(result["best_val"])
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), "model_weights"))
    assert os.path.exists(os.path.join(str(tmp_path / "runs"), "metrics.jsonl"))

    # resume path: restart from the saved checkpoint without error
    config2 = Config(
        destr=config.destr,
        train=dataclasses_replace(config.train, resume=True, epochs=1),
        data=config.data,
    )
    result2 = train_destr(config2)
    assert np.isfinite(result2["best_val"])


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_grad_accumulation_updates_every_k():
    """optax.MultiSteps wrapper: params move only every k-th micro-batch."""
    import dataclasses

    model = build_destr(TINY_DESTR)
    cfg = dataclasses.replace(TINY_TRAIN, grad_accum_steps=2)
    state, tx = create_destr_state(model, cfg, image_size=64)
    train_step = make_destr_train_step(model, tx, cfg)
    rng = np.random.default_rng(5)
    batch = _tiny_batch(rng)
    p0 = jax.device_get(state.params["cls_embed"]["kernel"])
    state, _ = train_step(state, batch)
    p1 = jax.device_get(state.params["cls_embed"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # first micro-batch only accumulates
    state, _ = train_step(state, batch)
    p2 = jax.device_get(state.params["cls_embed"]["kernel"])
    assert not np.allclose(p1, p2)  # second one applies the update


@pytest.mark.slow
@pytest.mark.parametrize(
    "size,top_k,t_max,blocks",
    [
        (96, 4, 6, 2),   # MORE valid targets than queries (the 96px NaN class)
        (64, 4, 4, 1),   # queries == grid capacity
        (128, 9, 8, 2),  # non-multiple-of-8 top_k, t < top_k
    ],
)
def test_destr_train_step_finite_degenerate_configs(size, top_k, t_max, blocks):
    """Config fuzz for silent NaNs: any (image_size, top_k, targets) combo a
    user can type into the CLI must produce finite losses — found in the wild
    when top_k < #valid boxes parked targets on padding rows (criterion.py
    guard)."""
    rng = np.random.default_rng(size + top_k)
    cfg = DestrConfig(
        hidden_dim=32, num_heads=4, ffn_dim=64, dropout=0.0,
        num_encoder_blocks=blocks, num_decoder_blocks=blocks, top_k=top_k,
    )
    tcfg = TrainConfig(batch_size=2, image_size=size, lr=1e-3, lr_backbone=0.0)
    model = build_destr(cfg)
    state, tx = create_destr_state(model, tcfg, image_size=size)
    step = make_destr_train_step(model, tx, tcfg)
    batch = _tiny_batch(rng, b=2, size=size, t=t_max)
    for _ in range(2):
        state, metrics = step(state, batch)
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)), (k, size, top_k, t_max, blocks)


@pytest.mark.parametrize("impl", ["rbg", "threefry"])
def test_rng_impl_dropout_stream(impl, tmp_path):
    """TrainConfig.rng_impl selects the dropout-stream PRNG (state.py): "rbg"
    lowers draws to the TPU-native RngBitGenerator (the default — threefry
    xor chains were measurable VPU time in the b8/640 profile, BASELINE.md
    r3), "threefry" restores the JAX default. Either way the step must run
    with dropout active, and the typed key must survive a checkpoint
    round-trip with its impl intact."""
    cfg = DestrConfig(
        hidden_dim=32, num_heads=4, ffn_dim=64, dropout=0.3,
        num_encoder_blocks=1, num_decoder_blocks=1, top_k=4,
    )
    tcfg = TrainConfig(
        batch_size=2, image_size=64, lr=1e-3, lr_backbone=0.0, rng_impl=impl
    )
    model = build_destr(cfg)
    state, tx = create_destr_state(model, tcfg, image_size=64)
    tag = {"rbg": "rbg", "threefry": "fry"}[impl]
    assert tag in str(state.rng.dtype)  # key<rbg> / key<fry> dtype tag
    step = make_destr_train_step(model, tx, tcfg)
    batch = _tiny_batch(np.random.default_rng(7), b=2, size=64, t=4)
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), (impl, k)
    save_checkpoint(str(tmp_path), "rng", state, loader_state={"epoch": 0, "step": 1})
    restored = restore_checkpoint(str(tmp_path), "rng", state)["state"]
    assert restored.rng.dtype == state.rng.dtype
    np.testing.assert_array_equal(
        jax.device_get(jax.random.key_data(restored.rng)),
        jax.device_get(jax.random.key_data(state.rng)),
    )
    # the restored key drives another step
    state2, m2 = step(restored, batch)
    assert np.isfinite(np.asarray(m2["loss"]))


def test_lr_drop_schedule_spec():
    """--lr_drop (TrainConfig.lr_drop, a shared extension — the reference
    trainer has no schedule) turns both lr specs into step-count schedules
    with the boundary at lr_drop * steps_per_epoch."""
    from object_detection_destr_tpu.train.state import _lr_specs

    cfg = TrainConfig(lr=1e-3, lr_backbone=1e-4, lr_drop=2, lr_drop_factor=0.1)
    lr, lr_bb = _lr_specs(cfg, steps_per_epoch=10)
    assert callable(lr) and callable(lr_bb)
    assert float(lr(0)) == pytest.approx(1e-3)
    assert float(lr(19)) == pytest.approx(1e-3)
    assert float(lr(21)) == pytest.approx(1e-4)
    assert float(lr_bb(21)) == pytest.approx(1e-5)

    # off by default (reference behavior: constant lr)
    lr, lr_bb = _lr_specs(TrainConfig(), steps_per_epoch=10)
    assert not callable(lr) and not callable(lr_bb)

    # frozen backbone stays a plain 0 (build_optimizer's set_to_zero branch)
    cfg = TrainConfig(lr=1e-3, lr_backbone=0.0, lr_drop=1)
    lr, lr_bb = _lr_specs(cfg, steps_per_epoch=4)
    assert callable(lr) and lr_bb == 0.0


def test_lr_drop_cli_flag():
    from object_detection_destr_tpu.train.arg_parser import (
        config_from_args,
        get_parser,
    )

    args = get_parser("destr").parse_args(
        ["--lr_drop", "40", "--lr_drop_factor", "0.2"]
    )
    config = config_from_args(args, "destr")
    assert config.train.lr_drop == 40
    assert config.train.lr_drop_factor == pytest.approx(0.2)


def test_params_finite_divergence_guard():
    """The drivers halt (and stop checkpointing) once params go non-finite:
    optax.apply_if_finite fails OPEN after max_consecutive_errors, which in
    the r4 production run poisoned the params and the `_last` checkpoint."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from object_detection_destr_tpu.train.driver import _params_finite

    good = SimpleNamespace(params={"a": jnp.ones((3, 3)), "b": {"c": jnp.zeros(4)}})
    assert _params_finite(good)

    bad = SimpleNamespace(
        params={"a": jnp.ones((3, 3)).at[1, 1].set(jnp.nan), "b": {"c": jnp.zeros(4)}}
    )
    assert not _params_finite(bad)

    inf_bad = SimpleNamespace(params={"a": jnp.full((2,), jnp.inf)})
    assert not _params_finite(inf_bad)


def test_driver_halts_on_divergence_without_overwriting_checkpoints(
    tmp_path, monkeypatch, capsys
):
    """Integration test for the break-before-save ordering in
    train_destr (driver.py: the divergence halt sits BEFORE the best/_last
    saves): a run whose params go non-finite mid-training must (a) halt,
    (b) leave the pre-NaN `save_as` and `_last` checkpoints untouched, and
    (c) be resumable from `_last`. This is the exact failure that burned
    the r4 production run 3e — apply_if_finite failed open at epoch 52 and
    the then-current driver overwrote the good `_last` with NaN weights."""
    import dataclasses

    from object_detection_destr_tpu.train import driver as driver_mod
    from object_detection_destr_tpu.train.driver import train_destr

    real_maker = driver_mod.make_destr_train_step
    calls = {"n": 0}

    def poisoned_maker(model, tx, cfg, mesh=None):
        real = real_maker(model, tx, cfg, mesh=mesh)

        def step(state, batch):
            new_state, metrics = real(state, batch)
            calls["n"] += 1
            if calls["n"] >= 3:  # epoch 1 (2 steps/epoch): poison the params
                new_state = new_state.replace(
                    params=jax.tree.map(lambda p: p * jnp.nan, new_state.params)
                )
            return new_state, metrics

        return step

    monkeypatch.setattr(driver_mod, "make_destr_train_step", poisoned_maker)

    config = Config(
        destr=TINY_DESTR,
        train=TrainConfig(
            batch_size=2,
            image_size=64,
            epochs=4,  # would run 4; must halt after epoch 1
            lr=1e-3,
            lr_backbone=0.0,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "runs"),
            log_interval=2,
        ),
        data=DataConfig(
            dataset="synthetic",
            image_size=80,
            num_train_samples=4,
            num_valid_samples=2,
            augment_factor=1,
            max_targets=8,
        ),
    )
    train_destr(config)
    out = capsys.readouterr().out
    assert "FATAL: non-finite parameters" in out
    # exactly 2 epochs ran (4 steps); epochs 2-3 never started
    assert calls["n"] == 4

    # both checkpoints hold the finite epoch-0 state (loader epoch 1)
    model = build_destr(TINY_DESTR)
    state, _ = create_destr_state(model, config.train, image_size=64)
    for name in ("model_weights", "model_weights_last"):
        restored = restore_checkpoint(str(tmp_path / "ckpt"), name, state)
        leaves = jax.tree.leaves(restored["state"].params)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves), name
        assert int(restored["state"].step) == 2, name
        assert restored["loader"]["epoch"] == 1, name

    # resume from _last with a healthy step: trains and stays finite
    monkeypatch.setattr(driver_mod, "make_destr_train_step", real_maker)
    config2 = Config(
        destr=config.destr,
        train=dataclasses.replace(
            config.train, resume=True, resume_from="model_weights_last", epochs=1
        ),
        data=config.data,
    )
    result2 = train_destr(config2)
    assert np.isfinite(result2["best_val"])
    assert int(jax.device_get(result2["state"].step)) == 4


def test_ema_update_matches_manual_recurrence():
    from object_detection_destr_tpu.train.driver import _make_ema

    decay = 0.9
    init, update = _make_ema(decay)
    params = {"a": jnp.arange(4.0), "b": {"w": jnp.ones((2, 2))}}
    ema = init(params)
    # init is a deep copy, not an alias
    assert ema["a"] is not params["a"]
    np.testing.assert_allclose(np.asarray(ema["a"]), np.arange(4.0))
    p2 = jax.tree.map(lambda x: x * 3.0, params)
    ema = update(ema, p2)
    expect = {  # d*ema + (1-d)*p2
        "a": 0.9 * np.arange(4.0) + 0.1 * 3.0 * np.arange(4.0),
        "w": 0.9 * np.ones((2, 2)) + 0.1 * 3.0 * np.ones((2, 2)),
    }
    np.testing.assert_allclose(np.asarray(ema["a"]), expect["a"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ema["b"]["w"]), expect["w"], rtol=1e-6)


def test_destr_driver_ema_sweep_and_checkpoint(tmp_path):
    """--ema_decay: the driver logs EMA val metrics, saves {save_as}_ema,
    and the training trajectory is untouched (same raw losses as a run
    without EMA)."""
    import json

    from object_detection_destr_tpu.train.driver import train_destr

    def run(subdir, ema):
        config = Config(
            destr=TINY_DESTR,
            train=TrainConfig(
                batch_size=2,
                image_size=64,
                epochs=1,
                lr=1e-3,
                lr_backbone=0.0,
                ema_decay=ema,
                checkpoint_dir=str(tmp_path / subdir / "ckpt"),
                log_dir=str(tmp_path / subdir / "runs"),
                log_interval=2,
            ),
            data=DataConfig(
                dataset="synthetic",
                image_size=80,
                num_train_samples=4,
                num_valid_samples=2,
                augment_factor=1,
                max_targets=8,
            ),
        )
        result = train_destr(config)
        records = [
            json.loads(l)
            for l in open(tmp_path / subdir / "runs" / "metrics.jsonl")
        ]
        return result, records

    result, records = run("ema", ema=0.5)
    tags = {r["tag"] for r in records if "tag" in r}
    assert "Metric/ema_mAP" in tags
    assert any(t.startswith("Loss/valid_ema/") for t in tags)
    assert os.path.exists(str(tmp_path / "ema" / "ckpt" / "model_weights_ema"))

    # trajectory invariance: raw val losses identical with EMA off
    result0, records0 = run("noema", ema=0.0)
    pick = lambda recs: {
        r["tag"]: r["value"]
        for r in recs
        if r.get("tag", "").startswith("Loss/valid/")
    }
    v1, v0 = pick(records), pick(records0)
    assert v1.keys() == v0.keys() and v1
    for k in v1:
        np.testing.assert_allclose(v1[k], v0[k], rtol=1e-6, err_msg=k)
