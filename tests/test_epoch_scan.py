"""Scanned-epoch runner (train/epoch_scan.py): equivalence with the
per-step driver loop, EMA carry, mesh execution, and the cache's
rectangular index surface."""

from typing import Any, NamedTuple

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.train.epoch_scan import make_epoch_runner  # noqa: E402


class _State(NamedTuple):
    params: Any
    rng: Any


def _stub_core(st: _State, batch: dict):
    """Deterministic toy step: params -= lr * f(batch); metric = that mean."""
    m = jnp.mean(batch["images"]) + 0.1 * jnp.mean(batch["boxes"])
    params = jax.tree.map(lambda w: w - 0.01 * (m + 0.001 * jnp.sum(w)), st.params)
    return _State(params, st.rng), {"loss": m}


def _stub_transform(batch: dict, key):
    shift = jax.random.uniform(key, ())
    return {"images": batch["images"] + shift, "boxes": batch["boxes"]}


def _data(n=12, hw=4):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.normal(size=(n, hw, hw, 3)), jnp.float32),
        "boxes": jnp.asarray(rng.uniform(size=(n, 2, 4)), jnp.float32),
    }


def test_runner_matches_per_step_loop():
    """One scanned epoch == the per-step loop: same gather, same
    fold_in(aug, base_step + i) key stream, same step math, stacked
    metrics in step order."""
    data = _data()
    order = np.asarray([[0, 3], [7, 1], [5, 11], [2, 9]], np.int32)
    params = {"w": jnp.ones((3,), jnp.float32)}
    st = _State(params, jax.random.key(0))
    aug = jax.random.key(42)
    base = 17

    ref = st
    ref_metrics = []
    for i, idx in enumerate(order):
        batch = jax.tree.map(lambda a: jnp.take(a, jnp.asarray(idx), axis=0), data)
        key = jax.random.fold_in(aug, base + i)
        ref, m = _stub_core(ref, _stub_transform(batch, key))
        ref_metrics.append(float(m["loss"]))

    # the runner DONATES state/ema -> call it after the reference replay
    runner = make_epoch_runner(_stub_core, _stub_transform)
    out_state, out_ema, stacked = runner(
        st, None, data, jnp.asarray(order), jnp.int32(base), aug
    )

    assert out_ema is None
    np.testing.assert_allclose(
        np.asarray(out_state.params["w"]), np.asarray(ref.params["w"]),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(stacked["loss"]), ref_metrics, rtol=1e-6, atol=1e-7
    )


def test_runner_ema_carry():
    """EMA inside the scan equals the per-step EMA recurrence."""
    data = _data()
    order = np.asarray([[0, 1], [2, 3], [4, 5]], np.int32)
    st = _State({"w": jnp.full((2,), 2.0)}, jax.random.key(0))
    aug = jax.random.key(7)
    decay = 0.9

    ref, ema = st, jax.tree.map(jnp.copy, st.params)
    for i, idx in enumerate(order):
        batch = jax.tree.map(lambda a: jnp.take(a, jnp.asarray(idx), axis=0), data)
        ref, _ = _stub_core(ref, _stub_transform(batch, jax.random.fold_in(aug, i)))
        ema = jax.tree.map(lambda e, p: e * decay + p * (1 - decay), ema, ref.params)

    runner = make_epoch_runner(_stub_core, _stub_transform, ema_decay=decay)
    ema0 = jax.tree.map(jnp.copy, st.params)
    _, out_ema, _ = runner(
        st, ema0, data, jnp.asarray(order), jnp.int32(0), aug
    )

    np.testing.assert_allclose(
        np.asarray(out_ema["w"]), np.asarray(ema["w"]), rtol=1e-6, atol=1e-7
    )


def test_runner_mesh_executes():
    """Under an 8-device mesh the whole epoch runs inside one shard_map:
    batch axis sharded, per-shard metrics psum-reduced by the core."""
    from object_detection_destr_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8)

    def core(st, batch):
        m = jax.lax.pmean(jnp.mean(batch["images"]), "data")
        params = jax.tree.map(lambda w: w - 0.01 * m, st.params)
        return _State(params, st.rng), {"loss": m}

    data = _data(n=16)
    order = np.arange(16, dtype=np.int32).reshape(2, 8)
    st = _State({"w": jnp.ones((4,), jnp.float32)}, jax.random.key(0))
    runner = make_epoch_runner(core, _stub_transform, mesh=mesh)
    out_state, _, stacked = runner(
        st, None, data, jnp.asarray(order), jnp.int32(0), jax.random.key(1)
    )
    assert np.asarray(stacked["loss"]).shape == (2,)
    assert np.all(np.isfinite(np.asarray(out_state.params["w"])))


def test_cache_epoch_index_matrix_matches_iter(tmp_path):
    """epoch_index_matrix returns exactly the batches __iter__ would yield,
    and advance_epoch reproduces __iter__'s bookkeeping."""
    from object_detection_destr_tpu.data import DetectionLoader, build_dataset
    from object_detection_destr_tpu.data.device_cache import DeviceCachedLoader

    ds = build_dataset(
        "synthetic", split="train", image_size=32, num_samples=9,
        max_items_per_img=4,
    )
    mk = lambda: DeviceCachedLoader(
        DetectionLoader(ds, batch_size=3, canvas_size=32, max_targets=4,
                        augment_factor=1, shuffle=True, seed=5)
    )
    a, b = mk(), mk()
    start, idx = a.epoch_index_matrix()
    assert start == 0 and idx.shape == (3, 3)
    a.advance_epoch()

    seen = [np.asarray(batch["images"]) for batch in b]
    gathered = [np.asarray(a._gather(a.data, jnp.asarray(row))["images"])
                for row in idx]
    for x, y in zip(seen, gathered):
        np.testing.assert_array_equal(x, y)
    assert a.state_dict() == b.state_dict()

    # second epoch shuffles differently but stays consistent between the two
    _, idx2a = a.epoch_index_matrix()
    _, idx2b = b.epoch_index_matrix()
    np.testing.assert_array_equal(idx2a, idx2b)
    assert not np.array_equal(idx, idx2a)


def _train_losses(log_dir: str) -> list:
    import json
    import os

    rows = []
    with open(os.path.join(log_dir, "metrics.jsonl")) as fh:
        for line in fh:
            r = json.loads(line)
            if r.get("prefix") == "train":
                rows.append(r["loss"])
    return rows


@pytest.mark.slow
def test_ssd_driver_epoch_scan_end_to_end(tmp_path):
    """Full driver: --epoch_scan --device_cache sees the same data/key
    stream as the per-step path (first-step loss agrees to fusion-level
    rounding — exact bit-equality across two differently-compiled programs
    is not a property XLA offers, and the mining sort amplifies the ~1e-5
    residue chaotically after that), completes, checkpoints, and RESUMES
    through the scanned path."""
    import dataclasses

    from object_detection_destr_tpu.config import (
        Config, DataConfig, SSDConfig, TrainConfig,
    )
    from object_detection_destr_tpu.parallel.mesh import make_mesh
    from object_detection_destr_tpu.train.driver import train_ssd

    # single-device mesh: under >1 shards the scanned epoch's augmentation
    # key stream deliberately differs from the per-step path's global-batch
    # split (epoch_scan.py docstring) — the step-1 comparison below needs
    # identical streams; the sharded path is covered by
    # test_runner_mesh_executes and the multichip dryrun
    mesh1 = make_mesh(1)
    base = Config(
        ssd=SSDConfig(num_cls=3),
        train=TrainConfig(
            batch_size=2, epochs=1, lr=1e-3, log_interval=1, seed=3,
            checkpoint_dir=str(tmp_path / "a"), log_dir=str(tmp_path / "ra"),
            save_as="w",
        ),
        data=DataConfig(
            dataset="synthetic", image_size=128, num_train_samples=4,
            num_valid_samples=2, augment_factor=1, max_targets=8,
            device_cache=True,
        ),
    )
    scan = dataclasses.replace(
        base,
        train=dataclasses.replace(
            base.train, epoch_scan=True, ema_decay=0.9,
            checkpoint_dir=str(tmp_path / "b"), log_dir=str(tmp_path / "rb"),
        ),
    )
    r_step = train_ssd(base, mesh=mesh1)
    r_scan = train_ssd(scan, mesh=mesh1)
    assert np.isfinite(r_scan["best_val"])

    l_step, l_scan = _train_losses(str(tmp_path / "ra")), _train_losses(
        str(tmp_path / "rb")
    )
    assert len(l_step) == len(l_scan) == 2
    np.testing.assert_allclose(l_step[0], l_scan[0], rtol=1e-3)

    # resume continues through the scanned path from the saved epoch
    resumed = dataclasses.replace(
        scan,
        train=dataclasses.replace(
            scan.train, epochs=1, resume=True, resume_from="w_last",
            log_dir=str(tmp_path / "rc"),
        ),
    )
    r2 = train_ssd(resumed, mesh=mesh1)
    assert np.isfinite(r2["best_val"])
    assert len(_train_losses(str(tmp_path / "rc"))) == 2  # the second epoch
