"""SSD data-parallel parity: the sharded step must reproduce single-device
math over the 8-device virtual mesh (the DESTR twin lives in
tests/test_parallel.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.config import SSDConfig, TrainConfig  # noqa: E402
from object_detection_destr_tpu.models.ssd.model import build_ssd  # noqa: E402
from object_detection_destr_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from object_detection_destr_tpu.train.state import create_ssd_state  # noqa: E402
from object_detection_destr_tpu.train.steps import make_ssd_train_step  # noqa: E402


@pytest.mark.slow
def test_ssd_data_parallel_matches_single_device():
    cfg = SSDConfig(num_cls=3)
    train_cfg = TrainConfig(batch_size=8, lr=1e-3)
    model = build_ssd(cfg)
    state, tx = create_ssd_state(model, train_cfg, image_size=cfg.image_size)
    train_step = make_ssd_train_step(model, tx, train_cfg, cfg)

    rng = np.random.default_rng(0)
    b, t = 8, 4
    batch = {
        "images": rng.normal(size=(b, cfg.image_size, cfg.image_size, 3)).astype(
            np.float32
        ),
        "boxes": np.stack(
            [
                rng.uniform(0.3, 0.7, size=(b, t)),
                rng.uniform(0.3, 0.7, size=(b, t)),
                rng.uniform(0.1, 0.4, size=(b, t)),
                rng.uniform(0.1, 0.4, size=(b, t)),
            ],
            -1,
        ).astype(np.float32),
        "labels": np.zeros((b, t), np.int32),
        "valid": np.ones((b, t), bool),
    }

    state_s = jax.tree.map(lambda x: jnp.copy(x), state)
    state_s, metrics_s = train_step(state_s, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh()
    state_p = jax.device_put(state, replicated_sharding(mesh))
    state_p, metrics_p = train_step(state_p, shard_batch(batch, mesh))

    m_s, m_p = jax.device_get(metrics_s), jax.device_get(metrics_p)
    for k in m_s:
        np.testing.assert_allclose(m_s[k], m_p[k], rtol=3e-4, atol=3e-4)
