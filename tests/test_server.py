"""HTTP serving tests: train a tiny model, start the server in-process,
drive /predict and /healthz over a real socket."""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from object_detection_destr_tpu.config import (  # noqa: E402
    Config,
    DataConfig,
    DestrConfig,
    TrainConfig,
)


@pytest.mark.slow
def test_http_predict_end_to_end(tmp_path):
    from PIL import Image

    from object_detection_destr_tpu.infer.server import (
        _make_handler,
        build_service,
        get_parser,
    )
    from object_detection_destr_tpu.train.driver import train_destr

    tiny = DestrConfig(
        hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
        top_k=4, ffn_dim=64, dropout=0.0,
    )
    config = Config(
        destr=tiny,
        train=TrainConfig(
            batch_size=2, image_size=64, epochs=1, lr=1e-3, lr_backbone=0.0,
            checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
            log_interval=2,
        ),
        data=DataConfig(
            dataset="synthetic", image_size=80, num_train_samples=2,
            num_valid_samples=2, augment_factor=1, max_targets=8,
        ),
    )
    train_destr(config)

    args = get_parser().parse_args(
        [
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--weights", "model_weights",
            "--image_size", "64",
            "--hidden_dim", "32", "--ffn_dim", "64", "--num_heads", "4",
            "--num_encoder_blocks", "1", "--num_decoder_blocks", "1",
            "--top_k", "4", "--score_thresh", "0.0",
        ]
    )
    service = build_service(args)
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r) == {"ok": True}

        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, size=(80, 80, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            det = json.load(r)
        assert set(det) == {"boxes", "scores", "labels"}
        assert len(det["boxes"]) <= 4
        for box in det["boxes"]:
            assert len(box) == 4

        # malformed body -> clean 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not an image", method="POST"
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.load(e)
    finally:
        server.shutdown()
        th.join()
