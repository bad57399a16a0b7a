"""object_detection_destr_tpu — a TPU-native (JAX/XLA/Pallas) object-detection
framework with the capabilities of the reference PyTorch repo
``mio0115/object_detection_destr``.

Subpackages:
    geometry  — box math, IoU/CIoU, sine embeddings (pure jnp)
    ops       — attention, on-device assignment, top-k, NMS, focal loss
    models    — ResNet/VGG backbones, DESTR split transformer, SSD
    losses    — set criterion (Hungarian), SSD anchor criterion
    data      — static-shape data pipeline (WIDER FACE / VOC / COCO / synthetic)
    train     — jitted train/eval steps, drivers, metrics, checkpointing
    parallel  — device mesh + sharding helpers
    infer     — batched predict + on-device NMS postprocessing
    runtime   — native (C++) host-side runtime pieces
"""

__version__ = "0.1.0"


def enable_persistent_jit_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$JAX_COMPILATION_CACHE_DIR`` or ``/tmp/jax_cache``).

    TPU compiles through the pooled-device tunnel take minutes per jit;
    every CLI entry point calls this so a recompile is paid once per
    (program, shape), not once per process. Safe to call repeatedly."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
