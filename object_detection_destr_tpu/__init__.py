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
