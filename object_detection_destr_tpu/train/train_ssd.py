"""SSD training entry point.

TPU-native counterpart of ``python -m src.train.train_ssd``
(src/train/train_ssd.py:149-214):

    python -m object_detection_destr_tpu.train.train_ssd --epochs 10 \
        --dataset voc --data_root dataset
"""

from __future__ import annotations

from .arg_parser import config_from_args, get_parser
from .driver import train_ssd


def main(argv=None) -> dict:
    from .. import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    args = get_parser("ssd").parse_args(argv)
    config = config_from_args(args, "ssd")
    return train_ssd(config)


if __name__ == "__main__":
    main()
