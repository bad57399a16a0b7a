"""DESTR training entry point.

TPU-native counterpart of ``python -m src.train.train``
(src/train/train.py:233-300):

    python -m object_detection_destr_tpu.train.train --epochs 10 \
        --dataset widerface --data_root dataset
"""

from __future__ import annotations

from .arg_parser import config_from_args, get_parser
from .driver import train_destr


def main(argv=None) -> dict:
    from .. import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    args = get_parser("destr").parse_args(argv)
    config = config_from_args(args, "destr")
    return train_destr(config)


if __name__ == "__main__":
    main()
