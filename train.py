#!/usr/bin/env python
"""Training entry point — CLI-compatible with the reference ``train.py``.

Usage (same flags, reference ``train.py:14-68``):
    python train.py --model bigru --train_mode active --pred_mode cont ...
"""
from pytorch_video_action_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
