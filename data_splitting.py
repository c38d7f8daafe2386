#!/usr/bin/env python
"""Stratified 5-fold split generation — reference ``data_splitting.py``."""
from pytorch_video_action_tpu.cli.data_splitting_cli import main

if __name__ == "__main__":
    main()
