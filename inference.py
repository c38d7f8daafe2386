#!/usr/bin/env python
"""Ensemble inference entry point — CLI-compatible with the reference
``inference.py`` (per-segment multi-model majority voting)."""
from pytorch_video_action_tpu.cli.inference_cli import main

if __name__ == "__main__":
    main()
