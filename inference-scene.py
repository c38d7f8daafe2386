#!/usr/bin/env python
"""Scene-aggregated inference entry point — CLI-compatible with the reference
``inference-scene.py`` (cross-camera majority voting)."""
from pytorch_video_action_tpu.cli.inference_scene_cli import main

if __name__ == "__main__":
    main()
