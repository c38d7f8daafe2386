#!/usr/bin/env python
"""Export a TPU-trained ``.npz`` checkpoint to a torch ``.pth`` state_dict
that the reference's train/inference scripts load unchanged."""
from pytorch_video_action_tpu.cli.export_pth_cli import main

if __name__ == "__main__":
    main()
