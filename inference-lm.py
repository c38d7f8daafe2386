#!/usr/bin/env python
"""LM beam-search inference entry point — CLI-compatible with the reference
``inference-lm.py`` (ARPA/kenlm-scored beam over ensemble candidates)."""
from pytorch_video_action_tpu.cli.inference_lm_cli import main

if __name__ == "__main__":
    main()
