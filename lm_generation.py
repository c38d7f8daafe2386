#!/usr/bin/env python
"""LM corpus generation (+ in-repo ARPA training) — reference ``lm_generation.py``."""
from pytorch_video_action_tpu.cli.lm_generation_cli import main

if __name__ == "__main__":
    main()
