#!/usr/bin/env python
"""Export a frame program as a serialized StableHLO deployment artifact.

Thin repo-root launcher for depth_estimation_tpu.tools.export_program (the
packaged `depth-export` console script).

Usage:
  python tools/export_program.py --model-type DPT_Large --hw 480 640 --out dpt.shlo
  python tools/export_program.py --model-type MiDaS_small --hw 384 384 \
      --batched --batch 8 --platforms tpu cpu --out midas_b8.shlo
"""

import sys

sys.path.insert(0, ".")  # run from the repo root

from depth_estimation_tpu.tools.export_program import main

if __name__ == "__main__":
    main()
