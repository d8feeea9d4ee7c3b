#!/usr/bin/env python
"""Inference CLI (shim): segment images with a trained checkpoint.

Implementation: css_tpu/cli/predict_main.py (also installed as the
``css-predict`` console script).  Usage: python predict.py --help
"""

from css_tpu.cli.predict_main import main

if __name__ == "__main__":
    main()
