#!/usr/bin/env python
"""Standalone checkpoint evaluation CLI (shim).

Implementation: css_tpu/cli/evaluate_main.py (also installed as the
``css-evaluate`` console script).  Usage: python evaluate.py --help
"""

from css_tpu.cli.evaluate_main import main

if __name__ == "__main__":
    main()
