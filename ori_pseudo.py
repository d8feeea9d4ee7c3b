#!/usr/bin/env python
"""Baseline entry point: logit-space pseudo-labels (reference ori_pseudo.py).

Reference-CLI-compatible shim; implementation in css_tpu/cli/entries.py
(also installed as the ``css-train-ori`` console script).
"""

from css_tpu.cli.entries import ori_pseudo_main as main

if __name__ == "__main__":
    main()
