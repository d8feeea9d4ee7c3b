#!/usr/bin/env python
"""Cross-label entry point: cross-space supervision (reference
cross_label.py shim; implementation in css_tpu/cli/entries.py, installed
as ``css-train-cross``)."""

from css_tpu.cli.entries import cross_label_main as main

if __name__ == "__main__":
    main()
