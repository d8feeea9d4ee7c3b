#!/usr/bin/env python
"""Mix-label entry point: collaborative (agreement) pseudo-labels
(reference mix_label.py shim; implementation in css_tpu/cli/entries.py,
installed as ``css-train-mix``)."""

from css_tpu.cli.entries import mix_label_main as main

if __name__ == "__main__":
    main()
