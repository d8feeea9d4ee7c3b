#!/usr/bin/env python
"""Mix-label entry point: collaborative (agreement) pseudo-labels
(reference mix_label.py).  Pixels where logit-space and representation-space
labels disagree are ignored; the contrastive hard-anchor probability comes
from the representation space; the contrast weight is ramped down per epoch.
"""

import argparse

from css_tpu.cli.train_main import add_common_args, run_training


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_job="VOC_92_mix_label")
    parser.add_argument("--gpu_id", type=str, default="")
    parser.add_argument("--world_size", type=str, default="")
    parser.add_argument("--port", type=str, default="")
    args = parser.parse_args()
    result = run_training("mix", args)
    print(result)


if __name__ == "__main__":
    main()
