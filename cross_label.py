#!/usr/bin/env python
"""Cross-label entry point: cross-space supervision (reference
cross_label.py).  The unsupervised loss target switches from logit-space to
representation-space pseudo-labels after ``--warmup`` epochs; prototypes can
be seeded from another run via --prototypes_resume.

Note: the reference script references an undefined ``--total_iter`` flag and
crashes as shipped (cross_label.py:101 vs its argparser); this entry point
defines the flag properly (SURVEY.md "quirks to document, not replicate").
"""

import argparse

from css_tpu.cli.train_main import add_common_args, run_training


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_job="VOC_92_cross_label")
    parser.add_argument("--warmup", type=int, default=0)
    parser.add_argument("--prototypes_resume", type=str, default="")
    parser.add_argument("--gpu_id", type=str, default="")
    parser.add_argument("--world_size", type=str, default="")
    parser.add_argument("--port", type=str, default="")
    args = parser.parse_args()
    result = run_training("cross", args)
    print(result)


if __name__ == "__main__":
    main()
