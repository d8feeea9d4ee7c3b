#!/usr/bin/env python
"""Baseline entry point: logit-space pseudo-labels (reference ori_pseudo.py).

CLI-compatible with the reference script (flags --config/--resume/
--num_labels/--total_iter/--job_name; the CUDA-era --gpu_id/--world_size/
--port are accepted and ignored — device topology comes from the JAX
runtime).  Train loop semantics in css_tpu/cli/train_main.py.
"""

import argparse

from css_tpu.cli.train_main import add_common_args, run_training


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_job="VOC_92_baseline")
    # accepted for reference-CLI compatibility; topology comes from JAX
    parser.add_argument("--gpu_id", type=str, default="")
    parser.add_argument("--world_size", type=str, default="")
    parser.add_argument("--port", type=str, default="")
    args = parser.parse_args()
    result = run_training("ori", args)
    print(result)


if __name__ == "__main__":
    main()
