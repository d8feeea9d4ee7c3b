"""Package-namespaced CLI mains behind the three training entry points.

The repo-root shims (``ori_pseudo.py`` / ``mix_label.py`` / ``cross_label.py``
— reference-named so the reference's ``python ori_pseudo.py ...`` invocations
keep working from a checkout) and the installed console scripts
(``css-train-{ori,mix,cross}``) both dispatch here.  Living inside the
package keeps the wheel from dropping generic top-level modules into
site-packages.
"""

import argparse

from css_tpu.cli.train_main import add_common_args, run_training

__all__ = ["ori_pseudo_main", "mix_label_main", "cross_label_main"]

_ORI_DOC = """Baseline entry point: logit-space pseudo-labels (reference
ori_pseudo.py).  CLI-compatible with the reference script; the CUDA-era
--gpu_id/--world_size/--port are accepted and ignored — device topology
comes from the JAX runtime."""

_MIX_DOC = """Mix-label entry point: collaborative (agreement) pseudo-labels
(reference mix_label.py).  Pixels where logit-space and representation-space
labels disagree are ignored; the contrastive hard-anchor probability comes
from the representation space; the contrast weight is ramped down per epoch."""

_CROSS_DOC = """Cross-label entry point: cross-space supervision (reference
cross_label.py).  The unsupervised loss target switches from logit-space to
representation-space pseudo-labels after --warmup epochs; prototypes can be
seeded from another run via --prototypes_resume.  (The reference script
references an undefined --total_iter flag and crashes as shipped; this entry
point defines the flag properly — SURVEY.md "quirks to document".)"""


def _legacy_dist_flags(parser):
    # accepted for reference-CLI compatibility; topology comes from JAX
    parser.add_argument("--gpu_id", type=str, default="")
    parser.add_argument("--world_size", type=str, default="")
    parser.add_argument("--port", type=str, default="")


def ori_pseudo_main():
    parser = argparse.ArgumentParser(description=_ORI_DOC)
    add_common_args(parser, default_job="VOC_92_baseline")
    _legacy_dist_flags(parser)
    print(run_training("ori", parser.parse_args()))


def mix_label_main():
    parser = argparse.ArgumentParser(description=_MIX_DOC)
    add_common_args(parser, default_job="VOC_92_mix_label")
    _legacy_dist_flags(parser)
    print(run_training("mix", parser.parse_args()))


def cross_label_main():
    parser = argparse.ArgumentParser(description=_CROSS_DOC)
    add_common_args(parser, default_job="VOC_92_cross_label")
    parser.add_argument("--warmup", type=int, default=0)
    parser.add_argument("--prototypes_resume", type=str, default="")
    _legacy_dist_flags(parser)
    print(run_training("cross", parser.parse_args()))
