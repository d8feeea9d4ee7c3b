from css_tpu.ops.pallas.contrastive_kernels import (
    weighted_exp_softsum,
    weighted_exp_softsum_stochastic,
)

__all__ = ["weighted_exp_softsum", "weighted_exp_softsum_stochastic"]
