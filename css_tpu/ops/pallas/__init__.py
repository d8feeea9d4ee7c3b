from css_tpu.ops.pallas.contrastive_kernels import weighted_exp_softsum

__all__ = ["weighted_exp_softsum"]
