"""css_tpu — a TPU-native semi-supervised semantic segmentation framework.

A from-scratch JAX/Flax/XLA/Pallas re-design of the capabilities of the CSS
reference framework ("Space Engage: Collaborative Space Supervision for
Contrastive-based Semi-Supervised Semantic Segmentation", ICCV 2023):

* DeepLabV3+ (ResNet-101 / deep-stem ResNet-101) student with EMA teacher
* logit-space / representation-space / collaborative pseudo-labeling
  (`ori_pseudo`, `mix_label`, `cross_label` strategies)
* pixel-prototype contrastive loss with similarity-weighted negative sampling
* device-resident augmentation (scale/crop/flip/jitter/blur, CutOut/CutMix/
  ClassMix) — no host round trips in the hot loop
* data-parallel SPMD over a `jax.sharding.Mesh` with XLA collectives

Everything is functional: the training step is a single jit-compiled pure
function over one state pytree {params, batch_stats, ema_params,
ema_batch_stats, opt_state, prototypes, step}.
"""

__version__ = "0.1.0"
