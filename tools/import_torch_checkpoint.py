#!/usr/bin/env python
"""Import a reference (PyTorch) training checkpoint into css_tpu.

The reference saves ``{epoch, model, ema_model, optimizer, lr_scheduler,
prototypes}`` via ``torch.save`` (ori_pseudo.py:135-145).  This tool converts
the student/teacher weights and prototypes into a css_tpu orbax checkpoint so
reference users can evaluate or continue training here:

    python tools/import_torch_checkpoint.py \
        --torch_ckpt best_model.pth \
        --config css_tpu/config/VOC_config_baseline.yaml \
        --out checkpoints/imported \
        [--total_iter 80000]

Optimizer momentum is NOT carried over (torch buffers don't map 1:1 onto the
optax trace pytree); resumed runs restart momentum from zero, which matches
the effect of a fresh-optimizer fine-tune.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--config", default="css_tpu/config/VOC_config_baseline.yaml")
    p.add_argument("--out", required=True)
    p.add_argument("--total_iter", type=int, default=80000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from css_tpu.config import load_config
    from css_tpu.models import build_model
    from css_tpu.models.convert import convert_full_model
    from css_tpu.train.checkpoint import save_checkpoint
    from css_tpu.train.state import create_train_state, make_optimizer

    cfg = load_config(args.config)
    num_classes = cfg.require("Network.num_class")
    output_dim = cfg.get("Network.output_dim", 256)
    crop = tuple(cfg.require("Dataset.crop_size"))

    payload = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    epoch = int(payload.get("epoch", 0))

    def to_np(sd):
        return {k: v.detach().cpu().numpy() for k, v in sd.items()}

    model = build_model(num_classes=num_classes, output_dim=output_dim,
                        backbone=cfg.get("Network.backbone", "resnet101"))
    tx = make_optimizer(float(cfg.require("Optim.lr")),
                        float(cfg.require("Optim.weight_decay")),
                        args.total_iter)
    state = create_train_state(
        jax.random.key(cfg.get("Seed", 3407)), model, tx,
        (1, crop[0], crop[1], 3), num_classes=num_classes,
        output_dim=output_dim,
    )

    params, stats = convert_full_model(to_np(payload["model"]), model)
    ema_params, ema_stats = convert_full_model(to_np(payload["ema_model"]), model)
    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    state = state.replace(
        params=as_jnp(params),
        batch_stats=as_jnp(stats),
        ema_params=as_jnp(ema_params),
        ema_batch_stats=as_jnp(ema_stats),
        prototypes=jnp.asarray(np.asarray(payload["prototypes"], np.float32)),
    )
    save_checkpoint(args.out, state, epoch=epoch, miou=0.0)
    print(f"imported epoch-{epoch} reference checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
