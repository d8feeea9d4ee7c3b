"""Reference-layout torch checkpoint imports into css_tpu and evaluates.

Builds a reference-format payload (student + EMA state dicts in the
DeepLabv3Plus_with_rep key layout + prototypes), round-trips it through
tools/import_torch_checkpoint.py, restores the orbax checkpoint, and checks
the converted teacher reproduces the torch golden's outputs.
"""

import subprocess
import sys

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp
import torch

from tests.test_model_parity import TorchGoldenDual


@pytest.mark.slow
def test_import_reference_checkpoint(tmp_path):
    torch.manual_seed(3)
    golden = TorchGoldenDual(num_classes=6, output_dim=16).eval()
    protos = np.random.default_rng(0).standard_normal((6, 16)).astype(np.float32)
    payload = {
        "epoch": 7,
        "model": golden.state_dict(),
        "ema_model": golden.state_dict(),
        "optimizer": {},
        "lr_scheduler": {},
        "prototypes": protos,
    }
    pth = tmp_path / "best_model.pth"
    torch.save(payload, pth)

    cfg = {
        "Network": {"num_class": 6, "backbone": "resnet101", "output_dim": 16},
        "Optim": {"lr": 6.4e-3, "weight_decay": 5e-4},
        "Dataset": {"name": "Synthetic", "batch_size": 1,
                    "crop_size": [64, 64], "scale_size": [0.5, 1.5]},
        "Seed": 3407,
    }
    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(yaml.safe_dump(cfg))

    out = tmp_path / "imported"
    r = subprocess.run(
        [sys.executable, "tools/import_torch_checkpoint.py",
         "--torch_ckpt", str(pth), "--config", str(cfgp), "--out", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    from css_tpu.models import build_model
    from css_tpu.train.checkpoint import restore_checkpoint
    from css_tpu.train.state import create_train_state, make_optimizer

    model = build_model(num_classes=6, output_dim=16, backbone="resnet101")
    tx = make_optimizer(1e-3, 0.0, 10)
    template = create_train_state(jax.random.key(0), model, tx,
                                  (1, 64, 64, 3), num_classes=6, output_dim=16)
    state, epoch, _ = restore_checkpoint(str(out), template)
    assert epoch == 7
    np.testing.assert_allclose(np.asarray(state.prototypes), protos, atol=1e-6)

    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    pred, _ = model.apply(
        {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        tpred, _ = golden(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(pred), tpred.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3
    )
