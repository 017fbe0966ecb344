"""E2E gate: train on 8 synthetic images until overfit, then mAP via the
full fused detect + COCOeval stack. Expect high AP (boxes lock on)."""
import numpy as np
import jax

from detjax.config import get_config
from detjax.data import SyntheticDetectionDataset, make_train_iterator
from detjax.evaluation.evaluator import run_coco_eval
from detjax.train import fit

cfg = get_config("retinanet_r50_640", **{
    "model.image_size": (256, 256),
    "model.num_classes": 6,
    "model.frozen_backbone_bn": False,
    "train.batch_size": 8,
    "train.max_gt": 8,
    "train.learning_rate": 1e-3,
    "train.lr_schedule": "constant",
    "data.hflip_prob": 0.0,
    "data.random_crop": False,
    "eval.batch_size": 8,
})
ds = SyntheticDetectionDataset(num_images=8, image_size=(256, 256),
                               num_classes=6, max_objects=3, seed=3)
res = fit(cfg, make_train_iterator(ds, cfg), num_steps=1500, log_every=250)
state = res.state
variables = {"params": state.params, "batch_stats": state.batch_stats}
ev = run_coco_eval(variables, ds, cfg)
print({k: round(v, 4) for k, v in ev.stats.items() if k in
       ("AP", "AP50", "AP75", "AR100")})
print("train img/s:", round(res.images_per_sec, 1))
assert ev.stats["AP50"] > 0.6, f"E2E overfit gate failed: {ev.stats}"
print("E2E GATE PASSED")
