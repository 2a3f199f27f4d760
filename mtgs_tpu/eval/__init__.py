"""Evaluation: the reference metric suite + eval pipeline."""

from mtgs_tpu.eval.metrics import (
    masked_psnr,
    color_correct,
    depth_metrics,
    image_metrics,
)
from mtgs_tpu.eval.pipeline import evaluate_scene, EvalConfig
