"""Data layer: nuPlan scene-dict reader, datasets, samplers, synthetic scenes."""

from mtgs_tpu.data.synthetic import SyntheticScene, make_synthetic_scene, batch_iterator
