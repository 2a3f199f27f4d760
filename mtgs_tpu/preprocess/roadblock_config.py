"""RoadBlockConfig: the YAML/py data-config layer shared by the offline
factory and the trainer.

Mirror of the reference's scene-selection dataclasses
(`nuplan_scripts/utils/config.py:38-108` in OpenDriveLab/MTGS): a road
block is described once — name, UTM extent, city, traversal selection,
preprocessing switches — and both `preprocess.pipeline` and
`tools/train_scene` consume it. Loads three formats:

  * plain-mapping YAML (what `save_yaml` writes);
  * the reference's `!!python/object:nuplan_scripts.utils.config.
    RoadBlockConfig` tagged YAML (docs/prepare_dataset.md:56-81) via a
    tolerant SafeLoader — the paper's shipped configs load unchanged;
  * a `.py` module exposing a `config` attribute.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

CITIES = (
    "sg-one-north",
    "us-ma-boston",
    "us-nv-las-vegas-strip",
    "us-pa-pittsburgh-hazelwood",
)


@dataclasses.dataclass
class RoadBlockConfig:
    """Scene/data selection for one road block (`config.py:38-86`)."""

    road_block_name: str = ""
    # (x_min, y_min, x_max, y_max) UTM extent
    road_block: Tuple[float, ...] = ()
    city: str = "us-ma-boston"
    data_root: str = "./data/MTGS"
    interval: int = 1            # 1 -> 10 Hz
    expand_buffer: float = 0.0   # meters of trajectory expansion (lidar reg)
    reconstruct_buffer: float = 0.0  # meters of reconstruction buffer
    selected_videos: Tuple[Any, ...] = ()  # video idx or {idx, start, end}
    split: str = "trainval"      # nuplan DB split: trainval | test | all
    collect_raw: bool = False
    exclude_bad_registration: bool = True
    use_colmap_ba: bool = False
    # FrameCentral extension (`config.py:88-96`)
    central_log: str = ""
    central_tokens: List[str] = dataclasses.field(default_factory=list)
    multi_traversal_mode: str = "off"

    @property
    def scene_dir(self) -> Path:
        return Path(self.data_root) / self.road_block_name

    def to_stage_config(self) -> Dict[str, Any]:
        """Per-stage config dict for `preprocess.pipeline.run_pipeline`."""
        common = dict(
            road_block=tuple(self.road_block),
            interval=self.interval,
            expand_buffer=self.expand_buffer,
            reconstruct_buffer=self.reconstruct_buffer,
            selected_videos=tuple(self.selected_videos),
            split=self.split,
            city=self.city,
        )
        cfg: Dict[str, Any] = {name: dict(common) for name in (
            "video_split", "export_videos", "collect_raw", "semantic_masks",
            "lidar_registration", "colmap", "dense_depth", "stack_point_cloud",
        )}
        if self.central_tokens:
            cfg["video_split"]["central_token"] = self.central_tokens[0]
        cfg["lidar_registration"]["exclude_bad"] = self.exclude_bad_registration
        cfg["colmap"]["use_colmap_ba"] = self.use_colmap_ba
        cfg["collect_raw"]["enabled"] = self.collect_raw
        return cfg


def _from_mapping(d: Dict[str, Any]) -> RoadBlockConfig:
    fields = {f.name for f in dataclasses.fields(RoadBlockConfig)}
    known = {k: v for k, v in d.items() if k in fields}
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"unknown RoadBlockConfig keys: {sorted(unknown)}")
    cfg = RoadBlockConfig(**known)
    if isinstance(cfg.road_block, list):
        cfg.road_block = tuple(cfg.road_block)
    if isinstance(cfg.selected_videos, list):
        cfg.selected_videos = tuple(cfg.selected_videos)
    return cfg


def _tolerant_yaml_load(text: str) -> Any:
    """SafeLoader that degrades the reference's `!!python/object:` /
    `!!python/tuple` tags to mappings/tuples instead of executing them."""
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _obj(loader, suffix, node):
        return loader.construct_mapping(node, deep=True)

    def _tuple(loader, node):
        return tuple(loader.construct_sequence(node, deep=True))

    _Loader.add_multi_constructor("tag:yaml.org,2002:python/object:", _obj)
    _Loader.add_multi_constructor(
        "tag:yaml.org,2002:python/object/apply:", _obj)
    _Loader.add_constructor("tag:yaml.org,2002:python/tuple", _tuple)
    return yaml.load(text, Loader=_Loader)


def load_road_block_config(path: str | os.PathLike) -> RoadBlockConfig:
    """Load a RoadBlockConfig from .yaml/.yml/.py (the reference's
    `load_config`, `config.py:98-108`)."""
    path = Path(path)
    if path.suffix == ".py":
        spec = importlib.util.spec_from_file_location(path.stem, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # type: ignore[union-attr]
        cfg = mod.config
        if isinstance(cfg, RoadBlockConfig):
            return cfg
        if dataclasses.is_dataclass(cfg):
            return _from_mapping(dataclasses.asdict(cfg))
        return _from_mapping(dict(cfg))
    if path.suffix in (".yml", ".yaml"):
        data = _tolerant_yaml_load(path.read_text())
        if not isinstance(data, dict):
            raise ValueError(f"{path}: expected a mapping, got {type(data)}")
        return _from_mapping(data)
    raise ValueError(f"unsupported config suffix: {path.suffix}")


def save_yaml(cfg: RoadBlockConfig, path: str | os.PathLike) -> None:
    """Write the config as plain-mapping YAML (loadable by safe_load —
    no python tags, unlike the reference's `BaseConfig.save_config`)."""
    import yaml

    d = dataclasses.asdict(cfg)
    d["road_block"] = list(d["road_block"])
    d["selected_videos"] = list(d["selected_videos"])
    Path(path).write_text(yaml.safe_dump(d, sort_keys=False), "utf8")
