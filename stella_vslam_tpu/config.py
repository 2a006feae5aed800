"""YAML configuration, compatible with the reference's config files.

Reference: src/stella_vslam/config.{h,cc} — a thin wrapper keeping the raw
YAML node; every component reads its own section with defaults
(util/yaml.h yaml_optional_ref). Sections: Camera, Feature, Preprocessing,
Tracking, Mapping, KeyframeInserter, Initializer, ... (EuRoC_mono.yaml:1-70).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import yaml as _yaml


class Config:
    def __init__(self, node: Optional[Dict[str, Any]] = None, path: Optional[str] = None):
        if path is not None:
            with open(path) as f:
                node = _yaml.safe_load(f)
        self.node: Dict[str, Any] = node or {}

    def section(self, name: str) -> Dict[str, Any]:
        v = self.node.get(name)
        return v if isinstance(v, dict) else {}

    def get(self, section: str, key: str, default=None):
        return self.section(section).get(key, default)

    @staticmethod
    def from_yaml_file(path: str) -> "Config":
        return Config(path=path)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        return Config(node=d)
