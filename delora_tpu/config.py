"""Config stack: three-file YAML merge into one flat dict.

Re-creates the reference's config UX (three YAML files merged by every entry
point — reference bin/run_training.py:22-29) with the same key names where the
concept carries over, plus TPU-specific keys (mesh, dtypes, padding sizes).

Load order (later overrides earlier): datasets.yaml -> deployment.yaml ->
hyperparameters.yaml -> user overrides. Degrees->radians conversion for the
fields of view happens here once (reference does it in each bin/ script,
run_training.py:62-67), and mode-dependent identifier mapping follows
run_training.py:74-81 / run_testing.py:58-59.
"""

from __future__ import annotations

import copy
import math
import os
from typing import Any, Dict, Iterable, Mapping, Optional

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")
_DEFAULT_FILES = ("datasets.yaml", "deployment.yaml", "hyperparameters.yaml")


def _deep_merge(base: Dict[str, Any], other: Mapping[str, Any]) -> Dict[str, Any]:
    for key, value in other.items():
        if (
            key in base
            and isinstance(base[key], dict)
            and isinstance(value, Mapping)
        ):
            _deep_merge(base[key], value)
        else:
            base[key] = copy.deepcopy(value)
    return base


def _deg2rad_list(values: Iterable[float]) -> list:
    return [v / 180.0 * math.pi for v in values]


def load_config(
    overrides: Optional[Mapping[str, Any]] = None,
    *,
    config_files: Optional[Iterable[str]] = None,
    mode: Optional[str] = None,
) -> Dict[str, Any]:
    """Build the flat config dict used by every component.

    Args:
      overrides: final-say key/value overrides (CLI flags, tests).
      config_files: alternative YAML files; defaults to the packaged three.
      mode: "training" | "testing" | "preprocessing"; defaults to the value in
        the YAML stack. Controls the per-dataset ``data_identifiers`` mapping.
    """
    config: Dict[str, Any] = {}
    files = list(config_files) if config_files is not None else [
        os.path.join(_CONFIG_DIR, name) for name in _DEFAULT_FILES
    ]
    for path in files:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        _deep_merge(config, loaded)
    if overrides:
        _deep_merge(config, overrides)

    if mode is not None:
        config["mode"] = mode

    # Degrees -> radians (once, centrally).
    if not config.get("_fov_in_radians", False):
        config["horizontal_field_of_view"] = _deg2rad_list(
            config["horizontal_field_of_view"]
        )
        for dataset in config.get("datasets", []):
            spec = config[dataset]
            spec["vertical_field_of_view"] = _deg2rad_list(
                spec["vertical_field_of_view"]
            )
        config["_fov_in_radians"] = True

    # Mode-dependent identifier mapping (reference run_training.py:74-81).
    mode_now = config.get("mode", "training")
    for dataset in config.get("datasets", []):
        spec = config[dataset]
        if mode_now == "training":
            spec["data_identifiers"] = list(spec["training_identifiers"])
        elif mode_now == "testing":
            spec["data_identifiers"] = list(spec["testing_identifiers"])
        elif mode_now == "preprocessing":
            spec["data_identifiers"] = sorted(
                set(spec["training_identifiers"]) | set(spec["testing_identifiers"])
            )
        else:
            raise ValueError(f"Unknown mode: {mode_now!r}")

    _validate(config)
    return config


def _validate(config: Mapping[str, Any]) -> None:
    if config["activation_fct"] not in ("relu", "tanh"):
        raise ValueError('activation_fct must be "relu" or "tanh"')
    if config["normal_loss"] not in ("squared", "linear"):
        raise ValueError('normal_loss must be "squared" or "linear"')
    if config["correspondence"] not in ("projective", "image", "brute"):
        raise ValueError(
            'correspondence must be "projective", "image" or "brute"'
        )
    if config["quaternion_normalization"] not in ("per_row", "global"):
        raise ValueError('quaternion_normalization must be "per_row" or "global"')
    for dataset in config.get("datasets", []):
        if dataset not in config:
            raise ValueError(f"Dataset {dataset!r} has no spec block in the config")
        spec = config[dataset]
        for key in ("vertical_cells", "horizontal_cells", "max_points"):
            if key not in spec:
                raise ValueError(f"Dataset {dataset!r} spec missing {key!r}")


def dataset_spec(config: Mapping[str, Any], dataset: str) -> Dict[str, Any]:
    """Convenience accessor for a dataset's spec block."""
    return config[dataset]
