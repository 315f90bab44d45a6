"""Dataset registry (reference ``lib/datasets/build.py:5-31``)."""

from __future__ import annotations

from typing import Callable, Dict

DATASET_REGISTRY: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls

    return deco


def build_dataset(dataset_name: str, cfg, split: str):
    """Name is capitalized from config, matching the reference
    (reference ``lib/datasets/build.py:29``)."""
    name = dataset_name.capitalize()
    if name not in DATASET_REGISTRY:
        raise KeyError(
            f"Unknown dataset {name}; registered: {list(DATASET_REGISTRY)}"
        )
    return DATASET_REGISTRY[name](cfg, split)
