"""Dataclass configuration system.

TPU-native replacement for the reference's nested-class config tree
(reference: legged_gym/legged_gym/envs/base/base_config.py and
legged_robot_config.py).  Configs are plain (mutable) dataclasses so robot
variants override fields by subclassing, exactly like the reference's
``class env(LeggedRobotCfg.env)`` pattern — but with type checking,
``to_dict`` / ``update_from_dict`` bridging, and deterministic field order.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple, Type, TypeVar

T = TypeVar("T")


def configclass(cls: Type[T]) -> Type[T]:
    """Decorator: dataclass with mutable-default support.

    Plain defaults that are lists/dicts/dataclass instances are wrapped in
    ``default_factory`` automatically, so configs read like the reference's
    nested classes (``foo = [1.0, 2.0]``) without dataclass mutability errors.
    """
    annotations = getattr(cls, "__annotations__", {})
    for name in list(annotations):
        if name.startswith("_"):
            continue
        default = getattr(cls, name, dataclasses.MISSING)
        if default is dataclasses.MISSING:
            continue
        if isinstance(default, (list, dict, set)) or is_dataclass(default):
            if is_dataclass(default) and not isinstance(default, type):
                setattr(cls, name, field(default_factory=_make_copier(default)))
            elif isinstance(default, type):
                pass
            else:
                setattr(cls, name, field(default_factory=_make_copier(default)))
    # Nested config classes declared inline (class terrain: ...) become fields
    return dataclass(cls)


def _make_copier(value):
    import copy

    def _copy():
        return copy.deepcopy(value)

    return _copy


def class_to_dict(obj: Any) -> Any:
    """Recursively convert a config (dataclass) to nested dicts
    (reference helpers.py:43 ``class_to_dict``).  Includes attributes added
    dynamically on instances — robot configs extend reward scales by plain
    assignment (``cfg.rewards.scales.no_fly = 0.25``), mirroring the
    reference's subclass-with-new-attribute pattern."""
    if is_dataclass(obj) and not isinstance(obj, type):
        out = {f.name: class_to_dict(getattr(obj, f.name)) for f in fields(obj)}
        declared = set(out)
        for k, v in vars(obj).items():
            if k not in declared and not k.startswith("_"):
                out[k] = class_to_dict(v)
        return out
    if isinstance(obj, (list, tuple)):
        return type(obj)(class_to_dict(v) for v in obj)
    if isinstance(obj, dict):
        return {k: class_to_dict(v) for k, v in obj.items()}
    return obj


def update_class_from_dict(obj: Any, d: Dict[str, Any]) -> Any:
    """Recursively update a config dataclass in place from a nested dict
    (reference helpers.py:57 ``update_class_from_dict``)."""
    for key, value in d.items():
        if not hasattr(obj, key):
            continue
        attr = getattr(obj, key)
        if is_dataclass(attr) and isinstance(value, dict):
            update_class_from_dict(attr, value)
        else:
            setattr(obj, key, value)
    return obj
