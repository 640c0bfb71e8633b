"""Config system: YAML files with dot-access and the reflection registry.

Mirrors the behavior of the reference composition root (reference
``src/main.py:19-28,170-181``): every run is fully described by one YAML file
whose component blocks are ``{name: <ClassName>, kwargs: {...}}``, instantiated
by name from a registry.  The reference used ``python-box``; we provide an
equivalent dot-access mapping so the shipped configs load unchanged.
"""
from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterable, Mapping

import yaml


class Cfg(dict):
    """A dict with attribute access, recursively applied (python-box stand-in).

    ``cfg.dataset.kwargs.data_dir`` works, as does ``cfg['dataset']``.
    Mutations via attribute or item access both update the underlying dict.
    """

    def __init__(self, data: Mapping | None = None, **kwargs):
        super().__init__()
        merged = dict(data or {})
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Cfg):
            return value
        if isinstance(value, Mapping):
            return Cfg(value)
        if isinstance(value, list):
            return [Cfg._wrap(v) for v in value]
        if isinstance(value, tuple):
            return tuple(Cfg._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, Cfg._wrap(value))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any):
        self[name] = value

    def __delattr__(self, name: str):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def update(self, *args, **kwargs):  # keep wrapping on update
        for mapping in args:
            for k, v in dict(mapping).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def setdefault(self, key, default=None):
        if key not in self:
            self[key] = default
        return self[key]

    def to_dict(self) -> dict:
        def unwrap(value):
            if isinstance(value, Cfg):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, list):
                return [unwrap(v) for v in value]
            if isinstance(value, tuple):
                return [unwrap(v) for v in value]
            return value

        return unwrap(self)

    def copy(self) -> "Cfg":
        return Cfg(copy.deepcopy(self.to_dict()))

    @classmethod
    def from_yaml(cls, filename: str | Path | None = None, yaml_string: str | None = None) -> "Cfg":
        if filename is not None:
            with open(filename) as f:
                data = yaml.safe_load(f)
        elif yaml_string is not None:
            data = yaml.safe_load(yaml_string)
        else:
            raise ValueError("Either filename or yaml_string must be given.")
        return cls(data or {})

    def to_yaml(self, filename: str | Path | None = None) -> str:
        text = yaml.safe_dump(self.to_dict(), default_flow_style=False, sort_keys=False)
        if filename is not None:
            Path(filename).write_text(text)
        return text


def load_config(path: str | Path) -> Cfg:
    """Load a YAML config file into a :class:`Cfg`."""
    return Cfg.from_yaml(filename=path)


class Registry:
    """A name → class registry for config-driven instantiation.

    Equivalent to the reference's module-attribute reflection
    (``getattr(module, config.name)``, reference ``src/main.py:170-181``) but
    explicit, so components register themselves and registries compose.
    """

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: dict[str, Any] = {}

    def register(self, name: str | None = None):
        def deco(obj):
            key = name or obj.__name__
            self._entries[key] = obj
            return obj

        return deco

    def add(self, name: str, obj: Any):
        self._entries[name] = obj

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def get(self, name: str) -> Any:
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} component {name!r}. "
                f"Available: {sorted(self._entries)}"
            )
        return self._entries[name]

    def names(self) -> Iterable[str]:
        return sorted(self._entries)

    def build(self, config: Mapping, *args, **extra_kwargs) -> Any:
        """Instantiate ``config.name`` with ``config.kwargs`` (plus extras).

        Matches ``_get_instance`` in the reference (``src/main.py:170-181``).
        """
        cls = self.get(config["name"])
        kwargs = dict(config.get("kwargs") or {})
        kwargs.update(extra_kwargs)
        return cls(*args, **kwargs)


# Global registries, populated by the subpackages at import time.
DATASETS = Registry("dataset")
DATALOADERS = Registry("dataloader")
NETS = Registry("net")
LOSSES = Registry("loss")
METRICS = Registry("metric")
OPTIMIZERS = Registry("optimizer")
LR_SCHEDULERS = Registry("lr_scheduler")
LOGGERS = Registry("logger")
MONITORS = Registry("monitor")
TRAINERS = Registry("trainer")
PREDICTORS = Registry("predictor")
TRANSFORMS = Registry("transform")
