"""Validator registry (reference: src/truthound/validators/registry.py).

Plugin-style ``@register_validator`` decorator + name→class lookup, so user
code and the auto-suite can resolve validators by short name exactly as the
reference does (registry.py ~330 LoC; lazy category listing).
"""

from __future__ import annotations

from typing import Callable, Iterable

_REGISTRY: dict[str, type] = {}
_CATEGORIES: dict[str, set[str]] = {}


def register_validator(name: str, category: str = "core") -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY[name] = cls
        _CATEGORIES.setdefault(category, set()).add(name)
        # Only keep an explicitly-declared class name; the inherited
        # Validator.name ("validator") must not mask the registered name.
        if "name" not in cls.__dict__:
            cls.name = name
        cls.category = category
        return cls

    return deco


def get_validator(name: str) -> type:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown validator {name!r}; known: {sorted(_REGISTRY)[:20]}..."
        )
    return _REGISTRY[name]


def list_validators(category: str | None = None) -> list[str]:
    if category is None:
        return sorted(_REGISTRY)
    return sorted(_CATEGORIES.get(category, ()))


def list_categories() -> list[str]:
    return sorted(_CATEGORIES)


def resolve(names: Iterable[str | object]) -> list[object]:
    """Resolve a mixed list of names / classes / instances into instances."""
    out: list[object] = []
    for item in names:
        if isinstance(item, str):
            out.append(get_validator(item)())
        elif isinstance(item, type):
            out.append(item())
        else:
            out.append(item)
    return out
