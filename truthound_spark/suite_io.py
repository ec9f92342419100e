"""Validation-suite serialization: save a suite of validator instances
to JSON/YAML, reload it later, filter it.

Reference: profiler/generators/suite_generator.py:65-349 ValidationSuite
(immutable rule collection with category/column filters, export, and
to-validators conversion) and the reference's YAML suite files that
checkpoints run daily. This is the missing half of the learning loop:
``tune``/``mine`` emit validator INSTANCES; persisting them makes
"learn once, enforce every day" a file artifact instead of a process
that must re-learn each run.

Serialization is generic: a validator row is ``{"validator": <registry
name>, "params": {...}}`` where params are recovered by introspecting
the constructor signature against same-named instance attributes (every
spec validator in this engine stores its constructor args verbatim).
Loading resolves through the same registry ``check()`` uses, so a
loaded suite is byte-for-byte the suite that was saved.
"""

from __future__ import annotations

import inspect
import json
import time
from dataclasses import dataclass, field
from typing import Any, Iterable

from truthound_spark.core.registry import _REGISTRY, get_validator

# ensure all built-ins are registered before any reverse lookup
import truthound_spark.validators  # noqa: F401  (registration side effect)


class SuiteSerializationError(ValueError):
    pass


def _registry_name(cls: type) -> str | None:
    """Reverse registry lookup; aliases resolve to the first
    (sorted) name for determinism."""
    names = sorted(n for n, c in _REGISTRY.items() if c is cls)
    return names[0] if names else None


def validator_to_dict(v: Any) -> dict[str, Any]:
    """Instance → {"validator": name, "params": {...}} via constructor
    introspection. Raises for validators holding non-serializable state
    (e.g. a reference DataFrame) — those are runtime-only by nature."""
    from truthound_spark.ml.rule_learning import MostlyWrapped

    if isinstance(v, MostlyWrapped):
        # tolerance adapter around a registered validator: serialize the
        # inner validator + the mostly level, re-wrap on load
        d = validator_to_dict(v.inner)
        d["mostly_wrap"] = v.mostly
        return d
    cls = type(v)
    name = _registry_name(cls)
    if name is None:
        raise SuiteSerializationError(f"{cls.__name__} is not a registered validator")
    params: dict[str, Any] = {}
    sig = inspect.signature(cls.__init__)
    inst = vars(v)
    for pname, p in sig.parameters.items():
        if pname == "self" or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        # constructor args live in the INSTANCE dict under the same (or
        # underscore-prefixed) name. Class attributes are deliberately
        # NOT consulted: register_validator sets cls.name, so a generic
        # getattr would serialize the registry name in place of a
        # mined rule's instance name (CustomExpressionValidator._name).
        if pname in inst:
            val = inst[pname]
        elif f"_{pname}" in inst:
            val = inst[f"_{pname}"]
        elif f"{pname}s" in inst:
            # list-normalizing ctors store scalar-or-list args pluralized
            # (FunctionalDependency determinant→determinants, ColumnDependency
            # condition_value→condition_values, ColumnImplication
            # antecedent/consequent_value→*_values); the ctor re-accepts the
            # list form, so the round-trip is value-identical.
            val = inst[f"{pname}s"]
        elif pname == "column" and "columns" in inst:
            continue  # normalized into .columns
        elif p.default is not p.empty:
            continue  # default applied, attribute renamed — skip
        else:
            raise SuiteSerializationError(
                f"{cls.__name__}: cannot recover constructor arg {pname!r}"
            )
        if val is None or isinstance(val, (str, int, float, bool)):
            params[pname] = val
        elif isinstance(val, (list, tuple)) and all(
            x is None or isinstance(x, (str, int, float, bool)) for x in val
        ):
            params[pname] = list(val)
        elif isinstance(val, dict) and all(
            isinstance(k, str) and (x is None or isinstance(x, (str, int, float, bool, list)))
            for k, x in val.items()
        ):
            params[pname] = val
        else:
            raise SuiteSerializationError(
                f"{cls.__name__}.{pname} holds non-serializable {type(val).__name__} "
                "(runtime-only validator — exclude it from the persisted suite)"
            )
    return {"validator": name, "params": params}


def validator_from_dict(d: dict[str, Any]) -> Any:
    cls = get_validator(d["validator"])
    v = cls(**(d.get("params") or {}))
    if d.get("mostly_wrap") is not None:
        from truthound_spark.ml.rule_learning import MostlyWrapped

        return MostlyWrapped(v, float(d["mostly_wrap"]))
    return v


@dataclass
class ValidationSuite:
    """Named, persistable suite (reference suite_generator.py:65-349)."""

    name: str
    validators: list[Any] = field(default_factory=list)
    source: str = ""
    metadata: dict[str, Any] = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.validators)

    def __iter__(self):
        return iter(self.validators)

    # -- filters (reference :85-170) ---------------------------------------
    def filter_by_columns(self, *columns: str) -> "ValidationSuite":
        colset = set(columns)

        def touches(v: Any) -> bool:
            cols = getattr(v, "columns", None) or []
            one = getattr(v, "column", None)
            named = set(c for c in list(cols) + [one] if isinstance(c, str))
            return not named or bool(named & colset)

        return ValidationSuite(
            name=self.name,
            validators=[v for v in self.validators if touches(v)],
            source=self.source,
            metadata=self.metadata,
        )

    def filter_by_validator(self, *names: str) -> "ValidationSuite":
        keep = set(names)
        return ValidationSuite(
            name=self.name,
            validators=[
                v for v in self.validators if _registry_name(type(v)) in keep
            ],
            source=self.source,
            metadata=self.metadata,
        )

    # -- persistence -------------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "source": self.source,
            "metadata": self.metadata,
            "validators": [validator_to_dict(v) for v in self.validators],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ValidationSuite":
        return cls(
            name=d.get("name", "suite"),
            source=d.get("source", ""),
            metadata=dict(d.get("metadata") or {}),
            validators=[validator_from_dict(r) for r in d.get("validators", [])],
        )

    def save(self, path: str) -> None:
        d = self.to_dict()
        d["metadata"].setdefault("saved_at", time.time())
        if path.endswith((".yaml", ".yml")):
            import yaml

            with open(path, "w") as f:
                yaml.safe_dump(d, f, sort_keys=False)
        else:
            with open(path, "w") as f:
                json.dump(d, f, indent=2)

    @classmethod
    def load(cls, path: str) -> "ValidationSuite":
        if path.endswith((".yaml", ".yml")):
            import yaml

            with open(path) as f:
                return cls.from_dict(yaml.safe_load(f))
        with open(path) as f:
            return cls.from_dict(json.load(f))

    # -- execution -----------------------------------------------------------
    def check(self, data: Any, **kwargs: Any):
        from truthound_spark.api import check as _check

        return _check(data, validators=self.validators, **kwargs)


def save_suite(validators: Iterable[Any], path: str, name: str = "suite", **metadata: Any) -> None:
    ValidationSuite(name=name, validators=list(validators), metadata=metadata).save(path)


def load_suite(path: str) -> ValidationSuite:
    return ValidationSuite.load(path)
