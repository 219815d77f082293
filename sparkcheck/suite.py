"""Expectation configurations, suites, and result-format semantics.

Mirrors the reference's declarative model (SURVEY.md §1):
  - ExpectationConfiguration = expectation_type + kwargs
    (reference: great_expectations/core/expectation_configuration.py)
  - ExpectationSuite = named list of configurations
    (reference: great_expectations/core/expectation_suite.py)
  - result_format parsing with BOOLEAN_ONLY/BASIC/SUMMARY/COMPLETE and
    partial_unexpected_count default 20
    (reference: great_expectations/core/expectation_configuration.py:61-86
    `parse_result_format`)

Ours are plain frozen dataclasses serialized to/from JSON.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

RESULT_FORMATS = ("BOOLEAN_ONLY", "BASIC", "SUMMARY", "COMPLETE")

# Keys that live in kwargs but are runtime knobs, not domain/success keys
# (reference: validator/validator.py:492-525 splits these out).
RUNTIME_KEYS = ("result_format", "catch_exceptions")


def parse_result_format(result_format: str | dict[str, Any] | None) -> dict[str, Any]:
    """Normalize a result_format spec to a dict.

    Reference semantics: core/expectation_configuration.py:61-86 — a bare
    string becomes {"result_format": str, "partial_unexpected_count": 20}.
    """
    if result_format is None:
        result_format = "BASIC"
    if isinstance(result_format, str):
        rf: dict[str, Any] = {"result_format": result_format}
    else:
        rf = dict(result_format)
    rf.setdefault("result_format", "BASIC")
    rf.setdefault("partial_unexpected_count", 20)
    rf.setdefault("unexpected_index_column_names", None)
    rf.setdefault("include_unexpected_rows", False)
    if rf["result_format"] not in RESULT_FORMATS:
        raise ValueError(f"unknown result_format {rf['result_format']!r}")
    return rf


def _freeze(v: Any) -> Any:
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, set):
        return tuple(sorted(_freeze(x) for x in v))
    return v


@dataclass(frozen=True)
class ExpectationConfiguration:
    """Declarative check: type + kwargs (domain + success + runtime keys)."""

    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    def get(self, key: str, default: Any = None) -> Any:
        return self.kwargs.get(key, default)

    @property
    def id(self) -> tuple:
        return (self.expectation_type, _freeze(self.kwargs))

    def to_dict(self) -> dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": self.kwargs,
            "meta": self.meta,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationConfiguration":
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs", {})),
            meta=dict(d.get("meta", {})),
        )


@dataclass
class ExpectationSuite:
    name: str
    expectations: list[ExpectationConfiguration] = field(default_factory=list)
    meta: dict[str, Any] = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> ExpectationConfiguration:
        cfg = ExpectationConfiguration(expectation_type, kwargs)
        self.expectations.append(cfg)
        return cfg

    def to_json(self) -> str:
        return json.dumps(
            {
                "expectation_suite_name": self.name,
                "expectations": [e.to_dict() for e in self.expectations],
                "meta": self.meta,
            },
            indent=2,
            default=str,
        )

    @classmethod
    def from_json(cls, s: str) -> "ExpectationSuite":
        d = json.loads(s)
        return cls(
            # the reference JSON key, with plain "name" as a fallback for
            # hand-written configs
            name=d.get("expectation_suite_name", d.get("name", "default")),
            expectations=[
                ExpectationConfiguration.from_dict(e) for e in d.get("expectations", [])
            ],
            meta=dict(d.get("meta", {})),
        )

    @classmethod
    def from_file(cls, path: str) -> "ExpectationSuite":
        with open(path) as f:
            return cls.from_json(f.read())
