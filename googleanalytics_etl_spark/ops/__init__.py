"""Operator implementations. Importing this package populates REGISTRY.

One module per SURVEY.md §2 category:

- ``scans``       — §2.A scans/sources
- ``projection``  — §2.B projection/filter/derivation
- ``joins``       — §2.C joins
- ``aggregates``  — §2.D aggregation
- ``windows``     — §2.E window functions
- ``setops``      — §2.F sort/limit/top-k/set ops
- ``functions``   — §2.G scalar function families
- ``streaming``   — §2.H streaming semantics (batch-checkable twins)
- ``udfs``        — §2.I UDF/UDAF surface
- ``extensions``  — §2.J dedup / similarity / text-analysis north star
- ``flagship``    — composed flagship pipelines
"""

from . import flagship  # noqa: F401

_OPTIONAL = (
    "scans",
    "projection",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "functions",
    "streaming",
    "udfs",
    "extensions",
    "multimodal",
)

import importlib as _importlib

for _m in _OPTIONAL:
    try:
        _importlib.import_module(f".{_m}", __name__)
    except ModuleNotFoundError as e:  # module not written yet (build plan §7)
        if e.name and not e.name.endswith(_m):
            raise
