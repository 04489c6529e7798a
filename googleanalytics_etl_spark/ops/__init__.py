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
- ``pipeline``    — training-data pipeline ops (sampling, chunking,
  packing, PII scrub, corpus sharding)
- ``flagship``    — composed flagship pipelines
"""

from . import (  # noqa: F401
    round6aa,
    round6ab,
    round6ac,
    round6ad,
    round6ae,
    round6af,
    round6ag,
    round6ah,
    round6ai,
    round6aj,
    round6ak,
    round6al,
    round6am,
    round6an,
    round6ao,
    round6ap,
    round6aq,
    round6ar,
    round6as,
    round6at,
    aggregates,
    analytics,
    extensions,
    flagship,
    functions,
    joins,
    multimodal,
    pipeline,
    projection,
    round4,
    round4b,
    round4c,
    round4d,
    round4e,
    round4f,
    round5,
    round5b,
    round5c,
    round5d,
    round5e,
    round5f,
    round5g,
    round5h,
    round5i,
    round5j,
    round5k,
    round5l,
    round5m,
    round5o,
    round6,
    round6b,
    round6c,
    round6d,
    round6e,
    round6f,
    round6g,
    round6h,
    round6i,
    round6j,
    round6k,
    round6l,
    round6m,
    round6n,
    round6o,
    round6p,
    round6q,
    round6r,
    round6s,
    round6t,
    round6u,
    round6v,
    round6w,
    round6x,
    round6y,
    round6z,
    scans,
    setops,
    sketch_ops,
    skewops,
    streaming,
    tpch,
    udfs,
    windows,
)
