"""SONATA node-sets: JSON definitions → filter predicates (S6).

Reference behavior: node sets are loaded from a SONATA ``node_sets_file``,
optionally overlaid with a simulation-local file (``ns1 |= ns2``), and a
named set restricts which cells a neuron class can select
(``/root/reference/src/blueetl/adapters/node_sets.py``, usage
``extract/neurons.py:52-57``).

SONATA node-set semantics supported here (the subset the reference
exercises):

- *basic* sets: ``{"prop": value}`` / ``{"prop": [v1, v2]}`` — property
  equality / membership, AND across keys; ``node_id`` lists select by id.
- *compound* sets: ``["set_a", "set_b"]`` — union (OR) of other sets.

Sets compile to q-DSL queries, so they ride the same
:func:`blueetl_spark.functions.qdsl.compile_query` path as neuron-class
queries — driver-side JSON in, one Catalyst predicate out, no data motion.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pyspark.sql import Column

from blueetl_spark.functions.qdsl import compile_query


class NodeSets:
    """A named collection of SONATA node-set definitions."""

    def __init__(self, content: dict[str, Any] | None = None) -> None:
        self.content: dict[str, Any] = dict(content or {})

    @classmethod
    def from_file(cls, path: str | Path | None) -> "NodeSets":
        if path is None:
            return cls({})
        return cls(json.loads(Path(path).read_text()))

    def update(self, other: "NodeSets") -> "NodeSets":
        """Overlay ``other`` on top (the reference's ``ns1 |= ns2``):
        same-named sets are replaced, new ones added. Returns self."""
        self.content.update(other.content)
        return self

    def __contains__(self, name: str) -> bool:
        return name in self.content

    def to_query(self, name: str) -> dict | list[dict]:
        """Resolve one node set to a q-DSL query (P6 list-of-dicts for
        compound sets)."""
        try:
            definition = self.content[name]
        except KeyError:
            raise KeyError(
                f"node set {name!r} not defined; available: {sorted(self.content)}"
            )
        return self._resolve(definition, seen=(name,))

    def _resolve(self, definition: Any, seen: tuple[str, ...]) -> dict | list[dict]:
        if isinstance(definition, dict):
            return dict(definition)
        if isinstance(definition, list):  # compound: union of named sets
            parts: list[dict] = []
            for ref in definition:
                if not isinstance(ref, str):
                    raise ValueError(f"compound node set members must be names: {ref!r}")
                if ref in seen:
                    raise ValueError(f"circular node set reference: {' -> '.join(seen + (ref,))}")
                if ref not in self.content:
                    raise KeyError(
                        f"node set {ref!r} (referenced by {seen[-1]!r}) not "
                        f"defined; available: {sorted(self.content)}"
                    )
                sub = self._resolve(self.content[ref], seen + (ref,))
                parts.extend(sub if isinstance(sub, list) else [sub])
            return parts
        raise ValueError(f"unsupported node set definition: {definition!r}")

    def to_predicate(self, name: str) -> Column:
        """Compile a node set straight to a Spark ``Column`` predicate."""
        return compile_query(self.to_query(name))
