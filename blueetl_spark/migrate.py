"""Config migration: upgrade v1/v2/v3 analysis configs to the current v4
layout (reference ``apps/migrate.py:29-107`` — same key moves, re-derived).

The version history being replayed:

- **v1 → v2** (blueetl 0.1 → 0.2): the flat single-analysis layout
  (top-level ``extraction`` + ``analysis.features``) becomes the named
  multi-analysis dict under ``analysis.spikes``; a spikes report type is
  stamped; neuron-class ``gid`` lists become ``$gids``; any leftover
  unknown top-level keys ride along under the analysis ``custom`` dict.
- **v2 → v3** (0.2 → 0.8): per-neuron-class bare filter keys move into an
  explicit ``query`` dict; ``$``-prefixed directives lose the sigil
  (``$gids`` → ``node_id``, ``$limit`` → ``limit``, ``$target``/
  ``target`` → ``node_set``, ``$query`` → ``query``).
- **v3 → v4** (0.8 → 0.9): top-level ``output`` / ``clear_cache`` move
  under ``cache`` as ``path`` / ``clear``.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any

CONFIG_VERSION = 4

#: canonical top-level key order for the emitted config
_ROOT_KEY_ORDER = [
    "version",
    "simulation_campaign",
    "simulations_filter",
    "simulations_filter_in_memory",
    "cache",
    "analysis",
    "custom",
]


def _move(d: dict, old: str, new: str) -> None:
    """Rename ``old`` → ``new`` if present; refuse to clobber ``new``."""
    if old in d:
        if new in d:
            raise ValueError(f"cannot rename {old!r}: {new!r} already present")
        d[new] = d.pop(old)


def _v1_to_v2(cfg: dict[str, Any]) -> dict[str, Any]:
    cfg = deepcopy(cfg)
    out: dict[str, Any] = {"version": 2}
    for key in (
        "simulation_campaign",
        "output",
        "simulations_filter",
        "simulations_filter_in_memory",
    ):
        if key in cfg:
            out[key] = cfg.pop(key)
    extraction = cfg.pop("extraction")
    for nc in extraction.get("neuron_classes", {}).values():
        _move(nc, "gid", "$gids")
    features = cfg.pop("analysis", {}).pop("features", [])
    spikes: dict[str, Any] = {
        "extraction": {"report": {"type": "spikes"}, **extraction},
        "features": features,
    }
    if cfg:  # whatever is left is user baggage → custom
        spikes["custom"] = cfg
    out["analysis"] = {"spikes": spikes}
    return out


def _v2_to_v3(cfg: dict[str, Any]) -> dict[str, Any]:
    cfg = deepcopy(cfg)
    cfg["version"] = 3
    for analysis in cfg["analysis"].values():
        extraction = analysis["extraction"]
        _move(extraction, "target", "node_set")
        for nc in extraction.get("neuron_classes", {}).values():
            bare = {k: nc.pop(k) for k in list(nc) if not k.startswith("$")}
            if bare:
                if "query" in nc or "$query" in nc:
                    raise ValueError(
                        f"cannot fold bare filter keys {sorted(bare)} into an "
                        "existing query"
                    )
                nc["query"] = bare
            _move(nc, "$target", "node_set")
            _move(nc, "$limit", "limit")
            _move(nc, "$gids", "node_id")
            _move(nc, "$query", "query")
    return cfg


def _v3_to_v4(cfg: dict[str, Any]) -> dict[str, Any]:
    cfg = deepcopy(cfg)
    cfg["version"] = 4
    cache = cfg.setdefault("cache", {})
    for old, new in (("output", "path"), ("clear_cache", "clear")):
        if old in cfg:
            if new in cache:
                raise ValueError(f"both {old!r} and cache.{new!r} present")
            cache[new] = cfg.pop(old)
    if not cache:
        del cfg["cache"]
    return cfg


def sort_root_keys(cfg: dict[str, Any]) -> dict[str, Any]:
    """Emit known root keys in canonical order, unknown ones after."""
    out = {k: cfg[k] for k in _ROOT_KEY_ORDER if k in cfg}
    out.update({k: v for k, v in cfg.items() if k not in out})
    return out


def migrate_config(cfg: dict[str, Any], sort: bool = True) -> dict[str, Any]:
    """Upgrade a config dict of any supported version to v4.

    Already-current configs pass through unchanged (modulo key sorting);
    unknown versions raise. The result is schema-validated before being
    returned, like the reference CLI (``apps/migrate.py:131``).
    """
    version = cfg.get("version", 1)
    if not isinstance(version, int) or version < 1 or version > CONFIG_VERSION:
        raise ValueError(f"unsupported config version {version!r}")
    if version <= 1:
        cfg = _v1_to_v2(cfg)
    if version <= 2:
        cfg = _v2_to_v3(cfg)
    if version <= 3:
        cfg = _v3_to_v4(cfg)
    if sort:
        cfg = sort_root_keys(cfg)
    from blueetl_spark.validation import validate_config

    validate_config(cfg)
    return cfg
