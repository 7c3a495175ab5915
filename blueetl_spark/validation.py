"""JSON-Schema validation of analysis configs (reference
``validation.py:23-48`` + ``schemas/analysis_config.yaml``).

The schema below describes THIS engine's config dialect — the reference's
version-4 layout with the Spark-side extensions (`simulation_campaign` may
be an inline dict as well as a path, feature configs address built-in
Spark-native functions and may carry a ``schema`` string for the
``applyInPandas`` UDTF path, windows may carry an onset-detection
``trial_steps`` dict). Structure, required keys, enums, and
``additionalProperties: false`` strictness mirror the reference schema so
the same classes of invalid config are rejected: unknown top-level /
nested keys, missing ``extraction`` / ``neuron_classes`` / ``windows``,
malformed bounds, non-enum report types, and feature ``groupby`` keys
outside the supported set.
"""

from __future__ import annotations

from typing import Any

#: the report-group keys a feature config may group by
GROUPBY_KEYS = [
    "simulation_id",
    "circuit_id",
    "neuron_class",
    "window",
    "trial",
    "gid",
]

_NULLABLE_STR = {"type": ["string", "null"]}
_NULLABLE_INT = {"type": ["integer", "null"]}
_BOUNDS = {
    "type": "array",
    "minItems": 2,
    "maxItems": 2,
    "items": {"type": "number"},
}

_TRIAL_STEPS = {  # onset-detection spec (A22) — my dynamic-offset dialect
    "type": "object",
    "properties": {
        "function": {"type": "string"},
        "bounds": _BOUNDS,
        "initial_offset": {"type": "number"},
        "population": _NULLABLE_STR,
        "node_set": _NULLABLE_STR,
        "node_sets_file": _NULLABLE_STR,
        "limit": _NULLABLE_INT,
        "params": {"type": "object"},
        # native operators.onset knobs
        "bin_size": {"type": "number"},
        "sigma": {"type": "number"},
        "std_multiple": {"type": "number"},
        "pre_fraction": {"type": "number"},
        # reference trial-steps parameter names (translated by
        # detect_onsets; see compat.bnac.calculate_trial_step)
        "histo_bins_per_ms": {"type": "number"},
        "smoothing_width": {"type": "number"},
        "threshold_std_multiple": {"type": "number"},
        "ms_post_offset": {"type": "number"},
    },
    "required": ["function", "bounds"],
}

_WINDOW = {
    "type": "object",
    "properties": {
        "initial_offset": {"type": "number"},
        "bounds": _BOUNDS,
        "t_step": {"type": "number"},
        "n_trials": {"type": "integer"},
        "trial_steps_value": {"type": "number"},
        "trial_steps_list": {"type": "array", "items": {"type": "number"}},
        "trial_steps_label": {"type": "string"},
        "window_type": {"type": "string"},
        "trial_steps": _TRIAL_STEPS,
    },
    "required": ["bounds"],
    "additionalProperties": False,
}

_NEURON_CLASS = {
    "type": "object",
    "properties": {
        "query": {
            "anyOf": [{"type": "object"}, {"type": "array", "items": {"type": "object"}}]
        },
        "population": _NULLABLE_STR,
        "node_set": _NULLABLE_STR,
        "node_sets_file": _NULLABLE_STR,
        "limit": _NULLABLE_INT,
        "node_id": {"type": "array", "items": {"type": "integer"}},
    },
    "additionalProperties": False,
}

_EXTRACTION = {
    "type": "object",
    "properties": {
        "report": {
            "type": "object",
            "properties": {
                "type": {"enum": ["spikes", "soma", "compartment"]},
                "name": {"type": "string"},
            },
            "required": ["type"],
            "additionalProperties": False,
        },
        "neuron_classes": {
            "type": "object",
            "additionalProperties": _NEURON_CLASS,
        },
        "windows": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [{"type": "string"}, _WINDOW]  # str = W3 cross-ref
            },
        },
        "limit": _NULLABLE_INT,
        "seed": {"type": "integer"},
        "population": _NULLABLE_STR,
        "node_set": _NULLABLE_STR,
        "node_sets_file": _NULLABLE_STR,
        "node_sets_file_extra": _NULLABLE_STR,
        "trial_steps": {"type": "object", "additionalProperties": _TRIAL_STEPS},
    },
    "required": ["neuron_classes", "windows"],
    "additionalProperties": False,
}

_FEATURE = {
    "type": "object",
    "properties": {
        "function": {"type": "string"},
        "name": {"type": "string"},
        "type": {"enum": ["single", "multi"]},
        "groupby": {"type": "array", "items": {"enum": GROUPBY_KEYS}},
        "schema": {"type": "string"},  # UDTF output schema (registry path)
        # per-output DDL schemas for the generic `type: multi` path
        # (compat shims carry their own via fn.output_schemas)
        "schemas": {
            "type": "object",
            "additionalProperties": {"type": "string"},
        },
        "params": {"type": "object"},
        "params_product": {"type": "object"},
        "params_zip": {"type": "object"},
        "suffix": {"type": "string"},
        "neuron_classes": {"type": "array", "items": {"type": "string"}},
        "windows": {"type": "array", "items": {"type": "string"}},
        "multi_index": {"type": "boolean"},
    },
    "required": ["function"],
    "additionalProperties": False,
}

_SINGLE_ANALYSIS = {
    "type": "object",
    "properties": {
        "extraction": _EXTRACTION,
        "features": {"type": "array", "items": _FEATURE},
        "custom": {"type": "object"},
        "simulations_filter": {"type": "object"},  # reserved: top-level only
        "simulations_filter_in_memory": {"type": "object"},
    },
    "required": ["extraction"],
    "additionalProperties": False,
}

ANALYSIS_CONFIG_SCHEMA: dict[str, Any] = {
    "$schema": "https://json-schema.org/draft/2019-09/schema",
    "title": "blueetl_spark analysis config",
    "type": "object",
    "properties": {
        "version": {"type": "integer"},
        "simulation_campaign": {
            # path to a campaign file, or the inline campaign dict
            "anyOf": [{"type": "string"}, {"type": "object"}]
        },
        "simulations_filter": {"type": "object"},
        "simulations_filter_in_memory": {"type": "object"},
        "cache": {
            "type": "object",
            "properties": {
                "path": {"type": "string"},
                "clear": {"type": "boolean"},
                "readonly": {"type": "boolean"},
                "skip_features": {"type": "boolean"},
                "store_type": {"enum": ["parquet", "feather"]},
            },
            "additionalProperties": False,
        },
        "analysis": {
            "type": "object",
            "minProperties": 1,
            "additionalProperties": _SINGLE_ANALYSIS,
        },
        "custom": {"type": "object"},
    },
    "required": ["version", "simulation_campaign", "analysis"],
    "additionalProperties": False,
}


class ValidationError(Exception):
    """Raised when a config fails schema validation; ``.errors`` holds one
    human-readable line per violation."""

    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("\n".join(errors))


def validate_config(config: Any, schema: dict | None = None) -> None:
    """Validate a config dict against the analysis-config schema, raising
    :class:`ValidationError` listing EVERY violation with its path
    (reference ``validation.py:36-48`` collects ``iter_errors`` the same
    way so users see all problems at once, not just the first)."""
    import jsonschema

    if config is None:
        raise ValidationError(["empty configuration"])
    schema = schema or ANALYSIS_CONFIG_SCHEMA
    validator_cls = jsonschema.validators.validator_for(schema)
    validator_cls.check_schema(schema)
    errors = sorted(
        validator_cls(schema).iter_errors(config), key=lambda e: list(e.absolute_path)
    )
    if errors:
        lines = []
        for e in errors:
            path = "root" + "".join(f".{p}" for p in e.absolute_path)
            msg = e.message
            if e.context:  # anyOf/oneOf: surface the most relevant sub-error
                # prefer the branch that got past the type check (a dict
                # input always trivially fails the string/W3-reference arm)
                best = max(
                    e.context,
                    key=lambda s: (len(list(s.absolute_path)), s.validator != "type"),
                )
                sub = "".join(f".{p}" for p in best.relative_path)
                msg = f"{msg} (closest: {sub or 'value'} — {best.message})"
            lines.append(f"{path}: {msg}")
        raise ValidationError(lines)
