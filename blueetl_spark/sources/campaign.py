"""Simulation-campaign source: config → ``simulations`` DataFrame.

The reference loads a campaign from YAML/JSON (blueetl or xarray layout,
``/root/reference/src/blueetl/campaign/config.py:164-271``) into one row per
simulation run with its condition parameters, skipping runs with an empty
``simulation_path``, and dedupes circuits so each distinct circuit gets one
``circuit_id`` (``extract/simulations.py:61-112``).

Config stays driver-side (it is tiny — one dict per run); only the resulting
table becomes a DataFrame.
"""

from __future__ import annotations

import itertools
import json
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from blueetl_spark import schemas


class SimulationCampaign:
    """A list of simulation runs + their campaign condition parameters."""

    def __init__(
        self,
        data: list[dict[str, Any]],
        name: str = "",
        attrs: dict[str, Any] | None = None,
    ) -> None:
        self.data = data
        self.name = name
        self.attrs = attrs or {}

    # -- loading ------------------------------------------------------------
    @classmethod
    def load(cls, path: str | Path) -> "SimulationCampaign":
        path = Path(path)
        text = path.read_text()
        if path.suffix in (".yaml", ".yml"):
            import yaml

            obj = yaml.safe_load(text)
        else:
            obj = json.loads(text)
        return cls.from_dict(obj)

    @classmethod
    def from_dict(cls, obj: dict[str, Any]) -> "SimulationCampaign":
        if "dims" in obj and "coords" in obj:  # xr.DataArray.to_dict() layout
            return cls.from_xarray_dict(obj)
        if "data" in obj:  # blueetl layout: explicit row list
            return cls(list(obj["data"]), obj.get("name", ""), obj.get("attrs"))
        # xarray-like layout: coords product ("product") or zipped ("coupled")
        coords: dict[str, list[Any]] = obj["coords"]
        paths: list[str] = obj["paths"]
        coupled = obj.get("coupled", False)
        if coupled:
            rows = [dict(zip(coords, vals)) for vals in zip(*coords.values())]
        else:
            rows = [
                dict(zip(coords, vals))
                for vals in itertools.product(*coords.values())
            ]
        if len(rows) != len(paths):
            raise ValueError(
                f"coords expand to {len(rows)} runs but {len(paths)} paths given"
            )
        for row, p in zip(rows, paths):
            row["simulation_path"] = p
        return cls(rows, obj.get("name", ""), obj.get("attrs"))

    def to_dict(self) -> dict[str, Any]:
        return {"name": self.name, "attrs": self.attrs, "data": self.data}

    # -- xarray round-trip (S2) ---------------------------------------------
    # The on-disk "xarray format" is exactly ``xr.DataArray.to_dict()``
    # (reference ``campaign/config.py:208-271``): product layouts store the
    # conditions as dims with an N-d nested path array; coupled layouts
    # store one synthetic dim with per-condition coord arrays and a flat
    # path list, remembered via ``attrs["__coupled__"]``. Parsed directly —
    # the xarray library is not required (nor present in this runtime).

    @classmethod
    def from_xarray_dict(cls, d: dict[str, Any]) -> "SimulationCampaign":
        attrs = dict(d.get("attrs") or {})
        dims = list(d.get("dims") or [])
        coords = {k: list(v["data"]) for k, v in (d.get("coords") or {}).items()}
        data = d.get("data") or []
        coupled = attrs.get("__coupled__") or (
            len(dims) == 1 and dims[0] not in coords and len(coords) >= 1
        )
        rows: list[dict[str, Any]] = []
        if coupled:
            cond_names = [c for c in coords if c not in dims]
            for i, path in enumerate(data):
                row = {c: coords[c][i] for c in cond_names}
                row["simulation_path"] = "" if path is None else str(path)
                rows.append(row)
        else:
            import numpy as np

            arr = np.array(data, dtype=object)
            if arr.shape != tuple(len(coords[dim]) for dim in dims):
                raise ValueError(
                    f"data shape {arr.shape} does not match coords "
                    f"{[len(coords[d]) for d in dims]}"
                )
            for idx in itertools.product(*(range(len(coords[d])) for d in dims)):
                path = arr[idx]
                row = {dim: coords[dim][i] for dim, i in zip(dims, idx)}
                row["simulation_path"] = "" if path is None else str(path)
                rows.append(row)
        return cls(rows, str(d.get("name") or ""), attrs)

    def to_xarray_dict(self) -> dict[str, Any]:
        attrs = dict(self.attrs)
        coupled = attrs.get("__coupled__")
        names = self.condition_names
        if coupled:
            return {
                "name": self.name,
                "attrs": attrs,
                "dims": [coupled],
                "coords": {
                    c: {"dims": [coupled], "data": [r.get(c) for r in self.data]}
                    for c in names
                },
                "data": [r.get("simulation_path", "") for r in self.data],
            }
        values = {c: sorted({r[c] for r in self.data}) for c in names}
        index = {c: {v: i for i, v in enumerate(values[c])} for c in names}

        def nest(depth: int, prefix: tuple[int, ...]) -> Any:
            if depth == len(names):
                return lookup.get(prefix, "")
            return [
                nest(depth + 1, prefix + (i,))
                for i in range(len(values[names[depth]]))
            ]

        lookup = {
            tuple(index[c][r[c]] for c in names): r.get("simulation_path", "")
            for r in self.data
        }
        return {
            "name": self.name,
            "attrs": attrs,
            "dims": names,
            "coords": {
                c: {"dims": [c], "data": values[c]} for c in names
            },
            "data": nest(0, ()),
        }

    @classmethod
    def from_xarray(cls, obj: Any) -> "SimulationCampaign":
        """Load from a real ``xr.DataArray`` (or anything exposing
        ``.to_dict()`` in that layout) — the reference's native campaign
        object (``campaign/config.py:208-271``). Duck-typed, so the
        xarray dependency stays optional."""
        return cls.from_xarray_dict(obj.to_dict())

    def to_xarray(self, xr: Any = None) -> Any:
        """Materialize the campaign as a real ``xr.DataArray``.

        ``xr`` is injectable for tests; the default probes for the
        xarray package and raises an actionable error when absent (the
        dict layout, :meth:`to_xarray_dict`, carries the same semantics
        without the dependency)."""
        if xr is None:
            try:
                import xarray as xr  # noqa: F811
            except ImportError as exc:  # pragma: no cover - env dependent
                raise ImportError(
                    "to_xarray requires the optional xarray package; use "
                    "to_xarray_dict() for the dependency-free dict layout"
                ) from exc
        return xr.DataArray.from_dict(self.to_xarray_dict())

    @property
    def condition_names(self) -> list[str]:
        names: list[str] = []
        for row in self.data:
            for k in row:
                if k != "simulation_path" and k not in names:
                    names.append(k)
        return names

    # -- extraction ---------------------------------------------------------
    def to_simulations_df(
        self,
        spark: SparkSession,
        circuit_key: str = "circuit_config",
    ) -> DataFrame:
        """Build the ``simulations`` table.

        ``simulation_id`` = position in the campaign, assigned BEFORE
        dropping empty-path runs — skipped runs leave gaps, exactly like
        the reference, which enumerates every row and only then filters,
        preserving the id in a column (``extract/simulations.py:40-52,
        150-152``). ``circuit_id`` = dense id per distinct circuit config
        value (``circuit_key`` condition or campaign attr; a campaign with
        no circuit info gets a single circuit 0).
        """
        rows = []
        circuit_ids: dict[Any, int] = {}
        for sim_id, row in enumerate(self.data):
            path = row.get("simulation_path", "")
            if not path:
                continue
            circuit_val = row.get(circuit_key, self.attrs.get(circuit_key, ""))
            if circuit_val not in circuit_ids:
                circuit_ids[circuit_val] = len(circuit_ids)
            out = {
                "simulation_id": sim_id,
                "circuit_id": circuit_ids[circuit_val],
                "simulation_path": str(path),
            }
            for k, v in row.items():
                if k != "simulation_path":
                    out[k] = v
            rows.append(out)
        if not rows:  # all runs skipped: a typed empty table, not an
            # un-inferable createDataFrame([]) ValueError
            return spark.createDataFrame([], schemas.SIMULATIONS_SCHEMA)
        # schema inference runs driver-side on the dict list (identical to
        # the plain createDataFrame(rows) result), but execution goes
        # through the Arrow LocalRelation path — no pickled-Python local
        # RDD in every downstream job (see session.local_df)
        from blueetl_spark.session import local_df

        inferred = spark.createDataFrame(rows).schema
        df = local_df(
            spark,
            [tuple(r.get(c) for c in inferred.fieldNames()) for r in rows],
            inferred,
        )
        df = schemas.ensure_schema(
            df, schemas.SIMULATIONS_SCHEMA, allow_extra_columns=True
        )
        return df
