"""Signal-definition catalog: the metadata that drives the wide→tall unpivot.

The reference loads a versioned YAML catalog mapping VSS signal names to
source fields + unit conversions (schema.LoadDefinitionFile at
/root/reference/internal/sync/sync.go:236-256; the 18-signal set and the
2-signal filtered subset {Vehicle.Speed, Vehicle.VehicleIdentification.Brand}
appear at /root/reference/internal/sync/test/sync_test.go:64,133,149).

Here the catalog is plain data — a list of :class:`SignalDef` — and the
transform layer (operators/transform.py) *generates* a single ``stack``
projection from it.  Swapping in a different catalog (the real VSS YAML, a
new telemetry source) is a data change, not a code change.

Conversions are pure Column expressions (JVM-side, whole-stage codegen) —
never Python UDFs.  That keeps the unpivot a zero-shuffle, zero-serde map.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Conversion registry: name -> (Column -> Column), all pure expressions.
# Mirrors the model-garage conversion functions the reference applies during
# SignalsFromV1Payload (/root/reference/internal/sync/sync.go:198) [dep].
# ---------------------------------------------------------------------------
CONVERSIONS: dict[str, Callable[[Column], Column]] = {
    "identity": lambda c: c,
    "ratio_to_percent": lambda c: c * 100.0,
    "kpa_to_psi": lambda c: c * 0.1450377377,
    "mph_to_kmh": lambda c: c * 1.609344,
    "celsius_to_kelvin": lambda c: c + 273.15,
    "bool_to_float": lambda c: c.cast("double"),
}

# SQL-text renderings of the same conversions ({c} = the cast source column).
# The transform layer assembles the whole unpivot as ONE expr() parse —
# building it Column-by-Column costs a py4j round-trip per operator, which
# at ~1.5 ms each dominates plan construction for wide catalogs.  Values are
# identical: the D-suffixed literals are the same doubles the lambdas bind.
CONVERSIONS_SQL: dict[str, str] = {
    "identity": "{c}",
    "ratio_to_percent": "({c} * 100.0D)",
    "kpa_to_psi": "({c} * 0.1450377377D)",
    "mph_to_kmh": "({c} * 1.609344D)",
    "celsius_to_kelvin": "({c} + 273.15D)",
    "bool_to_float": "CAST({c} AS DOUBLE)",
}


@dataclass(frozen=True)
class SignalDef:
    """One catalog entry: source field → named, typed, converted signal."""

    name: str  # destination signal name (e.g. "speed" / VSS path)
    source_field: str  # source column (reference prepends "data."; we use real col names)
    value_class: str = "number"  # "number" -> value_number, "string" -> value_string
    conversion: str = "identity"  # key into CONVERSIONS (numbers only)

    def number_expr(self) -> Column:
        if self.value_class != "number":
            return F.lit(None).cast("double")
        col = F.col(self.source_field).cast("double")
        return CONVERSIONS[self.conversion](col)

    def string_expr(self) -> Column:
        if self.value_class != "string":
            return F.lit(None).cast("string")
        return F.col(self.source_field).cast("string")

    def number_sql(self) -> str:
        """number_expr as SQL text (see CONVERSIONS_SQL)."""
        if self.value_class != "number":
            return "CAST(NULL AS DOUBLE)"
        c = f"CAST(`{self.source_field}` AS DOUBLE)"
        return CONVERSIONS_SQL[self.conversion].format(c=c)

    def string_sql(self) -> str:
        if self.value_class != "string":
            return "CAST(NULL AS STRING)"
        return f"CAST(`{self.source_field}` AS STRING)"


@dataclass
class SignalCatalog:
    """An ordered set of signal definitions.

    ``filtered(names)`` reproduces the reference's SIGNALS config filter
    (/root/reference/internal/sync/sync.go:236-256): restrict the sync to an
    explicit signal subset; unknown names are ignored (config lists are
    whitespace-tolerant and error-tolerant per sync.go:223-231).
    """

    defs: list[SignalDef] = field(default_factory=list)

    def filtered(self, names: list[str] | None) -> "SignalCatalog":
        if not names:
            return self
        wanted = {n.strip() for n in names if n.strip()}
        return SignalCatalog([d for d in self.defs if d.name in wanted])

    def source_fields(self) -> list[str]:
        """The pruned source-column list — the analog of the reference's
        ES ``_source`` includes-list (elastic.go:67-77).  Feeding exactly
        these into ``df.select`` lets Parquet column pruning do the rest."""
        seen: dict[str, None] = {}
        for d in self.defs:
            seen.setdefault(d.source_field, None)
        return list(seen)

    def names(self) -> list[str]:
        return [d.name for d in self.defs]

    def __len__(self) -> int:
        return len(self.defs)

    # -- YAML round-trip: the reference loads its signal definitions from a
    # versioned YAML file (schema.LoadDefinitionFile(schema.DefinitionsYAML()),
    # /root/reference/internal/sync/sync.go:240) [dep].  Same contract here:
    # swapping catalogs is a data file, not a code change.

    @classmethod
    def from_yaml(cls, text: str) -> "SignalCatalog":
        """Parse a definitions YAML:

        signals:
          - name: speed
            source_field: data_speed
            value_class: number        # optional, default number
            conversion: identity       # optional, must be in CONVERSIONS
        """
        import yaml

        doc = yaml.safe_load(text) or {}
        defs = []
        for entry in doc.get("signals", []):
            conv = entry.get("conversion", "identity")
            if conv not in CONVERSIONS:
                raise ValueError(f"unknown conversion {conv!r} for signal {entry.get('name')!r}")
            defs.append(
                SignalDef(
                    name=entry["name"],
                    source_field=entry["source_field"],
                    value_class=entry.get("value_class", "number"),
                    conversion=conv,
                )
            )
        return cls(defs)

    @classmethod
    def from_yaml_file(cls, path: str) -> "SignalCatalog":
        with open(path, encoding="utf-8") as f:
            return cls.from_yaml(f.read())

    def to_yaml(self) -> str:
        import yaml

        return yaml.safe_dump(
            {
                "signals": [
                    {
                        "name": d.name,
                        "source_field": d.source_field,
                        "value_class": d.value_class,
                        "conversion": d.conversion,
                    }
                    for d in self.defs
                ]
            },
            sort_keys=False,
        )


# ---------------------------------------------------------------------------
# Catalog for the reference-shaped fixture table (FIXTURES.md Table 1):
# 18 convertible data_* fields, mirroring "each status has 18 signals"
# (/root/reference/internal/sync/test/sync_test.go:64).
# ---------------------------------------------------------------------------
DEVICE_STATUS_CATALOG = SignalCatalog(
    [
        SignalDef("speed", "data_speed", "number", "identity"),
        SignalDef("engineSpeed", "data_engineSpeed", "number", "identity"),
        SignalDef("fuelPercentRemaining", "data_fuelPercentRemaining", "number", "ratio_to_percent"),
        SignalDef("odometer", "data_odometer", "number", "identity"),
        SignalDef("coolantTemp", "data_coolantTemp", "number", "identity"),
        SignalDef("ambientTemp", "data_ambientTemp", "number", "identity"),
        SignalDef("batteryVoltage", "data_batteryVoltage", "number", "identity"),
        SignalDef("soc", "data_soc", "number", "ratio_to_percent"),
        SignalDef("latitude", "data_latitude", "number", "identity"),
        SignalDef("longitude", "data_longitude", "number", "identity"),
        SignalDef("altitude", "data_altitude", "number", "identity"),
        SignalDef("nsat", "data_nsat", "number", "identity"),
        SignalDef("runTime", "data_runTime", "number", "identity"),
        SignalDef("throttlePosition", "data_throttlePosition", "number", "ratio_to_percent"),
        SignalDef("engineLoad", "data_engineLoad", "number", "ratio_to_percent"),
        SignalDef("make", "data_make", "string"),
        SignalDef("model", "data_model", "string"),
        SignalDef("year", "data_year", "number", "identity"),
    ]
)

# Catalog over the driver's `events` testdata table (TESTDATA.md): treats
# user_id as the entity, ts as event time; gives the oracle-checkable
# unpivot a real table to run on.
EVENTS_CATALOG = SignalCatalog(
    [
        SignalDef("value", "value", "number", "identity"),
        SignalDef("value_pct", "value", "number", "ratio_to_percent"),
        SignalDef("event_type", "event_type", "string"),
        SignalDef("props", "props", "string"),
    ]
)
