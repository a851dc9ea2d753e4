"""Schema-compatibility checking for the DDL/evolution path —
Confluent Schema Registry semantics (public docs: BACKWARD / FORWARD
/ FULL and their _TRANSITIVE variants) re-expressed over Spark struct
schemas.

The reference validates a batch's schema against the target table at
apply time and evolves via ALTER (CDCTableUtil.java type checks, K3
`apply.announce_schema`); production estates additionally GATE an
incoming DDL against a compatibility policy before letting it evolve
anything — a producer that renames a column or narrows a type should
be rejected at the boundary, not discovered by a broken consumer.

Rules (Avro resolution semantics mapped to relational columns, where
a nullable column plays the role of a field with a null default):

- BACKWARD (new reader reads old data): a column REMOVED by the new
  schema is fine (reader ignores it); a column ADDED must be nullable
  (reads of old rows fill null); a type change must be a promotion
  OLD -> NEW (int->long->double, float->double, int/long->decimal-
  that-fits, decimal widening, string<->binary).
- FORWARD (old reader reads new data): mirror image — ADDED columns
  are fine, REMOVED columns must have been nullable, type changes
  must promote NEW -> OLD.
- FULL: both.
- _TRANSITIVE variants apply the same pairwise rule against EVERY
  prior version, not just the latest — `check_history` folds the rule
  over a version list.

Primary-key changes are always breaking (the engine's row identity,
K5/K7).

Driver-side metadata logic only — schemas are O(columns); no Spark
jobs. `gate_announce` wires the policy in front of
``TableCatalog.announce_schema`` as the enforcement point.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql.types import DataType, DecimalType, StructType

from .schema import schema_from_json

BACKWARD = "BACKWARD"
FORWARD = "FORWARD"
FULL = "FULL"
MODES = (BACKWARD, FORWARD, FULL)

_PROMOTABLE: dict[str, tuple[str, ...]] = {
    # Avro type-promotion lattice (spec "Schema Resolution"), plus the
    # engine's decimal widenings. writer type -> allowed reader types.
    "byte": ("short", "integer", "long", "float", "double"),
    "short": ("integer", "long", "float", "double"),
    "integer": ("long", "float", "double"),
    "long": ("float", "double"),
    "float": ("double",),
    "string": ("binary",),
    "binary": ("string",),
}


def _promotes(writer: DataType, reader: DataType) -> bool:
    """Can data written as ``writer`` be read as ``reader``?"""
    if writer == reader:
        return True
    w, r = writer.typeName(), reader.typeName()
    if r in _PROMOTABLE.get(w, ()):
        return True
    if isinstance(reader, DecimalType):
        if isinstance(writer, DecimalType):
            # wider scale AND wider integral part
            return (
                reader.scale >= writer.scale
                and reader.precision - reader.scale
                >= writer.precision - writer.scale
            )
        # integrals fit a decimal whose integral part covers them
        digits = {"byte": 3, "short": 5, "integer": 10, "long": 19}.get(w)
        return digits is not None and reader.precision - reader.scale >= digits
    return False


def check_compat(
    old: StructType | str,
    new: StructType | str,
    mode: str = BACKWARD,
    *,
    old_pks: Sequence[str] | None = None,
    new_pks: Sequence[str] | None = None,
) -> list[str]:
    """Violations of evolving ``old`` -> ``new`` under ``mode``;
    empty list = compatible. Schemas may be StructType or schema
    JSON."""
    if mode not in MODES:
        raise ValueError(f"unknown mode {mode!r}; expected one of {MODES}")
    if isinstance(old, str):
        old = schema_from_json(old)
    if isinstance(new, str):
        new = schema_from_json(new)
    out: list[str] = []
    if old_pks is not None and new_pks is not None and list(old_pks) != list(new_pks):
        out.append(f"pk:{list(old_pks)}->{list(new_pks)}")
    of = {f.name: f for f in old.fields}
    nf = {f.name: f for f in new.fields}
    if mode in (BACKWARD, FULL):
        # new reader reads old data: additions need null default,
        # types must promote old -> new, and an existing nullable
        # column cannot become required (old rows may hold nulls the
        # new schema cannot represent — Avro union[null,T] -> T is
        # backward-incompatible)
        for name, f in nf.items():
            if name not in of:
                if not f.nullable:
                    out.append(f"backward:added_required:{name}")
                continue
            if not _promotes(of[name].dataType, f.dataType):
                out.append(
                    f"backward:type:{name}:{of[name].dataType.simpleString()}"
                    f"->{f.dataType.simpleString()}"
                )
            if of[name].nullable and not f.nullable:
                out.append(f"backward:nullability:{name}")
    if mode in (FORWARD, FULL):
        # old reader reads new data: removals need the old column to
        # have been nullable, types must promote new -> old, and a
        # required column cannot become nullable (new data may hold
        # nulls the old reader's required field rejects — T ->
        # union[null,T] is forward-incompatible)
        for name, f in of.items():
            if name not in nf:
                if not f.nullable:
                    out.append(f"forward:removed_required:{name}")
                continue
            if not _promotes(nf[name].dataType, f.dataType):
                out.append(
                    f"forward:type:{name}:{f.dataType.simpleString()}"
                    f"<-{nf[name].dataType.simpleString()}"
                )
            if nf[name].nullable and not f.nullable:
                out.append(f"forward:nullability:{name}")
    return out


def check_history(
    history: Sequence[StructType | str], new: StructType | str, mode: str
) -> list[str]:
    """_TRANSITIVE variants: fold ``check_compat`` over every prior
    version (newest last). Returns the union of violations, each
    prefixed with the version index it arose against."""
    out: list[str] = []
    for i, prior in enumerate(history):
        for v in check_compat(prior, new, mode):
            out.append(f"v{i}:{v}")
    return out


class IncompatibleSchemaError(ValueError):
    def __init__(self, table_id: str, violations: list[str]):
        self.violations = violations
        super().__init__(f"{table_id}: {', '.join(violations)}")


def gate_announce(
    catalog, table_id: str, schema_json: str, mode: str = BACKWARD, *, spark=None
) -> None:
    """Enforcement point: check the incoming DDL against the table's
    current schema under ``mode`` and only then announce it. Raises
    ``IncompatibleSchemaError`` with the violation list otherwise. A
    table the catalog doesn't know yet always passes (first DDL)."""
    meta = catalog.meta(table_id)
    # before the first DML creates the table, the announced schema
    # lives in pending_schema (create-on-first-DML, K2) — gate against
    # whichever the catalog currently holds
    current = (meta or {}).get("schema") or (meta or {}).get("pending_schema")
    if current:
        violations = check_compat(current, schema_json, mode)
        if violations:
            raise IncompatibleSchemaError(table_id, violations)
    catalog.announce_schema(table_id, schema_json, spark=spark)
