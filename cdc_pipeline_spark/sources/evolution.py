"""Schema evolution for long-lived CDC/lake pipelines.

The reference pins every topic to a hard-coded Avro schema
(``/root/reference/src/streaming/schemas.py``) and has no story for a
producer adding a column mid-stream. A pipeline that runs for months
needs one: batches written under different schema versions must still
union, and downstream operators must see ONE declared contract.

Rules here are the safe subset of lakehouse evolution (add-only):
  * a column missing from a batch materializes as typed NULLs;
  * a column absent from the target contract is dropped (forward
    compatibility — new producer fields don't break old consumers);
  * a column whose type differs is cast when the cast is widening
    (int→long, float→double, anything→string); a narrowing mismatch
    raises instead of silently truncating.

Scale: alignment is a projection — zero shuffle, fused into whatever
scan/codegen stage follows. ``spark.read.option("mergeSchema", ...)``
solves only the file-footer half of this; the contract half (drop
extras, verify types) still needs the explicit projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    AtomicType,
    DataType,
    MapType,
    StringType,
    StructType,
)

__all__ = ["align_to_schema", "union_evolved"]

# widening casts that never lose information (plus the universal
# escape hatch to string)
_WIDENINGS: dict[tuple[str, str], bool] = {
    ("byte", "short"): True,
    ("byte", "integer"): True,
    ("byte", "long"): True,
    ("short", "integer"): True,
    ("short", "long"): True,
    ("integer", "long"): True,
    ("float", "double"): True,
    ("integer", "double"): True,
    ("long", "double"): True,  # lossy above 2^53 but standard SQL promotion
    ("date", "timestamp"): True,
}


def _same_type(src: DataType, dst: DataType) -> bool:
    """Type equality modulo nullability/metadata: strict DataType ==
    treats struct<a:bigint> with a nullable inner field as different
    from the same struct with a non-null one (routine parquet-read vs
    contract drift), failing losslessly-identical batches.
    ``simpleString`` erases exactly the irrelevant parts."""
    return src.simpleString() == dst.simpleString()


def _as_nullable(dt: DataType) -> DataType:
    """Recursively clear NOT NULL markers: ``cast`` cannot impose
    non-nullability (Spark rejects a cast to struct<a: bigint NOT
    NULL>), and nullability is metadata, not representation — so all
    casts target the nullable form of the contract type."""
    from pyspark.sql.types import StructField

    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _as_nullable(f.dataType), True, f.metadata)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_as_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_as_nullable(dt.keyType), _as_nullable(dt.valueType), True)
    return dt


def _can_widen(src: DataType, dst: DataType) -> bool:
    if _same_type(src, dst):
        return True
    if isinstance(dst, StringType) and isinstance(src, AtomicType):
        return True
    # recurse into containers: a struct/array/map widens when its shape
    # matches and every leaf widens (cast() performs the leaf casts)
    if isinstance(src, StructType) and isinstance(dst, StructType):
        return len(src.fields) == len(dst.fields) and all(
            s.name == d.name and _can_widen(s.dataType, d.dataType)
            for s, d in zip(src.fields, dst.fields)
        )
    if isinstance(src, ArrayType) and isinstance(dst, ArrayType):
        return _can_widen(src.elementType, dst.elementType)
    if isinstance(src, MapType) and isinstance(dst, MapType):
        return _can_widen(src.keyType, dst.keyType) and _can_widen(
            src.valueType, dst.valueType
        )
    return _WIDENINGS.get((src.typeName(), dst.typeName()), False)


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto the target contract: missing columns become
    typed NULLs, extra columns drop, widening mismatches cast, narrowing
    mismatches raise ``TypeError``."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name not in have:
            cols.append(F.lit(None).cast(_as_nullable(field.dataType)).alias(field.name))
            continue
        src = have[field.name]
        if _same_type(src, field.dataType):
            cols.append(F.col(field.name))
        elif _can_widen(src, field.dataType):
            cols.append(
                F.col(field.name).cast(_as_nullable(field.dataType)).alias(field.name)
            )
        else:
            raise TypeError(
                f"column {field.name!r}: cannot narrow {src.simpleString()} "
                f"to {field.dataType.simpleString()} without data loss"
            )
    return df.select(*cols)


def union_evolved(frames: list[DataFrame], target: StructType) -> DataFrame:
    """Union batches written under drifted schema versions by aligning
    each to the shared contract first (order-independent, unlike
    ``unionByName(allowMissingColumns=True)`` whose result schema
    depends on which frame comes first)."""
    if not frames:
        raise ValueError("union_evolved needs at least one frame")
    aligned = [align_to_schema(f, target) for f in frames]
    out = aligned[0]
    for f in aligned[1:]:
        out = out.unionByName(f)
    return out
