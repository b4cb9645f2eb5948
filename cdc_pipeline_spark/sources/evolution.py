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
from pyspark.sql.types import AtomicType, DataType, StringType, StructType

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


def _can_widen(src: DataType, dst: DataType) -> bool:
    if src == dst:
        return True
    if isinstance(dst, StringType) and isinstance(src, AtomicType):
        return True
    return _WIDENINGS.get((src.typeName(), dst.typeName()), False)


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto the target contract: missing columns become
    typed NULLs, extra columns drop, widening mismatches cast, narrowing
    mismatches raise ``TypeError``."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name not in have:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        src = have[field.name]
        if src == field.dataType:
            cols.append(F.col(field.name))
        elif _can_widen(src, field.dataType):
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
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
