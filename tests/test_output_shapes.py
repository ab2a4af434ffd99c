"""Driver-canonicalizer output contract: no queries() entry may return a
top-level container (array/struct/map) column.

The external driver canonicalizes query results through a pandas frame and
sorts rows before hashing; list/struct cells are unhashable there, so a
container column silently burns a verification slot (the round-4
q_kmeans_centroids red row: ``centroid array<long>`` -> "unhashable type:
'list'" in the driver while in-repo parity, which stringifies lists,
stayed green). Vector-valued results must be exploded to scalar rows
(posexplode -> (dim, value)) before being registered.

Schema inspection only — building the DataFrame is lazy for all but the
localCheckpoint-eager queries, so this sweeps all registered queries
cheaply at the smoke scale.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def test_no_container_output_columns(spark):
    offenders = []
    for name, q in entrymod.queries().items():
        df = q(spark, SF_SMOKE)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(
                    f"{name}.{field.name}: {field.dataType.simpleString()}"
                )
    assert not offenders, (
        "container-typed top-level output columns break the external "
        "driver's pandas canonicalizer (unhashable in sort/hash); explode "
        f"to scalar rows instead: {offenders}"
    )
