"""Scale guards for O(N^2) correctness twins.

A few queries exist ONLY to validate their banded/LSH scale paths on small
corpora (q_simhash_hamming_hist, q_embed_neardup): they are all-pairs cross
joins, quadratic by construction, and must never run on a large table. The
guard refuses inputs above a row threshold and names the scale-path query
to use instead — turning a silent cluster-killer into an immediate error.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Default ceiling: 100k rows -> <=5e9 candidate pairs, already painful but
# survivable on a cluster; the driver/test scales (sf<=0.1) are ~30k docs.
BRUTE_MAX_ROWS = 100_000


def guard_brute(df: DataFrame, name: str, scale_alt: str,
                max_rows: int | None = None) -> DataFrame:
    """Refuse to feed ``df`` into an all-pairs join when it exceeds the
    threshold (env override: CTRE_BRUTE_MAX_ROWS). The check is a
    ``limit(n+1).count()`` — it short-circuits after n+1 rows instead of
    scanning the full input."""
    limit = int(
        os.environ.get("CTRE_BRUTE_MAX_ROWS", max_rows or BRUTE_MAX_ROWS)
    )
    n = df.limit(limit + 1).count()
    if n > limit:
        raise ValueError(
            f"{name} is an O(N^2) all-pairs correctness twin — NEVER run "
            f"it at scale. Input exceeds {limit} rows; use {scale_alt} "
            f"(the banded/LSH scale path for the same predicate) or raise "
            f"CTRE_BRUTE_MAX_ROWS explicitly."
        )
    return df
