"""Entity linking + surface-form canonicalization.

Two layers (SURVEY.md §7.1 step 6; the north star's "entity linking and
LSH/MinHash-based canonicalization of surface forms"):

1. broadcast alias-dictionary linking (the reference's binary-mode
   type-map broadcast lookup pattern, post_processing.py:120-139) —
   ``operators/postprocess.link_triples`` and ``alias_link`` below;
2. MinHash-LSH grouping of near-duplicate surface forms into canonical
   clusters — both a hand-rolled md5-banded implementation
   (operators/dedup.py, oracle-checked) and, when available, the
   ``pyspark.ml.feature.MinHashLSH`` estimator as the MLlib-native
   alternative (import-gated; MLlib ships with pyspark so this runs here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alias_link(df: DataFrame, aliases: DataFrame, surface_col: str,
               out_col: str = "canonical_id") -> DataFrame:
    """Broadcast-join surface forms to canonical ids; unmatched surfaces
    fall back to a deterministic self-id ('E_<normalized surface>')."""
    a = F.broadcast(
        aliases.select(
            F.lower(F.col("surface_norm")).alias("__surf"),
            F.col("canonical_id").alias(out_col),
        )
    )
    joined = df.join(
        a, F.lower(F.col(surface_col)) == F.col("__surf"), "left"
    ).drop("__surf")
    return joined.withColumn(
        out_col,
        F.coalesce(
            F.col(out_col),
            F.concat(F.lit("E_"), F.lower(F.col(surface_col))),
        ),
    )


def canonical_clusters_mllib(
    surfaces: DataFrame,
    surface_col: str = "surface",
    num_hash_tables: int = 4,
    jaccard_max: float = 0.6,
) -> DataFrame:
    """MLlib-native canonicalization: character-trigram shingles ->
    HashingTF -> MinHashLSH similarity self-join -> connected surface pairs.

    Returns (surface_a, surface_b, jaccard_dist) candidate merge pairs.
    The hand-rolled md5-band variant (dedup.q_dedup_minhash_pairs) is the
    oracle-checked twin; this one exercises the pyspark.ml estimator API.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # trigram list via a SQL expression (lambda-variable substring positions
    # are awkward in the python HOF API)
    base = (
        surfaces.select(F.lower(F.col(surface_col)).alias("surface"))
        .distinct()
        .withColumn(
            "grams",
            F.expr(
                "transform(sequence(1, greatest(length(surface)-2, 1)),"
                " i -> substring(surface, i, 3))"
            ),
        )
        .filter(F.size("grams") > 0)
    )
    tf = HashingTF(
        inputCol="grams", outputCol="features", numFeatures=1 << 14
    )
    feat = tf.transform(base)
    # MinHashLSH requires at least one non-zero entry
    feat = feat.filter(F.size("grams") > 0)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=13,
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(
        feat, feat, jaccard_max, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.surface").alias("surface_a"),
            F.col("datasetB.surface").alias("surface_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .filter(F.col("surface_a") < F.col("surface_b"))
        .distinct()
    )
