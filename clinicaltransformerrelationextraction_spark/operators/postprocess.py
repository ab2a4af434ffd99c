"""Post-processing: NonRel filtering, per-doc relation numbering, entity
linking, and brat rendering.

Reference semantics:
- NonRel drop before emit              post_processing.py:99-100,134-136 (F6)
- per-file R renumbering               post_processing.py:49-63 (W1), made
  deterministic here with the canonical sort key (sent_diff, i1, i2)
  (SURVEY.md §7.4.3)
- brat line formats                    data_format_conf.py:2; brat_eval.py:101-125
- entities ⋈ relations per file merge  post_processing.py:66-85 (J5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig

__all__ = ["triples", "link_triples", "brat_render"]


def triples(scored: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """scored candidates -> (doc_id, rel_id, pred, subj_id, obj_id, score).

    The single shuffle of the whole pipeline: a window partitioned by doc_id
    for reference-parity R-numbering. Triples-per-doc is small (post-filter),
    so the shuffle moves only the output, never the candidate set.
    """
    cfg = cfg or PipelineConfig()
    w = Window.partitionBy("doc_id").orderBy("sent_diff", "i1", "i2")
    return (
        scored.filter(F.col("pred_label") != F.lit(cfg.non_rel))
        .withColumn("rel_id", F.concat(F.lit("R"), F.row_number().over(w)))
        .select(
            "doc_id",
            "rel_id",
            F.col("pred_label").alias("pred"),
            F.col("ent_id_1").alias("subj_id"),
            F.col("ent_id_2").alias("obj_id"),
            "score",
            "sent_diff",
            "i1",
            "i2",
        )
    )


def link_triples(trip: DataFrame, mentions: DataFrame) -> DataFrame:
    """Entity linking: replace mention ids with canonical entity ids via the
    (broadcast) surface-form dictionary — the reference's binary-mode
    type-map broadcast lookup pattern (post_processing.py:120-139, J4).

    ``mentions`` must have (doc_id, tok_idx, surface). Canonical id is
    ``E_<surface>`` (alias dictionary is derivable; swap in a real alias
    table at production scale — it stays broadcast-sized).

    The mentions table itself grows WITH the corpus, so it must never be
    broadcast — only the alias dictionary is (linking.py). Both joins here
    share the doc_id key, so AQE plans one exchange per side.
    """
    m1 = mentions.select(
        "doc_id",
        F.col("tok_idx").alias("i1"),
        F.concat(F.lit("E_"), F.col("surface")).alias("subj_canonical"),
    )
    m2 = mentions.select(
        "doc_id",
        F.col("tok_idx").alias("i2"),
        F.concat(F.lit("E_"), F.col("surface")).alias("obj_canonical"),
    )
    return (
        trip.join(m1, ["doc_id", "i1"])
        .join(m2, ["doc_id", "i2"])
        .select("doc_id", "rel_id", "pred", "subj_canonical",
                "obj_canonical", "score")
    )


def brat_render_cogroup(mentions: DataFrame, trip: DataFrame) -> DataFrame:
    """Alternative J5 implementation via cogroup().applyInPandas — the
    grouped-map form of the entities⋈relations per-file merge
    (post_processing.py:72-85). Output byte-identical to ``brat_render``
    (asserted in tests); exists to cover the cogroup API surface the same
    way a production renderer with non-relational formatting would need."""
    import pandas as pd  # noqa: PLC0415

    def merge(m: "pd.DataFrame", r: "pd.DataFrame") -> "pd.DataFrame":
        if len(m) == 0 and len(r) == 0:
            return pd.DataFrame({"doc_id": [], "ann_text": []})
        doc_id = (m["doc_id"].iloc[0] if len(m) else r["doc_id"].iloc[0])
        t_lines = [
            f"T{row.tok_idx}\t{row.ent_type} {row.start} {row.end}\t"
            f"{row.surface}"
            for row in m.sort_values("tok_idx").itertuples()
        ]
        r_lines = [
            f"{row.rel_id}\t{row.pred} Arg1:{row.subj_id} Arg2:{row.obj_id}"
            for row in r.sort_values(
                ["sent_diff", "i1", "i2"]
            ).itertuples()
        ]
        return pd.DataFrame(
            {"doc_id": [doc_id], "ann_text": ["\n".join(t_lines + r_lines)]}
        )

    return (
        mentions.groupBy("doc_id")
        .cogroup(trip.groupBy("doc_id"))
        .applyInPandas(merge, schema="doc_id long, ann_text string")
        .filter(F.col("doc_id").isNotNull())
    )


def brat_render(mentions: DataFrame, trip: DataFrame) -> DataFrame:
    """Per-doc brat ``.ann`` text: T lines (entities) then R lines
    (relations), exactly the reference's output contract (S7).

    Deterministic ordering via array_sort on a struct whose first fields are
    the sort key — collect_list order is never relied upon.
    """
    t_lines = (
        mentions.select(
            "doc_id",
            F.struct(
                F.col("tok_idx").alias("ord"),
                F.concat_ws(
                    "\t",
                    F.concat(F.lit("T"), F.col("tok_idx")),
                    F.concat_ws(" ", "ent_type", "start", "end"),
                    "surface",
                ).alias("line"),
            ).alias("sl"),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("sl")), lambda s: s["line"]
                ),
                "\n",
            ).alias("t_block")
        )
    )
    r_lines = (
        trip.select(
            "doc_id",
            F.struct(
                F.col("sent_diff").alias("o1"),
                F.col("i1").alias("o2"),
                F.col("i2").alias("o3"),
                F.format_string(
                    "%s\t%s Arg1:%s Arg2:%s",
                    "rel_id", "pred", "subj_id", "obj_id",
                ).alias("line"),
            ).alias("sl"),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("sl")), lambda s: s["line"]
                ),
                "\n",
            ).alias("r_block")
        )
    )
    return t_lines.join(r_lines, "doc_id", "left").select(
        "doc_id",
        F.concat(
            F.col("t_block"),
            F.coalesce(F.concat(F.lit("\n"), F.col("r_block")), F.lit("")),
        ).alias("ann_text"),
    )
