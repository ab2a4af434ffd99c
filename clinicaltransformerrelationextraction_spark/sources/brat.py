"""Brat ``.ann`` format: parse and render (S3/S7/C7).

Line shapes (src/brat_eval.py:95-126; data_format_conf.py:2):
  T lines: ``T<i>\\t<type> <start> <end>\\t<surface>``
  R lines: ``R<i>\\t<rtype> Arg1:T<a> Arg2:T<b>``

Parsing is pure column expressions (split/regexp) — a text scan plus
projections, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_ann_lines(lines: DataFrame, doc_col: str = "doc_id",
                    line_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """(doc_id, value) text lines -> (mentions, relations) DataFrames."""
    t = lines.filter(F.col(line_col).startswith("T"))
    parts = F.split(F.col(line_col), "\t")
    mid = F.split(parts[1], " ")
    mentions = t.select(
        F.col(doc_col).alias("doc_id"),
        parts[0].alias("mention_id"),
        mid[0].alias("ent_type"),
        mid[1].cast("long").alias("start"),
        # discontinuous spans ("a b;c d") keep first start / last end, the
        # reference's lenient handling (brat_eval.py:104-113)
        F.element_at(F.split(F.element_at(mid, -1), ";"), -1)
        .cast("long").alias("end"),
        parts[2].alias("surface"),
    )
    r = lines.filter(F.col(line_col).startswith("R"))
    rp = F.split(F.col(line_col), "\t")
    body = F.split(rp[1], " ")
    relations = r.select(
        F.col(doc_col).alias("doc_id"),
        rp[0].alias("rel_id"),
        body[0].alias("rel_type"),
        F.regexp_extract(body[1], "Arg1:(\\S+)", 1).alias("arg1"),
        F.regexp_extract(body[2], "Arg2:(\\S+)", 1).alias("arg2"),
    )
    return mentions, relations


def read_ann_dir(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S3 — read a directory of .ann files; doc_id = file basename sans
    extension (the reference pairs gold/system dirs by basename,
    brat_eval.py:441-462)."""
    lines = (
        spark.read.text(f"{path}/*.ann")
        .withColumn(
            "doc_id",
            F.regexp_extract(
                F.input_file_name(), r"([^/]+)\.ann$", 1
            ),
        )
    )
    return parse_ann_lines(lines)


def render_t_line(mention_id, ent_type, start, end, surface):
    return F.concat_ws(
        "\t",
        mention_id,
        F.concat_ws(" ", ent_type, start.cast("string"),
                    end.cast("string")),
        surface,
    )


def render_r_line(rel_id, rel_type, arg1, arg2):
    return F.format_string(
        "%s\t%s Arg1:%s Arg2:%s", rel_id, rel_type, arg1, arg2
    )
