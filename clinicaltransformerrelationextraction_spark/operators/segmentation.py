"""Sentence segmentation + mention detection as standalone DataFrames.

Reference semantics: external sentence splitter + BIO alignment with char
offsets (preprocessing.ipynb cells 4, 6 — SURVEY.md §2.8 U1). Here the
segmenter is the deterministic fixed-token-window rule from config.py; a
pluggable pandas-UDF segmenter (``segment_pages_udf``) carries the same
contract for production segmenters (spaCy/syntok/etc. — not in container).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig
from .candidates import tokens_col

__all__ = ["sentences", "mentions", "segment_pages_udf"]


def sentences(df: DataFrame, cfg: PipelineConfig | None = None,
              doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, sent_id, sent_text, n_tokens); zero-shuffle
    (sentence windows are built in-row and exploded)."""
    cfg = cfg or PipelineConfig()
    L = cfg.sent_len
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(doc_col).alias("doc_id"), toks.alias("toks"))
    n_sent = F.ceil(F.size("toks") / F.lit(L)).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), n_sent - 1),
        lambda s: F.struct(
            s.cast("int").alias("sent_id"),
            F.array_join(F.slice(F.col("toks"), s * L + 1, L), " ").alias(
                "sent_text"
            ),
            (
                F.least(F.size("toks"), (s + 1) * L) - s * L
            ).cast("int").alias("n_tokens"),
        ),
    )
    return base.select("doc_id", F.explode(sents).alias("s")).select(
        "doc_id", "s.sent_id", "s.sent_text", "s.n_tokens"
    )


def mentions(df: DataFrame, cfg: PipelineConfig | None = None,
             doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, mention_id, ent_type, tok_idx, sent_id, surface,
    start, end) with character offsets into the original text.

    Brat ``T``-line shape (src/brat_eval.py:101-116). r7: an Arrow-batched
    mapInPandas kernel — char offsets are a per-doc prefix sum, so the
    former posexplode + per-doc cumulative-sum WINDOW (a full token-level
    Exchange, the one wide step on the mentions path) is gone; the
    mentions derivation is now zero-shuffle like the candidate pipeline.
    Byte-identical to the window form (kept as ``mentions_hof``; pinned
    in tests/test_round7_perf.py) and oracle-checked via q_mentions."""
    from ..functions.util import ensure_parallelism

    cfg = cfg or PipelineConfig()
    src = ensure_parallelism(
        df.select(F.col(doc_col).alias("doc_id"), F.col(text_col)), factor=1
    )
    id_type = src.schema["doc_id"].dataType.simpleString()
    vocab = dict(cfg.ent_vocab)
    sl = cfg.sent_len

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list = []
            for did, tx in zip(pdf["doc_id"], pdf[text_col]):
                if tx is None:
                    continue
                start = 0
                for i0, tok in enumerate(tx.split(" ")):
                    et = vocab.get(tok)
                    if et is not None:
                        i = i0 + 1
                        rows.append(
                            (did, f"T{i}", et, i, i0 // sl, tok,
                             start, start + len(tok))
                        )
                    start += len(tok) + 1
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "mention_id", "ent_type", "tok_idx",
                        "sent_id", "surface", "start", "end",
                    ],
                )

    return src.mapInPandas(
        kernel,
        schema=(
            f"doc_id {id_type}, mention_id string, ent_type string, "
            "tok_idx int, sent_id int, surface string, start long, "
            "end long"
        ),
    )


def mentions_hof(df: DataFrame, cfg: PipelineConfig | None = None,
                 doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The pre-r7 window-based formulation of ``mentions`` — kept as the
    equality twin for the kernel's parity test (its per-doc
    cumulative-sum window shuffles every token row; the kernel's prefix
    sum is in-row)."""
    cfg = cfg or PipelineConfig()
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(doc_col).alias("doc_id"), toks.alias("toks"))
    tok_rows = base.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).select(
        "doc_id", (F.col("pos") + 1).cast("int").alias("i"), "tok"
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = tok_rows.withColumn(
        "start",
        F.coalesce(F.sum(F.length("tok") + 1).over(w), F.lit(0)).cast("long"),
    )
    vocab = F.create_map(*[F.lit(x) for kv in cfg.ent_vocab.items() for x in kv])
    return (
        offs.withColumn("ent_type", vocab[F.col("tok")])
        .filter(F.col("ent_type").isNotNull())
        .select(
            "doc_id",
            F.concat(F.lit("T"), F.col("i")).alias("mention_id"),
            "ent_type",
            F.col("i").alias("tok_idx"),
            F.floor((F.col("i") - 1) / cfg.sent_len).cast("int").alias(
                "sent_id"
            ),
            F.col("tok").alias("surface"),
            "start",
            (F.col("start") + F.length("tok")).cast("long").alias("end"),
        )
    )


_SEG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("sent_start", T.LongType()),
        T.StructField("sent_end", T.LongType()),
        T.StructField("sent_text", T.StringType()),
    ]
)


def segment_pages_udf(pages: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Pluggable pandas-UDF segmenter over the pages table (url, text):
    1 page -> N sentences with char offsets (UDTF-shaped, SURVEY.md §2.8 U1).

    The default splitter is the same fixed-window rule (byte-identical to
    ``sentences``); swap the inner function for a real segmenter in
    production — the Spark contract (schema, batching) is unchanged.
    """
    cfg = cfg or PipelineConfig()
    L = cfg.sent_len

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "sent_id": [], "sent_start": [],
                   "sent_end": [], "sent_text": []}
            for url, text in zip(pdf["url"], pdf["text"]):
                toks = text.split(" ")
                pos = 0
                starts = []
                for t in toks:
                    starts.append(pos)
                    pos += len(t) + 1
                for s in range((len(toks) + L - 1) // L):
                    chunk = toks[s * L:(s + 1) * L]
                    st = starts[s * L]
                    out["url"].append(url)
                    out["sent_id"].append(s)
                    out["sent_start"].append(st)
                    out["sent_end"].append(st + len(" ".join(chunk)))
                    out["sent_text"].append(" ".join(chunk))
            yield pd.DataFrame(out)

    return pages.select("url", "text").mapInPandas(run, schema=_SEG_SCHEMA)
