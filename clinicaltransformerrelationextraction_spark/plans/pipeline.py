"""End-to-end KG-construction pipeline: documents/pages -> triples.

Spark restatement of the reference's flagship flow (SURVEY.md §3.1):
pages →(U1 segment)→ mentions →(J1+F3+F4 candidate gen)→ marked pairs
→(U2+U3 mapInPandas scoring)→ predictions →(F6 NonRel filter, W1 numbering)→
triples.

Physical shape at scale (the plan we WANT, verified in tests/explain):
- candidate generation is a narrow per-row stage (zero shuffle);
- scoring is a narrow Arrow-batched map;
- the only shuffle is the final per-doc window over already-filtered triples;
- optional salted repartition before scoring equalizes per-task load when
  host domains skew document sizes (north rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.candidates import candidates
from ..operators.postprocess import brat_render, link_triples, triples
from ..operators.scoring import score_candidates
from ..operators.segmentation import mentions


@dataclass
class PipelineResult:
    candidates: DataFrame
    scored: DataFrame
    triples: DataFrame


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_as_pages(docs: DataFrame) -> DataFrame:
    """Adapt the driver's documents table to the north-rule pages shape
    (url, warc_ts, html, text, lang): url = 'doc://<id>', html = utf-8 bytes
    of text (the synthetic extractor is the identity — byte-identical per
    url by construction), warc_ts derived deterministically."""
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")).alias(
            "warc_ts"
        ),
        F.encode("text", "UTF-8").alias("html"),
        "text",
        "lang",
    )


def extract_text(pages: DataFrame) -> DataFrame:
    """Byte-identical text extraction per url (north-rule invariant): the
    deterministic extractor decodes the stored bytes; a production HTML
    extractor plugs in here as a pandas UDF with the same contract."""
    return pages.withColumn("text", F.decode("html", "UTF-8"))


def run_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig | None = None,
    doc_col: str = "doc_id",
    salt: bool = False,
    fused: bool = True,
) -> PipelineResult:
    """fused=True (default): scoring + NonRel filter + per-doc numbering in
    one mapInPandas pass — the whole pipeline is then ZERO-shuffle (docs
    stay partition-contiguous through the narrow candidate stage). Salting
    repartitions by doc hash (keeps docs whole, so fused numbering stays
    correct) and forces the non-fused path OFF only if you repartition by a
    non-doc key yourself."""
    from ..operators.scoring import score_filter_number, scoring_emit

    cfg = cfg or PipelineConfig()
    cand = candidates(docs, cfg, doc_col=doc_col)
    if salt:
        # Salted repartition before the expensive scoring stage: spreads a
        # hot host-domain's candidates across cfg.salt_buckets tasks.
        # Keyed by doc hash -> documents stay whole within a partition.
        cand = cand.repartition(
            F.pmod(
                F.hash(F.col("doc_id"), F.lit("salt")), F.lit(cfg.salt_buckets)
            )
        )
    scored = score_candidates(cand, cfg)
    if fused and not salt:
        # lengths-only backends (the stub): the FULLY-fused single-kernel
        # path — enumeration + scoring + filter + numbering in one
        # mapInPandas over the documents, nothing crossing the Python
        # boundary in between (r7; res.candidates keeps the full text
        # contract, lazily). Text backends keep the two-stage pipeline.
        if scoring_emit(cfg) == "lengths" and not docs.isStreaming:
            from ..operators.scoring import enum_score_filter_number

            trip = enum_score_filter_number(
                docs, cfg, doc_col=doc_col
            )
        else:
            trip = score_filter_number(cand, cfg)
    else:
        # salted input interleaves docs within a partition (hash order), so
        # use the windowed form, which is order-independent
        trip = triples(scored, cfg)
    return PipelineResult(candidates=cand, scored=scored, triples=trip)


def run_linked(docs: DataFrame, cfg: PipelineConfig | None = None,
               doc_col: str = "doc_id") -> DataFrame:
    cfg = cfg or PipelineConfig()
    res = run_pipeline(docs, cfg, doc_col=doc_col)
    men = mentions(docs, cfg, doc_col=doc_col)
    return link_triples(res.triples, men)


def run_brat(docs: DataFrame, cfg: PipelineConfig | None = None,
             doc_col: str = "doc_id") -> DataFrame:
    cfg = cfg or PipelineConfig()
    res = run_pipeline(docs, cfg, doc_col=doc_col)
    men = mentions(docs, cfg, doc_col=doc_col)
    return brat_render(men, res.triples)
