"""Candidate entity-pair generation — the relational heart of the pipeline.

Implements, Spark-first and shuffle-free, the reference semantics of:

- sentence segmentation (fixed token windows) — reference: external splitter,
  preprocessing.ipynb (cell 4)
- gazetteer mention detection — reference: gold brat ``T`` lines
  (src/brat_eval.py:95-126)
- ordered entity-pair permutation within a sentence-distance window —
  reference: ``get_permutated_relation_pairs`` (preprocessing.ipynb cell 5)
  with CUTOFF (cell 11) and valid type-combination pruning (cell 15)
- [s1]/[e1], [s2]/[e2] marker insertion with cross-sentence concatenation —
  reference: ``format_relen`` (preprocessing.ipynb cell 6)

Design for 100 TB: every step below is a narrow, per-row transformation built
from Catalyst higher-order functions (``transform``/``filter``/``flatten``) —
the quadratic pair blow-up happens *inside one row* and is capped by
``max_pairs_per_doc``, so candidate generation causes **zero shuffle** and no
doc-level skew can stall a stage. Compare with the naive relational
formulation (mentions self-join on doc key), which shuffles the full mention
table twice and is quadratic *across* the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.util import ensure_parallelism

__all__ = [
    "tokens_col", "mentions_col", "pairs_col", "candidates",
    "candidate_cap_stats",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (reference: ``text.split(' ')``,
    src/data_utils.py:332)."""
    return F.split(text, " ")


def mentions_col(cfg: PipelineConfig, toks: Column) -> Column:
    """array<struct<i:int, tok, ent_type, sent_id:int>> — 1-based token index.

    Gazetteer mention detection as a pure Catalyst expression: map-lookup of
    each token against the broadcast-size entity vocabulary.
    """
    vocab = F.create_map(
        *[F.lit(x) for kv in cfg.ent_vocab.items() for x in kv]
    )
    indexed = F.transform(
        toks,
        lambda x, i: F.struct(
            (i + F.lit(1)).cast("int").alias("i"),
            x.alias("tok"),
            vocab[x].alias("ent_type"),
        ),
    )
    hits = F.filter(indexed, lambda s: s["ent_type"].isNotNull())
    return F.transform(
        hits,
        lambda s: F.struct(
            s["i"].alias("i"),
            s["tok"].alias("tok"),
            s["ent_type"].alias("ent_type"),
            F.floor((s["i"] - 1) / cfg.sent_len).cast("int").alias("sent_id"),
        ),
    )


def pairs_col(cfg: PipelineConfig, mentions: Column) -> Column:
    """Ordered candidate pairs (m1=arg1 non-Drug, m2=arg2 Drug) within the
    sentence-distance cutoff. In-row cross product + predicate pushup; the
    reference's F3 (valid combos), F4 (distance) and J1 (permutations).
    """
    arg1_types = [t1 for t1, _ in cfg.valid_combs]
    arg2_types = sorted({t2 for _, t2 in cfg.valid_combs})

    def pair_filter(p: Column) -> Column:
        return (
            (p["a"]["i"] != p["b"]["i"])
            & (F.abs(p["a"]["sent_id"] - p["b"]["sent_id"]) <= cfg.cutoff)
            & p["a"]["ent_type"].isin(*arg1_types)
            & p["b"]["ent_type"].isin(*arg2_types)
        )

    crossed = F.flatten(
        F.transform(
            mentions,
            lambda m1: F.transform(
                mentions, lambda m2: F.struct(m1.alias("a"), m2.alias("b"))
            ),
        )
    )
    return F.filter(crossed, pair_filter)


def _marked(
    toks: Column, wst: Column, wlen: Column, ent_i: Column, open_t: str, close_t: str
) -> Column:
    """Space-joined window tokens with ``open_t``/``close_t`` inserted around
    the single token at 1-based index ``ent_i`` (reference ``format_relen``:
    markers are separate space-joined tokens)."""
    win = F.slice(toks, wst, wlen)
    return F.array_join(
        F.transform(
            win,
            lambda x, k: F.when(
                wst + k == ent_i,
                F.concat(F.lit(open_t + " "), x, F.lit(" " + close_t)),
            ).otherwise(x),
        ),
        " ",
    )


def candidate_cap_stats(
    df: DataFrame, cfg: PipelineConfig | None = None, doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """No silent truncation (SURVEY.md §7.4.4): one row of corpus-level cap
    accounting — docs over the per-doc pair cap and total pairs dropped.
    Cheap (counts only, no strings built); run it alongside any capped
    pipeline and persist the row with the run's lineage."""
    cfg = cfg or PipelineConfig()
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(doc_col).alias("doc_id"), toks.alias("toks"))
    n_pairs = F.size(pairs_col(cfg, mentions_col(cfg, F.col("toks"))))
    cap = cfg.max_pairs_per_doc or 0
    per_doc = base.select(
        "doc_id",
        n_pairs.alias("n_pairs"),
        F.greatest(n_pairs - cap, F.lit(0)).alias("n_dropped"),
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_pairs").alias("n_pairs_total"),
        F.sum(F.when(F.col("n_dropped") > 0, 1).otherwise(0)).alias(
            "n_docs_capped"
        ),
        F.sum("n_dropped").alias("n_pairs_dropped"),
    )


def candidates(
    df: DataFrame, cfg: PipelineConfig | None = None, doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents(doc_id, text, ...) -> candidates DataFrame.

    Output columns mirror the reference's 8-column TSV contract
    (readme.md:35-43) plus the explicit content key (doc_id, i1, i2) that
    replaces positional prediction alignment (SURVEY.md §2.3 J3):

      doc_id, ent_id_1, ent_id_2, ent_type_1, ent_type_2,
      s1_marked, s2_marked, sent_diff, i1, i2

    Zero-shuffle plan: project -> per-row HOFs -> explode. The per-doc pair
    cap (``max_pairs_per_doc``) bounds the quadratic blow-up of huge pages;
    capped pairs are deterministic (array order = ordered permutation order).
    """
    cfg = cfg or PipelineConfig()
    toks = tokens_col(F.col(text_col))
    base = ensure_parallelism(
        df.select(F.col(doc_col).alias("doc_id"), toks.alias("toks"))
    )
    men = mentions_col(cfg, F.col("toks"))
    pairs = pairs_col(cfg, men)
    if cfg.max_pairs_per_doc:
        pairs = F.slice(
            pairs, 1, F.least(F.size(pairs), F.lit(cfg.max_pairs_per_doc))
        )
    rows = base.select("doc_id", "toks", F.explode(pairs).alias("p"))

    a_i = F.col("p")["a"]["i"]
    b_i = F.col("p")["b"]["i"]
    a_s = F.col("p")["a"]["sent_id"]
    b_s = F.col("p")["b"]["sent_id"]
    lo = F.least(a_s, b_s)
    hi = F.greatest(a_s, b_s)
    wst = (lo * cfg.sent_len + 1).cast("int")
    wen = F.least(F.size("toks"), ((hi + 1) * cfg.sent_len).cast("int"))
    wlen = wen - wst + 1

    from ..config import S1_CLOSE, S1_OPEN, S2_CLOSE, S2_OPEN

    return rows.select(
        "doc_id",
        F.concat(F.lit("T"), a_i).alias("ent_id_1"),
        F.concat(F.lit("T"), b_i).alias("ent_id_2"),
        F.col("p")["a"]["ent_type"].alias("ent_type_1"),
        F.col("p")["b"]["ent_type"].alias("ent_type_2"),
        _marked(F.col("toks"), wst, wlen, a_i, S1_OPEN, S1_CLOSE).alias(
            "s1_marked"
        ),
        _marked(F.col("toks"), wst, wlen, b_i, S2_OPEN, S2_CLOSE).alias(
            "s2_marked"
        ),
        F.abs(a_s - b_s).cast("int").alias("sent_diff"),
        a_i.cast("int").alias("i1"),
        b_i.cast("int").alias("i2"),
    )
