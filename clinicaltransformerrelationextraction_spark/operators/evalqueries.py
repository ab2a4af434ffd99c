"""Oracle-checked queries for the evaluation engine (SURVEY.md §2.3 J7, §2.4
A5): strict/lenient span matching and micro/macro P/R/F1 rollups.

The "system" annotation set is derived deterministically from the gold
mentions (every 3rd mention's span is shifted right by 2 chars, every 5th is
dropped, and a spurious mention is added per doc with >= 4 mentions) so the
evaluator sees true positives, boundary mismatches, misses, and false
positives — all reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from .segmentation import mentions

SHIFT_MOD = 3  # every 3rd mention: span shifted +2 (lenient-only match)
DROP_MOD = 5  # every 5th mention: dropped from system (false negative)
SPURIOUS_MIN = 4  # docs with >= this many mentions get one spurious system row


def _gold(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return mentions(docs, PipelineConfig())


def _system(spark: SparkSession, sf: str) -> DataFrame:
    g = _gold(spark, sf)
    kept = g.filter(F.col("tok_idx") % DROP_MOD != 0).select(
        "doc_id",
        "ent_type",
        F.when(
            F.col("tok_idx") % SHIFT_MOD == 0, F.col("start") + 2
        ).otherwise(F.col("start")).alias("start"),
        F.when(
            F.col("tok_idx") % SHIFT_MOD == 0, F.col("end") + 2
        ).otherwise(F.col("end")).alias("end"),
    )
    spurious = (
        g.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("end").alias("maxe"))
        .filter(F.col("n") >= SPURIOUS_MIN)
        .select(
            "doc_id",
            F.lit("Drug").alias("ent_type"),
            (F.col("maxe") + 10).cast("long").alias("start"),
            (F.col("maxe") + 15).cast("long").alias("end"),
        )
    )
    return kept.unionByName(spurious)


def q_span_eval_strict(spark: SparkSession, sf: str) -> DataFrame:
    """Strict span evaluation (brat_eval.py:41-44): exact
    (doc, start, end, type) equality; corpus-level tp/fp/fn + micro P/R/F1."""
    g = _gold(spark, sf).select("doc_id", "ent_type", "start", "end")
    s = _system(spark, sf)
    keys = ["doc_id", "ent_type", "start", "end"]
    tp = g.join(s, keys, "inner")
    return (
        tp.agg(F.count("*").alias("tp"))
        .crossJoin(g.agg(F.count("*").alias("n_gold")))
        .crossJoin(s.agg(F.count("*").alias("n_sys")))
        .select(
            "tp",
            (F.col("n_sys") - F.col("tp")).alias("fp"),
            (F.col("n_gold") - F.col("tp")).alias("fn"),
            F.round(F.col("tp") / F.col("n_sys"), 6).alias("precision"),
            F.round(F.col("tp") / F.col("n_gold"), 6).alias("recall"),
        )
    )


def q_span_eval_lenient(spark: SparkSession, sf: str) -> DataFrame:
    """Lenient span evaluation WITH the reference's pare-down
    (brat_eval.py:225-237): scanning system tags in order, a system tag is
    discarded iff it overlaps a gold tag that an EARLIER system tag already
    matched. Relational restatement (order-free, one pass): let
    first_ord(g) = min system order over g's matches; s is removed iff it
    matches any g with first_ord(g) < ord(s). TP then counts kept system
    tags with >= 1 match — so a system span overlapping two golds can stand
    in for only one of them, exactly the reference's one-to-one semantics.
    System order is the canonical (start, end, ent_type) sort (the
    reference uses .ann file order). Per-doc (tp, fp, fn)."""
    from pyspark.sql import Window

    g = _gold(spark, sf).select(
        "doc_id", "ent_type",
        F.col("start").alias("g_start"), F.col("end").alias("g_end"),
    )
    w = Window.partitionBy("doc_id").orderBy("start", "end", "ent_type")
    s = _system(spark, sf).withColumn("s_ord", F.row_number().over(w)).select(
        "doc_id", "ent_type",
        F.col("start").alias("s_start"), F.col("end").alias("s_end"),
        "s_ord",
    )
    m = (
        g.join(s, ["doc_id", "ent_type"])
        .filter(
            (F.col("g_end") > F.col("s_start"))
            & (F.col("g_start") < F.col("s_end"))
        )
        .select("doc_id", "ent_type", "g_start", "g_end", "s_ord")
    )
    gkey = ["doc_id", "ent_type", "g_start", "g_end"]
    first = m.groupBy(*gkey).agg(F.min("s_ord").alias("first_ord"))
    removed = (
        m.join(first, gkey)
        .filter(F.col("first_ord") < F.col("s_ord"))
        .select("doc_id", "s_ord")
        .distinct()
    )
    kept = s.join(removed, ["doc_id", "s_ord"], "left_anti")
    matched_kept = kept.join(
        m.select("doc_id", "s_ord").distinct(), ["doc_id", "s_ord"],
        "left_semi",
    )
    tp_doc = matched_kept.groupBy("doc_id").agg(F.count("*").alias("tp"))
    kept_doc = kept.groupBy("doc_id").agg(F.count("*").alias("n_kept"))
    gold_doc = g.groupBy("doc_id").agg(F.count("*").alias("n_gold"))
    return (
        gold_doc.join(kept_doc, "doc_id", "full")
        .join(tp_doc, "doc_id", "full")
        .fillna(0, ["n_gold", "n_kept", "tp"])
        .select(
            "doc_id",
            "tp",
            (F.col("n_kept") - F.col("tp")).alias("fp"),
            (F.col("n_gold") - F.col("tp")).alias("fn"),
        )
    )


def q_prf_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """F9 — per-entity-type strict-span metrics (brat_eval.py:217-224: the
    evaluator re-run with a type filter, here ONE grouped pass over all
    types): (ent_type, tp, fp, fn, precision, recall)."""
    g = _gold(spark, sf).select("doc_id", "ent_type", "start", "end")
    s = _system(spark, sf)
    keys = ["doc_id", "ent_type", "start", "end"]
    tp = g.join(s, keys).groupBy("ent_type").agg(F.count("*").alias("tp"))
    ng = g.groupBy("ent_type").agg(F.count("*").alias("n_gold"))
    ns = s.groupBy("ent_type").agg(F.count("*").alias("n_sys"))
    return (
        ng.join(ns, "ent_type", "full")
        .join(tp, "ent_type", "full")
        .fillna(0, ["n_gold", "n_sys", "tp"])
        .select(
            "ent_type",
            "tp",
            (F.col("n_sys") - F.col("tp")).alias("fp"),
            (F.col("n_gold") - F.col("tp")).alias("fn"),
            F.round(F.col("tp") / F.col("n_sys"), 6).alias("precision"),
            F.round(F.col("tp") / F.col("n_gold"), 6).alias("recall"),
        )
    )


def q_macro_prf(spark: SparkSession, sf: str) -> DataFrame:
    """Macro-averaged strict-span P/R over docs (brat_eval.py:310-357:
    micro sums tp/fp/fn, macro averages per-doc metrics). Averages are
    exact: per-doc P/R quantized to integer micros, summed as bigints,
    divided once."""
    g = _gold(spark, sf).select("doc_id", "ent_type", "start", "end")
    s = _system(spark, sf)
    keys = ["doc_id", "ent_type", "start", "end"]
    per_doc = (
        g.groupBy("doc_id").agg(F.count("*").alias("n_gold"))
        .join(
            s.groupBy("doc_id").agg(F.count("*").alias("n_sys")),
            "doc_id", "full",
        )
        .join(
            g.join(s, keys, "inner").groupBy("doc_id").agg(
                F.count("*").alias("tp")
            ),
            "doc_id", "full",
        )
        .fillna(0, ["n_gold", "n_sys", "tp"])
    )
    pd_ = per_doc.select(
        "doc_id",
        F.when(
            F.col("n_sys") > 0,
            F.floor(F.col("tp") * 1000000 / F.col("n_sys")),
        ).otherwise(0).cast("long").alias("p_micro"),
        F.when(
            F.col("n_gold") > 0,
            F.floor(F.col("tp") * 1000000 / F.col("n_gold")),
        ).otherwise(0).cast("long").alias("r_micro"),
    )
    return pd_.agg(
        F.count("*").alias("n_docs"),
        (F.sum("p_micro") / F.count("*")).alias("macro_p_micro"),
        (F.sum("r_micro") / F.count("*")).alias("macro_r_micro"),
    )


# --- training-side loss analytics (A7 mean eval loss / U5 loss functions) ---
# The reference computes weighted cross-entropy over the relation head
# (src/model_utils.py:135-178 loss functions; src/task.py:343 mean eval
# loss). The stub scorer's logits are ONE-HOT, so softmax cross-entropy
# collapses to exactly two values: -ln(e/(e+n-1)) when gold == argmax and
# ln(e+n-1) otherwise. Both are inlined as integer micro-unit literals in
# BOTH engines — every aggregate below is exact bigint arithmetic (the
# parity discipline: never sum doubles across rows).

LOSS_UNIT = 1_000_000


def _loss_units(n_labels: int) -> tuple[int, int]:
    import math

    denom = math.e + (n_labels - 1)
    l_match = round((math.log(denom) - 1.0) * LOSS_UNIT)
    l_miss = round(math.log(denom) * LOSS_UNIT)
    return l_match, l_miss


def _loss_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-gold-class confusion mass of the stub predictions vs the
    synthetic gold rule (the same rule as q_eval_prf): one grouped pass."""
    from ..plans.pipeline import load_documents
    from .candidates import candidates
    from .evaluation import gold_label_expr
    from .scoring import score_candidates, scoring_emit

    cfg = PipelineConfig()
    scored = score_candidates(
        candidates(load_documents(spark, sf), cfg, emit=scoring_emit(cfg)),
        cfg,
    )
    with_gold = scored.withColumn(
        "gold_label",
        gold_label_expr(F.col("label_idx"), F.col("i1"), F.col("i2")),
    )
    return with_gold.groupBy(F.col("gold_label").alias("label")).agg(
        F.count("*").alias("n_gold"),
        F.sum(
            F.when(F.col("pred_label") == F.col("gold_label"), 1).otherwise(0)
        ).alias("n_match"),
    )


def q_loss_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """U5 analog — per-class weighted cross-entropy aggregation in exact
    fixed point. Class weight w_u = (total * UNIT) div (n_labels * n_gold)
    (the balanced inverse-frequency heuristic the reference's weighted CE
    takes as input); per-class loss_u = w_u * (n_match*L_MATCH_U +
    n_miss*L_MISS_U), all bigint. loss_u is in UNIT^2 (1e-12) units —
    safe to ~1e7 examples per class before int64 overflow; a larger run
    re-scales UNIT."""
    from ..config import LABELS

    l_match, l_miss = _loss_units(len(LABELS))
    counts = _loss_counts(spark, sf)
    totals = counts.agg(F.sum("n_gold").alias("total"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "label", "n_gold", "n_match",
            (F.col("n_gold") - F.col("n_match")).alias("n_miss"),
            F.expr(
                f"(total * {LOSS_UNIT}) div ({len(LABELS)} * n_gold)"
            ).alias("w_u"),
        )
        .select(
            "label", "n_gold", "n_match", "n_miss", "w_u",
            (
                F.col("w_u")
                * (
                    F.col("n_match") * F.lit(l_match)
                    + F.col("n_miss") * F.lit(l_miss)
                )
            ).alias("loss_u"),
        )
    )


FOCAL_GAMMA = 2  # reference default (src/model_utils.py:137 gamma=2.)


def _focal_units(n_labels: int) -> tuple[int, int]:
    """Focal-loss per-example values as integer micro-units. The stub's
    one-hot logits give the gold class probability p_match = e/denom when
    gold == argmax and p_miss = 1/denom otherwise (denom = e + n - 1), so
    FocalLoss (src/model_utils.py:135-150: (1-p)^gamma * NLL) collapses
    to exactly two constants, inlined identically in both engines."""
    import math

    denom = math.e + (n_labels - 1)
    p_match = math.e / denom
    p_miss = 1.0 / denom
    f_match = round(
        ((1 - p_match) ** FOCAL_GAMMA) * (math.log(denom) - 1.0) * LOSS_UNIT
    )
    f_miss = round(((1 - p_miss) ** FOCAL_GAMMA) * math.log(denom) * LOSS_UNIT)
    return f_match, f_miss


def q_loss_focal(spark: SparkSession, sf: str) -> DataFrame:
    """Focal-loss analog of the reference's FocalLoss module
    (src/model_utils.py:135-150): per-class focal mass
    focal_u = n_match*F_MATCH_U + n_miss*F_MISS_U (gamma=2, the (1-p)^2
    modulation applied to the two one-hot CE constants), its
    class-weighted twin wfocal_u = w_u * focal_u (same balanced
    inverse-frequency w_u as q_loss_weighted — the module's optional
    ``weight=``), and the mean-reduction numerator. All bigint — exact
    cross-engine."""
    from ..config import LABELS

    f_match, f_miss = _focal_units(len(LABELS))
    counts = _loss_counts(spark, sf)
    totals = counts.agg(F.sum("n_gold").alias("total"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "label", "n_gold", "n_match",
            (F.col("n_gold") - F.col("n_match")).alias("n_miss"),
            F.expr(
                f"(total * {LOSS_UNIT}) div ({len(LABELS)} * n_gold)"
            ).alias("w_u"),
        )
        .select(
            "label", "n_gold", "n_match", "n_miss", "w_u",
            (
                F.col("n_match") * F.lit(f_match)
                + F.col("n_miss") * F.lit(f_miss)
            ).alias("focal_u"),
        )
        .withColumn("wfocal_u", F.col("w_u") * F.col("focal_u"))
    )


def q_loss_mean(spark: SparkSession, sf: str) -> DataFrame:
    """A7 analog — mean weighted eval loss (src/task.py:343
    ``eval_loss / n``) over all candidates, exact: sum the per-class
    bigint losses, one integral division at the end (result in micro
    units of weighted nats)."""
    per_class = q_loss_weighted(spark, sf)
    return per_class.agg(
        F.sum("n_gold").alias("n_examples"),
        F.sum("loss_u").alias("total_loss_u"),
    ).select(
        "n_examples", "total_loss_u",
        F.expr(f"total_loss_u div (n_examples * {LOSS_UNIT})")
        .alias("mean_loss_u"),
    )
