"""DuckDB oracle SQL for the evaluation-engine queries
(operators/evalqueries.py)."""

from __future__ import annotations

from ..operators.evalqueries import DROP_MOD, SHIFT_MOD, SPURIOUS_MIN
from .oracle import MEN_CTE, TOKS_CTE

_GOLD = f"""
WITH {TOKS_CTE.strip()}, {MEN_CTE.strip()},
offs AS (
  SELECT doc_id, i, tok,
    coalesce(sum(length(tok) + 1) OVER (
      PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start
  FROM toks
),
gold AS (
  SELECT m.doc_id, m.ent_type, m.i AS tok_idx, o.start,
         (o.start + length(m.tok))::BIGINT AS "end"
  FROM men m JOIN offs o ON o.doc_id = m.doc_id AND o.i = m.i
),
sys AS (
  SELECT doc_id, ent_type,
    CASE WHEN tok_idx % {SHIFT_MOD} = 0 THEN start + 2 ELSE start END AS start,
    CASE WHEN tok_idx % {SHIFT_MOD} = 0 THEN "end" + 2 ELSE "end" END AS "end"
  FROM gold WHERE tok_idx % {DROP_MOD} <> 0
  UNION ALL
  SELECT doc_id, 'Drug' AS ent_type,
         (maxe + 10)::BIGINT AS start, (maxe + 15)::BIGINT AS "end"
  FROM (SELECT doc_id, count(*) AS n, max("end") AS maxe
        FROM gold GROUP BY doc_id)
  WHERE n >= {SPURIOUS_MIN}
)"""


def q_span_eval_strict() -> str:
    return f"""{_GOLD},
tp AS (
  SELECT count(*)::BIGINT AS tp
  FROM gold g JOIN sys s
    ON g.doc_id = s.doc_id AND g.ent_type = s.ent_type
   AND g.start = s.start AND g."end" = s."end"
),
tot AS (
  SELECT (SELECT count(*) FROM gold)::BIGINT AS n_gold,
         (SELECT count(*) FROM sys)::BIGINT AS n_sys
)
SELECT tp,
  (n_sys - tp)::BIGINT AS fp,
  (n_gold - tp)::BIGINT AS fn,
  round(tp / n_sys, 6) AS precision,
  round(tp / n_gold, 6) AS recall
FROM tp, tot
"""


def q_span_eval_lenient() -> str:
    # pare-down (brat_eval.py:225-237): s removed iff it matches a gold
    # first matched by an earlier system tag (canonical system order)
    return f"""{_GOLD},
so AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY start, "end", ent_type) AS s_ord
  FROM sys
),
m AS (
  SELECT g.doc_id, g.ent_type, g.start AS g_start, g."end" AS g_end, s.s_ord
  FROM gold g JOIN so s
    ON g.doc_id = s.doc_id AND g.ent_type = s.ent_type
   AND g."end" > s.start AND g.start < s."end"
),
first_m AS (
  SELECT doc_id, ent_type, g_start, g_end, min(s_ord) AS first_ord
  FROM m GROUP BY ALL
),
removed AS (
  SELECT DISTINCT m.doc_id, m.s_ord
  FROM m JOIN first_m f
    ON m.doc_id = f.doc_id AND m.ent_type = f.ent_type
   AND m.g_start = f.g_start AND m.g_end = f.g_end
  WHERE f.first_ord < m.s_ord
),
kept AS (
  SELECT s.doc_id, s.s_ord FROM so s
  ANTI JOIN removed r ON r.doc_id = s.doc_id AND r.s_ord = s.s_ord
),
tp_doc AS (
  SELECT k.doc_id, count(*)::BIGINT AS tp FROM kept k
  SEMI JOIN (SELECT DISTINCT doc_id, s_ord FROM m) mm
    ON mm.doc_id = k.doc_id AND mm.s_ord = k.s_ord
  GROUP BY k.doc_id
),
kept_doc AS (SELECT doc_id, count(*)::BIGINT AS n_kept FROM kept GROUP BY 1),
gold_doc AS (SELECT doc_id, count(*)::BIGINT AS n_gold FROM gold GROUP BY 1)
SELECT coalesce(g.doc_id, k.doc_id, t.doc_id) AS doc_id,
  coalesce(t.tp, 0)::BIGINT AS tp,
  (coalesce(k.n_kept, 0) - coalesce(t.tp, 0))::BIGINT AS fp,
  (coalesce(g.n_gold, 0) - coalesce(t.tp, 0))::BIGINT AS fn
FROM gold_doc g
FULL JOIN kept_doc k ON g.doc_id = k.doc_id
FULL JOIN tp_doc t ON coalesce(g.doc_id, k.doc_id) = t.doc_id
"""


def q_prf_by_type() -> str:
    return f"""{_GOLD},
tp AS (
  SELECT g.ent_type, count(*)::BIGINT AS tp
  FROM gold g JOIN sys s
    ON g.doc_id = s.doc_id AND g.ent_type = s.ent_type
   AND g.start = s.start AND g."end" = s."end"
  GROUP BY 1
),
ng AS (SELECT ent_type, count(*)::BIGINT AS n_gold FROM gold GROUP BY 1),
ns AS (SELECT ent_type, count(*)::BIGINT AS n_sys FROM sys GROUP BY 1)
SELECT coalesce(ng.ent_type, ns.ent_type, tp.ent_type) AS ent_type,
  coalesce(tp.tp, 0)::BIGINT AS tp,
  (coalesce(ns.n_sys, 0) - coalesce(tp.tp, 0))::BIGINT AS fp,
  (coalesce(ng.n_gold, 0) - coalesce(tp.tp, 0))::BIGINT AS fn,
  round(coalesce(tp.tp, 0) / coalesce(ns.n_sys, 0), 6) AS precision,
  round(coalesce(tp.tp, 0) / coalesce(ng.n_gold, 0), 6) AS recall
FROM ng
FULL JOIN ns ON ng.ent_type = ns.ent_type
FULL JOIN tp ON coalesce(ng.ent_type, ns.ent_type) = tp.ent_type
"""


def q_macro_prf() -> str:
    return f"""{_GOLD},
gc AS (SELECT doc_id, count(*)::BIGINT AS n_gold FROM gold GROUP BY doc_id),
sc AS (SELECT doc_id, count(*)::BIGINT AS n_sys FROM sys GROUP BY doc_id),
tpc AS (
  SELECT g.doc_id, count(*)::BIGINT AS tp
  FROM gold g JOIN sys s
    ON g.doc_id = s.doc_id AND g.ent_type = s.ent_type
   AND g.start = s.start AND g."end" = s."end"
  GROUP BY g.doc_id
),
per_doc AS (
  SELECT coalesce(gc.doc_id, sc.doc_id, tpc.doc_id) AS doc_id,
    coalesce(n_gold, 0) AS n_gold, coalesce(n_sys, 0) AS n_sys,
    coalesce(tp, 0) AS tp
  FROM gc FULL JOIN sc ON gc.doc_id = sc.doc_id
  FULL JOIN tpc ON coalesce(gc.doc_id, sc.doc_id) = tpc.doc_id
),
pdm AS (
  SELECT doc_id,
    CASE WHEN n_sys > 0 THEN floor(tp * 1000000 / n_sys) ELSE 0 END::BIGINT
      AS p_micro,
    CASE WHEN n_gold > 0 THEN floor(tp * 1000000 / n_gold) ELSE 0 END::BIGINT
      AS r_micro
  FROM per_doc
)
SELECT count(*)::BIGINT AS n_docs,
  sum(p_micro) / count(*) AS macro_p_micro,
  sum(r_micro) / count(*) AS macro_r_micro
FROM pdm
"""


def _loss_counts_sql() -> str:
    from ..config import GOLD_MOD, GOLD_SHIFT, LABELS, NON_REL
    from .oracle import PIPELINE_PREFIX, PRED_CTE, label_case, stub_idx

    gold_idx = (
        f"(({stub_idx('s1_marked', 's2_marked', 'i1', 'i2')})"
        f" + {GOLD_SHIFT}) % {len(LABELS)}"
    )
    return f"""{PIPELINE_PREFIX},{PRED_CTE},
scored AS (
  SELECT pred_label,
    CASE WHEN (3*i1 + i2) % {GOLD_MOD} = 0
         THEN {label_case(gold_idx)} ELSE '{NON_REL}' END AS gold_label
  FROM pred
),
counts AS (
  SELECT gold_label AS label, count(*)::BIGINT AS n_gold,
    sum(CASE WHEN pred_label = gold_label THEN 1 ELSE 0 END)::BIGINT
      AS n_match
  FROM scored GROUP BY 1
),
tot AS (SELECT sum(n_gold)::BIGINT AS total FROM counts),
wc AS (
  SELECT label, n_gold, n_match, (n_gold - n_match)::BIGINT AS n_miss,
    ((total * {{unit}}) // ({{nlab}} * n_gold))::BIGINT AS w_u
  FROM counts, tot
),
loss AS (
  SELECT label, n_gold, n_match, n_miss, w_u,
    (w_u * (n_match * {{l_match}} + n_miss * {{l_miss}}))::BIGINT AS loss_u
  FROM wc
)"""


def q_loss_weighted() -> str:
    from ..config import LABELS
    from ..operators.evalqueries import LOSS_UNIT, _loss_units

    l_match, l_miss = _loss_units(len(LABELS))
    prefix = _loss_counts_sql().format(
        unit=LOSS_UNIT, nlab=len(LABELS), l_match=l_match, l_miss=l_miss
    )
    return f"""{prefix}
SELECT label, n_gold, n_match, n_miss, w_u, loss_u FROM loss
"""


def q_loss_focal() -> str:
    from ..config import LABELS
    from ..operators.evalqueries import LOSS_UNIT, _focal_units, _loss_units

    l_match, l_miss = _loss_units(len(LABELS))
    f_match, f_miss = _focal_units(len(LABELS))
    prefix = _loss_counts_sql().format(
        unit=LOSS_UNIT, nlab=len(LABELS), l_match=l_match, l_miss=l_miss
    )
    return f"""{prefix}
SELECT label, n_gold, n_match, n_miss, w_u,
  (n_match * {f_match} + n_miss * {f_miss})::BIGINT AS focal_u,
  (w_u * (n_match * {f_match} + n_miss * {f_miss}))::BIGINT AS wfocal_u
FROM loss
"""


def q_loss_mean() -> str:
    from ..config import LABELS
    from ..operators.evalqueries import LOSS_UNIT, _loss_units

    l_match, l_miss = _loss_units(len(LABELS))
    prefix = _loss_counts_sql().format(
        unit=LOSS_UNIT, nlab=len(LABELS), l_match=l_match, l_miss=l_miss
    )
    return f"""{prefix}
SELECT sum(n_gold)::BIGINT AS n_examples,
  sum(loss_u)::BIGINT AS total_loss_u,
  (sum(loss_u) // (sum(n_gold) * {LOSS_UNIT}))::BIGINT AS mean_loss_u
FROM loss
"""
