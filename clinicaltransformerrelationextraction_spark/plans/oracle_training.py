"""DuckDB oracle SQL for the training-data pipeline operators
(operators/dedup.py, textstats.py, similarity.py, multimodal.py).
Constants must track the operator modules."""

from __future__ import annotations

from ..operators.dedup import BAND_ROWS, JACCARD_MIN, N_SEEDS, SIMHASH_BITS
from ..operators.similarity import (
    N_PLANES,
    N_QUERIES,
    NEARDUP_COS,
    QUANT,
    TOPK,
)
from ..operators.textstats import BPE_ISH, EN_RATIO_MIN, EN_STOPWORDS

# --- dedup -------------------------------------------------------------------

_SHINGLES = """
sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(tl[i:i+1], ' ')
                   for i in range(1, len(tl))]) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents)
  WHERE len(tl) >= 2
)"""

_MH = f"""
mh AS (
  SELECT doc_id, s.seed::INT AS seed,
         min(substring(md5(sg.s), 1 + 4 * s.seed, 4)) AS mh
  FROM sh, UNNEST(shingles) sg(s), UNNEST(range(0, {N_SEEDS})) s(seed)
  GROUP BY doc_id, s.seed
)"""

_BANDS = f"""
bands AS (
  SELECT doc_id, (seed // {BAND_ROWS})::INT AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
  FROM mh GROUP BY doc_id, seed // {BAND_ROWS}
)"""

_PAIRS = """
mpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*)::BIGINT AS n_shared_bands
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


def q_dedup_exact() -> str:
    return """
SELECT md5(text) AS text_hash, min(doc_id)::BIGINT AS keeper_doc_id,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1
"""


def q_minhash_signatures() -> str:
    return f"WITH {_SHINGLES.strip()}, {_MH.strip()}\n" \
           "SELECT doc_id, seed, mh FROM mh"


def q_dedup_minhash_pairs() -> str:
    return (
        f"WITH {_SHINGLES.strip()}, {_MH.strip()}, {_BANDS.strip()}, "
        f"{_PAIRS.strip()}\nSELECT * FROM mpairs"
    )


# exact-Jaccard verify CTE over the LSH candidate pairs — the single
# definition shared by q_dedup_jaccard, q_dedup_clusters, and
# q_dedup_incremental (the same discipline as _SHINGLES/_MH/_BANDS/_PAIRS:
# a future fix to the set arithmetic must hit every dedup oracle at once)
_EX = """
ex AS (
  SELECT p.doc_a, p.doc_b,
    len(list_intersect(a.shingles, b.shingles))::INT AS inter,
    (len(a.shingles) + len(b.shingles)
     - len(list_intersect(a.shingles, b.shingles)))::INT AS uni
  FROM mpairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b
)"""


def q_dedup_jaccard() -> str:
    return f"""
WITH {_SHINGLES.strip()}, {_MH.strip()}, {_BANDS.strip()}, {_PAIRS.strip()},
{_EX.strip()}
SELECT doc_a, doc_b, inter, uni, inter / uni AS jaccard
FROM ex WHERE inter / uni >= {JACCARD_MIN}
"""


def q_dedup_incremental() -> str:
    """Incremental-dedup oracle (operators/incremental.py
    q_dedup_incremental): an INDEPENDENT full-corpus recompute — the
    same banded-LSH + exact-Jaccard pipeline as q_dedup_jaccard — with
    the delta-side predicate, checking the module's equivalence contract
    (incremental pairs == full pairs with ≥1 new side) across engines."""
    from ..operators.incremental import INCR_DELTA_MOD as M

    return f"""
WITH {_SHINGLES.strip()}, {_MH.strip()}, {_BANDS.strip()}, {_PAIRS.strip()},
{_EX.strip()}
SELECT doc_a, doc_b, inter, uni, inter / uni AS jaccard,
       (doc_a % {M} = 0)::INT AS a_is_new,
       (doc_b % {M} = 0)::INT AS b_is_new
FROM ex
WHERE inter / uni >= {JACCARD_MIN}
  AND (doc_a % {M} = 0 OR doc_b % {M} = 0)
"""


def q_dedup_clusters() -> str:
    # transitive closure + min per source = the same connected-components
    # fixpoint the Spark label-propagation loop converges to
    return f"""
WITH RECURSIVE {_SHINGLES.strip()}, {_MH.strip()}, {_BANDS.strip()},
{_PAIRS.strip()},
{_EX.strip()},
jp AS (SELECT doc_a, doc_b FROM ex WHERE inter / uni >= {JACCARD_MIN}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jp
  UNION ALL
  SELECT doc_b, doc_a FROM jp
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
)
SELECT src AS doc_id, min(dst)::BIGINT AS cluster_id,
  (CASE WHEN src = min(dst) THEN 1 ELSE 0 END)::INT AS is_keeper
FROM reach GROUP BY src
"""


_SIMHASH = f"""
dt AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
bits AS (
  SELECT doc_id, j.j,
    count(*) FILTER (
      ((strpos('0123456789abcdef', substring(md5(tok), 1 + j.j // 4, 1)) - 1)
       >> (3 - (j.j % 4))) & 1 = 1) AS ones,
    count(*) AS n
  FROM dt, UNNEST(range(0, {SIMHASH_BITS})) j(j)
  GROUP BY doc_id, j.j
),
simh AS (
  SELECT doc_id,
    sum(CASE WHEN 2 * ones >= n THEN 1 << j ELSE 0 END)::BIGINT AS simhash
  FROM bits GROUP BY doc_id
)"""


def q_simhash() -> str:
    return f"WITH {_SIMHASH.strip()}\nSELECT doc_id, simhash FROM simh"


def q_simhash_hamming_hist() -> str:
    return f"""
WITH {_SIMHASH.strip()}
SELECT bit_count(xor(a.simhash, b.simhash))::INT AS hamming,
       count(*)::BIGINT AS n_pairs
FROM simh a JOIN simh b ON a.doc_id < b.doc_id
GROUP BY 1
"""


def q_simhash_band_pairs() -> str:
    from ..operators.dedup import SIM_BAND_BITS, SIM_BANDS

    return f"""
WITH {_SIMHASH.strip()},
sb AS (
  SELECT doc_id, simhash, b.b AS band,
         ((simhash >> ({SIM_BAND_BITS} * b.b)) & {(1 << SIM_BAND_BITS) - 1})
           ::BIGINT AS bval
  FROM simh, UNNEST(range(0, {SIM_BANDS})) b(b)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming,
       count(*)::BIGINT AS n_shared_bands
FROM sb a JOIN sb b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
GROUP BY 1, 2, 3
"""


# --- textstats ---------------------------------------------------------------

def q_token_stats() -> str:
    return f"""
SELECT doc_id,
  len(string_split(text, ' '))::INT AS n_ws_tokens,
  len(regexp_extract_all(text, '{BPE_ISH}'))::INT AS n_re_tokens,
  length(text)::INT AS n_chars_computed,
  n_chars::BIGINT AS n_chars_meta
FROM documents
"""


def q_lang_id() -> str:
    stops = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH t AS (
  SELECT lang,
    len([x for x in string_split(text, ' ') if x IN ({stops})])
      / len(string_split(text, ' ')) AS ratio
  FROM documents
)
SELECT CASE WHEN ratio >= {EN_RATIO_MIN} THEN 'en' ELSE 'other' END
         AS pred_lang,
       lang, count(*)::BIGINT AS n
FROM t GROUP BY 1, 2
"""


def q_quality() -> str:
    return """
WITH t AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n,
    len(list_distinct(string_split(text, ' '))) AS n_dist,
    length(text) - (len(string_split(text, ' ')) - 1) AS char_sum
  FROM documents
)
SELECT doc_id, n::INT AS n_tokens,
  n_dist / n AS distinct_ratio,
  char_sum / n AS avg_tok_len,
  (n_dist / n) * 0.7 + (char_sum / n) / 10.0 * 0.3 AS quality_score
FROM t
"""


def q_fingerprint() -> str:
    return """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents)
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(tl)), ' ')) AS bag_fp,
  list_min([md5(array_to_string(tl[i:i+1], ' '))
            for i in range(1, len(tl))]) AS min_shingle_fp
FROM t
"""


# --- similarity --------------------------------------------------------------

_QE = f"""
q AS (
  SELECT vec_id, label,
    list_transform(embedding,
                   x -> (floor(x::DOUBLE * {QUANT} + 0.5))::BIGINT) AS qe
  FROM embeddings
)"""

_COS = (
    "list_sum(list_transform(range(1, len({a}) + 1),"
    " i -> {a}[i] * {b}[i]))::DOUBLE"
    " / (sqrt(list_sum(list_transform(range(1, len({a}) + 1),"
    " i -> {a}[i] * {a}[i]))::DOUBLE)"
    " * sqrt(list_sum(list_transform(range(1, len({b}) + 1),"
    " i -> {b}[i] * {b}[i]))::DOUBLE))"
)


def q_ann_topk() -> str:
    cos = _COS.format(a="a.qe", b="b.qe")
    return f"""
WITH {_QE.strip()},
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {cos} AS cos
  FROM q a JOIN q b
    ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank::INT AS rank, cos
FROM ranked WHERE rank <= {TOPK}
"""


def q_ann_lsh_buckets() -> str:
    terms = []
    for j in range(N_PLANES):
        proj = (
            f"list_sum(list_transform(range(1, len(qe) + 1), "
            f"i -> CASE WHEN (i * 7 + {j} * 13) % 2 = 0 "
            f"THEN qe[i] ELSE -qe[i] END))"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    expr = " + ".join(terms)
    return f"""
WITH {_QE.strip()}
SELECT vec_id, ({expr})::BIGINT AS bucket FROM q
"""


def q_embed_neardup() -> str:
    cos = _COS.format(a="a.qe", b="b.qe")
    return f"""
WITH {_QE.strip()}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos
FROM q a JOIN q b ON a.vec_id < b.vec_id
WHERE {cos} > {NEARDUP_COS}
"""


def _bucket_expr() -> str:
    terms = []
    for j in range(N_PLANES):
        proj = (
            f"list_sum(list_transform(range(1, len(qe) + 1), "
            f"i -> CASE WHEN (i * 7 + {j} * 13) % 2 = 0 "
            f"THEN qe[i] ELSE -qe[i] END))"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def q_embed_neardup_lsh() -> str:
    from ..operators.similarity import EMB_BAND_PLANES, EMB_BANDS

    cos = _COS.format(a="a.qe", b="b.qe")
    return f"""
WITH {_QE.strip()},
bk AS (SELECT vec_id, ({_bucket_expr()})::BIGINT AS bucket FROM q),
bands AS (
  SELECT vec_id, b.b AS band,
         ((bucket >> ({EMB_BAND_PLANES} * b.b))
          & {(1 << EMB_BAND_PLANES) - 1})::BIGINT AS bval
  FROM bk, UNNEST(range(0, {EMB_BANDS})) b(b)
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bval = y.bval AND x.vec_id < y.vec_id
)
SELECT c.vec_a, c.vec_b, {cos} AS cos
FROM cand c JOIN q a ON a.vec_id = c.vec_a JOIN q b ON b.vec_id = c.vec_b
WHERE {cos} > {NEARDUP_COS}
"""


def _cent_body(src: str, key: str) -> str:
    """Per-``key`` integer-mean centroid SQL (floor division, dim-order
    reassembly) — the single SQL twin of similarity.int_mean_centroid;
    used by the label codebook and every unrolled k-means update step."""
    return f"""SELECT {key},
    list_transform(list_sort(list(struct_pack(d := dim, c := cv))),
                   x -> x.c) AS centroid
  FROM (
    SELECT {key}, d.i AS dim,
      floor(sum(qe[d.i]) / count(*))::BIGINT AS cv
    FROM {src}, UNNEST(range(1, len(qe) + 1)) d(i)
    GROUP BY {key}, d.i
  ) GROUP BY {key}"""


_CENT = f"""
cent AS (
  {_cent_body("q", "label")}
)"""


def q_ann_ivf_topk() -> str:
    from ..operators.similarity import N_PROBE

    ccos = _COS.format(a="q.qe", b="c.centroid")
    cos = _COS.format(a="a.qe", b="b.qe")
    return f"""
WITH {_QE.strip()}, {_CENT.strip()},
asg AS (
  SELECT vec_id, qe, label AS cell, crank FROM (
    SELECT q.vec_id, q.qe, c.label,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {ccos} DESC, c.label) AS crank
    FROM q CROSS JOIN cent c
  )
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {cos} AS cos
  FROM asg a JOIN asg b
    ON a.cell = b.cell
   AND a.vec_id < {N_QUERIES} AND a.crank <= {N_PROBE}
   AND b.vec_id >= {N_QUERIES} AND b.crank = 1
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank::INT AS rank, cos
FROM ranked WHERE rank <= {TOPK}
"""


def q_label_centroid_sim() -> str:
    cos = _COS.format(a="q.qe", b="c.centroid")
    return f"""
WITH {_QE.strip()},
dims AS (
  SELECT label, d.i AS dim, qe[d.i] AS v
  FROM q, UNNEST(range(1, len(qe) + 1)) d(i)
),
cd AS (
  SELECT label, dim, floor(sum(v) / count(*))::BIGINT AS cv
  FROM dims GROUP BY label, dim
),
cent AS (
  SELECT label,
    list_transform(list_sort(list(struct_pack(d := dim, c := cv))),
                   x -> x.c) AS centroid
  FROM cd GROUP BY label
),
cosd AS (
  SELECT q.label, {cos} AS cos
  FROM q JOIN cent c ON q.label = c.label
)
SELECT label, count(*)::BIGINT AS n,
  sum((floor(cos * 1e6 + 0.5))::BIGINT) / count(*) AS avg_cos_micro,
  min(cos) AS min_cos
FROM cosd GROUP BY label
"""


# --- preprocessing parity (C4 / F8 / R1) --------------------------------------

def q_deid() -> str:
    # DuckDB regexp_replace needs the 'g' flag for replace-all (Spark's
    # regexp_replace is global by default)
    return r"""
WITH raw AS (
  SELECT doc_id,
    '[**' || doc_id::VARCHAR || '**] ' || text || ' [**' || lang || '**]'
      AS raw_text
  FROM documents
)
SELECT doc_id,
  length(raw_text)::INT AS raw_len,
  length(regexp_replace(raw_text, '\[\*\*|\*\*\]', '', 'g'))::INT
    AS clean_len,
  md5(regexp_replace(raw_text, '\[\*\*|\*\*\]', '', 'g')) AS clean_md5
FROM raw
"""


def q_validate_rels() -> str:
    from ..config import CUTOFF, VALID_COMBS
    from .oracle import MEN_CTE, TOKS_CTE

    combs = ", ".join(f"('{a}','{b}')" for a, b in VALID_COMBS)
    return f"""
WITH {TOKS_CTE.strip()}, {MEN_CTE.strip()}
SELECT CASE WHEN (m1.ent_type, m2.ent_type) IN ({combs})
            THEN 'ok' ELSE 'rejected' END AS status,
       m1.ent_type AS ent_type_1, m2.ent_type AS ent_type_2,
       count(*)::BIGINT AS n
FROM men m1 JOIN men m2 USING (doc_id)
WHERE m1.i <> m2.i AND abs(m1.sent_id - m2.sent_id) <= {CUTOFF}
GROUP BY ALL
"""


def q_seeded_sample() -> str:
    from ..operators.preprocess import SAMPLE_N, SAMPLE_SEED

    return f"""
SELECT rank::INT AS rank, o_orderkey, rk FROM (
  SELECT row_number() OVER (
           ORDER BY md5('{SAMPLE_SEED}|' || o_orderkey::VARCHAR), o_orderkey
         ) AS rank,
         o_orderkey,
         md5('{SAMPLE_SEED}|' || o_orderkey::VARCHAR) AS rk
  FROM orders
) WHERE rank <= {SAMPLE_N}
"""


# --- multimodal --------------------------------------------------------------

def q_multimodal_meta() -> str:
    return """
SELECT doc_id,
  octet_length(encode(text))::INT AS byte_len,
  lower(hex(encode(substring(text, 1, 8)))) AS magic_hex,
  octet_length(encode(text)) / length(text) AS bytes_per_char
FROM documents
"""


def q_multimodal_features() -> str:
    # exact byte values recovered from the hex dump of the utf-8 payload;
    # every aggregate is integer-exact, matching the Arrow UDF bit-for-bit
    return """
WITH h AS (
  SELECT doc_id, lower(hex(encode(text))) AS h FROM documents
),
bytes AS (
  SELECT doc_id,
    (strpos('0123456789abcdef', substring(h, 2*i.i-1, 1)) - 1) * 16
      + strpos('0123456789abcdef', substring(h, 2*i.i, 1)) - 1 AS bv
  FROM h, UNNEST(range(1, length(h)//2 + 1)) i(i)
)
SELECT doc_id, 'image' AS modality,
  count(*)::BIGINT AS n_bytes,
  sum(bv)::BIGINT AS byte_sum,
  sum(bv*bv)::BIGINT AS byte_sq_sum,
  min(bv)::BIGINT AS byte_min,
  max(bv)::BIGINT AS byte_max,
  CAST(2*median(bv) AS BIGINT) AS med2,
  (sum(bv) % 997)::BIGINT AS sum_mod_997,
  (count(*) FILTER (bv > 100))::BIGINT AS n_gt100,
  ((sum(bv)*2000000 + count(*)) // (2*count(*)))::BIGINT AS mean_micro,
  greatest(1, count(*) // 64)::BIGINT AS n_frames
FROM bytes GROUP BY doc_id
"""


def q_hll_distinct() -> str:
    """HyperLogLog sketch oracle (operators/textstats.py q_hll_distinct):
    registers from exact integer arithmetic (48-bit md5-prefix hash, top
    6 bits bucket, rho via binary-string length — no float log2), the
    estimate one fixed-shape double division of a shared pre-rounded
    numerator literal."""
    from ..operators.textstats import (
        HLL_EST_NUM,
        HLL_M,
        HLL_MAXR,
        HLL_WBITS,
    )

    hex12 = " + ".join(
        f"(strpos('0123456789abcdef', substring(hx, {i + 1}, 1)) - 1)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"""
WITH tl AS (SELECT lang, string_split(text, ' ') AS tl FROM documents),
bg AS (
  SELECT DISTINCT lang, tl[i] || ' ' || tl[i+1] AS shingle
  FROM tl, UNNEST(range(1, len(tl))) r(i)
  WHERE len(tl) >= 2
),
h AS (
  SELECT lang, ({hex12})::BIGINT AS h
  FROM (SELECT lang, md5(shingle) AS hx FROM bg)
),
reg AS (
  SELECT lang, h // {1 << HLL_WBITS} AS bucket,
    CASE WHEN h % {1 << HLL_WBITS} = 0 THEN {HLL_MAXR}
         ELSE {HLL_MAXR} - length(printf('%b', h % {1 << HLL_WBITS}))
    END AS rho
  FROM h
),
m AS (
  SELECT lang, bucket, max(rho) AS mj FROM reg GROUP BY lang, bucket
),
sk AS (
  SELECT lang, count(*)::BIGINT AS n_buckets_hit,
    (sum((1::BIGINT << ({HLL_MAXR} - mj))::BIGINT)
     + ({HLL_M} - count(*)) * {1 << HLL_MAXR})::BIGINT AS s_int
  FROM m GROUP BY lang
),
ex AS (SELECT lang, count(*)::BIGINT AS n_exact FROM bg GROUP BY lang)
SELECT s.lang, s.n_buckets_hit, s.s_int, e.n_exact,
  {HLL_EST_NUM!r} / (1000000.0 * s.s_int::DOUBLE) AS est_distinct
FROM sk s JOIN ex e USING (lang)
"""


def q_kmv_distinct() -> str:
    """KMV distinct-count sketch oracle (operators/textstats.py): hashes
    are the first 12 hex chars of md5 (unrolled digit arithmetic, exact
    bigints); the estimate is one integer/integer division (DOUBLE in both
    engines, identical IEEE result)."""
    from ..operators.textstats import HEX12, K_MV

    hex12 = " + ".join(
        f"(strpos('0123456789abcdef', substring(hx, {i + 1}, 1)) - 1)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"""
WITH tl AS (SELECT lang, string_split(text, ' ') AS tl FROM documents),
bg AS (
  SELECT DISTINCT lang, tl[i] || ' ' || tl[i+1] AS shingle
  FROM tl, UNNEST(range(1, len(tl))) r(i)
  WHERE len(tl) >= 2
),
h AS (
  -- distinct h VALUES (prefix collisions collapse), matching the
  -- mergeable-KMV set semantics of the Spark side
  SELECT DISTINCT lang, ({hex12})::BIGINT AS h
  FROM (SELECT lang, md5(shingle) AS hx FROM bg)
),
rk AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM h
),
sk AS (
  SELECT lang, max(h)::BIGINT AS kth, count(*)::BIGINT AS k_actual
  FROM rk WHERE rn <= {K_MV} GROUP BY lang
),
ex AS (SELECT lang, count(*)::BIGINT AS n_exact FROM bg GROUP BY lang)
SELECT s.lang, s.k_actual, s.kth, e.n_exact,
  CASE WHEN s.k_actual < {K_MV} THEN s.k_actual::DOUBLE
       ELSE {(K_MV - 1) * HEX12} / s.kth END AS est_distinct
FROM sk s JOIN ex e USING (lang)
"""


def q_corpus_clean() -> str:
    from ..operators.textstats import (
        CLEAN_MIN_DISTINCT_RATIO,
        CLEAN_MIN_TOKENS,
    )

    return f"""
WITH feats AS (
  SELECT doc_id, lang, md5(text) AS th,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_distinct(string_split(text, ' ')))
      / len(string_split(text, ' ')) AS dr
  FROM documents
),
keeper AS (SELECT th, min(doc_id) AS keeper_id FROM feats GROUP BY th),
kept AS (
  SELECT lang, count(*)::BIGINT AS n_kept,
    sum(n_tokens)::BIGINT AS kept_tokens
  FROM feats JOIN keeper USING (th)
  WHERE doc_id = keeper_id
    AND dr >= {CLEAN_MIN_DISTINCT_RATIO}
    AND n_tokens >= {CLEAN_MIN_TOKENS}
  GROUP BY lang
),
totals AS (SELECT lang, count(*)::BIGINT AS n_docs FROM feats GROUP BY lang)
SELECT t.lang, t.n_docs,
  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
  coalesce(k.kept_tokens, 0)::BIGINT AS kept_tokens
FROM totals t LEFT JOIN kept k USING (lang)
"""


def q_kmeans_centroids() -> str:
    """K-means Lloyd refinement oracle (operators/similarity.py
    q_kmeans_centroids): KM_ITERS assignment/update rounds unrolled as
    MATERIALIZED CTEs (the same load-bearing hint as the PageRank
    oracle); assignment = argmin of exact bigint squared-L2 with cid
    tiebreak, update = per-dim floor(sum/count)."""
    from ..operators.similarity import KM_ITERS

    sq = _SQ_L2.format(a="q.qe", b="c.centroid")
    steps = []
    prev = "c0"
    for k in range(1, KM_ITERS + 1):
        steps.append(f"""
a{k} AS MATERIALIZED (
  SELECT vec_id, qe, cid FROM (
    SELECT q.vec_id, q.qe, c.cid,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {sq}, c.cid) AS rn
    FROM q CROSS JOIN {prev} c
  ) WHERE rn = 1
),
c{k} AS MATERIALIZED (
  {_cent_body(f"a{k}", "cid")}
)""")
        prev = f"c{k}"
    unrolled = ",".join(s.strip() for s in steps)
    return f"""
WITH {_QE.strip()}, {_CENT.strip()},
c0 AS MATERIALIZED (SELECT label AS cid, centroid FROM cent),
{unrolled}
SELECT c.cid, n.n_members, (d.i - 1)::INT AS dim,
  c.centroid[d.i]::BIGINT AS cv
FROM {prev} c JOIN (
  SELECT cid, count(*)::BIGINT AS n_members
  FROM a{KM_ITERS} GROUP BY cid
) n USING (cid), UNNEST(range(1, len(c.centroid) + 1)) d(i)
"""


def q_stratified_sample() -> str:
    from ..operators.preprocess import SAMPLE_SEED, STRAT_N

    return f"""
SELECT lang, doc_id, rk, rank::INT AS rank FROM (
  SELECT lang, doc_id,
         md5('{SAMPLE_SEED}|' || doc_id::VARCHAR) AS rk,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{SAMPLE_SEED}|' || doc_id::VARCHAR), doc_id
         ) AS rank
  FROM documents
) WHERE rank <= {STRAT_N}
"""


def q_ngram_topk() -> str:
    from ..operators.textstats import NGRAM_TOPK

    return f"""
WITH tl AS (SELECT lang, string_split(text, ' ') AS tl FROM documents),
bg AS (
  SELECT lang, tl[i] || ' ' || tl[i+1] AS bigram
  FROM tl, UNNEST(range(1, len(tl))) r(i)
  WHERE len(tl) >= 2
),
counts AS (
  SELECT lang, bigram, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2
)
SELECT lang, rank::INT AS rank, bigram, n FROM (
  SELECT lang, bigram, n,
    row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
  FROM counts
) WHERE rank <= {NGRAM_TOPK}
"""


def q_tfidf_topk() -> str:
    """TF x integer-log2-IDF top-K oracle (operators/textstats.py
    q_tfidf_topk): idf_log2 = length of the binary rendering of
    N div df — DuckDB printf('%b') is the twin of Spark bin()."""
    from ..operators.textstats import TFIDF_TOPK

    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT f.doc_id, f.term, f.tf,
    length(printf('%b', n.n_docs // d.df))::BIGINT AS idf_log2,
    (f.tf * length(printf('%b', n.n_docs // d.df)))::BIGINT AS score
  FROM tf f JOIN dft d USING (term) CROSS JOIN nd n
)
SELECT doc_id, term, tf, idf_log2, score, rank::INT AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term
  ) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOPK}
"""


def q_pages_latest() -> str:
    """Latest-crawl-per-url oracle (operators/dedup.py q_pages_latest):
    same synthetic recrawl derivation, row_number over (ts DESC, doc_id
    DESC) in place of Spark's map-side-combinable max(struct)."""
    from ..operators.dedup import (
        CRAWL_TS_BASE_US,
        CRAWL_TS_MIX,
        CRAWL_TS_MOD,
        RECRAWL_FANOUT,
    )

    return f"""
WITH pages AS (
  SELECT 'doc://' || (doc_id // {RECRAWL_FANOUT})::VARCHAR AS url,
         doc_id,
         ({CRAWL_TS_BASE_US} + (doc_id * {CRAWL_TS_MIX}) % {CRAWL_TS_MOD}
         )::BIGINT AS ts_us
  FROM documents
),
r AS (
  SELECT url, doc_id, ts_us,
    row_number() OVER (
      PARTITION BY url ORDER BY ts_us DESC, doc_id DESC
    ) AS rn,
    count(*) OVER (PARTITION BY url) AS n_crawls
  FROM pages
)
SELECT url, n_crawls::BIGINT AS n_crawls, ts_us AS latest_ts_us,
  doc_id AS latest_doc_id
FROM r WHERE rn = 1
"""


def q_pack_bins() -> str:
    """Sequence-packing oracle (operators/textstats.py q_pack_bins):
    same per-source prefix sum (rows-frame window), integral division
    into bins, per-(source, bin) rollup."""
    from ..operators.textstats import PACK_BUDGET

    return f"""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
  FROM documents
),
binned AS (
  SELECT source, doc_id, n_tok,
    (coalesce(sum(n_tok) OVER (
       PARTITION BY source ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
     // {PACK_BUDGET})::BIGINT AS bin
  FROM toks
)
SELECT source, bin, count(*)::BIGINT AS n_docs,
  sum(n_tok)::BIGINT AS n_tokens,
  sum(n_tok) / {PACK_BUDGET} AS fill_ratio
FROM binned GROUP BY source, bin
"""


def q_contamination() -> str:
    """Decontamination-census oracle (operators/textstats.py
    q_contamination): probe list as VALUES, containment via
    list_contains over the CONTAM_NGRAM-gram derivation (the same
    config constant the Spark side reads), zero-match probes preserved
    by the left join."""
    from ..config import CONTAM_NGRAM as N
    from ..operators.textstats import CONTAM_PROBES

    # escape single quotes: the Spark side goes through typed literals,
    # so the SQL rendering must not be the narrower path
    values = ", ".join(
        "('" + p.replace("'", "''") + "')" for p in CONTAM_PROBES
    )
    return f"""
WITH tl AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
bg AS (
  SELECT doc_id,
    CASE WHEN len(tl) >= {N} THEN
      [array_to_string(tl[i:i + {N - 1}], ' ')
       for i in range(1, len(tl) - {N - 2})]
    ELSE [] END AS bg
  FROM tl
),
probes AS (SELECT * FROM (VALUES {values}) t(probe)),
hits AS (
  SELECT p.probe, count(*)::BIGINT AS n_docs
  FROM probes p JOIN bg d ON list_contains(d.bg, p.probe)
  GROUP BY p.probe
),
nt AS (SELECT count(*)::BIGINT AS n_total FROM documents)
SELECT p.probe, coalesce(h.n_docs, 0)::BIGINT AS n_docs,
  CASE WHEN nt.n_total > 0
       THEN coalesce(h.n_docs, 0) / nt.n_total
       ELSE 0.0 END AS contamination_rate
FROM probes p LEFT JOIN hits h USING (probe) CROSS JOIN nt
"""


def q_dedup_containment() -> str:
    """Containment oracle (operators/dedup.py q_dedup_containment):
    same LSH candidate CTEs as the Jaccard verify, max-direction
    containment = inter / least(size_a, size_b)."""
    from ..operators.dedup import CONTAIN_MIN

    return f"""
WITH {_SHINGLES.strip()}, {_MH.strip()}, {_BANDS.strip()}, {_PAIRS.strip()},
sized AS (
  SELECT p.doc_a, p.doc_b,
    len(list_intersect(a.shingles, b.shingles))::INT AS inter,
    len(a.shingles)::INT AS size_a,
    len(b.shingles)::INT AS size_b
  FROM mpairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b
)
SELECT doc_a, doc_b, inter, size_a, size_b,
  inter / least(size_a, size_b) AS containment
FROM sized
WHERE inter / least(size_a, size_b) >= {CONTAIN_MIN}
"""


_SQ_L2 = (
    "list_sum(list_transform(range(1, len({a}) + 1),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


def _pq_ctes() -> str:
    """Shared PQ CTE stack: subvectors, per-(sub, label) codebook
    (the _cent_body discipline keyed by two columns), nearest-code
    assignment with (dist, code) tiebreak."""
    from ..operators.similarity import PQ_M, PQ_SPLIT, PQ_SUB

    sq = _SQ_L2.format(a="s.sv", b="c.centroid")
    return f"""
subs AS (
  SELECT vec_id, label * {PQ_SPLIT} + vec_id % {PQ_SPLIT} AS code0,
         s.s::INT AS sub,
         qe[1 + s.s * {PQ_SUB} : (s.s + 1) * {PQ_SUB}] AS sv
  FROM q, UNNEST(range(0, {PQ_M})) s(s)
),
cb AS (
  SELECT sub, code0 AS code,
    list_transform(list_sort(list(struct_pack(d := dim, c := cv))),
                   x -> x.c) AS centroid
  FROM (
    SELECT sub, code0, d.i AS dim,
      floor(sum(sv[d.i]) / count(*))::BIGINT AS cv
    FROM subs, UNNEST(range(1, len(sv) + 1)) d(i)
    GROUP BY sub, code0, d.i
  ) GROUP BY sub, code0
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
      row_number() OVER (PARTITION BY s.vec_id, s.sub
                         ORDER BY {sq}, c.code) AS rn
    FROM subs s JOIN cb c USING (sub)
  ) WHERE rn = 1
)"""


def q_pq_codes() -> str:
    """PQ encoding oracle (operators/similarity.py q_pq_codes)."""
    return f"""
WITH {_QE.strip()},{_pq_ctes()}
SELECT vec_id, sub, code FROM codes
"""


def q_pq_ann_topk() -> str:
    """PQ ADC top-k oracle (operators/similarity.py q_pq_ann_topk):
    per-query distance tables joined to the corpus codes, summed, the
    (adist, neighbor_id)-ranked PQ_RERANK shortlist re-ranked by exact
    squared-L2 on the raw quantized vectors (the r6 refinement stage),
    final top-TOPK by (dist, neighbor_id)."""
    from ..operators.similarity import PQ_RERANK, TOPK

    sq = _SQ_L2.format(a="s.sv", b="c.centroid")
    ex = _SQ_L2.format(a="qq.qe", b="nn.qe")
    return f"""
WITH {_QE.strip()},{_pq_ctes()},
dtab AS (
  SELECT s.vec_id AS query_id, s.sub, c.code, {sq} AS d
  FROM subs s JOIN cb c USING (sub)
  WHERE s.vec_id < {N_QUERIES}
),
approx AS (
  SELECT t.query_id, k.vec_id AS neighbor_id, sum(t.d)::BIGINT AS adist
  FROM codes k JOIN dtab t ON t.sub = k.sub AND t.code = k.code
  WHERE k.vec_id >= {N_QUERIES}
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id, adist FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adist, neighbor_id) AS srank
    FROM approx
  ) WHERE srank <= {PQ_RERANK}
),
ex AS (
  SELECT s.query_id, s.neighbor_id, s.adist, {ex}::BIGINT AS dist
  FROM short s
  JOIN q qq ON qq.vec_id = s.query_id
  JOIN q nn ON nn.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, rank::INT AS rank, dist, adist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, neighbor_id) AS rank
  FROM ex
) WHERE rank <= {TOPK}
"""
