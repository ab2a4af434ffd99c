"""Independent pure-Python recomputations of the round-5 operators — a
THIRD implementation per query (beyond the Spark plan and the DuckDB
oracle, which share their constants), following the repo's
fuzz-vs-reference-port test pattern."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE


def _docs_rows():
    con = duckdb.connect()
    rows = con.sql(
        "SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_pack_bins_matches_pure_python(spark):
    from clinicaltransformerrelationextraction_spark.operators.textstats import (
        PACK_BUDGET,
        q_pack_bins,
    )

    per_source: dict[str, list[tuple[int, int]]] = {}
    for doc_id, text, _lang, source in _docs_rows():
        per_source.setdefault(source, []).append(
            (doc_id, len(text.split(" ")))
        )
    expected: dict[tuple[str, int], list[int]] = {}
    for source, docs in per_source.items():
        cum = 0
        for doc_id, n_tok in sorted(docs):
            b = cum // PACK_BUDGET
            expected.setdefault((source, b), []).append(n_tok)
            cum += n_tok
    got = {
        (r.source, r.bin): (r.n_docs, r.n_tokens, r.fill_ratio)
        for r in q_pack_bins(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    for key, toks in expected.items():
        n_docs, n_tokens, fill = got[key]
        assert n_docs == len(toks) and n_tokens == sum(toks)
        assert abs(fill - sum(toks) / PACK_BUDGET) < 1e-12
    # every bin except possibly the straddling/tail ones is near budget:
    # the packer's point is fill, so assert the median bin is >50% full
    fills = sorted(v[2] for v in got.values())
    assert fills[len(fills) // 2] > 0.5


def test_pages_latest_matches_pure_python(spark):
    from clinicaltransformerrelationextraction_spark.operators.dedup import (
        CRAWL_TS_BASE_US,
        CRAWL_TS_MIX,
        CRAWL_TS_MOD,
        RECRAWL_FANOUT,
        q_pages_latest,
    )

    groups: dict[str, list[tuple[int, int]]] = {}
    for doc_id, _text, _lang, _source in _docs_rows():
        url = f"doc://{doc_id // RECRAWL_FANOUT}"
        ts = CRAWL_TS_BASE_US + (doc_id * CRAWL_TS_MIX) % CRAWL_TS_MOD
        groups.setdefault(url, []).append((ts, doc_id))
    got = {
        r.url: (r.n_crawls, r.latest_ts_us, r.latest_doc_id)
        for r in q_pages_latest(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(groups)
    n_ts_argmax_differs = 0
    for url, versions in groups.items():
        ts, doc_id = max(versions)
        assert got[url] == (len(versions), ts, doc_id), url
        if doc_id != max(d for _, d in versions):
            n_ts_argmax_differs += 1
    # the synthetic timestamps must actually exercise the ts-argmax path
    # (latest != max doc_id for some urls) or the query proves nothing
    assert n_ts_argmax_differs > 0


def test_contamination_matches_pure_python(spark):
    """Census counts recomputed in pure Python over CONTAM_NGRAM-token
    windows — the r6 verdict's 3+-gram probe test: the census window is
    its own config (real decontamination uses longer n-grams than the
    dedup bigram shingles)."""
    from clinicaltransformerrelationextraction_spark.config import CONTAM_NGRAM
    from clinicaltransformerrelationextraction_spark.operators.textstats import (
        CONTAM_PROBES,
        q_contamination,
    )

    assert CONTAM_NGRAM >= 3  # the census must NOT ride the dedup bigrams
    rows = _docs_rows()
    expected = {p: 0 for p in CONTAM_PROBES}
    for _doc_id, text, _lang, _source in rows:
        toks = text.split(" ")
        grams = {
            " ".join(toks[i : i + CONTAM_NGRAM])
            for i in range(len(toks) - CONTAM_NGRAM + 1)
        }
        for p in CONTAM_PROBES:
            if p in grams:
                expected[p] += 1
    got = {
        r.probe: (r.n_docs, r.contamination_rate)
        for r in q_contamination(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    for p, n in expected.items():
        assert got[p][0] == n
        assert abs(got[p][1] - n / len(rows)) < 1e-12
    assert got["zz_never zz_seen zz_gone"][0] == 0  # the designed miss probe
    assert sum(n for n, _ in got.values()) > 0  # and real hits exist


def test_neighbor_jaccard_matches_pure_python(spark):
    """Recompute neighborhood Jaccard from the COLLECTED edge list with
    plain Python sets — independent of both the wedge-join plan and the
    shared-CTE oracle."""
    from clinicaltransformerrelationextraction_spark.operators.graph import (
        _undirected,
        q_graph_neighbor_jaccard,
    )

    edges = [(r.a, r.b) for r in _undirected(spark, SF_SMOKE).collect()]
    neigh: dict[str, set[str]] = {}
    for a, b in edges:
        neigh.setdefault(a, set()).add(b)
        neigh.setdefault(b, set()).add(a)
    expected = {}
    nodes = sorted(neigh)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            common = len(neigh[a] & neigh[b])
            if common:
                expected[(a, b)] = (
                    common, len(neigh[a]), len(neigh[b]),
                    common / (len(neigh[a]) + len(neigh[b]) - common),
                )
    got = {
        (r.a, r.b): (r.n_common, r.deg_a, r.deg_b, r.jaccard)
        for r in q_graph_neighbor_jaccard(spark, SF_SMOKE).collect()
    }
    assert got.keys() == expected.keys()
    for k, (c, da, db, j) in expected.items():
        gc, gda, gdb, gj = got[k]
        assert (gc, gda, gdb) == (c, da, db), k
        assert abs(gj - j) < 1e-12
    assert expected, "graph produced no overlapping neighborhoods"


def test_user_star_edges_components_equal_clique(spark):
    """The star contraction of the per-(k, day) co-action cliques must
    yield EXACTLY the components of the full clique expansion — the
    equivalence that lets q_graph_user_components skip materializing
    O(group^2) edges."""
    from clinicaltransformerrelationextraction_spark.operators.graph import (
        _user_edges,
        _user_star_edges,
        min_label_components,
    )

    clique = {
        (r.entity, r.component, r.is_root)
        for r in min_label_components(_user_edges(spark, SF_SMOKE)).collect()
    }
    star = {
        (r.entity, r.component, r.is_root)
        for r in min_label_components(
            _user_star_edges(spark, SF_SMOKE)
        ).collect()
    }
    assert clique == star and clique
    # and the star list really is the smaller derivation
    assert (
        _user_star_edges(spark, SF_SMOKE).count()
        <= _user_edges(spark, SF_SMOKE).count()
    )


def test_round5_queries_on_empty_corpus(spark, tmp_path):
    """Degenerate-input behavior of the round-5 document queries over an
    EMPTY documents table (a real state for a new crawl partition):
    aggregating queries return empty frames, while the contamination
    census keeps one explicit all-zero row per probe (its left join from
    the probe list is the contract that an all-clean corpus reads as
    zeros, not as an empty frame)."""
    from clinicaltransformerrelationextraction_spark.operators.dedup import (
        q_pages_latest,
    )
    from clinicaltransformerrelationextraction_spark.operators.textstats import (
        CONTAM_PROBES,
        q_contamination,
        q_pack_bins,
        q_tfidf_topk,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    empty_dir = str(tmp_path / "empty_sf")
    docs.limit(0).write.mode("overwrite").parquet(
        f"{empty_dir}/documents.parquet"
    )
    assert q_pack_bins(spark, empty_dir).count() == 0
    assert q_tfidf_topk(spark, empty_dir).count() == 0
    assert q_pages_latest(spark, empty_dir).count() == 0
    rows = q_contamination(spark, empty_dir).collect()
    assert len(rows) == len(CONTAM_PROBES)
    assert all(r.n_docs == 0 for r in rows)
    # the empty-corpus guard's contract is an explicit 0.0 rate (not
    # NULL, not an error) — pin the value, not just the row shape
    assert all(r.contamination_rate == 0.0 for r in rows)

    # the ORACLE's ELSE 0.0 branch must agree on the same empty table
    # (the guard landed symmetrically; parity runs never see an empty
    # corpus, so this is its only coverage)
    import duckdb

    from clinicaltransformerrelationextraction_spark.plans import (
        oracle_training,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{empty_dir}/documents.parquet/*.parquet')"
    )
    orows = con.execute(oracle_training.q_contamination()).fetchall()
    assert len(orows) == len(CONTAM_PROBES)
    assert all(r[1] == 0 and r[2] == 0.0 for r in orows)
