"""Unit tests for the training-data ops: dedup family, ANN, text stats,
multimodal plumbing — with planted duplicates / known neighbors."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bitfunnel_ray.ops import ann, dedup, textstats
from bitfunnel_ray.sources.corpus import _lift_documents_batch


def _corpus(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(
        _lift_documents_batch(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * len(texts)),
                }
            )
        )
    )


def test_exact_dedup_keeps_min_doc_id():
    c = _corpus(["a b c", "x y", "a b c", "a b c", "x y"], ids=[5, 1, 3, 9, 7])
    kept = sorted(dedup.exact_dedup_keep(c).to_pandas()["doc_id"].tolist())
    assert kept == [1, 3]  # min id per distinct text


def test_minhash_finds_planted_near_dups():
    base = "w%d " * 40
    t1 = " ".join(f"w{i}" for i in range(40))
    t2 = " ".join(f"w{i}" for i in range(39)) + " zz"  # near-dup of t1
    others = [" ".join(f"u{i+j*50}" for i in range(40)) for j in range(8)]
    c = _corpus([t1, t2] + others)
    pairs = dedup.minhash_dedup_pairs_table(c, k=3, bands=16, threshold=0.5)
    got = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    assert (0, 1) in got
    # high jaccard for the planted pair
    j = dict(zip(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()), pairs["jaccard"].to_pylist()))
    assert j[(0, 1)] > 0.8


def test_simhash_identical_and_candidates():
    t1 = " ".join(f"w{i}" for i in range(50))
    t2 = t1  # identical
    c = _corpus([t1, t2, "completely different tokens here now"])
    sh = dedup.simhash(c).to_pandas().set_index("doc_id")["simhash"]
    assert sh[0] == sh[1]
    cands = dedup.simhash_candidates(c).to_pandas()
    assert {(0, 1)} <= set(zip(cands["doc_a"], cands["doc_b"]))


def test_embedding_dup_pairs_planted():
    vecs = np.random.default_rng(7).standard_normal((30, 16)).astype(np.float32)
    vecs[11] = vecs[3] * 2.0 + 0.001  # same direction → cosine ~1
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    pairs = dedup.embedding_dup_pairs(emb, threshold=0.99)
    got = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    assert (3, 11) in got


def test_ann_brute_force_matches_numpy():
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 32))
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    q = vecs[:2]
    got = ann.brute_force_topk(emb, q, k=5).to_pandas()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # note: stored vectors are float32 — mirror that in the oracle
    unit32 = vecs.astype(np.float32).astype(np.float64)
    unit32 = unit32 / np.linalg.norm(unit32, axis=1, keepdims=True)
    qu = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = unit32 @ qu.T
    for qi in range(2):
        want = np.argsort(-sims[:, qi])[:5].tolist()
        sub = got[got.query_id == qi].sort_values("rank")
        assert sub["vec_id"].tolist() == want
        # self is its own nearest neighbor
        assert sub["vec_id"].iloc[0] == qi


def test_ann_lsh_recall():
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((500, 32))
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(500), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    q = vecs[:3]
    exact = ann.brute_force_topk(emb, q, k=10).to_pandas()
    approx = ann.lsh_topk(emb, q, k=10, n_planes=6, multiprobe=1).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # approximate, but must find a majority
    # the query vector itself always survives (its bucket is probed)
    assert 0 in set(approx[approx.query_id == 0]["vec_id"])


def test_lang_id_markers():
    c = _corpus(
        [
            "the cat sat on the mat and it was happy",
            "der hund ist nicht auf der wiese und das ist gut",
            "el perro es un animal que vive en la casa",
            "le chien est dans la maison avec le chat",
            "il cane è un animale che vive nella casa ma non qui",
            "o cão é um animal que vive na casa e não sai",
            "de hond is een dier dat in het huis woont en niet weg wil",
        ]
    )
    got = textstats.lang_id(c).to_pandas().sort_values("doc_id")
    assert got["lang_pred"].tolist() == ["en", "de", "es", "fr", "it", "pt", "nl"]


def test_lang_id_scripts():
    """Non-latin scripts classify by vectorized UTF-8 lead-byte detection
    (kana presence upgrades CJK to ja; kana-only is ja too)."""
    c = _corpus(
        [
            "Это русский текст о собаках и кошках в доме",
            "هذا نص عربي عن الكلاب والقطط في المنزل",
            "这是一段关于猫和狗的中文文本 它们住在房子里",
            "これは犬と猫についての日本語のテキストです",
            "이것은 집에 사는 개와 고양이에 관한 한국어 텍스트입니다",
            "ひらがなだけのにほんごのぶんしょうです",
            "zxq wvv qqq zz",
        ]
    )
    got = textstats.lang_id(c).to_pandas().sort_values("doc_id")
    assert got["lang_pred"].tolist() == ["ru", "ar", "zh", "ja", "ko", "ja", "und"]


def test_fingerprint_order_sensitive():
    c = _corpus(["a b c", "a b c", "c b a"])
    fp = textstats.fingerprint(c).to_pandas().set_index("doc_id")["fingerprint"]
    assert fp[0] == fp[1] != fp[2]


def test_quality_score_degenerate():
    c = _corpus(["", "the the the the", "x"])
    got = textstats.quality_score(c).to_pandas().sort_values("doc_id")
    assert got["quality"].iloc[0] == 0.0
    assert got["stopword_ratio"].iloc[1] == 1.0
    assert got["n_unique"].iloc[1] == 1


def test_multimodal_stub_and_fake():
    from bitfunnel_ray.ops.multimodal import DecodeFeatures, extract_features, html_to_media

    c = _corpus(["hello world", "foo bar"])
    media = html_to_media(c)
    feats = extract_features(media, backend="fake", dim=4).to_pandas()
    assert len(feats) == 2 and len(feats["features"].iloc[0]) == 4
    # determinism
    feats2 = extract_features(html_to_media(c), backend="fake", dim=4).to_pandas()
    a = [list(x) for x in feats.sort_values("media_id")["features"]]
    b = [list(x) for x in feats2.sort_values("media_id")["features"]]
    assert a == b
    # honest stub raises
    with pytest.raises(NotImplementedError):
        DecodeFeatures(backend="stub")(
            pa.table(
                {
                    "media_id": pa.array([1], pa.uint64()),
                    "media_type": pa.array(["image"]),
                    "payload": pa.array([b"x"], pa.large_binary()),
                }
            )
        )


def test_embedding_dup_hot_bucket_capped(capfd):
    """One degenerate bucket (many identical vectors) must complete under
    the max_group cap — skipped WITH a report, not O(n^2)-exploded."""
    n = 60
    vecs = np.tile(np.ones(8), (n, 1))  # all identical → one hot bucket
    vecs += np.arange(n)[:, None] * 1e-9  # keep them distinct floats
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    pairs = dedup.embedding_dup_pairs(emb, threshold=0.99, max_group=16)
    assert len(pairs) == 0  # the single oversized bucket was skipped
    # and a small max_group still finds planted pairs in normal buckets
    rng = np.random.default_rng(3)
    v2 = rng.standard_normal((40, 8))
    v2[7] = v2[21] * 3.0
    emb2 = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([v.tolist() for v in v2], pa.list_(pa.float32())),
            }
        )
    )
    p2 = dedup.embedding_dup_pairs(emb2, threshold=0.99, max_group=16)
    got = set(zip(p2["doc_a"].to_pylist(), p2["doc_b"].to_pylist()))
    assert (7, 21) in got


def test_jaccard_verify_distributed_no_cap():
    """The pair-keyed join path verifies EVERY candidate (no driver cap)
    and matches hand-computed jaccard."""
    t1 = " ".join(f"w{i}" for i in range(30))
    t2 = " ".join(f"w{i}" for i in range(29)) + " zz"
    t3 = " ".join(f"q{i}" for i in range(30))
    c = _corpus([t1, t2, t3])
    cands = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([0, 0, 1], pa.int64()),
                "doc_b": pa.array([1, 2, 2], pa.int64()),
            }
        )
    )
    got = dedup.jaccard_verify(c, cands, k=3, threshold=0.0).to_pandas()
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(got) == 3
    # shingle sets: t1 has 28 3-shingles, t2 shares 27 of them
    j01 = got[(got.doc_a == 0) & (got.doc_b == 1)]["jaccard"].iloc[0]
    assert j01 == 27 / 29  # |∩|=27, |∪|=28+28-27
    assert got[(got.doc_a == 0) & (got.doc_b == 2)]["jaccard"].iloc[0] == 0.0


def test_ann_ivf_recall_and_exhaustive():
    rng = np.random.default_rng(29)
    vecs = rng.standard_normal((600, 32))
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(600), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    q = vecs[:3]
    exact = ann.brute_force_topk(emb, q, k=10).to_pandas()
    # nprobe == n_clusters probes everything → identical to brute force
    full = ann.ivf_topk(emb, q, k=10, n_clusters=8, nprobe=8, n_iter=3).to_pandas()
    for qi in range(3):
        e = exact[exact.query_id == qi].sort_values("rank")
        f = full[full.query_id == qi].sort_values("rank")
        assert e["vec_id"].tolist() == f["vec_id"].tolist(), qi
    # nprobe < n_clusters: approximate but majority recall, and the query
    # vector itself always survives (its own cluster is probed first)
    approx = ann.ivf_topk(emb, q, k=10, n_clusters=8, nprobe=3, n_iter=3).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5
    assert 0 in set(approx[approx.query_id == 0]["vec_id"])


def test_kmeans_centroids_deterministic():
    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((300, 16))
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    c1 = ann.kmeans_centroids(emb, n_clusters=4, n_iter=3)
    c2 = ann.kmeans_centroids(emb, n_clusters=4, n_iter=3)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ngram_jaccard_exact_planted_and_oracle():
    """Exact shingle-Jaccard: planted near-dup found with the TRUE jaccard
    (verified against a hand-computed value), independent docs absent, and
    the full result matches the brute-force per-pair computation."""
    t1 = " ".join(f"w{i}" for i in range(40))
    t2 = " ".join(f"w{i}" for i in range(39)) + " zz"  # 37/39 shared 3-shingles
    others = [" ".join(f"u{i + j * 50}" for i in range(40)) for j in range(6)]
    c = _corpus([t1, t2] + others)
    got = dedup.ngram_jaccard_pairs(c, k=3, threshold=0.5, max_df=64).to_pandas()
    got_pairs = dict(zip(zip(got["doc_a"], got["doc_b"]), got["jaccard"]))
    # shingle sets: |A| = |B| = 38; shared = 37 (last shingle of each
    # differs) → jaccard = 37 / (38 + 38 - 37)
    assert (0, 1) in got_pairs
    assert got_pairs[(0, 1)] == pytest.approx(37 / 39)
    assert len(got_pairs) == 1  # independent docs share no shingles


def test_ngram_jaccard_hot_shingle_filter():
    """Shingles above max_df are excluded from pairs AND sizes (the
    consistent stop-shingle semantics the SQL oracle mirrors)."""
    boiler = "the same boiler plate intro here"
    docs = [f"{boiler} unique{j}a unique{j}b unique{j}c" for j in range(8)]
    c = _corpus(docs)
    # boilerplate shingles appear in 8 docs; max_df=4 drops them, and the
    # per-doc unique tails share nothing → no pairs at all
    got = dedup.ngram_jaccard_pairs(c, k=3, threshold=0.1, max_df=4).to_pandas()
    assert len(got) == 0
    # with the filter off the boilerplate makes every pair similar
    got2 = dedup.ngram_jaccard_pairs(c, k=3, threshold=0.3, max_df=1024).to_pandas()
    assert len(got2) == 8 * 7 // 2


def test_sessionize_gap_semantics():
    """Strictly-greater gap splits; equal-to-gap events stay in session;
    interleaved users partition independently."""
    import pyarrow as pa

    from bitfunnel_ray.ops.sessions import sessionize

    M = 60 * 1_000_000  # one minute in us
    rows = [
        # user 1: events at 0, 30m (== gap, same session), 61m (> gap, new)
        (1, 0), (1, 30 * M), (1, 91 * M),
        # user 2 interleaved: single event
        (2, 5 * M),
        # user 3: two sessions of 2 events each
        (3, 0), (3, 1 * M), (3, 200 * M), (3, 201 * M),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    out = (
        sessionize(rd.from_arrow(t), gap_minutes=30.0)
        .to_pandas()
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    got = list(
        zip(out["user_id"], out["session_start_us"], out["session_end_us"], out["n_events"])
    )
    assert got == [
        (1, 0, 30 * M, 2),
        (1, 91 * M, 91 * M, 1),
        (2, 5 * M, 5 * M, 1),
        (3, 0, 1 * M, 2),
        (3, 200 * M, 201 * M, 2),
    ]


def test_asof_join_ties_and_no_match():
    """Tie semantics: equal-ts right rows match inclusively, largest id
    wins; left rows with no prior right row are dropped (inner as-of)."""
    import ray.data as rd

    from bitfunnel_ray.ops.joins import asof_join

    left = rd.from_items(
        [
            {"k": 1, "ts": 100, "id": 10},  # matches click id 3 (ts 100, tie -> max id)
            {"k": 1, "ts": 50, "id": 11},   # matches click id 1 (ts 40)
            {"k": 1, "ts": 30, "id": 12},   # no prior click -> dropped
            {"k": 2, "ts": 500, "id": 13},  # other key, no clicks -> dropped
        ]
    )
    right = rd.from_items(
        [
            {"k": 1, "ts": 40, "id": 1},
            {"k": 1, "ts": 100, "id": 2},
            {"k": 1, "ts": 100, "id": 3},
            {"k": 3, "ts": 1, "id": 4},
        ]
    )
    out = (
        asof_join(left, right, key="k", ts="ts", id_col="id")
        .to_pandas()
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    assert out["left_id"].tolist() == [10, 11]
    assert out["right_id"].tolist() == [3, 1]
    assert out["right_ts_us"].tolist() == [100, 40]


def test_broadcast_dim_join_drops_unmatched():
    import pyarrow as pa
    import ray.data as rd

    from bitfunnel_ray.ops.joins import broadcast_dim_join

    big = rd.from_items([{"fk": 1, "x": 10}, {"fk": 2, "x": 20}, {"fk": 9, "x": 30}])
    dim = pa.table({"pk": pa.array([2, 1], pa.int64()), "name": pa.array(["b", "a"])})
    out = (
        broadcast_dim_join(big, dim, big_key="fk", dim_key="pk", dim_cols=["name"])
        .to_pandas()
        .sort_values("fk")
        .reset_index(drop=True)
    )
    assert out["fk"].tolist() == [1, 2]  # fk=9 has no dim row
    assert out["name"].tolist() == ["a", "b"]


def test_exact_percentiles_matches_duckdb():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bitfunnel_ray.ops.quantiles import exact_percentiles

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=10_001)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    got = exact_percentiles(ds, "v", (0.01, 0.5, 0.99, 1.0)).to_pandas()
    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(vals, pa.int64())}))
    for q, v in zip(got["q"], got["value"]):
        want = con.sql(
            f"SELECT percentile_disc({q}) WITHIN GROUP (ORDER BY v) FROM t"
        ).fetchone()[0]
        assert v == want, (q, v, want)


def test_top_k_per_group_ties_and_small_groups():
    import ray.data as rd

    from bitfunnel_ray.ops.grouped import top_k_per_group

    rows = [
        {"g": "a", "v": 5, "id": 1},
        {"g": "a", "v": 5, "id": 2},   # tie on v -> lower id wins rank
        {"g": "a", "v": 9, "id": 3},
        {"g": "a", "v": 1, "id": 4},
        {"g": "b", "v": 7, "id": 5},   # group smaller than k
    ]
    out = (
        top_k_per_group(
            rd.from_items(rows).repartition(3),  # force multi-block map side
            group_col="g", order_col="v", k=2, descending=True, tiebreak_col="id",
        )
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    assert out[out.g == "a"]["id"].tolist() == [1, 3]  # v=9 then v=5 (id 1)
    assert out[out.g == "b"]["id"].tolist() == [5]


def test_stratified_sample_deterministic():
    import ray.data as rd

    from bitfunnel_ray.ops.grouped import stratified_sample

    rows = [{"g": "s" + str(i % 3), "id": i} for i in range(300)]
    a = stratified_sample(
        rd.from_items(rows), group_col="g", id_col="id", n_per_group=5
    ).to_pandas()
    b = stratified_sample(
        rd.from_items(rows).repartition(7), group_col="g", id_col="id", n_per_group=5
    ).to_pandas()
    ka = sorted(map(tuple, a[["g", "id"]].to_numpy()))
    kb = sorted(map(tuple, b[["g", "id"]].to_numpy()))
    assert ka == kb  # partitioning-independent
    assert a.groupby("g").size().tolist() == [5, 5, 5]


def test_rolling_window_peers_and_bounds():
    """RANGE-frame semantics: equal-ts peers all count; window is
    inclusive at ts - window."""
    import ray.data as rd

    from bitfunnel_ray.ops.sessions import rolling_window

    US = 60_000_000  # 1 minute
    rows = [
        {"user_id": 1, "ts": 0 * US, "event_id": 1, "value": 1.0},
        {"user_id": 1, "ts": 60 * US, "event_id": 2, "value": 2.0},  # exactly window edge
        {"user_id": 1, "ts": 60 * US, "event_id": 3, "value": 4.0},  # peer
        {"user_id": 1, "ts": 121 * US, "event_id": 4, "value": 8.0},  # edge passed
        {"user_id": 2, "ts": 60 * US, "event_id": 5, "value": 16.0},
    ]
    out = (
        rolling_window(rd.from_items(rows), window_minutes=60.0)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[1, "n_window"] == 1 and out.loc[1, "sum_window"] == 1.0
    # events 2,3: window [0,60] includes event 1 AND both peers
    assert out.loc[2, "n_window"] == 3 and out.loc[2, "sum_window"] == 7.0
    assert out.loc[3, "n_window"] == 3 and out.loc[3, "sum_window"] == 7.0
    # event 4: window [61,121] excludes the ts=60 peers
    assert out.loc[4, "n_window"] == 1 and out.loc[4, "sum_window"] == 8.0
    assert out.loc[5, "n_window"] == 1 and out.loc[5, "sum_window"] == 16.0


def test_anti_join_broadcast_and_distributed_agree():
    import numpy as np
    import ray.data as rd

    from bitfunnel_ray.ops.joins import anti_join

    big = rd.from_items([{"k": i % 7, "v": i} for i in range(200)])
    bl_arr = np.array([2, 5])
    a = anti_join(big, bl_arr, key="k", broadcast=True).to_pandas()
    bl_ds = rd.from_items([{"k": 2}, {"k": 5}, {"k": 5}])  # dupes fine
    b = anti_join(big, bl_ds, key="k", broadcast=False).to_pandas()
    want = sorted(i for i in range(200) if i % 7 not in (2, 5))
    assert sorted(a["v"].tolist()) == want
    assert sorted(b["v"].tolist()) == want


def test_pack_sequences_invariants():
    import numpy as np
    import ray.data as rd

    from bitfunnel_ray.ops.packing import pack_sequences

    rng = np.random.default_rng(3)
    lens = rng.integers(1, 900, size=500).tolist() + [5000]  # one oversized doc
    rows = [{"doc_id": i, "n_tokens": L} for i, L in enumerate(lens)]
    out = pack_sequences(rd.from_items(rows).repartition(4), budget=2048).to_pandas()
    # every doc assigned exactly once, lengths preserved
    assert sorted(out["doc_id"].tolist()) == list(range(len(lens)))
    assert out.set_index("doc_id")["n_tokens"].sort_index().tolist() == lens
    g = out.groupby("pack_id")["n_tokens"]
    sums = g.sum()
    counts = g.count()
    # packs fit the budget unless a single doc alone exceeds it
    over = sums[sums > 2048]
    assert all(counts[p] == 1 for p in over.index)
    assert 5000 in sums.values
    # pack_pos is a dense 0..len-1 ordinal within each pack
    for _, grp in out.groupby("pack_id"):
        assert sorted(grp["pack_pos"].tolist()) == list(range(len(grp)))
    # packing is reasonably tight: #packs within 2x of the lower bound
    lower = int(np.ceil((sum(lens) - 5000) / 2048)) + 1
    assert out["pack_id"].nunique() <= 2 * lower


def test_chunk_documents_edges():
    import ray.data as rd

    from bitfunnel_ray.ops.chunking import chunk_documents

    docs = [
        {"doc_id": 1, "text": "a b c"},                      # shorter than window
        {"doc_id": 2, "text": " ".join(f"t{i}" for i in range(8))},   # == window
        {"doc_id": 3, "text": " ".join(f"t{i}" for i in range(9))},   # window + 1
    ]
    out = (
        chunk_documents(rd.from_items(docs), window=8, stride=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.iloc[0].n_tokens == 3 and d1.iloc[0].chunk_text == "a b c"
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].n_tokens == 8
    d3 = out[out.doc_id == 3]
    assert len(d3) == 2
    assert d3.iloc[0].chunk_text == " ".join(f"t{i}" for i in range(8))
    assert d3.iloc[1].chunk_text == " ".join(f"t{i}" for i in range(4, 9))
    assert d3.iloc[1].n_tokens == 5


def test_decontaminate_planted_overlap():
    """Planted contamination: a candidate doc copying half a benchmark
    doc's shingles is flagged with the exact overlap fraction; an
    independent doc is not; benchmark docs never appear as candidates."""
    from bitfunnel_ray.ops.decontam import decontaminate

    # mod=2 → even doc_ids are the benchmark
    bench_text = " ".join(f"b{i}" for i in range(22))  # 20 3-shingles
    # candidate 1: first 12 bench tokens (10 bench shingles) + 10 unique
    # tokens (8 own shingles + 2 boundary shingles) → 20 shingles, 10 hits
    contaminated = " ".join(f"b{i}" for i in range(12)) + " " + " ".join(
        f"c{i}" for i in range(10)
    )
    clean = " ".join(f"z{i}" for i in range(30))
    c = _corpus([bench_text, contaminated, clean], ids=[0, 1, 3])
    out = decontaminate(c, k=3, threshold=0.4, benchmark_mod=2).to_pandas()
    assert list(out.doc_id) == [1]
    row = out.iloc[0]
    assert row.n_shingles == 20 and row.n_overlap == 10
    assert row.contamination == 0.5
    # threshold above the planted fraction → empty
    out2 = decontaminate(c, k=3, threshold=0.6, benchmark_mod=2).to_pandas()
    assert len(out2) == 0


def test_decontaminate_explicit_benchmark_dataset():
    """Explicit bench dataset mode: corpus is scored in full (no mod
    split) against the provided benchmark text."""
    from bitfunnel_ray.ops.decontam import decontaminate

    bench = _corpus([" ".join(f"b{i}" for i in range(10))])
    cand = _corpus(
        [" ".join(f"b{i}" for i in range(10)), "x y z w v"], ids=[7, 8]
    )
    out = decontaminate(cand, bench, k=3, threshold=0.9).to_pandas()
    assert list(out.doc_id) == [7]
    assert out.iloc[0].contamination == 1.0


def test_result_snippets_window_clipping():
    """Snippet windows clip at doc edges and anchor on the FIRST hit of
    any query term; ranks/scores pass through the driver-side join."""
    from bitfunnel_ray.query.snippets import result_snippets

    docs = [
        "hit " + " ".join(f"a{i}" for i in range(20)),  # term at doc start
        " ".join(f"b{i}" for i in range(20)) + " hit",  # term at doc end
        "x0 x1 x2 hit x3 hit x4 x5",  # two hits → first anchors
    ]
    c = _corpus(docs)
    results = pa.table(
        {
            "rank": pa.array([1, 2, 3], pa.int64()),
            "doc_id": pa.array([2, 0, 1], pa.int64()),
            "score": pa.array([3.0, 2.0, 1.0], pa.float64()),
        }
    )
    out = result_snippets(c, results, ["hit"], before=2, after=3).to_pandas()
    assert list(out["rank"]) == [1, 2, 3]
    assert list(out.doc_id) == [2, 0, 1]
    by_doc = dict(zip(out.doc_id, out.snippet))
    assert by_doc[0] == "hit a0 a1 a2"          # left-clipped
    assert by_doc[1] == "b18 b19 hit"           # right-clipped
    assert by_doc[2] == "x1 x2 hit x3 hit x4"   # first hit anchors


def test_facet_counts_boolean_match(tmp_path):
    """Facet counts group the EXACT boolean match set by metadata: docs
    matching AND(spark, join) are counted per (lang, source); non-matching
    docs never contribute."""
    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.query.engine import SearchEngine
    from bitfunnel_ray.query.facets import facet_counts
    from bitfunnel_ray.config import EngineConfig

    texts = [
        "spark join fast",      # match, en/a
        "spark join slow",      # match, en/b
        "spark only here",      # no join → no match
        "join only here",       # no spark → no match
        "spark join again",     # match, de/a
    ]
    langs = ["en", "en", "en", "de", "de"]
    srcs = ["a", "b", "a", "b", "a"]
    c = _corpus(texts)
    idx = str(tmp_path / "idx")
    build_index(c, idx, EngineConfig(max_gram=1, num_buckets=2))
    meta = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "lang": pa.array(langs),
                "source": pa.array(srcs),
            }
        )
    )
    out = facet_counts(SearchEngine(idx), meta, "spark join").to_pandas()
    got = {(r.lang, r.source): r.n_docs for r in out.itertuples()}
    assert got == {("de", "a"): 1, ("en", "a"): 1, ("en", "b"): 1}


def test_distinct_terms_exact_and_hll():
    """Exact per-group distinct counts match a hand-countable corpus;
    the HLL estimate respects its error bound and register merge is
    associative (sketch of whole == max-merge of per-part sketches)."""
    from bitfunnel_ray.ops.sketch import (
        _hll_registers,
        distinct_terms_by_group,
        distinct_terms_hll,
        hll_estimate,
    )
    from bitfunnel_ray.stages.tokenize import hash_token_array

    docs = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(["a", "a", "b", "b"]),
                "text": pa.array(
                    [
                        "x y z x",          # a: {x,y,z}
                        "x w",              # a: +w → 4
                        "p q",              # b: {p,q}
                        "p q r s t",        # b: +r,s,t → 5
                    ]
                ),
            }
        )
    )
    exact = distinct_terms_by_group(docs, "source").to_pandas()
    assert dict(zip(exact.source, exact.n_terms)) == {"a": 4, "b": 5}

    est = distinct_terms_hll(docs, "source").to_pandas()
    got = dict(zip(est.source, est.n_terms_est))
    # linear-counting regime: tiny cardinalities resolve exactly
    assert round(got["a"]) == 4 and round(got["b"]) == 5

    # merge associativity + error bound on a larger vocabulary
    toks = pa.array([f"tok{i}" for i in range(50_000)])
    h = hash_token_array(toks)
    whole = _hll_registers(h)
    merged = np.maximum(_hll_registers(h[:20_000]), _hll_registers(h[20_000:]))
    assert np.array_equal(whole, merged)
    assert abs(hll_estimate(whole) - 50_000) / 50_000 < 0.03


def test_doc_keywords_tfidf_ranking():
    """TF-IDF keyword ranks on a hand-computable corpus: tf and idf both
    matter, exact-tie terms break by term text ascending."""
    import math

    from bitfunnel_ray.ops.keywords import doc_keywords
    from bitfunnel_ray.config import EngineConfig

    c = _corpus(["a a b", "a c", "c c c d"])
    out = (
        doc_keywords(c, n_docs=3, m=2, cfg=EngineConfig(max_gram=1))
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    got = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in out.itertuples()}
    ln32, ln3 = math.log(3 / 2), math.log(3.0)
    # doc0: b beats a (rare term outranks frequent-but-common)
    assert got[(0, 1)][0] == "b" and got[(0, 1)][1] == round(ln3, 6)
    assert got[(0, 2)][0] == "a" and got[(0, 2)][1] == round(2 * ln32, 6)
    # doc1: a and c tie exactly → term asc
    assert got[(1, 1)][0] == "a" and got[(1, 2)][0] == "c"
    # doc2: tf lifts c above the rarer d
    assert got[(2, 1)][0] == "c" and got[(2, 1)][1] == round(3 * ln32, 6)
    assert got[(2, 2)][0] == "d"


def test_fuzzy_term_match_edit_distance_one():
    """Deletion-neighborhood match equals levenshtein <= 1 exactly:
    identity, insertion, deletion, substitution all match; the classic
    SymSpell false positive (transposition ab/ba, distance 2) does not."""
    from bitfunnel_ray.ops.fuzzy import fuzzy_term_match

    vocab = ["spark", "sparks", "park", "spork", "ab", "ba", "sprak"]
    dft = rd.from_arrow(
        pa.table(
            {
                "term": pa.array(vocab),
                "df": pa.array(range(1, len(vocab) + 1), pa.int64()),
            }
        )
    )
    out = fuzzy_term_match(dft, ["spark", "ab"]).to_pandas()
    got = {(r.query_term, r.term) for r in out.itertuples()}
    assert got == {
        ("spark", "spark"),   # distance 0
        ("spark", "sparks"),  # insertion
        ("spark", "park"),    # deletion
        ("spark", "spork"),   # substitution
        ("ab", "ab"),
        # NOT ("spark","sprak") and NOT ("ab","ba"): transpositions are
        # distance 2 in Levenshtein and must be excluded
    }


def test_more_like_this_keyword_overlap():
    """Related-doc ranking: docs sharing more of the source doc's top-m
    keywords rank higher; the source doc is excluded; ties break by
    doc_id ascending."""
    from bitfunnel_ray.ops.mlt import more_like_this

    common = " ".join(f"f{i}" for i in range(10))  # high-df filler
    docs = [
        common + " alpha beta gamma",   # 0: source (keywords α β γ)
        common + " alpha beta gamma",   # 1: shares 3
        common + " alpha beta",         # 2: shares 2
        common + " alpha",              # 3: shares 1
        common,                         # 4: shares 0 → absent
        common + " beta gamma",         # 5: shares 2 (tie with 2 → doc_id)
    ]
    c = _corpus(docs)
    out = more_like_this(c, doc_id=0, n_docs=len(docs), m=3, k=10).to_pandas()
    assert list(out.doc_id) == [1, 2, 5, 3]
    assert list(out.shared) == [3, 2, 2, 1]
    assert list(out["rank"]) == [1, 2, 3, 4]


def test_funnel_two_step_semantics():
    """Funnel edge semantics: target must be STRICTLY after the first
    trigger and within the inclusive window; the FIRST qualifying target
    wins; triggerless users and out-of-window targets are absent."""
    from bitfunnel_ray.ops.funnel import funnel

    us = 1_000_000

    def ev(uid, t_us, typ):
        return {"user_id": uid, "ts": np.datetime64(t_us, "us"), "event_type": typ}

    rows = [
        # user 1: view@10s, clicks at 10s (not strictly after), 20s (wins), 25s
        ev(1, 10 * us, "view"), ev(1, 10 * us, "click"),
        ev(1, 20 * us, "click"), ev(1, 25 * us, "click"),
        # user 2: click BEFORE the first view only → no conversion
        ev(2, 5 * us, "click"), ev(2, 10 * us, "view"),
        # user 3: click exactly at window end (inclusive) → converts
        ev(3, 0 * us, "view"), ev(3, 30 * us, "click"),
        # user 4: click past the window → no conversion
        ev(4, 0 * us, "view"), ev(4, 31 * us, "click"),
        # user 5: no view at all
        ev(5, 1 * us, "click"),
    ]
    ds = rd.from_items(rows)
    out = (
        funnel(ds, "view", "click", window_us=30 * us)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(out.user_id) == [1, 3]
    assert list(out.trigger_ts_us) == [10 * us, 0]
    assert list(out.target_ts_us) == [20 * us, 30 * us]


def test_normalize_text_edges():
    """Normalization edges: case folding, punctuation/whitespace run
    collapse, leading/trailing trim, digits preserved, null text → ''."""
    from bitfunnel_ray.ops.textstats import normalize_text

    c = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["  Hello,   WORLD!! 42 ", "a--b__c", None]),
            }
        )
    )
    out = normalize_text(c).to_pandas().sort_values("doc_id")
    assert list(out.norm_text) == ["hello world 42", "a b c", ""]


def test_cohort_retention_week_semantics():
    """Cohort weeks start Monday (DuckDB date_trunc parity); a user's
    cohort is their first-event week; each active week counts once no
    matter how many events it holds."""
    from bitfunnel_ray.ops.cohort import cohort_retention

    # 2024-01-01 is a Monday; 2024-01-08 the next Monday
    def ts(day, hour=0):
        return np.datetime64(f"2024-01-{day:02d}T{hour:02d}:00:00", "us")

    rows = [
        # user 1: first event Wed week0, active week0 (×2 events) + week1
        {"user_id": 1, "ts": ts(3)}, {"user_id": 1, "ts": ts(4)},
        {"user_id": 1, "ts": ts(9)},
        # user 2: first event Sunday week0 (edge: still week of Jan 1)
        {"user_id": 2, "ts": ts(7, 23)},
        # user 3: cohort = week1
        {"user_id": 3, "ts": ts(8)},
    ]
    out = cohort_retention(rd.from_items(rows)).to_pandas()
    w0 = int(np.datetime64("2024-01-01", "us").astype("int64"))
    w1 = int(np.datetime64("2024-01-08", "us").astype("int64"))
    got = {(r.cohort_week_us, r.week_offset): r.n_users for r in out.itertuples()}
    assert got == {(w0, 0): 2, (w0, 1): 1, (w1, 0): 1}


def test_filtered_topk_respects_predicate():
    """Filtered vector search returns only rows matching the metadata
    predicate, identical to brute force over the pre-filtered subset —
    including batches the filter empties entirely."""
    from bitfunnel_ray.ops import ann

    rng_vecs = np.array(
        [[np.cos(0.1 * i), np.sin(0.1 * i)] for i in range(40)], dtype=np.float32
    )
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([v.tolist() for v in rng_vecs], pa.list_(pa.float32())),
                "label": pa.array([i % 4 for i in range(40)], pa.int64()),
            }
        )
    ).repartition(8)  # several blocks; some will filter to empty
    q = rng_vecs[:1].astype(np.float64)
    got = ann.filtered_topk(
        emb, q, k=5, filter_col="label", filter_value=2
    ).to_pandas()
    assert set(got.vec_id % 4) == {2}
    sub = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([i for i in range(40) if i % 4 == 2], pa.int64()),
                "embedding": pa.array(
                    [rng_vecs[i].tolist() for i in range(40) if i % 4 == 2],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    want = ann.brute_force_topk(sub, q, k=5).to_pandas()
    assert got[["query_id", "rank", "vec_id"]].equals(want[["query_id", "rank", "vec_id"]])
    assert np.array_equal(got.cosine.to_numpy(), want.cosine.to_numpy())


def test_corpus_sources_jsonl_csv_parquet_agree(tmp_path):
    """The JSONL and CSV corpus adapters produce the identical canonical
    corpus (and identical df tables) as the parquet path for the same
    documents — any dump format feeds the same engine."""
    import json

    from bitfunnel_ray.build.stats import document_frequency_table
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.sources.corpus import corpus_from_csv, corpus_from_jsonl

    docs = [
        {"doc_id": 0, "text": "alpha beta", "lang": "en"},
        {"doc_id": 1, "text": "beta gamma gamma", "lang": "de"},
        {"doc_id": 2, "text": "alpha", "lang": "en"},
    ]
    jp = tmp_path / "docs.jsonl"
    jp.write_text("\n".join(json.dumps(d) for d in docs) + "\n")
    cp = tmp_path / "docs.csv"
    cp.write_text(
        "doc_id,text,lang\n"
        + "\n".join(f"{d['doc_id']},{d['text']},{d['lang']}" for d in docs)
        + "\n"
    )
    base = _corpus([d["text"] for d in docs]).to_pandas().sort_values("doc_id")
    for src in (corpus_from_jsonl(str(jp)), corpus_from_csv(str(cp))):
        got = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(got.columns) == list(base.columns)
        assert got["text"].tolist() == base["text"].reset_index(drop=True).tolist()
        assert got["url"].tolist() == base["url"].reset_index(drop=True).tolist()
        dft = (
            document_frequency_table(src, EngineConfig(max_gram=1))
            .select_columns(["term", "df"]).to_pandas()
            .sort_values("term").reset_index(drop=True)
        )
        assert dft.term.tolist() == ["alpha", "beta", "gamma"]
        assert dft.df.tolist() == [2, 2, 1]


def test_binary_stats_entropy_and_sniff():
    """Binary profiling: known-entropy blobs (uniform 256 bytes → 8 bits,
    constant → 0, two equal bytes → 1), size/distinct counts, and
    magic-byte sniffing, including empty blobs."""
    from bitfunnel_ray.ops.multimodal import binary_stats

    blobs = [
        bytes(range(256)),          # uniform → 8.0 bits
        b"aaaa",                    # constant → 0.0
        b"abab",                    # two symbols → 1.0
        b"\x89PNG\r\n\x1a\n" + b"x" * 8,
        b"%PDF-1.7",
        b"",                        # empty
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(blobs)), pa.int64()),
                "html": pa.array(blobs, pa.binary()),
            }
        )
    )
    out = binary_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.n_bytes.tolist() == [256, 4, 4, 16, 8, 0]
    assert out.entropy_bits[0] == 8.0
    assert out.entropy_bits[1] == 0.0
    assert out.entropy_bits[2] == 1.0
    assert out.entropy_bits[5] == 0.0
    assert out.n_distinct_bytes.tolist() == [256, 1, 2, 8, 8, 0]
    assert out.sniff.tolist()[3:] == ["png", "pdf", "empty"]


def test_grouped_percentiles_disc_semantics():
    """percentile_disc per group on a hand-checkable distribution: the
    smallest value whose cumulative count reaches ceil(q*n), per group."""
    from bitfunnel_ray.ops.quantiles import grouped_percentiles

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["a"] * 4 + ["b"] * 5),
                "v": pa.array([10, 20, 30, 40, 1, 1, 2, 3, 100], pa.int64()),
            }
        )
    )
    out = grouped_percentiles(ds, "v", "g", (0.5, 0.75, 1.0)).to_pandas()
    got = {(r.g, r.q): r.value for r in out.itertuples()}
    # group a: n=4 → q=.5 rank 2 → 20; q=.75 rank 3 → 30; q=1 rank 4 → 40
    assert got[("a", 0.5)] == 20 and got[("a", 0.75)] == 30 and got[("a", 1.0)] == 40
    # group b: n=5 sorted [1,1,2,3,100] → q=.5 rank 3 → 2; q=.75 rank 4 → 3
    assert got[("b", 0.5)] == 2 and got[("b", 0.75)] == 3 and got[("b", 1.0)] == 100


def test_rolling_active_users_window_semantics():
    """WAU edges: a user active on day d counts toward days d..d+W-1
    (capped at the last observed day); multiple events in one day count
    once; distinct users sum across the window."""
    from bitfunnel_ray.ops.cohort import rolling_active_users

    day = 86_400_000_000

    def ev(uid, d):
        return {"user_id": uid, "ts": np.datetime64(d * day, "us")}

    rows = [
        ev(1, 0), ev(1, 0),      # dup same-day events count once
        ev(2, 1),
        ev(1, 3),                # user 1 re-activates
    ]
    out = rolling_active_users(rd.from_items(rows), window_days=2).to_pandas()
    got = dict(zip(out.day_us // day, out.n_users))
    # day0: {1}; day1: {1 (from d0), 2}; day2: {2 (from d1)}; day3: {1}
    # day4 would be covered by d3 but is past max observed day (3)? no —
    # max day IS 3, so day4 > max → dropped
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}


def test_duplicated_passages_planted_boilerplate():
    """A boilerplate span shared by 3 docs is detected with the right doc
    and occurrence counts; unique passages are absent; a doc repeating
    the span twice raises n_occurrences but not n_docs."""
    from bitfunnel_ray.ops.chunking import duplicated_passages

    boiler = " ".join(f"b{i}" for i in range(8))
    docs = [
        boiler,                      # doc 0
        boiler,                      # doc 1
        boiler + " " + boiler,       # doc 2 (window 8 / stride 8 → 2 chunks)
        " ".join(f"u{i}" for i in range(8)),  # unique
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(docs),
            }
        )
    )
    out = duplicated_passages(ds, window=8, stride=8, min_docs=2).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row.chunk_text == boiler
    assert row.n_docs == 3 and row.n_occurrences == 4


def test_percolate_conjunctive_semantics():
    """Percolation: a doc matches a stored query iff it contains ALL the
    query's terms; single-term queries, duplicate query terms, and
    multi-query fan-out per doc all behave."""
    from bitfunnel_ray.query.percolate import percolate

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["spark join fast", "spark only", "spark join vector"]
                ),
            }
        )
    )
    out = percolate(
        docs, {7: ["spark", "join"], 8: ["vector"], 9: ["spark", "spark"]}
    ).to_pandas()
    got = set(zip(out.query_id, out.doc_id))
    assert got == {(7, 0), (7, 2), (8, 2), (9, 0), (9, 1), (9, 2)}


def test_skipgram_pairs_window_edges():
    """Skip-grams: ±window offsets inside doc bounds only, never across
    documents; pair multiset on a hand-checkable two-doc corpus."""
    from bitfunnel_ray.ops.chunking import skipgram_pairs

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b c", "x y"]),
            }
        )
    )
    out = skipgram_pairs(ds, window=1).to_pandas()
    got = set(zip(out.doc_id, out.pos, out.d, out.center, out.context))
    assert got == {
        (0, 1, 1, "a", "b"), (0, 2, -1, "b", "a"),
        (0, 2, 1, "b", "c"), (0, 3, -1, "c", "b"),
        (1, 1, 1, "x", "y"), (1, 2, -1, "y", "x"),
        # no (c → x) pair: windows never cross documents
    }


def test_repetition_stats_brute_force():
    """Gopher-rule repetition fractions vs a per-doc python brute force,
    including n=1 (no bigrams) and all-duplicate docs."""
    from collections import Counter

    texts = [
        "a a a a",                # all-dup: dup 3/4, top 1.0, bigram 'a a' 3/3
        "a b c d",                # all unique
        "x",                      # single token: bigram frac 0
        "p q p q p",              # alternating
        "m m n n m m",            # runs
    ]
    c = _corpus(texts)
    out = (
        textstats.repetition_stats(c)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, txt in enumerate(texts):
        toks = txt.split()
        n = len(toks)
        tf = Counter(toks)
        bf = Counter(zip(toks, toks[1:]))
        assert out.n_tokens[i] == n
        assert out.dup_token_frac[i] == 1.0 - len(tf) / n
        assert out.top_token_frac[i] == max(tf.values()) / n
        want_b = max(bf.values()) / (n - 1) if n > 1 else 0.0
        assert out.top_bigram_frac[i] == want_b


def test_redact_planted_pii_and_denylist():
    """Planted emails/IPs/phones are scrubbed; counts follow the
    apply-in-order contract; clean text untouched."""
    from bitfunnel_ray.ops.redact import DEFAULT_PATTERNS, redact_text

    pats = (*DEFAULT_PATTERNS, ("denylist", r"\b(badword)\b", "<TERM>"))
    texts = [
        "contact me at jane.doe+spam@example.co.uk today",
        "server 10.0.255.3 and 192.168.1.1 up",
        "call +1 (555) 123-4567 now",
        "totally clean text here",
        "badword in the middle and a@b.io too",
        None,
    ]
    c = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )
    )
    out = redact_text(c, pats).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.clean_text[0] == "contact me at <EMAIL> today"
    assert out.clean_text[1] == "server <IP> and <IP> up"
    assert out.clean_text[2] == "call <PHONE> now"
    assert out.clean_text[3] == "totally clean text here"
    assert out.clean_text[4] == "<TERM> in the middle and <EMAIL> too"
    assert out.clean_text[5] == ""
    assert out.n_redacted.tolist() == [1, 2, 1, 0, 2, 0]


def test_token_budget_prefix_scan_brute_force():
    """Distributed prefix scan == python brute force, with sparse doc_ids,
    several groups, and the budget boundary landing mid-bucket."""
    from bitfunnel_ray.ops.budget import token_budget_sample

    rng = np.random.RandomState(7)
    ids = sorted(rng.choice(100_000, size=120, replace=False).tolist())
    langs = [("en", "de", "fr")[i % 3] for i in range(120)]
    texts = [" ".join(f"w{j}" for j in range(rng.randint(1, 30))) for _ in range(120)]
    c = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs),
                "text": pa.array(texts),
            }
        )
    )
    budget = 150
    out = (
        token_budget_sample(c, budget=budget, group_col="lang", target_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force
    want = []
    run: dict = {}
    for i, (d, l, tx) in enumerate(zip(ids, langs, texts)):
        n = len(tx.split())
        cum = run.get(l, 0) + n
        run[l] = cum
        if cum <= budget:
            want.append((d, l, n, cum))
    got = list(zip(out.doc_id, out.grp, out.n_tokens, out.cum_tokens))
    assert got == want and len(want) > 3


def test_head_coverage_planted_gibberish():
    """Docs made of common words score 1.0; gibberish scores 0; the head
    set is derived from the corpus's own df table."""
    common = "alpha beta gamma delta"
    texts = [common] * 10 + ["zzq1 zzq2 zzq3", common + " zzq9"]
    c = _corpus(texts)
    out = (
        textstats.head_coverage(c, min_df=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out.common_frac[:10] == 1.0).all()
    assert out.common_frac[10] == 0.0
    assert out.common_frac[11] == 4.0 / 5.0


def test_bm25f_reduces_to_bm25_and_boost_reorders():
    """Property: one field at weight 1.0 == classic BM25 (same formula
    shape: tf/(norm) then tf̃/(k1+tf̃) equals the k1+1-free Robertson
    variant up to monotone transform — assert rank order equality against
    a python brute force).  A boosted title must outrank body-only hits."""
    import math
    from bitfunnel_ray.ops.bm25f import bm25f_topk

    texts = [
        "merge window merge sort",        # body hits, 2x merge
        "window filter scan",             # 1 hit
        "merge alpha beta gamma",         # 1 hit
        "nothing relevant here",          # 0
        "sort scan filter table",         # 0
    ]
    c = _corpus(texts)
    c = c.map_batches(
        lambda t: t.append_column("title", t["text"]), batch_format="pyarrow"
    )
    got = bm25f_topk(c, ["merge", "window"], fields=[("text", 1.0)], k=5).to_pandas()
    # brute force simple-BM25F, single field w=1
    n = len(texts)
    toks = [t.split() for t in texts]
    avgdl = sum(len(x) for x in toks) / n
    out = []
    for i, tk in enumerate(toks):
        s = 0.0
        for term in ("merge", "window"):
            tf = tk.count(term)
            if not tf:
                continue
            df = sum(term in x for x in toks)
            norm = 1 - 0.75 + 0.75 * (len(tk) / avgdl)
            tfh = tf / norm
            s += math.log((n - df + 0.5) / (df + 0.5) + 1.0) * (tfh / (1.2 + tfh))
        if s > 0:
            out.append((i, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    assert list(got.doc_id) == [d for d, _ in out]
    assert list(got.score) == [s for _, s in out]
    # title boost: doc 2's title hit at weight 10 outranks doc 0's body tf=2
    c2 = _corpus(["merge merge window body", "x y z merge"])
    c2 = c2.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "title": pa.array(["", "merge"]),
            }
        ),
        batch_size=None,
        batch_format="pyarrow",
    )
    boosted = bm25f_topk(
        c2, ["merge"], fields=[("text", 1.0), ("title", 50.0)], k=2
    ).to_pandas()
    assert list(boosted.doc_id) == [1, 0]


def test_group_zscore_and_split_assign_semantics():
    """z-scores standardize within group (mean 0, popvar 1); constant
    groups get 0; split assignment is deterministic and ~90/5/5."""
    from bitfunnel_ray.ops.grouped import group_zscore
    from bitfunnel_ray.stages import filters

    t = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "source": pa.array(["a", "a", "a", "a", "b", "b", "c", "c"]),
            "n_chars": pa.array([10, 20, 30, 40, 5, 15, 7, 7], pa.int64()),
        }
    )
    out = (
        group_zscore(rd.from_arrow(t), "source", "n_chars")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    za = out.zscore[:4].to_numpy()
    assert abs(za.mean()) < 1e-12 and abs((za**2).mean() - 1.0) < 1e-12
    assert (out.zscore[6:] == 0.0).all()  # constant group
    # splits: deterministic re-run, all named, roughly 90/5/5 at n=2000
    big = rd.from_arrow(pa.table({"doc_id": pa.array(range(2000), pa.int64())}))
    s1 = filters.split_assign(big).to_pandas().sort_values("doc_id")
    s2 = filters.split_assign(big).to_pandas().sort_values("doc_id")
    assert s1.split.tolist() == s2.split.tolist()
    frac = s1.split.value_counts(normalize=True)
    assert 0.85 < frac["train"] < 0.95 and frac.get("val", 0) > 0.02 and frac.get("test", 0) > 0.02


def test_bpe_regex_token_count_known_values():
    """Hand-counted BPE-ish pre-tokenizer matches: contractions split,
    punctuation runs group, digits separate from letters."""
    from bitfunnel_ray.ops.textstats import regex_token_count

    texts = [
        "it's done",        # "it" + "'s" + " done" = 3
        "hello, world!!",   # "hello" + "," + " world" + "!!" = 4
        "abc123",           # "abc" + "123" = 2
        "",                 # 0
    ]
    c = _corpus(texts)
    out = regex_token_count(c).to_pandas().sort_values("doc_id")
    assert out.n_bpe_tokens.tolist() == [3, 4, 2, 0]


def test_rrf_fusion_semantics():
    """RRF: a doc ranked top on both sides beats single-side docs; the
    driver query's fusion math matches hand computation."""
    # hand-build the fusion the same way q_hybrid_search does
    lex = [5, 1, 9]        # ranks 1..3
    dense = [5, 7]         # ranks 1..2
    rrf = {}
    for r, d in enumerate(lex, 1):
        rrf[d] = rrf.get(d, 0.0) + 1.0 / (60.0 + r)
    for r, d in enumerate(dense, 1):
        rrf[d] = rrf.get(d, 0.0) + 1.0 / (60.0 + r)
    best = max(rrf, key=lambda d: (rrf[d], -d))
    assert best == 5 and rrf[5] == 1.0 / 61.0 + 1.0 / 61.0
    assert rrf[1] == 1.0 / 62.0 and rrf[7] == 1.0 / 62.0


def test_hard_negatives_excludes_anchor_label():
    """Every mined negative has a different label than its anchor; and the
    nearest different-label vector wins rank 1 (planted geometry)."""
    rng = np.random.RandomState(3)
    base = rng.randn(8)
    vecs = [base + rng.randn(8) * eps for eps in (0.0, 0.01, 0.02, 0.5, 0.6, 0.7)]
    labels = [0, 0, 1, 1, 0, 1]  # vec 1 same label as anchor 0 → excluded
    t = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = (
        ann.hard_negatives(
            rd.from_arrow(t), np.asarray(vecs[0])[None, :], np.array([0]), k=3
        )
        .to_pandas()
        .sort_values("rank")
    )
    assert set(out.vec_id) <= {2, 3, 5}  # only label-1 vectors
    assert out.iloc[0].vec_id == 2  # the closest different-label vector


def test_pretrain_pipeline_planted_artifacts(tmp_path):
    """End-to-end cleaning: wrong-lang docs, high-repetition gibberish,
    too-short docs, exact dups, near dups, and PII are all handled; the
    per-stage report accounts for every drop and the written corpus is
    redacted."""
    import pyarrow.parquet as pq_
    from bitfunnel_ray.pipelines.pretrain import pretrain_pipeline
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    good = [" ".join(f"w{i}{j}" for j in range(30)) for i in range(8)]
    texts = (
        good
        + [good[0]]                                  # exact dup of doc 0
        + [good[1].replace("w129", "zz")]            # near dup of doc 1
        + ["a a a a a a a a a a a a"]                # repetition gibberish
        + ["too short"]                              # < min_tokens
        + [" ".join(f"v{j}" for j in range(20)) + " mail me at a@b.io ok"]  # PII
    )
    langs = ["en"] * len(texts)
    wrong = " ".join(f"x{j}" for j in range(25))
    texts.append(wrong)
    langs.append("zh")                               # lang-filtered
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    corpus = rd.from_arrow(_lift_documents_batch(t))
    out = str(tmp_path / "clean")
    rep = pretrain_pipeline(
        corpus,
        out,
        langs=("en",),
        min_tokens=12,
        max_dup_token_frac=0.5,
        jaccard_threshold=0.5,
        minhash_bands=32,
    )
    assert rep["docs_in"] == len(texts)
    # zh doc + gibberish + too-short dropped at clean
    assert rep["after_clean"] == rep["docs_in"] - 3
    # exact dup of doc 0 dropped
    assert rep["after_exact_dedup"] == rep["after_clean"] - 1
    # near dup of doc 1 dropped
    assert rep["after_near_dedup"] == rep["after_exact_dedup"] - 1
    got = pq_.read_table(out).to_pandas()
    assert len(got) == rep["written"] == rep["after_near_dedup"]
    joined = " ".join(got.text)
    assert "a@b.io" not in joined and "<EMAIL>" in joined
    assert set(got.split) <= {"train", "val", "test"}


def test_dedup_canonical_empty_pairs_passthrough():
    """No near-dup pairs → corpus passes through unchanged (regression:
    empty-Dataset select_columns keeps the stale schema and crashed the
    component rounds)."""
    from bitfunnel_ray.ops.cc import dedup_canonical
    from bitfunnel_ray.ops.dedup import _EMPTY_PAIRS

    c = _corpus(["alpha beta", "gamma delta"])
    out = dedup_canonical(c, _EMPTY_PAIRS)
    assert out.count() == 2


def test_multimodal_resize_and_frames():
    from bitfunnel_ray.ops.multimodal import (
        ResizeImages,
        SampleFrames,
        html_to_media,
        resize_images,
        sample_frames,
    )

    c = _corpus(["hello world", "foo bar baz"])
    media = html_to_media(c)
    resized = resize_images(media, target_w=8, target_h=4, backend="fake").to_pandas()
    assert len(resized) == 2
    assert all(len(p) == 8 * 4 for p in resized["payload"])
    assert set(resized["width"]) == {8} and set(resized["height"]) == {4}

    frames = sample_frames(media, n_frames=3, backend="fake").to_pandas()
    assert len(frames) == 2 * 3
    per = frames.groupby("media_id")["frame_idx"].apply(sorted).tolist()
    assert per == [[0, 1, 2], [0, 1, 2]]
    assert (frames["payload"].str.len() > 0).all()

    tbl = pa.table(
        {
            "media_id": pa.array([1], pa.uint64()),
            "media_type": pa.array(["image"]),
            "payload": pa.array([b"x"], pa.large_binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "duration_ms": pa.array([0], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError):
        ResizeImages(backend="stub")(tbl)
    with pytest.raises(NotImplementedError):
        SampleFrames(backend="stub")(tbl)


def test_significant_terms_vs_brute():
    """JLH significant terms vs a from-scratch python reference, including
    df semantics (term once per doc), the min_fg_df floor, the fg%>bg%
    cut, and (score desc, term) ordering."""
    import collections
    import math

    from bitfunnel_ray.ops.keywords import significant_terms

    texts = [
        "apple banana cherry",
        "apple apple banana",
        "banana cherry date",
        "apple cherry",
        "date elder fig",
        "apple banana elder",
        "",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    got = significant_terms(ds, fg_term="apple", min_fg_df=2, k=10)
    df = collections.Counter()
    fg_df = collections.Counter()
    fg_docs = [i for i, t in enumerate(texts) if "apple" in t.split()]
    for i, t in enumerate(texts):
        for w in set(t.split()):
            df[w] += 1
            if i in fg_docs:
                fg_df[w] += 1
    bg_n, fg_n = float(len(texts)), float(len(fg_docs))
    want = []
    for w, d in df.items():
        f = fg_df.get(w, 0)
        if f < 2:
            continue
        fgp, bgp = f / fg_n, d / bg_n
        if fgp <= bgp:
            continue
        want.append((w, f, d, (fgp - bgp) * (fgp / bgp)))
    want.sort(key=lambda r: (-r[3], r[0]))
    assert got["term"].to_pylist() == [w for w, *_ in want]
    assert got["fg_df"].to_pylist() == [f for _, f, _, _ in want]
    assert got["df"].to_pylist() == [d for _, _, d, _ in want]
    np.testing.assert_allclose(
        got["score"].to_numpy(), [s for *_, s in want], rtol=1e-12
    )


def test_multimodal_auto_backend_resolution(monkeypatch):
    """backend='auto' resolves to Pillow when importable (glue exercised
    via a minimal in-process PIL stand-in — no codec in this container)
    and raises a CLEAR ImportError when it is not."""
    import io
    import sys
    import types

    from bitfunnel_ray.ops import multimodal as mm

    # when Pillow is genuinely absent, auto must fail with the helpful
    # message (skip the assertion on boxes that have it installed)
    try:
        import PIL  # noqa: F401

        pil_installed = True
    except ImportError:
        pil_installed = False
    if not pil_installed:
        with pytest.raises(ImportError, match="pillow|fake"):
            mm.DecodeFeatures(backend="auto")

    # minimal PIL.Image stand-in: open() returns an object supporting
    # convert/resize/save — enough to drive the real pil code path
    class _Img:
        def __init__(self, data):
            self.data = data

        def convert(self, mode):
            return self

        def resize(self, wh):
            self.wh = wh
            return self

        def save(self, buf, format=None):
            buf.write(b"PNG" + bytes(self.data[:8]))

        def __array__(self, dtype=None):
            w, h = self.wh
            src = np.frombuffer((bytes(self.data) * ((w * h) // max(1, len(self.data)) + 1))[: w * h], np.uint8)
            return src.reshape(h, w).astype(dtype or np.uint8)

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = lambda b: _Img(b.getvalue() if isinstance(b, io.BytesIO) else b)
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.uint64()),
            "media_type": pa.array(["image", "image"]),
            "payload": pa.array([b"abcdefgh", b" zyxwvuts"], pa.large_binary()),
            "width": pa.array([8, 8], pa.int32()),
            "height": pa.array([1, 1], pa.int32()),
            "duration_ms": pa.array([0, 0], pa.int32()),
        }
    )
    dec = mm.DecodeFeatures(backend="auto", dim=4)
    assert dec.backend == "pil"
    out = dec(t)
    assert len(out) == 2 and len(out["features"][0]) == 4
    rs = mm.ResizeImages(target_w=4, target_h=4, backend="auto")
    assert rs.backend == "pil"
    rt = rs(t)
    assert rt["payload"][0].as_py().startswith(b"PNG")
    assert rt["width"].to_pylist() == [4, 4]
