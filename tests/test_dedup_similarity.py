"""Invariant tests for document dedup (exact / jaccard / MinHash-LSH /
SimHash) and embedding similarity search (brute-force + IVF recall)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from airbyte_spark.operators.dedup_text import (
    exact_dedup,
    jaccard_pairs,
    lsh_jaccard_pairs,
    lsh_pairs,
    simhash,
    simhash_pairs,
)
from airbyte_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dups,
    embedding_near_dups_bucketed,
    ivf_topk,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "Same  text!"), (1, "same text"), (2, "other")],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in exact_dedup(df).collect()}
    assert kept == {1, 2}  # normalized dup of 1 and 3 → min id 1 survives


def test_lsh_recalls_high_jaccard_pairs(docs):
    """Every pair with jaccard ≥ 0.9 must be an LSH candidate (8 hashes /
    4 bands of 2 → collision prob 1-(1-s²)⁴ ≈ 0.9996 at s=0.9; the planted
    near-dups in the fixture are ~0.99)."""
    exact = {(r["a_id"], r["b_id"]) for r in jaccard_pairs(docs, threshold=0.9).collect()}
    cand = {(r["a_id"], r["b_id"]) for r in lsh_pairs(docs).collect()}
    assert exact, "fixture should contain near-duplicate documents"
    missed = exact - cand
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_near_dups_close_in_hamming(spark, docs):
    pairs = jaccard_pairs(docs, threshold=0.9).collect()
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert all(0 <= v < 2**32 for v in sh.values())

    def ham(a, b):
        return bin(a ^ b).count("1")

    near = [ham(sh[p["a_id"]], sh[p["b_id"]]) for p in pairs]
    assert near and max(near) <= 6
    # random non-dup pairs should be clearly farther on average
    ids = sorted(sh)
    near_set = {(p["a_id"], p["b_id"]) for p in pairs}
    far = [
        ham(sh[ids[i]], sh[ids[i + 250]])
        for i in range(100)
        if (ids[i], ids[i + 250]) not in near_set
    ]
    assert sum(far) / len(far) > 2 * (sum(near) / len(near) + 1)


def test_lsh_jaccard_composition_subset_and_recall(docs):
    """The scale path (LSH candidates → exact verify) must (a) be a subset
    of the exact all-pairs result — every reported jaccard is exact — and
    (b) recall all high-similarity pairs (collision prob ≈ 1 at s ≥ 0.9)."""
    exact = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    composed = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in lsh_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert composed, "composition found no pairs"
    for pair, j in composed.items():
        assert pair in exact and abs(exact[pair] - j) < 1e-12
    high = {p for p, j in exact.items() if j >= 0.9}
    assert high <= set(composed), f"missed high-sim pairs: {high - set(composed)}"


def test_simhash_pairs_recall_within_hamming(docs):
    """Banded simhash join: any pair within hamming ≤ bands-1 of the full
    fingerprint set must be found (pigeonhole), with exact hamming values."""
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in simhash_pairs(docs).collect()}
    assert got == want and want, f"simhash_pairs mismatch: {len(got)} vs {len(want)}"


def test_bucketed_near_dups_subset_with_high_recall(spark, sf_dir):
    """Same-IVF-cell near-dup pairs: subset of exact all-pairs, and at a
    strict threshold near-identical vectors land in the same cell."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact_rows = embedding_near_dups(emb, threshold=0.4).collect()
    exact = {(r["a_id"], r["b_id"]) for r in exact_rows}
    bucketed = {
        (r["a_id"], r["b_id"])
        for r in embedding_near_dups_bucketed(emb, threshold=0.4, num_centroids=16).collect()
    }
    assert bucketed <= exact
    assert exact, "fixture should contain near-dup embeddings at 0.4"
    # the fixture plants NO near-identical vectors (max pairwise cos ≈ 0.48
    # at sf0.001), so pairs at the 0.4 threshold are moderately similar and
    # legitimately cross cells; the operator's recall contract is for
    # near-identical pairs (cos → 1 ⇒ same nearest centroid). Here we pin
    # the subset property plus non-degenerate cell co-location.
    assert bucketed, "cell restriction found no pairs at all"
    recall = len(bucketed) / len(exact)
    assert recall >= 0.15, f"same-cell recall collapsed: {recall}"


def test_cosine_topk_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = cosine_topk(emb.filter(F.col("vec_id") < 3), emb, k=5).collect()

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for q in range(3):
        sims = Vn @ Vn[q]
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != q),
            key=lambda i: (-sims[i], ids[i]),
        )[:5]
        want = [ids[i] for i in order]
        mine = [r["n_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["q_id"] == q]
        assert mine == want


def test_kmeans_centroids_reduce_inertia_and_search(spark, sf_dir):
    """Lloyd iterations must reduce mean (1-cos) to the nearest centroid
    versus the naive lowest-id seeding, and ivf_topk over k-means cells
    keeps useful recall vs brute force."""
    from airbyte_spark.operators.similarity import kmeans_centroids, kmeans_inertia

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seed = kmeans_centroids(emb, k=8, iters=0)  # = lowest-id seeding
    trained = kmeans_centroids(emb, k=8, iters=2)
    i0, i2 = kmeans_inertia(emb, seed), kmeans_inertia(emb, trained)
    assert i2 < i0, f"k-means did not improve inertia: {i0} -> {i2}"

    q = emb.filter(F.col("vec_id") < 3)
    brute = {(r["q_id"], r["n_id"]) for r in cosine_topk(q, emb, k=5).collect()}
    approx = {
        (r["q_id"], r["n_id"])
        for r in ivf_topk(q, emb, k=5, nprobe=4, centroids=trained).collect()
    }
    assert len(brute & approx) / len(brute) >= 0.5


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    brute = {(r["q_id"], r["n_id"]) for r in cosine_topk(q, emb, k=10).collect()}
    approx = {
        (r["q_id"], r["n_id"])
        for r in ivf_topk(q, emb, k=10, num_centroids=16, nprobe=8).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_near_dup_clusters_connected_components(spark):
    """Min-label propagation must match union-find on an explicit pair
    graph: a 4-node chain (needs >1 round to converge), a 2-clique, and
    singletons; canonical = min id per component."""
    from airbyte_spark.operators.dedup_text import near_dup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 9)], "doc_id long, text string"
    )
    # chain 1-2-3-4 (min label must hop 3 edges), clique {5,6}, singletons 7,8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "a_id long, b_id long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in near_dup_clusters(docs, pairs=pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        5: (5, True), 6: (5, False), 7: (7, True), 8: (8, True),
    }


def test_near_dup_clusters_lsh_default_covers_all_docs(docs):
    """With the default LSH pair source every doc gets exactly one row,
    cluster_id ≤ doc_id, and each cluster's canonical is its min member."""
    from airbyte_spark.operators.dedup_text import near_dup_clusters

    out = near_dup_clusters(docs).cache()
    n_docs = docs.count()
    assert out.count() == n_docs
    assert out.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0
    per_cluster = out.groupBy("cluster_id").agg(
        F.min("doc_id").alias("min_id"), F.sum(F.col("keep").cast("int")).alias("n_keep")
    )
    bad = per_cluster.filter(
        (F.col("min_id") != F.col("cluster_id")) | (F.col("n_keep") != 1)
    ).count()
    assert bad == 0


def test_srp_near_dups_subset_recall_and_exactness(spark, sf_dir):
    """SRP-LSH pairs: subset of exact all-pairs; near-identical vectors
    share almost all sketch bits (recall → 1 as cos → 1); deterministic
    across invocations (md5-derived hyperplanes, no RNG state)."""
    import pyspark.sql.functions as FF

    from airbyte_spark.operators.similarity import srp_near_dups, srp_signature

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["a_id"], r["b_id"])
        for r in embedding_near_dups(emb, threshold=0.4).collect()
    }
    srp = {
        (r["a_id"], r["b_id"])
        for r in srp_near_dups(emb, threshold=0.4, bits=60, bands=10).collect()
    }
    assert srp <= exact
    assert srp, "banded sketch found no pairs at all"
    # fixture pairs are only moderately similar (cos ≈ 0.4-0.5) — at that
    # angle the collision model predicts ~0.5 recall with 10 bands of 6
    # bits; pin a conservative floor
    assert len(srp) / len(exact) >= 0.25

    # near-identical vectors: v and v + tiny noise must collide and verify
    base = emb.limit(1).select("embedding").first()[0]
    close = [x + (0.001 if i % 2 == 0 else -0.001) for i, x in enumerate(base)]
    tiny = spark.createDataFrame(
        [(1, [float(x) for x in base]), (2, [float(x) for x in close])],
        "vec_id long, embedding array<float>",
    )
    got = srp_near_dups(tiny, threshold=0.95, bits=60, bands=10).collect()
    assert [(r["a_id"], r["b_id"]) for r in got] == [(1, 2)]

    # determinism: same sketch bits on every invocation
    s1 = {r["vec_id"]: r["sig"] for r in srp_signature(emb, 64, bits=30).collect()}
    s2 = {r["vec_id"]: r["sig"] for r in srp_signature(emb, 64, bits=30).collect()}
    assert s1 == s2


def test_kmeans_cells_gated_query_partitions_corpus(spark):
    """The emb_kmeans_cells gated query assigns EVERY vector to exactly one
    trained cell, cells are non-degenerate (no single giant cell), and the
    assignment is replay-stable (deterministic seeding + tie-breaks)."""
    import __spark_entry__ as E

    q = E.queries()["emb_kmeans_cells"]
    rows = q(spark, "/root/testdata/sf0.001").collect()
    n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    sizes = {}
    for r in rows:
        sizes[r["cell"]] = sizes.get(r["cell"], 0) + 1
    assert len(sizes) >= 4, f"degenerate clustering: {sizes}"
    assert max(sizes.values()) < n, "all vectors in one cell"
    again = {(r["vec_id"], r["cell"]) for r in q(spark, "/root/testdata/sf0.001").collect()}
    assert again == {(r["vec_id"], r["cell"]) for r in rows}


# --- product quantization ---------------------------------------------------


def _np_pq(emb, m=8, ksub=16):
    """Numpy reference: deterministic codebook (lowest-id subvectors),
    nearest-by-L2 encode, ADC distance tables."""
    import numpy as np

    X = np.array([e for _, e in emb], dtype=np.float64)
    ids = np.array([i for i, _ in emb])
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    dsub = X.shape[1] // m
    cb = X[ids < ksub]  # rows are c_id order
    codes = {}
    for vid, x in zip(ids, X):
        cs = []
        for s in range(m):
            sub = x[s * dsub:(s + 1) * dsub]
            d = ((cb[:, s * dsub:(s + 1) * dsub] - sub) ** 2).sum(axis=1)
            cs.append(int(d.argmin()))  # argmin ties → lowest index, same rule
        codes[int(vid)] = cs
    return X, ids, cb, codes, dsub


def test_pq_encode_matches_numpy(spark, sf_dir):
    from airbyte_spark.operators.similarity import pq_codebook, pq_encode

    emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = [(r["vec_id"], r["embedding"]) for r in emb_df.collect()]
    _, _, _, want, _ = _np_pq(emb)
    cb = pq_codebook(emb_df, m=8, ksub=16)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb_df, cb, m=8).collect()}
    assert got == want


def test_pq_topk_matches_numpy_adc(spark, sf_dir):
    import numpy as np

    from airbyte_spark.operators.similarity import pq_codebook, pq_encode, pq_topk

    emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = [(r["vec_id"], r["embedding"]) for r in emb_df.collect()]
    X, ids, cb, codes, dsub = _np_pq(emb)
    m = 8
    want = {}
    for q in range(5):
        qx = X[ids == q][0]
        dt = np.array([
            ((cb[:, s * dsub:(s + 1) * dsub] - qx[s * dsub:(s + 1) * dsub]) ** 2).sum(axis=1)
            for s in range(m)
        ])
        scored = sorted(
            (sum(dt[s][codes[int(v)][s]] for s in range(m)), int(v))
            for v in ids if v != q
        )
        want[q] = [v for _, v in scored[:10]]
    cbd = pq_codebook(emb_df, m=8, ksub=16)
    enc = pq_encode(emb_df, cbd, m=8)
    out = pq_topk(emb_df.filter(F.col("vec_id") < 5), enc, cbd, k=10, m=8)
    got = {}
    for r in out.orderBy("q_id", "rank").collect():
        got.setdefault(r["q_id"], []).append(r["n_id"])
    assert got == want


def test_pq_train_reduces_quantization_error(spark, sf_dir):
    """Lloyd per subspace must not increase reconstruction error on the
    training set (k-means monotonicity); with random data it strictly
    improves. Error = mean ADC distance of each vector to ITSELF (its
    reconstruction), computable by scoring the corpus as its own queries."""
    from airbyte_spark.operators.similarity import (
        pq_codebook, pq_encode, pq_train, pq_topk,
    )

    emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )

    # direct computation: join codes back to centroids and sum residuals
    import pyspark.sql.functions as SF

    def qerr(cb):
        enc = pq_encode(emb_df, cb, m=8)
        wcb = Window.partitionBy("sub").orderBy(SF.col("c_id").asc())
        cbi = cb.withColumn("code_idx", SF.row_number().over(wcb) - 1)
        v = emb_df.select(
            "vec_id",
            SF.posexplode(
                SF.array(*[
                    SF.transform(
                        SF.slice("embedding", s * 8 + 1, 8), lambda x: x.cast("double")
                    )
                    for s in range(8)
                ])
            ).alias("sub", "v_vec"),
        )
        enc_long = enc.select(
            "vec_id", SF.posexplode("codes").alias("sub", "code_idx")
        )
        joined = (
            v.join(enc_long, ["vec_id", "sub"])
            .join(SF.broadcast(cbi), ["sub", "code_idx"])
            .select(
                SF.aggregate(
                    SF.zip_with("v_vec", "c_vec", lambda a, b: (a - b) * (a - b)),
                    SF.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("e")
            )
        )
        return joined.agg(SF.avg("e")).collect()[0][0]

    base = qerr(pq_codebook(emb_df, m=8, ksub=16))
    trained = qerr(pq_train(emb_df, m=8, ksub=16, iters=2))
    assert trained <= base + 1e-9
    assert trained < base  # strict improvement on random data


def test_lsh_jaccard_broadcast_gate_fallback(docs, monkeypatch):
    """Forcing candidate-count overflow must drop the verify-stage
    broadcast HINTS (falling back to AQE's size-based join choice) while
    producing identical pairs. Guards the 100×-scale failure mode: an
    unconditional broadcast of the shingle-set sides on a boilerplate-heavy
    corpus would OOM the driver or trip the broadcast size limit."""
    from airbyte_spark.operators import dedup_text as DT

    sample = docs.limit(200)
    gated = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 6))
        for r in DT.lsh_jaccard_pairs(sample, threshold=0.5).collect()
    }
    monkeypatch.setattr(DT, "BROADCAST_CAND_MAX", 0)
    df = DT.lsh_jaccard_pairs(sample, threshold=0.5)
    # no user-forced broadcast hint anywhere in the logical plan (AQE may
    # still CHOOSE broadcast at runtime from real sizes — that is the point)
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "strategy=broadcast" not in plan
    fallback = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 6)) for r in df.collect()
    }
    assert fallback == gated and gated, "fallback plan must match gated results"
