"""Document deduplication operators — exact, n-gram Jaccard, MinHash-LSH,
SimHash. Training-data-pipeline extensions beyond the reference's CDC
surface.

Scale notes (100 TB design point):
  - exact dedup: one hash-groupBy shuffle on a 32-byte digest — optimal.
  - n-gram Jaccard: the exact-pair path is quadratic in documents sharing a
    shingle; it is the verification stage, run only on LSH candidates at
    scale (candidates() exposes that composition).
  - MinHash-LSH: shingle explode → per-doc signature (one shuffle) → band
    keys → self-join on (band, key) — the classic sub-quadratic near-dup
    join; band/row counts tune the similarity threshold s ≈ (1/b)^(1/r).
  - SimHash: one explode + one groupBy; hamming-adjacent buckets join.

Everything is md5-based so a SQL oracle (DuckDB) reproduces results
bit-for-bit; xxhash64 would be faster but is not portable to the oracle.
All hot paths are built-in column expressions (codegen), no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from airbyte_spark.operators.textops import fingerprint, normalize_text

HEX = "0123456789abcdef"

# Above this LSH candidate-pair count, the verify stage's joins are left
# to AQE's size-based strategy instead of forced broadcasts (mirrors
# lake/merge.py's BROADCAST_WINNER_MAX: a boilerplate-heavy corpus at
# 100× the tested scale produces a candidate set that would OOM the
# driver or exceed the broadcast limit if broadcast unconditionally).
BROADCAST_CAND_MAX = 2_000_000


def words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda x: x != "")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (possibly with duplicates). Docs with
    fewer than n words yield an EMPTY array — sequence(1, 0) would count
    DOWN and the out-of-range element_at aborts the job under ANSI mode,
    so the short-doc case is branched explicitly."""
    w = words(text)
    cnt = F.size(w) - (n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints — the rolling-hash fingerprint
    scheme of Schleimer/Wilkerson/Aiken (SIGMOD'03, the MOSS algorithm):
    hash every word k-gram, slide a window of w consecutive k-gram hashes
    over the document, keep the minimum hash of each window, and emit the
    distinct selected hashes as the document's fingerprint set.

    Guarantee (the reason winnowing beats naive every-Nth sampling): any
    shared token run of length >= w + k - 1 between two documents yields
    at least one SHARED fingerprint, while the expected density of
    retained hashes is only 2/(w+1) of all k-grams — so containment /
    partial-overlap detection works on ~1/3 of the data at w=5.

    Scale shape (100 TB): everything up to the final explode is pure
    column expressions fused into the document scan — the k-gram hash
    stream is never exploded, the windows are array slices, ZERO shuffles.
    Output is ~n_tokens·2/(w+1) (doc_id, fp) rows per doc; group the
    exploded output by fp for corpus-level overlap candidates (same
    sub-quadratic join shape as the LSH band join).

    md5 is the k-gram hash so the DuckDB oracle reproduces results
    bit-for-bit (hex strings compare lexicographically in both engines).
    """
    ws = words(F.col(text_col))
    m = F.size(ws) - (k - 1)  # number of k-grams
    kh = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(k)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the rolling-min HOF tree is interpreter-bound (higher-order functions
    # don't codegen) — spread the narrow source first so it parallelizes
    # instead of running on the 1-2 input splits of a small parquet file
    stage = _spread(df).select(F.col(id_col).alias("doc_id"), kh.alias("_kh"))
    nh = F.size(F.col("_kh"))
    # windows: len-w+1 full windows; 1 catch-all window when 1<=len<w
    nwin = F.when(nh >= 1, F.greatest(nh - (w - 1), F.lit(1))).otherwise(F.lit(0))
    sel = F.when(
        nwin >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(nwin, F.lit(1))),
            lambda j: F.array_min(F.slice(F.col("_kh"), j, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return stage.select(
        "doc_id", F.explode(F.array_sort(F.array_distinct(sel))).alias("fp")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int | None = 100,
) -> DataFrame:
    """Containment / partial-overlap candidate pairs: document pairs
    sharing >= min_shared winnowing fingerprints, with the shared count.

    Complements the Jaccard family: a small document quoted inside a much
    larger one has low Jaccard (set sizes differ wildly) but strong LOCAL
    overlap — exactly what winnowing's shared-run guarantee detects.

    Scale shape: self-join keyed on the fingerprint, cost ∝ Σ_fp bucket².
    Fingerprints are already sparse (~2/(w+1) of k-grams), and max_df
    drops boilerplate fingerprints that appear in more than max_df docs
    (navigation chrome, license headers) — the same hot-key guard as
    dropping stop-shingles. Pass max_df=None to disable.
    """
    # materialize the fingerprint set ONCE: it feeds the hot-fp aggregate,
    # the anti-join probe and BOTH sides of the self-join — uncached, the
    # (interpreter-bound HOF) rolling-min expression tree would re-evaluate
    # four times. At cluster scale this is the same "fingerprints are an
    # intermediate table" shape as the LSH composition above.
    fps = winnow_fingerprints(df, text_col, id_col, k, w).cache()
    if max_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("fp")
        )
        # no broadcast hint: the hot-fp set grows with corpus size, so let
        # AQE pick broadcast-vs-shuffle from its measured size at runtime
        fps = fps.join(hot, "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical normalized text.
    One shuffle on the md5 digest; at 100 TB the digest groupBy is the
    cheapest possible exact-dup key (no text comparison)."""
    fp = fingerprint(F.col(text_col))
    w = Window.partitionBy(fp).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("_fp", "fingerprint")
    )


def _spread(df: DataFrame) -> DataFrame:
    """Pre-spread the doc table across cores before a data-amplifying
    explode: a narrow source (one parquet file → 1-2 input partitions)
    would otherwise run the whole explode single-threaded and hand the
    first shuffle a few giant map tasks. Repartitioning the small side
    BEFORE amplification is the cheap direction."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df


def _raw_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs WITH duplicates — no shuffle, explode only."""
    return _spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("s")
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs."""
    return _raw_shingles(df, text_col, id_col, n).distinct()


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Returns (a_id, b_id, jaccard) with a_id < b_id, jaccard ≥ threshold.
    The shared-shingle self-join is the quadratic exact path — at scale,
    feed it LSH candidates instead of the full corpus (see lsh_pairs).
    """
    d = doc_shingles(df, text_col, id_col, n).cache()
    sizes = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = d.alias("a"), d.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    # per-doc size tables grow with the corpus (one row per doc) — left
    # un-hinted so AQE broadcasts them only while they measure small, the
    # same policy as every other data-dependent side in this package
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: component i = min(md5('<i>:'||shingle)).

    md5-as-permutation is deterministic and oracle-portable; the min is a
    partial aggregate (map-side combine), so the only shuffle is the
    groupBy(doc_id) with num_hashes tiny min-accumulators. shingle_df
    overrides the shingle source (duplicates are fine — min is unchanged —
    so callers can feed the cheaper non-distinct explode).
    """
    d = shingle_df if shingle_df is not None else doc_shingles(df, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return d.groupBy("doc_id").agg(*aggs)


def lsh_band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, key) LSH bucket memberships — the probe/index unit
    shared by the banded self-join (lsh_pairs) and the incremental
    near-dup registry (dedup_incremental.ingest_near_dedup)."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, shingle_df)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{bi * rows + j}") for j in range(rows)])).alias(
                "key"
            ),
        )
        for bi in range(bands)
    ]
    return sig.select(
        F.col("doc_id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def band_collision_pairs(
    keys: DataFrame,
    id_col: str = "doc_id",
    carry: "tuple[str, ...]" = (),
) -> DataFrame:
    """Self-join rows sharing an LSH bucket: input (id, band, key [, carry…]),
    output (a_id, b_id [, a_<c>, b_<c>…]) with a_id < b_id — NOT distinct
    (a pair appears once per colliding band; callers dedupe after their
    filters). The one banded-join implementation shared by lsh_pairs,
    srp_near_dups, and the incremental registries."""
    a, b = keys.alias("a"), keys.alias("b")
    sel = [F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")]
    for c in carry:
        sel += [F.col(f"a.{c}").alias(f"a_{c}"), F.col(f"b.{c}").alias(f"b_{c}")]
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(*sel)


def lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs agreeing on ALL rows of ≥1 band.

    rows-per-band r = num_hashes/bands; collision threshold ≈ (1/b)^(1/r).
    Defaults (8 hashes, 4 bands of 2) target jaccard ≳ 0.5. Returns
    distinct (a_id, b_id), a_id < b_id. The band self-join is the scale
    path: cost ∝ Σ bucket², not corpus².
    """
    exploded = lsh_band_keys(df, text_col, id_col, n, num_hashes, bands, shingle_df)
    return band_collision_pairs(exploded).distinct()


def lsh_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Scale-true near-dup pairs: LSH candidate generation → exact Jaccard
    verification restricted to the candidates (the composition the banded
    index exists for). Returns (a_id, b_id, jaccard ≥ threshold).

    Cost shape: the banded self-join is ∝ Σ bucket² (sub-quadratic), and the
    verify joins touch |candidates| × shingles-per-doc rows — never the
    all-pairs shared-shingle blowup of jaccard_pairs, which at 100 TB is
    quadratic in docs sharing any hot shingle. Recall relative to the exact
    form is the LSH collision probability (≈ 1-(1-s^r)^b); raise num_hashes/
    bands to tighten. jaccard_pairs stays as the small-scale oracle.
    """
    # the raw (non-distinct) shingle explode feeds candidate generation AND
    # the verify side — cache it (lazily: the first pass that executes the
    # minhash chain populates it, the verify reuses it; at 100 TB this is
    # the "write the shingle table to the lake once per corpus snapshot"
    # step). MinHash tolerates duplicate shingles (min is unchanged) and
    # the verify's collect_set dedups, so the distinct's extra shuffle is
    # skipped entirely.
    d = _raw_shingles(df, text_col, id_col, n).cache()
    # candidate pairs are TINY (the whole point of LSH) but their lineage
    # is the full minhash chain — cache them so the broadcast below (which
    # runs first and populates both caches in one pass) is the only
    # execution of that chain
    cand = lsh_pairs(df, text_col, id_col, n, num_hashes, bands, shingle_df=d).cache()
    # verify only touches documents that appear in some candidate pair —
    # semi-join the shingle table down to them, fold each surviving doc's
    # shingles into one set row, and score pairs with a single join +
    # array_intersect (near-dup candidates are usually a vanishing fraction
    # of a deduped corpus, so the per-doc sets are small and few; this
    # avoids a second exploded pair-count shuffle entirely).
    #
    # The broadcasts are GATED on the measured candidate count (mirroring
    # merge.py's BROADCAST_WINNER_MAX): on a boilerplate-heavy corpus at
    # 100× scale the candidate set is NOT vanishing, and a forced broadcast
    # of the shingle-set sides would OOM the driver or trip the 8 GB
    # broadcast limit. Past the gate the joins are left to AQE's size-based
    # strategy. cand is cached, so this count is the single execution of
    # the minhash chain and the verify below reuses the materialized cache.
    n_cand = cand.count()
    gate = n_cand <= BROADCAST_CAND_MAX

    def _maybe_b(side: DataFrame) -> DataFrame:
        return F.broadcast(side) if gate else side

    cand_ids = (
        cand.select(F.col("a_id").alias("doc_id"))
        .union(cand.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    # cached: both verify sides below read it, and without the cache the
    # second side would re-run the semi-join + collect_set (sa/sb are
    # alias-renamed plans, so exchange reuse does not apply)
    sets = (
        d.join(_maybe_b(cand_ids), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("sh"))
    ).cache()
    sa = sets.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sha"))
    sb = sets.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("shb"))
    return (
        cand.join(_maybe_b(sa), "a_id")
        .join(_maybe_b(sb), "b_id")
        .withColumn("common", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.size("sha") + F.size("shb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _nibble(hexstr: Column, pos: int) -> Column:
    """Value 0-15 of hex digit at 1-based pos (portable: instr/strpos)."""
    return F.instr(F.lit(HEX), F.substring(hexstr, pos, 1)) - 1


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash over words: bit j of md5(word) votes ±1; the sign of
    the summed vote sets bit j of the fingerprint. 32 bits = first 8 hex
    chars of the md5. One explode + one groupBy(doc_id) with `bits` sum
    accumulators (all map-side combinable).

    Near-dup docs differ in few bits (compare via popcount(xor)).
    """
    w = _spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(words(F.col(text_col))).alias("w")
    ).withColumn("h", F.md5(F.col("w")))
    votes = []
    for j in range(bits):
        nib = _nibble(F.col("h"), j // 4 + 1)
        bit = F.floor(nib / (2 ** (j % 4))) % 2
        votes.append(F.sum(bit * 2 - 1).alias(f"v{j}"))
    agg = w.groupBy("doc_id").agg(*votes)
    sh = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        sh = term if sh is None else sh + term
    return agg.select("doc_id", sh.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via hamming-adjacent band buckets: the
    fingerprint is split into `bands` equal bit-slices; by pigeonhole, any
    pair within hamming distance < bands agrees exactly on ≥1 slice, so the
    banded self-join has RECALL 1.0 for max_hamming ≤ bands-1 while costing
    ∝ Σ bucket² instead of corpus². Survivors are verified with
    popcount(xor) ≤ max_hamming. Returns (a_id, b_id, hamming).
    """
    assert max_hamming < bands, "pigeonhole recall guarantee needs max_hamming < bands"
    sh = simhash(df, text_col, id_col, bits)
    return hamming_banded_pairs(
        sh, fp_col="simhash", id_col="doc_id", bits=bits, bands=bands,
        max_hamming=max_hamming,
    )


def hamming_banded_pairs(
    fps: DataFrame,
    fp_col: str = "fp",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs over ANY integer fingerprint column (SimHash, image
    pHash, ...) via hamming-adjacent band buckets — the generalized core of
    simhash_pairs: split the fingerprint into `bands` equal bit-slices; by
    pigeonhole any pair within hamming < bands agrees on ≥1 slice, so the
    banded self-join has RECALL 1.0 for max_hamming ≤ bands-1 at Σ bucket²
    cost. Survivors verify with popcount(xor). Returns (a_id, b_id,
    hamming), a_id < b_id."""
    assert max_hamming < bands, "pigeonhole recall guarantee needs max_hamming < bands"
    width = bits // bands
    mask = (1 << width) - 1
    sh = fps.select(F.col(id_col).alias("doc_id"), F.col(fp_col).alias("_fp")).filter(
        F.col("_fp").isNotNull()
    )
    slices = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(F.col("_fp"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for bi in range(bands)
        ]
    )
    exploded = sh.select("doc_id", "_fp", F.explode(slices).alias("bk")).select(
        "doc_id", "_fp", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    return (
        band_collision_pairs(exploded, carry=("_fp",))
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("a__fp").bitwiseXOR(F.col("b__fp"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Connected-component cluster assignment over near-dup candidate
    pairs (default: MinHash-LSH) — the terminal dedup operator: every doc
    gets cluster_id = min doc_id reachable through the candidate graph,
    and keep = (doc_id == cluster_id) marks the canonical survivor. Docs
    with no near-dup are singleton clusters of themselves.

    Iterative min-label propagation (the join-based connected components
    of Pregel/GraphFrames): each round a node takes the min of its own
    label and its neighbors' labels; rounds to fixpoint = component
    diameter. Near-dup graphs are overwhelmingly tiny cliques (diameter
    1-2), so convergence is 2-3 rounds in practice. Each round costs two
    shuffles (edge⋈label on v, then min-groupBy on u) over the EDGE list
    only — labels for untouched docs never reshuffle — and the round's
    result is localCheckpoint()ed so lineage (and replanning cost) stays
    O(1) in the iteration count rather than O(rounds). At 100 TB swap the
    localCheckpoint for a reliable checkpoint dir; the loop itself is the
    standard scale shape.

    ONE job per round: the convergence probe is the materializing action —
    a full count_if aggregate over the lazily-marked checkpoint scans every
    partition, so it both persists the round's labels and returns the
    changed count (no separate checkpoint job + probe job).
    """
    if pairs is None:
        pairs = lsh_pairs(df, text_col, id_col)
    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .unionAll(pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
        .localCheckpoint(eager=True)  # LSH banding runs once, not per round
    )
    labels = df.select(
        F.col(id_col).alias("doc_id"), F.col(id_col).alias("cluster_id")
    )
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges["v"] == labels["doc_id"])
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, labels["doc_id"] == nbr["u"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
                (F.col("nbr_min") < F.col("cluster_id")).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        # materialize + probe in one action (NULL _changed = no neighbor,
        # not counted)
        changed = stepped.agg(F.count_if(F.col("_changed")).alias("n")).first()["n"]
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    return labels.withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
