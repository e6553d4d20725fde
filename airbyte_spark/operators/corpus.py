"""Corpus-preparation operators for a training-data pipeline.

Beyond the reference's CDC surface: the whole-corpus operations a web-text
ingest runs after per-document curation (operators/curate.py) and before
tokenizer/training shard export —

  segment_dedup   line-level exact dedup across the corpus (CCNet/RefinedWeb
                  style: duplicated boilerplate lines are removed everywhere
                  but their first occurrence, and documents are reassembled).
  decontaminate   benchmark n-gram decontamination: flag training documents
                  that share any word n-gram with a (small) held-out eval
                  set, the standard train/test-leak guard.
  train_split     deterministic hash split into train/val/test — stable
                  under reordering, resharding and replay (pure function of
                  the document id, no RNG state).

All three are compositions of built-in column expressions + one or two
key-partitioned shuffles — no Python in the hot path, no driver loops, no
collect. Scale notes per function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _segments_expr(text_col: str, words_per_segment: int) -> F.Column:
    """Array of fixed-width word windows ("lines") of `text`, in order.

    The test corpus has no newlines, so the segmentation unit is a
    fixed-width word window; for real web text pass the array produced by
    ``F.split(text, '\\n')`` to the same downstream logic instead.
    """
    words = F.split(F.col(text_col), " ")
    n_seg = F.ceil(F.size(words) / F.lit(words_per_segment)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(words, i * words_per_segment + 1, words_per_segment), " "
        ),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_segment: int = 10,
) -> DataFrame:
    """Corpus-wide line-level exact dedup (first occurrence wins).

    Every document is segmented; a segment survives only in the document
    where it first occurs (ordered by (id, position) — deterministic under
    any input partitioning); documents are reassembled from their surviving
    segments in original order. Output: one row per input document with
    `dedup_text` ('' when nothing survives), `n_segments`, `n_kept`.

    Scale shape (100 TB): segment explode is a map-side transform fused
    into the scan; the keep-first rule is ONE shuffle partitioned by the
    segment hash (a 32-byte digest — uniform, no hot keys even when one
    boilerplate line dominates, because equal lines land on one key but
    row_number over a sorted partition is O(n log n) in that key only —
    for truly degenerate boilerplate pre-aggregate min(id,pos) per hash
    instead, which is what the window reduces to); reassembly is one
    shuffle partitioned by doc id. No driver-side state.
    """
    segs = (
        df.select(
            F.col(id_col),
            F.posexplode(_segments_expr(text_col, words_per_segment)).alias(
                "seg_idx", "seg"
            ),
        )
        .withColumn("seg_hash", F.md5(F.col("seg")))
    )
    # keep-first: min (id, seg_idx) per hash via one aggregate (no wide
    # window sort over duplicate-heavy keys), then mark survivors.
    firsts = segs.groupBy("seg_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("first")
    )
    marked = segs.join(firsts, "seg_hash").withColumn(
        "kept",
        (F.col("first")[id_col] == F.col(id_col))
        & (F.col("first.seg_idx") == F.col("seg_idx")),
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(F.struct("seg_idx", "seg", "kept"))
                        ),
                        lambda s: s["kept"],
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("dedup_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        )
    )


def _ngrams_expr(text_col: str, n: int) -> F.Column:
    """Array of word n-grams of `text` (empty when fewer than n words)."""
    words = F.split(F.col(text_col), " ")
    cnt = F.size(words) - F.lit(n - 1)
    # sequence(1, 0) DESCENDS in Spark — guard short docs with an empty array
    return F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct word n-grams appear anywhere in the eval set, and a
    `contaminated` flag (any hit → drop/flag before training).

    Scale shape: the eval n-gram set is small by construction (benchmarks
    are MBs, the corpus is TBs) — distinct it and let AQE broadcast it;
    the train side streams through a map stage + one semi-join-shaped
    aggregation keyed by n-gram hash. Left join back preserves documents
    with zero hits. At 100 TB the only shuffle larger than the eval set is
    the per-doc hit count, keyed on doc id.
    """
    ev = (
        eval_set.select(
            F.explode(_ngrams_expr(text_col, n)).alias("ng")
        ).distinct()
    )
    tr = train.select(
        F.col(id_col), F.explode(_ngrams_expr(text_col, n)).alias("ng")
    ).distinct()
    # the broadcast hint is safe here BY CONSTRUCTION (eval sets are MBs,
    # not TBs) — unlike a data-dependent winner set, its size doesn't grow
    # with the corpus, so we don't defer to AQE's runtime estimate.
    hits = (
        tr.join(F.broadcast(ev), "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_eval_ngram_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_eval_ngram_hits", F.lit(0).cast("bigint")).alias(
                "n_eval_ngram_hits"
            ),
            (F.coalesce("n_eval_ngram_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def train_split(
    df: DataFrame,
    id_col: str = "doc_id",
    boundaries: tuple[str, str] = ("cc", "e6"),
    names: tuple[str, str, str] = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic train/val/test assignment by md5(id) hex range.

    The first two hex chars of md5(id) are uniform over '00'..'ff'; split
    at lexicographic boundaries ('cc' ≈ 79.7 %, 'e6' ≈ 89.8 %). A pure
    per-row expression — stable under resharding/replay, zero shuffles,
    and portable (identical semantics in any engine with md5).
    """
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return df.withColumn(
        "split",
        F.when(h < boundaries[0], names[0])
        .when(h < boundaries[1], names[1])
        .otherwise(names[2]),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Greedy concat-then-chunk sequence packing for training-shard export.

    Documents are deterministically sharded (md5 of the id — replay- and
    reshard-stable, no RNG), ordered by id within a shard, and laid out
    back-to-back on a token tape; sequence k of a shard is tape range
    [k*max_tokens, (k+1)*max_tokens). Each document is assigned to the
    sequence where it STARTS (`seq_id`) with its tape `offset`, the
    concat-then-chunk convention used by packed-pretraining loaders (a doc
    may run past the boundary into the next sequence; the loader splits at
    read time from (offset, n_tokens)).

    Scale shape (100 TB): token counting is a vectorized regex fused into
    the scan; the only shuffle is ONE hash partition by `shard` for the
    cumulative-sum window — shard count bounds per-task sort size, so set
    n_shards ≈ cluster cores at scale (packing quality is unaffected;
    each shard is an independent tape). No Python, no collect.
    """
    from airbyte_spark.operators.textops import token_count

    # ascii of one md5 hex char % n_shards: portable to any engine
    shard = (
        F.ascii(F.substring(F.md5(F.col(id_col).cast("string")), 1, 1))
        % F.lit(n_shards)
    ).alias("shard")
    t = df.select(
        F.col(id_col),
        shard,
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum_before / F.lit(max_tokens)).alias("seq_id"),
        (cum_before % F.lit(max_tokens)).alias("offset"),
    )


def quota_by_group(
    df: DataFrame,
    group_col: str = "lang",
    quota: int = 100,
    order_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact top-`quota` rows per group (corpus language/domain balancing).

    Keeps the `quota` best rows of each group under the total order
    (order_col DESC, id ASC) — the standard per-language/per-domain cap a
    corpus mix applies before training.

    Scale shape (100 TB): a plain window rank sorts each ENTIRE group in
    one task (a hot language = one straggler). Instead: a salted local
    top-k first — rank within (group, input partition) and keep ≤ quota
    per slice, which is exact (every global top-quota row is in its
    slice's top-quota) — then the true rank over the ≤ quota×n_slices
    survivors. The heavy first pass parallelizes across slices; only the
    small survivor set pays the per-group sort.
    """
    order = [F.col(order_col).desc(), F.col(id_col).asc()]
    local = Window.partitionBy(group_col, "_slice").orderBy(*order)
    pruned = (
        df.withColumn("_slice", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= quota)
        .drop("_slice", "_lrn")
    )
    final = Window.partitionBy(group_col).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= quota)
        .withColumn("rank", F.col("rank").cast("bigint"))
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    words_per_segment: int = 10,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Per-site boilerplate removal (the web-text cleaning step CCNet /
    RefinedWeb run after extraction: nav bars, cookie banners and footers
    repeat on most pages OF ONE SITE, so global dedup either misses them
    or nukes legitimate cross-site quotes).

    A segment is boilerplate when it appears in more than `max_df_ratio`
    of its group's documents (document frequency within the group — a page
    repeating its own footer counts once). Boilerplate segments are
    stripped from every document of that group; documents are reassembled
    from the survivors in original order. Output: one row per input doc
    with `clean_text` ('' when everything was boilerplate), `n_segments`,
    `n_kept`.

    Scale shape (100 TB): segmentation is a map-side transform fused into
    the scan; the df-count is ONE aggregate keyed on (group, seg_hash)
    with count_distinct collapsed map-side (a 32-byte digest key — no hot
    keys); the boilerplate set is tiny by construction (only segments
    crossing a per-site df threshold survive the filter), so the mark-up
    join broadcasts; reassembly is one shuffle on the doc id — same cost
    class as segment_dedup.
    """
    segs = df.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(_segments_expr(text_col, words_per_segment)).alias(
            "seg_idx", "seg"
        ),
    ).withColumn("seg_hash", F.md5(F.col("seg")))
    group_sizes = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n_docs")
    )
    seg_df = segs.groupBy(group_col, "seg_hash").agg(
        F.count_distinct(F.col(id_col)).alias("_df")
    )
    boiler = (
        seg_df.join(group_sizes, group_col)
        .filter(F.col("_df") > F.lit(max_df_ratio) * F.col("_n_docs"))
        .select(group_col, "seg_hash")
    )
    # no forced broadcast: the boilerplate set is small PER GROUP but grows
    # with the number of sites, so at 100× it is not driver-bounded — AQE's
    # runtime size estimate picks broadcast when it actually fits
    marked = segs.join(
        boiler.withColumn("_boiler", F.lit(True)),
        [group_col, "seg_hash"],
        "left",
    ).withColumn("kept", F.col("_boiler").isNull())
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(F.struct("seg_idx", "seg", "kept"))
                        ),
                        lambda s: s["kept"],
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        )
    )


def sample_mix(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "mix-v1",
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling — corpus mix balancing by
    RATE (the companion to quota_by_group's exact top-k): upsample-free
    domain/language reweighting, e.g. keep 100% of low-resource languages
    and 10% of English.

    The keep decision is md5(seed || id) mapped to [0,1) and compared to
    the group's rate: a pure per-row expression (zero shuffles, fused into
    the scan), stable under resharding/replay — re-running the pipeline
    admits EXACTLY the same documents, which is what makes downstream
    incremental stages (dedup registries, shard export) reproducible.
    Portable: identical semantics in any engine with md5 (DuckDB oracle).
    """
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8
    )
    # rates compile to 8-hex-char thresholds compared lexicographically —
    # no numeric conversion, bit-identical across engines (train_split's
    # trick at 32-bit resolution)
    def hx(r: float) -> str:
        v = max(0, round(float(r) * 16**8))
        # rate >= 1.0 must keep EVERYTHING: 'g' sorts after every hex digit,
        # while format(16**8) would be 9 chars and break the 8-char compare
        return "g" if v >= 16**8 else format(v, "08x")

    thresh = F.lit(hx(default_rate))
    for g, r in sorted(rates.items()):
        thresh = F.when(F.col(group_col) == g, F.lit(hx(r))).otherwise(thresh)
    return df.filter(h < thresh)


def plan_mixture(
    docs: DataFrame,
    targets: dict[str, float],
    token_budget: int,
    group_col: str = "lang",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Data-mixture planning: given per-group token inventories and a
    target mix (fractions summing to ≤1), compute the per-group sampling
    rate / upsampling epochs that hit a token budget — the step that turns
    'train on 40% en, 20% de …' into concrete rates for sample_mix and
    repeat factors for low-resource groups (the standard pretraining-mix
    recipe: fixed budget, per-source weights, upsampling capped by
    epochs).

    Returns (group, n_docs, tokens_have, target_frac, tokens_target,
    rate, epochs): rate = tokens_target / tokens_have (NOT clamped — >1
    means the group must repeat; sample_mix consumes min(rate, 1.0)),
    epochs = ceil(rate) (how many passes over the group the shard writer
    schedules). Groups outside `targets` get target_frac 0 and drop from
    the plan.

    Scale shape: ONE map-side-combinable aggregate over the corpus (group
    cardinality rows out), then pure column math against the broadcast
    targets literal. No window, no join, no driver math."""
    mapping = F.create_map(
        *[x for k, v in sorted(targets.items()) for x in (F.lit(k), F.lit(float(v)))]
    )
    inv = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("tokens_have"),
    )
    planned = (
        inv.withColumn("target_frac", mapping[F.col(group_col)])
        .filter(F.col("target_frac").isNotNull())
        .withColumn(
            "tokens_target",
            (F.lit(float(token_budget)) * F.col("target_frac")).cast("double"),
        )
        .withColumn("rate", F.col("tokens_target") / F.col("tokens_have"))
        .withColumn("epochs", F.ceil(F.col("rate")).cast("long"))
    )
    return planned


def passage_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window passage chunking for retrieval/RAG export: each
    document splits into word windows of `window` tokens advancing by
    `stride` (overlap = window - stride keeps sentences that straddle a
    boundary retrievable from at least one passage). Deterministic ids
    (doc, passage_idx) make the export replay-stable.

    Chunk rule: passage k covers tokens [k*stride, k*stride + window);
    windows start while k*stride < n_tokens, so the tail is always
    covered and a short document yields exactly one (possibly short)
    passage. Empty/whitespace-only docs yield none.

    Scale shape: split + sequence + transform are scan-fused column
    expressions; the explode multiplies rows by ~n/stride but carries only
    the passage slice, not the full document, into downstream shuffles.
    Zero shuffles in the operator itself.
    """
    ws = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda s: s != ""
    )
    n = F.size(ws)
    # number of windows: ceil(n / stride) bounded so last window starts < n
    n_win = F.when(n <= 0, F.lit(0)).otherwise(
        (n + F.lit(stride - 1)).cast("bigint") / F.lit(stride)
    ).cast("bigint")
    idx = F.sequence(F.lit(0).cast("bigint"), n_win - 1)
    out = df.select(
        F.col(id_col),
        ws.alias("_ws"),
        F.explode(
            F.when(n_win > 0, idx).otherwise(F.array().cast("array<bigint>"))
        ).alias("passage_idx"),
    )
    sliced = F.slice(
        F.col("_ws"), (F.col("passage_idx") * stride + 1).cast("int"), window
    )
    return out.select(
        id_col,
        F.col("passage_idx").cast("bigint"),
        F.array_join(sliced, " ").alias("passage"),
        F.size(sliced).cast("int").alias("n_tokens"),
    )


def content_defined_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking over the word stream: a new chunk STARTS at
    every word whose md5 begins with '0' (probability 1/16 → expected chunk
    ≈ 16 words). Because boundaries depend only on local content — never on
    position — an insertion or deletion reshapes at most the one chunk it
    touches and every other chunk hash is unchanged, which is what makes
    CDC the storage-dedup / partial-overlap primitive fixed-width segments
    (segment_dedup) cannot be: a one-word prefix insertion shifts EVERY
    fixed window but no CDC boundary.

    Output: (id, chunk_id, chunk_text, n_words, chunk_hash).

    Scale shape: one posexplode fused into the scan, one running-sum window
    keyed by doc id (each doc's words land in one partition — documents,
    not the corpus, bound the window), one groupBy(doc, chunk) reassembly.
    Cost class of segment_dedup; no corpus-wide hot key.
    """
    words = F.split(F.col(text_col), " ")
    tok = df.select(F.col(id_col), F.posexplode(words).alias("pos", "w"))
    flag = F.when(F.substring(F.md5(F.col("w")), 1, 1) == "0", 1).otherwise(0)
    win = Window.partitionBy(id_col).orderBy("pos")
    chunked = tok.withColumn("chunk_id", F.sum(flag).over(win))
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
        .withColumn("chunk_hash", F.md5("chunk_text"))
    )


def chunk_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document partial-overlap profile from content-defined chunks:
    (id, n_chunks, n_dup_chunks) where a dup chunk's hash occurs in ≥2
    distinct documents. High n_dup_chunks/n_chunks with a low full-text
    match is exactly the "quoted/templated/partially-copied" region exact
    and near dedup both miss; downstream policy drops or trims. One extra
    shuffle on the 32-byte chunk hash (map-side combinable count)."""
    ch = content_defined_chunks(df, id_col, text_col)
    counts = ch.groupBy("chunk_hash").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    return (
        ch.join(counts, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.count_if(F.col("n_docs") >= 2).cast("bigint").alias("n_dup_chunks"),
        )
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide keep-first dedup at content-defined chunk granularity —
    segment_dedup's rule (a chunk survives only at its first (id, position)
    occurrence; documents reassemble from survivors) over SHIFT-ROBUST
    boundaries: quoting a passage mid-document still dedups it, where the
    fixed-width segmentation would see entirely different windows.
    Output: (id, dedup_text, n_chunks, n_kept).

    Scale shape ≡ segment_dedup: keep-first is one aggregate keyed on the
    32-byte chunk digest (min-struct, map-side combinable — no window over
    duplicate-heavy keys), reassembly one shuffle on the doc id, plus
    content_defined_chunks' own per-doc window."""
    ch = content_defined_chunks(df, id_col, text_col)
    firsts = ch.groupBy("chunk_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_id"))).alias("first")
    )
    marked = ch.join(firsts, "chunk_hash").withColumn(
        "kept",
        (F.col("first")[id_col] == F.col(id_col))
        & (F.col("first.chunk_id") == F.col("chunk_id")),
    )
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "chunk_text", "kept"))
                    ),
                    lambda s: s["kept"],
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("dedup_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
    )
