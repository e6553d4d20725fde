"""Corpus-preparation operators: line-level dedup, decontamination,
deterministic split, url canonicalization + domain stats."""

import hashlib

import pyspark.sql.functions as F

from airbyte_spark.functions.urls import canonicalize_url, domain_stats, url_domain
from airbyte_spark.operators.corpus import decontaminate, segment_dedup, train_split


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --- segment_dedup ---------------------------------------------------------------


def _py_segment_dedup(rows, wps):
    """Pure-Python reference: first occurrence of a segment wins globally."""
    segs = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        for idx in range((len(ws) + wps - 1) // wps):
            seg = " ".join(ws[idx * wps : (idx + 1) * wps])
            segs.setdefault(seg, (doc_id, idx))
    out = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        kept, total = [], 0
        for idx in range((len(ws) + wps - 1) // wps):
            seg = " ".join(ws[idx * wps : (idx + 1) * wps])
            total += 1
            if segs[seg] == (doc_id, idx):
                kept.append(seg)
        out[doc_id] = (" ".join(kept), total, len(kept))
    return out


def test_segment_dedup_matches_python_reference(spark):
    rows = [
        (1, "a b c d e f"),
        (2, "a b c x y z"),  # shares first 3-word segment with doc 1
        (3, "x y z x y z"),  # internal duplicate + shares with doc 2
        (4, "q r"),  # short doc, single partial segment
        (5, "a b c d e f"),  # full duplicate of doc 1 → nothing survives
    ]
    got = {
        r["doc_id"]: (r["dedup_text"], r["n_segments"], r["n_kept"])
        for r in segment_dedup(_docs(spark, rows), words_per_segment=3).collect()
    }
    assert got == _py_segment_dedup(rows, 3)
    assert got[5] == ("", 2, 0)  # full dup: reassembles to empty, still a row


def test_segment_dedup_order_invariant(spark):
    rows = [(1, "a b c d"), (2, "a b e f"), (3, "e f g h")]
    base = segment_dedup(_docs(spark, rows), words_per_segment=2).collect()
    shuf = segment_dedup(
        _docs(spark, rows).repartition(7).sortWithinPartitions(F.desc("doc_id")),
        words_per_segment=2,
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuf))


# --- decontaminate ---------------------------------------------------------------


def test_decontaminate_flags_ngram_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here and more padding tokens"),
            (3, "quick brown fox jumps over something else entirely now"),
        ],
    )
    eval_set = _docs(spark, [(100, "a quick brown fox jumps over fences")])
    got = {r["doc_id"]: r for r in decontaminate(train, eval_set, n=5).collect()}
    # doc1 contains 'quick brown fox jumps over' (and 'brown fox jumps over the'? no
    # — eval has 'fox jumps over fences'): exactly the shared 5-grams count.
    assert got[1]["contaminated"] and got[1]["n_eval_ngram_hits"] == 1
    assert got[3]["contaminated"] and got[3]["n_eval_ngram_hits"] == 1
    assert not got[2]["contaminated"] and got[2]["n_eval_ngram_hits"] == 0


def test_decontaminate_short_docs_never_match(spark):
    train = _docs(spark, [(1, "one two three")])
    eval_set = _docs(spark, [(9, "one two three")])
    got = decontaminate(train, eval_set, n=5).collect()
    assert len(got) == 1 and not got[0]["contaminated"]


# --- train_split -----------------------------------------------------------------


def test_train_split_matches_md5_rule_and_is_total(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r["split"] for r in train_split(df).collect()}
    assert len(got) == 500
    for i, s in got.items():
        h = hashlib.md5(str(i).encode()).hexdigest()[:2]
        assert s == ("train" if h < "cc" else "val" if h < "e6" else "test")
    # sane proportions for a uniform hash (79.7 / 10.2 / 10.2 expected)
    n_train = sum(1 for s in got.values() if s == "train")
    assert 0.72 <= n_train / 500 <= 0.88


# --- urls ------------------------------------------------------------------------


def test_canonicalize_url_rules(spark):
    cases = {
        "HTTPS://Example.COM:443/a/b/": "https://example.com/a/b",
        "http://example.com:80/": "http://example.com/",
        "https://example.com/p?utm_source=x&a=1": "https://example.com/p?a=1",
        "https://example.com/p?a=1&utm_campaign=y&b=2": "https://example.com/p?a=1&b=2",
        "https://example.com/p?a=1&fbclid=zzz": "https://example.com/p?a=1",
        "https://example.com/p?gclid=1": "https://example.com/p",
        "https://example.com/p#frag": "https://example.com/p",
        "https://example.com/p/?ref=home#x": "https://example.com/p",
        "https://example.com:8080/p": "https://example.com:8080/p",
        "https://example.com/a?x=1&y=2": "https://example.com/a?x=1&y=2",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = dict(
        df.select("url", canonicalize_url(F.col("url")).alias("c")).collect()
    )
    assert got == cases
    # idempotent
    got2 = dict(
        df.select(
            "url", canonicalize_url(canonicalize_url(F.col("url"))).alias("c")
        ).collect()
    )
    assert got2 == cases


def test_domain_stats_counts(spark):
    rows = [
        ("https://a.com/1", "2024-01-01 00:00:00", None),
        ("https://a.com/1", "2024-01-02 00:00:00", "2024-01-02 00:00:00"),
        ("https://a.com/2", "2024-01-03 00:00:00", None),
        ("https://B.com/9", "2024-01-01 12:00:00", None),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, _ab_cdc_deleted_at string"
    ).select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.to_timestamp("_ab_cdc_deleted_at").alias("_ab_cdc_deleted_at"),
    )
    got = {r["domain"]: r for r in domain_stats(df).collect()}
    assert got["a.com"]["n_events"] == 3
    assert got["a.com"]["n_pages"] == 2
    assert got["a.com"]["n_deletes"] == 1
    assert got["b.com"]["n_events"] == 1
    assert str(got["a.com"]["max_warc_ts"]).startswith("2024-01-03")
    assert url_domain(F.lit("x")) is not None  # expression constructs


# --- canonicalization at ingest (composes at the source seam) ---------------------


def test_canonicalize_at_ingest_collapses_url_variants(spark, tmp_path):
    """The pipeline needs no plumbing for url hygiene: canonicalize the key
    column on the changelog DataFrame before replay (the same seam any
    source mapper uses) and cosmetic url variants merge onto ONE key —
    final state equals the replay of the already-clean stream."""
    import pyspark.sql.functions as FF

    from airbyte_spark.sources.changelog import read_changelog
    from airbyte_spark.streaming.pipeline import CdcPipeline

    sf = "/root/testdata/sf0.001"
    clean = read_changelog(spark, sf)
    variant = FF.when(FF.col("_ab_cdc_lsn") % 3 == 1, FF.concat("url", FF.lit("#frag"))).when(
        FF.col("_ab_cdc_lsn") % 3 == 2,
        FF.concat("url", FF.lit("?utm_source=feed")),
    ).otherwise(FF.col("url"))
    messy = clean.withColumn("url", variant)

    def final(ch, name):
        pipe = CdcPipeline.create_target(spark, str(tmp_path / name), n_buckets=4)
        pipe.replay(ch)
        return sorted(
            map(tuple, pipe.final_state().select("url", "warc_ts", "_ab_cdc_lsn").collect())
        )

    cleaned = messy.withColumn("url", canonicalize_url(FF.col("url")))
    assert final(cleaned, "canon") == final(clean, "clean")
    # sanity: WITHOUT canonicalization the variants fan out into extra keys
    assert len(final(messy, "messy")) > len(final(clean, "clean2"))


# --- pack_sequences ---------------------------------------------------------------


def _py_pack(rows, max_tokens, n_shards):
    """Pure-Python reference of the concat-then-chunk packing rule."""
    import re

    pat = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
    by_shard = {}
    for doc_id, text in rows:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        shard = ord(h[0]) % n_shards
        by_shard.setdefault(shard, []).append((doc_id, len(pat.findall(text))))
    out = {}
    for shard, docs in by_shard.items():
        cum = 0
        for doc_id, n in sorted(docs):
            out[doc_id] = (shard, n, cum // max_tokens, cum % max_tokens)
            cum += n
    return out


def test_pack_sequences_matches_python_reference(spark):
    from airbyte_spark.operators.corpus import pack_sequences

    rows = [(i, f"doc {i} " + "word " * (i % 37) + "end.") for i in range(200)]
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["seq_id"], r["offset"])
        for r in pack_sequences(
            _docs(spark, rows), max_tokens=64, n_shards=4
        ).collect()
    }
    assert got == _py_pack(rows, 64, 4)


def test_pack_sequences_tape_is_gapless(spark):
    """Within a shard, doc k's offset must equal the previous tape end
    (mod max_tokens) — the packing leaves no holes and no overlaps."""
    from airbyte_spark.operators.corpus import pack_sequences

    rows = [(i, "x " * (1 + i % 53)) for i in range(300)]
    out = pack_sequences(_docs(spark, rows), max_tokens=128, n_shards=2).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        tape = by_shard.get(r["shard"], 0)
        assert r["seq_id"] == tape // 128 and r["offset"] == tape % 128
        by_shard[r["shard"]] = tape + r["n_tokens"]


def test_pack_sequences_stable_under_resharding(spark):
    """Assignment is a pure function of (id, text): repartitioning the
    input must not change a single row."""
    from airbyte_spark.operators.corpus import pack_sequences

    rows = [(i, "tok " * (1 + i % 11)) for i in range(150)]
    a = sorted(map(tuple, pack_sequences(_docs(spark, rows)).collect()))
    b = sorted(
        map(tuple, pack_sequences(_docs(spark, rows).repartition(13)).collect())
    )
    assert a == b


# --- quota_by_group ---------------------------------------------------------------


def test_quota_by_group_exact_vs_plain_window(spark):
    """The salted two-phase form must equal the single-window definition."""
    from airbyte_spark.operators.corpus import quota_by_group

    rows = [
        (i, ["en", "de", "fr"][i % 3], float((i * 7919) % 100)) for i in range(400)
    ]
    # heavy tie block to exercise the (score desc, id asc) total order
    rows += [(1000 + i, "en", 50.0) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, quality_score double")
    got = sorted(
        map(
            tuple,
            quota_by_group(df, quota=25).select(
                "doc_id", "lang", "rank"
            ).collect(),
        )
    )
    want = []
    by_lang = {}
    for doc_id, lang, q in rows:
        by_lang.setdefault(lang, []).append((-q, doc_id))
    for lang, items in by_lang.items():
        for rank, (_, doc_id) in enumerate(sorted(items)[:25], 1):
            want.append((doc_id, lang, rank))
    assert got == sorted(want)


def test_quota_by_group_small_groups_pass_through(spark):
    from airbyte_spark.operators.corpus import quota_by_group

    df = spark.createDataFrame(
        [(1, "en", 1.0), (2, "de", 2.0)],
        "doc_id bigint, lang string, quality_score double",
    )
    assert quota_by_group(df, quota=10).count() == 2


# --- strip_boilerplate -----------------------------------------------------------


def _py_strip_boilerplate(rows, wps, ratio):
    """Pure-Python reference: segment df per (group, segment); strip segments
    whose df exceeds ratio * group size."""
    from collections import defaultdict

    seg_docs = defaultdict(set)
    group_docs = defaultdict(set)
    per_doc = {}
    for doc_id, group, text in rows:
        ws = text.split(" ")
        segs = [
            " ".join(ws[i * wps : (i + 1) * wps])
            for i in range((len(ws) + wps - 1) // wps)
        ]
        per_doc[doc_id] = (group, segs)
        group_docs[group].add(doc_id)
        for s in segs:
            seg_docs[(group, s)].add(doc_id)
    out = {}
    for doc_id, (group, segs) in per_doc.items():
        kept = [
            s for s in segs if len(seg_docs[(group, s)]) <= ratio * len(group_docs[group])
        ]
        out[doc_id] = (" ".join(kept), len(segs), len(kept))
    return out


def test_strip_boilerplate_matches_python_reference(spark):
    from airbyte_spark.operators.corpus import strip_boilerplate

    footer = "copyright acme corp all rights reserved contact us terms privacy"
    rows = [
        # siteA: every page shares the 10-word footer -> boilerplate
        (1, "siteA", "alpha beta gamma delta epsilon zeta eta theta iota kappa " + footer),
        (2, "siteA", "one two three four five six seven eight nine ten " + footer),
        (3, "siteA", "red green blue cyan magenta yellow black white gray pink " + footer),
        # siteB: same footer on only 1/3 pages -> NOT boilerplate there
        (4, "siteB", "a b c d e f g h i j " + footer),
        (5, "siteB", "k l m n o p q r s t " + footer.replace("acme", "other")),
        (6, "siteB", "u v w x y z aa bb cc dd extra words pad out the line here ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_kept"])
        for r in strip_boilerplate(df, words_per_segment=10, max_df_ratio=0.5).collect()
    }
    want = _py_strip_boilerplate(rows, 10, 0.5)
    assert got == want
    # the siteA footer really was stripped, and siteB's survived
    assert footer not in got[1][0]
    assert footer in got[4][0]


def test_strip_boilerplate_all_boilerplate_doc_yields_empty(spark):
    from airbyte_spark.operators.corpus import strip_boilerplate

    rows = [(i, "s", "same exact page") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = strip_boilerplate(df, words_per_segment=3, max_df_ratio=0.5).collect()
    assert all(r["clean_text"] == "" and r["n_kept"] == 0 for r in out)
    assert len(out) == 4  # every doc still present (auditable rejects)


def test_strip_boilerplate_is_group_scoped(spark):
    from airbyte_spark.operators.corpus import strip_boilerplate

    # the SAME segment ("hdr one") is boilerplate for the small site
    # (2/2 docs > 50%) but content for the big one (2/4 docs = 50%, not >)
    rows = [
        (1, "small", "hdr one body a"),
        (2, "small", "hdr one body b"),
        (3, "big", "hdr one body c"),
        (4, "big", "hdr one body d"),
        (5, "big", "other txt body e"),
        (6, "big", "other txt body f"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in strip_boilerplate(df, words_per_segment=2, max_df_ratio=0.5).collect()
    }
    assert "hdr one" not in out[1] and "hdr one" not in out[2]
    assert "hdr one" in out[3] and "hdr one" in out[4]


# --- sample_mix ------------------------------------------------------------------


def test_sample_mix_matches_hash_rule_and_is_stable(spark):
    import hashlib

    from airbyte_spark.operators.corpus import sample_mix

    rows = [(i, "en" if i % 3 else "sw") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    rates = {"en": 0.1, "sw": 1.0}
    kept = sorted(
        r["doc_id"] for r in sample_mix(df, rates, seed="mix-v1").collect()
    )

    def rule(i, lang):
        h = hashlib.md5(f"mix-v1{i}".encode()).hexdigest()[:8]
        v = round(rates[lang] * 16**8)
        t = "g" if v >= 16**8 else format(v, "08x")
        return h < t

    want = sorted(i for i, lang in rows if rule(i, lang))
    assert kept == want
    # every sw doc kept; en sampled near 10%
    n_en = sum(1 for i in kept if i % 3)
    assert all(i in kept for i, lang in rows if lang == "sw")
    assert 0.05 < n_en / 2000 < 0.15
    # replay-stable: second run identical
    again = sorted(r["doc_id"] for r in sample_mix(df, rates).collect())
    assert again == kept


def test_sample_mix_default_rate_drops_unlisted_groups(spark):
    from airbyte_spark.operators.corpus import sample_mix

    df = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, "xx")], "doc_id bigint, lang string"
    )
    kept = {r["doc_id"] for r in sample_mix(df, {"en": 1.0}).collect()}
    assert kept == {1}


def test_plan_mixture_rates_and_epochs(spark):
    import pytest

    from airbyte_spark.operators.corpus import plan_mixture

    rows = [
        # lang, tokens per doc
        *[("en", 100)] * 50,   # 5000 tokens
        *[("nd", 10)] * 10,    # 100 tokens — low-resource, must upsample
        *[("xx", 999)] * 3,    # not in targets — dropped from the plan
    ]
    docs = spark.createDataFrame(
        [(i, lang, n) for i, (lang, n) in enumerate(rows)],
        "doc_id long, lang string, n_tokens long",
    )
    plan = {r["lang"]: r for r in plan_mixture(
        docs, {"en": 0.5, "nd": 0.5}, token_budget=1000
    ).collect()}
    assert set(plan) == {"en", "nd"}
    en, nd = plan["en"], plan["nd"]
    assert (en["n_docs"], en["tokens_have"]) == (50, 5000)
    assert en["rate"] == pytest.approx(0.1) and en["epochs"] == 1
    # nd needs 500 tokens but has 100 → rate 5.0, five epochs
    assert nd["rate"] == pytest.approx(5.0) and nd["epochs"] == 5


def test_passage_chunks_rule(spark):
    from airbyte_spark.operators.corpus import passage_chunks

    docs = [
        (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
        (2, "single"),
        (3, "   "),  # whitespace only -> no passages
        (4, " ".join(f"v{i}" for i in range(4))),  # exactly one window
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["passage_idx"]): (r["passage"], r["n_tokens"])
        for r in passage_chunks(df, window=4, stride=3).collect()
    }
    # doc 1: windows start at 0,3,6,9 (ceil(10/3)=4)
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert got[(1, 3)] == ("w9", 1)  # tail window, short
    assert got[(2, 0)] == ("single", 1)
    assert got[(4, 0)] == ("v0 v1 v2 v3", 4)
    assert all(d != 3 for d, _ in got)  # empty doc chunks to nothing
    # overlap invariant: consecutive windows share window-stride tokens
    assert got[(1, 0)][0].split()[3:] == got[(1, 1)][0].split()[:1]


def test_content_defined_chunks_shift_robust(spark):
    """CDC's reason to exist: a prefix insertion shifts EVERY fixed-width
    segment but leaves all but one content-defined chunk hash intact."""
    from airbyte_spark.operators.corpus import (
        chunk_dedup_stats,
        content_defined_chunks,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep dark forest tonight while owls watch silently from "
        "tall trees nearby under a pale cold moon as wind moves the branches"
    )
    df = spark.createDataFrame(
        [(1, base), (2, "inserted prefix words " + base),
         (3, "totally different content about ships and oceans sailing forever")],
        "doc_id long, text string",
    )
    h1 = {r["chunk_hash"] for r in content_defined_chunks(df.filter("doc_id=1")).collect()}
    h2 = {r["chunk_hash"] for r in content_defined_chunks(df.filter("doc_id=2")).collect()}
    h3 = {r["chunk_hash"] for r in content_defined_chunks(df.filter("doc_id=3")).collect()}
    assert len(h1 & h2) >= len(h1) - 1 and len(h1) > 1  # only the first chunk reshapes
    assert not (h1 & h3)
    stats = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"]) for r in chunk_dedup_stats(df).collect()}
    assert stats[3] == (len(h3), 0)
    assert stats[1][1] == len(h1 & h2)


def test_content_defined_chunks_reassemble_exactly(spark):
    from airbyte_spark.operators.corpus import content_defined_chunks
    import pyspark.sql.functions as FF

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    df = spark.createDataFrame([(1, text.strip())], "doc_id long, text string")
    rows = sorted(
        content_defined_chunks(df).collect(), key=lambda r: r["chunk_id"]
    )
    assert " ".join(r["chunk_text"] for r in rows) == text.strip()
    assert sum(r["n_words"] for r in rows) == len(text.strip().split(" "))


def test_chunk_dedup_keep_first_and_shift_robust(spark):
    from airbyte_spark.operators.corpus import chunk_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep dark forest tonight while owls watch silently from "
        "tall trees nearby under a pale cold moon as wind moves the branches"
    )
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "prefix insertion here " + base)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(df).collect()}
    # exact dup: doc 1 keeps everything, doc 2 keeps nothing
    assert out[1]["dedup_text"] == base and out[1]["n_kept"] == out[1]["n_chunks"]
    assert out[2]["dedup_text"] == "" and out[2]["n_kept"] == 0
    # shifted copy: only the reshaped first chunk survives — the shared
    # tail chunks dedup against doc 1 despite the offset
    assert 0 < out[3]["n_kept"] < out[3]["n_chunks"]
    assert out[3]["dedup_text"].startswith("prefix insertion here")
    assert not out[3]["dedup_text"].endswith("branches")
