"""Cross-checks for the hash-based dedup operators that can't have SQL
oracles: MinHash-LSH and SimHash are validated against exact methods."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.text import analysis as TA
from meerkat_spark.text import dedup as TD

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Documents plus exact copies and near-copies with shifted ids."""
    base = docs.limit(30)
    exact = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    near = base.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tail tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(exact).unionByName(near)


def test_exact_dedup(spark, docs_with_dups):
    groups = TD.exact_duplicates(docs_with_dups).collect()
    assert len(groups) == 30  # each base doc has exactly one exact copy
    assert all(g.n_dups == 2 for g in groups)
    kept = TD.dedup_exact(docs_with_dups)
    assert kept.count() == 60  # 30 uniques survive + 30 near-copies


def test_minhash_lsh_finds_exact_and_near_dups(spark, docs_with_dups):
    pairs = {
        (r.id1, r.id2) for r in TD.minhash_lsh_pairs(docs_with_dups).collect()
    }
    # every exact copy pair must collide in every band
    for i in range(30):
        assert any(p == (i, i + 100000) for p in pairs), f"missing exact pair {i}"
    # near-dups (tiny suffix added) should mostly be caught
    near_hits = sum(1 for i in range(30) if (i, i + 200000) in pairs)
    assert near_hits >= 25


def test_minhash_candidates_superset_of_high_jaccard(spark, docs_with_dups):
    """Candidate completeness is MODULO exact classes: byte-identical
    docs are routed around the LSH as star pairs (rep, member), so a
    high-jaccard pair is covered iff its exact-class representatives
    are paired (or coincide)."""
    exact = {
        (r.id1, r.id2)
        for r in TD.jaccard_pairs(docs_with_dups, threshold=0.9).collect()
    }
    cand = {
        (r.id1, r.id2) for r in TD.minhash_lsh_pairs(docs_with_dups).collect()
    }
    # rep = min id of each exact (fingerprint) class
    fp = {
        r.doc_id: r.fp64
        for r in docs_with_dups.select(
            "doc_id", TA.fingerprint64(F.col("text")).alias("fp64")
        ).collect()
    }
    by_fp = {}
    for did, f in fp.items():
        by_fp.setdefault(f, []).append(did)
    rep = {did: min(by_fp[f]) for did, f in fp.items()}
    missed = set()
    for a, b in exact:
        ra, rb = rep[a], rep[b]
        if ra == rb:
            continue  # same exact class — covered by star pairs
        if (min(ra, rb), max(ra, rb)) not in cand:
            missed.add((a, b))
    # 16 bands × 4 rows: P(miss | J≥0.9) = (1-J^4)^16 ≤ (1-0.65)^16 ≈ 1e-7
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_minhash_giant_exact_class_bounded(spark):
    """10k byte-identical docs must yield LINEAR star pairs (9,999), not
    the ~50M all-pairs a naive bucket expansion would produce — the
    round-3 'giant exact-dup class' scale hazard."""
    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("same text every time").alias("text")
    )
    pairs = TD.minhash_lsh_pairs(docs)
    assert pairs.count() == n - 1
    # every pair is (rep=0, member)
    assert pairs.filter(F.col("id1") != 0).count() == 0


def test_minhash_max_bucket_cap(spark, docs_with_dups):
    """max_bucket drops oversize residual buckets instead of expanding
    them quadratically (recall loss only, never wrong pairs)."""
    uncapped = TD.minhash_lsh_pairs(docs_with_dups, max_bucket=None)
    capped = TD.minhash_lsh_pairs(docs_with_dups, max_bucket=1)
    # cap=1 kills every bucket (star pairs survive — they bypass LSH)
    got = {(r.id1, r.id2) for r in capped.collect()}
    assert got == {(i, i + 100000) for i in range(30)}
    assert uncapped.count() > len(got)


def test_simhash_near_dups(spark, docs_with_dups):
    pairs = TD.simhash_pairs(docs_with_dups, max_hamming=6).collect()
    got = {(r.id1, r.id2) for r in pairs}
    for i in range(30):
        assert (i, i + 100000) in got  # identical text → hamming 0
    assert all(r.hamming == 0 for r in pairs if (r.id1, r.id2) == (0, 100000))


def test_quality_and_langid(spark, docs):
    out = TA.with_text_stats(docs).select("doc_id", "quality", "lang_pred", "n_tokens")
    rows = out.collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert all(r.n_tokens > 0 for r in rows)
    langs = {r.lang_pred for r in rows}
    assert langs <= {"en", "fr", "de", "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "id int, text string",
    )
    fps = {r.id: r.fp for r in df.select("id", TA.fingerprint64(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]  # case + whitespace normalized
    assert fps[1] != fps[3]


def test_chunk_documents_windows(spark):
    """64/16 grid: starts every stride tokens, short tail, empty doc
    dropped, overlap preserved between adjacent chunks."""
    from meerkat_spark.text.chunk import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    got = [(r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in rows]
    assert got == [
        (1, 0, "w0 w1 w2 w3", 4),
        (1, 1, "w3 w4 w5 w6", 4),
        (1, 2, "w6 w7 w8 w9", 4),
        (1, 3, "w9", 1),
        (2, 0, "a b", 2),
    ]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from meerkat_spark.text.chunk import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pack_chunks_budget_and_offsets(spark):
    """Packs respect the budget+overflow bound; offsets restart per
    pack; shards are independent."""
    from meerkat_spark.text.chunk import pack_chunks

    rows = [(0, 0, 60), (0, 1, 60), (2, 0, 30), (4, 0, 50), (1, 0, 100), (3, 0, 10)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, n_chunk_tokens long")
    out = {
        (r.doc_id, r.chunk_id): (r.shard, r.pack_id, r.pack_offset)
        for r in pack_chunks(df, budget=100, n_shards=2).collect()
    }
    assert out[(0, 0)] == (0, 0, 0)
    assert out[(0, 1)] == (0, 0, 60)   # starts inside pack 0 (overflow ≤ chunk)
    assert out[(2, 0)] == (0, 1, 20)
    assert out[(4, 0)] == (0, 1, 50)
    assert out[(1, 0)] == (1, 0, 0)
    assert out[(3, 0)] == (1, 1, 0)


def test_url_blocklist_filter(spark):
    from meerkat_spark.text.urlfilter import (
        domain_suffix,
        filter_blocked_urls,
        url_host,
    )

    df = spark.createDataFrame(
        [
            (1, "https://cdn.eu.tracker.com/x?q=1"),
            (2, "http://user:pw@GoodSite.org:8080/path"),
            (3, "ftp://exact.host.net/file"),
            (4, "plain.example.com/no/scheme"),
            (5, "https://tracker.com"),
            (6, "https://nottracker.com/a"),  # suffix must be label-aligned
            (7, None),
        ],
        "id int, url string",
    )
    hosts = {r.id: r.h for r in df.select("id", url_host("url").alias("h")).collect()}
    assert hosts[1] == "cdn.eu.tracker.com"
    assert hosts[2] == "goodsite.org"  # userinfo + port stripped, lowered
    assert hosts[4] == "plain.example.com"  # scheme optional
    assert hosts[7] is None

    sfx = df.where("id = 1").select(
        domain_suffix(url_host("url"), 2).alias("s2"),
        domain_suffix(url_host("url"), 4).alias("s4"),
        domain_suffix(url_host("url"), 5).alias("s5"),
    ).collect()[0]
    assert sfx.s2 == "tracker.com"
    assert sfx.s4 == "cdn.eu.tracker.com"
    assert sfx.s5 is None  # fewer labels than depth

    bl = spark.createDataFrame(
        [("tracker.com",), ("exact.host.net",)], "domain string"
    )
    kept = sorted(
        r.id for r in filter_blocked_urls(df, bl, url_col="url").collect()
    )
    # 1 (suffix), 3 (exact), 5 (exact-as-2-label) blocked;
    # 6 survives: 'nottracker.com' is NOT label-aligned with tracker.com
    assert kept == [2, 4, 6, 7]

    plan = filter_blocked_urls(df, bl, url_col="url")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 5  # host + depths 2..5
    assert "LeftAnti" in plan and "BroadcastNestedLoopJoin" not in plan


def test_diffpatterns_text_known_answer(spark):
    from meerkat_spark.text.analysis import diffpatterns_text

    df = spark.createDataFrame(
        [
            (1, "a", "alpha beta common"),
            (2, "a", "alpha common"),
            (3, "a", "alpha beta"),
            (4, "b", "gamma common"),
            (5, "b", "gamma common beta"),
        ],
        "id int, grp string, text string",
    )
    out = {
        r.token: r
        for r in diffpatterns_text(df, "text", "grp", "a", "b").collect()
    }
    # alpha: 3/3 docs in a, 0/2 in b -> 100 vs 0
    assert out["alpha"].PercentA == 100.0 and out["alpha"].PercentB == 0.0
    assert out["alpha"].PercentDiff == 100.0
    # gamma: 0 vs 100
    assert out["gamma"].PercentDiff == 100.0
    # common: 2/3 vs 2/2 -> 66.67 vs 100
    assert out["common"].PercentA == 66.67 and out["common"].PercentDiff == 33.33
    # beta counted per DOCUMENT (doc 5 contains it once): 2/3 vs 1/2
    assert out["beta"].CountA == 2 and out["beta"].CountB == 1
    # threshold filters
    from meerkat_spark.text.analysis import diffpatterns_text as dpt

    few = dpt(df, "text", "grp", "a", "b", min_percent_diff=50.0)
    assert {r.token for r in few.collect()} == {"alpha", "gamma"}


def test_span_dedup_removes_shifted_copies(spark):
    from meerkat_spark.text.spandedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    dup = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [
            (1, "alpha " + dup + " omega"),
            # same run at a DIFFERENT offset — content-defined anchors
            # must still align the windows
            (2, "start of something " + dup + " end unique tail"),
            (3, "totally different text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(df, window=20, stride=4)
    rows = spans.collect()
    assert {r.doc_id for r in rows} == {1, 2}
    # keeper = globally-first occurrence (doc 1)
    assert all(r.keep == (r.doc_id == 1) for r in rows)

    out = {r.doc_id: r for r in remove_duplicated_spans(df, window=20, stride=4).collect()}
    assert out[1].n_dropped_spans == 0  # keeper untouched
    assert out[1].text == "alpha " + dup + " omega"
    assert out[2].n_dropped_spans > 0
    assert "w0" not in out[2].text and "w19" not in out[2].text
    assert out[2].text.startswith("start of something")
    assert out[3].n_dropped_spans == 0
    assert out[3].text == "totally different text with no repeats at all"


def test_span_dedup_plan_no_allpairs(spark):
    from meerkat_spark.text.spandedup import remove_duplicated_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = remove_duplicated_spans(docs, window=12, stride=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # all HOFs, no python workers


def test_linear_classifier_scoring_and_gate(spark):
    from pyspark.sql import functions as F

    from meerkat_spark.text.classifier import (
        filter_by_score,
        hash_features,
        score_documents,
    )

    df = spark.createDataFrame(
        [
            (1, "good clean prose here"),
            (2, "spam spam spam buy now"),
            (3, "neutral text"),
        ],
        "doc_id long, text string",
    )
    dim = 1 << 18
    ids = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit("spam")), F.lit(dim)).alias("spam_id"),
            F.pmod(F.xxhash64(F.lit("clean")), F.lit(dim)).alias("clean_id"),
        )
        .collect()[0]
    )
    w = spark.createDataFrame(
        [(ids.spam_id, -2.0), (ids.clean_id, 3.0)], "feature_id long, weight double"
    )
    got = {
        r.doc_id: r
        for r in score_documents(df, w, bigrams=False).collect()
    }
    assert got[1].score == pytest.approx(3.0 / 4)  # mean-pooled
    assert got[2].score == pytest.approx(3 * -2.0 / 5)
    assert got[3].score == 0.0 and got[3].prob == 0.5
    kept = sorted(r.doc_id for r in filter_by_score(df, w, 0.5, bigrams=False).collect())
    assert kept == [1, 3]

    # bigrams add position-pair features: "buy now" present once
    feats = hash_features(df.where("doc_id = 2"), bigrams=True)
    n_uni = hash_features(df.where("doc_id = 2"), bigrams=False)
    assert feats.agg(F.sum("tf")).first()[0] == n_uni.agg(F.sum("tf")).first()[0] + 4

    # plan: broadcast join for the model, no python workers
    plan = (
        score_documents(df, w, bigrams=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jaccard_df_cap_bounds_boilerplate(spark):
    """A shingle shared by every doc (boilerplate header) must not emit
    O(n²) candidate pairs: with max_shingle_df set, hot shingles are
    dropped before pair expansion, genuine near-dups (sharing RARE
    shingles) still surface, and pure-boilerplate pairs are the
    documented recall loss."""
    n = 60
    header = "terms of service apply all rights reserved by the site owner "
    rows = [(i, header + f"unique body {i} " + ("alpha beta gamma delta " * 3)
             if i % 2 == 0 else header + f"other body {i} " + f"w{i} x{i} y{i} z{i} " * 4)
            for i in range(n)]
    # one genuine near-dup pair sharing rare shingles beyond the header
    rows.append((1000, header + "unique body 0 " + "alpha beta gamma delta " * 3 + "tail"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = TD.jaccard_pairs(df, threshold=0.5, max_shingle_df=10)
    pairs = {(r.id1, r.id2) for r in capped.collect()}
    # the near-dup of doc 0 survives the cap (their shared shingles are rare)
    assert (0, 1000) in pairs
    # boilerplate-only co-occurrence never pairs odd/even docs
    assert all(not (a % 2 == 0 and b % 2 == 1) for a, b in pairs if b != 1000)

    # uncapped is a superset (exact textbook semantics)
    full = {(r.id1, r.id2)
            for r in TD.jaccard_pairs(df, threshold=0.5, max_shingle_df=None).collect()}
    assert pairs <= full

    # r16: prefilter_hot=True (hot shingles dropped by a count_distinct
    # pre-pass BEFORE any posting list materializes — the
    # memory-bounded extreme-scale path) is bit-for-bit the same
    # result as the default filter-after-collect shape
    pre = {(r.id1, r.id2, r.jaccard)
           for r in TD.jaccard_pairs(
               df, threshold=0.5, max_shingle_df=10, prefilter_hot=True
           ).collect()}
    post = {(r.id1, r.id2, r.jaccard) for r in capped.collect()}
    assert pre == post


def test_fuzzy_dedup_end_to_end(spark, docs_with_dups):
    """fuzzy_dedup keeps exactly one representative (min id) per
    near-dup class: 30 base docs each have an exact copy (+100000) and
    a near copy (+200000) — 90 in, 30 out, and the survivors are the
    min ids. A pure false-positive candidate (low true Jaccard) must
    be killed by the exact verification stage."""
    kept = TD.fuzzy_dedup(docs_with_dups, threshold=0.7)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # ground truth: connected components of the EXACT jaccard >= 0.7
    # graph (python union-find over corpus-wide exact pairs); fuzzy
    # dedup must keep exactly each component's min id plus all
    # singletons (LSH recall on exact/near copies is ~1 by design)
    true_pairs = [
        (r.id1, r.id2)
        for r in TD.jaccard_pairs(
            docs_with_dups, threshold=0.7, max_shingle_df=None
        ).collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in true_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = [r.doc_id for r in docs_with_dups.select("doc_id").collect()]
    expected = sorted({find(i) if i in parent else i for i in all_ids})
    assert ids == expected
    assert all(i < 100000 for i in ids)  # every class rep is a base doc

    # the exact verification stage bounds the class merging: survivors
    # never shrink below the TRUE >=threshold component count (LSH can
    # only lose recall, never create false merges past verification)
    import pyspark.sql.functions as F2

    uniq = docs_with_dups.filter(F2.col("doc_id") < 100000)
    n_true_pairs = TD.jaccard_pairs(
        uniq, threshold=0.999, max_shingle_df=None
    ).count()
    survivors = TD.fuzzy_dedup(uniq, threshold=0.999).count()
    # every merge consumed at least one true pair
    assert survivors >= uniq.count() - n_true_pairs


def test_classifier_oracle_vocab_collision_free(spark):
    """classifier_gate_exact's oracle replays the hashed-feature join
    at the token-string level; that is exact only if (a) the 11
    weighted tokens map to 11 DISTINCT feature ids mod 2^18 and (b) no
    unweighted in-doc bigram collides with a weighted id (it must
    contribute exactly 0). Both are fixed properties of xxhash64 —
    asserted here so a vocab edit can't silently break the oracle."""
    from meerkat_spark.suite.textops import _CLF_BI_W, _CLF_UNI_W, _CLF_WORDS

    dim = 1 << 18
    weighted = list(_CLF_WORDS) + [b for b, _ in _CLF_BI_W]
    # every bigram a formula-built doc can contain: step s in {1,2,3}
    doc_bigrams = {
        f"{_CLF_WORDS[i]} {_CLF_WORDS[(i + s) % 8]}"
        for s in (1, 2, 3)
        for i in range(8)
    }
    toks = sorted(set(weighted) | doc_bigrams)
    ids = dict(
        spark.createDataFrame([(t,) for t in toks], "tok string")
        .select("tok", F.pmod(F.xxhash64("tok"), F.lit(dim)).alias("fid"))
        .collect()
    )
    wids = {ids[t] for t in weighted}
    assert len(wids) == len(weighted), "weighted feature ids collide"
    unweighted = [t for t in toks if t not in weighted]
    hits = [t for t in unweighted if ids[t] in wids]
    assert not hits, f"unweighted doc features collide with weighted ids: {hits}"
    assert len(_CLF_UNI_W) == len(_CLF_WORDS)


def test_train_logreg_learns_separable_gate(spark):
    """In-engine LR training (text/classifier.py train_logreg): on a
    linearly separable planted corpus the trained weights must gate
    with 100% train accuracy, positives get positive scores, and the
    weight table stays bounded by the distinct hashed features."""
    from meerkat_spark.text.classifier import score_documents, train_logreg

    pos = ["great clean signal data", "excellent data quality signal"]
    neg = ["spam junk noise garbage", "junk garbage noise spam words"]
    rows = [
        (i, (pos if i % 2 == 0 else neg)[(i // 2) % 2] + f" doc{i}", float(i % 2 == 0))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y double")
    w = train_logreg(df, n_epochs=15, lr=2.0, bigrams=False)
    n_feats = w.count()
    assert 0 < n_feats < 200  # bounded by distinct hashed features
    scores = score_documents(df, w, bigrams=False)
    out = scores.join(df.select("doc_id", "y"), "doc_id").collect()
    acc = sum(1 for r in out if (r.prob >= 0.5) == (r.y == 1.0)) / len(out)
    assert acc == 1.0
    assert all(r.score > 0 for r in out if r.y == 1.0)


def test_lm_perplexity_filter(spark):
    """Bigram-LM perplexity (text/lm.py): repetitive in-distribution
    docs score LOWER perplexity than a gibberish doc of unseen tokens;
    the CCNet-style gate keeps exactly the under-threshold rows; short
    docs (<2 tokens) get no score and are filtered by the gate."""
    from pyspark.sql import functions as F

    from meerkat_spark.text.lm import (
        lm_quality_filter,
        perplexity_scores,
        train_bigram_lm,
    )

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zxq wvu tsr qpo nml kji hgf"))  # unseen everything
    rows.append((101, ""))  # empty -> 0 bigrams -> no score row
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bigram_lm(df)
    scores = {r.doc_id: r for r in perplexity_scores(df, *model).collect()}
    assert scores[0].perplexity < scores[100].perplexity
    assert scores[0].n_bigrams == 9
    assert 101 not in scores  # nothing to score
    thr = (scores[0].perplexity + scores[100].perplexity) / 2
    kept = {r.doc_id for r in lm_quality_filter(df, thr, model=model).collect()}
    assert kept == set(range(20))  # gibberish over threshold, empty unscored


def test_fuzzy_dedup_max_score_keeper(spark, docs_with_dups):
    """r11 keeper='max_score': each near-dup class keeps its
    highest-score member (ties -> smallest id) instead of the min id;
    singletons are untouched; bad arguments raise."""
    import pyspark.sql.functions as F2

    # deterministic score that usually prefers the +100000 exact copy
    scored = docs_with_dups.withColumn(
        "score", (F2.col("doc_id") % 13).cast("long")
    )
    kept = TD.fuzzy_dedup(
        scored, threshold=0.7, keeper="max_score", score_col="score"
    )
    ids = {r.doc_id for r in kept.select("doc_id").collect()}

    # ground truth components from exact jaccard (same as the min-id test)
    true_pairs = [
        (r.id1, r.id2)
        for r in TD.jaccard_pairs(
            docs_with_dups, threshold=0.7, max_shingle_df=None
        ).collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in true_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict = {}
    all_ids = [r.doc_id for r in docs_with_dups.select("doc_id").collect()]
    for i in all_ids:
        groups.setdefault(find(i) if i in parent else i, []).append(i)
    expected = {
        max(members, key=lambda i: (i % 13, -i)) for members in groups.values()
    }
    assert ids == expected
    # the policy genuinely differs from min_id on this fixture
    min_ids = {
        r.doc_id
        for r in TD.fuzzy_dedup(scored, threshold=0.7).select("doc_id").collect()
    }
    assert ids != min_ids

    import pytest as _pytest

    with _pytest.raises(ValueError, match="score_col"):
        TD.fuzzy_dedup(scored, keeper="max_score")
    with _pytest.raises(ValueError, match="keeper"):
        TD.fuzzy_dedup(scored, keeper="median")


def test_canonical_url_cases(spark):
    """r13 URL canonicalizer: scheme/www/host-case/tracking-param/
    param-order/fragment/trailing-slash noise all collapse; ports and
    path case are preserved."""
    from meerkat_spark.text.urlfilter import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM/Path/To?b=2&utm_source=x&a=1#frag",
         "example.com/Path/To?a=1&b=2"),
        ("http://example.com/Path/To/?a=1&b=2",
         "example.com/Path/To?a=1&b=2"),
        ("example.com/Path/To?a=1&b=2", "example.com/Path/To?a=1&b=2"),
        ("https://example.com", "example.com"),
        ("https://example.com/", "example.com"),
        ("https://example.com?utm_campaign=z", "example.com"),
        # bare `ref` is often semantic (?ref=<branch>) — NOT stripped
        # by default (r14, ADVICE r13); ref_src (a pure tracker) is
        ("https://example.com/x?fbclid=abc&gclid=1&ref=hp",
         "example.com/x?ref=hp"),
        ("https://sub.example.com:8080/X/Y", "sub.example.com:8080/X/Y"),
        ("https://example.com/x?ref_src=twsrc", "example.com/x"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "id long, url string"
    )
    got = [
        r["c"]
        for r in df.select("id", canonical_url("url").alias("c"))
        .orderBy("id")
        .collect()
    ]
    assert got == [want for _, want in cases]
    # the stripped-param set is caller-configurable: a corpus that
    # knows `ref` is nonsemantic can widen it
    from meerkat_spark.text.urlfilter import DEFAULT_TRACKING_PARAMS

    wide = DEFAULT_TRACKING_PARAMS + ("ref",)
    got_wide = (
        df.filter(F.col("id") == 6)
        .select(canonical_url("url", strip_params=wide).alias("c"))
        .collect()[0]["c"]
    )
    assert got_wide == "example.com/x"


def test_dedup_by_url_single_pass_window(spark):
    """dedup_by_url keeps the min-id row per canonical class with ONE
    keyed window (no aggregate-then-rejoin second corpus scan)."""
    from meerkat_spark.text.urlfilter import dedup_by_url

    rows = [
        (1, "https://a.com/x?utm_source=1"),
        (2, "HTTP://WWW.A.com/x"),
        (3, "a.com/x/"),
        (4, "https://b.com/y?p=1&q=2"),
        (5, "b.com/y?q=2&p=1#z"),
        (6, "https://c.com/z"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    kept = dedup_by_url(df, "url", "id")
    # plan BEFORE execution (post-run the AQE string repeats the
    # initial plan and double-counts): exactly one exchange — the
    # window's canonical-key shuffle — with the rank-1 filter pushed
    # into a partial WindowGroupLimit ahead of it
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "WindowGroupLimit" in plan, plan
    assert sorted(r["id"] for r in kept.collect()) == [1, 4, 6]
    assert set(kept.columns) == {"id", "url"}


def test_minhash_kernel_chunking_bitwise_stable(spark, monkeypatch):
    """The vectorized whole-batch minhash fold must produce identical
    signatures regardless of the chunk budget (the reduceat segments
    change, the uint64 affine-min values must not)."""
    import pandas as pd

    texts = pd.Series(
        ["", None, "one two three four five six"]
        + [" ".join(f"w{(i * j) % 97}" for j in range(i % 40)) for i in range(200)]
    )
    wide = TD._make_minhash_udf(64, 3).func(texts)
    monkeypatch.setattr(TD, "_MINHASH_CHUNK_SHINGLES", 17)
    narrow = TD._make_minhash_udf(64, 3).func(texts)
    for a, b in zip(wide, narrow):
        assert list(a) == list(b)


def test_simhash_kernel_chunking_bitwise_stable(spark, monkeypatch):
    """The vectorized whole-batch simhash fold must produce identical
    fingerprints regardless of the chunk budget (integer majorities and
    the two's-complement pack are exact at any segmentation)."""
    import pandas as pd

    texts = pd.Series(
        ["", None, "one TWO two three", "x" * 3]
        + [" ".join(f"w{(i * j) % 89}" for j in range(1 + i % 60)) for i in range(300)]
    )
    wide = list(TD._make_simhash_udf().func(texts))
    monkeypatch.setattr(TD, "_MINHASH_CHUNK_SHINGLES", 19)
    narrow = list(TD._make_simhash_udf().func(texts))
    assert wide == narrow
