"""Physical-plan regression tests: the scale properties the queries
claim (shuffle counts, broadcast joins, no per-doc sorts) must be
visible in the executed plan, not just asserted in docstrings."""

import pytest

import __spark_entry__ as entry_mod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_doc_fingerprint_is_map_side_until_final_groupby(spark, sf_dir):
    """Winnowing happens inside the array expression: the plan must
    contain NO window operator and NO sort; the only exchanges are the
    final fingerprint aggregation (plus AQE reads)."""
    plan = _plan(entry_mod.q_doc_fingerprint(spark, sf_dir))
    assert "Window" not in plan
    assert "Sort" not in plan


def test_embed_ivf_topk_broadcasts_the_codebook(spark, sf_dir):
    """The 16-vector codebook and profile tables must move by
    broadcast, never by shuffling the embeddings against them; the
    full-table cluster assignment must be a map-side projection
    (literal-codebook argmax): the only Window/Sort operators allowed
    are the two probe-side top-k windows (probes are 10 rows), and no
    aggregate may sort."""
    plan = _plan(entry_mod.q_embed_ivf_topk(spark, sf_dir))
    assert "Broadcast" in plan
    windows = [l for l in plan.splitlines() if "Window [" in l]
    assert len(windows) == 2, plan
    assert "SortAggregate" not in plan, plan


def test_lang_id_ngram_broadcasts_profiles(spark, sf_dir):
    plan = _plan(entry_mod.q_lang_id_ngram(spark, sf_dir))
    assert "Broadcast" in plan


def test_nation_volume_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(entry_mod.q_nation_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region


def test_pricing_summary_pushes_filter_and_prunes_columns(spark, sf_dir):
    """The shipdate filter must reach the parquet scan and the scan
    must not read columns the query never touches."""
    df = entry_mod.q_pricing_summary(spark, sf_dir)
    scan = [
        line for line in _plan(df).splitlines() if "Scan parquet" in line or "PushedFilters" in line
    ]
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:200]
    # ReadSchema must exclude e.g. l_comment (never referenced)
    read_schema = plan.split("ReadSchema:")[1][:400]
    assert "l_comment" not in read_schema


def test_token_counts_has_no_shuffle(spark, sf_dir):
    """Pure map-side query: no exchange beyond the gated input
    repartition (which disappears at production split counts)."""
    plan = _plan(entry_mod.q_token_counts(spark, sf_dir))
    # one exchange at most (the _load_wide gate on the tiny test file)
    assert plan.count("Exchange") <= 1


def _winnow_numpy(text: str, k: int = 7, w: int = 8):
    """Exact numpy mirror of q_doc_fingerprint's arithmetic (base-257
    polynomial mod 2^31-1 over codepoints, window-of-w minima)."""
    import numpy as np

    cps = np.array([ord(c) for c in text], dtype=np.int64)
    if len(cps) < k:
        return set()
    n = len(cps) - k + 1
    h = np.zeros(n, dtype=np.int64)
    for j in range(k):
        h = (h * 257 + cps[j : j + n]) % 2147483647
    if n < w:
        return set()
    mins = np.array(
        [h[p : p + w].min() for p in range(n - w + 1)], dtype=np.int64
    )
    return set(int(m) for m in mins)


def test_winnowing_guarantee_and_spark_numpy_agreement(spark):
    """(a) The MOSS guarantee: two documents sharing any substring of
    length >= k + w - 1 = 14 share at least one fingerprint.
    (b) The Spark expression computes exactly the numpy mirror."""
    import hashlib

    import pandas as pd

    def rnd_text(seed: str, n: int) -> str:
        out = []
        s = seed
        while len(out) < n:
            s = hashlib.sha256(s.encode()).hexdigest()
            out += [chr(97 + int(c, 16) % 26) for c in s]
        return "".join(out[:n])

    docs = []
    for i in range(12):
        a = rnd_text(f"a{i}", 60)
        b = rnd_text(f"b{i}", 60)
        common = rnd_text(f"c{i}", 14 + i)  # >= 14 chars shared
        docs.append((f"x{i}", a + common + rnd_text(f"a2{i}", 20)))
        docs.append((f"y{i}", b + rnd_text(f"b2{i}", 9) + common))
    # (a) guarantee, on the numpy mirror
    for i in range(12):
        fx = _winnow_numpy(dict(docs)[f"x{i}"])
        fy = _winnow_numpy(dict(docs)[f"y{i}"])
        assert fx & fy, f"pair {i} shares a 14+-char substring but no fingerprint"

    # (b) Spark == numpy on the union of fingerprints per doc
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    from pyspark.sql import functions as F

    k, w, B, P = 7, 8, 257, 2147483647
    gram_hashes = (
        f"transform(sequence(1, length(text) - {k - 1}), i -> "
        f"aggregate(transform(sequence(0, {k - 1}), "
        f"j -> ascii(substring(text, i + j, 1))), "
        f"0L, (acc, x) -> (acc * {B} + x) % {P}))"
    )
    hs = df.select("doc_id", F.expr(gram_hashes).alias("hs"))
    fps_arr = (
        f"array_distinct(transform(sequence(1, size(hs) - {w - 1}), "
        f"p -> array_min(slice(hs, p, {w}))))"
    )
    got = {
        r.doc_id: set(r.fps)
        for r in hs.select("doc_id", F.expr(fps_arr).alias("fps")).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _winnow_numpy(text), doc_id


def test_heavy_tail_doc_pages_spread_across_partitions(spark, sf_dir):
    """north_rule skew evidence: a 40-page document's pages must land
    on many partitions under the pipeline's page-level (media_ref)
    salting — never serialized onto one executor core."""
    import pyarrow.parquet as pq
    import os as _os

    from pyspark.sql import functions as F

    from ocular_spark.fixtures import derive_docs_and_media, page_counts_for_doc

    documents = pq.read_table(
        _os.path.join(sf_dir, "documents.parquet")
    ).to_pandas()
    # find a deterministic 40-page doc among the first 200
    heavy = None
    for i in range(200):
        if page_counts_for_doc("doc-%06d" % i) == 40:
            heavy = i
            break
    assert heavy is not None, "fixture distribution should yield a 40-pager in 200"
    docs, media = derive_docs_and_media(
        documents.iloc[heavy : heavy + 1], n_docs=1, heavy_tail=True
    )
    assert media.shape[0] == 40
    pages = spark.createDataFrame(media[["media_ref"]])
    nparts = 24
    dist = (
        pages.repartition(nparts, F.col("media_ref"))  # = pipeline salting
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    # balls-in-bins: 40 pages over 24 partitions -> expect ~19 distinct
    # bins; anything above nparts/2 proves the doc's cost is spread
    assert dist > nparts / 2, dist


def test_assign_batches_has_no_single_partition_exchange(spark):
    """EM batch assignment must be fully distributed: the round-2
    implementation planned a partitionBy-less Window.orderBy, i.e.
    Exchange SinglePartition -> one task sorts every page key (a
    straggler wall at 10^12 docs).  The zipWithIndex-style version
    (range partition + per-partition ranks + tiny offsets collect)
    must plan with NO SinglePartition exchange anywhere."""
    from ocular_spark.em import assign_batches

    df = spark.createDataFrame(
        [("doc-%03d" % i, "m-%03d" % i, "x") for i in range(97)],
        "doc_id string, media_ref string, lines string",
    )
    got_df, _, _ = assign_batches(df, 10)
    plan = _plan(got_df)
    assert "SinglePartition" not in plan, plan


def test_event_sessions_tolerates_heavy_user_skew(spark):
    """north_rule skew evidence for sessionization: one user with 10x
    the median event count (the inherent worst case for a per-user
    window — all their events serialize onto one partition) must still
    produce exact session stats, and the window must not widen beyond
    a single hash exchange on user_id."""
    import datetime

    import pandas as pd

    from __spark_entry__ import _sessionize

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for u in range(20):  # 20 normal users, 10 events each
        for k in range(10):
            rows.append(("u%03d" % u, eid, base + datetime.timedelta(seconds=60 * k), 1.0))
            eid += 1
    # heavy user: 10x median, alternating 1s and 2000s gaps -> every
    # 2000s gap (> 1800) opens a session: 50 sessions of 2 events
    t = base
    for k in range(100):
        rows.append(("heavy", eid, t, 1.0))
        eid += 1
        t += datetime.timedelta(seconds=1 if k % 2 == 0 else 2000)
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    )
    out = {r.user_id: r for r in _sessionize(df).collect()}
    assert out["heavy"].n_sessions == 50
    assert out["heavy"].max_session_events == 2
    assert out["u000"].n_sessions == 1
    assert out["u000"].max_session_events == 10
    plan = _plan(_sessionize(df))
    assert plan.count("hashpartitioning(user_id") >= 1
    assert "SinglePartition" not in plan


def test_gopher_repetition_is_shuffle_free(spark, sf_dir):
    """Per-doc repetition profiling is computed in one array-expression
    projection (sorted-run adjacency, _run_length_masses): no hash
    exchange, no Window, no per-doc groupBy — the only exchange is the
    _load_wide RoundRobin spread on the tiny test file."""
    plan = _plan(entry_mod.q_gopher_repetition(spark, sf_dir))
    assert "Window" not in plan
    assert "hashpartitioning" not in plan
    assert plan.count("Exchange") <= 1


def test_gopher_repetition_hand_pinned(spark, tmp_path):
    """Hand-computed repetition fractions on crafted docs, including
    the short-doc guards (1 word -> all zero; 2 words -> no trigrams)
    and the documented >1 overlap double-count behavior."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "aa bb aa bb cc",       # "aa bb" x2: top=dup2=10/14
                "x y",                  # single bigram: top=1.0
                "solo",                 # 1 word: everything 0
                "to be to be to be",    # heavy repeat: dup fracs > 1
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r
        for r in entry_mod.q_gopher_repetition(spark, str(tmp_path)).collect()
    }
    assert rows[1].n_words == 5
    assert rows[1].top_bigram_frac == pytest.approx(round(10 / 14, 4))
    assert rows[1].dup_bigram_frac == pytest.approx(round(10 / 14, 4))
    assert rows[1].dup_trigram_frac == 0.0
    assert rows[2].top_bigram_frac == 1.0  # "x y" is the whole doc
    assert rows[2].dup_bigram_frac == 0.0 and rows[2].dup_trigram_frac == 0.0
    assert rows[3].top_bigram_frac == 0.0 and rows[3].n_words == 1
    # "to be" count 3 * len 5 = 15; "be to" 2*5=10; n_chars=17
    assert rows[4].top_bigram_frac == pytest.approx(round(15 / 17, 4))
    assert rows[4].dup_bigram_frac == pytest.approx(round(25 / 17, 4))
    # trigrams "to be to" x2 + "be to be" x2, len 8 each -> 32/17 > 1
    assert rows[4].dup_trigram_frac == pytest.approx(round(32 / 17, 4))


def test_quality_filter_plan_and_verdict(spark, sf_dir, tmp_path):
    """quality_filter is one map-side projection (no shuffle, no
    Python) and the verdict arithmetic matches hand-computed signals
    on constructed docs spanning every rule."""
    import pandas as pd

    plan = (
        entry_mod.q_quality_filter(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Join", "Sort", "Aggregate", "ArrowEvalPython",
                "BatchEvalPython", "MapInPandas"):
        assert bad not in plan, bad

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                # 30 words incl 'the' and 'a', all alphabetic -> keep
                "the quick brown fox jumps over a lazy dog again "
                "and then runs far away to find more food while "
                "the sun sets slowly in of warm golden evening light",
                "too short to keep the a",          # < 30 words -> drop
                # 30+ words but only one distinct stopword -> drop
                "the " + " ".join(f"word{i}" for i in range(35)),
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r
        for r in entry_mod.q_quality_filter(spark, str(tmp_path)).collect()
    }
    assert rows[1].keep == 1 and rows[1].n_words == 30
    assert rows[1].stop_hits >= 2 and rows[1].alpha_frac == 1.0
    assert rows[2].keep == 0            # word-count floor
    assert rows[3].keep == 0            # distinct-stopword floor
    assert rows[3].stop_hits == 1


def test_pii_redact_is_pure_projection_and_hand_pinned(spark, sf_dir, tmp_path):
    """pii_redact must compile to ONE map-side JVM projection (no
    join/sort/agg/Python), and the redaction arithmetic is pinned by
    hand on crafted docs covering injected AND in-text PII."""
    import pandas as pd

    plan = (
        entry_mod.q_pii_redact(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Join", "Sort", "Aggregate", "ArrowEvalPython",
                "BatchEvalPython", "MapInPandas"):
        assert bad not in plan, bad

    docs = pd.DataFrame(
        {
            # moduli chosen to exercise each injection arm exactly once
            # plus a no-injection doc carrying its own in-text PII
            "doc_id": [0, 1, 2, 11],
            "text": [
                "plain words only",
                "more plain words",
                "yet more words",
                "write me alice@corp.io or 192.168.0.1 ok",
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r for r in entry_mod.q_pii_redact(spark, str(tmp_path)).collect()
    }
    # doc 0: %3==0 -> email suffix only
    assert (rows[0].n_email, rows[0].n_phone, rows[0].n_ip) == (1, 0, 0)
    assert rows[0].clean_text == "plain words only contact <EMAIL> now"
    # doc 1: %4==1 -> phone suffix only
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_ip) == (0, 1, 0)
    assert rows[1].clean_text == "more plain words call <PHONE> today"
    # doc 2: %5==2 -> IP suffix only (10.2.0.14)
    assert (rows[2].n_email, rows[2].n_phone, rows[2].n_ip) == (0, 0, 1)
    assert rows[2].clean_text == "yet more words from <IP> logged"
    # doc 11: no injection (11%3=2, 11%4=3, 11%5=1) but in-text PII
    assert (rows[11].n_email, rows[11].n_phone, rows[11].n_ip) == (1, 0, 1)
    assert rows[11].clean_text == "write me <EMAIL> or <IP> ok"


def test_decontaminate_broadcasts_bench_set_and_hand_pinned(spark, sf_dir, tmp_path):
    """The benchmark shingle set must move by broadcast (corpus side
    never shuffles on shingles), and the overlap counts are pinned by
    hand: leaked-once doc -> exactly the CANON shingle; leaked-both
    doc -> 14 (CANON + CANON2 + 12 straddling); clean docs and the
    benchmark doc itself are absent."""
    import pandas as pd

    plan = (
        entry_mod.q_decontaminate(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    docs = pd.DataFrame(
        {
            "doc_id": [7, 4, 9, 3],
            "text": [
                "bench doc words here",   # %100==7 -> benchmark, both canons
                "alpha beta gamma",       # %10==4  -> leaked CANON
                "delta epsilon zeta",     # %10==9  -> leaked both
                "totally clean document", # no injection, no overlap
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r.n_benchmark_grams
        for r in entry_mod.q_decontaminate(spark, str(tmp_path)).collect()
    }
    assert rows == {4: 1, 9: 14}


def test_training_mix_is_map_side_and_hand_pinned(spark, sf_dir, tmp_path):
    """training_mix must be one projection+filter (no join, no agg, no
    Python, no exchange beyond the tiny-file spread), and the hash-mod
    selection + inverse-propensity weights match an independent Python
    evaluation of the same formula."""
    import pandas as pd

    plan = (
        entry_mod.q_training_mix(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Join", "Aggregate", "ArrowEvalPython", "BatchEvalPython",
                "MapInPandas", "Sort"):
        assert bad not in plan, bad
    assert plan.count("Exchange") <= 1  # _load_wide spread only

    docs = pd.DataFrame(
        {
            "doc_id": list(range(200)),
            "text": ["w"] * 200,
            "lang": (["en", "zh", "es", "de", "fr"] * 40),
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r for r in entry_mod.q_training_mix(spark, str(tmp_path)).collect()
    }
    langs = dict(zip(docs.doc_id, docs.lang))
    expected = {}
    for did in range(200):
        rate = entry_mod.TRAIN_MIX_RATES.get(langs[did], entry_mod.TRAIN_MIX_DEFAULT)
        if (did % 1000003) * 48271 % 2147483647 % 100 < rate:
            expected[did] = round(100.0 / rate, 4)
    assert set(rows) == set(expected)
    assert expected, "selection must be non-empty"
    assert len(expected) < 200, "selection must be a strict subset"
    for did, w in expected.items():
        assert rows[did].weight == w and rows[did].lang == langs[did]


def test_chunk_documents_is_pure_projection(spark, sf_dir):
    """The chunk expansion is one generator projection: no shuffle
    beyond the gated input spread, no window, no sort, no join."""
    plan = _plan(entry_mod.q_chunk_documents(spark, sf_dir))
    assert plan.count("Exchange") <= 1
    assert "Window" not in plan and "Join" not in plan
    assert "Sort" not in plan


def test_pack_sequences_shuffles_exactly_once_on_shard(spark, sf_dir):
    """Deterministic packing costs exactly ONE hash exchange (the
    shard key) plus the per-shard window sort; nothing else."""
    plan = _plan(entry_mod.q_pack_sequences(spark, sf_dir))
    shard_ex = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "shard" in l
    ]
    assert len(shard_ex) == 1, plan
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_embed_semdedup_broadcasts_dup_set_and_never_sorts_corpus(spark, sf_dir):
    """The final corpus join must be broadcast (the dup set is tiny);
    the bucketed pair join may shuffle only bucket keys, never a
    per-vector sort for ranking."""
    plan = _plan(entry_mod.q_embed_semdedup(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_audio_and_video_ingest_have_no_shuffle(spark, sf_dir):
    """Media ingest is Arrow kernels over the scan partitioning: the
    binary columns must never shuffle."""
    for q in (entry_mod.q_audio_ingest, entry_mod.q_video_ingest):
        plan = _plan(q(spark, sf_dir))
        assert plan.count("Exchange") <= 1, (q.__name__, plan)
        assert "Join" not in plan


def test_tfidf_df_side_aggregates_before_join(spark, sf_dir):
    """The zipfian df aggregation must run partial (map-side combine
    visible as two HashAggregate levels) and the tf x df join must not
    sort-merge the exploded token stream."""
    plan = _plan(entry_mod.q_tfidf_top_terms(spark, sf_dir))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_char_entropy_is_shuffle_free_and_law_pinned(spark, sf_dir, tmp_path):
    """The per-doc char histogram lives inside one array expression:
    no hash exchange, no Window.  Laws on crafted docs: uniform string
    of k distinct chars -> ln(k); single repeated char -> 0; empty
    text -> 0; mixed case matches a from-scratch Python entropy."""
    import math

    import pandas as pd

    plan = _plan(entry_mod.q_char_entropy(spark, sf_dir))
    assert "Window" not in plan
    assert "hashpartitioning" not in plan
    assert plan.count("Exchange") <= 1

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["abcd" * 25, "aaaa", "", "mississippi"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r
        for r in entry_mod.q_char_entropy(spark, str(tmp_path)).collect()
    }
    assert rows[0].n_chars == 100 and rows[0].n_distinct == 4
    assert abs(rows[0].char_entropy - math.log(4)) < 2e-6
    assert rows[1].char_entropy == 0.0 and rows[1].n_distinct == 1
    assert rows[2].n_chars == 0 and rows[2].char_entropy == 0.0
    # from-scratch reference on 'mississippi' (i:4 s:4 p:2 m:1)
    n = 11
    h = math.log(n) - sum(
        c * math.log(c) for c in (4, 4, 2, 1)
    ) / n
    assert abs(rows[3].char_entropy - h) < 2e-6


def test_spans_compact_is_shuffle_free_and_hand_pinned(spark, sf_dir, tmp_path):
    """The adjacent-text-span merge is one aggregate() fold inside a
    projection (no Window, no hash exchange); hand-pinned per
    adjacency class: text runs merge with '|', adjacent MEDIA spans
    never merge, singletons pass through, offsets re-densify."""
    import pandas as pd

    plan = _plan(entry_mod.q_spans_compact(spark, sf_dir))
    assert "Window" not in plan
    assert "hashpartitioning" not in plan
    assert plan.count("Exchange") <= 1

    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": ["x"] * 4})
    docs.to_parquet(tmp_path / "documents.parquet")
    got = {}
    for r in entry_mod.q_spans_compact(spark, str(tmp_path)).collect():
        got.setdefault(r.doc_id, []).append(
            (r.offset, r.kind, r.text, r.media_ref)
        )
    for v in got.values():
        v.sort()
    assert got[0] == [
        (0, "text", "p0.0|p0.1", None),
        (1, "media", None, "m-0-2"),
        (2, "text", "p0.3", None),
    ]
    assert got[1] == [
        (0, "media", None, "m-1-0"),
        (1, "text", "p1.1|p1.2|p1.3", None),
    ]
    assert got[2] == [
        (0, "text", "p2.0", None),
        (1, "media", None, "m-2-1"),
        (2, "media", None, "m-2-2"),
        (3, "text", "p2.3", None),
    ]
    assert got[3] == [(0, "text", "p3.0", None)]


def test_contract_audit_catches_injected_violations(spark, tmp_path):
    """Every rule fires on a crafted corpus with one violation each:
    a NULL text, a duplicate doc_id, an inconsistent n_chars, a short
    text, an off-enum lang, a non-latin lang and a bad source."""
    import pandas as pd

    long_txt = "x" * 120
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 2, 3, 4, 5, 6],
            "text": [long_txt, long_txt, long_txt, None, "short",
                     long_txt, long_txt],
            "lang": ["en", "de", "fr", "es", "en", "xx", "zh"],
            "source": ["src1", "src2", "src3", "src4", "src5", "src6",
                       "BAD7"],
            "n_chars": [120, 120, 120, 0, 5, 999, 120],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.rule: (r.n_checked, r.n_violations, r.status)
        for r in entry_mod.q_contract_audit(spark, str(tmp_path)).collect()
    }
    assert rows["not_null_text"] == (7, 1, "fail")
    assert rows["unique_doc_id"] == (7, 1, "fail")
    # NULL text: n_chars <> length(NULL) is NULL -> not counted (the
    # null rule owns that row); the 999 row is the one inconsistency
    assert rows["n_chars_matches_text"] == (7, 1, "fail")
    assert rows["min_text_len_100"] == (7, 1, "fail")  # NULL not counted
    assert rows["lang_in_enum"] == (7, 1, "fail")      # xx
    assert rows["lang_latin_script"] == (7, 2, "fail")  # xx + zh
    assert rows["source_prefix"] == (7, 1, "fail")


def test_cooccurrence_two_exchanges_no_join(spark, sf_dir):
    """The bipartite projection must stay the collect_set +
    array-expansion shape: exactly two exchanges (user_id reduce, tiny
    pair-key agg) and NO join — the naive distinct+self-join plan
    costs four exchanges and re-shuffles the corpus twice."""
    plan = _plan(entry_mod.q_cooccurrence_graph(spark, sf_dir))
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan


def test_merkle_and_interval_single_exchange(spark, sf_dir):
    """merkle_digest: commutative modular sums -> one bucket exchange
    with map-side partial agg.  interval_coverage: one user_id
    exchange feeding both the window sweep and the final reduce."""
    for q in (entry_mod.q_merkle_digest, entry_mod.q_interval_coverage):
        plan = _plan(q(spark, sf_dir))
        assert plan.count("Exchange") == 1, (q.__name__, plan)
        assert "Join" not in plan
