"""Dedup / similarity / text-analysis operator tests (training-data ops)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from building2osm_spark.operators import dedupe as D
from building2osm_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # add near-duplicates: copy of doc_id with one word changed, and an
    # exact duplicate, with shifted ids
    dup = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        "lang", "source", "n_chars",
    )
    exact = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return base.unionByName(dup).unionByName(exact).cache()


def test_exact_dedup(spark, docs):
    out = D.exact_dedup(docs)
    assert out.count() == docs.count() - 10  # the 10 exact copies collapse
    # survivors are the lowest ids
    assert out.filter(F.col("doc_id") >= 200000).count() == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = D.minhash_signatures(docs, n_hashes=64, shingle_k=3)
    pairs = D.minhash_lsh_pairs(sigs, bands=16, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every exact duplicate pair must be found (jaccard 1.0)
    for i in range(10):
        assert (i, i + 200000) in got
    # near-duplicates (one appended word) should overwhelmingly be found
    near_found = sum(1 for i in range(20) if (i, i + 100000) in got)
    assert near_found >= 17


def test_incremental_lsh_pairs(spark, docs, final_plan):
    """Standing-corpus probe: bipartite (new, old) pairs only — within-new
    and within-old dups are NEVER reported; exact copies across the
    boundary estimate 1.0; the broadcast probe leaves the index lineage
    shuffle-join-free; broadcast=False drops the forced hints."""
    base = docs.select("doc_id", "text").filter(F.col("doc_id") < 200)
    index_sigs = D.minhash_signatures(base)
    # new batch: near-dup of doc 1, exact copy of doc 2, a novel doc, and
    # TWO identical new docs (must not pair with each other)
    t1, t2 = [r.text for r in base.filter(F.col("doc_id").isin(1, 2)).orderBy("doc_id").collect()]
    new = spark.createDataFrame(
        [
            (1001, t1 + " tailword"),
            (1002, t2),
            (1003, "totally novel stream of unseen tokens qqq www eee"),
            (1004, "identical new document content right here exactly"),
            (1005, "identical new document content right here exactly"),
        ],
        schema="doc_id long, text string",
    )
    new_sigs = D.minhash_signatures(new)
    pairs = D.incremental_lsh_pairs(new_sigs, index_sigs, bands=16, threshold=0.5)
    rows = pairs.collect()
    got = {(r.new_id, r.old_id) for r in rows}
    est = {(r.new_id, r.old_id): r.est_jaccard for r in rows}
    assert (1002, 2) in got and est[(1002, 2)] == 1.0  # exact cross copy
    assert (1001, 1) in got  # near-dup found
    new_ids = {1001, 1002, 1003, 1004, 1005}
    assert all(n in new_ids and o not in new_ids for n, o in got)
    assert not any(n in (1004, 1005) for n, _ in got)  # within-new invisible
    assert not any(n == 1003 for n, _ in got)  # novel doc matches nothing

    # broadcast probe: no shuffle joins anywhere in the final plan — the
    # index side is scanned map-only into BroadcastHashJoins
    final = final_plan(pairs)
    assert "SortMergeJoin" not in final and "ShuffledHashJoin" not in final

    plain = D.incremental_lsh_pairs(
        new_sigs, index_sigs, bands=16, threshold=0.5, broadcast=False
    )
    assert "UnresolvedHint" not in plain._jdf.queryExecution().logical().toString()
    assert {(r.new_id, r.old_id) for r in plain.collect()} == got


def test_minhash_kernel_equivalence(spark, docs):
    """arrow (default) and native signature kernels are bit-identical —
    same int64 arithmetic, numpy reduceat vs array_min(transform(...));
    covers both base hashes (the kernel only sees the bases arrays) and
    short docs (< k words → whole-doc fold branch)."""
    short = spark.createDataFrame(
        [("s1", "one"), ("s2", "two words"), ("s3", "exactly three words")],
        schema="doc_id string, text string",
    )
    docs_long = docs.select("doc_id", "text").limit(500)  # bigint ids
    for base_hash in ("md5", "xxhash64"):
        for frame in (docs_long, short):  # covers long + string id types
            arrow = D.minhash_signatures(frame, base_hash=base_hash, kernel="arrow")
            native = D.minhash_signatures(frame, base_hash=base_hash, kernel="native")
            diff = (
                arrow.alias("a")
                .join(native.alias("n"), "doc_id", "full")
                .where(
                    F.col("a.sig").isNull()
                    | F.col("n.sig").isNull()
                    | (F.col("a.sig") != F.col("n.sig"))
                )
                .count()
            )
            assert diff == 0, (base_hash, frame.columns)
    with pytest.raises(ValueError):
        D.minhash_signatures(docs_long, kernel="bogus")


def test_exact_jaccard_verification(spark, docs):
    sigs = D.minhash_signatures(docs, n_hashes=64)
    pairs = D.minhash_lsh_pairs(sigs, bands=16, threshold=0.5)
    verified = D.ngram_jaccard(docs, pairs.select("id_a", "id_b"))
    rows = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    for i in range(10):
        assert rows[(i, i + 200000)] == pytest.approx(1.0)
    for (a, b), j in rows.items():
        assert 0.0 <= j <= 1.0


def test_simhash_identical_and_near(spark, docs):
    sims = D.simhash(docs)
    pairs = D.simhash_near_pairs(sims, max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for i in range(10):
        assert got.get((i, i + 200000)) == 0


def test_image_table_scan_prunes_binary_column(spark, tmp_path):
    """North-star contract: assigning the input_hint image table to tiles
    must read ONLY image_id from parquet — the binary payload column
    never leaves disk (column pruning visible in the scan's ReadSchema)."""
    from building2osm_spark.operators.cover_join import assign_points_to_polygons
    from building2osm_spark.plans.pipeline import with_location
    from building2osm_spark.sources import fixtures as FX

    path = str(tmp_path / "imgs.parquet")
    FX.spark_images(spark, 50).write.parquet(path)
    located = with_location(spark.read.parquet(path).select("image_id"))
    subs = FX.spark_subdivisions(spark, 2, 2)
    assigned = assign_points_to_polygons(
        located.select("image_id", "lon", "lat"),
        subs.select(F.col("name").alias("poly_id"), "geometry"),
        multipolygon=True,
        broadcast=True,
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    for ln in scan:
        assert "bytes" not in ln and "caption" not in ln, ln
        assert "image_id" in ln
    assert assigned.count() > 0


def test_cross_doc_ngram_profile(spark, docs):
    """Exact duplicates share every 8-gram (fraction 1.0); near-dups (one
    appended word) share all but the tail windows."""
    prof = D.cross_doc_ngram_profile(docs, ngram=8)
    rows = {r["doc_id"]: r for r in prof.collect()}
    for i in range(10):
        assert rows[i]["dup_fraction"] == 1.0
        assert rows[i + 200000]["dup_fraction"] == 1.0
    for i in range(20):
        assert rows[i + 100000]["dup_fraction"] > 0.8
        assert rows[i + 100000]["dup_ngrams"] < rows[i + 100000]["n_ngrams"]


def test_winnow_fingerprints_match_bruteforce(spark):
    """The native window-min selection equals a straight Python
    reimplementation of winnowing's fingerprint VALUE set (minima of
    every w-window of n-gram hashes, distinct), including the
    short-document single-minimum rule — over corpora with repeated
    n-grams (ties inside windows) and adversarial monotone word runs."""
    import hashlib
    import random

    ngram, w = 3, 4

    def base60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % D._MERSENNE

    def brute(text: str) -> set:
        ws = text.lower().split()
        if len(ws) < ngram:
            grams = [" ".join(ws)]
        else:
            grams = [" ".join(ws[i : i + ngram]) for i in range(len(ws) - ngram + 1)]
        hs = [base60(g) for g in grams]
        if len(hs) < w:
            return {min(hs)}
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]  # small vocab → repeated grams
    texts = [" ".join(rng.choices(vocab, k=rng.randint(1, 60))) for _ in range(40)]
    texts += [" ".join(f"w{i}" for i in range(25))]  # monotone run
    texts += ["one two"]  # shorter than ngram
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id long, text string"
    )
    got = {}
    for r in D.winnow_fingerprints(df, ngram=ngram, window=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["__h"])
    assert got == {i: brute(t) for i, t in enumerate(texts)}

    # the Arrow sliding_window_view kernel (checkpoint-free variant) must
    # select the identical fingerprint value sets
    got_arrow = {}
    for r in D.winnow_fingerprints(df, ngram=ngram, window=w, kernel="arrow").collect():
        got_arrow.setdefault(r["doc_id"], set()).add(r["__h"])
    assert got_arrow == got


def test_winnow_coverage_guarantee(spark):
    """The absolute coverage property: any two documents sharing a run of
    ≥ window+ngram-1 words share at least one fingerprint — for MINIMAL
    shared runs planted in otherwise-disjoint random text (several seeds),
    which hash-mod sampling would miss with probability (1-1/m)^k."""
    import random

    ngram, w = 8, 8
    run_words = w + ngram - 1  # exactly the guarantee threshold
    rows = []
    for seed in range(10):
        rng = random.Random(seed)
        run = [f"s{seed}r{j}" for j in range(run_words)]
        a = [f"s{seed}a{j}" for j in range(rng.randint(0, 40))] + run + [
            f"s{seed}A{j}" for j in range(rng.randint(0, 40))
        ]
        b = [f"s{seed}b{j}" for j in range(rng.randint(0, 40))] + run + [
            f"s{seed}B{j}" for j in range(rng.randint(0, 40))
        ]
        rows.append((2 * seed, " ".join(a)))
        rows.append((2 * seed + 1, " ".join(b)))
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    fps = {}
    for r in D.winnow_fingerprints(df, ngram=ngram, window=w).collect():
        fps.setdefault(r["doc_id"], set()).add(r["__h"])
    for seed in range(10):
        assert fps[2 * seed] & fps[2 * seed + 1], f"seed {seed}: no shared fingerprint"
    # and the profile flags every planted pair as duplicated
    prof = {r["doc_id"]: r for r in D.winnowed_ngram_profile(df, ngram=ngram, window=w).collect()}
    assert all(prof[i]["dup_fingerprints"] >= 1 for i in range(20))


def test_simhash_nested_equals_single_level(spark, docs):
    """The two-level pigeonhole (nested=True) must return exactly the
    single-level pair set — recall is provably identical; only the
    candidate fan-in differs."""
    sims = D.simhash(docs)
    single = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_near_pairs(sims, max_hamming=3).collect()
    }
    nested = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_near_pairs(sims, max_hamming=3, nested=True).collect()
    }
    assert nested == single and single


def test_hamming_pairs_match_bruteforce_random(spark):
    """Exact-recall property on a random LOW-ENTROPY hash corpus (ANDed
    randoms concentrate bits like real perceptual hashes): the chunk
    pigeonhole — single-level and nested — returns exactly the brute-force
    hamming-ball pair set for several distances."""
    rng = np.random.default_rng(123)
    h = rng.integers(0, 2**62, 300, dtype=np.int64) & rng.integers(
        0, 2**62, 300, dtype=np.int64
    )
    sims = spark.createDataFrame(
        [(f"{i:04d}", int(v)) for i, v in enumerate(h)], "doc_id string, simhash long"
    )
    x = h[:, None].astype(np.uint64) ^ h[None, :].astype(np.uint64)
    pc = np.array([bin(v).count("1") for v in range(256)], dtype=np.int64)
    ham = sum(
        pc[((x >> np.uint64(s)) & np.uint64(255)).astype(np.int64)]
        for s in range(0, 64, 8)
    )

    def brute(d):
        return {
            (f"{i:04d}", f"{j:04d}")
            for i in range(300)
            for j in range(i + 1, 300)
            if ham[i, j] <= d
        }

    for d, nested in ((1, False), (2, True), (3, True), (4, False)):
        got = {
            (r.id_a, r.id_b)
            for r in D.simhash_near_pairs(sims, max_hamming=d, nested=nested).collect()
        }
        assert got == brute(d), (d, nested, len(got))


def test_phash_near_dup_planted_recall(spark):
    """Planted image near-dups (lossy qraw re-encode of the block head)
    are all recovered by the nested hamming join over the phash column;
    the textured corpus has no chance pairs at this threshold."""
    from building2osm_spark.sources.fixtures import distributed_image_near_dups

    imgs = distributed_image_near_dups(spark, 1000, dup_every=10)
    sims = imgs.select(
        F.col("image_id").alias("doc_id"), F.col("phash").alias("simhash")
    )
    pairs = D.simhash_near_pairs(sims, max_hamming=3, nested=True).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    planted = {
        (f"img_{b:012d}", f"img_{b + 9:012d}") for b in range(0, 1000, 10)
    }
    assert planted <= got, planted - got
    # no background near-pairs on the textured corpus (phash ~uniform)
    assert got == planted, got - planted


def test_image_near_dup_generator_deterministic(spark):
    """Executor-side generation is a pure function of the id: any
    partitioning yields the same rows as the driver-side builder."""
    from building2osm_spark.sources.fixtures import (
        distributed_image_near_dups,
        image_near_dup_pdf_for_ids,
    )

    got = (
        distributed_image_near_dups(spark, 120, dup_every=10)
        .orderBy("image_id")
        .toPandas()
    )
    want = image_near_dup_pdf_for_ids(list(range(120)), dup_every=10)
    assert got["image_id"].tolist() == want["image_id"].tolist()
    assert got["phash"].tolist() == want["phash"].tolist()
    assert got["fmt"].tolist() == want["fmt"].tolist()
    assert [bytes(x) for x in got["bytes"]] == [bytes(x) for x in want["bytes"]]
    assert got["caption"].tolist() == want["caption"].tolist()
    # planted rows share the head's caption and pixels, not its bytes:
    # heads are always lossless (raw/bmp) and dups qraw, so every planted
    # pair is a genuine lossy re-encode, never an exact byte duplicate
    for b in range(0, 120, 10):
        assert want.loc[b + 9, "caption"] == want.loc[b, "caption"]
        assert want.loc[b + 9, "fmt"] == "qraw"
        assert want.loc[b, "fmt"] in ("raw", "bmp")
        assert bytes(want.loc[b + 9, "bytes"]) != bytes(want.loc[b, "bytes"])


def test_cosine_topk_brute_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    got = S.cosine_topk_bruteforce(queries, corpus, k=5).collect()

    pdf = emb.toPandas()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.c_id))
    for q in range(10):
        qi = np.where(ids == q)[0][0]
        sims = Xn @ Xn[qi]
        order = np.lexsort((ids, -sims))
        want = [int(ids[j]) for j in order[:5]]
        gotl = [c for _, c in sorted(by_q[q])]
        assert gotl == want, f"q={q}: {gotl} != {want}"


def test_ivf_recall_vs_brute(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    brute = S.cosine_topk_bruteforce(queries, corpus, k=5).collect()
    # random 64-d vectors are IVF's worst case (no cluster structure):
    # probe half the lists for a meaningful recall bound
    ivf = S.cosine_topk_ivf(queries, corpus, k=5, n_centroids=16, nprobe=8).collect()
    b = {}
    for r in brute:
        b.setdefault(r.q_id, set()).add(r.c_id)
    v = {}
    for r in ivf:
        v.setdefault(r.q_id, set()).add(r.c_id)
    recalls = [len(b[q] & v.get(q, set())) / 5 for q in b]
    assert np.mean(recalls) >= 0.85, np.mean(recalls)


def test_text_functions(spark, docs):
    from building2osm_spark.functions import text as TX

    out = docs.select(
        "doc_id", "lang",
        TX.token_count_ws(F.col("text")).alias("n_tok"),
        TX.language_id(F.col("text")).alias("lang_guess"),
        TX.quality_score(F.col("text")).alias("q"),
        TX.doc_fingerprint(F.col("text")).alias("fp"),
    )
    rows = out.collect()
    for r in rows:
        assert r.n_tok > 0
        assert 0.0 <= r.q <= 1.0
    # fingerprints of distinct texts differ (sample)
    fps = [r.fp for r in rows[:50]]
    assert len(set(fps)) > 40
    # the fixture 'en' documents contain 'the'/'a' fillers: language_id
    # should mostly agree on en docs
    en = [r for r in rows if r.lang == "en"]
    hit = sum(1 for r in en if r.lang_guess == "en") / len(en)
    assert hit > 0.8

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # all native


def test_pii_scrub_and_urls(spark):
    """PII scrub/count + URL extraction: literal edge rows, expected
    values computed independently with Python re (same regex subset),
    scrub ORDER pinned (email eats its digits before the ipv4 pass),
    all-native plan."""
    import re

    from building2osm_spark.functions import text as TX

    rows = [
        (0, "mail a1.2.3.4@x.io and ip 1.2.3.4"),          # email-before-ip order
        (1, "two a@b.org c.d+e@f.co.uk emails"),            # multiple, +/. locals
        (2, "call +47 22 12 34 56 or +33 11 22 33 44 now"),
        (3, "bare 10.0.0.1 10.0.0.2, text."),                # adjacent IPs, comma edge
        (4, ""),                                              # empty
        (5, None),                                            # null text
        (6, "see https://a.example.com/p/1 http://b.net end"),
        (7, "no pii at all"),
        (8, "v1.2.3 is not an ip, u@x is not an email"),      # 3-part version, no TLD
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = df.select(
        "doc_id",
        TX.pii_counts(F.col("text"))[0].alias("n_emails"),
        TX.pii_counts(F.col("text"))[1].alias("n_ips"),
        TX.pii_counts(F.col("text"))[2].alias("n_phones"),
        TX.scrub_pii(F.col("text")).alias("scrubbed"),
        TX.extract_urls(F.col("text")).alias("urls"),
    )
    got = {r.doc_id: r for r in out.collect()}

    for doc_id, text in rows:
        r = got[doc_id]
        if text is None:
            assert r.n_emails is None and r.scrubbed is None and r.urls is None
            continue
        assert r.n_emails == len(re.findall(TX.PII_EMAIL, text)), doc_id
        want_scrub = re.sub(
            TX.PII_PHONE, "<PHONE>",
            re.sub(TX.PII_IPV4, "<IP>", re.sub(TX.PII_EMAIL, "<EMAIL>", text)),
        )
        assert r.scrubbed == want_scrub, (doc_id, r.scrubbed, want_scrub)
        assert list(r.urls) == re.findall(TX.URL_PATTERN, text), doc_id

    # the order contract: the email's digits never surface as an IP …
    assert got[0].n_ips == 1 and got[0].scrubbed.count("<IP>") == 1
    assert "<EMAIL>" in got[0].scrubbed
    # … and a dotted version string / TLD-less local is NOT PII
    assert got[8].n_emails == 0 and got[8].n_ips == 0

    domains = df.filter(F.col("doc_id") == 6).select(
        F.explode(TX.extract_urls(F.col("text"))).alias("url")
    ).select(TX.url_domain(F.col("url")).alias("d")).collect()
    assert sorted(x.d for x in domains) == ["a.example.com", "b.net"]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # all native


def test_pair_components_and_keep_best(spark, monkeypatch):
    """Generic pair-graph clustering + keep-best canonicalization:
    driver union-find ≡ distributed min-label propagation (chain graph,
    diameter 4), singleton passthrough, rank + tie rules."""
    from building2osm_spark.operators import dedupe as DDm

    # chain 1-2-3-4-5 plus pair (10,11); 20 is unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        schema="id_a long, id_b long",
    )
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}

    got_driver = {
        r.node: r.cluster for r in DDm.pair_components(pairs).collect()
    }
    assert got_driver == expected

    monkeypatch.setattr(DDm, "_CLUSTER_DRIVER_MAX", 0)
    got_dist = {r.node: r.cluster for r in DDm.pair_components(pairs).collect()}
    assert got_dist == expected
    # non-convergence raises rather than splitting (diameter 4 > 2*1)
    with pytest.raises(RuntimeError, match="did not converge"):
        DDm.pair_components(pairs, max_iter=1)
    monkeypatch.undo()

    docs = spark.createDataFrame(
        [(1, 5, "a"), (2, 9, "b"), (3, 9, "c"), (4, 2, "d"), (5, 1, "e"),
         (10, 7, "f"), (11, 7, "g"), (20, 3, "h")],
        schema="doc_id long, score long, payload string",
    )
    kept = DDm.dedup_keep_best(docs, pairs, rank_col="score").collect()
    by_cluster = {r.cluster: r for r in kept}
    assert set(by_cluster) == {1, 10, 20}
    # cluster 1: max score 9 tied between docs 2 and 3 → lowest id wins
    assert by_cluster[1].doc_id == 2 and by_cluster[1].cluster_size == 5
    # cluster 10: tie at score 7 → doc 10
    assert by_cluster[10].doc_id == 10 and by_cluster[10].cluster_size == 2
    # singleton passthrough keeps payload columns
    assert by_cluster[20].doc_id == 20 and by_cluster[20].cluster_size == 1
    assert by_cluster[20].payload == "h"


def test_deterministic_sampling(spark, docs):
    """Content-addressed sampling: partitioning-independent selection,
    map-only fraction plan, exact per-stratum caps, salt decorrelation."""
    from building2osm_spark.operators.sampling import (
        deterministic_sample,
        stratified_cap,
    )

    s1 = deterministic_sample(docs.repartition(13), "doc_id", 0.3, salt="t")
    s2 = deterministic_sample(docs.repartition(3), "doc_id", 0.3, salt="t")
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2 and ids1  # same rows under any partitioning
    n = docs.count()
    assert 0.15 * n < len(ids1) < 0.45 * n  # ~fraction, not degenerate

    # different salt → a different (decorrelated) draw
    ids3 = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.3, salt="u")
        .select("doc_id")
        .collect()
    }
    assert ids3 != ids1

    # fraction form is map-only native (no exchange, no Python)
    plan = (
        deterministic_sample(docs, "doc_id", 0.3, salt="t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan

    capped = stratified_cap(docs, "lang", cap=7, key="doc_id", salt="c")
    per = {r.lang: r.n for r in capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, cnt in per.items():
        assert cnt == min(7, full[lang]), (lang, cnt)
    # deterministic selection: same rows on a re-run over shuffled input
    a = sorted(r.doc_id for r in capped.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in stratified_cap(docs.repartition(11), "lang", cap=7, key="doc_id", salt="c")
        .select("doc_id")
        .collect()
    )
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)
    with _pytest.raises(ValueError):
        stratified_cap(docs, "lang", cap=0, key="doc_id")


def test_split_assign(spark, docs, final_plan):
    """Hash-boundary split assignment: disjoint + exhaustive, stable
    under repartitioning, consistent with deterministic_sample's draw
    on the same salt (split boundaries partition one hash), map-only."""
    import pytest as _pytest

    from building2osm_spark.operators.sampling import (
        deterministic_sample,
        split_assign,
    )

    out = split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s")
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == docs.count()  # exhaustive: every row gets a split
    got = {r.doc_id: r.split for r in rows}
    # partitioning-independent
    got2 = {
        r.doc_id: r.split
        for r in split_assign(
            docs.repartition(7), "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], salt="s"
        ).select("doc_id", "split").collect()
    }
    assert got == got2
    assert {"train", "val", "test"} == set(got.values())
    # the first split IS deterministic_sample's selection at the same salt
    train_ids = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.8, salt="s").select("doc_id").collect()}
    assert train_ids == {d for d, s in got.items() if s == "train"}
    final = final_plan(out)
    assert "Exchange" not in final and "Python" not in final
    with _pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, "doc_id", {"a": 0.5, "b": 0.4})
    with _pytest.raises(ValueError, match="resolution"):
        split_assign(docs, "doc_id", {"a": 0.0000001, "b": 0.9999999})
    with _pytest.raises(ValueError, match="already exists"):
        split_assign(docs, "doc_id", {"a": 0.5, "b": 0.5}, out_col="lang")
    with _pytest.raises(ValueError, match="at least 2"):
        split_assign(docs, "doc_id", {"a": 1.0})


def test_mixture_sample(spark, final_plan):
    """Mixture rebalancing: the limiting source (min n/w, exact rational)
    keeps ALL rows, others keep floor-exact fractions; the kept set is a
    Python-recomputable pure function of (key, salt); filter stage is
    map-only; contract violations raise loudly."""
    import hashlib

    import pytest as _pytest

    from building2osm_spark.operators.sampling import mixture_sample

    # A: n=40 w=2 (ratio 20); B: n=20 w=2 (ratio 10); C: n=10 w=1 (ratio 10)
    # -> limiting ratio 10 (B/C tied): B and C keep everything, A keeps
    # threshold 20*2*1e6 // (2*40) = 500000 (expected ~half).
    rows = (
        [(i, "A") for i in range(40)]
        + [(100 + i, "B") for i in range(20)]
        + [(200 + i, "C") for i in range(10)]
    )
    df = spark.createDataFrame(rows, schema="doc_id long, source string")
    weights = {"A": 2, "B": 2, "C": 1}
    out = mixture_sample(df, "source", weights, key="doc_id", salt="mx")
    got = {(r.doc_id, r.source) for r in out.collect()}

    def accepted(doc_id, t):
        h = int(hashlib.md5(f"{doc_id}mx".encode()).hexdigest()[:15], 16)
        return h % 1_000_000 < t

    expect = {
        (d, s)
        for d, s in rows
        if accepted(d, {"A": 500_000, "B": 1_000_000, "C": 1_000_000}[s])
    }
    assert got == expect
    per = {s: 0 for s in weights}
    for _, s in got:
        per[s] += 1
    assert per["B"] == 20 and per["C"] == 10  # limiting sources: no loss
    assert 0 < per["A"] < 40  # strictly down-sampled

    # partitioning independence
    got2 = {
        (r.doc_id, r.source)
        for r in mixture_sample(
            df.repartition(7), "source", weights, key="doc_id", salt="mx"
        ).collect()
    }
    assert got2 == got

    # the corpus-side filter is map-only native (counts collect aside)
    final = final_plan(out)
    assert "Exchange" not in final and "Python" not in final

    with _pytest.raises(ValueError, match="without a weight"):
        mixture_sample(df, "source", {"A": 2, "B": 2}, key="doc_id")
    with _pytest.raises(ValueError, match="absent from the corpus"):
        mixture_sample(df, "source", dict(weights, D=1), key="doc_id")
    with _pytest.raises(ValueError, match="positive int"):
        mixture_sample(df, "source", {"A": 2.0, "B": 2, "C": 1}, key="doc_id")
    with _pytest.raises(ValueError, match="NULL source"):
        nul = spark.createDataFrame(
            [(1, None), (2, "A")], schema="doc_id long, source string"
        )
        mixture_sample(nul, "source", {"A": 1}, key="doc_id")
    with _pytest.raises(ValueError, match="max_sources"):
        mixture_sample(df, "source", weights, key="doc_id", max_sources=2)


def test_epoch_shuffle(spark, docs, final_plan):
    """Deterministic global shuffle: pos is exactly [0, N) in ascending
    (hash, key) order; independent of input partitioning and of
    n_shards (hash-range sharding preserves global order); shards are
    the non-decreasing hash-prefix; one full-data Exchange + a
    broadcast offsets join; contract violations raise loudly."""
    import hashlib

    import pytest as _pytest

    from building2osm_spark.operators.sampling import epoch_shuffle

    out = epoch_shuffle(docs, "doc_id", salt="e", n_shards=8)
    rows = sorted(out.select("doc_id", "shard", "pos").collect(), key=lambda r: r.pos)
    n = docs.count()
    assert [r.pos for r in rows] == list(range(n))  # contiguous [0, N)

    # pos order == brute-force (md5-60bit, key) order recomputed in Python
    def h(doc_id):
        return int(hashlib.md5(f"{doc_id}e".encode()).hexdigest()[:15], 16)

    ids_by_pos = [r.doc_id for r in rows]
    assert ids_by_pos == sorted(ids_by_pos, key=lambda d: (h(d), d))
    assert ids_by_pos != sorted(ids_by_pos)  # it IS a shuffle

    # shard = top-3 hash bits, non-decreasing along pos (range sharding)
    assert [r.shard for r in rows] == [h(d) >> 57 for d in ids_by_pos]
    assert [r.shard for r in rows] == sorted(r.shard for r in rows)

    # n_shards- and partitioning-independent
    one = {
        (r.doc_id, r.pos)
        for r in epoch_shuffle(docs, "doc_id", salt="e", n_shards=1).collect()
    }
    rep = {
        (r.doc_id, r.pos)
        for r in epoch_shuffle(
            docs.repartition(7), "doc_id", salt="e", n_shards=8
        ).collect()
    }
    assert one == rep == {(r.doc_id, r.pos) for r in rows}

    # plan: broadcast offsets join; the only hash Exchange is the shard
    # shuffle (it sits behind the localCheckpoint; the final plan must
    # not add another full-data exchange) and no Python on the data path
    final = final_plan(out)
    assert "BroadcastHashJoin" in final
    assert "Exchange hashpartitioning" not in final and "Python" not in final

    # empty input -> empty output, schema intact
    empty = epoch_shuffle(docs.filter(F.col("doc_id") < 0), "doc_id", n_shards=4)
    assert empty.count() == 0
    assert empty.columns == docs.columns + ["shard", "pos"]

    with _pytest.raises(ValueError, match="power of two"):
        epoch_shuffle(docs, "doc_id", n_shards=3)
    with _pytest.raises(ValueError, match="power of two"):
        epoch_shuffle(docs, "doc_id", n_shards=0)
    with _pytest.raises(ValueError, match="already exists"):
        epoch_shuffle(docs, "doc_id", pos_col="lang")
    with _pytest.raises(ValueError, match="must differ"):
        epoch_shuffle(docs, "doc_id", pos_col="p", shard_col="p")
    with _pytest.raises(ValueError, match="reserved"):
        epoch_shuffle(docs.withColumn("__h", F.lit(1)), "doc_id")
    with _pytest.raises(ValueError, match="non-null key"):
        nul = spark.createDataFrame(
            [(1,), (None,)], schema="doc_id long"
        )
        epoch_shuffle(nul, "doc_id", n_shards=2)


def test_ivf_4096_centroids_broadcast_kernel(spark):
    """VERDICT #10: IVF beyond the literal-centroid limit — 4096 centroids
    route through the broadcast numpy kernel; on a clustered corpus the
    probed search keeps high recall vs brute force."""
    rng = np.random.default_rng(11)
    n_clusters, per, dim = 4096, 2, 32
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per, axis=0) + 0.01 * rng.standard_normal(
        (n_clusters * per, dim)
    )
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(pts)],
        schema="vec_id long, embedding array<double>",
    ).cache()
    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))

    exact = S.cosine_topk_bruteforce(queries, corpus, k=2)
    got = S.cosine_topk_ivf(
        queries, corpus, k=2, n_centroids=4096, nprobe=16,
        # train on the full table: 8192 rows, sample widened automatically
        centroids=S.train_ivf_centroids(
            emb, 4096, sample=8192, iters=3
        ),
    )
    want_pairs = {(r.q_id, r.c_id) for r in exact.collect()}
    got_pairs = {(r.q_id, r.c_id) for r in got.collect()}
    recall = len(want_pairs & got_pairs) / len(want_pairs)
    assert recall >= 0.9, f"recall {recall}"


def test_distributed_documents_planted_recall(spark):
    """Executor-side corpus generator: deterministic under partitioning,
    and MinHash+LSH recovers exactly the planted near-dup pairs at 20k
    docs (everything non-planted is pairwise-independent, Jaccard ~ 0)."""
    from building2osm_spark.sources.fixtures import (
        distributed_documents,
        documents_rows_for_ids,
    )

    n = 20_000
    docs_d = distributed_documents(spark, n)
    # partitioning independence
    alt = (
        spark.range(n).repartition(13)
        .mapInPandas(
            lambda it: (documents_rows_for_ids(p["id"].values) for p in it),
            schema="doc_id string, text string",
        )
    )
    assert docs_d.exceptAll(alt).count() == 0
    sigs = D.minhash_signatures(docs_d, base_hash="xxhash64")
    pairs = D.minhash_lsh_pairs(sigs, bands=16, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {
        (f"doc_{i-1:010d}", f"doc_{i:010d}")
        for i in range(10, n, 10)
    }
    assert got == planted


def test_ivf_prebuilt_index_matches_inline(spark):
    """ivf_index() + indexed probing returns exactly the inline-index
    results (same centroids), at UDF-kernel centroid counts (>64)."""
    from building2osm_spark.sources.fixtures import distributed_embeddings

    corpus = distributed_embeddings(spark, 4000, n_clusters=32).select(
        F.col("emb_id").alias("c_id"), F.col("embedding").alias("c_vec")
    ).localCheckpoint(eager=True)
    queries = corpus.filter(F.col("c_id") < 10).select(
        F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec")
    )
    cent = S.train_ivf_centroids(
        corpus.select(F.col("c_vec").alias("embedding")), n_centroids=128
    )
    idx = S.ivf_index(corpus, cent)
    a = S.cosine_topk_ivf(
        queries, corpus, k=5, centroids=cent, nprobe=8, indexed=idx
    ).select("q_id", "c_id", "rank")
    b = S.cosine_topk_ivf(
        queries, corpus, k=5, centroids=cent, nprobe=8
    ).select("q_id", "c_id", "rank")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_minhash_signature_plan_is_map_only(spark, docs):
    """Scale contract: the signature computation never shuffles or
    aggregates, for BOTH kernels. The arrow default is Scan -> Project
    (bases) -> one MapInArrow node; the native form is one Project over
    the scan with no Python/Arrow eval node at all."""
    base = docs.select("doc_id", "text")
    arrow = D.minhash_signatures(base, base_hash="xxhash64")
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
    assert plan.count("MapInArrow") == 1  # exactly one kernel boundary
    native = D.minhash_signatures(base, base_hash="xxhash64", kernel="native")
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
    assert "Python" not in plan and "Arrow" not in plan  # all-JVM hot path


def test_simhash_plan_is_map_only(spark, docs):
    sims = D.simhash(docs.select("doc_id", "text"), base_hash="xxhash64")
    plan = sims._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
    assert "Python" not in plan


def test_simhash_spreads_single_partition_input(spark, docs):
    """An under-parallel input (one scan task, e.g. a single-row-group
    parquet file) is fanned out so the 64-fold pack parallelizes: exactly
    one round-robin Exchange, values identical to the map-only form."""
    base = docs.select("doc_id", "text")
    narrow = base.coalesce(1)
    sims = D.simhash(narrow, base_hash="xxhash64")
    plan = sims._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "roundrobin" in plan.lower()
    wide = {(r["doc_id"], r["simhash"]) for r in D.simhash(base, base_hash="xxhash64").collect()}
    got = {(r["doc_id"], r["simhash"]) for r in sims.collect()}
    assert got == wide


def test_null_text_documents_are_dropped_not_zero_hashed(spark):
    """NULL-text docs must vanish from both hash families (the explode
    forms dropped them; packing 0 would pair all NULL docs as dups)."""
    df = spark.createDataFrame(
        [("a", "hello world foo"), ("b", None), ("c", None)],
        schema="doc_id string, text string",
    )
    sims = D.simhash(df, base_hash="xxhash64")
    assert sims.count() == 1 and sims.first()["doc_id"] == "a"
    sigs = D.minhash_signatures(df, base_hash="xxhash64")
    assert sigs.count() == 1 and sigs.first()["doc_id"] == "a"
    sigs_md5 = D.minhash_signatures(df)
    assert sigs_md5.count() == 1


def test_decontaminate_planted(spark):
    """Planted contamination: benchmark doc B's text appears verbatim
    inside corpus doc 1 (7 shared 4-grams of the 10-word passage), doc 2
    shares a single 4-gram (below min_overlap=2), doc 3 shares none, and
    the short-doc branch (benchmark doc shorter than ngram -> whole-text
    gram) flags an exact short copy."""
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words {passage} outro words"),
            (2, "unrelated text alpha beta gamma delta nothing else here"),
            (3, "completely different content with no shared phrases at all"),
            (4, "tiny doc"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, passage), (101, "tiny doc")], "doc_id long, text string"
    )
    out = D.decontaminate(corpus, bench, ngram=4, min_overlap=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}  # NULL text dropped
    assert rows[1]["contaminated_ngrams"] == 7 and rows[1]["contaminated"]
    assert rows[2]["contaminated_ngrams"] == 1 and not rows[2]["contaminated"]
    assert rows[3]["contaminated_ngrams"] == 0 and not rows[3]["contaminated"]
    # short-doc whole-text gram: 1 hit, below min_overlap=2
    assert rows[4]["contaminated_ngrams"] == 1 and not rows[4]["contaminated"]
    # xxhash64 fast path: identical counts (collision-equivalent domain)
    out2 = D.decontaminate(corpus, bench, ngram=4, min_overlap=2,
                           base_hash="xxhash64")
    rows2 = {r["doc_id"]: r["contaminated_ngrams"] for r in out2.collect()}
    assert rows2 == {k: r["contaminated_ngrams"] for k, r in rows.items()}


def test_decontaminate_broadcasts_benchmark(spark, docs):
    """Scale contract: the benchmark gram set rides a BroadcastExchange;
    the corpus side reaches the join without any shuffle exchange."""
    bench = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    out = D.decontaminate(docs.select("doc_id", "text"), bench, ngram=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # fact-16 guard: no implicit size(bases)>0 filter re-inlining the
    # shingle mega-expression below the Project (explode_outer, not explode)
    assert "size(transform" not in plan
    # the corpus gram stream reaches the broadcast gram join unshuffled:
    # the join's streamed branch (between the join node and its
    # BroadcastExchange build side) contains no exchange
    streamed = plan.split("BroadcastHashJoin [__h", 1)[1].split(
        "BroadcastExchange", 1
    )[0]
    assert "Exchange" not in streamed


def test_intra_doc_repetition(spark):
    out = D.intra_doc_repetition(
        spark.createDataFrame(
            [
                (1, "a b c a b c a b"),   # 3-grams: abc bca cab abc bca cab -> 3/6 distinct
                (2, "x y z w"),           # all distinct
                (3, "q q q q q"),         # one distinct gram, 3 positions
                (4, "t u"),               # short doc: whole-text gram
            ],
            "doc_id long, text string",
        ),
        ngram=3,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert (rows[1]["n_ngrams"], rows[1]["distinct_ngrams"]) == (6, 3)
    assert rows[1]["repeated_fraction"] == 1.0 - 3 / 6
    assert (rows[2]["n_ngrams"], rows[2]["distinct_ngrams"]) == (2, 2)
    assert (rows[3]["n_ngrams"], rows[3]["distinct_ngrams"]) == (3, 1)
    assert (rows[4]["n_ngrams"], rows[4]["distinct_ngrams"]) == (1, 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "HashAggregate" not in plan


@pytest.mark.parametrize("base_hash", ["md5", "xxhash64"])
def test_ngram_profile_kernel_equivalence(spark, docs, base_hash):
    """The Arrow per-doc-unique + window-count form (default) must produce
    the exact same profile as the all-JVM checkpoint+explode+distinct+join
    form, for both base hashes and under sampling (where the zero-fill
    left join must also agree)."""
    d = docs.select("doc_id", "text")
    for mod in (None, 8):
        a = D.cross_doc_ngram_profile(
            d, ngram=8, base_hash=base_hash, sample_mod=mod, kernel="arrow"
        )
        n = D.cross_doc_ngram_profile(
            d, ngram=8, base_hash=base_hash, sample_mod=mod, kernel="native"
        )
        assert a.exceptAll(n).count() == 0 and n.exceptAll(a).count() == 0
    with pytest.raises(ValueError):
        D.cross_doc_ngram_profile(d, kernel="bogus")


def test_ngram_profile_duplicate_id_contract(spark):
    """Documented contract: doc_id is the corpus KEY. On a malformed
    corpus with duplicate id rows the kernels diverge in different wrong
    directions (native silently merges the duplicates' gram sets via its
    global distinct; arrow counts each row separately and flags the id
    as a dup of itself). This test pins the documented behavior so a
    semantic change is noticed; restoring global-dedup semantics on the
    arrow path was measured-REJECTED (35-66 s vs 25-28 s native at 500k
    — see the operator docstring)."""
    base = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")],
        "doc_id long, text string",
    )
    dup = base.unionAll(base)  # malformed: every id appears twice
    a = {r["doc_id"]: r for r in
         D.cross_doc_ngram_profile(dup, ngram=8, kernel="arrow").collect()}
    n = {r["doc_id"]: r for r in
         D.cross_doc_ngram_profile(dup, ngram=8, kernel="native").collect()}
    # arrow: each row counted -> self-dup; native: merged -> no dup
    assert a[1]["dup_fraction"] == 1.0 and a[1]["n_ngrams"] == 6
    assert n[1]["dup_fraction"] == 0.0 and n[1]["n_ngrams"] == 3


def test_decontaminate_no_broadcast_escape_hatch(spark, docs):
    """broadcast=False (huge-benchmark escape hatch): identical values,
    and the forced broadcast HINT is gone from the logical plan (Catalyst
    may still auto-broadcast a tiny side — the contract is only that the
    caller can drop the unconditional hint that would OOM at ~1e8 grams)."""
    bench = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    corpus = docs.select("doc_id", "text")
    hinted = D.decontaminate(corpus, bench, ngram=8)
    plain = D.decontaminate(corpus, bench, ngram=8, broadcast=False)
    assert "UnresolvedHint" not in plain._jdf.queryExecution().logical().toString()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, hinted.collect())
    )


def test_decontaminate_empty_benchmark(spark):
    """An empty benchmark (or one with only NULL text) must flag nothing
    and still emit one zero row per corpus doc — the broadcast join gets
    an empty build side, not an error."""
    corpus = spark.createDataFrame(
        [(1, "some corpus text here okay"), (2, None)],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = D.decontaminate(corpus, empty, ngram=4).collect()
    assert {(r["doc_id"], r["contaminated_ngrams"], r["contaminated"])
            for r in out} == {(1, 0, False)}
    nulls = spark.createDataFrame([(9, None)], "doc_id long, text string")
    out2 = D.decontaminate(corpus, nulls, ngram=4).collect()
    assert {(r["doc_id"], r["contaminated_ngrams"]) for r in out2} == {(1, 0)}


def test_intra_doc_repetition_null_text_dropped(spark):
    """NULL text is no document (same contract as every profile op):
    the row is dropped, not emitted with NULL counts."""
    out = D.intra_doc_repetition(
        spark.createDataFrame(
            [(1, "a b c"), (2, None)], "doc_id long, text string"
        ),
        ngram=3,
    ).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_paragraph_dedup(spark):
    """Paragraph-level exact dedup: global first occurrence wins by
    (id, pos), empty paragraphs drop, doc losing everything survives
    with empty text, reassembly preserves in-doc order."""
    rows = [
        (1, "alpha\n\nshared\n\nbeta"),
        (2, "shared\n\ngamma\n\n\n\nalpha"),  # shared+alpha dup; empty para
        (3, "shared"),  # loses its only paragraph
        (4, "delta\n\ndelta\n\nepsilon"),  # intra-doc dup: first pos wins
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in D.paragraph_dedup(df).collect()}
    assert out[1]["text_clean"] == "alpha\n\nshared\n\nbeta"
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text_clean"] == "gamma"
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (3, 1)
    assert out[3]["text_clean"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_paras"] == 1
    assert out[4]["text_clean"] == "delta\n\nepsilon"
    assert (out[4]["n_paras"], out[4]["n_kept"]) == (3, 2)


def test_semantic_dedup(spark):
    """SemDeDup: nearest-seed bucketing, within-bucket cosine pairs,
    transitive dup groups (a~b, b~c, a!~c still one group), survivor =
    lowest id; scaled copies (cosine 1.0) always dedupe."""
    import math

    def rot(theta):  # unit vector at angle theta
        return [math.cos(theta), math.sin(theta)]

    eps = 0.01  # cos(0.01) ~ 0.99995 >= thr; cos(0.02) ~ 0.9998 < 0.9999
    rows = [
        (0, rot(0.0)),
        (1, rot(eps)),  # pair with 0
        (2, rot(2 * eps)),  # pair with 1, NOT with 0 at thr=0.9999
        (10, [0.0, 3.0]),  # other cluster, scaled
        (11, [0.0, 7.0]),  # exact direction dup of 10
        (12, rot(math.pi / 2 - 0.3)),  # same cluster, not a dup
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    seeds = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = {
        r["vec_id"]: r
        for r in S.semantic_dedup(
            df, threshold=0.9999, seeds=seeds
        ).collect()
    }
    assert set(out) == {0, 10, 12}
    assert out[0]["dup_size"] == 3 and out[0]["sem_cluster"] == 0
    assert out[10]["dup_size"] == 2 and out[10]["sem_cluster"] == 1
    assert out[12]["dup_size"] == 1 and out[12]["sem_cluster"] == 1
    assert math.cos(2 * eps) < 0.9999 < math.cos(eps)  # chain premise


def test_multimodal_near_dup(spark):
    """Joint image+caption dedup: a phash-edge (A~B) and a caption-edge
    (A~C) collapse into ONE group through A; survivor = largest w*h;
    unrelated row passes through as a singleton."""
    rows = [
        ("img_a", "the red cat sat on the mat", 0x0, 16, 16),
        ("img_b", "completely different words about boats sailing north",
         0x1, 64, 64),  # hamming(a,b)=1 -> phash edge
        ("img_c", "the red cat sat on the mat",
         0xFF00FF00FF00FF00 - (1 << 64), 32, 32),  # identical caption -> minhash edge
        ("img_d", "another unrelated sentence entirely about mountains",
         0x8888888888888888 - (1 << 64), 24, 24),
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string, phash long, w int, h int")
    out = {r["image_id"]: r for r in D.multimodal_near_dup(df).collect()}
    assert set(out) == {"img_b", "img_d"}
    assert out["img_b"]["cluster"] == "img_a"
    assert out["img_b"]["cluster_size"] == 3
    assert out["img_d"]["cluster"] == "img_d"
    assert out["img_d"]["cluster_size"] == 1
    assert "__mm_rank" not in df.columns and "__mm_rank" not in out["img_b"].asDict()


def test_pack_sequences(spark):
    """Stream-cut packing invariants: start offsets are exact prefix
    sums in (hash, id) order, seq = start // budget, docs longer than
    the budget keep one assignment, and the packing is partitioning-
    independent."""
    from building2osm_spark.operators import sampling as SP

    rows = [(i, int(t)) for i, t in enumerate([300, 300, 300, 1200, 50, 512, 1, 700])]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    out = SP.pack_sequences(
        df, 512, token_col="toks", n_shards=1, text_col=""
    ).collect()
    assert len(out) == 8 and all(r["shard"] == 0 for r in out)
    ordered = sorted(out, key=lambda r: r["start_offset"])
    cum = 0
    for r in ordered:
        assert r["start_offset"] == cum
        assert r["seq"] == cum // 512
        cum += r["n_tokens"]
    assert cum == sum(t for _, t in rows)
    out2 = SP.pack_sequences(
        df.repartition(7), 512, token_col="toks", n_shards=1, text_col=""
    ).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))
    # multi-shard: same rows, shard = hash % n_shards partitions the corpus
    out3 = SP.pack_sequences(df, 512, token_col="toks", n_shards=4, text_col="")
    assert out3.count() == 8 and out3.select("doc_id").distinct().count() == 8


def test_normalize_text(spark):
    """normalize_text == the pure-Python twin (ctrl -> NFC -> lower ->
    ws-collapse) on controls, combining marks, mixed whitespace, nulls;
    nfc=False path is all-native (no Python in the plan)."""
    import re
    import unicodedata

    from building2osm_spark.functions.text import normalize_text

    def py_norm(x):
        t = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", x)
        t = unicodedata.normalize("NFC", t).lower()
        return re.sub(r"\s+", " ", t).strip()

    samples = [
        "CAFÉ  Mixed\tCase",
        "a\x01b\x1fc\x7fd\x00e",
        "  léading  and trailing\n\n",
        "Å ring",  # A + combining ring -> Å -> å
        "",
    ]
    rows = [(i, s) for i, s in enumerate(samples)] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text(F.col("text"), nfc=True).alias("n")).collect()
    }
    for i, s in enumerate(samples):
        assert out[i] == py_norm(s), (i, out[i], py_norm(s))
    assert out[99] is None
    plan = df.select(normalize_text(F.col("text")).alias("n"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sessionize(spark, final_plan):
    """Gap rule (> gap starts new session, == gap does not), per-user
    independence, tie-break by event id, and the single-exchange plan
    (lag + running sum share one shuffle/sort)."""
    from datetime import datetime as DT

    from building2osm_spark.operators.sessions import session_stats, sessionize

    t0 = DT(2024, 1, 1, 0, 0, 0)

    def t(minutes):
        return DT(2024, 1, 1, minutes // 60, minutes % 60, 0)

    rows = [
        (1, t(0), 10, 1.0),
        (2, t(29), 10, 2.0),   # 29 min gap -> same session
        (3, t(59), 10, 3.0),   # exactly 30 min -> still same (strict >)
        (4, t(95), 10, 4.0),   # 36 min -> new session
        (5, t(0), 20, 5.0),    # other user: own numbering
        (6, t(0), 20, 6.0),    # same ts: tie-break by id, same session
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = sessionize(df, 30.0)
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1}
    stats = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(out).collect()
    }
    assert stats[(10, 1)]["n_events"] == 3 and stats[(10, 1)]["sum_cents"] == 600
    assert stats[(10, 1)]["duration_us"] == 59 * 60 * 1_000_000
    assert stats[(10, 2)]["n_events"] == 1
    assert stats[(20, 1)]["n_events"] == 2
    final = final_plan(out)
    assert final.count("Exchange") == 1, final
    assert t0  # anchor unused-var lint


def test_distinctive_terms(spark):
    """Integer tf*N//df ranking: rare terms outrank common ones, higher
    tf wins within equal df, ties break lexicographically, top-k cap."""
    from building2osm_spark.operators.terms import distinctive_terms

    rows = [
        (1, "common rare1 common zebra"),
        (2, "common common unique2"),
        (3, "common zebra apple apple"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = distinctive_terms(df, k=2)
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"]) for r in out.collect()}
    # N=3. doc1: rare1 (1*3//1=3), zebra (1*3//2=1), common (2*3//3=2)
    assert got[(1, 1)] == ("rare1", 1, 1)
    assert got[(1, 2)] == ("common", 2, 3)
    # doc3: apple tf2 df1 -> 6; zebra 1; common 1 -> tie zebra/common? common tf1*3//3=1, zebra 1*3//2=1 -> tie, 'common' < 'zebra'
    assert got[(3, 1)] == ("apple", 2, 1)
    assert got[(3, 2)] == ("common", 1, 3)
    assert (4, 1) not in got  # null text dropped
    assert max(r for (_, r) in got) <= 2


def test_bpe_pair_counts(spark, final_plan):
    """First BPE merge: pairs weighted by word frequency, one count per
    in-word position, single-char words and null text dropped, top-k
    deterministic via (cnt desc, pair asc), corpus never explodes."""
    import pytest as _pytest

    from building2osm_spark.operators.terms import bpe_pair_counts

    rows = [
        (1, "abab ab  Cd"),  # multi-space + case fold
        (2, "ab x"),  # 'x' has no pair -> dropped
        (3, None),
        (4, "aaa"),  # repeated pair counts per position: 'aa' x2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bpe_pair_counts(df, k=10)
    got = [(r.pair, r.cnt) for r in out.collect()]
    # words: abab(1) -> ab,ba,ab; ab(2) -> ab; cd(1); aaa(1) -> aa,aa
    assert got == [("ab", 4), ("aa", 2), ("ba", 1), ("cd", 1)]
    assert [(r.pair, r.cnt) for r in bpe_pair_counts(df, k=1).collect()] == [("ab", 4)]

    final = final_plan(out)
    assert "Python" not in final
    assert "TakeOrderedAndProject" in final  # top-k, not a full sort

    with _pytest.raises(ValueError, match="k must be"):
        bpe_pair_counts(df, k=0)


def test_chunk_documents(spark, final_plan):
    """Positional chunking: stride = size - overlap, full coverage,
    shorter tail, overlap shared between consecutive chunks, empty/null
    text yields nothing, map-only plan, guards raise."""
    import pytest as _pytest

    from building2osm_spark.operators.chunking import chunk_documents

    rows = [
        (1, "abcdefghij"),  # len 10
        (2, "abc"),  # shorter than size
        (3, ""),  # empty -> no chunks
        (4, None),  # null -> dropped
        (5, "abcde"),  # len == size -> exactly one chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, size=5, overlap=2)  # stride 3
    got = {
        (r.doc_id, r.chunk_idx): (r.start, r.chunk) for r in out.collect()
    }
    assert got == {
        (1, 0): (0, "abcde"),
        (1, 1): (3, "defgh"),
        (1, 2): (6, "ghij"),
        (2, 0): (0, "abc"),
        (5, 0): (0, "abcde"),
    }
    # full coverage with the declared overlap
    chunks1 = [got[(1, i)] for i in range(3)]
    text1 = rows[0][1]
    for start, chunk in chunks1:
        assert text1[start : start + 5] == chunk
    assert "".join(c[: 3] for _, c in chunks1[:-1]) + chunks1[-1][1] == text1

    final = final_plan(out)
    assert "Exchange" not in final and "Python" not in final  # map-only

    # no-overlap path
    plain = chunk_documents(df.filter("doc_id = 1"), size=4)
    assert [r.chunk for r in plain.orderBy("chunk_idx").collect()] == [
        "abcd", "efgh", "ij",
    ]

    with _pytest.raises(ValueError, match="size must be"):
        chunk_documents(df, size=0)
    with _pytest.raises(ValueError, match="overlap must be"):
        chunk_documents(df, size=4, overlap=4)
    with _pytest.raises(ValueError, match="overlap must be"):
        chunk_documents(df, size=4, overlap=-1)
    with _pytest.raises(ValueError, match="'pos' or 'col'"):
        chunk_documents(df.withColumnRenamed("doc_id", "pos"), size=4, id_col="pos")
    with _pytest.raises(ValueError, match="chunk_idx"):
        chunk_documents(df.withColumnRenamed("doc_id", "chunk"), size=4, id_col="chunk")


def test_snapshot_diff(spark, final_plan):
    """Dataset-versioning diff: all four statuses, NULL-vs-marker
    disambiguation, defaulted compare columns exclude keys, guards."""
    import pytest as _pytest

    from building2osm_spark.operators.diffs import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (3, "c", 30),  # removed
            (4, None, 40),  # null payload, unchanged
            (5, "\x00\x1f", 50),  # separator/control bytes, changes to NULL
        ],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),  # unchanged
            (2, "b", 99),  # changed
            (4, None, 40),  # unchanged (NULL == NULL payload)
            (5, None, 50),  # changed: NULL vs a control-byte STRING must differ
            (6, "f", 60),  # added
        ],
        "k long, s string, v long",
    )
    got = {r.k: r.status for r in snapshot_diff(old, new, "k").collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "changed",
        6: "added",
    }
    # explicit compare set: only s -> row 2 becomes unchanged
    got_s = {
        r.k: r.status
        for r in snapshot_diff(old, new, "k", compare_cols=["s"]).collect()
    }
    assert got_s[2] == "unchanged" and got_s[5] == "changed"

    # boundary-shift attack: ("a<SEP>b","c") vs ("a","b<SEP>c") would
    # concat identically without the length prefixes -> must be changed
    o2 = spark.createDataFrame([(1, "a\x1fb", "c")], "k long, s string, t string")
    n2 = spark.createDataFrame([(1, "a", "b\x1fc")], "k long, s string, t string")
    assert [r.status for r in snapshot_diff(o2, n2, "k").collect()] == ["changed"]

    final = final_plan(snapshot_diff(old, new, "k"))
    assert "Python" not in final

    with _pytest.raises(ValueError, match="missing key"):
        snapshot_diff(old, new.withColumnRenamed("k", "kk"), "k")
    with _pytest.raises(ValueError, match="no columns to compare"):
        snapshot_diff(old.select("k"), new.select("k"), "k")
    with _pytest.raises(ValueError, match="missing compare"):
        snapshot_diff(old, new, "k", compare_cols=["nope"])
    with _pytest.raises(ValueError, match="at least one key"):
        snapshot_diff(old, new, [])
    with _pytest.raises(ValueError, match="collides"):
        snapshot_diff(old, new, "k", status_col="k")
    with _pytest.raises(ValueError, match="reserved"):
        snapshot_diff(
            old.withColumnRenamed("k", "__d_old"),
            new.withColumnRenamed("k", "__d_old"),
            "__d_old",
        )
