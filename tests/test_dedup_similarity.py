"""Dedup + similarity operator correctness vs pure-python/numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "gallia est omnis divisa in partes tres quarum unam incolunt belgae "
        "aliam aquitani tertiam qui ipsorum lingua celtae nostra galli appellantur"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("belgae", "galli")),  # near dup of 0
        (3, "arma virumque cano troiae qui primus ab oris italiam fato profugus "
            "laviniaque venit litora multum ille et terris iactatus et alto"),
        (4, "at regina gravi iamdudum saucia cura vulnus alit venis et caeco "
            "carpitur igni multa viri virtus animo multusque recursat"),
        (5, base + " extra verba in fine posita sunt hic"),  # near dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 not in ids and 0 in ids
    assert ids == {0, 2, 3, 4, 5}


def test_minhash_pairs_and_dedup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in dedup.minhash_near_duplicates(docs, threshold=0.7).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs or (0, 5) in pairs  # near dups found
    assert not any({a, b} == {3, 4} for a, b in pairs)  # unrelated texts not paired
    kept = {r["doc_id"] for r in dedup.minhash_dedup(docs, threshold=0.7).collect()}
    assert 0 in kept and 1 not in kept and 3 in kept and 4 in kept


def test_simhash_pairs(docs):
    # 4x16-bit banding guarantees candidate generation for hamming <= 3
    # (pigeonhole); exact dups are always caught, unrelated texts never.
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_near_duplicates(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0
    assert not any({a, b} == {3, 4} for a, b in pairs)


def test_simhash_matches_numpy_oracle(docs):
    rows = docs.select("doc_id", "text").collect()
    sigs = {r["doc_id"]: dedup._simhash64(r["text"]) for r in rows}
    spark_sigs = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", dedup.simhash_udf("text").alias("s")).collect()
    }
    assert sigs == spark_sigs


def _planted_corpus(n_base=300, seed=99):
    """Distinct random-word docs + planted near-dup groups (word edits)."""
    import random

    rng = random.Random(seed)

    def words(k):
        return ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                        for _ in range(7)) for _ in range(k)]

    rows = [(i, " ".join(words(60))) for i in range(n_base)]
    nxt = n_base
    for g in range(3):  # 3 planted groups of 4 variants each
        base = words(60)
        for v in range(4):
            w = list(base)
            for pos in range(v):  # v word edits
                w[5 + 7 * pos] = f"editum{g}{v}{pos}"
            rows.append((nxt, " ".join(w)))
            nxt += 1
    return rows


def test_simhash_persist_hashes_each_doc_once(spark, tmp_path):
    """With persist_signatures (default) the band self-join reads the
    signature cache, not the text scan, on both sides: exactly one FileScan
    in the plan. Without it the aliased join branches defeat exchange reuse
    and the corpus is scanned+hashed twice -- the 2x cost this flag removes
    at scale. Results must be identical either way."""
    base = "verba multa hic posita sunt et alia verba sequuntur statim "
    rows = [(i, base + ("finis %d" % (i % 3))) for i in range(50)]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    d = spark.read.parquet(path)
    # compile the unpersisted plan FIRST: once persist() registers the
    # signature frame, the session cache manager substitutes it into any
    # later logically-matching plan, persisted flag or not
    out_n = dedup.simhash_near_duplicates(d, persist_signatures=False)
    plan_n = out_n._jdf.queryExecution().executedPlan().toString()
    out_p = dedup.simhash_near_duplicates(d, persist_signatures=True)
    plan_p = out_p._jdf.queryExecution().executedPlan().toString()
    # both join sides must read the signature cache (the cached relation
    # prints its child FileScan inline, so count cache scans, not scans)
    assert plan_p.count("InMemoryTableScan") >= 2, plan_p
    assert "InMemoryTableScan" not in plan_n and plan_n.count("FileScan") == 2
    rows_p = sorted((r.id_a, r.id_b, r.hamming) for r in out_p.collect())
    rows_n = sorted((r.id_a, r.id_b, r.hamming) for r in out_n.collect())
    assert rows_p == rows_n


def test_ngram_jaccard_persist_hashes_and_grams_once(spark, tmp_path):
    """The n-gram path needs the word-minhash signature on both band-join
    sides AND the gram array on both verify-join sides; without the persists
    that is 2 UDF passes + 4 full text scans. With them (default) all four
    branches read a cache. Results identical either way."""
    base = "verba multa hic posita sunt et alia verba sequuntur statim "
    rows = [(i, base + ("finis %d" % (i % 3))) for i in range(50)]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    d = spark.read.parquet(path)
    # unpersisted plan compiled FIRST (cache-manager substitution, see
    # test_simhash_persist_hashes_each_doc_once)
    out_n = dedup.ngram_jaccard_near_duplicates(d, persist=False)
    plan_n = out_n._jdf.queryExecution().executedPlan().toString()
    out_p = dedup.ngram_jaccard_near_duplicates(d, persist=True)
    plan_p = out_p._jdf.queryExecution().executedPlan().toString()
    assert plan_p.count("InMemoryTableScan") >= 4, plan_p
    assert "InMemoryTableScan" not in plan_n and plan_n.count("FileScan") == 4
    rows_p = sorted((r.id_a, r.id_b, r.jaccard) for r in out_p.collect())
    rows_n = sorted((r.id_a, r.id_b, r.jaccard) for r in out_n.collect())
    assert rows_p == rows_n


def test_embedding_near_dup_persist_projects_each_vector_once(spark, tmp_path):
    """Hyperplane bucket UDF must run once per embedding, not once per
    aliased self-join side: persisted plan reads the cache on both sides."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal(64)
    rows = []
    for i in range(40):
        v = rng.standard_normal(64) if i % 4 else base + rng.standard_normal(64) * 0.01
        rows.append((i, [float(x) for x in v]))
    path = str(tmp_path / "emb.parquet")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(path)
    d = spark.read.parquet(path)
    out_n = dedup.embedding_near_duplicates(d, persist_signatures=False)
    plan_n = out_n._jdf.queryExecution().executedPlan().toString()
    out_p = dedup.embedding_near_duplicates(d, persist_signatures=True)
    plan_p = out_p._jdf.queryExecution().executedPlan().toString()
    assert plan_p.count("InMemoryTableScan") >= 2, plan_p
    assert "InMemoryTableScan" not in plan_n and plan_n.count("FileScan") == 2
    rows_p = sorted((r.id_a, r.id_b, r.cosine) for r in out_p.collect())
    rows_n = sorted((r.id_a, r.id_b, r.cosine) for r in out_n.collect())
    assert rows_p == rows_n
    assert rows_p, "planted near-dup clique must produce pairs"


@pytest.mark.parametrize("blocks", [4, 6])
def test_simhash_block_banding_is_exhaustive(spark, blocks):
    """Manku block-combination banding must return EXACTLY the all-pairs
    hamming<=3 truth at any blocks setting (pigeonhole guarantee), on a
    corpus with planted near-dup cliques."""
    rows = _planted_corpus()
    sigs = {i: dedup._simhash64(t) for i, t in rows}
    truth = {
        (a, b)
        for ai, a in enumerate(sorted(sigs))
        for b in sorted(sigs)[ai + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert truth, "fixture must plant at least one hamming<=3 pair"
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b)
           for r in dedup.simhash_near_duplicates(df, max_hamming=3,
                                                  blocks=blocks).collect()}
    assert got == truth


def test_simhash_blocks_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.simhash_near_duplicates(None, max_hamming=4, blocks=4)


def test_embedding_banding_recall_vs_truth(spark):
    """Multi-band hyperplane bucketing must recover most threshold pairs a
    single 12-plane bucket provably misses (~72% at cosine 0.95)."""
    rng = np.random.RandomState(17)
    base = rng.standard_normal((40, 64))
    rows, truth_vecs = [], []
    vid = 0
    for i in range(40):
        v = base[i] / np.linalg.norm(base[i])
        for _ in range(3):  # 3 jittered copies per direction
            u = v + rng.standard_normal(64) * 0.02
            u = u / np.linalg.norm(u)
            rows.append((vid, u.tolist()))
            truth_vecs.append(u)
            vid += 1
    mat = np.stack(truth_vecs)
    cos = mat @ mat.T
    truth = {(a, b) for a in range(vid) for b in range(a + 1, vid)
             if round(cos[a, b], 6) >= 0.95}
    assert len(truth) >= 30
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got1 = {(r.id_a, r.id_b) for r in dedup.embedding_near_duplicates(
        df, threshold=0.95, bands=1).collect()}
    got8 = {(r.id_a, r.id_b) for r in dedup.embedding_near_duplicates(
        df, threshold=0.95, bands=8).collect()}
    assert got8 <= truth and got1 <= truth  # verification is exact
    recall1, recall8 = len(got1) / len(truth), len(got8) / len(truth)
    assert recall8 >= 0.85, (recall1, recall8)
    assert recall8 >= recall1


def test_ngram_jaccard(docs, spark):
    cands = spark.createDataFrame([(0, 1), (0, 2), (3, 4)], "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(docs, cands, threshold=0.0).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert out[(3, 4)] < 0.1


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


QUERY = [1.0 if i % 3 == 0 else (-0.5 if i % 3 == 1 else 0.25) for i in range(64)]


def test_brute_force_topk_matches_numpy(embeddings):
    got = similarity.brute_force_topk(embeddings, QUERY, k=5).collect()
    rows = embeddings.select("vec_id", "embedding").collect()
    q = np.array(QUERY)
    sims = sorted(
        (
            (float(np.dot(r["embedding"], q) / (np.linalg.norm(r["embedding"]) * np.linalg.norm(q))), -r["vec_id"])
            for r in rows
        ),
        reverse=True,
    )[:5]
    expect_ids = [int(-neg_id) for _, neg_id in sims]
    assert [r["vec_id"] for r in got] == expect_ids
    for r, (s, _) in zip(got, sims):
        assert abs(r["cosine"] - round(s, 6)) < 1e-4


def test_lsh_topk_recall_random_data(embeddings):
    # testdata embeddings are near-random (top cosine ~0.33), which bounds
    # sublinear ANN recall; assert a loose floor at a 30% probe budget.
    exact = [r["vec_id"] for r in similarity.brute_force_topk(embeddings, QUERY, k=10).collect()]
    approx = [r["vec_id"] for r in similarity.lsh_topk(embeddings, QUERY, k=10).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.3, (exact, approx)


def test_lsh_topk_absolute_budget_is_sublinear(spark):
    """The default budget is absolute, so 'ANN' can't silently become a
    corpus-proportional scan; with a tight explicit budget on clustered
    data the probe covers a strict subset of buckets yet keeps recall."""
    rng = np.random.RandomState(8)
    centers = rng.standard_normal((10, 64)) * 4
    rows = [
        (int(i), (centers[i % 10] + rng.standard_normal(64) * 0.3).tolist())
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = centers[3].tolist()
    exact = [r["vec_id"] for r in similarity.brute_force_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              similarity.lsh_topk(df, q, k=10, probe_budget=64).collect()]
    assert len(set(exact) & set(approx)) / 10 >= 0.8, (exact, approx)


def test_lsh_topk_recall_clustered_data(spark):
    # on clustered embeddings (the realistic case) recall should be high
    rng = np.random.RandomState(8)
    centers = rng.standard_normal((10, 64)) * 4
    rows = [
        (int(i), (centers[i % 10] + rng.standard_normal(64) * 0.3).tolist())
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = centers[3].tolist()
    exact = [r["vec_id"] for r in similarity.brute_force_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in similarity.lsh_topk(df, q, k=10).collect()]
    assert len(set(exact) & set(approx)) / 10 >= 0.9


def test_embedding_near_duplicates(spark):
    v = np.random.RandomState(5).standard_normal(64)
    rows = [
        (0, (v / np.linalg.norm(v)).tolist()),
        (1, (v / np.linalg.norm(v) * 2.0).tolist()),     # same direction
        (2, np.random.RandomState(6).standard_normal(64).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = dedup.embedding_near_duplicates(df, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]


def test_ngram_jaccard_near_duplicates_finds_one_word_edit(spark):
    """A 1-word-edit near-dup pair that md5-prefix blocking provably missed
    (different whole-text fingerprints -> different blocks with P=255/256)
    must be found by the MinHash-band candidate path."""
    import hashlib
    import re

    words = ("gallia est omnis divisa in partes tres quarum unam incolunt "
             "belgae aliam aquitani tertiam qui ipsorum lingua celtae nostra "
             "galli appellantur hi omnes lingua institutis legibus inter se "
             "differunt gallos ab aquitanis garumna flumen a belgis matrona "
             "et sequana dividit horum omnium fortissimi sunt belgae").split()
    a = " ".join(words)
    b = " ".join(w if i != 20 else "romani" for i, w in enumerate(words))

    def block(t):  # the old operator's md5-prefix block key
        return hashlib.md5(
            re.sub(r"\s+", " ", t.lower()).encode()
        ).hexdigest()[:2]

    assert block(a) != block(b), "fixture must land in different md5 blocks"

    df = spark.createDataFrame(
        [(0, a), (1, b), (2, "arma virumque cano troiae qui primus ab oris " * 6)],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_near_duplicates(df, threshold=0.8).collect()}
    assert (0, 1) in pairs, pairs
    assert pairs[(0, 1)] >= 0.8
    assert all(2 not in p for p in pairs)


def test_minhash_band_candidates_are_bucketed_not_allpairs(spark):
    """Candidate generation must not degrade to a cross product: unrelated
    docs yield no candidate pairs."""
    import random

    def doc(i):
        rng = random.Random(1000 + i)
        return " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
            for _ in range(60)
        )

    rows = [(i, doc(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.minhash_band_candidates(df).count() == 0


def test_duplicate_clusters_merges_chains(spark):
    """a~b and b~c (but never a~c verified) must land in ONE cluster with
    cluster_id = min id -- the case single-level transitivity misses."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (10, 11), (9, 11)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7, 10: 7, 11: 7}


def test_duplicate_clusters_long_path_converges(spark):
    """A 40-node path must converge under the convergence check (not a
    fixed round count), in O(log diameter) rounds thanks to pointer
    jumping."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster_id
           for r in dedup.duplicate_clusters(pairs, max_iter=50).collect()}
    assert set(got.values()) == {0} and len(got) == 41
    assert dedup.duplicate_clusters.last_rounds <= 9


def test_duplicate_clusters_thousand_node_chain_round_bound(spark):
    """The documented worst-case bound: a planted 1,000-node adversarial
    chain (diameter 1,000) converges within the DEFAULT max_iter because
    pointer jumping at least doubles the minimum's reach per round
    (~log2(1000) + slack rounds), and every node lands in one cluster."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()}
    assert set(got.values()) == {0} and len(got) == 1001
    assert dedup.duplicate_clusters.last_rounds <= 14


def test_duplicate_clusters_raises_instead_of_silent_partial(spark):
    """Hitting max_iter mid-propagation must fail loudly, never return
    half-merged clusters."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="did not converge"):
        dedup.duplicate_clusters(pairs, max_iter=3)


def test_hash_split_stable_and_partitioning_invariant(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    d = spark.range(0, 2000).selectExpr("id AS doc_id")
    s1 = {r.doc_id: r.split for r in
          sampling.hash_split(d, "doc_id", {"a": 0.5, "b": 0.5}).collect()}
    s2 = {r.doc_id: r.split for r in
          sampling.hash_split(d.repartition(13), "doc_id",
                              {"a": 0.5, "b": 0.5}).collect()}
    assert s1 == s2  # same key -> same split regardless of partitioning
    frac_a = sum(1 for v in s1.values() if v == "a") / len(s1)
    assert 0.45 < frac_a < 0.55

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.hash_split(d, "doc_id", {"a": 0.9, "b": 0.9})


def test_domain_cap_keeps_k_smallest(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    rows = [(i, "dom%d" % (i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.domain_cap(df, "source", k=2).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r.doc_id)
    assert {d: sorted(v) for d, v in by_dom.items()} == {
        "dom0": [0, 3], "dom1": [1, 4], "dom2": [2, 5]}


def test_domain_cap_salted_matches_unsalted(spark):
    """Planted mega-domain: the salted two-phase path must (a) return the
    IDENTICAL survivor set as the single-window path and (b) bound the
    phase-1 window-partition input to ~|mega|/n_salts rows (VERDICT r2
    item #4 -- at 10^12 rows one Zipfian mega-domain otherwise pins a
    single window task)."""
    from pyspark.sql import functions as F

    from wikisource_latin_text_cleaner_spark.operators import sampling

    mega = 4000
    rows = [(i, "mega.example") for i in range(mega)]
    rows += [(10_000 + i, "tail%d.example" % (i % 20)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string").cache()

    unsalted = sampling.domain_cap(df, "source", k=5)
    salted = sampling.domain_cap(
        df, "source", k=5, heavy_threshold=1000, n_salts=16
    )
    a = sorted((r.source, r.doc_id) for r in unsalted.collect())
    b = sorted((r.source, r.doc_id) for r in salted.collect())
    assert a == b and len(a) == 5 + 20 * 5

    # phase-1 group sizes: the mega-domain's rows split across n_salts
    # groups, so no window partition sees more than ~2x mega/n_salts rows
    groups = (
        df.where(F.col("source") == "mega.example")
        .withColumn("_salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(16)))
        .groupBy("_salt")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(groups) == 16
    assert max(r["n"] for r in groups) <= 2 * mega / 16

    # threshold not reached -> falls back to the single-window plan
    fallback = sampling.domain_cap(df, "source", k=5, heavy_threshold=10**9)
    assert sorted((r.source, r.doc_id) for r in fallback.collect()) == a


def test_domain_cap_null_domains_survive_both_paths(spark):
    """NULL domains form one window group; they can never enter the heavy
    list (isin can't match NULL) so the salted path must still cap them
    correctly via the light branch -- and identically to the unsalted plan."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    rows = [(i, None if i % 3 == 0 else "dom%d" % (i % 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    key = lambda r: (r.source or "", r.doc_id)  # noqa: E731
    a = sorted(map(key, sampling.domain_cap(df, "source", k=3).collect()))
    b = sorted(map(key, sampling.domain_cap(
        df, "source", k=3, heavy_threshold=5, n_salts=4).collect()))
    assert a == b
    assert [x for x in a if x[0] == ""] == [("", 0), ("", 3), ("", 6)]


def test_signature_kernels_bounded_memory_on_huge_doc():
    """A multi-MB outlier document must not blow up executor Python-worker
    memory: the one-shot formulation allocated a (64 x n_shingles) int64
    temp (~3 GB for a 6 MB doc); the block-wise kernels stay under a few
    hundred MB. Run in a subprocess under an address-space rlimit so a
    regression fails loudly instead of silently eating executor memory."""
    import subprocess
    import sys
    import textwrap

    prog = textwrap.dedent(
        """
        import resource
        import numpy as np
        from wikisource_latin_text_cleaner_spark.operators import dedup
        # high-entropy ~6 MB doc: nearly all shingles DISTINCT, so the
        # one-shot kernel's (64 x n_shingles) temp would be ~3 GB (a
        # repetitive doc dedupes to a handful of shingles and catches
        # nothing). Generated before the rlimit so setup isn't counted.
        rng = np.random.RandomState(7)
        alphabet = np.frombuffer(b"abcdefghijklmnop qrstu", dtype=np.uint8)
        doc = alphabet[rng.randint(0, len(alphabet), 6_000_000)].tobytes().decode()
        # cap address space at current usage + 512 MB AFTER imports (numpy
        # alone reserves more VA than the kernels are allowed to add)
        with open("/proc/self/status") as f:
            cur_kb = next(int(l.split()[1]) for l in f if l.startswith("VmSize"))
        lim = (cur_kb << 10) + (512 << 20)
        resource.setrlimit(resource.RLIMIT_AS, (lim, lim))
        sig = dedup._minhash_signature(doc)
        assert sig.shape == (64,)
        sim = dedup._simhash64(doc)
        assert -(1 << 63) <= sim < (1 << 63)
        print("OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]


# -- winnowing ---------------------------------------------------------------

def test_winnow_shared_substring_guarantee():
    """Any shared substring of length >= k + window - 1 must yield a shared
    fingerprint (the winnowing paper's core guarantee)."""
    from wikisource_latin_text_cleaner_spark.operators.dedup import _winnow

    shared = "lorem ipsum dolor sit amet consectetur"
    a = "PREFIX AAA " + shared + " SUFFIX BBB"
    b = "other text here " + shared + " different tail"
    fa, fb = set(_winnow(a)), set(_winnow(b))
    assert fa & fb, "shared substring produced no shared fingerprint"


def test_winnow_empty_and_short():
    from wikisource_latin_text_cleaner_spark.operators.dedup import _winnow

    assert _winnow("") == []
    assert _winnow("abc") == []          # shorter than k
    assert len(_winnow("abcdef")) == 1   # one window


def test_winnowing_near_duplicates_finds_planted_pair(spark):
    from wikisource_latin_text_cleaner_spark.operators import dedup

    base = "et in de ad cum ex pro per ab rex deus homo populus senatus " * 20
    rows = [
        (1, base + " cauda prima"),
        (2, base + " cauda secunda"),     # near-dup of 1
        (3, "completely different text with other words entirely " * 15),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in
             dedup.winnowing_near_duplicates(df, min_containment=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnowing_identical_tiny_vocab_docs_pair(spark):
    """Containment scoring catches identical docs even when a repetitive
    vocabulary winnows to very few distinct fingerprints."""
    from wikisource_latin_text_cleaner_spark.operators import dedup

    rows = [(i, "verbum " * 100) for i in range(3)] + [(9, "alia res omnino " * 80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in
             dedup.winnowing_near_duplicates(df, max_df=None).collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    rng = np.random.RandomState(8)
    centers = rng.standard_normal((10, 64)) * 4
    rows = [
        (int(i), (centers[i % 10] + rng.standard_normal(64) * 0.3).tolist())
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    return df, centers


def test_ivf_topk_exact_below_budget(embeddings):
    # default budget >> corpus: every cell probed, result == brute force
    exact = similarity.brute_force_topk(embeddings, QUERY, k=10).collect()
    approx = similarity.ivf_topk(embeddings, QUERY, k=10).collect()
    assert [(r["vec_id"], r["cosine"]) for r in approx] == \
           [(r["vec_id"], r["cosine"]) for r in exact]


def test_ivf_topk_sublinear_probe_high_recall(clustered_vecs):
    """Tight budget: probes a strict subset of cells, still finds the
    query's cluster (learned cells align with the data)."""
    df, centers = clustered_vecs
    q = centers[3].tolist()
    cents = similarity.train_ivf_centroids(df, n_cells=16, sample_rows=500)
    bucketed = df.withColumn("_cell", similarity.make_cell_udf(cents)("embedding"))
    n_cells_used = bucketed.select("_cell").distinct().count()
    exact = [r["vec_id"] for r in similarity.brute_force_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              similarity.ivf_topk(df, q, k=10, centroids=cents, probe_budget=64).collect()]
    assert len(set(exact) & set(approx)) / 10 >= 0.9, (exact, approx)
    # and the probe really was sublinear: budget 64 << 500 rows means at
    # most a few of the occupied cells were scanned
    per_cell = 500 / n_cells_used
    assert 64 < 500 - per_cell, "budget must exclude at least one cell"


def test_ivf_sample_not_limit_on_clustered_input(spark):
    """Training must SAMPLE the corpus, not take the first N rows.

    Embedding tables are routinely written clustered (e.g. sorted by a
    prior cluster id). On such input, first-N-rows training only ever sees
    the leading cluster(s): every centroid lands inside cluster 0, cell
    assignment of far clusters is arbitrary, and a bounded probe misses the
    query's true neighbors. df.sample() sees every cluster and keeps
    recall. This is VERDICT r2 item #3; the limit() half of the assertion
    pins the failure mode so a regression back to limit() trips the test.
    """
    rng = np.random.RandomState(99)
    centers = rng.standard_normal((8, 64)) * 4
    # rows SORTED by cluster: all of cluster 0 first, then cluster 1, ...
    rows = [
        (int(c * 200 + i), (centers[c] + rng.standard_normal(64) * 0.3).tolist())
        for c in range(8)
        for i in range(200)
    ]
    df = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .coalesce(1)  # preserve the sorted order for limit()
        .cache()
    )
    q = centers[7].tolist()  # query near the LAST cluster
    exact = [r["vec_id"] for r in similarity.brute_force_topk(df, q, k=10).collect()]

    # sample_rows=150 < one cluster's 200 rows: the old limit() path would
    # train entirely inside cluster 0
    cents = similarity.train_ivf_centroids(df, n_cells=8, sample_rows=150)
    approx = [
        r["vec_id"]
        for r in similarity.ivf_topk(
            df, q, k=10, centroids=cents, probe_budget=220
        ).collect()
    ]
    assert len(set(exact) & set(approx)) / 10 >= 0.8, (exact, approx)

    def coverage(c):
        """min over true clusters of the best centroid cosine: 1.0 means
        every cluster has a centroid pointing at it; ~0 (random 64-dim
        directions) means that cluster was never seen in training."""
        cn = np.stack([v / np.linalg.norm(v) for v in centers])
        return float((cn @ c.T).max(axis=1).min())

    # sampled training saw every cluster -> every center is well covered
    assert coverage(cents) >= 0.9, coverage(cents)

    # the failure mode the fix removes: training on the FIRST 150 rows
    # (exactly what `limit(sample_rows)` collects on this sorted input --
    # all cluster 0) leaves clusters 1..7 with no nearby centroid, so cell
    # probing over them is content-blind at scale
    biased_rows = df.select("embedding").limit(150).collect()
    biased_df = spark.createDataFrame(
        [(i, list(r[0])) for i, r in enumerate(biased_rows)],
        "vec_id long, embedding array<double>",
    )
    biased_cents = similarity.train_ivf_centroids(
        biased_df, n_cells=8, sample_rows=150
    )
    assert coverage(biased_cents) < 0.5, (
        "limit()-trained centroids unexpectedly cover all clusters; "
        "fixture no longer demonstrates the hazard",
        coverage(biased_cents),
    )


def test_ivf_centroids_deterministic_and_normalized(clustered_vecs):
    df, _ = clustered_vecs
    c1 = similarity.train_ivf_centroids(df, n_cells=8, sample_rows=500)
    c2 = similarity.train_ivf_centroids(df, n_cells=8, sample_rows=500)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 64)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_stratified_sample_nested_and_deterministic(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    rows = [(i, ["en", "la", "zh"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    small = sampling.stratified_sample(df, "lang", {"en": 0.3}, default_fraction=0.2)
    big = sampling.stratified_sample(df, "lang", {"en": 0.6}, default_fraction=0.4)
    s_ids = {r["doc_id"] for r in small.collect()}
    b_ids = {r["doc_id"] for r in big.collect()}
    assert s_ids <= b_ids, "nested-sample property violated"
    # deterministic across invocations
    again = {r["doc_id"] for r in
             sampling.stratified_sample(df, "lang", {"en": 0.3},
                                        default_fraction=0.2).collect()}
    assert again == s_ids
    # per-stratum fractions roughly honored (md5 buckets are uniform)
    by_lang = {r["lang"]: r["n"] for r in
               small.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 1000 - 0.3) < 0.05
    assert abs(by_lang.get("la", 0) / 1000 - 0.2) < 0.05


def test_stratified_sample_rejects_bad_fractions(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        sampling.stratified_sample(df, "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        sampling.stratified_sample(df, "lang", {}, default_fraction=-0.1)


def test_flag_contaminated_thirteen_gram_rule(spark):
    from wikisource_latin_text_cleaner_spark.operators import decontaminate

    words13 = " ".join(f"w{i}" for i in range(13))
    words12 = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (0, "prefix words here " + words13 + " and a suffix"),  # shares 13-gram
            (1, "prefix words here " + words12 + " then different ending entirely now"),
            (2, "completely unrelated text with plenty of its own words to use here"),
            (3, "tiny doc"),                                        # < 13 words: never flags
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(words13 + " trailing benchmark context words go here",)], "text string"
    )
    out = {r["doc_id"]: r["is_contaminated"]
           for r in decontaminate.flag_contaminated(docs, bench).collect()}
    assert out == {0: True, 1: False, 2: False, 3: False}


def test_word_ngrams_col_short_doc_empty(spark):
    from wikisource_latin_text_cleaner_spark.operators import decontaminate

    df = spark.createDataFrame([("only five words right here",)], "text string")
    got = df.select(
        decontaminate.word_ngrams_col(F.col("text"), 13).alias("g")
    ).collect()[0]["g"]
    assert got == []


def test_ivf_train_rejects_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        similarity.train_ivf_centroids(empty)


# --- SemDeDup (Abbas et al. 2023) -----------------------------------------

def _semdedup_numpy(vecs: dict, cells: dict, tau: float) -> set:
    """Pure-numpy oracle: survivors = ids with no smaller-id same-cell
    neighbor at 6dp-rounded cosine >= tau."""
    alive = set(vecs)
    for b in sorted(vecs):
        vb = np.asarray(vecs[b])
        for a in sorted(vecs):
            if a >= b or cells[a] != cells[b]:
                continue
            va = np.asarray(vecs[a])
            cos = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
            if cos >= tau:
                alive.discard(b)
                break
    return alive


def test_semdedup_matches_numpy_oracle(spark):
    """Trained-centroid path: planted dup pairs inside natural clusters are
    dropped (keep-smallest-id), cross-cluster similars survive."""
    rng = np.random.default_rng(42)
    anchors = rng.standard_normal((4, 16))
    rows, vecs = [], {}
    i = 0
    for a in anchors:
        for _ in range(8):
            v = a + rng.standard_normal(16) * 0.05
            rows.append((i, [float(x) for x in v]))
            vecs[i] = v
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.train_ivf_centroids(df, n_cells=4, sample_rows=1000)
    out = dedup.semdedup(df, threshold=0.98, centroids=cents, persist_cells=False)
    got = {r.vec_id for r in out.collect()}

    c = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cell_of = {
        k: int(np.argmax((v / np.linalg.norm(v)) @ c.T)) for k, v in vecs.items()
    }
    want = _semdedup_numpy(vecs, cell_of, 0.98)
    assert got == want
    assert len(got) < len(vecs), "tight planted clusters must shed members"


def test_semdedup_is_cell_local(spark):
    """Identical vectors assigned to different cells must BOTH survive:
    the O(n^2) join never crosses cell boundaries (that locality is what
    makes the operator scale)."""
    # Pinned centroids: cell 0 <- +x, cell 1 <- +y. A vector on the 45deg
    # diagonal ties; argmax picks cell 0. Put an exact dup of the diagonal
    # vector nudged into cell 1 territory: cosine ~1 but cells differ.
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    rows = [
        (0, [1.0, 0.9]),   # cell 0
        (1, [0.9, 1.0]),   # cell 1, cosine(0,1) = 0.994 -> would drop if joined
        (2, [1.0, 0.01]),  # cell 0
        (3, [1.0, 0.02]),  # cell 0, cosine(2,3) ~ 1 -> dropped (same cell)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dedup.semdedup(df, threshold=0.99, centroids=cents, persist_cells=False)
    assert {r.vec_id for r in out.collect()} == {0, 1, 2}


def test_semdedup_persist_assigns_each_vector_once(spark, tmp_path):
    """The cell-assignment UDF must run once per vector, not once per
    aliased self-join side; compile the unpersisted plan FIRST (cache
    manager substitutes cached frames into later matching plans)."""
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(30)]
    path = str(tmp_path / "sd.parquet")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(path)
    d = spark.read.parquet(path)
    cents = rng.standard_normal((4, 8))
    out_n = dedup.semdedup(d, threshold=0.8, centroids=cents, persist_cells=False)
    plan_n = out_n._jdf.queryExecution().executedPlan().toString()
    out_p = dedup.semdedup(d, threshold=0.8, centroids=cents, persist_cells=True)
    plan_p = out_p._jdf.queryExecution().executedPlan().toString()
    assert plan_p.count("InMemoryTableScan") >= 2, plan_p
    # Unpersisted it is even worse than 2x: the join-key isnotnull(cell)
    # pushdown evaluates the UDF a second time per side -> 4 Arrow passes.
    assert "InMemoryTableScan" not in plan_n and plan_n.count("ArrowEvalPython") == 4
    assert sorted(r.vec_id for r in out_p.collect()) == sorted(
        r.vec_id for r in out_n.collect()
    )


# --- DSIR importance-resampling selection (Xie et al. 2023) ----------------

def _bigram_logprobs_np(texts):
    """Add-one-smoothed char-bigram log-prob matrix, mirrors functions/lm.py."""
    from wikisource_latin_text_cleaner_spark.functions.perplexity import V, _ids

    counts = np.zeros((V, V), dtype=np.float64)
    for t in texts:
        if t and len(t) >= 2:
            ids = _ids(t.lower())
            np.add.at(counts, (ids[:-1], ids[1:]), 1.0)
    counts += 1.0
    return np.log(counts / counts.sum(axis=1, keepdims=True))


def test_dsir_select_matches_numpy_oracle(spark):
    """Top-k by summed log importance ratio must match the from-scratch
    numpy derivation, and the English-like planted doc must outrank the
    consonant-soup docs when the target corpus is English."""
    from wikisource_latin_text_cleaner_spark.functions.perplexity import _ids
    from wikisource_latin_text_cleaner_spark.operators import sampling

    target_texts = [
        "the quick brown fox jumps over the lazy dog and then rests",
        "a stitch in time saves nine and all that glitters is not gold",
        "to be or not to be that is the question for the ages",
    ]
    pool_rows = [
        (0, "wherefore the gentle reader turns the page with great delight"),
        (1, "zxqv kjht wpfg mzxn qqrt bbvc zzxw ppqq kkjj hhgg ffdd ssaa"),
        (2, "mmnn ccvv bbzz xxqq wwee rrtt yyuu iioo pplk jjhg gfds aqwz"),
        (3, "the cat sat on the mat and the dog lay by the door"),
        (4, "qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp aaaa ssss"),
        (5, "x"),  # < 2 chars: -inf weight, must never be selected
    ]
    target = spark.createDataFrame([(i, t) for i, t in enumerate(target_texts)],
                                   "doc_id long, text string")
    pool = spark.createDataFrame(pool_rows, "doc_id long, text string")

    out = sampling.dsir_select(pool, target, k=2)
    got = sorted((r.doc_id, r.dsir_w) for r in out.collect())

    delta = _bigram_logprobs_np(target_texts) - _bigram_logprobs_np(
        [t for _, t in pool_rows])
    want = []
    for i, t in pool_rows:
        if len(t) < 2:
            want.append((i, -np.inf))
            continue
        ids = _ids(t.lower())
        want.append((i, round(float(delta[ids[:-1], ids[1:]].sum()), 6)))
    want = sorted(sorted(want, key=lambda p: (-p[1], p[0]))[:2])
    assert got == want
    assert {i for i, _ in got} <= {0, 3}, "English-like docs must win"


def test_dsir_select_topk_is_take_ordered_not_global_sort(spark):
    """Selection must compile to TakeOrderedAndProject (per-partition heaps
    + driver merge), not a global Sort over an Exchange rangepartitioning —
    that distinction is what makes top-k viable at corpus scale."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    rows = [(i, f"some english filler text number {i} with common words") for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.dsir_select(d, d.limit(10), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert out.count() == 5


def test_dsir_select_validation(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    d = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="frac"):
        sampling.dsir_select(d, d, frac=0.0)
    with pytest.raises(ValueError, match="k must be positive"):
        sampling.dsir_select(d, d, k=0)


# --- Bloom-filter blocklist gate -------------------------------------------

def _bloom_py(keys, m, k):
    """Pure-python bloom oracle over md5 double hashing."""
    import hashlib

    def positions(key):
        h1 = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        h2 = int(hashlib.md5(
            (key + decontaminate_mod.BLOOM_SALT).encode()).hexdigest()[:8], 16)
        return [(h1 + i * h2) % m for i in range(k)]

    bits = set()
    for key in keys:
        bits.update(positions(key))
    return bits, positions


from wikisource_latin_text_cleaner_spark.operators import (  # noqa: E402
    decontaminate as decontaminate_mod,
)


def test_bloom_matches_python_oracle_including_false_positives(spark):
    """Exact parity with a from-scratch python bloom: guaranteed hits AND
    the deterministic false-positive set (tiny m forces collisions)."""
    m, k = 64, 3
    block = [f"blocked document text {i}" for i in range(10)]
    probes = block + [f"novel probe text number {i}" for i in range(200)]
    bdf = spark.createDataFrame([(t,) for t in block], "text string")
    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(probes)], "pid long, text string")
    bits = decontaminate_mod.build_bloom(bdf, "text", m_bits=m, k=k)
    got = {r.pid: r.in_bloom for r in decontaminate_mod.bloom_flag(
        pdf, bits, "text", m_bits=m, k=k).collect()}

    bset, positions = _bloom_py(block, m, k)
    want = {i: all(p in bset for p in positions(t))
            for i, t in enumerate(probes)}
    assert got == want
    assert all(got[i] for i in range(len(block))), "no false negatives ever"
    assert any(got[i] for i in range(len(block), len(probes))), \
        "m=64 over 10 keys must produce at least one false positive"


def test_bloom_null_key_never_flagged(spark):
    bdf = spark.createDataFrame([("x y z",)], "text string")
    bits = decontaminate_mod.build_bloom(bdf, "text", m_bits=256, k=3)
    pdf = spark.createDataFrame([(0, None), (1, "x y z")], "pid long, text string")
    got = {r.pid: r.in_bloom for r in decontaminate_mod.bloom_flag(
        pdf, bits, "text", m_bits=256, k=3).collect()}
    assert got == {0: False, 1: True}


def test_bloom_probe_is_shuffle_free(spark):
    """The probe must be one scan->project stage: positions are Catalyst
    expressions and membership is an O(k) closure gather -- any Exchange
    in the plan means the corpus is being shuffled to answer a per-row
    question."""
    bdf = spark.createDataFrame([("a b c",)], "text string")
    bits = decontaminate_mod.build_bloom(bdf, "text", m_bits=256, k=3)
    pdf = spark.createDataFrame([(i, f"t {i}") for i in range(20)],
                                "pid long, text string")
    plan = (
        decontaminate_mod.bloom_flag(pdf, bits, "text", m_bits=256, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_bloom_validation():
    import numpy as np

    with pytest.raises(ValueError, match="positive"):
        decontaminate_mod.build_bloom(None, "text", m_bits=0, k=3)
    with pytest.raises(ValueError, match="bits"):
        decontaminate_mod.bloom_member_col(
            F.col("text"), np.zeros(4, dtype=np.uint8), m_bits=256, k=3)


# --- temperature (alpha) mixing --------------------------------------------

def test_temperature_sample_ratios_and_nesting(spark):
    """alpha=0.5 must pull the kept distribution toward the temperature-
    adjusted target: smallest stratum kept whole, each stratum's kept
    count ~= f_s * n_s (md5-bucket binomial noise), and the alpha=0.25
    sample nests inside alpha-free (=1.0) membership per stratum."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    rows = ([(i, "big") for i in range(4000)]
            + [(i + 4000, "mid") for i in range(900)]
            + [(i + 4900, "small") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sampling.temperature_sample(df, "lang", alpha=0.5)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n = {"big": 4000, "mid": 900, "small": 100}
    tot = 5000
    boost = {s: (c / tot) ** -0.5 for s, c in n.items()}
    top = boost["small"]
    for s_, c in n.items():
        frac = round(boost[s_] / top * sampling.SPLIT_BUCKETS) / sampling.SPLIT_BUCKETS
        assert abs(got.get(s_, 0) - frac * c) <= 4 * (frac * c * (1 - frac) + 1) ** 0.5, \
            (s_, got.get(s_, 0), frac * c)
    assert got["small"] == 100  # most-boosted stratum kept whole

    # alpha=1 keeps everything; lower alpha keeps a subset of higher alpha
    all_kept = sampling.temperature_sample(df, "lang", alpha=1.0)
    assert all_kept.count() == tot
    low = {r["doc_id"] for r in
           sampling.temperature_sample(df, "lang", alpha=0.25).collect()}
    mid = {r["doc_id"] for r in kept.collect()}
    assert low <= mid  # nested: same md5 buckets, smaller thresholds


def test_temperature_sample_null_strata_dropped_and_validation(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "a")], "doc_id long, lang string")
    kept = sampling.temperature_sample(df, "lang", alpha=0.5)
    assert {r.doc_id for r in kept.collect()} == {0, 2}
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_sample(df, "lang", alpha=-0.1)
    empty = spark.createDataFrame([(0, None)], "doc_id long, lang string")
    with pytest.raises(ValueError, match="strata"):
        sampling.temperature_sample(empty, "lang")


# --- UniMax (budget + epoch cap) mixing ------------------------------------

def _unimax_rows():
    return ([(i, "big") for i in range(4000)]
            + [(i + 4000, "mid") for i in range(900)]
            + [(i + 4900, "small") for i in range(100)])


def test_unimax_budget_total_keeps_everything_once(spark):
    """budget == corpus at 1 epoch: the greedy loop gives every stratum
    exactly its own size (smaller strata can always absorb their uniform
    share's leftover), so everything survives with n_copies = 1."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame(_unimax_rows(), "doc_id long, lang string")
    kept = sampling.unimax_sample(df, "lang", budget=5000, max_epochs=1)
    assert kept.count() == 5000
    assert kept.agg(F.min("n_copies"), F.max("n_copies")).first() == (1, 1)


def test_unimax_epoch_cap_binds(spark):
    """budget far above max_epochs * corpus: every stratum caps at
    max_epochs full repeats and the leftover budget is simply unused."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame(_unimax_rows(), "doc_id long, lang string")
    kept = sampling.unimax_sample(df, "lang", budget=50000, max_epochs=2)
    assert kept.count() == 5000
    assert kept.agg(F.min("n_copies"), F.max("n_copies")).first() == (2, 2)


def test_unimax_uniform_share_flows_to_large_strata(spark):
    """budget=2000 over (4000, 900, 100) at 1 epoch: small and mid fit
    inside their uniform share and are kept whole; the re-flowed
    remainder gives big a 1000/4000 partial draw (md5-bucket binomial
    noise around 1000)."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame(_unimax_rows(), "doc_id long, lang string")
    kept = sampling.unimax_sample(df, "lang", budget=2000, max_epochs=1)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["small"] == 100 and got["mid"] == 900
    frac = 1000 / 4000
    assert abs(got["big"] - 1000) <= 4 * (4000 * frac * (1 - frac)) ** 0.5
    assert kept.agg(F.max("n_copies")).first()[0] == 1


def test_unimax_partial_epoch_on_top_of_full(spark):
    """One stratum, budget=2.5x its size at 3 epochs: two full epochs for
    every doc plus a ~half partial draw -- n_copies in {2, 3} and the
    copy total lands near the budget."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "only") for i in range(1000)], "doc_id long, lang string")
    kept = sampling.unimax_sample(df, "lang", budget=2500, max_epochs=3)
    assert kept.count() == 1000
    lo, hi, tot = kept.agg(
        F.min("n_copies"), F.max("n_copies"), F.sum("n_copies")).first()
    assert (lo, hi) == (2, 3)
    assert abs(tot - 2500) <= 4 * (1000 * 0.25) ** 0.5


def test_unimax_deterministic_and_partitioning_invariant(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame(_unimax_rows(), "doc_id long, lang string")
    a = {(r.doc_id, r.n_copies) for r in
         sampling.unimax_sample(df, "lang", budget=2000).collect()}
    b = {(r.doc_id, r.n_copies) for r in
         sampling.unimax_sample(df.repartition(7), "lang", budget=2000).collect()}
    assert a == b


def test_unimax_null_strata_dropped_and_validation(spark):
    from wikisource_latin_text_cleaner_spark.operators import sampling

    df = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "a")], "doc_id long, lang string")
    kept = sampling.unimax_sample(df, "lang", budget=3)
    assert {r.doc_id for r in kept.collect()} == {0, 2}
    with pytest.raises(ValueError, match="budget"):
        sampling.unimax_sample(df, "lang", budget=0)
    with pytest.raises(ValueError, match="max_epochs"):
        sampling.unimax_sample(df, "lang", budget=10, max_epochs=0)
    empty = spark.createDataFrame([(0, None)], "doc_id long, lang string")
    with pytest.raises(ValueError, match="strata"):
        sampling.unimax_sample(empty, "lang", budget=10)


# --- KMV corpus-overlap sketches -------------------------------------------

def test_kmv_overlap_exact_below_k(spark):
    """Union smaller than k: the sketch IS the union, so the estimate
    equals the exact Jaccard. A:{0..29}, B:{20..49} -> J = 10/50."""
    from wikisource_latin_text_cleaner_spark.operators import textstats

    rows = [(i, "a") for i in range(30)] + [(i, "b") for i in range(20, 50)]
    df = spark.createDataFrame(rows, "item long, grp string")
    r = textstats.kmv_overlap(df, "grp", F.col("item"), k=256).first()
    assert (r["ga"], r["gb"]) == ("a", "b")
    assert r["n_union"] == 50
    assert r["j_est"] == r["j_exact"] == round(10 / 50, 6)


def test_kmv_overlap_estimates_planted_jaccard(spark):
    """10k-item sets with 50% overlap, k=256: the estimate must land
    within ~4 standard errors (sigma ~= sqrt(J(1-J)/k)) of truth."""
    from wikisource_latin_text_cleaner_spark.operators import textstats

    n, shift = 10_000, 5_000
    rows = [(i, "a") for i in range(n)] + [(i + shift, "b") for i in range(n)]
    true_j = (n - shift) / (n + shift)
    df = spark.createDataFrame(rows, "item long, grp string")
    r = textstats.kmv_overlap(df, "grp", F.col("item"), k=256).first()
    assert r["j_exact"] == round(true_j, 6)
    assert abs(r["j_est"] - true_j) <= 4 * (true_j * (1 - true_j) / 256) ** 0.5
    assert r["n_union"] == n + shift


def test_kmv_overlap_prefilter_preserves_estimate(spark):
    """KMV threshold sampling: keeping only hashes < frac * 2^60 must not
    change the bottom-k (survivors >> k), so j_est is identical; only the
    exact-Jaccard denominator shrinks to the surviving union."""
    from wikisource_latin_text_cleaner_spark.operators import textstats

    n, shift = 10_000, 5_000
    rows = [(i, "a") for i in range(n)] + [(i + shift, "b") for i in range(n)]
    df = spark.createDataFrame(rows, "item long, grp string")
    full = textstats.kmv_overlap(df, "grp", F.col("item"), k=64).first()
    pre = textstats.kmv_overlap(
        df, "grp", F.col("item"), k=64, prefilter_frac=0.2).first()
    assert pre["j_est"] == full["j_est"]
    assert pre["n_union"] < full["n_union"]


def test_kmv_overlap_validation(spark):
    from wikisource_latin_text_cleaner_spark.operators import textstats

    df = spark.createDataFrame([(0, "a")], "item long, grp string")
    with pytest.raises(ValueError, match="k must"):
        textstats.kmv_overlap(df, "grp", F.col("item"), k=0)
    with pytest.raises(ValueError, match="prefilter_frac"):
        textstats.kmv_overlap(df, "grp", F.col("item"), prefilter_frac=1.5)


def test_dsir_select_split_is_bit_identical_to_two_frame_form(spark):
    """The one-pass predicate-split variant must select the IDENTICAL rows
    with IDENTICAL weights (exact integer counts -> same matrices), and
    NULL-condition rows must join neither side."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    rows = [(i, ("english common words here number %d" % i)
             if i % 3 else ("verba latina posita sunt numero %d" % i),
             "en" if i % 3 else "la") for i in range(60)]
    rows.append((60, "orphan row with null lang", None))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cond = F.col("lang") == "en"
    split = sorted((r.doc_id, r.dsir_w) for r in
                   sampling.dsir_select_split(df, cond, k=7).collect())
    two = sorted((r.doc_id, r.dsir_w) for r in
                 sampling.dsir_select(
                     df.where(~cond), df.where(cond), k=7).collect())
    assert split == two
    assert all(i != 60 for i, _ in split)
    # frac path: k derives from the pool-doc count that rode the training
    # reduce -- must equal the two-frame form's separate count() exactly
    split_f = sorted((r.doc_id, r.dsir_w) for r in
                     sampling.dsir_select_split(df, cond, frac=0.3).collect())
    two_f = sorted((r.doc_id, r.dsir_w) for r in
                   sampling.dsir_select(
                       df.where(~cond), df.where(cond), frac=0.3).collect())
    assert split_f == two_f and len(split_f) > 0
    with pytest.raises(ValueError, match="non-empty"):
        sampling.dsir_select_split(df, F.lit(True), k=2)
    with pytest.raises(ValueError, match="frac"):
        sampling.dsir_select_split(df, cond, frac=0.0)


def test_dsir_gumbel_resampling_deterministic_and_weight_biased(spark):
    """Gumbel-top-k draw: reproducible under repartitioning, reduces to
    plain top-k as temp -> 0, and still favors high-weight docs at
    moderate temp (picks more target-like than anti-target docs)."""
    from wikisource_latin_text_cleaner_spark.operators import sampling

    rows = [(i, ("the quick brown fox and the lazy dog %d" % i)
             if i < 30 else ("zxqv kjht wpfg mzxn qqrt bbvc %d" % i),
             i < 30) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    # target model: english-like; pool: all 60 (both text shapes)
    target = df.where("is_t").select("doc_id", "text")
    pool = df.select("doc_id", "text")

    g1 = {r.doc_id for r in sampling.dsir_select(
        pool, target, k=15, gumbel_temp=50.0).collect()}
    g2 = {r.doc_id for r in sampling.dsir_select(
        pool.repartition(13), target, k=15, gumbel_temp=50.0).collect()}
    assert g1 == g2, "derandomized draw must not depend on partitioning"

    plain = sorted(r.dsir_w for r in sampling.dsir_select(
        pool, target, k=15).collect())
    cold = sorted(r.dsir_w for r in sampling.dsir_select(
        pool, target, k=15, gumbel_temp=1e-6).collect())
    # temp -> 0 recovers plain top-k up to ties in the 6dp weight (equal
    # weights are interchangeable under gumbel tie-breaking)
    assert cold == plain

    n_target_like = sum(1 for i in g1 if i < 30)
    assert n_target_like > 10, (n_target_like, g1)

    with pytest.raises(ValueError, match="gumbel_temp"):
        sampling.dsir_select(pool, target, k=5, gumbel_temp=0.0)


def test_cluster_representatives_argmax_and_singletons(spark):
    """Highest-quality doc wins its cluster; quality ties break to the
    smallest id; docs in no cluster survive as their own singletons."""
    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.5), (20, 0.0)],
        "doc_id long, q double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, cluster_id long"
    )
    reps = dedup.cluster_representatives(df, clusters, F.col("q"))
    got = {r.cluster_id: (r.doc_id, r.cluster_size, r.quality)
           for r in reps.collect()}
    # cluster 1: 2 and 3 tie at 0.9 -> smallest id (2) kept, size 3
    # cluster 7: 8 beats 7, size 2; doc 20 unclustered -> singleton
    assert got == {1: (2, 3, 0.9), 7: (8, 2, 0.5), 20: (20, 1, 0.0)}


def test_cluster_representatives_aggregates_without_window(spark):
    """The mega-cluster defense: the plan must be a partial-aggregable
    HashAggregate, never a Window sort that co-locates a whole cluster
    in one task."""
    df = spark.createDataFrame([(i, float(i % 5)) for i in range(100)],
                               "doc_id long, q double")
    clusters = spark.createDataFrame(
        [(i, 0) for i in range(100)], "id long, cluster_id long"
    )
    reps = dedup.cluster_representatives(df, clusters, F.col("q"))
    plan = reps._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    # one mega cluster of 100: argmax quality (4.0) then min id among ties
    row = reps.collect()[0]
    assert (row.doc_id, row.cluster_id, row.cluster_size, row.quality) == (4, 0, 100, 4.0)


def test_hash_near_duplicates_planted_masks(spark):
    """Generic 64-bit hamming join: 0- and 2-bit perturbations pair, an
    8-bit perturbation is a banding CANDIDATE (shares 3 of 4 blocks: the
    flipped byte sits inside one 16-bit block) that exact verify rejects."""
    base = 0x0123456789ABCDE  # < 2^60, like the media pHash
    rows = [
        (1, base),
        (2, base),                      # hamming 0
        (3, base ^ ((1 << 40) | 1)),    # hamming 2
        (4, base ^ (0xFF << 20)),       # hamming 8 -> candidate, rejected
        (5, 0x7FFABCDEF123456),         # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, h long")
    pairs = dedup.hash_near_duplicates(df, hash_col="h", max_hamming=3, blocks=4)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got == {(1, 2): 0, (1, 3): 2, (2, 3): 2}


def test_hash_near_duplicates_validation():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_hamming"):
        dedup.hash_near_duplicates(None, hash_col="h", max_hamming=4, blocks=4)


def test_minhash_dedup_signature_udf_runs_exactly_once(spark, docs):
    """_persist_forced regression: the signature UDF must execute exactly
    once per document across the WHOLE minhash_dedup action graph.  With a
    lazy persist, the plan's fan-out (collapse groupBy + semi/anti joins +
    band-join sides) materializes as concurrent jobs that each find an
    unfilled cache and recompute the UDF -- event-log measured 4-5 full
    recomputes on a 40k-doc corpus, making local[32] slower than local[8].
    An accumulator inside a caller-supplied signature_udf counts actual
    per-row executions, independent of plan shape.  Honest caveat: the
    race itself is load/timing-dependent and does not reproduce at
    unit-test scale (lazy persist also measures exactly-once on a 6-doc
    corpus), so this is a contract assertion plus documentation pointer,
    not a deterministic reproduction -- the 40k-doc reproduction recipe
    is in dedup._persist_forced's docstring."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    calls = spark.sparkContext.accumulator(0)
    real = dedup._word_minhash_signature

    @pandas_udf("array<long>")
    def counting_sig_udf(texts: pd.Series) -> pd.Series:
        nonlocal_calls = len(texts)
        calls.add(nonlocal_calls)
        return texts.map(lambda t: [int(x) for x in real(t or "")])

    n_docs = docs.count()
    kept = dedup.minhash_dedup(docs, threshold=0.9,
                               signature_udf=counting_sig_udf)
    kept.write.mode("overwrite").format("noop").save()
    assert calls.value == n_docs, (
        f"signature UDF ran on {calls.value} rows for {n_docs} docs -- "
        "the persisted signature frame is being recomputed by a concurrent "
        "consumer (see dedup._persist_forced)"
    )


def test_minhash_carry_signatures_parity(spark, docs):
    """carry_signatures=False (band ids only, join sigs back for candidates)
    must produce the identical verified pair set and identical survivor set
    as the default verify-in-projection plan -- it is a shuffle-volume dial,
    not a semantics dial."""
    heavy = {(r.id_a, r.id_b, r.est_jaccard)
             for r in dedup.minhash_near_duplicates(
                 docs, threshold=0.7, carry_signatures=True).collect()}
    lean = {(r.id_a, r.id_b, r.est_jaccard)
            for r in dedup.minhash_near_duplicates(
                docs, threshold=0.7, carry_signatures=False).collect()}
    assert heavy == lean and heavy, "non-trivial identical pair sets"

    kept_heavy = {r.doc_id for r in dedup.minhash_dedup(
        docs, threshold=0.9, carry_signatures=True).collect()}
    kept_lean = {r.doc_id for r in dedup.minhash_dedup(
        docs, threshold=0.9, carry_signatures=False).collect()}
    assert kept_heavy == kept_lean


def test_incremental_minhash_carry_signatures_parity_with_ledger(spark, docs):
    """Ledger path: both carry modes must drop the same new docs against the
    same signature ledger and return byte-identical updated ledgers."""
    first = docs.where(F.col("doc_id") <= 2)
    second = docs.where(F.col("doc_id") > 2)
    outs = {}
    for carry in (True, False):
        kept1, ledger = dedup.incremental_minhash_dedup(
            first, None, threshold=0.9, carry_signatures=carry)
        kept2, ledger2 = dedup.incremental_minhash_dedup(
            second, ledger, threshold=0.9, carry_signatures=carry)
        outs[carry] = (
            {r.doc_id for r in kept1.collect()},
            {r.doc_id for r in kept2.collect()},
            {(r.id, tuple(r.sig)) for r in ledger2.collect()},
        )
    assert outs[True] == outs[False]
