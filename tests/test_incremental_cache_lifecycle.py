"""Mechanized cache lifecycle for the incremental-dedup ingest loop.

The module contract (operators/dedup.py docstring) says forced
MEMORY_AND_DISK caches are never LRU-evicted, so a per-batch loop must
release the previous batch's pins. These tests pin the MECHANISM:

  * every incremental call attaches a live CacheHandle to its returned
    frames (``.dedup_caches``);
  * ``unpersist_prior=`` makes the new ledger self-contained, then
    releases the prior batch's caches -- executor storage stays FLAT
    across a chained 3-batch ingest loop (the round-4 verdict's ask);
  * results are identical with and without the lifecycle plumbing
    (release changes storage, never answers);
  * ``collect_caches()`` scoops multi-call scopes and ``release`` is
    idempotent.
"""

import pytest
from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.operators import dedup


def _n_cached(spark) -> int:
    """Number of persistent RDDs the JVM currently tracks (unpersist
    removes the map entry immediately). gc first so the async
    ContextCleaner's lazy removals from EARLIER tests don't shift the
    baseline between two measurements."""
    import gc

    gc.collect()
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _ids(df, col="doc_id"):
    return sorted(r[0] for r in df.select(col).collect())


def _snapshots(spark):
    """Three snapshots with cross-batch exact dups: batch2 re-crawls
    'alpha', batch3 re-crawls 'delta' and 'alpha'."""
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "beta")], ["doc_id", "text"]
    )
    b2 = spark.createDataFrame(
        [(10, "alpha"), (11, "delta"), (12, "epsilon")], ["doc_id", "text"]
    )
    b3 = spark.createDataFrame(
        [(20, "delta"), (21, "alpha"), (22, "zeta")], ["doc_id", "text"]
    )
    return b1, b2, b3


def test_exact_loop_storage_flat_and_answers_unchanged(spark):
    b1, b2, b3 = _snapshots(spark)

    # reference run WITHOUT lifecycle plumbing (chained lazily)
    rk1, rl1 = dedup.incremental_exact_dedup(b1, None)
    rk2, rl2 = dedup.incremental_exact_dedup(b2, rl1)
    rk3, rl3 = dedup.incremental_exact_dedup(b3, rl2)
    expected = (_ids(rk1), _ids(rk2), _ids(rk3), rl3.count())
    dedup.release_caches(rk1, rl1, rk2, rl2, rk3, rl3)

    base = _n_cached(spark)
    k1, l1 = dedup.incremental_exact_dedup(b1, None)
    after1 = _n_cached(spark)
    k2, l2 = dedup.incremental_exact_dedup(b2, l1, unpersist_prior=l1)
    after2 = _n_cached(spark)
    k3, l3 = dedup.incremental_exact_dedup(b3, l2, unpersist_prior=l2)
    after3 = _n_cached(spark)

    # the loop's steady state is FLAT: each batch pins its own caches and
    # releases the previous batch's
    assert after1 > base  # the mechanism actually pins something
    assert after3 <= after2
    # answers identical to the plumbing-free chain
    assert (_ids(k1), _ids(k2), _ids(k3), l3.count()) == expected

    # final handles release everything this loop still holds
    released = dedup.release_caches(k3, l3)
    assert released > 0
    assert _n_cached(spark) <= base


def test_exact_handles_attached_and_shared(spark):
    b1, _, _ = _snapshots(spark)
    kept, ledger = dedup.incremental_exact_dedup(b1, None)
    assert isinstance(kept.dedup_caches, dedup.CacheHandle)
    assert kept.dedup_caches is ledger.dedup_caches  # one shared handle
    n = len(kept.dedup_caches)
    assert n > 0
    assert kept.dedup_caches.release() == n
    assert kept.dedup_caches.release() == 0  # idempotent


def test_minhash_loop_storage_flat_and_answers_unchanged(spark):
    base_text = "the quick brown fox jumps over the lazy dog " * 8
    b1 = spark.createDataFrame(
        [(1, base_text), (2, "completely different content here " * 10)],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(10, base_text + "tail"), (11, "fresh second-batch material " * 10)],
        ["doc_id", "text"],
    )
    b3 = spark.createDataFrame(
        [(20, base_text + "tail!"), (21, "third batch novel text " * 10)],
        ["doc_id", "text"],
    )

    rk1, rl1 = dedup.incremental_minhash_dedup(b1, None, threshold=0.8)
    rk2, rl2 = dedup.incremental_minhash_dedup(b2, rl1, threshold=0.8)
    rk3, rl3 = dedup.incremental_minhash_dedup(b3, rl2, threshold=0.8)
    expected = (_ids(rk1), _ids(rk2), _ids(rk3), rl3.count())
    dedup.release_caches(rk1, rl1, rk2, rl2, rk3, rl3)

    base = _n_cached(spark)
    k1, l1 = dedup.incremental_minhash_dedup(b1, None, threshold=0.8)
    k2, l2 = dedup.incremental_minhash_dedup(
        b2, l1, threshold=0.8, unpersist_prior=l1
    )
    after2 = _n_cached(spark)
    k3, l3 = dedup.incremental_minhash_dedup(
        b3, l2, threshold=0.8, unpersist_prior=l2
    )
    after3 = _n_cached(spark)

    assert after3 <= after2  # flat across the steady-state batches
    assert (_ids(k1), _ids(k2), _ids(k3), l3.count()) == expected
    dedup.release_caches(k3, l3)
    assert _n_cached(spark) <= base


def test_bloom_loop_releases_prior(spark):
    from wikisource_latin_text_cleaner_spark.operators.decontaminate import (
        build_bloom,
    )

    import numpy as np

    m_bits, k = 1 << 16, 5
    b1, b2, b3 = _snapshots(spark)
    base = _n_cached(spark)

    empty = bytes(m_bits // 8)
    k1, h1 = dedup.incremental_bloom_dedup(b1, empty, m_bits, k)
    bloom1 = build_bloom(h1, "content_hash", m_bits, k)
    k2, h2 = dedup.incremental_bloom_dedup(
        b2, bloom1, m_bits, k, unpersist_prior=h1
    )
    after2 = _n_cached(spark)
    bloom2 = np.bitwise_or(bloom1, build_bloom(h2, "content_hash", m_bits, k))
    k3, h3 = dedup.incremental_bloom_dedup(
        b3, bloom2, m_bits, k, unpersist_prior=h2
    )
    after3 = _n_cached(spark)

    assert after3 <= after2
    # bloom semantics: ledger text never re-admitted
    assert _ids(k2) == [11, 12]
    assert _ids(k3) == [22]
    dedup.release_caches(k3, h3)
    assert _n_cached(spark) <= base


def test_collect_caches_scoops_multi_call_scope(spark):
    b1, b2, _ = _snapshots(spark)
    base = _n_cached(spark)
    with dedup.collect_caches() as handle:
        k1, l1 = dedup.incremental_exact_dedup(b1, None)
        k2, l2 = dedup.incremental_exact_dedup(b2, l1)
        assert len(handle) > 0
    grown = _n_cached(spark)
    assert grown > base
    handle.release()
    assert _n_cached(spark) <= base


def test_release_caches_normalizes_inputs(spark):
    b1, _, _ = _snapshots(spark)
    kept, ledger = dedup.incremental_exact_dedup(b1, None)
    # iterable + frame + None + bare handle all accepted; shared handle
    # releases once
    n = dedup.release_caches([kept, None], ledger, ledger.dedup_caches)
    assert n == 1  # exact first-snapshot pins exactly kept_h
    with pytest.raises(TypeError):
        dedup.release_caches(42)
    with pytest.raises(TypeError):
        dedup.release_caches("a")  # str iterates to itself: rejected, not recursed
