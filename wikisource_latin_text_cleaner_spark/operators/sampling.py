"""Corpus sampling operators for training-data assembly: deterministic
hash-based train/val/test splits and per-domain quota capping.

No reference precedent (the reference emits whole corpora); these are the
standard last-mile ops a pretraining pipeline runs after the quality filter
(task brief scope). Both are pure Catalyst expressions, deterministic under
re-runs and resumes (a requirement the engine's checkpointing already
imposes: same input -> same bytes), and exactly replicable in ANSI SQL, so
both carry DuckDB oracles in the driver contract.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bucket space for split assignment; 10^4 gives 0.01% split granularity
SPLIT_BUCKETS = 10_000


def split_bucket_col(key_col) -> F.Column:
    """Deterministic [0, SPLIT_BUCKETS) bucket from the md5 of the key.

    md5 (not xxhash64/crc32) because it is the one hash every engine in the
    toolchain computes identically -- the assignment can be re-derived in
    SQL, pandas, or a downstream system without shipping code. The first 8
    hex chars (32 bits) are plenty of entropy for 10^4 buckets.
    """
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10)
        .cast("long") % SPLIT_BUCKETS
    )


def hash_split(df: DataFrame, key_col: str, fractions: dict) -> DataFrame:
    """Assign every row a stable split label by hashed key.

    ``fractions`` maps label -> fraction (must sum to <= 1.0; any remainder
    falls into the LAST label). Rows with the same key always land in the
    same split, across runs, engines, and cluster sizes -- the property
    random() sampling cannot give and training pipelines need (no
    train/test leakage through re-shuffles).
    """
    total = sum(fractions.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    bucket = split_bucket_col(F.col(key_col))
    expr = None
    cum = 0.0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        cum += frac
        cond = bucket < int(round(cum * SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


#: refuse to literal-inline more heavy domains than this (an isin() with
#: bounded cardinality; above it the caller's threshold is too low)
_MAX_HEAVY_DOMAINS = 10_000


def domain_cap(
    df: DataFrame,
    domain_col: str,
    k: int,
    order_col: str = "doc_id",
    heavy_threshold: int | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``k`` rows per domain (deterministic: the k smallest
    ``order_col`` values win; ``order_col`` must be unique within a domain
    or the boundary pick is tie-ambiguous) -- the standard domain-balancing
    step that stops a handful of mega-domains from dominating a training
    mix.

    Normal tier (``heavy_threshold=None``): one hash-partition by domain +
    per-partition sort (window row_number), no global sort.

    Extreme tier: Zipfian domains make that window the skew pinch-point at
    10^12 rows -- AQE skew-join splitting does not apply to windows, so one
    mega-domain's rows all land in one window partition.  Pass
    ``heavy_threshold`` to auto-enable the salted two-phase path for any
    domain whose row count exceeds it:

    1. a per-domain count (map-side partial agg, broadcast-sized result)
       finds the heavy set -- bounded by total_rows/heavy_threshold, and
       capped at 10k entries so the inlined membership test stays sane;
    2. heavy rows window over (domain, salt) with
       salt = xxhash64(order_col) % n_salts, keeping k per salt.  Each of
       the true k smallest is by definition among the k smallest of its
       own salt bucket, so the <= k*n_salts survivors are a superset of
       the answer and the max window-partition input drops from
       |domain| to |domain|/n_salts;
    3. an exact domain window over those <= k*n_salts survivors (tiny)
       finishes the cap.

    Survivor sets are IDENTICAL to the unsalted path (same k smallest per
    domain), so the same oracle covers both -- asserted by
    tests/test_dedup_similarity.py::test_domain_cap_salted_matches_unsalted.
    Rows with a NULL domain are treated as one light group (they cannot
    appear in the heavy list).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(domain_col).orderBy(F.col(order_col).asc())
    single = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    if heavy_threshold is None:
        return single
    if heavy_threshold <= 0:
        raise ValueError(f"heavy_threshold must be positive, got {heavy_threshold}")
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")

    heavy = [
        r["d"]
        for r in (
            df.groupBy(F.col(domain_col).alias("d"))
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > heavy_threshold)
            .select("d")
            .limit(_MAX_HEAVY_DOMAINS + 1)
            .collect()
        )
    ]
    if len(heavy) > _MAX_HEAVY_DOMAINS:
        raise ValueError(
            f"domain_cap: >{_MAX_HEAVY_DOMAINS} domains exceed "
            f"heavy_threshold={heavy_threshold}; raise the threshold"
        )
    if not heavy:
        return single

    is_heavy = F.coalesce(F.col(domain_col).isin(heavy), F.lit(False))
    light = (
        df.where(~is_heavy)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    w_salt = Window.partitionBy(domain_col, "_salt").orderBy(F.col(order_col).asc())
    heavy_capped = (
        df.where(is_heavy)
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts)))
        .withColumn("_rn", F.row_number().over(w_salt))
        .where(F.col("_rn") <= k)
        .drop("_salt", "_rn")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    return light.unionByName(heavy_capped)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a stable
    ``fractions[stratum]`` share of each stratum (e.g. per-language mixing
    ratios for a training corpus), falling back to ``default_fraction`` for
    unlisted strata.

    Same md5-bucket mechanism as hash_split, so (a) the SAME row survives
    across runs, engines, and cluster sizes, (b) a row kept at fraction f
    is also kept at every fraction > f (nested samples: growing a mix never
    churns the subset already shipped), and (c) the selection is exactly
    re-derivable in SQL -- the driver oracle re-computes it in DuckDB.
    Pure Catalyst projection: no shuffle, no RNG, no state.
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    bucket = split_bucket_col(F.col(key_col))
    threshold = F.lit(int(round(default_fraction * SPLIT_BUCKETS)))
    for name, frac in fractions.items():
        threshold = (
            F.when(F.col(strata_col) == name, int(round(frac * SPLIT_BUCKETS)))
            .otherwise(threshold)
        )
    return df.where(bucket < threshold)


def dsir_select(
    pool: DataFrame,
    target: DataFrame,
    frac: float = 0.1,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    weight_col: str = "dsir_w",
    gumbel_temp: float | None = None,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): train one n-gram bag model on the
    TARGET distribution and one on the RAW POOL, score every pool document
    with the log importance weight log p_target(x) - log p_pool(x), and
    keep the top-k. The paper draws k samples with Gumbel noise; this
    implementation takes the deterministic top-k (weight desc, id asc) so
    runs are reproducible and exactly SQL-re-derivable.

    Feature model: the corpus-trained char-bigram LM from functions/lm.py
    (add-one smoothing, shared 40-char vocab) standing in for the paper's
    hashed word-bigram bag -- same estimator family, deterministic and
    cross-engine portable.

    Scale shape: two LM trainings = two mapInPandas passes that fold each
    partition into one 1600-cell vector (collect is 1600 rows regardless
    of corpus size); scoring closes over the 12.8 KB delta matrix in one
    Arrow pass; selection is orderBy(...).limit(k), which Spark executes
    as TakeOrderedAndProject -- per-partition top-k heaps merged on the
    driver, no global sort shuffle. Docs shorter than 2 chars score -inf
    (no bigram evidence) and sort last.

    No reference precedent; task-brief scope (quality-filter data
    selection at corpus scale).
    """
    from ..functions.lm import train_char_bigram_lm

    delta = np.ascontiguousarray(
        train_char_bigram_lm(target, text_col=text_col)
        - train_char_bigram_lm(pool, text_col=text_col)
    )
    return _dsir_topk(pool, delta, frac, k, text_col, id_col, weight_col,
                      gumbel_temp)


def dsir_select_split(
    df: DataFrame,
    target_cond,
    frac: float = 0.1,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    weight_col: str = "dsir_w",
    gumbel_temp: float | None = None,
) -> DataFrame:
    """dsir_select for the common case where target and pool are a
    PREDICATE split of one corpus: both models train in a SINGLE map pass
    (functions/lm.py:train_char_bigram_lm_by -- the per-label counts ride
    one reduce), halving the corpus scans vs training each side
    separately. Counts are exact integers either way, so the trained
    matrices -- and therefore the selection -- are bit-identical to
    dsir_select(df.where(~cond), df.where(cond)); the equivalence test
    asserts it. Rows where ``target_cond`` is NULL join neither side.
    """
    from ..functions.lm import train_char_bigram_lm_by

    cond = F.col(target_cond) if isinstance(target_cond, str) else target_cond
    labeled = df.withColumn(
        "_dsir_side", F.when(cond, "t").when(~cond, "p")
    )
    models, _, n_docs = train_char_bigram_lm_by(
        labeled, label_col="_dsir_side", text_col=text_col,
        return_counts=True,
    )
    if set(models) != {"t", "p"}:
        raise ValueError(
            f"target_cond must split the corpus into two non-empty sides; "
            f"saw sides {sorted(models)}"
        )
    delta = np.ascontiguousarray(models["t"] - models["p"])
    if k is None:
        if not 0.0 < frac <= 1.0:
            raise ValueError(f"frac must be in (0, 1], got {frac}")
        k = int(np.ceil(frac * n_docs["p"]))  # counted during training
    return _dsir_topk(
        df.where(~cond), delta, frac, k, text_col, id_col, weight_col,
        gumbel_temp,
    )


def _dsir_topk(pool, delta, frac, k, text_col, id_col, weight_col,
               gumbel_temp=None):
    """Shared DSIR scoring + deterministic top-k (TakeOrderedAndProject).

    ``gumbel_temp`` switches from plain top-k to the paper's
    sampling-without-replacement: top-k of (w/temp + Gumbel noise) draws k
    docs from softmax(w/temp) (the Gumbel-top-k identity). The noise is
    derandomized -- g = -ln(-ln(u)) with u = (md5_bucket(id)+0.5)/buckets
    -- so the draw is reproducible across runs, engines, and cluster
    sizes, exactly like every other sampler here. temp -> 0 recovers
    plain top-k; larger temp flattens toward uniform."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.perplexity import _ids

    if k is None:
        if not 0.0 < frac <= 1.0:
            raise ValueError(f"frac must be in (0, 1], got {frac}")
        k = int(np.ceil(frac * pool.count()))
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    @pandas_udf("double")
    def dsir_w(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            if not t or len(t) < 2:
                out[i] = -np.inf
                continue
            ids = _ids(t.lower())
            out[i] = np.round(delta[ids[:-1], ids[1:]].sum(), 6)
        return pd.Series(out)

    scored = pool.withColumn(weight_col, dsir_w(F.col(text_col)))
    if gumbel_temp is None:
        return (
            scored.orderBy(F.col(weight_col).desc(), F.col(id_col).asc())
            .limit(k)
        )
    if gumbel_temp <= 0:
        raise ValueError(f"gumbel_temp must be positive, got {gumbel_temp}")
    u = (split_bucket_col(F.col(id_col)) + F.lit(0.5)) / SPLIT_BUCKETS
    key = F.round(F.col(weight_col) / gumbel_temp - F.log(-F.log(u)), 6)
    return (
        scored.withColumn("_dsir_key", key)
        .orderBy(F.col("_dsir_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_dsir_key")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature / alpha mixing (mT5, XLM-R): re-balance strata (e.g.
    languages) toward p_s^alpha. With q_s = p_s^alpha / sum(p^alpha), each
    stratum keeps the deterministic fraction f_s = (q_s/p_s) / max(q_s/p_s)
    -- the kept corpus follows the temperature-adjusted distribution
    exactly (in ratio), the most-boosted stratum is kept whole, and
    alpha=1 keeps everything. Selection reuses the md5-bucket mechanism
    (split_bucket_col): same row survives across runs/engines/cluster
    sizes, samples are nested in alpha, and the whole thing re-derives in
    SQL.

    Scale shape: one small groupBy(strata).count() (collect = n_strata
    rows), then a pure Catalyst filter -- no shuffle of the corpus, no
    RNG, no state. Thresholds are computed on exact counts; at 10^12 docs
    run the count on the same pass that wrote the corpus manifest.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["s"] is not None
    }
    if not counts:
        raise ValueError("no non-null strata to sample")
    total = sum(counts.values())
    boost = {s: (n / total) ** (alpha - 1.0) for s, n in counts.items()}
    top = max(boost.values())
    bucket = split_bucket_col(F.col(key_col))
    threshold = F.lit(-1)  # NULL strata keep nothing
    for s, b in sorted(boost.items()):
        threshold = F.when(
            F.col(strata_col) == s, int(round(b / top * SPLIT_BUCKETS))
        ).otherwise(threshold)
    return df.where(bucket < threshold)


def unimax_sample(
    df: DataFrame,
    strata_col: str,
    budget: int,
    max_epochs: int = 1,
    key_col: str = "doc_id",
) -> DataFrame:
    """UniMax sampling (Chung et al. 2023): allocate a total ``budget``
    (in documents) across strata so every stratum gets as uniform a share
    as possible without repeating any stratum more than ``max_epochs``
    times. Greedy, smallest stratum first: each stratum receives
    ``min(max_epochs * n_s, remaining / strata_left)``; whatever a small
    stratum cannot absorb flows to the larger ones. Unlike temperature
    mixing there is no tail-suppressing exponent -- low-resource strata
    are never downsampled below their uniform share, and over-allocation
    is bounded by the epoch cap rather than unbounded repetition.

    A stratum's quota q_s turns into ``floor(q_s / n_s)`` full epochs plus
    an md5-bucket partial epoch for the fractional remainder (same
    split_bucket_col kernel as hash_split/temperature_sample: the same
    rows survive across runs, engines, and cluster sizes, and the draw
    re-derives in SQL). Returns the kept rows with ``n_copies`` -- the
    number of times a downstream writer should emit the row (full epochs
    + 1 inside the partial draw).

    Scale shape: one groupBy(strata).count() collect (n_strata rows), a
    driver-side greedy loop over n_strata entries, then a pure Catalyst
    projection + filter -- no corpus shuffle, no RNG, no state. The
    allocation arithmetic is plain IEEE doubles applied in a fixed order
    (strata ascending by count, name as tie-break), so the DuckDB oracle
    replays it bit-for-bit with a recursive CTE.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["s"] is not None
    }
    if not counts:
        raise ValueError("no non-null strata to sample")
    order = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    remaining = budget * 1.0
    full_expr = F.lit(None).cast("long")  # NULL strata keep nothing
    thr_expr = F.lit(None).cast("long")
    for i, (s, n) in enumerate(order):
        quota = min(max_epochs * n, remaining / (len(order) - i))
        remaining -= quota
        epochs = quota / n
        full = math.floor(epochs)
        th = int(round((epochs - full) * SPLIT_BUCKETS))
        full_expr = F.when(F.col(strata_col) == s, F.lit(full)).otherwise(full_expr)
        thr_expr = F.when(F.col(strata_col) == s, F.lit(th)).otherwise(thr_expr)
    bucket = split_bucket_col(F.col(key_col))
    n_copies = full_expr + (bucket < thr_expr).cast("long")
    return df.withColumn("n_copies", n_copies).where(F.col("n_copies") > 0)


def sequence_pack(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    seq_len: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-split training-sequence packing (the GPT-2/3 data layout:
    documents are concatenated and the stream is chopped into fixed
    ``seq_len`` windows). Each document is assigned the window its FIRST
    token lands in: bin = floor(running_token_offset / seq_len).

    Scale design: packing is inherently sequential, so it is made parallel
    the way production pipelines do -- per SHARD. Documents are dealt into
    ``n_buckets`` md5 buckets (engine-portable, same idiom as hash_split);
    within a bucket the concatenation order is ``id_col`` ascending and the
    running offset is a window cumsum. The shuffle is one hash exchange on
    uniform keys + a per-bucket sort; no global sort, no driver state, and
    bucket count is the parallelism dial (at 10^12 docs use n_buckets ~=
    10-100x executor count). Deterministic across runs and cluster sizes.

    Returns df + (bucket, bin, offset_in_bin) -- offset_in_bin is where the
    document's first token sits inside its window, which a writer needs to
    materialize the packed examples.
    """
    if seq_len <= 0 or n_buckets <= 0:
        raise ValueError(f"seq_len and n_buckets must be > 0, got {seq_len}, {n_buckets}")
    from pyspark.sql import Window

    bucket = split_bucket_col(F.col(id_col)) % n_buckets
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("bucket", bucket)
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    return out.select(
        "*",
        F.floor(start / seq_len).cast("long").alias("bin"),
        (start % seq_len).alias("offset_in_bin"),
    )


def domain_quality_gate(
    df: DataFrame,
    score_col,
    domain_col: str = "domain",
    min_mean: float | None = None,
    max_mean: float | None = None,
    min_docs: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Domain-LEVEL quality filtering: aggregate a per-document quality
    score (any Catalyst column -- stopword ratio, distilled classifier
    probability, a 0/1 rule verdict) to the registrable domain and drop
    EVERY page of a domain whose mean falls outside ``[min_mean,
    max_mean]`` or that has fewer than ``min_docs`` pages. This is the
    measured counterpart of a static domain blocklist: spam/SEO farms are
    much easier to separate at the site level, where per-page noise
    averages out, than page by page (RefinedWeb Penedo et al. 2023 sec
    3.1 motivates URL-level filtering; the aggregate-then-gate shape is
    the UT1-style list-building step). Pages with a NULL domain cannot be
    attributed and are dropped -- pre-filter them if they must survive.

    The mean is rounded to ``round_to`` dp before the band test, the same
    cross-engine determinism surface as ccnet_ppx_buckets (a 1-ulp
    summation-order divergence must not flip a domain at the boundary).

    Scale shape: the per-domain aggregate is partial-aggregatable (one
    (sum, count) pair per domain per map task -- a mega-domain costs its
    map tasks one accumulator each, never a row explosion); the verdict
    frame is one row per domain and joins back as a LEFT SEMI on the
    domain key. At 10^8 domains that join shuffles both sides on a key
    whose build side is unique per key, so AQE's skew splitting handles a
    mega-domain's probe rows; below broadcast range it degrades to a
    broadcast semi-join with zero corpus shuffle. No reference precedent
    (the reference has no notion of a site); part of the web-pipeline
    surface the task brief asks for.
    """
    if min_mean is None and max_mean is None and min_docs <= 1:
        raise ValueError("set at least one of min_mean / max_mean / min_docs")
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    verdicts = df.groupBy(F.col(domain_col).alias("_d")).agg(
        F.round(F.avg(score), round_to).alias("_mean"),
        F.count(F.lit(1)).alias("_n"),
    )
    cond = F.col("_n") >= F.lit(min_docs)
    if min_mean is not None:
        cond = cond & (F.col("_mean") >= F.lit(min_mean))
    if max_mean is not None:
        cond = cond & (F.col("_mean") <= F.lit(max_mean))
    keep = verdicts.where(cond).select(F.col("_d").alias(domain_col))
    return df.join(keep, domain_col, "left_semi")
