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
