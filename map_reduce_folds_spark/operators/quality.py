"""Data-quality / expectation operators for pipeline gating.

Training-data pipelines gate on corpus health before burning compute:
null rates, duplicate rates, domain violations, cardinalities.  All checks
compile into ONE aggregation pass per table (applicative fold composition
— N expectations, one scan, one tiny shuffle)."""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row profile: per column — null count and distinct count, plus
    total rows and full-row duplicate count.  Single .agg pass."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    return df.agg(*aggs)


def expect(df: DataFrame, expectations: Mapping[str, Column]) -> DataFrame:
    """Count violations per named expectation (Column predicates that
    should hold for every row).  Returns one row: name → violation count;
    0 everywhere means the gate passes.  One scan regardless of N."""
    aggs = [
        # NULL-evaluating predicates count as violations (a NULL in the
        # expression is itself a quality failure, not a pass)
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(name)
        for name, cond in expectations.items()
    ]
    return df.agg(*aggs)


def gate(df: DataFrame, expectations: Mapping[str, Column]) -> None:
    """Raise ValueError if any expectation is violated (driver-side gate
    for pipeline orchestration)."""
    row = expect(df, expectations).collect()[0]
    bad = {k: v for k, v in row.asDict().items() if v}
    if bad:
        raise ValueError(f"data-quality gate failed: {bad}")


def drift_psi(
    a: DataFrame,
    b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbuckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two corpus snapshots on one
    numeric column: ``PSI = Σ_i (p_i − q_i)·ln(p_i/q_i)`` over
    ``nbuckets`` clamped equi-width buckets (``sketches.hist_bucket``),
    zero shares floored at ``eps`` per the standard convention.  The
    drift gate a recurring training-data ingest wants: PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 broken upstream.

    One aggregation pass per snapshot (bucket counts), a ≤ nbuckets-row
    join, and a SORTED-array fold for the final sum, so the result is
    deterministic under any partitioning (same discipline as
    ``sketches.hist_quantile``); the scalar totals ride one-row
    broadcast joins.  Output: one row ``(psi, n_a, n_b)`` with psi
    rounded to 9 decimals (the repo numeric policy for
    transcendental-bearing results — ln differs in the last ulp across
    libms)."""
    from map_reduce_folds_spark.operators.sketches import hist_bucket

    ca = a.groupBy(hist_bucket(col, lo, hi, nbuckets).alias("bucket")) \
        .agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy(hist_bucket(col, lo, hi, nbuckets).alias("bucket")) \
        .agg(F.count(F.lit(1)).alias("nb"))
    j = ca.join(cb, "bucket", "full") \
        .select("bucket",
                F.coalesce("na", F.lit(0)).alias("na"),
                F.coalesce("nb", F.lit(0)).alias("nb"))
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    jt = j.crossJoin(F.broadcast(tot))  # one-row scalar idiom
    p = F.greatest(F.col("na").cast("double") / F.col("ta").cast("double"),
                   F.lit(eps))
    q = F.greatest(F.col("nb").cast("double") / F.col("tb").cast("double"),
                   F.lit(eps))
    terms = jt.select(
        "bucket", "ta", "tb",
        ((p - q) * F.log(p / q)).alias("term"),
    )
    pairs = F.array_sort(F.collect_list(
        F.struct(F.col("bucket"), F.col("term"))))
    psi = F.aggregate(pairs, F.lit(0.0), lambda acc, s: acc + s["term"])
    return terms.groupBy("ta", "tb").agg(F.round(psi, 9).alias("psi")) \
        .select(F.col("psi"), F.col("ta").alias("n_a"), F.col("tb").alias("n_b"))


def drift_psi_sql(
    a_src: str, b_src: str, expr: str,
    lo: float, hi: float, nbuckets: int = 10, eps: float = 1e-6,
) -> str:
    """DuckDB mirror of :func:`drift_psi` (same buckets, same eps floor,
    same sorted-list fold, same 9-decimal round)."""
    from map_reduce_folds_spark.operators.sketches import hist_bucket_sql

    hb_a = hist_bucket_sql(expr, lo, hi, nbuckets)
    hb_b = hist_bucket_sql(expr, lo, hi, nbuckets)
    return f"""
    WITH ca AS (SELECT {hb_a} AS bucket, count(*) AS na FROM {a_src} GROUP BY 1),
    cb AS (SELECT {hb_b} AS bucket, count(*) AS nb FROM {b_src} GROUP BY 1),
    j AS (
        SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
               COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
        FROM ca FULL JOIN cb ON ca.bucket = cb.bucket
    ),
    t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM j),
    terms AS (
        SELECT bucket, ta, tb,
               (greatest(CAST(na AS DOUBLE) / CAST(ta AS DOUBLE), {eps!r})
                - greatest(CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE), {eps!r}))
               * ln(greatest(CAST(na AS DOUBLE) / CAST(ta AS DOUBLE), {eps!r})
                    / greatest(CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE), {eps!r}))
               AS term
        FROM j, t
    )
    SELECT round(list_reduce(
               list_prepend(0.0, list_sort(list({{'b': bucket, 't': term}}))
                            .apply(s -> s.t)),
               (acc, x) -> acc + x), 9) AS psi,
           ta AS n_a, tb AS n_b
    FROM terms GROUP BY ta, tb
    """


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's OWN
    unigram distribution — the classic perplexity-proxy quality filter
    (very negative ⇒ rare-token-heavy gibberish / wrong-language /
    binary-ish docs; near zero ⇒ boilerplate of only stopwords).  Output:
    ``(id, n_tokens, mean_logprob)`` with

        mean_logprob = round( Σ_t ln(count(t)/total) / n_tokens , 9 )

    Shape: token explode → vocabulary count (one map-side-combinable
    aggregation — the word-count plan) → token-keyed join back → per-doc
    sum.  Hot stopword tokens skew the join input, but each joined row
    carries only (doc, pos, cnt) and AQE splits oversized partitions; the
    per-doc sum runs over a SORTED (pos, term) array fold so float
    addition order is pinned under any partitioning, and the 9-decimal
    round absorbs ln's cross-libm last-ulp (the PSI discipline,
    :func:`drift_psi`).  The corpus total rides a one-row broadcast."""
    from map_reduce_folds_spark.operators.text import tokenize

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokenize(text_col)).alias("pos", "tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("tot"))
    terms = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))  # one-row scalar idiom
        .select(
            id_col, "pos",
            F.log(F.col("cnt").cast("double") / F.col("tot").cast("double"))
             .alias("term"),
        )
    )
    pairs = F.array_sort(F.collect_list(F.struct("pos", "term")))
    s = F.aggregate(pairs, F.lit(0.0),
                    lambda acc, x: acc + x["term"])
    return terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(s / F.count(F.lit(1)).cast("double"), 9).alias("mean_logprob"),
    )


def observe(df: DataFrame, name: str, metrics: Mapping[str, Column]):
    """Attach free-riding pipeline metrics to a DataFrame: returns
    ``(df, observation)`` where the named aggregate expressions are
    computed DURING the next action on ``df`` — no second scan, which at
    100 TB is the difference between observability and a doubled bill.
    Read ``observation.get`` (dict) after the action completes.

    The standard use: count rows surviving each filter stage of a
    cleaning pipeline in the same job that writes the output.

        df, obs = observe(filtered, "gate", {"n": F.count(F.lit(1)),
                                             "bad": F.sum(F.expr("flag"))})
        df.write.parquet(out)
        stats = obs.get          # {'n': ..., 'bad': ...}

    Thin, typed wrapper over ``pyspark.sql.Observation`` so pipelines in
    this package get one idiom (and tests can pin it); aggregate
    expressions must be the observe-compatible kind (no distinct)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def winsorize(
    df: DataFrame,
    col: str,
    lo_frac: float = 0.01,
    hi_frac: float = 0.99,
    lo: float | None = None,
    hi: float | None = None,
    nbuckets: int = 64,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp a numeric column to its [lo_frac, hi_frac] quantile band —
    the robust-normalization pass that stops a handful of outliers from
    dominating scaled features.  Quantiles come from the deterministic
    equi-width histogram sketch (``sketches.hist_bucket`` /
    ``hist_quantile`` over the [lo, hi] range — engine-exact, so the
    clamped values have an exact SQL mirror); they are collected as ONE
    driver row (the bounded-scalar idiom of ``gate``) and applied as
    literals, keeping the clamp itself a pure scan expression.

    Range discipline: ``lo``/``hi`` default to the column's EXACT
    min/max (one cheap map-side-combinable aggregate).  When passed
    explicitly they are VALIDATED against the data — out-of-range values
    would be clamped into the histogram's edge buckets and the quantile
    bounds silently wrong, so that raises instead (the same refuse-loudly
    discipline as the pagerank weight cap and the zorder bits guard)."""
    from map_reduce_folds_spark.operators.sketches import (
        hist_bucket, hist_quantile,
    )

    mn, mx = df.agg(
        F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double")),
    ).first()
    if mn is None:
        raise ValueError(f"winsorize: column {col!r} has no non-null values")
    if lo is None:
        lo = float(mn)
    if hi is None:
        hi = float(mx)
    if mn < lo or mx > hi:
        raise ValueError(
            f"winsorize: data range [{mn}, {mx}] exceeds the declared "
            f"histogram range [{lo}, {hi}] — out-of-range values clamp "
            "into edge buckets and corrupt the quantile bounds; widen "
            "lo/hi or omit them to derive the range from min/max")
    if hi <= lo:  # constant column: clamp is the identity
        return df.withColumn(out_col or f"{col}_winsorized",
                             F.col(col).cast("double"))
    counts = df.groupBy(
        hist_bucket(col, lo, hi, nbuckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    row = counts.agg(
        hist_quantile(lo_frac, lo, hi, nbuckets).alias("ql"),
        hist_quantile(hi_frac, lo, hi, nbuckets).alias("qh"),
    ).first()
    ql, qh = float(row["ql"]), float(row["qh"])
    clamped = F.greatest(F.least(F.col(col).cast("double"), F.lit(qh)),
                         F.lit(ql))
    return df.withColumn(out_col or f"{col}_winsorized", clamped)
