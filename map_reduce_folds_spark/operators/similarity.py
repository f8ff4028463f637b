"""Similarity search over embedding columns (north-star GAP ops).

* :func:`cosine` builds the dot/norm arithmetic as an explicit left-
  associated chain of per-element terms — bitwise-reproducible in any
  engine that evaluates ``+`` left-to-right (DuckDB oracle parity), and
  still whole-stage-codegen'd by Catalyst.
* :func:`brute_force_topk` is the exactness baseline: queries × corpus
  join, per-query top-k window.  Right answer, O(|Q|·N) — fine when |Q|
  is small or N fits a broadcast.
* :func:`srp_lsh_topk` is the scale path: sign-random-projection LSH —
  hyperplane signs from the portable hash (deterministic, no RNG state),
  bucket join, verify cosine only within buckets.  Candidate generation
  is linear in N; recall is tuned by (n_planes, n_tables).
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from map_reduce_folds_spark.operators.relational import topk_per_group


def dot(a: Column, b: Column, dim: int = 0) -> Column:
    """Σ a[i]·b[i] as a strict left fold: aggregate(zip_with(a,b,·), 0.0, +).

    Left-fold addition starting at 0.0 is bitwise-identical to the explicit
    left-associated term chain the SQL oracles use (0.0 + t1 == t1 in
    binary double), while compiling to a tight loop instead of a dim-term
    codegen tree (~3× faster end-to-end).  ``dim`` is kept for call-site
    documentation; the loop reads the arrays' actual length."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column, dim: int) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def dot_sql(a: str, b: str, dim: int) -> str:
    """DuckDB SQL mirroring :func:`dot` term-for-term (oracle generator)."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def cosine_sql(a: str, b: str, dim: int) -> str:
    return (
        f"(({dot_sql(a, b, dim)}) / "
        f"(sqrt({dot_sql(a, a, dim)}) * sqrt({dot_sql(b, b, dim)})))"
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    The query side is broadcast (it is the small side by construction);
    the corpus is scanned once, no shuffle until the per-query top-k
    window — which AQE keeps proportional to |Q|·k."""
    from map_reduce_folds_spark.sources import spread_small_scan

    # norms are per-vector: compute them once per side before the join
    # (identical chain expression, so the factored form is still bitwise
    # equal to cosine() inline — and the join-side codegen shrinks 3x)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("qn"),
    )
    # r14 §2.5 input-skew fix: the |C|×|Q| scored projection is the
    # expensive stage (64-term dot per pair) and it inherits the corpus
    # scan's partitioning — on a single-row-group fixture that is ONE
    # task.  Spread only when the scan is under the parallelism floor
    # (no-op at production scale); the topk window re-shuffles by
    # query_id anyway, so placement is free.  Measured (noop best-of-3):
    # 0.67→0.43 s at sf0.1/5 queries, 1.85→0.70 s at sf0.01/500 queries.
    c = spread_small_scan(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored, ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id")], k,
    )


def _srp_coeff(table: int, plane: int, i: int) -> float:
    """±1 from md5 parity of 't{table}p{plane}d{i}' — same derivation the
    Spark-side hash60 would compute, done once at plan-build time."""
    import hashlib

    h = int(hashlib.md5(f"t{table}p{plane}d{i}".encode()).hexdigest()[:15], 16)
    return 1.0 if h & 1 else -1.0


def srp_signature(vec: Column, dim: int, n_planes: int, table: int = 0) -> Column:
    """Sign-random-projection bucket id: plane p's ±1 coefficients are
    md5-parity-derived constants baked into the plan as a literal array —
    deterministic, no stored model, no per-row hashing."""
    bits = []
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(_srp_coeff(table, p, i)) for i in range(1, dim + 1)])
        proj = dot(vec, coeffs)
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return _reduce(lambda x, y: x + y, bits).cast("bigint")


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_planes: int | str = "auto",
    n_tables: int | str = "auto",
    corpus_count: int | None = None,
    materialize_path: str | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket in ≥1 of
    ``n_tables`` tables; exact cosine is computed only for candidates.

    ``materialize_path``: write the corpus (id, table, bucket) signature
    rows to a parquet table at that path and scan it back — the
    signature stage (the one full-corpus pass) becomes a durable stage
    boundary instead of lineage recomputed per downstream job; at
    cluster scale this IS the ANN index build, reusable across query
    batches (same knob as dedup.minhash_near_dup_pairs).

    At 100 TB the corpus signature pass is one narrow scan (the vectorized
    :func:`srp_bucket_rows` stage); the bucket join shuffles on (table,
    bucket) — linear, no cross join; candidates carry ids only, vectors
    join back for verify.  Recall rises with n_tables; verify-and-rank
    keeps precision exact within candidates.  Fully deterministic, so a
    SQL oracle reproduces the candidate set — and therefore the returned
    top-k — exactly (queries/llm.py sim_topk_lsh).

    Default ``n_planes="auto"`` sizes the bucket space from the corpus
    cardinality via :func:`auto_srp_params` (base 8 planes / 4 tables,
    occupancy shrinking past the 2^8·64-row knee per the
    linear-candidates rule, tables compensated to hold the recall
    S-curve at cos≈0.9 — the regime a top-k search must not miss).  Pass ``corpus_count`` to skip the sizing count scan, or
    explicit ints to pin the geometry (as the oracle-backed registered
    query does)."""
    if n_planes == "auto" or n_tables == "auto":
        n = corpus_count if corpus_count is not None else corpus.count()
        pinned = None if n_planes == "auto" else n_planes
        auto_p, auto_t = auto_srp_params(
            n, threshold=0.9, base_planes=8, base_tables=4, planes=pinned)
        n_planes = auto_p
        n_tables = auto_t if n_tables == "auto" else n_tables
    qb = srp_bucket_rows(queries, id_col, vec_col, dim, n_planes, n_tables) \
        .withColumnRenamed("__id", "query_id")
    cb = srp_bucket_rows(corpus, id_col, vec_col, dim, n_planes, n_tables)
    if materialize_path is not None:
        from map_reduce_folds_spark.operators.dedup import materialize_stage

        cb = materialize_stage(cb, materialize_path)
    cb = cb.withColumnRenamed("__id", "neighbor_id")
    cand = (
        cb.join(F.broadcast(qb),
                (qb.tbl == cb.tbl) & (qb.bucket == cb.bucket)
                & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qv"),
                        norm(F.col(vec_col), dim).alias("qn"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv"),
                       norm(F.col(vec_col), dim).alias("cn"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            (dot(F.col("qv"), F.col("cv"), dim)
             / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id")], k
    )


def srp_bucket_rows(
    df: DataFrame, id_col: str, vec_col: str, dim: int,
    n_planes: int, n_tables: int,
    carry_vec: bool = False,
    carry_q8: bool = False,
    cp_hashes: int = 0,
) -> DataFrame:
    """(id, tbl, bucket) rows for ALL tables in ONE vectorized Arrow stage.

    ``carry_vec=True`` additionally emits, on every bucket row, the
    vector (as ``__vec array<double>`` — the float64 values the
    projections were computed from, so a float input widens exactly)
    and ``__all``, the row's bucket id in EVERY table: the inline-verify
    join (see :func:`embedding_near_dup_pairs_lsh`) scores cosine where
    both vectors are already co-located, and the all-tables array lets
    the join emit each pair only at its FIRST agreeing table (canonical
    meeting — no dedup aggregate), at the cost of n_tables× vector
    duplication in the bucket relation.

    ``carry_q8=True`` (round 12 — the inline_q8 strategy) carries a
    symmetric int8 quantization INSTEAD of the vector: ``__q8``
    (array<tinyint>, q = round(x/s), s = max|x|/127), ``__s`` (scale),
    ``__a1`` (Σ|q| — the term the rigorous dot-error bound needs),
    ``__n`` (float norm), plus ``__all`` — ~6× less shuffle volume per
    bucket row than a float64 vector, the byte cost that dominates the
    inline relation in the billion-vector regime.

    Semantically identical to exploding :func:`srp_signature` per table, but
    the Catalyst form is an ~8000-node literal expression tree whose
    per-run analysis alone costs seconds (measured ~6 s at ANY data size);
    this pandas stage computes the same projections in a single numpy pass.

    Bitwise parity with the SQL oracle is preserved: the accumulator adds
    the per-dimension terms in index order (``acc += v[i]·c[i]``), which is
    exactly the left-associated chain ``t1 + t2 + …`` the oracle evaluates
    — same doubles, same signs, same buckets.

    ``cp_hashes = k > 0`` (round 13) composes each table's bucket from
    ``k`` CROSS-POLYTOPE codes plus ``n_planes`` SRP fine bits:
    ``bucket = (Σ_h code_h·(2d)^h)·2^n_planes + srp_bits``.  Each code is
    argmax-with-sign over a deterministic ±1 md5-parity projection of
    the 2^20-QUANTIZED vector — every product and partial sum is an
    integer below 2^53, EXACTLY representable in float64, so the BLAS
    matmul here and the SQL SUM in :func:`cp_bucket_rows_sql` agree
    bit-free regardless of accumulation order (the argmax tie-break is
    the exact-integer key |y|·2d + (2d−1−code), identical in both).
    This is what makes a rotation-style hash ORACLE-ABLE — the open
    problem the r12 verdict named."""
    import numpy as np

    # C[i-1, t*n_planes + p] = hyperplane coefficient (±1, md5-parity)
    C = np.array(
        [[_srp_coeff(t, p, i) for t in range(n_tables) for p in range(n_planes)]
         for i in range(1, dim + 1)],
        dtype=np.float64,
    ) if n_planes else None
    pw = np.array([1 << p for p in range(n_planes)], dtype=np.int64)
    # CPm[t]: (cp_hashes·dim, dim) ±1 projection block for table t —
    # applied per table (one (batch × dim)·(dim × k·dim) gemm each) so
    # the transient y stays ~k·dim doubles per row, not nt·k·dim
    CPm = np.array(
        [[[_cp_coeff(t, h, oi, dj) for dj in range(dim)]
          for h in range(cp_hashes) for oi in range(dim)]
         for t in range(n_tables)],
        dtype=np.float64,
    ) if cp_hashes else None
    cp_codes_base = 2.0 * np.arange(dim) if cp_hashes else None
    cp_pow = (2.0 * dim) ** np.arange(cp_hashes) if cp_hashes else None
    if carry_vec and carry_q8:
        raise ValueError("carry_vec and carry_q8 are mutually exclusive")
    id_type = dict(df.dtypes)[id_col]
    schema = f"__id {id_type}, tbl int, bucket bigint"
    if carry_vec:
        schema += ", __vec array<double>, __all array<bigint>"
    if carry_q8:
        # no __all here: the q8 prefilter shrinks the survivor stream to
        # ~output size, so pair dedup is a cheap distinct over survivors
        # — carrying the all-tables array (n_tables × 8 B per row, the
        # dominant byte of the relation) just for canonical-meeting
        # dedup blew the shuffled-hash build at the 1000× rehearsal
        schema += ", __q8 array<tinyint>, __s double, __a1 int, __n double"
    nt, npl = n_tables, n_planes

    def gen(batches):
        import pandas as pd

        # payload-carrying modes fan every input row out nt× with a wide
        # column aboard; yielding that as ONE Arrow batch allocates a
        # ~300 MB direct buffer per task (×32 tasks blew the 8 GiB
        # direct-memory ceiling at the 300× rehearsal) — chunk the
        # emission to ~50k output rows per Arrow record batch instead
        chunk_in = max(1, 50_000 // nt) if (carry_vec or carry_q8) \
            else 10 ** 9

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if npl:
                acc = np.zeros((len(pdf), nt * npl), dtype=np.float64)
                for i in range(x.shape[1]):  # left fold over dims: oracle-exact
                    acc += x[:, i : i + 1] * C[i]
                buckets = ((acc >= 0).reshape(len(pdf), nt, npl) * pw).sum(axis=2)
            else:
                buckets = np.zeros((len(pdf), nt), dtype=np.int64)
            if CPm is not None:
                q = np.floor(x * 1048576.0 + 0.5)  # exact ints in float64
                for t in range(nt):
                    y = (q @ CPm[t].T).reshape(len(pdf), cp_hashes, dim)
                    # exact-integer argmax key: max |y| wins, ties go to
                    # the smallest code (sign folded into the code)
                    key = np.abs(y) * (2 * dim) \
                        + (2 * dim - 1 - (cp_codes_base + (y < 0)))
                    code = (2 * dim - 1) - (key.max(axis=2) % (2 * dim))
                    cp_val = (code * cp_pow).sum(axis=1)
                    buckets[:, t] += (cp_val * float(1 << npl)).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            if carry_q8:
                s = np.abs(x).max(axis=1) / 127.0
                safe = np.where(s == 0.0, 1.0, s)
                q = np.rint(x / safe[:, None]).astype(np.int8)
                q[s == 0.0] = 0
                a1 = np.abs(q.astype(np.int32)).sum(axis=1)
                nrm = np.sqrt((x * x).sum(axis=1))
            for lo in range(0, len(pdf), chunk_in):
                hi = min(lo + chunk_in, len(pdf))
                m = hi - lo
                out = {
                    "__id": np.repeat(ids[lo:hi], nt),
                    "tbl": np.tile(np.arange(nt, dtype=np.int32), m),
                    "bucket": buckets[lo:hi].reshape(-1),
                }
                rep = np.repeat(np.arange(lo, hi), nt)
                if carry_vec:
                    # numpy row views, not per-element Python lists —
                    # Arrow ingests ndarray cells directly
                    out["__all"] = pd.Series(list(buckets[rep]))
                    out["__vec"] = pd.Series(list(x[rep]))
                if carry_q8:
                    out["__q8"] = pd.Series(list(q[rep]))
                    out["__s"] = np.repeat(s[lo:hi], nt)
                    out["__a1"] = np.repeat(a1[lo:hi], nt).astype(np.int32)
                    out["__n"] = np.repeat(nrm[lo:hi], nt)
                yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def srp_signature_sql(vec: str, dim: int, n_planes: int, table: int) -> str:
    """DuckDB SQL mirroring :func:`srp_signature` bit-for-bit (oracle
    generator): each plane's projection is the same left-associated ±term
    chain, so the sign — and therefore the bucket id — is identical."""
    terms = []
    for p in range(n_planes):
        chain = " + ".join(
            f"CAST({vec}[{i}] AS DOUBLE) * {_srp_coeff(table, p, i)}"
            for i in range(1, dim + 1)
        )
        terms.append(f"CASE WHEN ({chain}) >= 0 THEN {1 << p} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


#: empirical per-hash collision probability of the cross-polytope code
#: at d = 64, measured on EXACTLY the production pipeline (2^20 quantize
#: → ±1 md5-parity projection → argmax-with-sign) by
#: tools/calibrate_cp.py, 200k pairs per point (stderr < 0.0012).
#: Interpolated linearly by _cp_p1; re-run the script to extend.
_CP_P1 = {
    0.80: 0.2961,
    0.85: 0.3648,
    0.90: 0.4575,
    0.925: 0.5149,
    0.95: 0.5922,
    0.975: 0.6960,
    0.99: 0.8008,
}


def _cp_p1(recall_cos: float) -> float:
    """Linear interpolation of the calibrated cross-polytope collision
    table (clamped to its measured range — geometry planning outside
    [0.80, 0.99] should recalibrate, not extrapolate)."""
    pts = sorted(_CP_P1.items())
    if recall_cos <= pts[0][0]:
        return pts[0][1]
    if recall_cos >= pts[-1][0]:
        return pts[-1][1]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if x0 <= recall_cos <= x1:
            return y0 + (y1 - y0) * (recall_cos - x0) / (x1 - x0)
    raise AssertionError("unreachable")


def _cp_coeff(table: int, h: int, oi: int, dj: int) -> float:
    """±1 from md5 parity of 'c{table}h{h}o{oi}d{dj}' — the cross-
    polytope projection matrix entry, derivable in SQL from the same
    md5 (15th hex digit's parity), so the oracle regenerates the matrix
    instead of embedding 4096·k·tables literals."""
    import hashlib

    hx = int(hashlib.md5(
        f"c{table}h{h}o{oi}d{dj}".encode()).hexdigest()[:15], 16)
    return 1.0 if hx & 1 else -1.0


def auto_cp_params(
    n_rows: int,
    threshold: float = 0.95,
    dim: int = 64,
    target_bucket: int = 64,
    recall: float = 0.98,
    recall_cos: float | None = None,
    occ_floor: float = 4.0,
    row_weight: float = 8.0,
) -> tuple[int, int, int]:
    """(cp_hashes k, fine_bits r, n_tables) for the cross-polytope
    scheme — the round-13 answer to the SRP occupancy FLOOR (the repo's
    one super-linear regime: past occ = 8 / n ≈ 5M vectors, SRP
    candidates revert to n^1.22, r12 verdict).

    WHY CP: per bit of bucket space, a cross-polytope hash is more
    selective at the same recall.  One CP code carries log2(2d) = 7 bits
    (d = 64) at measured p1 = 0.589 (cos 0.95), i.e. a per-bit recall
    cost c = log2(1/p1)/7 ≈ 0.109, vs an SRP plane's c = log2(1/p1) ≈
    0.153 (cos 0.95) / 0.224 (cos 0.9).  Everything downstream of c
    improves superlinearly: tables ∝ (n/occ)^c, candidates ∝
    n^(1+c)·occ^(1−c), and the occupancy-shrink rule's floor — where
    compensation overwhelms the shrink — moves from n ≈ 5M (SRP, cos
    0.9) past 10^9 rows (β = c/(1−c) ≈ 0.14: each occupancy halving
    costs only 1.10× tables).

    SELECTION is a direct enumeration, not the closed form: bucket space
    is (2d)^k·2^r, so (k, r) are integers and the smooth occ-shrink
    algebra only brackets the answer.  For each (k, r) with occupancy
    occ = n/((2d)^k·2^r) in [occ_floor, 4·target_bucket], tables come
    from the recall S-curve (1−(1−p_tab)^T ≥ recall at p_tab =
    p1_cp^k·p1_srp^r, evaluated at ``recall_cos`` = max(threshold, 0.9)
    as in :func:`auto_srp_params`), and the cost model is
    ``tables·(row_weight + occ/2)`` — bucket-relation rows plus expected
    candidates per row, with row_weight ≈ 8 from the measured regimes
    (a q8 bucket row's shuffle+sort cost ≈ ~8 q8-dot prefilter evals;
    it only moves the k/r rounding point).  occ_floor is 4, BELOW the
    r12 SRP floor of 8: for SRP the floor was BINDING (table
    compensation per halving cost 1.17× and the planner would otherwise
    dive), while under CP's β ≈ 0.14 the row_weight term of the cost
    model already prices low occupancy — the floor is a soft guardrail,
    and because (k, r) are discrete the realized occupancy OSCILLATES in
    a band around the optimum rather than tracking a smooth curve (the
    uniform-model candidates/n stays in a bounded band; the measured
    counts in SCALE_BENCH are the ground truth).  CP hashes are
    preferred implicitly —
    at equal bucket space they need fewer tables — so small n degrades
    gracefully to k = 0 (pure SRP bits: this planner strictly
    generalizes the SRP one)."""
    import math

    if recall_cos is None:
        recall_cos = max(threshold, 0.9)
    theta = math.acos(min(max(recall_cos, -1.0), 1.0))
    p1_srp = 1.0 - theta / math.pi
    if p1_srp <= 0.5:
        raise ValueError(
            f"recall_cos={recall_cos} gives SRP bit agreement "
            f"p1={p1_srp:.3f} <= 0.5; CP auto-geometry needs "
            "recall_cos > 0")
    p1_cp = _cp_p1(recall_cos)
    best = None
    n = max(int(n_rows), 1)
    for k in range(0, 7):
        space_k = (2 * dim) ** k
        if space_k > n:
            break
        for r in range(0, 25):
            space = space_k * (1 << r)
            occ = n / space
            if occ > 4.0 * target_bucket:
                continue
            if occ < occ_floor and space > 2 * dim:
                break
            p_tab = (p1_cp ** k) * (p1_srp ** r)
            if p_tab >= 1.0:
                tables = 1
            else:
                tables = max(1, math.ceil(math.log(1.0 - recall)
                                          / math.log(1.0 - p_tab)))
            cost = tables * (row_weight + occ / 2.0)
            cand = (k, r, tables)
            if best is None or cost < best[0] or \
                    (cost == best[0] and tables < best[1][2]):
                best = (cost, cand)
    if best is None:
        # tiny corpus: one table, everything in few buckets
        return 0, max(0, int(math.log2(max(n // target_bucket, 1)))), 1
    return best[1]


def cp_bucket_rows_sql(
    src: str,
    id_expr: str,
    vec_expr: str,
    dim: int,
    cp_hashes: int,
    n_planes: int,
    n_tables: int,
) -> str:
    """DuckDB SELECT producing the same ``(__id, tbl, bucket)`` rows as
    :func:`srp_bucket_rows` with ``cp_hashes > 0`` — bit-free parity by
    construction, not by accumulation-order discipline:

    * the ±1 projection matrix is REGENERATED in SQL from the same md5
      parity (``int(md5[:15], 16) & 1`` = the 15th hex digit's parity);
    * the vector quantizes to ``floor(v·2^20 + 0.5)`` — integers held in
      doubles, so every product and SUM below 2^53 is exact and
      order-independent (no left-fold chain needed, unlike the float
      SRP oracle);
    * argmax-with-sign is MAX over the exact-integer key
      ``|y|·2d + (2d−1−code)`` — identical tie-breaks.

    The SRP fine bits (``n_planes > 0``) reuse the float
    :func:`srp_signature_sql` chain per table, unchanged."""
    nt, k, r = n_tables, cp_hashes, n_planes
    odd = "('1','3','5','7','9','b','d','f')"
    srp_branches = "\n        UNION ALL\n".join(
        f"        SELECT {id_expr} AS __id, {t} AS tbl, "
        f"{srp_signature_sql(vec_expr, dim, r, t)} AS srp FROM {src}"
        for t in range(nt)
    ) if r else ""
    srp_cte = f""",
    __srp AS (
{srp_branches}
    )""" if r else ""
    bucket_expr = (f"c.cpv * {1 << r} + s.srp" if r else "c.cpv")
    srp_join = (" JOIN __srp s ON s.__id = c.__id AND s.tbl = c.t"
                if r else "")
    return f"""
    WITH __qv AS (
        SELECT {id_expr} AS __id, u.dj AS dj,
               floor({vec_expr}[u.dj + 1] * 1048576.0 + 0.5) AS qv
        FROM {src}, UNNEST(generate_series(0, {dim - 1})) u(dj)
    ),
    __rm AS (
        SELECT t.t, h.h, o.oi, d.dj,
               CASE WHEN substr(md5('c' || t.t || 'h' || h.h
                                 || 'o' || o.oi || 'd' || d.dj), 15, 1)
                    IN {odd} THEN 1.0 ELSE -1.0 END AS s
        FROM UNNEST(generate_series(0, {nt - 1})) t(t),
             UNNEST(generate_series(0, {k - 1})) h(h),
             UNNEST(generate_series(0, {dim - 1})) o(oi),
             UNNEST(generate_series(0, {dim - 1})) d(dj)
    ),
    __y AS (
        SELECT q.__id, r.t, r.h, r.oi, SUM(r.s * q.qv) AS y
        FROM __qv q JOIN __rm r ON r.dj = q.dj
        GROUP BY 1, 2, 3, 4
    ),
    __code AS (
        SELECT __id, t, h,
               {2 * dim - 1} - (CAST(MAX(abs(y) * {2 * dim}
                    + ({2 * dim - 1} - (2 * oi
                       + CASE WHEN y < 0 THEN 1 ELSE 0 END)))
                    AS BIGINT) % {2 * dim}) AS code
        FROM __y GROUP BY 1, 2, 3
    ),
    __cp AS (
        SELECT __id, t,
               CAST(SUM(code * ({2 * dim}.0 ** h)) AS BIGINT) AS cpv
        FROM __code GROUP BY 1, 2
    ){srp_cte}
    SELECT c.__id AS __id, c.t AS tbl,
           CAST({bucket_expr} AS BIGINT) AS bucket
    FROM __cp c{srp_join}
    """


def auto_srp_params(
    n_rows: int,
    threshold: float = 0.95,
    base_planes: int = 6,
    base_tables: int = 8,
    target_bucket: int = 64,
    planes: int | None = None,
    recall_cos: float | None = None,
) -> tuple[int, int]:
    """Derive (n_planes, n_tables) from corpus cardinality so the bucket
    self-join stays linear as the corpus grows.

    Bucket count per table is ``2^n_planes``; with planes FIXED, per-bucket
    occupancy grows linearly with the corpus and the self-join quadratically
    (the one superlinear row in round-5's 10× measurement: 11.9×, restored
    to sublinear at planes=9).  The rule here is that measurement made the
    default: ``n_planes = max(base, ceil(log2(n / target_bucket)))`` holds
    expected bucket occupancy at ~``target_bucket`` rows — +1 plane per
    corpus doubling.

    Each extra plane lowers per-table recall by the S-curve factor ``p1 =
    1 - acos(c)/pi`` (the probability one hyperplane agrees on a pair at
    cosine ``c``), so ``n_tables`` scales by ``(1/p1)^extra_planes`` to
    hold pair recall ≈ ``1-(1-p1^planes)^tables`` constant.  The cosine
    the compensation is computed AT is ``recall_cos`` — by default
    ``max(threshold, 0.9)``, i.e. the recall held constant is that of
    TRUE near-duplicates (which in a dedup corpus live at cosine ≈ 0.9+),
    not of pairs sitting exactly on a loose detection threshold.  The
    distinction matters when threshold is low: compensating at e.g.
    threshold 0.4 (p1 ≈ 0.63) costs 1.59× tables per plane — ~4× the
    candidate volume over 3 planes, measured 5.8 s vs 1.8 s on the 10×
    corpus — to preserve recall for borderline pairs the verification
    stage treats as expendable anyway, while at 0.9 (p1 ≈ 0.86) tables
    grow only 1.17× per plane and the 0.9-cosine recall stays ≥ 0.97.
    At threshold 0.95 the default is the threshold itself (~1.11× per
    plane); table count grows like a small power of n either way, far
    cheaper than the n² occupancy blow-up it prevents.

    OCCUPANCY SHRINKS WITH n (round 12 — the linear-candidates rule).
    Holding occupancy CONSTANT leaves candidate volume superlinear:
    candidates ≈ n·occ/2 per table × tables, and tables must grow
    ``(n/occ)^c`` with ``c = log2(1/p1)`` to hold recall, so fixed occ
    gives candidates ∝ n^(1+c) — measured as the 17× wall per 10× at
    the 100× rehearsal (c ≈ 0.224 at cos 0.9, SCALE_BENCH_r11, the
    repo's only super-linear rows).  Since candidates ∝
    n^(1+c)·occ^(1−c), shrinking occupancy as ``occ = target ·
    (n/knee)^(−c/(1−c))`` past the knee (``knee = target·2^base_planes``,
    where planes first exceed base) cancels the exponent exactly:
    candidate volume returns to ~n (at cos 0.9, β = c/(1−c) ≈ 0.29 —
    10× data → occupancy ÷2, planes +1 beyond the constant-occupancy
    schedule).  The price is more tables (∝ n^(c(1+β)) ≈ n^0.27 — the
    bucket relation stays skinny and trivially smaller than the
    candidate set it buys down) — the classic LSH n^ρ storage/work
    trade, spent on storage.  ``occ_floor`` (8) bounds the shrink: below
    ~8 rows a bucket's join output no longer dominates its fixed row
    overhead and table compensation goes exponential; past the floor
    (n ≈ knee·(target/floor)^(1/β), ~5M rows at the defaults) growth
    reverts to n^(1+c) but from an 8×-smaller constant."""
    import math

    if recall_cos is None:
        recall_cos = max(threshold, 0.9)
    theta = math.acos(min(max(recall_cos, -1.0), 1.0))
    p1 = 1.0 - theta / math.pi
    if p1 <= 0.5:
        # c = log2(1/p1) >= 1 makes beta = c/(1-c) blow up (p1 = 0.5)
        # or go NEGATIVE (p1 < 0.5): occupancy would GROW with n and
        # planes shrink — silently inverted geometry.  recall_cos <= 0
        # means "hold recall for orthogonal-or-worse pairs", which no
        # hyperplane-LSH geometry can do at sub-quadratic cost.
        raise ValueError(
            f"recall_cos={recall_cos} gives per-plane agreement "
            f"p1={p1:.3f} <= 0.5; SRP auto-geometry needs recall_cos > 0 "
            "(pass explicit planes/tables for degenerate thresholds)")
    c = math.log2(1.0 / p1)
    if planes is None:
        planes = base_planes
        knee = target_bucket * (1 << base_planes)
        if n_rows > knee:
            beta = c / (1.0 - c)
            occ = max(8.0, target_bucket / (n_rows / knee) ** beta)
            planes = max(base_planes,
                         math.ceil(math.log2(n_rows / occ)))
    n_tables = max(base_tables, math.ceil(
        base_tables * (1.0 / p1) ** (planes - base_planes)))
    return planes, n_tables


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int | str = "auto",
    n_tables: int | str = "auto",
    corpus_count: int | None = None,
    materialize: bool = True,
    materialize_path: str | None = None,
    verify: str = "auto",
    rescore: str = "partitioned",
    scheme: str = "srp",
    cp_hashes: int | str = "auto",
    materialize_bucketed: str | None = None,
    bucket_files: int = 64,
) -> DataFrame:
    """Near-dup pairs via SRP-LSH buckets — the 100 TB path (no cross join).

    Candidates = pairs sharing an SRP bucket in ≥1 of ``n_tables`` tables;
    exact cosine is verified only within buckets.  Candidate generation is a
    shuffle on (table, bucket) — linear in corpus size.  Precision is exact
    (every emitted pair is re-scored); recall is the LSH S-curve
    1−(1−p₁^planes)^tables with p₁ = 1−θ/π, high for true near-dups
    (cos ≥ 0.9 → 98% at the defaults), deliberately probabilistic for
    barely-similar pairs.  Fully deterministic (md5-parity hyperplanes), so
    a SQL oracle can reproduce the bucketing — including which pairs
    surface — exactly (see queries/llm.py).

    TWO VERIFY STRATEGIES (round 11 — the 100× rehearsal found the old
    single strategy's cliff).  ``verify=``

    * ``"broadcast"`` — skinny (id, table, bucket) candidates → distinct
      → cosine via TWO broadcast joins against the vector table, with an
      EXPLICIT ``F.broadcast`` (the round-10 shape relied on the
      planner's 64 MB auto-threshold: a 113 MB double-width vector table
      silently fell into sort-merge joins whose sorts carried a vector
      payload per CANDIDATE — 123M rows × 0.5 KB at 220k vectors / 21
      tables — an unbounded spill that filled the rehearsal disk).
      Fastest whenever one copy of the vectors fits every executor.
    * ``"inline"`` — bucket rows carry their vector and all-tables
      bucket array (``srp_bucket_rows(carry_vec=True)``); the join
      output streams through a canonical-meeting filter (first agreeing
      table — dedup WITHOUT an aggregate, the SimHash canonical-combo
      trick) straight into the codegen'd cosine, merge-hinted so AQE
      cannot broadcast-convert the fat self-join.  No vector ever moves
      per-candidate — vector movement is bounded by the bucket relation
      (n_tables× duplication); the billion-vector regime where nothing
      broadcasts.  Measured at 100× (220k × 21 tables): 151 s where the
      un-hinted broadcast-assuming shape died.
    * ``"inline_q8"`` (round 12) — the inline shape with the float64
      vector replaced by a symmetric int8 quantization (+ scale, Σ|q|,
      norm): ~6× less shuffle volume in the bucket relation (the byte
      cost that dominates the inline regime).  The join discards a
      candidate only when a RIGOROUS quantization-error upper bound on
      its cosine stays under the threshold (lossless; see the inline
      comment), and the ~output-sized survivors re-score EXACTLY
      against the vector table via a broadcast of the skinny survivor
      list — emitted cosines are bitwise-identical to the other
      strategies.  Measured at 300× (600k vectors, default 8 GiB
      session): 299 s inline → 125 s inline_q8 (2.4×); the 1000×
      rehearsal (2M vectors, 104M bucket rows) completes in 684 s on
      the SAME default session — no memory tuning — where the
      carry-vector inline filled the 78 GB local scratch and died.  At
      100× broadcast remains fastest (35 s) and auto still picks it
      below the 256 MB bound.
    * ``"auto"`` (default) — ``"broadcast"`` while the estimated vector
      table (rows × (dim·elem + 24 B)) stays under 256 MB — well inside
      what an explicit broadcast handles, 4× the planner's conservative
      threshold — else ``"inline_q8"`` (plain ``"inline"`` remains the
      explicit fallback).

    Signatures come from the vectorized :func:`srp_bucket_rows` stage
    (the equivalent Catalyst expression tree costs seconds of analysis
    per run).  ``materialize`` persists the bucket rows before the
    self-join so the signature stage runs once, not on both join sides;
    ``materialize_path`` writes them to a parquet table at that path
    instead (the cluster-scale form — see dedup.materialize_stage).

    SCALING THE BUCKET SPACE: bucket count is 2^n_planes per table, so a
    growing corpus at FIXED planes grows per-bucket occupancy linearly and
    the bucket self-join quadratically.  The DEFAULT is therefore
    ``n_planes="auto"``: :func:`auto_srp_params` derives planes (past
    the 2^6·target_bucket-row knee, occupancy itself shrinks as
    n^(−c/(1−c)) so candidate volume stays ~n — the round-12
    linear-candidates rule) and compensating tables from the corpus
    cardinality — supplied via ``corpus_count`` when the caller already
    knows it (a catalog rowcount at 100 TB), else one narrow
    ``df.count()`` scan.  Explicit ints keep working and skip the
    count.  Measured at 10× the sf0.1 corpus, planes 6→9 brought the run
    from 11.9× back to 0.8× of the base time (SCALE.md scaling table)."""
    n = corpus_count if corpus_count is not None else (
        df.count() if (n_planes == "auto" or n_tables == "auto"
                       or cp_hashes == "auto" or verify == "auto") else 0)
    if scheme == "cp":
        # cross-polytope scheme (round 13): n_planes plays the FINE-BITS
        # role r; auto resolves (k, r, tables) jointly from the
        # calibrated collision table
        if (cp_hashes == "auto" or n_planes == "auto"
                or n_tables == "auto"):
            auto_k, auto_r, auto_t = auto_cp_params(n, threshold, dim)
            cp_hashes = auto_k if cp_hashes == "auto" else cp_hashes
            n_planes = auto_r if n_planes == "auto" else n_planes
            n_tables = auto_t if n_tables == "auto" else n_tables
    elif scheme == "srp":
        cp_hashes = 0
        if n_planes == "auto" or n_tables == "auto":
            pinned = None if n_planes == "auto" else n_planes
            auto_p, auto_t = auto_srp_params(n, threshold, planes=pinned)
            n_planes = auto_p
            n_tables = auto_t if n_tables == "auto" else n_tables
    else:
        raise ValueError(f"scheme must be srp|cp, got {scheme!r}")
    if rescore not in ("partitioned", "broadcast"):
        raise ValueError(
            f"rescore must be partitioned|broadcast, got {rescore!r}")
    if verify == "auto":
        elem = 8 if "double" in dict(df.dtypes)[vec_col] else 4
        verify = ("broadcast"
                  if n * (dim * elem + 24) <= 256 * 1024 * 1024
                  else "inline_q8")
    if verify not in ("broadcast", "inline", "inline_q8"):
        raise ValueError(f"verify must be auto|broadcast|inline|inline_q8, "
                         f"got {verify!r}")
    if verify == "inline_q8" and threshold <= 0:
        # the 1e-9 relative slack on the prefilter RHS LOOSENS the bound
        # only when threshold·n_a·n_b > 0; at threshold <= 0 it would
        # TIGHTEN it instead, quietly voiding the lossless guarantee
        raise ValueError(
            f"verify='inline_q8' requires threshold > 0 (got {threshold}); "
            "use verify='broadcast' or 'inline' for non-positive thresholds")

    def _stage(frame):
        if materialize_bucketed is not None:
            # PERSISTENT LSH INDEX TABLE (round 13, the q9 write-once
            # recipe applied to the bucket relation): saveAsTable
            # bucketed AND sorted on the join keys — both sides of the
            # self-join then read the SAME co-located files, so the join
            # compiles with NO Exchange and NO Sort on the candidate
            # relation at all.  One repartition-write (the only shuffle
            # the relation ever pays, amortized across every query) and
            # the table survives the session — the 100 TB shape for an
            # index you probe repeatedly, and locally the shape that
            # keeps a ≥20M-vector rehearsal inside the scratch budget
            # (no sort spill, no shuffle files at join time).
            spark = frame.sparkSession
            if not spark.catalog.tableExists(materialize_bucketed):
                # WRITE-ONCE, like the q9 bucketed recipe: re-running
                # the query reuses the index table; DROP TABLE to
                # refresh after the corpus changes
                (frame.repartition(bucket_files, "tbl", "bucket")
                 .write.mode("overwrite")
                 .bucketBy(bucket_files, "tbl", "bucket")
                 .sortBy("tbl", "bucket")
                 .saveAsTable(materialize_bucketed))
            return spark.table(materialize_bucketed)
        if materialize_path is not None:
            from map_reduce_folds_spark.operators.dedup import (
                materialize_stage)

            return materialize_stage(frame, materialize_path)
        if materialize:
            # lazy localCheckpoint: reused by the self-join's two sides,
            # GC-cleaned (persist() on a lazily-returned frame leaks in
            # the CacheManager unless the caller unpersists)
            return frame.localCheckpoint(eager=False)
        return frame

    if verify == "broadcast":
        buckets = _stage(srp_bucket_rows(
            df, id_col, vec_col, dim, n_planes, n_tables,
            cp_hashes=cp_hashes))
        a, b = buckets.alias("a"), buckets.alias("b")
        cand = a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        ).select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
        )
        # Explicit pair-keyed repartition UNDER the dedup aggregate (one
        # Exchange either way — the aggregate reuses this partitioning),
        # with a USER partition count so AQE's byte-based coalescing
        # cannot collapse the skinny (16 B/row) candidate relation to one
        # task: the downstream verify is per-row EXPENSIVE (interpreted
        # left-fold cosine, ~5 us/pair — the fold itself is the right
        # choice: an unrolled 64-term codegen chain measured 3x SLOWER),
        # so partition count must follow row-wise work, not bytes.
        # Measured at sf0.1: verify stage 1.49 s -> 0.25 s, bitwise
        # identical.  Partition count comes from the session conf, so it
        # scales with the cluster, and the guide's deterministic-key
        # discipline holds (hash of the pair, not round-robin).
        try:
            n_part = int(df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            n_part = df.sparkSession.sparkContext.defaultParallelism
        cand = cand.repartition(n_part, "id_a", "id_b").distinct()
        # verify stays JVM-side: per-pair norms + left-fold dot (an
        # Arrow-batch numpy verify was measured SLOWER here — shipping
        # 2·dim doubles per candidate through Arrow costs more than the
        # interpreted fold saves); the vector table broadcasts
        # EXPLICITLY — the planner's own threshold refusing a 113 MB
        # table is exactly what produced the fatal fat-SMJ fallback
        vecs = df.select(
            F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec"),
            norm(F.col(vec_col), dim).alias("__n"),
        )
        out = (
            cand.join(F.broadcast(vecs.select(
                F.col("__vid").alias("id_a"), F.col("__vec").alias("va"),
                F.col("__n").alias("na"))), "id_a")
            .join(F.broadcast(vecs.select(
                F.col("__vid").alias("id_b"), F.col("__vec").alias("vb"),
                F.col("__n").alias("nb"))), "id_b")
            .select(
                "id_a", "id_b",
                (dot(F.col("va"), F.col("vb"), dim)
                 / (F.col("na") * F.col("nb"))).alias("cos_sim"),
            )
        )
        return out.filter(F.col("cos_sim") >= threshold)

    if verify == "inline_q8":
        # Round 12 — the billion-vector byte-cost fix: bucket rows carry
        # a symmetric int8 quantization (+ scale, Σ|q|, float norm)
        # instead of the float64 vector (~6× less shuffle volume in the
        # relation that dominates the inline regime).  The join filters
        # candidates with a RIGOROUS upper bound on the true dot:
        # |dot(a,b) − s_a·s_b·dot(qa,qb)| ≤ s_a·s_b·(A1/2 + B1/2 + d/4)
        # (per-element quantization error ≤ s/2, triangle inequality),
        # so a pair is discarded ONLY when even the upper bound stays
        # under the threshold — lossless by construction (a 1e-9
        # relative slack on the RHS absorbs float-norm ulps).  Survivors
        # are ~output-sized: they re-score EXACTLY against the vector
        # table (same left-fold arithmetic as the broadcast strategy, so
        # emitted cosines are bitwise-identical), joined by broadcasting
        # the skinny survivor list — the vector table never shuffles.
        buckets = _stage(srp_bucket_rows(
            df, id_col, vec_col, dim, n_planes, n_tables, carry_q8=True,
            cp_hashes=cp_hashes))
        # merge-hinted like the inline path: SMJ spills GRACEFULLY at
        # any session memory config, which a shuffled-hash build does
        # not (tried at the 1000× rehearsal: SHJ needs its per-partition
        # build inside the per-task memory slice, and the default
        # 32-partition/8 GiB session OOM'd even after data-sized
        # repartitioning — a checkpoint boundary does not carry the
        # partitioning into the join, so the exchange re-ran at 32).
        # Dropping __all (the canonical-dedup array, n_tables×8 B — the
        # dominant byte of the old row) already cut the sorted payload
        # ~70%, which is what makes the 1000× SMJ fit local scratch.
        a = buckets.alias("a").hint("merge")
        b = buckets.alias("b").hint("merge")
        qdot = F.aggregate(
            F.zip_with(F.col("a.__q8"), F.col("b.__q8"),
                       lambda x, y: x.cast("int") * y.cast("int")),
            F.lit(0), lambda acc, x: acc + x).cast("double")
        ubound = (F.col("a.__s") * F.col("b.__s")
                  * (qdot + F.col("a.__a1") / 2 + F.col("b.__a1") / 2
                     + F.lit(dim / 4.0)))
        # pair dedup AFTER the prefilter: survivors are ~output-sized
        # (× the pair's table multiplicity), so a distinct here is
        # cheap — the canonical-meeting trick is only needed when the
        # dedup input is the full candidate stream (the inline path)
        survivors = a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        ).filter(
            ubound >= F.lit(float(threshold)) * F.col("a.__n")
            * F.col("b.__n") * F.lit(1.0 - 1e-9)
        ).select(F.col("a.__id").alias("id_a"),
                 F.col("b.__id").alias("id_b")).distinct()
        vecs = df.select(
            F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec"),
            norm(F.col(vec_col), dim).alias("__nx"),
        )
        va = vecs.select(F.col("__vid").alias("id_a"),
                         F.col("__vec").alias("va"),
                         F.col("__nx").alias("na"))
        vb = vecs.select(F.col("__vid").alias("id_b"),
                         F.col("__vec").alias("vb"),
                         F.col("__nx").alias("nb"))
        if rescore == "broadcast":
            # r12 shape, kept as the explicit fast path when the caller
            # KNOWS the survivor list is small: the vector table never
            # shuffles at all
            out = (va.join(F.broadcast(survivors), "id_a")
                   .join(vb, "id_b"))
        else:
            # PARTITIONED rescore (round 13, default — removes the last
            # unbounded driver broadcast in the family): the skinny
            # survivor list joins the vector table on id — two shuffles
            # of an ~output-sized relation plus two id-keyed shuffles of
            # the vector table, all spillable.  No F.broadcast anywhere:
            # when the survivor side happens to be tiny, AQE may still
            # broadcast-convert it AT RUNTIME from real stats — that is
            # the safe direction (a bounded relation chosen by
            # measurement), the opposite of force-broadcasting a
            # relation whose size scales with the output.
            out = survivors.join(va, "id_a").join(vb, "id_b")
        out = out.select("id_a", "id_b",
                         (dot(F.col("va"), F.col("vb"), dim)
                          / (F.col("na") * F.col("nb"))).alias("cos_sim"))
        return out.filter(F.col("cos_sim") >= threshold)

    buckets = srp_bucket_rows(df, id_col, vec_col, dim, n_planes, n_tables,
                              carry_vec=True, cp_hashes=cp_hashes)
    # norm once per bucket row, via the SAME left-fold Catalyst chain the
    # oracle evaluates (a numpy norm would sum pairwise — different bits)
    buckets = _stage(buckets.withColumn("__n", norm(F.col("__vec"), dim)))
    # Pin the self-join to sort-merge: the bucket relation carries
    # vectors, so an AQE broadcast conversion (observed at the 100×
    # rehearsal — the reused-exchange side's stats tempt it) builds a
    # multi-GB hash relation on the driver and dies; SMJ spills
    # gracefully and its per-task sort input is bounded by the bucket
    # relation, not the candidate stream.
    a = buckets.alias("a").hint("merge")
    b = buckets.alias("b").hint("merge")
    # Pair dedup WITHOUT an aggregate (the SimHash canonical-combo trick,
    # round 10): a pair meeting in k tables co-keys k times, but each row
    # carries its bucket id in EVERY table (__all), so "this meeting's
    # table is the FIRST where the two rows agree" selects exactly one
    # meeting per pair — a scalar codegen filter in the join stage,
    # replacing the distinct whose partial hash-agg competed with the
    # join's sort buffers for task memory and OOM'd at the 100× scale
    # rehearsal.  The filter runs BEFORE the cosine arithmetic (integer
    # compares prune the duplicate meetings of true near-dups).
    canonical = F.array_position(
        F.zip_with(F.col("a.__all"), F.col("b.__all"),
                   lambda x, y: x == y),
        F.lit(True)) == (F.col("a.tbl").cast("bigint") + 1)
    return a.join(
        b,
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).filter(canonical).select(
        F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
        (dot(F.col("a.__vec"), F.col("b.__vec"), dim)
         / (F.col("a.__n") * F.col("b.__n"))).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — exact, via self-join.

    O(n²/2) scoring: correct-by-construction BASELINE for small/medium n
    (differential tests measure LSH recall against it) — NOT the production
    dedup path; that is :func:`embedding_near_dup_pairs_lsh`."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  norm(F.col(vec_col), dim).alias("na"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  norm(F.col(vec_col), dim).alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    out = pairs.select(
        "id_a", "id_b",
        (dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb"))).alias("cos_sim"),
    )
    return out.filter(F.col("cos_sim") >= threshold)


def group_centroids(
    df: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 32,
) -> DataFrame:
    """Per-group embedding centroids as (group, pos, mean_val, n) rows —
    deterministic under ANY partitioning via a two-level tree fold:

    1. bucket = id % n_buckets; within (group, pos, bucket) the values fold
       left in id order;
    2. per (group, pos) the bucket sums fold left in bucket order.

    Both levels are explicit ordered folds, so the result is bitwise
    reproducible (and SQL-mirrorable) — unlike a bare SUM(double), whose
    addition order Spark does not define.  The same two-level shape is the
    100 TB answer: per-bucket collects stay bounded (corpus/n_buckets per
    group), and n_buckets scales with the data."""
    ex = df.select(
        F.col(group_col).alias("g"), F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos0", "val"),
    ).select(
        "g", "__id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "val",
        (F.col("__id") % n_buckets).alias("bkt"),
    )
    fold = lambda packed: F.aggregate(  # noqa: E731 — ordered left fold
        F.array_sort(packed), F.lit(0.0), lambda acc, s: acc + s["v"]
    )
    lvl1 = ex.groupBy("g", "pos", "bkt").agg(
        fold(F.collect_list(F.struct(F.col("__id").alias("o"),
                                     F.col("val").alias("v")))).alias("bsum"),
        F.count(F.lit(1)).alias("bn"),
    )
    return lvl1.groupBy("g", "pos").agg(
        (fold(F.collect_list(F.struct(F.col("bkt").alias("o"),
                                      F.col("bsum").alias("v"))))
         / F.sum("bn")).alias("mean_val"),
        F.sum("bn").alias("n"),
    ).select(F.col("g").alias(group_col), "pos", "mean_val", "n")


def group_centroids_sql(
    table_expr: str, group_col: str, id_col: str, vec_col: str,
    n_buckets: int = 32,
) -> str:
    """DuckDB SQL mirroring :func:`group_centroids` fold-for-fold."""
    return f"""
    WITH ex AS (
        SELECT {group_col} AS g, {id_col} AS id,
               unnest(range(1, len({vec_col}) + 1)) AS pos,
               unnest(CAST({vec_col} AS DOUBLE[])) AS val,
               {id_col} % {n_buckets} AS bkt
        FROM {table_expr}
    ),
    lvl1 AS (
        SELECT g, pos, bkt,
               0.0 + list_reduce(list(val ORDER BY id), (a, b) -> a + b) AS bsum,
               COUNT(*) AS bn
        FROM ex GROUP BY 1, 2, 3
    )
    SELECT g AS {group_col}, pos,
           (0.0 + list_reduce(list(bsum ORDER BY bkt), (a, b) -> a + b))
               / CAST(SUM(bn) AS DOUBLE) AS mean_val,
           CAST(SUM(bn) AS BIGINT) AS n
    FROM lvl1 GROUP BY 1, 2
    """


def blocked_matmul_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    max_queries: int = 4096,
) -> DataFrame:
    """EXACT top-k neighbors via broadcast-model block scoring — the
    |Q| ≫ broadcast-join-threshold form of :func:`brute_force_topk`.

    The query block (≤ ``max_queries`` vectors) is collected once and
    shipped to every task as a numpy matrix; each corpus Arrow batch scores
    all queries in one vectorized pass and emits only its BATCH-LOCAL top-k
    per query, so the shuffle carries ≈ #batches·|Q|·k candidate rows —
    never the full |Q|×N score matrix.  A global per-query top-k finishes.

    A query side LARGER than ``max_queries`` RAISES (no-silent-caps
    discipline, SCALE.md): the broadcast block is the operator's whole
    scale contract, so answering only the first 4,096 of 5,000 queries
    would be a silently partial result.  For large query sets use
    :func:`srp_lsh_topk` / :func:`ivf_topk` (bucketed, no driver block)
    or raise ``max_queries`` to what driver/executor memory affords.

    Bitwise parity with the SQL oracle: scores accumulate per-dimension in
    index order (left fold), identical to :func:`cosine_sql`'s chains."""
    import numpy as np

    qrows = (queries.select(id_col, vec_col)
             .orderBy(id_col).limit(max_queries + 1).collect())
    if len(qrows) > max_queries:
        raise ValueError(
            f"blocked_matmul_topk: query side exceeds max_queries="
            f"{max_queries} — a truncated broadcast block would silently "
            "answer only a prefix of the queries; use srp_lsh_topk/"
            "ivf_topk for large query sets or raise max_queries")
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    nq = np.zeros(len(qrows))
    for i in range(q_mat.shape[1]):  # left-fold norms (oracle-exact)
        nq += q_mat[:, i] * q_mat[:, i]
    nq = np.sqrt(nq)

    id_type = dict(corpus.dtypes)[id_col]
    schema = f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            c = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            d = np.zeros((len(pdf), len(q_ids)))
            nc = np.zeros(len(pdf))
            for i in range(c.shape[1]):  # left fold over dims
                d += c[:, i : i + 1] * q_mat[:, i]
                nc += c[:, i] * c[:, i]
            cos = d / (np.sqrt(nc)[:, None] * nq)
            cids = pdf[id_col].to_numpy()
            self_mask = cids[:, None] == q_ids  # exclude query==neighbor
            cos_m = np.where(self_mask, -np.inf, cos)
            kk = min(k, len(pdf))
            rows = {"query_id": [], "neighbor_id": [], "cos_sim": []}
            for qi in range(len(q_ids)):
                # batch-local top-k with the SAME tie-break as the global
                # window (cos desc, neighbor_id asc) — ties at the batch
                # boundary otherwise break exactness
                sel = np.lexsort((cids, -cos_m[:, qi]))[:kk]
                keep = np.isfinite(cos_m[sel, qi])
                sel = sel[keep]
                rows["query_id"].extend([q_ids[qi]] * len(sel))
                rows["neighbor_id"].extend(cids[sel])
                rows["cos_sim"].extend(cos_m[sel, qi])
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(score, schema=schema)
    return topk_per_group(
        partial, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id")], k
    )


def _train_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, dim: int,
    n_centroids: int, sample_limit: int = 8192, iters: int = 8,
):
    """Deterministic mini-kmeans coarse quantizer: fixed sample (lowest ids),
    fixed init (first K of sample), fixed iteration count.  The model is
    tiny (K×dim floats) and trains driver-side on a bounded sample — the
    standard IVF pattern: train small, broadcast, assign at scale."""
    import numpy as np

    sample = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_limit).collect()
    )
    x = np.array([list(r[1]) for r in sample], dtype=np.float64)
    cents = x[:n_centroids].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_centroids):
            m = x[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def _cell_dists(vec: Column, centroids: list[list[float]], dim: int) -> Column:
    """array<struct<d,double idx,int>> of squared distances to each centroid
    (only the -2·v·c + |c|² part — |v|² is constant under argmin)."""
    cells = []
    for idx, cent in enumerate(centroids):
        c2 = sum(v * v for v in cent)
        coeffs = F.array(*[F.lit(-2.0 * c) for c in cent])
        score = dot(vec, coeffs) + F.lit(c2)
        cells.append(F.struct(score.alias("d"), F.lit(idx).alias("idx")))
    return F.array(*cells)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_centroids: int | str = "auto",
    n_probe: int = 4,
    corpus_count: int | None = None,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned
    to their nearest centroid cell once; each query probes its ``n_probe``
    nearest cells and scores exact cosine only within them.

    Scale shape: the assignment pass is one narrow scan (no shuffle); the
    search joins on cell id — per-query work is |corpus|·(n_probe/K) instead
    of |corpus|.  Recall depends on cluster structure; on unclustered data
    prefer srp_lsh_topk.

    ``n_centroids="auto"`` (default) uses the standard ``≈√n`` rule
    (clamped to [16, 1024] — the model must stay a broadcastable k×dim
    and trainable on the bounded driver sample), so per-cell occupancy
    grows as √n instead of linearly at a fixed K."""
    if centroids is None:
        if n_centroids == "auto":
            import math

            n = corpus_count if corpus_count is not None else corpus.count()
            n_centroids = max(16, min(1024,
                                      math.ceil(math.sqrt(max(n, 1)))))
        centroids = _train_centroids(corpus, id_col, vec_col, dim,
                                     n_centroids)
    # centroids= accepts an externally-trained model — e.g. the
    # DISTRIBUTED full-corpus fit (kmeans_fit_distributed), whose exact
    # SQL mirror makes THIS search oracle-able end-to-end (the
    # driver-sample fit stays the quick default)

    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("cn"),
        F.array_min(_cell_dists(F.col(vec_col), centroids, dim))["idx"].alias("cell"),
    )
    q_cells = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("qn"),
        F.slice(F.array_sort(_cell_dists(F.col(vec_col), centroids, dim)),
                1, n_probe).alias("probes"),
    ).select(
        "query_id", "qv", "qn", F.explode(F.col("probes")["idx"]).alias("cell")
    )
    cand = c_assigned.join(
        F.broadcast(q_cells),
        (q_cells.cell == c_assigned.cell) & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        (dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
    )
    return topk_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id")], k
    )


def _probe_masks(n_bits: int, n_probe: int) -> list[int]:
    """Deterministic multi-probe order: own cell, then Hamming-distance-1
    cells in plane order (0, 1, 2, 4, …).  n_probe ≤ n_bits + 1."""
    if n_probe > n_bits + 1:
        raise ValueError(f"n_probe={n_probe} > n_bits+1={n_bits + 1}")
    return ([0] + [1 << b for b in range(n_bits)])[:n_probe]


def ivf_srp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_bits: int | str = "auto",
    n_probe: int | str = "auto",
    table: int = 9,
    corpus_count: int | None = None,
    materialize_path: str | None = None,
) -> DataFrame:
    """IVF approximate top-k with a **data-independent SRP coarse
    quantizer**: the 2^``n_bits`` cells are the sign patterns of ``n_bits``
    md5-parity hyperplanes (:func:`srp_signature`), so — unlike the
    trained-kmeans :func:`ivf_topk` — the quantizer needs no training pass,
    no stored model, and has an exact SQL mirror
    (:func:`srp_signature_sql`).

    Default ``n_bits="auto"`` sizes the cell space from corpus
    cardinality — the same occupancy rule as :func:`auto_srp_params`
    (per-cell work is |corpus|·n_probe/2^n_bits, so FIXED bits make each
    probe's verify set grow linearly with the corpus): ``n_bits =
    max(3, ceil(log2(n / 2048)))`` holds expected cell occupancy ≈ 2048;
    ``n_probe="auto"`` compensates the finer cells by probing
    ``min(n_bits + 1, 4)`` Hamming-neighbor cells.  Supply
    ``corpus_count`` to skip the sizing scan; explicit ints pin the
    geometry (the oracle-backed registered query does).

    ``materialize_path``: write the cell-assigned corpus (id, vector,
    norm, cell) to a parquet table there and scan it back — this IS the
    inverted file: built once, the per-query-batch cost is a cell-keyed
    join against the stored table, not a re-assignment of the corpus.

    Same inverted-file structure as classic IVF: every corpus vector is
    assigned to exactly ONE cell (cells are disjoint — no dedup needed,
    unlike multi-table LSH); each query probes its own cell plus the
    ``n_probe - 1`` nearest cells in Hamming order (flip one sign bit per
    plane) and scores exact cosine only within them.

    Scale shape: the assignment pass is one narrow scan, no shuffle; the
    candidate join keys on cell id, so per-query work is
    |corpus|·(n_probe/2^n_bits).  ``table`` picks a hyperplane family
    disjoint from :func:`srp_lsh_topk`'s tables 0..n_tables-1.
    """
    if n_bits == "auto" or n_probe == "auto":
        import math

        n = corpus_count if corpus_count is not None else corpus.count()
        auto_bits = max(3, math.ceil(math.log2(max(n, 1) / 2048))) \
            if n > 2048 else 3
        n_bits = auto_bits if n_bits == "auto" else n_bits
        n_probe = min(n_bits + 1, 4) if n_probe == "auto" else n_probe
    masks = _probe_masks(n_bits, n_probe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("cn"),
        srp_signature(F.col(vec_col), dim, n_bits, table).alias("cell"),
    )
    if materialize_path is not None:
        from map_reduce_folds_spark.operators.dedup import materialize_stage

        c = materialize_stage(c, materialize_path)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("qn"),
        srp_signature(F.col(vec_col), dim, n_bits, table).alias("sig"),
    ).select(
        "query_id", "qv", "qn",
        F.explode(F.array(*[F.col("sig").bitwiseXOR(F.lit(m)) for m in masks]))
        .alias("cell"),
    )
    cand = c.join(
        F.broadcast(q),
        (q.cell == c.cell) & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        (dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
    )
    return topk_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id")], k
    )


def ivf_srp_topk_sql(
    queries_where: str,
    dim: int = 64,
    k: int = 10,
    n_bits: int = 3,
    n_probe: int = 4,
    table: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    src: str = "embeddings",
) -> str:
    """DuckDB oracle mirroring :func:`ivf_srp_topk` exactly — same
    hyperplanes (md5-parity literals), same left-fold projection chains,
    same probe masks, same tie-break."""
    masks = ", ".join(f"({m})" for m in _probe_masks(n_bits, n_probe))
    sig = srp_signature_sql(vec_col, dim, n_bits, table)
    return f"""
    WITH cs AS (
        SELECT {id_col} AS neighbor_id, {vec_col}, {sig} AS cell
        FROM {src}
    ),
    qs AS (
        SELECT {id_col} AS query_id, {vec_col}, {sig} AS sig
        FROM {src} {queries_where}
    ),
    probes AS (
        SELECT query_id, {vec_col}, xor(sig, CAST(m AS BIGINT)) AS cell
        FROM qs, (VALUES {masks}) AS masks(m)
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT p.query_id, c.neighbor_id,
               {cosine_sql(f'p.{vec_col}', f'c.{vec_col}', dim)} AS cos_sim
        FROM probes p JOIN cs c
          ON c.cell = p.cell AND p.query_id != c.neighbor_id
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) <= {k}
    """


# ---------------------------------------------------------------------------
# int8 embedding quantization (storage compression for training pipelines)
# ---------------------------------------------------------------------------

def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_vec: str = "qvec",
    out_scale: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` (tinyint).  4× storage cut for embedding
    corpora (the dominant byte cost of an ANN index at 100 TB); dot
    products on (qa·qb)·sa·sb stay within ~1% cosine error at dim 64.

    Pure Catalyst higher-order functions — a narrow per-row map, no
    shuffle, scan-shaped at any scale.  Zero vectors quantize to zeros
    with scale 0 (guarded division).  Deterministic, so the SQL mirror
    (:func:`quantize_int8_sql`) reproduces it bitwise."""
    v = F.col(vec_col)
    scale = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0), lambda acc, x: F.greatest(acc, x),
    ) / F.lit(127.0)
    q = F.when(F.col(out_scale) == 0.0,
               F.transform(v, lambda x: F.lit(0).cast("tinyint"))) \
        .otherwise(F.transform(
            v, lambda x: F.round(x.cast("double") / F.col(out_scale))
            .cast("tinyint")))
    return (
        df.withColumn(out_scale, scale)
        .withColumn(out_vec, q)
        .select(id_col, out_scale, out_vec)
    )


def dequantize_int8(
    df: DataFrame, qvec: str = "qvec", scale: str = "scale",
    out: str = "vec",
) -> DataFrame:
    """Inverse map: ``x_i ≈ q_i * scale`` (float) — for the round-trip
    error bound test and read-path reconstruction."""
    return df.withColumn(
        out, F.transform(F.col(qvec),
                         lambda q: q.cast("double") * F.col(scale)),
    )


def quantize_int8_sql(
    id_col: str = "vec_id", vec_col: str = "embedding",
    src: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`quantize_int8` (same max-abs scale, same
    round-half-away-from-zero, same tinyint cast)."""
    return f"""
    WITH s AS (
        SELECT {id_col},
               list_max(list_transform({vec_col},
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
               {vec_col} AS v
        FROM {src}
    )
    SELECT {id_col}, scale,
           CASE WHEN scale = 0
                THEN list_transform(v, x -> CAST(0 AS TINYINT))
                ELSE list_transform(v, x -> CAST(round(CAST(x AS DOUBLE)
                                                       / scale) AS TINYINT))
           END AS qvec
    FROM s
    """


def int8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
) -> DataFrame:
    """Top-k by QUANTIZED dot product: score = (Σ qaᵢ·qbᵢ)·s_a·s_b over
    the int8 codes from :func:`quantize_int8` — the read path of a
    compressed ANN index (4× less scan I/O than float32; integer
    multiply-accumulate).  The integer sum is order-insensitive, so the
    score — and therefore the returned top-k — is exactly reproducible
    (SQL mirror :func:`int8_topk_sql`); it approximates the float dot to
    ~1/127 relative error.  Broadcast query side, scan-shaped corpus side
    — same plan family as :func:`brute_force_topk`."""
    qq = quantize_int8(queries, id_col, vec_col).withColumnsRenamed(
        {id_col: "query_id", "scale": "qs", "qvec": "qa"})
    cq = quantize_int8(corpus, id_col, vec_col).withColumnsRenamed(
        {id_col: "neighbor_id", "scale": "cs", "qvec": "qb"})
    idot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"),
                   lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    scored = (
        cq.join(F.broadcast(qq), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (idot.cast("double") * F.col("qs") * F.col("cs"))
                .alias("qdot"))
    )
    return topk_per_group(
        scored, ["query_id"], [F.col("qdot").desc(), F.col("neighbor_id")], k
    )


def int8_topk_sql(
    queries_where: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    src: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`int8_topk` — same quantization, same
    integer dot (exact in any summation order), same tie-break.  The dot
    unrolls ``qvec[1..dim]``; out-of-range list indexing in DuckDB yields
    NULL silently, so a guard ``error()``s when any vector's length
    differs from ``dim`` instead of emitting NULL scores."""
    quant = quantize_int8_sql(id_col, vec_col, src)
    iprod = " + ".join(
        f"CAST(a.qvec[{i}] AS BIGINT) * CAST(b.qvec[{i}] AS BIGINT)"
        for i in range(1, dim + 1)
    )
    return f"""
    WITH q8 AS ({quant})
    SELECT query_id, neighbor_id, qdot FROM (
        SELECT a.{id_col} AS query_id, b.{id_col} AS neighbor_id,
               CASE WHEN len(a.qvec) != {dim} OR len(b.qvec) != {dim}
                    THEN error('int8_topk_sql: qvec length != dim={dim}')
                    ELSE CAST(({iprod}) AS DOUBLE) * a.scale * b.scale
               END AS qdot
        FROM q8 a JOIN q8 b ON a.{id_col} != b.{id_col}
        WHERE a.{id_col} IN (SELECT {id_col} FROM {src} {queries_where})
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY qdot DESC, neighbor_id) <= {k}
    """


# ---------------------------------------------------------------------------
# PCA embedding compression (train small, broadcast, project at scale —
# the same pattern as the IVF coarse quantizer's _train_centroids)
# ---------------------------------------------------------------------------

def pca_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 16,
    sample_limit: int = 8192,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit a ``k``-component PCA on a DETERMINISTIC bounded sample (lowest
    ids — same convention as :func:`_train_centroids`): returns
    ``(mean[dim], components[k][dim], explained_variance[k])``.

    The model is tiny (k·dim floats) and trains driver-side; at 100 TB
    the fit cost is a bounded ``limit`` collect, and the corpus-wide work
    is only the projection scan (:func:`pca_project`).  Eigenvector signs
    are canonicalized (largest-|coordinate| positive) so the model — and
    every downstream projection — is reproducible across runs.

    Reference analog: none (north-star LLM-pipeline surface): dimension
    reduction ahead of ANN indexing / clustering, where a 64→16 cut is a
    4× byte cut on the dominant storage and often raises IVF recall.
    For the FULL-CORPUS fit under the bitwise oracle gate (exact
    integer scatter matrix + unrolled power iteration) see
    :func:`pca_power_fit`."""
    import numpy as np

    sample = (
        corpus.select(id_col, vec_col).orderBy(id_col)
        .limit(sample_limit).collect()
    )
    x = np.array([list(r[1]) for r in sample], dtype=np.float64)
    if len(x) < 2:
        raise ValueError("pca_fit needs at least 2 sample vectors")
    mu = x.mean(axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / (len(x) - 1)
    vals, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()           # (k, dim)
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return (
        [float(v) for v in mu],
        [[float(v) for v in row] for row in comps],
        [float(vals[i]) for i in order],
    )


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pvec",
) -> DataFrame:
    """Project every vector onto the fitted components:
    ``p = components @ (x - mean)`` — one vectorized Arrow stage
    (batch matmul), scan-shaped, zero shuffles at any corpus size."""
    import numpy as np

    mu = np.asarray(mean, dtype=np.float64)
    C = np.asarray(components, dtype=np.float64)   # (k, dim)
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {out_col} array<double>"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            p = (x - mu) @ C.T
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                out_col: list(p),
            })

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int | str = "auto",
    n_tables: int | str = "auto",
    corpus_count: int | None = None,
    **cc_kw,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    literature): keep ONE canonical row per embedding near-dup CLUSTER —
    the transitive closure of the cosine-similarity pair graph, not a
    pairwise rule (A≈B and B≈C collapse to one cluster even when A·C
    fell below threshold).  The embedding analog of the SimHash
    ``dedup.simhash_components`` → ``graph.dedup_by_components`` pipeline:
    SRP-LSH candidate pairs (linear, bucketed, auto-sized geometry) →
    distributed connected components → drop every non-min-id cluster
    member.  ``cc_kw`` passes through to
    :func:`graph.connected_components` (``checkpoint_dir=``,
    ``max_iter=``)."""
    from map_reduce_folds_spark.operators.graph import dedup_by_components

    pairs = embedding_near_dup_pairs_lsh(
        df, id_col, vec_col, dim, threshold,
        n_planes=n_planes, n_tables=n_tables, corpus_count=corpus_count,
    )
    return dedup_by_components(df, pairs.select("id_a", "id_b"), id_col,
                               **cc_kw)


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — public literature): split each
# vector into m subvectors, k-means each subspace, store one byte-ish code
# per subspace.  Same train-small/broadcast/scan-at-scale shape as PCA and
# the IVF coarse quantizer; the asymmetric-distance (ADC) top-k reads ONLY
# the m-byte codes, an 8x-32x byte cut on the scan that dominates ANN cost.
# ---------------------------------------------------------------------------

def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    sample_limit: int = 8192,
    n_iter: int = 10,
) -> list[list[list[float]]]:
    """Train PQ codebooks on a DETERMINISTIC bounded sample (lowest ids —
    the ``pca_fit`` convention): returns ``codebooks[m][k][dim/m]``.

    Per-subspace Lloyd k-means with DETERMINISTIC seeding (the first
    ``k`` sample vectors' subvectors — no RNG state, reproducible across
    runs/engines) and a fixed iteration count; empty clusters keep their
    previous centroid (standard fix, deterministic).  The model is tiny
    (m·k·dim/m = dim·k floats); corpus-scale work is only the encode
    scan."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"pq_fit: dim={dim} not divisible by m={m}")
    sub = dim // m
    sample = (
        corpus.select(id_col, vec_col).orderBy(id_col)
        .limit(sample_limit).collect()
    )
    x = np.array([list(r[1]) for r in sample], dtype=np.float64)
    if len(x) < k:
        raise ValueError(f"pq_fit needs at least k={k} sample vectors")
    books = []
    for s in range(m):
        xs = x[:, s * sub:(s + 1) * sub]
        cent = xs[:k].copy()
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
        books.append([[float(v) for v in row] for row in cent])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-centroid subspace codes —
    one vectorized Arrow stage (batch distance matmuls), scan-shaped,
    zero shuffles at any corpus size.  Output: ``(id, out_col:
    array<int>)`` — the m-byte representation ADC scoring reads."""
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)     # (m, k, sub)
    m, _k, sub = B.shape
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {out_col} array<int>"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            codes = np.empty((len(x), m), dtype=np.int64)
            for s in range(m):
                xs = x[:, s * sub:(s + 1) * sub]
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin drops ||x||^2
                d = -2.0 * (xs @ B[s].T) + (B[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = d.argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                out_col: [list(map(int, row)) for row in codes],
            })

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    code_id: str = "vec_id",
    code_col: str = "pq_code",
    max_queries: int = 4096,
    max_cells: int = 4_000_000,
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): each query
    precomputes its m×k subspace distance table driver-side (tiny), the
    corpus pass reads ONLY the m-int codes and sums m table lookups per
    row — a pure scan over the compressed representation, batch-local
    top-k per query, one final per-query reduction.  Raises when the
    query side exceeds ``max_queries`` (the ``blocked_matmul_topk``
    no-silent-caps discipline).  Output: ``(query_id, neighbor_id,
    adc_dist)`` ascending by distance, deterministic (distance,
    neighbor_id) tie-break; a query drawn from the corpus never returns
    itself (the module-wide top-k convention)."""
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)     # (m, K, sub)
    m, K, sub = B.shape
    qrows = (queries.select(query_id, query_vec)
             .orderBy(query_id).limit(max_queries + 1).collect())
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_topk: query side exceeds max_queries={max_queries}; "
            "loop over id-ordered blocks or raise the cap deliberately")
    qids = np.array([r[0] for r in qrows])
    qx = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    # distance tables: (nq, m, K)
    tables = np.empty((len(qx), m, K), dtype=np.float64)
    for s in range(m):
        xs = qx[:, s * sub:(s + 1) * sub]           # (nq, sub)
        d = ((xs[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
        tables[:, s, :] = d
    id_type = dict(codes.dtypes)[code_id]

    def gen(batches):
        import pandas as pd

        # per-query candidate lists pruned to k on overflow — generic over
        # id types (the (dist, id) sort IS the operator's tie-break), no
        # numeric-negation trick that would crash on string ids
        best: list[list] = [[] for _ in range(len(qids))]

        def prune(h):
            h.sort()
            del h[k:]

        # max_cells caps the dense (n_queries × rows) distance block
        # (default ~32 MB of float64) regardless of max_queries — at the
        # 4096-query cap a default 10k-row Arrow batch would otherwise
        # stage ~330 MB of transient memory per concurrent task
        for pdf in batches:
            if pdf.empty:
                continue
            C_all = np.stack([np.asarray(c, dtype=np.int64)
                              for c in pdf[code_col]])      # (n, m)
            ids_all = pdf[code_id].to_numpy()
            step = max(1, max_cells // max(1, len(qids)))
            for lo in range(0, len(ids_all), step):
                C = C_all[lo:lo + step]
                ids = ids_all[lo:lo + step]
                # ADC: dist[q, n] = sum_s tables[q, s, C[n, s]] — m
                # column gathers (m is small; the gather is the whole
                # read path)
                d = np.zeros((len(qids), len(ids)), dtype=np.float64)
                for s in range(m):
                    d += tables[:, s, :][:, C[:, s]]
                for qi in range(len(qids)):
                    h = best[qi]
                    qid = qids[qi]
                    for ni in range(len(ids)):
                        if ids[ni] == qid:  # never return the query itself
                            continue
                        h.append((float(d[qi, ni]), ids[ni]))
                    if len(h) > 4 * k:
                        prune(h)
        out = []
        for qi, h in enumerate(best):
            prune(h)
            for dist_, nid in h:
                out.append((qids[qi], nid, dist_))
        yield pd.DataFrame(out, columns=["__qid", "__nid", "adc_dist"])

    # internal names: query and corpus commonly share an id column name,
    # and a duplicate-named output schema is unresolvable downstream
    part = codes.mapInPandas(
        gen, schema=f"__qid {id_type}, __nid {id_type}, adc_dist double")
    from pyspark.sql.window import Window

    w = Window.partitionBy("__qid").orderBy(
        F.col("adc_dist"), F.col("__nid"))
    return (
        part.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k).drop("__rn")
        .select(F.col("__qid").alias("query_id"),
                F.col("__nid").alias("neighbor_id"), "adc_dist")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_bits: int = 4,
    n_probe: int = 2,
    table: int = 9,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the standard billion-scale ANN layout
    (Jégou et al. 2011): the SRP coarse quantizer restricts each query to
    ``n_probe`` cells, and within them candidates are ranked by
    asymmetric PQ distance over their m-int codes — the scan reads
    CODES, never vectors.

    Fully relational scoring: each query row carries its m×K distance
    table as ONE Catalyst array expression over the codebook literals,
    and each candidate costs m ``element_at`` lookups inside an
    ``aggregate`` fold — no Python anywhere in the per-candidate path
    (the Arrow stage appears only in the index build,
    :func:`pq_encode`).  ``codes``: pass the stored index table
    ``(id, cell, pq_code)`` (built once via :func:`pq_encode` + the cell
    expression, the ``materialize_path`` discipline) to skip re-encoding;
    else it is derived here in one scan.

    Output: ``(query_id, neighbor_id, adc_dist)`` ascending, k per
    query, deterministic (adc_dist, neighbor_id) tie-break.  Approximate
    on BOTH axes (cell recall × PQ distortion) — recall-tested against
    the exact scan in tests."""
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)
    m, K, sub = B.shape
    if m * sub != dim:
        raise ValueError(
            f"ivf_pq_topk: codebooks ({m}x{K}x{sub}) do not cover "
            f"dim={dim}")
    if codes is None:
        enc = pq_encode(corpus, codebooks, id_col, vec_col)
        cells = corpus.select(
            F.col(id_col),
            srp_signature(F.col(vec_col), dim, n_bits, table).alias("cell"),
        )
        codes = enc.join(cells, id_col)
    masks = _probe_masks(n_bits, n_probe)
    # per-query m×K ADC table as a literal-codebook Catalyst expression
    qv = F.col(vec_col)

    def cell_dist(s: int, c: int):
        e = F.lit(0.0)
        for d in range(sub):
            t = F.element_at(qv, s * sub + d + 1) - F.lit(float(B[s][c][d]))
            e = e + t * t
        return e

    qtab = F.array(*[
        F.array(*[cell_dist(s, c) for c in range(K)]) for s in range(m)
    ])
    q = queries.select(
        F.col(id_col).alias("query_id"), qtab.alias("qtab"),
        srp_signature(qv, dim, n_bits, table).alias("sig"),
    ).select(
        "query_id", "qtab",
        F.explode(F.array(*[F.col("sig").bitwiseXOR(F.lit(mk))
                            for mk in masks])).alias("cell"),
    )
    c = codes.select(F.col(id_col).alias("neighbor_id"), "cell",
                     F.col("pq_code").alias("code"))
    cand = c.join(
        F.broadcast(q),
        (q.cell == c.cell) & (F.col("query_id") != F.col("neighbor_id")),
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, s: acc + F.element_at(
            F.element_at(F.col("qtab"), s + 1),
            F.element_at(F.col("code"), s + 1) + 1),
    )
    scored = cand.select("query_id", "neighbor_id", adc.alias("adc_dist"))
    from map_reduce_folds_spark.operators.relational import topk_per_group

    return topk_per_group(
        scored, ["query_id"], [F.col("adc_dist"), F.col("neighbor_id")], k)


def _int8_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int8 code arrays (bigint)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def mmr_topk(
    corpus: DataFrame,
    query_vec_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cand: int = 50,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998):
    diversified top-k — each pick maximizes ``relevance − max
    similarity to anything already picked`` (λ = ½, scaled ×2 so the
    objective stays INTEGER), the retrieval op that stops k near-dup
    results from crowding out coverage — the same redundancy axis the
    dedup family audits, applied at query time.

    ALL-INTEGER geometry: relevance and pairwise similarity are exact
    bigint dot products over the int8 codes of :func:`quantize_int8`
    (scale-free by design — the op is DEFINED on the quantized
    geometry, so every score is exactly reproducible).  Ties break to
    the smaller id.

    Plan: relevance is one scan-shaped broadcast-query pass; the top
    ``n_cand`` candidates (TakeOrderedAndProject) then run the greedy
    loop as k−1 tiny jobs over the candidate relation — each step
    joins the single winner back to update every candidate's running
    max-similarity (the winner is a 1-row broadcast; nothing collects
    beyond it).  Candidate codes ride the relation (n_cand × dim
    bytes).  Output: (pick, neighbor_id, rel, mmr) with pick 1..k;
    mmr = 2·rel for the first pick (no diversity term yet)."""
    q8 = quantize_int8(corpus, id_col, vec_col)
    qrow = F.broadcast(
        q8.where(F.col(id_col) == query_vec_id)
        .select(F.col("qvec").alias("__qq")))
    rel = (
        q8.where(F.col(id_col) != query_vec_id)
        .crossJoin(qrow)
        .select(F.col(id_col).alias("neighbor_id"),
                F.col("qvec"),
                _int8_dot(F.col("qvec"), F.col("__qq")).alias("rel"))
    )
    cand = rel.orderBy(F.col("rel").desc(), "neighbor_id").limit(n_cand) \
        .withColumn("maxsim", F.lit(None).cast("long")) \
        .localCheckpoint(eager=False)

    picks = []
    rem = cand
    for step in range(1, k + 1):
        # mmr = 2·rel − maxsim (λ=½ scaled ×2; first pick has no
        # diversity term).  argmax with (score desc, id) tie-break.
        score = (2 * F.col("rel")
                 - F.coalesce(F.col("maxsim"), F.lit(0))).alias("mmr")
        winner = (
            rem.select("neighbor_id", "qvec", "rel", score)
            .orderBy(F.col("mmr").desc(), "neighbor_id").limit(1)
            .localCheckpoint(eager=False)
        )
        picks.append(winner.select(
            F.lit(step).alias("pick"), "neighbor_id", "rel", "mmr"))
        if step == k:
            break
        w = F.broadcast(winner.select(
            F.col("neighbor_id").alias("__wid"),
            F.col("qvec").alias("__wv")))
        rem = (
            rem.crossJoin(w)
            .where(F.col("neighbor_id") != F.col("__wid"))
            .select("neighbor_id", "qvec", "rel",
                    F.greatest(
                        F.coalesce(F.col("maxsim"),
                                   F.lit(-(1 << 62)).cast("long")),
                        _int8_dot(F.col("qvec"), F.col("__wv")))
                    .alias("maxsim"))
            .localCheckpoint(eager=False)
        )
    out = picks[0]
    for p_ in picks[1:]:
        out = out.unionByName(p_)
    return out


def mmr_topk_sql(
    query_vec_id: int,
    k: int = 5,
    n_cand: int = 50,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`mmr_topk` — the greedy loop UNROLLED into
    k chained CTE stages (the pagerank_sql convention), same int8 codes
    (:func:`quantize_int8_sql`), same exact integer dots, same
    tie-breaks."""
    idot = ("list_sum(list_transform(list_zip({a}, {b}), "
            "s -> CAST(s[1] AS BIGINT) * s[2]))")
    parts = [f"""
    WITH q8 AS ({quantize_int8_sql(id_col, vec_col, src)}),
    qq AS (SELECT qvec AS v FROM q8 WHERE {id_col} = {query_vec_id}),
    cand AS (
        SELECT {id_col} AS nid, qvec,
               CAST({idot.format(a='qvec', b='qq.v')} AS BIGINT) AS rel
        FROM q8, qq WHERE {id_col} <> {query_vec_id}
        ORDER BY rel DESC, nid LIMIT {n_cand}
    ),
    m0 AS (SELECT nid, qvec, rel, CAST(NULL AS BIGINT) AS maxsim
           FROM cand)"""]
    for step in range(1, k + 1):
        prev = f"m{step - 1}"
        parts.append(f""",
    w{step} AS (
        SELECT nid, qvec, rel,
               2 * rel - COALESCE(maxsim, 0) AS mmr
        FROM {prev} ORDER BY mmr DESC, nid LIMIT 1
    )""")
        if step < k:
            parts.append(f""",
    m{step} AS (
        SELECT r.nid, r.qvec, r.rel,
               GREATEST(COALESCE(r.maxsim, {-(1 << 62)}),
                        CAST({idot.format(a='r.qvec', b='w.qvec')}
                             AS BIGINT)) AS maxsim
        FROM {prev} r, w{step} w WHERE r.nid <> w.nid
    )""")
    selects = [
        f"SELECT CAST({s} AS INT) AS pick, nid AS neighbor_id, rel, mmr "
        f"FROM w{s}" for s in range(1, k + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


def kmeans_seed_vectors(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km",
) -> "list[list[float]]":
    """The deterministic k-means init set: the ``k`` quantized-descaled
    vectors with the smallest portable ``hash60(id)`` (ties by id) — the
    exact seeds :func:`kmeans_fit_distributed` uses.  Exposed so callers
    fitting SEVERAL k values over one corpus (the elbow sweep) can run the
    seed scan ONCE: the ordering is total and k-independent, so the k=2
    and k=4 seed sets are PREFIXES of the k=8 list — one limit-8 collect
    replaces three corpus scans, bit-identically."""
    S = 1048576.0
    from map_reduce_folds_spark.operators.text import hash60

    xd = corpus.select(
        F.col(id_col),
        F.transform(vec_col, lambda v: F.floor(
            v.cast("double") * F.lit(S) + F.lit(0.5)) / F.lit(S)
        ).alias("__xd"),
    )
    seeds = (xd.withColumn("__h", hash60(F.col(id_col).cast("string"), salt))
               .orderBy("__h", id_col).limit(k).collect())
    return [list(r["__xd"]) for r in seeds]


def kmeans_fit_distributed(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    iters: int = 3,
    salt: str = "km",
    seed_vectors: "list[list[float]] | None" = None,
) -> DataFrame:
    """DISTRIBUTED Lloyd's k-means over the full corpus — the trained
    coarse quantizer without :func:`_train_centroids`'s bounded driver
    sample: every assignment and every centroid update is a distributed
    pass, so the model reflects ALL the data (the billion-vector IVF
    training shape: assign at scale, aggregate exact sums, update a
    bounded model).  Output long-form centroids:
    ``(cid, j, c, n)`` — per (cluster, 0-based dimension) the centroid
    coordinate and the cluster's member count after the final update.

    ENGINE-EXACT BY CONSTRUCTION (the bitwise-oracle design):

    * vectors quantize once to ``floor(v·2^20 + 0.5)`` integers (the
      cross-polytope convention) — per-cluster per-dimension SUMS of
      integers are exact under ANY partitioning/order;
    * a centroid coordinate is ``sum / (2^20·n)`` — one exact
      integer-valued cast and one correctly-rounded division, so Spark
      (which computes updates from collected K×dim sums, a BOUNDED
      model collect like the IVF sample fit) and the unrolled-CTE SQL
      oracle (:func:`kmeans_sql`, the pagerank convention) produce the
      SAME doubles;
    * distances fold ``(x_j − c_j)²`` LEFT-ASSOCIATED over j (the
      :func:`dot` discipline — the SQL term chain is the same IEEE
      sum); argmin is a struct-min with cid tie-break;
    * deterministic init: the ``k`` vectors with the smallest portable
      ``hash60(id)`` (ties by id); an emptied cluster keeps its
      previous centroid (mirrored via COALESCE).

    Fixed ``iters`` (no convergence test) keeps the oracle an exact
    k-stage unroll.  Capacity: per-dim sums stay exact while
    ``n·2^20·max|v| < 2^53`` (n < ~8·10^9 at |v| ≤ 1 — documented
    bound, ANSI overflow is the loud guard on the long cast)."""
    S = 1048576.0
    from map_reduce_folds_spark.operators.text import hash60

    qx = corpus.select(
        F.col(id_col),
        F.transform(vec_col, lambda v: F.floor(
            v.cast("double") * F.lit(S) + F.lit(0.5))).alias("__q"),
    )
    # DELIBERATELY no cache/localCheckpoint on the corpus-sized xd:
    # re-deriving it per iteration is a narrow scan + row-local
    # transform (scan-shaped, spill-free), while a block-manager cache
    # of a corpus-sized relation is the heap cliff the winnowing 1000×
    # rehearsal measured (SCALE.md round-13 session 2).
    # __q rides ALONG the assignment scan (r14): the per-iteration sums
    # used to come from assign(...).join(qx, id) — a full corpus
    # SELF-JOIN (shuffle both sides by id) per Lloyd iteration, whose
    # only purpose was re-attaching __q to the row that just computed
    # its cid FROM __q.  Carrying __q through the projection makes each
    # iteration one scan + one 512-group aggregate, zero joins; the
    # integer sums (and therefore every centroid double) are unchanged.
    xd = qx.select(
        id_col, "__q",
        F.transform("__q", lambda q: q / F.lit(S)).alias("__xd"),
    )
    if seed_vectors is None:
        seeds = (xd.withColumn("__h",
                               hash60(F.col(id_col).cast("string"), salt))
                   .orderBy("__h", id_col).limit(k).collect())
        cents = [list(r["__xd"]) for r in seeds]
    else:
        # caller-provided init (kmeans_seed_vectors shared across an
        # elbow sweep's k values); must be the same total-order prefix
        if len(seed_vectors) < k:
            raise ValueError(
                f"seed_vectors has {len(seed_vectors)} rows, need k={k}")
        cents = [list(v) for v in seed_vectors[:k]]
    counts = [0] * len(cents)

    def assign(cs):
        cells = []
        for idx, c in enumerate(cs):
            carr = F.array(*[F.lit(float(v)) for v in c])
            diffs = F.zip_with(F.col("__xd"), carr,
                               lambda x, y: (x - y) * (x - y))
            d = F.aggregate(diffs, F.lit(0.0), lambda a, t: a + t)
            cells.append(F.struct(d.alias("d"),
                                  F.lit(idx).alias("c")))
        return xd.select(id_col, "__q",
                         F.array_min(F.array(*cells))["c"].alias("__cid"))

    for _ in range(int(iters)):
        sums = (assign(cents)
                .select("__cid", F.posexplode("__q").alias("__j", "__qv"))
                .groupBy("__cid", "__j")
                .agg(F.sum(F.col("__qv").cast("long")).alias("__s"),
                     F.count(F.lit(1)).alias("__n"))
                .collect())  # bounded: K×dim rows (the model, not the data)
        agg: dict[int, list] = {}
        for r in sums:
            agg.setdefault(r["__cid"], [[0] * dim, 0])
            agg[r["__cid"]][0][r["__j"]] = r["__s"]
            agg[r["__cid"]][1] = r["__n"]
        new, ncounts = [], []
        for cid in range(len(cents)):
            if cid in agg:
                svec, n = agg[cid]
                new.append([float(s) / (S * float(n)) for s in svec])
                ncounts.append(n)
            else:
                new.append(cents[cid])
                ncounts.append(0)
        cents, counts = new, ncounts

    spark = corpus.sparkSession
    rows = [(cid, j, cents[cid][j], counts[cid])
            for cid in range(len(cents)) for j in range(dim)]
    return spark.createDataFrame(rows, "cid int, j int, c double, n bigint")


def kmeans_sql(
    k: int,
    iters: int,
    dim: int,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
) -> str:
    """DuckDB mirror of :func:`kmeans_fit_distributed`: the same
    quantization, init, left-associated distance chain, struct-min
    argmin, exact integer sums, and COALESCE empty-cluster rule,
    unrolled into ``iters`` CTE stages (the pagerank_sql convention)."""
    S = 1048576.0
    h60 = ("CAST(concat('0x', substr(md5(concat('" + salt + "', "
           f"CAST({id_col} AS VARCHAR))), 1, 15)) AS BIGINT)")

    def dist(x, c):
        return " + ".join(
            f"({x}[{j}] - {c}[{j}]) * ({x}[{j}] - {c}[{j}])"
            for j in range(1, dim + 1))

    sql = f"""
    WITH xq AS (
        SELECT {id_col},
               list_transform({vec_col},
                              v -> floor(CAST(v AS DOUBLE)*{S!r}+0.5)) AS q,
               list_transform({vec_col},
                              v -> floor(CAST(v AS DOUBLE)*{S!r}+0.5)/{S!r})
                   AS xd
        FROM {src}
    ),
    c0 AS (
        SELECT (ROW_NUMBER() OVER (ORDER BY {h60}, {id_col})) - 1 AS cid,
               xd AS c, CAST(0 AS BIGINT) AS n
        FROM xq
        QUALIFY (ROW_NUMBER() OVER (ORDER BY {h60}, {id_col})) <= {k}
    )"""
    prev = "c0"
    for it in range(int(iters)):
        sql += f""",
    a{it} AS (
        SELECT x.{id_col},
               (MIN({{'d': {dist('x.xd', 'c.c')}, 'c': c.cid}})).c AS cid
        FROM xq x CROSS JOIN {prev} c GROUP BY x.{id_col}
    ),
    s{it} AS (
        SELECT a.cid, u.j,
               CAST(SUM(CAST(x.q[u.j] AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM a{it} a JOIN xq x USING ({id_col}),
             LATERAL (SELECT unnest(range(1, {dim} + 1)) AS j) u
        GROUP BY 1, 2
    ),
    c{it + 1} AS (
        SELECT p.cid,
               COALESCE(list(CAST(s.s AS DOUBLE)
                             / ({S!r} * CAST(s.n AS DOUBLE))
                             ORDER BY s.j), p.c) AS c,
               CAST(COALESCE(MIN(s.n), 0) AS BIGINT) AS n
        FROM {prev} p LEFT JOIN s{it} s ON s.cid = p.cid
        GROUP BY p.cid, p.c
    )"""
        prev = f"c{it + 1}"
    sql += f"""
    SELECT cid, u.j - 1 AS j, c[u.j] AS c, n
    FROM {prev}, LATERAL (SELECT unnest(range(1, {dim} + 1)) AS j) u
    """
    return sql


def ivf_kmeans_topk_sql(
    queries_where: str,
    dim: int = 64,
    k: int = 10,
    km_k: int = 8,
    km_iters: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    src: str = "embeddings",
    salt: str = "km",
) -> str:
    """DuckDB oracle for IVF search under the DISTRIBUTED-trained kmeans
    quantizer: embeds :func:`kmeans_sql`'s unrolled training chain, then
    mirrors :func:`ivf_topk`'s cell rule exactly — score = Σ v_j·(−2c_j)
    + Σ c_j² (both left-associated chains, matching ``_cell_dists``'s
    Python-literal arithmetic term for term, since −2·c and c² are
    exact/correctly-rounded in either engine), nearest-cell assignment
    by (score, cid) struct-min, (score, cid)-ordered ``n_probe`` probe
    set, exact cosine within probed cells, (cos DESC, id) tie-break.
    The historically rows-only trained-kmeans IVF becomes hash-exact:
    the centroids themselves are now SQL-derivable."""
    km = kmeans_sql(km_k, km_iters, dim, src, id_col, vec_col, salt)

    def mdist(v, c):
        d = " + ".join(
            f"CAST({v}[{j}] AS DOUBLE) * (-2.0 * {c}[{j}])"
            for j in range(1, dim + 1))
        c2 = " + ".join(f"{c}[{j}] * {c}[{j}]" for j in range(1, dim + 1))
        return f"(({d}) + ({c2}))"

    return f"""
    WITH km AS ({km}),
    cent AS (SELECT cid, list(c ORDER BY j) AS c FROM km GROUP BY cid),
    cs AS (
        SELECT e.{id_col} AS neighbor_id, e.{vec_col},
               (MIN({{'d': {mdist(f'e.{vec_col}', 'ct.c')},
                     'c': ct.cid}})).c AS cell
        FROM {src} e CROSS JOIN cent ct
        GROUP BY e.{id_col}, e.{vec_col}
    ),
    qd AS (
        SELECT e.{id_col} AS query_id, e.{vec_col}, ct.cid AS cell,
               {mdist(f'e.{vec_col}', 'ct.c')} AS d
        FROM {src} e CROSS JOIN cent ct
        {queries_where}
    ),
    probes AS (
        SELECT query_id, {vec_col}, cell FROM qd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d, cell) <= {n_probe}
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT p.query_id, c.neighbor_id,
               {cosine_sql(f'p.{vec_col}', f'c.{vec_col}', dim)} AS cos_sim
        FROM probes p JOIN cs c
          ON c.cell = p.cell AND p.query_id != c.neighbor_id
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) <= {k}
    """


def kmeans_inertia(
    corpus: DataFrame,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-cluster inertia (within-cluster sum of squared distances to
    the cluster MEAN — the elbow-method / model-selection metric) under
    a fitted model's assignment, computed EXACTLY: in the 2^20-quantized
    integer space,

        SSE_q(cluster) = Σ_j ( n·Σ_i q_ij² − (Σ_i q_ij)² ) / n

    — pure integer numerators (DECIMAL(38,0)-staged: q² ≤ 2^40 per term
    and the cross terms overflow int64, the HHI/skewness discipline), so
    the per-cluster value is one exact cast and a deterministic
    division chain, independent of row order and partitioning.  Output:
    ``(cid, n, inertia)`` with inertia in original vector units
    (divided by n·2^40).  NOTE the mean in the identity is the EXACT
    assignment-set mean — the inertia a converged Lloyd step would
    have, the standard elbow quantity — not the distance to the passed
    (previous-iteration) centroid.

    Assignment mirrors :func:`ivf_topk`'s cell rule over the passed
    centroids (same literal arithmetic, struct-min, cid tie-break), so
    the composed train → assign → inertia pipeline is oracle-exact via
    :func:`kmeans_inertia_sql`."""
    S2 = 1048576.0 * 1048576.0
    qx = corpus.select(
        F.col(id_col),
        F.transform(vec_col, lambda v: F.floor(
            v.cast("double") * F.lit(1048576.0) + F.lit(0.5))).alias("__q"),
    )
    # __q rides along the assignment scan — same r14 rewrite as
    # kmeans_fit_distributed: the old a.join(qx, id) re-attached __q
    # via a full corpus self-join per call; identical integer sums,
    # zero joins.
    xd = qx.select(
        id_col, "__q",
        F.transform("__q",
                    lambda q: q / F.lit(1048576.0)).alias("__xd"))
    cells = []
    for idx, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(v)) for v in c])
        diffs = F.zip_with(F.col("__xd"), carr, lambda x, y: (x - y) * (x - y))
        d = F.aggregate(diffs, F.lit(0.0), lambda a, t: a + t)
        cells.append(F.struct(d.alias("d"), F.lit(idx).alias("c")))
    a = xd.select(id_col, "__q",
                  F.array_min(F.array(*cells))["c"].alias("__cid"))
    per_dim = (
        a
        .select("__cid", F.posexplode("__q").alias("__j", "__qv"))
        .groupBy("__cid", "__j")
        .agg(F.sum(F.col("__qv").cast("decimal(38,0)")).alias("__B"),
             F.sum((F.col("__qv") * F.col("__qv"))
                   .cast("decimal(38,0)")).alias("__A"),
             F.count(F.lit(1)).alias("__n"))
    )
    term = per_dim.select(
        "__cid", "__n",
        (F.col("__A") * F.col("__n") - F.col("__B") * F.col("__B"))
        .cast("decimal(38,0)").alias("__num"),
    )
    return term.groupBy(F.col("__cid").alias("cid")).agg(
        F.max("__n").cast("bigint").alias("n"),
        (F.sum("__num").cast("double")
         / (F.max("__n").cast("double") * F.max("__n").cast("double")
            * F.lit(S2))).alias("inertia"),
    )


def kmeans_inertia_sql(
    k: int,
    iters: int,
    dim: int,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
) -> str:
    """DuckDB mirror of train (:func:`kmeans_sql`) → assign → exact
    inertia: HUGEINT-staged integer numerators (DuckDB's int128 twin of
    Spark's DECIMAL(38,0)), identical division chain."""
    S2 = 1048576.0 * 1048576.0
    km = kmeans_sql(k, iters, dim, src, id_col, vec_col, salt)

    def dist(x, c):
        return " + ".join(
            f"({x}[{j}] - {c}[{j}]) * ({x}[{j}] - {c}[{j}])"
            for j in range(1, dim + 1))

    return f"""
    WITH km AS ({km}),
    cent AS (SELECT cid, list(c ORDER BY j) AS c FROM km GROUP BY cid),
    xq AS (
        SELECT {id_col},
               list_transform({vec_col},
                   v -> floor(CAST(v AS DOUBLE)*1048576.0+0.5)) AS q,
               list_transform({vec_col},
                   v -> floor(CAST(v AS DOUBLE)*1048576.0+0.5)/1048576.0)
                   AS xd
        FROM {src}
    ),
    af AS (
        SELECT x.{id_col},
               (MIN({{'d': {dist('x.xd', 'c.c')}, 'c': c.cid}})).c AS cid
        FROM xq x CROSS JOIN cent c GROUP BY x.{id_col}
    ),
    pd AS (
        SELECT a.cid, u.j,
               SUM(CAST(x.q[u.j] AS HUGEINT)) AS b,
               SUM(CAST(x.q[u.j] AS HUGEINT)
                   * CAST(x.q[u.j] AS HUGEINT)) AS aa,
               COUNT(*) AS n
        FROM af a JOIN xq x USING ({id_col}),
             LATERAL (SELECT unnest(range(1, {dim} + 1)) AS j) u
        GROUP BY 1, 2
    ),
    term AS (SELECT cid, n, aa * n - b * b AS nn FROM pd)
    SELECT cid, CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(nn) AS DOUBLE)
               / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
                  * {S2!r}) AS inertia
    FROM term GROUP BY cid
    """


# ---------------------------------------------------------------------------
# Distributed PCA: exact integer second moments + unrolled power iteration
# ---------------------------------------------------------------------------

def _pca_moments(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> "tuple[int, list[int], list[list[int]]]":
    """EXACT second moments of the 2^20-quantized corpus in one
    distributed pass: returns ``(n, S, G)`` with ``S_i = Σ q_i`` and
    ``G_ij = Σ q_i·q_j`` as exact Python ints — the bounded dim×dim
    model every covariance/PCA consumer needs (the kmeans shape: scan
    the corpus, aggregate exact integers, collect a model, never the
    data).

    The corpus pass is a vectorized Arrow stage emitting PER-CHUNK
    int64 partial Grams (dim² + dim + 1 rows per ~bounded chunk — a
    numpy ``qᵀq`` matmul, never a per-row Python loop); Spark then sums
    partials as DECIMAL(38,0), so the global sums stay exact at any
    scale and under any partitioning (int64 holds only a chunk:
    chunk_rows·max|q|² < 2^62 is enforced per chunk, the global sum
    may exceed 2^63 long before 10^12 rows).  Shuffle volume is
    ~dim²·n_chunks rows — model-sized, not corpus-sized: the 100 TB
    plan is one scan plus a metadata-weight reduce."""
    rel = pca_moment_relation(corpus, id_col, vec_col, dim)
    return pca_moments_from_relation(rel, dim)


def pca_moment_relation(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """The exact second moments AS A MERGEABLE RELATION ``(i, j, v)``
    (DECIMAL(38,0) sums; ``i=-1,j=-1`` carries n, ``j=-1`` carries S_i,
    else G_ij) — the persistable/incremental form of
    :func:`_pca_moments`: write a batch's relation once, and a new
    batch updates the model via :func:`pca_moment_merge` — pure
    additive union — WITHOUT rescanning history (the
    incremental-aggregate-maintenance story applied to the spectral
    model; moments are a monoid).  dim² + dim + 1 rows regardless of
    corpus size."""
    import numpy as np
    import pandas as pd

    nd = int(dim)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            q = np.floor(x * 1048576.0 + 0.5).astype(np.int64)
            lo = 0
            while lo < len(q):
                # int64 partial-Gram overflow guard: rows·max|q|² < 2^62
                mq = max(1, int(np.abs(q[lo:]).max()))
                step = max(1, min(len(q) - lo, (1 << 62) // (mq * mq)))
                c = q[lo:lo + step]
                g = c.T @ c                      # exact int64 under the bound
                s = c.sum(axis=0)
                ii, jj = np.indices((nd, nd))
                yield pd.DataFrame({
                    "i": np.concatenate([ii.ravel(), np.arange(nd), [-1]]),
                    "j": np.concatenate([jj.ravel(), np.full(nd, -1), [-1]]),
                    "v": np.concatenate([g.ravel(), s, [len(c)]]),
                })
                lo += step

    part = corpus.select(id_col, vec_col).mapInPandas(
        gen, schema="i int, j int, v long")
    return part.groupBy("i", "j").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("v"))


def pca_moment_merge(*relations: DataFrame) -> DataFrame:
    """Merge moment relations (additive monoid): union + re-sum.  The
    merged relation of batch A ∪ batch B equals the relation of the
    concatenated corpus EXACTLY (integer sums are associative/
    commutative), so a fit from merged per-batch moments is bitwise
    the batch fit — pinned by the pca_incremental_components oracle."""
    if not relations:
        raise ValueError("pca_moment_merge: need at least one relation")
    out = relations[0]
    for r in relations[1:]:
        out = out.unionByName(r)
    return out.groupBy("i", "j").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("v"))


def pca_moments_from_relation(
    rel: DataFrame,
    dim: int = 64,
) -> "tuple[int, list[int], list[list[int]]]":
    """Collect a (bounded, model-sized) moment relation into the
    ``(n, S, G)`` exact-int form the fit consumes."""
    nd = int(dim)
    rows = rel.collect()  # bounded: dim² + dim + 1 rows (the model)
    n = 0
    S = [0] * nd
    G = [[0] * nd for _ in range(nd)]
    for r in rows:
        v = int(r["v"])
        if r["i"] < 0:
            n = v
        elif r["j"] < 0:
            S[r["i"]] = v
        else:
            G[r["i"]][r["j"]] = v
    return n, S, G


def pca_power_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 2,
    iters: int = 8,
    moments: "tuple[int, list[int], list[list[int]]] | None" = None,
) -> "tuple[list[list[float]], list[float], float, int]":
    """Top-``n_components`` principal components of the embedding corpus
    by POWER ITERATION over the exact scatter matrix — the PCA
    dimensionality-reduction step of embedding-dedup pipelines (e.g.
    SemDeDup-style semantic dedup runs on PCA-reduced vectors; public
    literature), distributed the way :func:`kmeans_fit_distributed`
    distributes Lloyd's: the corpus-scale work is ONE exact-integer
    moment pass (:func:`_pca_moments`), the iteration runs on the
    bounded dim×dim model.

    ENGINE-EXACT BY CONSTRUCTION: the scatter matrix
    ``M = n·G − S·Sᵀ`` (the covariance identity — n² times the
    covariance of the quantized vectors) is exact INTEGER arithmetic,
    cast to double once (correctly rounded in both engines); every
    matvec folds LEFT-ASSOCIATED over j (the :func:`dot` discipline),
    the norm is one IEEE sqrt of a left-folded sum, deflation is
    ``M' = M − (λ·v_i)·v_j`` with pinned operation order, and the
    iteration count is FIXED — so the DuckDB mirror
    (:func:`pca_sql`) unrolls to the SAME doubles bitwise (the
    kmeans/pagerank convention).  Deterministic init ``v₀ = 1/8·𝟙``
    (0.125 is exact).  Returns ``(components, eigenvalues, trace, n)``
    where eigenvalues are of M (scale: n²·2^40·cov).

    ``moments=(n, S, G)`` skips the corpus pass when the caller already
    ran :func:`_pca_moments` (e.g. to also derive the exact mean for
    :func:`pca_residual_scores`) — ONE scan fits both."""
    n, S, G = moments if moments is not None else _pca_moments(
        corpus, id_col, vec_col, dim)
    if n == 0:
        raise ValueError("pca_power_fit: empty corpus")
    M = [[float(n * G[i][j] - S[i] * S[j]) for j in range(dim)]
         for i in range(dim)]
    comps: list[list[float]] = []
    lams: list[float] = []
    for _c in range(int(n_components)):
        v = [0.125] * dim if dim == 64 else [1.0 / float(dim)] * dim
        for _t in range(int(iters)):
            w = []
            for i in range(dim):
                acc = 0.0
                for j in range(dim):
                    acc = acc + M[i][j] * v[j]
                w.append(acc)
            nrm2 = 0.0
            for i in range(dim):
                nrm2 = nrm2 + w[i] * w[i]
            from math import sqrt
            nrm = sqrt(nrm2)
            if nrm == 0.0:
                raise ValueError(
                    "pca_power_fit: zero matvec — degenerate scatter "
                    "matrix (all vectors identical?)")
            v = [x / nrm for x in w]
        w = []
        for i in range(dim):
            acc = 0.0
            for j in range(dim):
                acc = acc + M[i][j] * v[j]
            w.append(acc)
        lam = 0.0
        for i in range(dim):
            lam = lam + v[i] * w[i]
        comps.append(v)
        lams.append(lam)
        for i in range(dim):
            lv = lam * v[i]
            for j in range(dim):
                M[i][j] = M[i][j] - lv * v[j]
    tr = 0.0
    Mt = [[float(n * G[i][j] - S[i] * S[j]) for j in range(dim)]
          for i in range(dim)]
    for i in range(dim):
        tr = tr + Mt[i][i]
    return comps, lams, tr, n


def pca_power_project(
    corpus: DataFrame,
    components: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "pc",
) -> DataFrame:
    """Project every vector onto fitted components: one scan, per-row
    left-associated dot products of the quantized-then-descaled vector
    ``xd = q/2^20`` against the component literals (bitwise-mirrorable:
    the same chain :func:`pca_project_sql` emits).  Output
    ``(id, pc1..pcK)`` — the reduced representation downstream dedup /
    clustering runs on."""
    S = 1048576.0
    xd = corpus.select(
        id_col,
        F.transform(vec_col, lambda v: F.floor(
            v.cast("double") * F.lit(S) + F.lit(0.5)) / F.lit(S)).alias("__xd"),
    )
    cols = [F.col(id_col)]
    for c, vec in enumerate(components):
        carr = F.array(*[F.lit(float(x)) for x in vec])
        score = F.aggregate(
            F.zip_with("__xd", carr, lambda a, b: a * b),
            F.lit(0.0), lambda acc, t: acc + t)
        cols.append(score.alias(f"{prefix}{c + 1}"))
    return xd.select(*cols)


def _pca_cte(
    dim: int,
    n_components: int,
    iters: int,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """WITH-clause body deriving ``v{c}`` (final component lists) and
    ``lam{c}`` / ``tr`` (eigenvalues of M, trace) — the exact mirror of
    :func:`pca_power_fit`'s arithmetic, unrolled."""
    S = 1048576.0
    init = 0.125 if dim == 64 else 1.0 / float(dim)

    def chain(terms):
        return " + ".join(terms)

    sql = f"""xq AS MATERIALIZED (
        SELECT {id_col},
               list_transform({vec_col},
                   v -> floor(CAST(v AS DOUBLE)*{S!r}+0.5)) AS q
        FROM {src}
    ),
    cnt AS MATERIALIZED (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM xq),
    mom AS MATERIALIZED (
        -- two separate LATERALs: DuckDB zips parallel unnests in one
        -- SELECT (diagonal only); the Gram needs the full i×j cross
        SELECT ui.i, uj.j,
               SUM(CAST(q[ui.i] AS HUGEINT) * CAST(q[uj.j] AS HUGEINT)) AS g
        FROM xq,
             LATERAL (SELECT unnest(range(1, {dim} + 1)) AS i) ui,
             LATERAL (SELECT unnest(range(1, {dim} + 1)) AS j) uj
        GROUP BY 1, 2
    ),
    sums AS MATERIALIZED (
        SELECT u.i, SUM(CAST(q[u.i] AS HUGEINT)) AS s
        FROM xq, LATERAL (SELECT unnest(range(1, {dim} + 1)) AS i) u
        GROUP BY 1
    ),
    mrow0 AS MATERIALIZED (
        SELECT mom.i,
               list(CAST((SELECT n FROM cnt) * mom.g - si.s * sj.s
                         AS DOUBLE)
                    ORDER BY mom.j) AS ml
        FROM mom
        JOIN sums si ON si.i = mom.i
        JOIN sums sj ON sj.i = mom.j
        GROUP BY mom.i
    ),
    trl AS MATERIALIZED (SELECT list(ml[i] ORDER BY i) AS t FROM mrow0),
    tr AS MATERIALIZED (SELECT {chain(f't[{i}]' for i in range(1, dim + 1))} AS tr
           FROM trl)"""
    for c in range(int(n_components)):
        sql += f""",
    v{c}_0 AS MATERIALIZED (SELECT [{', '.join([repr(init)] * dim)}]::DOUBLE[] AS v)"""
        for t in range(1, int(iters) + 1):
            mv = chain(f"m.ml[{j}] * vv.v[{j}]" for j in range(1, dim + 1))
            n2 = chain(f"w[{j}] * w[{j}]" for j in range(1, dim + 1))
            sql += f""",
    w{c}_{t} AS MATERIALIZED (SELECT m.i, {mv} AS w FROM mrow{c} m, v{c}_{t - 1} vv),
    v{c}_{t} AS MATERIALIZED (
        SELECT list_transform(w, x -> x / nrm) AS v
        FROM (SELECT w, sqrt({n2}) AS nrm
              FROM (SELECT list(w ORDER BY i) AS w FROM w{c}_{t}))
    )"""
        mv = chain(f"m.ml[{j}] * vv.v[{j}]" for j in range(1, dim + 1))
        ray = chain(f"vv.v[{i}] * w.w[{i}]" for i in range(1, dim + 1))
        sql += f""",
    mvf{c} AS MATERIALIZED (SELECT m.i, {mv} AS w FROM mrow{c} m, v{c}_{iters} vv),
    mvl{c} AS MATERIALIZED (SELECT list(w ORDER BY i) AS w FROM mvf{c}),
    lam{c} AS MATERIALIZED (SELECT {ray} AS lam FROM v{c}_{iters} vv, mvl{c} w),
    v{c} AS MATERIALIZED (SELECT v FROM v{c}_{iters})"""
        if c + 1 < int(n_components):
            defl = ", ".join(
                f"m.ml[{j}] - (l.lam * vv.v[m.i]) * vv.v[{j}]"
                for j in range(1, dim + 1))
            sql += f""",
    mrow{c + 1} AS MATERIALIZED (
        SELECT m.i, [{defl}]::DOUBLE[] AS ml
        FROM mrow{c} m, v{c} vv, lam{c} l
    )"""
    return sql


def pca_sql(
    dim: int = 64,
    n_components: int = 2,
    iters: int = 8,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`pca_power_fit`: long-form loadings
    ``(component, j, loading)`` — same quantization, same exact-integer
    scatter matrix, same left-associated matvec/norm/deflation chains,
    same fixed unroll."""
    body = _pca_cte(dim, n_components, iters, src, id_col, vec_col)
    parts = [
        f"""SELECT {c} AS component, u.j - 1 AS j, vv.v[u.j] AS loading
    FROM v{c} vv, LATERAL (SELECT unnest(range(1, {dim} + 1)) AS j) u"""
        for c in range(int(n_components))
    ]
    return ("WITH " + body + "\n    " +
            "\n    UNION ALL\n    ".join(parts))


def pca_variance_sql(
    dim: int = 64,
    n_components: int = 2,
    iters: int = 8,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of the (eigenvalue, var_share) summary: λ of the
    scatter matrix and λ/trace — both taken from the same unrolled
    chain, shares are one terminal IEEE division each."""
    body = _pca_cte(dim, n_components, iters, src, id_col, vec_col)
    parts = [
        f"""SELECT {c} AS component, l.lam AS eigenvalue,
           l.lam / t.tr AS var_share
    FROM lam{c} l, tr t"""
        for c in range(int(n_components))
    ]
    return ("WITH " + body + "\n    " +
            "\n    UNION ALL\n    ".join(parts))


def pca_project_sql(
    dim: int = 64,
    n_components: int = 2,
    iters: int = 8,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "pc",
) -> str:
    """DuckDB mirror of :func:`pca_power_project` under the in-SQL fit: per-id
    scores against the derived components — the same ``Σ xd_j·v_j``
    left-associated chain Spark's zip_with/aggregate fold evaluates."""
    S = 1048576.0
    body = _pca_cte(dim, n_components, iters, src, id_col, vec_col)
    score_cols = []
    joins = []
    for c in range(int(n_components)):
        ch = " + ".join(
            f"(x.q[{j}] / {S!r}) * v{c}.v[{j}]" for j in range(1, dim + 1))
        score_cols.append(f"0.0 + {ch} AS {prefix}{c + 1}")
        joins.append(f"v{c}")
    return (f"WITH {body}\n    SELECT x.{id_col}, "
            + ", ".join(score_cols)
            + f"\n    FROM xq x, " + ", ".join(joins))


def pca_means(moments: "tuple[int, list[int], list[list[int]]]") -> list[float]:
    """Exact per-dimension mean of the quantized-descaled corpus from a
    :func:`_pca_moments` result: ``m_j = double(S_j) / double(n) / 2^20``
    — each integer→double conversion is correctly rounded (Python
    ``float(int)`` ≡ DuckDB ``CAST(HUGEINT AS DOUBLE)`` ≡ Spark
    ``CAST(DECIMAL(38,0) AS DOUBLE)``), the divisions are single IEEE
    ops, so the literals Spark receives equal the doubles the SQL mirror
    derives in-query, bitwise."""
    n, S, _G = moments
    if n == 0:
        raise ValueError("pca_means: empty corpus")
    return [float(s) / float(n) / 1048576.0 for s in S]


def pca_residual_scores(
    corpus: DataFrame,
    components: "list[list[float]]",
    means: "list[float]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector RESIDUAL energy outside the fitted principal subspace —
    the classic PCA anomaly score a curation pipeline uses to flag
    off-manifold embeddings (corrupt decodes, wrong-modality rows,
    adversarial text) before dedup/clustering: for centered
    ``c = xd − mean``, ``resid = ‖c‖² − Σ_k (c·v_k)²`` — zero for
    vectors lying in ``mean + span(components)``, large for vectors the
    subspace cannot explain.

    ONE corpus scan, per-row bounded left-associated folds (the accepted
    embedding-verify HOF shape; nothing shuffles).  Arithmetic order is
    pinned — quantize/descale, per-element subtract, left-folded norm
    and dots, then ``(n2 − p1·p1) − p2·p2 …`` — so the DuckDB mirror
    (:func:`pca_residual_sql`) reproduces every double bitwise.

    Reference analog: none (north-star LLM-pipeline surface) — the
    outlier-gate complement of :func:`pca_power_project`."""
    S0 = 1048576.0
    if components and len(means) != len(components[0]):
        raise ValueError(
            f"pca_residual_scores: means dim {len(means)} != component "
            f"dim {len(components[0])}")
    marr = F.array(*[F.lit(float(m)) for m in means])
    cd = corpus.select(
        id_col,
        F.zip_with(
            F.transform(vec_col, lambda v: F.floor(
                v.cast("double") * F.lit(S0) + F.lit(0.5)) / F.lit(S0)),
            marr, lambda a, b: a - b).alias("__cd"),
    )
    cols = [F.col(id_col),
            F.aggregate("__cd", F.lit(0.0),
                        lambda acc, t: acc + t * t).alias("__n2")]
    for c, vec in enumerate(components):
        carr = F.array(*[F.lit(float(x)) for x in vec])
        p = F.aggregate(F.zip_with("__cd", carr, lambda a, b: a * b),
                        F.lit(0.0), lambda acc, t: acc + t)
        cols.append(p.alias(f"__p{c}"))
    staged = cd.select(*cols)
    resid = F.col("__n2")
    for c in range(len(components)):
        resid = resid - F.col(f"__p{c}") * F.col(f"__p{c}")
    return staged.select(id_col, resid.alias("resid"))


def pca_residual_sql(
    dim: int = 64,
    n_components: int = 2,
    iters: int = 8,
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`pca_residual_scores` under the in-SQL fit:
    the mean list derives from the SAME exact integer sums the fit used
    (``CAST(s AS DOUBLE)/CAST(n AS DOUBLE)/2^20``), the centered list is
    one subtraction per element, and the residual is the identical
    left-associated chain."""
    S0 = 1048576.0
    body = _pca_cte(dim, n_components, iters, src, id_col, vec_col)
    cd_terms = ", ".join(
        f"x.q[{j}] / {S0!r} - mn.m[{j}]" for j in range(1, dim + 1))
    n2 = " + ".join(f"cd[{j}] * cd[{j}]" for j in range(1, dim + 1))
    sql = f"""WITH {body},
    mn AS MATERIALIZED (
        SELECT list(CAST(s AS DOUBLE) / CAST((SELECT n FROM cnt) AS DOUBLE)
                    / {S0!r} ORDER BY i) AS m
        FROM sums
    ),
    cd AS MATERIALIZED (
        SELECT x.{id_col}, [{cd_terms}]::DOUBLE[] AS cd
        FROM xq x, mn
    ),
    stage AS (
        SELECT {id_col}, 0.0 + {n2} AS n2"""
    for c in range(int(n_components)):
        pc = " + ".join(f"cd[{j}] * v{c}.v[{j}]" for j in range(1, dim + 1))
        sql += f",\n               0.0 + {pc} AS p{c}"
    sql += ("\n        FROM cd, "
            + ", ".join(f"v{c}" for c in range(int(n_components)))
            + "\n    )\n")
    resid = "n2" + "".join(f" - p{c} * p{c}"
                           for c in range(int(n_components)))
    sql += f"    SELECT {id_col}, {resid} AS resid FROM stage"
    return sql


def kmeans_assign(
    corpus: DataFrame,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid under a fitted model
    — the standalone (id, cid) labeling step :func:`kmeans_inertia`
    embeds: quantize/descale, per-centroid LEFT-ASSOCIATED squared
    distance fold, ``(d, cid)`` struct-min (cid tie-break) — the same
    literal arithmetic :func:`kmeans_sql`'s assignment stages unroll,
    so any composition over the labels stays oracle-exact.  One scan,
    bounded per-row work (K·dim), nothing shuffles."""
    xd = corpus.select(
        F.col(id_col),
        F.transform(vec_col, lambda v: F.floor(
            v.cast("double") * F.lit(1048576.0) + F.lit(0.5))
            / F.lit(1048576.0)).alias("__xd"),
    )
    cells = []
    for idx, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(v)) for v in c])
        diffs = F.zip_with(F.col("__xd"), carr,
                           lambda x, y: (x - y) * (x - y))
        d = F.aggregate(diffs, F.lit(0.0), lambda a, t: a + t)
        cells.append(F.struct(d.alias("d"), F.lit(idx).alias("c")))
    return xd.select(id_col, F.array_min(F.array(*cells))["c"].alias("cid"))


def retrieval_eval(
    got: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    score_col: str = "cos_sim",
) -> DataFrame:
    """ANN QUALITY metrics per query — recall@k, MRR, nDCG@k of a
    retrieval result against exact ground truth (typically an LSH/IVF
    top-k vs the brute-force top-k): the eval harness that closes the
    similarity-search loop, AS AN OPERATOR, so index-parameter sweeps
    run distributed over millions of queries instead of driver-side.

    Determinism: ranks come from the family's standard (score DESC,
    id) tie-break; recall and reciprocal rank are single exact
    divisions; each DCG term ``1/log2(rank+1)`` rounds to 9 decimals
    BEFORE the fold (absorbing any log2 ulp), the fold is a sorted
    single-float accumulation (the EWMA discipline — immune to the
    multi-field list_reduce hazard), and ideal DCG folds the same
    rounded terms over ranks ``1..min(k, n_truth)``.  Emitting PER-
    QUERY rows (no cross-query mean) keeps every value order-free.

    Contract edges (mirrored in :func:`retrieval_eval_sql`): ``got`` is
    truncated to rank ≤ k (a deeper candidate list cannot leak beyond-k
    hits into @k metrics), ``truth`` is treated as a SET (duplicates
    deduped — the EXISTS semantics), and output is TRUTH-driven: a
    query whose index returned nothing emits a ``(0, 0, 0)`` row.

    Output: ``(query_id, n_truth, n_hits, recall_at_k, mrr, ndcg)``."""
    from pyspark.sql.window import Window as _W

    q, i, s = query_col, id_col, score_col
    rnk = F.row_number().over(
        _W.partitionBy(q).orderBy(F.col(s).desc(), F.col(i)))
    # rank ≤ k enforced HERE: a caller's deeper candidate list must not
    # leak beyond-k hits into metrics labeled @k (recall could exceed 1)
    g = (got.select(q, i, s).withColumn("__r", rnk).drop(s)
         .where(F.col("__r") <= int(k)))
    # truth treated as a SET (the EXISTS semantics of the SQL mirror):
    # duplicate ground-truth rows must not double-count hits
    t = (truth.select(F.col(q).alias("__tq"), F.col(i).alias("__ti"))
         .distinct())
    n_truth = t.groupBy(F.col("__tq").alias(q)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    marked = g.join(
        t, (F.col(q) == F.col("__tq")) & (F.col(i) == F.col("__ti")),
        "left").select(q, "__r", F.col("__ti").isNotNull().alias("__rel"))
    term = F.round(F.lit(1.0) / F.log2(F.col("__r").cast("double")
                                       + F.lit(1.0)), 9)
    per_q = marked.groupBy(q).agg(
        F.sum(F.when(F.col("__rel"), 1).otherwise(0)).cast("bigint")
        .alias("n_hits"),
        F.min(F.when(F.col("__rel"), F.col("__r"))).alias("__minr"),
        F.aggregate(
            F.array_sort(F.collect_list(
                F.when(F.col("__rel"), F.struct(
                    F.col("__r").alias("r"), term.alias("t"))))),
            F.lit(0.0), lambda acc, x: acc + x["t"]).alias("__dcg"),
    )
    ideal_n = F.least(F.lit(int(k)).cast("bigint"), F.col("n_truth"))
    idcg = F.aggregate(
        F.transform(F.sequence(F.lit(1).cast("bigint"), ideal_n),
                    lambda j: F.round(
                        F.lit(1.0) / F.log2(j.cast("double") + F.lit(1.0)),
                        9)),
        F.lit(0.0), lambda acc, x: acc + x)
    # truth-driven output: a query whose index returned NOTHING must
    # still emit a (0, 0, 0) row, not silently vanish
    return (
        n_truth.join(per_q, q, "left")
        .select(
            q, "n_truth",
            F.coalesce("n_hits", F.lit(0).cast("bigint")).alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                    / F.lit(float(int(k))), 9).alias("recall_at_k"),
            F.round(F.when(F.col("__minr").isNotNull(),
                           F.lit(1.0) / F.col("__minr").cast("double"))
                    .otherwise(F.lit(0.0)), 9).alias("mrr"),
            F.round(F.coalesce(F.col("__dcg"), F.lit(0.0)) / idcg, 9)
            .alias("ndcg"))
    )


def retrieval_eval_sql(
    got_sql: str,
    truth_sql: str,
    k: int,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    score_col: str = "cos_sim",
) -> str:
    """DuckDB mirror of :func:`retrieval_eval`: wraps the got/truth
    SELECTs as CTEs and reproduces rank, rounded DCG terms, sorted
    single-float folds, and the single divisions."""
    q, i, s = query_col, id_col, score_col
    return f"""
    WITH got_ AS ({got_sql}),
    truth_ AS (SELECT DISTINCT {q}, {i} FROM ({truth_sql})),
    ranked AS (
        SELECT {q}, {i}, r FROM (
            SELECT {q}, {i},
                   ROW_NUMBER() OVER (PARTITION BY {q}
                                      ORDER BY {s} DESC, {i}) AS r
            FROM got_
        ) WHERE r <= {int(k)}
    ),
    nt AS (SELECT {q}, CAST(COUNT(*) AS BIGINT) AS n_truth
           FROM truth_ GROUP BY 1),
    marked AS (
        SELECT g.{q}, g.r,
               EXISTS (SELECT 1 FROM truth_ t
                       WHERE t.{q} = g.{q} AND t.{i} = g.{i}) AS rel
        FROM ranked g
    ),
    per_q AS (
        SELECT {q},
               CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hits,
               MIN(CASE WHEN rel THEN r END) AS minr,
               list_reduce(
                   list_prepend(0.0,
                       list_sort(list(CASE WHEN rel THEN {{'r': r,
                           't': round(1.0 / log2(CAST(r AS DOUBLE) + 1.0),
                                      9)}} END) FILTER (WHERE rel))
                           .apply(x -> x.t)),
                   (acc, x) -> acc + x) AS dcg
        FROM marked GROUP BY 1
    )
    SELECT nt.{q}, nt.n_truth,
           CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(COALESCE(p.n_hits, 0) AS DOUBLE)
                 / {float(int(k))!r}, 9) AS recall_at_k,
           round(CASE WHEN p.minr IS NOT NULL
                      THEN 1.0 / CAST(p.minr AS DOUBLE) ELSE 0.0 END, 9)
               AS mrr,
           round(COALESCE(p.dcg, 0.0) / list_reduce(
                     list_prepend(0.0,
                         list_transform(range(1, CAST(least({int(k)},
                                            nt.n_truth) AS INT) + 1),
                             j -> round(1.0 / log2(CAST(j AS DOUBLE)
                                                   + 1.0), 9))),
                     (acc, x) -> acc + x), 9) AS ndcg
    FROM nt LEFT JOIN per_q p USING ({q})
    """


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion
# ---------------------------------------------------------------------------

def rrf_fuse(
    rankings: "list[DataFrame]",
    k0: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher, SIGIR 2009
    — public literature): merge N per-query candidate rankings into one
    by ``rrf = Σ_i 1/(k0 + rank_i)`` — the standard hybrid-search
    combiner (lexical BM25 ⊕ dense ANN) that needs no score
    calibration because only RANKS cross ranker boundaries.

    Each input carries ``(query_col, id_col, score_col)`` and is
    expected to be a BOUNDED top-k candidate list per query (build it
    with ``relational.topk`` / :func:`brute_force_topk` — both compile
    to per-partition heaps); the rank window below partitions by query
    over those bounded lists, so no global sort exists at any scale.

    Determinism: ranks use the family's (score DESC, id) tie-break;
    each contribution ``1.0/(k0 + rank)`` is one exactly-rounded IEEE
    division, and contributions add LEFT-TO-RIGHT in the callers' list
    order (a fixed-parenthesization chain, never a float SUM across an
    unordered relation), so the fused score is bitwise-reproducible —
    SQL mirror :func:`rrf_fuse_sql`.

    An item absent from ranking ``i`` contributes 0.0 and keeps a NULL
    ``rank_i`` (callers wanting a non-null sentinel coalesce it).

    Output: ``(query_col, id_col, rrf, rank_0 … rank_{N-1})``.
    """
    from pyspark.sql.window import Window as _W

    assert rankings, "rrf_fuse needs at least one ranking"
    fused = None
    for i, r in enumerate(rankings):
        rnk = F.row_number().over(
            _W.partitionBy(query_col)
            .orderBy(F.col(score_col).desc(), F.col(id_col)))
        ranked = (r.select(query_col, id_col, score_col)
                  .withColumn(f"rank_{i}", rnk.cast("bigint"))
                  .drop(score_col))
        fused = ranked if fused is None else fused.join(
            ranked, [query_col, id_col], "full_outer")
    total = None
    for i in range(len(rankings)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0))
                          + F.col(f"rank_{i}").cast("double")),
            F.lit(0.0))
        total = c if total is None else total + c
    return fused.select(
        query_col, id_col, total.alias("rrf"),
        *[f"rank_{i}" for i in range(len(rankings))])


def rrf_fuse_sql(
    ranking_sqls: "list[str]",
    k0: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> str:
    """DuckDB mirror of :func:`rrf_fuse` — identical ranks (same
    tie-break), identical left-to-right contribution chain."""
    q, i_, s = query_col, id_col, score_col
    ctes, joins = [], None
    for i, sql in enumerate(ranking_sqls):
        ctes.append(f"src_{i} AS ({sql})")
        ctes.append(
            f"rk_{i} AS (SELECT {q}, {i_}, CAST(ROW_NUMBER() OVER ("
            f"PARTITION BY {q} ORDER BY {s} DESC, {i_}) AS BIGINT) "
            f"AS rank_{i} FROM src_{i})")
        joins = (f"rk_{i}" if joins is None
                 else f"({joins} FULL JOIN rk_{i} USING ({q}, {i_}))")
    chain = " + ".join(
        f"COALESCE(1.0 / ({float(k0)!r} + CAST(rank_{i} AS DOUBLE)), 0.0)"
        for i in range(len(ranking_sqls)))
    ranks = ", ".join(f"rank_{i}" for i in range(len(ranking_sqls)))
    return (f"WITH {', '.join(ctes)} "
            f"SELECT {q}, {i_}, {chain} AS rrf, {ranks} FROM {joins}")
