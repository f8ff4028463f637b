"""Distributed BPE merge learning — tokenizer training as a Spark plan.

Byte-Pair Encoding vocabulary induction (Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 — public
literature): repeatedly count adjacent symbol pairs over the word
vocabulary (weighted by word frequency) and merge the most frequent pair,
producing the ordered merge list a tokenizer replays at encode time.

Reference analog: none (the reference's fold algebra has no iterative
vocabulary induction); this is north-star training-data surface — the
"train the tokenizer on the corpus" step that precedes token counting.

100 TB shape: the CORPUS is scanned exactly once (the word-count
aggregation — map-side-combinable); every merge round then operates on
the distinct-word VOCABULARY (millions of rows at web scale, not
billions), with one map-side-combinable pair count + a ONE-ROW argmax
collect per round (the bounded-scalar idiom) + a scan-shaped symbol-array
rewrite.  Per-round ``localCheckpoint`` cuts keep the plan flat across
iterations, exactly like ``graph.connected_components``.

Determinism: the argmax pair tie-breaks (count DESC, left ASC, right ASC)
and the merge fold is greedy left-to-right — so the merge list is a pure
function of the corpus, identical on any engine, partitioning, or cluster
size, and the whole induction carries an exact unrolled SQL mirror
(:func:`bpe_merges_sql`), the same discipline as ``graph.pagerank_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(col: Column) -> Column:
    """Character array of a string — explicit substring transform (NOT
    ``split(col, '')``, whose empty-pattern behavior differs across
    engines); character-indexed, so unicode-safe in both Spark and
    DuckDB."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.substring(col, i, 1),
    )


def _merge_pair(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right merge of every non-overlapping (left, right)
    adjacency in a symbol array — one Catalyst ``aggregate`` fold with a
    (emitted, pending) state: ``a a a`` under pair (a, a) becomes
    ``[aa, a]``, and a freshly merged symbol never re-pairs within the
    same round (classic BPE single-pass semantics)."""
    merged = F.concat(left, right)
    zero = F.struct(
        F.array().cast("array<string>").alias("o"),
        F.lit(None).cast("string").alias("p"),
    )
    step = lambda acc, x: (  # noqa: E731
        F.when(acc["p"].isNull(),
               F.struct(acc["o"].alias("o"), x.alias("p")))
        .when((acc["p"] == left) & (x == right),
              F.struct(F.concat(acc["o"], F.array(merged)).alias("o"),
                       F.lit(None).cast("string").alias("p")))
        .otherwise(F.struct(F.concat(acc["o"], F.array(acc["p"])).alias("o"),
                            x.alias("p")))
    )
    fin = lambda acc: F.when(  # noqa: E731
        acc["p"].isNull(), acc["o"]
    ).otherwise(F.concat(acc["o"], F.array(acc["p"])))
    return F.aggregate(syms, zero, step, fin)


def _batch_accept(
    cand: list[tuple[str, str, int]],
    m: int,
    exhaustive: bool,
) -> list[tuple[str, str, int]]:
    """Select the longest prefix of ranked pair candidates that a batched
    round may merge while remaining EXACTLY equal to sequential BPE.

    Safety argument (why the result is provably the same merge list):
    merging pair p only changes counts of pairs sharing a symbol with p,
    and every pair it CREATES (``x·ab`` / ``ab·y`` from ``ab``) occurs
    only where an overlapping old pair (``x·a`` / ``b·y``) occurred, so
    its count is ≤ that overlapping pair's pre-merge count.  Hence if the
    accepted pairs are (a) mutually symbol-disjoint and (b) each STRICTLY
    greater in count than every pair that overlaps any accepted pair —
    enforced by stopping at the first overlapping candidate and dropping
    any accepted tail tying its count — then at sequential step i all
    changed/created counts sit strictly below ``n_i``, unchanged pairs
    keep their relative (count DESC, l, r) order, and the sequential
    argmax is exactly the i-th accepted pair.  Interdependent merges
    (later merges consuming earlier ones' output, the typical late-BPE
    regime) simply shrink the batch — correctness never depends on m.

    ``exhaustive``: True when ``cand`` is the ENTIRE pair relation; if
    False, uncollected pairs may tie the last collected count, so
    acceptance additionally requires counts strictly above it.

    One hazard this prefix rule cannot see: a symbol ALREADY in the
    vocabulary that equals an accepted pair's concatenation ("ab"
    pre-existing when ("a","b") merges) — pairs featuring it GAIN count
    from the merge, so the ≤-old-overlap bound breaks.  Candidates
    mentioning the concat are caught here (the concat joins ``used``);
    pre-existing occurrences below the collected window are the
    caller's vocabulary-membership check (see bpe_learn_merges)."""
    floor = -1 if exhaustive else cand[-1][2]
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    stop_n = None
    i = 0
    while i < len(cand):
        l, r, n = cand[i]
        if len(out) == m or n <= floor:
            break
        if l in used or r in used:
            stop_n = n
            break
        out.append((l, r, n))
        used.update((l, r, l + r))
        i += 1
    if stop_n is None and out:
        # Batch full (or floor hit): the certification must still inspect
        # the UNSCANNED candidates that TIE the accepted tail's count — a
        # tying pair overlapping an accepted merge can, after that merge,
        # spawn a created pair that ties out[-1] and wins the sequential
        # (count DESC, l, r) tiebreak (created pairs are new strings,
        # lexicographic order vs the accepted tail is arbitrary).  Ties
        # are a prefix of the remainder (cand is count-sorted), so the
        # scan is bounded by the tie run.  Non-overlapping ties are safe:
        # their counts are unchanged by accepted merges and they sort
        # AFTER the accepted tail by construction.
        for tl, tr, tn in cand[i:]:
            if tn != out[-1][2]:
                break
            if tl in used or tr in used:
                stop_n = tn
                break
    if stop_n is not None:
        while out and out[-1][2] <= stop_n:
            out.pop()
    return out or cand[:1]


def _local_bpe_replay(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
) -> list[tuple[str, str, int]]:
    """Exact sequential BPE induction over a COLLECTED ``(word, freq)``
    vocabulary — merge-for-merge identical to the distributed rounds
    (same greedy non-overlap fold, same (count DESC, l, r) argmax) by
    construction: it IS the sequential algorithm, run where the data is.

    Incremental pair maintenance (the classic trainer structure, e.g.
    Sennrich's learn_bpe / HuggingFace tokenizers — public designs):
    a pair→count table plus a pair→containing-words index; each merge
    re-pairs ONLY the words that contain the merged pair, and the argmax
    rides a lazy-invalidation heap keyed (−count, l, r), so total work is
    Σ touched-word lengths, not rounds × vocabulary."""
    import heapq
    from collections import Counter, defaultdict

    words = [list(w) for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]
    pc: Counter = Counter()
    where: defaultdict = defaultdict(set)
    heap: list[tuple[int, str, str]] = []
    for i, syms in enumerate(words):
        f = freqs[i]
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += f
            where[(a, b)].add(i)
    for (a, b), n in pc.items():
        heap.append((-n, a, b))
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negn, l, r = heapq.heappop(heap)
        cur = pc.get((l, r), 0)
        if cur != -negn:        # stale heap entry (count changed since push)
            continue
        merges.append((l, r, cur))
        touched: Counter = Counter()
        for i in sorted(where[(l, r)]):
            syms, f = words[i], freqs[i]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] -= f
                touched[(a, b)] += 1
                if pc[(a, b)] == 0:
                    del pc[(a, b)]
                where[(a, b)].discard(i)
            out: list[str] = []
            prev = None
            for x in syms:
                if prev is None:
                    prev = x
                elif prev == l and x == r:
                    out.append(l + r)
                    prev = None
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            words[i] = out
            for a, b in zip(out, out[1:]):
                pc[(a, b)] += f
                touched[(a, b)] += 1
                where[(a, b)].add(i)
        for p in touched:
            if p in pc:
                heapq.heappush(heap, (-pc[p], p[0], p[1]))
    return merges


def bpe_learn_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    token_split: str = " ",
    batch: int = 8,
    local_vocab_cap: int = 500_000,
) -> list[tuple[str, str, int]]:
    """Learn the first ``n_merges`` BPE merges from a corpus: returns the
    ordered list ``[(left, right, pair_count), …]`` (rank = position).
    Stops early if no adjacent pair remains (fully merged vocabulary).

    ``token_split``: the LITERAL word delimiter (regex-quoted before it
    reaches ``F.split`` — a bare ``|`` or ``.`` would otherwise be a
    regex; single-space is this engine's canonical tokenization,
    ``text.tokenize``).  The :func:`bpe_merges_sql` mirror covers the
    default space delimiter only.  Words shorter than two characters
    never contribute pairs but stay in the vocabulary.

    LOCAL REPLAY (round 11): the corpus scan is the distributed part of
    BPE training; the per-merge loop runs over the DISTINCT-WORD
    vocabulary, which is orders of magnitude smaller (a 100 TB web
    corpus has a few million distinct whitespace words — the standard
    trainer shape, cf. HuggingFace tokenizers / Sennrich's learn_bpe).
    When the vocabulary fits under ``local_vocab_cap`` rows, ONE
    ``limit(cap+1)`` collect ships ``(word, freq)`` to the driver and
    :func:`_local_bpe_replay` runs the exact sequential induction with
    incremental pair maintenance — identical merges (it IS the
    sequential algorithm), total Spark jobs: 1 regardless of n_merges.
    Set ``local_vocab_cap=0`` to force the distributed path.

    BATCHED ROUNDS (round 10) — the over-cap distributed path: one
    merge per Spark job does not survive real vocab sizes — 32k merges
    would be 32k tiny jobs.  Each round collects the top
    ``max(4·batch, 64)`` pair counts ONCE and accepts up to ``batch``
    merges via :func:`_batch_accept`, whose acceptance rule makes the
    batched list PROVABLY identical to the sequential one (see its
    docstring — ties and created-pair interactions cause the batch to
    stop early, never to diverge).  All accepted merges of a round
    apply as one composed fold chain in a single pass over the
    vocabulary, so job count is ~n_merges/batch on independent merges
    and degrades gracefully to sequential when merges interdepend
    (late-BPE regime).  Property-tested equal to ``batch=1`` AND to the
    local replay on skewed corpora."""
    from map_reduce_folds_spark.operators.dedup import _quote_sep

    if n_merges <= 0:
        raise ValueError(f"bpe_learn_merges: n_merges must be > 0, "
                         f"got {n_merges}")
    if batch <= 0:
        raise ValueError(f"bpe_learn_merges: batch must be > 0, "
                         f"got {batch}")
    wc = (
        df.select(F.explode(F.split(F.col(text_col),
                                    _quote_sep(token_split)))
                  .alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    )
    if local_vocab_cap > 0:
        head = wc.limit(local_vocab_cap + 1).collect()
        if len(head) <= local_vocab_cap:
            return _local_bpe_replay(
                [(r["w"], int(r["freq"])) for r in head], n_merges)
    words = (
        wc.select(_chars(F.col("w")).alias("syms"), "freq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        m = min(batch, n_merges - len(merges))
        topk = max(4 * m, 64)
        pairs = (
            words.where(F.size("syms") >= 2)
            .select(
                F.explode(F.arrays_zip(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("r"),
                )).alias("pr"),
                "freq",
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").alias("n"))
        )
        cand = [(r["l"], r["r"], int(r["n"])) for r in
                pairs.orderBy(F.col("n").desc(), "l", "r")
                .limit(topk).collect()]
        if not cand:
            break
        accepted = _batch_accept(cand, m, exhaustive=len(cand) < topk)
        if len(accepted) > 1:
            # concat-symbol hazard (see _batch_accept): if an accepted
            # pair's concatenation already exists as a vocabulary symbol,
            # its merge can RAISE counts of pairs featuring that symbol,
            # so merges after it are no longer certified — truncate the
            # batch there (the next round recounts and continues
            # exactly).  One narrow membership scan of the checkpointed
            # vocab per multi-merge round.
            concats = [l + r for l, r, _ in accepted]
            present = {
                r["s"] for r in words
                .select(F.explode("syms").alias("s"))
                .where(F.col("s").isin(concats)).distinct().collect()
            }
            if present:
                for i, c in enumerate(concats):
                    if c in present:
                        accepted = accepted[: i + 1]
                        break
        merges.extend(accepted)
        syms = F.col("syms")
        for bl, br, _ in accepted:
            syms = _merge_pair(syms, F.lit(bl), F.lit(br))
        words = words.select(syms.alias("syms"), "freq") \
            .localCheckpoint(eager=False)
    return merges


def bpe_encode_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int,
    merges: list[tuple[str, str, int]] | None = None,
    token_split: str = " ",
    engine: str = "catalyst",
) -> DataFrame:
    """ENCODE the corpus with a trained BPE merge list — the tokenizer
    APPLY step that follows :func:`bpe_learn_merges` (Sennrich et al.
    2016): per document, ``(n_words, n_tokens)`` where n_tokens is the
    subword count after replaying the merges in rank order.

    THE WORD-LEVEL CACHE SHAPE (how real tokenizer pipelines encode at
    scale, cf. Sennrich's apply_bpe word cache): the corpus is scanned
    once for per-(doc, word) counts; the merge replay runs over the
    DISTINCT-WORD vocabulary only (millions of rows at 100 TB, not
    billions of occurrences), and per-doc token counts come from one
    join back — ``n_tokens = Σ count(w in doc) · |encode(w)|``.  A
    per-occurrence encode would redo identical work per duplicate word.

    ``merges=None`` trains the first ``n_merges`` merges from this
    corpus (one extra scan); pass an existing list to encode with a
    vocabulary trained elsewhere.

    ``engine="catalyst"``: each merge is one :func:`_merge_pair` fold —
    ``k`` chained JVM aggregates over the word relation, plan-flattened
    every 8 merges (``localCheckpoint``).  Exact SQL mirror
    (:func:`bpe_encode_sql`), merge-fold semantics identical to the
    trainer.  Right up to ~64 merges; a full 32k-merge vocabulary
    would compile a 32k-deep expression chain, so
    ``engine="arrow"`` runs the same word-level replay as a pandas
    loop per Arrow batch (dict cache per batch) — property-tested
    identical, no SQL mirror needed because outputs match catalyst's."""
    from map_reduce_folds_spark.operators.dedup import _quote_sep

    if engine not in ("catalyst", "arrow"):
        raise ValueError(f"engine must be catalyst|arrow, got {engine!r}")
    if merges is None:
        merges = bpe_learn_merges(df, text_col, n_merges,
                                  token_split=token_split)
    wc = (
        df.select(F.col(id_col),
                  F.explode(F.split(F.col(text_col),
                                    _quote_sep(token_split))).alias("w"))
        .where(F.length("w") > 0)
        .groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("cnt"))
        # SHARED-STAGE BOUNDARY (r14): wc feeds BOTH the distinct-word
        # vocabulary (merge-replay input) and the per-doc join-back, so
        # without a cut the corpus explode + (doc, word) aggregation —
        # the one full-corpus pass of the encode — runs once per
        # consumer lineage.  Lazy localCheckpoint computes it once.
        .localCheckpoint(eager=False)
    )
    vocab = wc.select("w").distinct()
    if engine == "catalyst":
        enc = vocab.select("w", _chars(F.col("w")).alias("syms"))
        for i, (bl, br, _) in enumerate(merges):
            enc = enc.select(
                "w", _merge_pair(F.col("syms"),
                                 F.lit(bl), F.lit(br)).alias("syms"))
            if (i + 1) % 8 == 0:
                enc = enc.localCheckpoint(eager=False)
        enc = enc.select("w", F.size("syms").alias("__ntok"))
    else:
        pairs = [(bl, br, bl + br) for bl, br, _ in merges]

        def gen(batches):
            import pandas as pd

            def encode(word: str) -> int:
                syms = list(word)
                for bl, br, cat in pairs:
                    # EXACT skip (round 13 — makes real 8k+ vocabularies
                    # linear in the word, not the merge list): symbols
                    # are contiguous character spans, so merge (bl, br)
                    # can only apply where bl+br occurs contiguously in
                    # the ORIGINAL word — one C-speed substring test
                    # replaces a full replay pass for the ~99% of a 32k
                    # merge list that cannot touch this word.  A word
                    # fully merged to one symbol is done (no pair left).
                    if len(syms) == 1:
                        break
                    if cat not in word:
                        continue
                    out, pend = [], None
                    for s in syms:
                        if pend is None:
                            pend = s
                        elif pend == bl and s == br:
                            out.append(bl + br)
                            pend = None
                        else:
                            out.append(pend)
                            pend = s
                    if pend is not None:
                        out.append(pend)
                    syms = out
                return len(syms)

            for pdf in batches:
                if pdf.empty:
                    continue
                cache = {w: encode(w) for w in set(pdf["w"])}
                yield pd.DataFrame({
                    "w": pdf["w"],
                    "__ntok": pdf["w"].map(cache).astype("int32"),
                })

        enc = vocab.mapInPandas(gen, schema="w string, __ntok int")
    per_doc = (
        wc.join(enc, "w")
        .groupBy(id_col)
        .agg(F.sum("cnt").cast("bigint").alias("n_words"),
             F.sum(F.col("cnt") * F.col("__ntok")).cast("bigint")
             .alias("n_tokens"))
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
    )


def bpe_encode_sql(n_merges: int, src: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of :func:`bpe_encode_token_counts` (catalyst
    engine, corpus-trained merges): reuses the trainer mirror's CTE
    chain (w0..b{k} — training over the freq-weighted vocabulary), then
    replays the same k merges over a WORD-KEYED chain (e0..e{k}) with
    the identical chr(2)-string fold, and joins token lengths back to
    per-doc word counts."""
    fold = """list_reduce(
        list_prepend({'o': '', 'p': CAST(NULL AS VARCHAR)},
                     list_transform(syms, x -> {'o': '', 'p': x})),
        (acc, e) -> CASE
            WHEN acc.p IS NULL THEN {'o': acc.o, 'p': e.p}
            WHEN acc.p = bl AND e.p = br
            THEN {'o': CASE WHEN acc.o = '' THEN bm
                            ELSE acc.o || chr(2) || bm END,
                  'p': CAST(NULL AS VARCHAR)}
            ELSE {'o': CASE WHEN acc.o = '' THEN acc.p
                            ELSE acc.o || chr(2) || acc.p END,
                  'p': e.p} END)"""

    def enc_merge_cte(e: str, b: str) -> str:
        return f"""(
        SELECT w, string_split(
                   CASE WHEN ww.p IS NULL THEN ww.o
                        WHEN ww.o = '' THEN ww.p
                        ELSE ww.o || chr(2) || ww.p END, chr(2)) AS syms
        FROM (SELECT w, {fold} AS ww
              FROM {e} CROSS JOIN (SELECT l AS bl, r AS br, l || r AS bm
                                   FROM {b})))"""

    # the trainer chain, minus its final SELECT list (its first output
    # row starts "SELECT 1 AS rank"; everything before is the WITH body)
    base = bpe_merges_sql(n_merges, src=src, text_col=text_col)
    with_part = base[: base.index("\nSELECT 1 AS rank")]
    ctes = [with_part[len("WITH "):]]
    ctes.append(f"""e0 AS (
        SELECT w, list_transform(generate_series(1, length(w)),
                                 i -> w[i:i]) AS syms
        FROM (SELECT DISTINCT unnest(string_split({text_col}, ' ')) AS w
              FROM {src})
        WHERE length(w) > 0)""")
    for i in range(1, n_merges + 1):
        ctes.append(f"e{i} AS {enc_merge_cte(f'e{i - 1}', f'b{i}')}")
    ctes.append(f"""wc AS (
        SELECT {id_col}, t.w AS w, COUNT(*) AS cnt
        FROM (SELECT {id_col}, string_split({text_col}, ' ') AS ws
              FROM {src}) d, LATERAL (SELECT unnest(ws) AS w) t
        WHERE length(t.w) > 0
        GROUP BY 1, 2)""")
    ctes.append(f"""per_doc AS (
        SELECT wc.{id_col},
               CAST(SUM(cnt) AS BIGINT) AS n_words,
               CAST(SUM(cnt * len(e{n_merges}.syms)) AS BIGINT)
                   AS n_tokens
        FROM wc JOIN e{n_merges} USING (w)
        GROUP BY 1)""")
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT d.{id_col},
           CAST(COALESCE(per_doc.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(per_doc.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM {src} d LEFT JOIN per_doc USING ({id_col})""")


def bpe_merges_sql(n_merges: int, src: str = "documents",
                   text_col: str = "text") -> str:
    """Unrolled DuckDB mirror of :func:`bpe_learn_merges`: ``n_merges``
    chained CTE rounds, each with the same pair count, the same
    (count DESC, left, right) argmax scalar, and the same greedy
    left-to-right list_reduce merge fold — emitting one row per merge
    ``(rank, left, right, n)``.  The list_reduce state rides the element
    type (each symbol pre-wrapped as ``{'o': [], 'p': sym}``, zero
    prepended), DuckDB's init-less fold convention."""
    def pairs_cte(w: str) -> str:
        return f"""(
        SELECT pr[1] AS l, pr[2] AS r, SUM(freq) AS n
        FROM (SELECT unnest(list_zip(syms[1:len(syms)-1],
                                     syms[2:len(syms)])) AS pr, freq
              FROM {w} WHERE len(syms) >= 2)
        GROUP BY 1, 2)"""

    def best_cte(p: str) -> str:
        return f"""(
        SELECT l, r, n FROM {p} ORDER BY n DESC, l, r LIMIT 1)"""

    def merge_cte(w: str, b: str) -> str:
        # the argmax pair rides a one-row cross join (bl/br/bm columns):
        # DuckDB forbids subqueries INSIDE lambdas, but lambdas may
        # capture the current row's columns.  The accumulator's emitted
        # side is a chr(2)-joined STRING, not a list — DuckDB's
        # list_reduce mangles list-typed fields inside struct
        # accumulators (observed: the carried list collapses each step),
        # while scalar-struct state folds correctly (the funnel-oracle
        # discipline).  chr(2) therefore must not occur inside a symbol —
        # true for any text corpus this mirror oracle-checks.
        fold = """list_reduce(
            list_prepend({'o': '', 'p': CAST(NULL AS VARCHAR)},
                         list_transform(syms, x -> {'o': '', 'p': x})),
            (acc, e) -> CASE
                WHEN acc.p IS NULL THEN {'o': acc.o, 'p': e.p}
                WHEN acc.p = bl AND e.p = br
                THEN {'o': CASE WHEN acc.o = '' THEN bm
                                ELSE acc.o || chr(2) || bm END,
                      'p': CAST(NULL AS VARCHAR)}
                ELSE {'o': CASE WHEN acc.o = '' THEN acc.p
                                ELSE acc.o || chr(2) || acc.p END,
                      'p': e.p} END)"""
        return f"""(
        SELECT string_split(
                   CASE WHEN ww.p IS NULL THEN ww.o
                        WHEN ww.o = '' THEN ww.p
                        ELSE ww.o || chr(2) || ww.p END, chr(2)) AS syms,
               freq
        FROM (SELECT {fold} AS ww, freq
              FROM {w} CROSS JOIN (SELECT l AS bl, r AS br, l || r AS bm
                                   FROM {b})))"""

    ctes = [f"""w0 AS (
        SELECT list_transform(generate_series(1, length(w)),
                              i -> w[i:i]) AS syms,
               COUNT(*) AS freq
        FROM (SELECT unnest(string_split({text_col}, ' ')) AS w FROM {src})
        WHERE length(w) > 0
        GROUP BY w)"""]
    sel = []
    for i in range(1, n_merges + 1):
        ctes.append(f"p{i} AS {pairs_cte(f'w{i - 1}')}")
        ctes.append(f"b{i} AS {best_cte(f'p{i}')}")
        if i < n_merges:
            ctes.append(f"w{i} AS {merge_cte(f'w{i - 1}', f'b{i}')}")
        sel.append(f"SELECT {i} AS rank, l AS lhs, r AS rhs, "
                   f"CAST(n AS BIGINT) AS n FROM b{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)
