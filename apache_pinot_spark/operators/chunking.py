"""Document chunking and deterministic corpus splits — the two
row-shaping passes between curation and training.

Chunking: models consume fixed token windows, corpora come as whole
documents. `chunk_documents` explodes each document into overlapping
token-window chunks (window/stride in tokens, final short chunk kept)
entirely with JVM array expressions: tokenize once, generate chunk
start offsets with sequence(), slice+join per chunk — map-side only,
zero shuffle, no Python. Chunk ids are (doc_id, chunk_index) so
provenance survives all downstream shuffles.

Splits: train/validation/test membership must be DETERMINISTIC (stable
across runs and cluster sizes — random() resamples per task retry and
leaks rows across splits) and KEYED (all chunks of a document land in
the same split, or eval leaks training text). `split_column` hashes
the key with a salt into [0, 1000) per-mille buckets; `assign_splits`
maps fraction thresholds onto that. Changing the salt re-deals the
corpus; keeping it pins membership forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 128,
    stride_tokens: int | None = None,
    min_tokens: int = 1,
) -> DataFrame:
    """One row per (document, chunk): (id_col, chunk_index, chunk_text,
    n_tokens). ``stride_tokens`` defaults to the window (no overlap);
    stride < window overlaps chunks. Trailing chunks shorter than
    ``min_tokens`` are dropped (a stride-aligned tail shorter than the
    window but >= min_tokens is kept — models pad it)."""
    if window_tokens < 1:
        raise ValueError(f"window_tokens must be >= 1, got {window_tokens}")
    stride = stride_tokens if stride_tokens is not None else window_tokens
    if not 1 <= stride <= window_tokens:
        raise ValueError(
            f"stride_tokens must be in [1, window_tokens], got {stride}"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    n = F.size(toks)
    # chunk starts: 1, 1+stride, … while a chunk of >= min_tokens remains
    starts = F.when(
        n >= min_tokens,
        F.sequence(F.lit(1), F.greatest(n - min_tokens + 1, F.lit(1)), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_index"),
            F.array_join(F.slice(toks, s, window_tokens), " ").alias("chunk_text"),
            F.least(n - s + 1, F.lit(window_tokens)).alias("n_tokens"),
        ),
    )
    return (
        df.select(id_col, F.explode(chunks).alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_index").alias("chunk_index"),
            F.col("__c.chunk_text").alias("chunk_text"),
            F.col("__c.n_tokens").alias("n_tokens"),
        )
    )


def split_column(key: Column | str, salt: str = "v1") -> Column:
    """Deterministic per-mille bucket in [0, 1000) from (key, salt) —
    xxhash64, so the same key always lands in the same bucket on any
    cluster, and a new salt re-deals the corpus."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(k.cast("string"), F.lit(salt)), F.lit(1000))


def assign_splits(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "v1",
    out_col: str = "split",
    portable: bool = False,
) -> DataFrame:
    """Add a split label column keyed on ``key_col``. ``fractions`` maps
    label → fraction (must sum to 1 within per-mille resolution);
    default 98/1/1 train/validation/test. All rows sharing a key get
    the same label — chunk at will afterwards without leakage.

    ``portable=True`` switches the bucket hash from xxhash64 to the
    first 8 hex chars of md5(key || salt) compared lexicographically
    against cumulative thresholds in the 16^8 space (8-hex fixed-width
    strings order like their numeric values) — reproducible in any
    engine with md5 + substring, so a SQL oracle can replay split
    assignment byte-for-byte."""
    fr = fractions or {"train": 0.98, "validation": 0.01, "test": 0.01}
    mills = {k: round(v * 1000) for k, v in fr.items()}
    if sum(mills.values()) != 1000:
        raise ValueError(
            f"split fractions must sum to 1.0 at per-mille resolution, got {fr}"
        )
    expr = None
    if portable:
        prefix = F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
        )
        lo_m = 0
        for label, width in mills.items():
            hi_hex = F.lit(portable_split_threshold(lo_m + width))
            lo_hex = F.lit(portable_split_threshold(lo_m))
            cond = (prefix >= lo_hex) & (prefix < hi_hex)
            expr = F.when(cond, label) if expr is None else expr.when(cond, label)
            lo_m += width
        return df.withColumn(out_col, expr)
    bucket = split_column(key_col, salt)
    lo = 0
    for label, width in mills.items():
        cond = (bucket >= lo) & (bucket < lo + width)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += width
    return df.withColumn(out_col, expr)


def portable_split_threshold(mills: int) -> str:
    """8-hex-char cumulative threshold for the portable split: the
    per-mille boundary mapped into the 16^8 md5-prefix space. Shared with
    SQL oracles so both engines compare against identical literals. The
    1000-mille boundary is the sentinel 'g' — lexicographically above
    every hex string (16^8 itself formats to NINE chars, which would
    compare BELOW 'f…' strings character-wise)."""
    if mills >= 1000:
        return "g"
    return format(round(16**8 * mills / 1000), "08x")


def temperature_mixture_budgets(
    df: DataFrame,
    domain_col: str,
    temperature: float,
    total_budget: int,
    max_domains: int = 100_000,
) -> dict:
    """Per-domain sample budgets for temperature-based mixture sampling
    (the standard public multilingual/multi-source recipe: sampling
    probability ∝ share^(1/T); T=1 keeps natural proportions, T→∞
    approaches uniform, T<1 sharpens toward the head). Budgets are
    integral via largest-remainder allocation, capped at each domain's
    actual count with iterative redistribution of the surplus
    (water-filling), so they sum to ``total_budget`` whenever the corpus
    is big enough.

    Scale shape: one map-side-combined groupBy count; the collect is
    bounded by ``max_domains`` and RAISES past it (domain cardinality
    is small by nature — this is the same bounded-or-raise fence as
    ivf_topk's centroid collect).
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if total_budget < 1:
        raise ValueError(f"total_budget must be >= 1, got {total_budget}")
    rows = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("__n"))
        .limit(max_domains + 1)
        .collect()
    )
    if len(rows) > max_domains:
        raise ValueError(
            f"temperature_mixture_budgets: more than {max_domains} distinct "
            f"{domain_col} values — raise max_domains explicitly if intended"
        )
    if not rows:
        return {}
    counts = {r[domain_col]: r["__n"] for r in rows}
    total = sum(counts.values())
    weights = {d: (c / total) ** (1.0 / temperature) for d, c in counts.items()}
    wsum = sum(weights.values())
    budgets = {d: 0 for d in counts}
    remaining = total_budget
    open_domains = set(counts)
    # water-filling: allocate proportionally among uncapped domains,
    # cap at the domain count, redistribute the surplus until stable
    while remaining > 0 and open_domains:
        wopen = sum(weights[d] for d in open_domains)
        shares = {d: remaining * weights[d] / wopen for d in open_domains}
        alloc = {d: int(shares[d]) for d in open_domains}
        leftover = remaining - sum(alloc.values())
        # largest remainder, ties by domain for determinism
        for d in sorted(
            open_domains, key=lambda d: (-(shares[d] - alloc[d]), str(d))
        )[:leftover]:
            alloc[d] += 1
        progressed = False
        for d in list(open_domains):
            take = min(alloc[d], counts[d] - budgets[d])
            if take > 0:
                budgets[d] += take
                remaining -= take
                progressed = True
            if budgets[d] >= counts[d]:
                open_domains.discard(d)
        if not progressed:
            break  # every open domain allocated 0 — nothing left to place
    return {d: b for d, b in budgets.items() if b > 0}


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    temperature: float,
    total_budget: int,
    key_col: str,
    salt: str = "v1",
    max_domains: int = 100_000,
) -> DataFrame:
    """Deterministic temperature-based mixture sample: compute
    per-domain budgets (temperature_mixture_budgets), then take exactly
    that many rows per domain via the hash-ranked stratified sampler —
    same corpus, salt, and parameters reproduce the same sample on any
    cluster; a new salt re-deals it. Two jobs total: the bounded domain
    count, then the one-shuffle window rank."""
    budgets = temperature_mixture_budgets(
        df, domain_col, temperature, total_budget, max_domains
    )
    if not budgets:
        return df.limit(0)
    return stratified_sample_exact(
        df, [domain_col], {(d,): b for d, b in budgets.items()}, key_col, salt
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    n: int | dict[tuple, int],
    key_col: str,
    salt: str = "v1",
    portable: bool = False,
) -> DataFrame:
    """Exactly ``n`` rows per stratum (all rows when the stratum is
    smaller), chosen deterministically: rows rank by xxhash64(key, salt)
    within their stratum and the lowest-hash n win — the same corpus,
    keys, and salt reproduce the same sample on any cluster, and a new
    salt re-deals it. ``n`` may be a dict mapping stratum value tuples
    to per-stratum budgets (strata absent from the dict are dropped).

    ``portable`` switches the rank hash to md5(CAST(key AS STRING) ||
    salt) — the split_column convention — so a SQL oracle can replay the
    exact member selection (xxhash64 stays the default: JVM-side and
    faster); both forms are deterministic and salt-re-dealable.

    Scale shape: ONE shuffle on the strata key for the window rank; the
    per-stratum sort spills if a stratum is huge, which is the correct
    degradation (the alternative, collect_list-and-slice, holds whole
    strata in aggregate buffers). assign_splits (hash-threshold, zero
    shuffle) is the right tool when approximate per-stratum fractions
    are acceptable."""
    from pyspark.sql import Window

    if not strata_cols:
        raise ValueError("stratified_sample_exact needs at least one stratum column")
    rank_hash = (
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
        if portable
        else F.xxhash64(F.col(key_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        rank_hash,
        F.col(key_col),  # total order even on a hash collision
    )
    ranked = df.withColumn("__rank", F.row_number().over(w))
    if isinstance(n, int):
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        out = ranked.where(F.col("__rank") <= n)
    else:
        if not n:
            raise ValueError("stratified_sample_exact got an empty budget dict")
        budgets = None
        for values, budget in n.items():
            values = values if isinstance(values, tuple) else (values,)
            if len(values) != len(strata_cols):
                raise ValueError(
                    f"stratum key {values!r} does not match strata {strata_cols}"
                )
            if int(budget) < 1:
                raise ValueError(
                    f"budget for stratum {values!r} must be >= 1, got {budget}"
                )
            cond = F.lit(True)
            for c, v in zip(strata_cols, values):
                cond = cond & (F.col(c) == F.lit(v))
            b = F.when(cond, F.lit(int(budget)))
            budgets = b if budgets is None else budgets.when(cond, F.lit(int(budget)))
        out = ranked.withColumn("__budget", budgets).where(
            F.col("__rank") <= F.col("__budget")
        ).drop("__budget")
    return out.drop("__rank")


def cap_source_share(
    df: DataFrame,
    source_col: str,
    max_share: float,
    key_col: str,
    salt: str = "v1",
    max_domains: int = 100_000,
    portable: bool = False,
) -> DataFrame:
    """Domain/source frequency cap (the C4/RedPajama recipe's guard
    against one crawl domain dominating the corpus): drop rows so that
    NO source exceeds ``max_share`` of the FINAL corpus. The final size
    N* solves sum_s min(count_s, floor(max_share*N*)) = N* — the
    GREATEST fixed point, i.e. max{N : f(N) >= N}; the rows kept within
    a capped source are the lowest-hash ones (deterministic,
    salt-re-dealable — the stratified sampler's convention).

    Two equivalent solvers for N* (byte-identical selection, tested
    against each other): up to ``max_domains`` distinct sources, the
    driver fixed-point loop over a collected count table; PAST that, a
    fully distributed closed-form solve (see _cap_fixed_point_segments)
    over the distinct-count-VALUE table — web-scale host cardinality
    (tens of millions of domains) never builds a driver dict. Both end
    in the same one-shuffle window-rank selection with a per-source
    budget of k* = floor(max_share * N*) (min(count_s, k*) and rank <=
    k* select the same rows, so the integer-budget sampler suffices).

    Scale shape: one count shuffle + (fast path) a bounded collect OR
    (distributed path) a distinct-value rollup and a metadata-scale
    single-partition window over DISTINCT COUNT VALUES (not sources:
    counts collide heavily, and even pathological all-distinct-count
    corpora put only one slim row per source count here), then the
    sampler's one window shuffle. Degenerate regime: with S sources of
    equal size, max_share < 1/S admits ONLY the empty corpus (no N > 0
    satisfies the cap) — the fixed point is 0 and this returns no rows,
    by construction rather than by accident."""
    if not 0 < max_share <= 1:
        raise ValueError(f"max_share must be in (0, 1], got {max_share}")
    counts_df = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    rows = counts_df.limit(max_domains + 1).collect()
    if len(rows) <= max_domains:
        # fast path: driver fixed-point iteration (n <- f(n) from the
        # total is monotone non-increasing and lands on the greatest
        # fixed point)
        counts = {r[source_col]: r["__n"] for r in rows}
        if not counts:
            return df.limit(0)
        n = sum(counts.values())
        while True:
            cap = int(max_share * n)
            budgets = {s: min(c, cap) for s, c in counts.items()}
            n2 = sum(budgets.values())
            if n2 == n:
                break
            n = n2
            if n == 0:
                return df.limit(0)
        if all(budgets[s] == counts[s] for s in counts):
            return df  # nobody capped: zero-cost passthrough
        kstar = cap
    else:
        from pyspark import StorageLevel

        counts_df = counts_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            total, cmax = counts_df.agg(F.sum("__n"), F.max("__n")).first()
            if total is None:
                return df.limit(0)
            if int(max_share * total) >= cmax:
                return df  # nobody capped (the loop's first-pass exit)
            kstar = _cap_fixed_point_kstar(counts_df, max_share)
        finally:
            counts_df.unpersist(False)
        if kstar <= 0:
            return df.limit(0)
    return stratified_sample_exact(
        df, [source_col], int(kstar), key_col, salt, portable=portable,
    )


def _cap_fixed_point_kstar(counts_df: DataFrame, share: float) -> int:
    """Distributed solve of the source-cap fixed point: the largest
    per-source budget k* with floor(share * g(k*)) >= k*, where
    g(k) = sum_s min(count_s, k) — equivalently k* = floor(share * N*)
    for the greatest fixed point N* of N = g(floor(share * N)) that the
    driver loop iterates to (proof sketch: k feasible iff
    floor(share*g(k)) >= k; both that test and g are monotone, so the
    max-feasible k and the greatest fixed point coincide, and the final
    selection rank <= k* equals min(count_s, k*) budgets).

    g(k) is piecewise linear in k with breakpoints only at distinct
    count VALUES: roll counts up by value, one cumulative-sum window
    over that (metadata-scale) table, then solve each linear segment in
    closed form — share*(r*k + rest) >= k gives
    k <= share*rest / (1 - share*r) — and verify the float-exact test
    floor(share*(r*k + rest)) >= k on a +-2 neighborhood of the
    closed-form candidate (the float product can round the boundary by
    one either way; within a segment the test is a monotone prefix, so
    the neighborhood sweep finds the segment max exactly). The global
    k* is the max over segments; ONE tiny collect of one aggregate row.

    Uses the same IEEE-754 double ops as the driver loop (Python float
    and JVM double multiply identically), so both solvers pick
    byte-identical survivor sets."""
    from pyspark.sql import Window

    by_val = counts_df.groupBy("__n").agg(F.count("*").alias("__m"))
    w = (
        Window.orderBy(F.col("__n").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # r = sources with count >= v; mass = their total rows. The window
    # is single-partition by construction — it runs over distinct count
    # values, a metadata-scale table.
    total = counts_df.select(F.sum("__n").alias("t"))
    seg = (
        by_val.select(
            F.col("__n").alias("v"),
            F.sum("__m").over(w).alias("r"),
            F.sum(F.col("__n") * F.col("__m")).over(w).alias("mass"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "v", "r",
            (F.col("t") - F.col("mass")).alias("rest"),
            F.coalesce(
                F.lead("v").over(Window.orderBy(F.col("v").desc())),
                F.lit(0),
            ).alias("lo"),
            (F.col("v") - F.lit(1)).alias("hi"),
        )
    )
    share_l = F.lit(float(share))
    sr = share_l * F.col("r").cast("double")
    closed = F.floor(
        share_l * F.col("rest").cast("double") / (F.lit(1.0) - sr)
    )
    cand = F.least(
        F.col("hi"),
        F.when(sr >= 1.0, F.col("hi")).otherwise(closed),
    )

    def _feasible(k):
        g = F.col("r") * k + F.col("rest")
        return (
            (k >= F.col("lo")) & (k <= F.col("hi")) & (k >= 0)
            & (F.floor(share_l * g.cast("double")) >= k)
        )

    best = F.greatest(
        *[F.when(_feasible(cand + d), cand + d) for d in range(4, -5, -1)]
    )
    row = seg.agg(F.max(best).alias("k")).first()
    k0 = int(row["k"]) if row["k"] is not None else 0
    # residual-float guard: the closed form locates the segment boundary
    # to within the sweep except past ~4e16-row corpora with a ~99.99%
    # saturated cap; one extra aggregate job probes k0+1..k0+4 with the
    # GLOBAL float-exact test g(k) = sum_s min(count_s, k) and takes the
    # largest feasible — cheap insurance that costs one pass over the
    # (persisted) count table
    probes = counts_df.agg(*[
        F.floor(
            share_l
            * F.sum(F.least(F.col("__n"), F.lit(k0 + d))).cast("double")
        ).alias(f"h{d}")
        for d in (1, 2, 3, 4)
    ]).first()
    for d in (4, 3, 2, 1):
        h = probes[f"h{d}"]
        if h is not None and h >= k0 + d:
            return k0 + d
    return k0
