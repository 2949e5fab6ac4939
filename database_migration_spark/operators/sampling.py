"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is downsampled constantly — per-source quotas, per-language
balancing, debug slices — and the sample must be REPRODUCIBLE across runs,
engines, and cluster sizes. ``rand()`` is none of those (per-task seeds
change with partitioning), so both operators order/select on a portable
md5 hash of the row's stable id (functions/hashing.md5_long): any engine
recomputes the identical sample.

- :func:`stratified_sample`: up to n rows per stratum — a per-key window
  ranked by the hash. The window partitions by the stratum key, so work
  distributes across the cluster; no global window, no driver collect.
- :func:`hash_sample`: keep a fixed permille of rows by hash bucket — a
  pure filter (no shuffle at all), the shape that survives any scale.

The reference's only sampling is LIMIT-based probe sampling
(convert_varchar.sql:146-148,396-404 — non-reproducible by design); these
upgrade it to the deterministic form a data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database_migration_spark.functions.hashing import md5_long


def _order_hash(id_col: Column) -> Column:
    """60-bit md5 of the stringified id — the deterministic 'random' key."""
    return md5_long(id_col.cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Up to ``n_per_stratum`` rows per stratum, picked by md5-hash order
    (ties broken by id — total order, so the sample is unique).

    Adds ``sample_rank`` (1-based within the stratum). Equivalent SQL:
    ``QUALIFY row_number() OVER (PARTITION BY strata ORDER BY hash, id)
    <= n``.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        _order_hash(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= n_per_stratum)
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences ("packs"):
    within each partition, docs are laid out in deterministic md5-hash
    order and the resulting token stream is cut every ``budget`` tokens.

    Concat-and-chunk semantics (the standard LLM-pretraining layout): the
    partition's docs form one deterministic token stream; packs are the
    budget-sized chunks of that stream. Each doc reports the pack its
    FIRST token lands in plus the offset inside that pack; long docs
    simply spill into the following pack(s) — no padding, no split
    bookkeeping. Exact rule (replayable in any SQL engine): with
    ``start`` = running token sum EXCLUDING the current doc,
    ``pack_id = start // budget`` and ``offset_tokens = start % budget``.

    Scale shape: one window per partition key (never global — callers
    partition by source/shard; the default partitions by a hash bucket of
    the id so the window is bounded even without a natural key).
    """
    part = partition_cols or []
    h = _order_hash(F.col(id_col))
    if not part:
        df = df.withColumn("_shard", (h % F.lit(256)).cast("int"))
        part = ["_shard"]
    toks = F.col(token_col).cast("long")
    w = Window.partitionBy(*part).orderBy(h, F.col(id_col))
    start = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        df.withColumn("_start", start)
        # exact long division (CLAUDE.md floor-div rule): F.floor(x / n)
        # rounds in double precision above 2^53 — reachable by a 100 TB
        # partition's running token sum
        .withColumn("pack_id", F.expr(f"_start div {int(budget)}").cast("long"))
        .withColumn("offset_tokens", (F.col("_start") % F.lit(budget)).cast("long"))
        .drop("_start")
    )


def hash_sample(df: DataFrame, id_col: str, keep_permille: int) -> DataFrame:
    """Keep rows whose id-hash bucket (mod 1000) falls under
    ``keep_permille`` — a deterministic ~0.1%-granularity Bernoulli sample
    that is a pure pushdown-able filter: no shuffle, no state, identical
    membership on any engine or cluster size."""
    return df.where(_order_hash(F.col(id_col)) % F.lit(1000) < F.lit(keep_permille))


def domain_mix_sample(
    df: DataFrame,
    weights: DataFrame,
    domain_col: str,
    id_col: str,
) -> DataFrame:
    """Reweight a corpus to a target domain mixture (the DoReMi /
    Pile-style mixing step: arXiv:2305.10429 §2 frames training-data
    assembly as per-domain sampling weights).

    ``weights`` is a (domain, target_ppm) relation — parts-per-million keep
    rate per domain, an exact integer so the mixture spec survives any
    engine. Each row keeps iff its id-hash bucket (md5 mod 1e6) falls under
    its domain's rate: deterministic, reproducible across runs/engines/
    cluster sizes, and a pure per-row filter after a broadcast join — no
    shuffle of the corpus at any scale. Domains absent from ``weights`` are
    dropped (inner join), matching "mixture spec is exhaustive" semantics.
    """
    w = weights.select(
        F.col(domain_col), F.col("target_ppm").cast("long").alias("target_ppm")
    )
    return (
        df.join(F.broadcast(w), domain_col)
        .where(_order_hash(F.col(id_col)) % F.lit(1_000_000) < F.col("target_ppm"))
    )


def shard_layout(
    df: DataFrame,
    id_col: str,
    token_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic global shuffle + shard layout for training-data writes.

    Every epoch-0 data layout needs the same three properties: documents
    spread uniformly across N shard files, a reproducible pseudo-random
    order within each shard (no source/time locality — hash order IS the
    shuffle), and per-row token offsets so a reader can seek. All three
    from one id-hash: ``shard = h mod N``; within-shard order ``(h, id)``
    (total — ties impossible beyond identical ids); ``offset_tokens`` =
    running token sum before the row.

    Scale: one hash-partition exchange into N shard groups + a sort within
    each — exactly the shuffle a sharded write costs anyway; pick N so a
    shard fits an output file (100 TB / ~1 GB files → N ~ 10^5, far above
    any executor count, so no parallelism cliff). No global window, no
    driver state; membership and order reproducible on any engine.
    """
    out = (
        df.withColumn("_h", _order_hash(F.col(id_col)))
        .withColumn("shard", (F.col("_h") % F.lit(n_shards)).cast("long"))
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        out.withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .withColumn(
            "offset_tokens",
            F.coalesce(
                F.sum(F.col(token_col)).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("_h")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    val_permille: int = 10,
    test_permille: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — adds a ``split`` column.

    The bucket hash is SALTED (md5 of ``salt || '_' || id``), never the bare
    id hash the sampling operators use: with the same hash, a corpus that
    went through ``hash_sample(keep_permille=k)`` would have every survivor
    land in whichever split owns buckets [0, k) — a 100%-correlated,
    silently skewed holdout. A distinct salt per purpose makes the split
    independent of every other hash decision in the pipeline. Pure filter,
    no shuffle; membership stable across runs, engines, and repartitioning,
    and documents keep their split when the corpus grows (the property
    random splits lack).
    """
    bucket = md5_long(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))) % F.lit(
        1000
    )
    return df.withColumn(
        "split",
        F.when(bucket < F.lit(test_permille), F.lit("test"))
        .when(bucket < F.lit(test_permille + val_permille), F.lit("val"))
        .otherwise(F.lit("train")),
    )


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    labels: DataFrame,
    val_permille: int = 10,
    test_permille: int = 10,
    salt: str = "split",
    cluster_col: str = "cluster_id",
    verify_labels: bool = True,
) -> DataFrame:
    """Leakage-safe holdout: the split hash keys on the near-dup CLUSTER
    label, not the document id, so every member of a duplicate cluster
    lands in the same split and no verified near-dup pair spans the
    train/eval boundary — the contamination mode a plain
    :func:`hash_split` cannot prevent (two near-identical docs hash
    independently, and at a 1% holdout about 2% of dup pairs straddle
    it: memorized training text shows up in eval).

    ``labels`` is the ``(id, cluster_id)`` relation
    ``dedup.connected_components`` publishes (every doc labeled,
    singletons with their own id — exactly ``near_dup_clusters``'s
    assignment). Docs missing from ``labels`` are treated as singletons
    (cluster = own id) so a PARTIAL label relation — e.g. only the
    non-singleton clusters — still splits the whole corpus.

    Honesty note on stability: :func:`hash_split` membership is stable
    under corpus growth per DOCUMENT; here it is stable per CLUSTER
    LABEL. If growth adds a smaller-id member to a cluster (or merges
    two clusters), the label — and with it the cluster's split — can
    move. That is inherent to leakage-safety, not a defect: the pair
    (old doc, new near-dup) must share a split, so one of them cannot
    keep an independent assignment.

    Scale shape: one equi-join on the id (broadcast when the label
    relation is dimension-sized, shuffle otherwise) + the pure salted
    md5 bucket filter — no window, no driver state.
    ``verify_labels`` (default on) spends one pass over the LABELS
    relation to dedup exact duplicate rows and RAISE on a conflict
    (one id, two different clusters): a duplicated label id would
    otherwise fan input rows out through the left join — silent row
    multiplication in an operator whose guarantee is exact membership
    (ADVICE r10). Opt out only when the labels provably carry one row
    per id (the ``dedup cluster`` CLI output does).
    """
    # the output columns are contractual: silently overwriting a
    # pre-existing cluster_id/split on df would mix two label/split
    # generations without a trace (ADVICE r10)
    for out_col in ("cluster_id", "split"):
        if out_col in df.columns:
            raise ValueError(
                f"cluster_safe_split writes a '{out_col}' column but df "
                "already has one — drop or rename it first (a silent "
                "overwrite would mix label/split generations)"
            )
    if cluster_col not in labels.columns:
        raise ValueError(
            f"cluster_safe_split: labels table has no '{cluster_col}' "
            f"column (columns: {labels.columns})"
        )
    if id_col in labels.columns:
        lid = id_col
    else:
        # never guess positionally: a (cluster_id, id)-ordered table would
        # join on the cluster VALUE — duplicate rows and silent loss of
        # the leakage guarantee (review finding). Unambiguous = exactly
        # one non-cluster column.
        others = [c for c in labels.columns if c != cluster_col]
        if len(others) != 1:
            raise ValueError(
                f"cluster_safe_split: cannot identify the id column in "
                f"the labels table (columns: {labels.columns}) — name it "
                f"'{id_col}' or pass a two-column (id, {cluster_col}) "
                "relation"
            )
        lid = others[0]
    lab = labels.select(
        F.col(lid).alias(id_col), F.col(cluster_col).alias("_csplit_cluster")
    )
    if verify_labels:
        # exact duplicate rows are benign (unioned label relations) —
        # dedup them; the same id under TWO clusters is a contradiction
        # and must RAISE, not fan out (eager by necessity: a lazy plan
        # cannot refuse)
        lab = lab.distinct()
        conflicted = (
            lab.groupBy(id_col)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if conflicted:
            raise ValueError(
                f"cluster_safe_split: label id {conflicted[0][id_col]!r} "
                "maps to more than one cluster — a conflicted labels "
                "relation cannot give exact split membership; rebuild "
                "the labels (dedup cluster) or pass verify_labels=False "
                "only with a provably one-row-per-id relation"
            )
    key = F.coalesce(F.col("_csplit_cluster"), F.col(id_col))
    bucket = md5_long(
        F.concat(F.lit(salt + "_"), key.cast("string"))
    ) % F.lit(1000)
    return (
        df.join(lab, id_col, "left")
        .withColumn(
            "split",
            F.when(bucket < F.lit(test_permille), F.lit("test"))
            .when(
                bucket < F.lit(test_permille + val_permille), F.lit("val")
            )
            .otherwise(F.lit("train")),
        )
        .withColumn("cluster_id", key)
        .drop("_csplit_cluster")
    )


def budget_sample(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Token-budget corpus selection: within each partition group, keep
    documents in deterministic md5-hash order until the group's token
    budget is filled — "give me ~N tokens per source", the mixture-
    construction step downstream of rate-based :func:`domain_mix_sample`
    (a RATE keeps a fraction; a BUDGET caps an amount regardless of how
    large the group is).

    Keep rule (replayable in any SQL engine): with ``tokens_before`` =
    running token sum over the hash order EXCLUDING the current doc, keep
    rows with ``tokens_before < budget``. The crossing document is
    INCLUDED, so each group overshoots by at most one document — the
    deterministic analogue of reservoir-filling; a strict variant would
    make the sample depend on the crossing doc's size, which reorders
    under corpus growth. Adds ``tokens_before``; one per-group window is
    the only shuffle, same scale shape as :func:`sequence_pack`.
    """
    part = partition_cols or []
    h = _order_hash(F.col(id_col))
    w = Window.partitionBy(*part).orderBy(h, F.col(id_col))
    before = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        df.withColumn("tokens_before", before.cast("long"))
        .where(F.col("tokens_before") < budget)
    )


def _nonneg_weight(weight_col: str, op_name: str):
    """The weighted samplers' documented 'weights must be non-negative'
    contract, ENFORCED (round-9 review: it was documentation-only — a
    negative weight makes the running sums non-monotone and the draw
    silently wrong). raise_error fires per offending ROW inside the scan:
    no extra validation pass over a 100 TB corpus."""
    wv = F.col(weight_col).cast("long")
    return F.when(
        wv < 0,
        F.raise_error(
            F.concat(
                F.lit(f"{op_name}: negative {weight_col} "),
                F.col(weight_col).cast("string"),
                F.lit(" — weights must be non-negative"),
            )
        ).cast("long"),
    ).otherwise(wv)


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    partition_cols: list[str] | None = None,
    offset: int = 0,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling, deterministic
    and integer-exact: within each group, lay documents out on a weight
    axis in md5-hash order and select every document whose weight interval
    [C, C+w) contains a grid point ``offset + i·step`` with
    ``step = W div n`` — inclusion probability ≈ n·w/W without any float
    random draw, the weighted complement of :func:`hash_sample` (uniform)
    and :func:`budget_sample` (prefix). The classic use: sample documents
    proportional to token/byte count so the SAMPLE's token mass mirrors
    the corpus (a uniform doc sample over-represents short docs per
    token).

    Selection rule (replayable in any SQL engine — all integer): with
    exclusive running weight sum C and floor-division
    ``fdiv(x, s) = (x - pmod(x, s)) div s`` (the pairing.py negative-safe
    form; C−1−offset is negative for the first document), the interval
    [C, C+w) contains a grid point iff
    ``fdiv(C + w - 1 - offset, step) > fdiv(C - 1 - offset, step)``.
    Zero-weight documents have empty intervals and are never selected;
    weights must be non-negative. Groups with total weight W < n select
    every positive-weight document (step clamps to 1). Actual sample size
    is ceil((W − offset)/step) ≈ n — systematic sampling's usual ±1.

    One per-group window pair is the only shuffle (the sequence_pack
    shape); the grid arithmetic is column-local.
    """
    if n < 1:
        raise ValueError(f"target sample size must be >= 1, got {n}")
    part = partition_cols or []
    h = _order_hash(F.col(id_col))
    order = Window.partitionBy(*part).orderBy(h, F.col(id_col))
    wv = _nonneg_weight(weight_col, "pps_systematic_sample")
    c_before = F.coalesce(
        F.sum(wv).over(order.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum(wv).over(
        Window.partitionBy(*part).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    # all divisions via `div` on materialized columns — `/` divides in
    # DOUBLE and rounds the quotient above 2^53 (the pairing.py rule)
    staged = (
        df.withColumn("cum_before", c_before.cast("long"))
        .withColumn("_w", wv)
        .withColumn("_total", total.cast("long"))
        .withColumn(
            "_step", F.expr(f"greatest(_total div {int(n)}, 1L)")
        )
        .withColumn("_lo", F.col("cum_before") - F.lit(1) - F.lit(offset))
        .withColumn("_hi", F.col("_lo") + F.col("_w"))
    )
    sel = F.expr(
        "((_hi - pmod(_hi, _step)) div _step) > "
        "((_lo - pmod(_lo, _step)) div _step)"
    )
    return staged.where(sel).drop("_w", "_total", "_step", "_lo", "_hi")


def percentile_calibrate(
    df: DataFrame,
    score_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "pct_ppm",
) -> DataFrame:
    """Per-group score calibration: each row gets its percentile rank
    WITHIN its group as exact integer ppm — the step that makes a raw
    quality/classifier score comparable across domains before a single
    keep-threshold is applied (the same raw score means different things
    in code vs prose; "keep the top 40 % of each domain" needs the
    domain-relative rank, not the raw value).

    ``pct_ppm = (row_number − 1) · 1e6 div (n − 1)`` over (score, id)
    ascending — 0 for the group's worst row, 1 000 000 for its best, ties
    broken deterministically by id (cross-engine reproducible; rank-based
    tie pooling would leave the output dependent on how a SQL engine
    buckets ties at the e6 floor). Single-row groups calibrate to
    1 000 000 (the divisor clamps to 1). All integer arithmetic.

    One per-group window pair (rank + count) sharing one shuffle — the
    pps/sequence_pack plan family.
    """
    part = group_cols or []
    order = Window.partitionBy(*part).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    whole = Window.partitionBy(*part).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        df.withColumn("_rn", F.row_number().over(order).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(whole).cast("long"))
    )
    return staged.withColumn(
        out_col,
        F.expr(
            # a single-row group is its own best row: 1e6, so a
            # keep-top-X% gate keeps a domain's only document instead of
            # dropping it as the group's "worst"
            "CASE WHEN _n = 1 THEN 1000000 "
            "ELSE ((_rn - 1) * 1000000) div (_n - 1) END"
        ).cast("long"),
    ).drop("_rn", "_n")


def top_mass_sample(
    df: DataFrame,
    id_col: str,
    score_col: str,
    weight_col: str,
    mass_ppm: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quality-mass selection: within each group, keep the HIGHEST-scoring
    rows until they cover ``mass_ppm`` (parts-per-million) of the group's
    total weight — "the best documents covering 60 % of each source's
    token mass", the curation draw that is score-ORDERED and
    mass-RELATIVE where :func:`budget_sample` is hash-ordered and
    absolute and :func:`percentile_calibrate` gates on rank regardless
    of how much mass the kept rows carry.

    Keep rule (exact, division-free, replayable in any SQL engine): with
    ``cum_before`` = running weight sum over (score DESC, id ASC) order
    EXCLUDING the current row, keep rows with
    ``cum_before · 1e6 < total_weight · mass_ppm`` — both sides in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), so a 100 TB group's
    token-mass product cannot overflow a BIGINT (1e13 tokens × 1e6 ppm
    > 2⁶³). The crossing row is INCLUDED (the budget_sample convention:
    a strict variant would make the draw depend on the crossing row's
    own size). Ties break by id — total order, deterministic across
    engines. A zero-total group keeps nothing (0 < 0 is false);
    zero-weight rows ride along free wherever their score places them
    inside the kept region. Weights must be non-negative.

    Adds ``cum_before``. One per-group window pair sharing one shuffle —
    the pps/sequence_pack plan family.
    """
    if not 0 <= mass_ppm <= 1_000_000:
        raise ValueError(
            f"mass_ppm must be in [0, 1000000], got {mass_ppm}"
        )
    part = group_cols or []
    order = Window.partitionBy(*part).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wv = _nonneg_weight(weight_col, "top_mass_sample")
    before = F.coalesce(
        F.sum(wv).over(order.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum(wv).over(
        Window.partitionBy(*part).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    staged = df.withColumn("cum_before", before.cast("long")).withColumn(
        "_total", total.cast("long")
    )
    keep = (
        F.col("cum_before").cast("decimal(38,0)") * F.lit(1_000_000)
        < F.col("_total").cast("decimal(38,0)") * F.lit(int(mass_ppm))
    )
    return staged.where(keep).drop("_total")
