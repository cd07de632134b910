"""Deterministic sampling and dataset splitting for training-data pipelines.

The split/sample decision for a row is a pure function of its id and a
salt — NOT ``rand()`` — so results are reproducible across runs, cluster
sizes, retries, and engines.  The hash is ``md5`` (identical output in
Spark and DuckDB, unlike ``xxhash64``), compared as an 8-hex-digit prefix
against literal thresholds: all engines agree on lowercase-hex string
ordering, so every operator here is exactly oracle-checkable.

Scale posture: each operator is a stateless projection/filter — map-side
only, no shuffle, no driver state; splits never need a global sort or
count.  Changing ``salt`` re-draws every assignment (new epoch); keeping
it fixed makes train/val/test membership stable as the corpus grows —
rows keep their split when new data arrives, the property that matters
for contamination control in LLM training sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_SPACE = 16**8


def _hex_threshold(cum: float) -> str:
    """Cumulative fraction → 8-digit lowercase-hex threshold literal."""
    return format(min(int(cum * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _hash8(id_col: str, salt: str) -> Column:
    """First 8 hex digits of md5(id ':' salt) — uniform in [0, 16^8).

    NULL ids hash as the empty string (coalesce), so every operator here
    treats a NULL-id row identically — it neither silently vanishes from
    samples nor falls through a split when-chain into the last label.
    """
    return F.substring(
        F.md5(
            F.concat(
                F.coalesce(F.col(id_col).cast("string"), F.lit("")),
                F.lit(":" + salt),
            )
        ),
        1,
        8,
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by hashed id → adds ``out_col``.

    ``weights`` maps label → relative weight (normalized internally);
    default 90/5/5 train/val/test.  Assignment is per-row independent
    (expected proportions, not exact counts — no global shuffle), stable
    under corpus growth, and identical on any engine with md5.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    if not weights:
        raise ValueError("weights must not be empty")
    total = float(sum(weights.values()))
    h8 = _hash8(id_col, salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h8 < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``fraction`` sample by hashed id (map-side filter).

    Unlike ``DataFrame.sample`` this is replayable and composable:
    the same (id, salt) always lands on the same side, and samples with
    the same salt are NESTED (a 0.05 sample ⊆ a 0.10 sample) — handy for
    scaling-law subset ladders.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df  # exact identity — never drop the h8 == 'ffffffff' row
    return df.filter(_hash8(id_col, salt) < F.lit(_hex_threshold(fraction)))


def temperature_fractions(
    counts: dict[str, int],
    temperature: float = 1.0,
    target_max: float = 1.0,
) -> dict[str, float]:
    """Per-stratum keep-fractions for temperature-based mixture sampling.

    The standard multilingual/multi-domain reweighting (temperature
    sampling à la XLM: sample stratum *i* with probability ∝ pᵢ^(1/T)
    normalized): converting target probabilities into per-row keep
    fractions gives keepᵢ ∝ nᵢ^(1/T − 1), scaled so the most up-weighted
    stratum keeps ``target_max`` of its rows.  T=1 keeps everything
    (natural mixture); T→∞ equalizes expected counts per stratum; in
    between, rare domains are up-weighted smoothly.  Feed the result to
    :func:`stratified_hash_sample` — all driver-side arithmetic on a
    dict of counts, nothing distributed here.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not counts:
        return {}
    expo = 1.0 / temperature - 1.0
    raw = {k: float(n) ** expo for k, n in counts.items() if n > 0}
    if not raw:  # every stratum empty → nothing to keep
        return {}
    peak = max(raw.values())
    return {k: min(1.0, target_max * v / peak) for k, v in raw.items()}


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    domains, keep all rare-language docs).  Strata absent from
    ``fractions`` are dropped — an explicit keep-list, matching
    ``DataFrame.sampleBy`` semantics but replayable.
    """
    h8 = _hash8(id_col, salt)
    thr = None
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1], got {frac}")
        cond = F.col(strata_col) == F.lit(value)
        # 'g' sorts after every hex digit → fraction 1.0 keeps ALL rows
        # (a clamped 'ffffffff' threshold would drop h8 == 'ffffffff')
        lit = F.lit("g" if frac >= 1.0 else _hex_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    if thr is None:
        raise ValueError("fractions must not be empty")
    return df.filter(h8 < thr)  # NULL threshold (unlisted stratum) drops the row


def mixture_resample(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture",
) -> DataFrame:
    """Resample to an explicit target domain mixture (DoReMi-style static
    weights) → the largest exactly-proportioned sub-corpus achievable
    WITHOUT upsampling.

    With observed stratum sizes n_s and target shares t_s, that corpus
    has B = min_s(n_s / t_s) rows; stratum s keeps keep_s = B·t_s / n_s
    (exactly 1 for the binding stratum).  Membership uses the same
    md5-uniform hash as :func:`hash_sample` compared NUMERICALLY
    (hash32 < keep·2³²) because keep here is a computed Column, not a
    Python float.

    Everything is in-plan — one tiny per-stratum count aggregate, a
    broadcast join of thresholds, and a map-side filter — so unlike
    :func:`temperature_fractions` (a driver-side dict convenience) this
    needs no ``collect`` of stratum counts at 100 TB.  Strata absent
    from ``targets`` are dropped (explicit keep-list semantics).
    """
    if not targets:
        raise ValueError("targets must not be empty")
    for k, v in targets.items():
        if v <= 0:
            raise ValueError(f"target share for {k!r} must be > 0, got {v}")
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        list(targets.items()), f"`{strata_col}` string, __t double"
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    joined = counts.join(F.broadcast(tgt), strata_col)
    budget = joined.agg(F.min(F.col("__n") / F.col("__t")).alias("__B"))
    plan = joined.crossJoin(F.broadcast(budget)).select(
        strata_col,
        F.least(
            F.lit(1.0), F.col("__B") * F.col("__t") / F.col("__n")
        ).alias("__keep"),
    )
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.join(F.broadcast(plan), strata_col)
        .filter(h32 < F.col("__keep") * F.lit(4294967296.0))
        .drop("__keep")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing plan: concatenate each shard's token
    stream in doc order and cut every ``max_tokens`` — the standard
    pretraining packing where documents may straddle a cut (no padding
    waste, deterministic layout).

    Emits one row per document: (doc_id, shard, n_tokens, start_offset,
    first_seq, last_seq) — ``first_seq``/``last_seq`` are the global
    sequence ids the document's tokens land in, so a loader can slice
    its shard's stream without re-tokenizing.

    Scale shape: packing is per-SHARD (``doc_id % n_shards``), so the
    running-offset window sorts each shard independently — no global
    sort, no single-partition window.  Sequence ids are globally unique
    via ``shard * ceil(shard_tokens_max)`` striding — here simply
    ``shard`` in the high bits.  All builtin window/arithmetic columns
    (portable: the DuckDB oracle applies identical SQL).
    """
    from .text import token_count

    n_tok = token_count(F.col(text_col))
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")  # post-alias name — id_col was renamed above
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_offsets = df.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        n_tok.alias("n_tokens"),
    ).withColumn("end_offset", F.sum("n_tokens").over(w))
    start = F.col("end_offset") - F.col("n_tokens")
    seq_stride = F.lit(1_000_000_000)  # shard-unique sequence id space
    return with_offsets.select(
        "doc_id",
        "shard",
        "n_tokens",
        start.alias("start_offset"),
        (F.col("shard").cast("long") * seq_stride + F.floor(start / max_tokens)).alias(
            "first_seq"
        ),
        (
            F.col("shard").cast("long") * seq_stride
            + F.floor((F.col("end_offset") - 1) / max_tokens)
        ).alias("last_seq"),
    )


def weighted_sample(
    df: DataFrame,
    rate: float,
    weight_col: str | Column,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sample: keep each row
    with probability ``min(1, rate · weight)``.

    Same md5-uniform machinery as :func:`hash_sample` — membership is a
    pure function of (id, salt), so the sample is stable under corpus
    growth/repartitioning and reproducible in any engine with md5 (the
    DuckDB oracle applies the identical expression).  The standard tool
    for quality-weighted or length-debiased corpus subsampling.  Rows
    with NULL weight drop (no silent keep at an undefined probability).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # per-row hex threshold, compared as strings like the other samplers.
    # p clamps to [0, 1]: a NEGATIVE product would hex to 16 chars and
    # lpad would TRUNCATE it to 'ffffffff' (keep-everything); p >= 1
    # clamps to the max 8-hex value, excluding ~1 id in 4·10⁹.  floor()
    # explicitly: Spark's cast truncates but DuckDB's CAST rounds, so the
    # oracle must floor too (see weighted_sample_docs SQL).
    p = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), F.lit(rate) * w.cast("double"))
    )
    thr_int = F.floor(
        F.least(F.lit(float(_HEX_SPACE - 1)), p * F.lit(float(_HEX_SPACE)))
    ).cast("bigint")
    thr_hex = F.lower(F.lpad(F.hex(thr_int), 8, "0"))
    # explicit NULL-weight guard: least() IGNORES NULLs in both Spark and
    # DuckDB, so rate·NULL would otherwise clamp to probability 1
    return df.filter(w.isNotNull() & (_hash8(id_col, salt) < thr_hex))


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-key cap: keep at most ``n`` rows per key, chosen
    by md5-hash order over the row id.  The standard per-domain /
    per-source cap a web corpus applies so boilerplate-heavy domains
    cannot dominate the training mix.

    Hash order (not insertion or timestamp order) makes the survivor set
    a pure function of the ids present — replayable, engine-portable
    (md5 is identical in DuckDB), and unbiased w.r.t. crawl order.

    Scale shape: one hash-partition window per key, rank ≤ n filter.
    A pathologically hot key serializes into one partition's sort — the
    same boundedness discussion as ``applyInPandas`` groups
    (DESIGN.md): for known-skewed corpora, pre-thin hot keys with
    :func:`hash_sample` at rate ≈ (n · safety) / est_key_count first,
    which is map-side, then apply the exact cap.
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    h = _hash8(id_col, salt)
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def select_under_token_budget(
    df: DataFrame,
    token_budget: int,
    bucket_col: str = "score_bucket",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy corpus selection under a global token budget WITHOUT a
    global sort: admit whole quality-score buckets from best down while
    their running token total fits the budget.

    The naive formulation (rank all docs by score, running-sum tokens,
    cut at the budget) is a single-partition window over the corpus — a
    non-starter at 100 TB.  Two-pass bucket-threshold instead:

    1. per-bucket token sums — one map-side-combined aggregate; the
       result has #buckets rows (integer score buckets, ~1e3);
    2. a desc-order running sum over THAT tiny frame picks the admitted
       buckets (its single-partition window holds #buckets rows, never
       corpus rows), broadcast back as a semi-join.

    Semantics: whole buckets admit — the selection under-shoots the
    budget by at most one bucket's tokens, the price of never ordering
    the corpus globally.  Deterministic given integer buckets (callers
    derive them with integer arithmetic, e.g. ``(n_stop * 1000) div
    n_tokens`` — float scores bucketized with float math can differ in
    the last ulp across engines).
    """
    sums = df.groupBy(bucket_col).agg(F.sum(tokens_col).alias("__btok"))
    w = Window.orderBy(F.col(bucket_col).desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    admitted = (
        sums.withColumn("__cum", F.sum("__btok").over(w))
        .filter(F.col("__cum") <= token_budget)
        .select(bucket_col)
    )
    return df.join(F.broadcast(admitted), bucket_col, "left_semi")


def cluster_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-free train/val/test split: near-duplicate CLUSTERS move as
    one unit, so no eval split ever holds a near-copy of a training doc.

    Composes :func:`~..operators.neardup.dedup_survivors` (connected
    components over a near-dup pair frame — exact Jaccard or the LSH
    candidate path at scale) with :func:`deterministic_split` keyed on
    the CLUSTER representative instead of the row id: every member
    inherits its cluster's hash draw.  Returns (id_col, cluster,
    out_col).

    Scale shape: the pair frame is tiny relative to the corpus (that is
    what dedup is for), components resolve via the bounded driver
    union-find with a distributed fallback, and the split itself is one
    md5 projection — no extra shuffle beyond the component join.
    """
    from .neardup import dedup_survivors

    cc = dedup_survivors(df, pairs, id_col=id_col)
    labeled = deterministic_split(
        cc, id_col="cluster", weights=weights, salt=salt, out_col=out_col
    )
    return labeled.select(id_col, "cluster", out_col)


def epoch_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    epoch: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global shuffle into training shards →
    (id, shard, pos): the order a trainer should stream examples in
    epoch ``epoch``.  Two independent md5 draws: one buckets rows into
    shards, one orders rows WITHIN each shard — so each epoch is a
    fresh pseudo-random permutation, yet any (corpus, epoch) pair is
    byte-identical on re-run and across engines (pure md5 arithmetic,
    no engine RNG).

    Scale shape: no global sort — the only ordering is a row_number
    window partitioned by shard, i.e. ``n_shards``-way parallel with
    ~corpus/n_shards rows per partition.  Size ``n_shards`` so a shard
    fits an executor (10k+ shards for a 100 TB corpus); the trainer
    reads shards in any order, so global shuffle quality comes from the
    shard draw, not shard count.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h_shard = F.conv(_hash8(id_col, f"shard{epoch}"), 16, 10).cast("long") % n_shards
    h_pos = _hash8(id_col, f"pos{epoch}")
    w = Window.partitionBy("shard").orderBy(
        F.col("__h2").asc(), F.col(id_col).asc()
    )
    return (
        df.select(F.col(id_col), h_shard.alias("shard"), h_pos.alias("__h2"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def negative_samples(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    shards: int = 32,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training:
    ``(id, j, neg_id)`` with exactly ``k`` pseudo-random partners per
    row — the hard-to-get-right half of (anchor, positive, negative)
    triple generation.

    Construction: rows order by an md5 draw inside md5-assigned shards,
    and partner ``j`` is the ring neighbor at offset ``j`` in that
    order.  Because the order is pseudorandom, ring neighbors are
    uniform random partners; because it is md5, the pairing is
    reproducible across runs, engines, and repartitioning (same
    guarantees as :func:`deterministic_split`).

    Scale shape: windows partition by shard (no global sort — the ring
    wraps per shard), and the partner resolution is ONE equi-join on
    ``(shard, ring_position)``.  A row gets ``min(k, shard_size - 1)``
    partners — ring offsets are capped at the shard size so a tiny
    shard yields fewer DISTINCT negatives rather than duplicate
    ``(id, neg_id)`` pairs under different ``j`` (and a singleton shard
    yields none).  The shard draw uses 16 bits of the md5 (supports up
    to 65 536 shards; beyond that would leave shards empty).  Negatives
    are uniform, NOT hardness-mined and not near-dup-excluded — compose
    with the near-dup pair frame (anti-join) when "negative" must also
    mean "not a duplicate".
    """
    from pyspark.sql.window import Window as _W

    if shards > 65536:
        raise ValueError(
            f"shards must be <= 65536 (16-bit md5 shard draw), got {shards}"
        )
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    base = (
        df.select(id_col)
        .withColumn("__h", h)
        .withColumn(
            "__shard",
            (F.conv(F.substring("__h", 1, 4), 16, 10).cast("int") % shards),
        )
    )
    base = base.withColumn(
        "__rn",
        F.row_number().over(_W.partitionBy("__shard").orderBy("__h", id_col)),
    ).withColumn(
        "__n", F.count(F.lit(1)).over(_W.partitionBy("__shard"))
    )
    # cap offsets at n-1: beyond that the ring wraps onto already-visited
    # partners (duplicate pairs), and n=1 has no partner at all.  The
    # sequence is guarded because Spark's sequence(1, 0) counts DOWN.
    offsets = F.when(
        F.col("__n") > 1,
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("__n") - 1)),
    ).otherwise(F.array().cast("array<int>"))
    ex = base.select(
        id_col,
        "__shard",
        "__rn",
        "__n",
        F.explode(offsets).alias("j"),
    ).withColumn("__tgt", ((F.col("__rn") - 1 + F.col("j")) % F.col("__n")) + 1)
    partners = base.select(
        F.col("__shard").alias("__s2"),
        F.col("__rn").alias("__r2"),
        F.col(id_col).alias("neg_id"),
    )
    out = ex.join(
        partners,
        (ex["__shard"] == partners["__s2"]) & (ex["__tgt"] == partners["__r2"]),
    )
    return out.filter(F.col(id_col) != F.col("neg_id")).select(
        id_col, F.col("j").cast("int").alias("j"), "neg_id"
    )


def weighted_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wtopk",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: exactly
    ``min(k, n)`` rows, inclusion probability proportional to weight —
    the Efraimidis–Spirakis A-ES scheme (IPL 2006, public algorithm):
    draw uniform u per row, rank by ``u^(1/w)`` descending, keep the
    top k.

    Complements :func:`weighted_sample` (Bernoulli: EXPECTED rate, size
    varies): mixture building needs "give me exactly 100k docs from this
    source, length-weighted", and A-ES is the one-pass, join-free way.
    The uniform draw is md5(id:salt), so membership is reproducible
    across runs/engines/repartitioning like every sampler here.

    Scale shape: map-only key computation + ``TakeOrdered(k)`` (Spark
    computes per-partition top-k then merges — no global sort shuffle);
    k is driver-bounded by contract.  Non-positive or NULL weights are
    excluded (they cannot be sampled under proportional-to-weight
    semantics).

    Returns the selected rows with their ``sample_rank`` (1 = highest
    key).  Rank ties break on ``id_col`` for cross-engine determinism
    (md5 draws make real ties ~2⁻³².)
    """
    u = (
        F.conv(_hash8(id_col, salt), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(1 << 32))  # uniform in (0, 1] — 0 would rank-kill w
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    ranked = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("__key").desc(), F.col(id_col).asc())
    return (
        ranked.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .drop("__key")
    )


def stratified_weighted_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_cols: list[str] | str = "source",
    id_col: str = "doc_id",
    salt: str = "swtopk",
) -> DataFrame:
    """Exactly ``min(k, rows with weight > 0)`` rows PER STRATUM
    (NULL / non-positive weights are ineligible, as in
    :func:`weighted_topk` — A-ES keys are undefined there), inclusion
    probability proportional to weight within the stratum — A-ES
    (Efraimidis–Spirakis, as :func:`weighted_topk`) ranked inside each
    group: the "100k best-weighted docs from EVERY source" primitive of
    mixture building, where the global top-k would let one hot source
    crowd out the rest.

    Complements the family: :func:`stratified_hash_sample` holds a RATE
    per stratum (size varies), :func:`weighted_topk` holds a global
    COUNT (stratum balance varies); this holds a count per stratum.

    Scale shape: map-only key computation + ONE hash-partition shuffle
    on the strata columns with a per-group sort (rank window); no global
    sort, no driver state.  The sort is per-stratum — a pathologically
    hot stratum is the window's skew limit, the same bound every
    per-group rank here has (collapse_top1, winsorize).  Draws are
    md5(id:salt) so membership is stable across runs, engines, and
    repartitionings; rank ties break on ``id_col``.
    """
    strata = [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    u = (
        F.conv(_hash8(id_col, salt), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(1 << 32))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    w = Window.partitionBy(*strata).orderBy(
        F.col("__key").desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__key", key)
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .drop("__key")
    )
