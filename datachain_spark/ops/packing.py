"""Training-batch assembly operators: sequence packing and dataset mixing.

No reference counterpart (datachain stops at per-row transforms) — these are
the last-mile ops an LLM pretraining pipeline runs after dedup/quality
filtering, designed Spark-first:

- ``pack_sequences``: concat-and-chunk token packing (GPT-style pretraining
  layout). Documents are deterministically sharded, ordered within each
  shard, and assigned byte^Wtoken offsets in the shard's concatenated token
  stream via a window cumulative sum. ``pack_first``/``pack_last`` give the
  fixed-size training examples each document lands in (a document straddling
  a boundary spans ``pack_first..pack_last``; a consumer that forbids
  splitting instead uses ``pack_first`` as a greedy sequential bin id and
  accepts the straddler's overflow).
- ``interleave_datasets``: deterministic weighted mixture of corpora
  (the data-mixing step — e.g. 3 epochs of Wikipedia against 0.3 of
  CommonCrawl). Weights may exceed 1: integer part = full epochs
  (deterministic duplication), fractional part = a seeded-hash subsample.

Scale design (100 TB):
- ``pack_sequences``'s only shuffle is the hash-shard exchange; the window
  sort is per-shard, so ``num_shards`` bounds sort size — pick it so a
  shard's (id, token_count) fits an executor's spill budget (the classic
  sharded-tokenizer layout; at 100 TB with 10k shards a shard is ~10 GB of
  narrow rows). No driver involvement, no Python.
- ``interleave_datasets`` is filters + union ALL: zero shuffles, zero
  Python. The per-row hash is retry-stable, so the mixture is reproducible
  across task retries and cluster sizes — unlike ``DataFrame.sample``,
  whose output is partition-dependent.

Both accept ``hash_fn="md5"`` (the portable 60-bit family DuckDB
reproduces) so sharding, ordering, offsets, and mixture membership are all
hash-verified against an independent engine in CI; production default stays
``xxhash64`` (JVM codegen, no digest allocation).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _seeded_hash64, whitespace_token_count


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: Optional[str] = None,
    text_col: str = "text",
    max_tokens: int = 2048,
    num_shards: int = 8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign every document a position in a sharded concat-and-chunk token
    stream cut into ``max_tokens``-sized training examples.

    Adds columns:

    - ``n_tokens``: the document's token count (``token_col`` if given, else
      a whitespace count over ``text_col``);
    - ``shard``: deterministic hash shard in ``[0, num_shards)``;
    - ``offset_start`` / ``offset_end``: the document's half-open token
      interval in its shard's concatenated stream (shard-local order is by
      seeded hash then id — a deterministic shuffle, so adjacent documents
      are unrelated, which is what pretraining wants);
    - ``pack_first`` / ``pack_last``: the first/last example index
      (``offset // max_tokens``) the document's tokens fall into.

    ``pack_first == pack_last`` means the document sits wholly inside one
    training example; otherwise it straddles (concat-and-chunk cuts it at
    the boundary). Example identity is the (shard, pack) pair.
    """
    if max_tokens <= 0:
        raise ValueError(f"pack_sequences: max_tokens must be > 0, got {max_tokens}")
    if num_shards <= 0:
        raise ValueError(f"pack_sequences: num_shards must be > 0, got {num_shards}")
    tokens = (
        F.col(token_col) if token_col else whitespace_token_count(F.col(text_col))
    ).cast("long")
    h = _seeded_hash64(F.col(id_col).cast("string"), seed, hash_fn)
    out = df.withColumn("n_tokens", tokens).withColumn(
        "shard", F.pmod(h, F.lit(num_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(h.alias("__ord"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("offset_end", F.sum("n_tokens").over(w))
    out = out.withColumn("offset_start", (F.col("offset_end") - F.col("n_tokens")))
    out = out.withColumn(
        "pack_first", F.floor(F.col("offset_start") / max_tokens)
    ).withColumn(
        # empty documents occupy no tokens: they "land" at their start offset
        "pack_last",
        F.when(F.col("n_tokens") > 0, F.floor((F.col("offset_end") - 1) / max_tokens))
        .otherwise(F.floor(F.col("offset_start") / max_tokens)),
    )
    return out


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: Optional[str] = None,
    text_col: str = "text",
    max_tokens: int = 2048,
    num_shards: int = 8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Example-level (no-split) packing: documents are assigned whole to
    training examples, first-fit-decreasing within each hash shard — the
    SFT/fine-tuning complement to :func:`pack_sequences` (which cuts at
    boundaries). Adds ``n_tokens``, ``shard``, ``pack_id`` (shard-local),
    and ``oversize`` (a document longer than ``max_tokens`` gets a pack of
    its own, flagged). Example identity is the (shard, pack_id) pair.

    Scale design: one shuffle (the shard exchange); packing itself is a
    per-shard ``applyInPandas`` over the narrow (row + n_tokens) frame —
    FFD is inherently sequential, so the parallel unit is the shard, the
    same layout every production packer uses. ``num_shards`` bounds both
    the Python working set and the bin-scan cost (O(rows x bins) per
    shard). Deterministic: FFD order is (n_tokens desc, id), independent
    of input partitioning."""
    if max_tokens <= 0:
        raise ValueError(f"pack_greedy: max_tokens must be > 0, got {max_tokens}")
    if num_shards <= 0:
        raise ValueError(f"pack_greedy: num_shards must be > 0, got {num_shards}")
    tokens = (
        F.col(token_col) if token_col else whitespace_token_count(F.col(text_col))
    ).cast("long")
    h = _seeded_hash64(F.col(id_col).cast("string"), seed, hash_fn)
    base = df.withColumn("n_tokens", tokens).withColumn(
        "shard", F.pmod(h, F.lit(num_shards)).cast("int")
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        base.schema.fields
        + [
            T.StructField("pack_id", T.LongType()),
            T.StructField("oversize", T.BooleanType()),
        ]
    )

    def pack_shard(pdf):
        order = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).index
        caps: list = []  # remaining capacity per open pack
        ids = {}
        for i in order:
            t = int(pdf.at[i, "n_tokens"])
            if t >= max_tokens:
                caps.append(0)
                ids[i] = len(caps) - 1
                continue
            for j, cap in enumerate(caps):
                if cap >= t:
                    caps[j] = cap - t
                    ids[i] = j
                    break
            else:
                caps.append(max_tokens - t)
                ids[i] = len(caps) - 1
        out = pdf.copy()
        out["pack_id"] = [ids[i] for i in pdf.index]
        out["oversize"] = out["n_tokens"] > max_tokens
        return out

    return base.groupBy("shard").applyInPandas(pack_shard, schema)


def interleave_datasets(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    seed: int = 42,
    key: Optional[Sequence[str]] = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic weighted mixture of same-schema corpora.

    For each source with weight ``w``: ``floor(w)`` full epochs of the rows
    are emitted (tagged ``epoch`` = 0..), plus a final partial epoch keeping
    each row iff its seeded per-row hash (salted with the epoch) maps below
    the fractional part — so ``w=2.3`` yields every row twice and a
    deterministic 30% subsample a third time. Output rows carry ``source``
    (the dict key) and ``epoch`` columns ahead of the data columns.

    The per-row decision depends only on (row identity, seed, epoch) — not
    on partitioning or row order — so mixtures are reproducible across
    retries and cluster shapes, and two runs over the same inputs are
    row-identical. Pass ``key`` to hash a narrow id set instead of the whole
    row (the wide-row scale path, same convention as the sharding family).
    """
    if not sources:
        raise ValueError("interleave_datasets: sources must be non-empty")
    missing = set(sources) - set(weights)
    if missing:
        raise ValueError(f"interleave_datasets: missing weights for {sorted(missing)}")
    for name, w in weights.items():
        if name in sources and (not math.isfinite(w) or w <= 0):
            raise ValueError(
                f"interleave_datasets: weight for {name!r} must be > 0, got {w}"
            )
    first_cols = None
    parts = []
    for name, src in sources.items():
        if first_cols is None:
            first_cols = src.columns
            clash = {"source", "epoch"} & set(first_cols)
            if clash:
                raise ValueError(
                    "interleave_datasets: data columns "
                    f"{sorted(clash)} collide with the mixture columns — "
                    "rename them first"
                )
        elif set(src.columns) != set(first_cols):
            raise ValueError(
                f"interleave_datasets: schema mismatch for {name!r}: "
                f"{sorted(src.columns)} vs {sorted(first_cols)}"
            )
        w = float(weights[name])
        names = list(key) if key else src.columns
        cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in names]
        row = F.concat_ws("\x1f", *cols)
        epochs = int(math.ceil(w))
        for e in range(epochs):
            frac = min(1.0, w - e)
            piece = src
            if frac < 1.0:
                h = _seeded_hash64(F.concat(row, F.lit(f":e{e}")), seed, hash_fn)
                u = F.pmod(h, F.lit(2**31)) / F.lit(float(2**31))
                piece = src.filter(u < F.lit(frac))
            parts.append(
                piece.select(
                    F.lit(name).alias("source"),
                    F.lit(e).alias("epoch"),
                    *[F.col(c) for c in first_cols],
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def temperature_weights(
    sizes: dict[str, int],
    temperature: float = 1.0,
    total_rows: Optional[int] = None,
) -> dict[str, float]:
    """Per-source epoch weights for temperature-based mixture sampling —
    the multilingual/multi-domain rebalancing recipe (mBERT / XLM-R / mC4,
    public): sample source i with probability q_i ∝ p_i^(1/T) where p_i is
    its natural share of the pooled corpus. T=1 keeps natural proportions;
    T>1 flattens the mix toward uniform (upweights low-resource domains —
    XLM-R's T≈3.3); T→∞ is uniform.

    Returns weights for :func:`interleave_datasets`: source i emits
    ``total_rows * q_i`` expected rows, i.e. weight w_i = total_rows * q_i
    / n_i (epochs of the source, fractional part a deterministic
    subsample). ``total_rows`` defaults to the pooled size, so T=1 returns
    weight 1.0 for every source. Driver-side arithmetic only — callers
    supply sizes (one count per source, or metastore stats)."""
    if not sizes:
        raise ValueError("temperature_weights: sizes must be non-empty")
    if not math.isfinite(temperature) or temperature <= 0:
        raise ValueError(
            f"temperature_weights: temperature must be > 0, got {temperature}"
        )
    for name, n in sizes.items():
        if n <= 0:
            raise ValueError(
                f"temperature_weights: size for {name!r} must be > 0, got {n}"
            )
    total = sum(sizes.values())
    if total_rows is None:
        total_rows = total
    alpha = 1.0 / temperature
    q = {name: (n / total) ** alpha for name, n in sizes.items()}
    z = sum(q.values())
    return {name: total_rows * (qi / z) / sizes[name] for name, qi in q.items()}


def interleave_by_temperature(
    sources: dict[str, DataFrame],
    temperature: float = 1.0,
    total_rows: Optional[int] = None,
    sizes: Optional[dict[str, int]] = None,
    seed: int = 42,
    key: Optional[Sequence[str]] = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """:func:`interleave_datasets` with weights derived from
    :func:`temperature_weights`. ``sizes`` skips the per-source count jobs
    (pass metastore row counts at scale — otherwise this runs one count
    per source up front; the mixture itself stays zero-shuffle)."""
    if sizes is None:
        sizes = {name: src.count() for name, src in sources.items()}
    elif set(sizes) != set(sources):
        # a stale metastore entry would silently hog probability mass
        # (missing keys already raise downstream; extra keys would not)
        raise ValueError(
            "interleave_by_temperature: sizes keys "
            f"{sorted(sizes)} must match sources {sorted(sources)}"
        )
    w = temperature_weights(sizes, temperature, total_rows)
    return interleave_datasets(
        sources, w, seed=seed, key=key, hash_fn=hash_fn
    )


def curriculum_stages(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_stages: int,
    seed: int = 42,
    ascending: bool = True,
    hash_fn: str = "xxhash64",
    stage_col: str = "stage",
    shuffle_col: str = "shuffle_key",
) -> DataFrame:
    """Curriculum data ordering (Bengio et al. 2009, public): split the
    corpus into ``n_stages`` equal-population difficulty stages by exact
    score quantiles and give every row a deterministic within-stage
    shuffle key — training reads ``ORDER BY (stage, shuffle_key)`` so
    examples arrive easy-to-hard (``ascending=True``: stage 1 = lowest
    scores) but randomly WITHIN each stage (per-stage shuffling is what
    keeps SGD from seeing sorted batches).

    NULL scores land in the LAST stage (unknown difficulty trains last).
    Stage thresholds are exact interpolated percentiles from ONE
    aggregation (n_stages-1 values, a 1-row broadcast — the
    perplexity_buckets shape); the shuffle key is a seeded hash of the id
    (``hash_fn="md5"`` selects the portable family so the full ordering
    is DuckDB-verifiable). The corpus itself never shuffles here — the
    writer's ORDER BY is the one range exchange, exactly as any sorted
    export."""
    if n_stages < 2:
        raise ValueError(f"curriculum_stages: n_stages must be >= 2, got {n_stages}")
    c = F.col(score_col).cast("double")
    qs = [i / n_stages for i in range(1, n_stages)]
    thresholds = df.agg(
        *[F.percentile(c, q).alias(f"__t{i}") for i, q in enumerate(qs)]
    )
    staged = df.crossJoin(F.broadcast(thresholds))
    rank_score = c if ascending else -c
    stage = F.lit(1)
    for i in range(len(qs)):
        t = F.col(f"__t{i}") if ascending else -F.col(f"__t{i}")
        stage = stage + F.when(rank_score > t, 1).otherwise(0)
    if not ascending:
        # descending: highest scores first; thresholds flip with the sign,
        # and the comparisons above already account for it
        pass
    stage = F.when(c.isNull(), F.lit(n_stages)).otherwise(stage)
    key = _seeded_hash64(F.col(id_col).cast("string"), seed, hash_fn)
    return (
        staged.withColumn(stage_col, stage.cast("int"))
        .withColumn(shuffle_col, key)
        .drop(*[f"__t{i}" for i in range(len(qs))])
    )


def mix_to_target(
    df: DataFrame,
    group_col: str,
    target_props: dict[str, float],
    id_col: str,
    token_col: Optional[str] = None,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Downsample ONE mixed corpus so its group composition matches a
    target spec, keeping as much data as feasible (water-filling): with
    m_i the group's current mass (tokens if ``token_col`` given, else
    rows) and p_i its target share, the largest achievable output mass is
    T* = min_i m_i / p_i; each group then keeps rate r_i = T*·p_i / m_i
    (the binding group keeps everything). Groups absent from
    ``target_props`` are DROPPED (they have target share zero).

    Membership is a deterministic seeded per-id hash-uniform < r_i —
    retry/partition stable, supersets under a looser spec, and exact in
    expectation (the law-of-large-numbers regime at corpus scale; for
    row-exact per-group counts use sample_per_group). Driver contact is
    ONE collect of the #groups-row mass table; the corpus itself never
    shuffles — the gate is a broadcast-joined filter.

    Complements interleave_datasets (which mixes SEPARATE corpora by
    weight): this rebalances a single corpus already carrying a group
    label — the "make the crawl match the data card" step.
    """
    if not target_props:
        raise ValueError("mix_to_target: target_props must be non-empty")
    if any(p <= 0 for p in target_props.values()):
        raise ValueError("mix_to_target: target proportions must be > 0")
    tot = sum(target_props.values())
    props = {g: p / tot for g, p in target_props.items()}

    mass_expr = (
        F.sum(F.coalesce(F.col(token_col).cast("double"), F.lit(0.0)))
        if token_col
        else F.count(F.lit(1)).cast("double")
    )
    masses = {
        r["g"]: float(r["m"])
        for r in df.groupBy(F.col(group_col).alias("g")).agg(mass_expr.alias("m"))
        .collect()
        if r["g"] in props
    }
    missing = sorted(set(props) - set(masses))
    if missing:
        raise ValueError(
            f"mix_to_target: target groups absent from the data: {missing}"
        )
    # water-filling cap and per-group keep rates — plain double arithmetic,
    # mirrored verbatim by the DuckDB oracle
    t_star = min(masses[g] / props[g] for g in props)
    rates = {g: (t_star * props[g]) / masses[g] for g in props}

    rate_col = F.lit(None).cast("double")
    for g, r in sorted(rates.items()):
        rate_col = F.when(F.col(group_col) == g, F.lit(r)).otherwise(rate_col)
    u = (
        F.pmod(
            _seeded_hash64(F.col(id_col).cast("string"), seed, hash_fn),
            F.lit(2**31),
        ).cast("double")
        / F.lit(float(2**31))
    )
    return df.filter(rate_col.isNotNull() & (u < rate_col))
