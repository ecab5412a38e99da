"""Edit-distance similarity join (fuzzy entity resolution) with
inverted-index blocking.

No reference counterpart (spec addition): the record-linkage pass a
large-scale pipeline runs to reconcile near-identical titles, author
names, URLs-after-normalization, or OCR'd strings — pairs within
Levenshtein distance ``k`` — without the quadratic cross join.

Candidate generation is the classic q-gram count-filter blocking
(Gravano et al. 2001, public): a single edit destroys at most ``q``
overlapping q-grams, so two strings within distance ``k`` must share at
least ``(min_len − q + 1) − k·q`` q-grams — which is ≥ 1 whenever
``min_len ≥ q·(k + 1)``. Long strings therefore meet on at least one
exact q-gram (an inverted-index equi-join, the ngram_jaccard_pairs
shape); strings too short for the guarantee go through a length-band
block instead (≤ 2k+1 duplicated rows per short string — the interval
join binning trick). Every candidate is then verified with the exact
JVM ``levenshtein``; the blocking is COMPLETE (no pair within ``k`` is
missed), which the DuckDB oracle checks against the quadratic truth.

Scale shape: explode distinct q-grams once per side (≤ len−q+1 rows per
string), one equi-join on the gram key, pair-key dedup, codegen'd
verify. No cross join anywhere; the short-string path joins on exact
length-band keys. Skew caveat: a gram shared by f left and g right
strings contributes f·g candidate rows — on corpora with pathological
gram skew raise ``q`` (rarer grams) or pre-normalize; dropping frequent
grams is deliberately NOT offered because it would silently break the
completeness guarantee.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prep(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool, side: str,
    skip_blank: bool,
) -> DataFrame:
    s = F.col(text_col).cast("string")
    if lowercase:
        s = F.lower(s)
    out = df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.coalesce(s, F.lit("")).alias(f"{side}_s"),
    )
    if skip_blank:
        # NULL/empty strings are all within distance k of EACH OTHER (and
        # of every string shorter than k): on a corpus with many blank
        # rows they alone produce a quadratic pair set that downstream
        # connected-components would collapse into one garbage cluster —
        # excluded by default, opt back in with skip_blank=False
        out = out.filter(F.length(f"{side}_s") > 0)
    return out


def _qgrams(col, q: int):
    # distinct q-grams of a string (positions irrelevant for blocking).
    # The explicit when() guard matters: Spark's sequence(1, 0) is the
    # DESCENDING [1, 0], so without it a string shorter than q would emit
    # two truncated phantom grams instead of none
    return F.when(
        F.length(col) < q, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - q + 1),
                lambda i: F.substring(col, i, q),
            )
        )
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_col: str = "text",
    right_col: Optional[str] = None,
    max_distance: int = 2,
    q: int = 2,
    lowercase: bool = True,
    keep_strings: bool = True,
    skip_blank: bool = True,
    ordered_only: bool = False,
    preflight: str = "warn",
    warn_candidates: int = 50_000_000,
    max_postings: Optional[int] = None,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein ≤ max_distance``.

    Output: ``(left_id, right_id, distance)`` (+ the compared strings
    when ``keep_strings``). Exact and COMPLETE over the compared rows —
    blocking only prunes pairs that provably cannot qualify.
    ``skip_blank`` (default) excludes NULL/empty-normalized strings
    entirely: blank rows are all mutual near-duplicates, a quadratic
    trap at corpus scale. ``ordered_only`` keeps only candidates with
    ``left id < right id`` BEFORE the verify — the self-join halving
    (:func:`fuzzy_dedup_pairs` sets it); it assumes both id spaces are
    comparable.

    Skew guardrail (VERDICT r05 #3): a gram shared by f left and g right
    strings contributes f·g candidates, so gram-skewed corpora (100M
    near-identical titles) can go effectively quadratic with no warning.
    ``preflight="warn"`` (default) runs one cheap (gram, f·g) aggregate
    before the join and emits a ``UserWarning`` naming the estimated
    candidate count, the worst gram, and the tuning options whenever the
    estimate exceeds ``warn_candidates``; ``"error"`` raises instead
    (for unattended pipelines); ``"off"`` skips the estimate job.
    ``max_postings`` is the opt-in escape hatch: grams whose posting
    list exceeds it on either side are dropped from BLOCKING — pairs
    that share only dropped grams are missed, a documented recall
    trade-off, which is why it defaults to off (completeness is the
    contract the quadratic-truth oracle proves).
    """
    if max_distance < 0:
        raise ValueError("edit_distance_join: max_distance must be >= 0")
    if q < 1:
        raise ValueError("edit_distance_join: q must be >= 1")
    if preflight not in ("off", "warn", "error"):
        raise ValueError("edit_distance_join: preflight must be off|warn|error")
    k = int(max_distance)
    r_col = right_col or left_col
    L = _prep(left, left_id, left_col, lowercase, "l", skip_blank)
    R = _prep(right, right_id, r_col, lowercase, "r", skip_blank)
    # the q-gram count filter guarantees >= 1 shared gram only from this
    # length up; below it, block on exact length bands instead
    min_long = q * (k + 1)

    # ---- long path: inverted-index join on shared q-grams
    Ll = L.filter(F.length("l_s") >= min_long)
    Rl = R.filter(F.length("r_s") >= min_long)
    lg = Ll.select("l_id", "l_s", F.explode(_qgrams(F.col("l_s"), q)).alias("__g"))
    rg = Rl.select("r_id", "r_s", F.explode(_qgrams(F.col("r_s"), q)).alias("__g"))

    if preflight != "off" or max_postings is not None:
        lcnt = lg.groupBy("__g").agg(F.count(F.lit(1)).alias("__lf"))
        rcnt = rg.groupBy("__g").agg(F.count(F.lit(1)).alias("__rf"))
        gram_costs = lcnt.join(rcnt, "__g")
    if preflight != "off":
        stats = gram_costs.agg(
            F.sum(F.col("__lf") * F.col("__rf")).alias("est"),
            F.max(F.col("__lf") * F.col("__rf")).alias("worst"),
        ).collect()[0]
        est = int(stats["est"] or 0)
        if est > warn_candidates:
            msg = (
                f"edit_distance_join: q-gram blocking would generate "
                f"~{est:,} candidate pairs (worst single gram: "
                f"{int(stats['worst'] or 0):,}); the gram join is "
                f"effectively quadratic on this corpus. Options: raise q "
                f"(currently {q} — rarer grams), pre-normalize the text, "
                f"or opt into max_postings=N to cap posting lists "
                f"(documented recall trade-off). Silence with "
                f"preflight='off' or a higher warn_candidates."
            )
            if preflight == "error":
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, UserWarning, stacklevel=2)
    if max_postings is not None:
        # heavy grams are FEW by definition (each is a distinct gram whose
        # posting list is huge) — broadcast the drop list
        heavy = gram_costs.filter(
            (F.col("__lf") > max_postings) | (F.col("__rf") > max_postings)
        ).select("__g")
        lg = lg.join(F.broadcast(heavy), "__g", "left_anti")
        rg = rg.join(F.broadcast(heavy), "__g", "left_anti")

    long_cand = (
        lg.join(rg, "__g")
        .filter(F.abs(F.length("l_s") - F.length("r_s")) <= k)
        .select("l_id", "l_s", "r_id", "r_s")
    )  # pair-key dedup happens ONCE, after the union (one shuffle, not two)

    # ---- short path: either side shorter than the guarantee meets ALL
    # rows within the k length band (short strings have few distinct
    # lengths; each short left row duplicates into <= 2k+1 band keys)
    Ls = L.filter(F.length("l_s") < min_long)
    Rs = R.filter(F.length("r_s") < min_long + k)  # partners of short lefts
    lb = Ls.select(
        "l_id", "l_s",
        F.explode(
            F.sequence(
                F.greatest(F.length("l_s") - k, F.lit(0)),
                F.length("l_s") + k,
            )
        ).alias("__len"),
    )
    short_cand1 = lb.join(
        Rs.withColumn("__len", F.length("r_s")), "__len"
    ).select("l_id", "l_s", "r_id", "r_s")
    # long lefts vs short rights (the cross-band remainder): right side
    # shorter than min_long, left within k of it — band from the right
    Rss = R.filter(F.length("r_s") < min_long)
    Lsl = L.filter(
        (F.length("l_s") >= min_long) & (F.length("l_s") < min_long + k)
    )
    rb = Rss.select(
        "r_id", "r_s",
        F.explode(
            F.sequence(
                F.greatest(F.length("r_s") - k, F.lit(0)),
                F.length("r_s") + k,
            )
        ).alias("__len"),
    )
    short_cand2 = rb.join(
        Lsl.withColumn("__len", F.length("l_s")), "__len"
    ).select("l_id", "l_s", "r_id", "r_s")

    cand = long_cand.unionByName(short_cand1).unionByName(short_cand2)
    if ordered_only:
        # self-join: drop the mirrored orientation BEFORE the dedup
        # shuffle and the levenshtein verify — halves both
        cand = cand.filter(F.col("l_id") < F.col("r_id"))
    cand = cand.dropDuplicates(["l_id", "r_id"])

    out = cand.withColumn("distance", F.levenshtein("l_s", "r_s")).filter(
        F.col("distance") <= k
    )
    cols = [
        F.col("l_id").alias(left_id if left_id != right_id else f"l_{left_id}"),
        F.col("r_id").alias(right_id if left_id != right_id else f"r_{right_id}"),
        F.col("distance"),
    ]
    if keep_strings:
        cols += [F.col("l_s").alias("left_str"), F.col("r_s").alias("right_str")]
    return out.select(*cols)


def fuzzy_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_distance: int = 2,
    q: int = 2,
    lowercase: bool = True,
    skip_blank: bool = True,
    preflight: str = "warn",
    warn_candidates: int = 50_000_000,
    max_postings: Optional[int] = None,
) -> DataFrame:
    """Self-join convenience: unordered near-identical pairs
    ``(id_a, id_b, distance)`` with ``id_a < id_b`` — feed into
    ``connected_components`` / ``minhash_dedup``-style resolution for
    typo-level deduplication of titles/names/URLs. The mirrored
    orientation is pruned before the dedup shuffle and the verify
    (``ordered_only``), not after. ``preflight``/``warn_candidates``/
    ``max_postings`` pass through to :func:`edit_distance_join` (the
    gram-skew guardrail)."""
    pairs = edit_distance_join(
        df, df, id_col, id_col, left_col=text_col,
        max_distance=max_distance, q=q, lowercase=lowercase,
        keep_strings=False, skip_blank=skip_blank, ordered_only=True,
        preflight=preflight, warn_candidates=warn_candidates,
        max_postings=max_postings,
    )
    a, b = f"l_{id_col}", f"r_{id_col}"
    return pairs.select(
        F.col(a).alias("id_a"), F.col(b).alias("id_b"), "distance"
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_distance: int = 2,
    q: int = 2,
    lowercase: bool = True,
    keep_by: Optional[str] = None,
    canonical_col: str = "canonical_id",
    cc_max_iters: int = 25,
    cc_algorithm: str = "two_hop",
) -> DataFrame:
    """Entity resolution over a name/title column: rows whose strings sit
    within ``max_distance`` edits (transitively) form one entity cluster;
    every row gets a ``canonical_col`` pointing at its cluster
    representative (singletons point at themselves).

    Pipeline: :func:`fuzzy_dedup_pairs` (complete q-gram/length-band
    blocked candidates, exact levenshtein verify) -> connected components
    over the pair graph -> representative pick. ``keep_by=None`` takes the
    minimum id (which IS the component label — zero extra work);
    ``keep_by="score"`` elects the highest-scoring member per cluster
    (ties/NULLs fall back to min id), one narrow (id, score) join + a
    window over the component frame — the corpus itself never reshuffles.

    The canonical map is only trusted after the same edge-consistency
    audit leakage_safe_split runs: partial component labels past the
    round budget fail loudly instead of silently splitting an entity.

    Scale: the pair graph is edges-only (rows with no near-match never
    enter it); the final assignment is ONE left join of the (id,
    canonical) frame against the corpus.
    """
    from .dedup import connected_components

    pairs = fuzzy_dedup_pairs(
        df,
        id_col,
        text_col,
        max_distance=max_distance,
        q=q,
        lowercase=lowercase,
    ).persist()  # consumed by the labeling, the audit, and the final join;
    # released by Spark's LRU like the other sketch persists
    labels = connected_components(
        pairs, max_iters=cc_max_iters, algorithm=cc_algorithm
    )
    la = labels.select(F.col("id").alias("id_a"), F.col("component").alias("__ca"))
    lb = labels.select(F.col("id").alias("id_b"), F.col("component").alias("__cb"))
    n_bad = (
        pairs.join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("__ca") != F.col("__cb"))
        .limit(1)
        .count()
    )
    if n_bad:
        raise RuntimeError(
            "resolve_entities: component labels did not converge within "
            f"cc_max_iters={cc_max_iters} — an entity cluster would be "
            "split. Raise cc_max_iters or use cc_algorithm='star'."
        )
    if keep_by is None:
        canon = labels.select(
            F.col("id").alias("__rid"), F.col("component").alias("__canon")
        )
    else:
        scores = df.select(
            F.col(id_col).alias("__sid"), F.col(keep_by).alias("__score")
        )
        ranked = labels.join(
            scores, labels["id"] == scores["__sid"], "left"
        ).select("id", "component", "__score")
        w = (
            Window.partitionBy("component")
            .orderBy(F.col("__score").desc_nulls_last(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        canon = ranked.select(
            F.col("id").alias("__rid"),
            F.first("id").over(w).alias("__canon"),
        )
    out = df.join(
        canon, df[id_col] == canon["__rid"], "left"
    ).select(
        *[df[c] for c in df.columns],
        F.coalesce(F.col("__canon"), df[id_col]).alias(canonical_col),
    )
    return out
