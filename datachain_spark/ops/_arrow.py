"""Vectorized Arrow-batched scalar kernels (pandas_udf factories).

This module deliberately does NOT use ``from __future__ import annotations``:
pyspark's pandas_udf infers the eval type from the *runtime* type hints, and
PEP-563 stringified hints defeat that inference. Keep every pandas_udf whose
hints matter here; the ops modules (which all use future-annotations) import
the factories.

All kernels follow the same shape as the PQ/SemDeDup encoders
(``ops/pq.py``): numpy math over whole Arrow batches, broadcast variables
for the shared state, zero per-row Python.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_bloom_hit_udf(bcast):
    """Boolean pandas_udf: row passes iff every position in its ``pos``
    array hits a set bit of the broadcast int64 bitmap.

    Positions are computed JVM-side (seeded-hash probes, bit-for-bit
    identical to the literal-bitmap path in ``ops/dedup.bloom_semi_join``);
    the Python side is one gather + shift + AND over the batch:
    ``bf[pos >> 6] >> (pos & 63) & 1``.
    """

    @pandas_udf("boolean")
    def _bloom_hit(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        bf_arr = bcast.value.view(np.uint64)
        mat = np.stack(pos.to_numpy()).astype(np.uint64)  # (batch, k)
        hits = (bf_arr[mat >> np.uint64(6)] >> (mat & np.uint64(63))) & np.uint64(1)
        return pd.Series(hits.all(axis=1))

    return _bloom_hit


def make_query_cosine_dist_udf(query_vec):
    """Double pandas_udf: cosine DISTANCE (1 - similarity) of each row's
    float vector to one fixed query vector, as a whole-batch numpy matmul.

    Parity with the HOF expression twin (``functions.array.cosine_distance``
    under try_divide): NULL / wrong-length vectors and zero-norm operands
    come back NaN here — the caller wraps the column in
    ``F.nanvl(col, NULL)`` so they surface as NULL, exactly like the HOF.
    Used by ``ops.similarity.cosine_topk`` when d >= 32 (the interpreted
    d-element fold is the dominant CPU cost of the retrieval path below
    that switch; numpy is ~30-100x on wide vectors).
    """
    q = np.asarray(list(query_vec), dtype=np.float64)
    nq = float(np.linalg.norm(q))
    d = q.shape[0]

    @pandas_udf("double")
    def _dist(vec: pd.Series) -> pd.Series:
        n = len(vec)
        if n == 0:
            return pd.Series([], dtype="float64")
        arrs = vec.to_numpy()
        out = np.full(n, np.nan)
        valid = np.fromiter(
            (a is not None and len(a) == d for a in arrs), dtype=bool, count=n
        )
        if valid.any() and nq > 0.0:
            mat = np.stack(arrs[valid]).astype(np.float64)  # (m, d)
            norms = np.linalg.norm(mat, axis=1)
            denom = norms * nq
            dots = mat @ q
            with np.errstate(divide="ignore", invalid="ignore"):
                out[valid] = np.where(denom > 0.0, 1.0 - dots / denom, np.nan)
        return pd.Series(out)

    return _dist


def make_pair_cosine_dist_udf():
    """Double pandas_udf: cosine DISTANCE between two row-aligned float
    vector columns (batch k-NN pairs). Same NaN-for-NULL/zero-norm
    contract as :func:`make_query_cosine_dist_udf` — wrap in nanvl.
    Length-mismatched pairs are NaN (the HOF zip_with would silently
    truncate; a ragged pair is a data bug either way and never ranks)."""

    @pandas_udf("double")
    def _dist(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        if n == 0:
            return pd.Series([], dtype="float64")
        aa, bb = a.to_numpy(), b.to_numpy()
        out = np.full(n, np.nan)
        valid = np.fromiter(
            (
                x is not None and y is not None and len(x) == len(y) and len(x) > 0
                for x, y in zip(aa, bb)
            ),
            dtype=bool,
            count=n,
        )
        if valid.any():
            va, vb = aa[valid], bb[valid]
            if len({len(x) for x in va}) > 1:
                # mixed dims within one batch can't stack — per-pair numpy
                # dots (still vectorized per vector; rare in practice)
                res = np.empty(len(va))
                for i, (x, y) in enumerate(zip(va, vb)):
                    xa = np.asarray(x, dtype=np.float64)
                    ya = np.asarray(y, dtype=np.float64)
                    dn = np.linalg.norm(xa) * np.linalg.norm(ya)
                    res[i] = 1.0 - (xa @ ya) / dn if dn > 0.0 else np.nan
                out[valid] = res
            else:
                ma = np.stack(va).astype(np.float64)
                mb = np.stack(vb).astype(np.float64)
                denom = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
                dots = np.einsum("ij,ij->i", ma, mb)
                with np.errstate(divide="ignore", invalid="ignore"):
                    out[valid] = np.where(denom > 0.0, 1.0 - dots / denom, np.nan)
        return pd.Series(out)

    return _dist


def make_hash_embed_assembler(id_name, out_col, dim, normalize):
    """mapInPandas factory: scatter each row's (bucket -> count) map into a
    dense ``dim`` vector and L2-normalize — numpy per batch, replacing the
    interpreted dim-element ``transform``/``try_element_at`` expression
    chain that dominated the hash_embed wall at d >= 32.

    Value-identical to the expression twin: bucket counts are integers, so
    the sum of squares is EXACT in float64 regardless of summation order,
    and the per-element divide matches bit-for-bit. Blank docs give the
    zero vector (None when ``normalize`` — no direction), like the twin.
    Arrow renders MapType cells as dicts or (key, value) tuple lists
    depending on version — both handled.
    """

    def assemble(batches):
        for pdf in batches:
            vecs = []
            for m in pdf["__m"]:
                vec = np.zeros(dim)
                if m is not None and len(m) > 0:
                    items = m.items() if isinstance(m, dict) else m
                    for k, v in items:
                        vec[int(k)] = v
                if normalize:
                    nn = float(np.sqrt((vec * vec).sum()))
                    vecs.append(vec / nn if nn > 0.0 else None)
                else:
                    vecs.append(vec)
            yield pd.DataFrame({id_name: pdf["__id"], out_col: vecs})

    return assemble
