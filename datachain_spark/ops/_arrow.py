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


def make_cosine_udf(bcast_q):
    """Double pandas_udf: cosine similarity of each row's float vector
    against one broadcast query vector (numpy dot over the whole batch).

    The broadcast value is a C-contiguous float64 ndarray ALREADY
    L2-normalized; the row vectors are normalized here. Zero-norm rows
    score 0.0 (matches the SQL-expression twin in ``ops/similarity``).
    """

    @pandas_udf("double")
    def _cos(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="float64")
        q = bcast_q.value
        mat = np.stack(vec.to_numpy()).astype(np.float64)  # (batch, d)
        norms = np.linalg.norm(mat, axis=1)
        dots = mat @ q
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(norms > 0.0, dots / norms, 0.0)
        return pd.Series(out)

    return _cos
