"""``datachain_spark.func`` — the scalar/aggregate function library.

Parity: /root/reference/src/datachain/func/__init__.py. Everything compiles to
native Spark SQL expressions (whole-stage codegen); nothing here is a Python
UDF.
"""

from pyspark.sql import functions as F

from . import aggregate, array, conditional, numeric, path, random, string
from .aggregate import (
    any_value,
    approx_count_distinct,
    approx_percentile,
    count_distinct,
    stddev,
    variance,
    avg,
    collect,
    concat,
    count,
    cume_dist,
    dense_rank,
    first,
    lag,
    lead,
    max,
    min,
    ntile,
    percent_rank,
    rank,
    row_number,
    sorted_concat,
    sum,
    window,
)
from .array import contains, cosine_distance, euclidean_distance, length, sip_hash_64
from .conditional import and_, case, greatest, ifelse, isnone, least, not_, or_
from .numeric import bit_and, bit_hamming_distance, bit_or, bit_xor, int_hash_64
from .path import file_ext, file_stem, name, parent
from .random import hash_rand, rand
from .string import byte_hamming_distance


def literal(value) -> "F.Column":
    """Parity: datachain.func literal re-export
    (/root/reference/src/datachain/func/__init__.py)."""
    return F.lit(value)


__all__ = [
    "aggregate", "array", "conditional", "numeric", "path", "random", "string",
    "count", "sum", "avg", "min", "max", "any_value", "collect", "concat",
    "sorted_concat", "window", "row_number", "rank", "dense_rank", "first",
    "lag", "lead", "ntile", "percent_rank", "cume_dist",
    "cosine_distance", "euclidean_distance",
    "greatest", "least", "case", "ifelse", "isnone", "or_", "and_", "not_",
    "bit_and", "bit_or", "bit_xor", "int_hash_64", "bit_hamming_distance",
    "byte_hamming_distance", "rand", "hash_rand", "literal",
    "approx_count_distinct", "approx_percentile", "count_distinct", "stddev", "variance",
    # reference top-level re-exports (/root/reference/src/datachain/func/__init__.py:18-21)
    "contains", "length", "sip_hash_64", "file_ext", "file_stem", "name", "parent",
]
