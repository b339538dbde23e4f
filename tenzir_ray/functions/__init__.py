"""Vectorized scalar function library (Tenzir TQL2 functions, SURVEY.md §2.4).

Each function operates on ``pa.Array | pa.ChunkedArray`` and is meant to be
used inside ``map_batches`` expressions — the Ray analog of Tenzir's
``function_plugin`` eval (libtenzir/include/tenzir/tql2/eval.hpp:19-24).
pyarrow.compute kernels where they exist; numpy/hashlib fallbacks where not.
"""

from tenzir_ray.functions import (
    compress, encoding, enumtype, hashing, ip, lists, math, misc, network,
    ocsf, parsing, path, records, strings, time,
)

__all__ = ["strings", "time", "hashing", "encoding", "lists", "math",
           "network", "parsing", "ip", "records", "misc", "ocsf", "compress",
           "path", "enumtype"]
