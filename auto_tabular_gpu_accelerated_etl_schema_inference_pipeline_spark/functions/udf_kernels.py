"""Arrow-vectorized kernels (pandas_udf factories).

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
real type hints to derive the execution mode.

This is the engine's "custom kernel" extension point — the Spark-first
analog of the reference's hand-written Numba CUDA kernel
(/root/reference/etl_benchmark_numba.py:39-50): data arrives as Arrow
column batches (the PCIe-transfer analog), the kernel runs vectorized
NumPy (or torch-CUDA when available), results return as Arrow batches.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def make_searchsorted_udf(interior, use_gpu=False):
    """bin = #(interior boundaries <= v) — binary search, identical
    semantics to the Bucketizer lane (see operators/quantile_bin.py).

    NaN/null: ``to_numpy(dtype=float64)`` coerces null to NaN, and
    searchsorted places NaN after every boundary -> len(interior) — the
    LAST bin. Same pinned semantics as the JVM lane (which pre-maps
    NaN/null to +inf); parity-tested with NaN/null rows."""
    bounds = np.asarray(interior, dtype=np.float64)

    if use_gpu:

        @F.pandas_udf(IntegerType())
        def _bin(s: pd.Series) -> pd.Series:
            import torch

            b = torch.as_tensor(bounds, device="cuda")
            v = torch.as_tensor(s.to_numpy(dtype="float64"), device="cuda")
            idx = torch.bucketize(v, b, right=True)
            return pd.Series(idx.cpu().numpy().astype("int32"))

    else:

        @F.pandas_udf(IntegerType())
        def _bin(s: pd.Series) -> pd.Series:
            idx = np.searchsorted(bounds, s.to_numpy(dtype="float64"), side="right")
            return pd.Series(idx.astype("int32"))

    return _bin
