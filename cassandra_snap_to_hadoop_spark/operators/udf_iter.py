"""Iterator-of-Series pandas UDFs (SURVEY §2-L8).

Deliberately NO ``from __future__ import annotations`` here: pandas_udf
infers SCALAR vs SCALAR_ITER from the *evaluated* type hints, and the
future import stringifies them module-wide, which Spark rejects with
UNSUPPORTED_SIGNATURE.  This module keeps real annotations so the
Iterator signature resolves.
"""

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf


def sigmoid_micro_udf(mu: float = 50.0, scale: float = 10.0):
    """SCALAR_ITER UDF: micro-unit-quantized sigmoid calibration.  The
    parameters bind once per task (before the batch loop) — the
    expensive-init deployment shape for learned encoders."""

    @pandas_udf("long")
    def sigmoid_micro(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        for s in it:
            # Single-rounding order matching the oracle's
            # 1000000.0/(1.0+exp(...)) exactly — computing 1/(1+e) first
            # and multiplying adds a second rounding that can flip the
            # half-up micro digit on boundary values (ADVICE r3).
            z = 1_000_000.0 / (1.0 + np.exp(-(s.to_numpy() - mu) / scale))
            yield pd.Series(np.floor(z + 0.5).astype("int64"))

    return sigmoid_micro
