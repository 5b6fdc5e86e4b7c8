"""Arrow-native batch operators (SURVEY §2.9).

``mapInArrow`` is the closest Spark analog to the reference's zero-copy
numpy contract (`medvedi/dataframe.py:373-393` hands raw ndarrays to the
caller): executors ship columnar Arrow batches to Python with no row
materialization and no pandas conversion, numpy views the buffers
zero-copy, and the result batches stream back. Use for vectorized math
that pyspark.sql.functions cannot express; everything expressible stays
JVM-side (tests/test_plans.py enforces that for the query surface).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def map_numpy(df: DataFrame, fn: Callable[[dict], dict], schema: str) -> DataFrame:
    """Run ``fn`` over Arrow record batches as dict-of-numpy-arrays.

    ``fn`` receives {column: ndarray} (zero-copy views of the Arrow
    buffers where dtypes allow) and returns {column: array-like} of equal
    length. Batch boundaries are arbitrary — ``fn`` must be row-local.
    """
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            cols = {name: batch.column(i).to_numpy(zero_copy_only=False) for i, name in enumerate(batch.schema.names)}
            out = fn(cols)
            yield pa.RecordBatch.from_pydict(out)

    return df.mapInArrow(run, schema=schema)


def l2_normalize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Unit-normalize an embedding column with vectorized numpy over
    Arrow batches — the preprocessing step before cosine ANN so the
    dot product alone IS the cosine."""
    import numpy as np

    def norm(cols: dict) -> dict:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in cols[vec_col]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return {id_col: cols[id_col], vec_col: list(mat / norms)}

    return map_numpy(
        df.select(id_col, vec_col), norm, schema=f"{id_col} long, {vec_col} array<double>"
    )
