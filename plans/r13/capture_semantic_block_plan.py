"""Capture the semantic gate's state-block-join plan (explain
formatted) for plans/r13 evidence. Usage:
    python plans/r13/capture_semantic_block_plan.py <out_file>
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(out_file: str) -> None:
    import tempfile

    import numpy as np

    from streamy_db_spark.operators.incremental import (
        IncrementalSemanticDeduper,
    )
    from streamy_db_spark.session import get_spark

    spark = get_spark("capture_semantic_block_plan")
    rows = [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = np.eye(8)
    with tempfile.TemporaryDirectory() as tmp:
        gate = IncrementalSemanticDeduper(
            spark, f"{tmp}/state", centroids=centroids, threshold=0.9
        )
        gate.process_batch(emb, batch_id=0)
        batch2 = emb.withColumn("vec_id", emb.vec_id + 1_000_000)
        assigned = gate._assigned(batch2).localCheckpoint(eager=True)
        blocked = gate._state_blocked(assigned, n_batch_docs=64)
        plan = blocked._sc._jvm.PythonSQLUtils.explainString(
            blocked._jdf.queryExecution(), "formatted"
        )
        Path(out_file).write_text(
            "semantic gate state-block join physical plan "
            "(_state_blocked over accepted/ state):\n\n" + plan
        )
        print(f"wrote {out_file}")


if __name__ == "__main__":
    main(sys.argv[1])
