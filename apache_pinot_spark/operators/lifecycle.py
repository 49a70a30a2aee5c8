"""Deterministic cache lifecycle for multi-pass operators.

Operators like MinHash+LSH dedup and LSH ANN persist an intermediate frame
(signatures, shingle sets) because the downstream self-join reads it from
both sides and exchange reuse does not fire across aliases. Left alone,
those persisted frames outlive the query: the caller holds only the final
DataFrame, the intermediates are released whenever the ContextCleaner
notices the Python objects died — in a long-lived session that means
MEMORY_AND_DISK blocks pile up and every later query pays the GC/eviction
pressure (measured 3 s ↔ 22 s run-to-run swings on identical queries).

`materialize_release` closes the lifecycle inside the operator:

  1. eagerly `localCheckpoint` the FINAL result — runs the job once, stores
     only the (small) result partitions on the executors, and truncates the
     lineage so nothing downstream can ever re-trigger the intermediates;
  2. `unpersist` every heavy intermediate immediately.

The residual footprint is the checkpointed result itself (candidate/verified
pairs — orders of magnitude smaller than the corpus-derived intermediates),
which the ContextCleaner reclaims when the returned frame is dropped. At
100 TB the result partitions spill to local disk like any other
MEMORY_AND_DISK block; the alternative (recomputing the full
tokenize→hash→join pipeline per downstream action) costs far more.

Two deliberate tradeoffs, for callers to know:
  * The operator becomes EAGER — the job runs at call time, so building
    the plan and then sampling/limiting it no longer skips work. The
    operators using this helper produce small result sets by design, so
    the full run is what any downstream action would have paid anyway.
  * localCheckpoint blocks live on the current executors and are NOT
    recomputable: if an executor holding blocks is lost (dynamic
    allocation, preemption), later actions on the returned frame fail
    rather than recompute. On clusters where that risk matters, re-derive
    the frame (operators are deterministic) or persist the RESULT to
    reliable storage; the alternative default — leaking the corpus-sized
    intermediates until GC — costs more in practice (round-3 bench swung
    up to 8x from exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Run `result` now (localCheckpoint, eager), then unpersist every frame
    in `cached`. Returns the checkpointed result: same schema and values,
    lineage truncated to the stored partitions."""
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out
