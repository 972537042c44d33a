"""Bounded, deterministic caching for registry queries.

A registry query function returns a DataFrame; the ACTION happens in
the caller (driver harness, bench loop, user), so the function can
never `unpersist()` itself — by the time it could, the consumer hasn't
run yet. A bare `.persist()` inside such a function therefore leaks
one session-lifetime cache entry PER INVOCATION: a bench loop or a
long-lived driver re-invoking queries accumulates storage until the
executors evict under pressure (round-5 ADVICE flagged
`bigram_lm_scores` / `q_quality_chartrigram_df` for exactly this).

:func:`rotating_persist` bounds that: each call site names a SLOT, and
persisting into a slot first releases whatever frame the same slot
persisted on the previous invocation. The session then holds at most
ONE live cache entry per slot — re-running a query replaces its cache
instead of stacking a new one — while the plan-reuse benefit within a
single invocation (the reason these sites persist at all; see the
`doc_shingle_hashes` docstring in operators/dedup.py) is untouched.

Slot names are per call site, never shared across different subtrees:
two distinct sites must not evict each other mid-plan (e.g. a composed
query holding two kernels' caches alive in one action). Unpersisting a
frame a caller somehow still holds is CORRECT under Spark semantics —
the plan recomputes — so a pathological interleaving costs time, never
answers.

Streaming/incremental operators do NOT use this: they own their
consumption and release deterministically (`release_checkpoint`,
returned cache handles — the round-5 discipline).
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCK = threading.Lock()
# session -> {slot: DataFrame}; weak on the session so a stopped,
# dropped SparkSession doesn't pin its frames (or itself) in memory
_SLOTS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def rotating_persist(
    df: DataFrame,
    slot: str,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    eager: bool = False,
) -> DataFrame:
    """Persist ``df``, releasing the frame the same ``slot`` persisted
    on the previous invocation in this SparkSession. Returns the
    persisted ``df``.

    ``eager=True`` populates the cache with a ``count()`` before
    returning. Use it where the persisted frame feeds MULTIPLE
    broadcast subtrees: broadcast builds run concurrently on the
    driver's broadcast threads and race to populate a lazy cache,
    re-executing the fold per build — the r10 contention A/B
    (EAGER_AB_r10.json) measured the single-shot (driver-window) cost
    of lang_shingle_overlap at 12.4 s lazy vs 3.9 s eager under load,
    against a ~0.3 s steady-state premium for the extra pass."""
    spark = df.sparkSession
    with _LOCK:
        slots = _SLOTS.setdefault(spark, {})
        prev = slots.get(slot)
        if prev is not None:
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass  # session torn down / already released
        df = df.persist(storage_level)
        slots[slot] = df
    if eager:
        df.count()
    return df


def live_slots(spark) -> dict[str, DataFrame]:
    """The slots currently holding a cache entry for ``spark`` —
    test/introspection surface for the leak-regression suite."""
    with _LOCK:
        return dict(_SLOTS.get(spark, {}))
