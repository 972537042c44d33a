"""Equivalence pins for the round-12 rewrites.

The r12 simhash candidate generator changes HOW pairs are found
(size-dispatched band-subset layouts + canonical-bucket emit-once
replacing the final distinct) but must never change WHAT is found:
the exact set of (d1 < d2, hamming <= h) pairs the all-pairs oracle
declares.
"""

from __future__ import annotations

import itertools

import pytest
from hypothesis import given, settings, strategies as st

from msstreamingstack_spark.operators.dedup import (
    SIMHASH_BITS,
    SIMHASH_WIDE_NB,
    SIMHASH_WIDE_T,
    _simhash_band_layout,
    simhash_pairs,
    simhash_table,
)
from msstreamingstack_spark.sources.tables import load_table, spread

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# (10,4) subset pigeonhole — the wide arm's recall guarantee
# ---------------------------------------------------------------------------
def _subset_keys(v: int, nb: int, t: int):
    widths, offs = _simhash_band_layout(nb)

    def band(i):
        return (v >> offs[i]) & ((1 << widths[i]) - 1)

    return {
        (si, tuple(band(i) for i in sub))
        for si, sub in enumerate(itertools.combinations(range(nb), t))
    }


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 48) - 1),
    st.lists(st.integers(min_value=0, max_value=47), min_size=0, max_size=6,
             unique=True),
)
def test_simhash_wide_subsets_catch_every_hamming6_pair(base, flip_bits):
    """Flip ANY <= 6 bits of a 48-bit fingerprint: <= 6 of the 10
    bands are touched, so >= 4 stay intact and at least one 4-subset
    key matches. If SIMHASH_WIDE_NB/T drift past nb - t >= 6 the wide
    arm would silently LOSE PAIRS vs the oracle."""
    assert SIMHASH_WIDE_NB - SIMHASH_WIDE_T >= 6  # the guarantee bound
    other = base
    for b in flip_bits:
        other ^= 1 << b
    assert _subset_keys(base, SIMHASH_WIDE_NB, SIMHASH_WIDE_T) & _subset_keys(
        other, SIMHASH_WIDE_NB, SIMHASH_WIDE_T
    ), (base, flip_bits)


# ---------------------------------------------------------------------------
# All generator arms are bit-identical to the old distinct form
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def sim_docs(spark):
    return spread(load_table(spark, SF, "documents"))


def _old_distinct_form(docs, max_hamming=6):
    """The r4-r11 kernel: (8,2) band-pair explode + popcount verify +
    final distinct — the reference the r12 arms must reproduce."""
    from pyspark.sql import functions as F

    st_ = simhash_table(docs)
    nb, band_bits = 8, 6

    def band(col, i):
        return F.shiftright(col, i * band_bits).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    keys = [
        F.struct(
            F.lit(i * nb + j).alias("bp"),
            (band(F.col("simhash"), i) * (1 << band_bits)
             + band(F.col("simhash"), j)).alias("k"),
        )
        for i in range(nb)
        for j in range(i + 1, nb)
    ]
    buckets = st_.select(
        "doc_id", "simhash", F.explode(F.array(*keys)).alias("b")
    ).select("doc_id", "simhash", F.col("b.bp").alias("bp"),
             F.col("b.k").alias("k"))
    hamming = F.bit_count(
        F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
    ).cast("int")
    return (
        buckets.alias("x")
        .join(buckets.alias("y"), ["bp", "k"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("d1"),
                F.col("y.doc_id").alias("d2"), hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .select("d1", "d2", "hamming")
    )


def _sorted_pdf(df):
    return df.toPandas().sort_values(["d1", "d2"]).reset_index(drop=True)


def test_simhash_arms_match_old_distinct_form(spark, sim_docs):
    """narrow (8,2), wide (10,4) and auto — all with emit-once and NO
    final distinct — must equal the old band-pair + distinct kernel
    row-for-row (schema, values, dtypes)."""
    ref = _sorted_pdf(_old_distinct_form(sim_docs))
    assert len(ref) > 0  # non-vacuous on the fixture corpus
    for arm in (False, True, None):
        got = _sorted_pdf(simhash_pairs(sim_docs, 6, wide_keys=arm))
        assert ref.equals(got), f"arm wide_keys={arm} diverged"


def test_simhash_emit_once_yields_no_duplicates(spark, sim_docs):
    """The canonical-bucket predicate must emit every pair exactly
    once — the dropped distinct relied on it."""
    out = simhash_pairs(sim_docs, 6, wide_keys=True)
    n = out.count()
    nd = out.distinct().count()
    assert n == nd


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 60) - 1),
    st.lists(st.integers(min_value=0, max_value=59), min_size=0, max_size=6,
             unique=True),
)
def test_simhash_wide_twin_subsets_catch_every_hamming6_pair(base, flip_bits):
    """Same pigeonhole for the 60-bit wide twin's (10,4) layout."""
    from msstreamingstack_spark.operators.dedup import SIMHASH_BITS_WIDE

    def keys(v):
        widths, offs = _simhash_band_layout(SIMHASH_WIDE_NB, SIMHASH_BITS_WIDE)
        return {
            (si, tuple((v >> offs[i]) & ((1 << widths[i]) - 1) for i in sub))
            for si, sub in enumerate(
                itertools.combinations(range(SIMHASH_WIDE_NB), SIMHASH_WIDE_T)
            )
        }

    other = base
    for b in flip_bits:
        other ^= 1 << b
    assert keys(base) & keys(other), (base, flip_bits)


def test_simhash_wide_twin_no_cartesian_and_no_duplicates(spark, sim_docs):
    """The twin must keep the banded equi-join shape (never all-pairs)
    and its emit-once must make the output duplicate-free without a
    distinct."""
    from msstreamingstack_spark.operators.dedup import simhash_pairs_wide

    out = simhash_pairs_wide(sim_docs, 6)
    plan = out._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == out.distinct().count()


# ---------------------------------------------------------------------------
# Size-gated candidate-id pre-filter on the minhash verify (guide §3.2)
# ---------------------------------------------------------------------------
def test_minhash_verify_prefilter_is_exact_and_gated(spark, sim_docs, monkeypatch):
    """The broadcast-semi candidate-id pre-filter must (a) never fire
    at bench SFs under the default gate, (b) change nothing but cost
    when forced on, (c) fire automatically once the gate threshold
    drops below the shingle table's size estimate."""
    import msstreamingstack_spark.operators.dedup as dd

    plain = (
        dd.minhash_lsh_pairs(sim_docs, 0.8)
        .toPandas().sort_values(["d1", "d2"]).reset_index(drop=True)
    )
    # (a) default gate stays off on the tiny fixture: no semi join
    plan = (
        dd.minhash_lsh_pairs(sim_docs, 0.8)
        ._jdf.queryExecution().toString()
    )
    assert "LeftSemi" not in plan
    # (b)+(c) gate forced open by threshold: plan gains the semi join,
    # rows are identical
    monkeypatch.setattr(dd, "VERIFY_PREFILTER_MIN_BYTES", 1)
    filtered_df = dd.minhash_lsh_pairs(sim_docs, 0.8)
    assert "LeftSemi" in filtered_df._jdf.queryExecution().toString()
    filtered = (
        filtered_df.toPandas().sort_values(["d1", "d2"]).reset_index(drop=True)
    )
    assert plain.equals(filtered)


def test_simhash_dispatch_gate(spark, sim_docs, monkeypatch):
    """Auto dispatch: the wide (10,4) layout fires iff the docs plan's
    Catalyst size estimate crosses SIMHASH_SELECTIVE_MIN_BYTES. The
    tiny fixture corpus must stay on the narrow arm; band column b_9
    only exists in the 10-band layout."""
    import msstreamingstack_spark.operators.dedup as dd

    plan_auto = simhash_pairs(sim_docs, 6)._jdf.queryExecution().toString()
    assert "b_9" not in plan_auto  # sf0.001 stays narrow
    monkeypatch.setattr(dd, "SIMHASH_SELECTIVE_MIN_BYTES", 1)
    plan_gated = simhash_pairs(sim_docs, 6)._jdf.queryExecution().toString()
    assert "b_9" in plan_gated  # gate flipped the layout, not the rows
