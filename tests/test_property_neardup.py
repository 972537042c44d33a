"""Pure-python property tests for the streaming near-dup twin
(streaming/neardup.py::neardup_twin — the sequential reference the
drained stream is pinned exactly equal to). No Spark session: these
run the state-machine semantics thousands of arrival orders deep,
which the streaming harness is too slow to do.

Guarantees under test:
- SOUNDNESS: a flagged doc always has an EARLIER doc with >= 13/16
  matching signature components (every flag is justified; the partner
  is a bucket occupant, occupants are always earlier arrivals).
- FIRST-OCCUPANT RECALL: when a doc arrives FIRST, it claims all its
  buckets, so any later doc matching it on >= 13 components is
  flagged (>= 13 matches => <= 3 mismatching components => <= 3
  mismatching bands => >= 5 of 8 exactly-equal band keys, all
  occupied by the first doc — pigeonhole, deterministic).
- The round-4 adversarial gap is REAL under k_occupants=1 and CLOSED
  by the round-5 K-occupant default for the exact construction that
  demonstrated it (pre-claim every bucket with low-match occupants,
  then send the target and a verbatim copy).
- K-MONOTONICITY: occupant lists are the first-K prefix of a claim
  order that does not depend on K, so raising K can only ADD flags —
  recall is a dial that never trades away an existing catch.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from msstreamingstack_spark.streaming.neardup import (
    SIG_MATCH_MIN,
    _sig_matches,
    neardup_twin,
)
from msstreamingstack_spark.operators.dedup import BAND_SIZE, NUM_HASHES

# tiny value space so band keys genuinely collide across random docs
sig_strategy = st.lists(
    st.integers(min_value=0, max_value=3), min_size=NUM_HASHES, max_size=NUM_HASHES
)


@settings(max_examples=200, deadline=None)
@given(st.lists(sig_strategy, min_size=1, max_size=30))
def test_flag_soundness(sigs):
    ordered = list(enumerate(sigs))
    flagged = neardup_twin(ordered)
    for i, sig in enumerate(sigs):
        if flagged[i]:
            assert any(
                _sig_matches(sig, sigs[j]) >= SIG_MATCH_MIN for j in range(i)
            ), (i, sig)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(sig_strategy, min_size=2, max_size=30),
    st.data(),
)
def test_first_occupant_recall(sigs, data):
    """Plant a near-copy of doc 0 (<= 3 perturbed components) at a
    random later position: doc 0 claims all its buckets first, so the
    copy MUST be flagged."""
    n_flips = data.draw(st.integers(min_value=0, max_value=NUM_HASHES - SIG_MATCH_MIN))
    pos = data.draw(st.integers(min_value=1, max_value=len(sigs)))
    near = list(sigs[0])
    for k in data.draw(
        st.lists(
            st.integers(min_value=0, max_value=NUM_HASHES - 1),
            min_size=n_flips,
            max_size=n_flips,
            unique=True,
        )
    ):
        near[k] = near[k] + 100  # guaranteed mismatch, out of value space
    ordered = list(enumerate([sigs[0]] + sigs[1:pos] + [near] + sigs[pos:]))
    flagged = neardup_twin(ordered)
    copy_idx = pos  # position of `near` in the ordered list
    assert _sig_matches(near, sigs[0]) >= SIG_MATCH_MIN
    assert flagged[copy_idx], (near, sigs[0], ordered)


def test_adversarial_preclaim_gap_is_real():
    """Documents the round-4 single-occupant limitation EXACTLY:
    pre-claim all 8 of a doc's band keys with 8 low-match occupants
    (each matching the target on one band = 2 components only), then
    send the target and an exact duplicate — under k_occupants=1 the
    duplicate stays unflagged because every bucket verdict compares
    against a low-match occupant. Round 5: the DEFAULT K-occupant
    state closes exactly this construction (the target claims a free
    slot in each of its buckets), which is why K>1 exists."""
    target = [7] * NUM_HASHES
    n_bands = NUM_HASHES // BAND_SIZE
    occupants = []
    for b in range(n_bands):
        sig = [100 + b] * NUM_HASHES  # matches target on NO component...
        for j in range(BAND_SIZE):
            sig[b * BAND_SIZE + j] = 7  # ...except target's band b key
        occupants.append(sig)
    ordered = list(enumerate(occupants + [target, [7] * NUM_HASHES]))
    # each occupant matches target on only BAND_SIZE components
    assert all(
        _sig_matches(o, target) == BAND_SIZE < SIG_MATCH_MIN for o in occupants
    )
    # the historical K=1 semantics MISS the exact duplicate: the gap
    # was real...
    flagged_k1 = neardup_twin(ordered, k_occupants=1)
    assert flagged_k1[len(occupants) + 1] is False
    # ...and the round-5 default closes this exact construction (the
    # batch kernel stays the backstop for K-deep pre-claims — see
    # tests/test_streaming_neardup.py)
    flagged = neardup_twin(ordered)
    assert flagged[len(occupants) + 1] is True


@settings(max_examples=200, deadline=None)
@given(st.lists(sig_strategy, min_size=1, max_size=30))
def test_k_occupants_monotone_recall(sigs):
    """flags(K) ⊆ flags(K+1) for every arrival stream: each bucket's
    occupant list is the first-K prefix of a claim order independent
    of K, so more slots can only surface MORE matches — never flip a
    flagged doc back to clean."""
    ordered = list(enumerate(sigs))
    prev = None
    for k in (1, 2, 3, 4):
        cur = {d for d, f in neardup_twin(ordered, k_occupants=k).items() if f}
        if prev is not None:
            assert prev <= cur, (k, prev - cur)
        prev = cur
