"""Streaming near-dup detector (streaming/neardup.py): the per-row
signature expression must equal the batch aggregate kernel
bit-for-bit, and the drained stream must agree EXACTLY with the
sequential reference twin on the same drops — the property tying the
watermarked bucket state to the batch MinHash+LSH family."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from msstreamingstack_spark.operators.dedup import (
    NUM_HASHES,
    doc_shingle_hashes,
    minhash_signatures,
)
from msstreamingstack_spark.sources.tables import load_table
from msstreamingstack_spark.streaming.neardup import (
    K_OCCUPANTS,
    SIG_MATCH_MIN,
    flag_neardups,
    minhash_signature_expr,
    neardup_twin,
    run_neardup_stream,
)

SF = "/root/testdata/sf0.001"


def _batch_signatures(spark, docs):
    """The batch kernel's signatures keyed by doc_id."""
    sig = minhash_signatures(doc_shingle_hashes(docs, persist=False))
    return {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(NUM_HASHES)]
        for r in sig.collect()
    }


def test_signature_expr_matches_batch_kernel(spark):
    """Per-row HOF signature == groupBy-min aggregate signature, every
    doc, every component — two computation strategies, one result."""
    docs = load_table(spark, SF, "documents")
    want = _batch_signatures(spark, docs)
    got = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id", minhash_signature_expr(F.col("text")).alias("sig")
        )
        .filter(F.col("sig").isNotNull())
        .collect()
    }
    assert set(got) == set(want)
    diffs = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not diffs, f"{len(diffs)} signature mismatches"


@pytest.fixture(scope="module")
def staged_doc_drops(tmp_path_factory):
    """documents split into 3 doc_id-ordered drops + a 4th drop that
    re-crawls the first 10 docs verbatim under new ids."""
    src = pq.read_table(os.path.join(SF, "documents.parquet"))
    df = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out = tmp_path_factory.mktemp("neardup_in")
    n = len(df)
    step = (n + 2) // 3
    order = []
    for i, lo in enumerate(range(0, n, step)):
        chunk = df.iloc[lo : lo + step]
        path = out / f"part-{i:03d}.parquet"
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), path)
        mt = 1_700_000_000 + i * 10
        os.utime(path, (mt, mt))
        order.append(sorted(chunk["doc_id"]))
    recrawl = df.iloc[:10].assign(doc_id=lambda d: d["doc_id"] + 1_000_000)
    path = out / "part-003.parquet"
    pq.write_table(pa.Table.from_pandas(recrawl, preserve_index=False), path)
    os.utime(path, (1_700_000_040, 1_700_000_040))
    order.append(sorted(recrawl["doc_id"]))
    return str(out), order


@pytest.mark.slow
def test_stream_flags_match_sequential_twin(spark, staged_doc_drops, tmp_path):
    src_dir, order = staged_doc_drops
    out_dir = str(tmp_path / "verdicts")
    q = run_neardup_stream(
        spark, src_dir, out_dir, checkpoint_dir=str(tmp_path / "cp")
    )
    q.awaitTermination(300)
    q.stop()

    got_df = spark.read.parquet(out_dir)
    got = {
        r["doc_id"]: (r["is_neardup"], r["matched_doc"])
        for r in got_df.collect()
    }

    # reference twin over the SAME arrival order on batch signatures
    docs = load_table(spark, SF, "documents")
    orig_ids = [d - 1_000_000 for d in order[3]]
    recrawl = docs.filter(F.col("doc_id").isin(orig_ids)).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    sigs = _batch_signatures(spark, docs.unionByName(recrawl))
    ordered = [
        (d, sigs[d]) for drop in order for d in drop if d in sigs
    ]
    want = neardup_twin(ordered)

    assert set(got) == set(want)
    flag_diffs = {
        d: (got[d][0], want[d]) for d in want if got[d][0] != want[d]
    }
    assert not flag_diffs, f"{len(flag_diffs)} flag mismatches: {list(flag_diffs.items())[:5]}"

    # the verbatim re-crawl MUST be flagged (identical shingle set ⇒
    # identical signature ⇒ every bucket hits, est_jaccard = 1.0)
    recrawl_ids = order[3]
    assert all(got[d][0] for d in recrawl_ids if d in got), {
        d: got.get(d) for d in recrawl_ids
    }
    # and its partner must share all bands -> matched_doc = original
    for d in recrawl_ids:
        if d in got and got[d][0]:
            assert got[d][1] is not None

    # bridge to the batch kernel: a flagged pair reaches >= 13/16
    # matching signature components — est jaccard >= SIG_MATCH_MIN/16
    for d, (flag, partner) in got.items():
        if flag and partner in sigs and d in sigs:
            n_match = sum(
                1 for a, b in zip(sigs[d], sigs[partner]) if a == b
            )
            assert n_match >= SIG_MATCH_MIN, (d, partner, n_match)


def _band_twin_sig(sig: list[int], band: int, filler_base: int) -> list[int]:
    """A signature agreeing with ``sig`` EXACTLY in band ``band``'s two
    components and nowhere else — the pre-claimer shape: it lands in
    the same (band, key) bucket but matches only 2/16 overall."""
    out = [filler_base + i for i in range(NUM_HASHES)]
    out[band * 2] = sig[band * 2]
    out[band * 2 + 1] = sig[band * 2 + 1]
    return out


def test_adversarial_preclaim_order_caught_by_k_occupants():
    """THE round-4 recall gap, reproduced and closed: an arrival order
    that pre-claims every one of a doc's 8 buckets with low-match
    occupants hides a later verbatim re-crawl under single-occupant
    state (K=1 — the twin must NOT flag it, demonstrating the gap),
    while K_OCCUPANTS >= 2 gives the original doc a slot in each
    bucket and the re-crawl is flagged."""
    n_bands = NUM_HASHES // 2
    sig_b = [100 + 7 * i for i in range(NUM_HASHES)]  # the original doc
    preclaimers = [
        (i + 1, _band_twin_sig(sig_b, i, 10_000 * (i + 1)))
        for i in range(n_bands)
    ]
    # sanity: each pre-claimer matches B in exactly 2 components
    for _pid, psig in preclaimers:
        assert sum(1 for a, b in zip(psig, sig_b) if a == b) == 2
    ordered = [*preclaimers, (100, sig_b), (200, list(sig_b))]

    k1 = neardup_twin(ordered, k_occupants=1)
    assert k1[100] is False
    assert k1[200] is False, (
        "K=1 must MISS the re-crawl here — if this starts flagging, the "
        "adversarial construction no longer matches the bucket keys"
    )

    for k in (2, K_OCCUPANTS):
        kk = neardup_twin(ordered, k_occupants=k)
        assert kk[100] is False          # the original is not a dup
        assert kk[200] is True, f"K={k} must catch the re-crawl"


def test_twin_k_slots_bound_preclaim_resistance():
    """K slots resist exactly K-1 pre-claimers per bucket: with K
    same-bucket pre-claimers arriving first in EVERY band, the
    original doc gets no slot anywhere and the re-crawl escapes again
    — the state/recall trade is a dial, not a cliff."""
    n_bands = NUM_HASHES // 2
    sig_b = [100 + 7 * i for i in range(NUM_HASHES)]
    ordered = []
    next_id = 1
    for i in range(n_bands):
        for j in range(K_OCCUPANTS):  # fill ALL K slots of B's bucket
            ordered.append(
                (next_id, _band_twin_sig(sig_b, i, 10_000 * next_id))
            )
            next_id += 1
    ordered += [(100, sig_b), (200, list(sig_b))]
    res = neardup_twin(ordered, k_occupants=K_OCCUPANTS)
    assert res[200] is False  # all slots pre-claimed -> documented residue
    # one more slot would have caught it
    res2 = neardup_twin(ordered, k_occupants=K_OCCUPANTS + 1)
    assert res2[200] is True


class _FakeState:
    """Minimal GroupState stand-in for driving _bucket_fn directly."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _mk_sig(seed: int) -> list[int]:
    return [seed * 31 + i for i in range(NUM_HASHES)]


def test_bucket_fn_chunk_order_invariance():
    """applyInPandasWithState delivers a group's rows as MULTIPLE Arrow
    chunks in arbitrary order; _bucket_fn must concat-then-sort so
    chunk boundaries never change who claims a slot. Drive the
    function directly: adversarially-chunked input == single-chunk
    input, row-for-row and state-for-state."""
    import pandas as pd

    from msstreamingstack_spark.streaming.neardup import _make_bucket_fn

    rows = [(5, _mk_sig(5)), (1, _mk_sig(1)), (3, _mk_sig(3)), (9, _mk_sig(1))]

    def run(chunking):
        state = _FakeState()
        pdfs = (
            pd.DataFrame(
                [(d, s) for d, s in chunk], columns=["doc_id", "sig"]
            )
            for chunk in chunking
        )
        out = list(_make_bucket_fn(None)(("b", "k"), pdfs, state))
        rows_out = [
            tuple(None if pd.isna(v) else v for v in r)
            for r in pd.concat(out).itertuples(index=False, name=None)
        ]
        return rows_out, state._value

    single_out, single_state = run([rows])
    chunked_out, chunked_state = run([rows[:1], [], rows[1:3], rows[3:]])
    assert single_out == chunked_out
    assert single_state == chunked_state
    # deterministic order: 1 claims first, then 3, then 5 (K=3 full);
    # 9 (same sig as 1) matches 1 on all components
    occupants = single_state[0]
    assert occupants == [1, 3, 5]
    by_doc = {r[0]: r for r in single_out}
    assert by_doc[1][1] is None            # first arrival: empty bucket
    assert by_doc[9][1] == 1 and by_doc[9][2] == NUM_HASHES


def test_bucket_fn_ttl_and_state_roundtrip():
    """Timed-out state is removed with no output; an existing
    (occupants, flat sigs) state is decoded, compared against and
    extended; the TTL is re-armed on every update."""
    import pandas as pd

    from msstreamingstack_spark.streaming.neardup import _make_bucket_fn

    fn = _make_bucket_fn(60_000)
    timed = _FakeState(timed_out=True)
    assert list(fn(("b", "k"), iter([]), timed)) == []
    assert timed.removed

    prior = _FakeState(value=([7], list(_mk_sig(7))))
    out = list(
        fn(
            ("b", "k"),
            iter([pd.DataFrame([(8, _mk_sig(7))], columns=["doc_id", "sig"])]),
            prior,
        )
    )[0]
    assert out.iloc[0].tolist() == [8, 7, NUM_HASHES]  # full match vs 7
    occupants, flat = prior._value
    assert occupants == [7, 8] and len(flat) == 2 * NUM_HASHES
    assert prior.timeout_set == 60_000


def test_flag_neardups_threshold_and_partner_tiebreak(spark):
    """flag_neardups: max match wins; ties pick the smallest partner;
    below-threshold stays unflagged with est carried."""
    rows = [
        (1, None, None),
        (2, 1, 16),
        (2, 7, 16),   # tie on n_match -> partner 1 (smallest)
        (3, 1, 12),   # below threshold
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, matched_doc long, n_match int"
    )
    got = {r["doc_id"]: r for r in flag_neardups(df).collect()}
    assert got[1]["is_neardup"] is False and got[1]["matched_doc"] is None
    assert got[2]["is_neardup"] is True and got[2]["matched_doc"] == 1
    assert got[2]["est_jaccard"] == 1.0
    assert got[3]["is_neardup"] is False
    assert got[3]["est_jaccard"] == 0.75
