"""Hypothesis property tests for the pure-python cores added in round 4 —
no SparkSession, so these run in milliseconds and explore far more inputs
than the fixture-based tests:

* union_find_min_labels == a BFS reference on arbitrary graphs;
* _select_disjoint_batch never selects pairs whose symbol neighborhoods
  (consumed symbols AND produced concatenations) overlap, and is greedy
  rank-respecting.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fortune_500_financial_insights_pipeline_spark.operators.bpe import (
    _select_disjoint_batch,
)
from fortune_500_financial_insights_pipeline_spark.operators.graph import (
    union_find_min_labels,
)


def _bfs_min_labels(pairs):
    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {}
    for start in adj:
        if start in labels:
            continue
        seen = {start}
        frontier = [start]
        while frontier:
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        nxt.append(y)
            frontier = nxt
        m = min(seen)
        for x in seen:
            labels[x] = m
    return labels


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), max_size=120
    )
)
def test_union_find_matches_bfs_reference(pairs):
    assert union_find_min_labels(pairs) == _bfs_min_labels(pairs)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=3),
            st.text(alphabet="abcd", min_size=1, max_size=3),
            st.integers(1, 100),
        ),
        max_size=30,
    ),
    st.integers(1, 10),
)
def test_select_disjoint_batch_invariants(cands, want):
    batch = _select_disjoint_batch(cands, want)
    assert len(batch) <= want
    # subset of candidates, order-respecting (greedy in rank order)
    idxs = [cands.index(b) for b in batch]
    assert idxs == sorted(idxs)
    # product-aware disjointness: for any two selected pairs, neither
    # consumes/produces a symbol the other touches
    for i, (l1, r1, _) in enumerate(batch):
        t1 = {l1, r1, l1 + r1}
        for l2, r2, _ in batch[i + 1 :]:
            t2 = {l2, r2, l2 + r2}
            assert not (t1 & t2), (batch,)
    # greedy maximality: every skipped candidate before the last selected
    # one conflicts with something selected earlier in rank order
    if batch:
        last_idx = cands.index(batch[-1])
        chosen_before: list = []
        bi = 0
        for j, (l, r, c) in enumerate(cands[: last_idx + 1]):
            if bi < len(batch) and (l, r, c) == batch[bi]:
                chosen_before.append((l, r))
                bi += 1
                continue
            touched = set()
            for cl, cr in chosen_before:
                touched |= {cl, cr, cl + cr}
            assert touched & {l, r, l + r}, (cands, batch, j)


# ---------------------------------------------------------------------------
# Round 6: GIF LZW and the local dense-rank core
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=4000),
    st.sampled_from([2, 4, 8]),
)
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_property(indices, min_code_size):
    """Any index stream within the code-size alphabet round-trips through
    the variable-width LZW encoder/decoder exactly — including streams
    long enough to hit the 4096-entry table reset (r5 advisor's cap fix)."""
    import numpy as np

    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
        lzw_decode,
        lzw_encode,
    )

    alphabet = 1 << min_code_size
    idx = np.asarray([i % alphabet for i in indices], np.uint8)
    dec = lzw_decode(lzw_encode(idx, min_code_size), min_code_size)
    assert np.array_equal(np.asarray(dec, np.uint8), idx)


@given(st.lists(st.tuples(st.integers(-50, 50), st.integers(-3, 3)), max_size=300))
@settings(max_examples=80, deadline=None)
def test_local_rank_running_state_is_dense(rows):
    """The mapInPandas local-rank kernel's invariant, checked purely: a
    sorted key stream (any batch slicing) yields 1-based dense ranks
    equal to the distinct-prefix count at each row."""
    rows = sorted(rows)
    # replicate the kernel: running (last_key, rank) across batch splits
    import random

    rng = random.Random(7)
    cuts = sorted(rng.sample(range(len(rows) + 1), min(3, len(rows) + 1)))
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        batches.append(rows[prev:c])
        prev = c
    last_key, rank, got = None, 0, []
    for batch in batches:
        for key in batch:
            if key != last_key:
                rank += 1
                last_key = key
            got.append(rank)
    expect = []
    seen = []
    for key in rows:
        if not seen or key != seen[-1]:
            seen.append(key)
        expect.append(len(seen))
    assert got == expect


# ---- round 9: WARC member-span chunking invariance + HTTP header fold ----

@given(
    sizes=st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=6),
    chunk=st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=60, deadline=None)
def test_gzip_member_spans_chunk_size_invariant(sizes, chunk):
    """iter_gzip_member_spans yields the identical span list for EVERY
    read chunk size — including sizes that land a 1-byte tail on a
    member boundary (the r8 advisor's false-corruption case)."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        iter_gzip_member_spans,
        warc_build,
        warc_build_record,
    )

    blob = warc_build(
        [warc_build_record("response", b"y" * n) for n in sizes],
        gzip_members=True,
    )

    def spans_with(cs):
        pos = {"o": 0}

        def read(n):
            o = pos["o"]
            pos["o"] = min(len(blob), o + cs)
            return blob[o : pos["o"]]

        return list(iter_gzip_member_spans(read, chunk_size=cs))

    reference = spans_with(len(blob) + 1)  # single-read ground truth
    assert len(reference) == len(sizes)
    assert reference[0][0] == 0 and reference[-1][1] == len(blob)
    assert spans_with(chunk) == reference


@given(
    headers=st.lists(
        st.tuples(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz-", min_size=1, max_size=10
            ),
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ;=/.",
                min_size=0,
                max_size=20,
            ),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda kv: kv[0],
    ),
    junk_at=st.integers(min_value=0, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_http_split_headers_never_raises_on_junk(headers, junk_at):
    """A junk (no-colon) line anywhere in the header block never raises
    and never corrupts the parsed map (r8 advisor: one bad header must
    not kill the ingest job)."""
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        http_split_headers,
    )

    lines = [f"{k}: {v}".encode() for k, v in headers]
    lines.insert(min(junk_at, len(lines)), b"no colon junk line")
    block = (
        b"HTTP/1.1 200 OK\r\n" + b"\r\n".join(lines) + b"\r\n\r\nBODY"
    )
    status, parsed, body = http_split_headers(block)
    assert status == 200 and body == b"BODY"
    for k, v in headers:
        assert parsed[k.lower()] == v.strip()
