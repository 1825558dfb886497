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
