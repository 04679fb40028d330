"""Property-based pins for the round-13 operators' load-bearing math
(pure Python — no Spark session; the engine's formulations are
mirrored exactly so a falsifying example here is a real engine bug).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------- b165

def _morton_divmod(x: int, y: int) -> int:
    """EXACTLY the generated engine/oracle formula (div/mod form)."""
    z = 0
    for k in range(8):
        z += ((x // (1 << k)) % 2) * (1 << (2 * k + 1))
        z += ((y // (1 << k)) % 2) * (1 << (2 * k))
    return z


def _morton_bits(x: int, y: int) -> int:
    z = 0
    for k in range(8):
        z |= ((x >> k) & 1) << (2 * k + 1)
        z |= ((y >> k) & 1) << (2 * k)
    return z


@given(st.integers(0, 255), st.integers(0, 255))
def test_morton_divmod_equals_bit_interleave(x, y):
    assert _morton_divmod(x, y) == _morton_bits(x, y)


@given(st.integers(0, 255), st.integers(0, 255))
def test_morton_quarter_box_is_z_prefix(x, y):
    """The property the b165 audit's skip rate rests on: the 2-D
    quarter box x<64 AND y<64 is EXACTLY the z prefix z<4096 (top 4
    interleaved bits zero) — so a z-range file layout makes the box
    predicate prunable on contiguous files."""
    z = _morton_divmod(x, y)
    assert (x < 64 and y < 64) == (z < 4096)


@settings(max_examples=50)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=2, max_size=64))
def test_morton_is_injective(pts):
    zs = [_morton_divmod(x, y) for x, y in pts]
    assert len(set(zs)) == len(set(pts))


# --------------------------------------------------------------- b166

@settings(max_examples=100)
@given(st.lists(st.integers(1, 50_000), min_size=1, max_size=60),
       st.integers(10_000, 200_000))
def test_cum_before_bucketing_is_ordered_first_fit(sizes, target):
    """cum_before // target bin assignment == an explicit sequential
    first-fit loop, for arbitrary file sizes and targets; bins
    partition the sequence into contiguous runs."""
    cum = 0
    bins = []
    for b in sizes:
        bins.append(cum // target)
        cum += b
    # contiguous, non-decreasing bin ids starting at 0
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # every non-final bin's span reaches its upper boundary once the
    # straddling file lands (no short-closed bin while files remain)
    totals = Counter()
    for b, s in zip(bins, sizes):
        totals[b] += s
    running = 0
    ks = sorted(totals)
    for i, k in enumerate(ks):
        assert k * target <= running < (k + 1) * target
        running += totals[k]
        if i < len(ks) - 1:
            assert running >= (k + 1) * target


# --------------------------------------------------------------- c136

def _adjacent_lcp_pairs(suffixes, partitioned: bool):
    """(left, right, lcp) over lexicographically adjacent suffix pairs
    — either in one global order or per first-token shard."""
    def scan(items):
        items = sorted(items, key=lambda t: t[0])
        out = []
        for (ka, sa), (kb, sb) in zip(items, items[1:]):
            lcp = 0
            for t1, t2 in zip(sa, sb):
                if t1 != t2:
                    break
                lcp += 1
            out.append((ka, kb, lcp))
        return out

    if not partitioned:
        return scan(suffixes)
    shards: dict = {}
    for item in suffixes:
        shards.setdefault(item[1][0], []).append(item)
    return [p for s in shards.values() for p in scan(s)]


@settings(max_examples=100)
@given(st.lists(st.lists(st.sampled_from("ab cd ef gh".split()),
                         min_size=1, max_size=8),
                min_size=1, max_size=12))
def test_first_token_sharding_loses_only_zero_lcp_pairs(docs):
    """The c136 sharding theorem: partitioning the suffix sort by
    first token drops exactly the adjacent pairs with LCP == 0 (they
    disagree on token 1), so every statistic thresholded at LCP >= 1
    is identical between the global sort and the sharded sort."""
    suffixes = []
    for d, toks in enumerate(docs):
        for p in range(len(toks)):
            s = tuple(toks[p:p + 8])
            suffixes.append(((" ".join(s), d, p), s))
    glob = _adjacent_lcp_pairs(suffixes, partitioned=False)
    shard = _adjacent_lcp_pairs(suffixes, partitioned=True)
    keep = {(a, b, l) for a, b, l in glob if l >= 1}
    kept_shard = {(a, b, l) for a, b, l in shard if l >= 1}
    assert keep == kept_shard
    # max LCP is preserved exactly (0 when no pair shares a prefix)
    assert max((l for *_, l in glob), default=0) == \
        max((l for *_, l in shard), default=0)


# --------------------------------------------------------------- c137

def _lpa(edges, rounds=4):
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(labels[m] for m in nbrs)
            cnt[labels[n]] += 1  # self-inclusive (engine semantics)
            new[n] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = new
    return labels


@settings(max_examples=100)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=40),
       st.randoms())
def test_lpa_is_edge_order_and_multiset_deterministic(edges, rnd):
    """Fixed-round sync LPA with (count desc, min label) tiebreak is
    a pure function of the edge MULTISET: shuffling the edge list
    (and flipping edge direction) cannot change any label."""
    base = _lpa(edges)
    shuffled = list(edges)
    rnd.shuffle(shuffled)
    flipped = [(b, a) if rnd.random() < 0.5 else (a, b)
               for a, b in shuffled]
    assert _lpa(flipped) == base


@given(st.integers(2, 8))
def test_lpa_clique_converges_to_min_label(n):
    """On a dup-style clique — INCLUDING the isolated pair, the
    dominant near-dup shape — every node must end at the minimum id.
    The n=2 case is the reason the vote is self-inclusive: a
    neighbors-only sync vote swaps the pair's labels forever (this
    test's falsifying example before the fix)."""
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
    labels = _lpa(edges)
    assert set(labels.values()) == {0}
