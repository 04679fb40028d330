"""Property-based pins for the round-15 operators' load-bearing math
(pure Python — no Spark session; the engine's formulations are
mirrored exactly so a falsifying example here is a real engine bug).
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------- b173

def _sweep_depth(intervals: list[tuple[int, int]]) -> tuple[int, int]:
    """EXACTLY the engine/oracle sweep: +1 at min, -1 at max+1,
    deltas pre-summed per day, running sum, seg_len = next_day - day
    (0 for the last event); returns (max_depth, sum(depth*seg_len))."""
    deltas: Counter = Counter()
    for lo, hi in intervals:
        deltas[lo] += 1
        deltas[hi + 1] -= 1
    days = sorted(deltas)
    depth = 0
    max_depth = 0
    wsum = 0
    for i, day in enumerate(days):
        depth += deltas[day]
        seg = (days[i + 1] - day) if i + 1 < len(days) else 0
        max_depth = max(max_depth, depth)
        wsum += depth * seg
    return max_depth, wsum


_intervals = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 30)).map(
        lambda t: (t[0], t[0] + t[1])),
    min_size=1, max_size=25)


@given(_intervals)
@settings(max_examples=300)
def test_sweep_line_equals_per_day_brute_force(iv):
    """The b173 sweep (both engines run this exact event form) must
    equal counting, for every day, the intervals that cover it —
    including gap days (depth 0) and duplicate intervals."""
    max_d, wsum = _sweep_depth(iv)
    lo = min(a for a, _ in iv)
    hi = max(b for _, b in iv)
    per_day = [sum(1 for a, b in iv if a <= day <= b)
               for day in range(lo, hi + 1)]
    assert max_d == max(per_day)
    assert wsum == sum(per_day)
    # the ppm formula's denominator: the sweep's weighted sum covers
    # exactly the [global min, global max] span (zeros on gap days)
    assert wsum <= max_d * (hi - lo + 1)


@given(_intervals)
def test_sweep_depth_one_iff_disjoint(iv):
    """max_depth == 1 exactly when no two intervals overlap — the
    b173 'sorted layout' claim."""
    max_d, _ = _sweep_depth(iv)
    overlapping = any(
        a2 <= b1 and a1 <= b2
        for i, (a1, b1) in enumerate(iv)
        for (a2, b2) in iv[i + 1:])
    assert (max_d > 1) == overlapping


# --------------------------------------------------------------- b172

def _expiry_ledger(files: list[tuple[int, int]], retain: int):
    """EXACTLY the engine/oracle derivation: relative small-file cut
    (2*bytes*n < total), rm = add+2 clamped to head, reclaimable iff
    rm <= head - retain."""
    head = max(a for a, _ in files)
    n, total = len(files), sum(b for _, b in files)
    ledger = []
    for a, b in files:
        rm = a + 2 if (2 * b * n < total and a + 2 <= head) else None
        ledger.append((a, b, rm))
    cutoff = head - retain
    reclaim = [(a, b) for a, b, rm in ledger
               if rm is not None and rm <= cutoff]
    return ledger, reclaim


_files = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 10_000)),
    min_size=2, max_size=60)


@given(_files, st.integers(0, 10))
@settings(max_examples=300)
def test_expiry_conservation_and_safety(files, retain):
    ledger, reclaim = _expiry_ledger(files, retain)
    head = max(a for a, _ in files)
    # conservation: every file appears exactly once in the ledger
    assert len(ledger) == len(files)
    assert sum(b for _, b, _ in ledger) == sum(b for _, b in files)
    # safety: nothing reclaimed is still referenced by a retained
    # snapshot — its removal commit is at/behind the horizon
    for a, b in reclaim:
        assert any(rm is not None and rm <= head - retain
                   for aa, bb, rm in ledger if (aa, bb) == (a, b))
    # no removal commit can postdate head (clamped by construction)
    assert all(rm is None or rm <= head for _, _, rm in ledger)


@given(_files)
@settings(max_examples=200)
def test_expiry_reclaim_monotone_in_retention(files):
    """Shrinking the retention window never shrinks the reclaimable
    set — the property an operator relies on when choosing how
    aggressively to expire."""
    sizes = [len(_expiry_ledger(files, r)[1]) for r in range(8, -1, -1)]
    assert sizes == sorted(sizes)


# --------------------------------------------------------------- b174

_SB_M = 16384
_SB_K = 4


def _bloom_pos(j: int, key: int) -> int:
    """EXACTLY the engine formula: portable_hash48 of 'j#key' mod m."""
    h = hashlib.md5(f"{j}#{key}".encode()).hexdigest()[:12]
    return int(h, 16) % _SB_M


@given(st.sets(st.integers(0, 10**9), min_size=1, max_size=200),
       st.integers(0, 10**9))
@settings(max_examples=200)
def test_bloom_has_no_false_negatives(build, probe):
    """The one-sided-error contract b174's hash check rests on: a
    bitmap built from the build keys passes EVERY build key, and any
    probe key it rejects is definitely absent."""
    bits = {_bloom_pos(j, k) for k in build for j in range(_SB_K)}
    member = all(_bloom_pos(j, probe) in bits for j in range(_SB_K))
    if probe in build:
        assert member
    if not member:
        assert probe not in build
    assert len(bits) <= min(_SB_M, _SB_K * len(build))


def test_bloom_word_packing_roundtrip():
    """The signed-long two's-complement packing (bit 63 flips the
    sign) must preserve every bit under the engine's
    shiftright-then-mask extraction, including arithmetic shift's
    sign extension."""
    for pos in range(0, 128):
        words = [0, 0]
        words[pos // 64] |= 1 << (pos % 64)
        words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        for q in range(128):
            w = words[q // 64]
            # Python's >> on negative ints sign-extends exactly like
            # Spark's shiftright on LongType
            bit = (w >> (q % 64)) & 1
            assert bit == (1 if q == pos else 0)


# --------------------------------------------------------------- c140

def _top_gram_counter(grams: list[str]) -> tuple[str, int]:
    c = Counter(grams)
    top_cnt = max(c.values())
    return min(g for g, n in c.items() if n == top_cnt), top_cnt


def _top_gram_sorted_scan(grams: list[str]) -> tuple[str, int]:
    """Independent coding: sort, run-length scan, (cnt DESC, gram ASC)
    argmin — the ORDER BY the engines' row_number uses."""
    runs = []
    for g in sorted(set(grams)):
        runs.append((-grams.count(g), g))
    runs.sort()
    return runs[0][1], -runs[0][0]


_grams = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=5),
    min_size=1, max_size=30)


@given(_grams)
@settings(max_examples=300)
def test_c140_top_gram_tiebreak_two_codings_agree(grams):
    assert _top_gram_counter(grams) == _top_gram_sorted_scan(grams)


@given(st.permutations(["x y", "y z", "x y", "z w", "y z"]))
def test_c140_scores_are_order_invariant(grams):
    """Shuffling gram arrival order (Spark's nondeterministic row
    order) never changes the top gram, its count, or the duplicate
    fraction — the determinism the value hash depends on."""
    grams = list(grams)
    assert _top_gram_counter(grams) == ("x y", 2)
    dup = (len(grams) - len(set(grams))) * 1_000_000 // len(grams)
    assert dup == 400_000
