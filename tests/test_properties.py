"""Property-based tests for the geodesy kernel (SURVEY.md §5.3) — pure
Python against the bit-exact mirror (`forward_py` ≡ Spark ≡ DuckDB, proven
in test_geo.py), so these run without a session."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from posting_lines_spark.functions import geo

lats = st.floats(min_value=44.0, max_value=62.0, allow_nan=False)
lons = st.floats(min_value=-140.0, max_value=-112.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lons, lats)
def test_projection_finite_and_in_range(lon, lat):
    x, y = geo.forward_py(lon, lat)
    assert math.isfinite(x) and math.isfinite(y)
    # BC Albers coordinates for the province's bounding box stay within
    # a few thousand km of the false origin
    assert -3e6 < x < 5e6
    assert -3e6 < y < 5e6


@settings(max_examples=100, deadline=None)
@given(lats)
def test_x_monotonic_in_lon(lat):
    xs = [geo.forward_py(lon, lat)[0] for lon in (-134.0, -130.0, -126.0, -122.0, -118.0)]
    assert xs == sorted(xs)


@settings(max_examples=100, deadline=None)
@given(lons)
def test_y_monotonic_in_lat(lon):
    ys = [geo.forward_py(lon, lat)[1] for lat in (45.0, 48.0, 52.0, 56.0, 60.0)]
    assert ys == sorted(ys)


@settings(max_examples=200, deadline=None)
@given(lons, lats, st.floats(-0.05, 0.05), st.floats(-0.05, 0.05))
def test_short_segment_length_tracks_haversine(lon, lat, dlon, dlat):
    x1, y1 = geo.forward_py(lon, lat)
    x2, y2 = geo.forward_py(lon + dlon, lat + dlat)
    planar = math.hypot(x2 - x1, y2 - y1)
    R = 6371008.8
    p1, p2, dl = math.radians(lat), math.radians(lat + dlat), math.radians(dlon)
    h = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    gc = 2 * R * math.asin(math.sqrt(h))
    if gc > 1.0:  # metre-scale floors avoid 0/0
        assert abs(planar - gc) / gc < 0.02


@settings(max_examples=200, deadline=None)
@given(lons, lats)
def test_zero_length_iff_same_point(lon, lat):
    x, y = geo.forward_py(lon, lat)
    assert math.hypot(x - x, y - y) == 0.0


@settings(max_examples=200, deadline=None)
@given(st.floats(0.1, 1e6), st.integers(1, 86400))
def test_sog_positive_and_scales(len_m, duration):
    sog = len_m / duration * geo.KNOTS_PER_MPS
    assert sog > 0
    assert abs(sog / 2 - (len_m / (2 * duration)) * geo.KNOTS_PER_MPS) < 1e-9 * max(1.0, sog)


@settings(max_examples=300, deadline=None)
@given(st.floats(-1.1, 1.1))  # the kernel's documented domain
def test_polynomial_sin_cos_accuracy(x):
    assert abs(geo.dsin_py(x) - math.sin(x)) < 5e-16
    assert abs(geo.dcos_py(x) - math.cos(x)) < 5e-16
    assert abs(geo.dsin_py(x) ** 2 + geo.dcos_py(x) ** 2 - 1.0) < 1e-16 * 10


# --- prefix-filtering lemma (operators/dedup.py::prefix_filter_candidates) ---
# Pure-set replay of the candidate rule: every pair with Jaccard >= t
# MUST share an element of both prefixes (rarest n - ceil(t*n) + 1
# elements in a global (df, value) order). Random corpora probe the
# ceil boundaries the fixed-corpus equivalence test can't reach.

sets_strategy = st.lists(
    st.sets(st.integers(min_value=0, max_value=14), min_size=1, max_size=10),
    min_size=2,
    max_size=8,
)


@settings(max_examples=300, deadline=None)
@given(sets_strategy, st.sampled_from([0.3, 0.5, 0.7, 0.9]))
def test_prefix_filter_candidates_cover_all_qualifying_pairs(docs, t):
    df_count: dict[int, int] = {}
    for s in docs:
        for tok in s:
            df_count[tok] = df_count.get(tok, 0) + 1
    order = lambda tok: (df_count[tok], tok)  # noqa: E731

    def prefix(s):
        ranked = sorted(s, key=order)
        keep = len(s) - math.ceil(t * len(s)) + 1
        return set(ranked[:keep])

    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                assert prefix(a) & prefix(b), (
                    f"qualifying pair lost: {a} {b} jac={jac} t={t}"
                )


# --- Carter-Wegman derived hash family (functions/hashing.py) ---
# Pure-Python replay of the SQL mix: same limb extraction, same constants,
# same modular arithmetic — the engines evaluate the identical expression
# text, so this mirror pins the family's semantics and its int64 safety.

texts = st.text(min_size=0, max_size=200)


def _cw_py(s: str, j: int) -> int:
    import hashlib

    from posting_lines_spark.functions.hashing import CW_MOD, cw_constants

    d = hashlib.md5(f"mh|{s}".encode()).hexdigest()
    limbs = [int(d[i * 8 : (i + 1) * 8], 16) for i in range(4)]
    a = cw_constants(j)
    return (sum(a[i] * limbs[i] for i in range(4)) + j) % CW_MOD


@settings(max_examples=200, deadline=None)
@given(texts, st.integers(min_value=0, max_value=31))
def test_cw_mix_in_range_and_int64_safe(s, j):
    from posting_lines_spark.functions.hashing import CW_MOD, cw_constants

    h = _cw_py(s, j)
    assert 0 <= h < CW_MOD
    # every SQL intermediate stays below 2^63: four (28-bit × 32-bit)
    # products plus j
    import hashlib

    d = hashlib.md5(f"mh|{s}".encode()).hexdigest()
    limbs = [int(d[i * 8 : (i + 1) * 8], 16) for i in range(4)]
    a = cw_constants(j)
    acc = sum(a[i] * limbs[i] for i in range(4)) + j
    assert acc < 2**63


@settings(max_examples=50, deadline=None)
@given(texts)
def test_cw_family_members_differ(s):
    # distinct j ⇒ (almost surely) distinct hashes — the family is a
    # family, not one hash repeated; identical inputs collide across j
    # only by modular coincidence, never structurally
    hs = {_cw_py(s, j) for j in range(12)}
    assert len(hs) >= 11


# --- deterministic integer-ln kernel (functions/dmath.py) ---
# The Python mirror is bit-identical to both engines (proven in
# tests/test_degenerate.py), so these properties transfer to the SQL.

ints = st.integers(min_value=1, max_value=10**15)


@settings(max_examples=300, deadline=None)
@given(ints)
def test_dln_accuracy(n):
    from posting_lines_spark.functions.dmath import dln_int_py

    got, want = dln_int_py(n), math.log(n)
    assert math.isfinite(got)
    if n == 1:
        assert got == 0.0
    else:
        assert abs(got - want) <= 2 * abs(want) * 2.3e-16, (n, got, want)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=10**15 - 1))
def test_dln_monotonic(n):
    from posting_lines_spark.functions.dmath import dln_int_py

    # non-decreasing across successor pairs, even across digit-count and
    # anchor boundaries (strictness is impossible in double once
    # 1/n < ulp(ln n) — near 10^15 successive integers legitimately
    # share a ln value; the kernel must never INVERT, though)
    assert dln_int_py(n) <= dln_int_py(n + 1)
    if n < 10**12:  # 1/n ≫ ulp(ln n): strict order must hold here
        assert dln_int_py(n) < dln_int_py(n + 1)


@settings(max_examples=200, deadline=None)
@given(ints, ints)
def test_dln_order_preserving(a, b):
    import math as _m

    from posting_lines_spark.functions.dmath import dln_int_py

    if a == b:
        assert dln_int_py(a) == dln_int_py(b)
        return
    lo, hi = min(a, b), max(a, b)
    assert dln_int_py(lo) <= dln_int_py(hi)
    if _m.log(hi) - _m.log(lo) > 1e-12:  # gap above rounding noise
        assert dln_int_py(lo) < dln_int_py(hi)


# --- fifth-wave combinatorial lemmas (pure Python mirrors) ---

from hypothesis import strategies as _st5


@settings(max_examples=200, deadline=None)
@given(st.integers(2, 120), st.integers(1, 8))
def test_snm_overlapped_blocks_are_window_complete(n, w):
    """The SNM candidate scheme (each rank in blocks g and g+1 of size w,
    pairs equi-joined on block) must produce EVERY pair within rank
    distance w — the completeness lemma dedup_sorted_neighborhood's
    equi-join formulation rests on."""
    member = [(r, (r - 1) // w) for r in range(1, n + 1)]
    member += [(r, (r - 1) // w + 1) for r in range(1, n + 1)]
    cand = set()
    by_block: dict = {}
    for r, g in member:
        by_block.setdefault(g, []).append(r)
    for rs in by_block.values():
        for a in rs:
            for b in rs:
                if 0 < b - a <= w:
                    cand.add((a, b))
    expected = {(a, a + d) for a in range(1, n + 1) for d in range(1, w + 1) if a + d <= n}
    assert cand == expected


@settings(max_examples=200, deadline=None)
@given(
    _st5.sets(_st5.integers(0, 2**60), min_size=1, max_size=300),
    _st5.sets(_st5.integers(0, 2**60), min_size=1, max_size=300),
    _st5.integers(4, 64),
)
def test_kmv_sketch_union_merge_lemma(a, b, k):
    """bottom-K(A ∪ B) == bottom-K(sketch(A) ∪ sketch(B)) — the
    mergeability identity sketch_kmv_overlap's pairwise stage relies on
    (sketches compose without revisiting the data)."""
    sk_a, sk_b = set(sorted(a)[:k]), set(sorted(b)[:k])
    assert set(sorted(a | b)[:k]) == set(sorted(sk_a | sk_b)[:k])


@settings(max_examples=100, deadline=None)
@given(_st5.sets(_st5.integers(0, 2**60), min_size=1, max_size=300), _st5.integers(4, 64))
def test_kmv_estimator_identity_edges(vals, k):
    """Estimator sanity at the identities: J(A,A) estimates exactly 1;
    disjoint hash sets estimate exactly 0."""
    sk = set(sorted(vals)[:k])
    union_bottom = set(sorted(vals)[:k])
    shared = len(union_bottom & sk & sk)
    assert shared / len(union_bottom) == 1.0
    other = {v + 2**61 for v in vals}  # disjoint by construction
    sk_o = set(sorted(other)[:k])
    ub = set(sorted(vals | other)[:k])
    assert len(ub & sk & sk_o) == 0


# --- round-8 properties (session-free pure-Python mirrors) ---

letters = st.text(alphabet="ab", min_size=1, max_size=12)


@settings(max_examples=500, deadline=None)
@given(letters, st.text(alphabet="ab", min_size=1, max_size=2),
       st.text(alphabet="ab", min_size=1, max_size=2))
def test_wrapped_replace_is_greedy_bpe_merge(word, x, y):
    """The per-symbol-wrapped representation ('|a||b||a|') makes ONE
    left-to-right non-overlapping replace('|x||y|' → '|xy|') exactly
    Sennrich greedy BPE — python str.replace shares those semantics
    with Spark/DuckDB replace(), so this property IS the engine claim
    (the round-7 ADVICE counterexamples 'abab'/'aaaa' fall out as
    instances)."""
    syms = list(word)
    wrapped = "".join(f"|{s}|" for s in syms)
    got = wrapped.replace(f"|{x}||{y}|", f"|{x}{y}|")
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    want = "".join(f"|{s}|" for s in out)
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=40))
def test_hl_rank_picks_equal_walsh_median(ds):
    """The explicit ⌊(m+1)/2⌋/⌈(m+1)/2⌉ order-statistic picks over
    Walsh sums reproduce statistics.median of the Walsh averages (the
    convention the first draft silently broke via float rank
    division)."""
    import statistics

    walsh = sorted(a + b for i, a in enumerate(ds) for b in ds[i:])
    m = len(walsh)
    picks = (walsh[(m + 1) // 2 - 1] + walsh[(m + 2) // 2 - 1]) / 4
    assert picks == statistics.median(walsh) / 2


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.booleans()),
                min_size=4, max_size=120))
def test_delong_grouped_equals_per_observation(obs):
    """The score-grouped DeLong components (the engine's form) equal
    the classical per-observation computation."""
    import bisect

    pos = sorted(s for s, y in obs if y)
    neg = sorted(s for s, y in obs if not y)
    if len(pos) < 2 or len(neg) < 2:
        return
    P, N = len(pos), len(neg)

    def v10(s):
        lo = bisect.bisect_left(neg, s)
        return (lo + 0.5 * (bisect.bisect_right(neg, s) - lo)) / N

    def v01(s):
        lo = bisect.bisect_left(pos, s)
        return ((P - bisect.bisect_right(pos, s)) + 0.5 * (bisect.bisect_right(pos, s) - lo)) / P

    auc = sum(v10(s) for s in pos) / P
    s10 = sum((v10(s) - auc) ** 2 for s in pos)
    s01 = sum((v01(s) - auc) ** 2 for s in neg)
    # grouped form: per distinct score, component × class count
    from collections import Counter

    np_c = Counter(pos)
    nn_c = Counter(neg)
    g10 = sum(c * (v10(s) - auc) ** 2 for s, c in np_c.items())
    g01 = sum(c * (v01(s) - auc) ** 2 for s, c in nn_c.items())
    assert abs(g10 - s10) < 1e-9
    assert abs(g01 - s01) < 1e-9


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-5, 5), min_size=2, max_size=60))
def test_runs_equal_one_plus_changes(xs):
    """Run count over a sign sequence == 1 + #adjacent changes (the
    relational formulation) — checked against an explicit run scan."""
    signs = [1 if b > a else -1 for a, b in zip(xs, xs[1:]) if a != b]
    if not signs:
        return
    runs_scan = 1
    for a, b in zip(signs, signs[1:]):
        if a != b:
            runs_scan += 1
    runs_rel = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert runs_rel == runs_scan
