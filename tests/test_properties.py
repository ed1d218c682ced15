"""Property-based tests (hypothesis) for pure operator logic.

The streaming sessionizer's defining property: HOW the event stream
is cut into micro-batches must not change the final sessions. We
drive the pandas fold (the exact function applyInPandasWithState
executes) with randomized event streams and randomized batch
boundaries, and compare against a straightforward reference
implementation.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_gov_spark.streaming.stateful import SESSION_GAP_US, _sessionize_group
from tests.test_stateful_mlstats import FakeState

# event streams: strictly increasing micro-second offsets with random
# gaps straddling the 30-min session boundary
gaps = st.lists(
    st.integers(min_value=1, max_value=3 * SESSION_GAP_US), min_size=1, max_size=30
)


def _events_from_gaps(gap_list):
    ts, out = 0, []
    for i, g in enumerate(gap_list):
        ts += g
        out.append((ts, i, float(i % 7)))
    return out


def _reference_sessions(events):
    """Single-pass reference: list of (seq, start, end, n, vsum)."""
    sessions = []
    for us, _eid, val in events:
        if not sessions or us - sessions[-1][2] > SESSION_GAP_US:
            sessions.append([len(sessions) + 1, us, us, 0, 0.0])
        s = sessions[-1]
        s[2] = us
        s[3] += 1
        s[4] += val
    return {
        seq: (start, end, n, round(vsum, 4))
        for seq, start, end, n, vsum in sessions
    }


def _fold_in_batches(events, cut_points):
    """Run the stateful fold over the stream cut at cut_points,
    keeping only the latest emission per session (update-mode)."""
    state = FakeState()
    final = {}
    bounds = [0, *sorted(cut_points), len(events)]
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = events[lo:hi]
        if not chunk:
            continue
        batch = iter(
            [pd.DataFrame(chunk, columns=["_us", "event_id", "value"])]
        )
        for out in _sessionize_group((1,), batch, state):
            for _, r in out.iterrows():
                final[int(r.session_seq)] = (
                    int(r.session_start.value // 1000),
                    int(r.session_end.value // 1000),
                    int(r.n_events),
                    round(float(r.session_value), 4),
                )
    return final


@settings(max_examples=200, deadline=None)
@given(
    gap_list=gaps,
    cuts=st.lists(st.integers(min_value=0, max_value=30), max_size=5),
)
def test_sessionize_invariant_under_batch_splits(gap_list, cuts):
    events = _events_from_gaps(gap_list)
    cuts = [c for c in cuts if c <= len(events)]
    assert _fold_in_batches(events, cuts) == _reference_sessions(events)


@settings(max_examples=100, deadline=None)
@given(gap_list=gaps)
def test_sessionize_single_batch_equals_reference(gap_list):
    events = _events_from_gaps(gap_list)
    assert _fold_in_batches(events, []) == _reference_sessions(events)


def test_tws_operator_gated_on_protobuf():
    """transformWithState needs protobuf (absent here): the operator
    must not register, and the gate must flip if the dep appears."""
    from etl_gov_spark.streaming import stateful

    try:
        from google.protobuf import descriptor  # noqa: F401

        has_pb = True
    except ImportError:
        has_pb = False
    assert stateful.HAS_TWS == has_pb
    assert ("stream_running_totals_tws" in stateful.QUERIES) == has_pb


# -- BPE merge mechanism (operators/corpus.py corpus_bpe_vocab) ---- #
#
# Both engines apply a merge with plain `replace` over the
# double-space symbol-string form (' a  b  c '); Python's
# str.replace has the same leftmost non-overlapping semantics, so
# proving the string mechanism equal to a reference symbol-list BPE
# here proves the Spark and DuckDB implementations implement greedy
# leftmost BPE.

_bpe_words = st.dictionaries(
    st.text(alphabet="ab", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=8,
)


def _ref_bpe(words: dict, iters: int):
    """Reference BPE on symbol lists: weighted pair argmax
    (count DESC, pair ASC), greedy leftmost merge scan."""
    from collections import Counter

    state = [(list(w), n) for w, n in sorted(words.items())]
    merges = []
    for _ in range(iters):
        counts = Counter()
        for syms, n in state:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        new_state = []
        for syms, n in state:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state.append((out, n))
        state = new_state
    return merges, state


def _replace_bpe(words: dict, iters: int):
    """The engines' mechanism: double-space strings + replace."""
    from collections import Counter

    state = [(" " + "  ".join(w) + " ", n) for w, n in sorted(words.items())]
    merges = []
    for _ in range(iters):
        counts = Counter()
        for s, n in state:
            syms = s.strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        state = [(s.replace(f" {a}  {b} ", f" {a}{b} "), n) for s, n in state]
    return merges, state


@settings(max_examples=300, deadline=None)
@given(words=_bpe_words, iters=st.integers(min_value=1, max_value=5))
def test_bpe_replace_mechanism_equals_reference(words, iters):
    ref_m, ref_state = _ref_bpe(words, iters)
    rep_m, rep_state = _replace_bpe(words, iters)
    assert rep_m == ref_m
    assert rep_state == [
        (" " + "  ".join(syms) + " ", n) for syms, n in ref_state
    ]


# -- footer-stat file pruning (io/skipping.prune_files) ------------ #

_file_stats = st.lists(
    st.tuples(st.integers(-100, 100), st.integers(0, 50)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=12,
)
_bound = st.one_of(st.none(), st.integers(-120, 120))


@settings(max_examples=300, deadline=None)
@given(ranges=_file_stats, lo=_bound, hi=_bound)
def test_prune_never_drops_a_file_that_could_match(ranges, lo, hi):
    """Soundness: every file whose [min,max] intersects the
    predicate band survives pruning, and every pruned file provably
    cannot contain a matching row."""
    from etl_gov_spark.io import skipping

    stats = [
        {"file": f"f{i}", "k": (mn, mx)} for i, (mn, mx) in enumerate(ranges)
    ]

    def fake_stats(table_path, cols, files=None):
        return stats

    orig = skipping.file_column_stats
    skipping.file_column_stats = fake_stats
    try:
        sel, tot = skipping.prune_files("unused", {"k": (lo, hi)})
    finally:
        skipping.file_column_stats = orig
    assert tot == len(stats)
    sel_set = set(sel)
    for s in stats:
        mn, mx = s["k"]
        intersects = (hi is None or mn <= hi) and (lo is None or mx >= lo)
        if intersects:
            assert s["file"] in sel_set, "dropped a file that could match"
        else:
            assert s["file"] not in sel_set, "kept a provably empty file"


# ---------------------------------------------------------------
# interval-union coverage: the windowed running-max island pass
# must agree with a brute-force interval merge on any event layout
# ---------------------------------------------------------------

_IU_WIN = 5 * 60 * 1_000_000  # mirrors _ACTIVE_WINDOW_US


def _brute_interval_union(starts):
    """Reference: merge [s, s+WIN] intervals the obvious way."""
    spans = []
    for s in sorted(starts):
        e = s + _IU_WIN
        if spans and s <= spans[-1][1]:
            spans[-1][1] = max(spans[-1][1], e)
        else:
            spans.append([s, e])
    return len(spans), sum(e - s for s, e in spans)


def _island_interval_union(starts):
    """The operator's algorithm, re-run in plain Python: running max
    of previous ends over the (s, idx) sort starts a new span when
    exceeded."""
    ordered = sorted(starts)
    spans, prev_max = 0, None
    span_start, covered = None, 0
    for s in ordered:
        e = s + _IU_WIN
        if prev_max is None or s > prev_max:
            if span_start is not None:
                covered += prev_max - span_start
            spans += 1
            span_start = s
        prev_max = e if prev_max is None else max(prev_max, e)
    if span_start is not None:
        covered += prev_max - span_start
    return spans, covered


@given(
    st.lists(
        st.integers(min_value=0, max_value=40 * 60 * 1_000_000),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_interval_union_island_trick_matches_brute_force(starts):
    assert _island_interval_union(starts) == _brute_interval_union(starts)


# ---------------------------------------------------------------
# gaps-and-islands streaks: date - row_number is constant exactly
# on runs of consecutive days
# ---------------------------------------------------------------


def _brute_max_streak(days):
    ds = sorted(set(days))
    best = cur = 1
    for a, b in zip(ds, ds[1:]):
        cur = cur + 1 if b - a == 1 else 1
        best = max(best, cur)
    return best


def _island_max_streak(days):
    ds = sorted(set(days))
    groups = {}
    for rn, d in enumerate(ds, start=1):
        groups.setdefault(d - rn, 0)
        groups[d - rn] += 1
    return max(groups.values())


@given(st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_streak_island_key_matches_brute_force(days):
    assert _island_max_streak(days) == _brute_max_streak(days)


@given(
    sizes=st.lists(st.integers(min_value=2, max_value=24), min_size=1, max_size=6)
)
@settings(max_examples=8, deadline=None)
def test_star_route_pair_expansion_linear(spark, sizes):
    """bounded_buckets(route='star') invariant at any bucket
    profile: an under-cap bucket of m members expands to C(m,2)
    pairs; an OVER-cap bucket to exactly m−1 hub-vs-member pairs
    (linear, the 100 TB guarantee); the Observation counts the hot
    buckets. Cap fixed at 8 so both regimes are exercised."""
    from pyspark.sql import functions as F2

    from etl_gov_spark.operators import dedup as D

    cap = 8
    rows = []
    for b, m in enumerate(sizes):
        for i in range(m):
            rows.append((f"k{b}", b * 1000 + i))
    df = (
        spark.createDataFrame(rows, "key string, doc_id long")
        .groupBy("key")
        .agg(
            F2.array_sort(
                F2.collect_list(F2.struct("doc_id"))
            ).alias("ds")
        )
        .filter(F2.size("ds") > 1)
    )
    routed = D.bounded_buckets(df, "ds", cap, "prop_star_test", route="star")
    pairs = routed.select(
        "key", F2.explode(D.pair_structs(F2.col("ds"))).alias("p")
    )
    got = {r.key: r.n for r in pairs.groupBy("key").agg(F2.count(F2.lit(1)).alias("n")).collect()}
    for b, m in enumerate(sizes):
        want = m * (m - 1) // 2 if m <= cap else m - 1
        assert got.get(f"k{b}", 0) == want, (m, cap, got.get(f"k{b}"))
    obs = D.HOT_BUCKET_OBS["prop_star_test"].get
    assert obs["hot_buckets"] == sum(1 for m in sizes if m > cap)
    assert obs["max_bucket"] == max(sizes)


# --- ranged primitives vs the single-partition reference -----------

_ranked_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # skewed, duplicated key
        st.integers(min_value=0, max_value=1000),  # tie-break source
        st.integers(min_value=-50, max_value=50),  # long payload
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: (t[0], t[1]),  # (key, uid) total order
)


@given(rows=_ranked_rows)
@settings(max_examples=8, deadline=None)
def test_ranged_primitives_equal_single_partition_reference(spark, rows):
    """ranged_global_rank (rank, exact ntile, running sum) and
    ranged_lag must equal the plain single-partition window
    functions on ANY input — duplicates and heavy skew in the range
    key, empty slices (P far above the row count), empty input."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F2

    from etl_gov_spark.operators.ranks import ranged_global_rank, ranged_lag

    df = spark.createDataFrame(
        rows or [], "k int, uid int, v long"
    ) if rows else spark.createDataFrame([], "k int, uid int, v long")
    order = [F2.asc("k"), F2.asc("uid")]

    got = {
        (r.k, r.uid): (r.rank, r.q, r.runv)
        for r in ranged_global_rank(
            df,
            order,
            rank_col="rank",
            ntiles={"q": 4},
            running_longs={"runv": "v"},
            partitions=7,  # deliberately above most sample sizes
        ).collect()
    }
    wref = W.orderBy(*order)
    ref = {
        (r.k, r.uid): (r.rank, r.q, r.runv)
        for r in df.select(
            "k",
            "uid",
            F2.row_number().over(wref).alias("rank"),
            F2.ntile(4).over(wref).alias("q"),
            F2.sum("v")
            .over(wref.rowsBetween(W.unboundedPreceding, 0))
            .alias("runv"),
        ).collect()
    }
    assert got == ref

    got_lag = {
        (r.k, r.uid): r.pv
        for r in ranged_lag(
            df, order, {"pv": "v"}, partitions=7
        ).collect()
    }
    ref_lag = {
        (r.k, r.uid): r.pv
        for r in df.select(
            "k", "uid", F2.lag("v").over(wref).alias("pv")
        ).collect()
    }
    assert got_lag == ref_lag


def test_ranged_primitives_reject_degenerate_ledger_width(spark):
    """The P-row ledger lifts back as plan literals — O(P) driver
    memory and plan bytes. An extreme shuffle parallelism must fail
    loudly instead of building a megabyte-literal plan."""
    import pytest
    from pyspark.sql import functions as F2

    from etl_gov_spark.operators.ranks import ranged_global_rank, ranged_lag

    df = spark.range(10).select(F2.col("id"), F2.col("id").alias("v"))
    with pytest.raises(ValueError, match="literal-lift budget"):
        ranged_global_rank(df, [F2.asc("id")], partitions=50_000)
    with pytest.raises(ValueError, match="literal-lift budget"):
        ranged_lag(df, [F2.asc("id")], {"prev_v": "v"}, partitions=50_000)


@given(
    c=st.integers(min_value=0, max_value=10**7),
    tot=st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=300, deadline=None)
def test_mk_p6_is_exact_half_up_micro_rounding(c, tot):
    """_mk_p6 (the Markov/Shapley integer micro-probability) must be
    EXACTLY round-half-up of c/tot * 1e6 — verified against Fraction
    arithmetic, no floats anywhere — and must match the oracle's
    (2*c*1000000 + tot) // (2*tot) formula by construction."""
    from fractions import Fraction

    from etl_gov_spark.operators.mlstats import _mk_p6

    got = _mk_p6(c, tot)
    x = Fraction(c * 1_000_000, tot)
    floor = x.numerator // x.denominator
    frac = x - floor
    expect = floor + (1 if frac >= Fraction(1, 2) else 0)
    assert got == expect
    assert got == (2 * c * 1_000_000 + tot) // (2 * tot)


@given(
    xs=st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_prefix_max_offsets_reconstruct_running_max(xs):
    """The ranged prefix-max ledger algebra (exclusive slice maxes +
    within-slice running max, as ranked by ranged_global_rank's
    running_max_longs) must reconstruct the naive global running max
    for ANY slicing of the sequence."""
    LONG_MIN = -(2**63)
    # emulate an arbitrary contiguous slicing into <=7 slices
    k = min(7, len(xs))
    bounds = sorted({0, len(xs)} | {(i * len(xs)) // k for i in range(k)})
    slices = [xs[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]
    # exclusive prefix maxes per slice (the driver ledger)
    offs, run = [], LONG_MIN
    for s in slices:
        offs.append(run)
        run = max(run, max(s))
    got = []
    for off, s in zip(offs, slices):
        m = LONG_MIN
        for x in s:
            m = max(m, x)
            got.append(max(off, m))
    expect, cur = [], LONG_MIN
    for x in xs:
        cur = max(cur, x)
        expect.append(cur)
    assert got == expect
