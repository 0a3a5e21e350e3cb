"""Property tests for the fuzzy-match, funnel, and cohort block kernels
against brute-force python references (kernel level — no Ray session;
one table == one fully-co-located block, which is exactly the state the
hash exchange guarantees the kernels)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_ray.ops.cohort import _cohort_block, _dedup_user_weeks, _week_start_us
from bitfunnel_ray.ops.funnel import _funnel_block
from bitfunnel_ray.ops.fuzzy import _match_block

# ---------------------------------------------------------------------------
# fuzzy: deletion-neighborhood match == levenshtein <= 1
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


word_st = st.text(alphabet="abc", min_size=1, max_size=5)


@settings(max_examples=150, deadline=None)
@given(st.lists(word_st, min_size=1, max_size=25, unique=True), word_st)
def test_fuzzy_kernel_equals_levenshtein(vocab, q):
    t = pa.table(
        {
            "term": pa.array(vocab, pa.string()),
            "df": pa.array(range(1, len(vocab) + 1), pa.int64()),
        }
    )
    got = set(_match_block(t, queries=[q])["term"].to_pylist())
    want = {v for v in vocab if _lev(q, v) <= 1}
    assert got == want


# ---------------------------------------------------------------------------
# funnel: first trigger → first in-window target, per user
# ---------------------------------------------------------------------------

events_st = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user
        st.integers(0, 40),                     # ts (small units)
        st.sampled_from(["view", "click", "x"]),
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(events_st, st.integers(1, 15))
def test_funnel_kernel_matches_bruteforce(rows, window):
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]"),
                pa.timestamp("us"),
            ),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = _funnel_block(t, trigger="view", target="click", window_us=window)
    got = {
        int(u): (int(a), int(b))
        for u, a, b in zip(
            out["user_id"].to_pylist(),
            out["trigger_ts_us"].to_pylist(),
            out["target_ts_us"].to_pylist(),
        )
    }
    want = {}
    for u in {r[0] for r in rows}:
        views = sorted(r[1] for r in rows if r[0] == u and r[2] == "view")
        if not views:
            continue
        v = views[0]
        clicks = sorted(
            r[1] for r in rows
            if r[0] == u and r[2] == "click" and v < r[1] <= v + window
        )
        if clicks:
            want[u] = (v, clicks[0])
    assert got == want


# ---------------------------------------------------------------------------
# cohort: (first-week cohort, active-week offset) distinct-user counts
# ---------------------------------------------------------------------------

cohort_events_st = st.lists(
    st.tuples(
        st.integers(0, 5),              # user
        st.integers(-20, 40),           # epoch DAYS (covers pre-1970 weeks)
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(cohort_events_st)
def test_cohort_kernels_match_bruteforce(rows):
    day_us = 86_400_000_000
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] * day_us for r in rows], dtype="datetime64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    out = _cohort_block(_dedup_user_weeks(t))
    got = {}
    for c, o, n in zip(
        out["cohort_week_us"].to_pylist(),
        out["week_offset"].to_pylist(),
        out["n_part"].to_pylist(),
    ):
        got[(int(c), int(o))] = got.get((int(c), int(o)), 0) + int(n)

    def week(day):  # Monday start; 1970-01-01 was a Thursday
        return (day - (day + 3) % 7) * day_us

    want = {}
    for u in {r[0] for r in rows}:
        weeks = sorted({week(r[1]) for r in rows if r[0] == u})
        cohort = weeks[0]
        for w in weeks:
            cell = (cohort, (w - cohort) // (7 * day_us))
            want[cell] = want.get(cell, 0) + 1
    assert got == want
    # cross-check the week helper itself
    days = np.array([r[1] for r in rows], dtype=np.int64)
    assert np.array_equal(
        _week_start_us(days * day_us), np.array([week(d) for d in days])
    )
